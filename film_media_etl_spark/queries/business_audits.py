"""Business-audit analytics: cohort lifetime value, Benford first-digit
fraud screening, Pareto revenue concentration, day-of-week seasonality,
and skyline (Pareto-front) product selection.

These are the finance/audit queries the reference's BI report gestures at
but never reaches — it stops at revenue-by-country/quarter pivots
(BusinessAnalysis...Rmd:116-165) and customer counts (rmd:203-229). Each
query here follows the engine's exactness conventions: decimal money
sums (functions/money.py), single IEEE divisions for ratios, percentile
cutpoints that interpolate identically in both engines, and string-based
digit extraction (decimal→varchar is canonical in both engines, unlike
log10-based mantissa math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import AGG_DECIMAL, dec
from ..sources import load_table
from .registry import register


@register(
    "ext_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(date_trunc('month', o_orderdate)) AS cohort_month
      FROM orders GROUP BY 1
    ),
    enriched AS (
      SELECT CAST(f.cohort_month AS DATE) AS cohort_month,
             CAST(date_diff('month', f.cohort_month,
                            date_trunc('month', o.o_orderdate)) AS INT)
               AS age_months,
             CAST(o.o_totalprice AS DECIMAL(18,4)) AS rev
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    ),
    agg AS (
      SELECT cohort_month, age_months,
             COUNT(*) AS n_orders,
             CAST(SUM(rev) AS DECIMAL(38,4)) AS revenue
      FROM enriched GROUP BY 1, 2
    )
    SELECT cohort_month, age_months, n_orders, revenue,
           CAST(SUM(revenue) OVER (
             PARTITION BY cohort_month ORDER BY age_months)
             AS DECIMAL(38,4)) AS cum_revenue
    FROM agg
    """,
)
def ext_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers grouped by first-order
    month, revenue accumulated by whole-month age — the LTV matrix that
    turns the reference's static revenue pivots into a retention-aware
    view. First-order months shuffle on o_custkey and broadcast back;
    the cumulative window runs per cohort over the aggregated
    (cohort x age) frame — thousands of rows regardless of fact size,
    so the window never sees raw orders. Decimal sums keep the running
    totals exact at any parallelism."""
    orders = load_table(spark, sf_dir, "orders")
    month = F.to_date(F.date_trunc("month", F.col("o_orderdate")))
    firsts = orders.groupBy("o_custkey").agg(F.min(month).alias("cohort_month"))
    enriched = orders.join(firsts, "o_custkey").select(
        F.col("cohort_month"),
        F.months_between(month, F.col("cohort_month")).cast("int").alias("age_months"),
        dec(F.col("o_totalprice")).alias("rev"),
    )
    agg = enriched.groupBy("cohort_month", "age_months").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("rev").cast(AGG_DECIMAL).alias("revenue"),
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return agg.withColumn("cum_revenue", F.sum("revenue").over(w).cast(AGG_DECIMAL))


@register(
    "ext_benford_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders
    ),
    n AS (SELECT COUNT(*) AS total FROM d)
    SELECT digit,
           COUNT(*) AS n,
           CAST(COUNT(*) AS DOUBLE) / CAST(n.total AS DOUBLE) AS observed,
           ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS expected
    FROM d CROSS JOIN n
    GROUP BY digit, n.total
    """,
)
def ext_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    forensic screen for fabricated amounts. The leading digit comes from
    the DECIMAL's canonical string form (identical in both engines; no
    log/mantissa float math on the extraction path), counted in one hash
    aggregate against the total. Expected shares round log10 to 6
    decimals over 1-ulp libm noise. Map-side partials make the shuffle
    9 rows wide no matter how many orders exist."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        F.substring(F.col("o_totalprice").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    n = d.agg(F.count(F.lit(1)).alias("total"))
    return (
        d.crossJoin(F.broadcast(n))
        .groupBy("digit", "total")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "digit",
            "n",
            (F.col("n").cast("double") / F.col("total").cast("double")).alias(
                "observed"
            ),
            F.round(
                F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")), 6
            ).alias("expected"),
        )
    )


@register(
    "ext_pareto_concentration",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4))
               AS rev
      FROM orders GROUP BY 1
    ),
    cut AS (
      SELECT quantile_cont(CAST(rev AS DOUBLE), 0.9) AS p90 FROM per_cust
    )
    SELECT COUNT(*) AS n_customers,
           COUNT(*) FILTER (WHERE CAST(rev AS DOUBLE) > p90) AS n_top,
           CAST(SUM(rev) AS DECIMAL(38,4)) AS total_rev,
           CAST(SUM(rev) FILTER (WHERE CAST(rev AS DOUBLE) > p90)
                AS DECIMAL(38,4)) AS top_rev,
           CAST(SUM(rev) FILTER (WHERE CAST(rev AS DOUBLE) > p90) AS DOUBLE)
             / CAST(SUM(rev) AS DOUBLE) AS top_share
    FROM per_cust CROSS JOIN cut
    """,
)
def ext_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration ('do 10% of customers carry the book?'):
    share of total revenue held by customers above the P90 per-customer
    revenue cutpoint. The cutpoint is one percentile over the
    customer-sized frame riding a broadcast — no global sort of
    customers, which is the trap a naive top-decile-by-ranking
    implementation hits at scale. Decimal sums, one final division."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(dec(F.col("o_totalprice"))).cast(AGG_DECIMAL).alias("rev")
    )
    cut = per_cust.agg(
        F.expr("percentile(CAST(rev AS DOUBLE), 0.9D)").alias("p90")
    )
    top = F.col("rev").cast("double") > F.col("p90")
    return (
        per_cust.crossJoin(F.broadcast(cut))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.count(F.when(top, 1)).alias("n_top"),
            F.sum("rev").cast(AGG_DECIMAL).alias("total_rev"),
            F.sum(F.when(top, F.col("rev"))).cast(AGG_DECIMAL).alias("top_rev"),
            (
                F.sum(F.when(top, F.col("rev"))).cast("double")
                / F.sum("rev").cast("double")
            ).alias("top_share"),
        )
    )


@register(
    "ext_seasonality_dow",
    oracle="""
    WITH agg AS (
      SELECT dayname(o_orderdate) AS dow,
             o_orderpriority AS priority,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4))
               AS revenue
      FROM orders GROUP BY 1, 2
    )
    SELECT dow, priority, n_orders, revenue,
           CAST(revenue AS DOUBLE)
             / CAST(SUM(revenue) OVER (PARTITION BY priority) AS DOUBLE)
             AS dow_share
    FROM agg
    """,
)
def ext_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality per order priority: order counts, exact
    decimal revenue, and each weekday's share of its priority's total.
    Weekday comes from the locale-stable name ('Monday'...), matching
    DuckDB's dayname() — numeric dayofweek() is a cross-engine trap
    (Spark counts Sunday=1, DuckDB Sunday=0). The share window runs on
    the 7 x priorities aggregate, not the fact table, and the division
    happens once per output row on exact decimal totals."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy(
        F.date_format("o_orderdate", "EEEE").alias("dow"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec(F.col("o_totalprice"))).cast(AGG_DECIMAL).alias("revenue"),
    )
    w = Window.partitionBy("priority")
    return agg.withColumn(
        "dow_share",
        F.col("revenue").cast("double") / F.sum("revenue").over(w).cast("double"),
    )


@register(
    "ext_skyline_products",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def ext_skyline_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-front) query: parts not dominated on
    (cheaper price, larger size) — the multi-criteria shortlist
    operator. Spelled as a LEFT ANTI non-equi self-join, exactly the
    oracle's NOT EXISTS; duplicates of the same (price, size) point
    survive together because domination requires strict improvement in
    one dimension.

    The dimension side broadcasts (part is dimension-sized here and in
    any star schema). For a fact-sized skyline the standard scale path
    is sort-by-price then a running-max-size sweep per partition +
    merge of partition frontiers — O(n log n) instead of the quadratic
    nested loop; the anti-join spelling is kept because it is the
    direct oracle-checkable semantics at dimension cardinality."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    q = F.broadcast(
        part.select(
            F.col("p_retailprice").alias("q_price"), F.col("p_size").alias("q_size")
        )
    )
    dominated = (
        (F.col("q_price") <= F.col("p_retailprice"))
        & (F.col("q_size") >= F.col("p_size"))
        & ((F.col("q_price") < F.col("p_retailprice")) | (F.col("q_size") > F.col("p_size")))
    )
    return part.join(q, dominated, "left_anti")


@register(
    "ext_eb_shrunk_rates",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey, COUNT(*) AS n,
             COUNT(*) FILTER (WHERE l_returnflag = 'R') AS r,
             CAST(ROUND(CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS DOUBLE)
                        / COUNT(*), 6) AS DECIMAL(9,6)) AS rr
      FROM lineitem GROUP BY l_partkey
    ),
    mom AS (
      SELECT COUNT(*) AS k,
             CAST(SUM(rr) AS DOUBLE) AS s1,
             CAST(SUM(rr * rr) AS DOUBLE) AS s2
      FROM per_part
    ),
    prior AS (
      SELECT (s1 / k) * (1.0 - s1 / k) / ((s2 - s1 * s1 / k) / k) - 1.0 AS ab,
             (s1 / k) * ((s1 / k) * (1.0 - s1 / k) / ((s2 - s1 * s1 / k) / k) - 1.0)
               AS alpha
      FROM mom
    )
    SELECT p.l_partkey, CAST(p.n AS BIGINT) AS n_lines, CAST(p.r AS BIGINT) AS n_returned,
           CAST(p.rr AS DOUBLE) AS raw_rate,
           (p.r + pr.alpha) / (p.n + pr.ab) AS shrunk_rate
    FROM per_part p CROSS JOIN prior pr
    """,
)
def ext_eb_shrunk_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-part return rates: a
    beta-binomial prior moment-matched from the observed rate
    distribution (alpha+beta = m(1-m)/v - 1), then every part's rate
    shrinks toward the global mean in proportion to its evidence —
    shrunk = (r + alpha)/(n + alpha + beta). The standard fix for
    small-n rate rankings (a 1/1 part must not outrank a 45/50 part).

    Exactness: raw rates quantize to 6dp DECIMAL before the moment
    sums (a plain double SUM over parts is partition-order-dependent —
    the corr_ols discipline), and the prior/shrinkage algebra is scalar
    double math spelled identically in both engines. Scale shape: one
    per-part aggregate, a 1-row moment re-aggregate broadcast back, and
    a map-side shrink — two exchanges total at any corpus size."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("r"),
    ).withColumn(
        "rr",
        F.round(F.col("r").cast("double") / F.col("n"), 6).cast("decimal(9,6)"),
    )
    mom = per_part.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("rr").cast("double").alias("s1"),
        F.sum(F.col("rr") * F.col("rr")).cast("double").alias("s2"),
    )
    k, s1, s2 = F.col("k"), F.col("s1"), F.col("s2")
    m = s1 / k
    v = (s2 - s1 * s1 / k) / k
    ab = m * (F.lit(1.0) - m) / v - F.lit(1.0)
    prior = mom.select(ab.alias("ab"), (m * ab).alias("alpha"))
    return per_part.crossJoin(F.broadcast(prior)).select(
        "l_partkey",
        F.col("n").cast("long").alias("n_lines"),
        F.col("r").cast("long").alias("n_returned"),
        F.col("rr").cast("double").alias("raw_rate"),
        ((F.col("r") + F.col("alpha")) / (F.col("n") + F.col("ab"))).alias("shrunk_rate"),
    )
