"""Market-structure metrics: inter-purchase cadence per market segment
and supplier revenue concentration (Herfindahl-Hirschman index) per
nation.

The reference's BI layer reports revenue levels and counts
(BusinessAnalysis...Rmd:90-165); these answer the follow-on structural
questions — how often do customers come back, and is supply
concentrated in few hands — that demand-forecasting and procurement-risk
reviews ask next.

Exactness: gaps are integer day counts (lag over a deterministic
order), so averages are one exact-int division; HHI is computed as
SUM(rev²)/SUM(rev)² where both sums are fixed-scale decimals (exact,
order-insensitive) and the single double division is rounded to 6dp —
the engine convention over 1-ulp cast noise. Spark percentile() ==
DuckDB quantile_cont bit-for-bit (same linear interpolation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

_DISC_PRICE = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "CAST(1.0 - CAST(l_discount AS DECIMAL(9,4)) AS DECIMAL(9,4)) "
    "AS DECIMAL(18,6))"
)


@register(
    "ext_purchase_intervals",
    oracle="""
    WITH g AS (
      SELECT o_custkey, o_orderdate,
             lag(o_orderdate) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev
      FROM orders
    ),
    gaps AS (
      SELECT o_custkey,
             CAST(date_diff('day', prev, o_orderdate) AS BIGINT) AS gap_days
      FROM g WHERE prev IS NOT NULL
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_gaps,
           CAST(SUM(gap_days) AS DOUBLE) / COUNT(*) AS avg_gap_days,
           quantile_cont(gap_days, 0.5) AS median_gap_days,
           quantile_cont(gap_days, 0.9) AS p90_gap_days
    FROM gaps JOIN customer c ON gaps.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def ext_purchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase cadence: days between a customer's consecutive
    orders (lag window, deterministic (date, orderkey) order), rolled up
    to count/mean/median/p90 per market segment. The lag window hash-
    partitions orders on o_custkey — exactly the key the customer join
    needs next, so the window's shuffle is reused and the join adds no
    orders-side exchange. Gaps are exact integer day counts; the mean is
    one int division and the percentiles interpolate identically in both
    engines."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    gaps = (
        o.withColumn("prev", F.lag("o_orderdate").over(w))
        .where(F.col("prev").isNotNull())
        .select(
            "o_custkey",
            F.datediff("o_orderdate", "prev").cast("long").alias("gap_days"),
        )
    )
    pct = F.percentile("gap_days", F.array(F.lit(0.5), F.lit(0.9)))
    return (
        gaps.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            (F.sum("gap_days").cast("double") / F.count(F.lit(1))).alias(
                "avg_gap_days"
            ),
            pct.alias("_pct"),
        )
        .select(
            "c_mktsegment",
            "n_gaps",
            "avg_gap_days",
            F.element_at("_pct", 1).alias("median_gap_days"),
            F.element_at("_pct", 2).alias("p90_gap_days"),
        )
    )


@register(
    "ext_supplier_hhi",
    oracle=f"""
    WITH srev AS (
      SELECT s.s_nationkey, l.l_suppkey,
             CAST(SUM({_DISC_PRICE}) AS DECIMAL(18,6)) AS rev
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    )
    SELECT n.n_name,
           COUNT(*) AS n_suppliers,
           CAST(SUM(rev) AS DECIMAL(38,6)) AS total_rev,
           ROUND(CAST(SUM(CAST(CAST(rev AS DECIMAL(19,6))
                              * CAST(rev AS DECIMAL(19,6))
                              AS DECIMAL(38,12))) AS DOUBLE)
                 / (CAST(SUM(rev) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE)),
                 6) AS hhi
    FROM srev JOIN nation n ON srev.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def ext_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier concentration per nation: Herfindahl-Hirschman index of
    revenue shares, HHI = Σ share² = Σ rev² / (Σ rev)² — the antitrust /
    procurement-risk concentration gauge (1/n = even split, 1 =
    monopoly). The algebraic identity matters at scale: shares never
    materialize, so the whole metric is two decimal SUMs (exact,
    order-insensitive) per nation after ONE lineitem shuffle on
    (nationkey, suppkey); the final double division happens once per
    nation row and is rounded to 6dp. Supplier and nation ride
    broadcasts — lineitem is the only shuffled input."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    srev = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(F.expr(_DISC_PRICE)).cast("decimal(18,6)").alias("rev"))
    )
    sum_rev = F.sum("rev").cast("decimal(38,6)")
    sum_sq = F.sum((F.col("rev") * F.col("rev")).cast("decimal(38,12)"))
    return (
        srev.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            sum_rev.alias("total_rev"),
            F.round(
                sum_sq.cast("double")
                / (sum_rev.cast("double") * sum_rev.cast("double")),
                6,
            ).alias("hhi"),
        )
    )
