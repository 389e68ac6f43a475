"""SURVEY §2 operator inventory, ops 01-41.

Each op is one registered query over the driver testdata exercising the
reference operator's semantics (citations in each docstring point at the
reference implementation under /root/reference). Each has a DuckDB oracle
unless noted. Conventions (SURVEY §5.2):

- every computed column aliased identically in Spark and oracle SQL
- money/measure aggregates via the decimal-cast pattern (functions.money)
- date parts cast to INT in the oracle (DuckDB returns BIGINT)
- top-k always carries a total deterministic ORDER BY
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.dates import (
    date_spine,
    month_name,
    smart_date_key,
    week_of_year_noniso,
)
from ..functions.money import AGG_DECIMAL, ROW_DECIMAL, dec, money_avg, money_sum
from ..sources import load_table
from .registry import register

# Shared expression: the engine's canonical revenue measure
# (reference revenue = UnitPrice * Quantity, ` loadAnalyticsDB...R`:428;
# here l_extendedprice * (1 - l_discount) per FIXTURES.md §A).
REVENUE = "l_extendedprice * (1 - l_discount)"


def _revenue_col() -> F.Column:
    return F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))


# --------------------------------------------------------------------------
# A. Scans / sources / sinks (ops 01-05)
# --------------------------------------------------------------------------


@register(
    "op01_source_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    """,
)
def op01_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source scan + projection (reference: dbGetQuery full scans,
    ` loadAnalyticsDB...R`:44-53). Column pruning reaches the parquet
    reader — ReadSchema carries only 4 of 11 lineitem columns."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@register(
    "op02_sink_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
    """,
)
def op02_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched sink (reference: hand-batched INSERT text,
    ` loadAnalyticsDB...R`:106-134,445-519). Spark writers batch per
    partition natively; verified by writing parquet and scanning it back."""
    out = os.path.join(tempfile.gettempdir(), "fmes_sink", os.path.basename(sf_dir.rstrip("/")))
    df = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus")
    df.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


@register(
    "op03_dedup_on_load",
    oracle="""
    SELECT c_nationkey, c_mktsegment, MIN(c_custkey) AS first_custkey
    FROM customer GROUP BY c_nationkey, c_mktsegment
    """,
)
def op03_dedup_on_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent insert / dedup-on-load (reference: INSERT IGNORE vs unique
    key, createStarSchema...R:97, ` loadAnalyticsDB...R`:199-201). Spark
    spelling: keep one deterministic survivor per key (min id) — unlike
    dropDuplicates, reproducible under any partitioning."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.min("c_custkey").alias("first_custkey"))
    )


@register(
    "op04_ddl_view",
    oracle="""
    SELECT r_regionkey, r_name FROM region
    """,
)
def op04_ddl_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDL create/drop (reference: DROP/CREATE TABLE, createStarSchema...R:
    41-53,56-182). Spark: schema-on-write + CREATE OR REPLACE [TEMP] VIEW;
    secondary indexes are a no-op (parquet stats replace them)."""
    load_table(spark, sf_dir, "region").createOrReplaceTempView("op04_region_v")
    return spark.sql("SELECT r_regionkey, r_name FROM op04_region_v")


@register(
    "op05_date_spine",
    oracle="""
    WITH b AS (
      SELECT CAST(MIN(o_orderdate) AS DATE) - 30 AS lo,
             CAST(MAX(o_orderdate) AS DATE) + 30 AS hi
      FROM orders
    ), days AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS date FROM b
    )
    SELECT date,
           CAST(strftime(date, '%Y%m%d') AS INT) AS date_key,
           CAST(year(date) AS INT) AS year,
           CAST(quarter(date) AS INT) AS quarter,
           CAST(month(date) AS INT) AS month,
           monthname(date) AS month_name,
           CAST(dayofmonth(date) AS INT) AS day,
           CAST(((dayofyear(date) - 1) // 7) + 1 AS INT) AS week
    FROM days
    """,
)
def op05_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row generator / date spine ±30-day buffer (reference:
    seq(start-30, end+30, by='day'), ` loadAnalyticsDB...R`:89-92) with the
    full dim_date attribute set, including the NON-ISO week
    (` loadAnalyticsDB...R`:103)."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    ).first()
    spine = date_spine(spark, F.lit(bounds["lo"]), F.lit(bounds["hi"]), buffer_days=30)
    d = F.col("date")
    return spine.select(
        d,
        smart_date_key(d).alias("date_key"),
        F.year(d).alias("year"),
        F.quarter(d).alias("quarter"),
        F.month(d).alias("month"),
        month_name(d).alias("month_name"),
        F.dayofmonth(d).alias("day"),
        week_of_year_noniso(d).alias("week"),
    )


# --------------------------------------------------------------------------
# B. Projections / filters / scalar predicates (ops 06-13)
# --------------------------------------------------------------------------


@register(
    "op06_project_rename",
    oracle="""
    SELECT c_custkey AS customer_id, c_name AS name, c_mktsegment AS customer_type
    FROM customer
    """,
)
def op06_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project + rename (reference extract projections,
    ` loadAnalyticsDB...R`:144-168,219-250)."""
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("customer_type"),
    )


@register(
    "op07_filter_notnull",
    oracle="""
    SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderdate IS NOT NULL
    """,
)
def op07_filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-rejection filter (reference: WHERE payment_date IS NOT NULL,
    ` loadAnalyticsDB...R`:411). Pushed to the parquet scan."""
    return (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate").isNotNull())
        .select("o_orderkey", "o_orderdate")
    )


@register(
    "op08_filter_compare",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 1000
    """,
)
def op08_filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison filter (reference: WHERE p.amount > 0,
    ` loadAnalyticsDB...R`:412). PushedFilters: GreaterThan(o_totalprice,1000)."""
    return (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 1000)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "op09_filter_inlist",
    oracle="""
    SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS year, o_orderpriority
    FROM orders
    WHERE CAST(year(o_orderdate) AS INT) IN (1995, 1996, 1997)
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def op09_filter_inlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list filter (reference: year IN (...) AND country IN (...),
    BusinessAnalysis...Rmd:363-364,422-423)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("year"),
        "o_orderpriority",
    ).where(
        F.col("year").isin(1995, 1996, 1997)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )


@register(
    "op10_case_when",
    oracle="""
    SELECT CASE WHEN o_orderstatus = 'O' THEN 'OPEN'
                WHEN o_orderstatus = 'F' THEN 'FINISHED'
                ELSE o_orderstatus END AS status_std,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def op10_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN scalar standardization (reference: 'USA' -> 'United
    States', ` loadAnalyticsDB...R`:159-163) — rewritten values must merge
    in downstream group-bys, hence the aggregation here."""
    o = load_table(spark, sf_dir, "orders")
    status_std = (
        F.when(F.col("o_orderstatus") == "O", "OPEN")
        .when(F.col("o_orderstatus") == "F", "FINISHED")
        .otherwise(F.col("o_orderstatus"))
        .alias("status_std")
    )
    return o.select(status_std).groupBy("status_std").agg(F.count(F.lit(1)).alias("n"))


@register(
    "op11_coalesce",
    oracle="""
    SELECT o.o_orderkey, COALESCE(c.c_nationkey, -1) AS nation_or_default
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def op11_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE with sentinel default (reference: COALESCE(film_id, -1),
    ` loadAnalyticsDB...R`:400)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", F.coalesce(F.col("c_nationkey"), F.lit(-1)).alias("nation_or_default")
    )


@register(
    "op12_arith_derived",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(({REVENUE}) AS DECIMAL(18,4)) AS revenue,
           l_suppkey + 10000 AS shifted_suppkey
    FROM lineitem
    """,
)
def op12_arith_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic derived columns: revenue = price x qty analogue
    (` loadAnalyticsDB...R`:428) and the +10000 cross-source ID offset
    (` loadAnalyticsDB...R`:256,337,442-443)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dec(_revenue_col(), ROW_DECIMAL).alias("revenue"),
        (F.col("l_suppkey") + F.lit(10000)).alias("shifted_suppkey"),
    )


@register(
    "op13_literals",
    oracle="""
    SELECT c_custkey, 'film' AS customer_type, 1 AS units_sold,
           CAST(NULL AS VARCHAR) AS state
    FROM customer
    """,
)
def op13_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal/constant columns (reference: 'film' AS customer_type, 1 AS
    units_sold, NULL AS state; ` loadAnalyticsDB...R`:148-149,313-315,401)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.lit("film").alias("customer_type"),
        F.lit(1).alias("units_sold"),
        F.lit(None).cast("string").alias("state"),
    )


# --------------------------------------------------------------------------
# C. Joins (ops 14-17)
# --------------------------------------------------------------------------


def _sales_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region — the engine's
    snowflake walk (reference: customer ⋈ address ⋈ city ⋈ country,
    ` loadAnalyticsDB...R`:150-153,229-232). nation/region are tiny and
    broadcast; customer broadcasts at bench scale too (AQE promotes)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )


_SALES_GEO_SQL = """
      lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
"""


@register(
    "op14_multiway_inner_join",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_lineitems,
           CAST(SUM(CAST(({REVENUE}) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS total_revenue
    FROM {_SALES_GEO_SQL}
    GROUP BY r.r_name, n.n_name
    """,
)
def op14_multiway_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way INNER equi-join snowflake walk + aggregate (reference 4/5-way
    joins, ` loadAnalyticsDB...R`:150-153,404-407)."""
    return (
        _sales_geo(spark, sf_dir)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            money_sum(_revenue_col(), "total_revenue"),
        )
    )


@register(
    "op15_left_join_chain",
    oracle="""
    SELECT o.o_orderkey, c.c_name, n.n_name
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def op15_left_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join chain (reference: film ⟕ film_category ⟕ category;
    payment ⟕ rental ⟕ inventory ⟕ film, ` loadAnalyticsDB...R`:317-318,
    408-410): NULLs propagate, no row loss on the left."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .join(n, c.c_nationkey == n.n_nationkey, "left")
        .select("o_orderkey", "c_name", "n_name")
    )


@register(
    "op16_topk_semijoin",
    oracle=f"""
    WITH nation_rev AS (
      SELECT n.n_name AS nation,
             CAST(SUM(CAST(({REVENUE}) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS total_revenue
      FROM {_SALES_GEO_SQL}
      GROUP BY n.n_name
    ), top5 AS (
      SELECT nation FROM nation_rev ORDER BY total_revenue DESC, nation ASC LIMIT 5
    )
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS year,
           CAST(SUM(CAST(({REVENUE}) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue
    FROM {_SALES_GEO_SQL}
    JOIN top5 t ON n.n_name = t.nation
    GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INT)
    """,
)
def op16_topk_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join vs aggregated derived table: restrict facts to the top-5 revenue
    nations then re-aggregate by (nation, year) (reference pattern:
    BusinessAnalysis...Rmd:156-163,221-227). The tiny top-k side is
    broadcast — no shuffle of the fact table for the restriction."""
    sales = _sales_geo(spark, sf_dir)
    top5 = (
        sales.groupBy("n_name")
        .agg(money_sum(_revenue_col(), "total_revenue"))
        .orderBy(F.desc("total_revenue"), F.asc("n_name"))
        .limit(5)
        .select("n_name")
    )
    return (
        sales.join(F.broadcast(top5), "n_name")
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("year"))
        .agg(money_sum(_revenue_col(), "revenue"))
    )


@register(
    "op17_lookup_join_default",
    oracle="""
    WITH dim AS (
      SELECT c_custkey AS customer_id, c_nationkey
      FROM customer WHERE c_custkey % 3 <> 0
    )
    SELECT o.o_orderkey,
           COALESCE(d.customer_id, 1) AS customer_key,
           CASE WHEN d.customer_id IS NULL THEN 1 ELSE 0 END AS used_fallback
    FROM orders o LEFT JOIN dim d ON o.o_custkey = d.customer_id
    """,
)
def op17_lookup_join_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-key lookup with fallback default (reference: per-row
    which() scans with fallback key 1 / NULL, ` loadAnalyticsDB...R`:
    469-480). The O(rows x dim) driver loop becomes a broadcast hash join;
    a filtered dim manufactures genuine misses so the fallback fires."""
    o = load_table(spark, sf_dir, "orders")
    dim = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 3 != 0)
        .select(F.col("c_custkey").alias("customer_id"), "c_nationkey")
    )
    joined = o.join(F.broadcast(dim), o.o_custkey == dim.customer_id, "left")
    return joined.select(
        "o_orderkey",
        F.coalesce(F.col("customer_id"), F.lit(1)).alias("customer_key"),
        F.when(F.col("customer_id").isNull(), 1).otherwise(0).alias("used_fallback"),
    )


# --------------------------------------------------------------------------
# D. Aggregations (ops 18-26)
# --------------------------------------------------------------------------


@register(
    "op18_min_max",
    oracle="""
    SELECT MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date,
           CAST(MIN(year(o_orderdate)) AS INT) AS min_year,
           CAST(MAX(year(o_orderdate)) AS INT) AS max_year
    FROM orders
    """,
)
def op18_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX date-range detection (reference ` loadAnalyticsDB...R`:60-84;
    BusinessAnalysis...Rmd:522-523)."""
    return load_table(spark, sf_dir, "orders").agg(
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
        F.min(F.year("o_orderdate")).alias("min_year"),
        F.max(F.year("o_orderdate")).alias("max_year"),
    )


@register(
    "op19_sum_grouped",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS year,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS total_revenue
    FROM orders GROUP BY 1
    """,
)
def op19_sum_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped SUM (reference: SUM(revenue) by year,
    BusinessAnalysis...Rmd:91-93). Partial (map-side) + final aggregation
    is Spark's default hash aggregate."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("year"))
        .agg(money_sum(F.col("o_totalprice"), "total_revenue"))
    )


@register(
    "op20_avg",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def op20_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVG (reference: AVG(fs.revenue) per country,
    BusinessAnalysis...Rmd:154). Exact-numerator formulation so Spark and
    the oracle agree bit-for-bit (functions.money)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(money_avg(F.col("o_totalprice"), "avg_price"))
    )


@register(
    "op21_count",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_customers
    FROM customer GROUP BY c_nationkey
    """,
)
def op21_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) per group (reference: customers per country,
    BusinessAnalysis...Rmd:203)."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "op22_count_distinct",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS year,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders GROUP BY 1
    """,
)
def op22_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) (reference BusinessAnalysis...Rmd:192-194,
    525-526). Exact (expand + two-phase agg) because the oracle hashes
    values; approx_count_distinct is the documented at-scale alternative."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("year"))
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
    )


@register(
    "op23_groupby_multi",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INT) AS year,
           CAST(quarter(o.o_orderdate) AS INT) AS quarter,
           p.p_type AS product_type,
           CAST(SUM(CAST(({REVENUE}) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2, 3
    """,
)
def op23_groupby_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-key GROUP BY (reference: GROUP BY year, quarter, product_type,
    BusinessAnalysis...Rmd:320)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.year("o_orderdate").alias("year"),
            F.quarter("o_orderdate").alias("quarter"),
            F.col("p_type").alias("product_type"),
        )
        .agg(money_sum(_revenue_col(), "revenue"))
    )


def _quarter_case(q: int) -> str:
    return (
        f"CAST(SUM(CAST(CASE WHEN quarter(o.o_orderdate) = {q} THEN ({REVENUE}) "
        f"ELSE 0 END AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS q{q}"
    )


@register(
    "op24_conditional_pivot",
    oracle=f"""
    SELECT n.n_name AS nation,
           {_quarter_case(1)}, {_quarter_case(2)}, {_quarter_case(3)}, {_quarter_case(4)}
    FROM {_SALES_GEO_SQL}
    GROUP BY n.n_name
    """,
)
def op24_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation / manual PIVOT (reference:
    SUM(CASE WHEN quarter=q THEN revenue ELSE 0 END) per quarter column,
    BusinessAnalysis...Rmd:150-153). One shuffle produces all 4 columns."""
    sales = _sales_geo(spark, sf_dir).withColumn("quarter", F.quarter("o_orderdate"))
    aggs = [
        F.sum(
            dec(F.when(F.col("quarter") == q, _revenue_col()).otherwise(F.lit(0)), ROW_DECIMAL)
        )
        .cast(AGG_DECIMAL)
        .alias(f"q{q}")
        for q in (1, 2, 3, 4)
    ]
    return sales.groupBy(F.col("n_name").alias("nation")).agg(*aggs)


@register(
    "op25_distinct",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
)
def op25_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (reference: SELECT DISTINCT locations,
    ` loadAnalyticsDB...R`:144-168)."""
    return load_table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


@register(
    "op26_rollup",
    oracle=f"""
    SELECT COALESCE(r.r_name, 'ALL') AS region,
           COALESCE(CAST(year(o.o_orderdate) AS INT), -1) AS year,
           GROUPING(r.r_name, CAST(year(o.o_orderdate) AS INT)) AS gid,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS total_units,
           CAST(SUM(CAST(({REVENUE}) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS total_revenue
    FROM {_SALES_GEO_SQL}
    GROUP BY ROLLUP(r.r_name, CAST(year(o.o_orderdate) AS INT))
    """,
)
def op26_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level totals via ROLLUP (reference computes grand totals and
    subtotals client-side in R — rowSums/rowMeans loops,
    BusinessAnalysis...Rmd:287-288,459-490 — the one computation the
    reference does outside SQL that Spark has as a native operator).
    Subtotal rows carry SENTINELS ('ALL' / -1) instead of NULL group
    keys: the gid column already disambiguates levels, and a NULL in an
    integer column would cross the driver boundary as pandas float64
    (the decimal trap again, queries/registry.py); the source columns
    are never null so the sentinels are unambiguous."""
    sales = _sales_geo(spark, sf_dir).select(
        F.col("r_name").alias("region"),
        F.year("o_orderdate").alias("year"),
        dec(F.col("l_quantity"), ROW_DECIMAL).alias("units"),
        dec(_revenue_col(), ROW_DECIMAL).alias("rev"),
    )
    return (
        sales.rollup("region", "year")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum("units").cast(AGG_DECIMAL).alias("total_units"),
            F.sum("rev").cast(AGG_DECIMAL).alias("total_revenue"),
        )
        .select(
            F.coalesce(F.col("region"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("year"), F.lit(-1)).alias("year"),
            "gid",
            "total_units",
            "total_revenue",
        )
    )


# --------------------------------------------------------------------------
# E. Window functions (op 27)
# --------------------------------------------------------------------------


@register(
    "op27_window_to_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS year,
           CAST(quarter(o_orderdate) AS INT) AS quarter,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY year(o_orderdate)
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DECIMAL(38,4)) AS revenue_ytd,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY year(o_orderdate), quarter(o_orderdate)
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DECIMAL(38,4)) AS revenue_qtd
    FROM orders
    """,
)
def op27_window_to_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YTD/QTD cumulative measures (reference declares revenue_ytd/qtd/mtd
    on the fact, createStarSchema...R:153-158, but never populates them —
    this engine does, per SURVEY op 27). Deterministic frame: ORDER BY
    date, orderkey tiebreak."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("year"),
        F.quarter("o_orderdate").alias("quarter"),
        "o_orderdate",
        dec(F.col("o_totalprice"), ROW_DECIMAL).alias("price"),
    )
    frame = (Window.unboundedPreceding, Window.currentRow)
    w_y = Window.partitionBy("year").orderBy("o_orderdate", "o_orderkey").rowsBetween(*frame)
    w_q = (
        Window.partitionBy("year", "quarter")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(*frame)
    )
    return base.select(
        "o_orderkey",
        "year",
        "quarter",
        F.sum("price").over(w_y).cast(AGG_DECIMAL).alias("revenue_ytd"),
        F.sum("price").over(w_q).cast(AGG_DECIMAL).alias("revenue_qtd"),
    )


# --------------------------------------------------------------------------
# F. Sorts / limits / top-k (ops 28-29)
# --------------------------------------------------------------------------


@register(
    "op28_orderby",
    oracle="""
    SELECT c_nationkey,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS total_balance
    FROM customer GROUP BY c_nationkey
    ORDER BY total_balance DESC, c_nationkey ASC
    """,
)
def op28_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY aggregate result (reference: ORDER BY total_revenue DESC,
    BusinessAnalysis...Rmd:94). Global sort = range-partition exchange."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.sum(dec(F.col("c_acctbal"))).cast(AGG_DECIMAL).alias("total_balance"))
        .orderBy(F.desc("total_balance"), F.asc("c_nationkey"))
    )


@register(
    "op29_topk_limit",
    oracle=f"""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS year,
           CAST(SUM(CAST(({REVENUE}) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue
    FROM {_SALES_GEO_SQL}
    GROUP BY 1, 2
    ORDER BY revenue DESC, nation ASC, year ASC
    LIMIT 5
    """,
)
def op29_topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k after sort (reference LIMIT 1/2/5 patterns,
    BusinessAnalysis...Rmd:95,105,125). Spark plans TakeOrderedAndProject —
    per-partition heap + driver merge, no global sort. Deterministic
    tiebreakers (nation, year) per SURVEY §5.2."""
    return (
        _sales_geo(spark, sf_dir)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("year"))
        .agg(money_sum(_revenue_col(), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("nation"), F.asc("year"))
        .limit(5)
    )


# --------------------------------------------------------------------------
# G. Set operations (ops 30-31)
# --------------------------------------------------------------------------


@register(
    "op30_union_all",
    oracle="""
    SELECT c_custkey AS entity_id, c_name AS name, 'customer' AS entity_type
    FROM customer
    UNION ALL
    SELECT s_suppkey + 10000 AS entity_id, s_name AS name, 'supplier' AS entity_type
    FROM supplier
    """,
)
def op30_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two aligned projections (reference: rbind(film_X,
    music_X) with the +10000 key offset, ` loadAnalyticsDB...R`:174,
    256,521-526). unionByName — position-independent, schema-checked."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("name"),
        F.lit("customer").alias("entity_type"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") + F.lit(10000)).alias("entity_id"),
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("entity_type"),
    )
    return c.unionByName(s)


@register(
    "op31_union_dedup",
    oracle="""
    SELECT DISTINCT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    )
    """,
)
def op31_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION + dedup (reference: unique(rbind(...)),
    ` loadAnalyticsDB...R`:174-175)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


# --------------------------------------------------------------------------
# H. Scalar functions (ops 32-41)
# --------------------------------------------------------------------------


@register(
    "op32_date_trunc",
    oracle="""
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date FROM orders
    """,
)
def op32_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE() truncation datetime -> date (reference DATE(p.payment_date),
    ` loadAnalyticsDB...R`:395)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("order_date")
    )


@register(
    "op33_date_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS year,
           CAST(quarter(o_orderdate) AS INT) AS quarter,
           CAST(month(o_orderdate) AS INT) AS month,
           CAST(dayofmonth(o_orderdate) AS INT) AS day
    FROM orders
    """,
)
def op33_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction (reference lubridate year/quarter/month/day,
    ` loadAnalyticsDB...R`:98-102)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("year"),
        F.quarter("o_orderdate").alias("quarter"),
        F.month("o_orderdate").alias("month"),
        F.dayofmonth("o_orderdate").alias("day"),
    )


@register(
    "op34_month_name",
    oracle="""
    SELECT DISTINCT CAST(month(o_orderdate) AS INT) AS month,
           monthname(o_orderdate) AS month_name
    FROM orders
    """,
)
def op34_month_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month name (reference format(d, '%B'), ` loadAnalyticsDB...R`:101)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            F.month("o_orderdate").alias("month"),
            month_name("o_orderdate").alias("month_name"),
        )
        .distinct()
    )


@register(
    "op35_week_noniso",
    oracle="""
    SELECT DISTINCT CAST(o_orderdate AS DATE) AS order_date,
           CAST(((dayofyear(o_orderdate) - 1) // 7) + 1 AS INT) AS week
    FROM orders
    """,
)
def op35_week_noniso(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NON-ISO week-of-year (reference lubridate week(d) = ((yday-1) div 7)+1,
    ` loadAnalyticsDB...R`:103). Deliberately NOT Spark weekofyear() (ISO);
    divergence shows on early-January dates — present in the data."""
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            F.to_date("o_orderdate").alias("order_date"),
            week_of_year_noniso("o_orderdate").alias("week"),
        )
        .distinct()
    )


@register(
    "op36_smart_date_key",
    oracle="""
    SELECT o_orderkey, CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS date_key
    FROM orders
    """,
)
def op36_smart_date_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smart date key int(yyyyMMdd) (reference ` loadAnalyticsDB...R`:96,466)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", smart_date_key("o_orderdate").alias("date_key")
    )


@register(
    "op37_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) - 30 AS minus_30,
           CAST(o_orderdate AS DATE) + 30 AS plus_30
    FROM orders
    """,
)
def op37_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date +- N days (reference spine buffer, ` loadAnalyticsDB...R`:89-90)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_sub(F.to_date("o_orderdate"), 30).alias("minus_30"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("plus_30"),
    )


@register(
    "op38_substring",
    oracle="""
    SELECT p_partkey, substr(p_name, 1, 10) AS name_trunc FROM part
    """,
)
def op38_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring truncation (reference substr(product_name,1,255),
    ` loadAnalyticsDB...R`:358)."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey", F.substring("p_name", 1, 10).alias("name_trunc")
    )


@register(
    "op39_string_replace",
    oracle="""
    SELECT p_partkey, regexp_replace(p_name, 'a', '@', 'g') AS name_replaced
    FROM part
    """,
)
def op39_string_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String replacement (reference gsub quote-escaping,
    ` loadAnalyticsDB...R`:193-195 — obsolete under a non-string-templated
    API; the generic analogue is regexp_replace, global by default in
    Spark)."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey", F.regexp_replace("p_name", "a", "@").alias("name_replaced")
    )


@register(
    "op40_round_format",
    oracle="""
    SELECT o_orderkey,
           CAST(o_totalprice AS DECIMAL(38,4)) AS price_2dp,
           round(o_totalprice, -1) AS price_nearest_10,
           format('{:,}', CAST(round(o_totalprice) AS BIGINT)) AS price_pretty
    FROM orders
    """,
)
def op40_round_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding & numeric formatting (reference round(x), round(x,-1),
    format(big.mark=','), BusinessAnalysis...Rmd:110,462;
    ` loadAnalyticsDB...R`:489)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        dec(F.col("o_totalprice"), AGG_DECIMAL).alias("price_2dp"),
        F.round("o_totalprice", -1).alias("price_nearest_10"),
        F.format_number(F.round("o_totalprice", 0).cast("long"), 0).alias("price_pretty"),
    )


@register(
    "op41_concat_label",
    oracle="""
    SELECT DISTINCT CAST(CAST(year(o_orderdate) AS INT) AS VARCHAR)
           || ' Q' || CAST(CAST(quarter(o_orderdate) AS INT) AS VARCHAR) AS period_label
    FROM orders
    """,
)
def op41_concat_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String concat / label building (reference '2005 Q2' labels,
    BusinessAnalysis...Rmd:327)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            F.concat(
                F.year("o_orderdate").cast("string"),
                F.lit(" Q"),
                F.quarter("o_orderdate").cast("string"),
            ).alias("period_label")
        )
        .distinct()
    )
