"""Period-over-period comparison + proportional allocation: YoY quarterly
growth and largest-remainder (Hamilton) budget allocation.

YoY growth is the comparison the reference's report builds by hand with
client-side matrix loops (BusinessAnalysis...Rmd:269-296 fills a
year x country matrix in R to eyeball year deltas); a seasonally-lagged
window expresses it in one pass. The allocation operator is the exact
integer-arithmetic pattern finance teams need on top of any revenue
share: distribute a fixed integer budget proportionally with NO
fractional units and NO lost units — floor every share, then hand the
leftover units to the largest remainders (deterministic tiebreak).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import AGG_DECIMAL, dec
from ..sources import load_table
from .registry import register


@register(
    "ext_yoy_growth",
    oracle="""
    WITH q AS (
      SELECT CAST(year(o_orderdate) AS INT) AS year,
             CAST(quarter(o_orderdate) AS INT) AS quarter,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4))
               AS revenue
      FROM orders GROUP BY 1, 2
    )
    SELECT year, quarter, revenue,
           COALESCE(LAG(revenue, 4) OVER w,
                    CAST(-1 AS DECIMAL(38,4))) AS revenue_prior_year,
           COALESCE(CASE WHEN LAG(revenue, 4) OVER w IS NOT NULL THEN
             (CAST(revenue AS DOUBLE)
              - CAST(LAG(revenue, 4) OVER w AS DOUBLE))
             / CAST(LAG(revenue, 4) OVER w AS DOUBLE)
           END, -99.0) AS yoy_growth
    FROM q
    WINDOW w AS (ORDER BY year, quarter)
    """,
)
def ext_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year quarterly revenue growth: each quarter compared to
    the same quarter one year earlier via a seasonal lag(4) over the
    quarter sequence. The window is global but ordered over the
    (year x quarter) AGGREGATE — a calendar-sized frame — so the
    single-partition sort is ~tens of rows after the one fact shuffle;
    growth is a subtract + one division on exact decimal totals."""
    orders = load_table(spark, sf_dir, "orders")
    q = orders.groupBy(
        F.year("o_orderdate").alias("year"),
        F.quarter("o_orderdate").alias("quarter"),
    ).agg(F.sum(dec(F.col("o_totalprice"))).cast(AGG_DECIMAL).alias("revenue"))
    w = Window.orderBy("year", "quarter")
    prior = F.lag("revenue", 4).over(w)
    return q.select(
        "year",
        "quarter",
        "revenue",
        # sentinels, not NULL doubles, for quarters with no year-ago
        # comparison (NaN-vs-None at the driver boundary,
        # queries/registry.py): revenue is positive so -1 is impossible,
        # and growth = rev/prior - 1 > -1 strictly, so -99.0 is too.
        F.coalesce(prior, F.lit(-1).cast(AGG_DECIMAL)).alias("revenue_prior_year"),
        F.coalesce(
            F.when(
                prior.isNotNull(),
                (F.col("revenue").cast("double") - prior.cast("double"))
                / prior.cast("double"),
            ),
            F.lit(-99.0),
        ).alias("yoy_growth"),
    )


_BUDGET_UNITS = 10000


@register(
    "ext_budget_allocation",
    oracle=f"""
    WITH per_nation AS (
      SELECT n.n_name,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4))
               AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(revenue) AS DECIMAL(38,4)) AS total FROM per_nation),
    shares AS (
      SELECT n_name, revenue,
             CAST(revenue AS DOUBLE) * {_BUDGET_UNITS}.0
               / CAST(total AS DOUBLE) AS ideal
      FROM per_nation CROSS JOIN tot
    ),
    floors AS (
      SELECT n_name, revenue, ideal,
             CAST(floor(ideal) AS BIGINT) AS base,
             ideal - floor(ideal) AS remainder
      FROM shares
    ),
    leftover AS (
      SELECT {_BUDGET_UNITS} - CAST(SUM(base) AS BIGINT) AS n_extra FROM floors
    )
    SELECT n_name, revenue, base,
           CAST(rk <= l.n_extra AS INT) AS got_extra,
           base + CAST(rk <= l.n_extra AS INT) AS allocated
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY remainder DESC, n_name ASC) AS rk
      FROM floors
    ) CROSS JOIN leftover l
    """,
)
def ext_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) allocation of a 10,000-unit budget
    across nations proportional to revenue: floor each nation's exact
    decimal share, then grant the leftover units to the largest
    fractional remainders (name tiebreak) — allocations are integers
    that sum EXACTLY to the budget, the property naive rounding loses.

    Everything after the one fact aggregate runs on a nation-sized
    frame: the share quotient is double, but both operands are decimals
    whose scaled integers sit under 2^53, so the casts are lossless and
    floors, remainders, and the remainder ranking are bit-identical
    cross-engine (decimal/decimal division itself is NOT portable —
    Spark keeps decimal, DuckDB returns double)."""
    orders = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_nation = (
        orders.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(dec(F.col("o_totalprice"))).cast(AGG_DECIMAL).alias("revenue"))
    )
    tot = per_nation.agg(F.sum("revenue").cast(AGG_DECIMAL).alias("total"))
    # share math runs in double, but every operand is an EXACT double:
    # the decimal revenue/total scaled integers stay below 2^53 (scale 4,
    # values < ~1e15 even at sf1), so the cast is lossless in both
    # engines and the *,/ sequence is bit-portable IEEE arithmetic.
    shares = per_nation.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "revenue",
        (
            F.col("revenue").cast("double")
            * F.lit(float(_BUDGET_UNITS))
            / F.col("total").cast("double")
        ).alias("ideal"),
    )
    floors = shares.select(
        "n_name",
        "revenue",
        "ideal",
        F.floor("ideal").cast("long").alias("base"),
        (F.col("ideal") - F.floor("ideal")).alias("remainder"),
    )
    leftover = floors.agg(
        (F.lit(_BUDGET_UNITS) - F.sum("base").cast("long")).alias("n_extra")
    )
    w = Window.orderBy(F.desc("remainder"), F.asc("n_name"))
    ranked = floors.withColumn("rk", F.row_number().over(w))
    got = (F.col("rk") <= F.col("n_extra")).cast("int")
    return ranked.crossJoin(F.broadcast(leftover)).select(
        "n_name",
        "revenue",
        "base",
        got.alias("got_extra"),
        (F.col("base") + got).alias("allocated"),
    )
