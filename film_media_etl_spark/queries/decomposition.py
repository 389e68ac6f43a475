"""Time-series decomposition + basket-size distribution: the remaining
descriptive shapes on the engine's time-series surface (densify, EWMA,
RANGE frames, YoY) — a centered moving-average trend split and the
order-size histogram merchandising teams read next to ABC classes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import AGG_DECIMAL, dec
from ..sources import load_table
from .registry import register


@register(
    "ext_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS total
      FROM events GROUP BY 1
    )
    SELECT d, total,
           CAST(SUM(total) OVER w AS DOUBLE) / COUNT(*) OVER w AS trend,
           CAST(total AS DOUBLE)
             - CAST(SUM(total) OVER w AS DOUBLE) / COUNT(*) OVER w AS residual,
           CAST(COUNT(*) OVER w AS INT) AS window_days
    FROM daily
    WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    """,
)
def ext_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive trend/residual split of daily event value: trend = 7-day
    CENTERED moving average (3 preceding + 3 following), residual =
    observed - trend; edge days average their truncated window (the
    reported window_days makes that explicit). The window runs over the
    calendar-sized daily aggregate — never raw events — and the mean is
    an exact decimal window-sum divided once, so trend and residual are
    bit-identical cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(dec(F.col("value"))).cast(AGG_DECIMAL).alias("total")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    trend = F.sum("total").over(w).cast("double") / F.count(F.lit(1)).over(w)
    return daily.select(
        "d",
        "total",
        trend.alias("trend"),
        (F.col("total").cast("double") - trend).alias("residual"),
        F.count(F.lit(1)).over(w).cast("int").alias("window_days"),
    )


@register(
    "ext_basket_size_distribution",
    oracle="""
    WITH sizes AS (
      SELECT l_orderkey, COUNT(DISTINCT l_partkey) AS basket_size
      FROM lineitem GROUP BY 1
    )
    SELECT basket_size,
           COUNT(*) AS n_orders,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS share
    FROM sizes GROUP BY basket_size
    """,
)
def ext_basket_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of distinct-part basket sizes per order with each
    size's share of all orders — the sizing fact behind the market-
    basket and also-bought operators. Two nested aggregations (order,
    then size) each collapse with map-side partials; the share window
    runs over the handful of distinct sizes."""
    li = load_table(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_partkey").alias("basket_size")
    )
    counted = sizes.groupBy("basket_size").agg(F.count(F.lit(1)).alias("n_orders"))
    w = Window.partitionBy()
    return counted.select(
        "basket_size",
        "n_orders",
        (
            F.col("n_orders").cast("double")
            / F.sum("n_orders").over(w).cast("double")
        ).alias("share"),
    )
