"""Series monitoring: local-extrema peak detection and a CUSUM drift
chart.

Both consume the hourly/daily aggregate series the engine's other
time-series ops build (densify, EWMA, MAD anomaly) and answer the two
monitoring questions those don't: WHERE are the turning points (peaks),
and has the level DRIFTED from its historical mean (CUSUM — the control
chart that catches slow drift long before any single-point threshold
trips).

Exactness: peaks are strict decimal comparisons; CUSUM avoids the
mean's division entirely by multiplying through by n — cusum_t of
(x_i − S/n) times n is Σ(n·x_i − S), all exact decimal — and the one
normalizing division per output row happens once, unrounded (IEEE
division of exact inputs is deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


@register(
    "ext_peak_detection",
    oracle="""
    WITH h AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DECIMAL(38,3)) AS total
      FROM events GROUP BY 1, 2
    ),
    n AS (
      SELECT hour, event_type, total,
             lag(total)  OVER w AS prev_total,
             lead(total) OVER w AS next_total
      FROM h
      WINDOW w AS (PARTITION BY event_type ORDER BY hour ASC)
    )
    SELECT hour, event_type, total,
           (prev_total IS NOT NULL AND next_total IS NOT NULL
            AND total > prev_total AND total > next_total) AS is_peak,
           (prev_total IS NOT NULL AND next_total IS NOT NULL
            AND total < prev_total AND total < next_total) AS is_trough
    FROM n
    """,
)
def ext_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-extrema detection on the hourly value series per event
    type: an hour is a peak (trough) when strictly above (below) BOTH
    neighbors — the turning-point primitive behind alerting and
    seasonality inspection. Events collapse to the hourly aggregate
    before any window; lag and lead share one window spec so both
    neighbors come from a single Window node over the bucket-sized
    frame. Series endpoints are neither peaks nor troughs (one-sided
    evidence). All comparisons are exact decimal."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.sum(F.col("value").cast("decimal(18,3)"))
        .cast("decimal(38,3)")
        .alias("total")
    )
    w = Window.partitionBy("event_type").orderBy(F.asc("hour"))
    n = h.select(
        "hour",
        "event_type",
        "total",
        F.lag("total").over(w).alias("prev_total"),
        F.lead("total").over(w).alias("next_total"),
    )
    interior = F.col("prev_total").isNotNull() & F.col("next_total").isNotNull()
    return n.select(
        "hour",
        "event_type",
        "total",
        (
            interior
            & (F.col("total") > F.col("prev_total"))
            & (F.col("total") > F.col("next_total"))
        ).alias("is_peak"),
        (
            interior
            & (F.col("total") < F.col("prev_total"))
            & (F.col("total") < F.col("next_total"))
        ).alias("is_trough"),
    )


@register(
    "ext_cusum_drift",
    oracle="""
    WITH d AS (
      SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
               AS x
      FROM orders GROUP BY 1
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DECIMAL(38,2)) AS s
      FROM d
    )
    SELECT d.day, d.x,
           CAST(SUM(d.x * g.n - g.s) OVER (
             ORDER BY d.day ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DECIMAL(38,2)) AS cusum_scaled,
           CAST(SUM(d.x * g.n - g.s) OVER (
             ORDER BY d.day ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / g.n AS cusum
    FROM d CROSS JOIN g
    """,
)
def ext_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM control chart of daily revenue: running sum of deviations
    from the full-period mean, the chart that flags slow drift (a ramp of
    small same-signed deviations) that point thresholds miss. The mean
    never materializes: multiplying the deviation through by n turns
    (x_i − S/n) into (n·x_i − S), so the running sum is EXACT decimal
    end-to-end; each row's normalized cusum divides once, unrounded.
    The cumulative window is global but runs on the day-sized aggregate
    (thousands of rows, data-independent), and the (n, S) scalar frame
    arrives by broadcast."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("x")
    )
    g = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("decimal(38,2)").alias("s"),
    )
    w = Window.orderBy(F.asc("day")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dev = F.col("x") * F.col("n") - F.col("s")
    return (
        d.crossJoin(F.broadcast(g))
        .select(
            "day",
            "x",
            F.sum(dev).over(w).cast("decimal(38,2)").alias("cusum_scaled"),
            (F.sum(dev).over(w).cast("double") / F.col("n")).alias("cusum"),
        )
    )
