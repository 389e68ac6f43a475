"""Batch-mode windowed aggregations over the events table (SURVEY §2.J).

The reference is batch-only ('Incremental ETL' is future work,
README:177); these queries define the engine's windowing semantics in
batch where DuckDB can oracle-check them. The streaming module
(film_media_etl_spark.streaming) runs the SAME logical operations as
Structured Streaming with watermarks — covered by pytest, since streams
have no SQL oracle.

Window alignment: Spark's window() buckets are epoch-aligned, identical
to DuckDB time_bucket. Session windows follow Spark semantics:
session_end = last event ts + gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import AGG_DECIMAL, ROW_DECIMAL, dec
from ..sources import load_table
from .registry import register

_VAL_SUM_SQL = "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4))"


@register(
    "ext_hypertable_rollup",
    oracle="""
    WITH m10 AS (
      SELECT time_bucket(INTERVAL '10 minutes', ts) AS bucket, event_type,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS total_value
      FROM events GROUP BY 1, 2
    ),
    h1 AS (
      SELECT time_bucket(INTERVAL '1 hour', bucket) AS bucket, event_type,
             CAST(SUM(n_events) AS BIGINT) AS n_events,
             CAST(SUM(total_value) AS DECIMAL(38,4)) AS total_value
      FROM m10 GROUP BY 1, 2
    ),
    d1 AS (
      SELECT time_bucket(INTERVAL '1 day', bucket) AS bucket, event_type,
             CAST(SUM(n_events) AS BIGINT) AS n_events,
             CAST(SUM(total_value) AS DECIMAL(38,4)) AS total_value
      FROM h1 GROUP BY 1, 2
    )
    SELECT '10m' AS resolution, bucket, event_type, n_events, total_value FROM m10
    UNION ALL
    SELECT '1h', bucket, event_type, n_events, total_value FROM h1
    UNION ALL
    SELECT '1d', bucket, event_type, n_events, total_value FROM d1
    """,
)
def ext_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: multi-resolution time
    rollups where each coarser level re-aggregates the NEXT-FINER level,
    not the raw events — the TimescaleDB continuous-aggregate shape. At
    100 TB this is the whole point: the 1h/1d levels read materialized
    10-minute partials (thousands of rows), never the raw table, and
    additive measures make every level exact. The DuckDB oracle computes
    the same cascade, so the value-hash proves level-from-level
    re-aggregation loses nothing."""
    ev = load_table(spark, sf_dir, "events")
    m10 = (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("decimal(38,4)").alias("total_value"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "n_events", "total_value")
    )
    def _coarser(df: DataFrame, width: str) -> DataFrame:
        return (
            df.groupBy(F.window("bucket", width).alias("w"), "event_type")
            .agg(
                F.sum("n_events").cast("long").alias("n_events"),
                F.sum("total_value").cast("decimal(38,4)").alias("total_value"),
            )
            .select(F.col("w.start").alias("bucket"), "event_type", "n_events", "total_value")
        )
    h1 = _coarser(m10, "1 hour")
    d1 = _coarser(h1, "1 day")
    tag = lambda df, r: df.select(  # noqa: E731
        F.lit(r).alias("resolution"), "bucket", "event_type", "n_events", "total_value"
    )
    return tag(m10, "10m").unionByName(tag(h1, "1h")).unionByName(tag(d1, "1d"))


@register(
    "ext_window_tumbling",
    oracle=f"""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS window_end,
           event_type, COUNT(*) AS n_events, {_VAL_SUM_SQL} AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def ext_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute windows per event type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec(F.col("value"), ROW_DECIMAL)).cast(AGG_DECIMAL).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "ext_window_sliding",
    oracle=f"""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) - (x.o * INTERVAL '5 minutes') AS window_start,
             event_type, value
      FROM events, (VALUES (0), (1)) x(o)
    )
    SELECT window_start, window_start + INTERVAL '10 minutes' AS window_end,
           event_type, COUNT(*) AS n_events, {_VAL_SUM_SQL} AS total_value
    FROM assigned
    GROUP BY 1, 2, 3
    """,
)
def ext_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows, 10-minute length / 5-minute slide: every event
    lands in exactly two windows (oracle: the two 5-min-grid starts
    covering each ts)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec(F.col("value"), ROW_DECIMAL)).cast(AGG_DECIMAL).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "ext_window_session",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT *, SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, new_session
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events, {_VAL_SUM_SQL} AS total_value
    FROM numbered GROUP BY user_id, session_id
    """,
)
def ext_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap (Spark
    session_window in batch mode; session_end = last event + gap). The
    oracle is the classic gaps-and-islands rewrite."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec(F.col("value"), ROW_DECIMAL)).cast(AGG_DECIMAL).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
