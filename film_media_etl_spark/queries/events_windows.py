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
