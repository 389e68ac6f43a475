"""Stream-stream joins: the interval join of queries/temporal.py over
unbounded inputs.

Spark's stream-stream inner join buffers both sides in state; the
watermarks plus the time-range join condition bound that state — rows
older than (watermark + interval width) are evicted. Without the range
condition in the JOIN clause the state would grow forever; putting it in
a post-join filter instead of the join condition is the classic
unbounded-state bug this module exists to get right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .windows import read_events_stream


def stream_interval_join(
    spark: SparkSession,
    sf_dir: str,
    *,
    width_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """click -> purchase pairs within ``width_seconds`` per user, both
    sides streaming. Event-time columns are renamed per side (join keys
    aside, stream-stream joins need disjoint schemas) and both carry
    watermarks so the state store can evict."""
    clicks = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("l_event_id"))
        .withWatermark("l_ts", watermark)
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("r_event_id"))
        .withWatermark("r_ts", watermark)
    )
    cond = (
        (clicks["user_id"] == purchases["user_id"])
        & (purchases["r_ts"] >= clicks["l_ts"])
        & (purchases["r_ts"] <= clicks["l_ts"] + F.expr(f"INTERVAL {width_seconds} SECONDS"))
    )
    return clicks.join(purchases, cond).select(
        clicks["user_id"], "l_event_id", "r_event_id"
    )
