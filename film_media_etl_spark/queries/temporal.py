"""Temporal join queries over events: as-of and interval joins.

DuckDB has a native ASOF JOIN, so the engine's union+window as-of
formulation gets an exact oracle — the strongest possible check for an
operator Spark has no built-in for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, interval_join
from ..sources import load_table
from .registry import register


@register(
    "ext_asof_join",
    oracle="""
    WITH v AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS pvalue
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, CAST(ts AS TIMESTAMP)
    )
    SELECT v.event_id, v.user_id, v.ts,
           p.pvalue IS NOT NULL AS has_prior,
           COALESCE(p.pvalue, -1.0) AS pvalue_asof
    FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.ts >= p.ts
    """,
)
def ext_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each view event carries the value of the user's most
    recent purchase at-or-before it (union+last-value window — one
    shuffle, linear state; operators/temporal.py). Views with no prior
    purchase carry has_prior=false and sentinel -1.0 instead of a NULL
    double — a NULL float crosses the driver boundary as pandas NaN vs
    DuckDB None (queries/registry.py); event values are non-negative so
    the sentinel is unambiguous."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    joined = asof_join(views, purchases, key="user_id", ts="ts", value_cols=["pvalue"])
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("pvalue_asof").isNotNull().alias("has_prior"),
        F.coalesce(F.col("pvalue_asof"), F.lit(-1.0)).alias("pvalue_asof"),
    )


@register(
    "ext_interval_join",
    oracle="""
    SELECT l.user_id, l.event_id AS l_event_id, r.event_id AS r_event_id
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id
     AND CAST(r.ts AS TIMESTAMP) >= CAST(l.ts AS TIMESTAMP)
     AND CAST(r.ts AS TIMESTAMP) <= CAST(l.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
    """,
)
def ext_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: click -> purchase pairs within 30 minutes
    per user (equi-join on user with the range as join filter)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    out = interval_join(clicks, purchases, key="user_id", ts="ts", width_seconds=1800)
    return out.select(
        "user_id",
        F.col("l_event_id").alias("l_event_id"),
        F.col("r_event_id").alias("r_event_id"),
    )
