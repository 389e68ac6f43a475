"""Null-safe equality join: dimension lookup where NULL is a
legitimate key value.

The reference's location dimension carries literal NULL columns
(state/city fallbacks, ` loadAnalyticsDB...R`:313-315,400) and its
INSERT-IGNORE dedup treats NULL = NULL; any join-based reformulation of
that lookup therefore needs null-safe equality (<=>), because a plain
equi-join silently DROPS every NULL-keyed row — the classic
missing-data bug in attribute enrichment. Here the optional attribute
is a campaign tag derived from event props (NULLIF models the ~10%
untagged share); the 'untagged' bucket must survive the join and be
reported, not vanish.

Exactness: integer counts plus one exact decimal sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

# the optional attribute: campaign tag, NULL for the k%10==0 share —
# identical spelling both engines
_CAMPAIGN = "NULLIF(CAST(get_json_object(props, '$.k') AS INT) % 10, 0)"
_CAMPAIGN_DUCK = "NULLIF(CAST(json_extract(props, '$.k') AS INT) % 10, 0)"


@register(
    "ext_nullsafe_join",
    oracle=f"""
    WITH tagged AS (
      SELECT event_id, {_CAMPAIGN_DUCK} AS campaign,
             CAST(value AS DECIMAL(18,3)) AS v
      FROM events
    ),
    dim AS (
      SELECT DISTINCT campaign,
             COALESCE('CAMP_' || CAST(campaign AS STRING), 'untagged')
               AS campaign_label
      FROM tagged
    )
    SELECT d.campaign_label,
           COUNT(*) AS n_events,
           CAST(SUM(t.v) AS DECIMAL(38,3)) AS total_value
    FROM tagged t
    JOIN dim d ON t.campaign IS NOT DISTINCT FROM d.campaign
    GROUP BY 1
    """,
)
def ext_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe dimension lookup: events carry an OPTIONAL campaign tag
    (NULL = untagged); the label dimension includes a row for NULL, and
    the lookup joins with <=> so untagged events land in their bucket
    instead of being dropped — run with a plain == join this query
    loses 10% of the data silently. Null-safe equality still plans as a
    HASH join (NULL hashes like any value under <=>), so the dim rides
    a broadcast exactly like an equi-join lookup; no fallback to
    nested-loop. Counts and the decimal sum are exact."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        "event_id",
        F.expr(_CAMPAIGN).alias("campaign"),
        F.col("value").cast("decimal(18,3)").alias("v"),
    )
    dim = tagged.select("campaign").distinct().select(
        "campaign",
        F.coalesce(
            F.concat(F.lit("CAMP_"), F.col("campaign").cast("string")),
            F.lit("untagged"),
        ).alias("campaign_label"),
    )
    return (
        tagged.join(
            F.broadcast(dim),
            tagged["campaign"].eqNullSafe(dim["campaign"]),
        )
        .groupBy("campaign_label")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").cast("decimal(38,3)").alias("total_value"),
        )
    )
