"""Composition metrics: ratio-to-parent revenue shares and behavioral
entropy.

Share-of-total is the window flavor the engine's ranking/lead-lag/
distribution windows don't yet exercise — an aggregate window (SUM OVER
PARTITION) feeding a per-row ratio against the parent group. Entropy
scores how evenly a user's activity spreads across event types — the
diversity feature behind engagement segmentation and bot screening.

Exactness: shares divide an exact decimal by its exact partition total
after casting both to double (one IEEE division, deterministic);
entropy terms carry libm log10 1-ulp noise, so the result rounds to 4dp
(tfidf/charlm precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


@register(
    "ext_share_of_total",
    oracle="""
    WITH rev AS (
      SELECT r.r_name, n.n_name,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
               AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT r_name, n_name, revenue,
           CAST(revenue AS DOUBLE)
             / CAST(SUM(revenue) OVER (PARTITION BY r_name) AS DOUBLE)
             AS region_share,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY r_name ORDER BY revenue DESC, n_name ASC) AS INT)
             AS rank_in_region
    FROM rev
    """,
)
def ext_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent: each nation's share of its region's revenue plus
    its rank within the region — the %-of-parent column every drill-down
    report carries. The aggregate window (SUM OVER PARTITION) and the
    ranking window share ONE partition spec, so Catalyst fuses them into
    a single Window node over the nation-sized aggregate (25 rows) —
    facts are long gone before any window runs. The share divides two
    exact decimals as doubles: one deterministic IEEE division, no
    rounding needed."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("revenue")
        )
    )
    part = Window.partitionBy("r_name")
    rankw = part.orderBy(F.desc("revenue"), F.asc("n_name"))
    return rev.select(
        "r_name",
        "n_name",
        "revenue",
        (
            F.col("revenue").cast("double")
            / F.sum("revenue").over(part).cast("double")
        ).alias("region_share"),
        F.row_number().over(rankw).cast("int").alias("rank_in_region"),
    )


@register(
    "ext_session_entropy",
    oracle="""
    WITH cnt AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
             COUNT(*) AS n_types
      FROM cnt GROUP BY 1
    )
    SELECT t.user_id, t.n_events, t.n_types,
           ROUND(SUM(-(CAST(c.c AS DOUBLE) / t.n_events)
                     * log10(CAST(c.c AS DOUBLE) / t.n_events)), 4)
             AS entropy
    FROM cnt c JOIN tot t ON c.user_id = t.user_id
    GROUP BY 1, 2, 3
    """,
)
def ext_session_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral entropy per user: Shannon entropy (log10 base) of the
    user's event-type distribution, with event and type counts — 0 =
    single-minded, log10(n_types) = perfectly even. The diversity
    feature engagement models and bot screens consume. Two stacked
    aggregations on the SAME user_id key (counts, then the entropy sum)
    — the second and the join reuse the first's hash partitioning, so
    the whole query is one data shuffle. Rounded to 4dp over libm's
    1-ulp log10 noise (engine convention)."""
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
    )
    p = F.col("c").cast("double") / F.col("n_events")
    return (
        cnt.join(tot, "user_id")
        .groupBy("user_id", "n_events", "n_types")
        .agg(F.round(F.sum(-p * F.log10(p)), 4).alias("entropy"))
    )
