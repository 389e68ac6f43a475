"""Journey analytics: conversion latency percentiles, frequent event
paths, and the Gini coefficient of revenue concentration.

Extends the engine's funnel/retention/transition family
(event_analytics.py, advanced_analytics.py) with the three follow-up
questions analysts ask next: HOW LONG does conversion take (latency
distribution, not just counts), WHICH journeys are common (path
frequency), and HOW UNEQUAL is the revenue base (a single-number
complement to ext_pareto_concentration's top-decile share).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import AGG_DECIMAL, dec
from ..sources import load_table
from .registry import register


@register(
    "ext_time_to_convert",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    ),
    latency AS (
      SELECT CAST(date_diff('second', t_view, t_purchase) AS BIGINT) AS secs
      FROM per_user
      WHERE t_view IS NOT NULL AND t_purchase > t_view
    )
    SELECT COUNT(*) AS n_converted,
           MIN(secs) AS min_secs,
           quantile_cont(secs, 0.5) AS p50_secs,
           quantile_cont(secs, 0.9) AS p90_secs,
           MAX(secs) AS max_secs
    FROM latency
    """,
)
def ext_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: seconds from each user's first
    view to their first later purchase, summarized as exact min/median/
    p90/max — the question ext_funnel's counts can't answer. One
    groupBy(user_id) computes both first-touch times (single shuffle);
    the latency frame is user-sized and the percentiles interpolate
    bit-identically in both engines."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    latency = per_user.where(
        F.col("t_view").isNotNull() & (F.col("t_purchase") > F.col("t_view"))
    ).select(
        (
            F.unix_timestamp("t_purchase") - F.unix_timestamp("t_view")
        ).cast("long").alias("secs")
    )
    return latency.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("secs").alias("min_secs"),
        F.expr("percentile(secs, 0.5D)").alias("p50_secs"),
        F.expr("percentile(secs, 0.9D)").alias("p90_secs"),
        F.max("secs").alias("max_secs"),
    )


@register(
    "ext_top_paths",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ordered WHERE rn <= 5
      GROUP BY user_id
    ),
    counted AS (
      SELECT path, COUNT(*) AS n_users FROM paths GROUP BY path
    )
    SELECT path, n_users, CAST(rnk AS INT) AS rank
    FROM (
      SELECT path, n_users,
             ROW_NUMBER() OVER (ORDER BY n_users DESC, path ASC) AS rnk
      FROM counted
    )
    WHERE rnk <= 10
    """,
)
def ext_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten most common opening journeys: each user's first five events
    as a '>'-joined path, counted across users. The per-user prefix is
    a partitioned row_number + ordered collect (struct-sort, all JVM);
    path frequencies then aggregate to at most |event_types|^5 rows, so
    the final top-10 ranking windows over a tiny frame. Ties break on
    the path string for determinism."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prefix = ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 5)
    paths = prefix.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    wr = Window.orderBy(F.desc("n_users"), F.asc("path"))
    return (
        counted.withColumn("rank", F.row_number().over(wr).cast("int"))
        .where(F.col("rank") <= 10)
        .select("path", "n_users", "rank")
    )


@register(
    "ext_gini_revenue",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4))
               AS rev
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT rev, ROW_NUMBER() OVER (ORDER BY rev ASC, o_custkey ASC) AS i
      FROM per_cust
    )
    SELECT COUNT(*) AS n_customers,
           CAST(SUM(rev) AS DECIMAL(38,4)) AS total_rev,
           (2.0 * CAST(SUM(CAST(i AS DECIMAL(12,0)) * CAST(rev AS DECIMAL(18,4)))
                       AS DOUBLE)
              / (COUNT(*) * CAST(SUM(rev) AS DOUBLE)))
             - (CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*)) AS gini
    FROM ranked
    """,
)
def ext_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue via the rank formula
    G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over revenue ranked ascending
    (customer-key tiebreak) — the single-number inequality measure
    behind ext_pareto_concentration's decile view.

    The ranking window is global over the per-customer AGGREGATE. The
    rank·revenue products and both sums stay exact decimal (rank as
    DECIMAL(18,0) times DECIMAL(38,4) revenue), so the two final double
    divisions are the only float ops. At extreme customer counts the
    rank pass swaps to the engine's bucketed global index
    (etl/star.py:_global_index) — bit-identical ranks, parallel."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(dec(F.col("o_totalprice"))).cast(AGG_DECIMAL).alias("rev")
    )
    w = Window.orderBy(F.asc("rev"), F.asc("o_custkey"))
    ranked = per_cust.withColumn("i", F.row_number().over(w))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev").cast(AGG_DECIMAL).alias("total_rev"),
        (
            (
                F.lit(2.0)
                * F.sum(
                    F.col("i").cast("decimal(12,0)")
                    * F.col("rev").cast("decimal(18,4)")
                ).cast("double")
                / (F.count(F.lit(1)) * F.sum("rev").cast("double"))
            )
            - ((F.count(F.lit(1)) + F.lit(1)).cast("double") / F.count(F.lit(1)))
        ).alias("gini"),
    )
