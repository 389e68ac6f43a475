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


@register(
    "ext_survival_km",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             list_sort(list(o_orderdate))[1] AS d1,
             CASE WHEN COUNT(*) >= 2
                  THEN list_sort(list(o_orderdate))[2] END AS d2
      FROM orders GROUP BY o_custkey
    ),
    mx AS (SELECT MAX(o_orderdate) AS dmax FROM orders),
    dur AS (
      SELECT CASE WHEN d2 IS NOT NULL THEN date_diff('day', d1, d2)
                  ELSE date_diff('day', d1, dmax) END AS duration,
             (d2 IS NOT NULL) AS event
      FROM per_cust CROSS JOIN mx
    ),
    tot AS (SELECT COUNT(*) AS n FROM dur),
    by_t AS (
      SELECT duration, COUNT(*) AS n_obs,
             COUNT(*) FILTER (WHERE event) AS d
      FROM dur GROUP BY duration
    ),
    risk AS (
      SELECT duration, d,
             n - COALESCE(SUM(n_obs) OVER (ORDER BY duration ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      FROM by_t CROSS JOIN tot
    ),
    factors AS (
      SELECT duration, d, n_risk,
             CAST(ROUND(log10(1.0 - CAST(d AS DOUBLE) / n_risk), 6)
                  AS DECIMAL(12,6)) AS lf
      FROM risk WHERE d > 0 AND d < n_risk
    )
    SELECT CAST(duration AS BIGINT) AS duration_days,
           CAST(n_risk AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(SUM(lf) OVER (ORDER BY duration ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS log10_survival
    FROM factors
    """,
)
def ext_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator for time-to-repeat-order: per
    customer, duration = days from first to second order (event) or to
    the observation horizon (right-censored, no second order yet); the
    KM product over event times is emitted as a cumulative LOG — each
    per-step factor log10(1 - d/n_risk) rounds to 6 decimals and sums
    as exact DECIMAL (the charlm.py convention), because a cross-engine
    pow()/product would drift by ulps while log-survival compares
    bit-exactly. Event times where survival would hit exactly zero
    (d = n_risk, possible only at the last event with no censoring
    beyond) are excluded on both sides — standard KM support is S > 0.

    Scale shape: the per-customer first/second order dates come from
    one groupBy with a bounded sort_array(collect_list) (orders per
    customer, ~10), the duration histogram collapses the corpus to
    #distinct durations (<= the date-range span in days), and the two
    cumulative windows run over that bounded histogram — the only
    unpartitioned windows in the query are over ~2.5k rows at ANY
    corpus size, which is the documented bounded-key exception."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    arr = F.sort_array(F.collect_list("o_orderdate"))
    per_cust = o.groupBy("o_custkey").agg(
        arr.alias("ds"), F.count(F.lit(1)).alias("n_orders")
    ).select(
        F.element_at("ds", 1).alias("d1"),
        F.when(F.col("n_orders") >= 2, F.element_at("ds", 2)).alias("d2"),
    )
    mx = o.agg(F.max("o_orderdate").alias("dmax"))
    dur = per_cust.crossJoin(F.broadcast(mx)).select(
        F.when(
            F.col("d2").isNotNull(), F.datediff("d2", "d1")
        ).otherwise(F.datediff("dmax", "d1")).alias("duration"),
        F.col("d2").isNotNull().alias("event"),
    )
    tot = dur.agg(F.count(F.lit(1)).alias("n"))
    by_t = dur.groupBy("duration").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.count(F.when(F.col("event"), 1)).alias("d"),
    )
    w_prior = (
        Window.orderBy(F.asc("duration")).rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = by_t.crossJoin(F.broadcast(tot)).select(
        "duration",
        "d",
        (F.col("n") - F.coalesce(F.sum("n_obs").over(w_prior), F.lit(0))).alias("n_risk"),
    )
    lf = F.round(
        F.log10(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")), 6
    ).cast("decimal(12,6)")
    factors = risk.where((F.col("d") > 0) & (F.col("d") < F.col("n_risk"))).select(
        "duration", "d", "n_risk", lf.alias("lf")
    )
    w_cum = (
        Window.orderBy(F.asc("duration")).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    return factors.select(
        F.col("duration").cast("long").alias("duration_days"),
        F.col("n_risk").cast("long").alias("n_at_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.sum("lf").over(w_cum).cast("double").alias("log10_survival"),
    )
