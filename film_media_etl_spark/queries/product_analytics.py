"""Product-analytics workload: engagement stickiness (DAU/WAU), new-vs-
returning user splits, first/last-touch revenue attribution, and ABC
inventory classification.

The reference's report counts customers per country once
(BusinessAnalysis...Rmd:203-229); these are the longitudinal engagement
and merchandising queries that follow as soon as the warehouse is
event-grained. All follow the engine's exactness conventions: distinct
counts are exact, revenue sums are decimal, every ratio is one IEEE
division of exact operands, and window channels use IGNORE NULLS
semantics that Spark's last(ignorenulls=True) and DuckDB's
``LAST_VALUE(x IGNORE NULLS)`` share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import AGG_DECIMAL, dec
from ..sources import load_table
from .registry import register


@register(
    "ext_stickiness_dau_wau",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
             CAST(ts AS DATE) AS d,
             COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1, 2
    ),
    weekly AS (
      SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
             COUNT(DISTINCT user_id) AS wau
      FROM events GROUP BY 1
    ),
    avg_daily AS (
      SELECT week, COUNT(*) AS n_days,
             CAST(SUM(dau) AS DOUBLE) / COUNT(*) AS avg_dau
      FROM daily GROUP BY week
    )
    SELECT a.week, a.n_days, a.avg_dau, w.wau,
           a.avg_dau / CAST(w.wau AS DOUBLE) AS stickiness
    FROM avg_daily a JOIN weekly w ON a.week = w.week
    """,
)
def ext_stickiness_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement stickiness per calendar week: average daily active
    users over weekly active users — the canonical DAU/WAU retention
    health metric. Two exact distinct-count aggregates (per day, per
    week) shuffle on the date keys with partial map-side expansion; the
    per-week frames are calendar-sized, so the join and the two ratio
    divisions cost nothing at any data scale."""
    ev = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    week = F.to_date(F.date_trunc("week", d))
    daily = ev.groupBy(week.alias("week"), d.alias("d")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    weekly = ev.groupBy(week.alias("week")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    avg_daily = daily.groupBy("week").agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.sum("dau").cast("double") / F.count(F.lit(1))).alias("avg_dau"),
    )
    return (
        avg_daily.join(weekly, "week")
        .select(
            "week",
            "n_days",
            "avg_dau",
            "wau",
            (F.col("avg_dau") / F.col("wau").cast("double")).alias("stickiness"),
        )
    )


@register(
    "ext_new_vs_returning",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_date
      FROM events GROUP BY 1
    ),
    active AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(DISTINCT user_id) AS n_active
      FROM events GROUP BY 1
    ),
    news AS (
      SELECT first_date AS d, COUNT(*) AS n_new FROM firsts GROUP BY 1
    )
    SELECT a.d, a.n_active,
           COALESCE(n.n_new, 0) AS n_new,
           a.n_active - COALESCE(n.n_new, 0) AS n_returning
    FROM active a LEFT JOIN news n ON a.d = n.d
    """,
)
def ext_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning split: actives per day, first-ever-seen
    users per day, returning = difference. The firsts frame shuffles
    once on user_id and collapses to calendar size before the left
    join — the standard growth-accounting decomposition, linear in
    events with calendar-sized outputs."""
    ev = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    firsts = ev.groupBy("user_id").agg(F.min(d).alias("first_date"))
    active = ev.groupBy(d.alias("d")).agg(F.countDistinct("user_id").alias("n_active"))
    news = firsts.groupBy(F.col("first_date").alias("d")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    n_new = F.coalesce(F.col("n_new"), F.lit(0))
    return active.join(news, "d", "left").select(
        "d",
        "n_active",
        n_new.alias("n_new"),
        (F.col("n_active") - n_new).alias("n_returning"),
    )


@register(
    "ext_attribution_first_last",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             FIRST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                         IGNORE NULLS) OVER w AS first_touch,
             LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS) OVER w AS last_touch
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT model, channel,
           COUNT(*) AS n_conversions,
           CAST(SUM(rev) AS DECIMAL(38,4)) AS attributed_revenue
    FROM (
      SELECT 'first_touch' AS model,
             COALESCE(first_touch, 'direct') AS channel,
             CAST(value AS DECIMAL(18,4)) AS rev
      FROM tagged WHERE event_type = 'purchase'
      UNION ALL
      SELECT 'last_touch' AS model,
             COALESCE(last_touch, 'direct') AS channel,
             CAST(value AS DECIMAL(18,4)) AS rev
      FROM tagged WHERE event_type = 'purchase'
    )
    GROUP BY model, channel
    """,
)
def ext_attribution_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution under two models at once: each purchase's
    revenue is credited to the user's FIRST non-purchase touch ever
    (first-touch) and to the LAST non-purchase touch at-or-before the
    purchase (last-touch); touchless purchases fall to 'direct'. One
    per-user ordered window computes both running channels in a single
    pass (the as-of-join semantics without a join); the union then
    aggregates decimal revenue per (model, channel) — 2 x channels
    output rows. One shuffle on user_id, one on the tiny group key."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    tagged = ev.select(
        "event_type",
        dec(F.col("value")).alias("rev"),
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    ).where(F.col("event_type") == "purchase")
    # stack (unpivot) instead of a self-union: a union of two selects
    # over the same windowed frame makes Spark evaluate the window (and
    # its user_id shuffle) twice — stack emits both model rows from the
    # single pass
    stacked = tagged.select(
        F.expr(
            "stack(2,"
            " 'first_touch', coalesce(first_touch, 'direct'),"
            " 'last_touch',  coalesce(last_touch,  'direct')"
            ") AS (model, channel)"
        ),
        "rev",
    )
    return (
        stacked.groupBy("model", "channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum("rev").cast(AGG_DECIMAL).alias("attributed_revenue"),
        )
    )


@register(
    "ext_abc_classification",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(1.0 - CAST(l_discount AS DECIMAL(9,4)) AS DECIMAL(9,4))
                  AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS revenue
      FROM lineitem GROUP BY 1
    ),
    total AS (SELECT CAST(SUM(revenue) AS DECIMAL(38,6)) AS total_rev FROM per_part),
    ranked AS (
      SELECT l_partkey, revenue,
             CAST(SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey ASC)
               AS DECIMAL(38,6)) AS cum_rev
      FROM per_part
    )
    SELECT l_partkey, revenue,
           CAST(cum_rev AS DOUBLE) / CAST(t.total_rev AS DOUBLE) AS cum_share,
           CASE
             WHEN CAST(cum_rev AS DOUBLE) / CAST(t.total_rev AS DOUBLE) <= 0.5
               THEN 'A'
             WHEN CAST(cum_rev AS DOUBLE) / CAST(t.total_rev AS DOUBLE) <= 0.8
               THEN 'B'
             ELSE 'C'
           END AS abc_class
    FROM ranked CROSS JOIN total t
    """,
)
def ext_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC merchandising classification: parts ranked by exact decimal
    revenue, cumulative share banded A (top 50% of revenue), B (next
    30%), C (tail) — the classic inventory-prioritization cut.

    The ordered cumulative window is GLOBAL, but it runs on the
    per-part aggregate — a dimension-sized frame (catalog cardinality,
    not fact cardinality) — after lineitem collapses in one partial+
    final hash aggregate, so the single-partition sort is bounded by
    the product catalog exactly like the engine's other post-aggregate
    leaderboards. Cumulative sums stay decimal (order-insensitive
    upstream, total-ordered in the window); each share is one double
    division, so the band edges are bit-identical cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    row_rev = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
        " * CAST(1.0 - CAST(l_discount AS DECIMAL(9,4)) AS DECIMAL(9,4))"
        " AS DECIMAL(18,6))"
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum(row_rev).cast("decimal(38,6)").alias("revenue")
    )
    total = per_part.agg(F.sum("revenue").cast("decimal(38,6)").alias("total_rev"))
    w = (
        Window.orderBy(F.desc("revenue"), F.asc("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per_part.withColumn(
        "cum_rev", F.sum("revenue").over(w).cast("decimal(38,6)")
    )
    share = F.col("cum_rev").cast("double") / F.col("total_rev").cast("double")
    return ranked.crossJoin(F.broadcast(total)).select(
        "l_partkey",
        "revenue",
        share.alias("cum_share"),
        F.when(share <= 0.5, "A").when(share <= 0.8, "B").otherwise("C").alias(
            "abc_class"
        ),
    )
