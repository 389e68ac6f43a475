"""Event-analytics workload: funnel conversion, cohort retention, and
SCD type-2 history building over the events table — the product-analytics
surface a warehouse engine serves once facts are event-grained (the
reference's fact table is transaction-grained, SURVEY §1.1; these are the
canonical next queries on that grain).

Scale notes: all three aggregate per user first (one shuffle on user_id,
the natural partition key); nothing is quadratic and no window spans more
than one user's history. ts is nanos in parquet — load_table normalizes
to µs timestamps, and the µs-aligned testdata makes DuckDB comparisons
exact (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


@register(
    "ext_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS viewed,
           COUNT(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view)
             AS clicked_after_view,
           COUNT(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view
                            AND t_purchase > t_click)
             AS purchased_after_click
    FROM per_user
    """,
)
def ext_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): users whose FIRST
    click follows their first view, and first purchase follows that
    click. One groupBy(user_id) computes all three first-touch times;
    the funnel predicate is then a pure row expression — no joins, no
    window, one shuffle."""
    ev = load_table(spark, sf_dir, "events")

    def first_ts(etype: str):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count(F.when(viewed, 1)).alias("viewed"),
        F.count(F.when(clicked, 1)).alias("clicked_after_view"),
        F.count(F.when(purchased, 1)).alias("purchased_after_click"),
    )


@register(
    "ext_retention_cohort",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_date
      FROM events GROUP BY user_id
    ),
    acts AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT CAST(date_trunc('week', f.first_date) AS DATE) AS cohort_week,
           CAST(floor(date_diff('day', f.first_date, a.d) / 7.0) AS INT)
             AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM acts a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def ext_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by the week of their first
    activity, counted per whole-week offset of each later active day.
    first-activity and distinct-active-day aggregates both shuffle on
    user_id, then the (small) per-user frames join without re-shuffling —
    at 100 TB the distinct-day pre-aggregate is what keeps the join input
    proportional to user-days, not raw events."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_date"))
    acts = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        acts.join(firsts, "user_id")
        .select(
            F.to_date(F.date_trunc("week", F.col("first_date"))).alias("cohort_week"),
            F.floor(F.datediff(F.col("d"), F.col("first_date")) / 7.0)
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "ext_scd2_history",
    oracle="""
    SELECT user_id, value AS state_value,
           CAST(ts AS TIMESTAMP) AS valid_from,
           COALESCE(CAST(LEAD(ts) OVER w AS TIMESTAMP),
                    TIMESTAMP '2200-01-01 00:00:00') AS valid_to,
           (LEAD(ts) OVER w IS NULL) AS is_current
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def ext_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: each user's purchase stream becomes
    validity intervals — valid_from = the change's timestamp, valid_to =
    the next change. The open (current) interval carries an SCD2
    high-date sentinel (2200-01-01; the classic 9999-12-31 overflows
    pandas datetime64[ns], whose max is 2262-04-11) rather than a NULL timestamp — BETWEEN
    predicates work unchanged, and a NULL timestamp crosses the driver
    boundary as pandas NaT vs DuckDB None (queries/registry.py);
    is_current still flags it explicitly. The lead() window is per-user
    (one hash exchange, per-partition sort); this is the standard
    warehouse pattern for dimension change tracking the reference's star
    schema lacks (SURVEY §2.E: no windows at all)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("value").alias("state_value"),
        F.col("ts").alias("valid_from"),
        F.coalesce(nxt, F.to_timestamp(F.lit("2200-01-01 00:00:00"))).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


_JOURNEY_CAP = 1000  # most-recent events kept per user before any collect


@register(
    "ext_collect_ordered",
    oracle=f"""
    WITH recent AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE user_id < 40
    )
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS event_path,
           COUNT(*) AS n_events
    FROM recent WHERE rn <= {_JOURNEY_CAP}
    GROUP BY user_id
    """,
)
def ext_collect_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    recent = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _JOURNEY_CAP)
        .drop("rn")
    )
    ordered = F.sort_array(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    seq = F.transform(ordered, lambda x: x["event_type"])
    return recent.groupBy("user_id").agg(
        F.array_join(seq, ">").alias("event_path"),
        F.count(F.lit(1)).alias("n_events"),
    )

ext_collect_ordered.__doc__ = """Ordered sequence assembly: each user's event-type sequence as a
'>'-joined path string — the grouped-ordered-collect every
sequence-model training pipeline runs to turn an event log into
examples. Spark has no ORDER BY inside collect_list, so the
deterministic spelling is collect_list(struct(sort_keys..., payload))
-> sort_array -> transform: the struct sort is lexicographic on
(ts, event_id), i.e. exactly the oracle's ORDER BY, and everything
stays a JVM higher-order function. The sequence crosses the driver
boundary as the joined STRING only (an array column would be
re-rendered differently by the engines' dataframe bridges — the
decimal trap again, queries/registry.py). One shuffle on user_id;
the user_id < 40 gate keeps oracle rows compact, pushed to the scan.

Whale cap (round-5 verdict #3/#6): the collect is bounded at the
most-recent {cap} events per user via the same deterministic
row_number window as ext_event_regex (oracle-mirrored), so one
whale user bounds the collected array instead of growing it with
their history; n_events counts the capped sequence. The row_number
itself is a streaming, spillable window sort. At fixture scales no
user approaches the cap, so results are unchanged.""".format(
    cap=_JOURNEY_CAP
)


# ---------------------------------------------------------------------------
# CEP-style sequence pattern matching
# ---------------------------------------------------------------------------

_SEQ_PATTERN = "v[cv]*p"  # a view leading through clicks/views to a purchase
# _JOURNEY_CAP (defined above ext_collect_ordered) caps this op too


@register(
    "ext_event_regex",
    oracle=f"""
    WITH recent AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    j AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY ts ASC, event_id ASC) AS journey
      FROM recent WHERE rn <= {_JOURNEY_CAP} GROUP BY user_id
    )
    SELECT user_id, n_events,
           CAST(len(regexp_extract_all(journey, '{_SEQ_PATTERN}')) AS INT)
             AS n_conversions,
           len(regexp_extract_all(journey, '{_SEQ_PATTERN}')) > 0 AS converted
    FROM j
    """,
)
def ext_event_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern match (the MATCH_RECOGNIZE /
    Flink-CEP workload as a batch query): each user's event history
    collapses to an initials string in exact (ts, event_id) order, and
    the journey pattern '{_SEQ_PATTERN}' — a view funneling through
    clicks/views into a purchase — is counted with non-overlapping
    leftmost regex semantics (identical in Java regex and DuckDB's RE2
    for this alternation-free pattern class).

    Scale shape: one user-keyed shuffle. The per-user ordered collect is
    CAPPED at the most-recent {_JOURNEY_CAP} events per user (row_number
    over (ts, event_id) DESC — deterministic, mirrored in the oracle),
    so a whale user bounds the collected array instead of the array
    growing with their history; the row_number itself is a streaming,
    spillable window sort. n_events counts the CAPPED journey — at the
    test scales no user approaches the cap, so results are unchanged.
    The regex runs JVM-side per user, never per event. Event initials
    are distinct across the 5 reference types, so the string is
    lossless."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    recent = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _JOURNEY_CAP)
        .drop("rn")
    )
    j = recent.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: F.substring(s["event_type"], 1, 1),
            ),
            "",
        ).alias("journey"),
    )
    n_conv = F.regexp_count(F.col("journey"), F.lit(_SEQ_PATTERN)).cast("int")
    return j.select(
        "user_id",
        "n_events",
        n_conv.alias("n_conversions"),
        (n_conv > 0).alias("converted"),
    )


# ---------------------------------------------------------------------------
# Time-constrained (windowed) funnel
# ---------------------------------------------------------------------------

_FUNNEL_STEP_HOURS = 72  # each step must follow the previous within 3 days


@register(
    "ext_funnel_windowed",
    oracle=f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
        AND e.ts <= v.t_view + INTERVAL {_FUNNEL_STEP_HOURS} HOUR
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        AND e.ts <= c.t_click + INTERVAL {_FUNNEL_STEP_HOURS} HOUR
      GROUP BY e.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_viewed,
           CAST(COUNT(c.user_id) AS BIGINT) AS n_clicked_in_window,
           CAST(COUNT(p.user_id) AS BIGINT) AS n_purchased_in_window,
           COALESCE(CAST(COUNT(c.user_id) AS DOUBLE)
                    / nullif(COUNT(*), 0), 0.0) AS view_to_click,
           COALESCE(CAST(COUNT(p.user_id) AS DOUBLE)
                    / nullif(COUNT(c.user_id), 0), 0.0) AS click_to_purchase
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON c.user_id = p.user_id
    """,
)
def ext_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained funnel (the product-analytics convention the
    unconstrained ext_funnel cannot express): view -> first click within
    {_FUNNEL_STEP_HOURS}h of the first view -> first purchase within
    {_FUNNEL_STEP_HOURS}h of that click. Each stage anchors on the
    PREVIOUS stage's qualifying timestamp, so a purchase months later
    no longer counts — the difference between correlation and a journey.

    Scale shape: three user-keyed MIN aggregates chained by broadcast-
    able/AQE-planable equi-joins on user_id — no windows, no per-user
    sequence materialization; each stage's frame only shrinks. Conversion
    ratios are single double divisions (exact cross-engine); the
    zero-click edge cases carry 0.0 sentinels, never NULL."""
    ev = load_table(spark, sf_dir, "events")
    step = F.expr(f"INTERVAL {_FUNNEL_STEP_HOURS} HOURS")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + step)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + step)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    joined = v.join(c, "user_id", "left").join(p, "user_id", "left")
    n_v = F.count(F.lit(1))
    n_c = F.count("t_click")
    n_p = F.count("t_purchase")
    return joined.agg(
        n_v.cast("long").alias("n_viewed"),
        n_c.cast("long").alias("n_clicked_in_window"),
        n_p.cast("long").alias("n_purchased_in_window"),
        F.coalesce(
            n_c.cast("double") / F.nullif(n_v, F.lit(0)), F.lit(0.0)
        ).alias("view_to_click"),
        F.coalesce(
            n_p.cast("double") / F.nullif(n_c, F.lit(0)), F.lit(0.0)
        ).alias("click_to_purchase"),
    )
