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


# Channel encoding for Shapley attribution: the four non-conversion
# event types as power-of-2 bits; 'purchase' is the conversion event.
_SHAP_CHANNELS = [("view", 1), ("click", 2), ("signup", 4), ("error", 8)]
_SHAP_N = len(_SHAP_CHANNELS)
# Shapley coalition weights x n! (n=4): |S|!(n-1-|S|)! for |S| = 0..3
_SHAP_W = {0: 6, 1: 2, 2: 2, 3: 6}
_SHAP_FACT = 24  # 4!
_SHAP_THR = 14  # a channel is "touched" at >= this many events (splits the fixture population)


@register(
    "ext_shapley_attribution",
    oracle=f"""
    WITH ch(channel, bit) AS (VALUES {", ".join(f"('{c}', {b})" for c, b in _SHAP_CHANNELS)}),
    uc AS (
      SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
    ),
    um AS (
      SELECT u.user_id,
             COALESCE(SUM(CASE WHEN u.n >= {_SHAP_THR} THEN b.bit END), 0) AS mask,
             MAX(CASE WHEN u.event_type = 'purchase' AND u.n >= {_SHAP_THR}
                      THEN 1 ELSE 0 END) AS conv
      FROM uc u LEFT JOIN ch b ON u.event_type = b.channel
      GROUP BY u.user_id
    ),
    mc AS (SELECT mask, COUNT(*) AS nu, SUM(conv) AS nc FROM um GROUP BY mask),
    subs AS (SELECT CAST(s.s AS BIGINT) AS smask FROM generate_series(0, {2**_SHAP_N - 1}) s(s)),
    vt AS (
      SELECT s.smask,
             CASE WHEN COALESCE(SUM(mc.nu), 0) = 0 THEN 0.0
                  ELSE CAST(COALESCE(SUM(mc.nc), 0) AS DOUBLE) / COALESCE(SUM(mc.nu), 0)
             END AS v
      FROM subs s LEFT JOIN mc ON (mc.mask & ~s.smask) = 0
      GROUP BY s.smask
    ),
    terms AS (
      SELECT c.channel,
             CAST(ROUND(
               (CASE bit_count(s.smask) {" ".join(f"WHEN {k} THEN {w}" for k, w in _SHAP_W.items())} END)
               * (vi.v - vs.v) / {_SHAP_FACT}.0, 9) AS DECIMAL(14,9)) AS term
      FROM ch c
      JOIN subs s ON (s.smask & c.bit) = 0
      JOIN vt vs ON vs.smask = s.smask
      JOIN vt vi ON vi.smask = s.smask + c.bit
    )
    SELECT channel, CAST(SUM(term) AS DOUBLE) AS shapley
    FROM terms GROUP BY channel
    """,
)
def ext_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ch = spark.createDataFrame(_SHAP_CHANNELS, "channel string, bit long")
    uc = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    touched = F.when(F.col("n") >= _SHAP_THR, F.col("bit"))
    um = (
        uc.join(F.broadcast(ch), uc.event_type == ch.channel, "left")
        .groupBy("user_id")
        .agg(
            F.coalesce(F.sum(touched), F.lit(0)).alias("mask"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("n") >= _SHAP_THR), 1
                ).otherwise(0)
            ).alias("conv"),
        )
    )
    mc = um.groupBy("mask").agg(
        F.count(F.lit(1)).alias("nu"), F.sum("conv").alias("nc")
    )
    subs = spark.range(2**_SHAP_N).select(F.col("id").alias("smask"))
    vt = (
        subs.join(
            F.broadcast(mc),
            F.expr("(mask & ~smask) = 0"),
            "left",
        )
        .groupBy("smask")
        .agg(
            F.when(F.coalesce(F.sum("nu"), F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.coalesce(F.sum("nc"), F.lit(0)).cast("double")
                / F.coalesce(F.sum("nu"), F.lit(0))
            )
            .alias("v")
        )
    )
    wexpr = "CASE bit_count(smask) " + " ".join(
        f"WHEN {k} THEN {w}" for k, w in _SHAP_W.items()
    ) + " END"
    vs = vt.select(F.col("smask"), F.col("v").alias("v_s"))
    vi = vt.select(F.col("smask").alias("imask"), F.col("v").alias("v_i"))
    terms = (
        ch.join(F.broadcast(subs), F.expr("(smask & bit) = 0"))
        .join(F.broadcast(vs), "smask")
        .join(F.broadcast(vi), F.expr("imask = smask + bit"))
        .select(
            "channel",
            F.round(
                F.expr(wexpr) * (F.col("v_i") - F.col("v_s")) / F.lit(float(_SHAP_FACT)),
                9,
            ).cast("decimal(14,9)").alias("term"),
        )
    )
    return terms.groupBy("channel").agg(F.sum("term").cast("double").alias("shapley"))
ext_shapley_attribution.__doc__ = """Data-driven Shapley-value channel attribution: each channel's
credit for conversion is its average marginal lift over every
coalition of the other channels — the game-theoretic attribution
that first/last-touch (ext_attribution_first_last) approximates.
Coalition value v(S) = conversion rate among users whose touched
channel set is contained in S (touched/converted = >= {thr} events
of that type — a per-user engagement threshold that actually splits
the population); with {n} channels the {n2} subsets enumerate
EXACTLY (no sampling), so the result is closed-form.

Scale shape: ONE corpus-sized aggregate (per-user channel bitmask +
conversion flag) collapses everything to <= {n2} mask rows; the
containment join, coalition values, and marginal terms all run on
subset-sized frames that broadcast. Adding channels grows subsets
2^n — the documented limit of exact Shapley (sampling or KernelSHAP
is the >12-channel path). Exactness: each marginal term rounds to 9
decimals and sums as DECIMAL (order-proof); v is a single int/int
double division, identical in both engines.""".format(
    n=_SHAP_N, n2=2**_SHAP_N, thr=_SHAP_THR
)

