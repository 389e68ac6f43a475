"""Declarative data-quality rule engine (single-pass) and
last-observation-carried-forward gap imputation.

The rule engine is the constraint-suite pattern (Deequ-style): N
declarative checks — completeness, uniqueness, range, set membership,
format — compiled into ONE conditional-aggregation pass over the table,
then unpivoted to a verdict row per rule. The reference's README asks
the operator to 'validate row counts between source and target' by hand
(README.md:165-170); this is that step as an engine primitive. The LOCF
query is the imputation half of ext_timeseries_densify: densify says
WHERE the gaps are, forward-fill says what value to carry through them.

Exactness: every rule verdict is integer counting (one COUNT DISTINCT
for uniqueness); LOCF carries raw doubles untouched (projection-only),
and Spark last(ignorenulls) == DuckDB LAST_VALUE ... IGNORE NULLS under
the ROWS UNBOUNDED PRECEDING..CURRENT ROW frame (parity precedent:
ext_attribution_first_last).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


@register(
    "ext_dq_rules",
    oracle="""
    WITH a AS (
      SELECT COUNT(*) AS n_rows,
             SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS v_null,
             COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_dup,
             SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS v_price,
             SUM(CASE WHEN o_orderdate <  TIMESTAMP '1990-01-01 00:00:00'
                        OR o_orderdate >= TIMESTAMP '2030-01-01 00:00:00'
                      THEN 1 ELSE 0 END) AS v_date,
             SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                      THEN 1 ELSE 0 END) AS v_status,
             SUM(CASE WHEN o_orderpriority IS NULL
                        OR NOT regexp_matches(o_orderpriority, '^[1-5]-')
                      THEN 1 ELSE 0 END) AS v_prio
      FROM orders
    )
    SELECT rule, n_rows, n_violations, n_violations = 0 AS passed
    FROM (
      SELECT 'not_null:o_orderkey' AS rule, n_rows,
             CAST(v_null AS BIGINT) AS n_violations FROM a
      UNION ALL SELECT 'unique:o_orderkey', n_rows,
             CAST(v_dup AS BIGINT) FROM a
      UNION ALL SELECT 'positive:o_totalprice', n_rows,
             CAST(v_price AS BIGINT) FROM a
      UNION ALL SELECT 'in_range:o_orderdate', n_rows,
             CAST(v_date AS BIGINT) FROM a
      UNION ALL SELECT 'in_set:o_orderstatus', n_rows,
             CAST(v_status AS BIGINT) FROM a
      UNION ALL SELECT 'matches:o_orderpriority', n_rows,
             CAST(v_prio AS BIGINT) FROM a
    )
    """,
)
def ext_dq_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite over orders: six declarative rules (not-null,
    unique key, positive amount, date range, status domain, priority
    format) evaluated in ONE aggregation pass — each rule is a
    conditional count fused into the same partial/final aggregate, so
    adding a rule costs an expression, not a scan. The only rule needing
    more than map-side arithmetic is uniqueness (exact COUNT DISTINCT);
    the one-row verdict vector unpivots to a row per rule via stack().
    This is the audit gate a pipeline runs BEFORE publishing a load."""
    o = load_table(spark, sf_dir, "orders")

    def viol(cond) -> F.Column:  # count_if
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    a = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        viol(F.col("o_orderkey").isNull()).alias("v_null"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).cast("long").alias(
            "v_dup"
        ),
        viol(F.col("o_totalprice") <= 0).alias("v_price"),
        viol(
            (F.col("o_orderdate") < F.to_timestamp(F.lit("1990-01-01 00:00:00")))
            | (
                F.col("o_orderdate")
                >= F.to_timestamp(F.lit("2030-01-01 00:00:00"))
            )
        ).alias("v_date"),
        viol(~F.col("o_orderstatus").isin("O", "F", "P")).alias("v_status"),
        viol(
            F.col("o_orderpriority").isNull()
            | ~F.col("o_orderpriority").rlike("^[1-5]-")
        ).alias("v_prio"),
    )
    rules = a.select(
        "n_rows",
        F.expr(
            "stack(6, "
            "'not_null:o_orderkey', v_null, "
            "'unique:o_orderkey', v_dup, "
            "'positive:o_totalprice', v_price, "
            "'in_range:o_orderdate', v_date, "
            "'in_set:o_orderstatus', v_status, "
            "'matches:o_orderpriority', v_prio) AS (rule, n_violations)"
        ),
    )
    return rules.select(
        "rule", "n_rows", "n_violations", (F.col("n_violations") == 0).alias("passed")
    )


@register(
    "ext_forward_fill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(CAST(ts AS TIMESTAMP))) AS lo,
             date_trunc('hour', MAX(CAST(ts AS TIMESTAMP))) AS hi
      FROM events
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
    ), types AS (
      SELECT DISTINCT event_type FROM events
    ), agg AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
             MAX(value) AS reading
      FROM events GROUP BY 1, 2
    ), dense AS (
      SELECT s.hour, t.event_type, a.reading
      FROM spine s
      CROSS JOIN types t
      LEFT JOIN agg a ON a.hour = s.hour AND a.event_type = t.event_type
    )
    SELECT hour, event_type,
           COALESCE(reading, -1.0) AS reading,
           COALESCE(LAST_VALUE(reading IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY hour ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0)
             AS filled,
           reading IS NULL AS was_gap
    FROM dense
    """,
)
def ext_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill imputation (last observation carried forward): the
    hourly peak reading per event type on the densified hour x type
    spine, with empty hours inheriting the most recent known value —
    the standard repair for sensor/metric series before joins or
    modeling (leading gaps stay NULL: there is nothing to carry).
    Scale shape: the fill window runs on the SPINE frame (hours x
    types, data-independent size), never on raw events — events collapse
    to per-hour maxima first, so the per-type window partition is
    bounded by the calendar, not by data volume. Readings are raw
    doubles (max is order-insensitive; no arithmetic touches them)."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    types = ev.select("event_type").distinct()
    agg = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
    ).agg(F.max("value").alias("reading"))
    dense = spine.crossJoin(types).join(agg, ["hour", "event_type"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.asc("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Gap cells carry sentinel -1.0 with the was_gap flag, not NULL
    # doubles (NaN-vs-None at the driver boundary, queries/registry.py);
    # event values are non-negative so -1.0 is unambiguous. Leading gaps
    # (nothing to carry yet) sentinel the same way in `filled`.
    return dense.select(
        "hour",
        "event_type",
        F.coalesce(F.col("reading"), F.lit(-1.0)).alias("reading"),
        F.coalesce(
            F.last("reading", ignorenulls=True).over(w), F.lit(-1.0)
        ).alias("filled"),
        F.col("reading").isNull().alias("was_gap"),
    )
