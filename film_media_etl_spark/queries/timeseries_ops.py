"""Time-series and dataset-management operators: gap-free series
densification, cumulative user growth, deterministic train/val/test
splits, and scan-metadata lineage.

Time-series semantics the reference lacks entirely (its dim_date spine,
 loadAnalyticsDB...R:89-92, exists only to join facts — gaps in the fact
stream silently disappear from reports). Densification makes missing
buckets explicit zeros, which is what rate/SLA dashboards and
anomaly detectors need; the spine is GENERATED (sequence()), never
scanned, so its cost is independent of data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


# ---------------------------------------------------------------------------
# Gap-free densification (hour spine x event type, zero-filled)
# ---------------------------------------------------------------------------


@register(
    "ext_timeseries_densify",
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
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    )
    SELECT s.hour, t.event_type,
           CAST(COALESCE(a.cnt, 0) AS BIGINT) AS n_events,
           (a.cnt IS NULL) AS was_gap
    FROM spine s
    CROSS JOIN types t
    LEFT JOIN agg a ON a.hour = s.hour AND a.event_type = t.event_type
    """,
)
def ext_timeseries_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify hourly event counts onto a generated hour x type spine,
    zero-filling (and flagging) missing buckets. The spine is computed
    from a 2-row bounds aggregate and EXPLODED from sequence() — it
    never scans data, so a year of hours costs 8760 rows whether the
    table is 1 GB or 100 TB. The sparse aggregate broadcasts onto the
    spine (or vice versa — both sides are bucket-cardinality-sized after
    the first aggregate)."""
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
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return (
        spine.crossJoin(types)
        .join(agg, ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_events"),
            F.col("cnt").isNull().alias("was_gap"),
        )
    )


# ---------------------------------------------------------------------------
# Cumulative user growth (first-seen -> running total)
# ---------------------------------------------------------------------------


@register(
    "ext_cumulative_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ), daily AS (
      SELECT first_day AS day, COUNT(*) AS new_users
      FROM first_seen GROUP BY first_day
    )
    SELECT day, CAST(new_users AS BIGINT) AS new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS total_users
    FROM daily
    """,
)
def ext_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-growth curve: first-seen day per user, new users per day,
    running total — the activation metric every product dashboard leads
    with. Two hash aggregates collapse the stream to one row per DAY
    before the only ordered window runs; the global cumulative sum is
    therefore over calendar-cardinality rows, where a single-partition
    window is free (same policy as ext_token_zipf)."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    daily = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("total_users"),
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------


@register(
    "ext_dataset_split",
    oracle="""
    WITH tagged AS (
      SELECT doc_id, lang,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM tagged GROUP BY split, lang
    """,
)
def ext_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~90/5/5 train/val/test assignment by md5(key) prefix
    range ('e6'/'f3' hex thresholds), summarized per split x language.
    Content-hash splits are the only kind that survive re-partitioning,
    re-runs, and incremental corpus growth without leaking documents
    across splits — a doc's split is a pure function of its key. The
    assignment is map-side; the summary is one aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(bucket < "e6", "train").when(bucket < "f3", "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# Scan metadata / lineage
# ---------------------------------------------------------------------------


@register(
    "ext_scan_metadata",
    oracle="""
    SELECT 'orders.parquet' AS file_name, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM orders
    UNION ALL
    SELECT 'lineitem.parquet', CAST(COUNT(*) AS BIGINT) FROM lineitem
    """,
)
def ext_scan_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row counts per physical input file via the hidden _metadata
    column — the lineage primitive behind incremental ingestion ledgers
    and bad-file quarantine (which file did this row come from?). The
    metadata struct is populated by the scan itself (no filename UDF, no
    extra pass); grouping by file_name gives per-file audit counts that
    a 100 TB ingest reconciles against the upstream manifest. The oracle
    pins the known single-file layout; multi-file directories group the
    same way."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.select(F.col("_metadata.file_name").alias("file_name"))
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .unionByName(
            li.select(F.col("_metadata.file_name").alias("file_name"))
            .groupBy("file_name")
            .agg(F.count(F.lit(1)).alias("n_rows"))
        )
    )
