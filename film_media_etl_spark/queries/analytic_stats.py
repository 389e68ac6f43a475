"""Statistical aggregates, GROUPING SETS, unpivot/melt, deterministic
hash-sampling, and regex extraction — completing the analytic surface
(SURVEY §2.D notes the reference has no median/percentile/stddev; §2.H
no regex; sampling is a training-data-pipeline staple, BASELINE.json
north-star).

Determinism notes (the reason these carry exact oracles):
- Spark ``percentile`` and DuckDB ``quantile_cont`` use the same
  lower + frac*(upper-lower) interpolation over the exactly-sorted
  values — verified bit-identical on this data.
- stddev is NOT computed with the engines' streaming variance (update
  order differs); it is derived from exact decimal moments (n, Σv, Σv²)
  with one identical double expression on both sides.
- Hash-sampling uses md5 (identical hex output in Spark and DuckDB), so
  the sample is reproducible across engines, runs, and partitionings —
  the only kind of sample that is debuggable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


@register(
    "ext_stats_agg",
    oracle="""
    WITH m AS (
      SELECT event_type, COUNT(*) AS n,
             MIN(value) AS min_v, MAX(value) AS max_v,
             quantile_cont(value, 0.5) AS med, quantile_cont(value, 0.9) AS p90,
             CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS s,
             CAST(SUM(CAST(value AS DECIMAL(18,3)) * CAST(value AS DECIMAL(18,3)))
                  AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_events,
           min_v AS min_value, max_v AS max_value,
           med AS median_value, p90 AS p90_value,
           sqrt((s2 - s * s / n) / (n - 1)) AS stddev_value
    FROM m
    """,
)
def ext_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order statistics + moment-derived stddev per event type.
    percentile() sorts per group (one shuffle on event_type); the decimal
    moments make stddev independent of aggregation order — see module
    doc. At 100 TB the exact percentile is the expensive path; the
    sketch-based twin is ext_approx_sketches."""
    ev = load_table(spark, sf_dir, "events")
    # Scale 3 matches the data grain exactly (verified: value == round(value,3)
    # at every SF); squares then sit at scale 6, so the scaled integer stays
    # under 2^53 and the decimal->double cast is correctly rounded in BOTH
    # engines. At scale 12 DuckDB's int128->double conversion is off by an ulp.
    d = F.col("value").cast("decimal(18,3)")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.percentile("value", 0.5).alias("median_value"),
        F.percentile("value", 0.9).alias("p90_value"),
        F.sum(d).cast("double").alias("_s"),
        F.sum(d * d).cast("double").alias("_s2"),
    )
    n = F.col("n_events")
    s, s2 = F.col("_s"), F.col("_s2")
    return g.select(
        "event_type",
        "n_events",
        "min_value",
        "max_value",
        "median_value",
        "p90_value",
        F.sqrt((s2 - s * s / n) / (n - F.lit(1))).alias("stddev_value"),
    )


@register(
    "ext_grouping_sets",
    oracle="""
    WITH src AS (
      SELECT o_orderpriority AS prio,
             CAST(year(o_orderdate) AS INT) AS year,
             CAST(o_totalprice AS DECIMAL(18,4)) AS v
      FROM orders
    )
    SELECT COALESCE(prio, 'ALL') AS prio,
           COALESCE(year, -1) AS year,
           GROUPING(prio, year) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(v) AS DECIMAL(38,4)) AS total_revenue
    FROM src
    GROUP BY GROUPING SETS ((prio, year), (prio), ())
    """,
)
def ext_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — (prio, year), (prio), and the grand
    total in ONE pass over the fact (vs three scans + union). Spark
    expands the sets with a single Expand node feeding one hash
    aggregate; completes the rollup/cube family (ext_cube, op26)."""
    (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("prio"),
            F.year("o_orderdate").cast("int").alias("year"),
            F.col("o_totalprice").cast("decimal(18,4)").alias("v"),
        )
        .createOrReplaceTempView("_gs_orders")
    )
    return spark.sql(
        """
        SELECT COALESCE(prio, 'ALL') AS prio,
               COALESCE(year, -1) AS year,
               grouping_id(prio, year) AS gid,
               COUNT(*) AS n_orders,
               CAST(SUM(v) AS DECIMAL(38,4)) AS total_revenue
        FROM _gs_orders
        GROUP BY GROUPING SETS ((prio, year), (prio), ())
        """
    )


@register(
    "ext_unpivot",
    oracle="""
    WITH wide AS (
      SELECT CAST(year(o_orderdate) AS INT) AS year,
             CAST(SUM(CASE WHEN quarter(o_orderdate) = 1
                           THEN CAST(o_totalprice AS DECIMAL(18,4))
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS q1,
             CAST(SUM(CASE WHEN quarter(o_orderdate) = 2
                           THEN CAST(o_totalprice AS DECIMAL(18,4))
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS q2,
             CAST(SUM(CASE WHEN quarter(o_orderdate) = 3
                           THEN CAST(o_totalprice AS DECIMAL(18,4))
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS q3,
             CAST(SUM(CASE WHEN quarter(o_orderdate) = 4
                           THEN CAST(o_totalprice AS DECIMAL(18,4))
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS q4
      FROM orders GROUP BY 1
    )
    SELECT year, 'q1' AS quarter, q1 AS revenue FROM wide
    UNION ALL SELECT year, 'q2', q2 FROM wide
    UNION ALL SELECT year, 'q3', q3 FROM wide
    UNION ALL SELECT year, 'q4', q4 FROM wide
    """,
)
def ext_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt — the inverse of the op24 conditional pivot: wide
    quarterly revenue columns back to (year, quarter, revenue) rows.
    Spark's unpivot is a Generate (row expansion), no shuffle beyond the
    aggregate that built the wide input."""
    zero = F.lit(0).cast("decimal(18,4)")
    dec = F.col("o_totalprice").cast("decimal(18,4)")
    wide = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("int").alias("year"))
        .agg(
            *[
                F.sum(F.when(F.quarter("o_orderdate") == q, dec).otherwise(zero))
                .cast("decimal(38,4)")
                .alias(f"q{q}")
                for q in (1, 2, 3, 4)
            ]
        )
    )
    return wide.unpivot(
        ids=["year"],
        values=["q1", "q2", "q3", "q4"],
        variableColumnName="quarter",
        valueColumnName="revenue",
    )


@register(
    "ext_hash_sample",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '19'
    """,
)
def ext_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% content-hash sample (md5 of the key, first two
    hex chars <= '19' -> 26/256 of the space). Unlike rand()-based
    TABLESAMPLE this is partition-layout-independent and reproducible
    across engines and runs — the correct way to carve a held-out slice
    from a 100 TB corpus. Pure JVM expressions; the predicate evaluates
    during the scan, nothing shuffles."""
    return (
        load_table(spark, sf_dir, "documents")
        .where(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) <= "19")
        .select("doc_id", "lang", "source", "n_chars")
    )


@register(
    "ext_regex_extract",
    oracle="""
    WITH m AS (
      SELECT doc_id, regexp_extract_all(text, 's[a-z]{3,}') AS ms
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST(unnest(range(len(ms))) AS INT) AS pos,
           unnest(ms) AS term
    FROM m
    """,
)
def ext_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction with ordinality: every s-prefixed term (>=4
    chars) per document, first 50 docs. regexp_extract_all runs JVM-side
    inside codegen; posexplode preserves match order. Java regex and RE2
    agree on this pattern class (no backtracking constructs)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.col("text"), F.lit("s[a-z]{3,}"), F.lit(0))
        ).alias("pos", "term"),
    )


@register(
    "ext_histogram",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 50.0) AS INT) AS bin,
           COUNT(*) AS n,
           MIN(value) AS bin_min,
           MAX(value) AS bin_max
    FROM events
    GROUP BY 1, 2
    """,
)
def ext_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values per type (bin = floor(v/50))
    — distribution profiling with zero floating-point ambiguity: one
    double division + floor per row, identical in both engines, then
    integer group keys. The partial/final hash aggregate keeps the
    shuffle proportional to (type x bin) cardinality, not rows — the
    shape that makes profiling free at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.floor(F.col("value") / F.lit(50.0)).cast("int").alias("bin"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("bin_min"),
            F.max("value").alias("bin_max"),
        )
    )


@register(
    "ext_profile_table",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderstatus) AS n_statuses,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*) - COUNT(o_totalprice) AS null_totalprice,
           COUNT(*) - COUNT(o_orderdate) AS null_orderdate,
           CAST(MIN(o_orderdate) AS DATE) AS min_orderdate,
           CAST(MAX(o_orderdate) AS DATE) AS max_orderdate
    FROM orders
    """,
)
def ext_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profile (the data-quality audit step the
    reference's README recommends but never implements — 'Validate row
    counts between source and target', README:179-183): row count, key
    cardinalities, per-column null counts, date range — all in ONE scan
    + one aggregate. countDistinct expands then two-phase aggregates;
    at 100 TB swap for approx_count_distinct (ext_approx_sketches) when
    exactness isn't contractual."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        (F.count(F.lit(1)) - F.count("o_totalprice")).alias("null_totalprice"),
        (F.count(F.lit(1)) - F.count("o_orderdate")).alias("null_orderdate"),
        F.min(F.to_date("o_orderdate")).alias("min_orderdate"),
        F.max(F.to_date("o_orderdate")).alias("max_orderdate"),
    )
