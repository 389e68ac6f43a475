"""Source/sink format coverage as oracle-checked queries: CSV, JSON-lines,
ORC, hive-partitioned parquet, and JSON column extraction.

Each roundtrip writes the table through the format under test and scans
it back — the oracle reads the original parquet, so a value-hash match
proves the format path is lossless for the types involved. The
partitioned-fact query additionally feeds tests/test_plans.py, which
asserts the year filter becomes a PartitionFilter (directory pruning).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import ensure_parallelism, load_table
from ..sources.maintenance import morton_sql as _morton_sql
from ..sources.formats import (
    read_csv,
    read_jsonl,
    read_orc,
    write_csv,
    write_jsonl,
    write_orc,
    write_partitioned,
)
from .registry import register


def _tmp(sf_dir: str, leaf: str) -> str:
    return os.path.join(
        tempfile.gettempdir(), "fmes_io", os.path.basename(sf_dir.rstrip("/")), leaf
    )


@register(
    "ext_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def ext_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink+source with explicit schema (ingest-only format: no
    pushdown, no stats — land to parquet before repeated querying)."""
    src = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    path = _tmp(sf_dir, "nation_csv")
    write_csv(src, path)
    return read_csv(spark, path, src.schema)


@register(
    "ext_jsonl_roundtrip",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def ext_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink+source with explicit schema."""
    src = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    path = _tmp(sf_dir, "region_jsonl")
    write_jsonl(src, path)
    return read_jsonl(spark, path, src.schema)


@register(
    "ext_orc_roundtrip",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
)
def ext_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink+source (columnar alternative; schema travels with files)."""
    src = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    path = _tmp(sf_dir, "supplier_orc")
    write_orc(src, path)
    return read_orc(spark, path)


@register(
    "ext_partitioned_scan",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(year(o_orderdate) AS INT) AS year
    FROM orders
    WHERE CAST(year(o_orderdate) AS INT) = (
      SELECT CAST(MAX(year(o_orderdate)) AS INT) FROM orders)
    """,
)
def ext_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned warehouse layout: write orders partitioned by
    year, scan back with a year predicate. The filter prunes at the
    DIRECTORY level (PartitionFilters, asserted in tests/test_plans.py) —
    the scale replacement for the reference's secondary fact indexes
    (createStarSchema...R:168-172)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.year("o_orderdate").alias("year"),
    )
    path = _tmp(sf_dir, "orders_by_year")
    write_partitioned(o, path, ["year"])
    top_year = o.agg(F.max("year")).first()[0]
    # explicit schema: skips inference (and an empty input yields an
    # empty frame instead of an AnalysisException on schema inference)
    back = spark.read.schema(o.schema).parquet(path).where(F.col("year") == top_year)
    return back.select(
        "o_orderkey", "o_custkey", "o_totalprice", F.col("year").cast("int").alias("year")
    )


@register(
    "ext_json_props",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_total,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS k_max
    FROM events
    GROUP BY event_type
    """,
)
def ext_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column extraction: parse the events.props JSON
    string JVM-side (get_json_object — no Python in the hot path) and
    aggregate the extracted field per event type."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).cast("long").alias("k_total"),
        F.max(k).cast("int").alias("k_max"),
    )


@register(
    "ext_schema_evolution",
    oracle="""
    SELECT CAST(o_orderkey % 2 AS INT) AS batch,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_priority
    FROM orders
    GROUP BY 1
    """,
)
def ext_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: batch 0 lands with the v1 schema
    (key/price/date), batch 1 with v2 (adds o_orderpriority); reading
    the directory with mergeSchema=true unions the schemas and
    NULL-fills the missing column for v1 files — the additive-column
    upgrade every long-lived lake table goes through, with no rewrite
    of historical files. The result audits exactly that: per batch, row
    count and how many rows carry the new column (batch 0 must report
    zero). Merge cost note: schema reconciliation reads FOOTERS, not
    data — safe at 100 TB where a backfill rewrite is not."""
    o = load_table(spark, sf_dir, "orders")
    path = _tmp(sf_dir, "orders_evolved")
    b0 = o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    b1 = o.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderdate", "o_orderpriority"
    )
    b0.write.mode("overwrite").parquet(os.path.join(path, "batch=0"))
    b1.write.mode("overwrite").parquet(os.path.join(path, "batch=1"))
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    return merged.groupBy(F.col("batch").cast("int").alias("batch")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("o_orderpriority").isNotNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_with_priority"),
    )


@register(
    "ext_bad_records_quarantine",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN n_nationkey % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_valid,
           CAST(SUM(CASE WHEN n_nationkey % 2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_quarantined
    FROM nation
    """,
)
def ext_bad_records_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record quarantine: a JSONL drop where odd-keyed lines are
    deliberately malformed; the PERMISSIVE reader parses what it can and
    routes the rest into _corrupt_record instead of failing the job —
    the land-everything-then-quarantine pattern real feeds require
    (FAILFAST on a 100 TB drop loses the night; DROPMALFORMED loses the
    evidence). The audit counts parsed vs quarantined rows; the
    quarantined line text stays available for replay. Parsing is
    per-partition map work — no shuffle until the one-row audit agg."""
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    n = load_table(spark, sf_dir, "nation")
    path = _tmp(sf_dir, "nation_feed")
    lines = n.select(
        F.when(
            F.col("n_nationkey") % 2 == 0,
            F.to_json(F.struct("n_nationkey", "n_name")),
        )
        .otherwise(
            F.concat(
                F.lit('{"n_nationkey": '),
                F.col("n_nationkey").cast("string"),
                F.lit(', "n_name": BROKEN'),
            )
        )
        .alias("value")
    )
    lines.write.mode("overwrite").text(path)
    schema = StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    feed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # NB Spark refuses a query whose only materialized field is the
    # internal corrupt-record column; counting a REAL parsed column
    # (n_name survives only on valid rows) keeps the scan legal and
    # gives the same audit.
    return feed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("n_name").cast("long").alias("n_valid"),
        (F.count(F.lit(1)) - F.count("n_name")).cast("long").alias("n_quarantined"),
    )


@register(
    "ext_multiline_json",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def ext_multiline_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiline-JSON source: one file holding a single JSON ARRAY (the
    API-export shape), read with multiLine=true. The scale caveat IS the
    point and is documented here: a multiline JSON file is one record
    stream — NOT splittable, one task per file regardless of size — so
    the pattern is land → parse once → rewrite to parquet; JSONL
    (ext_jsonl_roundtrip) is the splittable streaming twin. The array
    is assembled distributedly (collect_list into one row, written as
    text) — no driver-side row materialization."""
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    path = _tmp(sf_dir, "region_array_json")
    arr = r.select(F.to_json(F.struct("r_regionkey", "r_name")).alias("j")).agg(
        F.concat(
            F.lit("["), F.concat_ws(",", F.sort_array(F.collect_list("j"))), F.lit("]")
        ).alias("value")
    )
    arr.coalesce(1).write.mode("overwrite").text(path)
    doc = (
        spark.read.option("multiLine", "true")
        .schema("r_regionkey long, r_name string")
        .json(path)
    )
    return doc.select(
        F.col("r_regionkey").cast("int").alias("r_regionkey"), "r_name"
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering — the multi-column data-skipping layout
# ---------------------------------------------------------------------------

_ZB = 6  # 2^6 = 64 layout buckets (a stand-in for files / row groups)

# Key normalization to the full 16-bit Morton domain (raw keys fill only
# ~11/7 bits at fixture scale, which would park every row in z-bucket 0).
# Double multiply-then-divide + FLOOR is IEEE-identical in both engines
# (products < 2^53 are exact); +1 in the denominator keeps the max key
# inside 0..65535.
_NORM_P = "CAST(FLOOR((l_partkey - minp) * 65535.0 / (maxp - minp + 1)) AS BIGINT)"
_NORM_S = "CAST(FLOOR((l_suppkey - mins) * 65535.0 / (maxs - mins + 1)) AS BIGINT)"
_STATS = ("SELECT MIN(l_partkey) AS minp, MAX(l_partkey) AS maxp, "
          "MIN(l_suppkey) AS mins, MAX(l_suppkey) AS maxs FROM lineitem")


@register(
    "ext_zorder_layout",
    oracle=f"""
    WITH stats AS ({_STATS}),
    norm AS (
      SELECT l_partkey, l_suppkey, {_NORM_P} AS p16, {_NORM_S} AS s16
      FROM lineitem CROSS JOIN stats
    ),
    keyed AS (
      SELECT l_partkey, l_suppkey, p16,
             {_morton_sql("p16", "s16")} AS zval
      FROM norm
    ),
    buckets AS (
      SELECT 'zorder' AS layout, (zval >> {32 - _ZB}) AS bucket,
             l_partkey, l_suppkey FROM keyed
      UNION ALL
      SELECT 'linear' AS layout, (p16 >> {16 - _ZB}) AS bucket,
             l_partkey, l_suppkey FROM keyed
    ),
    per_bucket AS (
      SELECT layout, bucket, COUNT(*) AS n,
             MAX(l_partkey) - MIN(l_partkey) AS partkey_span,
             MAX(l_suppkey) - MIN(l_suppkey) AS suppkey_span
      FROM buckets GROUP BY layout, bucket
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(SUM(partkey_span) AS DOUBLE) / COUNT(*) AS avg_partkey_span,
           CAST(SUM(suppkey_span) AS DOUBLE) / COUNT(*) AS avg_suppkey_span
    FROM per_bucket GROUP BY layout
    """,
)
def ext_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering audit: normalize two lookup keys to
    the 16-bit Morton domain, interleave their bits into one sort key,
    bucket the table by its high bits (a stand-in for file/row-group
    assignment under a clustered write), and report each layout's
    per-bucket min/max ENVELOPE — the statistic parquet footers store
    and scans prune on. Z-ordered buckets bound BOTH key columns at
    once (each bucket is a small rectangle in key space: ~1/8 of each
    key range at 64 buckets), while a linear single-key sort bounds
    only its own column (1/64 of partkey, ALL of suppkey) — the
    measurable reason a 100 TB table z-ordered on (partkey, suppkey)
    skips row groups for predicates on EITHER key. The Morton key is a
    pure integer expression (no UDF; the only shuffles are the 4-value
    stats agg broadcast back and the bucket agg); applying the layout
    for real is sortWithinPartitions(zval) before a clustered write
    (sources/maintenance.py compaction + this key)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    stats = li.agg(
        F.min("l_partkey").alias("minp"),
        F.max("l_partkey").alias("maxp"),
        F.min("l_suppkey").alias("mins"),
        F.max("l_suppkey").alias("maxs"),
    )
    norm = li.crossJoin(F.broadcast(stats)).selectExpr(
        "l_partkey", "l_suppkey", f"{_NORM_P} AS p16", f"{_NORM_S} AS s16"
    )
    keyed = norm.withColumn("zval", F.expr(_morton_sql("p16", "s16")))
    z = keyed.select(
        F.lit("zorder").alias("layout"),
        F.shiftright("zval", 32 - _ZB).alias("bucket"),
        "l_partkey",
        "l_suppkey",
    )
    lin = keyed.select(
        F.lit("linear").alias("layout"),
        F.shiftright("p16", 16 - _ZB).alias("bucket"),
        "l_partkey",
        "l_suppkey",
    )
    per_bucket = (
        z.unionByName(lin)
        .groupBy("layout", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.max("l_partkey") - F.min("l_partkey")).alias("partkey_span"),
            (F.max("l_suppkey") - F.min("l_suppkey")).alias("suppkey_span"),
        )
    )
    return per_bucket.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("n").cast("long").alias("n_rows"),
        (F.sum("partkey_span").cast("double") / F.count(F.lit(1))).alias("avg_partkey_span"),
        (F.sum("suppkey_span").cast("double") / F.count(F.lit(1))).alias("avg_suppkey_span"),
    )


@register(
    "ext_binaryfile_ingest",
    oracle="""
    WITH g AS (
      SELECT d.doc_id AS media_id, x.x, y.y
      FROM documents d
      CROSS JOIN generate_series(0, 7) AS x(x)
      CROSS JOIN generate_series(0, 7) AS y(y)
      WHERE d.doc_id < 50
    )
    SELECT media_id,
           CAST(203 AS BIGINT) AS file_bytes,
           CAST(8 AS INT) AS width,
           CAST(8 AS INT) AS height,
           AVG(CAST((media_id * 7 + x * 3 + y * 5) % 256 AS DOUBLE)) AS mean_r,
           AVG(CAST((media_id * 7 + x * 3 + y * 5 + 11) % 256 AS DOUBLE)) AS mean_g,
           AVG(CAST((media_id * 7 + x * 3 + y * 5 + 22) % 256 AS DOUBLE)) AS mean_b
    FROM g GROUP BY media_id
    """,
)
def ext_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-lake ingest through Spark's `binaryFile` SOURCE — the
    standard entry point for image/audio directories: land real .ppm
    FILES on disk (one deterministic 8x8 P6 per doc_id < 50, written
    by the executors), then read them back with
    `spark.read.format("binaryFile")` (path, length, content), recover
    the id from the file NAME, and decode with the real Netpbm parser.
    The oracle checks the exact on-disk byte count (203 = 11-byte
    header + 192-byte raster) alongside the closed-form channel means,
    so a write that truncates, a glob that misses files, or a reader
    that mangles content all fail the hash.

    Scale shape: the write is one foreachPartition pass (shared-FS/
    object-store directory on a real cluster); binaryFile lists and
    reads files in parallel with `pathGlobFilter` pruning at the
    listing, and each file's bytes stream through one Arrow-batched
    decode — no shuffle anywhere. binaryFile is ingest-only (no
    pushdown beyond the glob): land decoded features to parquet before
    repeated querying — the same rule as the CSV source."""
    import os as _os
    import shutil

    from ..operators.multimodal import image_channel_stats, render_ppm_media

    ids = ensure_parallelism(
        load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    ).select("doc_id")
    path = _tmp(sf_dir, "ppm_files")
    if _os.path.isdir(path):
        shutil.rmtree(path)
    _os.makedirs(path, exist_ok=True)
    rendered = render_ppm_media(ids)

    def land(rows):
        import os

        for r in rows:
            tmp = os.path.join(path, f".{r['media_id']}.ppm.tmp")
            with open(tmp, "wb") as f:
                f.write(bytes(r["payload"]))
            os.replace(tmp, os.path.join(path, f"{r['media_id']}.ppm"))

    rendered.foreachPartition(land)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.ppm")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.ppm$", 1)
            .cast("long")
            .alias("media_id"),
            F.col("length").cast("long").alias("file_bytes"),
            F.col("content").alias("payload"),
        )
        .withColumn(
            "meta",
            F.struct(
                F.lit("image/x-portable-pixmap").alias("mime"),
                F.col("file_bytes").alias("declared_bytes"),
            ),
        )
    )
    stats = image_channel_stats(files.select("media_id", "payload", "meta"))
    return files.select("media_id", "file_bytes").join(stats, "media_id")
