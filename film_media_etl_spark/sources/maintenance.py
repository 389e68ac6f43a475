"""Lake maintenance: small-file compaction with optional clustering.

The small-files problem is THE silent killer of 100 TB parquet lakes:
streaming/incremental sinks (streaming/incremental.py writes one file
per trigger per partition) accumulate files whose per-file overhead
(open, footer parse, scheduling) dwarfs the data. Compaction rewrites a
directory into ~target-sized files; clustering (sort-within-partition
on a filter column) additionally tightens per-row-group min/max stats
so later scans skip row groups — the columnar replacement for the
reference's warehouse indexes (createStarSchema...R:163-172).

Writes go to a NEW directory (never in-place: readers of the old
directory stay consistent; the caller swaps pointers when done) — the
same versioned-snapshot discipline as streaming/sinks.py.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def directory_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a local parquet directory tree."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    *,
    target_file_mb: int = 128,
    cluster_by: list[str] | None = None,
    n_files: int | None = None,
) -> DataFrame:
    """Rewrite ``in_path`` into ``out_path`` with ~``target_file_mb``
    files, optionally range-clustered on ``cluster_by``.

    File count = ceil(current_bytes / target): computed from the actual
    directory, so repeated compactions converge instead of oscillating.
    With ``cluster_by``, rows are range-partitioned then sorted within
    partitions — globally ordered output files whose min/max footer
    stats are disjoint, the precondition for row-group skipping on the
    cluster column. Returns the compacted DataFrame (lazy scan of the
    new directory).
    """
    if n_files is None:
        _, total_bytes = directory_stats(in_path)
        n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(in_path)
    if cluster_by:
        df = df.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


def morton_sql(x: str, y: str) -> str:
    """SQL (valid in BOTH Spark SQL and DuckDB) interleaving the low 16
    bits of ``x`` and ``y`` into a 32-bit Morton key — pure 64-bit
    integer shifts/masks, bit-identical everywhere. The classic
    bit-spread ladder; the expression text duplicates subterms, but both
    engines CSE them and integer ops are ~free next to the scan.
    Inputs MUST be 64-bit-typed expressions: a 32-bit input overflows
    the final left shift at bit 31 (pinned by
    tests/test_media_properties.py). Shared by the ext_zorder_layout
    audit query and zorder_compact's write path."""

    def spread(c: str) -> str:
        e = f"(({c}) & 65535)"
        for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
            e = f"((({e} | ({e} << {shift}))) & {mask})"
        return e

    return f"({spread(x)} | ({spread(y)} << 1))"


def zorder_compact(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    key_a: str,
    key_b: str,
    *,
    target_file_mb: int = 128,
    n_files: int | None = None,
) -> DataFrame:
    """Compaction with Z-ORDER clustering on two integer keys: normalize
    both keys to the 16-bit Morton domain (min/max from one tiny stats
    job), interleave into a Morton key, range-partition + sort on it,
    and rewrite. Every output file then covers a RECTANGLE in
    (key_a, key_b) space, so its parquet footer min/max bounds BOTH
    columns — scans with a predicate on either key skip files
    (single-key range clustering bounds only its own column; the
    measurable contrast is the ext_zorder_layout audit query).
    """
    from pyspark.sql import functions as F

    if n_files is None:
        _, total_bytes = directory_stats(in_path)
        n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(in_path)
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(key_a), F.max(key_a), F.min(key_b), F.max(key_b)
    ).first()
    if lo_a is None or lo_b is None:  # empty input: plain rewrite
        df.write.mode("overwrite").parquet(out_path)
        return spark.read.parquet(out_path)
    na = f"CAST(FLOOR(({key_a} - {lo_a}) * 65535.0 / {max(1, hi_a - lo_a) + 1}) AS BIGINT)"
    nb = f"CAST(FLOOR(({key_b} - {lo_b}) * 65535.0 / {max(1, hi_b - lo_b) + 1}) AS BIGINT)"
    z = df.withColumn("_z", F.expr(morton_sql(na, nb)))
    out = z.repartitionByRange(n_files, "_z").sortWithinPartitions("_z").drop("_z")
    out.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
