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
