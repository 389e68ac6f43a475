"""Bucketed table layout: pre-shuffled, co-located storage for repeated
joins on the same key.

The reference's answer to repeated joins is secondary indexes on the
warehouse (createStarSchema...R:163-172). Spark's columnar analogue is
bucketing: ``bucketBy(n, key)`` hash-partitions rows into a fixed number
of buckets AT WRITE TIME, so every later join or aggregation on that key
reads an already-correctly-distributed table — the shuffle is paid once
by the writer, then amortized over every query. At 100 TB this converts
the nightly fact⋈dim or fact⋈fact join from a full two-sided exchange
(the dominant cost) into a zero-exchange sort-merge join; bucket counts
should be sized so one bucket ≈ one task's memory budget (hundreds to
thousands of buckets at cluster scale, 8 at test SF).

Bucketed layout metadata lives in the session catalog (``saveAsTable``),
which is what lets the planner trust the on-disk distribution; plain
``.parquet(path)`` writes cannot carry it.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from .parquet import load_table

_BUCKETS = 8
_CACHE: set[tuple[str, str, str]] = set()


def bucketed_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    key: str,
    *,
    buckets: int = _BUCKETS,
) -> DataFrame:
    """Materialize ``name`` bucketed+sorted on ``key`` (once per session
    and sf_dir) and return the catalog-backed DataFrame. Files live under
    the session temp dir; only catalog metadata is session-state."""
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    tbl = f"fmes_bkt_{name}_{sf_tag}"
    cache_key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"), name)
    if cache_key not in _CACHE:
        path = os.path.join(
            tempfile.gettempdir(), f"fmes_buckets_{os.getpid()}", sf_tag, name
        )
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(buckets, key)
            .sortBy(key)
            .option("path", path)
            .format("parquet")
            .saveAsTable(tbl)
        )
        _CACHE.add(cache_key)
    return spark.table(tbl)
