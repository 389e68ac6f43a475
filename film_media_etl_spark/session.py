"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the
configuration below is chosen so the same logical plans scale to a real
multi-executor cluster:

- AQE on (runtime shuffle coalescing, skew-join splitting, dynamic
  broadcast promotion) — the primary defense against skew at 100 TB.
- ``spark.sql.shuffle.partitions`` sized to the local core count; on a
  cluster this should be ~2-3x total executor cores (AQE coalesces down).
- Arrow enabled so the Pandas-UDF escape hatch is batch-vectorized.
- Session timezone pinned to UTC so date arithmetic is reproducible and
  hash-comparable with the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "film-media-etl-spark"


def cpu_count() -> int:
    raw = os.environ.get("SPARK_GRAFT_CPUS")
    if raw:
        try:
            return max(1, int(raw))
        except ValueError:
            pass
    return os.cpu_count() or 4


def get_spark(app_name: str = DEFAULT_APP_NAME, *, cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Idempotent: repeated calls return the active session. Config knobs that
    matter at scale are set explicitly so the intent survives a move from
    local mode to a cluster deployment.
    """
    n = cpus or cpu_count()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        # Shuffle sizing: local == core count; cluster == 2-3x total cores.
        .config("spark.sql.shuffle.partitions", str(n))
        # AQE: coalesce post-shuffle partitions, split skewed joins,
        # promote to broadcast when runtime stats allow.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for the Pandas-UDF path (similarity / multimodal operators).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic, oracle-comparable date/time semantics.
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet scans: keep row-group pruning + column pruning on
        # (defaults, pinned here as documentation of intent).
        .config("spark.sql.parquet.filterPushdown", "true")
        # zstd over default snappy for every parquet the engine writes:
        # measured on the fact write — same wall (0.50s vs 0.59s) at 38%
        # smaller files (20.6 vs 33.3 MB at sf0.1). At 100 TB the scan is
        # IO-bound, so the size win compounds on every downstream read.
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Runtime bloom-filter join pruning: when one join side is
        # selectively filtered, inject a bloom filter into the other
        # side's scan — at 100 TB this skips row groups that can't match.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Local mode: all memory is driver memory. Harmless on a cluster
        # where spark-submit overrides it.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
