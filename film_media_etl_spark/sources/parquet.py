"""Parquet source layer.

The reference extracts from two SQLite OLTP databases with full-table SQL
scans (reference ` loadAnalyticsDB.PractII.SavithriAnbarasuH.R`:44-53) and
materializes every extract in driver memory. Here a source is a columnar
Parquet scan: Catalyst pushes filters into the scan (row-group skipping via
min/max stats) and prunes columns, so "extract" never materializes more than
the query needs — the property that makes the same code viable at 100 TB.

Live-database extraction (the reference's SQLite/MySQL role) maps to
``spark.read.jdbc`` — see ``sources.jdbc``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Driver-generated test tables (TESTDATA.md). One parquet file per table.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Lazy — nothing is read until an action runs.

    The events table stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects outright. Read it as raw int64
    nanoseconds (legacy conf) and convert with exact integer division —
    NOT float division: epoch-nanos exceed 2^53, doubles would corrupt
    timestamps. DuckDB truncates nanos->micros the same way, so the
    oracle agrees.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL entry points).

    View names match the DuckDB oracle's pre-registered views so the same
    SQL text is portable between the two engines.
    """
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def ensure_parallelism(df, min_parts: int | None = None):
    """Round-robin repartition when the upstream has fewer partitions
    than the session's parallelism.

    Why: a parquet file is splittable only at ROW-GROUP boundaries, so a
    small-file / single-row-group table scans as ONE partition no matter
    what spark.sql.files.maxPartitionBytes says — and every CPU-heavy
    map fused onto that scan (minhash signature folds, charlm scoring,
    PassJoin segment generation, cluster assignment, mapInPandas decode)
    runs on ONE core. Measured on the 4x scale corpus: the whole MinHash
    pipeline collapsed into a single 104-second task while 31 cores sat
    idle. The guard keeps this a no-op exactly when it should be: a
    100 TB table arrives in thousands of row groups, already at or above
    session parallelism, so no shuffle is added at scale — only the
    small-input regime pays one cheap round-robin exchange of the raw
    rows. Row order is not part of any operator's contract, so results
    are unchanged (oracle sweeps stay green).
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    # getNumPartitions compiles the plan but launches no job
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
