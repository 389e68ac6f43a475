"""Multi-format source/sink layer: CSV, JSON-lines, ORC, partitioned
parquet.

The reference's only I/O is SQLite extract + MySQL INSERT text
(` loadAnalyticsDB...R`:44-53, 106-134). A complete engine speaks the
lake formats natively; everything here is a thin, typed veneer over
``spark.read``/``DataFrameWriter`` that pins the options that matter for
correctness (explicit schemas — never runtime inference on a 100 TB
path) and for scale (partitioned layout for pruning).

Format guidance encoded here:
- Parquet is the canonical interchange + warehouse format (columnar,
  min/max stats, predicate pushdown).
- CSV/JSON are ingest-only formats: text scan, no pushdown, no types —
  always land them to parquet before repeated querying.
- ``write_partitioned`` lays out the warehouse fact by low-cardinality
  pruning columns (year/product_type, mirroring the reference's
  denormalized fact columns, createStarSchema...R:149-161) so partition
  pruning replaces its secondary indexes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_csv(df: DataFrame, path: str, *, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType, *, header: bool = True) -> DataFrame:
    """Schema ALWAYS explicit: inference is a full extra pass over the
    data and type-unstable between runs — both unacceptable at scale."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], *, mode: str = "overwrite"
) -> None:
    """Warehouse sink: hive-style partition layout on low-cardinality
    columns. Scans filtered on those columns then list only the matching
    directories (PartitionFilters in the plan) — the scale replacement
    for the reference's five secondary fact indexes
    (createStarSchema...R:168-172)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
