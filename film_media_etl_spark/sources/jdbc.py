"""JDBC source/sink — the engine's analogue of the reference's live-DB tier.

The reference reads SQLite in-process and writes MySQL over TCP with
hand-rolled batched INSERT text (reference ` loadAnalyticsDB...R`:106-134,
445-519; batch sizes 100-1000, "50-100x improvement" per README.md:50).
Spark's JDBC connector subsumes all of that: partitioned parallel reads
(``partitionColumn``/``numPartitions``) and batched writes (``batchsize``)
are engine features, not user code.

Exercised live by tests/test_jdbc.py against PySpark's bundled embedded
Derby driver (batched write, plain read, partitioned bounded read); no
SQLite/MySQL jar ships in this container, so those exact dialects remain
untested here — the connector options are dialect-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel partitioned JDBC read.

    With ``partition_column`` bounds set, Spark issues ``num_partitions``
    range-predicated queries in parallel — the scalable replacement for the
    reference's single-threaded full-table ``dbGetQuery`` extract.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    batchsize: int = 1000,
    properties: dict[str, str] | None = None,
) -> None:
    """Batched JDBC append — replaces the reference's sprintf'd INSERT
    batches (batch size pinned to the reference's largest, 1000)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
