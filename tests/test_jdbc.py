"""Live JDBC tier test — the reference's actual I/O path (SQLite reads,
batched MySQL writes, ` loadAnalyticsDB...R`:17-53,106-134) re-expressed as
Spark's JDBC connector (sources/jdbc.py).

No SQLite/MySQL driver jar ships in this container, but PySpark bundles
Apache Derby (its Hive-metastore dependency) whose EMBEDDED driver works
in-JVM with zero network — enough to exercise the real code path: batched
write, plain read, and a PARTITIONED read with partitionColumn bounds
(the scalable replacement for the reference's single-threaded extract).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from film_media_etl_spark.sources.jdbc import read_jdbc, write_jdbc

pyspark_jars = glob.glob(
    os.path.join(os.path.dirname(__import__("pyspark").__file__), "jars", "derby-*.jar")
)


@pytest.mark.skipif(not pyspark_jars, reason="no Derby jar bundled with this PySpark")
def test_jdbc_roundtrip_partitioned(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/jdbcdb;create=true"
    src = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("row-"), F.col("id")).alias("label"),
    )
    write_jdbc(src, url, "t_roundtrip", mode="overwrite", batchsize=100)

    # plain read
    back = read_jdbc(spark, url, "t_roundtrip")
    assert back.count() == 1000
    assert {f.name.lower() for f in back.schema.fields} == {"k", "grp", "label"}

    # partitioned read: 4 range-predicated parallel queries over k
    part = read_jdbc(
        spark,
        url,
        "t_roundtrip",
        partition_column="k",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
    )
    assert part.rdd.getNumPartitions() == 4
    got = part.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sk"),
        F.count_distinct("label").alias("dl"),
    ).first()
    assert (got["n"], got["sk"], got["dl"]) == (1000, 999 * 1000 // 2, 1000)

    # append mode accumulates (the reference's batched INSERT behavior)
    write_jdbc(src.where(F.col("k") < 10), url, "t_roundtrip", batchsize=5)
    assert read_jdbc(spark, url, "t_roundtrip").count() == 1010
