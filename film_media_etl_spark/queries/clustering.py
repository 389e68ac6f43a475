"""Vector clustering: one exact Lloyd assignment step over the embeddings
table — the building block of IVF index construction (the engine's
ext_knn_ivf trains cells this way) exposed as an oracle-checkable query.

A full k-means run is iterative and not SQL-expressible, but a single
assignment step against FIXED deterministic seeds is: every vector goes
to its nearest seed by squared-L2 (left-to-right fold, bit-identical in
both engines — functions/vectors.py), ties break on the lower seed id.
Cluster centroid UPDATES (means of doubles) are deliberately not
oracle-compared: parallel double sums drift by ulps; the IVF operator
does that part with tolerance-tested pytest coverage instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import l2sq, oracle_l2sq, to_double_vec
from ..sources import load_table
from .registry import register

_N_SEEDS = 8


@register(
    "ext_kmeans_assign",
    oracle=f"""
    WITH seeds AS (
      SELECT vec_id AS centroid_id, embedding AS ce
      FROM embeddings WHERE vec_id < {_N_SEEDS}
    ),
    scored AS (
      SELECT v.vec_id, s.centroid_id,
             {oracle_l2sq("v.embedding", "s.ce")} AS dist2
      FROM embeddings v CROSS JOIN seeds s
    ),
    assigned AS (
      SELECT vec_id, centroid_id, dist2
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY dist2 ASC, centroid_id ASC) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT a.centroid_id,
           COUNT(*) AS n_vectors,
           MIN(a.dist2) AS min_dist2,
           MAX(a.dist2) AS max_dist2,
           COUNT(DISTINCT e.label) AS n_labels
    FROM assigned a JOIN embeddings e ON a.vec_id = e.vec_id
    GROUP BY a.centroid_id
    """,
)
def ext_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd assignment step: vectors assigned to the nearest of 8
    deterministic seed centroids (vec_id < 8) by exact squared-L2;
    per-cluster size, distance envelope, and label diversity.

    Scale shape: seeds broadcast (k vectors), so scoring is a map-only
    pass over the corpus — k folds per row, no shuffle; the per-vector
    argmin window partitions on vec_id (k rows per partition key);
    cluster stats are one k-row aggregate. This is exactly how the IVF
    trainer scales to a billion vectors: the only corpus-sized shuffle
    is the final tiny groupBy."""
    emb = load_table(spark, sf_dir, "embeddings")
    seeds = F.broadcast(
        emb.where(F.col("vec_id") < _N_SEEDS).select(
            F.col("vec_id").alias("centroid_id"),
            to_double_vec(F.col("embedding")).alias("ce"),
        )
    )
    scored = emb.select(
        "vec_id", "label", to_double_vec(F.col("embedding")).alias("ve")
    ).crossJoin(seeds).select(
        "vec_id",
        "label",
        "centroid_id",
        l2sq(F.col("ve"), F.col("ce")).alias("dist2"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist2"), F.asc("centroid_id"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    )
    return assigned.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min("dist2").alias("min_dist2"),
        F.max("dist2").alias("max_dist2"),
        F.countDistinct("label").alias("n_labels"),
    )
