"""Vector clustering: one exact Lloyd assignment step over the embeddings
table — the building block of IVF index construction (the engine's
ext_knn_ivf trains cells this way) exposed as an oracle-checkable query.

A full k-means run is iterative and not SQL-expressible, but a single
assignment step against FIXED deterministic seeds is: every vector goes
to its nearest seed by squared-L2 (left-to-right fold, bit-identical in
both engines — functions/vectors.py), ties break on the lower seed id.

Centroid UPDATES (ext_kmeans_update) are oracle-exact too, via the
engine's integer fixed-point discipline (the ext_pagerank_exact trick):
coordinates quantize to Q20 fixed point with floor (the float * 2^20
product is exact — power-of-two scaling — and floor is unambiguous, no
round-half boundary), per-(cluster, dim) sums are BIGINT and therefore
order-free at any parallelism, and the mean is a single correctly-
rounded double division at the end. A raw double mean would drift by
ulps under parallel summation; this is how production systems make the
reduce deterministic, not a fixture workaround.

Assign and update share ONE assignment stage — `_ASSIGN_CTES` (oracle)
and `_assigned` (Spark) — so the tiebreak and seed rule cannot diverge
between the two steps; Catalyst column-prunes whatever a consumer does
not use (assign drops `ve`, update drops `label`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import l2sq, oracle_l2sq, to_double_vec
from ..sources import ensure_parallelism, load_table
from .registry import register

_N_SEEDS = 8

# seeds -> per-vector nearest-seed assignment, shared by both queries.
_ASSIGN_CTES = f"""
    seeds AS (
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
    )"""


def _seeds(emb: DataFrame) -> DataFrame:
    return F.broadcast(
        emb.where(F.col("vec_id") < _N_SEEDS).select(
            F.col("vec_id").alias("centroid_id"),
            to_double_vec(F.col("embedding")).alias("ce"),
        )
    )


def _assigned(emb: DataFrame, cents: DataFrame | None = None) -> DataFrame:
    """Spark twin of `_ASSIGN_CTES.assigned`, with the vector (`ve`) and
    `label` carried along for consumers that need them (unused columns
    are pruned by Catalyst). ``cents`` overrides the seed centroids —
    the Lloyd LOOP passes each round's updated (centroid_id, ce)."""
    scored = emb.select(
        "vec_id", "label", to_double_vec(F.col("embedding")).alias("ve")
    ).crossJoin(F.broadcast(cents) if cents is not None else _seeds(emb)).select(
        "vec_id",
        "label",
        "ve",
        "centroid_id",
        l2sq(F.col("ve"), F.col("ce")).alias("dist2"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist2"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "label", "ve", "centroid_id", "dist2")
    )


@register(
    "ext_kmeans_assign",
    oracle=f"""
    WITH {_ASSIGN_CTES}
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
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    return _assigned(emb).groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min("dist2").alias("min_dist2"),
        F.max("dist2").alias("max_dist2"),
        F.countDistinct("label").alias("n_labels"),
    )


_FP_SCALE = 1 << 20  # Q20 fixed point: exact for |x| < 2^43, floor-quantized


@register(
    "ext_kmeans_update",
    oracle=f"""
    WITH {_ASSIGN_CTES},
    vals AS (
      SELECT a.centroid_id, i - 1 AS dim,
             CAST(floor(e.embedding[i]::DOUBLE * {_FP_SCALE}.0) AS BIGINT)
               AS v_fp
      FROM assigned a
      JOIN embeddings e USING (vec_id),
      UNNEST(range(1, len(e.embedding) + 1)) AS r(i)
    ),
    sums AS (
      SELECT centroid_id, CAST(dim AS INT) AS dim,
             CAST(COUNT(*) AS BIGINT) AS n_vectors,
             CAST(SUM(v_fp) AS BIGINT) AS s_fp
      FROM vals GROUP BY 1, 2
    )
    SELECT m.centroid_id, m.dim, m.n_vectors,
           CAST(m.s_fp AS DOUBLE)
             / (CAST(m.n_vectors AS DOUBLE) * {_FP_SCALE}.0) AS new_coord,
           CAST(CAST(floor(s.ce[m.dim + 1]::DOUBLE * {_FP_SCALE}.0) AS BIGINT)
                AS DOUBLE) / {_FP_SCALE}.0 AS old_coord,
           CAST(m.s_fp AS DOUBLE)
             / (CAST(m.n_vectors AS DOUBLE) * {_FP_SCALE}.0)
           - CAST(CAST(floor(s.ce[m.dim + 1]::DOUBLE * {_FP_SCALE}.0) AS BIGINT)
                  AS DOUBLE) / {_FP_SCALE}.0 AS shift
    FROM sums m JOIN seeds s ON m.centroid_id = s.centroid_id
    """,
)
def ext_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd UPDATE step: per-(cluster, dimension) centroid means
    recomputed from the ext_kmeans_assign partition, in Q20 integer
    fixed point so the reduce is order-free and the oracle exact (see
    module doc). Output is long format — (centroid, dim, n, new/old
    coordinate, shift) — k x d = {_N_SEEDS} x 64 rows.

    Scale shape: assignment is the same broadcast-seeds map-only score;
    the explode multiplies rows by d but every (cluster, dim) partial
    sum combines map-side, so the shuffle carries at most
    partitions x k x d rows regardless of corpus size; the final join
    against seeds is a broadcast of k rows. BIGINT headroom: |coord| < 1
    so each term is < 2^20 — the sum stays exact past 2^42 vectors."""
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    vals = _assigned(emb).select(
        "centroid_id",
        F.posexplode("ve").alias("dim", "v"),
    ).select(
        "centroid_id",
        F.col("dim").cast("int").alias("dim"),
        F.floor(F.col("v") * F.lit(float(_FP_SCALE))).cast("long").alias("v_fp"),
    )
    sums = vals.groupBy("centroid_id", "dim").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum("v_fp").cast("long").alias("s_fp"),
    )
    old_fp = F.floor(
        F.element_at(F.col("ce"), F.col("dim") + 1) * F.lit(float(_FP_SCALE))
    ).cast("long")
    old_coord = old_fp.cast("double") / F.lit(float(_FP_SCALE))
    new_coord = F.col("s_fp").cast("double") / (
        F.col("n_vectors").cast("double") * F.lit(float(_FP_SCALE))
    )
    return sums.join(_seeds(emb), "centroid_id").select(
        "centroid_id",
        "dim",
        "n_vectors",
        new_coord.alias("new_coord"),
        old_coord.alias("old_coord"),
        (new_coord - old_coord).alias("shift"),
    )


_LOOP_ROUNDS = 3


def _loop_oracle() -> str:
    """Unrolled 3-round Lloyd oracle (the exact-iterative discipline:
    fixed round count -> static CTE text). Each round materializes the
    assignment, emits its cluster stats, and rebuilds the next round's
    centroid ARRAYS from the Q20 fixed-point means (list(new_coord
    ORDER BY dim)); empty clusters drop out of the next round in both
    engines identically."""
    parts = [
        f"""
    cent0 AS (
      SELECT vec_id AS centroid_id,
             list_transform(range(1, len(embedding) + 1),
                            i -> embedding[i]::DOUBLE) AS ce
      FROM embeddings WHERE vec_id < {_N_SEEDS}
    )"""
    ]
    for t in range(_LOOP_ROUNDS):
        parts.append(
            f"""
    scored{t} AS (
      SELECT v.vec_id, c.centroid_id,
             {oracle_l2sq("v.embedding", "c.ce")} AS dist2
      FROM embeddings v CROSS JOIN cent{t} c
    ),
    assigned{t} AS MATERIALIZED (
      SELECT vec_id, centroid_id, dist2
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY dist2 ASC, centroid_id ASC) AS rn
        FROM scored{t}
      ) WHERE rn = 1
    ),
    stats{t} AS (
      SELECT CAST({t} AS INT) AS round, centroid_id,
             CAST(COUNT(*) AS BIGINT) AS n_vectors,
             MIN(dist2) AS min_dist2, MAX(dist2) AS max_dist2
      FROM assigned{t} GROUP BY centroid_id
    ),
    sums{t} AS (
      SELECT a.centroid_id, i - 1 AS dim,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(e.embedding[i]::DOUBLE * {_FP_SCALE}.0)
                           AS BIGINT)) AS BIGINT) AS s_fp
      FROM assigned{t} a
      JOIN embeddings e USING (vec_id),
      UNNEST(range(1, len(e.embedding) + 1)) AS r(i)
      GROUP BY 1, 2
    ),
    cent{t + 1} AS (
      SELECT centroid_id,
             list(CAST(s_fp AS DOUBLE) / (CAST(n AS DOUBLE) * {_FP_SCALE}.0)
                  ORDER BY dim) AS ce
      FROM sums{t} GROUP BY centroid_id
    )"""
        )
    union = " UNION ALL ".join(
        f"SELECT * FROM stats{t}" for t in range(_LOOP_ROUNDS)
    )
    return "WITH " + ",".join(parts) + f" {union}"


@register("ext_kmeans_loop", oracle=_loop_oracle())
def ext_kmeans_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL Lloyd iteration — {_LOOP_ROUNDS} assign+update rounds with
    evolving centroids — as one oracle-exact query: every round's
    cluster sizes and distance envelopes, with the next round's
    centroids rebuilt from the Q20 fixed-point means (ext_kmeans_update
    semantics), so the whole trajectory is bit-identical cross-engine
    (the unrolled-CTE discipline shared with ext_pagerank_exact and
    ext_lm_greedy_decode).

    Scale shape per round: centroids broadcast (k arrays) -> map-only
    scoring -> per-vector argmin window -> one k x d-bounded update
    aggregate; localCheckpoint between rounds bounds lineage exactly
    like the graph loops. Empty clusters drop out of later rounds in
    both engines identically."""
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    cents = (
        _seeds(emb)
        .select("centroid_id", "ce")
        .localCheckpoint(eager=False)
    )
    stats = []
    for t in range(_LOOP_ROUNDS):
        assigned = _assigned(emb, cents).localCheckpoint(eager=False)
        stats.append(
            assigned.groupBy("centroid_id").agg(
                F.count(F.lit(1)).cast("long").alias("n_vectors"),
                F.min("dist2").alias("min_dist2"),
                F.max("dist2").alias("max_dist2"),
            ).select(
                F.lit(t).cast("int").alias("round"),
                "centroid_id",
                "n_vectors",
                "min_dist2",
                "max_dist2",
            )
        )
        sums = (
            assigned.select("centroid_id", F.posexplode("ve").alias("dim", "v"))
            .groupBy("centroid_id", "dim")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(
                    F.floor(F.col("v") * F.lit(float(_FP_SCALE))).cast("long")
                ).cast("long").alias("s_fp"),
            )
        )
        cents = (
            sums.withColumn(
                "coord",
                F.col("s_fp").cast("double")
                / (F.col("n").cast("double") * F.lit(float(_FP_SCALE))),
            )
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("dim", "coord"))
                    ),
                    lambda s: s["coord"],
                ).alias("ce")
            )
            .localCheckpoint(eager=False)
        )
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    return out
