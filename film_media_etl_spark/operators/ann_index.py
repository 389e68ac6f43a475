"""Persisted ANN index lifecycle: build an IVF index ONCE on disk, probe
it many times without re-clustering — the serving shape a 100 TB vector
store actually runs (reference's similarity surface is in-query only;
this adds the build/probe split every production ANN deployment has).

- ``build_ivf_index``: KMeans-partition the corpus, write the assigned
  vectors as a parquet table PARTITIONED BY cell id, and the centroids
  as a tiny side table. Clustering cost is paid once; the layout IS the
  index — each cell is its own directory of files.
- ``probe_ivf_index``: load the centroid table (bounded driver metadata,
  <= nlist rows — same discipline as the PQ codebook), compute each
  query's nprobe nearest cells as inline literals, and equi-join the
  exploded (query, cell) pairs against the on-disk table. Because cell
  is the PARTITION column, Catalyst prunes the scan to the probed
  cells' directories (dynamic partition pruning under the broadcast
  join): a probe reads ~nprobe/nlist of the index bytes, which is the
  entire point of IVF at scale. Exact cosine + top-k re-rank inside the
  probed cells, identical to the inline ``cosine_knn_ivf`` math.

Approximate by construction -> rows-only driver check; recall floors and
the partition-pruning plan shape are pinned in tests/test_graph_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import to_double_vec
from ..sources import ensure_parallelism
from .similarity import ivf_probe_topk


def build_ivf_index(
    embeddings: DataFrame,
    index_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
) -> None:
    """Cluster the corpus and persist the index layout: cell-partitioned
    vectors + a centroid side table. Write-once; probes never re-fit."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = ensure_parallelism(embeddings).select(
        F.col(id_col).alias("nbr_id"), to_double_vec(F.col(vec_col)).alias("nvec")
    )
    ml = base.withColumn("fv", array_to_vector("nvec"))
    if ml.isEmpty():
        # an empty corpus still gets a readable (empty) index
        spark = embeddings.sparkSession
        spark.createDataFrame([], "nbr_id long, nvec array<double>, cell int").write.mode(
            "overwrite"
        ).partitionBy("cell").parquet(f"{index_dir}/cells")
        spark.createDataFrame([], "cell int, center array<double>").write.mode(
            "overwrite"
        ).parquet(f"{index_dir}/centroids")
        return
    model = KMeans(k=nlist, seed=seed, featuresCol="fv", predictionCol="cell").fit(ml)
    assigned = model.transform(ml).select("nbr_id", "nvec", "cell")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{index_dir}/cells")
    spark = embeddings.sparkSession
    centers = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    spark.createDataFrame(centers, "cell int, center array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{index_dir}/centroids")


def assign_cells(
    embeddings: DataFrame,
    centers: list,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(nbr_id, nvec, cell): nearest-centroid assignment against a FIXED
    center list (inline literals, argmin via sorted (distance, cell)
    structs — the same expression family as the probe's cell ranking).
    This is the incremental-index append path: new vectors join the
    EXISTING quantizer's cells; the quantizer itself is refit offline
    (build_ivf_index), the standard production split."""
    nearest = F.element_at(
        F.transform(
            F.array_sort(
                F.array(
                    *[
                        F.struct(
                            _sqdist_expr(F.col("nvec"), c).alias("d"),
                            F.lit(int(i)).alias("cell"),
                        )
                        for i, c in centers
                    ]
                )
            ),
            lambda s: s["cell"],
        ),
        1,
    )
    return embeddings.select(
        F.col(id_col).alias("nbr_id"), to_double_vec(F.col(vec_col)).alias("nvec")
    ).withColumn("cell", nearest)


def _sqdist_expr(vec, center: list):
    lits = F.array(*[F.lit(float(x)) for x in center])
    return F.aggregate(
        F.zip_with(vec, lits, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def resolve_cells_base(index_dir: str) -> tuple[str, int]:
    """(live base directory, folded-through watermark). A fresh build
    has no manifest — its base is the legacy ``cells`` dir with
    watermark -1 (every increment pending); after a compaction the
    manifest points at the committed ``cells_g{n}`` generation."""
    import os

    from .index_manifest import read_manifest

    m = read_manifest(index_dir)
    if m is None:
        return os.path.join(index_dir, "cells"), -1
    return os.path.join(index_dir, m["cells_base"]), int(m["folded_through"])


def read_index_cells(spark: SparkSession, index_dir: str) -> DataFrame:
    """The live cells base (resolved through the compaction manifest,
    operators/index_manifest.py) plus any streaming increments newer
    than its watermark (cells_inc/v*, written by
    streaming/vector_index.py). Increments are read as separate scans
    and unioned — each keeps its own partition pruning; fold them into
    the base with compact_ivf_index when they accumulate."""
    import os

    from .index_manifest import increment_versions

    base, water = resolve_cells_base(index_dir)
    cells = spark.read.parquet(base)
    for _, inc in increment_versions(
        os.path.join(index_dir, "cells_inc"), above=water
    ):
        cells = cells.unionByName(spark.read.parquet(inc))
    return cells


def probe_ivf_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Top-k cosine neighbors for each query row against a persisted IVF
    index (base cells plus any streaming increments). The cells scan is
    pruned to the probed partitions; queries ride broadcast, the corpus
    never shuffles."""
    # <= nlist rows of driver metadata — the same bounded-collect tier as
    # the PQ codebook (operators/similarity.py). Read BEFORE the cells
    # table: an empty index's partitioned write leaves no data files, so
    # the cells scan is only resolvable when centroids exist.
    centers = [
        (r["cell"], r["center"])
        for r in spark.read.parquet(f"{index_dir}/centroids").collect()
    ]
    if not centers:
        return spark.createDataFrame(
            [], "query_id long, nbr_id long, score double, rank int"
        )
    cells = read_index_cells(spark, index_dir)
    q = queries.select(
        F.col(id_col).alias("query_id"), to_double_vec(F.col(vec_col)).alias("qvec")
    )
    return ivf_probe_topk(cells, q, centers, k=k, nprobe=nprobe)


def compact_ivf_index(
    spark: SparkSession, index_dir: str, *, _crash_after: str | None = None
) -> int:
    """Fold streaming increments (cells_inc/v*) back into the base cells
    table — the maintenance op that keeps probe plans one-scan after a
    long append stream (each increment is its own scan in
    read_index_cells; dozens of tiny scans erode the partition-pruning
    win). OFFLINE op: run with the append stream stopped after a clean
    drain, and resume the stream from the SAME checkpoint so batch ids
    stay above the committed watermark.

    Crash-safe via the generation-manifest shape (index_manifest.py):
    the merged table is written to a brand-new ``cells_g{n}`` directory
    (the live base is never touched), then committed by an atomic
    one-file manifest rename recording the folded-through watermark.
    Probes always see a complete base — before the commit the old one,
    after it the new one. A crash before the commit leaves the old
    layout live (the half-written generation is swept later); a crash
    after it leaves folded increments that the watermark masks, so a
    re-run is a TRUE no-op — it folds nothing and only finishes the
    sweep (the round-5 rename-swap double-folded them). Both windows
    are pinned by fault-injection tests (tests/test_graph_ops.py).
    Returns the number of increments folded."""
    import os

    from .index_manifest import (
        commit_manifest,
        crash_point,
        grace_fields,
        increment_versions,
        next_generation,
        retire_grace,
        sweep,
    )

    def _sweep(live_base: str) -> None:
        # The legacy set {cells, cells_old, cells_compacting} exists to
        # clean up after the retired round-5 rename-swap. If the resolved
        # live base does NOT exist (a round-5 mid-swap crash can leave
        # the data only in cells_old), sweeping those names would destroy
        # the only remaining copy — raise for manual repair instead.
        if not os.path.isdir(live_base):
            raise RuntimeError(
                f"IVF index {index_dir}: resolved live base {live_base} is "
                "missing — refusing to sweep; recover the cells from a "
                "legacy dir (cells_old/cells_compacting) or rebuild first"
            )
        sweep(
            index_dir,
            live_dirs={os.path.basename(live_base)},
            inc_roots=[os.path.join(index_dir, "cells_inc")],
            gen_prefix="cells",
            legacy={"cells", "cells_old", "cells_compacting"},
        )

    base, water = resolve_cells_base(index_dir)
    incs = increment_versions(os.path.join(index_dir, "cells_inc"), above=water)
    if not incs:
        # running maintenance with nothing to fold retires the previous
        # cycle's reader-grace view, then finishes any interrupted sweep
        retire_grace(index_dir)
        _sweep(base)
        return 0
    merged = read_index_cells(spark, index_dir)
    new_base = next_generation(index_dir, "cells")
    merged.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(index_dir, new_base)
    )
    crash_point("write", _crash_after)
    commit_manifest(
        index_dir,
        {
            "cells_base": new_base,
            "folded_through": incs[-1][0],
            # one-cycle reader grace: the previous view (old base + its
            # increments) stays on disk until the NEXT maintenance call,
            # so probes that resolved paths pre-commit finish cleanly
            **grace_fields(os.path.basename(base), water),
        },
    )
    crash_point("commit", _crash_after)
    _sweep(os.path.join(index_dir, new_base))
    return len(incs)
