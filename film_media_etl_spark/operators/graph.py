"""Iterative graph algorithms over edge DataFrames: weighted PageRank.

The engine's policy for iterative algorithms (the class the reference
cannot express at all — its R loops are driver-side row iteration, not
dataflow): each iteration is a constant number of shuffle joins and
aggregates over DataFrames, lineage is truncated per round with
localCheckpoint so plans stay bounded, and per-iteration scalars (the
dangling-mass correction) are tiny aggregates — one ~8-byte driver
round-trip per iteration, never a collect of data.

Related: operators/dedup.py:connected_components (neighbor-min label
propagation) uses the same iterate-join-checkpoint skeleton.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    iters: int = 15,
) -> DataFrame:
    """Weighted PageRank by power iteration.

    ``edges`` is a directed edge list; ``weight`` (optional) weights
    each edge's share of its source's rank (None = uniform over
    out-edges). Returns (node, rank) summing to 1.0 over all nodes that
    appear as a source or destination.

    Per iteration: one join (ranks onto edges, pre-normalized by
    out-weight), one groupBy(dst) sum, one left join back onto the node
    set, plus a 1-row aggregate for dangling mass (nodes without
    out-edges redistribute uniformly). All shuffles key on node id; a
    hot node (celebrity vertex) is a groupBy skew handled by AQE or
    operators.skew.salted_aggregate at extreme scale.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("e_src"), F.col(dst).alias("e_dst"), w.alias("w")
    )
    # Pre-normalize: each edge carries the FRACTION of its source's rank
    # it transfers — computed once, reused every iteration.
    out_w = e.groupBy("e_src").agg(F.sum("w").alias("out_w"))
    frac = (
        e.join(out_w, "e_src")
        .select("e_src", "e_dst", (F.col("w") / F.col("out_w")).alias("frac"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .unionByName(e.select(F.col("e_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:  # empty graph: no nodes, no rank mass to distribute
        return nodes.withColumn("rank", F.lit(0.0))
    # Size the per-iteration shuffles to the NODE set, not the input:
    # a 5-node transition graph iterated 15 times under the session's 32
    # shuffle partitions pays 15 rounds of empty-partition scheduling.
    # ~100k nodes per partition keeps partitions meaningful at any n
    # (1e9 nodes -> 10k partitions on a cluster).
    nparts = max(1, min(int(n // 100_000) + 1, 2000))
    has_out = out_w.select(F.col("e_src").alias("node")).distinct()
    # Dangling-mass handling needs a per-iteration scalar (a driver
    # round-trip that forces materialization every round). Most real
    # graphs after edge cleaning have NO dangling nodes — detect that
    # once and take the fully-lazy fast path: no per-iteration action at
    # all, lineage truncated by periodic lazy localCheckpoints that
    # realize when the caller finally acts.
    n_dangling = nodes.join(has_out, "node", "left_anti").count()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iters):
        if n_dangling:
            dangling = (
                ranks.join(has_out, "node", "left_anti")
                .agg(F.sum("rank"))
                .first()[0]
                or 0.0
            )
        else:
            dangling = 0.0
        contribs = (
            frac.join(ranks, frac["e_src"] == ranks["node"])
            .groupBy("e_dst")
            .agg(F.sum(F.col("frac") * F.col("rank")).alias("contrib"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["e_dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .coalesce(nparts)
            .localCheckpoint(eager=bool(n_dangling))
        )
    return ranks
