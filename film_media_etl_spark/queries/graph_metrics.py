"""Graph metrics over the co-purchase network: triangle counting and the
global clustering coefficient.

Complements the engine's other graph operators (weighted PageRank over
journey transitions, connected-components dedup clustering) with the
third classic primitive — closed-triad counting — computed on the part
co-purchase graph that ext_market_basket mines. The reference's warehouse
has no graph surface at all (SURVEY §1.1: plain relational tables), but
basket networks are the first graph a media-sales warehouse grows.

Exactness: everything is integer counting plus ONE final IEEE division
for the clustering coefficient — bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


@register(
    "ext_triangle_count",
    oracle="""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS u, c.l_partkey AS v
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ),
    deg AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
      ) GROUP BY 1
    ),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM e e1
      JOIN e e2 ON e1.v = e2.u
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT COUNT(*) FROM e) AS n_edges,
           (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) FROM deg)
             AS n_wedges,
           (SELECT n_triangles FROM tri) AS n_triangles,
           CAST(3 * (SELECT n_triangles FROM tri) AS DOUBLE)
             / CAST((SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT)
                     FROM deg) AS DOUBLE) AS clustering
    """,
)
def ext_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the co-purchase
    graph (parts co-bought >= 2 times, undirected, stored oriented
    u < v). Triangles close via the canonical two-join enumeration
    e1(u,v) ⋈ e2(v,w) ⋈ e3(u,w) — each triangle counted exactly once
    because edges are key-oriented; clustering = 3·triangles / wedges.

    Scale shape: the basket self-join shuffles once on l_orderkey; edge
    enumeration shuffles on the join vertex. At 100 TB the standard
    refinement is degree-ordering the orientation (point high-degree
    vertices at low-degree ones) so wedge lists stay bounded under skew;
    with the support>=2 pruning the edge set here is vocabulary-sized,
    so the plain orientation already holds. Wedges, degrees and the
    final coefficient are one aggregate each over node-sized frames."""
    b = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, c = b.alias("a"), b.alias("c")
    # The pruned edge list is consumed 5x (degree stats, edge count, and
    # three legs of the triangle join). It is support-pruned down to
    # vocabulary scale, so persisting it trades a bounded cache block for
    # re-running the basket self-join per consumer — the same
    # materialize-the-small-derived-frame call an iterative graph engine
    # makes for its edge RDD.
    e = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("c.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select("u", "v")
        .persist()
    )
    # one pass over e for degrees (explode covers both endpoints), one
    # aggregate for BOTH node count and wedge sum
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    deg_stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("(deg * (deg - 1)) div 2")).cast("long").alias("n_wedges"),
    )
    edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(e3, (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg_stats.crossJoin(F.broadcast(edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            (
                (F.lit(3) * F.col("n_triangles")).cast("double")
                / F.col("n_wedges").cast("double")
            ).alias("clustering"),
        )
    )


@register(
    "ext_degree_distribution",
    oracle="""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS u, c.l_partkey AS v
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ),
    deg AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
      ) GROUP BY 1
    )
    SELECT CAST(deg AS BIGINT) AS degree, COUNT(*) AS n_nodes
    FROM deg GROUP BY 1
    """,
)
def ext_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph (same support>=2
    oriented edge set as ext_triangle_count): how many parts have k
    co-purchase partners — the power-law health check graph pipelines
    run before any traversal, because a heavy-tailed degree histogram
    is the early warning for skewed traversal joins. Both endpoints of
    each edge are covered by ONE explode pass (no second self-join);
    the two stacked aggregations run over edge- then node-sized frames,
    and everything is exact integer counting."""
    b = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, c = b.alias("a"), b.alias("c")
    e = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("c.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select("u", "v")
    )
    return (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .groupBy(F.col("deg").alias("degree"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
