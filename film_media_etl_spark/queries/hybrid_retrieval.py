"""Hybrid retrieval: Reciprocal Rank Fusion of the lexical (BM25) and
semantic (dense-cosine) rankings — the fusion step every modern RAG /
search stack runs when it has both an inverted index and an embedding
index over the same corpus (Cormack, Clarke & Buettcher, SIGIR 2009:
RRF outperforms learned fusion with no tuning).

Exactness: ranks are integers (deterministic doc_id tiebreaks on both
legs), each RRF contribution is one correctly-rounded double division
1/(60 + rank), and the fused score is a fixed two-term expression — so
Spark and DuckDB agree bit-for-bit with no tolerance.

The lexical leg is the SHARED ext_bm25_search scorer
(retail_analytics.bm25_scores / bm25_oracle_ctes) — one formula, one
exactness convention, two consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, oracle_cosine, to_double_vec
from ..sources import ensure_parallelism, load_table
from .registry import register
from .retail_analytics import bm25_oracle_ctes, bm25_scores

_RRF_K = 60  # the standard dampening constant from the RRF paper
_LEG_N = 50  # candidates taken from each leg before fusion
_QUERY_VEC_ID = 0  # the embedding used as the semantic query
_FUSED_N = 20


@register(
    "ext_rrf_fusion",
    oracle=f"""
    WITH {bm25_oracle_ctes()},
    lex AS (
      SELECT doc_id, bm25 FROM scored
      ORDER BY bm25 DESC, doc_id ASC
      LIMIT {_LEG_N}
    ),
    lexr AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS INT)
               AS lex_rank
      FROM lex
    ),
    qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}),
    sem AS (
      SELECT e.vec_id AS doc_id,
             {oracle_cosine("e.embedding", "qv.q")} AS cos
      FROM embeddings e CROSS JOIN qv
      WHERE e.vec_id <> {_QUERY_VEC_ID}
      ORDER BY cos DESC, e.vec_id ASC
      LIMIT {_LEG_N}
    ),
    semr AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id ASC) AS INT)
               AS sem_rank
      FROM sem
    )
    SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
           COALESCE(l.lex_rank, -1) AS lex_rank,
           COALESCE(s.sem_rank, -1) AS sem_rank,
           COALESCE(1.0 / ({_RRF_K} + l.lex_rank), 0.0)
             + COALESCE(1.0 / ({_RRF_K} + s.sem_rank), 0.0) AS rrf_score
    FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id
    ORDER BY rrf_score DESC, doc_id ASC
    LIMIT {_FUSED_N}
    """,
)
def ext_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuse a BM25 top-{_LEG_N} (the shared ext_bm25_search scorer) with
    a dense-cosine top-{_LEG_N} (query = embedding {_QUERY_VEC_ID}, the
    ext_knn_bruteforce scorer) via RRF:
    score(d) = sum over legs of 1/({_RRF_K} + rank_leg(d)), missing
    legs contributing 0 — documents surfaced by BOTH signals rise,
    single-leg outliers are dampened. Ranks carry a -1 sentinel in the
    output (never NULL — driver hash contract).

    Scale shape: each leg ends in orderBy+limit — Spark plans
    TakeOrderedAndProject (per-partition top-k, no global sort), so
    the only single-partition work is ranking two {_LEG_N}-row frames,
    bounded by construction regardless of corpus size. The fusion join
    is {_LEG_N}x{_LEG_N} at most. The semantic leg broadcasts the
    1-row query vector; the lexical leg broadcasts df and the length
    stats exactly like ext_bm25_search."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    lex = (
        bm25_scores(docs)
        .select("doc_id", "bm25")
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_LEG_N)
    )
    lexr = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .cast("int")
        .alias("lex_rank"),
    )

    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    qv = emb.where(F.col("vec_id") == _QUERY_VEC_ID).select(
        to_double_vec(F.col("embedding")).alias("q")
    )
    sem = (
        emb.where(F.col("vec_id") != _QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine(to_double_vec(F.col("embedding")), F.col("q")).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("doc_id"))
        .limit(_LEG_N)
    )
    semr = sem.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cos"), F.asc("doc_id")))
        .cast("int")
        .alias("sem_rank"),
    )

    fused = lexr.join(semr, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("lex_rank", F.lit(-1)).alias("lex_rank"),
        F.coalesce("sem_rank", F.lit(-1)).alias("sem_rank"),
        (
            F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("sem_rank")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(_FUSED_N)


_EVAL_K = 10
_EVAL_QUERIES = 8


@register(
    "ext_retrieval_metrics",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, label AS qlabel, embedding AS qv
      FROM embeddings WHERE vec_id < {_EVAL_QUERIES}
    ),
    scored AS MATERIALIZED (
      SELECT q.qid, q.qlabel, e.vec_id AS nid,
             CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END AS rel,
             {oracle_cosine("e.embedding", "q.qv")} AS cos
      FROM embeddings e JOIN q ON e.vec_id <> q.qid
    ),
    ranked AS (
      SELECT qid, qlabel, rel,
             ROW_NUMBER() OVER (
               PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
      FROM scored
    ),
    top AS (SELECT * FROM ranked WHERE rank <= {_EVAL_K}),
    dcg AS (
      SELECT qid,
             CAST(SUM(CASE WHEN rel = 1 THEN
               CAST(ROUND(1.0 / log2(rank + 1.0), 6) AS DECIMAL(12,6))
               ELSE CAST(0 AS DECIMAL(12,6)) END) AS DECIMAL(20,6)) AS dcg,
             CAST(SUM(rel) AS BIGINT) AS n_rel_at_k,
             COALESCE(MIN(CASE WHEN rel = 1 THEN rank END), 0) AS first_rel
      FROM top GROUP BY qid
    ),
    ideal AS (
      SELECT qid,
             CAST(SUM(CASE WHEN rank <= least(
               (SELECT COUNT(*) FROM ranked r2
                WHERE r2.qid = ranked.qid AND r2.rel = 1), {_EVAL_K})
               THEN CAST(ROUND(1.0 / log2(rank + 1.0), 6) AS DECIMAL(12,6))
               ELSE CAST(0 AS DECIMAL(12,6)) END) AS DECIMAL(20,6)) AS idcg
      FROM ranked WHERE rank <= {_EVAL_K}
      GROUP BY qid
    )
    SELECT d.qid AS query_id,
           d.n_rel_at_k,
           CAST(d.n_rel_at_k AS DOUBLE) / {_EVAL_K} AS precision_at_k,
           CASE WHEN d.first_rel = 0 THEN 0.0
                ELSE 1.0 / d.first_rel END AS mrr,
           CASE WHEN i.idcg = 0 THEN 0.0
                ELSE CAST(d.dcg AS DOUBLE) / CAST(i.idcg AS DOUBLE)
           END AS ndcg_at_k
    FROM dcg d JOIN ideal i ON d.qid = i.qid
    """,
)
def ext_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation over the embedding space — the
    metrics pass every ANN/retrieval pipeline runs before shipping an
    index: for each query vector (vec_id < {_EVAL_QUERIES}), rank the
    corpus by EXACT cosine and score the top-{_EVAL_K} against
    label-match relevance: precision@{_EVAL_K}, MRR (reciprocal rank of
    the first relevant hit, 0.0 sentinel when none), and NDCG@{_EVAL_K}
    (per-position discounts 1/log2(rank+1) rounded to 6 decimals and
    summed as DECIMALs — the charlm convention makes the irrational sum
    order-free; ideal DCG uses the first min(|relevant|, k) positions).

    Scale shape: broadcast queries over one corpus scan (the
    ext_knn_bruteforce plan); the rank window partitions per query; all
    metric arithmetic happens on k rows per query. Evaluating an
    approximate index replaces the exact-cosine ranking with the
    index's — the metric plumbing is identical."""
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    q = emb.where(F.col("vec_id") < _EVAL_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        to_double_vec(F.col("embedding")).alias("qv"),
    )
    scored = emb.join(
        F.broadcast(q), F.col("vec_id") != F.col("qid")
    ).select(
        "qid",
        F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0).alias("rel"),
        F.col("vec_id").alias("nid"),
        cosine(to_double_vec(F.col("embedding")), F.col("qv")).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    ranked = scored.withColumn("rank", F.row_number().over(w))
    disc = F.round(1.0 / F.log2(F.col("rank") + 1.0), 6).cast("decimal(12,6)")
    zero = F.lit(0).cast("decimal(12,6)")
    n_rel_total = F.sum("rel").over(Window.partitionBy("qid"))
    top = ranked.withColumn("n_rel_total", n_rel_total).where(
        F.col("rank") <= _EVAL_K
    )
    agg = top.groupBy("qid").agg(
        F.sum(F.when(F.col("rel") == 1, disc).otherwise(zero))
        .cast("decimal(20,6)")
        .alias("dcg"),
        F.sum("rel").cast("long").alias("n_rel_at_k"),
        F.coalesce(
            F.min(F.when(F.col("rel") == 1, F.col("rank"))), F.lit(0)
        ).alias("first_rel"),
        F.sum(
            F.when(
                F.col("rank")
                <= F.least(F.col("n_rel_total"), F.lit(_EVAL_K)),
                disc,
            ).otherwise(zero)
        )
        .cast("decimal(20,6)")
        .alias("idcg"),
    )
    return agg.select(
        F.col("qid").alias("query_id"),
        "n_rel_at_k",
        (F.col("n_rel_at_k").cast("double") / F.lit(float(_EVAL_K))).alias(
            "precision_at_k"
        ),
        F.when(F.col("first_rel") == 0, F.lit(0.0))
        .otherwise(1.0 / F.col("first_rel"))
        .alias("mrr"),
        F.when(F.col("idcg") == 0, F.lit(0.0))
        .otherwise(F.col("dcg").cast("double") / F.col("idcg").cast("double"))
        .alias("ndcg_at_k"),
    )
