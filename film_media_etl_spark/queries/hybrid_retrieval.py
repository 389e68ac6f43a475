"""Hybrid retrieval: Reciprocal Rank Fusion of the lexical (BM25) and
semantic (dense-cosine) rankings — the fusion step every modern RAG /
search stack runs when it has both an inverted index and an embedding
index over the same corpus (Cormack, Clarke & Buettcher, SIGIR 2009:
RRF outperforms learned fusion with no tuning).

Exactness: ranks are integers (deterministic doc_id tiebreaks on both
legs), each RRF contribution is one correctly-rounded double division
1/(60 + rank), and the fused score is a fixed two-term expression — so
Spark and DuckDB agree bit-for-bit with no tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, oracle_cosine, to_double_vec
from ..sources import ensure_parallelism, load_table
from .registry import register
from .retail_analytics import _BM25_B, _BM25_K1, _BM25_TERMS

_RRF_K = 60  # the standard dampening constant from the RRF paper
_LEG_N = 50  # candidates taken from each leg before fusion
_QUERY_VEC_ID = 0  # the embedding used as the semantic query
_FUSED_N = 20


@register(
    "ext_rrf_fusion",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM tok WHERE term IN {str(tuple(_BM25_TERMS))}
      GROUP BY 1, 2
    ),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
    lex AS (
      SELECT tf.doc_id,
             ROUND(SUM(
               ln((CAST(s.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * (tf.tf * ({_BM25_K1} + 1.0))
               / (tf.tf + {_BM25_K1}
                  * (1.0 - {_BM25_B} + {_BM25_B} * d.dl / s.avgdl))
             ), 4) AS bm25
      FROM tf
      JOIN df USING (term)
      JOIN dl d USING (doc_id)
      CROSS JOIN stats s
      GROUP BY tf.doc_id
      ORDER BY bm25 DESC, tf.doc_id ASC
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
    """Fuse a BM25 top-{_LEG_N} (the ext_bm25_search scorer, same
    constants) with a dense-cosine top-{_LEG_N} (query = embedding
    {_QUERY_VEC_ID}, the ext_knn_bruteforce scorer) via RRF:
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
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        tok.where(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    term_score = idf * (F.col("tf") * F.lit(_BM25_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(_BM25_K1)
        * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl"))
    )
    lex = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 4).alias("bm25"))
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
