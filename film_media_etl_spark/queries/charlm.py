"""Character-bigram language-model quality scoring — the statistical
gibberish filter LLM data pipelines run next to rule-based quality
heuristics (ext_quality) and language ID (ext_langid): score each
document by the mean log-probability of its character bigrams under the
corpus's own bigram distribution. Natural text scores near the corpus
mode; mojibake, binary spills, and repeated-character junk fall into the
low tail.

Cross-engine exactness: each bigram's log10 probability is rounded to 6
decimals (1-ulp libm noise is orders of magnitude below that — same
convention as TF-IDF's ln rounding) and cast to DECIMAL before the
per-document SUM, so the mean is an exact decimal sum divided once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


@register(
    "ext_charlm_quality",
    oracle="""
    WITH d AS (
      SELECT doc_id, lower(text) AS t FROM documents
      WHERE length(lower(text)) >= 2
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, length(t)), i -> substr(t, i, 2)))
               AS bg
      FROM d
    ),
    cnt AS (SELECT bg, COUNT(*) AS c FROM bg GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n FROM bg)
    SELECT b.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(CAST(ROUND(log10(CAST(c.c AS DOUBLE) / t.n), 6)
                         AS DECIMAL(12,6))) AS DOUBLE) / COUNT(*)
             AS avg_logp
    FROM bg b JOIN cnt c USING (bg) CROSS JOIN tot t
    GROUP BY b.doc_id
    """,
)
def ext_charlm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean bigram log10-probability per document under the corpus
    bigram distribution (self-scored maximum-likelihood model, no
    smoothing needed: every scored bigram is in the model by
    construction).

    Dataflow: bigrams explode via a JVM higher-order transform (no
    Python), counts collapse to alphabet² rows (~1k) and ride a
    broadcast back onto the bigram stream with the 1-row total; one
    groupBy(doc_id) finishes. Two corpus-sized shuffles total (bigram
    count, per-doc score) — at 100 TB the model table is still tiny, so
    scoring stays map-side. The length >= 2 guard also dodges Spark's
    sequence(1, 0) descending-sequence trap."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.lower(F.col("text")).alias("t")).where(
        F.length("t") >= 2
    )
    bg = d.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(t) - 1), i -> substr(t, i, 2))")
        ).alias("bg"),
    )
    cnt = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    tot = bg.agg(F.count(F.lit(1)).alias("n"))
    logp = F.round(
        F.log10(F.col("c").cast("double") / F.col("n")), 6
    ).cast("decimal(12,6)")
    return (
        bg.join(F.broadcast(cnt), "bg")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum(logp).cast("double") / F.count(F.lit(1))).alias("avg_logp"),
        )
    )
