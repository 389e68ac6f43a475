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

from ..sources import ensure_parallelism, load_table
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

    Dataflow: the counting pass explodes bigrams once, but map-side
    partial aggregation collapses it to alphabet² (~1k) rows before the
    only corpus-sized shuffle. The model then compiles to a DENSE
    lookup array indexed by ascii(c1)*128 + ascii(c2) (one broadcast
    row), and scoring is a pure map-side fold per document — each
    bigram is two ascii() calls and an O(1) element_at. Measured at
    sf0.1: 3.7s dense fold vs 6.1s explode+broadcast-join+groupBy vs
    8.2s folding over a Spark MAP (whose element_at is a LINEAR scan —
    the trap this dense array exists to avoid). Per-bigram logps are
    exact decimals, so fold order is irrelevant. The 128-wide code
    space is only valid for an ascii corpus — Spark's ascii() returns
    the full code point, so one non-ascii char indexes past the dense
    array and the query CRASHES (found by the 4x scale corpus, whose
    copy-prefix carried U+00B7) — so a one-scan max-code-point probe
    picks the path: dense fold when every char fits 7 bits, otherwise
    the explode + broadcast-join spelling, which is unicode-safe and
    produces identical decimals (pinned by tests/test_function_models
    on both an ascii and a unicode corpus). The length >= 2 guard
    also dodges Spark's sequence(1, 0) descending-sequence trap."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    d = docs.select("doc_id", F.lower(F.col("text")).alias("t")).where(
        F.length("t") >= 2
    )
    # Bigrams via zip_with over the split char array — element access is
    # O(1), the whole row O(len). The tempting spelling
    # transform(sequence(...), i -> substr(t, i, 2)) is O(len^2): each
    # substr seeks from the string head (UTF8String is variable-width),
    # measured 4.1s -> 0.6s for the count stage at sf0.1.
    bgs = F.expr(
        "zip_with(slice(split(t, ''), 1, length(t) - 1),"
        "         slice(split(t, ''), 2, length(t) - 1),"
        " (a, b) -> concat(a, b))"
    )
    cnt = d.select(F.explode(bgs).alias("bg")).groupBy("bg").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = cnt.agg(F.sum("c").alias("n"))
    logp = F.round(
        F.log10(F.col("c").cast("double") / F.col("n")), 6
    ).cast("decimal(12,6)")
    # path probe: one narrow scan for the corpus's max code point
    max_cp = d.agg(
        F.max(F.expr("array_max(transform(split(t, ''), c -> ascii(c)))"))
    ).first()[0]
    if max_cp is None or max_cp >= 128:
        # unicode corpus: score by exploding bigrams against the
        # broadcast model (alphabet^2-bounded; on a cluster where that
        # outgrows a broadcast, drop the hint and let it shuffle)
        model = cnt.crossJoin(F.broadcast(tot)).select("bg", logp.alias("logp"))
        return (
            d.select("doc_id", F.explode(bgs).alias("bg"))
            .join(F.broadcast(model), "bg")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_bigrams"),
                (F.sum("logp").cast("double") / F.count(F.lit(1))).alias("avg_logp"),
            )
        )
    code = F.ascii(F.substring("bg", 1, 1)) * 128 + F.ascii(F.substring("bg", 2, 1))
    model_map = (
        cnt.crossJoin(F.broadcast(tot))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(code.alias("k"), logp.alias("logp")))
            ).alias("m")
        )
    )
    dense = model_map.select(
        F.expr("transform(sequence(0, 16383), i -> m[i])").alias("dense")
    )
    # Same O(len) spelling for scoring: char codes once, then pairwise
    # O(1) lookups (the substr-by-position variant re-seeks per index).
    doc_sum = F.aggregate(
        F.expr(
            "zip_with(slice(transform(split(t, ''), c -> ascii(c)), 1, length(t) - 1),"
            "         slice(transform(split(t, ''), c -> ascii(c)), 2, length(t) - 1),"
            " (a, b) -> element_at(dense, a * 128 + b + 1))"
        ),
        F.lit(0).cast("decimal(38,6)"),
        lambda acc, v: acc + v,
    )
    n_bigrams = (F.length("t") - 1).cast("long")
    return d.crossJoin(F.broadcast(dense)).select(
        "doc_id",
        n_bigrams.alias("n_bigrams"),
        (doc_sum.cast("double") / n_bigrams).alias("avg_logp"),
    )
