"""Corpus-signal operators: compression-ratio proxy and n-gram diversity.

The diversity query's exact DuckDB oracle rides the parity sweep; these
tests pin what the oracle can't — the zlib byte counts (rows-only query)
and the short-document trigram edge — against independent pure-Python
models.
"""

from __future__ import annotations

import zlib

from conftest import PARITY_SF_DIR
from pyspark.sql import functions as F

from film_media_etl_spark.queries.corpus_signals import (
    _RATIO_HI,
    _RATIO_LO,
    _ZLIB_LEVEL,
    compression_report,
    ngram_diversity,
)
from film_media_etl_spark.sources import load_table


def test_compression_ratio_matches_zlib_model(spark):
    """Every (raw_bytes, compressed_bytes, ratio, verdict) cell of the
    rows-only query equals an independent per-document zlib recompute —
    the model twin of the parity sweep's hash check."""
    docs = load_table(spark, PARITY_SF_DIR, "documents")
    got = {
        r.doc_id: r
        for r in compression_report(docs).collect()
    }
    src = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert set(got) == set(src) and len(got) > 0
    for doc_id, text in src.items():
        raw = text.encode("utf-8")
        comp = len(zlib.compress(raw, _ZLIB_LEVEL))
        r = got[doc_id]
        assert (r.raw_bytes, r.compressed_bytes) == (len(raw), comp)
        ratio = comp / len(raw)
        assert r.compression_ratio == ratio
        assert r.passes_compression == (_RATIO_LO <= ratio <= _RATIO_HI)


def test_compression_gate_rejects_both_tails(spark):
    """Planted documents: templated repetition compresses past the low
    bound, incompressible base64-ish noise exceeds the high bound,
    natural-looking prose passes — the gate is genuinely two-sided."""
    import random
    import string

    boiler = "click here to subscribe now " * 60
    # 120 unique random alphanumerics: ~5.95 bits/char entropy plus the
    # zlib header means the "compressed" form is LARGER than the raw
    # bytes (ratio ~1.02) — the random/binary-ish tail of the gate
    rng = random.Random(7)
    noise = "".join(
        rng.choice(string.ascii_letters + string.digits) for _ in range(120)
    )
    prose = (
        "the supplier shipped twelve crates of film stock to the lyon "
        "depot where the archivist logged each reel against the 1987 "
        "catalogue and flagged three for nitrate decay inspection and "
        "noted the vault humidity drifting above the preservation bound "
        "while two couriers waited for the customs manifest to clear"
    )
    docs = spark.createDataFrame(
        [(1, boiler, "en"), (2, noise, "en"), (3, prose, "en")],
        "doc_id long, text string, lang string",
    )
    rows = {r.doc_id: r for r in compression_report(docs).collect()}
    assert rows[1].compression_ratio < _RATIO_LO
    assert not rows[1].passes_compression
    assert rows[2].compression_ratio > _RATIO_HI
    assert not rows[2].passes_compression
    assert rows[3].passes_compression


def test_compression_null_text_contract(spark):
    """NULL and empty text must not crash the Arrow batch (the operator
    is reusable over any (doc_id, lang, text) frame): NULL sizes as the
    empty string, the ratio is NULL at zero raw bytes, and the keep-gate
    is explicitly FALSE — never a null verdict."""
    import zlib

    docs = spark.createDataFrame(
        [(1, None, None), (2, "", "en"), (3, "a plain short doc", "en")],
        "doc_id long, text string, lang string",
    )
    rows = {r.doc_id: r for r in compression_report(docs).collect()}
    empty_comp = len(zlib.compress(b"", _ZLIB_LEVEL))
    for did in (1, 2):
        assert rows[did].raw_bytes == 0
        assert rows[did].compressed_bytes == empty_comp
        assert rows[did].compression_ratio is None
        assert rows[did].passes_compression is False
    assert rows[3].raw_bytes == len(b"a plain short doc")
    assert rows[3].compression_ratio is not None


def test_ngram_diversity_short_doc_edge(spark):
    """Documents with fewer than 3 tokens produce zero trigrams (the
    greatest(n-2, 0) guard) and a source consisting only of such docs
    gets the -1.0 fraction sentinel (output-null contract; the zero
    trigram count is the indicator) — verified against a hand model."""
    docs = spark.createDataFrame(
        [
            (1, "tiny", "a"),            # 1 token: no trigram
            (2, "tiny", "a b"),          # 2 tokens: no trigram
            (3, "web", "a b c d"),       # trigrams: 'a b c', 'b c d'
            (4, "web", "a b c"),         # trigram:  'a b c' (dup)
        ],
        "doc_id long, source string, text string",
    )
    rows = {r.source: r for r in ngram_diversity(docs).collect()}
    tiny, web = rows["tiny"], rows["web"]
    assert (tiny.n_docs, tiny.total_tokens, tiny.distinct_tokens) == (2, 3, 2)
    assert tiny.total_trigrams == 0 and tiny.distinct_trigrams == 0
    assert tiny.dup_trigram_frac == -1.0
    assert (web.n_docs, web.total_tokens, web.distinct_tokens) == (2, 7, 4)
    assert (web.total_trigrams, web.distinct_trigrams) == (3, 2)
    assert web.dup_trigram_frac == 1.0 - 2.0 / 3.0
    assert web.type_token_ratio == 4.0 / 7.0


def _py_shingles(text: str, n: int = 8) -> set:
    toks = text.lower().split(" ")
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_bloom_decontamination_guarantees(spark):
    """Bloom-screen contract vs an independent pure-Python exact model:
    (a) ZERO false negatives — every training doc sharing an 8-token
    shingle with the eval set (doc_id < 10) is flagged; (b) the
    false-positive trickle is bounded (m=2^20, k=3 at fixture-scale n
    predicts ~0); (c) the bitmap map stays within its bits/64 size
    bound."""
    from film_media_etl_spark.operators.bloom import BLOOM_BITS, bloom_build
    from film_media_etl_spark.queries.corpus_signals import bloom_flag_docs

    docs = load_table(spark, PARITY_SF_DIR, "documents")
    src = {
        r.doc_id: r.text for r in docs.select("doc_id", "text").collect()
    }
    eval_grams = set().union(
        *(_py_shingles(t) for d, t in src.items() if d < 10)
    ) or set()
    exact = {
        d
        for d, t in src.items()
        if d >= 10 and _py_shingles(t) & eval_grams
    }
    flagged = {
        r.doc_id
        for r in bloom_flag_docs(docs).collect()
        if r.flagged
    }
    n_train = sum(1 for d in src if d >= 10)
    assert exact, "fixture lost its planted contamination — test is vacuous"
    assert exact <= flagged, f"false negatives: {sorted(exact - flagged)[:5]}"
    fp = len(flagged - exact)
    assert fp / max(n_train, 1) < 0.01, (fp, n_train)
    # bitmap size bound: sparse map never exceeds bits/64 words
    eval_keys = (
        docs.where("doc_id < 10")
        .selectExpr("explode(split(lower(text), ' ')) AS g")
    )
    bloom_row = bloom_build(eval_keys, "g").collect()[0]
    assert len(bloom_row.bloom) <= BLOOM_BITS // 64
    assert bloom_row.n_inserts > 0


def test_bloom_n_inserts_counts_insertions_not_distinct(spark):
    """The accounting field is honest about duplicates (round-7 verdict
    #3): inserting the same key three times reports n_inserts=3. The
    distinct count FP sizing needs is the caller's to supply."""
    from film_media_etl_spark.operators.bloom import bloom_build

    keys = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",)], "g string"
    )
    row = bloom_build(keys, "g").collect()[0]
    assert row.n_inserts == 4


def test_bloom_sizing_helper_meets_fp_target(spark):
    """bloom_size(n, p) must deliver: zero false negatives always, and
    an observed FP rate over a disjoint probe set within ~2x of the
    analytic bound at BOTH a loose and a tight target (two sizes —
    the helper's m/k really move with p)."""
    from film_media_etl_spark.operators.bloom import (
        bloom_build,
        bloom_contains,
        bloom_size,
        expected_fp_rate,
    )

    n = 2_000
    members = spark.range(n).selectExpr("concat('key', id) AS g")
    probes = spark.range(20_000).selectExpr("concat('miss', id) AS g")
    for target in (0.05, 0.005):
        bits, seeds = bloom_size(n, target)
        bloom = bloom_build(members, "g", bits=bits, seeds=seeds)
        flagged_members = (
            members.crossJoin(F.broadcast(bloom))
            .where(
                bloom_contains(F.col("bloom"), F.col("g"), bits=bits, seeds=seeds)
            )
            .count()
        )
        assert flagged_members == n  # no false negatives, ever
        fp = (
            probes.crossJoin(F.broadcast(bloom))
            .where(
                bloom_contains(F.col("bloom"), F.col("g"), bits=bits, seeds=seeds)
            )
            .count()
        )
        bound = expected_fp_rate(bits, len(seeds), n)
        assert bound <= target  # the helper sized to the target
        assert fp / 20_000 <= 2 * target, (fp, bits, len(seeds))


def test_bloom_screen_plan_is_map_side(spark):
    """The 100 TB property of the Bloom screen, pinned in the plan: the
    probed corpus is never joined by key or shuffled — the only joins
    are the 1-row bitmap broadcasts (BroadcastNestedLoopJoin over a
    single-row build side), there is no sort-merge or shuffled hash
    join anywhere, and the screened-set scan appears exactly once
    (n_keys folds out of the same aggregation as the bitmap)."""
    from film_media_etl_spark.plans.audit import plan_summary
    from film_media_etl_spark.queries import all_queries

    df = all_queries()["ext_decontamination_bloom"](
        spark, "/root/testdata/sf0.001"
    )
    s = plan_summary(df)
    assert s["sort_merge_joins"] == 0 and s["broadcast_hash_joins"] == 0
    assert s["cartesian_products"] == 0
    assert s["nested_loop_joins"] == 1  # the 1-row bitmap broadcast
    assert s["scans"] == 2  # eval keys once, train corpus once
    # bitmap-build fold is the only single-partition exchange
    assert s["single_partition_exchanges"] <= 1
