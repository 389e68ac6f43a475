"""Model tests for the sub-document chunk operators
(queries/corpus_chunking.py): boilerplate line removal (frequency-
threshold semantics, vs a pure-Python model) and content-defined
chunking (gear-hash boundaries vs a pure-Python model, plus the
shift-invariance property that IS the point of CDC). Cross-engine
oracle parity is tools/diff_oracle.py's job; these pin the semantics
on planted fixtures where every branch demonstrably fires.
"""

from __future__ import annotations

import math
import random
from collections import Counter

from pyspark.sql import functions as F

from conftest import PARITY_SF_DIR

from film_media_etl_spark.plans import (
    assert_no_cartesian,
    physical_plan,
    plan_summary,
)
from film_media_etl_spark.queries import all_queries
from film_media_etl_spark.queries.corpus_chunking import (
    _CDC_MIN_CHUNK,
    _CDC_THRESHOLD,
    _CDC_WINDOW,
    _GEAR_MOD,
    _GEAR_MULT,
    _LINE_TOKS,
    _MIN_DF,
    boilerplate_lines,
    cdc_chunks,
)

SEED = 1234


# ---------------------------------------------------------------------------
# pure-Python models
# ---------------------------------------------------------------------------


def _model_lines(text: str, line_toks: int = _LINE_TOKS) -> list[str]:
    toks = text.lower().split(" ")
    nc = max(1, math.ceil(len(toks) / line_toks))
    return [
        " ".join(toks[i * line_toks : min((i + 1) * line_toks, len(toks))])
        for i in range(nc)
    ]


def _model_boilerplate(docs: dict[int, str], min_df: int = _MIN_DF):
    lines = {d: _model_lines(t) for d, t in docs.items()}
    df = Counter()
    for ls in lines.values():
        for line in set(ls):
            df[line] += 1
    out = {}
    for d, ls in lines.items():
        n_bp = sum(1 for line in ls if df[line] >= min_df)
        kept = [line for line in ls if df[line] < min_df]
        out[d] = (len(ls), n_bp, " ".join(kept))
    return out


def _model_cdc(text: str) -> list[str]:
    n = len(text)
    g = [(ord(c) * _GEAR_MULT) % _GEAR_MOD for c in text]
    hs = [
        sum(g[i - 1 - j] * (1 << j) for j in range(min(i, _CDC_WINDOW)))
        % _GEAR_MOD
        for i in range(1, n + 1)
    ]
    bpos = []
    for i in range(1, n + 1):
        quiet = all(
            hs[j - 1] >= _CDC_THRESHOLD
            for j in range(max(1, i - (_CDC_MIN_CHUNK - 1)), i)
        )
        if i == n or (hs[i - 1] < _CDC_THRESHOLD and quiet):
            bpos.append(i)
    chunks, prev = [], 0
    for b in bpos:
        chunks.append(text[prev:b])
        prev = b
    return chunks


def _soup(rng: random.Random, n_words: int) -> str:
    vocab = ["table", "scan", "merge", "row", "hash", "spark", "key", "agg"]
    return " ".join(rng.choice(vocab) for _ in range(n_words))


# ---------------------------------------------------------------------------
# boilerplate line removal
# ---------------------------------------------------------------------------


def test_boilerplate_lines_matches_python_model(spark):
    """Planted fixture: a chrome line in 4 docs (removed everywhere), a
    line in exactly 2 docs (below threshold, kept), a line repeated
    twice WITHIN one doc (df=1 — distinct-document counting must keep
    it), and unique filler."""
    rng = random.Random(SEED)
    chrome = "cookie banner accept all"  # 4 tokens = one line proxy
    pair = "shared footer text here"
    docs = {}
    for d in range(4):
        docs[d] = f"{chrome} {_soup(rng, 8)}"
    docs[4] = f"{pair} {_soup(rng, 4)}"
    docs[5] = f"{_soup(rng, 4)} {pair}"
    docs[6] = f"{pair.replace('footer', 'inner')} {pair.replace('footer', 'inner')}"
    docs[7] = _soup(rng, 11)  # ragged tail line (3 tokens)
    want = _model_boilerplate(docs)
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_lines"], r["n_boilerplate"], r["cleaned_text"])
        for r in boilerplate_lines(df).collect()
    }
    assert got == want
    # the planted branches actually fired
    assert all(got[d][1] >= 1 for d in range(4)), "chrome not removed"
    assert got[4][1] == 0 and pair in got[4][2], "df=2 line wrongly removed"
    assert got[6][1] == 0, "within-doc repeat counted as cross-doc"


def test_boilerplate_frac_and_empty_cleaned_text(spark):
    """A document that is ALL boilerplate reassembles to the empty
    string with frac 1.0 (the oracle's COALESCE twin)."""
    chrome = "nav bar home link"
    docs = {d: chrome for d in range(_MIN_DF)}
    docs[99] = "unique words only here"
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in boilerplate_lines(df).collect()}
    for d in range(_MIN_DF):
        assert got[d]["cleaned_text"] == ""
        assert got[d]["boilerplate_frac"] == 1.0
    assert got[99]["boilerplate_frac"] == 0.0


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------


def test_cdc_chunks_match_python_model(spark):
    """Exact boundary parity on mixed-length inputs: long soup, shorter
    than the hash window, single char, and empty/NULL (filtered out).
    Chunk indexes and texts must match position for position."""
    rng = random.Random(SEED)
    texts = {
        0: _soup(rng, 120),
        1: _soup(rng, 40),
        2: "ab",  # shorter than the hash window
        3: "x",  # single char -> one 1-char chunk
        4: "",  # filtered
        5: None,  # filtered
        # degenerate content: '7' has a steady-state gear hash below the
        # boundary threshold, so without the quiet-window minimum-chunk
        # rule this would chunk at EVERY position (~300 one-char chunks)
        6: "7" * 300,
        7: _soup(rng, 30) + " 7777777777777777777777777777 " + _soup(rng, 30),
    }
    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    got = {}
    for r in cdc_chunks(df).collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_text"]))
    for d in got:
        got[d] = [c for _, c in sorted(got[d])]
    want = {
        d: _model_cdc(t) for d, t in texts.items() if t  # skip empty/None
    }
    assert got == want
    assert 4 not in got and 5 not in got
    # reassembly is lossless and multi-chunk on the long doc
    assert "".join(got[0]) == texts[0] and len(got[0]) > 3
    assert got[3] == ["x"]
    # the quiet-window floor holds: the digit run stays a handful of
    # chunks (not ~n one-char rows), and consecutive boundaries are
    # never closer than the minimum gap (the final tail chunk excepted)
    assert len(got[6]) <= 1 + 300 // _CDC_MIN_CHUNK
    for d, chs in got.items():
        for c in chs[:-1]:
            assert len(c) >= 1  # chunks are non-empty
        assert all(len(c) >= _CDC_MIN_CHUNK for c in chs[1:-1]) or len(chs) <= 2, (
            d,
            [len(c) for c in chs],
        )


def test_cdc_boundaries_are_shift_invariant(spark):
    """THE content-defined property: prepending a different-length
    prefix shifts every byte offset, yet boundaries downstream of the
    edit re-synchronize within ~window+mean-chunk chars, so almost all
    of the shared suffix's bytes land in identical chunks. Fixed-offset
    chunking shares ~nothing here."""
    rng = random.Random(SEED + 1)
    shared = _soup(rng, 150)  # ~900 chars of shared suffix
    a = _soup(rng, 10) + " " + shared
    b = _soup(rng, 23) + " " + shared
    df = spark.createDataFrame(
        [(0, a), (1, b)], "doc_id long, text string"
    )
    rows = cdc_chunks(df).collect()
    chunks = {0: Counter(), 1: Counter()}
    for r in rows:
        chunks[r["doc_id"]][r["chunk_text"]] += 1
    common = chunks[0] & chunks[1]
    shared_bytes = sum(len(c) * k for c, k in common.items())
    assert shared_bytes >= 0.6 * len(shared), (
        f"only {shared_bytes} of {len(shared)} shared-suffix bytes dedup"
    )


def test_registered_chunk_queries_plans(spark):
    """Plan audit at fixture scale: no cartesian anywhere; the
    frequency/first-occurrence paths are aggregates + joins, never a
    window over line/chunk text (hot-key unsplittable); no Python eval
    (JVM higher-order functions only)."""
    qs = all_queries()
    for name in ("ext_boilerplate_lines", "ext_cdc_chunk_dedup"):
        res = qs[name](spark, PARITY_SF_DIR)
        assert_no_cartesian(res)
        s = plan_summary(res)
        assert s["window_nodes"] == 0, (name, s)
        plan = physical_plan(res)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert res.count() > 0


def test_cdc_near_dup_pairs_shifted_copies_and_caps_boilerplate(spark):
    """A shifted copy (different-length prefix, shared 900-char body)
    must pair at containment >= 0.5 (THE CDC win: fixed-offset hashing
    shares nothing here); unrelated docs must not pair; and a chunk
    present in more than df_cap documents is boilerplate — excluded
    from evidence, so docs related ONLY through it never pair."""
    from film_media_etl_spark.queries.corpus_chunking import cdc_near_dup

    rng = random.Random(SEED + 2)
    body = _soup(rng, 150)
    chrome = _soup(rng, 30)  # shared "boilerplate" block
    docs = [
        (0, _soup(rng, 10) + " " + body),
        (1, _soup(rng, 23) + " " + body),  # shifted copy of 0
        (2, chrome + " " + _soup(rng, 100)),
        (3, chrome + " " + _soup(rng, 100)),
        (4, chrome + " " + _soup(rng, 100)),
        (5, _soup(rng, 120)),  # unrelated
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # df_cap=2: the chrome block's chunks appear in docs 2,3,4 (df=3),
    # so they are excluded and the chrome trio must NOT pair
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in cdc_near_dup(df, df_cap=2, min_containment=0.5).collect()
    }
    assert (0, 1) in got, "shifted copy not detected"
    assert got[(0, 1)] >= 0.5
    assert all(k == (0, 1) for k in got), (
        f"boilerplate-only relations leaked through the df cap: {got}"
    )
    # with the cap lifted the chrome trio pairs (containment of the
    # smaller doc's bytes; chrome is ~180 chars of ~780) but below 0.5
    lifted = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in cdc_near_dup(df, df_cap=64, min_containment=0.05).collect()
    }
    for pair in [(2, 3), (2, 4), (3, 4)]:
        assert pair in lifted and lifted[pair] < 0.5


def test_cdc_near_dup_registered_query_plan(spark):
    """Registered query at fixture scale: equi-joins only (no
    cartesian), no Python eval, emitted pairs respect the threshold
    and ordering convention. Values are checked at sf0.01, where the
    fixture's near-dup docs guarantee a NON-EMPTY result — at sf0.001
    the loop could pass vacuously."""
    qs = all_queries()
    df = qs["ext_cdc_near_dup"](spark, PARITY_SF_DIR)
    assert_no_cartesian(df)
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = qs["ext_cdc_near_dup"](spark, "/root/testdata/sf0.01").collect()
    assert rows, "sf0.01 fixture must yield near-dup pairs"
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["containment"] >= 0.5
