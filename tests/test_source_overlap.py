"""Model tests for the cross-source shingle-overlap matrix
(queries/source_overlap.py): planted-overlap parity vs a pure-Python
model, the short-document guard (no descending-sequence footgun), and
the plan audit (shingle join never cartesian, totals ride broadcast).
Cross-engine oracle parity is tools/diff_oracle.py's job.
"""

from __future__ import annotations

from conftest import PARITY_SF_DIR

from film_media_etl_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    physical_plan,
)
from film_media_etl_spark.queries import all_queries
from film_media_etl_spark.queries.source_overlap import (
    _SHINGLE,
    source_shingles,
)


def _model(docs):
    from collections import defaultdict

    S = defaultdict(set)
    for src, txt in docs:
        if txt is None:
            continue
        toks = txt.lower().split(" ")
        for i in range(len(toks) - _SHINGLE + 1):
            S[src].add(" ".join(toks[i : i + _SHINGLE]))
    out = {}
    srcs = sorted(S)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(S[a] & S[b])
            if inter:
                out[(a, b)] = (
                    inter,
                    inter / (len(S[a]) + len(S[b]) - inter),
                )
    return S, out


def test_source_overlap_matches_python_model(spark):
    """Planted fixture: a passage shared verbatim by sources A and B
    (high overlap), a single shared 4-gram between B and C, no overlap
    A-C, a repeated shingle WITHIN one source (distinct-set semantics
    must count it once), and case-insensitivity (A's copy is
    uppercased)."""
    passage = "the quick brown fox jumps over the lazy dog"
    docs = [
        ("srcA", passage.upper() + " alpha beta gamma delta"),
        ("srcA", "alpha beta gamma delta"),  # within-source repeat
        ("srcB", passage + " epsilon zeta eta theta"),
        ("srcB", "one shared gram here plus filler words"),
        ("srcC", "one shared gram here and nothing else common"),
    ]
    S, want = _model(docs)
    df = spark.createDataFrame(docs, "source string, text string")
    # build the matrix from the library builder directly
    from pyspark.sql import functions as F

    s = source_shingles(df)
    a = s.select(F.col("source").alias("source_a"), "shingle")
    b = s.select(F.col("source").alias("source_b"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    got = {
        (r["source_a"], r["source_b"]): r["n_common"]
        for r in pairs.collect()
    }
    assert got == {k: v[0] for k, v in want.items()}
    # planted branches fired
    assert got[("srcA", "srcB")] >= 6, "verbatim passage overlap missing"
    assert got[("srcB", "srcC")] == 1, "single shared gram miscounted"
    assert ("srcA", "srcC") not in got
    # distinct-set semantics: srcA's repeated grams count once
    shingles = {
        (r["source"], r["shingle"]) for r in s.collect()
    }
    assert len(shingles) == sum(len(v) for v in S.values())


def test_source_overlap_short_doc_guard(spark):
    """Documents under _SHINGLE tokens contribute NO shingles (the
    Spark sequence() would descend on a negative span — must be gated),
    and a source with only short docs is absent from the matrix."""
    docs = [
        ("srcA", "just three tokens"),
        ("srcA", "two tokens"),
        ("srcB", "a full four token shingle appears here"),
        ("srcC", "a full four token shingle appears here"),
        ("srcD", None),
    ]
    s = source_shingles(spark.createDataFrame(docs, "source string, text string"))
    by_src = {}
    for r in s.collect():
        by_src.setdefault(r["source"], []).append(r["shingle"])
    assert "srcA" not in by_src and "srcD" not in by_src
    assert sorted(by_src) == ["srcB", "srcC"]


def test_source_overlap_registered_query_plan_and_values(spark):
    """Registered query at fixture scale: no cartesian (the pair join
    is an equi-join on shingle), per-source totals ride broadcast, no
    Python eval, jaccard in (0, 1]."""
    df = all_queries()["ext_source_overlap"](spark, PARITY_SF_DIR)
    assert_no_cartesian(df)
    assert_broadcast_join(df, 2)
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = df.collect()
    assert rows, "fixture sources share no shingles — probe expected overlap"
    for r in rows:
        assert 0 < r["jaccard"] <= 1.0
        assert r["n_common"] >= 1
