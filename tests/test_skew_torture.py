"""Skew torture (round-3 verdict #4): the engine's skew story rested on
configuration claims — AQE skew-join enabled in session.py, salting
available in operators/skew.py, broadcast dims in the star ETL. These
tests exercise each claim under a REAL hot key (>= 50% of rows on one
key) and pin that the mitigation actually engages.

Detection note: AQE marks a split join ``SortMergeJoin(skew=true)`` in
the executed plan of the SAME DataFrame after an action; thresholds are
lowered test-locally because the defaults (256 MB skewed-partition
floor) never trigger at fixture scale."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from conftest import PARITY_SF_DIR, spark_conf

# test-local AQE thresholds: tiny partitions must qualify as "skewed"
_SKEW_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16384",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4096",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}


_conf = spark_conf


def _hot_big(spark, n: int):
    """n wide-ish rows, 50% on the single key 'HOT', rest over 997 keys."""
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 997).cast("string")))
        .alias("key"),
        F.col("id").alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )


def test_aqe_skew_split_engages_on_hot_join_key(spark):
    """A sort-merge join whose probe side puts 50% of rows on one key
    must come out of AQE with the hot partition SPLIT (skew=true) —
    the runtime self-healing the 100 TB posture relies on for joins."""
    with _conf(spark, _SKEW_CONF):
        big = _hot_big(spark, 200_000)
        small = spark.range(1000).select(
            F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"),
            (F.col("id") * 2).alias("w"),
        ).unionByName(spark.createDataFrame([("HOT", -1)], "key string, w long"))
        # filter references BOTH sides so it cannot push below the join:
        # full join work, empty driver result
        j = big.join(small, "key").where(F.col("v") + F.col("w") < F.lit(-(10**17)))
        assert j.collect() == []
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]


def test_salted_aggregate_hot_key_correct_and_near_uniform_wall(spark):
    """salted_aggregate on a 50%-hot corpus: identical results to the
    plain groupBy, and wall within ~2x of the same aggregate over a
    perfectly uniform corpus of the same size."""
    from film_media_etl_spark.operators.skew import salted_aggregate

    n = 2_000_000
    hot = _hot_big(spark, n)
    uniform = spark.range(n).select(
        F.concat(F.lit("k"), (F.col("id") % 997).cast("string")).alias("key"),
        F.col("id").alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    aggs = {"total": ("sum", "v"), "n": ("count", "v"), "hi": ("max", "pad")}

    def run(df):
        t0 = time.perf_counter()
        rows = salted_aggregate(df, ["key"], aggs).collect()
        return time.perf_counter() - t0, {r["key"]: (r["total"], r["n"], r["hi"]) for r in rows}

    run(uniform.limit(50_000))  # JIT warmup
    # min-of-2 per side: wall-clock noise on this host is one-sided and
    # EPISODIC (hypervisor neighbors / late-suite JVM state; see README
    # "Bench validity" and the minhash saturated-corpus test's identical
    # rationale) — a single 30s+ stall on one sample flunked the 2x
    # budget in a full-suite run while the same test passed solo
    # seconds later. The min is the stable estimator of true cost.
    t_u, _ = min(run(uniform), run(uniform), key=lambda r: r[0])
    t_h, got = min(run(hot), run(hot), key=lambda r: r[0])
    want = {
        r["key"]: (r["total"], r["n"], r["hi"])
        for r in hot.groupBy("key")
        .agg(F.sum("v").alias("total"), F.count("v").alias("n"), F.max("pad").alias("hi"))
        .collect()
    }
    assert got == want
    assert got["HOT"][1] == n // 2
    # generous noise allowance on top of the 2x bound (run-to-run jitter
    # on a shared box is ~±12%)
    assert t_h <= 2.0 * t_u + 1.0, (t_h, t_u)


def test_minhash_banded_join_hot_bucket_splits_and_stays_exact(spark):
    """50% of documents IDENTICAL: every duplicate lands in the same
    band bucket, so the candidate self-join has one massively hot key.
    The banded join must (a) remain a plain hash-shuffle AQE can
    skew-split — pinned by skew=true in the executed plan under the
    lowered thresholds — and (b) emit each true pair exactly once:
    C(n_dup, 2) verified pairs at Jaccard 1.0, no duplicates. (The PAIR
    COUNT itself is quadratic in the duplicate group — that is the
    output's intrinsic size, same caveat as SemDeDup; the survivors/
    clustering consumers downstream are the output-bounded tiers.)"""
    from film_media_etl_spark.operators.dedup import minhash_lsh_pairs

    n, n_dup = 2000, 1000
    hot_text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_dup, F.lit(hot_text))
        .otherwise(
            F.concat(
                F.lit("unique document body number "),
                F.col("id").cast("string"),
                F.lit(" with filler tokens alpha beta gamma delta"),
            )
        )
        .alias("text"),
    )
    with _conf(spark, _SKEW_CONF):
        out = minhash_lsh_pairs(docs, threshold=0.9)
        pairs = [(r["doc_id_a"], r["doc_id_b"]) for r in out.collect()]
        plan = out._jdf.queryExecution().executedPlan().toString()
    dup_pairs = [p for p in pairs if p[0] < n_dup and p[1] < n_dup]
    assert len(dup_pairs) == n_dup * (n_dup - 1) // 2
    assert len(set(pairs)) == len(pairs), "duplicate candidate emissions"
    assert "skew=true" in plan, plan[:2000]


def test_star_fact_build_immune_to_hot_customer(spark, tmp_path):
    """Star fact build under 50%-hot order-key skew: every dimension
    resolution is a broadcast join (asserted in test_plans), so a hot
    key never crosses an exchange — wall must stay within ~2x of the
    unskewed build of the same row count."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from film_media_etl_spark.etl.star import build_fact_sales
    from film_media_etl_spark.sources import TABLES

    src = str(tmp_path / "skewed")
    (tmp_path / "skewed").mkdir()
    for t in TABLES:
        shutil.copy(f"{PARITY_SF_DIR}/{t}.parquet", f"{src}/{t}.parquet")
    # rewrite lineitem with 50% of rows on one existing order key, via
    # pyarrow so every other column keeps its exact parquet logical type
    tbl = pq.read_table(f"{PARITY_SF_DIR}/lineitem.parquet")
    ok = tbl["l_orderkey"].to_numpy()
    hot_key = int(np.bincount(ok).argmax())
    rng = np.random.default_rng(7)
    new = np.where(rng.random(len(ok)) < 0.5, hot_key, ok)
    idx = tbl.schema.get_field_index("l_orderkey")
    tbl = tbl.set_column(
        idx, "l_orderkey", pa.array(new, tbl.schema.field("l_orderkey").type)
    )
    pq.write_table(tbl, f"{src}/lineitem.parquet")

    def run(sf_dir):
        t0 = time.perf_counter()
        n = build_fact_sales(spark, sf_dir).count()
        return time.perf_counter() - t0, n

    run(PARITY_SF_DIR)  # warmup
    t_u, n_u = run(PARITY_SF_DIR)
    t_h, n_h = run(src)
    assert n_h == n_u  # every lineitem still resolves (hot key exists)
    assert t_h <= 2.0 * t_u + 1.0, (t_h, t_u)


def _stage_whale_and_uniform_events(tmp_path, *, whale_user: int, n_extra=1_000_000):
    """Two event corpora with the SAME extra volume: one dumped on a
    single whale user, one spread over 50k users — the pair every
    whale-cap torture compares."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(f"{PARITY_SF_DIR}/events.parquet")
    rng = np.random.default_rng(11)
    types = np.array(["view", "click", "purchase", "signup", "error"])

    def extra_events(user_ids: np.ndarray) -> pa.Table:
        # schema-exact synthetic rows appended to the real fixture
        return pa.table(
            {
                "event_id": pa.array(
                    np.arange(n_extra, dtype=np.int64) + 10**12, pa.int64()
                ),
                "ts": pa.array(
                    np.datetime64("2024-01-01T00:00:00", "us")
                    + np.arange(n_extra).astype("timedelta64[s]"),
                    base.schema.field("ts").type,
                ),
                "user_id": pa.array(user_ids, pa.int64()),
                "event_type": pa.array(types[rng.integers(0, 5, n_extra)]),
                "value": pa.array(rng.random(n_extra), pa.float64()),
                "props": pa.array(np.full(n_extra, "{}")),
            }
        ).cast(base.schema)

    whale_dir, uniform_dir = str(tmp_path / "whale"), str(tmp_path / "uniform")
    for d, users in (
        (whale_dir, np.full(n_extra, whale_user, dtype=np.int64)),
        (uniform_dir, (np.arange(n_extra, dtype=np.int64) % 50_000) + 10**9),
    ):
        (tmp_path / d.rsplit("/", 1)[1]).mkdir()
        shutil.copy(f"{PARITY_SF_DIR}/events.parquet", f"{d}/events.parquet.orig")
        pq.write_table(
            pa.concat_tables([base, extra_events(users)]),
            f"{d}/events.parquet",
        )
    return whale_dir, uniform_dir


def test_event_regex_whale_user_journey_capped_and_flat(spark, tmp_path):
    """Whale-user torture for the CEP journey op (round-4 verdict #3 /
    round-5 #7): one user contributing 10^6 events must neither blow up
    the per-user ordered collect (the journey is capped at the
    most-recent _JOURNEY_CAP events, deterministically) nor make the
    query materially slower than the SAME extra volume spread uniformly
    over many users."""
    from film_media_etl_spark.queries.event_analytics import (
        _JOURNEY_CAP,
        ext_event_regex,
    )

    whale_dir, uniform_dir = _stage_whale_and_uniform_events(
        tmp_path, whale_user=10**9
    )

    def run(sf_dir):
        t0 = time.perf_counter()
        rows = {r["user_id"]: r for r in ext_event_regex(spark, sf_dir).collect()}
        return time.perf_counter() - t0, rows

    run(uniform_dir)  # warmup
    t_u, _ = run(uniform_dir)
    t_w, rows_w = run(whale_dir)
    # the whale's journey is capped, deterministic, and still scanned
    assert rows_w[10**9]["n_events"] == _JOURNEY_CAP
    # flat: the hot user costs no more than ~2x the uniform layout
    assert t_w <= 2.0 * t_u + 1.0, (t_w, t_u)


def test_collect_ordered_whale_user_capped_and_flat(spark, tmp_path):
    """Round-5 verdict #6: ext_collect_ordered carried the same
    whale-user exposure ext_event_regex fixed — its full-history
    ordered collect now takes the identical most-recent-_JOURNEY_CAP
    row_number cap (oracle-mirrored). The whale sits INSIDE the op's
    user_id < 40 gate (user 5), so the cap is what protects it."""
    from film_media_etl_spark.queries.event_analytics import (
        _JOURNEY_CAP,
        ext_collect_ordered,
    )

    whale_dir, uniform_dir = _stage_whale_and_uniform_events(tmp_path, whale_user=5)

    def run(sf_dir):
        t0 = time.perf_counter()
        rows = {r["user_id"]: r for r in ext_collect_ordered(spark, sf_dir).collect()}
        return time.perf_counter() - t0, rows

    run(uniform_dir)  # warmup
    t_u, _ = run(uniform_dir)
    t_w, rows_w = run(whale_dir)
    whale = rows_w[5]
    assert whale["n_events"] == _JOURNEY_CAP
    # the path string is bounded by the cap, not the 10^6-event history
    assert whale["event_path"].count(">") == _JOURNEY_CAP - 1
    assert t_w <= 2.0 * t_u + 1.0, (t_w, t_u)


def test_exact_substring_whale_doc_reassembly_linear(spark):
    """Round-7 verdict #2: ExactSubstr reassembly was a per-token
    array_contains probe of the removal set — O(tokens x removed), ~10^10
    membership steps inside ONE task for a 100k-token mostly-duplicated
    whale document (concatenated logs / minified bundles are real at
    100 TB). The interval-slice reassembly is linear per document; this
    pins BOTH completion at whale scale and cell-exact agreement with
    the brute-force Python model."""
    from test_function_models import _exact_substr_model

    from film_media_etl_spark.operators.dedup import exact_substring_dedup

    period = " ".join(f"a{i}" for i in range(10))
    whale = " ".join([period] * 10_000)  # 100k tokens, all but the head duplicated
    filler = " ".join(f"u{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(0, whale), (1, filler)], "doc_id long, text string"
    )
    t0 = time.perf_counter()
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in exact_substring_dedup(docs, k=5).collect()
    }
    wall = time.perf_counter() - t0
    want = _exact_substr_model([(0, whale), (1, filler)], 5)
    assert got == want
    # the whale really is mostly removed, and the run finished in linear
    # time (the quadratic probe needed ~10^10 steps in one task here)
    assert got[0][1] > 0.9 * got[0][0]
    assert wall < 60.0, wall
