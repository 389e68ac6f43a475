"""Streaming operators vs their batch twins: run each stream with
trigger(availableNow) over the static events table, land in a memory
sink, compare to the batch computation (streams have no SQL oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import PARITY_SF_DIR

from film_media_etl_spark.sources import load_table
from film_media_etl_spark.streaming import (
    read_events_stream,
    stream_dedup,
    stream_session_agg,
    stream_stateful_user_totals,
    stream_tumbling_agg,
)


def _run_to_memory(stream_df, name: str, *, output_mode: str) -> None:
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


def _stop_and_drain(q) -> None:
    """Kill a running stream and swallow the forced-cancellation
    exception a mid-job stop() can surface through awaitTermination —
    the abort IS the point of a kill-and-resume test; what must hold is
    the post-restart state, asserted by the caller."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    q.stop()
    try:
        q.awaitTermination(60)
    except StreamingQueryException:
        pass


@pytest.fixture(scope="module")
def batch_events(spark):
    return load_table(spark, PARITY_SF_DIR, "events")


def test_stream_tumbling_matches_batch(spark, batch_events, tmp_path):
    """Append-mode windows flush only when a LATER micro-batch observes the
    advanced watermark — with a single source file that later batch is the
    trigger's final no-data batch, which is timing-dependent. Deterministic
    harness: drain once against a staged copy of the source (explicit
    checkpoint), drop a sentinel event far beyond the watermark horizon,
    and drain again from the same checkpoint. The sentinel batch starts
    from the recovered watermark, so every original window whose end is
    under it must emit — no reliance on no-data batches."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{PARITY_SF_DIR}/events.parquet", src / "events.parquet")
    ckpt = str(tmp_path / "ckpt")

    out = str(tmp_path / "out")

    def drain():
        q = (
            stream_tumbling_agg(read_events_stream(spark, str(src)))
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
        assert not q.isActive

    drain()
    max_ts = batch_events.agg(F.max("ts")).first()[0]
    sentinel_nanos = int((max_ts.timestamp() + 30 * 86400) * 1e9)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([-1], pa.int64()),
                "ts": pa.array([sentinel_nanos], pa.int64()),
                "user_id": pa.array([-1], pa.int64()),
                "event_type": pa.array(["__sentinel__"], pa.string()),
                "value": pa.array([0.0], pa.float64()),
                "props": pa.array([None], pa.string()),
            }
        ),
        src / "events_zz_sentinel.parquet",
    )
    drain()

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out).collect()
        if r["event_type"] != "__sentinel__"
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in (
            batch_events.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        ).collect()
    }
    # Everything ending at least 1h (the watermark) before the original
    # max event time MUST have flushed; later windows may or may not have
    # (final no-data batch race) but whatever flushed must match batch.
    horizon = max_ts - __import__("datetime").timedelta(hours=1, minutes=10)
    must_emit = {k for k in expected if k[0] < horizon}
    missing = must_emit - set(got)
    assert not missing, f"{len(missing)} finalized windows never emitted"
    for k, v in got.items():
        assert expected[k][0] == v[0]
        assert abs(expected[k][1] - v[1]) < 1e-6


def test_stream_session_runs(spark):
    s = stream_session_agg(read_events_stream(spark, PARITY_SF_DIR))
    _run_to_memory(s, "t_session", output_mode="append")
    rows = spark.table("t_session").collect()
    # sessions inside the final watermark horizon stay open; emitted ones
    # must be well-formed
    for r in rows:
        assert r["session_end"] > r["session_start"]
        assert r["n_events"] >= 1


def test_stream_dedup_counts(spark, batch_events):
    s = stream_dedup(read_events_stream(spark, PARITY_SF_DIR))
    _run_to_memory(s, "t_dedup", output_mode="append")
    assert spark.table("t_dedup").count() == batch_events.select("event_id").distinct().count()


def test_incremental_fact_load_matches_batch(spark, tmp_path):
    """Incremental (streaming) warehouse load == batch fact build on the
    same input: identical row count, identical revenue total, and the
    sink is year-partitioned on disk."""
    import os

    from film_media_etl_spark.etl.star import build_fact_sales
    from film_media_etl_spark.streaming import start_incremental_load

    out = str(tmp_path / "warehouse_fact")
    ckpt = str(tmp_path / "ckpt")
    q = start_incremental_load(spark, PARITY_SF_DIR, out, ckpt)
    q.awaitTermination(120)
    assert not q.isActive

    got = spark.read.parquet(out)
    batch = build_fact_sales(spark, PARITY_SF_DIR)
    assert got.count() == batch.count()
    g = got.agg(F.sum("revenue").alias("r"), F.sum("units_sold").alias("u")).first()
    b = batch.agg(F.sum("revenue").alias("r"), F.sum("units_sold").alias("u")).first()
    assert g["r"] == b["r"] and g["u"] == b["u"]
    assert any(d.startswith("year=") for d in os.listdir(out)), "sink not partitioned by year"
    # replay with the same checkpoint: exactly-once, no duplicate append
    q2 = start_incremental_load(spark, PARITY_SF_DIR, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == batch.count()


def test_stream_interval_join_matches_batch(spark):
    """Stream-stream interval join == the batch interval-join query on
    the same static input (availableNow drain)."""
    from film_media_etl_spark.queries import all_queries
    from film_media_etl_spark.streaming import stream_interval_join

    s = stream_interval_join(spark, PARITY_SF_DIR)
    _run_to_memory(s, "t_ivjoin", output_mode="append")
    got = {
        (r["user_id"], r["l_event_id"], r["r_event_id"])
        for r in spark.table("t_ivjoin").collect()
    }
    expected = {
        (r["user_id"], r["l_event_id"], r["r_event_id"])
        for r in all_queries()["ext_interval_join"](spark, PARITY_SF_DIR).collect()
    }
    assert got == expected


def test_stream_stateful_user_totals(spark, batch_events):
    s = stream_stateful_user_totals(read_events_stream(spark, PARITY_SF_DIR))
    _run_to_memory(s, "t_state", output_mode="update")
    # last update per user must equal the batch totals
    final = {}
    for r in spark.table("t_state").collect():
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    expected = {
        r["user_id"]: (r["n"], r["tv"])
        for r in batch_events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert set(final) == set(expected)
    for u, (n, tv) in expected.items():
        assert final[u][0] == n
        assert abs(final[u][1] - tv) < 1e-6


def test_foreachbatch_upsert_totals(spark, tmp_path, batch_events):
    """The foreachBatch MERGE sink must converge to the batch aggregate:
    after draining the stream, the snapshot equals groupBy(user).agg
    over the static table, regardless of how many micro-batches ran."""
    from decimal import Decimal

    from film_media_etl_spark.streaming.sinks import read_snapshot, start_upsert_totals

    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    q = start_upsert_totals(spark, PARITY_SF_DIR, snap, ckpt)
    q.awaitTermination(120)
    assert not q.isActive

    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in read_snapshot(spark, snap).collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in batch_events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,3)"))
            .cast("decimal(38,3)")
            .alias("total_value"),
        )
        .collect()
    }
    assert got == want
    assert all(isinstance(v[1], Decimal) for v in got.values())


def test_foreachbatch_upsert_is_incremental(spark, tmp_path):
    """Applying a second identical batch must ACCUMULATE (MERGE update),
    not overwrite: totals double."""
    from film_media_etl_spark.streaming.sinks import merge_user_totals, read_snapshot

    ev = load_table(spark, PARITY_SF_DIR, "events").limit(200)
    totals = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,3)"))
        .cast("decimal(38,3)")
        .alias("total_value"),
    )
    once = merge_user_totals(None, totals)
    twice = merge_user_totals(once, totals)
    got = {r["user_id"]: r["n_events"] for r in twice.collect()}
    want = {r["user_id"]: 2 * r["n_events"] for r in once.collect()}
    assert got == want


def test_incremental_load_kill_and_resume(spark, tmp_path):
    """Exactly-once across a mid-stream KILL: stage the lineitem source
    as four daily-drop files, stop the query after the first committed
    micro-batch (not a clean drain), restart from the same checkpoint,
    and require the final warehouse to equal the batch build exactly —
    no lost files, no duplicated appends. The parquet sink's
    _spark_metadata log means even a mid-batch kill leaves only
    committed files visible to readers."""
    import os
    import time

    import pyarrow.parquet as pq

    from film_media_etl_spark.etl.star import build_fact_sales
    from film_media_etl_spark.streaming import start_incremental_load

    src = tmp_path / "src"
    src.mkdir()
    # four "daily" lineitem drops + symlinks for the static tables
    t = pq.read_table(f"{PARITY_SF_DIR}/lineitem.parquet")
    quarter = (t.num_rows + 3) // 4
    for i in range(4):
        name = "lineitem.parquet" if i == 0 else f"lineitem-{i}.parquet"
        pq.write_table(t.slice(i * quarter, quarter), src / name)
    for table in ("region", "nation", "customer", "supplier", "part", "orders"):
        os.symlink(f"{PARITY_SF_DIR}/{table}.parquet", src / f"{table}.parquet")

    out = str(tmp_path / "warehouse_fact")
    ckpt = str(tmp_path / "ckpt")

    q = start_incremental_load(spark, str(src), out, ckpt)
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in (q.recentProgress or []) if p):
            break
        time.sleep(0.2)
    q.stop()  # kill after >=1 committed batch, before the drain finishes
    q.awaitTermination(60)

    batch = build_fact_sales(spark, PARITY_SF_DIR)
    expected = batch.count()
    partial = spark.read.parquet(out).count()
    assert 0 < partial <= expected

    q2 = start_incremental_load(spark, str(src), out, ckpt)
    q2.awaitTermination(240)
    assert not q2.isActive
    got = spark.read.parquet(out)
    assert got.count() == expected, f"resume lost/duplicated rows: {got.count()} vs {expected}"
    g = got.agg(F.sum("revenue").alias("r"), F.sum("units_sold").alias("u")).first()
    b = batch.agg(F.sum("revenue").alias("r"), F.sum("units_sold").alias("u")).first()
    assert g["r"] == b["r"] and g["u"] == b["u"]


def test_incremental_summary_matches_batch(spark, tmp_path):
    """The streaming-maintained sales_summary (micro-batch MERGE into the
    support snapshot) must equal the batch full recompute on the same
    input — including the non-additive COUNT DISTINCT customers, which
    the finer-grain support makes exact."""
    from film_media_etl_spark.etl.star import build_fact_sales, build_sales_summary, summary_from_support
    from film_media_etl_spark.streaming import read_snapshot, start_incremental_summary

    snap = str(tmp_path / "summary_support")
    ckpt = str(tmp_path / "ckpt")
    q = start_incremental_summary(spark, PARITY_SF_DIR, snap, ckpt)
    q.awaitTermination(240)
    assert not q.isActive

    got = summary_from_support(read_snapshot(spark, snap))
    want = build_sales_summary(build_fact_sales(spark, PARITY_SF_DIR))
    keys = ["year", "quarter", "month", "product_type", "country"]

    def norm(df):
        return {
            tuple(str(r[c]) for c in keys): (
                str(r["total_revenue"]), r["total_units"], r["n_transactions"], r["n_customers"]
            )
            for r in df.collect()
        }

    assert norm(got) == norm(want)


def test_stream_stateful_topk_matches_batch(spark, batch_events):
    """transformWithState top-k: after draining the stream, each user's
    LAST emitted ranking must equal the batch top-3 of their values.

    Requires protobuf (the transformWithState state-server protocol);
    skipped where absent — see the operator docstring."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state server needs protobuf (absent in container)",
    )
    from film_media_etl_spark.streaming import stream_stateful_topk

    # the operator refuses to flip the session-wide state-store conf
    # itself (checkpoint-compatibility hazard); opt in explicitly here
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        s = stream_stateful_topk(read_events_stream(spark, PARITY_SF_DIR))
        _run_to_memory(s, "t_topk", output_mode="update")
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    got: dict[int, list[float]] = {}
    for r in (
        spark.table("t_topk").orderBy("user_id", "rank").collect()
    ):
        got.setdefault(r["user_id"], [])
        # update-mode re-emits full rankings; later emissions overwrite
        if r["rank"] == 1:
            got[r["user_id"]] = []
        got[r["user_id"]].append(r["value"])
    want = {
        r["user_id"]: sorted(
            [v for v in r["vals"] if v is not None], reverse=True
        )[:3]
        for r in batch_events.groupBy("user_id")
        .agg(F.collect_list("value").alias("vals"))
        .collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u])


def test_stream_holt_matches_batch(spark, batch_events):
    """Streaming Holt recursion must converge to the batch twin's final
    (level, trend) per event type after draining the stream."""
    from film_media_etl_spark.streaming import stream_holt_forecast

    s = stream_holt_forecast(read_events_stream(spark, PARITY_SF_DIR))
    _run_to_memory(s, "t_holt", output_mode="update")
    got = {}
    for r in spark.table("t_holt").collect():
        prev = got.get(r["event_type"])
        if prev is None or r["n_days"] > prev["n_days"]:
            got[r["event_type"]] = r
    from film_media_etl_spark.queries import all_queries

    want = {
        r["event_type"]: r
        for r in all_queries()["ext_holt_forecast"](spark, PARITY_SF_DIR).collect()
    }
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert g["n_days"] == w["n_days"]
        assert g["level"] == pytest.approx(w["level"], abs=1e-9)
        assert g["trend"] == pytest.approx(w["trend"], abs=1e-9)


def test_stream_holt_multibatch_day_commits(spark, tmp_path, batch_events):
    """Cross-batch state: stream the events as one file PER DAY with
    maxFilesPerTrigger=1, so pending days commit as later days arrive
    across micro-batches — the final emission must still equal the
    batch recursion."""
    import glob as _glob

    from pyspark.sql import functions as SF

    from film_media_etl_spark.streaming import stream_holt_forecast
    from film_media_etl_spark.streaming.windows import EVENTS_RAW_SCHEMA

    src = str(tmp_path / "by_day")
    # raw long ts (micros) so the stream-side normalization applies
    raw = spark.read.schema(EVENTS_RAW_SCHEMA).option(
        "pathGlobFilter", "events*.parquet"
    ).parquet(PARITY_SF_DIR)
    (
        raw.withColumn(
            "_day",
            SF.date_format(
                SF.expr(
                    "timestamp_micros(CASE WHEN abs(ts) >= 100000000000000000"
                    " THEN ts div 1000 ELSE ts END)"
                ),
                "yyyyMMdd",
            ),
        )
        .repartition("_day")
        .write.partitionBy("_day")
        .parquet(src)
    )
    n_day_dirs = len(_glob.glob(src + "/_day=*"))
    assert n_day_dirs > 3  # genuinely many batches
    # FileStreamSource batches by modification time: same-job writes can
    # land with ms-level mtime inversions, which would feed days out of
    # order (outside the operator's ordering contract). Pin mtimes to
    # day order explicitly so the test is deterministic.
    import os as _os

    for i, d in enumerate(sorted(_glob.glob(src + "/_day=*"))):
        for f in _glob.glob(d + "/*.parquet"):
            _os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn(
            "ts",
            SF.expr(
                "timestamp_micros(CASE WHEN abs(ts) >= 100000000000000000"
                " THEN ts div 1000 ELSE ts END)"
            ),
        )
    )
    s = stream_holt_forecast(stream)
    _run_to_memory(s, "t_holt_mb", output_mode="update")
    got = {}
    for r in spark.table("t_holt_mb").collect():
        prev = got.get(r["event_type"])
        if prev is None or r["n_days"] > prev["n_days"]:
            got[r["event_type"]] = r
    from film_media_etl_spark.queries import all_queries

    want = {
        r["event_type"]: r
        for r in all_queries()["ext_holt_forecast"](spark, PARITY_SF_DIR).collect()
    }
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert g["n_days"] == w["n_days"]
        assert g["level"] == pytest.approx(w["level"], abs=1e-9)
        assert g["trend"] == pytest.approx(w["trend"], abs=1e-9)


def test_stream_stateful_topk_requires_explicit_rocksdb(spark):
    """The operator must REFUSE to run under a non-RocksDB state store
    rather than silently flipping the session-wide provider conf
    (which would reroute every later streaming query's checkpoints)."""
    from film_media_etl_spark.streaming import stream_stateful_topk

    assert not spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    ).endswith("RocksDBStateStoreProvider")
    with pytest.raises(ValueError, match="RocksDB state store"):
        stream_stateful_topk(read_events_stream(spark, PARITY_SF_DIR))


def test_stream_ts_unit_from_parquet_footer(spark, tmp_path):
    """Per-file unit resolution (round-3 advice): a footer-declared
    timestamp[ns] file with a PRE-1973 epoch — where the old magnitude
    heuristic misclassifies nanos as micros — must decode exactly, while
    a plain-int64 nanos file in the same directory still resolves via the
    magnitude fallback (its footer genuinely declares no unit)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    early = datetime.datetime(1970, 6, 1, 12, 0, 0)
    late = datetime.datetime(2023, 5, 1, 8, 30, 0)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1], pa.int64()),
                "ts": pa.array([early], pa.timestamp("ns")),
                "user_id": pa.array([10], pa.int64()),
                "event_type": pa.array(["declared_ns"], pa.string()),
                "value": pa.array([1.0], pa.float64()),
                "props": pa.array([None], pa.string()),
            }
        ),
        src / "events_a_declared.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([2], pa.int64()),
                "ts": pa.array([int(late.timestamp() * 1e9)], pa.int64()),
                "user_id": pa.array([20], pa.int64()),
                "event_type": pa.array(["raw_int64"], pa.string()),
                "value": pa.array([2.0], pa.float64()),
                "props": pa.array([None], pa.string()),
            }
        ),
        src / "events_b_rawint.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([3], pa.int64()),
                "ts": pa.array([early], pa.timestamp("us")),
                "user_id": pa.array([30], pa.int64()),
                "event_type": pa.array(["declared_us"], pa.string()),
                "value": pa.array([3.0], pa.float64()),
                "props": pa.array([None], pa.string()),
            }
        ),
        src / "events_c_declared_us.parquet",
    )
    s = read_events_stream(spark, str(src)).select("event_id", "ts")
    _run_to_memory(s, "t_units", output_mode="append")
    got = {r["event_id"]: r["ts"] for r in spark.table("t_units").collect()}
    assert got[1] == early, got
    assert got[2] == late, got
    assert got[3] == early, got


def test_upsert_totals_kill_and_resume(spark, tmp_path, batch_events):
    """Exactly-once for the foreachBatch versioned-MERGE sink across a
    mid-stream KILL: stage the events as four drop files (one per
    micro-batch), stop after the first committed batch, restart from the
    same checkpoint, and require the final snapshot to equal the batch
    aggregate exactly — re-delivered batches rewrite the SAME version
    directory from the same input, so nothing double-counts."""
    import os
    import time

    import pyarrow.parquet as pq

    from film_media_etl_spark.streaming.sinks import read_snapshot, start_upsert_totals

    src = tmp_path / "src"
    src.mkdir()
    t = pq.read_table(f"{PARITY_SF_DIR}/events.parquet")
    quarter = (t.num_rows + 3) // 4
    for i in range(4):
        name = "events.parquet" if i == 0 else f"events-{i}.parquet"
        pq.write_table(t.slice(i * quarter, quarter), src / name)

    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    q = start_upsert_totals(spark, str(src), snap, ckpt, max_files_per_trigger=1)
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in (q.recentProgress or []) if p):
            break
        time.sleep(0.2)
    _stop_and_drain(q)  # kill between batches, before the drain finishes
    partial_versions = len(os.listdir(snap)) if os.path.isdir(snap) else 0
    assert partial_versions >= 1

    q2 = start_upsert_totals(spark, str(src), snap, ckpt, max_files_per_trigger=1)
    q2.awaitTermination(240)
    assert not q2.isActive
    # one version per ENGINE batch: >= 2 (a restart may fold staged
    # files together); the totals equality below is batching-invariant
    assert len(os.listdir(snap)) >= 2

    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in read_snapshot(spark, snap).collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in batch_events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,3)"))
            .cast("decimal(38,3)")
            .alias("total_value"),
        )
        .collect()
    }
    assert got == want


def test_stream_holt_kill_and_resume(spark, tmp_path, batch_events):
    """applyInPandasWithState recovery: kill the streaming Holt query
    mid-stream (after >= 2 committed per-day batches), restart from the
    same checkpoint, and require the final emission per key to equal the
    batch recursion exactly — the level/trend/pending-day state must
    come back from the state store, not restart from zero."""
    import glob as _glob
    import os as _os
    import time

    from pyspark.sql import functions as SF

    from film_media_etl_spark.streaming import stream_holt_forecast
    from film_media_etl_spark.streaming.windows import EVENTS_RAW_SCHEMA

    src = str(tmp_path / "by_day")
    raw = spark.read.schema(EVENTS_RAW_SCHEMA).option(
        "pathGlobFilter", "events*.parquet"
    ).parquet(PARITY_SF_DIR)
    (
        raw.withColumn(
            "_day",
            SF.date_format(
                SF.expr(
                    "timestamp_micros(CASE WHEN abs(ts) >= 100000000000000000"
                    " THEN ts div 1000 ELSE ts END)"
                ),
                "yyyyMMdd",
            ),
        )
        .repartition("_day")
        .write.partitionBy("_day")
        .parquet(src)
    )
    day_dirs = sorted(_glob.glob(src + "/_day=*"))
    assert len(day_dirs) > 3
    for i, d in enumerate(day_dirs):  # deterministic batch order (see
        for f in _glob.glob(d + "/*.parquet"):  # multibatch test note)
            _os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.schema(EVENTS_RAW_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .withColumn(
                "ts",
                SF.expr(
                    "timestamp_micros(CASE WHEN abs(ts) >= 100000000000000000"
                    " THEN ts div 1000 ELSE ts END)"
                ),
            )
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        return (
            stream_holt_forecast(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    deadline = time.time() + 120
    while time.time() < deadline:
        done = [p for p in (q.recentProgress or []) if p and p["numInputRows"] > 0]
        if len(done) >= 2:
            break
        time.sleep(0.2)
    _stop_and_drain(q)

    q2 = start()
    q2.awaitTermination(240)
    assert not q2.isActive

    got = {}
    for r in spark.read.parquet(out).collect():
        prev = got.get(r["event_type"])
        if prev is None or r["n_days"] > prev["n_days"]:
            got[r["event_type"]] = r
    from film_media_etl_spark.queries import all_queries

    want = {
        r["event_type"]: r
        for r in all_queries()["ext_holt_forecast"](spark, PARITY_SF_DIR).collect()
    }
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert g["n_days"] == w["n_days"], (k, g["n_days"], w["n_days"])
        assert g["level"] == pytest.approx(w["level"], abs=1e-9)
        assert g["trend"] == pytest.approx(w["trend"], abs=1e-9)


def test_stream_content_dedup_matches_batch(spark):
    """Streaming exact content dedup == batch distinct on the content
    fingerprint over the same static corpus."""
    from film_media_etl_spark.streaming import (
        read_documents_stream,
        stream_content_dedup,
    )

    s = stream_content_dedup(read_documents_stream(spark, PARITY_SF_DIR))
    _run_to_memory(s, "t_cdedup", output_mode="update")
    got = spark.table("t_cdedup").select("content_fp").distinct().count()
    want = (
        load_table(spark, PARITY_SF_DIR, "documents")
        .select(F.xxhash64(F.lower(F.col("text"))).alias("fp"))
        .distinct()
        .count()
    )
    assert spark.table("t_cdedup").count() == got == want


def test_stream_near_dup_filter_matches_greedy_batch_replay(spark):
    """The stateful online filter must make the same admit/suppress
    decisions as a doc_id-ordered greedy replay of the same algorithm
    (single band, same Hamming bound) computed in plain Python over the
    batch corpus — i.e. the state machinery adds or loses nothing."""
    from film_media_etl_spark.operators.dedup import simhash_bits
    from film_media_etl_spark.streaming import (
        read_documents_stream,
        stream_near_dup_filter,
    )

    s = stream_near_dup_filter(read_documents_stream(spark, PARITY_SF_DIR))
    _run_to_memory(s, "t_neardup", output_mode="update")
    got = {r["doc_id"]: r["admitted"] for r in spark.table("t_neardup").collect()}

    rows = (
        load_table(spark, PARITY_SF_DIR, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", simhash_bits(F.col("text")).alias("sig"))
        .collect()
    )
    buckets: dict[int, list[int]] = {}
    want = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        b = r["sig"] & 0xFFFF
        admitted = buckets.setdefault(b, [])
        dup = any(bin(r["sig"] ^ s).count("1") <= 6 for s in admitted)
        if not dup:
            admitted.append(r["sig"])
        want[r["doc_id"]] = not dup
    assert got == want
    assert sum(want.values()) < len(want)  # the fixture does contain near-dups


def test_stream_curation_gate_matches_batch_pipeline(spark):
    """The online curation gate must issue EXACTLY the verdicts of the
    batch ext_curation_pipeline (which is itself DuckDB-oracle-checked)
    when the whole corpus arrives as one availableNow drain: same
    reject_reason per doc_id, same keep set. Within a batch the state
    function replays rows in doc_id order, so the min-id survivor
    convention carries over unchanged."""
    from film_media_etl_spark.queries import all_queries
    from film_media_etl_spark.streaming import (
        read_documents_stream,
        stream_curation_gate,
    )

    s = stream_curation_gate(read_documents_stream(spark, PARITY_SF_DIR))
    _run_to_memory(s, "t_curgate", output_mode="update")
    got = {
        r["doc_id"]: (r["reject_reason"], r["keep"])
        for r in spark.table("t_curgate").collect()
    }
    want = {
        r["doc_id"]: (r["reject_reason"], r["keep"])
        for r in all_queries()["ext_curation_pipeline"](
            spark, PARITY_SF_DIR
        ).collect()
    }
    assert got == want
    # the fixture exercises several gates (it holds no exact text dups,
    # so the duplicate gate gets its own corpus below)
    reasons = {v[0] for v in want.values()}
    assert "ok" in reasons and len(reasons) >= 2


def test_stream_curation_gate_blocklist_scale_path_parity(spark):
    """Round-10 (verdict task #1, streaming leg): with an over-cap
    lexicon the shared gate builder auto-selects the scale path on BOTH
    twins — the batch side's broadcast semi-join and the stream side's
    map-side membership probe (the join-back is a stream-stream
    self-join, so the stream keeps rows intact; see
    with_blocklist_reason) — and the drained stream must issue EXACTLY
    the batch verdicts, 'blocklisted' rows included."""
    from film_media_etl_spark.queries.blocklist import (
        BLOCKLIST_EXPR_MAX_PHRASES,
        DEMO_BLOCKLIST,
    )
    from film_media_etl_spark.queries.semantic_curation import curation_verdict
    from film_media_etl_spark.sources import load_table
    from film_media_etl_spark.streaming import (
        read_documents_stream,
        stream_curation_gate,
    )

    big_lex = DEMO_BLOCKLIST + tuple(
        f"zqx{i} filler phrase" for i in range(BLOCKLIST_EXPR_MAX_PHRASES)
    )
    s = stream_curation_gate(
        read_documents_stream(spark, PARITY_SF_DIR), lexicon=big_lex
    )
    _run_to_memory(s, "t_curgate_blk", output_mode="update")
    got = {
        r["doc_id"]: (r["reject_reason"], r["keep"])
        for r in spark.table("t_curgate_blk").collect()
    }
    want = {
        r["doc_id"]: (r["reject_reason"], r["keep"])
        for r in curation_verdict(
            load_table(spark, PARITY_SF_DIR, "documents"), lexicon=big_lex
        ).collect()
    }
    assert got == want
    assert "blocklisted" in {v[0] for v in want.values()}


def test_stream_curation_gate_duplicate_reason(spark, tmp_path):
    """Duplicate gate end-to-end: a corpus with an exact repeat of an
    otherwise-passing document must mark the higher doc_id 'duplicate'
    (first-writer-wins == batch MIN(doc_id) survivor), and a repeat of a
    REJECTED document must keep the scalar reason, not 'duplicate'."""
    from film_media_etl_spark.streaming import stream_curation_gate

    # long enough that no single n-gram's character mass trips the
    # round-9 13-signal repetition verdict (short docs fail
    # top_4gram_char_frac by construction — see test_function_models)
    good = (
        "the quick brown fox jumps over the lazy dog and then walks "
        "home with a friend to share some food and water by the fire "
        "as evening light settles across the quiet garden and distant "
        "hills glow softly under a wide amber sky before night arrives"
    )
    bad = "zzz qqq xxx vvv kkk www yyy jjj fff ggg hhh lll mmm nnn"
    src = tmp_path / "src"
    src.mkdir()
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.array([1, 2, 3, 4], dtype="int64"),
                    "text": [good, good, bad, bad],
                    "lang": ["en"] * 4,
                    "source": ["web"] * 4,
                    "n_chars": pd.array(
                        [len(good), len(good), len(bad), len(bad)],
                        dtype="int64",
                    ),
                }
            )
        ),
        str(src / "documents.parquet"),
    )
    docs = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("pathGlobFilter", "documents*.parquet")
        .parquet(str(src))
    )
    _run_to_memory(
        stream_curation_gate(docs), "t_curgate_dup", output_mode="update"
    )
    got = {
        r["doc_id"]: r["reject_reason"]
        for r in spark.table("t_curgate_dup").collect()
    }
    assert got[1] == "ok"
    assert got[2] == "duplicate"
    assert got[3] == got[4] != "duplicate"  # scalar reason wins over dup


def _write_docs_parquet(path, rows):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.array([r[0] for r in rows], dtype="int64"),
                    "text": [r[1] for r in rows],
                    "lang": ["en"] * len(rows),
                    "source": ["web"] * len(rows),
                    "n_chars": pd.array(
                        [len(r[1]) for r in rows], dtype="int64"
                    ),
                }
            )
        ),
        str(path),
    )


def test_stream_curation_gate_state_survives_restart(spark, tmp_path):
    """The curation gate's per-fingerprint dedup state must come back
    from the checkpoint across query restarts: a document arriving in a
    LATER run that repeats an earlier run's admitted text must be marked
    'duplicate' — exactly-once admission across the stream's lifetime,
    not per-run."""
    from film_media_etl_spark.streaming import stream_curation_gate

    # long enough that no single n-gram's character mass trips the
    # round-9 13-signal repetition verdict (short docs fail
    # top_4gram_char_frac by construction — see test_function_models)
    good = (
        "the quick brown fox jumps over the lazy dog and then walks "
        "home with a friend to share some food and water by the fire "
        "as evening light settles across the quiet garden and distant "
        "hills glow softly under a wide amber sky before night arrives"
    )
    other = (
        "a small bird sat on the old stone wall and watched the boats "
        "come slowly in to the harbor while the sun set over the water "
        "then rose again to drift above the pale cliffs where tall "
        "grass bends in cool wind and gulls call out across open waves"
    )
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def run_once():
        docs = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "documents*.parquet")
            .parquet(str(src))
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            stream_curation_gate(docs)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive

    _write_docs_parquet(src / "documents_a.parquet", [(1, good)])
    run_once()
    _write_docs_parquet(src / "documents_b.parquet", [(11, good), (12, other)])
    run_once()

    got = {
        r["doc_id"]: r["reject_reason"]
        for r in spark.read.parquet(out).collect()
    }
    assert got == {1: "ok", 11: "duplicate", 12: "ok"}


def test_stream_near_dup_filter_state_survives_restart(spark, tmp_path):
    """The online near-dup filter's admitted-signature state must be
    recovered across restarts: a later run's near-duplicate (identical
    text -> Hamming 0 in the admitted bucket) of an earlier run's
    admitted document must be suppressed."""
    from film_media_etl_spark.streaming import stream_near_dup_filter

    base = (
        "the quick brown fox jumps over the lazy dog and then walks "
        "home with a friend to share some food and water by the fire"
    )
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def run_once():
        docs = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "documents*.parquet")
            .parquet(str(src))
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            stream_near_dup_filter(docs)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive

    _write_docs_parquet(src / "documents_a.parquet", [(1, base)])
    run_once()
    _write_docs_parquet(src / "documents_b.parquet", [(11, base)])
    run_once()

    got = {r["doc_id"]: r["admitted"] for r in spark.read.parquet(out).collect()}
    assert got == {1: True, 11: False}


def test_stream_cms_matches_batch_grid(spark, tmp_path):
    """Mergeable-sketch maintenance: the CMS grid built by streaming the
    corpus as THREE separate file drops (maxFilesPerTrigger=1, so three
    micro-batches MERGE-add into the versioned snapshot) must equal the
    batch grid over the whole corpus bit-for-bit — integer cell adds
    are order-free, so mergeability here is exact, not approximate."""
    import pyarrow.parquet as pq

    from film_media_etl_spark.queries.scale_ops import cms_cells
    from film_media_etl_spark.streaming.sketches import start_cms_stream
    from film_media_etl_spark.streaming.sinks import read_snapshot

    src = tmp_path / "src"
    src.mkdir()
    tbl = pq.read_table(f"{PARITY_SF_DIR}/documents.parquet")
    n = tbl.num_rows
    # first chunk keeps the canonical name: the stream reader pins its
    # schema from a static read of <sf_dir>/documents.parquet
    names = ["documents.parquet", "documents_1.parquet", "documents_2.parquet"]
    for name, (lo, hi) in zip(
        names, [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]
    ):
        pq.write_table(tbl.slice(lo, hi - lo), src / name)

    snap = str(tmp_path / "snap")
    q = start_cms_stream(
        spark,
        str(src),
        snap,
        str(tmp_path / "ckpt"),
        available_now=True,
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    # the merge path actually ran across three engine batches (ids
    # 0/1/2), and retention pruned everything but the live version and
    # its re-delivery anchor (write_snapshot keeps exactly those two —
    # a long-lived stream must not accumulate a full state copy per
    # micro-batch)
    import os

    versions = sorted(d for d in os.listdir(snap) if d.startswith("v"))
    assert versions == ["v1", "v2"], versions

    got = {
        (r["r"], r["bucket"]): r["c"]
        for r in read_snapshot(spark, snap).collect()
    }
    import pyspark.sql.functions as F

    toks = (
        spark.read.parquet(f"{PARITY_SF_DIR}/documents.parquet")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .where(F.col("w") != "")
    )
    want = {
        (r["r"], r["bucket"]): r["c"] for r in cms_cells(toks).collect()
    }
    assert got == want and len(want) > 100


def test_snapshot_merge_redelivery_is_idempotent(spark, tmp_path):
    """The re-delivery trap the before_batch anchor exists for: after a
    crash between writing v{N} and committing the checkpoint, the
    replayed batch N must NOT merge into its own v{N}. Simulate the
    replay directly THROUGH write_snapshot (the production writer, so
    retention runs too): merging batch 1 twice (anchored below batch 1)
    yields identical cells — retention must have kept v0, the replay's
    prior state — and the unanchored read would double-count."""
    import os

    from film_media_etl_spark.streaming.sketches import merge_cms
    from film_media_etl_spark.streaming.sinks import read_snapshot, write_snapshot

    snap = str(tmp_path / "snap")
    b0 = spark.createDataFrame([(0, 1, 5), (1, 2, 7)], "r int, bucket int, c long")
    b1 = spark.createDataFrame([(0, 1, 3), (2, 9, 4)], "r int, bucket int, c long")

    write_snapshot(merge_cms(read_snapshot(spark, snap, before_batch=0), b0), snap, 0)
    write_snapshot(merge_cms(read_snapshot(spark, snap, before_batch=1), b1), snap, 1)
    # retention after v1 keeps exactly {v1, anchor v0}
    assert sorted(d for d in os.listdir(snap) if d.startswith("v")) == ["v0", "v1"]
    first = {
        (r["r"], r["bucket"]): r["c"] for r in read_snapshot(spark, snap).collect()
    }
    # crash after the v1 write, before the checkpoint commit: replay batch 1
    write_snapshot(merge_cms(read_snapshot(spark, snap, before_batch=1), b1), snap, 1)
    replayed = {
        (r["r"], r["bucket"]): r["c"] for r in read_snapshot(spark, snap).collect()
    }
    assert replayed == first == {(0, 1): 8, (1, 2): 7, (2, 9): 4}

    # a later batch retires the old anchor: after v5, only {v5, v1} live
    write_snapshot(merge_cms(read_snapshot(spark, snap, before_batch=5), b0), snap, 5)
    assert sorted(d for d in os.listdir(snap) if d.startswith("v")) == ["v1", "v5"]
    final = {
        (r["r"], r["bucket"]): r["c"] for r in read_snapshot(spark, snap).collect()
    }
    assert final == {(0, 1): 13, (1, 2): 14, (2, 9): 4}


def test_stream_cms_kill_and_resume(spark, tmp_path):
    """Mid-stream KILL for the mergeable CMS sink (round-5 verdict #8):
    stage the corpus as four file drops, stop the stream after the
    first committed micro-batch, restart from the same checkpoint, and
    require the final grid to equal the batch grid bit-for-bit — the
    versioned-MERGE snapshot plus the before_batch read anchor make the
    replayed batch rewrite its own version instead of double-counting."""
    import os
    import time

    import pyarrow.parquet as pq

    from film_media_etl_spark.queries.scale_ops import cms_cells
    from film_media_etl_spark.streaming.sinks import read_snapshot
    from film_media_etl_spark.streaming.sketches import start_cms_stream

    src = tmp_path / "src"
    src.mkdir()
    tbl = pq.read_table(f"{PARITY_SF_DIR}/documents.parquet")
    n = tbl.num_rows
    quarter = (n + 3) // 4
    for i in range(4):
        name = "documents.parquet" if i == 0 else f"documents_{i}.parquet"
        pq.write_table(tbl.slice(i * quarter, quarter), src / name)

    snap = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return start_cms_stream(
            spark, str(src), snap, ckpt,
            available_now=True, max_files_per_trigger=1,
        )

    q = start()
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in (q.recentProgress or []) if p):
            break
        time.sleep(0.2)
    _stop_and_drain(q)  # kill between batches, before the drain finishes
    partial = len(os.listdir(snap)) if os.path.isdir(snap) else 0
    assert partial >= 1

    q2 = start()
    q2.awaitTermination(240)
    assert not q2.isActive
    versions = sorted(d for d in os.listdir(snap) if d.startswith("v"))
    # restart batching is the engine's choice (two staged files can fold
    # into one batch after a kill); the grid parity below is
    # batching-invariant and carries the content
    assert len(versions) >= 2, versions

    got = {
        (r["r"], r["bucket"]): r["c"]
        for r in read_snapshot(spark, snap).collect()
    }
    toks = (
        spark.read.parquet(f"{PARITY_SF_DIR}/documents.parquet")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .where(F.col("w") != "")
    )
    want = {(r["r"], r["bucket"]): r["c"] for r in cms_cells(toks).collect()}
    assert got == want and len(want) > 100


def test_stream_index_dedup_matches_batch_survivors_with_kill(spark, tmp_path):
    """Incremental index-backed dedup: the corpus staged as four
    doc_id-ordered file drops, KILLED after the first committed batch
    and resumed from the same checkpoint. Because batches arrive in
    doc_id order, 'EXISTS an earlier-seen partner' is exactly the batch
    survivors op's 'EXISTS a lower-id partner' — the drained (doc_id,
    pruned) flags must equal minhash_lsh_survivors over the whole
    corpus BIT-FOR-BIT, and the kill must not double-index or
    double-flag anything (versioned increments + before-batch reads)."""
    import glob
    import os
    import time

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from film_media_etl_spark.operators.dedup import minhash_lsh_survivors
    from film_media_etl_spark.streaming.ingest_dedup import start_index_dedup_stream

    src = tmp_path / "src"
    src.mkdir()
    tbl = pq.read_table(f"{PARITY_SF_DIR}/documents.parquet")
    tbl = tbl.sort_by("doc_id")  # file drops must follow doc_id order
    n = tbl.num_rows
    quarter = (n + 3) // 4
    for i in range(4):
        name = "documents.parquet" if i == 0 else f"documents_{i}.parquet"
        path = src / name
        pq.write_table(tbl.slice(i * quarter, quarter), path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return start_index_dedup_stream(
            spark, str(src), idx, out, ckpt,
            available_now=True, max_files_per_trigger=1,
        )

    q = start()
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in (q.recentProgress or []) if p):
            break
        time.sleep(0.2)
    _stop_and_drain(q)  # kill between batches

    q2 = start()
    q2.awaitTermination(240)
    assert not q2.isActive
    out_versions = sorted(glob.glob(out + "/v*"))
    # batching across a kill/restart is the ENGINE's choice (a restart
    # may fold two staged files into one batch despite
    # maxFilesPerTrigger=1 — observed ~1/10 runs); the semantics are
    # batching-invariant by design, so pin multi-batch + one index
    # increment per output batch, and let the parity assert carry the
    # real content.
    assert len(out_versions) >= 2, out_versions
    assert len(glob.glob(idx + "/bands/v*")) == len(out_versions)
    got = {
        r["doc_id"]: r["pruned"]
        for r in spark.read.parquet(*out_versions).collect()
    }
    want = {
        r["doc_id"]: r["pruned"]
        for r in minhash_lsh_survivors(
            spark.read.parquet(f"{PARITY_SF_DIR}/documents.parquet")
        ).collect()
    }
    assert got == want and sum(got.values()) > 0


def test_stream_vector_index_append_matches_batch_with_kill(spark, tmp_path):
    """Streaming IVF maintenance: vectors arriving after the offline
    build are assigned to the EXISTING quantizer's cells and appended as
    versioned increments. Killed after the first committed batch and
    resumed; the final index must answer probes identically to an index
    whose cells were written in ONE batch from the same vectors and the
    same centroids — and the increments' assignments must equal the
    batch assign_cells bit-for-bit."""
    import glob
    import os
    import time

    import pyarrow.parquet as pq

    from film_media_etl_spark.operators.ann_index import (
        assign_cells,
        build_ivf_index,
        probe_ivf_index,
    )
    from film_media_etl_spark.streaming.vector_index import (
        start_vector_index_append_stream,
    )

    emb = spark.read.parquet(f"{PARITY_SF_DIR}/embeddings.parquet")
    base = emb.where("vec_id < 300")
    idx = str(tmp_path / "idx")
    build_ivf_index(base, idx, nlist=16, seed=42)

    # stage the late vectors as two file drops, oldest first
    tbl = pq.read_table(f"{PARITY_SF_DIR}/embeddings.parquet")
    import pyarrow.compute as pc

    late = tbl.filter(pc.field("vec_id") >= 300).sort_by("vec_id")
    src = tmp_path / "src"
    src.mkdir()
    half = (late.num_rows + 1) // 2
    for i, name in enumerate(["embeddings.parquet", "embeddings_1.parquet"]):
        path = src / name
        pq.write_table(late.slice(i * half, half), path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    ckpt = str(tmp_path / "ckpt")

    def start():
        return start_vector_index_append_stream(
            spark, str(src), idx, ckpt,
            available_now=True, max_files_per_trigger=1,
        )

    q = start()
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in (q.recentProgress or []) if p):
            break
        time.sleep(0.2)
    _stop_and_drain(q)
    q2 = start()
    q2.awaitTermination(240)
    assert not q2.isActive
    incs = sorted(glob.glob(idx + "/cells_inc/v*"))
    # >= 1: restart batching may fold both drops into one increment;
    # the assignment-set equality below proves nothing was lost
    assert len(incs) >= 1, incs

    centers = [
        (r["cell"], r["center"])
        for r in spark.read.parquet(f"{idx}/centroids").collect()
    ]
    got_assign = {
        r["nbr_id"]: r["cell"]
        for inc in incs
        for r in spark.read.parquet(inc).collect()
    }
    want_assign = {
        r["nbr_id"]: r["cell"]
        for r in assign_cells(emb.where("vec_id >= 300"), centers).collect()
    }
    assert got_assign == want_assign and len(got_assign) > 0

    # probe parity against a one-shot index with the same centroids
    ref = str(tmp_path / "ref")
    assign_cells(emb, centers).write.partitionBy("cell").parquet(f"{ref}/cells")
    spark.read.parquet(f"{idx}/centroids").write.parquet(f"{ref}/centroids")
    queries = emb.where("vec_id < 8")
    got = sorted(
        tuple(r) for r in probe_ivf_index(spark, idx, queries, k=5, nprobe=10).collect()
    )
    want = sorted(
        tuple(r) for r in probe_ivf_index(spark, ref, queries, k=5, nprobe=10).collect()
    )
    assert got == want and len(got) == 40


def test_stream_hll_matches_batch_estimates_with_kill(spark, tmp_path, batch_events):
    """Mergeable HLL maintenance: per-event-type distinct-user sketches
    built by streaming four file drops (killed after the first committed
    batch, resumed from the same checkpoint) must estimate IDENTICALLY
    to one batch sketch over the whole corpus — HLL registers are
    per-slot maxima over the hashed input set, so partial-union order
    and re-delivery cannot change them. Accuracy is audited against the
    exact distinct count (lgConfigK default => ~2-3% rel. error)."""
    import os
    import time

    import pyarrow.parquet as pq

    from film_media_etl_spark.streaming.sinks import read_snapshot
    from film_media_etl_spark.streaming.sketches import start_hll_stream

    src = tmp_path / "src"
    src.mkdir()
    t = pq.read_table(f"{PARITY_SF_DIR}/events.parquet")
    quarter = (t.num_rows + 3) // 4
    for i in range(4):
        name = "events.parquet" if i == 0 else f"events-{i}.parquet"
        path = src / name
        pq.write_table(t.slice(i * quarter, quarter), path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    snap = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return start_hll_stream(
            spark, str(src), snap, ckpt,
            available_now=True, max_files_per_trigger=1,
        )

    q = start()
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in (q.recentProgress or []) if p):
            break
        time.sleep(0.2)
    _stop_and_drain(q)
    q2 = start()
    q2.awaitTermination(240)
    assert not q2.isActive
    versions = [d for d in os.listdir(snap) if d.startswith("v")]
    assert len(versions) >= 2, versions  # multi-batch merge actually ran

    got = {
        r["event_type"]: r["est"]
        for r in read_snapshot(spark, snap)
        .select("event_type", F.hll_sketch_estimate("sketch").alias("est"))
        .collect()
    }
    want = {
        r["event_type"]: (r["est"], r["exact"])
        for r in batch_events.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    }
    assert set(got) == set(want) and len(got) >= 4
    for et, est in got.items():
        best, exact = want[et]
        assert est == best, (et, est, best)  # register-identical union
        assert abs(est - exact) / exact < 0.05, (et, est, exact)


def test_stream_dedup_index_day_in_the_life(spark, tmp_path):
    """The production ingest story end-to-end, composing the proven
    pieces (round-5 verdict task #8): stream the corpus in as ordered
    file drops, KILL mid-stream, resume from the same checkpoint,
    COMPACT the accumulated increments offline, then probe a brand-new
    batch against the folded index. The final probe must equal the
    one-shot flat-index probe over the same corpus (whose own parity
    with the batch LSH pairs is pinned in tests/test_dedup_recall.py),
    and after compaction the index is one base generation — the
    versioned increment roots are gone."""
    import glob
    import os
    import time

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from film_media_etl_spark.operators.dedup_index import (
        build_dedup_index,
        compact_dedup_index,
        probe_dedup_frames,
        probe_dedup_index,
        read_stream_dedup_index,
    )
    from film_media_etl_spark.streaming.ingest_dedup import start_index_dedup_stream

    split = 100  # doc_id < split: tomorrow's probe batch, never streamed
    src = tmp_path / "src"
    src.mkdir()
    tbl = pq.read_table(f"{PARITY_SF_DIR}/documents.parquet")
    corpus = tbl.filter(pc.field("doc_id") >= split).sort_by("doc_id")
    n = corpus.num_rows
    third = (n + 2) // 3
    for i in range(3):
        name = "documents.parquet" if i == 0 else f"documents_{i}.parquet"
        path = src / name
        pq.write_table(corpus.slice(i * third, third), path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return start_index_dedup_stream(
            spark, str(src), idx, out, ckpt,
            available_now=True, max_files_per_trigger=1,
        )

    q = start()
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in (q.recentProgress or []) if p):
            break
        time.sleep(0.2)
    _stop_and_drain(q)  # the mid-day crash
    q2 = start()  # same checkpoint: resume, drain the rest
    q2.awaitTermination(240)
    assert not q2.isActive

    folded = compact_dedup_index(spark, idx)
    assert folded >= 1
    assert compact_dedup_index(spark, idx) == 0  # re-run no-op
    assert not os.path.isdir(f"{idx}/bands")  # one base generation left
    assert not os.path.isdir(f"{idx}/sigs")

    batch = spark.read.parquet(f"{PARITY_SF_DIR}/documents.parquet").where(
        f"doc_id < {split}"
    )
    bands, sigs = read_stream_dedup_index(spark, idx)
    got = sorted(
        (r["probe_id"], r["corpus_id"], round(r["jaccard"], 12))
        for r in probe_dedup_frames(bands, sigs, batch).collect()
    )
    flat = str(tmp_path / "flat")
    build_dedup_index(
        spark.read.parquet(f"{PARITY_SF_DIR}/documents.parquet").where(
            f"doc_id >= {split}"
        ),
        flat,
    )
    want = sorted(
        (r["probe_id"], r["corpus_id"], round(r["jaccard"], 12))
        for r in probe_dedup_index(spark, flat, batch).collect()
    )
    assert got == want and len(got) > 0
    # the streamed flags themselves survived the kill: every corpus doc
    # got exactly one verdict
    flag_rows = spark.read.parquet(*sorted(glob.glob(out + "/v*"))).collect()
    assert len(flag_rows) == n


def test_hll_estimates_at_high_cardinality_with_split_merge_associativity(spark):
    """Round-5 verdict task #2: at fixture scale every event type has
    ~150 distinct users, where HLL is EXACT — the sketch path was never
    seen estimating, so a register-handling bug would be invisible.
    Generate 200k distinct keys (no storage; deterministic input set)
    and pin:

    - relative error of the estimate <= 2% (lgConfigK=12 default ->
      ~1.04/sqrt(4096) ~= 1.6% standard error; the input is fixed, so
      this is a deterministic measurement, not a flaky probabilistic
      bound);
    - MERGE ASSOCIATIVITY: unioning per-part sketches from TWO
      different arbitrary 3-way splits gives estimates bit-identical
      to each other and to the one-shot sketch — registers are
      per-slot maxima over the hashed input SET, so any
      partition/merge tree must land on the same registers."""
    from film_media_etl_spark.streaming.sketches import merge_hll

    n = 200_000
    base = spark.range(n).select(
        F.col("id").alias("user_id"),
        F.lit("e").alias("event_type"),
        (F.col("id") % 3).alias("s3"),
        (F.col("id") % 7 % 3).alias("s7"),
    )

    def estimate(sketches):
        merged = sketches.groupBy("event_type").agg(
            F.hll_union_agg("sketch").alias("sketch")
        )
        return merged.select(
            F.hll_sketch_estimate("sketch").alias("est")
        ).collect()[0]["est"]

    one_shot = base.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    est = estimate(one_shot)
    assert abs(est - n) / n <= 0.02, est
    assert est != n  # genuinely estimating, not in the exact regime

    for split_col in ("s3", "s7"):
        parts = base.groupBy("event_type", split_col).agg(
            F.hll_sketch_agg("user_id").alias("sketch")
        )
        assert estimate(parts) == est, split_col

    # and the streaming sink's MERGE helper lands on the same registers:
    # fold the s3 parts in one-at-a-time like three micro-batches
    snap = None
    for s in range(3):
        snap = merge_hll(
            snap, base.where(F.col("s3") == s).groupBy("event_type").agg(
                F.hll_sketch_agg("user_id").alias("sketch")
            )
        )
    assert estimate(snap) == est


def test_stream_histogram_matches_batch_grid_and_quantiles_with_kill(
    spark, tmp_path, batch_events
):
    """Mergeable histogram maintenance (the quantile leg of the
    sketch-sink trio): the grid built by streaming four file drops —
    killed after the first committed batch, resumed from the same
    checkpoint — must equal the batch hist_cells grid over the whole
    corpus BIT-FOR-BIT (integer adds are order-insensitive; versioned
    MERGE makes re-delivery idempotent), and quantiles read off the
    snapshot must equal the registered ext_histogram_quantiles rows."""
    import os
    import time

    import pyarrow.parquet as pq

    from film_media_etl_spark.queries.scale_ops import hist_cells, hist_quantiles
    from film_media_etl_spark.streaming.sinks import read_snapshot
    from film_media_etl_spark.streaming.sketches import start_histogram_stream

    src = tmp_path / "src"
    src.mkdir()
    t = pq.read_table(f"{PARITY_SF_DIR}/events.parquet")
    quarter = (t.num_rows + 3) // 4
    for i in range(4):
        name = "events.parquet" if i == 0 else f"events-{i}.parquet"
        path = src / name
        pq.write_table(t.slice(i * quarter, quarter), path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    snap = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return start_histogram_stream(
            spark, str(src), snap, ckpt,
            available_now=True, max_files_per_trigger=1,
        )

    q = start()
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in (q.recentProgress or []) if p):
            break
        time.sleep(0.2)
    _stop_and_drain(q)
    q2 = start()
    q2.awaitTermination(240)
    assert not q2.isActive
    versions = [d for d in os.listdir(snap) if d.startswith("v")]
    assert len(versions) >= 2, versions  # multi-batch merge actually ran

    snap_df = read_snapshot(spark, snap)
    got_grid = {
        (r["event_type"], r["bin"]): r["c"] for r in snap_df.collect()
    }
    want_grid = {
        (r["event_type"], r["bin"]): r["c"]
        for r in hist_cells(batch_events).collect()
    }
    assert got_grid == want_grid and len(got_grid) > 10

    got_q = {r["event_type"]: tuple(r) for r in hist_quantiles(snap_df).collect()}
    from film_media_etl_spark.queries import all_queries

    want_q = {
        r["event_type"]: tuple(r)
        for r in all_queries()["ext_histogram_quantiles"](
            spark, PARITY_SF_DIR
        ).collect()
    }
    assert got_q == want_q and len(got_q) >= 4


def test_latest_version_skips_non_version_entries(tmp_path):
    """A crashed copy's "v3.tmp", a .crc file, or an editor temp in a
    snapshot dir must be SKIPPED by the version scan, not raise and kill
    every later micro-batch (the round-5 ADVICE failure mode, fixed in
    operators/index_manifest.increment_versions and mirrored here)."""
    from film_media_etl_spark.streaming.sinks import _latest_version

    for d in ["v0", "v2", "v10", "v3.tmp", ".v1.crc", "stray", "v"]:
        (tmp_path / d).mkdir()
    assert _latest_version(str(tmp_path)) == str(tmp_path / "v10")
    assert _latest_version(str(tmp_path), before_batch=10) == str(tmp_path / "v2")
    assert _latest_version(str(tmp_path), before_batch=0) is None
    assert _latest_version(str(tmp_path / "missing")) is None


def test_stream_vector_index_day_in_the_life(spark, tmp_path):
    """The vector-ingest production story end-to-end, composing the
    proven pieces (the IVF twin of the dedup day-in-the-life test):
    offline build, stream late vectors in as file drops, KILL
    mid-stream, resume from the same checkpoint, COMPACT the increments
    offline (crash-safe manifest commit), then probe. The compacted
    index must answer probes identically to a one-shot index built from
    the same centroids over all vectors, re-compaction must be a true
    no-op, and the increment root must be gone — one base generation
    serving every probe with one scan."""
    import glob
    import os
    import time

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from film_media_etl_spark.operators.ann_index import (
        assign_cells,
        build_ivf_index,
        compact_ivf_index,
        probe_ivf_index,
        resolve_cells_base,
    )
    from film_media_etl_spark.streaming.vector_index import (
        start_vector_index_append_stream,
    )

    emb = spark.read.parquet(f"{PARITY_SF_DIR}/embeddings.parquet")
    idx = str(tmp_path / "idx")
    build_ivf_index(emb.where("vec_id < 300"), idx, nlist=16, seed=42)

    tbl = pq.read_table(f"{PARITY_SF_DIR}/embeddings.parquet")
    late = tbl.filter(pc.field("vec_id") >= 300).sort_by("vec_id")
    src = tmp_path / "src"
    src.mkdir()
    half = (late.num_rows + 1) // 2
    for i, name in enumerate(["embeddings.parquet", "embeddings_1.parquet"]):
        path = src / name
        pq.write_table(late.slice(i * half, half), path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    ckpt = str(tmp_path / "ckpt")

    def start():
        return start_vector_index_append_stream(
            spark, str(src), idx, ckpt,
            available_now=True, max_files_per_trigger=1,
        )

    q = start()
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in (q.recentProgress or []) if p):
            break
        time.sleep(0.2)
    _stop_and_drain(q)  # the mid-day crash
    q2 = start()  # same checkpoint: resume, drain the rest
    q2.awaitTermination(240)
    assert not q2.isActive
    assert glob.glob(idx + "/cells_inc/v*")  # increments actually accrued

    folded = compact_ivf_index(spark, idx)
    assert folded >= 1
    # folded increments stay one cycle for reader grace
    assert os.path.isdir(f"{idx}/cells_inc")
    base, water = resolve_cells_base(idx)
    assert os.path.basename(base).startswith("cells_g") and water >= 0

    queries = emb.where("vec_id < 8")
    got = sorted(
        tuple(r)
        for r in probe_ivf_index(spark, idx, queries, k=5, nprobe=10).collect()
    )

    # re-compaction is a true no-op: nothing folded, same base, same
    # rows — and it retires the grace view (folded root swept)
    n_rows = spark.read.parquet(base).count()
    assert compact_ivf_index(spark, idx) == 0
    assert not os.path.isdir(f"{idx}/cells_inc")
    assert resolve_cells_base(idx) == (base, water)
    assert spark.read.parquet(base).count() == n_rows

    # one-shot twin: same centroids, all vectors assigned in one batch
    centers = [
        (r["cell"], r["center"])
        for r in spark.read.parquet(f"{idx}/centroids").collect()
    ]
    ref = str(tmp_path / "ref")
    assign_cells(emb, centers).write.partitionBy("cell").parquet(f"{ref}/cells")
    spark.read.parquet(f"{idx}/centroids").write.parquet(f"{ref}/centroids")
    want = sorted(
        tuple(r)
        for r in probe_ivf_index(spark, ref, queries, k=5, nprobe=10).collect()
    )
    assert got == want and len(got) == 40


def test_vector_index_stream_rejects_stale_checkpoint(spark, tmp_path):
    """Round-6 ADVICE (medium): after compact_ivf_index commits
    folded_through=N, a stream resumed from a FRESH checkpoint replays
    batch ids 0..N — increments the watermark silently masks and the
    next sweep permanently deletes (silent loss of newly ingested
    vectors). apply_batch must raise BEFORE writing, mirroring the dedup
    stream's read guard; the failure surfaces through the streaming
    query's termination."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from film_media_etl_spark.operators.ann_index import (
        assign_cells,
        build_ivf_index,
        compact_ivf_index,
    )
    from film_media_etl_spark.streaming.vector_index import (
        start_vector_index_append_stream,
    )

    emb = spark.read.parquet(f"{PARITY_SF_DIR}/embeddings.parquet")
    idx = str(tmp_path / "idx")
    build_ivf_index(emb.where("vec_id < 200"), idx, nlist=8, seed=42)
    centers = [
        (r["cell"], r["center"])
        for r in spark.read.parquet(f"{idx}/centroids").collect()
    ]
    # one batch-shaped increment, then an offline compaction: watermark=0
    assign_cells(
        emb.where("vec_id >= 200 AND vec_id < 300"), centers
    ).write.partitionBy("cell").parquet(f"{idx}/cells_inc/v0")
    assert compact_ivf_index(spark, idx) == 1

    tbl = pq.read_table(f"{PARITY_SF_DIR}/embeddings.parquet")
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        tbl.filter(pc.field("vec_id") >= 300), src / "embeddings.parquet"
    )
    # FRESH checkpoint against the compacted index: batch 0 replays at or
    # below the watermark and must be rejected loudly, nothing written
    q = start_vector_index_append_stream(
        spark, str(src), idx, str(tmp_path / "fresh_ckpt"), available_now=True
    )
    with pytest.raises(StreamingQueryException, match="SAME checkpoint"):
        q.awaitTermination(240)
    # the guard fired BEFORE the write: the grace-kept v0 increment is
    # exactly the compaction-era one (its rows are the 100 folded
    # vectors, not the replayed source's 300+), so nothing was lost or
    # overwritten
    assert spark.read.parquet(f"{idx}/cells_inc/v0").count() == 100
