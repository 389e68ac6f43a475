"""Targeted tests for connected-components clustering and the bucketed
table layout — properties the registry parity check can't isolate
(transitivity on hand-built graphs, write-once caching)."""

from __future__ import annotations

from conftest import PARITY_SF_DIR

from film_media_etl_spark.operators.dedup import connected_components
from film_media_etl_spark.sources.bucketed import bucketed_table


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, ["doc_id_a", "doc_id_b"])
    rows = connected_components(df).collect()
    return {r["doc_id"]: r["cluster_id"] for r in rows}


def test_cc_transitive_chain(spark):
    # a~b, b~c, c~d: one cluster labeled by the min id, though a~d never scored
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_cc_separate_components(spark):
    got = _cc(spark, [(10, 11), (20, 21), (21, 22)])
    assert got == {10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_cc_long_chain_converges(spark):
    # worst-case diameter for label propagation: a 12-node path
    got = _cc(spark, [(i, i + 1) for i in range(1, 12)])
    assert set(got.values()) == {1} and len(got) == 12


def test_cc_reverse_order_edges(spark):
    # min label must flow against edge direction too
    got = _cc(spark, [(5, 1), (9, 5)])
    assert got == {1: 1, 5: 1, 9: 1}


def test_bucketed_table_written_once_and_correct(spark):
    a = bucketed_table(spark, PARITY_SF_DIR, "customer", "c_custkey")
    n1 = a.count()
    # second call serves from the session catalog (cache hit, no rewrite)
    b = bucketed_table(spark, PARITY_SF_DIR, "customer", "c_custkey")
    assert b.count() == n1
    from film_media_etl_spark.sources import load_table

    assert n1 == load_table(spark, PARITY_SF_DIR, "customer").count()
