"""Mirror of the driver's t2 correctness gate: run every registered query
in Spark AND its DuckDB oracle on the same parquet, compare row count,
column names, and (order-insensitively) every value — exactly, no
tolerances, because the driver compares value hashes.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import numpy as np
import pandas as pd
import pytest

from film_media_etl_spark import queries as q

from conftest import PARITY_SF_DIR


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_frame(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    rows.sort(key=repr)
    return rows


ORACLE_QUERIES = sorted(q.all_oracles())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, duck):
    eq = q.get(name)
    spark_df = eq.fn(spark, PARITY_SF_DIR).toPandas()
    rel = duck.sql(eq.oracle)
    # fetchall (not .df()) so DECIMAL stays Decimal instead of float64
    duck_df = pd.DataFrame(rel.fetchall(), columns=rel.columns)

    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}"
    )
    assert len(spark_df) == len(duck_df), (
        f"{name}: row count {len(spark_df)} vs {len(duck_df)}"
    )
    s_rows, d_rows = _norm_frame(spark_df), _norm_frame(duck_df)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"


def test_rows_only_queries_run(spark):
    """Queries without an oracle must still execute and return a schema."""
    no_oracle = [n for n in q.all_queries() if n not in q.all_oracles()]
    for name in no_oracle:
        df = q.get(name).fn(spark, PARITY_SF_DIR)
        assert df.columns, f"{name}: empty schema"
        assert df.count() >= 0


def test_sketch_accuracy(spark):
    """Sketches trade exactness for mergeable bounded memory; assert the
    trade stays inside advertised bounds: HLL++ rsd 2% (allow 3x), p50
    within the value range's 5% neighborhood of the exact median."""
    from pyspark.sql import functions as F

    from film_media_etl_spark.sources import load_table

    got = {
        r["event_type"]: r
        for r in q.get("ext_approx_sketches").fn(spark, PARITY_SF_DIR).collect()
    }
    ev = load_table(spark, PARITY_SF_DIR, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            (F.max("value") - F.min("value")).alias("range"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, e in exact.items():
        rel = abs(got[et]["approx_users"] - e["users"]) / max(e["users"], 1)
        assert rel <= 0.06, f"{et}: HLL rel err {rel:.3f}"
        assert abs(got[et]["value_p50_p95"][0] - e["p50"]) <= 0.05 * e["range"] + 1e-9, et


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["year", "total_revenue", "n_sales"]
