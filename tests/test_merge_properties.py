"""Property-based check of the incremental sales_summary maintenance:
folding merge_summary_support over ANY partition of the fact into arrival
batches must equal the one-shot rollup (build order independence — the
property that makes the streaming foreachBatch feed safe under arbitrary
micro-batch boundaries and replays of whole batches).

Hypothesis drives the corpus shape AND the batch assignment; examples are
few (each runs real Spark jobs) but adversarial: duplicate keys, NULL
customers, NULL grain values, single-row batches, empty batches.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from film_media_etl_spark.etl.star import (
    merge_summary_support,
    summary_from_support,
    summary_support,
)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from film_media_etl_spark.session import get_spark

        _spark = get_spark()
    return _spark


_row = st.tuples(
    st.integers(min_value=1995, max_value=1997),  # year
    st.integers(min_value=1, max_value=4),  # quarter
    st.integers(min_value=1, max_value=12),  # month
    st.sampled_from(["film", "music", None]),  # product_type (NULL grain)
    st.sampled_from(["US", "DE", None]),  # country
    st.one_of(st.none(), st.integers(min_value=1, max_value=5)),  # customer_key
    st.integers(min_value=-500, max_value=500),  # revenue cents
    st.integers(min_value=0, max_value=9),  # units
)


@given(
    rows=st.lists(_row, min_size=1, max_size=40),
    batch_of=st.lists(st.integers(min_value=0, max_value=3), min_size=40, max_size=40),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_merge_fold_equals_oneshot(rows, batch_of):
    spark = _get_spark()
    data = [
        (y, q, m, pt, co, ck, Decimal(cents) / 100, u)
        for (y, q, m, pt, co, ck, cents, u) in rows
    ]
    schema = (
        "year int, quarter int, month int, product_type string, country string,"
        " customer_key int, revenue decimal(18,4), units_sold int"
    )
    fact = spark.createDataFrame(data, schema)

    support = None
    for b in range(4):
        batch_rows = [data[i] for i in range(len(data)) if batch_of[i] == b]
        if not batch_rows:
            continue  # empty arrival batches are legal no-ops
        batch = spark.createDataFrame(batch_rows, schema)
        support = merge_summary_support(support, summary_support(batch))
    assert support is not None

    def norm(df):
        return {
            tuple(str(r[c]) for c in df.columns[:5]): (
                str(r["total_revenue"]),
                r["total_units"],
                r["n_transactions"],
                r["n_customers"],
            )
            for r in df.collect()
        }

    got = norm(summary_from_support(support))
    want = norm(summary_from_support(summary_support(fact)))
    assert got == want
