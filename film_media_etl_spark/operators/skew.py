"""Skew-mitigation operators.

At 100 TB the failure mode of ``groupBy(hot_key)`` is not wrong answers
but a single straggler reducer holding the whole job. Two mitigations,
composable with everything else in the engine:

1. ``salted_aggregate`` — classic two-stage aggregation: scatter each
   group across ``salt_buckets`` sub-groups (uniform random salt per
   row), partially aggregate, then combine partials per real key. The
   first shuffle spreads a hot key over N reducers; the second shuffle
   moves only N rows per key. Works for any algebraic aggregate
   (sum/count/min/max — and avg as sum+count).
2. AQE skew-join splitting is already ON in session.py
   (``spark.sql.adaptive.skewJoin.enabled``) — joins self-heal at
   runtime; salting is for aggregations, where AQE cannot split a
   logical group.

``F.rand(seed)`` is fine here: the salt only routes rows, the combined
result is salt-invariant, so determinism of results is preserved.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_expr, combine_fn) per supported algebraic aggregate.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str | Column]],
    *,
    salt_buckets: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``aggs`` maps output column name -> (agg_name, input column), e.g.
    ``{"total_value": ("sum", "value"), "n": ("count", "value")}``.

    Equivalent to ``df.groupBy(keys).agg(...)`` but a key with a billion
    rows occupies ``salt_buckets`` reducers in stage one instead of one;
    stage two combines ``salt_buckets`` partial rows per key — trivially
    small regardless of input skew.
    """
    for name, (op, _) in aggs.items():
        if op not in _ALGEBRAIC:
            raise ValueError(f"{name}: {op!r} is not algebraic; supported: {sorted(_ALGEBRAIC)}")
    salted = df.withColumn("_salt", (F.rand(seed) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[_ALGEBRAIC[op][0](col).alias(f"_p_{name}") for name, (op, col) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_ALGEBRAIC[op][1](f"_p_{name}").alias(name) for name, (op, _) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    salt_buckets: int = 16,
    seed: int = 42,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big (probe) side uniformly and
    replicate the small (build) side once per salt bucket, then join on
    (key, salt). A hot key's rows land on ``salt_buckets`` reducers
    instead of one; results are identical to ``big.join(small, key,
    how)`` because every probe row still meets every matching build row
    (exactly once, under its own salt).

    Use when the build side is too big to broadcast AND AQE's runtime
    skew splitting is unavailable (e.g. the skewed join feeds a
    co-partitioned downstream op AQE won't re-plan). Cost model: build
    side is replicated ``salt_buckets``x — keep it dimension-sized.
    Supported joins: inner / left (semantics preserved per probe row).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    b = big.withColumn("_salt", (F.rand(seed) * salt_buckets).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")
