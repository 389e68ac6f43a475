"""Broadcast Bloom-filter membership: constant-size set screens.

The exact decontamination screen (queries/llm_curation.ext_decontamination)
broadcasts the eval shingle set itself — correct while the benchmark suite
is MBs. When the screened set is corpus-class (every URL ever crawled,
every paragraph hash of a previous dump, a thousand-benchmark eval union),
the broadcast must stop growing with the set: a Bloom bitmap is the
standard answer (Bloom 1970; production crawlers screen URL frontiers
exactly this way). Properties that matter here:

- the bitmap is FIXED SIZE (bits/64 longs) no matter how many keys went
  in — the broadcast cost is a constant of the job, not of the data;
- membership has NO false negatives: a key that was inserted always
  probes true, so a screen can never miss real contamination;
- false positives happen at a tunable rate (~(1-e^(-kn/m))^k, n = the
  DISTINCT inserted keys — see bloom_size/expected_fp_rate), which for
  a REMOVAL screen means a little over-removal — the conservative
  direction for decontamination.

Spark-first shape: building the bitmap is one aggregation (positions →
per-word bit_or → map_from_arrays), probing is a pure map-side
expression over the broadcast one-row bitmap — the probed corpus is
never exploded, hashed into a join, or shuffled. Hashing is the same
JVM xxhash64 the dedup family uses (not SQL-expressible, so queries
built on this are rows-only; correctness is pinned by a
zero-false-negative guarantee test against the exact screen and an
FP-rate bound in tests/test_corpus_signals.py).
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^20 bits = 128 KiB bitmap; with k=3 hashes the false-positive rate at
# n inserted keys is (1 - e^(-3n/2^20))^3 — ~1.9e-5 at n=10k, ~1.2e-2 at
# n=100k. A 100 TB screen sizes m to its real n; the CONSTANT here is
# the operator's fixture setting, the construction is m-agnostic.
BLOOM_BITS = 1 << 20
BLOOM_SEEDS = (101, 202, 303)


def bloom_seeds(n_hashes: int) -> tuple[int, ...]:
    """k deterministic xxhash64 seeds (the fixed trio's progression
    extended: 101, 202, 303, 404, ...)."""
    return tuple(101 * (i + 1) for i in range(n_hashes))


def bloom_size(n_distinct: int, target_fp: float) -> tuple[int, tuple[int, ...]]:
    """Size a filter for ``n_distinct`` DISTINCT keys at a target
    false-positive rate: the textbook optimum m = ceil(-n ln p / ln^2 2)
    bits (rounded up to whole 64-bit words) and k = round(m/n ln 2)
    hash seeds. Feed n_distinct from the screened set's key count —
    NOT from ``n_inserts`` in the built frame, which counts insertions
    including duplicates and overestimates the load (round-7 verdict
    #3). Returns (bits, seeds) ready to pass to bloom_build /
    bloom_contains."""
    if not (0.0 < target_fp < 1.0):
        raise ValueError(f"target_fp must be in (0, 1), got {target_fp}")
    n = max(1, n_distinct)
    m = math.ceil(-n * math.log(target_fp) / (math.log(2) ** 2))
    bits = ((m + 63) // 64) * 64

    def best_k(b: int) -> int:
        k_opt = b / n * math.log(2)
        return min(
            {max(1, math.floor(k_opt)), math.ceil(k_opt)},
            key=lambda k: expected_fp_rate(b, k, n),
        )

    # integer k can land a hair above the target the real-valued optimum
    # hits exactly — widen by whole words until the analytic rate is
    # actually under target (a few iterations at most)
    k = best_k(bits)
    while expected_fp_rate(bits, k, n) > target_fp:
        bits += max(64, bits // 128)
        bits = ((bits + 63) // 64) * 64
        k = best_k(bits)
    return bits, bloom_seeds(k)


def expected_fp_rate(bits: int, n_hashes: int, n_distinct: int) -> float:
    """The classic approximation (1 - e^(-kn/m))^k for n DISTINCT
    inserted keys — the bound the sizing helper targets and the FP
    tests assert against."""
    return (1.0 - math.exp(-n_hashes * n_distinct / bits)) ** n_hashes


def _positions(key: Column, *, bits: int, seeds: tuple[int, ...]) -> list[Column]:
    """The k bit positions of a key: pmod(xxhash64(key, seed), bits) per
    seed — the same seeded-xxhash64 idiom as the MinHash family."""
    return [F.pmod(F.xxhash64(key, F.lit(s)), F.lit(bits)) for s in seeds]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    *,
    bits: int = BLOOM_BITS,
    seeds: tuple[int, ...] = BLOOM_SEEDS,
) -> DataFrame:
    """ONE-ROW frame (bloom: map<long,long>, n_inserts: long) holding
    the bitmap as a sparse word->bits map (only words with set bits
    appear, so an underfilled bitmap broadcasts even smaller than
    bits/8 bytes; the map is bounded by bits/64 entries regardless of
    key count).

    Shape: keys → explode k positions → groupBy(word).{bit_or, count}
    → one global fold to (map, n_inserts). The screened set is scanned
    exactly ONCE (it is the big side in the motivating scenario);
    n_inserts falls out of the same aggregation because explode emits
    exactly k rows per key row (sum of per-word counts = k * rows).
    Every post-explode stage is bounded by the bitmap size, not the
    key count, after the map-side partial aggregate.

    ``n_inserts`` counts INSERTIONS — input rows, duplicates included
    (a shingle shared by ten eval docs counts ten times). It is the
    number that falls out of this single-scan aggregation for free; the
    DISTINCT key count that FP-rate sizing needs is a property of the
    caller's key set, not recoverable from the bitmap — count it where
    the keys are produced and size with bloom_size(). (Round-7 verdict
    #3: the old name n_keys implied distinct and overestimated an FP
    budget sized from it.)"""
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), bits=bits, seeds=seeds))).alias(
            "pos"
        )
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("word"),
            # call_function: the PySpark shiftleft wrapper takes only a
            # literal bit count; the SQL function accepts a column
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"), F.count(F.lit(1)).alias("cnt"))
    )
    return words.agg(
        F.map_from_arrays(
            F.collect_list("word"), F.collect_list("bits")
        ).alias("bloom"),
        (F.coalesce(F.sum("cnt"), F.lit(0)) / F.lit(len(seeds)))
        .cast("long")
        .alias("n_inserts"),
    )


def bloom_contains(
    bloom: Column,
    key: Column,
    *,
    bits: int = BLOOM_BITS,
    seeds: tuple[int, ...] = BLOOM_SEEDS,
) -> Column:
    """Membership probe: true iff ALL k bits are set. A missing word in
    the sparse map means no bits set there — coalesce to 0."""

    def bit_set(pos: Column) -> Column:
        word = (pos / 64).cast("long")
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        return (
            F.coalesce(F.element_at(bloom, word), F.lit(0).cast("long")).bitwiseAND(
                mask
            )
            != 0
        )

    return reduce(
        lambda a, b: a & b,
        [bit_set(p) for p in _positions(key, bits=bits, seeds=seeds)],
    )
