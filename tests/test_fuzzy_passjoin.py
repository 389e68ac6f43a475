"""Completeness of the PassJoin segment blocking vs the in-block quadratic
(ext_fuzzy_match_passjoin vs ext_fuzzy_match): identical pair sets on
adversarial inputs, not just the shipped corpus.

The quadratic variant IS the specification (it enumerates every in-block
pair); the segment-blocked variant must never lose a pair — candidate
over-generation is fine (verified away), candidate loss is a bug. Random
short strings over a 3-letter alphabet maximize edit-distance corner
cases (indel position shifts, equal-length substitutions, length-2 gaps,
sub-3-char fallback strings, exact duplicates)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _pairs(df):
    return {
        (r["key_a"], r["key_b"], r["edit_dist"])
        for r in df.select("key_a", "key_b", "edit_dist").collect()
    }


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_passjoin_matches_quadratic_on_random_corpus(spark, tmp_path, seed):
    rng = random.Random(seed)
    alphabet = "abc"
    rows = []
    for i in range(300):
        # lengths 1..12 hit the <3-char fallback AND the segment path;
        # near-dups are guaranteed by deriving strings from 30 roots
        root = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        s = list(root)
        for _ in range(rng.randint(0, 3)):  # up to 3 random edits
            op = rng.choice("ids") if s else "i"
            pos = rng.randrange(len(s) + (op == "i"))
            if op == "i":
                s.insert(pos, rng.choice(alphabet))
            elif op == "d":
                del s[pos]
            elif s:
                s[pos] = rng.choice(alphabet)
        if not s:
            s = [rng.choice(alphabet)]
        rows.append((i, f"Brand#{i % 3}", "".join(s)))

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "p_partkey long, p_brand string, p_name string"
    ).withColumn("p_type", F.lit("t")).write.mode("overwrite").parquet(
        f"{sf_dir}/part.parquet"
    )

    from film_media_etl_spark.queries.advanced_analytics import (
        ext_fuzzy_match,
        ext_fuzzy_match_passjoin,
    )

    quad = _pairs(ext_fuzzy_match(spark, sf_dir))
    seg = _pairs(ext_fuzzy_match_passjoin(spark, sf_dir))
    assert seg == quad, (
        f"lost={sorted(quad - seg)[:5]} extra={sorted(seg - quad)[:5]}"
    )
