"""Prototype: 4-segment double-match PassJoin (tau=2) vs the shipped
3-segment verify-before-shuffle shape. Pigeonhole: 2 edits destroy at
most 2 of 4 disjoint segments, so every qualifying pair preserves >= 2
segments — joining on a PAIR of segments multiplies away saturated-block
collisions. Shift budget (exact, complete): edits before k1 >= |d1|,
between >= |d2-d1|, after >= |delta-d2|, so |d1|+|d2-d1|+|delta-d2|<=tau.

Usage: python tools/passjoin4_proto.py [SF_DIR ...]
Prints pair count + wall for both variants (counts must match).
"""

from __future__ import annotations

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from film_media_etl_spark.session import get_spark  # noqa: E402
from film_media_etl_spark.sources import ensure_parallelism, load_table  # noqa: E402

TAU = 2
NSEG = 4
PAIRS = list(itertools.combinations(range(1, NSEG + 1), 2))  # 6 (k1<k2)


def _idiv(c, n):
    return F.floor(c / n).cast("int")


def _seg_bounds(alen):
    """start(k), len(k) for the 4-way floor split of a length column."""
    cuts = [F.lit(0).cast("int")] + [
        (alen - _idiv((NSEG - i) * alen, NSEG)).cast("int") for i in range(1, NSEG)
    ] + [alen.cast("int")]
    starts = [c + 1 for c in cuts[:-1]]
    lens = [cuts[i + 1] - cuts[i] for i in range(NSEG)]
    return starts, lens


def fuzzy_match_passjoin4(spark, sf_dir: str) -> DataFrame:
    p = ensure_parallelism(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    )
    la = F.length("p_name")

    # ---- indexed side: 6 (k1,k2) segment-pair rows per string ----
    s_starts, s_lens = _seg_bounds(la)
    pair_structs = F.array(
        *[
            F.struct(
                F.lit(pi).alias("pair_id"),
                F.col("p_name").substr(s_starts[k1 - 1], s_lens[k1 - 1]).alias("sa"),
                F.col("p_name").substr(s_starts[k2 - 1], s_lens[k2 - 1]).alias("sb"),
            )
            for pi, (k1, k2) in enumerate(PAIRS)
        ]
    )
    segs = p.where(la >= NSEG).select(
        F.col("p_partkey").alias("key_s"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name_s"),
        la.alias("len_s"),
        F.explode(pair_structs).alias("sg"),
    )

    # ---- probe side ----
    lb = F.length("p_name")
    al = F.col("_alen")
    p_starts, p_lens = _seg_bounds(al)
    delta = lb - al
    probes = (
        p.select(
            F.col("p_partkey").alias("key_p"),
            F.col("p_brand").alias("brand2"),
            "p_name",
            F.explode(
                F.array(*[(lb + d).cast("int") for d in range(-TAU, TAU + 1)])
            ).alias("_alen"),
        )
        .where(al >= NSEG)
        .withColumn("_pair", F.explode(F.array(*[F.lit(i) for i in range(len(PAIRS))])))
    )
    # (d1, d2) combos with the exact edit budget, per (pair, delta):
    # enumerate the 25 literals, filter by budget AND in-bounds windows
    dcands = F.array(
        *[
            F.struct(F.lit(d1).alias("d1"), F.lit(d2).alias("d2"))
            for d1 in range(-TAU, TAU + 1)
            for d2 in range(-TAU, TAU + 1)
        ]
    )

    def budget_ok(s):
        return (
            F.abs(s["d1"])
            + F.abs(s["d2"] - s["d1"])
            + F.abs(delta - s["d2"])
        ) <= F.lit(TAU)

    probes = probes.withColumn("_d", F.explode(F.filter(dcands, budget_ok)))
    k1 = F.element_at(
        F.array(*[F.lit(k1) for (k1, _) in PAIRS]), F.col("_pair") + 1
    )
    k2 = F.element_at(
        F.array(*[F.lit(k2) for (_, k2) in PAIRS]), F.col("_pair") + 1
    )
    start_of = lambda k: F.element_at(F.array(*p_starts), k)  # noqa: E731
    len_of = lambda k: F.element_at(F.array(*p_lens), k)  # noqa: E731
    a_start = start_of(k1) + F.col("_d.d1")
    b_start = start_of(k2) + F.col("_d.d2")
    probes = (
        probes.where(
            (a_start >= 1)
            & (b_start >= 1)
            & (a_start + len_of(k1) - 1 <= lb)
            & (b_start + len_of(k2) - 1 <= lb)
        )
        .select(
            "key_p",
            "brand2",
            "p_name",
            F.col("_alen").alias("alen"),
            F.col("_pair").alias("pair_id2"),
            F.col("p_name").substr(a_start.cast("int"), len_of(k1).cast("int")).alias("pa"),
            F.col("p_name").substr(b_start.cast("int"), len_of(k2).cast("int")).alias("pb"),
        )
        .where((F.length("pa") > 0) & (F.length("pb") > 0))
    )

    d = F.levenshtein(F.col("name_s"), F.col("p_name"), TAU)
    s_first = F.col("key_s") < F.col("key_p")
    pairs_seg = (
        segs.join(
            probes,
            (segs.brand == probes.brand2)
            & (F.col("sg.pair_id") == probes.pair_id2)
            & (F.col("len_s") == probes.alen)
            & (F.col("sg.sa") == probes.pa)
            & (F.col("sg.sb") == probes.pb)
            & (F.col("key_s") != F.col("key_p")),
        )
        .where(
            (F.abs(F.length("name_s") - F.length("p_name")) <= TAU)
            & (F.col("name_s") != F.col("p_name"))
        )
        .withColumn("edit_dist", d)
        .where((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= TAU))
        .select(
            F.least("key_s", "key_p").alias("ka"),
            F.greatest("key_s", "key_p").alias("kb"),
            F.when(s_first, F.col("name_s")).otherwise(F.col("p_name")).alias("name_a"),
            F.when(s_first, F.col("p_name")).otherwise(F.col("name_s")).alias("name_b"),
            "edit_dist",
        )
    )
    shorts = p.where(la < NSEG)
    sh_first = F.col("s.p_partkey") < F.col("t.p_partkey")
    d2 = F.levenshtein(F.col("s.p_name"), F.col("t.p_name"), TAU)
    pairs_short = (
        shorts.alias("s")
        .join(
            p.alias("t"),
            (F.col("s.p_brand") == F.col("t.p_brand"))
            & (F.col("s.p_partkey") != F.col("t.p_partkey")),
        )
        .where(
            (F.abs(F.length(F.col("s.p_name")) - F.length(F.col("t.p_name"))) <= TAU)
            & (F.col("s.p_name") != F.col("t.p_name"))
        )
        .withColumn("edit_dist", d2)
        .where((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= TAU))
        .select(
            F.least(F.col("s.p_partkey"), F.col("t.p_partkey")).alias("ka"),
            F.greatest(F.col("s.p_partkey"), F.col("t.p_partkey")).alias("kb"),
            F.when(sh_first, F.col("s.p_name")).otherwise(F.col("t.p_name")).alias("name_a"),
            F.when(sh_first, F.col("t.p_name")).otherwise(F.col("s.p_name")).alias("name_b"),
            "edit_dist",
        )
    )
    return (
        pairs_seg.unionByName(pairs_short)
        .select(
            F.col("ka").alias("key_a"),
            F.col("kb").alias("key_b"),
            "name_a",
            "name_b",
            F.col("edit_dist").cast("int").alias("edit_dist"),
        )
        .distinct()
    )


def main() -> None:
    from film_media_etl_spark.queries import all_queries

    spark = get_spark("pj4")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.1"]:
        for label, fn in (
            ("3seg", lambda: qs["ext_fuzzy_match_passjoin"](spark, sf_dir)),
            ("4seg", lambda: fuzzy_match_passjoin4(spark, sf_dir)),
        ):
            walls = []
            n = None
            for _ in range(2):
                t0 = time.perf_counter()
                n = fn().count()
                walls.append(time.perf_counter() - t0)
            print(f"{sf_dir} {label}: pairs={n} wall={min(walls):.2f}s")


if __name__ == "__main__":
    main()
