"""Recall-vs-cost sweep for the ANN tiers (round-5 verdict #6): measure
mean recall@5 against the exact brute-force top-5 AND wall time for a
grid of probe budgets, so the registered configs sit at a measured knee
instead of an arbitrary floor-clearing point.

Usage: python tools/ann_recall_sweep.py [SF_DIR]   (default sf0.1)

Prints one markdown table per tier (IVF / IVF-persisted / PQ / LSH) —
paste the chosen rows into README's ANN section. Uniform-random fixture
embeddings are the ANN worst case (no cluster structure), so these
recalls are a LOWER bound on real-corpus behavior.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from film_media_etl_spark.session import get_spark  # noqa: E402


def topk_sets(df) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["nbr_id"])
    return out


def recall(exact: dict, approx: dict) -> float:
    vals = [len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact]
    return sum(vals) / len(vals)


def timed(fn, reps: int = 3):
    best = None
    res = None
    for _ in range(reps):
        t0 = time.perf_counter()
        res = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return res, best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ann-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    from film_media_etl_spark.operators.ann_index import (
        build_ivf_index,
        probe_ivf_index,
    )
    from film_media_etl_spark.operators.similarity import (
        cosine_knn_bruteforce,
        cosine_knn_ivf,
        cosine_knn_lsh,
        cosine_knn_pq,
    )
    from film_media_etl_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact, t_bf = timed(lambda: topk_sets(cosine_knn_bruteforce(emb)))
    print(f"corpus={emb.count()} queries={len(exact)}  brute-force wall {t_bf:.2f}s\n")

    print("## IVF (inline, nlist=16)\n| nprobe | recall@5 | wall s |\n|---|---|---|")
    for nprobe in (4, 6, 8, 10, 12):
        approx, t = timed(lambda np=nprobe: topk_sets(cosine_knn_ivf(emb, nprobe=np)))
        print(f"| {nprobe} | {recall(exact, approx):.3f} | {t:.2f} |")

    print("\n## IVF persisted (nlist=16; probe wall only, build amortized)")
    idx = tempfile.mkdtemp(prefix="ivf_sweep_")
    t0 = time.perf_counter()
    build_ivf_index(emb, idx, nlist=16, seed=42)
    print(f"build wall {time.perf_counter() - t0:.2f}s")
    print("| nprobe | recall@5 | wall s |\n|---|---|---|")
    from pyspark.sql import functions as F

    queries = emb.where(F.col("vec_id") < 8)
    for nprobe in (4, 6, 8, 10, 12):
        approx, t = timed(
            lambda np=nprobe: topk_sets(
                probe_ivf_index(spark, idx, queries, k=5, nprobe=np)
            )
        )
        print(f"| {nprobe} | {recall(exact, approx):.3f} | {t:.2f} |")

    print("\n## PQ (m=8, codebook_k=16)\n| rerank | recall@5 | wall s |\n|---|---|---|")
    for rerank in (4, 8, 16, 32):
        approx, t = timed(lambda rr=rerank: topk_sets(cosine_knn_pq(emb, rerank=rr)))
        print(f"| {rerank} | {recall(exact, approx):.3f} | {t:.2f} |")

    print("\n## LSH (nplanes=4)\n| probe_hamming | recall@5 | wall s |\n|---|---|---|")
    for h in (1, 2, 3):
        approx, t = timed(
            lambda hh=h: topk_sets(cosine_knn_lsh(emb, probe_hamming=hh))
        )
        print(f"| {h} | {recall(exact, approx):.3f} | {t:.2f} |")


if __name__ == "__main__":
    main()
