"""Time individual queries solo, bench-style (noop sink, back-to-back
reps), with the bench's cal/shuf contention probes bracketing the run so
a reading taken on a noisy window is self-evidently noisy.

Usage: python tools/solo_time.py [-r REPS] query [query ...]

Prints one line per query: median, min, max over reps — report the MIN
when comparing before/after on this host (noise is one-sided; see
bench.py MIN_STAT rationale).
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-r", "--reps", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from bench import _calibration_sec, _shuffle_cal_sec

    from film_media_etl_spark.queries import all_queries
    from film_media_etl_spark.session import get_spark

    spark = get_spark("solo-time")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    # same warmup as bench.py
    qs["flagship_revenue_by_year"](spark, args.sf).write.mode("overwrite").format(
        "noop"
    ).save()
    cal_pre, shuf_pre = _calibration_sec(spark), _shuffle_cal_sec(spark)
    print(f"cal_pre={cal_pre} shuf_pre={shuf_pre}", flush=True)
    for name in args.names:
        samples = []
        for _ in range(args.reps):
            if name == "star_fact_sales":
                from film_media_etl_spark.etl import star

                star._STAR_CACHE.clear()
            t0 = time.perf_counter()
            qs[name](spark, args.sf).write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
        print(
            f"{name}: median={statistics.median(samples):.3f} "
            f"min={min(samples):.3f} max={max(samples):.3f} "
            f"samples={[round(s, 3) for s in samples]}",
            flush=True,
        )
    cal_post, shuf_post = _calibration_sec(spark), _shuffle_cal_sec(spark)
    print(f"cal_post={cal_post} shuf_post={shuf_post}", flush=True)


if __name__ == "__main__":
    main()
