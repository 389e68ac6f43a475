"""Run EVERY registered query against zero-row copies of the testdata
tables and report raisers. The engine contract: empty input yields an
empty (or constant-row, e.g. dim_location's Unknown fallback) result,
never an exception — the behavior empty partitions / fresh warehouses /
filtered-to-nothing upstreams hit at scale.

tests/test_empty_inputs.py pins the previously-failing subset in the
suite; this sweep is the full-registry version (a few minutes of wall).

Usage: python tools/empty_sweep.py
"""

from __future__ import annotations

import os
import sys
import tempfile

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from film_media_etl_spark.queries import all_queries  # noqa: E402
from film_media_etl_spark.session import get_spark  # noqa: E402
from film_media_etl_spark.sources import TABLES  # noqa: E402


def main() -> int:
    src = os.environ.get("SPARK_GRAFT_SF_SRC", "/root/testdata/sf0.001")
    dst = tempfile.mkdtemp(prefix="sf_empty_")
    for t in TABLES:
        tb = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pq.write_table(tb.slice(0, 0), os.path.join(dst, f"{t}.parquet"))

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    fails: dict[str, str] = {}
    qs = all_queries()
    for name, fn in qs.items():
        try:
            fn(spark, dst).count()
        except Exception as e:  # noqa: BLE001 — report, don't mask
            fails[name] = repr(e)[:200]
    print(f"{len(fails)} failures of {len(qs)}")
    for k, v in fails.items():
        print(f"  {k}: {v}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
