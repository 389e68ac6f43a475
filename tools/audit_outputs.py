"""Audit every oracle-checked query's OUTPUT for driver-boundary hazards.

Two classes (see queries/registry.py and .claude/skills/verify/SKILL.md):
1. Types that the two engines' dataframe bridges render differently even
   for identical values: DECIMAL, ARRAY/STRUCT/MAP (checked statically by
   tests/test_registry_contract.py via oracle DESCRIBE).
2. NULLs in int/timestamp/date/bool/double columns: pandas coerces
   nullable ints to float64 ("15000.0" vs "15000") and null doubles to
   NaN (vs DuckDB None). This script EXECUTES each query at the given sf
   and reports columns that actually contain NULLs — fix by sentinel +
   indicator flag (grep 'queries/registry.py' in the query modules for
   the pattern).

Usage: python tools/audit_outputs.py [--sf /root/testdata/sf0.001]
Exit code 1 if any offender is found.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RISKY = (
    "int", "bigint", "smallint", "tinyint",
    "timestamp", "timestamp_ntz", "timestamp_ltz",
    "date", "boolean", "double", "float",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    import __spark_entry__ as ent
    from pyspark.sql import functions as F

    from film_media_etl_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = ent.queries(), ent.oracle_sql()
    offenders = 0
    for name, fn in qs.items():
        if name not in oracles:
            continue  # rows-only checks don't hash values
        try:
            df = fn(spark, args.sf)
            target = [c for c, t in df.dtypes if t in RISKY]
            if not target:
                continue
            agg = df.select(
                [F.sum(F.col(c).isNull().cast("int")).alias(f"n{i}") for i, c in enumerate(target)]
            ).first()
            nulls = {c: agg[f"n{i}"] for i, c in enumerate(target) if agg[f"n{i}"]}
            if nulls:
                offenders += 1
                print(f"NULLS {name}: {nulls}")
        except Exception as e:  # noqa: BLE001
            offenders += 1
            print(f"ERR {name}: {type(e).__name__}: {str(e)[:100]}")
    print(f"{offenders} offenders")
    return 1 if offenders else 0


if __name__ == "__main__":
    sys.exit(main())
