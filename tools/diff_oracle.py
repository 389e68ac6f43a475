"""Diff a queries() entry against its oracle_sql() cell-by-cell.

Replicates the driver's t2 comparison shape (sort columns by name, sort rows,
order-insensitive value compare) but instead of hashing, prints the first N
differing cells so the root cause of a hash mismatch is visible.

Usage: python tools/diff_oracle.py [--sf DIR] q1 q2 ...
       python tools/diff_oracle.py --all      # every query with an oracle
"""

from __future__ import annotations

import argparse
import math
import os
import sys
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    """Canonicalize a cell the way a value-hash plausibly would."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v)
    return str(v)


def rows_to_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--ncell", type=int, default=8)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as ent
    from film_media_etl_spark.session import get_spark

    spark = get_spark()
    qs = ent.queries()
    oracles = ent.oracle_sql()
    names = args.names or (sorted(n for n in qs if n in oracles) if args.all else [])

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_bad = 0
    for name in names:
        if name not in oracles:
            print(f"{name}: NO ORACLE (rows-only)")
            continue
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            n_bad += 1
            continue
        sc, sv = rows_to_canon(scols, srows)
        oc, ov = rows_to_canon(ocols, orows)
        if sc != oc:
            print(f"{name}: COLUMN MISMATCH spark={sc} oracle={oc}")
            n_bad += 1
            continue
        if len(sv) != len(ov):
            print(f"{name}: ROWCOUNT {len(sv)} vs {len(ov)}")
            n_bad += 1
            continue
        diffs = []
        for i, (a, b) in enumerate(zip(sv, ov)):
            if a != b:
                for j, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        diffs.append((i, sc[j], x, y))
                if len(diffs) >= args.ncell:
                    break
        if diffs:
            n_bad += 1
            print(f"{name}: {len(diffs)}+ value diffs (of {len(sv)} rows)")
            for i, colname, x, y in diffs[: args.ncell]:
                print(f"    row {i} col {colname}: spark={x!r} oracle={y!r}")
        else:
            print(f"{name}: OK ({len(sv)} rows)")
    print(f"\n{n_bad} queries with diffs")


if __name__ == "__main__":
    main()
