"""CLI: run the engine as a product.

    python -m film_media_etl_spark list
    python -m film_media_etl_spark run <query> [--sf-dir DIR] [--limit N]
    python -m film_media_etl_spark etl [--sf-dir DIR] [--out DIR]
    python -m film_media_etl_spark explain <query> [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="film_media_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    run = sub.add_parser("run", help="run one query and print rows")
    run.add_argument("query")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("--limit", type=int, default=20)

    etl = sub.add_parser("etl", help="build the star warehouse")
    etl.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    ex = sub.add_parser("explain", help="print a query's physical plan")
    ex.add_argument("query")
    ex.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    args = p.parse_args(argv)

    from .queries import all_oracles, all_queries

    if args.cmd == "list":
        oracles = all_oracles()
        for name in sorted(all_queries()):
            print(f"{name}\t{'oracle' if name in oracles else 'rows-only'}")
        return 0

    from .session import get_spark

    spark = get_spark("fmes-cli")
    if args.cmd == "run":
        qs = all_queries()
        if args.query not in qs:
            print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
            return 2
        qs[args.query](spark, args.sf_dir).show(args.limit, truncate=False)
        return 0
    if args.cmd == "explain":
        qs = all_queries()
        if args.query not in qs:
            print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
            return 2
        qs[args.query](spark, args.sf_dir).explain("formatted")
        return 0
    if args.cmd == "etl":
        from .etl.star import build_star

        tables = build_star(spark, args.sf_dir)
        for name, df in tables.items():
            print(f"{name}: {df.count()} rows")
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
