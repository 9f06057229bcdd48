"""Command-line runner: list, run, explain, or show the oracle for any
suite query — plus an ad-hoc SQL front door.

    python -m oem_gateway_spark list [prefix]
    python -m oem_gateway_spark run <query> [--sf DIR] [--limit N] [--out PATH]
    python -m oem_gateway_spark explain <query> [--sf DIR]
    python -m oem_gateway_spark oracle <query>
    python -m oem_gateway_spark sql "SELECT ..." [--sf DIR] [--limit N] [--out PATH]

``run`` prints up to ``--limit`` rows (default 20) or, with ``--out``,
writes the full result as parquet — the batch-engine front door for a user
coming from the reference gateway's scripted queries.  ``sql`` registers
every catalog table (region nation customer supplier part orders lineitem
events documents embeddings) as a temp view and runs arbitrary Spark SQL
against them — the other half of that front door.
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m oem_gateway_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registered queries")
    lp.add_argument("prefix", nargs="?", default="", help="name prefix filter")

    for name in ("run", "explain"):
        rp = sub.add_parser(name)
        rp.add_argument("query")
        rp.add_argument("--sf", default="/root/testdata/sf0.01", help="table dir")
        if name == "run":
            rp.add_argument("--limit", type=int, default=20)
            rp.add_argument("--out", default=None, help="write parquet here")

    op = sub.add_parser("oracle", help="print the DuckDB oracle SQL")
    op.add_argument("query")

    sp = sub.add_parser("sql", help="run ad-hoc Spark SQL over the catalog views")
    sp.add_argument("statement")
    sp.add_argument("--sf", default="/root/testdata/sf0.01", help="table dir")
    sp.add_argument("--limit", type=int, default=20)
    sp.add_argument("--out", default=None, help="write parquet here")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from oem_gateway_spark.suite import REGISTRY

    if args.cmd == "sql":
        from oem_gateway_spark import get_spark
        from oem_gateway_spark.catalog import register_views

        spark = get_spark(app_name="oem-gateway-spark:sql")
        register_views(spark, args.sf)
        df = spark.sql(args.statement)
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        else:
            df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "list":
        for name, spec in REGISTRY.items():
            if name.startswith(args.prefix):
                kind = "oracle" if spec.oracle else "rows-only"
                print(f"{name:32s} [{kind}] {spec.fn.__doc__.splitlines()[0]}")
        return 0

    if args.query not in REGISTRY:
        print(f"unknown query {args.query!r}; try: python -m oem_gateway_spark list",
              file=sys.stderr)
        return 2
    spec = REGISTRY[args.query]

    if args.cmd == "oracle":
        if spec.oracle is None:
            print(f"{args.query} has no SQL oracle (rows-only check)",
                  file=sys.stderr)
            return 1
        print(spec.oracle)
        return 0

    from oem_gateway_spark import get_spark
    from oem_gateway_spark.operators.dedup import release_caches

    spark = get_spark(app_name=f"oem-gateway-spark:{args.query}")
    df = spec.fn(spark, args.sf)
    if args.cmd == "explain":
        df.explain("formatted")
        return 0
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.limit, truncate=False)
    release_caches(df)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
