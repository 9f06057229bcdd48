#!/usr/bin/env python
"""Targeted oracle verification for a comma-separated list of queries.

    python tools/verify_some.py --queries d_ngram_jaccard,d_simhash \
        [--sf /root/testdata/sf0.01]

Runs each named query through the driver-contract surface and compares
rows+schema+hash against its DuckDB oracle (tests/oracle_harness.compare)
— the per-change equivalence proof the optimization rounds require
before a rewrite lands (full-registry sweeps stay on the verify skill).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as E
    from oem_gateway_spark import get_spark
    from oracle_harness import compare

    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    spark = get_spark(
        app_name="verify-some",
        extra_conf={"spark.sql.shuffle.partitions": "16"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )
    qs, oracles = E.queries(), E.oracle_sql()
    unknown = set(names) - qs.keys()
    if unknown:
        sys.exit(f"not in queries(): {sorted(unknown)}")
    n_bad = 0
    for name in names:
        sdf = qs[name](spark, args.sf).toPandas()
        if name not in oracles:
            print(f"{name} rows-only: {len(sdf)}", flush=True)
            continue
        errs = compare(sdf, con.sql(oracles[name]).df(), name)
        if errs:
            n_bad += 1
            print(f"{name} MISMATCH {errs[:2]}", flush=True)
        else:
            print(f"{name} MATCH ({len(sdf)} rows)", flush=True)
    print(f"n_bad={n_bad}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
