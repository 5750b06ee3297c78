#!/usr/bin/env python
"""Drive the driver contract (the .claude/skills/verify recipe) over a
subset of queries: `python scripts/verify_queries.py [--sf DIR] [--prefix N]
[name ...]`. No names and no --prefix = the full registry."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--prefix", type=int, default=0)
    ap.add_argument("--entry", action="store_true", help="smoke entry() too")
    args = ap.parse_args()

    import __spark_entry__ as e
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if args.entry:
        df = e.entry(spark)
        print("ENTRY rows:", len(df.collect()), df.columns)
    qs, osql = e.queries(), e.oracle_sql()
    if args.prefix:
        names = list(qs)[: args.prefix]
    elif args.names:
        unknown = [n for n in args.names if n not in qs]
        if unknown:
            print("unknown queries:", unknown)
            return 2
        names = args.names
    else:
        names = list(qs)

    from yaml_pipe_spark.testing import duck_connection, compare_frames

    con = duck_connection(args.sf)
    bad = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            pdf = qs[name](spark, args.sf).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"{name} ERROR {type(ex).__name__}: {ex}")
            bad += 1
            continue
        dt = round(time.perf_counter() - t0, 1)
        if name in osql:
            probs = compare_frames(pdf, con.sql(osql[name]).df())
            print(
                name, len(pdf),
                "MATCH" if not probs else f"MISMATCH {probs}", f"{dt}s",
            )
            bad += bool(probs)
        else:
            print(name, len(pdf), "(rows-only)", f"{dt}s")
    print("FAILURES:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
