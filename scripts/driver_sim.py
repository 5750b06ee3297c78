"""Full driver simulation: ENTRY smoke at sf0.001, then every queries()
entry vs its oracle_sql() twin at the given SF (default sf0.01), the way
the round driver does (.claude/skills/verify/SKILL.md).

Usage: python scripts/driver_sim.py [sf_dir] [master] [only,names]
Prints one line per query and a final FAILURES count.
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import __spark_entry__ as e  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    master = sys.argv[2] if len(sys.argv) > 2 else "local[8]"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    parts = master.split("[")[1].rstrip("]")
    spark = (
        SparkSession.builder.master(master)
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", parts if parts != "*" else "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = e.entry(spark)
    print("ENTRY rows:", len(df.collect()), df.columns, flush=True)

    qs, osql = e.queries(), e.oracle_sql()
    from yaml_pipe_spark.testing import duck_connection, compare_frames

    con = duck_connection(sf)
    bad = 0
    for name in qs:
        if only is not None and name not in only:
            continue
        t0 = time.time()
        try:
            pdf = qs[name](spark, sf).toPandas()
            if name in osql:
                probs = compare_frames(pdf, con.sql(osql[name]).df())
                status = "MATCH" if not probs else f"MISMATCH {probs}"
                bad += bool(probs)
            else:
                status = "(rows-only)"
            print(
                f"{name} {len(pdf)} {status} [{time.time() - t0:.1f}s]",
                flush=True,
            )
        except Exception:
            bad += 1
            print(f"{name} ERROR [{time.time() - t0:.1f}s]", flush=True)
            traceback.print_exc()
    print("FAILURES:", bad, flush=True)


if __name__ == "__main__":
    main()
