"""Record the 1x -> 10x scale-growth table for PERF.md.

Usage: python scripts/scale_growth.py [n_small n_big]
Prints one JSON line per family plus a PERF.md-ready markdown table.
"""

from __future__ import annotations

import json
import sys
import tempfile

from pyspark.sql import SparkSession


def main() -> None:
    sizes = (
        (int(sys.argv[1]), int(sys.argv[2]))
        if len(sys.argv) == 3
        else (5000, 50000)
    )
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scale-growth")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from yaml_pipe_spark.scalebench import run_scale_growth

    with tempfile.TemporaryDirectory() as tmp:
        out = run_scale_growth(spark, tmp, sizes=sizes)
    print(json.dumps(out))
    print()
    print("| family | t(%dk) | t(%dk) | rows %dk -> %dk | alpha |" % (
        sizes[0] // 1000, sizes[1] // 1000, sizes[0] // 1000,
        sizes[1] // 1000))
    print("|---|---|---|---|---|")
    for name, r in out.items():
        print(
            f"| {name} | {r['t_small']} s | {r['t_big']} s | "
            f"{r['rows_small']} -> {r['rows_big']} | {r['alpha']} |"
        )


if __name__ == "__main__":
    main()
