#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is executed with a `noop` write so timing covers the full
distributed plan without driver-side materialization cost.

Noise handling: every round's single-pass numbers contained multi-second
co-tenant bursts that poisoned whichever queries they landed on (the burst
outliers differed per run and collapsed under solo repetition —
ROUND3_NOTES "Benchmark environment"). The harness therefore runs
SPARK_GRAFT_BENCH_REPS (default 3) full passes, INTERLEAVED (pass-by-pass,
not back-to-back per query, so one burst can poison at most one pass for
any query) and reports the per-query MIN — the closest observable to the
steady-state plan cost on a shared box.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window, functions as F

from yaml_pipe_spark.entrypoints import REGISTRY
from yaml_pipe_spark.session import get_spark


def _stat_snapshot():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:9]]
    idle = vals[3] + vals[4]  # idle + iowait
    return sum(vals) - idle, sum(vals)


def _load_probe(window_sec: float = 0.5) -> dict:
    """Co-tenant load snapshot (VERDICT r10 ask #4): a uniformly inflated
    bench record (every round's driver tail so far) must be MACHINE-
    distinguishable from a plan regression. Sampled while THIS process is
    deliberately idle — busy_frac is the whole-box /proc/stat busy
    fraction over a short sleep window, so it measures the co-tenants,
    not the bench itself; loadavg1 adds the 1-minute trend. The adopted
    noise rule lives in PERF.md round 11 (busy_frac > 0.5 or
    loadavg1 > ncpu/2 on either side of the run => co-tenant-inflated,
    don't gate plan decisions on the record)."""
    probe: dict = {"ncpu": os.cpu_count()}
    try:
        probe["loadavg1"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    try:
        b0, t0 = _stat_snapshot()
        time.sleep(window_sec)
        b1, t1 = _stat_snapshot()
        if t1 > t0:
            probe["busy_frac"] = round((b1 - b0) / (t1 - t0), 4)
    except (OSError, ValueError, IndexError):
        pass
    return probe


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    probe_pre = _load_probe()
    # Settle-wait (VERDICT r12 ask #7): the driver's bench can start on a
    # box still draining judge/builder tail load (r12 record started at
    # loadavg1 6.94/32) — that inflates the FIRST pass and, for any query
    # whose min lands there, the record. If the pre-probe shows a busy box,
    # wait for the load to drain (bounded, default 120 s) and re-probe;
    # both probes plus the wait are recorded so the record stays auditable.
    settle_budget = float(os.environ.get("SPARK_GRAFT_SETTLE_SEC", "120"))
    settle_load = float(os.environ.get("SPARK_GRAFT_SETTLE_LOAD", "2.0"))
    settled_for = 0.0
    while (
        settled_for < settle_budget
        and probe_pre.get("loadavg1", 0.0) > settle_load
    ):
        time.sleep(10.0)
        settled_for += 10.0
        probe_pre = _load_probe()
    if settled_for:
        probe_pre["settled_sec"] = settled_for
    spark = get_spark("yaml-pipe-spark-bench")

    # Warm-up: the first queries in sorted order would otherwise be charged
    # for one-time session infrastructure — JVM/codegen JIT, the Python
    # worker pool + Arrow serialization path (several registered queries use
    # pandas UDFs), and the shuffle/window machinery. Touch each once on
    # trivial data so per-query timings measure the QUERY, not session boot.
    spark.range(1000).selectExpr("sum(id)").collect()
    import pandas as _pd

    def _warm(it):
        for b in it:
            yield b

    (
        spark.range(100)
        .mapInPandas(_warm, "id long")
        .groupBy((F.col("id") % 4).alias("k"))
        .agg(F.count("*"))
        .collect()
    )
    (
        spark.range(100)
        .select("id", F.row_number().over(
            Window.partitionBy(F.col("id") % 4).orderBy("id")).alias("rn"))
        .join(spark.range(50), "id")
        .collect()
    )

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    for _ in range(reps):
        for name in sorted(REGISTRY):
            fn = REGISTRY[name].fn
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            t = round(time.perf_counter() - t0, 3)
            if name not in timings or t < timings[name]:
                timings[name] = t

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "load_probe": {"pre": probe_pre, "post": _load_probe()},
        # n_queries grows round over round as operators land — compare
        # totals across rounds per shared query (the "queries" map),
        # not by the raw total
        "n_queries": len(timings),
        "reps": reps,
        "queries": timings,
        "sf": sf,
    }
    # The full record (every query's timing) goes to BENCH_SELF.json —
    # the driver's capture keeps only the LAST 2000 chars of stdout, so a
    # 229-query map printed inline is truncated mid-way and the driver
    # records parsed=null (every BENCH_r01..r11). Per VERDICT r11 ask #3,
    # stdout gets ONE compact JSON line (<2000 chars): the headline
    # metric, the 10 slowest queries, and a sha256 of the full sorted map
    # so the printed line is verifiably a digest of BENCH_SELF.json.
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_SELF.json"), "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
    except OSError:
        pass  # the printed line remains the contract
    import hashlib

    full_map_json = json.dumps(timings, sort_keys=True)
    slowest = dict(
        sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    )
    compact = dict(payload)
    compact["queries"] = slowest
    compact["queries_note"] = "10 slowest of n_queries; full map in BENCH_SELF.json"
    compact["queries_sha256"] = hashlib.sha256(
        full_map_json.encode()
    ).hexdigest()
    # The driver keeps only the last ~2000 stdout chars — the line MUST fit.
    # Never crash here (the full record is already in BENCH_SELF.json):
    # shrink the slowest-queries map entry by entry until the line fits.
    line = json.dumps(compact)
    while len(line) >= 1900 and compact["queries"]:
        compact["queries"].popitem()
        compact["queries_note"] = (
            f"{len(compact['queries'])} slowest of n_queries (trimmed to fit"
            " the driver's stdout window); full map in BENCH_SELF.json"
        )
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
