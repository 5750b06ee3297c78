"""SparkSession factory with scale-aware defaults.

Local-mode testing uses local[$SPARK_GRAFT_CPUS]; the config choices are the
ones that transfer to a 1000-executor cluster:

- AQE on (runtime coalescing, skew-join splitting) so the same plan survives
  a 100x scale-up without re-tuning shuffle partition counts by hand.
- shuffle.partitions sized to cores locally; on a real cluster AQE's
  coalescePartitions makes the initial number mostly irrelevant.
- UTC session timezone so timestamp semantics match the DuckDB oracle
  (duckdb timestamps are UTC-naive).
- Arrow enabled: every pandas_udf / mapInPandas boundary is Arrow-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "yaml-pipe-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # delete-by-source idempotency (reference sinks.py:65-80) becomes a
        # dynamic partition overwrite instead of a table rewrite:
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def spread_for_expansion(df):
    """Round-robin repartition a DataFrame to full parallelism IFF it is
    under-partitioned (e.g., a small compressed parquet arriving as one scan
    split) — the guard keeps well-partitioned cluster-scale inputs
    shuffle-free while rescuing the pathological case where a cheap scan
    feeds an expensive expansion (token/shingle explode) on one core.

    Partitioning is probed via `inputFiles()` (logical-plan file listing):
    unlike the previous `df.rdd.getNumPartitions()`, this never forces
    physical planning + RDD DAG conversion on the driver. The file count
    under-estimates splits for huge files (one file > maxPartitionBytes
    scans as many tasks), but the rescue only FIRES when the count is
    small, which is exactly the small-files case it exists for. Frames
    with no file lineage (in-memory test frames, post-shuffle results)
    are left alone — parallelize/shuffle already spread them."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df
    if 0 < n_files * 2 <= par:
        return df.repartition(par)
    return df
