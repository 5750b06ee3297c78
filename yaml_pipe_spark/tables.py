"""Loaders for the driver-generated parquet tables (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to session-zoned TIMESTAMP.

    The driver regenerates the parquet tables between rounds and the writer's
    timestamp annotation has varied: round 1-2 data carried TIMESTAMP(NANOS),
    round 3 data is tz-naive micros, which Spark 4 reads as TIMESTAMP_NTZ
    (spark.sql.parquet.inferTimestampNTZ.enabled defaults to true). All query
    code and the DuckDB oracles assume plain TIMESTAMP under a UTC session
    zone (duckdb timestamps are UTC-naive), so normalize here: the NTZ ->
    TIMESTAMP cast reinterprets the wall-clock value in the session zone,
    an identity on the stored micros when that zone is UTC.
    """
    for name, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table, normalizing timestamp physical types.

    `events.ts` has been TIMESTAMP(NANOS) in some driver generations, which
    Spark's parquet reader rejects by default — read nanos as long and
    truncate to microseconds (integer div: double division would lose
    precision at nano-epoch magnitudes), matching DuckDB's nanos->micros
    truncation so oracle comparisons agree. Other generations store tz-naive
    micros; `_normalize_timestamps` handles that case.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _normalize_timestamps(df)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _normalize_timestamps(df)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}
