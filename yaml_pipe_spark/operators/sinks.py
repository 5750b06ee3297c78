"""Sinks — idempotent partitioned writes (SURVEY §2.6).

Reference behavior to preserve: re-running a pipeline over the same sources
must not duplicate rows. LanceDB/Chroma sinks get this by DELETE-ing every
source in the batch before inserting (components/sinks.py:65-80,128-140 —
a string-interpolated delete). Here the corpus table is parquet partitioned
by `source`, and the delete-then-insert becomes a dynamic partition
overwrite: only the partitions present in the batch are replaced, atomically
per partition, no table rewrite. Schema widening that the reference handles
by copy-the-whole-table (sinks.py:40-48) is a mergeSchema read option
instead.

At 100 TB: partition-by-source keeps re-ingestion cost proportional to the
changed sources, not the table; readers prune partitions on source filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class BucketedTable:
    """Bucketed+sorted managed table: pre-shuffled storage for co-located
    joins and aggregations.

    Writing with bucketBy(n, key).sortBy(key) hash-partitions rows into `n`
    buckets at write time; two tables bucketed the same way join WITHOUT a
    shuffle (SortMergeJoin with no Exchange on either side — asserted in
    tests/test_pipeline.py). This is the 100 TB answer for fact-fact joins
    that recur on the same key (orders ⋈ lineitem every run): pay the
    shuffle once at ingest, never again at query time. The reference has no
    equivalent (single-node, SURVEY §4); this generalizes its
    partition-per-source layout to join-key layout.
    """

    def __init__(self, name: str, bucket_key: str, n_buckets: int = 8):
        self.name = name
        self.bucket_key = bucket_key
        self.n_buckets = n_buckets

    def write(self, df: DataFrame) -> None:
        (
            df.write.mode("overwrite")
            .bucketBy(self.n_buckets, self.bucket_key)
            .sortBy(self.bucket_key)
            .format("parquet")
            .saveAsTable(self.name)
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.table(self.name)


class ParquetSink:
    """Partitioned, idempotently-overwritable corpus table."""

    def __init__(self, path: str, partition_by: str = "source"):
        self.path = path
        self.partition_by = partition_by

    def write(self, df: DataFrame) -> None:
        (
            df.sparkSession.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
        )
        (
            df.write.mode("overwrite")
            .partitionBy(self.partition_by)
            .parquet(self.path)
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("mergeSchema", "true").parquet(self.path)

    def test_connection(self, spark: SparkSession) -> None:
        """S5-style cheap probe: the path is creatable/readable."""
        import os

        parent = os.path.dirname(os.path.abspath(self.path)) or "."
        if not os.path.isdir(parent):
            raise FileNotFoundError(f"sink parent directory missing: {parent}")
