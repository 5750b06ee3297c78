"""Relational-source semantics (reference S4: PostgreSQLSource).

Reference (components/sources.py:237-308): run a user SQL query against
PostgreSQL; the FIRST column of each row becomes Document.content, remaining
columns become metadata (sources.py:284-288, documented contract at
pipelines/pipeline_postgres.yaml:9); an incremental predicate
`timestamp_column > last_run_ts` is appended to the query by string concat
(sources.py:266-272 — SQL-injectable; here it is a Column predicate, safe by
construction); `source` is set to the connection URI (sources.py:289-291).

On Spark the real connector is spark.read.jdbc — Catalyst pushes the cursor
predicate down to the database. These helpers implement the semantics
(positional projection + cursor filter) independently of the connector so
they are oracle-checkable on any DataFrame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def incremental_by_timestamp(
    df: DataFrame, ts_col: str, last_run_ts: str | None
) -> DataFrame:
    """Keep rows with ts_col > last_run_ts (no-op cursor when None —
    first run processes everything, sources.py:266-268).

    The literal is cast to the COLUMN's own timestamp type (ntz vs ltz):
    a mismatched literal makes Spark wrap the column in a cast, which
    blocks predicate pushdown into the scan/database — the whole point of
    the cursor."""
    if last_run_ts is None:
        return df
    ts_type = df.schema[ts_col].dataType
    return df.filter(F.col(ts_col) > F.lit(last_run_ts).cast(ts_type))


def first_col_as_content(df: DataFrame, source_uri: str) -> DataFrame:
    """Positional projection: first column (cast to string) -> `content`,
    remaining columns kept as metadata, constant `source` column added."""
    first, *rest = df.columns
    return df.select(
        F.col(first).cast("string").alias("content"),
        *rest,
        F.lit(source_uri).alias("source"),
    )


def jdbc_options(
    url: str,
    query: str,
    properties: dict | None = None,
    fetchsize: int = 10_000,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: str | int | None = None,
    upper_bound: str | int | None = None,
) -> dict[str, str]:
    """The full JDBC reader option map, as a pure (contract-testable)
    function — the part of the connector that CAN be verified without a
    database (tests/test_connectors.py).

    Contract points:
    - the user query goes through the `query` option verbatim — the cursor
      predicate is NEVER string-concatenated into the SQL (the reference
      interpolates it, sources.py:266-272, which is SQL-injectable; here
      incremental_by_timestamp applies a Column filter that Catalyst pushes
      into the database scan);
    - `fetchsize` defaults high (row-at-a-time JDBC cursors are the classic
      single-node bottleneck);
    - passing partition_column/num_partitions/bounds turns the read into N
      parallel range-partitioned queries — the 100 TB path for big tables;
      all four must be set together.
    """
    opts: dict[str, str] = {
        "url": url,
        "query": query,
        "fetchsize": str(fetchsize),
    }
    part = (partition_column, num_partitions, lower_bound, upper_bound)
    if any(v is not None for v in part):
        if any(v is None for v in part):
            raise ValueError(
                "partitioned JDBC reads need all of partition_column, "
                "num_partitions, lower_bound, upper_bound"
            )
        # Spark's JDBC source forbids `query` + partitionColumn; the query
        # becomes a derived-table dbtable instead (same pushdown).
        opts.pop("query")
        opts["dbtable"] = f"({query}) yaml_pipe_sub"
        opts["partitionColumn"] = str(partition_column)
        opts["numPartitions"] = str(num_partitions)
        opts["lowerBound"] = str(lower_bound)
        opts["upperBound"] = str(upper_bound)
    for k, v in (properties or {}).items():
        opts[str(k)] = str(v)
    return opts


def jdbc_source(
    spark,
    url: str,
    query: str,
    ts_col: str = "updated_at",
    last_run_ts: str | None = None,
    properties: dict | None = None,
    **partition_kwargs,
) -> DataFrame:
    """The real connector: JDBC subquery pushdown + safe cursor predicate.
    Catalyst pushes the filter into the database scan. Untestable against a
    live database in this container; the option map it passes to the reader
    is contract-tested via jdbc_options."""
    reader = spark.read.format("jdbc").options(
        **jdbc_options(url, query, properties, **partition_kwargs)
    )
    df = reader.load()
    return first_col_as_content(
        incremental_by_timestamp(df, ts_col, last_run_ts), url
    )
