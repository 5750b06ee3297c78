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
    first run processes everything, sources.py:266-268)."""
    if last_run_ts is None:
        return df
    return df.filter(F.col(ts_col) > F.lit(last_run_ts).cast("timestamp"))


def first_col_as_content(df: DataFrame, source_uri: str) -> DataFrame:
    """Positional projection: first column (cast to string) -> `content`,
    remaining columns kept as metadata, constant `source` column added."""
    first, *rest = df.columns
    return df.select(
        F.col(first).cast("string").alias("content"),
        *rest,
        F.lit(source_uri).alias("source"),
    )


def jdbc_source(
    spark,
    url: str,
    query: str,
    ts_col: str = "updated_at",
    last_run_ts: str | None = None,
    properties: dict | None = None,
) -> DataFrame:
    """The real connector: JDBC subquery pushdown + safe cursor predicate.
    Catalyst pushes the filter into the database scan. Untested in this
    container (no database); semantics covered via the helpers above."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    df = reader.load()
    return first_col_as_content(
        incremental_by_timestamp(df, ts_col, last_run_ts), url
    )
