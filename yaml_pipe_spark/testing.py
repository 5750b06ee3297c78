"""Oracle-parity harness mirroring the driver's CORRECTNESS check:
run a Spark query and its DuckDB oracle SQL on the same parquet tables and
compare row count + column names + order-insensitive values."""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from yaml_pipe_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_cell(v: Any) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "\\N"
        if v == int(v) and abs(v) < 1e15:
            # Preserve the sign of zero: the driver's hasher formats -0.0
            # and 0.0 differently, and collapsing both to "0" here masked a
            # real driver mismatch in round 3 (emb_covariance). Keeping the
            # sign distinct makes the local harness strictly at-least-as-
            # strict as the driver.
            if v == 0 and math.copysign(1.0, v) < 0:
                return "-0"
            return str(int(v))
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    df = df[sorted(df.columns)]
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns differ: spark={sc} oracle={oc}")
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if a != b:
        only_spark = [r for r in a if r not in set(b)][:5]
        only_oracle = [r for r in b if r not in set(a)][:5]
        problems.append(
            f"values differ; sample spark-only={only_spark} oracle-only={only_oracle}"
        )
    return problems


def check_query(spark, name: str, sf_dir: str) -> list[str]:
    from yaml_pipe_spark.entrypoints import REGISTRY

    qd = REGISTRY[name]
    spark_pdf = qd.fn(spark, sf_dir).toPandas()
    if qd.oracle is None:
        # mirror the driver's rows>0 smoke contract — an empty result from an
        # oracle-less query is a failure, not a vacuous pass
        return [] if len(spark_pdf) > 0 else ["rows-only query returned 0 rows"]
    con = duck_connection(sf_dir)
    oracle_pdf = con.sql(qd.oracle).df()
    return compare_frames(spark_pdf, oracle_pdf)
