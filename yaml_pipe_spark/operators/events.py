"""Event/time-series operators: tumbling windows, sessionization, JSON props.

The reference has no streaming/time-series surface (SURVEY §1.5/§2.9); these
back the events table semantics (FIXTURES.md §4) and are the batch twins of
the Structured Streaming mode in yaml_pipe_spark.streaming — identical
logical plans, so correctness established here transfers to the stream.

Scale notes: tumbling agg is one shuffle on (window, key) with map-side
partial aggregation; sessionization is one shuffle on user_id with two
narrow window passes (lag + running sum) inside each partition — the
classic gaps-and-islands plan, no self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
) -> DataFrame:
    """Per (tumbling window, key): count + sum(value). Window start aligns to
    the epoch in UTC — identical to DuckDB's time_bucket."""
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the gap to
    the previous event of the same user exceeds `gap_minutes`. Returns one
    row per session: (user_id, session_seq, session_start, session_end,
    n_events, sum_value)."""
    order = [F.col(ts_col), F.col(id_col)]
    w = W.partitionBy(user_col).orderBy(*order)
    gap_us = gap_minutes * 60 * 1_000_000
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    is_new = (
        prev_us.isNull()
        | ((F.unix_micros(F.col(ts_col)) - prev_us) > gap_us)
    ).cast("long")
    w_run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    with_sess = df.withColumn("__new", is_new).withColumn(
        "session_seq", F.sum("__new").over(w_run)
    )
    return with_sess.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def extract_prop(df: DataFrame, props_col: str = "props", key: str = "k"):
    """Portable JSON-ish scalar extraction via regex (works identically in
    Spark and DuckDB without JSON extensions): integer value of `key`."""
    pat = f'"{key}":\\s*([0-9]+)'
    return F.regexp_extract(F.col(props_col), pat, 1).cast("long")
