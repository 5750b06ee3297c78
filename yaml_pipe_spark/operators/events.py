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


def hopping_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Per (hopping window, key): count + sum(value). Each event lands in
    window/slide overlapping windows (F.window with slideDuration explodes the
    row window/slide times before the partial agg — still one shuffle on
    (window, key))."""
    return (
        df.groupBy(
            F.window(F.col(ts_col), window, slide).alias("w"), F.col(key_col)
        )
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


def asof_join_last_prior(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    right_prefix: str = "matched",
) -> DataFrame:
    """As-of join: for each `left` row, the latest `right` row of the same
    `on` key with right.ts <= left.ts (ties: the right row wins, i.e.
    prior-or-equal).

    Implemented as the union-and-carry-forward plan, NOT a range self-join:
    tag both sides, union, and carry the last right id/ts forward with one
    window over (key, ts). One shuffle on the key, linear in rows — this is
    the shape that survives 100 TB, where a ts-range join would be quadratic
    per key. Rows with no prior match keep NULLs (like a left join).
    """
    l = left.select(
        F.col(on), F.col(ts_col), F.col(id_col), F.lit(1).alias("__side")
    )
    r = right.select(
        F.col(on), F.col(ts_col), F.col(id_col), F.lit(0).alias("__side")
    )
    u = l.unionByName(r)
    # right rows sort before left rows at equal ts so prior-or-equal matches
    w = (
        W.partitionBy(on)
        .orderBy(F.col(ts_col), F.col("__side"), F.col(id_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    right_id = F.when(F.col("__side") == 0, F.col(id_col))
    right_ts = F.when(F.col("__side") == 0, F.col(ts_col))
    out = (
        u.withColumn(f"{right_prefix}_{id_col}", F.last(right_id, True).over(w))
        .withColumn(f"{right_prefix}_{ts_col}", F.last(right_ts, True).over(w))
        .filter(F.col("__side") == 1)
    )
    return out.select(
        id_col, on, ts_col, f"{right_prefix}_{id_col}", f"{right_prefix}_{ts_col}"
    )


def time_weighted_avg(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    unit_dp: int | None = None,
    out_dp: int = 4,
) -> DataFrame:
    """Per-key time-weighted average via applyInPandas (grouped-map UDF).

    Each value holds until the key's next event (order: ts, then id_col as
    the deterministic tiebreak); the last event gets weight 0, so
    twa = sum(value_i * dt_i) / sum(dt_i) over consecutive gaps.
    Single-event keys fall back to the last value.

    With `unit_dp=None` the value is returned unrounded — callers round
    engine-side (Python round() is banker's rounding and would diverge
    from SQL ROUND on boundaries). With `unit_dp=d` the value column is
    treated as a d-dp grid value (e.g. cents for d=2) and the TWA is
    computed over EXACT integer units, floor-quantized at `out_dp`
    (round-10 hazard sweep): sum(unit*dt)/sum(dt) is a ratio of integers,
    so a half-up round at out_dp has REACHABLE ties where engine round
    paths disagree — floor of the identical double has no tie to break.
    The quantize step is floor(float(num) * 10^(out_dp-unit_dp) /
    float(den)) / 10^out_dp, the exact op sequence the window twin and
    the SQL oracle perform, so all three produce bit-identical doubles.

    This operator exists to exercise the grouped-map surface (one Arrow
    batch per key group, pandas inside) — the same math is SQL-expressible
    with lead() windows, which is exactly what makes it oracle-checkable
    unlike most Python UDFs. One shuffle on the key; group size bounds
    worker memory (a key's whole history must fit one pandas frame — for
    unbounded keys use the window formulation instead).
    """
    import math

    import pandas as pd

    def twa(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values([ts_col, id_col])
        # ns -> us so dt matches the oracle's epoch_us() integers exactly;
        # consecutive gaps as EXACT int64 (the previous shift()/fillna()
        # pandas path promoted to float64 — exact at us magnitudes, but a
        # row-at-a-time fallback then had to re-int() every element)
        us = pdf[ts_col].to_numpy(dtype="int64") // 1000
        dt = np.zeros(len(us), dtype="int64")
        if len(us) > 1:
            np.subtract(us[1:], us[:-1], out=dt[: len(us) - 1])
        if unit_dp is None:
            total = float(dt.sum())
            if total <= 0:
                val = float(pdf[value_col].iloc[-1])
            else:
                # pandas-Series product/sum exactly as before (dt values
                # are small exact ints either way) — identical float path
                val = float(
                    (pdf[value_col] * pd.Series(dt, index=pdf.index)).sum()
                    / total
                )
        else:
            grid = 10**unit_dp
            # HALF-AWAY-FROM-ZERO on the scaled double — the rule F.round
            # (window twin) and DuckDB round (oracle) share. pandas
            # Series.round() is banker's (half-to-even) and would diverge
            # on any value whose scaled double is an exact .5 tie (e.g.
            # 0.125 * 100 == 12.5 exactly: banker's -> 12, engines -> 13).
            # sign * floor(|d| + 0.5), with one boundary correction: for
            # |d| just BELOW a .5 boundary (e.g. 0.5 - 2^-54) the float
            # add |d| + 0.5 can round UP to the next integer, crossing the
            # boundary the true value sits under — both engines round on
            # the double's exact value and would give c - 1. The check is
            # exact because c - 0.5 is representable at these magnitudes.
            d = (pdf[value_col] * grid).to_numpy(dtype="float64")
            a = np.abs(d)
            c = np.floor(a + 0.5)
            c = np.where(c - 0.5 > a, c - 1.0, c)
            vu = (np.sign(d) * c).astype("int64")
            # the num sum is exact at any magnitude (no int64 wrap),
            # mirroring the engines' HUGEINT/decimal sums. Fast path: one
            # int64 dot product, taken only when a PYTHON-INT bound on
            # sum(|vu_i|*dt_i) proves no intermediate can reach 2^62 —
            # true at any sane event magnitude; the arbitrary-precision
            # row loop remains for the unbounded tail so the exactness
            # contract is scale-independent (was: a per-row Python loop
            # for every group — the whole grouped-map stage's hot spot)
            den = int(dt.sum())
            if den <= 0:
                val = float(int(vu[-1])) / grid
            else:
                n = len(vu)
                bound = (
                    int(np.abs(vu).max(initial=0))
                    * int(dt.max(initial=0))
                    * max(n, 1)
                )
                if bound < 2**62:
                    num = int(np.dot(vu, dt))
                else:
                    num = sum(
                        v * g for v, g in zip(vu.tolist(), dt.tolist())
                    )
                val = (
                    math.floor(
                        float(num) * (10 ** (out_dp - unit_dp)) / float(den)
                    )
                    / 10**out_dp
                )
        return pd.DataFrame(
            {user_col: [pdf[user_col].iloc[0]], "twa_value": [val]}
        )

    # project to the four columns the function reads BEFORE the grouped
    # map: applyInPandas is opaque to Catalyst, so without this every
    # other column of df is shuffled and shipped into Python per group
    return (
        df.select(user_col, ts_col, value_col, id_col)
        .groupBy(user_col)
        .applyInPandas(twa, schema=f"{user_col} long, twa_value double")
    )


def time_weighted_avg_window(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    unit_dp: int | None = None,
    out_dp: int = 4,
) -> DataFrame:
    """Production-path TWA: pure lead()-window + one aggregation, no Python.

    Identical math to `time_weighted_avg` (each value holds until the key's
    next event; last event weight 0; single-event keys fall back to the last
    value) but expressed entirely in Catalyst expressions: lead(ts) over the
    per-key window gives each interval's end, dt in microseconds matches the
    oracle's epoch_us() integers, and one groupBy finishes it. Stays inside
    whole-stage codegen — no Arrow transfer, no per-key pandas frame, and no
    requirement that a key's history fit in one worker's memory beyond the
    sort-based window (which spills). This is the variant to use at scale;
    the applyInPandas twin above exists as the grouped-map API demo.

    `unit_dp`/`out_dp` select the exact-integer-unit, floor-quantized
    formulation (see `time_weighted_avg`): unit*dt products stay within
    long per element, their SUM goes through decimal(38,0) (the DuckDB
    HUGEINT twin) so a 100x corpus can't wrap an accumulator, and the one
    double division + floor is the identical op sequence in both engines.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(user_col).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col))
    val = (
        F.col(value_col)
        if unit_dp is None
        else F.round(F.col(value_col) * (10**unit_dp)).cast("long")
    )
    g = df.select(
        user_col,
        val.alias("__v"),
        us.alias("__us"),
        F.lead(us).over(w).alias("__next_us"),
    ).select(
        user_col,
        "__v",
        F.coalesce(F.col("__next_us") - F.col("__us"), F.lit(0)).alias("__dt"),
        F.when(F.col("__next_us").isNull(), F.col("__v")).alias("__last"),
    )
    if unit_dp is None:
        return g.groupBy(user_col).agg(
            F.when(
                F.sum("__dt") > 0,
                F.sum(F.col("__v") * F.col("__dt")) / F.sum("__dt"),
            )
            .otherwise(F.max("__last"))
            .alias("twa_value")
        )
    num = F.sum((F.col("__v") * F.col("__dt")).cast("decimal(38,0)"))
    den = F.sum("__dt")
    quant = (
        F.floor(
            num.cast("double")
            * (10 ** (out_dp - unit_dp))
            / den.cast("double")
        )
        / 10**out_dp
    )
    return g.groupBy(user_col).agg(
        F.when(den > 0, quant)
        .otherwise(F.max("__last").cast("double") / (10**unit_dp))
        .alias("twa_value")
    )


def extract_prop(df: DataFrame, props_col: str = "props", key: str = "k"):
    """Portable JSON-ish scalar extraction via regex (works identically in
    Spark and DuckDB without JSON extensions): integer value of `key`."""
    pat = f'"{key}":\\s*([0-9]+)'
    return F.regexp_extract(F.col(props_col), pat, 1).cast("long")


def anomaly_zscore(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    bucket: str = "hour",
    threshold: float = 2.0,
) -> DataFrame:
    """Per-group time-bucket count anomalies by z-score.

    Two-level plan sized for 100 TB: the only shuffle over the raw events is
    the (group, bucket) count with map-side partial aggregation; everything
    after runs on the tiny bucketed-count table (groups x buckets), where
    the per-group mean/stddev join is a broadcast. Returns one row per
    group: bucket count, anomaly count at |z| > threshold, and max |z|.
    """
    counts = df.groupBy(
        F.col(group_col), F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    ).agg(F.count("*").alias("cnt"))
    stats = counts.groupBy(group_col).agg(
        F.avg("cnt").alias("mu"),
        F.stddev_samp("cnt").alias("sigma"),
    )
    z = (
        counts.join(F.broadcast(stats), group_col)
        .withColumn(
            "z",
            F.when(
                F.col("sigma") > 0, (F.col("cnt") - F.col("mu")) / F.col("sigma")
            ).otherwise(F.lit(0.0)),
        )
    )
    return z.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.count(F.when(F.abs("z") > threshold, 1)).cast("long").alias("n_anomalies"),
        F.round(F.max(F.abs("z")), 4).alias("max_abs_z"),
    )
