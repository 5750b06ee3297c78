"""Event-stream analytics over the events table (events_*)."""

# Split from the original entrypoints.py monolith (round 11);
# blocks keep their original relative order.

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from yaml_pipe_spark.tables import load_table

from yaml_pipe_spark.entrypoints._shared import (
    INTERVAL_JOIN_ORACLE,
    SESSION_WINDOW_ORACLE,
    _dk_byte0,
    register,
)


# ---------------------------------------------------------------------------
# Events: tumbling window agg, sessionization, props extraction — batch twins
# of the streaming mode
# ---------------------------------------------------------------------------


@register(
    "events_tumbling_agg",
    """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
""",
    "Tumbling 1h window per event_type (epoch-aligned, = streaming plan)",
)
def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.events import tumbling_agg

    return tumbling_agg(load_table(spark, sf_dir, "events"))


@register(
    "events_sessionize",
    """
WITH g AS (
  SELECT user_id, event_id, ts, value,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_us
  FROM events
),
flags AS (
  SELECT *, CASE WHEN prev_us IS NULL
                   OR epoch_us(ts) - prev_us > 1800000000
                 THEN 1 ELSE 0 END AS is_new
  FROM g
),
sess AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS session_seq
  FROM flags
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM sess GROUP BY user_id, session_seq
""",
    "Sessionization (gaps-and-islands, 30 min gap): lag + running sum",
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.events import sessionize

    return sessionize(load_table(spark, sf_dir, "events"))


@register(
    "events_props_extract",
    """
SELECT event_type,
       count(*) AS n,
       round(avg(CAST(regexp_extract(props, '"k":\\s*([0-9]+)', 1) AS BIGINT)), 4)
         AS avg_k,
       CAST(sum(CAST(regexp_extract(props, '"k":\\s*([0-9]+)', 1) AS BIGINT))
            AS BIGINT) AS sum_k
FROM events GROUP BY event_type
""",
    "Semi-structured props: regex scalar extraction + aggregate",
)
def q_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.events import extract_prop

    ev = load_table(spark, sf_dir, "events")
    k = extract_prop(ev, "props", "k")
    return ev.withColumn("k", k).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg("k"), 4).alias("avg_k"),
        F.sum("k").alias("sum_k"),
    )


# ---------------------------------------------------------------------------
# Events extras: as-of join (carry-forward plan) + hopping window
# ---------------------------------------------------------------------------


@register(
    "events_asof_join",
    """
WITH u AS (
  SELECT event_id, user_id, ts, 0 AS side FROM events WHERE event_type = 'view'
  UNION ALL
  SELECT event_id, user_id, ts, 1 AS side
  FROM events WHERE event_type = 'purchase'
),
w AS (
  SELECT *,
    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, side, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS matched_event_id,
    last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, side, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched_ts
  FROM u
)
SELECT event_id, user_id, ts, matched_event_id, matched_ts
FROM w WHERE side = 1
""",
    "As-of join: each purchase matched to the user's latest prior view "
    "(union + carry-forward, no range self-join)",
)
def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.events import asof_join_last_prior

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return asof_join_last_prior(purchases, views)


@register(
    "events_hopping_agg",
    """
WITH x AS (
  SELECT event_type, value,
         UNNEST([time_bucket(INTERVAL '30 minutes', ts),
                 time_bucket(INTERVAL '30 minutes', ts)
                   - INTERVAL '30 minutes']) AS window_start
  FROM events
)
SELECT window_start, event_type, count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM x GROUP BY 1, 2
""",
    "Hopping 1h/30min window per event_type (each event in 2 windows)",
)
def q_events_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.events import hopping_agg

    return hopping_agg(load_table(spark, sf_dir, "events"))


@register(
    "events_props_json",
    """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(count(CASE WHEN json_extract_string(props, '$.k') IS NULL
                       THEN 1 END) AS BIGINT) AS n_missing
FROM events GROUP BY event_type
""",
    "Typed JSON extraction (from_json with explicit schema) + aggregate",
)
def q_events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "__p", F.from_json(F.col("props"), "k BIGINT")
    ).withColumn("k", F.col("__p.k"))
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").cast("long").alias("sum_k"),
        F.count(F.when(F.col("k").isNull(), 1)).cast("long").alias("n_missing"),
    )


@register(
    "events_session_window",
    SESSION_WINDOW_ORACLE,
    "Native session_window agg (strict gap boundary, end = last event + gap)",
)
def q_events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_forget_users",
    """
WITH del AS (SELECT DISTINCT user_id FROM events WHERE user_id % 29 = 0),
kept AS (
  SELECT e.* FROM events e LEFT JOIN del ON e.user_id = del.user_id
  WHERE del.user_id IS NULL
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST((SELECT count(*) FROM events) - count(*) AS BIGINT) AS n_total_minus_kept,
       CAST((SELECT count(*) FROM kept WHERE user_id % 29 = 0) AS BIGINT)
         AS n_leaked
FROM kept GROUP BY event_type
""",
    "Deletion-request propagation (right-to-be-forgotten): scrub every "
    "event of the requested users via LEFT ANTI join and AUDIT the result "
    "— per-type surviving counts plus an oracle-checked leak counter that "
    "must be 0. The deletion list is a broadcast anti-join against the "
    "fact scan (no shuffle of events); at 100 TB this composes with "
    "dynamic partition overwrite so only partitions containing the users "
    "rewrite. The n_total_minus_kept column pins the scrubbed volume.",
)
def q_events_forget_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    del_list = (
        ev.filter(F.col("user_id") % 29 == 0).select("user_id").distinct()
    )
    kept = ev.join(
        F.broadcast(del_list), "user_id", "left_anti"
    )
    total = ev.agg(F.count("*").alias("__total"))
    leaked = kept.filter(F.col("user_id") % 29 == 0).agg(
        F.count("*").alias("__leak")
    )
    return (
        kept.groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n_kept"))
        .crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(leaked))
        .select(
            "event_type",
            "n_kept",
            (F.col("__total") - F.col("n_kept"))
            .cast("long")
            .alias("n_total_minus_kept"),
            F.col("__leak").cast("long").alias("n_leaked"),
        )
    )


@register(
    "events_funnel",
    """
WITH v AS (
  SELECT user_id, min(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS c_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.v_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_viewed,
       (SELECT count(*) FROM c) AS n_clicked_after_view,
       (SELECT count(*) FROM p) AS n_purchased_after_click
""",
    "Ordered funnel conversion: view -> later click -> later purchase, "
    "per-user min-timestamp chaining (3 aggs + 2 joins on user_id)",
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # each stage frame feeds BOTH the next stage's join and its own count:
    # without materialization the p branch re-runs v's and c's shuffles
    # (plan-audited: 5 event scans -> 3 pruned ones). The frames are
    # per-user minima — user-scale, the natural funnel staging table.
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
        .localCheckpoint()
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
        .localCheckpoint()
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    nv = v.agg(F.count("*").alias("n_viewed"))
    nc = c.agg(F.count("*").alias("n_clicked_after_view"))
    np_ = p.agg(F.count("*").alias("n_purchased_after_click"))
    return nv.crossJoin(nc).crossJoin(np_)


@register(
    "events_funnel_time",
    """
WITH v AS (
  SELECT user_id, min(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, v.v_ts, min(e.ts) AS c_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.v_ts
  GROUP BY e.user_id, v.v_ts
),
p AS (
  SELECT e.user_id, c.c_ts, min(e.ts) AS p_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
  GROUP BY e.user_id, c.c_ts
),
lat AS (
  SELECT 'view_to_click' AS step,
         epoch_us(c_ts) - epoch_us(v_ts) AS us
  FROM c
  UNION ALL
  SELECT 'click_to_purchase' AS step,
         epoch_us(p_ts) - epoch_us(c_ts) AS us
  FROM p
)
SELECT step,
       CAST(count(*) AS BIGINT) AS n_users,
       floor(quantile_cont(us, 0.5) / 100) / 10000 AS p50_sec,
       floor(quantile_cont(us, 0.9) / 100) / 10000 AS p90_sec
FROM lat GROUP BY step
""",
    "Funnel conversion LATENCY: p50/p90 seconds from first view to first "
    "subsequent click, and from that click to first subsequent purchase — "
    "the time-to-convert companion of events_funnel's counts. Latencies "
    "are integer microsecond diffs (identical in both engines) fed to the "
    "interpolated percentile (Spark percentile = DuckDB quantile_cont, "
    "the parity rel_percentiles already pins); per-step rows ride the "
    "same user_id join shuffles as the funnel itself.",
)
def q_events_funnel_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    # c feeds both the purchase stage and the latency union — materialize
    # once (user-scale frame; same staging rationale as events_funnel)
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id", "v_ts")
        .agg(F.min("ts").alias("c_ts"))
        .localCheckpoint()
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "c_ts"), "user_id")
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id", "c_ts")
        .agg(F.min("ts").alias("p_ts"))
    )
    lat = c.select(
        F.lit("view_to_click").alias("step"),
        (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("us"),
    ).unionByName(
        p.select(
            F.lit("click_to_purchase").alias("step"),
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("us"),
        )
    )
    out = lat.groupBy("step").agg(
        F.count("*").cast("long").alias("n_users"),
        F.percentile("us", F.array(F.lit(0.5), F.lit(0.9))).alias("__q"),
    )
    return out.select(
        "step",
        "n_users",
        # floor-quantize to 100us units (round-9 hazard sweep): the
        # interpolated percentile is a rational over integer microseconds
        # and can sit exactly on a 4dp-of-seconds round tie
        (F.floor(F.element_at("__q", 1) / 100) / 1e4).alias("p50_sec"),
        (F.floor(F.element_at("__q", 2) / 100) / 1e4).alias("p90_sec"),
    )


@register(
    "events_retention_cohorts",
    """
WITH firsts AS (
  SELECT user_id,
         TIMESTAMP '1970-01-01'
           + (epoch_us(min(ts)) // 604800000000) * INTERVAL '7 days'
           AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id,
         TIMESTAMP '1970-01-01'
           + (epoch_us(ts) // 604800000000) * INTERVAL '7 days'
           AS active_week
  FROM events
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.active_week) // 7 AS BIGINT)
         AS week_offset,
       count(DISTINCT a.user_id) AS n_active
FROM firsts f JOIN active a ON f.user_id = a.user_id
GROUP BY 1, 2
""",
    "Retention cohort matrix: first-seen week x weekly-active offset "
    "(two aggs + one join, all on user_id; weeks epoch-aligned like "
    "F.window, NOT DuckDB time_bucket's Monday origin)",
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    week = lambda c: F.window(c, "7 days").start  # noqa: E731
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    firsts = firsts.select(
        "user_id", week(F.col("first_ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", week(F.col("ts")).alias("active_week")
    ).distinct()
    joined = firsts.join(active, "user_id")
    offset = (
        F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
    ).cast("long")
    return joined.groupBy(
        "cohort_week", offset.alias("week_offset")
    ).agg(F.countDistinct("user_id").alias("n_active"))


# Shared TWA oracle (round-10 hazard sweep): value is a 2dp-grid double and
# dt an exact integer microsecond delta, so sum(value*dt)/sum(dt) is a ratio
# of integers once value moves to cent-units — a half-up round at 4dp has
# REACHABLE ties where the engines' round paths disagree. Both TWA queries
# therefore sum exact cent*us units (HUGEINT / decimal(38,0)) and
# floor-quantize the one double division; floor has no tie to break.
TWA_ORACLE = """
WITH g AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS vu,
         epoch_us(ts) AS us,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_us
  FROM events
),
w AS (
  SELECT user_id, vu, COALESCE(next_us - us, 0) AS dt,
         CASE WHEN next_us IS NULL THEN vu END AS last_vu
  FROM g
)
SELECT user_id,
       CASE WHEN sum(dt) > 0
            THEN floor(CAST(sum(vu * dt) AS DOUBLE) * 100
                       / CAST(sum(dt) AS DOUBLE)) / 10000
            ELSE CAST(max(last_vu) AS DOUBLE) / 100 END AS twa_value
FROM w GROUP BY user_id
"""


@register(
    "events_time_weighted_avg",
    TWA_ORACLE,
    "Grouped-map UDF (applyInPandas): per-user time-weighted average over "
    "exact integer cent*us units, floor-quantized at 4dp (round-10 hazard "
    "sweep); oracle = the lead()-window formulation of the same math",
)
def q_events_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.events import time_weighted_avg

    ev = load_table(spark, sf_dir, "events")
    return time_weighted_avg(ev, unit_dp=2, out_dp=4).select(
        "user_id", "twa_value"
    )


@register(
    "events_time_weighted_window",
    TWA_ORACLE,
    "Production TWA: lead()-window + one aggregation, pure Catalyst (no "
    "Python workers); same exact-integer-unit math as the applyInPandas "
    "demo above, decimal(38,0) unit sums so a 100x corpus can't wrap",
)
def q_events_twa_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.events import time_weighted_avg_window

    ev = load_table(spark, sf_dir, "events")
    return time_weighted_avg_window(ev, unit_dp=2, out_dp=4).select(
        "user_id", "twa_value"
    )


@register(
    "events_interval_join",
    INTERVAL_JOIN_ORACLE,
    "Interval join: views within 1h before each purchase (shuffle on "
    "user_id + range predicate, per-key linear)",
)
def q_events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
    )
    cond = (
        (p.user_id == v.v_user_id)
        & (v.view_ts >= p.purchase_ts - F.expr("INTERVAL 1 HOUR"))
        & (v.view_ts <= p.purchase_ts)
    )
    return p.join(v, cond).select(
        "purchase_id", "user_id", "purchase_ts", "view_id", "view_ts"
    )


# ---------------------------------------------------------------------------
# Event-scoring extensions: time-decayed engagement and RFM segmentation.
# Decay uses a rational kernel 1/(1 + age/tau) instead of exp() so the
# score is pure field arithmetic — bit-identical across engines (the
# determinism convention from the module docstring); age comes from exact
# integer microsecond deltas (unix_micros / epoch_us).
# ---------------------------------------------------------------------------


@register(
    "events_decayed_score",
    """
WITH mx AS (SELECT max(epoch_us(ts)) AS mx FROM events)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value / (1 + (mx - epoch_us(ts)) / 86400000000.0 / 7)), 3)
         AS decayed_score
FROM events, mx
GROUP BY user_id
""",
    "Time-decayed per-user engagement score (rational decay, tau=7d): "
    "scalar max-timestamp broadcast + one grouped agg",
)
def q_events_decayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    mx = ev.agg(F.max(F.unix_micros("ts")).alias("mx"))
    age_days = (F.col("mx") - F.unix_micros("ts")) / 86400000000.0
    return (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(
                F.sum(F.col("value") / (1 + age_days / 7)), 3
            ).alias("decayed_score"),
        )
    )


@register(
    "events_rfm_segments",
    """
WITH mx AS (SELECT max(ts) AS mxts FROM events),
per_user AS (
  SELECT user_id,
         date_diff('day', max(ts), mxts) AS recency_days,
         count(*) AS frequency,
         round(coalesce(sum(value) FILTER (WHERE event_type = 'purchase'),
                        0), 2) AS monetary
  FROM events, mx
  GROUP BY user_id, mxts
),
med AS (
  SELECT quantile_cont(recency_days, 0.5) AS r50,
         quantile_cont(frequency, 0.5) AS f50,
         quantile_cont(monetary, 0.5) AS m50
  FROM per_user
)
SELECT concat(
         CASE WHEN recency_days <= r50 THEN 'R1' ELSE 'R2' END,
         CASE WHEN frequency > f50 THEN 'F1' ELSE 'F2' END,
         CASE WHEN monetary > m50 THEN 'M1' ELSE 'M2' END
       ) AS segment,
       CAST(count(*) AS BIGINT) AS n_users,
       round(sum(monetary), 2) AS total_monetary
FROM per_user, med
GROUP BY 1
""",
    "RFM (recency/frequency/monetary) user segmentation by median splits "
    "— two stacked aggs plus a broadcast scalar of exact medians; "
    "quantile thresholds adapt to scale while the plan stays sort-free "
    "over events (percentile runs on per-user rows only). Monetary is "
    "rounded to cents BEFORE the median so boundary users classify "
    "identically across engines",
)
def q_events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "value"
    )
    mx = ev.agg(F.max("ts").alias("mxts"))
    per_user = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id", "mxts")
        .agg(
            F.datediff(F.col("mxts"), F.max("ts")).alias("recency_days"),
            F.count("*").alias("frequency"),
            F.round(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("event_type") == "purchase", F.col("value")
                        )
                    ),
                    F.lit(0.0),
                ),
                2,
            ).alias("monetary"),
        )
    )
    med = per_user.agg(
        F.expr("percentile(recency_days, 0.5)").alias("r50"),
        F.expr("percentile(frequency, 0.5)").alias("f50"),
        F.expr("percentile(monetary, 0.5)").alias("m50"),
    )
    segment = F.concat(
        F.when(F.col("recency_days") <= F.col("r50"), "R1").otherwise("R2"),
        F.when(F.col("frequency") > F.col("f50"), "F1").otherwise("F2"),
        F.when(F.col("monetary") > F.col("m50"), "M1").otherwise("M2"),
    )
    return (
        per_user.crossJoin(F.broadcast(med))
        .groupBy(segment.alias("segment"))
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.round(F.sum("monetary"), 2).alias("total_monetary"),
        )
    )


@register(
    "events_grouping_sets",
    """
WITH g AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         CAST(grouping(CAST(date_trunc('day', ts) AS DATE)) AS BIGINT)
           AS g_day,
         CAST(grouping(event_type) AS BIGINT) AS g_type,
         CAST(count(*) AS BIGINT) AS n_events,
         round(sum(value), 2) AS sum_value
  FROM events
  GROUP BY GROUPING SETS ((day), (day, event_type), ())
)
SELECT CAST(day AS VARCHAR) AS day, event_type, g_day, g_type,
       n_events, sum_value
FROM g
""",
    "Multi-resolution continuous-aggregate rollup over events via GROUPING "
    "SETS: per-day, per-day-per-type, and grand total in ONE pass (one "
    "expand + one shuffle — not three scans); per-column grouping() flags "
    "instead of grouping_id() because the bit order is engine-defined",
)
def q_events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type", "value"
    )
    g = ev.groupingSets(
        [["day"], ["day", "event_type"], []], "day", "event_type"
    ).agg(
        F.grouping("day").cast("long").alias("g_day"),
        F.grouping("event_type").cast("long").alias("g_type"),
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    # day as a string: computed DATEs round-trip to pandas differently per
    # engine (datetime64 vs date object), so pin the comparison dtype
    return g.withColumn("day", F.col("day").cast("string"))


@register(
    "events_anomaly_zscore",
    """
WITH c AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, count(*) AS cnt
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
s AS (
  SELECT event_type, avg(cnt) AS mu, stddev_samp(cnt) AS sigma
  FROM c GROUP BY event_type
),
z AS (
  SELECT c.event_type,
         CASE WHEN s.sigma > 0 THEN (c.cnt - s.mu) / s.sigma
              ELSE 0.0 END AS zval
  FROM c JOIN s ON c.event_type = s.event_type
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(count(CASE WHEN abs(zval) > 2 THEN 1 END) AS BIGINT)
         AS n_anomalies,
       round(max(abs(zval)), 4) AS max_abs_z
FROM z GROUP BY event_type
""",
    "Hourly-count anomaly detection by per-type z-score: the raw-event "
    "shuffle is the (type, hour) count with map-side combine; stats and "
    "flagging run on the tiny bucket table with a broadcast join",
)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.events import anomaly_zscore

    events = load_table(spark, sf_dir, "events")
    return anomaly_zscore(events, "ts", "event_type", "hour", 2.0)


@register(
    "events_approx_distinct_bounded",
    """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS approx_within_4sigma
FROM events GROUP BY event_type
""",
    "Sketch-accuracy gate: HyperLogLog++ (approx_count_distinct, rsd=0.02) "
    "must land within 8% (= 4 x rsd) of the exact distinct count. rsd is a "
    "standard deviation, NOT a hard bound — a 4-sigma gate fails with "
    "probability ~6e-5 per group, vs a flaky ~1% for the naive 5% (2.5 "
    "sigma) version; the boolean makes an approximate operator "
    "oracle-checkable. At 100 TB the sketch is the only viable path "
    "(fixed-size state, map-side mergeable); this query keeps it honest "
    "against the exact answer.",
)
def q_events_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("__approx"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("__approx") - F.col("exact_users"))
            <= 0.08 * F.col("exact_users")
        ).alias("approx_within_4sigma"),
    )


@register(
    "events_incremental_agg",
    """
SELECT event_type, date_trunc('day', ts) AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events GROUP BY event_type, date_trunc('day', ts)
""",
    "Incremental view maintenance, oracle-checked against the full "
    "recompute: history (ts < Jan 16) is folded as an already-materialized "
    "per-key aggregate (cut mid-day so merged keys exist on both sides), "
    "only the delta scans raw rows, and "
    "merge(agg(prior), agg(delta)) must hash-equal agg(everything) — "
    "count/sum are mergeable partials, exactly Spark's partial/final split "
    "lifted across pipeline runs. At 100 TB this is the difference between "
    "scanning one day and scanning the full history every run.",
)
def q_events_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.state import merge_aggregates

    events = load_table(spark, sf_dir, "events")
    # noon cutoff: the Jan-16 day bucket exists on BOTH sides, so the
    # merge genuinely combines partials instead of unioning disjoint keys
    cutoff = F.lit("2024-01-16 12:00:00").cast("timestamp")
    keys = ["event_type", "day"]

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        ).agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("value").alias("sum_value"),  # unrounded partial
        )

    prior = partial(events.filter(F.col("ts") < cutoff))
    delta = partial(events.filter(F.col("ts") >= cutoff))
    merged = merge_aggregates(prior, delta, keys)
    # rounding is presentation-layer only: merge_aggregates keeps sum_value
    # unrounded so its output is itself a valid `prior` for the next run
    return merged.withColumn("sum_value", F.round("sum_value", 2))


@register(
    "events_transition_matrix",
    """
WITH seq AS (
  SELECT user_id, event_type AS prev_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS next_type
  FROM events
)
SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n,
       round(count(*) / CAST(
         sum(count(*)) OVER (PARTITION BY prev_type) AS DOUBLE), 4) AS p
FROM seq WHERE next_type IS NOT NULL
GROUP BY prev_type, next_type
""",
    "First-order Markov transition matrix over user event sequences: "
    "P(next event type | current), the standard behavioral-analytics "
    "companion to the funnel/sessionize family. One shuffle on user_id "
    "orders each user's history (ts with event_id tiebreak so "
    "same-timestamp rows are deterministic); the type-pair rollup and "
    "row-normalization windows both run on the tiny |types|^2 matrix.",
)
def q_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    agg = seq.groupBy("prev_type", "next_type").agg(
        F.count("*").cast("long").alias("n")
    )
    wnorm = W.partitionBy("prev_type")
    return agg.select(
        "prev_type",
        "next_type",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(wnorm).cast("double"), 4
        ).alias("p"),
    )


@register(
    "events_cms_heavy_hitters",
    f"""
WITH pu AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
hx AS (
  SELECT user_id, n, i,
         {_dk_byte0("CAST(i AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")} % 64 AS b
  FROM pu, (SELECT UNNEST(generate_series(0, 3)) AS i)
),
cms AS (SELECT i, b, sum(n) AS c FROM hx GROUP BY 1, 2),
tk AS (SELECT user_id, n FROM pu ORDER BY n DESC, user_id LIMIT 10),
est AS (
  SELECT t.user_id, t.n, min(c.c) AS cms_est
  FROM tk t
  JOIN hx h ON h.user_id = t.user_id
  JOIN cms c ON c.i = h.i AND c.b = h.b
  GROUP BY 1, 2
),
tot AS (SELECT count(*) AS total FROM events)
SELECT user_id, CAST(n AS BIGINT) AS exact_n,
       CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - n AS BIGINT) AS overestimate,
       CAST(cms_est - n <= greatest(1, CAST(floor(0.05 * total) AS BIGINT))
            AS INT) AS bound_ok
FROM est, tot
""",
    "Count-min-sketch heavy hitters with a measured error bound: a 4x64 "
    "CMS built as plain aggregates (seeded md5 bucket hashes, the "
    "cross-engine hash family from functions/hashing.py), the exact "
    "top-10 users joined back through the sketch, and the classic "
    "overestimate-only guarantee checked row by row (est >= exact, "
    "excess <= ~epsilon*N) — the third mergeable-sketch gate next to "
    "the HLL and GK ones (events_approx_distinct_bounded, "
    "rel_approx_quantile_bounded). Scale shape: the sketch builds from "
    "the PER-USER count frame (high-cardinality first-stage agg with "
    "map-side combine), so the 256-cell rollup never sees raw events; "
    "at 100 TB the 4x64 table is the only state two clusters need to "
    "exchange to merge their sketches.",
)
def q_events_cms_heavy_hitters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from yaml_pipe_spark.functions.hashing import (
        hex_pair_to_int,
        md5_seeded,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id")
    pu = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    hashes = F.transform(
        F.sequence(F.lit(0), F.lit(3)),
        lambda i: F.struct(
            i.alias("i"),
            (
                hex_pair_to_int(
                    md5_seeded(F.col("user_id").cast("string"), i), 1
                )
                % 64
            ).alias("b"),
        ),
    )
    hx = pu.select(
        "user_id", "n", F.explode(hashes).alias("h")
    ).select("user_id", "n", F.col("h.i").alias("i"), F.col("h.b").alias("b"))
    cms = hx.groupBy("i", "b").agg(F.sum("n").alias("c"))
    tk = pu.orderBy(F.col("n").desc(), "user_id").limit(10)
    est = (
        tk.join(hx.select("user_id", "i", "b"), "user_id")
        .join(F.broadcast(cms), ["i", "b"])
        .groupBy("user_id", "n")
        .agg(F.min("c").alias("cms_est"))
    )
    tot = ev.agg(F.count("*").alias("total"))
    return est.crossJoin(F.broadcast(tot)).select(
        "user_id",
        F.col("n").cast("long").alias("exact_n"),
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("n")).cast("long").alias("overestimate"),
        (
            (F.col("cms_est") - F.col("n"))
            <= F.greatest(
                F.lit(1).cast("long"),
                F.floor(0.05 * F.col("total")).cast("long"),
            )
        )
        .cast("int")
        .alias("bound_ok"),
    )


@register(
    "events_top_paths",
    """
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
paths AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM o WHERE rn <= 3 GROUP BY user_id
),
cnt AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n_users FROM paths GROUP BY 1
)
SELECT path, n_users FROM cnt ORDER BY n_users DESC, path LIMIT 10
""",
    "User-journey mining: each user's first three events (ordered by "
    "ts with event_id tiebreak) joined into a path string, top-10 "
    "paths by user count — the funnel-discovery complement of "
    "events_funnel (which checks ONE hypothesized path; this surfaces "
    "which paths exist). One per-user window shuffle, a path rollup on "
    "a high-cardinality key, TakeOrderedAndProject for the top-10.",
)
def q_events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    o = ev.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("user_id").orderBy("ts", "event_id")
        ),
    ).filter(F.col("rn") <= 3)
    paths = o.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    cnt = paths.groupBy("path").agg(
        F.count("*").cast("long").alias("n_users")
    )
    return cnt.orderBy(F.col("n_users").desc(), "path").limit(10)
