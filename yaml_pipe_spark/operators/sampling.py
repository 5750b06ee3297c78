"""Training-corpus assembly operators: deterministic sampling and sharding.

A 100 TB training-data pipeline rarely ships a corpus verbatim: it
downsamples over-represented strata (by language/source/quality band) and
packs the survivors into fixed-budget shards for the trainer. Both operators
here are deterministic — sampling decisions derive from a content hash, not
rand() — so runs are reproducible, incremental re-runs make identical
decisions for unchanged rows, and each op is checkable against a plain SQL
oracle like every other operator in the engine.

Scale notes: the hash-sample is a stateless narrow filter (no shuffle, fully
pushed into the scan stage); sharding is one window shuffle on the stratum
key, and keeping the running sum per-stratum (not global) avoids the
single-partition global-window trap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from yaml_pipe_spark.functions.hashing import hex_pair_to_int
from yaml_pipe_spark.functions.text import tokens


def hash_sample_flag(key: Column, rate: Column) -> Column:
    """Deterministic keep/drop: keep iff byte_0(md5(key)) < rate * 256.

    The same key always samples the same way at the same rate, across runs
    and engines (md5 hex is the cross-engine primitive, functions.hashing).
    """
    return hex_pair_to_int(F.md5(key.cast("string")), 1) < rate * 256


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 1.0,
) -> DataFrame:
    """Per-stratum deterministic downsampling: `rates` maps stratum value ->
    keep probability; unlisted strata keep `default_rate`. A narrow filter —
    no shuffle, no state, reproducible."""
    rate = F.lit(default_rate)
    for value, r in rates.items():
        rate = F.when(F.col(stratum_col) == value, F.lit(r)).otherwise(rate)
    return df.filter(hash_sample_flag(F.col(key_col), rate))


def shard_by_token_budget(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stratum_col: str | None = None,
    budget: int = 4096,
) -> DataFrame:
    """Assign docs to fixed-token-budget training shards.

    shard_id = floor(exclusive-prefix-sum(n_tokens) / budget) within the
    stratum, docs ordered by id. Deterministic, and per-stratum windows keep
    the prefix sum parallel (a global ordering would serialize on one
    reducer). Oversized single docs still get their own shard(s) — the
    assignment is a streaming-friendly running sum, not bin packing.
    """
    part = [stratum_col] if stratum_col else []
    w = (
        W.partitionBy(*part)
        .orderBy(F.col(id_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    n_tok = F.size(tokens(F.col(text_col)))
    out = df.withColumn("n_tokens", n_tok.cast("long")).withColumn(
        "__cum", F.sum("n_tokens").over(w)
    )
    return out.withColumn(
        "shard_id", F.floor((F.col("__cum") - F.col("n_tokens")) / budget)
    ).drop("__cum")


def pack_windows(
    df: DataFrame,
    ctx: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_size: int = 4096,
) -> DataFrame:
    """GPT-style sequence-packing accounting: docs concatenated in id order
    and chunked into fixed `ctx`-token context windows; returns per-window
    occupancy — (window_id, n_docs, n_docs_starting, n_tokens) — the audit
    a trainer's data loader needs (boundary-crossing rate, tail fill).

    Scale design: the global running token offset is a TWO-PASS cumulative
    sum — an in-shard window cumsum (shard = id div shard_size) plus a
    broadcast exclusive prefix of per-shard totals — NOT one global
    Window.orderBy, which would funnel the whole corpus through a single
    reducer at 100 TB. The shard-prefix window does order globally, but
    over n_docs/shard_size rows (one per shard), and its output joins back
    as a broadcast. Zero-token docs occupy no window and are dropped up
    front, mirroring the oracle's WHERE n > 0.
    """
    n_tok = F.size(tokens(F.col(text_col))).cast("long")
    base = (
        df.select(F.col(id_col).alias("id"), n_tok.alias("n"))
        .filter(F.col("n") > 0)
        .withColumn("shard", F.expr(f"id div {int(shard_size)}"))
    )
    wloc = (
        W.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "local_prefix", F.coalesce(F.sum("n").over(wloc), F.lit(0))
    )
    wsh = W.orderBy("shard").rowsBetween(W.unboundedPreceding, -1)
    prefixes = (
        base.groupBy("shard")
        .agg(F.sum("n").alias("tot"))
        .withColumn(
            "shard_prefix", F.coalesce(F.sum("tot").over(wsh), F.lit(0))
        )
        .select("shard", "shard_prefix")
    )
    off = local.join(F.broadcast(prefixes), "shard").select(
        "id",
        "n",
        (F.col("shard_prefix") + F.col("local_prefix")).alias("off"),
    )
    spans = off.select(
        "id",
        "n",
        "off",
        F.expr(f"off div {int(ctx)}").alias("w0"),
        F.expr(f"(off + n - 1) div {int(ctx)}").alias("w1"),
    )
    exploded = spans.select(
        "n",
        "off",
        "w0",
        F.explode(F.sequence("w0", "w1")).alias("window_id"),
    )
    win_lo = F.col("window_id") * ctx
    win_hi = (F.col("window_id") + 1) * ctx - 1
    return exploded.groupBy("window_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("w0") == F.col("window_id")).cast("long")).alias(
            "n_docs_starting"
        ),
        F.sum(
            F.least(F.col("off") + F.col("n") - 1, win_hi)
            - F.greatest(F.col("off"), win_lo)
            + 1
        ).alias("n_tokens"),
    )


def md5_byte(key: Column) -> Column:
    """First md5 byte of the key as 0..255 — the deterministic bucket
    primitive shared with the DuckDB oracles (strpos hex arithmetic)."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, 2), 16, 10
    ).cast("long")


def holdout_split(
    key: Column, train_upto: int = 232, val_upto: int = 244
) -> Column:
    """'train' / 'val' / 'test' from the key's md5 byte: ~90.6/4.7/4.7 by
    default. A pure narrow expression — the assignment survives resharding,
    re-ingestion, and engine changes, which is the property a training
    holdout must have (a random split leaks the moment data moves)."""
    b = md5_byte(key)
    return (
        F.when(b < train_upto, "train")
        .when(b < val_upto, "val")
        .otherwise("test")
    )


def temperature_mix(
    df: DataFrame,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    budget_frac: float = 0.5,
) -> DataFrame:
    """Temperature-based mixture resampling audit (mT5/XLM-R style): the
    sampling weight of stratum i is proportional to sqrt(n_i) — i.e.
    p_i^alpha with alpha = 0.5 — which up-weights low-resource strata
    relative to their natural share. Targets are scaled to a budget of
    `budget_frac` * N documents, capped at keeping a stratum whole.

    sqrt (not an arbitrary pow) keeps the weights IEEE-correctly-rounded
    and therefore engine-identical; q/rate round to 6 decimals before the
    keep test so the boundary is one shared number. The keep decision is
    the deterministic md5 primitive every sampler here uses — uniform =
    first-16-bits(md5(key)) / 65536, an exact dyadic double — so the
    sample is reproducible across runs, reshards, and engines.

    Returns (stratum, n_docs, q_temp, rate, n_sampled). Plan shape: the
    stratum frame is |strata| rows (its sum/count total is a broadcast
    1-row cross join); rates broadcast back onto the corpus for a narrow
    filter — the corpus is scanned twice but both scans read only
    (stratum, key) and the filter pass never shuffles.
    """
    rates = temperature_rates(df, stratum_col, budget_frac)
    u = temperature_uniform(F.col(key_col))
    # null-safe joins throughout: groupBy keeps a NULL stratum as a real
    # group, so a plain equi-join would silently orphan its documents
    rcol = rates.select(F.col(stratum_col).alias("__rs"), "rate")
    sampled = (
        df.select(stratum_col, u.alias("__u"))
        .join(
            F.broadcast(rcol),
            F.col(stratum_col).eqNullSafe(F.col("__rs")),
        )
        .filter(F.col("__u") < F.col("rate"))
        .groupBy(stratum_col)
        .agg(F.count("*").alias("__ns"))
        .select(F.col(stratum_col).alias("__ss"), "__ns")
    )
    return (
        rates.join(
            sampled,
            F.col(stratum_col).eqNullSafe(F.col("__ss")),
            "left",
        )
        .select(
            stratum_col,
            "n_docs",
            "q_temp",
            "rate",
            F.coalesce(F.col("__ns"), F.lit(0)).cast("long").alias(
                "n_sampled"
            ),
        )
    )


def temperature_uniform(key: Column) -> Column:
    """uniform = first-16-bits(md5(key)) / 65536 — an exact dyadic double,
    the shared keep-decision primitive of temperature sampling."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast(
            "double"
        )
        / F.lit(65536.0)
    )


def temperature_rates(
    df: DataFrame,
    stratum_col: str = "lang",
    budget_frac: float = 0.5,
) -> DataFrame:
    """Per-stratum (stratum, n_docs, q_temp, rate) — the rate table
    temperature sampling keys on; see temperature_mix for the contract."""
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("__n"))
    w = counts.withColumn("__w", F.sqrt(F.col("__n").cast("double")))
    # note: Spark resolution is case-insensitive by default, so the total
    # must not be spelled "__N" (it would collide with per-stratum "__n")
    tot = w.agg(F.sum("__w").alias("__sw"), F.sum("__n").alias("__ntot"))
    rates = (
        w.join(F.broadcast(tot))
        .withColumn("q_temp", F.round(F.col("__w") / F.col("__sw"), 6))
        .withColumn(
            "rate",
            F.round(
                F.least(
                    F.lit(1.0),
                    (
                        F.col("q_temp")
                        * (F.col("__ntot") * F.lit(float(budget_frac)))
                    )
                    / F.col("__n"),
                ),
                6,
            ),
        )
        .select(
            stratum_col,
            F.col("__n").cast("long").alias("n_docs"),
            "q_temp",
            "rate",
        )
    )
    return rates


def doremi_source_weights(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    eta: float = 2.0,
) -> DataFrame:
    """DoReMi-style domain reweighting (Xu et al. 2023, arXiv:2305.10429),
    the deterministic single-shot analog: upweight sources where a generic
    (corpus-wide) language model underperforms a source-specialized one.

    DoReMi trains a proxy model with Group DRO to find domain weights
    maximizing per-domain excess loss over a reference model. Model
    training is out of scope for a SQL-checkable engine, so both models
    here are the engine's bigram LMs (text_stats.bigram_doc_logprob
    machinery): reference = trained on the whole corpus, specialist =
    trained per source. excess(s) = avg over s's docs of
    (lp_source - lp_corpus) >= 0 measures how much head-room the generic
    model leaves on that source — DoReMi's excess-loss signal with the
    proxy/reference pair replaced by specialist/generalist LMs. The new
    mixture is the exponentiated-gradient step the paper uses:
    w(s) proportional to share(s) * exp(eta * excess(s)), normalized.

    Determinism contract (shared by the oracle): per-doc excess rounds to
    6dp before the per-source mean; the mean runs over exact integer
    micro-unit sums and floor-quantizes to 6dp before exp() (a plain
    round(avg(rounded)) can land exactly on a 6dp boundary where engine
    fold orders disagree — round-9 hazard sweep); the baseline share
    floor-quantizes to 6dp; weights round to 6dp after normalizing.

    Returns one row per source:
    (source, n_docs BIGINT, baseline_share, excess_loss, weight DOUBLE).

    Scale: ONE (doc, bigram) count shuffle; the source LM aggregates from
    it and the corpus LM aggregates from the source LM (vocab-sized, no
    second corpus scan); per-doc scoring joins the doc-gram stream once on
    the full (source, prev, cur) key; the final frame is |sources| rows,
    normalized with a window over itself.
    """
    t = F.regexp_extract_all(F.lower(text_col), F.lit(r"\p{L}+"), F.lit(0))
    base = docs.select(source_col, id_col, t.alias("t")).filter(
        F.size("t") >= 2
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.struct(
            F.get(F.col("t"), i - 1).alias("prev"),
            F.get(F.col("t"), i).alias("cur"),
        ),
    )
    bgs = (
        base.select(source_col, id_col, F.explode(grams).alias("g"))
        .select(source_col, id_col, F.col("g.prev"), F.col("g.cur"))
        .filter(
            F.col(source_col).isNotNull()
            & F.col("prev").isNotNull()
            & F.col("cur").isNotNull()
        )
    )
    dt = bgs.groupBy(source_col, id_col, "prev", "cur").agg(
        F.count("*").alias("c_dt")
    )
    lm_s = dt.groupBy(source_col, "prev", "cur").agg(
        F.sum("c_dt").alias("c_bg")
    )
    pv_s = lm_s.groupBy(source_col, "prev").agg(F.sum("c_bg").alias("c_prev"))
    lp_s = lm_s.join(pv_s, [source_col, "prev"]).select(
        source_col,
        "prev",
        "cur",
        (
            F.log10(F.col("c_bg").cast("double"))
            - F.log10(F.col("c_prev").cast("double"))
        ).alias("lps"),
    )
    # corpus-wide LM derives from the source LM — no second corpus scan
    lm_g = lm_s.groupBy("prev", "cur").agg(F.sum("c_bg").alias("g_bg"))
    pv_g = lm_g.groupBy("prev").agg(F.sum("g_bg").alias("g_prev"))
    lp_g = lm_g.join(pv_g, "prev").select(
        "prev",
        "cur",
        (
            F.log10(F.col("g_bg").cast("double"))
            - F.log10(F.col("g_prev").cast("double"))
        ).alias("lpg"),
    )
    doc = (
        dt.join(lp_s, [source_col, "prev", "cur"])
        .join(lp_g, ["prev", "cur"])
        .groupBy(source_col, id_col)
        .agg(
            F.round(
                F.sum(F.col("c_dt") * (F.col("lps") - F.col("lpg")))
                / F.sum("c_dt"),
                6,
            ).alias("exc")
        )
    )
    src = doc.groupBy(source_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        # mean over EXACT integer micro-units, floor-quantized: exc is
        # 6dp-rounded, so avg(exc) is a rational that can land exactly on
        # a 6dp round boundary where engine fold orders disagree (the
        # round-8 flake class); summing round(exc*1e6)::long is exact and
        # fold-order-free, and floor has no tie to break. + 0.0 normalizes
        # a possible -0.0 (hash-visible); exp(-0.0) == exp(0.0) so the
        # weight itself is unaffected
        (
            F.floor(
                F.sum(F.round(F.col("exc") * 1e6).cast("long")).cast("double")
                / F.count("*")
            )
            / 1e6
            + F.lit(0.0)
        ).alias("excess_loss"),
    )
    # cut lineage at the |sources|-row frame: the two scalar
    # normalizations below reference it multiplicatively (src, tot(src),
    # w0(src,tot), tot2(w0), final(w0,tot2)) and would re-derive the whole
    # corpus diamond 4x without this
    src = src.localCheckpoint()
    # normalizations via broadcast one-row aggregates (the scalar-subquery
    # shape), not a partitionBy()-less window — same values, no
    # single-partition WindowExec over the source frame
    tot = src.agg(F.sum("n_docs").alias("__td"))
    w0 = (
        src.crossJoin(F.broadcast(tot))
        .withColumn("__share", F.col("n_docs") / F.col("__td"))
        .withColumn(
            "__un",
            F.col("__share") * F.exp(F.lit(eta) * F.col("excess_loss")),
        )
    )
    tot2 = w0.agg(F.sum("__un").alias("__tu"))
    return w0.crossJoin(F.broadcast(tot2)).select(
        source_col,
        "n_docs",
        # share is n/total — a small-denominator rational that CAN sit
        # exactly on a 6dp round tie; floor-quantize (no tie to break).
        # weight stays round(): its inputs pass through exp(), a continuum
        # map whose outputs hit a 6dp boundary with measure ~0
        (F.floor(F.col("__share") * 1e6) / 1e6).alias("baseline_share"),
        "excess_loss",
        F.round(F.col("__un") / F.col("__tu"), 6).alias("weight"),
    )


def kcenter_coreset(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dist_decimals: int = 6,
) -> DataFrame:
    """Greedy k-center coreset selection (Sener & Savarese 2018, the
    core-set approach to data selection): pick k examples maximizing
    coverage of the embedding space — each round adds the point FARTHEST
    (max-min cosine distance) from the centers chosen so far. The greedy
    chain is a 2-approximation of the optimal k-center cover, and the
    published recipe for diversity-first subset selection.

    Deterministic contract (shared by the oracle): center 1 = lowest id;
    d(x, c) = round(1 - cosine(x, c), dist_decimals); the min-distance
    column updates by least(); the next center is argmax(min_dist) with
    ties to the lowest id.

    Returns k rows: (step, center_id, radius) where radius = the k-center
    objective (max over the corpus of its distance to the nearest chosen
    center) AFTER adding that step's center — the coverage curve that
    tells you where extra centers stop paying.

    Scale (100 TB): the driver holds only the k x dim chosen centers
    (same contract as kmeans_fit). Each round is ONE action: a narrow
    projection tower over the scan (chosen centers are compiled in as
    literals — no join, no shuffle) reduced by a single
    max / max_by(struct) aggregate, so the total cost is k columnar
    scans with map-side-combined aggregation and nothing corpus-sized is
    ever materialized, shuffled, or collected.
    """
    from yaml_pipe_spark.functions.vectors import cosine

    spark = df.sparkSession
    base = df.select(id_col, vec_col)
    first = base.orderBy(F.col(id_col)).limit(1).collect()[0]
    centers = [(1, int(first[0]), [float(x) for x in first[1]])]

    def _dist(cv: list[float]):
        return F.round(
            F.lit(1.0) - cosine(F.col(vec_col), F.lit(cv)), dist_decimals
        )

    cur = base.withColumn("__mind", _dist(centers[0][2]))
    out_rows = []
    for step in range(1, k + 1):
        agg = cur.agg(
            F.max("__mind").alias("radius"),
            F.max_by(
                F.struct(
                    F.col(id_col).alias("nid"), F.col(vec_col).alias("nv")
                ),
                F.struct(F.col("__mind"), (-F.col(id_col)).alias("ni")),
            ).alias("nxt"),
        ).collect()[0]
        out_rows.append(
            (step, centers[-1][1], float(agg["radius"]))
        )
        if step < k:
            nxt = agg["nxt"]
            cv = [float(x) for x in nxt["nv"]]
            centers.append((step + 1, int(nxt["nid"]), cv))
            cur = cur.withColumn(
                "__mind", F.least(F.col("__mind"), _dist(cv))
            )
    return spark.createDataFrame(
        out_rows, "step long, center_id long, radius double"
    )


def unimax_allocation(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    epoch_cap: float = 2.0,
    budget_factor: float = 1.9,
) -> DataFrame:
    """UniMax source mixing (Chung et al. 2023, arXiv:2304.09151): spread a
    token budget as uniformly as possible across sources subject to a hard
    per-source cap of `epoch_cap` epochs — the closed-form waterfill. Sort
    sources by capacity ascending; a source is capped iff granting every
    not-yet-decided source at least its own capacity still fits the budget
    (csum_i + (n-i)*cap_i <= B, monotone under the ascending order, so the
    capped set is a prefix); survivors split the remainder evenly.
    Complements temperature_mix (UniMax never over-repeats the tail beyond
    the epoch cap) and doremi_source_weights (no proxy-model signal needed).

    budget = budget_factor * total corpus tokens; with budget_factor <
    epoch_cap at least one source stays uncapped, so the waterfill split
    is always well-defined. Returns (source, toks, alloc). The per-source
    frame is source-cardinality-sized (thousands of rows at 100 TB), so
    the single-partition window over it is deliberate and bounded; the
    only corpus-scale work is the token-count aggregate."""
    if budget_factor >= epoch_cap:
        raise ValueError(
            "budget_factor must be < epoch_cap (otherwise every source is "
            "capped and there is no uniform remainder to split)"
        )
    cap = (
        docs.groupBy(source_col)
        .agg(F.sum(F.size(tokens(F.col(text_col)))).cast("double").alias("toks"))
        # a zero-token source has cap 0 and alloc 0, and downstream
        # epochs-style divisions by toks diverge across engines (Spark /
        # yields NULL on a zero divisor, IEEE engines yield NaN) — it
        # contributes nothing to the waterfill, so drop it up front
        .filter(F.col("toks") > 0)
        .withColumn("cap", F.lit(float(epoch_cap)) * F.col("toks"))
    )
    tot = cap.agg(
        (F.lit(float(budget_factor)) * F.sum("toks")).alias("budget"),
        F.count("*").alias("n"),
    )
    w = W.orderBy("cap", source_col)
    ordd = cap.select(
        source_col,
        "toks",
        "cap",
        F.row_number().over(w).alias("i"),
        F.sum("cap")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("csum"),
    ).crossJoin(F.broadcast(tot))
    k = ordd.filter(
        F.col("csum") + (F.col("n") - F.col("i")) * F.col("cap")
        <= F.col("budget")
    ).agg(
        F.coalesce(F.max("i"), F.lit(0)).alias("kk"),
        F.coalesce(F.max("csum"), F.lit(0.0)).alias("csum_k"),
    )
    alloc = F.when(F.col("i") <= F.col("kk"), F.col("cap")).otherwise(
        (F.col("budget") - F.col("csum_k")) / (F.col("n") - F.col("kk"))
    )
    return ordd.crossJoin(F.broadcast(k)).select(
        source_col, "toks", alloc.alias("alloc")
    )
