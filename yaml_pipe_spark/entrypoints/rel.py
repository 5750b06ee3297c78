"""Relational / TPC-H-shaped analytics over orders-lineitem-customer (rel_*, agg_*, flagship)."""

# Split from the original entrypoints.py monolith (round 11);
# blocks keep their original relative order.

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from yaml_pipe_spark.functions.hashing import sha256_text
from yaml_pipe_spark.operators.chunkers import fixed_window_chunks, markdown_chunks
from yaml_pipe_spark.tables import load_table

from yaml_pipe_spark.entrypoints._shared import (
    fq_unit_mean,
    register,
)


# ---------------------------------------------------------------------------
# Flagship (M0): scan -> empty-filter -> fixed-window chunk -> hash -> agg
# Exercises S1 (scan+filter, sources.py:94-96), C1 (chunking, chunkers.py:39-87),
# T1 (content hash, state_manager.py:141-147) in one plan.
# ---------------------------------------------------------------------------

FLAGSHIP_ORACLE = """
WITH docs AS (
  SELECT doc_id, lang, text FROM documents WHERE length(trim(text, e' \n\r\t')) > 0
),
starts AS (
  SELECT doc_id, lang, text,
         UNNEST(generate_series(1, length(text), 160)) AS s
  FROM docs
),
chunks AS (
  SELECT doc_id, lang, substr(text, CAST(s AS INT), 200) AS chunk FROM starts
)
SELECT lang,
       count(*) AS n_chunks,
       count(DISTINCT doc_id) AS n_docs,
       count(DISTINCT sha256(chunk)) AS n_uniq_chunks,
       round(avg(length(chunk)), 4) AS avg_chunk_len
FROM chunks
GROUP BY lang
"""


@register("flagship", FLAGSHIP_ORACLE, "M0: scan+filter+chunk+hash+agg per lang")
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    chunks = fixed_window_chunks(docs, "text", chunk_size=200, chunk_overlap=40)
    return chunks.groupBy("lang").agg(
        F.count("*").alias("n_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.countDistinct(sha256_text(F.col("chunk"))).alias("n_uniq_chunks"),
        F.round(F.avg(F.length("chunk")), 4).alias("avg_chunk_len"),
    )


# ---------------------------------------------------------------------------
# Relational kernel: TPC-H-style scan/agg, window top-k, multi-join
# (driver-added star schema, FIXTURES.md §5 — backs the operator inventory's
# scan/filter/agg/join/window claims at scale)
# ---------------------------------------------------------------------------


@register(
    "rel_pricing_summary",
    """
-- float-hazard hardening (round-9 sweep): every money/rate column is a 2dp
-- grid value stored as double (representation error <= 1e-9, measured), so
-- all sums run over EXACT integer cent-units (DuckDB HUGEINT, Spark
-- decimal(38,0) where products reach 1e-6 units) — fold-order-exact in both
-- engines. Derived outputs are half-up-rounded / floor-quantized via exact
-- integer arithmetic: a double round(sum(...), 2) can land within an ulp of
-- a half-cent where engine fold orders and round tie rules disagree.
WITH u AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS BIGINT) AS qty_u,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_u,
         CAST(round(l_discount * 100) AS BIGINT) AS disc_u,
         CAST(round(l_tax * 100) AS BIGINT) AS tax_u
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
),
s AS (
  SELECT l_returnflag, l_linestatus, count(*) AS n,
         sum(qty_u) AS sq, sum(price_u) AS sp, sum(disc_u) AS sd,
         sum(price_u * (100 - disc_u)) AS s4,
         sum(price_u * (100 - disc_u) * (100 + tax_u)) AS s6
  FROM u GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       CAST(sq AS DOUBLE) AS sum_qty,
       CAST(sp AS DOUBLE) / 100 AS sum_base_price,
       CAST((s4 + 50) // 100 AS DOUBLE) / 100 AS sum_disc_price,
       CAST((s6 + 5000) // 10000 AS DOUBLE) / 100 AS sum_charge,
       floor(CAST(sq AS DOUBLE) * 10000 / n) / 10000 AS avg_qty,
       floor(CAST(sp AS DOUBLE) * 100 / n) / 10000 AS avg_price,
       floor(CAST(sd AS DOUBLE) * 100 / n) / 10000 AS avg_disc,
       n AS count_order
FROM s
""",
    "TPC-H Q1-style pricing summary (scan+filter+groupBy+8 aggs); all "
    "aggregates over exact integer cent-units so both engines fold "
    "identically at any parallelism (round-9 float-hazard sweep)",
)
def q_rel_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty_u = F.col("l_quantity").cast("long")
    # floor(x*100 + 0.5), not F.round: the money columns sit within 1e-9
    # of the 2dp grid, so x*100 is within 1e-7 of its integer and the two
    # forms recover IDENTICAL units (verified value-equal at sf0.1) for
    # these nonnegative values — but floor stays a primitive double op in
    # whole-stage codegen while Round routes through BigDecimal.setScale,
    # measured ~0.1s/rep on this row's six per-row unit derivations
    price_u = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    disc_u = F.floor(F.col("l_discount") * 100 + 0.5).cast("long")
    tax_u = F.floor(F.col("l_tax") * 100 + 0.5).cast("long")
    dec = "decimal(38,0)"
    # units are pre-projected once below the aggregate (measured
    # 0.41s -> 0.37s at sf0.1, round 9)
    pre = li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        qty_u.alias("qu"),
        price_u.alias("pu"),
        disc_u.alias("du"),
        tax_u.alias("tu"),
    )
    pu, du, tu = F.col("pu"), F.col("du"), F.col("tu")
    # Exactness WITHOUT the decimal aggregation premium (round-10 ask #5,
    # measured ~1.3x on this row in round 9): every sum stays a LONG sum
    # inside whole-stage codegen, with overflow bounds documented against
    # the declared 100 TB (SF1000) target —
    #   s4 = sum(pu*(100-du)):   per-term <= 1.05e9 (price <= ~$105k),
    #        rows/group at SF1000 ~1.8e9 -> s4 <= 1.9e18 < 2^63 (the long
    #        bound holds to ~SF4800);
    #   s6 = sum(pu*(100-du)*(100+tu)): per-term <= 1.15e11 overflows long
    #        near SF80, so it is summed as a SPLIT pair — hi = term >> 30
    #        (<= 107), lo = term & (2^30-1) — each a long sum safe past
    #        SF4000, recombined exactly in decimal on the 4 result rows.
    # DuckDB's HUGEINT sums are exact regardless, so the values (and the
    # oracle hash) are unchanged from the decimal(38,0) formulation.
    q6 = pu * (100 - du) * (100 + tu)
    s = pre.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum("qu").alias("sq"),
        F.sum("pu").alias("sp"),
        F.sum("du").alias("sd"),
        F.sum(pu * (100 - du)).alias("s4"),
        F.sum(F.shiftright(q6, 30)).alias("s6h"),
        F.sum(q6.bitwiseAND(F.lit((1 << 30) - 1))).alias("s6l"),
    )
    n = F.col("n")
    s6 = F.col("s6h").cast(dec) * F.lit(1 << 30) + F.col("s6l")
    return s.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sq").cast("double").alias("sum_qty"),
        (F.col("sp").cast("double") / 100).alias("sum_base_price"),
        # half-up to cents in EXACT integer arithmetic: (units + half) div
        # grid — long `div` for s4; for the recombined s6, Spark decimal
        # division is exact at scale 6 for these quotients, so floor()
        # recovers the integer division DuckDB's // performs on HUGEINT
        (
            F.expr("(s4 + 50) div 100").cast("double") / 100
        ).alias("sum_disc_price"),
        (
            F.floor((s6 + 5000) / 10000).cast("double") / 100
        ).alias("sum_charge"),
        (F.floor(F.col("sq").cast("double") * 10000 / n) / 10000).alias(
            "avg_qty"
        ),
        (F.floor(F.col("sp").cast("double") * 100 / n) / 10000).alias(
            "avg_price"
        ),
        (F.floor(F.col("sd").cast("double") * 100 / n) / 10000).alias(
            "avg_disc"
        ),
        n.alias("count_order"),
    )


@register(
    "rel_top3_orders_per_priority",
    """
SELECT o_orderpriority, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
    "Top-K per group via window (deterministic tiebreak on o_orderkey)",
)
def q_rel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@register(
    "rel_nation_revenue",
    """
SELECT n.n_name AS nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
""",
    "Multi-join revenue rollup; nation broadcast, fact-fact shuffle join",
)
def q_rel_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Relational extras: pivot, rollup, anti-join, scalar subquery
# ---------------------------------------------------------------------------

_PRIORITIES = {
    "1-URGENT": "urgent",
    "2-HIGH": "high",
    "3-MEDIUM": "medium",
    "4-NOT SPECIFIED": "not_specified",
    "5-LOW": "low",
}


@register(
    "rel_pivot_status_priority",
    "SELECT o_orderstatus, "
    + ", ".join(
        f"CAST(sum(CASE WHEN o_orderpriority = '{v}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS {alias}"
        for v, alias in _PRIORITIES.items()
    )
    + " FROM orders GROUP BY o_orderstatus",
    "Pivot: order counts by status x priority",
)
def q_rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", list(_PRIORITIES))
        .count()
    )
    return piv.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("long").alias(alias)
            for v, alias in _PRIORITIES.items()
        ],
    )


@register(
    "rel_rollup_lineitem",
    """
SELECT l_returnflag, l_linestatus,
       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    "ROLLUP grouping sets with subtotals and grand total",
)
def q_rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


# (rel_shipping_priority is registered ONCE, in the TPC-H analog sweep
# further down — the integer-cent Q3 analog. An earlier rounded-revenue
# registration here was deleted in round 7: dict-last-wins registration
# made it silently dead, and @register now raises on duplicate names.)


@register(
    "rel_orders_with_big_lineitems",
    """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
GROUP BY o_orderpriority
""",
    "Semi-join (EXISTS): orders with at least one near-max-quantity item",
)
def q_rel_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    big = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 49)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        orders.join(big, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "rel_moving_30d_revenue",
    """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey
         ORDER BY date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS rev_30d
FROM orders
""",
    "Value-based RANGE window frame: per-customer trailing-30-day revenue",
)
def q_rel_moving_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "__day",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")),
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("__day"))
        .rangeBetween(-30, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("rev_30d"),
    )


@register(
    "rel_region_customer_rollup",
    """
SELECT r.r_name AS region, n.n_name AS nation,
       count(*) AS n_customers, round(sum(c.c_acctbal), 2) AS total_balance
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
    "Region-nation customer rollup: snowflake dim chain, both dims broadcast",
)
def q_rel_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
    )


@register(
    "rel_part_brand_stats",
    """
-- mean over EXACT integer cent-units, floor-quantized (round-9 hazard
-- sweep): p_retailprice is a 2dp grid value, so avg() can land exactly on
-- a 4dp round boundary where engine fold orders disagree
SELECT p_brand,
       split_part(p_type, ' ', 1) AS type_family,
       count(*) AS n_parts,
       floor(CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS DOUBLE)
             * 100 / count(*)) / 10000 AS avg_price,
       CAST(max(p_size) AS BIGINT) AS max_size
FROM part GROUP BY p_brand, split_part(p_type, ' ', 1)
""",
    "Part catalog stats: string-derived grouping key (split_part) + aggs; "
    "the price mean runs over exact integer cent-units (round-9 sweep)",
)
def q_rel_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    fam = F.split_part(F.col("p_type"), F.lit(" "), F.lit(1))
    return part.groupBy("p_brand", fam.alias("type_family")).agg(
        F.count("*").alias("n_parts"),
        fq_unit_mean(F.col("p_retailprice"), 2, 4, F.count("*")).alias(
            "avg_price"
        ),
        F.max("p_size").cast("long").alias("max_size"),
    )


@register(
    "rel_cube_flag_status",
    """
-- mean over EXACT integer cent-units, floor-quantized (round-9 hazard
-- sweep): l_discount is a 2dp grid value, so avg() can land exactly on a
-- 4dp round boundary where engine fold orders disagree
SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       floor(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
             * 100 / count(*)) / 10000 AS avg_disc
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    "CUBE grouping sets: all 4 combinations of subtotals in one pass; the "
    "discount mean runs over exact integer cent-units (round-9 sweep)",
)
def q_rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # pre-project the cent units BELOW the cube: CUBE's Expand node
    # replicates every row once per grouping set, so an expression left
    # inside the aggregate is evaluated 4x per input row (measured
    # 0.47s -> 0.38s at sf0.1 from this hoist)
    pre = li.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_u"),
    )
    n = F.count("*")
    return pre.cube("l_returnflag", "l_linestatus").agg(
        n.alias("n"),
        (F.floor(F.sum("disc_u").cast("double") * 100 / n) / 1e4).alias(
            "avg_disc"
        ),
    )


@register(
    "rel_customers_without_orders",
    """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1998-01-01')
GROUP BY c_mktsegment
""",
    "Anti-join: customers that never ordered, by segment",
)
def q_rel_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        cust.join(orders, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "rel_suppliers_above_avg",
    """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_acctbal > (SELECT avg(s_acctbal) FROM supplier)
""",
    "Scalar subquery: suppliers above the global average balance",
)
def q_rel_scalar_sub(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    avg_bal = sup.agg(F.avg("s_acctbal").alias("a"))
    return (
        sup.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("s_acctbal") > F.col("a"))
        .select("s_suppkey", "s_name", "s_acctbal")
    )


# ---------------------------------------------------------------------------
# Relational set operations: INTERSECT / EXCEPT / UNION (distinct semantics)
# ---------------------------------------------------------------------------


@register(
    "rel_set_ops",
    """
WITH a AS (
  SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
),
b AS (SELECT o_custkey AS key FROM orders WHERE o_totalprice > 150000)
SELECT 'intersect' AS op, count(*) AS n FROM (SELECT * FROM a INTERSECT
                                              SELECT * FROM b)
UNION ALL
SELECT 'except' AS op, count(*) AS n FROM (SELECT * FROM a EXCEPT
                                           SELECT * FROM b)
UNION ALL
SELECT 'union' AS op, count(*) AS n FROM (SELECT * FROM a UNION
                                          SELECT * FROM b)
""",
    "Set operations over customer keys: INTERSECT/EXCEPT/UNION distinct",
)
def q_rel_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("key"))
    )
    b = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("key"))
    )
    parts = [
        a.intersect(b).agg(
            F.lit("intersect").alias("op"), F.count("*").alias("n")
        ),
        a.subtract(b).agg(F.lit("except").alias("op"), F.count("*").alias("n")),
        a.union(b).distinct().agg(
            F.lit("union").alias("op"), F.count("*").alias("n")
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Skew mitigation (100 TB story): salted two-phase agg + salted replicate
# join — plan rewrites with identical results, so plain-SQL oracles apply
# ---------------------------------------------------------------------------


@register(
    "agg_salted_user_totals",
    """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value,
       max(value) AS max_value
FROM events GROUP BY user_id
""",
    "Salted two-phase aggregation (groupBy key+salt, then merge): result "
    "identical to a plain groupBy, hot keys spread over 8 reducers",
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events")
    out = salted_aggregate(
        ev,
        ["user_id"],
        {
            "n_events": (F.count("*"), F.sum),
            "__sv": (F.sum("value"), F.sum),
            "max_value": (F.max("value"), F.max),
        },
        salt_col=F.col("event_id"),
        n_salts=8,
    )
    return out.select(
        "user_id",
        "n_events",
        F.round(F.col("__sv"), 2).alias("sum_value"),
        "max_value",
    )


@register(
    "rel_salted_join",
    """
SELECT c.c_mktsegment, count(*) AS n_events, round(sum(e.value), 2) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
    "Salted replicate join (salt big side, explode small side): row set "
    "identical to the plain equi-join",
)
def q_rel_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").withColumn(
        "c_custkey", F.col("user_id")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = salted_join(
        ev, cust, "c_custkey", n_salts=8, salt_source=F.col("event_id")
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "rel_pareto_revenue",
    """
WITH cust AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
thr AS (SELECT quantile_cont(cents, 0.99) AS t FROM cust)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN cents >= t THEN 1 ELSE 0 END) AS BIGINT)
         AS n_top,
       floor(CAST(sum(CASE WHEN cents >= t THEN cents ELSE 0 END) AS DOUBLE)
             / CAST(sum(cents) AS DOUBLE) * 1000000) / 1000000 AS top_share,
       floor(max(t)) / 100 AS threshold
FROM cust, thr
""",
    "Pareto concentration: the share of total order revenue carried by "
    "customers at or above the p99 per-customer spend — the concentration "
    "number behind tiering and load-skew expectations. Per-customer spend "
    "is summed in INTEGER CENTS so cross-partition float fold order can "
    "never move a customer across the interpolated threshold (the classic "
    "way this query flakes between engines); one customer-key shuffle, "
    "3-value broadcast back.",
)
def q_rel_pareto_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    thr = cust.agg(F.percentile("cents", F.lit(0.99)).alias("t"))
    j = cust.crossJoin(F.broadcast(thr))
    return j.agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum((F.col("cents") >= F.col("t")).cast("long")).alias("n_top"),
        # integer-ratio floor-quantize + integer-cent threshold floor
        # (round-9 hazard sweep): the share is a ratio of exact integer
        # cent sums that can sit exactly on a 6dp round tie, and the
        # interpolated threshold can carry a .5-cent fraction
        (
            F.floor(
                F.sum(
                    F.when(
                        F.col("cents") >= F.col("t"), F.col("cents")
                    ).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("cents").cast("double")
                * 1e6
            )
            / 1e6
        ).alias("top_share"),
        (F.floor(F.max("t")) / 100).alias("threshold"),
    )


@register(
    "rel_revenue_trend",
    """
WITH daily AS (
  SELECT o_orderpriority,
         date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS x,
         count(*) AS y
  FROM orders GROUP BY 1, 2
),
m AS (
  SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM daily GROUP BY 1
)
SELECT o_orderpriority,
       n AS n_days,
       round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 8) AS slope,
       round((sy - (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) * sx)
             / n, 6) AS intercept
FROM m
""",
    "Daily order-count trend per priority: ordinary-least-squares slope "
    "and intercept computed from EXACT INTEGER MOMENTS (n, Σx, Σy, Σxy, "
    "Σx² over day-index/count pairs) — integer sums are "
    "summation-order-independent, so the regression is bit-deterministic "
    "across engines and partitionings, unlike regr_slope over raw "
    "doubles. The trend audit a pipeline owner reads for drift; two "
    "aggregations, both riding one orders shuffle.",
)
def q_rel_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        "o_orderpriority",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("x"),
    ).agg(F.count("*").alias("y"))
    m = daily.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) * 1.0 / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        "o_orderpriority",
        F.col("n").alias("n_days"),
        F.round(slope, 8).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


@register(
    "rel_join_key_skew",
    """
WITH cnt_li AS (
  SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1
),
cnt_ord AS (
  SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1
),
m_li AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
         CAST(max(c) AS BIGINT) AS max_cnt FROM cnt_li
),
m_ord AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
         CAST(max(c) AS BIGINT) AS max_cnt FROM cnt_ord
),
h_li AS (SELECT c, count(*) AS f FROM cnt_li GROUP BY c),
h_ord AS (SELECT c, count(*) AS f FROM cnt_ord GROUP BY c),
cum_li AS (
  SELECT c, sum(f) OVER (ORDER BY c) AS cum FROM h_li
),
cum_ord AS (
  SELECT c, sum(f) OVER (ORDER BY c) AS cum FROM h_ord
),
p_li AS (
  SELECT CAST(min(CASE WHEN cum >= ceil(0.5 * m.n_keys) THEN c END) AS BIGINT) AS p50_cnt,
         CAST(min(CASE WHEN cum >= ceil(0.99 * m.n_keys) THEN c END) AS BIGINT) AS p99_cnt
  FROM cum_li, m_li m
),
p_ord AS (
  SELECT CAST(min(CASE WHEN cum >= ceil(0.5 * m.n_keys) THEN c END) AS BIGINT) AS p50_cnt,
         CAST(min(CASE WHEN cum >= ceil(0.99 * m.n_keys) THEN c END) AS BIGINT) AS p99_cnt
  FROM cum_ord, m_ord m
)
SELECT 'lineitem.l_orderkey' AS rel, m.n_keys, m.n_rows, m.max_cnt,
       round(m.max_cnt / m.n_rows, 6) AS top1_share, p.p50_cnt, p.p99_cnt,
       round(m.max_cnt / p.p50_cnt, 2) AS skew_ratio
FROM m_li m, p_li p
UNION ALL
SELECT 'orders.o_custkey' AS rel, m.n_keys, m.n_rows, m.max_cnt,
       round(m.max_cnt / m.n_rows, 6) AS top1_share, p.p50_cnt, p.p99_cnt,
       round(m.max_cnt / p.p50_cnt, 2) AS skew_ratio
FROM m_ord m, p_ord p
""",
    "Join-key skew audit for the two big-join key families: per key, row "
    "counts roll into (n_keys, max, top-1 share, exact p50/p99 of the "
    "per-key distribution, max/p50 skew ratio) — the measurement that "
    "decides whether a join needs salting/AQE skew handling BEFORE it "
    "falls over. The order statistics come from a count-of-counts "
    "histogram cumulated over the tiny distinct-count frame (never a "
    "window over all keys), so the audit itself scales to 100 TB; "
    "kth-smallest with k = ceil(q * n_keys) is pinned identically in "
    "both engines.",
)
def q_rel_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    def skew_row(df: DataFrame, key: str, label: str) -> DataFrame:
        from pyspark.sql import Window as W

        cnts = df.groupBy(F.col(key).alias("k")).agg(
            F.count("*").alias("c")
        )
        hist = cnts.groupBy("c").agg(F.count("*").alias("f"))
        cum = hist.withColumn(
            "cum",
            F.sum("f").over(
                W.orderBy("c").rowsBetween(W.unboundedPreceding, 0)
            ),
        )
        stats = cnts.agg(
            F.count("*").alias("n_keys"),
            F.sum("c").alias("n_rows"),
            F.max("c").alias("max_cnt"),
        )
        j = cum.crossJoin(F.broadcast(stats))
        pct = j.agg(
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(0.5 * F.col("n_keys")), F.col("c")
                )
            ).alias("p50_cnt"),
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(0.99 * F.col("n_keys")), F.col("c")
                )
            ).alias("p99_cnt"),
        )
        return stats.crossJoin(F.broadcast(pct)).select(
            F.lit(label).alias("rel"),
            F.col("n_keys").cast("long"),
            F.col("n_rows").cast("long"),
            F.col("max_cnt").cast("long"),
            F.round(F.col("max_cnt") / F.col("n_rows"), 6).alias("top1_share"),
            F.col("p50_cnt").cast("long"),
            F.col("p99_cnt").cast("long"),
            F.round(F.col("max_cnt") / F.col("p50_cnt"), 2).alias("skew_ratio"),
        )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rows = [
        skew_row(li, "l_orderkey", "lineitem.l_orderkey"),
        skew_row(orders, "o_custkey", "orders.o_custkey"),
    ]
    return reduce(lambda a, b: a.unionByName(b), rows)


# ---------------------------------------------------------------------------
# Relational analytics extras: exact percentiles, lead/lag gaps, ntile,
# typed JSON extraction
# ---------------------------------------------------------------------------


@register(
    "rel_percentiles",
    """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
       round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
FROM lineitem GROUP BY l_returnflag
""",
    "Exact interpolated percentiles per group (Spark percentile = "
    "DuckDB quantile_cont, both linear interpolation)",
)
def q_rel_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # one percentile buffer per column (array of fractions), not one per
    # fraction — halves the sort/buffer work in the aggregate
    out = li.groupBy("l_returnflag").agg(
        F.percentile(
            "l_quantity", F.array(F.lit(0.5), F.lit(0.9))
        ).alias("__q"),
        F.percentile(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.99))
        ).alias("__p"),
    )
    return out.select(
        "l_returnflag",
        F.round(F.element_at("__q", 1), 4).alias("p50_qty"),
        F.round(F.element_at("__q", 2), 4).alias("p90_qty"),
        F.round(F.element_at("__p", 1), 4).alias("p50_price"),
        F.round(F.element_at("__p", 2), 4).alias("p99_price"),
    )


@register(
    "rel_order_gaps",
    """
WITH th AS (
  SELECT round(quantile_cont(o_totalprice, 0.25), 4) AS q25,
         round(quantile_cont(o_totalprice, 0.50), 4) AS q50,
         round(quantile_cont(o_totalprice, 0.75), 4) AS q75
  FROM orders
)
SELECT o_custkey, o_orderkey,
       date_diff('day',
                 lag(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey),
                 o_orderdate) AS gap_days,
       CAST(CASE WHEN o_totalprice >= q75 THEN 1
                 WHEN o_totalprice >= q50 THEN 2
                 WHEN o_totalprice >= q25 THEN 3
                 ELSE 4 END AS BIGINT) AS price_quartile
FROM orders, th
""",
    "Customer reorder gaps (lag + datediff) and global price quartiles via "
    "broadcast percentile thresholds (no single-partition ntile window)",
)
def q_rel_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quartile-by-threshold instead of ntile(4) OVER (ORDER BY ...): a global
    # ORDER BY window serializes the whole table through one reducer, while
    # the three thresholds come from one shuffle-free partial aggregate and
    # broadcast back. Boundary rule: ties at a threshold land in the richer
    # quartile on both engines. Spark `percentile` and DuckDB `quantile_cont`
    # both interpolate linearly (type-7); thresholds are rounded to 4 decimals
    # on both sides so last-bit arithmetic differences can't flip a bucket.
    # All three fractions share ONE percentile buffer (array argument) — three
    # separate percentile() calls each sort their own copy of the column,
    # which is what made the r2 version 2.17x the r1 time.
    # At 100 TB swap percentile -> approx_percentile (mergeable t-digest);
    # the comparison structure stays identical.
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    th = orders.agg(
        F.percentile(
            "o_totalprice", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75))
        ).alias("__t")
    ).select(
        F.round(F.element_at("__t", 1), 4).alias("q25"),
        F.round(F.element_at("__t", 2), 4).alias("q50"),
        F.round(F.element_at("__t", 3), 4).alias("q75"),
    )
    w_cust = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w_cust)
            ).alias("gap_days"),
            "o_totalprice",
        )
        .crossJoin(F.broadcast(th))
        .select(
            "o_custkey",
            "o_orderkey",
            "gap_days",
            F.when(F.col("o_totalprice") >= F.col("q75"), F.lit(1))
            .when(F.col("o_totalprice") >= F.col("q50"), F.lit(2))
            .when(F.col("o_totalprice") >= F.col("q25"), F.lit(3))
            .otherwise(F.lit(4))
            .cast("long")
            .alias("price_quartile"),
        )
    )


# ---------------------------------------------------------------------------
# Correlated-subquery / decision-support patterns (TPC-H Q17/Q18/Q21/Q22/Q8
# analogs over the synthetic tables). These generalize the reference's only
# subquery-shaped logic (the hit-rate EXISTS scan, evaluation.py:89-95) into
# the full decorrelated-join repertoire: scalar-subquery broadcast, HAVING on
# a grouped fact, double-grouped EXISTS/NOT-EXISTS, and window-over-agg
# ratios. Each decorrelates the subquery into an explicit join so the 100 TB
# plan is a bounded number of shuffles instead of a per-row probe.
# ---------------------------------------------------------------------------


@register(
    "rel_small_qty_revenue",
    """
WITH qlim AS (
  SELECT l_partkey, 0.5 * avg(l_quantity) AS qlim FROM lineitem GROUP BY 1
),
small AS (
  SELECT l.l_partkey, count(*) AS n, sum(l_extendedprice) AS rev
  FROM lineitem l JOIN qlim USING (l_partkey)
  WHERE l.l_quantity < qlim
  GROUP BY 1
)
SELECT p_brand,
       CAST(sum(n) AS BIGINT) AS n_small_lineitems,
       round(sum(rev), 2) AS small_qty_revenue
FROM small JOIN part ON p_partkey = l_partkey
GROUP BY p_brand
""",
    "TPC-H Q17 analog: revenue from below-half-average-quantity lineitems "
    "per brand; the correlated avg subquery decorrelates into a per-part agg "
    "joined back on l_partkey",
)
def q_rel_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale shape: the per-part avg is |part| rows (lineitem/30); both the
    # self-join and the brand join hash on partkey, so AQE coalesces one
    # shuffle. Partial agg per partkey BEFORE the part join shrinks the
    # probe side to |part| rows.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    qlim = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("qlim")
    )
    small = (
        li.join(qlim, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qlim"))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n"), F.sum("l_extendedprice").alias("rev"))
    )
    return (
        small.join(part, small.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum("n").cast("long").alias("n_small_lineitems"),
            F.round(F.sum("rev"), 2).alias("small_qty_revenue"),
        )
    )


@register(
    "rel_large_volume_customers",
    """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       round(sum_qty, 2) AS sum_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
""",
    "TPC-H Q18 analog: large-volume orders (HAVING on a grouped fact) "
    "joined back to orders and customer",
)
def q_rel_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The HAVING filter runs on the grouped fact BEFORE the joins, so only
    # the ~5% qualifying orderkeys reach the shuffle joins; map-side partial
    # aggregation bounds the first shuffle.
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


@register(
    "rel_waiting_suppliers",
    """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 365 DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
),
per_sup AS (
  SELECT l_orderkey, l_suppkey, max(late) AS sup_late
  FROM li GROUP BY 1, 2
),
per_ord AS (
  SELECT l_orderkey, count(*) AS n_sups, sum(sup_late) AS n_late
  FROM per_sup GROUP BY 1
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_sup
JOIN per_ord USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE sup_late = 1 AND n_late = 1 AND n_sups > 1
GROUP BY s_name
""",
    "TPC-H Q21 analog: suppliers who were the ONLY late shipper in a "
    "multi-supplier finished order (EXISTS + NOT-EXISTS decorrelated into "
    "two stacked groupings on the same key)",
)
def q_rel_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both groupings and the self-join hash on l_orderkey — one shuffle
    # lineage reused end-to-end; supplier is the broadcast dim.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        # interval arithmetic (not date_add): preserves time-of-day so the
        # comparison matches the oracle's `+ INTERVAL 365 DAY` exactly even
        # for non-midnight timestamps
        F.when(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS"),
            1,
        ).otherwise(0).alias("late"),
    )
    per_sup = joined.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("sup_late")
    )
    per_ord = per_sup.groupBy("l_orderkey").agg(
        F.count("*").alias("n_sups"), F.sum("sup_late").alias("n_late")
    )
    return (
        per_sup.join(per_ord, "l_orderkey")
        .filter(
            (F.col("sup_late") == 1)
            & (F.col("n_late") == 1)
            & (F.col("n_sups") > 1)
        )
        .join(F.broadcast(sup), per_sup.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
    )


@register(
    "rel_sales_opportunity",
    """
WITH thr AS (SELECT avg(c_acctbal) AS thr FROM customer WHERE c_acctbal > 0),
mxo AS (SELECT max(o_orderdate) AS mxd FROM orders),
recent AS (
  SELECT DISTINCT o_custkey FROM orders, mxo
  WHERE o_orderdate >= mxd - INTERVAL 180 DAY
)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer, thr, nation
WHERE n_nationkey = c_nationkey
  AND c_acctbal > thr
  AND NOT EXISTS (SELECT 1 FROM recent WHERE o_custkey = c_custkey)
GROUP BY n_name
""",
    "TPC-H Q22 analog: per nation, rich customers with no order in the "
    "trailing 180 days — two scalar-subquery broadcasts + anti-join (the "
    "T2 change-detection join, state_manager.py:155-178, in "
    "decision-support clothing)",
)
def q_rel_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    thr = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("thr")
    )
    mxo = orders.agg(F.max("o_orderdate").alias("mxd"))
    recent = (
        orders.crossJoin(F.broadcast(mxo))
        .filter(F.col("o_orderdate") >= F.date_sub(F.col("mxd"), 180))
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "rel_market_share",
    """
-- round-10 hazard sweep: revenue is a 1e-4-grid product (2dp price x 2dp
-- discount), so sums run over EXACT integer 1e-4-units (HUGEINT /
-- decimal(38,0)); nation_rev half-up-rounds in integer arithmetic and the
-- share — a ratio of integers with reachable 6dp ties — floor-quantizes
WITH rev AS (
  SELECT r_name, n_name,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS s4
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  GROUP BY 1, 2
)
SELECT r_name, n_name,
       CAST((s4 + 50) // 100 AS DOUBLE) / 100 AS nation_rev,
       floor(CAST(s4 AS DOUBLE) * 1000000
             / CAST(sum(s4) OVER (PARTITION BY r_name) AS DOUBLE)) / 1000000
         AS region_share
FROM rev
""",
    "TPC-H Q8 analog: each supplier-nation's revenue share within its "
    "region — star join into a window-over-aggregate ratio, all sums over "
    "exact integer 1e-4-units (round-10 float-hazard sweep)",
)
def q_rel_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    # Star-join shape: the fact shuffles once on suppkey is avoided
    # entirely — supplier/nation/region all broadcast, so revenue is a
    # single partial+final agg; the share window runs over |nation| rows.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dims = (
        sup.join(nation, sup.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "n_name", "r_name")
    )
    # exact integer 1e-4-units (round-10 hazard sweep): per-element product
    # pu*(100-du) <= ~1e9 (price < 1e5 => pu < 1e7, discount factor <= 100),
    # so a plain LONG sum is exact far past the SF1000 target — at SF1000 a
    # (region, nation) group holds ~2.4e8 lineitem rows, bounding the sum
    # at ~2.4e17 vs the 9.2e18 long max (headroom to ~SF30000). The
    # decimal(38,0) accumulator the r10 sweep first used cost a measured
    # 0.89 -> 0.56 s/rep at sf0.1 (the rel_pricing_summary premium-reclaim
    # precedent); DuckDB's BIGINT sum returns HUGEINT, value-identical when
    # nothing wraps, so the oracle is unchanged.
    pu = F.round(F.col("l_extendedprice") * 100).cast("long")
    du = F.round(F.col("l_discount") * 100).cast("long")
    rev = (
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(pu * (100 - du)).alias("s4"))
    )
    w = W.partitionBy("r_name")
    return rev.select(
        "r_name",
        "n_name",
        # half-up to cents in exact INTEGER arithmetic — `div`, not `/`:
        # long / int is DOUBLE division in Spark, and past 2^53 the
        # rounded quotient's floor can differ by 1 from the oracle's
        # exact integer `//` (the rel_pricing_summary precedent); the
        # final /100 is the one exact double op, same in both engines
        (F.expr("(s4 + 50) div 100").cast("double") / 100).alias(
            "nation_rev"
        ),
        # ratio of exact integers: floor of the identical double has no
        # tie to break (multiply-then-divide order is part of the
        # cross-engine contract)
        (
            F.floor(
                F.col("s4").cast("double")
                * 1000000
                / F.sum("s4").over(w).cast("double")
            )
            / 1000000
        ).alias("region_share"),
    )


@register(
    "rel_nation_balance_fulljoin",
    """
WITH c AS (
  SELECT c_nationkey AS nk, count(*) AS n_cust,
         round(sum(c_acctbal), 2) AS cust_bal
  FROM customer GROUP BY 1
),
s AS (
  SELECT s_nationkey AS nk, count(*) AS n_supp,
         round(sum(s_acctbal), 2) AS supp_bal
  FROM supplier GROUP BY 1
)
SELECT CAST(coalesce(c.nk, s.nk) AS BIGINT) AS nationkey,
       CAST(coalesce(n_cust, 0) AS BIGINT) AS n_cust,
       coalesce(cust_bal, 0) AS cust_bal,
       CAST(coalesce(n_supp, 0) AS BIGINT) AS n_supp,
       coalesce(supp_bal, 0) AS supp_bal
FROM c FULL OUTER JOIN s ON c.nk = s.nk
""",
    "Per-nation customer-vs-supplier balance sheet: FULL OUTER join of two "
    "pre-aggregated sides (aggregate-then-join keeps the outer join at "
    "|nation| rows instead of row-level)",
)
def q_rel_fulljoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_acctbal"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_nationkey", "s_acctbal"
    )
    c = cust.groupBy(F.col("c_nationkey").alias("c_nk")).agg(
        F.count("*").alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("cust_bal"),
    )
    s = sup.groupBy(F.col("s_nationkey").alias("s_nk")).agg(
        F.count("*").alias("n_supp"),
        F.round(F.sum("s_acctbal"), 2).alias("supp_bal"),
    )
    return c.join(s, c.c_nk == s.s_nk, "full_outer").select(
        F.coalesce("c_nk", "s_nk").cast("long").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).cast("long").alias("n_cust"),
        F.coalesce("cust_bal", F.lit(0.0)).alias("cust_bal"),
        F.coalesce("n_supp", F.lit(0)).cast("long").alias("n_supp"),
        F.coalesce("supp_bal", F.lit(0.0)).alias("supp_bal"),
    )


@register(
    "rel_price_histogram",
    """
WITH mm AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
)
SELECT CAST(least(floor((o_totalprice - lo) * 20 / (hi - lo)), 19) + 1
            AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(min(o_totalprice), 2) AS bucket_min,
       round(max(o_totalprice), 2) AS bucket_max
FROM orders, mm
GROUP BY 1
""",
    "Equi-width 20-bucket histogram of order totals over a broadcast "
    "min/max scalar — two narrow passes, one tiny agg (the profiling "
    "primitive behind skew detection and range partitioning). Bucketing "
    "is spelled as identical floor arithmetic in BOTH engines (duckdb "
    "has no width_bucket) so boundary values land identically",
)
def q_rel_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    mm = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    bucket = (
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                * 20
                / (F.col("hi") - F.col("lo"))
            ),
            F.lit(19),
        )
        + 1
    )
    return (
        orders.crossJoin(F.broadcast(mm))
        .select(bucket.cast("long").alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("bucket_min"),
            F.round(F.max("o_totalprice"), 2).alias("bucket_max"),
        )
    )


# ---------------------------------------------------------------------------
# Public contract used by __spark_entry__.py
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001 (driver smoke check: rows > 0, stable schema)."""
    return q_flagship(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Round-2 additions: SCD2 dimension history, time-series anomaly scoring,
# sketch-accuracy gates (HLL / t-digest vs exact, oracle-checkable via a
# bounded-error boolean), GPT-2-style pre-tokenizer token accounting.
# ---------------------------------------------------------------------------


@register(
    "rel_scd2_history",
    """
WITH s AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         CASE WHEN row_number() OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                   = 1
                OR lag(o_orderpriority) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                   IS DISTINCT FROM o_orderpriority THEN 1 ELSE 0 END AS chg
  FROM orders
),
g AS (
  SELECT o_custkey, o_orderpriority, o_orderdate,
         sum(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS UNBOUNDED PRECEDING) AS version
  FROM s
),
v AS (
  SELECT o_custkey, version, o_orderpriority,
         min(o_orderdate) AS valid_from
  FROM g GROUP BY o_custkey, version, o_orderpriority
)
SELECT o_custkey,
       CAST(version AS INT) AS version,
       o_orderpriority,
       valid_from,
       lead(valid_from) OVER wv AS valid_to,
       (lead(valid_from) OVER wv) IS NULL AS is_current
FROM v WINDOW wv AS (PARTITION BY o_custkey ORDER BY version)
""",
    "SCD Type-2 dimension history: per-customer order-priority versions with "
    "valid_from/valid_to intervals and is_current flag (gaps-and-islands, "
    "one shuffle on the key; the ledger (T3) keeps only latest-hash — this "
    "is the full-lineage upgrade a warehouse expects)",
)
def q_rel_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.state import scd2_history

    orders = load_table(spark, sf_dir, "orders")
    return scd2_history(
        orders,
        key_col="o_custkey",
        ts_col="o_orderdate",
        attr_col="o_orderpriority",
        tiebreak_col="o_orderkey",
    )


@register(
    "rel_approx_quantile_bounded",
    """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 2) AS exact_median,
       TRUE AS approx_rank_ok
FROM orders GROUP BY o_orderpriority
""",
    "Sketch-accuracy gate for quantiles, on the guarantee the sketch "
    "actually makes: approx_percentile (accuracy=10000, Greenwald-Khanna "
    "mergeable summary) promises RANK error <= n/accuracy, not value "
    "closeness — so the gate recomputes the returned value's empirical rank "
    "and asserts |rank/n - 0.5| <= 0.01 + 1/n. Value-distance bounds are "
    "wrong for discrete sketches (adjacent order-statistics can differ by "
    "percents at small n); rank bounds hold at every scale.",
)
def q_rel_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    appx = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("__exact"),
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias(
            "__approx"
        ),
    )
    ranked = (
        orders.join(F.broadcast(appx), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.first("__exact").alias("__exact"),
            F.count(
                F.when(F.col("o_totalprice") <= F.col("__approx"), 1)
            ).alias("__le"),
            F.count("*").alias("__n"),
        )
    )
    return ranked.select(
        "o_orderpriority",
        F.round("__exact", 2).alias("exact_median"),
        (
            F.abs(F.col("__le") / F.col("__n") - 0.5)
            <= 0.01 + 1.0 / F.col("__n")
        ).alias("approx_rank_ok"),
    )


@register(
    "rel_late_ship_orders",
    """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o.o_orderpriority
""",
    "TPC-H Q4 analog: orders with at least one line shipped >30 days after "
    "the order date, per priority. The correlated EXISTS decorrelates to a "
    "LEFT SEMI join on the order key — one shuffle each side, no per-row "
    "probe; the date comparison uses interval arithmetic identical to the "
    "oracle's.",
)
def q_rel_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # the correlated EXISTS needs o_orderdate, so first derive the late
    # order keys from the join, then semi-join orders against them
    late_keys = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    ).select(F.col("l_orderkey").alias("__k"))
    return (
        orders.join(
            late_keys, F.col("o_orderkey") == F.col("__k"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("n_late_orders"))
    )


@register(
    "rel_promo_revenue_pct",
    """
SELECT round(
         100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
         / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= DATE '1997-01-01'
  AND l.l_shipdate < DATE '1997-07-01'
""",
    "TPC-H Q14 analog: promo parts' share of revenue in a ship-date "
    "window (the driver lineitem spans 1995-2001; an earlier draft "
    "filtered on 2024 and silently aggregated zero rows). Part is the "
    "broadcast dim; the conditional and total sums come out of ONE "
    "partial+final aggregation pass (a single CASE inside the same agg), "
    "not two scans.",
)
def q_rel_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("date"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)).alias(
            "__promo"
        ),
        F.sum(rev).alias("__total"),
        F.count("*").cast("long").alias("n_items"),
    )
    return agg.select(
        F.round(100.0 * F.col("__promo") / F.col("__total"), 4).alias(
            "promo_pct"
        ),
        "n_items",
    )


@register(
    "rel_disjunctive_revenue",
    """
SELECT CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 45)
""",
    "TPC-H Q19 analog: disjunctive (OR-of-ANDs) predicates across a "
    "fact-dim join. Catalyst splits the disjunction: the part-only "
    "conjuncts (brand OR-chain, size bounds) and the lineitem-only "
    "quantity bound are derived and pushed to each scan (CNF extraction), "
    "so both sides prune before the join instead of filtering after it.",
)
def q_rel_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 45)
        )
    )
    return j.filter(cond).agg(
        F.count("*").cast("long").alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Round-3 additions: remaining TPC-H-expressible analogs (Q7/Q10/Q15 over the
# driver's column subset) + training-pipeline ops (int8 embedding
# quantization, DSIR importance weights, event transition matrix).
# ---------------------------------------------------------------------------


@register(
    "rel_volume_shipping",
    """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         l_extendedprice * (1 - l_discount) AS volume,
         CAST(year(l_shipdate) AS BIGINT) AS l_year
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
)
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, l_year,
       round(sum(volume), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM li
JOIN supplier s ON li.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN orders o ON li.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
   OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3')
GROUP BY sn.n_name, cn.n_name, l_year
""",
    "TPC-H Q7 analog (volume shipping): revenue between two nations by "
    "ship year, both directions. Plan shape for 100 TB: the supplier side "
    "is pre-filtered to the two nations and BROADCAST into the lineitem "
    "scan (kills ~23/25 of lineitem rows before any shuffle); the "
    "customer side joins orders->customer on the shuffle (customer is "
    "SF-proportional, not broadcastable), and the only big-big exchange "
    "is lineitem-orders on orderkey.",
)
def q_rel_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = ["NATION_3", "NATION_7"]
    nat = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair))
        .select("n_nationkey", "n_name")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cus = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = li.select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        F.year("l_shipdate").cast("long").alias("l_year"),
    )
    # nation-pruned supplier broadcast BEFORE the orderkey shuffle
    li = li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    ords = ords.join(cus, F.col("o_custkey") == F.col("c_custkey"))
    j = li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
    j = j.filter(
        (
            (F.col("supp_nation") == pair[0])
            & (F.col("cust_nation") == pair[1])
        )
        | (
            (F.col("supp_nation") == pair[1])
            & (F.col("cust_nation") == pair[0])
        )
    )
    return j.groupBy("supp_nation", "cust_nation", "l_year").agg(
        F.round(F.sum("volume"), 2).alias("revenue"),
        F.count("*").cast("long").alias("n_items"),
    )


@register(
    "rel_local_supplier_volume",
    """
SELECT n.n_name AS nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
                AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
  AND o.o_orderdate >= DATE '1997-01-01'
  AND o.o_orderdate < DATE '1998-01-01'
GROUP BY n.n_name
""",
    "TPC-H Q5 analog (local supplier volume): revenue where the customer "
    "and the line's supplier share a nation, nations restricted to one "
    "region. Differs from rel_nation_revenue by the LOCALITY predicate "
    "(c_nationkey = s_nationkey) — nation/region (constant-size) are "
    "explicitly broadcast and prune the supplier side BEFORE the fact "
    "joins; the pruned supplier table itself is SF-PROPORTIONAL (~5x "
    "smaller than supplier), so it carries NO broadcast hint — AQE "
    "broadcasts it when its runtime size fits and falls back to a "
    "shuffle join at 100 TB. Big-big exchanges: lineitem⋈orders on "
    "orderkey, then custkey.",
)
def q_rel_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    ords = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    j = (
        li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
    )
    return j.groupBy(F.col("n_name").alias("nation")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").cast("long").alias("n_items"),
    )


@register(
    "rel_customer_distribution",
    """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
""",
    "TPC-H Q13 analog (customer distribution): how many customers placed "
    "how many (non-urgent) orders, zero-order customers included via the "
    "LEFT join. Two-level aggregate: the first groupBy rides the "
    "customer-key shuffle of the join; the second is a tiny histogram "
    "rollup. count(o_orderkey) — not count(*) — is what makes the "
    "no-order customer land in bucket 0 identically in both engines.",
)
def q_rel_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    ords = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per = (
        cust.join(ords, cust.c_custkey == ords.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(
        F.count("*").cast("long").alias("custdist")
    ).select(F.col("c_count").cast("long").alias("c_count"), "custdist")


@register(
    "rel_forecast_revenue",
    """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue_delta,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    "TPC-H Q6 analog (forecasting revenue change): the canonical "
    "pure-pushdown query — every predicate (date window, discount band, "
    "quantity cap) reaches the parquet scan as a PushedFilter, the "
    "projection is 2 columns of 11, and the whole plan is one partial+ "
    "final agg with zero joins. The query Spark should execute at scan "
    "speed; plan-asserted in test_plans.py.",
)
def q_rel_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
        ).alias("revenue_delta"),
        F.count("*").cast("long").alias("n_items"),
    )


@register(
    "rel_returned_item_revenue",
    """
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= DATE '1997-01-01' AND o.o_orderdate < DATE '1997-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    "TPC-H Q10 analog (returned-item reporting): top 20 customers by "
    "revenue lost to returns in one quarter. Both selective predicates "
    "(order-date window, returnflag) reach their parquet scans as pushed "
    "filters; the quarter of orders joins lineitem on the orderkey "
    "shuffle; nation broadcasts; the final top-20 is "
    "TakeOrderedAndProject on (rounded revenue DESC, custkey) — "
    "deterministic across engines, no global sort.",
)
def q_rel_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    cus = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    j = (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cus, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = j.groupBy("c_custkey", "c_name", "nation").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").cast("long").alias("n_items"),
    )
    return agg.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


@register(
    "rel_top_supplier",
    """
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_rev
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
""",
    "TPC-H Q15 analog (top supplier): per-supplier quarterly revenue, "
    "return the supplier(s) hitting the max. The rev aggregate is built "
    "once and its exchange REUSED for the scalar max (diamond plan, one "
    "lineitem scan); the max comes back as a broadcast 1-row join, and "
    "the equality compares the same rounded value both engines computed. "
    "supplier is the broadcast dim.",
)
def q_rel_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    # explicit null-filter: the supplier join would add isnotnull(l_suppkey)
    # to ITS branch of the rev aggregate only, making the two rev subtrees
    # differ and blocking ReuseExchange — i.e. a second full lineitem scan
    li = li.filter(F.col("l_suppkey").isNotNull())
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("__mx"))
    top = rev.join(F.broadcast(mx)).filter(
        F.col("total_rev") == F.col("__mx")
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        F.broadcast(sup)
        .join(top, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


# ---------------------------------------------------------------------------
# TPC-H completion sweep (round 4b): the seven analogs that were still missing
# from the decision-support family — Q2, Q3, Q9, Q11, Q12, Q16, Q20. The
# testdata has no partsupp table, so the part-supplier relation (and its
# "supply cost") is derived from lineitem: unit_cost(part, supp) =
# min(l_extendedprice / l_quantity) over that pair's lineitems. Money that
# must cross a top-k or threshold boundary is summed in integer cents via
# per-item floor(x*100) — floor is exact on every double, so cross-engine and
# cross-partition fold order can never flip a boundary row (same contract as
# rel_pareto_revenue / rel_revenue_trend).
# ---------------------------------------------------------------------------


@register(
    "rel_min_cost_supplier",
    """
WITH esup AS (
  SELECT s.s_suppkey, s.s_name, round(s.s_acctbal, 2) + 0.0 AS s_acctbal,
         n.n_name AS nation
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
),
cost AS (
  SELECT l.l_partkey, l.l_suppkey,
         min(l.l_extendedprice / l.l_quantity) AS unit_cost
  FROM lineitem l
  JOIN esup e ON l.l_suppkey = e.s_suppkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 20
  GROUP BY 1, 2
),
best AS (
  SELECT l_partkey, l_suppkey, unit_cost,
         min(unit_cost) OVER (PARTITION BY l_partkey) AS best_cost
  FROM cost
)
SELECT e.s_acctbal, e.s_name, e.nation,
       CAST(b.l_partkey AS BIGINT) AS p_partkey,
       round(b.unit_cost, 4) AS unit_cost
FROM best b
JOIN esup e ON b.l_suppkey = e.s_suppkey
WHERE b.unit_cost = b.best_cost
ORDER BY e.s_acctbal DESC, e.s_name, p_partkey
LIMIT 20
""",
    "TPC-H Q2 analog (min-cost supplier): for each qualifying part, the "
    "EUROPE supplier offering the minimum effective unit price, derived "
    "from lineitem as min(extendedprice/quantity) per (part, supplier) — "
    "the correlated-min-subquery shape. The part filter is pushed INTO "
    "the cost aggregate (broadcast semi of the 56-part dim) so the "
    "per-part min window runs over qualifying parts only — at 100 TB the "
    "unfiltered pair relation is partsupp-sized and windowing it all "
    "would be the dominant shuffle. Exchanges: pair agg on (partkey, "
    "suppkey), window repartition on partkey (both SF-proportional but "
    "56-part-pruned); everything else broadcast. Top-20 ordered by the "
    "ROUNDED acctbal with (s_name, partkey) tiebreak so membership is "
    "deterministic cross-engine. Reference scope: relational sweep is "
    "the SURVEY §8 north-star extension beyond Yaml-Pipe's operators.",
)
def q_rel_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    esup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey",
            "s_name",
            # + 0.0 normalizes a possible -0.00 (suite-wide negative-zero
            # insurance: the driver hash is sign-of-zero sensitive)
            (F.round("s_acctbal", 2) + F.lit(0.0)).alias("s_acctbal"),
            F.col("n_name").alias("nation"),
        )
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    cost = (
        li.join(F.broadcast(esup.select("s_suppkey")),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            )
        )
    )
    best = cost.withColumn(
        "best_cost", F.min("unit_cost").over(W.partitionBy("l_partkey"))
    ).filter(F.col("unit_cost") == F.col("best_cost"))
    return (
        best.join(F.broadcast(esup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal",
            "s_name",
            "nation",
            F.col("l_partkey").cast("long").alias("p_partkey"),
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(20)
    )


@register(
    "rel_shipping_priority",
    """
SELECT l.l_orderkey AS o_orderkey,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1998-07-01'
  AND l.l_shipdate > DATE '1998-07-01'
GROUP BY 1, 3, 4
ORDER BY revenue_cents DESC, o_orderkey
LIMIT 10
""",
    "TPC-H Q3 analog (shipping priority): top-10 not-yet-shipped orders "
    "by outstanding revenue for one market segment. Revenue summed in "
    "integer cents (per-item floor(x*100)) so the DESC top-k boundary is "
    "fold-order-proof; orderkey tiebreak. Plan: both date filters pushed "
    "to the scans, BUILDING customers broadcast, one big-big shuffle "
    "lineitem⋈orders on orderkey whose partitioning the groupBy reuses; "
    "TakeOrderedAndProject caps the result driver-side.",
)
def q_rel_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    ords = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    j = (
        ords.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                )
            ).cast("long").alias("revenue_cents")
        )
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            "revenue_cents",
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue_cents"), "o_orderkey")
        .limit(10)
    )


@register(
    "rel_product_profit",
    """
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)
                            - 0.5 * p.p_retailprice * l.l_quantity) * 100)
                     AS BIGINT)) AS BIGINT) AS profit_cents
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%bolt%'
GROUP BY 1, 2
""",
    "TPC-H Q9 analog (product-type profit): profit per supplier nation "
    "per order year over one part family, with 0.5 * p_retailprice * "
    "quantity standing in for the missing ps_supplycost. Profit can be "
    "NEGATIVE, so cents use floor (exact on every double, including "
    "negatives) rather than round — half-even vs half-away can never "
    "fork the engines. Plan: the %bolt% part dim and the supplier→nation "
    "chain broadcast; the single big-big exchange is lineitem⋈orders on "
    "orderkey; the (nation, year) rollup is tiny.",
)
def q_rel_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%bolt%")
    ).select("p_partkey", "p_retailprice")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    j = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    profit = F.floor(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.sum(profit).cast("long").alias("profit_cents"))
    )


@register(
    "rel_important_stock",
    """
WITH v AS (
  SELECT l.l_partkey,
         sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS value_cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
  GROUP BY 1
)
SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
       CAST(value_cents AS BIGINT) AS value_cents
FROM v
WHERE value_cents > 2.0 * (SELECT sum(value_cents) FROM v)
                        / (SELECT count(*) FROM v)
""",
    "TPC-H Q11 analog (important stock): parts whose traded value "
    "through EUROPE suppliers exceeds twice the MEAN part value — the "
    "scalar-aggregate-threshold shape. (TPC-H's fixed 1/1000-of-total "
    "fraction goes degenerate as the part count scales with SF; the "
    "mean-relative threshold keeps the query meaningful at any scale.) "
    "The per-part value frame is built ONCE; the grand sum+count reuse "
    "its exchange (same diamond as rel_top_supplier) and return as a "
    "broadcast 1-row cross join. Integer-cent values make the > "
    "threshold comparison exact: a BIGINT against 2*sum/count computed "
    "identically (left-to-right on exact BIGINT-valued doubles) in both "
    "engines.",
)
def q_rel_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    esup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    v = (
        li.join(F.broadcast(esup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100))
            .cast("long")
            .alias("value_cents")
        )
    )
    total = v.agg(
        F.sum("value_cents").alias("__total"),
        F.count("*").alias("__n"),
    )
    return (
        v.join(F.broadcast(total))
        .filter(
            F.col("value_cents")
            > F.lit(2.0) * F.col("__total") / F.col("__n")
        )
        .select(
            F.col("l_partkey").cast("long").alias("p_partkey"), "value_cents"
        )
    )


@register(
    "rel_shipmode_priority",
    """
SELECT CASE WHEN d >= 90 THEN 'SLOW'
            WHEN d >= 30 THEN 'MEDIUM'
            ELSE 'FAST' END AS ship_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM (
  SELECT o.o_orderpriority,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) AS d
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
)
GROUP BY 1
""",
    "TPC-H Q12 analog (shipping classes vs priority): lineitems bucketed "
    "by order-to-ship latency class, split into high/low-priority "
    "conditional counts — the CASE-sum pivot shape, with the derived "
    "delay standing in for the missing l_shipmode/l_receiptdate. Pure "
    "integer arithmetic end to end. Plan: one big-big shuffle on "
    "orderkey; the 3-row class rollup is a map-side partial agg.",
)
def q_rel_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    j = ords.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
    d = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.select(
            F.when(d >= 90, "SLOW")
            .when(d >= 30, "MEDIUM")
            .otherwise("FAST")
            .alias("ship_class"),
            F.when(high, 1).otherwise(0).alias("__hi"),
            F.when(high, 0).otherwise(1).alias("__lo"),
        )
        .groupBy("ship_class")
        .agg(
            F.sum("__hi").cast("long").alias("high_line_count"),
            F.sum("__lo").cast("long").alias("low_line_count"),
        )
    )


@register(
    "rel_parts_supplier_count",
    """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps
JOIN part p ON ps.l_partkey = p.p_partkey
WHERE p.p_type <> 'PROMO'
  AND p.p_size IN (1, 9, 14, 19, 24, 29, 34, 44)
  AND ps.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY 1, 2, 3
""",
    "TPC-H Q16 analog (parts/supplier relationship): distinct supplier "
    "count per (brand, type, size) over the part-supplier pairs observed "
    "in lineitem, excluding one type, an IN-list of sizes, and suppliers "
    "with negative balance (the NOT-IN-complaints analog → broadcast "
    "ANTI join; s_suppkey is non-null so NOT IN ≡ anti-join in both "
    "engines). The pair relation dedups on the SAME (partkey, suppkey) "
    "shuffle the count-distinct then rides; part dim broadcast with both "
    "filters pushed to its scan.",
)
def q_rel_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    ).distinct()
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 24, 29, 34, 44)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        li.join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "rel_promotion_suppliers",
    """
WITH shipped AS (
  SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS qty
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '%red%'
    AND l.l_shipdate >= DATE '1997-01-01'
    AND l.l_shipdate < DATE '1998-01-01'
  GROUP BY 1, 2
)
SELECT s.s_name, n.n_name AS nation
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
  AND s.s_suppkey IN (SELECT l_suppkey FROM shipped WHERE qty > 50)
""",
    "TPC-H Q20 analog (promotion-eligible suppliers): EUROPE suppliers "
    "who moved more than 50 units of some %red% part in 1997 — the "
    "nested-semi-join shape (aggregate subquery → IN → supplier). "
    "Quantities are integral doubles 1..50, so the sum and the > 50 "
    "threshold are exact in any fold order. Plan: %red% part dim "
    "broadcast into the (suppkey, partkey) aggregate; the qualifying "
    "supplier id set is tiny and broadcast as a LEFT SEMI join; "
    "nation/region broadcast dims.",
)
def q_rel_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_suppkey", "l_partkey", "l_quantity")
    qual = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return sup.join(
        F.broadcast(qual),
        F.col("s_suppkey") == F.col("l_suppkey"),
        "left_semi",
    ).select("s_name", F.col("n_name").alias("nation"))


@register(
    "rel_equidepth_histogram",
    """
WITH c AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
b AS (
  SELECT quantile_cont(cents, 0.125) AS q1, quantile_cont(cents, 0.25) AS q2,
         quantile_cont(cents, 0.375) AS q3, quantile_cont(cents, 0.5) AS q4,
         quantile_cont(cents, 0.625) AS q5, quantile_cont(cents, 0.75) AS q6,
         quantile_cont(cents, 0.875) AS q7
  FROM c
),
a AS (
  SELECT CASE
           WHEN cents <= q1 THEN 0 WHEN cents <= q2 THEN 1
           WHEN cents <= q3 THEN 2 WHEN cents <= q4 THEN 3
           WHEN cents <= q5 THEN 4 WHEN cents <= q6 THEN 5
           WHEN cents <= q7 THEN 6 ELSE 7 END AS bucket,
         cents
  FROM c, b
),
t AS (SELECT count(*) AS total FROM c)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(cents) AS BIGINT) AS lo_cents,
       CAST(max(cents) AS BIGINT) AS hi_cents,
       round(count(*) / CAST(t.total AS DOUBLE), 4) AS depth_share
FROM a, t GROUP BY bucket, t.total
""",
    "Equi-depth histogram over order totals — the optimizer statistic "
    "CBO range-pruning and skew decisions derive from: 8 buckets with "
    "interpolated octile boundaries, per-bucket row counts and value "
    "ranges, each bucket's share of rows close to 1/8 by construction. "
    "Boundaries interpolate over EXACT integer cents (floor(x*100)) so "
    "no midpoint can round apart across engines (same domain trick as "
    "text_quality_thresholds); assignment is a broadcast of 7 scalars "
    "onto a narrow scan — one shuffle for the bucket rollup.",
)
def q_rel_equidepth_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    c = orders.select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    fr = [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]
    b = c.agg(
        F.percentile("cents", F.array(*[F.lit(x) for x in fr])).alias("__q")
    )
    a = c.crossJoin(F.broadcast(b))
    bucket = F.lit(7)
    for i in range(6, -1, -1):
        bucket = F.when(
            F.col("cents") <= F.element_at("__q", i + 1), F.lit(i)
        ).otherwise(bucket)
    t = c.agg(F.count("*").alias("total"))
    return (
        a.select(bucket.alias("bucket"), "cents")
        .crossJoin(F.broadcast(t))
        .groupBy("bucket", "total")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("cents").cast("long").alias("lo_cents"),
            F.max("cents").cast("long").alias("hi_cents"),
        )
        .select(
            F.col("bucket").cast("int"),
            "n_rows",
            "lo_cents",
            "hi_cents",
            F.round(
                F.col("n_rows") / F.col("total").cast("double"), 4
            ).alias("depth_share"),
        )
    )
