"""Query registry: every operator exposed as (spark, sf_dir) -> DataFrame with
a DuckDB-oracle SQL twin where SQL-expressible.

This is the correctness contract of SURVEY.md §2: the driver runs each
`queries()` entry side-by-side with `oracle_sql()` at sf0.01 and compares
row-count + schema + order-insensitive value-hash. Conventions that make the
comparison deterministic across engines:

- cross-engine hash primitive = md5/sha256 hex strings (identical output);
- integers cast to BIGINT, floats to DOUBLE, and every float rounded
  (`F.round` / `round`) before returning;
- array indexing via 1-based `element_at` (Spark) / `l[i]` (DuckDB);
- every top-k has a deterministic tiebreak on a key column, ordering by the
  *rounded* score so boundary decisions agree bit-for-bit;
- session timezone pinned to UTC (duckdb timestamps are UTC-naive).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from yaml_pipe_spark.functions.hashing import sha256_text
from yaml_pipe_spark.functions.text import non_empty
from yaml_pipe_spark.operators.chunkers import fixed_window_chunks, markdown_chunks
from yaml_pipe_spark.tables import load_table

def fq_unit_mean(col: Column, unit_dp: int, out_dp: int, n: Column) -> Column:
    """Floor-quantized mean of a unit_dp-rounded grid value, over EXACT
    integer unit sums — THE hazard-sweep idiom (ROUND9_NOTES section 1),
    single-sourced so future hardened sites cannot drift from the
    contract: sum(round(col*10^unit)::long) is exact (col is already on
    the unit grid), the one double division is deterministic for
    identical integers in both engines, and floor has no tie to break.
    The scale step mirrors the oracle form EXACTLY (multiply when
    out >= unit, divide otherwise — the two produce different doubles,
    so the choice is part of the cross-engine contract)."""
    s = F.sum(F.round(col * float(10 ** unit_dp)).cast("long")).cast("double")
    if out_dp > unit_dp:
        q = s * (10 ** (out_dp - unit_dp)) / n
    elif out_dp == unit_dp:
        q = s / n
    else:
        q = s / (n * (10 ** (unit_dp - out_dp)))
    return F.floor(q) / float(10 ** out_dp)




@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    def deco(fn):
        if name in REGISTRY:
            # dict-last-wins would silently shadow the earlier query AND
            # its oracle — a correctness trap, so fail at import time
            raise ValueError(f"duplicate query registration: {name!r}")
        REGISTRY[name] = QueryDef(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


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
# S1: scan + glob/empty-filter + content hash (sources.py:78-97)
# ---------------------------------------------------------------------------


@register(
    "s1_scan_nonempty",
    """
SELECT doc_id, source, lang, CAST(n_chars AS BIGINT) AS n_chars,
       sha256(text) AS content_hash
FROM documents WHERE length(trim(text, e' \n\r\t')) > 0
""",
    "S1 LocalFileSource: skip empty docs, sha256 content hash",
)
def q_s1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(non_empty(F.col("text"))).select(
        "doc_id",
        "source",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        sha256_text(F.col("text")).alias("content_hash"),
    )


# Per-extension parse dispatch (reference sources.py:92-93: unstructured
# element extraction + "\n\n" join). The corpus gets a deterministic synthetic
# extension per doc (hash of doc_id over txt/md/html), then one CASE-WHEN
# dispatch applies that format's parser — all Catalyst expressions; the
# element split/trim regexes use explicit whitespace classes so Java regex
# and DuckDB RE2 agree (\s differs between them).
_DK_ELS = (
    "list_filter(list_transform(regexp_split_to_array({src}, "
    "'\\n[ \\t\\r]*\\n[ \\t\\r\\n]*'), x -> regexp_replace(regexp_replace(x, "
    "'^[ \\t\\r\\n]+', ''), '[ \\t\\r\\n]+$', '')), x -> length(x) > 0)"
)

_DK_HTML_SRC = (
    "regexp_replace(regexp_replace(text, '<[^>]*>', ' ', 'g'), "
    "'[ \\t]+', ' ', 'g')"
)
_DK_ELS_TXT = _DK_ELS.format(src="text")
_DK_ELS_HTML = _DK_ELS.format(src=_DK_HTML_SRC)

_PARSE_DISPATCH_ORACLE = f"""
WITH tagged AS (
  SELECT doc_id, text,
         ['txt', 'md', 'html'][
           ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
            + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) % 3 + 1
         ] AS ext
  FROM documents
),
parsed AS (
  SELECT doc_id, ext,
         CASE ext
           WHEN 'txt' THEN array_to_string({_DK_ELS_TXT}, e'\\n\\n')
           WHEN 'md' THEN array_to_string(list_transform(
                {_DK_ELS_TXT},
                x -> regexp_replace(x, '^#{{1,6}}[ \\t]+', '')), e'\\n\\n')
           WHEN 'html' THEN array_to_string({_DK_ELS_HTML}, e'\\n\\n')
         END AS parsed
  FROM tagged
)
SELECT ext,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN length(parsed) > 0
                     THEN len(string_split(parsed, e'\\n\\n')) ELSE 0 END)
            AS BIGINT) AS n_elements,
       CAST(count(DISTINCT md5(parsed)) AS BIGINT) AS n_uniq,
       round(avg(length(parsed)), 4) AS avg_len
FROM parsed
GROUP BY ext
"""


@register(
    "s1_parse_dispatch",
    _PARSE_DISPATCH_ORACLE,
    "S1 parse seam: per-extension parser dispatch (txt/md/html), element "
    "split + blank-line join, all whole-stage-codegen expressions",
)
def q_s1_parse_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.sources.parsers import parse_by_extension

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    h = F.md5(F.col("doc_id").cast("string"))
    # first md5 byte as an integer; the oracle spells the same value with
    # strpos('0123456789abcdef', ...) arithmetic (DuckDB has no conv())
    code = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    tagged = docs.withColumn(
        "ext",
        F.element_at(
            F.array(F.lit("txt"), F.lit("md"), F.lit("html")),
            (code % 3 + 1).cast("int"),
        ),
    )
    parsed = tagged.withColumn(
        "parsed", parse_by_extension(F.col("text"), F.col("ext"))
    )
    n_els = F.when(
        F.length("parsed") > 0, F.size(F.split(F.col("parsed"), "\n\n"))
    ).otherwise(F.lit(0))
    return parsed.groupBy("ext").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(n_els).cast("long").alias("n_elements"),
        F.countDistinct(F.md5("parsed")).cast("long").alias("n_uniq"),
        F.round(F.avg(F.length("parsed")), 4).alias("avg_len"),
    )


# ---------------------------------------------------------------------------
# C1: fixed-window chunker, full row-level output (chunkers.py:39-87)
# ---------------------------------------------------------------------------


@register(
    "c1_fixed_chunk",
    """
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE length(trim(text, e' \n\r\t')) > 0
),
starts AS (
  SELECT doc_id, text, UNNEST(generate_series(1, length(text), 160)) AS s
  FROM docs
)
SELECT doc_id,
       (s - 1) // 160 + 1 AS chunk_index,
       sha256(substr(text, CAST(s AS INT), 200)) AS chunk_hash,
       CAST(length(substr(text, CAST(s AS INT), 200)) AS BIGINT) AS chunk_len
FROM starts
""",
    "C1 fixed-window chunker: 1-based chunk_index, per-chunk hash",
)
def q_c1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = fixed_window_chunks(docs, "text", chunk_size=200, chunk_overlap=40)
    return chunks.select(
        "doc_id",
        "chunk_index",
        sha256_text(F.col("chunk")).alias("chunk_hash"),
        F.length("chunk").cast("long").alias("chunk_len"),
    )


# ---------------------------------------------------------------------------
# C2: markdown sectionizer (chunkers.py:90-138)
# ---------------------------------------------------------------------------

C2_ORACLE = r"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE length(trim(text, e' \n\r\t')) > 0
),
marked AS (
  SELECT doc_id,
         string_split(regexp_replace(text, '(?m)^(#{1,3} )', e'\x01\1', 'g'),
                      e'\x01') AS l
  FROM docs
),
secs AS (
  SELECT doc_id, UNNEST(generate_series(1, len(l))) AS i, l FROM marked
),
parts AS (
  SELECT doc_id, i, trim(l[i], e' \n\r\t') AS sec FROM secs
  WHERE length(trim(l[i], e' \n\r\t')) > 0
),
feat AS (
  SELECT doc_id, i, sec,
         COALESCE(length(regexp_extract(string_split(sec, chr(10))[1],
                                        '^(#{1,3}) ', 1)), 0) AS lvl,
         regexp_extract(string_split(sec, chr(10))[1], '^#{1,3} (.*)$', 1) AS ttl
  FROM parts
),
mk AS (
  SELECT doc_id, i, sec, lvl,
         CASE WHEN lvl = 1 THEN ttl END AS m1,
         CASE WHEN lvl = 2 THEN ttl WHEN lvl = 1 THEN e'\x01' END AS m2,
         CASE WHEN lvl = 3 THEN ttl
              WHEN lvl IN (1, 2) THEN e'\x01' END AS m3
  FROM feat
),
win AS (
  SELECT doc_id, i, sec,
         last_value(m1 IGNORE NULLS) OVER w AS h1,
         last_value(m2 IGNORE NULLS) OVER w AS h2,
         last_value(m3 IGNORE NULLS) OVER w AS h3,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) AS chunk_index
  FROM mk
  WINDOW w AS (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT doc_id, CAST(chunk_index AS BIGINT) AS chunk_index,
       sha256(sec) AS chunk_hash,
       CASE WHEN h1 <> e'\x01' THEN h1 END AS header1,
       CASE WHEN h2 <> e'\x01' THEN h2 END AS header2,
       CASE WHEN h3 <> e'\x01' THEN h3 END AS header3
FROM win
"""


@register(
    "c2_markdown_chunk",
    C2_ORACLE,
    "C2 markdown sectionizer with hierarchical header metadata",
)
def q_c2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = markdown_chunks(docs, "text", id_cols=["doc_id"])
    return out.select(
        "doc_id",
        "chunk_index",
        sha256_text(F.col("chunk")).alias("chunk_hash"),
        "header1",
        "header2",
        "header3",
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
# Vector path: deterministic hash embedder, top-k cosine (Q1), hit-rate (Q2)
# ---------------------------------------------------------------------------

# DuckDB twins of functions.vectors (explicit indexed sums: left-to-right
# double folds, bit-identical to Spark's F.aggregate).


def _dk_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def _dk_cos(a: str, b: str) -> str:
    return f"({_dk_dot(a, b)} / sqrt({_dk_dot(a, a)} * {_dk_dot(b, b)}))"


@register(
    "e_hash_embed",
    """
WITH d AS (SELECT doc_id, text FROM documents WHERE length(trim(text, e' \n\r\t')) > 0),
x AS (SELECT doc_id, text, UNNEST(generate_series(1, 8)) AS dim FROM d),
h AS (SELECT doc_id, dim, md5(CAST(dim AS VARCHAR) || ':' || text) AS hh FROM x)
SELECT doc_id, CAST(dim AS BIGINT) AS dim,
       round(((strpos('0123456789abcdef', substr(hh, 1, 1)) - 1) * 16 +
              (strpos('0123456789abcdef', substr(hh, 2, 1)) - 1))
             / 255.0 * 2 - 1, 6) AS value
FROM h
""",
    "Deterministic hash-embedder (SURVEY §2.3): md5-derived pseudo-embedding",
)
def q_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.functions.hashing import hash_embedding

    docs = load_table(spark, sf_dir, "documents").filter(non_empty(F.col("text")))
    emb = hash_embedding(F.col("text"), dim=8)
    return (
        docs.select("doc_id", F.posexplode(emb).alias("__pos", "value"))
        .withColumn("dim", (F.col("__pos") + 1).cast("long"))
        .select("doc_id", "dim", "value")
    )


Q1_ORACLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
         round({_dk_cos('e.embedding', 'q.qv')}, 6) AS score
  FROM embeddings e, q
)
SELECT vec_id, label, score FROM s ORDER BY score DESC, vec_id LIMIT 10
"""


@register(
    "q1_topk_cosine",
    Q1_ORACLE,
    "Q1 top-k similarity search (evaluation.py:44-64): exact cosine top-10",
)
def q_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.similarity import topk_cosine

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    out = topk_cosine(emb, qv, k=10)
    return out.select("vec_id", F.col("label").cast("long").alias("label"), "score")


Q2_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS qid, label AS expected, embedding AS qv
  FROM embeddings WHERE vec_id < 20
),
scored AS (
  SELECT q.qid, q.expected, e.vec_id, e.label,
         round({_dk_cos('e.embedding', 'q.qv')}, 6) AS score
  FROM embeddings e, q WHERE e.vec_id <> q.qid
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY score DESC, vec_id) AS rn
  FROM scored
),
hits AS (
  SELECT qid, max(CASE WHEN label = expected THEN 1 ELSE 0 END) AS hit
  FROM ranked WHERE rn <= 5 GROUP BY qid
)
SELECT round(100 * avg(hit), 4) AS hit_rate,
       count(*) AS total_questions,
       CAST(sum(hit) AS BIGINT) AS hits
FROM hits
"""


@register(
    "q2_hitrate",
    Q2_ORACLE,
    "Q2 retrieval eval (evaluation.py:66-109): top-5 label hit-rate",
)
def q_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.similarity import hit_rate, knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("expected"),
        F.col("embedding").alias("qv"),
    )
    nn = knn_join(q, emb, k=5)
    return hit_rate(nn, "qid", "expected", "label")


# ---------------------------------------------------------------------------
# T2: incremental change detection (state_manager.py:155-178) — the engine's
# one implicit join, as a left anti-join against a derived ledger
# ---------------------------------------------------------------------------


@register(
    "t2_changed_anti_join",
    """
WITH d AS (SELECT doc_id, text FROM documents WHERE length(trim(text, e' \n\r\t')) > 0),
cur AS (
  SELECT CAST(doc_id AS VARCHAR) AS item_id,
         sha256(CASE WHEN doc_id % 5 = 0 THEN text || '!' ELSE text END)
           AS content_hash
  FROM d
),
st AS (
  SELECT CAST(doc_id AS VARCHAR) AS item_id, sha256(text) AS content_hash
  FROM d WHERE doc_id % 3 = 0
)
SELECT c.item_id, c.content_hash FROM cur c
WHERE NOT EXISTS (
  SELECT 1 FROM st s
  WHERE s.item_id = c.item_id AND s.content_hash = c.content_hash
)
""",
    "T2 has_changed as anti-join: new docs + docs whose hash moved",
)
def q_t2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.state import changed_rows

    docs = load_table(spark, sf_dir, "documents").filter(non_empty(F.col("text")))
    cur_text = F.when(
        F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit("!"))
    ).otherwise(F.col("text"))
    current = docs.select(
        F.col("doc_id").cast("string").alias("item_id"),
        sha256_text(cur_text).alias("content_hash"),
    )
    state = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").cast("string").alias("item_id"),
        sha256_text(F.col("text")).alias("content_hash"),
    )
    return changed_rows(current, state)


@register(
    "t4_timestamp_cursor",
    """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(epoch_us(ts)) AS BIGINT) AS min_us,
       CAST(max(epoch_us(ts)) AS BIGINT) AS max_us
FROM events
WHERE ts > TIMESTAMP '2024-01-16 00:00:00'
GROUP BY event_type
""",
    "T4 timestamp cursor (sources.py:266-272 semantics, minus the string "
    "interpolation): incremental predicate as a pushed-down Column filter; "
    "a real run feeds last_run_ts from the ledger",
)
def q_t4_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.sources.relational import incremental_by_timestamp

    ev = load_table(spark, sf_dir, "events")
    inc = incremental_by_timestamp(ev, "ts", "2024-01-16 00:00:00")
    return inc.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.min(F.unix_micros("ts")).cast("long").alias("min_us"),
        F.max(F.unix_micros("ts")).cast("long").alias("max_us"),
    )


@register(
    "t3_state_merge",
    """
WITH d AS (SELECT doc_id, text FROM documents
           WHERE length(trim(text, e' \\n\\r\\t')) > 0),
cur AS (
  SELECT CAST(doc_id AS VARCHAR) AS item_id,
         sha256(CASE WHEN doc_id % 5 = 0 THEN text || '!' ELSE text END)
           AS content_hash
  FROM d WHERE doc_id % 2 = 0
),
st AS (
  SELECT CAST(doc_id AS VARCHAR) AS item_id, sha256(text) AS content_hash
  FROM d WHERE doc_id % 3 = 0
)
SELECT item_id, content_hash FROM cur
UNION ALL
SELECT s.item_id, s.content_hash FROM st s
WHERE NOT EXISTS (SELECT 1 FROM cur c WHERE c.item_id = s.item_id)
""",
    "T3 ledger upsert (MERGE emulation): batch rows supersede prior entries, "
    "untouched entries carry over",
)
def q_t3_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.state import merge_ledger

    docs = load_table(spark, sf_dir, "documents").filter(non_empty(F.col("text")))
    cur_text = F.when(
        F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit("!"))
    ).otherwise(F.col("text"))
    processed = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").cast("string").alias("item_id"),
        sha256_text(cur_text).alias("content_hash"),
    )
    prior = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").cast("string").alias("item_id"),
        sha256_text(F.col("text")).alias("content_hash"),
    )
    return merge_ledger(processed, prior)


# ---------------------------------------------------------------------------
# S4: PostgreSQLSource semantics (sources.py:237-308) — timestamp cursor +
# first-column-as-content positional projection
# ---------------------------------------------------------------------------


@register(
    "s4_events_content",
    """
SELECT CAST(event_type AS VARCHAR) AS content, event_id, user_id, value,
       'postgres://synthetic/events' AS source
FROM events WHERE ts > TIMESTAMP '2024-01-20'
""",
    "S4 JDBC source: cursor predicate + first-col-as-content projection",
)
def q_s4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.sources.relational import (
        first_col_as_content,
        incremental_by_timestamp,
    )

    ev = load_table(spark, sf_dir, "events")
    ev = incremental_by_timestamp(ev, "ts", "2024-01-20")
    proj = ev.select("event_type", "event_id", "user_id", "value")
    return first_col_as_content(proj, "postgres://synthetic/events")


# ---------------------------------------------------------------------------
# S2: WebSource line normalization (sources.py:134-137)
@register(
    "s1_parse_eml",
    f"""
WITH built AS (
  SELECT doc_id, lang,
         'Doc ' || CAST(doc_id AS VARCHAR) || ' report' || e'\\n\\n' || text
           AS joined
  FROM documents
),
parsed AS (
  SELECT doc_id, lang,
         array_to_string({_DK_ELS.format(src="joined")}, e'\\n\\n') AS parsed
  FROM built
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN length(parsed) > 0
                     THEN len(string_split(parsed, e'\\n\\n')) ELSE 0 END)
            AS BIGINT) AS n_elements,
       CAST(count(DISTINCT md5(parsed)) AS BIGINT) AS n_uniq,
       round(avg(length(parsed)), 4) AS avg_len
FROM parsed GROUP BY lang
""",
    "S1 parse seam for .eml, ORACLE-CHECKED end to end (golden tests "
    "already pin tricky MIME; this pins the whole distributed path): a "
    "complete RFC-822 message is BUILT per doc in Catalyst (headers + "
    "declared utf-8 text/plain body from the documents text, including "
    "non-ASCII zh), the raw bytes run through the REAL stdlib email "
    "extractor (subject element + decoded body) and the shared blank-line "
    "normalization, and the oracle recomputes the expected parse as "
    "elements of 'subject \\n\\n body' — a header-parse or "
    "charset-decode bug hash-mismatches.",
)
def q_s1_parse_eml(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.sources.parsers import parse_eml

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    raw = F.encode(
        F.concat(
            F.lit("Subject: Doc "),
            F.col("doc_id").cast("string"),
            F.lit(" report\r\n"),
            F.lit("From: gen@example.com\r\n"),
            F.lit("MIME-Version: 1.0\r\n"),
            F.lit("Content-Type: text/plain; charset=utf-8\r\n"),
            F.lit("Content-Transfer-Encoding: 8bit\r\n\r\n"),
            F.col("text"),
        ),
        "UTF-8",
    )
    return _parse_rollup(docs.withColumn("parsed", parse_eml(raw)))


@register(
    "s1_parse_pptx",
    f"""
WITH parsed AS (
  SELECT doc_id, lang,
         array_to_string({_DK_ELS.format(src="text")}, e'\\n\\n') AS parsed
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN length(parsed) > 0
                     THEN len(string_split(parsed, e'\\n\\n')) ELSE 0 END)
            AS BIGINT) AS n_elements,
       CAST(count(DISTINCT md5(parsed)) AS BIGINT) AS n_uniq,
       round(avg(length(parsed)), 4) AS avg_len
FROM parsed GROUP BY lang
""",
    "S1 parse seam for .pptx, ORACLE-CHECKED end to end: a complete OOXML "
    "presentation (zip + slide XML, document text as an escaped DrawingML "
    "run) is built per doc in the same Arrow mapInPandas shape as any "
    "binary ingest, the real zipfile+ElementTree extractor pulls the "
    "slide text back out, and the shared blank-line normalization must "
    "reproduce exactly the elements of the original text — a zip-layout, "
    "XML-escaping, or run-joining bug hash-mismatches.",
)
def q_s1_parse_pptx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import pandas as pd

    from yaml_pipe_spark.sources.parsers import parse_pptx

    def build(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import zipfile
        from xml.sax.saxutils import escape

        a = "http://schemas.openxmlformats.org/drawingml/2006/main"
        p = "http://schemas.openxmlformats.org/presentationml/2006/main"
        for pdf in it:
            payloads = []
            for text in pdf["text"]:
                xml = (
                    f'<?xml version="1.0"?><p:sld xmlns:p="{p}" '
                    f'xmlns:a="{a}"><p:cSld><p:spTree><a:p><a:r>'
                    f'<a:t>{escape(text or "")}</a:t>'
                    f"</a:r></a:p></p:spTree></p:cSld></p:sld>"
                )
                buf = io.BytesIO()
                with zipfile.ZipFile(buf, "w") as zf:
                    zf.writestr("ppt/slides/slide1.xml", xml)
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "raw": payloads,
                }
            )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    built = docs.mapInPandas(build, "doc_id long, lang string, raw binary")
    return _parse_rollup(built.withColumn("parsed", parse_pptx(F.col("raw"))))


def _parse_rollup(parsed: DataFrame) -> DataFrame:
    """Shared rollup for the end-to-end parser oracles: per-lang doc,
    element, distinct-hash, and length stats over a `parsed` column."""
    n_els = F.when(
        F.length("parsed") > 0, F.size(F.split(F.col("parsed"), "\n\n"))
    ).otherwise(F.lit(0))
    return parsed.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(n_els).cast("long").alias("n_elements"),
        F.countDistinct(F.md5("parsed")).cast("long").alias("n_uniq"),
        F.round(F.avg(F.length("parsed")), 4).alias("avg_len"),
    )


_PARSE_ROUNDTRIP_ORACLE = f"""
WITH parsed AS (
  SELECT doc_id, lang,
         array_to_string({_DK_ELS.format(src="text")}, e'\\n\\n') AS parsed
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN length(parsed) > 0
                     THEN len(string_split(parsed, e'\\n\\n')) ELSE 0 END)
            AS BIGINT) AS n_elements,
       CAST(count(DISTINCT md5(parsed)) AS BIGINT) AS n_uniq,
       round(avg(length(parsed)), 4) AS avg_len
FROM parsed GROUP BY lang
"""


@register(
    "s1_parse_docx",
    _PARSE_ROUNDTRIP_ORACLE,
    "S1 parse seam for .docx, ORACLE-CHECKED end to end: a complete OOXML "
    "wordprocessing doc (zip + document.xml, the text as an escaped w:t "
    "run) is built per doc, the real zipfile+ElementTree extractor pulls "
    "it back out, and the normalization must reproduce the elements of "
    "the original text exactly.",
)
def q_s1_parse_docx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import pandas as pd

    from yaml_pipe_spark.sources.parsers import parse_docx

    def build(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import zipfile
        from xml.sax.saxutils import escape

        w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
        for pdf in it:
            payloads = []
            for text in pdf["text"]:
                xml = (
                    f'<?xml version="1.0"?><w:document xmlns:w="{w}">'
                    f'<w:body><w:p><w:r><w:t xml:space="preserve">'
                    f'{escape(text or "")}</w:t></w:r></w:p>'
                    f"</w:body></w:document>"
                )
                buf = io.BytesIO()
                with zipfile.ZipFile(buf, "w") as zf:
                    zf.writestr("word/document.xml", xml)
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "lang": pdf["lang"],
                 "raw": payloads}
            )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    built = docs.mapInPandas(build, "doc_id long, lang string, raw binary")
    return _parse_rollup(built.withColumn("parsed", parse_docx(F.col("raw"))))


@register(
    "s1_parse_pdf",
    _PARSE_ROUNDTRIP_ORACLE,
    "S1 parse seam for .pdf, ORACLE-CHECKED end to end: a complete PDF "
    "(catalog/pages/page objects + an uncompressed content stream whose "
    "BT block carries the document text as a UTF-16BE hex string — the "
    "encoding that survives any character, including zh) is built per "
    "doc, the real stdlib extractor (stream walk, BT/ET operator parse, "
    "hex-string + BOM decode) pulls the text back out, and the "
    "normalization must reproduce the elements of the original text "
    "exactly — an offset, operator-parse, or UTF-16 bug hash-mismatches.",
)
def q_s1_parse_pdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import pandas as pd

    from yaml_pipe_spark.sources.parsers import parse_pdf

    def build(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            payloads = []
            for text in pdf["text"]:
                hx = (
                    b"\xfe\xff" + (text or "").encode("utf-16-be")
                ).hex().encode()
                body = b"BT <" + hx + b"> Tj ET"
                parts = [
                    b"%PDF-1.4\n",
                    b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
                    b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\n"
                    b"endobj\n",
                    b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
                    b" >>\nendobj\n",
                    b"4 0 obj\n<< /Length " + str(len(body)).encode()
                    + b" >>\nstream\n" + body + b"\nendstream\nendobj\n",
                    b"trailer\n<< /Root 1 0 R >>\n%%EOF\n",
                ]
                payloads.append(b"".join(parts))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "lang": pdf["lang"],
                 "raw": payloads}
            )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    built = docs.mapInPandas(build, "doc_id long, lang string, raw binary")
    return _parse_rollup(built.withColumn("parsed", parse_pdf(F.col("raw"))))


@register(
    "s1_parse_epub",
    _PARSE_ROUNDTRIP_ORACLE,
    "S1 parse seam for .epub, ORACLE-CHECKED end to end: a complete EPUB "
    "container (zip with META-INF/container.xml -> OPF manifest/spine -> "
    "an XHTML content document carrying the text as an escaped <p>) is "
    "built per doc, the real zipfile+ElementTree extractor walks "
    "container -> rootfile -> spine -> block elements to pull the text "
    "back out, and the shared normalization must reproduce the elements "
    "of the original text exactly — a container-path, spine-order, or "
    "XHTML-walk bug hash-mismatches.",
)
def q_s1_parse_epub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import pandas as pd

    from yaml_pipe_spark.sources.parsers import parse_epub

    def build(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import zipfile
        from xml.sax.saxutils import escape

        container = (
            '<?xml version="1.0"?>'
            '<container version="1.0" xmlns="urn:oasis:names:tc:'
            'opendocument:xmlns:container"><rootfiles>'
            '<rootfile full-path="OEBPS/content.opf" '
            'media-type="application/oebps-package+xml"/>'
            "</rootfiles></container>"
        )
        opf = (
            '<?xml version="1.0"?>'
            '<package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
            "<manifest>"
            '<item id="ch1" href="ch1.xhtml" '
            'media-type="application/xhtml+xml"/>'
            "</manifest>"
            '<spine><itemref idref="ch1"/></spine></package>'
        )
        for pdf in it:
            payloads = []
            for text in pdf["text"]:
                xhtml = (
                    '<?xml version="1.0"?>'
                    '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
                    f'<p>{escape(text or "")}</p>'
                    "</body></html>"
                )
                buf = io.BytesIO()
                with zipfile.ZipFile(buf, "w") as zf:
                    zf.writestr("mimetype", "application/epub+zip")
                    zf.writestr("META-INF/container.xml", container)
                    zf.writestr("OEBPS/content.opf", opf)
                    zf.writestr("OEBPS/ch1.xhtml", xhtml)
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "lang": pdf["lang"],
                 "raw": payloads}
            )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    built = docs.mapInPandas(build, "doc_id long, lang string, raw binary")
    return _parse_rollup(built.withColumn("parsed", parse_epub(F.col("raw"))))


# ---------------------------------------------------------------------------


@register(
    "s2_normalize_lines",
    """
SELECT doc_id,
       sha256(array_to_string(list_filter(
         list_transform(string_split(text, chr(10)), x -> trim(x)),
         x -> length(x) > 0), chr(10))) AS norm_hash,
       CAST(len(list_filter(
         list_transform(string_split(text, chr(10)), x -> trim(x)),
         x -> length(x) > 0)) AS BIGINT) AS n_lines
FROM documents
""",
    "S2 WebSource text cleanup: strip lines, drop blanks, re-join",
)
def q_s2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.functions.text import normalize_lines

    docs = load_table(spark, sf_dir, "documents")
    lines = F.filter(
        F.transform(F.split(F.col("text"), "\n"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    return docs.select(
        "doc_id",
        sha256_text(normalize_lines(F.col("text"))).alias("norm_hash"),
        F.size(lines).cast("long").alias("n_lines"),
    )


S2_MULTI_FETCH_ORACLE = """
SELECT doc_id, sha256(text) AS content_hash,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
WHERE doc_id % 17 = 0
"""


@register(
    "s2_multi_fetch",
    S2_MULTI_FETCH_ORACLE,
    "S2 multi-URL crawl fan-out (VERDICT r7 ask #6): the documents subset "
    "is staged as local files, their file:// URLs (plus three dead links) "
    "become a URL DataFrame, and sources.web.fetch_urls GETs them on the "
    "EXECUTORS via an Arrow pandas UDF with the reference's per-URL "
    "error->empty rule (sources.py:142-147) — the dead links drop, every "
    "live URL's bytes round-trip. The oracle recomputes content hashes "
    "from the raw documents table, so a fetch that corrupted, truncated, "
    "or re-encoded even one byte hash-mismatches. The file:// staging is "
    "the container-local test vehicle; the operator itself is "
    "scheme-agnostic (http crawls use the same path).",
)
def q_s2_multi_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from yaml_pipe_spark.sources.web import fetch_urls

    staged = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 17 == 0)
        .select("doc_id", "text")
        .collect()  # small by construction: n_docs/17 rows to stage
    )
    stage = os.path.join(
        tempfile.gettempdir(),
        "yps_s2fetch_" + os.path.basename(os.path.normpath(sf_dir)),
    )
    os.makedirs(stage, exist_ok=True)
    for r in staged:
        path = os.path.join(stage, f"doc_{r['doc_id']}.txt")
        with open(path, "w", encoding="utf-8", newline="") as f:
            f.write(r["text"])
    urls = [(f"file://{stage}/doc_{r['doc_id']}.txt",) for r in staged]
    urls += [(f"file://{stage}/missing_{i}.txt",) for i in range(3)]
    fetched = fetch_urls(
        spark.createDataFrame(urls, "url string"), "url", timeout=5.0
    )
    return fetched.select(
        F.regexp_extract("url", r"doc_(\d+)\.txt$", 1)
        .cast("long")
        .alias("doc_id"),
        F.sha2(F.col("content"), 256).alias("content_hash"),
        F.octet_length("content").cast("long").alias("n_bytes"),
    )


# ---------------------------------------------------------------------------
# Dedup suite (north-star extension; absent in the reference, SURVEY §2.9)
# ---------------------------------------------------------------------------

_DK_SHINGLES = r"""
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
sh0 AS (
  SELECT doc_id, UNNEST(generate_series(1, len(t) - 2)) AS i, t
  FROM toks WHERE len(t) >= 3
),
shingles AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM sh0
)"""

_DK_SIGS = ", ".join(
    f"min(md5('{s}:' || shingle)) AS sig_{s}" for s in range(16)
)
_DK_BUCKETS = "\nUNION ALL\n".join(
    f"SELECT doc_id, {b} AS band_id, md5('{b}|' || "
    + " || ".join(f"sig_{b * 4 + r}" for r in range(4))
    + ") AS band_key FROM sigs"
    for b in range(4)
)

# Skew-guard twins (mirror operators/dedup.py defaults): LSH buckets larger
# than 10k members are dropped before pairing; the inverted index keeps only
# shingles with document frequency <= max(floor(0.005 * n_docs), 50). Inert
# at test scale (no bucket nears 10k, df never exceeds 50), load-bearing at
# 100 TB — expressed in BOTH engines so the twins stay semantically equal.
_DK_DF_CUT = """
thr AS (
  SELECT greatest(CAST(floor(0.005 * count(DISTINCT doc_id)) AS BIGINT),
                  50) AS t
  FROM shingles
),
dfq AS (SELECT shingle, count(*) AS df FROM shingles GROUP BY 1),
shf AS (
  SELECT s.doc_id, s.shingle
  FROM shingles s JOIN dfq USING (shingle), thr
  WHERE dfq.df <= thr.t
)"""

_DK_GRAM8 = " || ' ' || ".join(f"t[i+{j}]" for j in range(8))

SUBSTRING_SPAN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
sh0 AS (
  SELECT doc_id, UNNEST(generate_series(1, len(t) - 7)) AS i, t
  FROM toks WHERE len(t) >= 8
),
grams AS (
  SELECT DISTINCT doc_id, {_DK_GRAM8} AS g FROM sh0
),
thr AS (
  SELECT greatest(CAST(floor(0.005 * count(DISTINCT doc_id)) AS BIGINT),
                  50) AS t
  FROM grams
),
dfq AS (SELECT g, count(*) AS df FROM grams GROUP BY 1),
gf AS (
  SELECT grams.doc_id, grams.g
  FROM grams JOIN dfq USING (g), thr
  WHERE dfq.df <= thr.t
),
own AS (SELECT g, min(doc_id) AS owner FROM gf GROUP BY g)
SELECT gf.doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans
FROM gf JOIN own USING (g)
WHERE gf.doc_id > own.owner
GROUP BY gf.doc_id
"""


@register(
    "dedup_substring_span",
    SUBSTRING_SPAN_ORACLE,
    "Exact-substring contamination (dedup.substring_span_duplicates): docs "
    "containing a >= 8-token span that also appears in a lower-id doc, "
    "with the span count — the bucketed form of suffix-array substring "
    "dedup (any repeated span shares its leading 8-gram, so the 8-gram "
    "inverted index finds exactly the affected docs). One partial-min "
    "shuffle builds the gram->owner index; the gram equi-join back never "
    "explodes pairs. The shared df guard drops boilerplate grams above "
    "max(0.5% of docs, 50) in both engines.",
)
def q_dedup_substring_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.dedup import substring_span_duplicates

    return substring_span_duplicates(
        load_table(spark, sf_dir, "documents"), k=8
    )


MINHASH_ORACLE = f"""
WITH {_DK_SHINGLES},
{_DK_DF_CUT},
sigs AS (SELECT doc_id, {_DK_SIGS} FROM shingles GROUP BY doc_id),
buckets0 AS ({_DK_BUCKETS}),
buckets AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT *, count(*) OVER (PARTITION BY band_id, band_key) AS bn
    FROM buckets0
  ) WHERE bn <= 10000
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a
  JOIN buckets b ON a.band_id = b.band_id AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM shf a
  JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
vpairs AS (
  SELECT i.id_a, i.id_b,
         round(i.inter / (sa.n + sb.n - i.inter), 4) AS jaccard
  FROM inter i
  JOIN cands c ON c.id_a = i.id_a AND c.id_b = i.id_b
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
)
SELECT id_a, id_b, jaccard FROM vpairs WHERE jaccard >= 0.8
"""


@register(
    "dedup_exact",
    """
SELECT count(*) AS n_docs,
       count(DISTINCT sha256(text)) AS n_unique,
       CAST(count(*) - count(DISTINCT sha256(text)) AS BIGINT) AS n_dup_docs
FROM documents
""",
    "Exact dedup summary: hash-groupBy over content",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.dedup import exact_dedup_summary

    return exact_dedup_summary(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_lsh",
    MINHASH_ORACLE,
    "MinHash+LSH near-dup: shingle->sign->band->bucket-join->verify",
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_overlap_store(spark, sf_dir).jaccard_pairs(spark, 0.8)


@register(
    "dedup_fuzzy_decontaminate",
    f"""
WITH {_DK_SHINGLES},
{_DK_DF_CUT},
sigs AS (SELECT doc_id, {_DK_SIGS} FROM shingles GROUP BY doc_id),
buckets0 AS ({_DK_BUCKETS}),
buckets AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT *, count(*) OVER (PARTITION BY band_id, band_key) AS bn
    FROM buckets0
  ) WHERE bn <= 10000
),
cands AS (
  SELECT DISTINCT least(c.doc_id, b.doc_id) AS id_a,
                  greatest(c.doc_id, b.doc_id) AS id_b
  FROM buckets c
  JOIN buckets b ON c.band_id = b.band_id AND c.band_key = b.band_key
  WHERE c.doc_id % 7 <> 0 AND b.doc_id % 7 = 0
),
sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM shf a
  JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
vp AS (
  SELECT i.id_a, i.id_b,
         round(i.inter / (sa.n + sb.n - i.inter), 4) AS j
  FROM inter i
  JOIN cands c ON c.id_a = i.id_a AND c.id_b = i.id_b
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE round(i.inter / (sa.n + sb.n - i.inter), 4) >= 0.8
),
mapped AS (
  SELECT CASE WHEN id_a % 7 = 0 THEN id_b ELSE id_a END AS doc_id,
         CASE WHEN id_a % 7 = 0 THEN id_a ELSE id_b END AS bench_id, j
  FROM vp
),
best AS (SELECT doc_id, min(bench_id) AS contaminated_by
         FROM mapped GROUP BY 1)
SELECT b.doc_id, b.contaminated_by, m.j AS jaccard
FROM best b
JOIN mapped m ON m.doc_id = b.doc_id AND m.bench_id = b.contaminated_by
""",
    "FUZZY benchmark decontamination — the published-canon complement of "
    "the exact n-gram gate (text_decontaminate) and the Bloom gate "
    "(text_bloom_decontaminate): paraphrased or lightly-edited eval "
    "items slip exact-match filters, so production pipelines (GPT-3 "
    "appendix C, Llama 2) ALSO drop training docs whose MinHash "
    "collides with any benchmark doc at high Jaccard. Every 7th doc "
    "plays the held-out benchmark; the corpus is banded ONCE (one "
    "signature pass, bucket cap over the full population), the "
    "benchmark-vs-corpus candidate set is ONE equi-join between the "
    "two strata of the same band table — never benchmark x corpus — "
    "and the df-guarded exact-Jaccard verify (>= 0.8) runs only on "
    "candidate pairs. Output: one row per contaminated training doc "
    "with its smallest contaminating benchmark id. At 100 TB the "
    "benchmark side is tiny and the cost is the corpus banding pass "
    "the dedup pipeline already pays — decontamination rides the "
    "same index.",
)
def q_dedup_fuzzy_decontaminate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # the cross-strata candidates are a strata filter over the SAME
    # standard-config candidate universe the overlap store persists, so
    # decontamination is a projection of it — it rides the dedup index
    verified = (
        _minhash_overlap_store(spark, sf_dir)
        .jaccard_pairs(spark, 0.8)
        .filter(
            (F.col("id_a") % 7 == 0) != (F.col("id_b") % 7 == 0)
        )
    )
    mapped = verified.select(
        F.when(F.col("id_a") % 7 == 0, F.col("id_b"))
        .otherwise(F.col("id_a"))
        .alias("doc_id"),
        F.when(F.col("id_a") % 7 == 0, F.col("id_a"))
        .otherwise(F.col("id_b"))
        .alias("bench_id"),
        "jaccard",
    )
    return (
        mapped.groupBy("doc_id")
        .agg(F.min(F.struct("bench_id", "jaccard")).alias("__m"))
        .select(
            "doc_id",
            F.col("__m.bench_id").alias("contaminated_by"),
            F.col("__m.jaccard").alias("jaccard"),
        )
    )


INCREMENTAL_MINHASH_ORACLE = f"""
WITH {_DK_SHINGLES},
spl AS (SELECT CAST(floor(0.8 * max(doc_id)) AS BIGINT) AS s FROM documents),
sigs AS (SELECT doc_id, {_DK_SIGS} FROM shingles GROUP BY doc_id),
buckets0 AS ({_DK_BUCKETS}),
state AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT b.*, count(*) OVER (PARTITION BY band_id, band_key) AS bn
    FROM buckets0 b, spl WHERE b.doc_id < spl.s
  ) WHERE bn <= 10000
),
newb AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT b.*, count(*) OVER (PARTITION BY band_id, band_key) AS bn
    FROM buckets0 b, spl WHERE b.doc_id >= spl.s
  ) WHERE bn <= 10000
),
cands AS (
  SELECT DISTINCT s.doc_id AS id_a, n.doc_id AS id_b
  FROM newb n
  JOIN state s ON n.band_id = s.band_id AND n.band_key = s.band_key
             AND s.doc_id < n.doc_id
  UNION
  SELECT DISTINCT a.doc_id, b.doc_id
  FROM newb a
  JOIN newb b ON a.band_id = b.band_id AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
ash AS (SELECT doc_id, shingle FROM shingles
        WHERE doc_id IN (SELECT id_a FROM cands)),
bsh AS (SELECT doc_id, shingle FROM shingles
        WHERE doc_id IN (SELECT id_b FROM cands)),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM ash a JOIN bsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
vp AS (
  SELECT c.id_a, c.id_b,
         round(i.inter / (sa.n + sb.n - i.inter), 4) AS j
  FROM cands c
  JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
  WHERE round(i.inter / (sa.n + sb.n - i.inter), 4) >= 0.8
),
best AS (SELECT id_b AS doc_id, min(id_a) AS dup_of FROM vp GROUP BY 1),
bestj AS (
  SELECT b.doc_id, b.dup_of, v.j
  FROM best b JOIN vp v ON v.id_b = b.doc_id AND v.id_a = b.dup_of
),
newdocs AS (SELECT doc_id FROM documents, spl WHERE doc_id >= spl.s),
incmin AS (SELECT min(doc_id) AS m FROM newdocs)
SELECT nd.doc_id, bj.dup_of, bj.j AS jaccard,
       CASE WHEN bj.dup_of IS NULL THEN 'kept'
            WHEN bj.dup_of < (SELECT m FROM incmin) THEN 'dup_old'
            ELSE 'dup_new' END AS reason
FROM newdocs nd LEFT JOIN bestj bj USING (doc_id)
"""


@register(
    "dedup_incremental_minhash",
    INCREMENTAL_MINHASH_ORACLE,
    "Incremental cross-snapshot near-dup (dedup.incremental_minhash_dedup): "
    "the last 20% of doc_ids play the daily increment, the first 80% the "
    "standing corpus whose persisted band table (minhash_band_state — the "
    "MinHash analogue of the T2 ledger) is probed by ONE equi-join on "
    "(band_id, band_key). Standing text is re-shingled only for candidate "
    "ids (left-semi cut); verify is raw-shingle Jaccard (df stats are "
    "whole-corpus quantities an increment cannot see — bucket caps on "
    "both sides bound the blowup instead). Per-increment-doc verdict: "
    "smallest lower-id partner wins, reason dup_old/dup_new/kept. The "
    "operational mode at 100 TB: daily cost scales with the increment, "
    "not the corpus.",
)
def q_dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_band_state,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    split = docs.agg(
        F.floor(0.8 * F.max("doc_id")).cast("long").alias("__s")
    )
    staged = docs.crossJoin(F.broadcast(split))
    old = staged.filter(F.col("doc_id") < F.col("__s")).select(
        "doc_id", "text"
    )
    new = staged.filter(F.col("doc_id") >= F.col("__s")).select(
        "doc_id", "text"
    )
    state = minhash_band_state(old)
    return incremental_minhash_dedup(new, state, old)


@register(
    "stream_incremental_dedup",
    INCREMENTAL_MINHASH_ORACLE,
    "Streaming incremental near-dup (streaming.run_incremental_dedup_stream, "
    "closing VERDICT r5 ask #4): the standing 80% of doc_ids preload the "
    "persisted band state + corpus tables, the last 20% arrive as a file-"
    "stream increment, and foreachBatch dedups the micro-batch against the "
    "state via incremental_minhash_dedup then appends its bands/docs — the "
    "reference's run ledger (utils/state_manager.py:155-196) elevated to "
    "its streaming end-state. The availableNow drain equals the batch "
    "two-snapshot answer, so the oracle is INCREMENTAL_MINHASH_ORACLE "
    "unchanged; every state write is content-keyed dynamic partition "
    "overwrite so crash-replay converges (rerun-idempotency unit-tested "
    "in tests/test_stream_incremental_dedup.py).",
)
def q_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from yaml_pipe_spark.operators.dedup import minhash_band_state
    from yaml_pipe_spark.streaming.stream import run_incremental_dedup_stream

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    split = docs.agg(
        F.floor(0.8 * F.max("doc_id")).cast("long").alias("__s")
    )
    staged = docs.crossJoin(F.broadcast(split))
    old = staged.filter(F.col("doc_id") < F.col("__s")).select(
        "doc_id", "text"
    )
    new = staged.filter(F.col("doc_id") >= F.col("__s")).select(
        "doc_id", "text"
    )
    base = os.path.join(
        "spark-warehouse",
        f"stream_inc_dedup_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(base, ignore_errors=True)  # fresh drain every invocation
    # the increment arrives as ONE file -> one micro-batch, so the drain
    # is the exact two-snapshot batch computation
    new.coalesce(1).write.parquet(os.path.join(base, "input"))
    # preload the standing state the way a corpus build would have left it
    from yaml_pipe_spark.streaming.stream import commit_band_state

    commit_band_state(minhash_band_state(old), os.path.join(base, "state"))
    (
        old.withColumn("__snap", F.lit(-1))
        .write.partitionBy("__snap")
        .parquet(os.path.join(base, "state", "corpus"))
    )
    run_incremental_dedup_stream(
        spark,
        os.path.join(base, "input"),
        os.path.join(base, "state"),
        os.path.join(base, "ckpt"),
    )
    return spark.read.parquet(os.path.join(base, "state", "verdicts")).select(
        "doc_id", "dup_of", "jaccard", "reason"
    )


@register(
    "dedup_ngram_jaccard",
    f"""
WITH {_DK_SHINGLES},
{_DK_DF_CUT},
sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM shf a
  JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
vpairs AS (
  SELECT i.id_a, i.id_b,
         round(i.inter / (sa.n + sb.n - i.inter), 4) AS jaccard
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
)
SELECT id_a, id_b, jaccard FROM vpairs WHERE jaccard >= 0.8
""",
    "Exact n-gram Jaccard similarity join via inverted index (no LSH); "
    "document-frequency skew guard on by default, mirrored in the oracle",
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.dedup import exact_jaccard_pairs, token_shingles

    docs = load_table(spark, sf_dir, "documents")
    shingles = token_shingles(docs, "text", "doc_id", k=3)
    return exact_jaccard_pairs(shingles).filter(F.col("jaccard") >= 0.8)


@register(
    "dedup_containment",
    f"""
WITH {_DK_SHINGLES},
{_DK_DF_CUT},
sigs AS (SELECT doc_id, {_DK_SIGS} FROM shingles GROUP BY doc_id),
buckets0 AS ({_DK_BUCKETS}),
buckets AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT *, count(*) OVER (PARTITION BY band_id, band_key) AS bn
    FROM buckets0
  ) WHERE bn <= 10000
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a
  JOIN buckets b ON a.band_id = b.band_id AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM shf a
  JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
vpairs AS (
  SELECT i.id_a, i.id_b,
         round(i.inter / sa.n, 4) AS cont_a,
         round(i.inter / sb.n, 4) AS cont_b
  FROM inter i
  JOIN cands c ON c.id_a = i.id_a AND c.id_b = i.id_b
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
)
SELECT id_a, id_b, cont_a, cont_b FROM vpairs
WHERE greatest(cont_a, cont_b) >= 0.8
""",
    "Broder containment near-dup (dedup.containment_pairs): |A∩B|/|A| per "
    "direction over the LSH candidates — the ASYMMETRIC measure Jaccard "
    "misses: a short doc quoted verbatim inside a long one scores "
    "cont_short = 1.0 while Jaccard stays below any dedup threshold "
    "(union dominated by the long doc). Same inverted-index verify core, "
    "skew guards, and candidate cuts as the Jaccard path (shared "
    "_pair_overlap).",
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ov = _minhash_overlap_store(spark, sf_dir).overlap(spark)
    out = ov.select(
        "id_a",
        "id_b",
        F.round(F.col("inter") / F.col("na"), 4).alias("cont_a"),
        F.round(F.col("inter") / F.col("nb"), 4).alias("cont_b"),
    )
    return out.filter(F.greatest(F.col("cont_a"), F.col("cont_b")) >= 0.8)


@register(
    "corpus_ngram_novelty",
    f"""
WITH {_DK_SHINGLES},
dfq AS (SELECT shingle, count(*) AS df FROM shingles GROUP BY 1)
-- ratio of integers, floor-quantized (round-9 hazard sweep): a per-doc
-- u/n can sit exactly on a 4dp round tie (2e4*u = odd*n) where the two
-- engines' round paths disagree on the inexact double; floor of the
-- identical double has no tie to break
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       floor(CAST(sum(CASE WHEN dfq.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             * 10000 / count(*)) / 10000 AS novelty
FROM shingles s JOIN dfq USING (shingle)
GROUP BY s.doc_id
""",
    "Per-doc n-gram novelty: the fraction of a doc's distinct 3-gram "
    "shingles that appear NOWHERE else in the corpus — the diversity "
    "signal curation uses to prefer novel docs when capping a source or "
    "mixing domains (complement of the boilerplate/df signal the dedup "
    "guards cut on). One df aggregation over the shingle exchange, "
    "joined back and rolled up per doc; no pair joins at any scale.",
)
def q_corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.dedup import token_shingles

    docs = load_table(spark, sf_dir, "documents")
    # the shingle table feeds the df agg AND the join back — materialize
    # once (same staged-pipeline rationale as _pair_overlap)
    sh = token_shingles(docs, "text", "doc_id", k=3).localCheckpoint()
    dfq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    return (
        sh.join(dfq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            # integer-ratio floor-quantize (round-9 hazard sweep; see the
            # oracle comment)
            (
                F.floor(
                    F.sum((F.col("df") == 1).cast("long")).cast("double")
                    * 1e4
                    / F.count("*")
                )
                / 1e4
            ).alias("novelty"),
        )
    )


@register(
    "corpus_dedup_funnel",
    f"""
WITH {_DK_SHINGLES},
{_DK_DF_CUT},
sigs AS (SELECT doc_id, {_DK_SIGS} FROM shingles GROUP BY doc_id),
buckets0 AS ({_DK_BUCKETS}),
buckets AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT *, count(*) OVER (PARTITION BY band_id, band_key) AS bn
    FROM buckets0
  ) WHERE bn <= 10000
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a
  JOIN buckets b ON a.band_id = b.band_id AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM shf a
  JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
vpairs AS (
  SELECT i.id_a, i.id_b,
         round(i.inter / (sa.n + sb.n - i.inter), 4) AS jaccard,
         round(i.inter / sa.n, 4) AS cont_a,
         round(i.inter / sb.n, 4) AS cont_b
  FROM inter i
  JOIN cands c ON c.id_a = i.id_a AND c.id_b = i.id_b
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
),
exact_losers AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
    FROM documents) WHERE rn > 1
),
near_losers AS (SELECT DISTINCT id_b FROM vpairs WHERE jaccard >= 0.8),
cont_losers AS (
  SELECT DISTINCT id_b FROM vpairs WHERE greatest(cont_a, cont_b) >= 0.8
)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_raw,
       CAST(sum(CASE WHEN e.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_after_exact,
       CAST(sum(CASE WHEN e.doc_id IS NULL AND n.id_b IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_after_neardup,
       CAST(sum(CASE WHEN e.doc_id IS NULL AND n.id_b IS NULL
                          AND c.id_b IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_after_containment
FROM documents d
LEFT JOIN exact_losers e ON e.doc_id = d.doc_id
LEFT JOIN near_losers n ON n.id_b = d.doc_id
LEFT JOIN cont_losers c ON c.id_b = d.doc_id
GROUP BY d.lang
""",
    "End-to-end DEDUP funnel per language: raw -> after exact dedup "
    "(lowest-id keeper per content hash) -> after near-dup (LSH-verified "
    "jaccard >= 0.8, higher id dropped) -> after containment (either "
    "direction >= 0.8) — the attrition report a corpus owner reads before "
    "signing off a training mix, composing the three dedup families into "
    "one decision layer (the dedup twin of corpus_curation_funnel). "
    "Loser verdicts are global pair decisions applied in stage order; the "
    "shingle index, LSH candidates, and verify core are SHARED DataFrames "
    "across the jaccard and containment branches so their exchanges "
    "reuse.",
)
def q_corpus_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    rn = F.row_number().over(
        W.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    )
    exact_losers = (
        docs.withColumn("__rn", rn).filter(F.col("__rn") > 1).select("doc_id")
    )
    # jaccard and containment are two projections of the same persisted
    # (inter, na, nb) overlap — the store replaces the per-query verify
    overlap = _minhash_overlap_store(spark, sf_dir).overlap(spark)
    jac = F.round(
        F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
    )
    cont = F.greatest(
        F.round(F.col("inter") / F.col("na"), 4),
        F.round(F.col("inter") / F.col("nb"), 4),
    )
    near_losers = (
        overlap.filter(jac >= 0.8)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    cont_losers = (
        overlap.filter(cont >= 0.8)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    flags = (
        docs.select("doc_id", "lang")
        .join(exact_losers.withColumn("__xe", F.lit(1)), "doc_id", "left")
        .join(near_losers.withColumn("__xn", F.lit(1)), "doc_id", "left")
        .join(cont_losers.withColumn("__xc", F.lit(1)), "doc_id", "left")
    )
    alive_exact = F.col("__xe").isNull()
    alive_near = alive_exact & F.col("__xn").isNull()
    alive_cont = alive_near & F.col("__xc").isNull()
    return flags.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_raw"),
        F.sum(alive_exact.cast("long")).alias("n_after_exact"),
        F.sum(alive_near.cast("long")).alias("n_after_neardup"),
        F.sum(alive_cont.cast("long")).alias("n_after_containment"),
    )


_DK_BIT = (
    "(2 * (((strpos('0123456789abcdef', substr(h, CAST(j // 4 AS INT) + 1, 1)) - 1)"
    " // (CASE WHEN j % 4 = 0 THEN 8 WHEN j % 4 = 1 THEN 4"
    "          WHEN j % 4 = 2 THEN 2 ELSE 1 END)) % 2) - 1)"
)

SIMHASH_FP_CTE = f"""
toks AS (
  SELECT doc_id,
         UNNEST(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))
           AS tok
  FROM documents
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
hh AS (SELECT doc_id, tf, md5(tok) AS h FROM tf),
ex AS (SELECT doc_id, tf, h, UNNEST(generate_series(0, 63)) AS j FROM hh),
bitc AS (
  SELECT doc_id, j, sum(tf * {_DK_BIT}) AS s FROM ex GROUP BY 1, 2
),
fp AS (
  SELECT doc_id,
         string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j)
           AS simhash
  FROM bitc GROUP BY doc_id
)"""


@register(
    "dedup_simhash",
    f"WITH {SIMHASH_FP_CTE}\nSELECT doc_id, simhash FROM fp",
    "SimHash: tf-weighted 64-bit fingerprint per doc (bit-string form)",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.dedup import simhash_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    return simhash_fingerprints(docs, "text", "doc_id")


_SIMHASH_PAIR_CTES = f"""{SIMHASH_FP_CTE},
expanded AS (
  SELECT doc_id, simhash, UNNEST(generate_series(0, 3)) AS band_id FROM fp
),
buck AS (
  SELECT doc_id, simhash, band_id,
         substr(simhash, CAST(band_id * 16 + 1 AS INT), 16) AS band_key
  FROM expanded
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.simhash AS fa, b.simhash AS fb
  FROM buck a
  JOIN buck b ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
),
ham AS (
  SELECT id_a, id_b,
         len(list_filter(generate_series(1, 64),
                         i -> substr(fa, CAST(i AS INT), 1)
                              <> substr(fb, CAST(i AS INT), 1))) AS hamming
  FROM pairs
)"""


# Shared persisted pair graph (operators/pair_graph.py::PairGraphStore):
# the six SimHash-audit queries — pairs, cluster resolution, levenshtein
# verify, split leakage, canonical quality, PageRank — all consume the same
# pair frame and/or its CC labels. Before round 7 each re-shingled the
# corpus and re-ran the banding join (+ iterative CC) from scratch; now the
# first query of a session builds the store once (fingerprint-gated) and
# the rest serve off persisted parquet that is pair-mass-sized, not
# corpus-sized. The oracles are untouched: the persisted tables hold
# exactly the frames the direct computation produced.
def _pair_graph_store(spark: SparkSession, sf_dir: str):
    import os

    from yaml_pipe_spark.operators.pair_graph import PairGraphStore

    store = PairGraphStore(
        os.path.join(
            "spark-warehouse",
            f"pair_graph_{os.path.basename(os.path.normpath(sf_dir))}",
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store.build_if_stale(docs)
    return store


# Shared persisted MinHash overlap (operators/pair_graph.py::
# MinHashOverlapStore): five queries consume the same standard-config
# verify frame — jaccard pairs, containment, per-source dup rate, the
# dedup funnel, and fuzzy decontamination (a strata filter over the same
# candidate universe). First query of a session builds once
# (fingerprint-gated); the rest project the persisted overlap.
def _minhash_overlap_store(spark: SparkSession, sf_dir: str):
    import os

    from yaml_pipe_spark.operators.pair_graph import MinHashOverlapStore

    store = MinHashOverlapStore(
        os.path.join(
            "spark-warehouse",
            f"minhash_overlap_{os.path.basename(os.path.normpath(sf_dir))}",
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store.build_if_stale(docs)
    return store


@register(
    "dedup_simhash_pairs",
    f"""
WITH {_SIMHASH_PAIR_CTES}
SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
FROM ham WHERE hamming <= 3
""",
    "SimHash near-dup pairs: 4x16-bit banding + exact Hamming verify, "
    "served from the persisted pair graph (operators/pair_graph.py)",
)
def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pair_graph_store(spark, sf_dir).pairs(spark)


@register(
    "dedup_cluster_resolution",
    f"""
WITH RECURSIVE {_SIMHASH_PAIR_CTES},
p AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
edges AS (
  SELECT id_a AS a, id_b AS b FROM p
  UNION
  SELECT id_b AS a, id_a AS b FROM p
),
reach(n, m) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
)
SELECT n AS doc_id, min(m) AS cluster_rep FROM reach GROUP BY n
""",
    "Near-dup cluster resolution: connected components (iterative min-label "
    "propagation) over SimHash pairs; rep = min doc_id in the component",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = _pair_graph_store(spark, sf_dir)
    return store.labels(spark).select(
        F.col("node").alias("doc_id"), "cluster_rep"
    )


@register(
    "graph_store_persisted",
    f"""
WITH RECURSIVE {_SIMHASH_PAIR_CTES},
p AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
edges AS (
  SELECT id_a AS a, id_b AS b FROM p
  UNION
  SELECT id_b AS a, id_a AS b FROM p
),
reach(n, m) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
),
cc AS (SELECT n AS doc_id, min(m) AS cluster_rep FROM reach GROUP BY n),
sizes AS (SELECT cluster_rep, count(*) AS n_members FROM cc GROUP BY 1)
SELECT CAST(n_members AS BIGINT) AS n_members,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(n_members) AS BIGINT) AS n_docs,
       min(cluster_rep) AS sample_rep
FROM sizes GROUP BY 1
""",
    "Pair-graph store health audit served ENTIRELY off the persisted "
    "tables (operators/pair_graph.py::PairGraphStore) — the graph twin "
    "of ann_index_persisted / q3_bm25_index_persisted, closing VERDICT "
    "r6 ask #4: cluster-size histogram (n_clusters / n_docs per "
    "component size, min rep as a drill-down anchor) over the persisted "
    "CC labels. The serve plan is a parquet scan of the labels table + "
    "two tiny aggregates — NO re-shingle, NO banding join, NO iterative "
    "loop (plan-asserted in tests/test_pair_graph.py); the build is "
    "amortized across the whole SimHash audit family via "
    "build_if_stale's one-aggregate fingerprint. The oracle recomputes "
    "the full pair graph + recursive CC from the raw corpus, so a "
    "stale or corrupted store cannot hash-match.",
)
def q_graph_store_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = _pair_graph_store(spark, sf_dir)
    sizes = (
        store.labels(spark)
        .groupBy("cluster_rep")
        .agg(F.count("*").alias("n_members"))
    )
    return sizes.groupBy("n_members").agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.sum("n_members").cast("long").alias("n_docs"),
        F.min("cluster_rep").alias("sample_rep"),
    ).select(
        F.col("n_members").cast("long").alias("n_members"),
        "n_clusters",
        "n_docs",
        "sample_rep",
    )


@register(
    "dedup_levenshtein_verify",
    f"""
WITH {_SIMHASH_PAIR_CTES},
p AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
texts AS (SELECT doc_id, substr(text, 1, 80) AS prefix FROM documents)
SELECT p.id_a, p.id_b,
       CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_distance
FROM p
JOIN texts a ON a.doc_id = p.id_a
JOIN texts b ON b.doc_id = p.id_b
WHERE levenshtein(a.prefix, b.prefix) <= 20
""",
    "Edit-distance verification of SimHash candidates: levenshtein on "
    "80-char prefixes (bounded cost per pair), fuzzy-match surface",
)
def q_dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    store = _pair_graph_store(spark, sf_dir)
    prs = store.pairs(spark).select("id_a", "id_b")
    texts = docs.select(
        "doc_id", F.substring("text", 1, 80).alias("prefix")
    )
    a = texts.select(
        F.col("doc_id").alias("id_a"), F.col("prefix").alias("pa")
    )
    b = texts.select(
        F.col("doc_id").alias("id_b"), F.col("prefix").alias("pb")
    )
    return (
        prs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "edit_distance",
            F.levenshtein(F.col("pa"), F.col("pb")).cast("long"),
        )
        .filter(F.col("edit_distance") <= 20)
        .select("id_a", "id_b", "edit_distance")
    )


@register(
    "dedup_embedding_cosine",
    f"""
SELECT * FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({_dk_cos('a.embedding', 'b.embedding')}, 6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
) WHERE cosine >= 0.4
""",
    "Embedding-cosine near-dup pairs (brute-force baseline, Arrow scorer)",
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.dedup import cosine_pairs_arrow

    emb = load_table(spark, sf_dir, "embeddings")
    # the declared exactness baseline (recall ground truth for the blocked
    # twin below) — still the sanctioned quadratic, now scored in numpy
    # with the bit-exact cumsum contract (cosine_pairs_arrow docstring)
    return cosine_pairs_arrow(emb, "vec_id", "embedding", threshold=0.4)


# ---------------------------------------------------------------------------
# Text analysis (north-star extension): language ID, quality, tokens,
# fingerprints — pure expressions with generated SQL twins
# ---------------------------------------------------------------------------


@register(
    "text_vocab_coverage",
    r"""
WITH toks AS (
  SELECT lang, UNNEST(list_filter(regexp_split_to_array(text, '\s+'),
                                  x -> x <> '')) AS tok
  FROM documents
),
lt AS (SELECT lang, tok, count(*) AS c FROM toks GROUP BY lang, tok),
g AS (SELECT tok, sum(c) AS cg FROM lt GROUP BY tok),
topv AS (SELECT tok FROM g ORDER BY cg DESC, tok LIMIT 1000)
SELECT lt.lang,
       CAST(sum(lt.c) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN topv.tok IS NOT NULL THEN lt.c ELSE 0 END)
            AS BIGINT) AS n_covered,
       floor(CAST(sum(CASE WHEN topv.tok IS NOT NULL THEN lt.c ELSE 0 END)
                  AS DOUBLE) * 10000 / sum(lt.c)) / 10000 AS coverage
FROM lt LEFT JOIN topv ON lt.tok = topv.tok
GROUP BY lt.lang
""",
    "Vocabulary coverage per language: the fraction of token occurrences "
    "covered by the corpus's top-1000 tokens — the OOV-rate proxy that "
    "decides tokenizer vocab sizing and flags languages a shared vocab "
    "under-serves. One token shuffle; the top-V selection is "
    "orderBy+limit (TakeOrderedAndProject — distributed top-k, never a "
    "vocab-wide single-partition window) with a (count desc, token) "
    "tiebreak pinned in both engines; the 1000-row vocab broadcasts back.",
)
def q_text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(tokens(F.col("text"))).alias("tok")
    )
    lt = toks.groupBy("lang", "tok").agg(F.count("*").alias("c"))
    g = lt.groupBy("tok").agg(F.sum("c").alias("cg"))
    topv = (
        g.orderBy(F.col("cg").desc(), F.col("tok"))
        .limit(1000)
        .select("tok", F.lit(1).alias("__top"))
    )
    covered = F.sum(
        F.when(F.col("__top") == 1, F.col("c")).otherwise(F.lit(0))
    )
    return (
        lt.join(F.broadcast(topv), "tok", "left")
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            covered.cast("long").alias("n_covered"),
            # integer-ratio floor-quantize (round-9 hazard sweep): a
            # covered/total tie on the 4dp round boundary would let the
            # engines' round paths disagree on the inexact double
            (
                F.floor(covered.cast("double") * 1e4 / F.sum("c")) / 1e4
            ).alias("coverage"),
        )
    )


def _dk_occ(p: str, needle: str) -> str:
    n = needle.replace("'", "''")
    return f"((length({p}) - length(replace({p}, '{n}', ''))) // {len(needle)})"


def _dk_lang_scores() -> str:
    from yaml_pipe_spark.operators.text_stats import LANG_MARKERS

    cols = []
    for lang, markers in LANG_MARKERS.items():
        expr = " + ".join(_dk_occ("p", m) for m in markers)
        cols.append(f"({expr}) AS s_{lang}")
    return ", ".join(cols)


def _lang_case_sql() -> str:
    from yaml_pipe_spark.operators.text_stats import LANG_MARKERS

    langs = list(LANG_MARKERS)
    zero = " AND ".join(f"s_{l} = 0" for l in langs)
    branches = [f"WHEN {zero} THEN 'und'"]
    for i, lang in enumerate(langs[:-1]):
        cond = " AND ".join(f"s_{lang} >= s_{o}" for o in langs[i + 1 :])
        branches.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(branches) + f" ELSE '{langs[-1]}' END"


@register(
    "text_lang_id",
    f"""
WITH p0 AS (SELECT doc_id, ' ' || text || ' ' AS p FROM documents),
s AS (SELECT doc_id, {_dk_lang_scores()} FROM p0)
SELECT doc_id, {_lang_case_sql()} AS lang_pred FROM s
""",
    "Language ID: stopword-marker argmax with deterministic tiebreak",
)
def q_text_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.text_stats import language_id

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", language_id(F.col("text")).alias("lang_pred"))


_DK_NTOK = "len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))"
_DK_PUNCT = (
    "len(regexp_extract_all(text, '[.,;:!?''\"()\\[\\]{}-]'))"
)
_DK_DIGIT = "len(regexp_extract_all(text, '[0-9]'))"
_DK_BPE = "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))"


# Deterministic synthetic multi-line PAGE per document (documents.text is
# single-line and never ends in terminal punctuation, so the C4 line rules
# would be degenerate on it — same derivation trick as _URL_EXPR): five
# lines mixing kept sentences, a too-short line, a javascript notice, a
# lorem-ipsum tell, and a curly-brace template, keyed off doc_id moduli so
# every rule path has real population. Identical expression text in both
# engines.
_C4_PAGE_EXPR = """
concat_ws(chr(10),
  concat(text, '.'),
  CASE WHEN doc_id % 3 = 0 THEN 'too short.'
       ELSE concat(substr(text, 1, 120), '!') END,
  CASE WHEN doc_id % 4 = 0 THEN 'Please enable JavaScript to view this page.'
       ELSE 'A second proper sentence with enough words appears here.' END,
  CASE WHEN doc_id % 11 = 0 THEN 'lorem ipsum dolor sit amet consectetur.'
       ELSE 'Closing remarks follow in this final proper sentence.' END,
  CASE WHEN doc_id % 13 = 0 THEN 'function render() { return 1; }'
       ELSE 'The very last line also ends with terminal punctuation.' END
)
"""


@register(
    "text_c4_filters",
    f"""
WITH pages AS (
  SELECT doc_id, source, {_C4_PAGE_EXPR} AS page FROM documents
),
l0 AS (
  SELECT doc_id, source, page,
         list_filter(list_transform(string_split(page, chr(10)),
                                    x -> trim(x)), l -> l <> '') AS ls
  FROM pages
),
k AS (
  SELECT doc_id, source, ls,
         list_filter(ls, l -> regexp_matches(l, '[.!?"]$')
             AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= 5
             AND NOT contains(lower(l), 'javascript')) AS kept,
         contains(lower(page), 'lorem ipsum') AS lorem,
         contains(page, '{{') AS brace
  FROM l0
),
d AS (
  SELECT source, doc_id, len(kept) AS n_kept,
         CASE WHEN len(ls) > 0
              THEN round(len(kept) * 1.0 / len(ls), 4) ELSE 0.0 END
           AS kept_ratio,
         CASE WHEN len(kept) >= 3 AND NOT lorem AND NOT brace
              THEN 1 ELSE 0 END AS c4_pass,
         sha256(array_to_string(kept, chr(10))) AS cleaned_sha
  FROM k
)
-- mean over EXACT integer 4dp units, floor-quantized (round-9 hazard
-- sweep): kept_ratio is a 4dp-rounded grid value, so avg() can land
-- exactly on a 4dp round boundary where engine fold orders disagree
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(c4_pass) AS BIGINT) AS n_pass,
       floor(CAST(sum(CAST(round(kept_ratio * 10000) AS BIGINT)) AS DOUBLE)
             / count(*)) / 10000 AS avg_kept_ratio,
       min(cleaned_sha) AS sample_sha
FROM d GROUP BY source
""",
    "C4 line-level cleaning rules (Raffel et al. 2020 sec. 2.2; "
    "operators/quality.py::c4_line_filters) — the rule bundle the "
    "document-level Gopher rules stack on: keep lines ending in terminal "
    "punctuation with >= 5 words and no 'javascript' mention; fail pages "
    "containing 'lorem ipsum' or a curly brace. Signals are computed on a "
    "deterministic multi-line page derived per doc (the raw documents "
    "are single-line). The per-source rollup carries sha256 of each "
    "cleaned page (min per source) so the oracle must reproduce the "
    "TRANSFORMED text byte-exactly, not just the counts. Pure Catalyst: "
    "one split + two array filters on the scan, one source-keyed "
    "shuffle; at 100 TB the line filter is a narrow map exactly where "
    "it must run.",
)
def q_text_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.quality import c4_line_filters

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(_C4_PAGE_EXPR).alias("page")
    )
    sig = c4_line_filters(docs, text_col="page")
    j = sig.join(docs.select("doc_id", "source"), "doc_id")
    return j.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("c4_pass").cast("long").alias("n_pass"),
        # mean over EXACT integer 4dp units, floor-quantized (round-9
        # hazard sweep; see the oracle comment)
        fq_unit_mean(F.col("kept_ratio"), 4, 4, F.count("*")).alias(
            "avg_kept_ratio"
        ),
        F.min("cleaned_sha").alias("sample_sha"),
    )


@register(
    "quality_rho_excess",
    r"""
WITH toksr AS (
  SELECT source, doc_id, regexp_extract_all(lower(text), '\p{L}+') AS t
  FROM documents
),
base AS (SELECT source, doc_id, t FROM toksr WHERE len(t) >= 2),
bg0 AS (
  SELECT source, doc_id, UNNEST(generate_series(1, len(t) - 1)) AS i, t
  FROM base
),
bgs AS (SELECT source, doc_id, t[i] AS prev, t[i+1] AS cur FROM bg0),
dt AS (
  SELECT source, doc_id, prev, cur, count(*) AS c
  FROM bgs GROUP BY 1, 2, 3, 4
),
lmd AS (SELECT source, prev, cur, sum(c) AS cb FROM dt GROUP BY 1, 2, 3),
pvd AS (SELECT source, prev, sum(cb) AS cp FROM lmd GROUP BY 1, 2),
docd AS (
  SELECT dt.source, dt.doc_id,
         sum(dt.c * (log10(CAST(lmd.cb AS DOUBLE))
                     - log10(CAST(pvd.cp AS DOUBLE)))) / sum(dt.c) AS lpd
  FROM dt
  JOIN lmd ON dt.source = lmd.source AND dt.prev = lmd.prev
          AND dt.cur = lmd.cur
  JOIN pvd ON dt.source = pvd.source AND dt.prev = pvd.prev
  GROUP BY 1, 2
),
lmg AS (SELECT prev, cur, sum(c) AS cb FROM dt GROUP BY 1, 2),
pvg AS (SELECT prev, sum(cb) AS cp FROM lmg GROUP BY 1),
docg AS (
  SELECT dt.doc_id,
         sum(dt.c * (log10(CAST(lmg.cb AS DOUBLE))
                     - log10(CAST(pvg.cp AS DOUBLE)))) / sum(dt.c) AS lpg
  FROM dt
  JOIN lmg ON dt.prev = lmg.prev AND dt.cur = lmg.cur
  JOIN pvg ON dt.prev = pvg.prev
  GROUP BY 1
),
ex AS (
  SELECT d.source, d.doc_id, round(d.lpd - g.lpg, 4) AS excess
  FROM docd d JOIN docg g USING (doc_id)
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY excess DESC, doc_id) AS rn
  FROM ex
)
-- avg over EXACT integer 4dp units, floor-quantized: a mean of rounded
-- values can land exactly on a 4dp round boundary where engine fold
-- orders disagree (the corpus_ppl_quality_corr round-8 flake class);
-- max() is an order statistic and stays safe under plain round
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       floor(CAST(sum(CAST(round(excess * 10000) AS BIGINT)) AS DOUBLE)
             / count(*)) / 10000 + 0.0 AS avg_excess,
       round(max(excess), 4) AS max_excess,
       min(CASE WHEN rn = 1 THEN doc_id END) AS keep_doc
FROM rk GROUP BY source
""",
    "RHO-style learnability scoring (Mindermann et al. 2022's reducible "
    "holdout loss, in the LM-difference form DoGE/DSIR-family pipelines "
    "use): per-doc excess log-probability = mean bigram logprob under "
    "the doc's own DOMAIN (source) LM minus under the GENERAL pooled "
    "LM. High excess = characteristic of its domain and cheap to learn "
    "there; near-zero = generic mass the general model already covers; "
    "strongly negative = off-domain noise. Both LMs aggregate from ONE "
    "localCheckpointed (doc, bigram) statistic "
    "(text_stats.bigram_doc_table + bigram_doc_logprob_from_dt with "
    "group_col=source vs a constant), so the corpus is tokenized and "
    "shuffled ONCE and the cost is vocabulary-sized LM joins. Per-source "
    "rollup: mean/max excess + the argmax doc (min-id ties) — the "
    "per-domain selection anchor.",
)
def q_quality_rho_excess(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from yaml_pipe_spark.operators.text_stats import bigram_doc_logprob_from_dt

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    # FUSED arms (round 8): both LMs aggregate from ONE (doc, bigram)
    # statistic — the group column is functional of the doc, so the
    # domain and general groupings are equi-joined dims over a single
    # localCheckpointed dt instead of two full tokenize+shuffle passes.
    # (A PERSISTED dt store was built and measured first: build cost is
    # corpus-footprint-scale — unlike the pair stores — so the family
    # total got WORSE; measurement in ROUND8_NOTES. The fusion keeps the
    # one-corpus-pass win without the store IO.)
    from yaml_pipe_spark.operators.text_stats import bigram_doc_table

    dt = bigram_doc_table(docs).localCheckpoint()
    dom = bigram_doc_logprob_from_dt(
        dt, docs.select("doc_id", "source"), "source"
    ).select("source", "doc_id", F.col("lp0").alias("lpd"))
    gen = bigram_doc_logprob_from_dt(
        dt,
        docs.select("doc_id", F.lit("all").alias("__g")),
        "__g",
    ).select("doc_id", F.col("lp0").alias("lpg"))
    ex = dom.join(gen, "doc_id").select(
        "source",
        "doc_id",
        F.round(F.col("lpd") - F.col("lpg"), 4).alias("excess"),
    )
    rn = F.row_number().over(
        W.partitionBy("source").orderBy(F.desc("excess"), F.col("doc_id"))
    )
    rk = ex.withColumn(
        "rn", rn
    ).withColumn(  # exact 4dp units (excess is already 4dp-rounded)
        "excess_u", F.round(F.col("excess") * 1e4).cast("long")
    )
    return rk.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        # integer-sum mean, floor-quantized (fold-order-proof; see oracle)
        (
            F.floor(F.sum("excess_u").cast("double") / F.count("*")) / 1e4
            + F.lit(0.0)
        ).alias("avg_excess"),
        F.round(F.max("excess"), 4).alias("max_excess"),
        F.min(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("keep_doc"),
    )


def _dk_stop_hits() -> str:
    from yaml_pipe_spark.operators.text_stats import LANG_MARKERS

    return " + ".join(
        _dk_occ("(' ' || text || ' ')", m)
        for ms in LANG_MARKERS.values()
        for m in ms
    )


@register(
    "text_quality",
    f"""
WITH base AS (
  SELECT doc_id,
         length(text) AS n_chars,
         {_DK_NTOK} AS n_tokens,
         {_DK_BPE} AS n_bpe_tokens,
         {_DK_PUNCT} AS n_punct,
         {_DK_DIGIT} AS n_digit,
         ({_dk_stop_hits()}) AS stop_hits
  FROM documents
),
safe AS (
  SELECT *, greatest(n_chars, 1) AS sc, greatest(n_tokens, 1) AS st FROM base
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens,
       round(n_punct / sc, 4) AS punct_ratio,
       round(n_digit / sc, 4) AS digit_ratio,
       round(stop_hits / st, 4) AS stopword_ratio,
       round(least(n_tokens / 100.0, 1.0) * 0.25
             + (1 - least(n_punct / sc * 4, 1.0)) * 0.25
             + least(stop_hits / st * 3, 1.0) * 0.25
             + least(n_tokens / sc * 6, 1.0) * 0.25, 4) AS quality_score
FROM safe
""",
    "Quality scoring: length/punct/stopword ratios + fixed-weight composite",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.text_stats import text_statistics

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text_statistics(docs).select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "n_bpe_tokens",
        "punct_ratio",
        "digit_ratio",
        "stopword_ratio",
        "quality_score",
    )


@register(
    "text_fingerprint",
    f"""
WITH {_DK_SHINGLES}
SELECT doc_id,
       min(md5(shingle)) AS fp_min,
       max(md5(shingle)) AS fp_max,
       count(DISTINCT shingle) AS n_shingles
FROM shingles GROUP BY doc_id
""",
    "Document fingerprinting: min/max shingle hash + shingle cardinality",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.text_stats import doc_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    return doc_fingerprint(docs, "text", "doc_id", k=3)


# ---------------------------------------------------------------------------
# Corpus assembly: blocked embedding dedup (scale path), deterministic
# stratified sampling, token-budget sharding, tf-idf top terms
# ---------------------------------------------------------------------------

_DK_SIGN_BUCKET = "concat(" + ", ".join(
    f"CASE WHEN embedding[{i}] >= 0 THEN '1' ELSE '0' END" for i in range(1, 5)
) + ")"


@register(
    "dedup_embedding_cosine_blocked",
    f"""
WITH b AS (
  SELECT vec_id, embedding, {_DK_SIGN_BUCKET} AS bkt FROM embeddings
)
SELECT * FROM (
  SELECT a.vec_id AS id_a, c.vec_id AS id_b,
         round({_dk_cos('a.embedding', 'c.embedding')}, 6) AS cosine
  FROM b a JOIN b c ON a.bkt = c.bkt AND a.vec_id < c.vec_id
) WHERE cosine >= 0.4
""",
    "Embedding near-dup with sign-LSH blocking: candidate pairs only within "
    "a bucket — the equi-join scale path for cosine_pairs",
)
def q_dedup_emb_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.dedup import cosine_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    bucket = F.concat(
        *[
            F.when(F.get(F.col("embedding"), i) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for i in range(4)
        ]
    )
    b = emb.withColumn("bkt", bucket)
    return cosine_pairs(b, "vec_id", "embedding", threshold=0.4, block_col="bkt")


_SAMPLE_RATES = {"en": 0.5, "de": 0.25}


def _dk_byte0(expr: str) -> str:
    return (
        f"((strpos('0123456789abcdef', substr(md5({expr}), 1, 1)) - 1) * 16 + "
        f"(strpos('0123456789abcdef', substr(md5({expr}), 2, 1)) - 1))"
    )


@register(
    "sample_stratified",
    f"""
SELECT doc_id, lang FROM documents
WHERE {_dk_byte0("CAST(doc_id AS VARCHAR)")} <
      (CASE WHEN lang = 'en' THEN 0.5
            WHEN lang = 'de' THEN 0.25 ELSE 1.0 END) * 256
""",
    "Deterministic stratified downsampling: keep iff byte0(md5(id)) < "
    "rate(lang) * 256 — reproducible, shuffle-free",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(docs, "lang", _SAMPLE_RATES, "doc_id")
    return out.select("doc_id", "lang")


@register(
    "shard_token_budget",
    """
WITH t AS (
  SELECT doc_id, lang,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))
           AS n_tokens
  FROM documents
),
c AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
  FROM t
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor((cum - n_tokens) / 4096.0) AS BIGINT) AS shard_id
FROM c
""",
    "Token-budget training shards: per-lang exclusive prefix sum / budget "
    "(parallel per-stratum windows, no global sort)",
)
def q_shard_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.sampling import shard_by_token_budget

    docs = load_table(spark, sf_dir, "documents")
    out = shard_by_token_budget(
        docs, "text", "doc_id", stratum_col="lang", budget=4096
    )
    return out.select("doc_id", "lang", "n_tokens", "shard_id")


@register(
    "text_tfidf_topterms",
    r"""
WITH tok AS (
  SELECT doc_id,
         UNNEST(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))
           AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
docfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS nd FROM tf),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln((n.nd + 1) / (docfreq.df + 1.0)), 6) AS tfidf
  FROM tf JOIN docfreq USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, tfidf, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3
""",
    "Top-3 characteristic terms per doc by smoothed tf-idf",
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.text_stats import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "text", "doc_id", k=3)


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
# ANN scale path: deterministic sign-bit bucketing (LSH-style) then exact
# rerank within the query's bucket — the oracle-checkable approximate variant
# ---------------------------------------------------------------------------

_DK_BUCKET = "concat(" + ", ".join(
    f"CASE WHEN embedding[{i}] >= 0 THEN '1' ELSE '0' END" for i in range(1, 5)
) + ")"


@register(
    "ann_signlsh_topk",
    f"""
WITH b AS (
  SELECT vec_id, label, embedding, {_DK_BUCKET} AS bkt FROM embeddings
),
q AS (SELECT embedding AS qv, bkt AS qbkt FROM b WHERE vec_id = 0),
s AS (
  SELECT b.vec_id, CAST(b.label AS BIGINT) AS label,
         round({_dk_cos('b.embedding', 'q.qv')}, 6) AS score
  FROM b, q WHERE b.bkt = q.qbkt AND b.vec_id <> 0
)
SELECT vec_id, label, score FROM s ORDER BY score DESC, vec_id LIMIT 5
""",
    "Approximate top-k: sign-bit LSH bucket prune + exact rerank",
)
def q_ann_signlsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.functions.vectors import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    bucket = F.concat(
        *[
            F.when(F.get(F.col("embedding"), i) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for i in range(4)
        ]
    )
    b = emb.withColumn("bkt", bucket)
    q = (
        b.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("qv"), F.col("bkt").alias("qbkt"))
    )
    return (
        b.join(F.broadcast(q), F.col("bkt") == F.col("qbkt"))
        .filter(F.col("vec_id") != 0)
        .withColumn("score", F.round(cosine(F.col("embedding"), F.col("qv")), 6))
        .select("vec_id", F.col("label").cast("long").alias("label"), "score")
        .orderBy(F.col("score").desc(), "vec_id")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# C3: adaptive chunker dispatch (chunkers.py:141-183) — per-row strategy
# choice: markdown iff >= 2 header markers, else fixed-window
# ---------------------------------------------------------------------------


@register(
    "c3_adaptive_chunk",
    r"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE length(trim(text, e' \n\r\t')) > 0
),
cls AS (
  SELECT doc_id, text,
         len(regexp_extract_all(text, '\n# ')) >= 2
         OR len(regexp_extract_all(text, '\n## ')) >= 2
         OR len(regexp_extract_all(text, '\n### ')) >= 2 AS is_md
  FROM docs
),
md AS (
  SELECT doc_id, len(list_filter(
    string_split(regexp_replace(text, '(?m)^(#{1,3} )', e'\x01\1', 'g'),
                 e'\x01'),
    x -> length(trim(x, e' \n\r\t')) > 0)) AS n
  FROM cls WHERE is_md
),
fx AS (
  SELECT doc_id, len(generate_series(1, length(text), 160)) AS n
  FROM cls WHERE NOT is_md
)
SELECT doc_id, 'markdown' AS strategy, CAST(n AS BIGINT) AS n_chunks FROM md
UNION ALL
SELECT doc_id, 'fixed' AS strategy, CAST(n AS BIGINT) AS n_chunks FROM fx
""",
    "C3 adaptive dispatch: per-doc strategy + chunk count from that branch",
)
def q_c3_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.chunkers import adaptive_chunks, is_markdownish

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(non_empty(F.col("text")))
    )
    chunks = adaptive_chunks(docs, "text", 200, 40, id_cols=["doc_id"])
    counts = chunks.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks")
    )
    strat = docs.select(
        "doc_id",
        F.when(is_markdownish(F.col("text")), F.lit("markdown"))
        .otherwise(F.lit("fixed"))
        .alias("strategy"),
    )
    return counts.join(strat, "doc_id").select("doc_id", "strategy", "n_chunks")


# ---------------------------------------------------------------------------
# Similarity JOIN (Q1 generalized DF x DF) + IVF scale path
# ---------------------------------------------------------------------------


@register(
    "sim_knn_join",
    f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10
),
scored AS (
  SELECT q.qid, e.vec_id, round({_dk_cos('e.embedding', 'q.qv')}, 6) AS score
  FROM embeddings e, q WHERE e.vec_id <> q.qid
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY score DESC, vec_id) AS rn
  FROM scored
)
SELECT qid, vec_id, CAST(rn AS BIGINT) AS rank, score
FROM ranked WHERE rn <= 5
""",
    "Similarity join: top-5 neighbors per query row, corpus-side Arrow "
    "scoring (knn_join_arrow — each corpus vector crosses Arrow once, "
    "bit-identical to the expression path; see tests/test_properties.py)",
)
def q_sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.similarity import knn_join_arrow

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    nn = knn_join_arrow(q, emb, k=5)
    return nn.select("qid", "vec_id", "rank", "score")


ANN_IVF_ORACLE = f"""
WITH c AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
),
a AS (
  SELECT e.vec_id, e.label, e.embedding, c.cid,
         round({_dk_cos('e.embedding', 'c.cv')}, 6) AS s
  FROM embeddings e, c
),
asg AS (
  SELECT vec_id, label, embedding, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY s DESC, cid) AS rn
    FROM a
  ) WHERE rn = 1
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
probes AS (
  SELECT cid FROM (
    SELECT c.cid, row_number() OVER (
      ORDER BY round({_dk_cos('c.cv', 'q.qv')}, 6) DESC, c.cid) AS rn
    FROM c, q
  ) WHERE rn <= 2
),
s AS (
  SELECT a.vec_id, CAST(a.label AS BIGINT) AS label,
         round({_dk_cos('a.embedding', 'q.qv')}, 6) AS score
  FROM asg a, q WHERE a.cid IN (SELECT cid FROM probes)
)
SELECT vec_id, label, score FROM s ORDER BY score DESC, vec_id LIMIT 5
"""


@register(
    "ann_ivf_topk",
    ANN_IVF_ORACLE,
    "IVF ANN: centroid-assign, probe 2 nearest cells, exact rerank top-5",
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    out = ivf_topk(emb, qv, centroids, k=5, nprobe=2)
    return out.select("vec_id", F.col("label").cast("long").alias("label"), "score")


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


# ---------------------------------------------------------------------------
# Dedup resolution: keep-first representative (not just pair detection)
# ---------------------------------------------------------------------------


@register(
    "dedup_drop_exact",
    """
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
  FROM documents
)
SELECT lang, count(*) AS n_docs FROM r WHERE rn = 1 GROUP BY lang
""",
    "Exact-dedup resolution: keep lowest-id copy per content hash, per-lang",
)
def q_dedup_drop_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.dedup import drop_exact_duplicates

    docs = load_table(spark, sf_dir, "documents")
    kept = drop_exact_duplicates(docs, "text", "doc_id")
    return kept.groupBy("lang").agg(F.count("*").alias("n_docs"))


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


# ---------------------------------------------------------------------------
# P3: the full pipeline as ONE plan — scan -> empty-filter -> chunk ->
# embed -> sink projection (the reference's 4 materialization barriers
# collapsed into a single lazy chain, SURVEY §3.1)
# ---------------------------------------------------------------------------

_DK_EMB_DIM = (
    "round(((strpos('0123456789abcdef', substr(md5('{d}:' || chunk), 1, 1)) - 1)"
    " * 16 + (strpos('0123456789abcdef', substr(md5('{d}:' || chunk), 2, 1)) - 1))"
    " / 255.0 * 2 - 1, 6)"
)


@register(
    "pipeline_full",
    f"""
WITH docs AS (
  SELECT doc_id, source, text FROM documents WHERE length(trim(text, e' \n\r\t')) > 0
),
starts AS (
  SELECT doc_id, source, text,
         UNNEST(generate_series(1, length(text), 160)) AS s
  FROM docs
),
chunks AS (
  SELECT doc_id, source, (s - 1) // 160 + 1 AS chunk_index,
         substr(text, CAST(s AS INT), 200) AS chunk
  FROM starts
)
SELECT doc_id, source, chunk_index, sha256(chunk) AS chunk_hash,
       {_DK_EMB_DIM.format(d=1)} AS e1,
       {_DK_EMB_DIM.format(d=2)} AS e2,
       {_DK_EMB_DIM.format(d=3)} AS e3,
       {_DK_EMB_DIM.format(d=4)} AS e4
FROM chunks
""",
    "P3 run_pipeline as one lazy chain: scan+filter+chunk+embed+project",
)
def q_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.functions.hashing import hash_embedding

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    chunks = fixed_window_chunks(docs, "text", chunk_size=200, chunk_overlap=40)
    emb = hash_embedding(F.col("chunk"), dim=4)
    out = chunks.withColumn("__e", emb)
    return out.select(
        "doc_id",
        "source",
        "chunk_index",
        sha256_text(F.col("chunk")).alias("chunk_hash"),
        *[F.element_at(F.col("__e"), i).alias(f"e{i}") for i in range(1, 5)],
    )


# ---------------------------------------------------------------------------
# C1 langchain-parity chunker. The recursive splitter is Python (pandas UDF)
# and its output on arbitrary text is not SQL-expressible — arbitrary-text
# parity stays golden-string pinned against the reference's chunks
# (tests/test_chunkers.py vs reference tests/components/test_chunkers.py:19-26).
# The driver row instead runs the REAL splitter over a deterministic
# fixed-token corpus where the recursion collapses to a closed form the
# oracle reconstructs exactly:
#   - tokens are 7-char md5 prefixes (never contain whitespace), joined by
#     single spaces into paragraphs of n = doc_id%23+7 tokens, p = doc_id%3+1
#     paragraphs joined by "\n\n";
#   - every paragraph is >= 55 chars > chunk_size=50, so the splitter always
#     recurses paragraph -> (newline) -> word and never merges across
#     paragraph boundaries;
#   - with piece lengths 7/8/9 (first word, " word", "\n\nword") and
#     chunk_size=50 / overlap=10, the merge loop admits exactly 6 tokens per
#     chunk and keeps exactly 1 overlap token, i.e. chunk k of a paragraph
#     covers tokens [5(k-1)+1, min(5k+1, n)] — verified exhaustively against
#     recursive_split for 500 doc_ids (tests/test_chunkers.py).
# ---------------------------------------------------------------------------

C1_RECURSIVE_ORACLE = """
WITH d AS (
  SELECT doc_id, (doc_id % 23) + 7 AS n, (doc_id % 3) + 1 AS p
  FROM documents
),
pj AS (
  SELECT doc_id, n,
         UNNEST(generate_series(1, p)) AS j,
         1 + CAST(ceil((n - 6) / 5.0) AS BIGINT) AS m
  FROM d
),
ck AS (
  SELECT doc_id, n, j, m, UNNEST(generate_series(1, m)) AS k
  FROM pj
),
s AS (
  SELECT doc_id, (j - 1) * m + k AS chunk_index,
         array_to_string(
           list_transform(
             generate_series(5 * (k - 1) + 1, least(5 * k + 1, n)),
             i -> substr(md5(doc_id::VARCHAR || ':' || j::VARCHAR || ':'
                             || i::VARCHAR), 1, 7)),
           ' ') AS chunk
  FROM ck
)
SELECT doc_id, chunk_index, sha256(chunk) AS chunk_hash,
       CAST(length(chunk) AS BIGINT) AS chunk_len
FROM s
"""


@register(
    "c1_recursive_chunk",
    C1_RECURSIVE_ORACLE,
    "C1 parity chunker (langchain-style recursive splitter, pandas UDF) run "
    "over a deterministic fixed-token corpus whose paragraph->word recursion "
    "the oracle reconstructs in closed form; arbitrary-text parity is "
    "golden-string validated in tests/test_chunkers.py",
)
def q_c1_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.chunkers import recursive_character_chunks

    doc_id = F.col("doc_id")

    def tok(j: Column, i: Column) -> Column:
        key = F.concat_ws(
            ":", doc_id.cast("string"), j.cast("string"), i.cast("string")
        )
        return F.substring(F.md5(key), 1, 7)

    n = (doc_id % 23 + 7).cast("int")
    p = (doc_id % 3 + 1).cast("int")

    def para(j: Column) -> Column:
        return F.array_join(
            F.transform(F.sequence(F.lit(1), n), lambda i: tok(j, i)), " "
        )

    corpus = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .withColumn(
            "text", F.array_join(F.transform(F.sequence(F.lit(1), p), para), "\n\n")
        )
    )
    out = recursive_character_chunks(corpus, "text", chunk_size=50, chunk_overlap=10)
    return out.select(
        "doc_id",
        "chunk_index",
        sha256_text(F.col("chunk")).alias("chunk_hash"),
        F.length("chunk").cast("long").alias("chunk_len"),
    )


# ---------------------------------------------------------------------------
# Session windows: native F.session_window (batch + streaming twins).
# Boundary semantics are STRICT (gap exactly = 30 min starts a new session),
# vs events_sessionize's inclusive ledger islands — both shipped, both
# oracle-checked, the difference documented here.
# ---------------------------------------------------------------------------

SESSION_WINDOW_ORACLE = """
WITH g AS (
  SELECT user_id, ts, value,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_us
  FROM events
),
flags AS (
  SELECT *, CASE WHEN prev_us IS NULL
                   OR epoch_us(ts) - prev_us >= 1800000000
                 THEN 1 ELSE 0 END AS is_new
  FROM g
),
sess AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS session_seq
  FROM flags
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM sess GROUP BY user_id, session_seq
"""


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


_STREAM_COUNTER = [0]


def _drain_to_memory(stream_df, output_mode: str, name: str):
    # Stateful streaming operators pay a per-shuffle-partition state-store
    # cost (open/commit per micro-batch per partition); at test scale 32
    # partitions are pure overhead, so drain with 8. The partition count is
    # baked into the checkpoint at first run — production picks it by target
    # state size per partition, not by core count.
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return name


@register(
    "stream_session_window",
    SESSION_WINDOW_ORACLE,
    "Structured Streaming session_window (complete-mode availableNow drain) "
    "— same oracle as the batch twin",
)
def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.streaming.stream import (
        stream_events,
        streaming_session_agg,
    )

    _STREAM_COUNTER[0] += 1
    name = f"stream_session_window_q{_STREAM_COUNTER[0]}"
    agg = streaming_session_agg(stream_events(spark, sf_dir))
    _drain_to_memory(agg, "complete", name)
    return spark.sql(f"SELECT * FROM {name}")


@register(
    "stream_dedup_first_arrival",
    """
SELECT CAST(count(*) AS BIGINT) AS n_kept,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM (SELECT DISTINCT user_id, event_type FROM events)
""",
    "Streaming dropDuplicates on (user_id, event_type) with watermarked "
    "state; kept-row count equals DISTINCT in batch",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.streaming.stream import stream_events, streaming_dedup

    _STREAM_COUNTER[0] += 1
    name = f"stream_dedup_q{_STREAM_COUNTER[0]}"
    dd = streaming_dedup(
        stream_events(spark, sf_dir), ["user_id", "event_type"]
    )
    _drain_to_memory(dd, "append", name)
    return spark.sql(
        f"SELECT CAST(count(*) AS BIGINT) AS n_kept, "
        f"CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM {name}"
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
    "stream_watermark_dedup",
    """
SELECT event_type, CAST(count(DISTINCT event_id) AS BIGINT) AS n
FROM events GROUP BY event_type
""",
    "Streaming dropDuplicatesWithinWatermark: the stream is the events "
    "source UNIONED WITH ITSELF (every event arrives exactly twice — the "
    "at-least-once delivery failure mode), deduped on event_id with "
    "watermark-bounded per-key state that is dropped once the duplicate "
    "horizon passes (state scales with the horizon, not key cardinality). "
    "The drained per-type counts must equal the batch DISTINCT counts — "
    "a genuine end-to-end oracle for the dedup semantics.",
)
def q_stream_wm_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.streaming.stream import (
        stream_events,
        streaming_dedup_within_watermark,
    )

    _STREAM_COUNTER[0] += 1
    name = f"stream_wm_dedup_q{_STREAM_COUNTER[0]}"
    ev = stream_events(spark, sf_dir)
    doubled = ev.union(ev)
    dd = streaming_dedup_within_watermark(doubled, ["event_id"])
    _drain_to_memory(dd, "append", name)
    return spark.sql(
        f"SELECT event_type, CAST(count(*) AS BIGINT) AS n "
        f"FROM {name} GROUP BY event_type"
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


INTERVAL_JOIN_ORACLE = """
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       v.event_id AS view_id, v.ts AS view_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id
 AND v.ts >= p.ts - INTERVAL 1 HOUR
 AND v.ts <= p.ts
"""


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


@register(
    "stream_interval_join",
    INTERVAL_JOIN_ORACLE,
    "Stream-stream interval join with two-sided watermarks (availableNow "
    "drain) — same oracle as the batch twin",
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.streaming.stream import (
        stream_events,
        streaming_interval_join,
    )

    _STREAM_COUNTER[0] += 1
    name = f"stream_ij_q{_STREAM_COUNTER[0]}"
    ev1 = stream_events(spark, sf_dir)
    ev2 = stream_events(spark, sf_dir)
    p = ev1.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("l_ts"),
    )
    v = ev2.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("r_ts"),
    )
    joined = streaming_interval_join(p, v)
    _drain_to_memory(joined, "append", name)
    return spark.sql(
        f"SELECT purchase_id, user_id, l_ts AS purchase_ts, "
        f"view_id, r_ts AS view_ts FROM {name}"
    )


@register(
    "stream_interval_join_outer",
    """
WITH wm AS (
  SELECT least(
           date_trunc('milliseconds',
             max(CASE WHEN event_type = 'purchase' THEN ts END)),
           date_trunc('milliseconds',
             max(CASE WHEN event_type = 'view' THEN ts END))
         ) - INTERVAL 2 HOUR AS w
  FROM events
),
p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'),
v AS (SELECT event_id AS view_id, user_id, ts AS view_ts
      FROM events WHERE event_type = 'view'),
j AS (
  SELECT p.purchase_id, p.user_id, p.purchase_ts, v.view_id, v.view_ts
  FROM p JOIN v ON p.user_id = v.user_id
   AND v.view_ts >= p.purchase_ts - INTERVAL 1 HOUR
   AND v.view_ts <= p.purchase_ts
),
un AS (
  SELECT p.purchase_id, p.user_id, p.purchase_ts,
         CAST(NULL AS BIGINT) AS view_id,
         CAST(NULL AS TIMESTAMP) AS view_ts
  FROM p, wm
  WHERE p.purchase_ts < wm.w
    AND NOT EXISTS (
      SELECT 1 FROM v
      WHERE v.user_id = p.user_id
        AND v.view_ts >= p.purchase_ts - INTERVAL 1 HOUR
        AND v.view_ts <= p.purchase_ts
    )
)
SELECT * FROM j UNION ALL SELECT * FROM un
""",
    "Stream-stream LEFT OUTER interval join with two-sided watermarks: "
    "matches emit eagerly; a purchase with no view in its 1h lookback "
    "emits with nulls only once the GLOBAL watermark passes it. The "
    "global watermark is the MIN of the per-side watermarks, and each "
    "side's is computed post-filter (max PURCHASE ts / max VIEW ts, "
    "millisecond-truncated, minus the 2h delay) — pinned empirically via "
    "StreamingQueryProgress.eventTime and mirrored exactly in the "
    "oracle's cutoff; no-data batches flush the final eviction wave. The "
    "watermark semantics are themselves under test, not just the join.",
)
def q_stream_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.streaming.stream import (
        stream_events,
        streaming_interval_join,
    )

    _STREAM_COUNTER[0] += 1
    name = f"stream_ij_outer_q{_STREAM_COUNTER[0]}"
    ev1 = stream_events(spark, sf_dir)
    ev2 = stream_events(spark, sf_dir)
    p = ev1.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("l_ts"),
    )
    v = ev2.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("r_ts"),
    )
    joined = streaming_interval_join(p, v, how="left_outer")
    _drain_to_memory(joined, "append", name)
    return spark.sql(
        f"SELECT purchase_id, user_id, l_ts AS purchase_ts, "
        f"view_id, r_ts AS view_ts FROM {name}"
    )


@register(
    "stream_stateful_counter",
    """
SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
""",
    "Custom stateful op (applyInPandasWithState): per-user running counter; "
    "max(running_total) per key over the drain = plain per-key count",
)
def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.streaming.stream import (
        stateful_user_counter,
        stream_events,
    )

    _STREAM_COUNTER[0] += 1
    name = f"stream_stateful_q{_STREAM_COUNTER[0]}"
    counter = stateful_user_counter(stream_events(spark, sf_dir))
    _drain_to_memory(counter, "update", name)
    return spark.sql(
        f"SELECT user_id, max(running_total) AS n_events FROM {name} "
        f"GROUP BY user_id"
    )


@register(
    "stream_tumbling_agg",
    """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
""",
    "Structured Streaming watermarked tumbling agg (complete-mode "
    "availableNow drain) — same oracle as the batch twin; complete mode "
    "keeps all window state so the drain equals the batch result",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.streaming.stream import (
        stream_events,
        streaming_tumbling_agg,
    )

    _STREAM_COUNTER[0] += 1
    name = f"stream_tumbling_agg_q{_STREAM_COUNTER[0]}"
    agg = streaming_tumbling_agg(stream_events(spark, sf_dir))
    _drain_to_memory(agg, "complete", name)
    return spark.sql(f"SELECT * FROM {name}")


@register(
    "stream_window_topk",
    """
WITH counts AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY window_start
                               ORDER BY n_events DESC, event_type) AS rn
  FROM counts
)
SELECT window_start, event_type, n_events, CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= 2
""",
    "Streaming windowed top-k: the watermarked tumbling aggregation runs "
    "in the streaming runtime (complete-mode availableNow drain), and the "
    "top-2 event types per hour are ranked over the drained state — the "
    "trending-now pattern, with ranking deliberately OUTSIDE the stream "
    "(Structured Streaming cannot run a ranking window on an unbounded "
    "aggregate; the drained sink is where top-k belongs). Deterministic "
    "(count desc, type) tiebreak; oracle recomputes windows, counts, and "
    "ranks from the batch table.",
)
def q_stream_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.streaming.stream import (
        stream_events,
        streaming_tumbling_agg,
    )

    _STREAM_COUNTER[0] += 1
    name = f"stream_window_topk_q{_STREAM_COUNTER[0]}"
    agg = streaming_tumbling_agg(stream_events(spark, sf_dir))
    _drain_to_memory(agg, "complete", name)
    return spark.sql(
        f"""
        SELECT window_start, event_type, n_events, rank FROM (
          SELECT window_start, event_type, n_events,
                 CAST(row_number() OVER (
                   PARTITION BY window_start
                   ORDER BY n_events DESC, event_type) AS BIGINT) AS rank
          FROM {name}
        ) WHERE rank <= 2
        """
    )


def _dk_sha_byte(n: int) -> str:
    """Int value of byte `n` (0-based) of a sha256 hex digest column `h`."""
    return (
        f"(16 * (strpos('0123456789abcdef', substr(h, {2 * n + 1}, 1)) - 1)"
        f" + strpos('0123456789abcdef', substr(h, {2 * n + 2}, 1)) - 1)"
    )


_DK_MEDIA = """
  SELECT doc_id,
         ['image','audio','video'][CAST(1 + doc_id % 3 AS INT)] AS modality,
         repeat(CAST(doc_id AS VARCHAR), CAST(1 + doc_id % 7 AS INT))
           AS payload_txt
  FROM documents
"""

_DK_MEDIA_DECODED = f"""
WITH m AS ({_DK_MEDIA}),
d AS (
  SELECT doc_id, modality,
         octet_length(encode(payload_txt)) AS n_bytes,
         sha256(payload_txt) AS h
  FROM m
),
f AS (
  SELECT doc_id, modality, n_bytes, h,
         16 + {_dk_sha_byte(0)} % 240 AS width,
         16 + {_dk_sha_byte(1)} % 240 AS height,
         CASE WHEN modality = 'video' THEN 1 + {_dk_sha_byte(2)} % 120
              ELSE 1 END AS n_frames
  FROM d
)
"""


@register(
    "multimodal_features",
    f"""
{_DK_MEDIA_DECODED}
SELECT modality,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       round(avg(width), 4) AS avg_width,
       CAST(sum({_dk_sha_byte(0)}) AS BIGINT) AS sum_feat_byte0,
       CAST(count(DISTINCT h) AS BIGINT) AS n_unique_payloads
FROM f GROUP BY modality
""",
    "Multimodal binary columns through Arrow mapInPandas feature "
    "extraction, per-modality rollup INCLUDING the feature vector itself "
    "(sum of feat[0] scaled back to its source byte): payloads are keyed "
    "to `documents` so the oracle re-derives every decoded quantity — "
    "formerly the suite's last rows-only batch query, now hash-matched.",
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.multimodal.binary import (
        extract_features,
        media_from_documents,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    feats = extract_features(media_from_documents(docs))
    return feats.groupBy("modality").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.round(F.avg("width"), 4).alias("avg_width"),
        F.sum(F.round(F.element_at("feat", 1) * 255).cast("long")).alias(
            "sum_feat_byte0"
        ),
        F.countDistinct("payload_sha").cast("long").alias("n_unique_payloads"),
    )


@register(
    "multimodal_png_decode",
    """
WITH g AS (
  SELECT doc_id, 2 + doc_id % 14 AS w, 1 + doc_id % 9 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h, UNNEST(generate_series(0, 3*w*h - 1)) AS k
  FROM g
),
v AS (
  SELECT doc_id, w, h, k,
         (doc_id + (k // (3*w)) * 31 + (k % (3*w)) * 7) % 256 AS val
  FROM px
)
SELECT doc_id AS item_id,
       CAST(max(w) AS INT) AS width,
       CAST(max(h) AS INT) AS height,
       CAST(count(*) AS BIGINT) AS n_bytes_decoded,
       CAST(sum(val) AS BIGINT) AS sum_pixels,
       CAST(max(CASE WHEN k = 0 THEN val END) AS BIGINT) AS feat_byte0,
       CAST(sum(CASE WHEN k < 8 THEN val ELSE 0 END) AS BIGINT) AS sum_first8
FROM v GROUP BY doc_id
""",
    "REAL stdlib PNG decode, end-to-end (multimodal.decode_png): one valid "
    "non-interlaced 8-bit RGB PNG per document, scanline r encoded with "
    "filter type r % 5 so all five PNG filters (None/Sub/Up/Average/Paeth) "
    "are exercised corpus-wide; executors inflate the IDAT stream (zlib) "
    "and unfilter every scanline. The report sums EVERY decoded pixel "
    "byte and the oracle recomputes width/height/byte-count/sums from the "
    "generating formulas, so one wrong byte in any scanline (bad Paeth "
    "predictor, off-by-one stride, missed filter branch) hash-mismatches. "
    "Closes VERDICT r4 ask #4; palette/alpha/interlaced stay behind the "
    "documented codec extension point.",
)
def q_multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.multimodal.binary import (
        png_decode_report,
        png_media_from_documents,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return png_decode_report(png_media_from_documents(docs))


@register(
    "multimodal_gif_decode",
    """
WITH g AS (
  SELECT doc_id, 3 + doc_id % 13 AS w, 2 + doc_id % 7 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h, UNNEST(generate_series(0, w*h - 1)) AS k FROM g
),
v AS (
  SELECT doc_id, w, h, k,
         (doc_id + (k // w) * 5 + (k % w) * 3) % 4 AS idx
  FROM px
),
e AS (
  SELECT doc_id, w, h, k, idx,
         (doc_id + idx * 17) % 256 + (doc_id * 2 + idx * 29) % 256
           + (doc_id * 3 + idx * 41) % 256 AS rgb
  FROM v
)
SELECT doc_id AS item_id,
       CAST(max(w) AS INT) AS width,
       CAST(max(h) AS INT) AS height,
       CAST(count(*) AS BIGINT) AS n_pixels,
       CAST(sum(idx) AS BIGINT) AS sum_indices,
       CAST(sum(rgb) AS BIGINT) AS sum_rgb,
       CAST(max(CASE WHEN k = 0 THEN idx END) AS BIGINT) AS first_index
FROM e GROUP BY doc_id
""",
    "REAL stdlib GIF decode, end-to-end (multimodal.decode_gif): one "
    "valid single-frame GIF87a per document with a 4-color global "
    "palette, pixel indices LZW-compressed by a from-scratch "
    "variable-width GIF-LZW codec (the decoder is validated against a "
    "published real-world GIF LZW stream, not just its own encoder — "
    "tests/test_gif_decode.py). Executors parse the container, "
    "concatenate sub-blocks, and run the full clear/EOI/width-growth "
    "decompression; the report sums EVERY decoded palette index and "
    "palette-expanded RGB byte, and the oracle recomputes all of it "
    "from the generating formulas — one wrong index anywhere in the "
    "stream hash-mismatches. Completes the stdlib multimodal family "
    "(BMP/PPM/PNG/WAV/GIF); animation/interlacing/local palettes stay "
    "behind the documented codec extension point.",
)
def q_multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.multimodal.binary import (
        gif_decode_report,
        gif_media_from_documents,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return gif_decode_report(gif_media_from_documents(docs))



@register(
    "multimodal_real_decode",
    """
WITH g AS (
  SELECT doc_id,
         doc_id % 2 = 0 AS is_img,
         2 + doc_id % 14 AS w,
         1 + doc_id % 9 AS h,
         ((3 * (2 + doc_id % 14) + 3) // 4) * 4 AS row_bytes,
         16 + doc_id % 50 AS wav_frames
  FROM documents
)
SELECT doc_id AS item_id,
       CASE WHEN is_img THEN 'image' ELSE 'audio' END AS modality,
       CAST(CASE WHEN is_img THEN 54 + row_bytes * h
                 ELSE 44 + wav_frames END AS BIGINT) AS n_bytes,
       CAST(CASE WHEN is_img THEN w
                 ELSE 8000 + (doc_id % 8) * 1000 END AS INT) AS width,
       CAST(CASE WHEN is_img THEN h ELSE 1 END AS INT) AS height,
       CAST(CASE WHEN is_img THEN 1 ELSE wav_frames END AS INT) AS n_frames,
       CAST(CASE WHEN is_img THEN doc_id % 256
                 ELSE (doc_id * 3) % 256 END AS BIGINT) AS feat_byte0
FROM g
""",
    "REAL decode, end-to-end: complete BMP (even ids) and PCM WAV (odd "
    "ids) files built byte-by-byte from integer formulas, decoded by the "
    "real stdlib parsers behind decode_payload(real_decode=True) — BMP "
    "header fields + pixel bytes, `wave`-module frame counts + PCM bytes. "
    "The oracle recomputes size/dims/frame-count/first-sample from the "
    "generating formulas, so a decoder bug (wrong offset, padding, "
    "endianness) hash-mismatches. Closes the documented real_decode stub "
    "for the stdlib-decodable container formats; JPEG/PNG/MP4 remain the "
    "cluster-side extension point.",
)
def q_multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.multimodal.binary import (
        extract_features,
        real_media_from_documents,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    feats = extract_features(real_media_from_documents(docs), real_decode=True)
    return feats.select(
        "item_id",
        "modality",
        "n_bytes",
        "width",
        "height",
        "n_frames",
        F.round(F.element_at("feat", 1) * 255).cast("long").alias("feat_byte0"),
    )


@register(
    "multimodal_resize",
    """
WITH g AS (
  SELECT doc_id,
         1 + doc_id % 9 AS h0,
         ((3 * (2 + doc_id % 14) + 3) // 4) * 4 AS stride
  FROM documents WHERE doc_id % 2 = 0
)
SELECT doc_id AS item_id,
       CAST(54 + 24 * 5 AS BIGINT) AS n_bytes,
       CAST(8 AS INT) AS width,
       CAST(5 AS INT) AS height,
       -- the decoder reads the target's stored row 0 = target image
       -- BOTTOM row (y_t = 4), nearest-neighbor-mapped to source image
       -- row 4*h0//5, which sits at stored row h0-1-(4*h0//5)
       CAST((doc_id + (h0 - 1 - (4 * h0 // 5)) * stride) % 256 AS BIGINT)
         AS feat_byte0
FROM g
""",
    "REAL image resize, roundtripped: every generated BMP is resized to "
    "8x5 by the stdlib nearest-neighbor resizer (resize_bmp — sampling in "
    "IMAGE space, so the bottom-up row order of both source and target is "
    "handled), re-encoded as a complete BMP, and re-decoded by the real "
    "parser. The oracle recomputes the output size from the BMP layout "
    "formula and the first feature byte by replaying the full image-space "
    "row mapping through BOTH bottom-up storages — exactly the check a "
    "flipped-row resize bug fails.",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.multimodal.binary import (
        extract_features,
        real_media_from_documents,
        resize_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = real_media_from_documents(docs).filter(
        F.col("modality") == "image"
    )
    feats = extract_features(resize_media(media, 8, 5), real_decode=True)
    return feats.select(
        "item_id",
        "n_bytes",
        "width",
        "height",
        F.round(F.element_at("feat", 1) * 255).cast("long").alias("feat_byte0"),
    )


@register(
    "multimodal_wav_resample",
    """
WITH g AS (
  SELECT doc_id,
         8000 + (doc_id % 8) * 1000 AS r0,
         16 + doc_id % 50 AS n
  FROM documents WHERE doc_id % 2 = 1
),
r AS (
  SELECT doc_id, r0, n, GREATEST(1, (n * 4000) // r0) AS m FROM g
)
SELECT doc_id AS item_id,
       CAST(44 + m AS BIGINT) AS n_bytes,
       CAST(4000 AS INT) AS width,
       CAST(1 AS INT) AS height,
       CAST(m AS INT) AS n_frames,
       CAST((doc_id * 3 + ((LEAST(m, 8) - 1) * r0) // 4000) % 256 AS BIGINT)
         AS feat_last
FROM r
""",
    "REAL audio resample, roundtripped (the audio twin of "
    "multimodal_resize): every generated 8-bit mono PCM WAV is "
    "resampled to 4 kHz by the stdlib nearest-neighbor resampler "
    "(resample_wav — floor sample mapping in time), re-encoded as a "
    "complete WAV, and re-decoded by the real `wave` parser. The oracle "
    "recomputes the output length m = max(1, n*4000 // rate) and the "
    "LAST probed PCM byte by replaying the sample mapping (position "
    "least(m, 8) probes a non-trivial source index), so an off-by-one "
    "in the rate ratio or a header/length bug hash-mismatches. "
    "Registered after the round-4 50-slot driver prefix: locally "
    "verified at sf0.01+sf0.1, queued for the round-5 driver front.",
)
def q_multimodal_wav_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.multimodal.binary import (
        extract_features,
        real_media_from_documents,
        resample_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = real_media_from_documents(docs).filter(
        F.col("modality") == "audio"
    )
    feats = extract_features(resample_media(media, 4000), real_decode=True)
    return feats.select(
        "item_id",
        "n_bytes",
        "width",
        "height",
        "n_frames",
        F.round(
            F.element_at("feat", F.least(F.col("n_frames"), F.lit(8)))
            * 255
        )
        .cast("long")
        .alias("feat_last"),
    )


@register(
    "multimodal_decode_check",
    f"""
{_DK_MEDIA_DECODED}
SELECT modality,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(sum(width) AS BIGINT) AS sum_width,
       CAST(sum(height) AS BIGINT) AS sum_height,
       CAST(sum(n_frames) AS BIGINT) AS sum_frames,
       CAST(count(DISTINCT h) AS BIGINT) AS n_unique_payloads
FROM f GROUP BY modality
""",
    "ORACLE-CHECKED multimodal decode: binary payloads built from doc_id "
    "(ASCII bytes so DuckDB's VARCHAR-only sha256 can recompute the digest) "
    "run through the real Arrow mapInPandas decode UDF; every derived "
    "dimension (bytes, width, height, frame count, payload digest) is "
    "re-derived independently by the oracle. Upgrades multimodal from "
    "rows-only to hash-matched.",
)
def q_multimodal_decode_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.multimodal.binary import (
        extract_features,
        media_from_documents,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    feats = extract_features(media_from_documents(docs))
    return feats.groupBy("modality").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.sum("width").cast("long").alias("sum_width"),
        F.sum("height").cast("long").alias("sum_height"),
        F.sum("n_frames").cast("long").alias("sum_frames"),
        F.countDistinct("payload_sha").cast("long").alias("n_unique_payloads"),
    )


@register(
    "multimodal_frame_sample",
    f"""
{_DK_MEDIA_DECODED}
SELECT doc_id AS item_id,
       CAST(unnest(range(0, n_frames, 10)) AS BIGINT) AS frame_idx,
       CAST(n_frames AS INT) AS n_frames
FROM f WHERE modality = 'video'
""",
    "Video frame sampling (every 10th frame) as an exploded index stream — "
    "the shape a real frame extractor feeds; frame counts come through the "
    "binary decode UDF and the oracle re-derives them from the digest. "
    "Explode is a Generate inside codegen, no Python past the decode.",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.multimodal.binary import (
        extract_features,
        media_from_documents,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    feats = extract_features(media_from_documents(docs))
    frames = sample_frames(feats, every_n=10)
    return frames.select(
        F.col("item_id").cast("long").alias("item_id"),
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("n_frames").cast("int").alias("n_frames"),
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
    "text_entropy",
    """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
tf AS (
  SELECT doc_id, w, count(*) AS c FROM words WHERE w <> '' GROUP BY 1, 2
),
tot AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS vocab
  FROM tf GROUP BY 1
)
SELECT tf.doc_id, n_tokens, vocab,
       round(-sum((c * 1.0 / n_tokens) * ln(c * 1.0 / n_tokens)), 4)
         AS entropy
FROM tf JOIN tot USING (doc_id)
GROUP BY tf.doc_id, n_tokens, vocab
""",
    "Unigram Shannon entropy per document — the information-density "
    "quality signal missing from text_quality's ratio features; explode + "
    "tf agg + window totals, all one doc_id shuffle lineage",
)
def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    tf = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    w = W.partitionBy("doc_id")
    # totals via window over the tf rows: stays in the doc_id shuffle
    # lineage instead of a second shuffle + self-join
    tot = tf.select(
        "doc_id",
        "c",
        F.sum("c").over(w).cast("long").alias("n_tokens"),
        F.count("*").over(w).cast("long").alias("vocab"),
    )
    p = F.col("c") / F.col("n_tokens")
    return tot.groupBy("doc_id", "n_tokens", "vocab").agg(
        F.round(-F.sum(p * F.log(p)), 4).alias("entropy")
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
    "emb_dim_stats",
    """
WITH dims AS (
  SELECT unnest(generate_series(1, len(embedding))) AS dim,
         unnest(embedding) AS v
  FROM embeddings
)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(v), 4) + 0.0 AS mean_v,
       round(stddev_samp(v), 4) AS std_v,
       round(min(v), 4) + 0.0 AS min_v,
       round(max(v), 4) + 0.0 AS max_v
FROM dims GROUP BY dim
""",
    "Per-dimension corpus statistics over the embedding column (the "
    "normalize/whiten precursor for IVF centroid training): posexplode -> "
    "64-key agg; partial aggregation compresses the x64 row blowup back to "
    "|dims| x |partitions| before the single shuffle. A near-zero mean "
    "rounds to -0.0 in one engine and 0.0 in the other (caught by the "
    "sf0.1 sweep after round 3's emb_covariance lesson) — the +0.0 on "
    "every signed rounded column normalizes IEEE negative zero in both "
    "engines.",
)
def q_emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    dims = emb.select(
        F.posexplode("embedding").alias("pos", "v")
    ).select((F.col("pos") + 1).cast("long").alias("dim"), "v")
    return dims.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        (F.round(F.avg("v"), 4) + F.lit(0.0)).alias("mean_v"),
        F.round(F.stddev_samp("v"), 4).alias("std_v"),
        (F.round(F.min("v"), 4) + F.lit(0.0)).alias("min_v"),
        (F.round(F.max("v"), 4) + F.lit(0.0)).alias("max_v"),
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
    "stream_static_enrich",
    """
WITH profile AS (
  SELECT user_id, count(*) AS user_events FROM events GROUP BY 1
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value,
       CAST(sum(user_events) AS BIGINT) AS activity_weight
FROM events JOIN profile USING (user_id)
GROUP BY event_type
""",
    "Stream-static enrichment join: the event stream joined per-microbatch "
    "against a batch-computed user profile dim (stateless join — no "
    "watermark state), then a complete-mode agg whose drain equals the "
    "batch result. The missing join mode from the stream suite: stream "
    "side unbounded, static side a recomputed-per-batch DataFrame",
)
def q_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.streaming.stream import stream_events

    batch_ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    profile = batch_ev.groupBy("user_id").agg(
        F.count("*").alias("user_events")
    )
    stream = stream_events(spark, sf_dir).select(
        "user_id", "event_type", "value"
    )
    enriched = stream.join(F.broadcast(profile), "user_id")
    agg = enriched.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.sum("user_events").cast("long").alias("activity_weight"),
    )
    _STREAM_COUNTER[0] += 1
    name = f"stream_static_enrich_q{_STREAM_COUNTER[0]}"
    _drain_to_memory(agg, "complete", name)
    return spark.sql(f"SELECT * FROM {name}")


# ---------------------------------------------------------------------------
# Training-corpus curation extensions: within-document repetition stats
# (the Gopher/C4 repetition filters), train/test n-gram decontamination,
# and domain mixing weights. These extend the text_* quality family the
# same way dedup_* extends T2: filters a 100 TB pretraining pipeline runs
# between ingestion and sharding.
# ---------------------------------------------------------------------------


@register(
    "text_repetition",
    """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
  FROM documents
),
grams AS (
  SELECT doc_id, w,
         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
         lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
  FROM toks
),
g AS (
  SELECT doc_id, count(*) AS n_tokens,
         count(w2) AS n2,
         count(DISTINCT CASE WHEN w2 IS NOT NULL
                             THEN w || ' ' || w2 END) AS d2,
         count(w3) AS n3,
         count(DISTINCT CASE WHEN w3 IS NOT NULL
                             THEN w || ' ' || w2 || ' ' || w3 END) AS d3
  FROM grams GROUP BY 1
),
tf AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY 1, 2),
top AS (SELECT doc_id, max(c) AS mx FROM tf GROUP BY 1)
SELECT g.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(1 - d2 * 1.0 / nullif(n2, 0), 4) AS dup_bigram_frac,
       round(1 - d3 * 1.0 / nullif(n3, 0), 4) AS dup_trigram_frac,
       round(mx * 1.0 / n_tokens, 4) AS top_word_frac
FROM g JOIN top USING (doc_id)
""",
    "Gopher-style within-document repetition filter: duplicate bigram/"
    "trigram fractions (via lead() windows — no gram materialization "
    "blowup) + most-frequent-word share; everything in one doc_id shuffle "
    "lineage",
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    grams = toks.select(
        "doc_id",
        "w",
        F.lead("w").over(w).alias("w2"),
        F.lead("w", 2).over(w).alias("w3"),
    )
    bigram = F.when(
        F.col("w2").isNotNull(), F.concat_ws(" ", "w", "w2")
    )
    trigram = F.when(
        F.col("w3").isNotNull(), F.concat_ws(" ", "w", "w2", "w3")
    )
    g = grams.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.count("w2").alias("n2"),
        F.countDistinct(bigram).alias("d2"),
        F.count("w3").alias("n3"),
        F.countDistinct(trigram).alias("d3"),
    )
    tf = toks.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    top = tf.groupBy("doc_id").agg(F.max("c").alias("mx"))
    return g.join(top, "doc_id").select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(
            1 - F.col("d2") / F.nullif(F.col("n2"), F.lit(0)), 4
        ).alias("dup_bigram_frac"),
        F.round(
            1 - F.col("d3") / F.nullif(F.col("n3"), F.lit(0)), 4
        ).alias("dup_trigram_frac"),
        F.round(F.col("mx") / F.col("n_tokens"), 4).alias("top_word_frac"),
    )


@register(
    "text_decontaminate",
    """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
  FROM documents
),
grams AS (
  SELECT doc_id,
         w || ' ' || lead(w)    OVER (PARTITION BY doc_id ORDER BY pos)
           || ' ' || lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos)
           || ' ' || lead(w, 3) OVER (PARTITION BY doc_id ORDER BY pos)
           || ' ' || lead(w, 4) OVER (PARTITION BY doc_id ORDER BY pos)
           AS gram
  FROM toks
),
train_grams AS (
  SELECT DISTINCT gram FROM grams
  WHERE doc_id % 10 < 8 AND gram IS NOT NULL
),
test AS (
  SELECT doc_id, gram FROM grams
  WHERE doc_id % 10 >= 8 AND gram IS NOT NULL
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(tr.gram) AS BIGINT) AS n_contaminated,
       -- ratio of integers, floor-quantized (round-10 hazard sweep): a 4dp
       -- round tie is reachable; floor of the identical double has none
       floor(CAST(count(tr.gram) AS DOUBLE) * 10000 / count(*)) / 10000
         AS contamination_frac
FROM test t LEFT JOIN train_grams tr USING (gram)
GROUP BY t.doc_id
""",
    "Train/test decontamination: 5-gram overlap of held-out docs "
    "(doc_id%10>=8) against the train split — sliding grams via lead() "
    "windows, train side deduplicated BEFORE the equi-join so the probe "
    "is |distinct grams|, the standard benchmark-leakage check",
)
def q_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", i).over(w) for i in range(1, 5)]
    gram = F.concat_ws(" ", *parts)
    # concat_ws skips nulls, so guard: a full 5-gram needs lead(w,4) set
    grams = toks.select(
        "doc_id",
        F.when(F.lead("w", 4).over(w).isNotNull(), gram).alias("gram"),
    ).filter(F.col("gram").isNotNull())
    train = (
        grams.filter(F.col("doc_id") % 10 < 8).select("gram").distinct()
    )
    test = grams.filter(F.col("doc_id") % 10 >= 8)
    joined = test.join(
        train.withColumnRenamed("gram", "tr_gram"),
        test.gram == F.col("tr_gram"),
        "left",
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_grams"),
        F.count("tr_gram").cast("long").alias("n_contaminated"),
        # integer-ratio floor-quantize (round-10 hazard sweep)
        (
            F.floor(F.count("tr_gram").cast("double") * 1e4 / F.count("*"))
            / 1e4
        ).alias("contamination_frac"),
    )


@register(
    "corpus_mix_weights",
    """
WITH per AS (
  SELECT source, count(*) AS n_docs,
         sum(len(string_split(text, ' '))) AS n_tokens
  FROM documents GROUP BY 1
),
tot AS (SELECT sum(n_tokens) AS t, count(*) AS k FROM per)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round(n_tokens * 1.0 / t, 6) AS token_share,
       round((1.0 / k) / (n_tokens * 1.0 / t), 4) AS uniform_mix_weight
FROM per, tot
""",
    "Domain mixing weights: per-source token share and the up/down-"
    "sampling weight that flattens the mix to uniform — the sampling-"
    "ratio input for corpus assembly (pairs with sample_stratified / "
    "shard_token_budget); token counting is a narrow map, one tiny agg",
)
def q_corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").alias("t"), F.count("*").alias("k")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("n_tokens") / F.col("t"), 6).alias("token_share"),
        F.round(
            (1.0 / F.col("k")) / (F.col("n_tokens") / F.col("t")), 4
        ).alias("uniform_mix_weight"),
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


@register(
    "sample_weighted",
    """
WITH w AS (
  SELECT doc_id, source, n_chars,
         (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|ws'), 1, 8))
               AS BIGINT) % 1000000) / 1000000.0 AS u
  FROM documents
),
tot AS (SELECT sum(n_chars) AS sum_w, count(*) AS n FROM w)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
       round(least(0.3 * n_chars * n / sum_w, 1.0), 6) AS p_include
FROM w, tot
WHERE u < least(0.3 * n_chars * n / sum_w, 1.0)
""",
    "Deterministic size-weighted Bernoulli sample (~30% expected, "
    "probability proportional to n_chars): the importance-downsampling "
    "primitive for corpus assembly. The coin is a hash-derived uniform "
    "(md5 -> integer -> [0,1)) and the threshold pure field arithmetic, "
    "so selection is reproducible across engines AND across runs — a "
    "pure filter + one broadcast scalar, no shuffle of the corpus",
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|ws"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1000000
    ) / 1000000.0
    tot = docs.agg(
        F.sum("n_chars").alias("sum_w"), F.count("*").alias("n")
    )
    p = F.least(
        0.3 * F.col("n_chars") * F.col("n") / F.col("sum_w"), F.lit(1.0)
    )
    return (
        docs.withColumn("u", u)
        .crossJoin(F.broadcast(tot))
        .filter(F.col("u") < p)
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.round(p, 6).alias("p_include"),
        )
    )


# ---------------------------------------------------------------------------
# Public contract used by __spark_entry__.py
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001 (driver smoke check: rows > 0, stable schema)."""
    return q_flagship(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Corpus curation beyond per-doc stats (operators/curation.py): C4-style
# blocklist filters, cross-document shared-span measurement, PII redaction
# ---------------------------------------------------------------------------


@register(
    "text_blocklist_filter",
    """
WITH f AS (
  SELECT lang,
         list_has_any(string_split(text, ' '), ['slow', 'legacy'])
           AS has_blocked,
         len(string_split(text, ' ')) < 12 AS too_short,
         list_max(list_transform(string_split(text, ' '),
                                 x -> length(x))) > 15 AS has_long_word
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(CASE WHEN has_blocked THEN 1 END) AS BIGINT) AS n_blocked,
       CAST(count(CASE WHEN too_short THEN 1 END) AS BIGINT) AS n_short,
       CAST(count(CASE WHEN has_long_word THEN 1 END) AS BIGINT) AS n_long,
       CAST(count(CASE WHEN NOT (has_blocked OR too_short OR has_long_word)
                       THEN 1 END) AS BIGINT) AS n_kept
FROM f GROUP BY lang
""",
    "C4-style document filters: vocabulary blocklist + min-words + "
    "max-word-length, independent flags, narrow map + one tiny agg",
)
def q_text_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.curation import blocklist_flags

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    f = blocklist_flags(
        docs, "text", blocklist=("slow", "legacy"), min_words=12, max_word_len=15
    )
    cnt = lambda c: F.count(F.when(F.col(c), 1)).cast("long")  # noqa: E731
    return f.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        cnt("has_blocked").alias("n_blocked"),
        cnt("too_short").alias("n_short"),
        cnt("has_long_word").alias("n_long"),
        cnt("keep").alias("n_kept"),
    )


@register(
    "text_shared_ngrams",
    """
WITH toks AS (
  SELECT lang, doc_id, unnest(string_split(text, ' ')) AS w,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
  FROM documents
),
g AS (
  SELECT lang, doc_id, w,
         lead(w, 1) OVER win AS w1, lead(w, 2) OVER win AS w2,
         lead(w, 3) OVER win AS w3, lead(w, 4) OVER win AS w4
  FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
),
grams AS (
  SELECT lang, doc_id,
         md5(w || ' ' || w1 || ' ' || w2 || ' ' || w3 || ' ' || w4) AS gram
  FROM g WHERE w4 IS NOT NULL
),
per AS (
  SELECT lang, gram, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
  FROM grams GROUP BY 1, 2
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(CASE WHEN n_docs >= 2 THEN 1 END) AS BIGINT) AS n_shared,
       -- ratio of integers, floor-quantized (round-10 hazard sweep)
       floor(CAST(count(CASE WHEN n_docs >= 2 THEN 1 END) AS DOUBLE)
             * 1000000 / count(*)) / 1000000 AS shared_ratio,
       CAST(COALESCE(sum(CASE WHEN n_docs >= 2 THEN n_occ END), 0) AS BIGINT)
         AS cross_doc_occ
FROM per GROUP BY lang
""",
    "Cross-document shared 5-gram spans (RefinedWeb-style boilerplate "
    "measure): lead()-window grams, per-gram document frequency, per-lang "
    "share — one window pass + one gram shuffle",
)
def q_text_shared_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.curation import shared_ngrams

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "text"
    )
    per = shared_ngrams(docs, "text", "doc_id", "lang", k=5)
    shared = F.col("n_docs") >= 2
    return per.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_grams"),
        F.count(F.when(shared, 1)).cast("long").alias("n_shared"),
        # integer-ratio floor-quantize (round-10 hazard sweep)
        (
            F.floor(
                F.count(F.when(shared, 1)).cast("double")
                * 1000000
                / F.count("*")
            )
            / 1000000
        ).alias("shared_ratio"),
        F.coalesce(F.sum(F.when(shared, F.col("n_occ"))), F.lit(0))
        .cast("long")
        .alias("cross_doc_occ"),
    )


@register(
    "text_pii_redact",
    """
WITH injected AS (
  -- deterministic PII harness: the synthetic corpus contains no emails/IPs,
  -- so a subset gets them appended (same expression both engines) to
  -- exercise detect+redact with real hits
  SELECT lang, doc_id,
         text
         || (CASE WHEN doc_id % 5 = 0
                  THEN ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com now' ELSE '' END)
         || (CASE WHEN doc_id % 7 = 0
                  THEN ' host 10.0.' || CAST(doc_id % 250 AS VARCHAR)
                       || '.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END)
           AS t
  FROM documents
),
r AS (
  SELECT lang,
         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+'))
           AS n_emails,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+',
                        '<EMAIL>', 'g') AS t1
  FROM injected
),
r2 AS (
  SELECT lang, n_emails,
         len(regexp_extract_all(t1,
             '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS n_ips,
         regexp_replace(t1,
             '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}',
             '<IP>', 'g') AS redacted
  FROM r
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_emails) AS BIGINT) AS n_emails,
       CAST(sum(n_ips) AS BIGINT) AS n_ips,
       CAST(count(CASE WHEN n_emails = 0 AND n_ips = 0 THEN 1 END) AS BIGINT)
         AS n_clean,
       CAST(count(DISTINCT md5(redacted)) AS BIGINT) AS n_uniq_redacted
FROM r2 GROUP BY lang
""",
    "PII detect + redact (emails, IPv4) over a deterministic injection "
    "harness; regex subset chosen for Java/RE2 parity; zero shuffle "
    "before the final agg",
)
def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.curation import pii_redact

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "text"
    )
    injected = docs.withColumn(
        "t",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" host 10.0."),
                    (F.col("doc_id") % 250).cast("string"),
                    F.lit("."),
                    (F.col("doc_id") % 100).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ),
    )
    r = pii_redact(injected, "t")
    return r.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_emails").cast("long").alias("n_emails"),
        F.sum("n_ips").cast("long").alias("n_ips"),
        F.count(
            F.when((F.col("n_emails") == 0) & (F.col("n_ips") == 0), 1)
        )
        .cast("long")
        .alias("n_clean"),
        F.countDistinct(F.md5("redacted")).cast("long").alias("n_uniq_redacted"),
    )


@register(
    "stream_hopping_agg",
    """
WITH x AS (
  SELECT event_type, value,
         UNNEST([time_bucket(INTERVAL '30 minutes', ts),
                 time_bucket(INTERVAL '30 minutes', ts)
                   - INTERVAL '30 minutes']) AS window_start
  FROM events
)
SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value
FROM x GROUP BY 1, 2
""",
    "Structured Streaming hopping 1h/30min window (complete-mode availableNow "
    "drain, which keeps all window state so the oracle sees every window; "
    "append/update mode is where the watermark bounds state) — same oracle "
    "as the batch twin events_hopping_agg",
)
def q_stream_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.streaming.stream import (
        stream_events,
        streaming_hopping_agg,
    )

    _STREAM_COUNTER[0] += 1
    name = f"stream_hopping_agg_q{_STREAM_COUNTER[0]}"
    agg = streaming_hopping_agg(stream_events(spark, sf_dir))
    _drain_to_memory(agg, "complete", name)
    return spark.sql(
        f"SELECT window_start, event_type, CAST(n_events AS BIGINT) AS n_events, "
        f"sum_value FROM {name}"
    )


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


def _bpe_merges_values() -> str:
    from yaml_pipe_spark.operators.text_stats import BPE_MERGES

    return ", ".join(
        f"({i + 1},'{l}','{r}')" for i, (l, r) in enumerate(BPE_MERGES)
    )


BPE_ENCODE_ORACLE = f"""
WITH RECURSIVE
merges(rank, l, r) AS (VALUES {_bpe_merges_values()}),
occ AS (
  SELECT coalesce(lang, 'und') AS lang,
         UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents
),
counts AS (SELECT lang, word, count(*) AS occ FROM occ GROUP BY 1, 2),
init AS (
  SELECT word,
         list_transform(generate_series(1, len(word)), i -> word[i]) AS syms,
         0 AS step
  FROM (SELECT DISTINCT word FROM counts)
),
enc AS (
  SELECT word, syms, step FROM init
  UNION ALL
  SELECT b.word,
         str_split(
           list_reduce(b.syms, (acc, x) ->
             CASE WHEN (acc = mm.l OR ends_with(acc, chr(9) || mm.l))
                       AND x = mm.r
                  THEN acc || mm.r
                  ELSE acc || chr(9) || x END),
           chr(9)) AS syms,
         b.step + 1
  FROM (
    SELECT e.word, e.syms, e.step,
           (SELECT min(m.rank) FROM merges m
            WHERE list_contains(
              list_transform(generate_series(1, len(e.syms) - 1),
                             i -> e.syms[i] || chr(9) || e.syms[i+1]),
              m.l || chr(9) || m.r)) AS best
    FROM enc e
  ) b JOIN merges mm ON mm.rank = b.best
),
final AS (
  SELECT word, syms, len(syms) AS n_bpe FROM (
    SELECT word, syms, row_number() OVER (PARTITION BY word ORDER BY step DESC) AS rn
    FROM enc
  ) WHERE rn = 1
),
joined AS (SELECT c.lang, c.word, c.occ, f.n_bpe, f.syms
           FROM counts c JOIN final f USING (word)),
stats AS (
  SELECT lang,
         CAST(sum(occ) AS BIGINT) AS n_word_occurrences,
         CAST(sum(occ * n_bpe) AS BIGINT) AS total_bpe_tokens
  FROM joined GROUP BY lang
),
types AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_token_types FROM (
    SELECT DISTINCT lang, UNNEST(syms) AS tok FROM joined
  ) GROUP BY lang
)
SELECT s.lang, s.n_word_occurrences, s.total_bpe_tokens,
       round(s.total_bpe_tokens * 1.0 / s.n_word_occurrences, 4)
         AS avg_bpe_per_word,
       t.n_token_types
FROM stats s JOIN types t USING (lang)
"""


@register(
    "text_bpe_encode",
    BPE_ENCODE_ORACLE,
    "The REAL BPE merge loop (text_stats.bpe_encode): iterative lowest-rank "
    "adjacent-pair merging against the pinned training-ordered BPE_MERGES "
    "table, left-to-right non-overlapping per pass — the GPT-2/HF encode "
    "algorithm, not just pre-tokenizer accounting (closes VERDICT r4 ask "
    "#5; complements text_token_bpe). Scale shape: the iteration runs once "
    "per DISTINCT word in one Arrow batch pass (Heaps'-law vocabulary "
    "work), corpus-scale ops stay Catalyst. The oracle re-runs the merge "
    "loop independently as a recursive CTE whose list_reduce fold mirrors "
    "the engine's merge-occurrences semantics exactly, so token counts "
    "AND the distinct token inventory are recomputed from scratch.",
)
def q_text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.text_stats import bpe_token_stats

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    return bpe_token_stats(docs)


# GPT-2-style pre-tokenizer (lookahead-free subset: RE2 has no lookahead, so
# the `\s+(?!\S)` branch is dropped — trailing-space merging differs from
# upstream GPT-2, deterministically in both engines). Leftmost-first
# alternation semantics match between Java regex and RE2's perl mode.
# Whitespace is an EXPLICIT class, not \s: Java's \s includes vertical tab
# (\x0B) while RE2's does not, so a document containing VT would tokenize
# differently per engine. The explicit class (incl. \x0B) is identical in
# both.
_BPE_WS = " \\t\\n\\x0B\\f\\r"
_BPE_PAT = (
    "'(?:s|t|re|ve|m|ll|d)"
    f"| ?\\p{{L}}+| ?\\p{{N}}+| ?[^{_BPE_WS}\\p{{L}}\\p{{N}}]+|[{_BPE_WS}]+"
)


@register(
    "text_token_bpe",
    f"""
WITH t AS (
  SELECT lang,
         len(regexp_extract_all(text,
             '{_BPE_PAT.replace("'", "''")}')) AS n_tokens,
         n_chars
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       -- integer ratios, floor-quantized (round-10 hazard sweep): both the
       -- mean and chars-per-token can sit exactly on a 4dp round tie
       floor(CAST(sum(n_tokens) AS DOUBLE) * 10000 / count(*)) / 10000
         AS avg_tokens,
       floor(CAST(sum(n_chars) AS DOUBLE) * 10000 / sum(n_tokens)) / 10000
         AS chars_per_token
FROM t GROUP BY lang
""",
    "Token accounting with a GPT-2-style pre-tokenizer regex (contractions, "
    "letter runs, digit runs, punctuation runs, whitespace) — pure Catalyst "
    "regexp_extract_all, no UDF; chars-per-token is the budget planners' "
    "compression ratio",
)
def q_text_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        "n_chars",
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT), F.lit(0))).alias(
            "n_tokens"
        ),
    )
    return t.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        # integer-ratio floor-quantize (round-10 hazard sweep)
        (
            F.floor(F.sum("n_tokens").cast("double") * 1e4 / F.count("*"))
            / 1e4
        ).alias("avg_tokens"),
        (
            F.floor(
                F.sum("n_chars").cast("double") * 1e4 / F.sum("n_tokens")
            )
            / 1e4
        ).alias("chars_per_token"),
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


@register(
    "corpus_curation_funnel",
    f"""
WITH base AS (SELECT lang, doc_id, text FROM documents),
rep AS (
  SELECT doc_id, max(c) AS max_tok, sum(c) AS n_tok FROM (
    SELECT doc_id, tok, count(*) AS c FROM (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\p{{L}}+'))
               AS tok
      FROM base) GROUP BY doc_id, tok) GROUP BY doc_id
),
sig AS (
  SELECT b.lang, b.doc_id, b.text,
         length(b.text) AS n_chars,
         len(regexp_extract_all(b.text, '\\p{{L}}')) AS n_letters,
         ({_dk_stop_hits()}) AS stop_hits,
         r.max_tok, r.n_tok
  FROM base b LEFT JOIN rep r USING (doc_id)
),
flags AS (
  SELECT lang, doc_id, text,
         (n_chars BETWEEN 100 AND 20000) AS c_len,
         ((n_chars BETWEEN 100 AND 20000)
          AND n_letters * 100 >= 70 * n_chars) AS c_alpha,
         ((n_chars BETWEEN 100 AND 20000)
          AND n_letters * 100 >= 70 * n_chars
          AND stop_hits >= 1) AS c_stop,
         ((n_chars BETWEEN 100 AND 20000)
          AND n_letters * 100 >= 70 * n_chars
          AND stop_hits >= 1
          AND n_tok IS NOT NULL AND 8 * max_tok <= n_tok) AS c_rep
  FROM sig
),
final AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_final FROM (
    SELECT lang, doc_id,
           row_number() OVER (PARTITION BY sha256(text)
                              ORDER BY doc_id) AS rn
    FROM flags WHERE c_rep) WHERE rn = 1 GROUP BY lang
),
stages AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_total,
         CAST(count(CASE WHEN c_len THEN 1 END) AS BIGINT) AS n_len,
         CAST(count(CASE WHEN c_alpha THEN 1 END) AS BIGINT) AS n_alpha,
         CAST(count(CASE WHEN c_stop THEN 1 END) AS BIGINT) AS n_stop,
         CAST(count(CASE WHEN c_rep THEN 1 END) AS BIGINT) AS n_rep
  FROM flags GROUP BY lang
)
SELECT s.lang AS lang, n_total, n_len, n_alpha, n_stop, n_rep,
       CAST(COALESCE(f.n_final, 0) AS BIGINT) AS n_final
FROM stages s LEFT JOIN final f ON s.lang = f.lang
""",
    "End-to-end curation decision layer: cumulative per-lang attrition "
    "through length band -> alpha ratio -> stopword evidence -> top-unigram "
    "repetition -> exact dedup; integer-arithmetic thresholds so engines "
    "agree exactly. The review table a corpus team reads before a train run.",
)
def q_corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.curation import curation_funnel

    return curation_funnel(load_table(spark, sf_dir, "documents"))


@register(
    "ann_recall_measured",
    f"""
WITH e AS (
  SELECT vec_id, embedding,
         CAST((CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
            + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
            + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
            + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS BIGINT)
           AS code
  FROM embeddings
),
q AS (
  SELECT vec_id AS qid, embedding AS qv, code AS qcode
  FROM e WHERE vec_id < 40
),
scores AS (
  SELECT q.qid, e.vec_id, e.code, q.qcode,
         round({_dk_cos('e.embedding', 'q.qv')}, 6) AS score
  FROM e, q WHERE e.vec_id <> q.qid
),
exact AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, vec_id) AS rn
    FROM scores) WHERE rn <= 5
),
approx AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, vec_id) AS rn
    FROM scores WHERE code = qcode) WHERE rn <= 5
),
j AS (
  SELECT ex.qid, CASE WHEN a.vec_id IS NULL THEN 0 ELSE 1 END AS hit
  FROM exact ex LEFT JOIN approx a
    ON ex.qid = a.qid AND ex.vec_id = a.vec_id
)
SELECT round(avg(hit), 4) AS recall,
       CAST(count(DISTINCT qid) AS BIGINT) AS n_queries,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(hit) AS BIGINT) AS n_hit
FROM j
""",
    "Recall@5 of single-probe sign-LSH (4 axis-aligned planes) against the "
    "exact top-k, measured over 40 query vectors — and the ORACLE "
    "independently recomputes the same recall, so the measurement machinery "
    "itself is hash-checked, not just asserted in tests. The ANN operators' "
    "production planes are random Gaussians (lsh_planes); axis planes are "
    "used here so the oracle SQL stays closed-form.",
)
def q_ann_recall_measured(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.similarity import (
        knn_join_arrow,
        recall_at_k,
        signlsh_knn_join,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    dim = emb.select(F.size("embedding").alias("d")).first().d
    planes = [
        [1.0 if i == j else 0.0 for i in range(dim)] for j in range(4)
    ]
    queries = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    # exact side = brute force over the full corpus: the Arrow scorer is the
    # fast path (corpus vectors cross Arrow once, scored in numpy); the
    # approx side stays the bucketed LSH equi-join it is measuring
    exact = knn_join_arrow(queries, emb, k=5)
    approx = signlsh_knn_join(queries, emb, planes, k=5, multiprobe=False)
    return recall_at_k(approx, exact)


@register(
    "ann_ivf_nprobe_curve",
    f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
axis AS (
  SELECT e.vec_id, t.i,
         round(CAST(e.embedding[t.i] AS DOUBLE)
               / sqrt({_dk_dot('e.embedding', 'e.embedding')} * 1.0), 6)
           AS sc
  FROM e, (SELECT UNNEST(generate_series(1, 8)) AS i) t
),
assign AS (
  SELECT vec_id, CAST(i - 1 AS BIGINT) AS cid FROM (
    SELECT vec_id, i,
           row_number() OVER (PARTITION BY vec_id ORDER BY sc DESC, i) AS rn
    FROM axis) WHERE rn = 1
),
q AS (SELECT vec_id AS qid, embedding AS qv FROM e WHERE vec_id < 20),
np(np) AS (VALUES (1), (2), (4)),
probes AS (
  SELECT qid, np, CAST(i - 1 AS BIGINT) AS cid FROM (
    SELECT q.qid, np.np, a.i,
           row_number() OVER (PARTITION BY q.qid, np.np
                              ORDER BY a.sc DESC, a.i) AS rn
    FROM q JOIN axis a ON a.vec_id = q.qid CROSS JOIN np
  ) WHERE rn <= np
),
scores AS (
  SELECT q.qid, e.vec_id, round({_dk_cos('e.embedding', 'q.qv')}, 6) AS score
  FROM e, q WHERE e.vec_id <> q.qid
),
exact AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, vec_id) AS rn
    FROM scores) WHERE rn <= 5
),
approx AS (
  SELECT np, qid, vec_id FROM (
    SELECT p.np, sc.qid, sc.vec_id,
           row_number() OVER (PARTITION BY p.np, sc.qid
                              ORDER BY sc.score DESC, sc.vec_id) AS rn
    FROM scores sc
    JOIN assign a ON a.vec_id = sc.vec_id
    JOIN probes p ON p.qid = sc.qid AND p.cid = a.cid
  ) WHERE rn <= 5
),
j AS (
  SELECT np.np, ex.qid,
         CASE WHEN a.vec_id IS NULL THEN 0 ELSE 1 END AS hit
  FROM exact ex CROSS JOIN np
  LEFT JOIN approx a
    ON a.np = np.np AND a.qid = ex.qid AND a.vec_id = ex.vec_id
)
SELECT CAST(np AS BIGINT) AS nprobe,
       round(avg(hit), 4) AS recall,
       CAST(count(DISTINCT qid) AS BIGINT) AS n_queries,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(hit) AS BIGINT) AS n_hit
FROM j GROUP BY np
""",
    "IVF recall-vs-nprobe tuning curve: recall@5 of the real ivf_knn_join "
    "at nprobe 1/2/4 against the exact Arrow top-k, one row per setting — "
    "the measurement that picks the probe budget before anyone trusts an "
    "IVF index. Centroids are pinned to the first 8 axis unit vectors so "
    "the oracle recomputes assignment (argmax rounded axis cosine, ties "
    "to lowest cell) and probe order in closed form; production kmeans "
    "centroids plug into the same operator (ann_ivf_topk).",
)
def q_ann_ivf_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from pyspark.sql import Window as W

    from yaml_pipe_spark.operators.similarity import (
        ivf_assign,
        ivf_scored_candidates,
        knn_join_arrow,
        recall_at_k,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    dim = emb.select(F.size("embedding").alias("d")).first().d
    cdf = spark.createDataFrame(
        [(i, [1.0 if j == i else 0.0 for j in range(dim)]) for i in range(8)],
        "cid long, cv array<double>",
    )
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    # everything shared across the three curve points is materialized ONCE:
    # the exact side (100 rows), the corpus-scale centroid assignment, AND
    # — new in r6 — the candidate scores themselves: probe sets nest, so
    # one scoring pass at nprobe=4 with the probe rank attached replaces
    # three score joins; each curve point is then a filter + top-5 window
    # over the shared frame (identical values by construction)
    exact = knn_join_arrow(queries, emb, k=5).localCheckpoint()
    assigned = ivf_assign(emb, cdf).localCheckpoint()
    scored = ivf_scored_candidates(
        queries, cdf, assigned, nprobe=4
    ).localCheckpoint()
    w = W.partitionBy("qid").orderBy(F.col("score").desc(), "vec_id")
    curves = [
        recall_at_k(
            scored.filter(F.col("probe_rank") <= np)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5),
            exact,
        ).select(F.lit(np).cast("long").alias("nprobe"), "*")
        for np in (1, 2, 4)
    ]
    return reduce(lambda a, b: a.unionByName(b), curves)


@register(
    "text_unigram_logprob",
    r"""
WITH toks AS (
  SELECT lang, doc_id,
         unnest(regexp_extract_all(lower(text), '\p{L}+')) AS tok
  FROM documents
),
dt AS (
  SELECT lang, doc_id, tok, count(*) AS c_dt
  FROM toks GROUP BY lang, doc_id, tok
),
lm AS (SELECT lang, tok, sum(c_dt) AS c_t FROM dt GROUP BY lang, tok),
tot AS (SELECT lang, sum(c_t) AS n_l FROM lm GROUP BY lang),
doc AS (
  -- log10(c_t/n_l) = log10(c_t) - log10(n_l): score docs without n_l and
  -- shift by log10(n_l) at the per-lang rollup, so the corpus-total join
  -- happens on 3 rows instead of at the doc-token level
  SELECT dt.lang, dt.doc_id,
         sum(dt.c_dt * log10(CAST(lm.c_t AS DOUBLE))) / sum(dt.c_dt) AS lp0
  FROM dt
  JOIN lm ON dt.lang = lm.lang AND dt.tok = lm.tok
  GROUP BY dt.lang, dt.doc_id
),
agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         avg(lp0) AS avg0, min(lp0) AS min0
  FROM doc GROUP BY lang
)
SELECT agg.lang AS lang, n_docs,
       round(avg0 - log10(CAST(n_l AS DOUBLE)), 4) AS avg_logprob,
       round(min0 - log10(CAST(n_l AS DOUBLE)), 4) AS min_logprob
FROM agg JOIN tot ON agg.lang = tot.lang
""",
    "Unigram-LM quality proxy (CCNet-style): per-lang token LM trained on "
    "the corpus itself, per-doc mean log10 unigram probability, rolled up "
    "per lang. Plan: one (doc,token) count shuffle, LM derived from it by a "
    "second small agg, vocabulary join on (lang,token) — the frequent-token "
    "skew lives on the doc-aggregated side so no key explodes; per-doc "
    "scores never leave the (lang,doc) partitioning.",
)
def q_text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "text"
    )
    toks = docs.select(
        "lang",
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(r"\p{L}+"), F.lit(0))
        ).alias("tok"),
    )
    # explicit null-filter so every diamond branch shares a bit-identical
    # subtree: the lm join would add `isnotnull(tok)` to its own branches
    # only, which blocks exchange reuse for the corpus-total branch and
    # forces a second corpus scan
    toks = toks.filter(F.col("tok").isNotNull())
    dt = toks.groupBy("lang", "doc_id", "tok").agg(
        F.count("*").alias("c_dt")
    )
    lm = dt.groupBy("lang", "tok").agg(F.sum("c_dt").alias("c_t"))
    tot = lm.groupBy("lang").agg(F.sum("c_t").alias("n_l"))
    # log10(c_t/n_l) = log10(c_t) - log10(n_l): the corpus-total shift joins
    # at the 3-row lang rollup, keeping the doc-token stream a single
    # dt-exchange diamond (reused, one corpus scan)
    doc = (
        dt.join(lm, ["lang", "tok"])
        .groupBy("lang", "doc_id")
        .agg(
            (
                F.sum(F.col("c_dt") * F.log10(F.col("c_t").cast("double")))
                / F.sum("c_dt")
            ).alias("lp0")
        )
    )
    agg = doc.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("lp0").alias("avg0"),
        F.min("lp0").alias("min0"),
    )
    shift = F.log10(F.col("n_l").cast("double"))
    return agg.join(tot, "lang").select(
        "lang",
        "n_docs",
        F.round(F.col("avg0") - shift, 4).alias("avg_logprob"),
        F.round(F.col("min0") - shift, 4).alias("min_logprob"),
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


_DK_QERR = (
    "list_max(list_transform(generate_series(1, len(xd)), "
    "i -> abs(xd[i] - round(xd[i] / sc) * sc)))"
)


@register(
    "emb_int8_quant",
    f"""
WITH x AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xd
  FROM embeddings
),
s AS (
  SELECT vec_id, label, xd,
         list_max(list_transform(xd, v -> abs(v))) AS mx
  FROM x
),
sc AS (
  SELECT vec_id, label, xd,
         CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END AS sc
  FROM s
),
e AS (
  SELECT vec_id, label,
         round({_DK_QERR}, 6) AS max_abs_err,
         round({_dk_dot('xd', 'list_transform(xd, v -> round(v / sc) * sc)')}
               / sqrt({_dk_dot('xd', 'xd')}
                      * {_dk_dot('list_transform(xd, v -> round(v / sc) * sc)',
                                 'list_transform(xd, v -> round(v / sc) * sc)')}),
               6) AS cos_recon
  FROM sc
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       round(avg(max_abs_err), 6) AS avg_max_err,
       round(max(max_abs_err), 6) AS worst_err,
       round(min(cos_recon), 6) AS min_cos,
       round(avg(cos_recon), 6) AS avg_cos
FROM e GROUP BY label
""",
    "Symmetric int8 embedding quantization with reconstruction-quality "
    "gates: per-vector scale = max|x|/127, q = round(x/scale), and the "
    "oracle-checked outputs are the quantization error and cosine drift "
    "per label bucket. This is the storage/serving compression path for "
    "an embedding corpus (4x smaller vectors, ANN-compatible); at 100 TB "
    "it is a narrow per-row map — no shuffle until the tiny label rollup. "
    "All array math is the shared left-to-right double fold, so Spark and "
    "DuckDB agree bit-for-bit before rounding.",
)
def q_emb_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.functions.vectors import dot

    emb = load_table(spark, sf_dir, "embeddings")
    xd = F.col("embedding").cast("array<double>")
    x = emb.select(
        "vec_id", F.col("label").cast("long").alias("label"), xd.alias("xd")
    )
    mx = F.array_max(F.transform(F.col("xd"), lambda v: F.abs(v)))
    x = x.withColumn(
        "sc", F.when(mx == 0, F.lit(1.0)).otherwise(mx / F.lit(127.0))
    )
    recon = F.transform(
        F.col("xd"), lambda v: F.round(v / F.col("sc")) * F.col("sc")
    )
    x = x.withColumn("recon", recon)
    err = F.array_max(
        F.zip_with(F.col("xd"), F.col("recon"), lambda a, b: F.abs(a - b))
    )
    cos = dot(F.col("xd"), F.col("recon")) / F.sqrt(
        dot(F.col("xd"), F.col("xd"))
        * dot(F.col("recon"), F.col("recon"))
    )
    e = x.select(
        "label",
        F.round(err, 6).alias("max_abs_err"),
        F.round(cos, 6).alias("cos_recon"),
    )
    return e.groupBy("label").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.round(F.avg("max_abs_err"), 6).alias("avg_max_err"),
        F.round(F.max("max_abs_err"), 6).alias("worst_err"),
        F.round(F.min("cos_recon"), 6).alias("min_cos"),
        F.round(F.avg("cos_recon"), 6).alias("avg_cos"),
    )


# first md5 byte -> int in DuckDB (no conv()): the same strpos arithmetic the
# sharding oracle uses, factored for reuse
_DK_MD5_BYTE = (
    "((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1)"
)


@register(
    "text_dsir_weight",
    f"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(lower(text), '\\p{{L}}+')) AS tok
  FROM documents
),
tb AS (SELECT doc_id, lang, {_DK_MD5_BYTE} AS b FROM toks),
db AS (SELECT doc_id, lang, b, count(*) AS c_db FROM tb GROUP BY doc_id, lang, b),
rb AS (
  SELECT b, sum(c_db) AS c_r,
         sum(CASE WHEN lang = 'en' THEN c_db ELSE 0 END) AS c_t
  FROM db GROUP BY b
),
tot AS (SELECT sum(c_r) AS n_r, sum(c_t) AS n_t FROM rb),
w AS (
  SELECT rb.b,
         ln((rb.c_t + 1) / (tot.n_t + 256.0))
         - ln((rb.c_r + 1) / (tot.n_r + 256.0)) AS w_b
  FROM rb, tot
)
SELECT db.doc_id, db.lang,
       round(sum(db.c_db * w.w_b), 4) + 0.0 AS dsir_logweight
FROM db JOIN w ON db.b = w.b
GROUP BY db.doc_id, db.lang
""",
    "DSIR-style importance weight (Xie et al. 2023, data selection via "
    "importance resampling): hashed unigram bag-of-words LMs for the "
    "target distribution (here: the 'en' slice) and the raw corpus, and "
    "each doc scores log p_target(x) - log p_raw(x) over its 256 hash "
    "buckets (md5 first byte, identical in both engines; add-1 "
    "smoothing). Sampling prop. to exp(weight) recovers the DSIR "
    "selection. Plan: ONE token shuffle into (doc,bucket) counts; both "
    "LMs re-aggregate from those counts (exchange-reuse diamond) and "
    "come back as a 256-row broadcast — the 100 TB cost is the token "
    "count, everything downstream is constant-size.",
)
def q_text_dsir_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(r"\p{L}+"), F.lit(0))
        ).alias("tok"),
    )
    toks = toks.filter(F.col("tok").isNotNull())
    b = F.conv(F.substring(F.md5("tok"), 1, 2), 16, 10).cast("long")
    # explicit null-filter on the bucket key: the final db->w join would
    # otherwise add isnotnull(b) to only ITS branch of the db aggregate,
    # splitting the diamond into two token shuffles (see unigram_logprob)
    db = (
        toks.select("doc_id", "lang", b.alias("b"))
        .filter(F.col("b").isNotNull())
        .groupBy("doc_id", "lang", "b")
        .agg(F.count("*").alias("c_db"))
    )
    # both LMs in ONE conditional rollup (a lang='en' pre-filter would be
    # pushed below db's aggregate into a second corpus scan)
    rb = db.groupBy("b").agg(
        F.sum("c_db").alias("c_r"),
        F.sum(F.when(F.col("lang") == "en", F.col("c_db")).otherwise(0)).alias(
            "c_t"
        ),
    )
    tot = rb.agg(F.sum("c_r").alias("n_r"), F.sum("c_t").alias("n_t"))
    w = rb.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("c_t") + 1) / (F.col("n_t") + 256.0))
            - F.log((F.col("c_r") + 1) / (F.col("n_r") + 256.0))
        ).alias("w_b"),
    )
    return (
        db.join(F.broadcast(w), "b")
        .groupBy("doc_id", "lang")
        .agg(
            # +0.0 normalizes a rounded -0.0 (a doc whose log-ratio sums to
            # a tiny negative — the hazard class emb_covariance hit in r3,
            # caught here by the strict sf0.1 sweep)
            (F.round(F.sum(F.col("c_db") * F.col("w_b")), 4) + F.lit(0.0)).alias(
                "dsir_logweight"
            )
        )
    )


@register(
    "emb_covariance",
    """
WITH x AS (
  SELECT list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xd
  FROM embeddings
),
dim AS (
  SELECT UNNEST(generate_series(1, (SELECT max(len(xd)) FROM x))) AS p
),
cells AS (
  SELECT i.p AS i, j.p AS j,
         sum(x.xd[i.p] * x.xd[j.p]) AS ss,
         sum(x.xd[i.p]) AS si,
         sum(x.xd[j.p]) AS sj,
         count(*) AS n
  FROM x, dim i, dim j
  WHERE i.p <= j.p
  GROUP BY i.p, j.p
)
SELECT CAST(i - 1 AS BIGINT) AS i, CAST(j - 1 AS BIGINT) AS j,
       round(ss / n - (si / n) * (sj / n), 6) + 0.0 AS cov
FROM cells
""",
    "Distributed covariance of the embedding corpus (upper triangle, "
    "0-based cells): the input to PCA whitening / dim-reduction before "
    "ANN indexing. Spark side is the treeAggregate shape — one numpy "
    "(n, sum, outer-sum) partial PER TASK via mapInPandas (d + d^2 "
    "doubles of state however many rows the task holds), one tiny "
    "shuffle of partials by cell position; row-scale data is never "
    "shuffled. The oracle recomputes every cell from scratch; rounding "
    "absorbs cross-partition float summation order (~1e-13 vs the 5e-7 "
    "quantum).",
)
def q_emb_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.emb_stats import emb_covariance

    return emb_covariance(load_table(spark, sf_dir, "embeddings"))


# PCA projection with FIXED literal components (same contract as
# e_hash_embed): pca_fit's eigendecomposition is not SQL-expressible, so the
# oracled query pins deterministic components/mean — exact binary rationals
# (k/16, k/32) so the literals round-trip identically through Spark, the SQL
# text, and DuckDB's parser — and both engines recompute the identical
# centered left-to-right dot product per row. pca_fit itself stays covered
# by numpy-parity unit tests (tests/test_emb_stats.py).
_PCA_D = 64
_PCA_K = 4
_PCA_COMPONENTS = [
    [((c * 37 + i * 11) % 19 - 9) / 16.0 for i in range(_PCA_D)]
    for c in range(_PCA_K)
]
_PCA_MEAN = [((i * 7) % 23 - 11) / 32.0 for i in range(_PCA_D)]


def _pca_oracle() -> str:
    mean_sql = "[" + ", ".join(repr(m) for m in _PCA_MEAN) + "]"
    comp_rows = ", ".join(
        "(" + str(c + 1) + ", [" + ", ".join(repr(v) for v in comp) + "])"
        for c, comp in enumerate(_PCA_COMPONENTS)
    )
    # centered[i] = CAST(x[i] AS DOUBLE) - mean[i]; value = dot(centered, comp)
    dot_expr = (
        "list_sum(list_transform(generate_series(1, len(e.embedding)), "
        "i -> (CAST(e.embedding[i] AS DOUBLE) - m.mean[i]) * c.comp[i]))"
    )
    return f"""
WITH m AS (SELECT {mean_sql} AS mean),
c(comp_id, comp) AS (VALUES {comp_rows})
SELECT e.vec_id, CAST(c.comp_id AS BIGINT) AS comp,
       round({dot_expr}, 6) + 0.0 AS value
FROM embeddings e, m, c
"""


@register(
    "emb_pca_project",
    _pca_oracle(),
    "PCA projection (emb_stats.pca_project) onto pinned literal components: "
    "centered per-row dot products, pure Catalyst (zip_with/aggregate "
    "folds, components broadcast as plan literals) — narrow map, no "
    "shuffle, no Python. The fit side (pca_fit) is numpy-parity "
    "unit-tested; this query oracles the projection math bit-for-bit.",
)
def q_emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.emb_stats import pca_project

    emb = load_table(spark, sf_dir, "embeddings")
    out = pca_project(emb, _PCA_COMPONENTS, _PCA_MEAN)
    return (
        out.select("vec_id", F.posexplode("pca").alias("__pos", "__raw"))
        .select(
            "vec_id",
            (F.col("__pos") + 1).cast("long").alias("comp"),
            # +0.0 normalizes a rounded -0.0 (same insurance as emb_covariance)
            (F.round(F.col("__raw"), 6) + F.lit(0.0)).alias("value"),
        )
    )


@register(
    "emb_outlier_zscore",
    f"""
WITH x AS (
  SELECT vec_id, i,
         CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings,
       (SELECT UNNEST(generate_series(
          1, (SELECT max(len(embedding)) FROM embeddings))) AS i) t
),
stats AS (
  SELECT i, round(avg(v), 6) AS mu, round(avg(v * v), 6) AS m2
  FROM x GROUP BY i
),
z AS (
  SELECT x.vec_id,
         (x.v - s.mu) * (x.v - s.mu)
           / greatest(s.m2 - s.mu * s.mu, 1e-12) AS z2
  FROM x JOIN stats s ON s.i = x.i
),
scored AS (
  SELECT vec_id, round(sum(z2), 4) AS score FROM z GROUP BY vec_id
)
SELECT vec_id, score FROM scored
ORDER BY score DESC, vec_id LIMIT 20
""",
    "Embedding outlier detection: per-dimension standardized squared "
    "z-score summed per vector, top-20 most anomalous — the embedding-QA "
    "gate that catches corrupt/degenerate vectors before they poison an "
    "ANN index or a dedup threshold. Cross-engine float contract: the "
    "per-dim mean and second moment are ROUNDED (6dp) before the z-score "
    "uses them, so cross-partition summation-order noise (~1e-13) can "
    "never leak into the score; the per-vector z2 fold is the exploded "
    "(vec, dim) groupBy both engines share. One explode shuffle + a "
    "64-row broadcast back; TakeOrderedAndProject top-20.",
)
def q_emb_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "__p", "v"
        ),
    ).select("vec_id", (F.col("__p") + 1).alias("i"), "v")
    stats = x.groupBy("i").agg(
        F.round(F.avg("v"), 6).alias("mu"),
        F.round(F.avg(F.col("v") * F.col("v")), 6).alias("m2"),
    )
    z = x.join(F.broadcast(stats), "i").select(
        "vec_id",
        (
            (F.col("v") - F.col("mu"))
            * (F.col("v") - F.col("mu"))
            # identical floor in the oracle: a constant dim (rounded
            # variance 0) scores 0-ish instead of raising under ANSI
            / F.greatest(
                F.col("m2") - F.col("mu") * F.col("mu"), F.lit(1e-12)
            )
        ).alias("z2"),
    )
    return (
        z.groupBy("vec_id")
        .agg(F.round(F.sum("z2"), 4).alias("score"))
        .orderBy(F.col("score").desc(), "vec_id")
        .limit(20)
    )


@register(
    "corpus_source_cap",
    f"""
WITH base AS (
  SELECT doc_id, source, lang,
         length(text) AS n_chars,
         {_DK_NTOK} AS n_tokens,
         {_DK_PUNCT} AS n_punct,
         ({_dk_stop_hits()}) AS stop_hits
  FROM documents
),
safe AS (
  SELECT *, greatest(n_chars, 1) AS sc, greatest(n_tokens, 1) AS st FROM base
),
scored AS (
  SELECT doc_id, source, lang,
         round(least(n_tokens / 100.0, 1.0) * 0.25
               + (1 - least(n_punct / sc * 4, 1.0)) * 0.25
               + least(stop_hits / st * 3, 1.0) * 0.25
               + least(n_tokens / sc * 6, 1.0) * 0.25, 4) AS quality_score
  FROM safe
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY source ORDER BY quality_score DESC, doc_id) AS rn
  FROM scored
)
SELECT source, doc_id, lang, quality_score, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 15
""",
    "Per-source document cap (the host-cap / domain-cap curation rule: no "
    "single crawl host may dominate the mix): keep the best 15 docs per "
    "source by the SAME composite quality score text_quality registers, "
    "tiebroken on doc_id so the cut is deterministic. One window over a "
    "source-partitioned shuffle; the quality signals are computed in the "
    "same narrow scan pass. At 100 TB rank-within-source is exactly a "
    "row_number over hashpartitioning(source) — no global ordering "
    "anywhere.",
)
def q_corpus_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from yaml_pipe_spark.operators.text_stats import text_statistics

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    scored = text_statistics(docs).select(
        "doc_id", "source", "lang", "quality_score"
    )
    w = W.partitionBy("source").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 15)
        .select("source", "doc_id", "lang", "quality_score", "rn")
    )


@register(
    "corpus_holdout_split",
    """
WITH h AS (
  SELECT lang, n_chars,
         ((strpos('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
          + strpos('0123456789abcdef',
                   substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS b
  FROM documents
),
s AS (
  SELECT lang, n_chars,
         CASE WHEN b < 232 THEN 'train'
              WHEN b < 244 THEN 'val'
              ELSE 'test' END AS split
  FROM h
)
SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars_total
FROM s GROUP BY lang, split
""",
    "Deterministic train/val/test holdout: the first md5 byte of doc_id "
    "buckets every document into ~90.6/4.7/4.7 — a pure narrow map, "
    "stable across runs and machines, so re-ingesting the corpus can "
    "never leak a val doc into train (the property random splits lose "
    "the moment data is re-sharded). Per-(lang, split) doc and char "
    "rollup is the audit output.",
)
def q_corpus_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("long")
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "n_chars", h.alias("b")
    )
    split = (
        F.when(F.col("b") < 232, "train")
        .when(F.col("b") < 244, "val")
        .otherwise("test")
    )
    return (
        docs.select("lang", "n_chars", split.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars_total"),
        )
    )


@register(
    "corpus_pack_windows",
    f"""
WITH t AS (
  SELECT doc_id, CAST({_DK_NTOK} AS BIGINT) AS n FROM documents
),
nz AS (SELECT doc_id, n FROM t WHERE n > 0),
o AS (
  SELECT doc_id, n,
         COALESCE(sum(n) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM nz
),
s AS (
  SELECT n, CAST(off AS BIGINT) AS off,
         CAST(off // 512 AS BIGINT) AS w0,
         CAST((off + n - 1) // 512 AS BIGINT) AS w1
  FROM o
),
x AS (
  SELECT n, off, w0, UNNEST(generate_series(w0, w1)) AS win FROM s
)
SELECT CAST(win AS BIGINT) AS window_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN w0 = win THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_starting,
       CAST(sum(least(off + n - 1, (win + 1) * 512 - 1)
                - greatest(off, win * 512) + 1) AS BIGINT) AS n_tokens
FROM x GROUP BY win
""",
    "Training-sequence packing audit (sampling.pack_windows): docs "
    "concatenated in id order, chunked into 512-token context windows; "
    "per-window doc count, starts, and fill — the boundary-crossing / "
    "tail-fill accounting a trainer's loader needs. Scale: the running "
    "token offset is a TWO-PASS cumsum (in-shard window + broadcast "
    "per-shard exclusive prefix), so no corpus-wide single-reducer "
    "Window.orderBy exists in the plan; the oracle recomputes the same "
    "offsets with a plain global cumsum.",
)
def q_corpus_pack_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.sampling import pack_windows

    return pack_windows(load_table(spark, sf_dir, "documents"), ctx=512)


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


# ---------------------------------------------------------------------------
# Round 4c: C4-style segment dedup, temperature mixture sampling,
# matryoshka truncation QA, and 2-bit scalar/product quantization ADC ANN.
# ---------------------------------------------------------------------------


@register(
    "dedup_segment_exact",
    """
WITH base AS (SELECT doc_id AS id, string_split(text, ' ') AS tk
              FROM documents),
segs AS (
  SELECT id, s, array_to_string(list_slice(tk, s, s + 15), ' ') AS seg
  FROM (SELECT id, tk, UNNEST(generate_series(1, len(tk), 16)) AS s
        FROM base)
),
counts AS (SELECT seg, count(DISTINCT id) AS ndocs FROM segs GROUP BY 1),
marked AS (
  SELECT g.id, g.s, g.seg, c.ndocs > 1 AS dup,
         len(string_split(g.seg, ' ')) AS segtok
  FROM segs g JOIN counts c USING (seg)
)
SELECT id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_segments,
       CAST(sum(CASE WHEN dup THEN 0 ELSE segtok END) AS BIGINT)
         AS n_kept_tokens,
       sha256(coalesce(array_to_string(
         list(seg ORDER BY s) FILTER (WHERE NOT dup), ' '), ''))
         AS cleaned_hash
FROM marked GROUP BY 1
""",
    "C4-style exact segment dedup (operators/dedup.py::segment_exact_dedup): "
    "disjoint 16-token blocks, boilerplate = block text in >1 distinct doc; "
    "the per-doc audit pins counts AND the sha256 of the cleaned "
    "reconstruction, so a segmentation or ordering bug hash-mismatches. "
    "Segment-keyed agg + join (one partitioning, reused), never a "
    "doc-set-collecting window — the 100 TB-safe shape.",
)
def q_dedup_segment_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.dedup import segment_exact_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return segment_exact_dedup(docs, "text", "doc_id", seg_words=16)


def _dk_hex4(key: str) -> str:
    md5e = f"md5(CAST({key} AS VARCHAR))"
    digs = [
        f"(strpos('0123456789abcdef', substr({md5e}, {i}, 1)) - 1)"
        for i in range(1, 5)
    ]
    return (
        f"((({digs[0]} * 16 + {digs[1]}) * 16 + {digs[2]}) * 16 + {digs[3]})"
    )


@register(
    "corpus_temperature_mix",
    f"""
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
w AS (SELECT lang, n, sqrt(CAST(n AS DOUBLE)) AS wt FROM c),
r AS (
  SELECT lang, n,
         round(wt / (SELECT sum(wt) FROM w), 6) AS q_temp,
         round(least(1.0,
                 (round(wt / (SELECT sum(wt) FROM w), 6)
                  * ((SELECT sum(n) FROM c) * 0.5)) / n), 6) AS rate
  FROM w
),
s AS (
  SELECT d.lang, count(*) AS ns
  FROM documents d JOIN r ON d.lang IS NOT DISTINCT FROM r.lang
  WHERE {_dk_hex4('d.doc_id')} / 65536.0 < r.rate
  GROUP BY 1
)
SELECT r.lang, CAST(r.n AS BIGINT) AS n_docs, r.q_temp, r.rate,
       CAST(coalesce(s.ns, 0) AS BIGINT) AS n_sampled
FROM r LEFT JOIN s ON r.lang IS NOT DISTINCT FROM s.lang
""",
    "Temperature-based language mixture (mT5/XLM-R alpha=0.5, "
    "operators/sampling.py::temperature_mix): per-lang sampling weights "
    "proportional to sqrt(share), scaled to a half-corpus budget, capped "
    "at 1; the keep decision is the deterministic md5-16-bit uniform so "
    "the oracle recomputes the EXACT sampled counts, not an expectation. "
    "sqrt (IEEE-correctly-rounded) instead of arbitrary pow keeps the "
    "weights engine-identical.",
)
def q_corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.sampling import temperature_mix

    docs = load_table(spark, sf_dir, "documents").select("lang", "doc_id")
    return temperature_mix(docs, "lang", "doc_id", budget_frac=0.5)


@register(
    "emb_matryoshka_agreement",
    f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20
),
c AS (
  SELECT vec_id, embedding AS xv FROM embeddings WHERE vec_id >= 20
),
scored AS (
  SELECT q.qid, c.vec_id,
         round({_dk_cos('c.xv', 'q.qv')}, 6) AS s_full,
         round({_dk_cos('list_slice(c.xv, 1, 16)',
                        'list_slice(q.qv, 1, 16)')}, 6) AS s_16
  FROM c, q
),
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY qid ORDER BY s_full DESC, vec_id) AS rf,
    row_number() OVER (PARTITION BY qid ORDER BY s_16 DESC, vec_id) AS rt
  FROM scored
)
SELECT qid,
       CAST(sum(CASE WHEN rf <= 5 AND rt <= 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_common,
       CAST(min(CASE WHEN rf = 1 THEN vec_id END) AS BIGINT) AS full_top1,
       CAST(min(CASE WHEN rt = 1 THEN vec_id END) AS BIGINT) AS trunc_top1
FROM ranked GROUP BY qid
""",
    "Matryoshka truncation QA: top-5 agreement between full-dim cosine "
    "and first-16-dim cosine retrieval (MRL-style dimension truncation — "
    "the gate before shipping truncated embeddings to a cheaper index). "
    "Both rankings come out of ONE pair pass and ONE qid shuffle (two "
    "sort orders over the same window partitioning); rounded scores with "
    "vec_id tiebreaks keep both top-5 memberships engine-deterministic.",
)
def q_emb_matryoshka_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from yaml_pipe_spark.functions.vectors import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = emb.filter(F.col("vec_id") >= 20).select(
        "vec_id", F.col("embedding").alias("xv")
    )
    scored = c.join(F.broadcast(q), how="cross").select(
        "qid",
        "vec_id",
        F.round(cosine(F.col("xv"), F.col("qv")), 6).alias("s_full"),
        F.round(
            cosine(F.slice(F.col("xv"), 1, 16), F.slice(F.col("qv"), 1, 16)),
            6,
        ).alias("s_16"),
    )
    wq = W.partitionBy("qid")
    ranked = scored.select(
        "qid",
        "vec_id",
        F.row_number()
        .over(wq.orderBy(F.desc("s_full"), "vec_id"))
        .alias("rf"),
        F.row_number().over(wq.orderBy(F.desc("s_16"), "vec_id")).alias("rt"),
    )
    return ranked.groupBy("qid").agg(
        F.sum(((F.col("rf") <= 5) & (F.col("rt") <= 5)).cast("int"))
        .cast("long")
        .alias("n_common"),
        F.min(F.when(F.col("rf") == 1, F.col("vec_id")))
        .cast("long")
        .alias("full_top1"),
        F.min(F.when(F.col("rt") == 1, F.col("vec_id")))
        .cast("long")
        .alias("trunc_top1"),
    )


@register(
    "ann_pq_adc_topk",
    f"""
WITH q AS (
  SELECT vec_id AS qid,
         list_transform(embedding, v -> CAST(v AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < 20
),
c AS (
  SELECT vec_id,
         list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xv,
         list_transform(embedding, v -> least(greatest(
           CAST(floor(CAST(v AS DOUBLE) * 8) AS BIGINT) + 2,
           CAST(0 AS BIGINT)), CAST(3 AS BIGINT))) AS code
  FROM embeddings WHERE vec_id >= 20
),
pairs AS (
  SELECT q.qid, c.vec_id,
         round(list_sum(list_transform(
           list_transform(generate_series(1, len(q.qv)),
                          i -> q.qv[i] - (CAST(c.code[i] AS DOUBLE) - 1.5)/8),
           x -> x * x)), 6) AS adc_r,
         round({_dk_cos('c.xv', 'q.qv')}, 6) AS score
  FROM c, q
),
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY qid ORDER BY adc_r, vec_id) AS rank,
    row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS xr
  FROM pairs
)
SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, adc_r,
       CAST(CASE WHEN xr <= 5 THEN 1 ELSE 0 END AS BIGINT) AS hit
FROM ranked WHERE rank <= 5
""",
    "Product-quantization ANN with asymmetric distance "
    "(operators/similarity.py::sq2_codes/sq2_adc_dist_sq): the corpus is "
    "compressed to pinned 2-bit-per-dim codes (16 codewords per 2-dim "
    "subspace — 16x smaller scan/shuffle than float32) and ranked by "
    "full-precision-query-vs-reconstruction distance; `hit` marks ADC "
    "top-5 rows that are also exact-cosine top-5, so the oracle checks "
    "codes, ADC values, ranking, AND the quantizer's retrieval quality "
    "in one result. The closed-form floor assignment rule (no argmin "
    "ties) and the shared left-to-right fold keep everything "
    "engine-exact; both rankings ride one qid window shuffle.",
)
def q_ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from yaml_pipe_spark.functions.vectors import cosine
    from yaml_pipe_spark.operators.similarity import (
        sq2_adc_dist_sq,
        sq2_codes,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = emb.filter(F.col("vec_id") >= 20).select(
        "vec_id",
        F.col("embedding").alias("xv"),
        sq2_codes(F.col("embedding")).alias("code"),
    )
    pairs = c.join(F.broadcast(q), how="cross").select(
        "qid",
        "vec_id",
        F.round(sq2_adc_dist_sq(F.col("qv"), F.col("code")), 6).alias(
            "adc_r"
        ),
        F.round(cosine(F.col("xv"), F.col("qv")), 6).alias("score"),
    )
    wq = W.partitionBy("qid")
    ranked = pairs.select(
        "qid",
        "vec_id",
        "adc_r",
        F.row_number().over(wq.orderBy("adc_r", "vec_id")).alias("rank"),
        F.row_number()
        .over(wq.orderBy(F.desc("score"), "vec_id"))
        .alias("xr"),
    )
    return ranked.filter(F.col("rank") <= 5).select(
        "qid",
        F.col("rank").cast("long").alias("rank"),
        "vec_id",
        "adc_r",
        (F.col("xr") <= 5).cast("long").alias("hit"),
    )


# Shared oracle core for the IVF-PQ family: assignment, probes, codes, ADC
# ranking, exact re-rank — everything up to `final`. ann_ivfpq_topk appends
# the brute-force `exact`/hit audit; ann_index_persisted (identical serve
# semantics off the persisted tables) selects from `final` directly.
_ANN_IVFPQ_CORE = f"""
WITH c AS (
  SELECT vec_id - 20 AS cid, embedding AS cv
  FROM embeddings WHERE vec_id >= 20 AND vec_id < 28
),
x AS (
  SELECT vec_id, embedding AS xv,
         list_transform(embedding, v -> least(greatest(
           CAST(floor(CAST(v AS DOUBLE) * 8) AS BIGINT) + 2,
           CAST(0 AS BIGINT)), CAST(3 AS BIGINT))) AS code
  FROM embeddings WHERE vec_id >= 20
),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT x.vec_id, c.cid,
           row_number() OVER (PARTITION BY x.vec_id
             ORDER BY round({_dk_cos('x.xv', 'c.cv')}, 6) DESC, c.cid) AS rn
    FROM x, c
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20
),
probes AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           row_number() OVER (PARTITION BY q.qid
             ORDER BY round({_dk_cos('q.qv', 'c.cv')}, 6) DESC, c.cid) AS rn
    FROM q, c
  ) WHERE rn <= 2
),
adc AS (
  SELECT p.qid, a.vec_id,
         round(list_sum(list_transform(
           list_transform(generate_series(1, len(q.qv)),
             i -> CAST(q.qv[i] AS DOUBLE)
                  - (CAST(x.code[i] AS DOUBLE) - 1.5) / 8),
           y -> y * y)), 6) AS adc_r
  FROM probes p
  JOIN asg a ON a.cid = p.cid
  JOIN x ON x.vec_id = a.vec_id
  JOIN q ON q.qid = p.qid
),
topm AS (
  SELECT qid, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY adc_r, vec_id) AS ar
    FROM adc
  ) WHERE ar <= 20
),
rer AS (
  SELECT t.qid, t.vec_id, round({_dk_cos('x.xv', 'q.qv')}, 6) AS score
  FROM topm t
  JOIN x ON x.vec_id = t.vec_id
  JOIN q ON q.qid = t.qid
),
final AS (
  SELECT qid, vec_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, vec_id) AS rank
  FROM rer
)"""

ANN_IVFPQ_ORACLE = _ANN_IVFPQ_CORE + f""",
exact AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, x.vec_id,
           row_number() OVER (PARTITION BY q.qid
             ORDER BY round({_dk_cos('x.xv', 'q.qv')}, 6) DESC, x.vec_id)
             AS rn
    FROM x, q
  ) WHERE rn <= 5
)
SELECT f.qid, CAST(f.rank AS BIGINT) AS rank, f.vec_id, f.score,
       CAST(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS hit
FROM final f
LEFT JOIN exact e ON e.qid = f.qid AND e.vec_id = f.vec_id
WHERE f.rank <= 5
"""


@register(
    "ann_ivfpq_topk",
    ANN_IVFPQ_ORACLE,
    "IVF-PQ composed (similarity.ivfpq_topk) — the actual 100 TB ANN "
    "layout, closing VERDICT r4 ask #6: coarse-quantize the corpus into "
    "8 cells AND 2-bit PQ codes at index-build time; each query probes "
    "its 2 nearest cells, ranks ONLY the probed cells' CODE rows by "
    "asymmetric distance (16x smaller scan, partition-pruned by cid), "
    "then the ADC top-20 ids join back to full-precision vectors for the "
    "exact cosine re-rank that yields the final top-5. `hit` marks rows "
    "that are also in the brute-force exact top-5, so the oracle "
    "recomputes assignment, probes, codes, ADC ranking, re-rank AND the "
    "composed index's retrieval quality in one result.",
)
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from yaml_pipe_spark.functions.vectors import cosine
    from yaml_pipe_spark.operators.similarity import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corp = emb.filter(F.col("vec_id") >= 20).select("vec_id", "embedding")
    cents = emb.filter(
        (F.col("vec_id") >= 20) & (F.col("vec_id") < 28)
    ).select(
        (F.col("vec_id") - 20).alias("cid"), F.col("embedding").alias("cv")
    )
    final = ivfpq_topk(q, corp, cents, k=5, nprobe=2, rerank_m=20)
    exact = (
        corp.join(F.broadcast(q), how="cross")
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("__s"),
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.desc("__s"), "vec_id")
            ),
        )
        .filter(F.col("__rn") <= 5)
        .select("qid", "vec_id", F.lit(1).alias("__hit"))
    )
    return final.join(exact, ["qid", "vec_id"], "left").select(
        "qid",
        "rank",
        "vec_id",
        "score",
        F.coalesce(F.col("__hit"), F.lit(0)).cast("long").alias("hit"),
    )


ANN_INDEX_PERSISTED_ORACLE = _ANN_IVFPQ_CORE + """
SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, score
FROM final WHERE rank <= 5
"""

# Rebuild-without-the-rows oracle for the right-to-be-forgotten delete:
# the SAME IVF-PQ core with the forgotten ids (vec_id % 7 = 3) excluded
# from the corpus CTE — centroids stay as built (a frozen coarse
# quantizer is not member data), queries are unaffected. The x-CTE line
# is replaced surgically; the assert keeps the anchor honest if the core
# is ever reworded.
_FORGET_ANCHOR = "FROM embeddings WHERE vec_id >= 20\n"
assert _ANN_IVFPQ_CORE.count(_FORGET_ANCHOR) == 1
ANN_INDEX_FORGET_ORACLE = (
    _ANN_IVFPQ_CORE.replace(
        _FORGET_ANCHOR,
        "FROM embeddings WHERE vec_id >= 20 AND vec_id % 7 <> 3\n",
    )
    + """
SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, score
FROM final WHERE rank <= 5
"""
)


@register(
    "ann_index_persisted",
    ANN_INDEX_PERSISTED_ORACLE,
    "Build-once/serve-many persisted IVF-PQ (operators/ann_index.py::"
    "IvfPqIndexStore) — the reference's index/query split (core/pipeline.py "
    "build vs core/evaluation.py:44-64 query) elevated to the 100 TB "
    "layout, closing VERDICT r5 ask #3: build_if_stale assigns + 2-bit-"
    "encodes the corpus ONCE and persists centroids / cid-partitioned "
    "codes / full-precision vectors / a fingerprint meta row; serve reads "
    "ONLY the persisted tables — broadcast probe set, dynamic-partition-"
    "pruned codes scan (nprobe/n_cells of 2-bit data), broadcast top-m "
    "re-rank — with NO assign/encode re-run and NO index-side shuffle "
    "(plan-asserted in tests/test_ann_index.py). Values are identical to "
    "the in-query ivfpq_topk build, so the oracle is the same IVF-PQ core "
    "recomputed from scratch; staleness/rebuild semantics are unit-tested.",
)
def q_ann_index_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from yaml_pipe_spark.operators.ann_index import IvfPqIndexStore

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corp = emb.filter(F.col("vec_id") >= 20).select("vec_id", "embedding")
    cents = emb.filter(
        (F.col("vec_id") >= 20) & (F.col("vec_id") < 28)
    ).select(
        (F.col("vec_id") - 20).alias("cid"), F.col("embedding").alias("cv")
    )
    store = IvfPqIndexStore(
        os.path.join(
            "spark-warehouse",
            f"ann_ivfpq_index_{os.path.basename(os.path.normpath(sf_dir))}",
        )
    )
    store.build_if_stale(corp, cents)
    return store.serve(q, k=5, nprobe=2, rerank_m=20)


@register(
    "ann_index_forget",
    ANN_INDEX_FORGET_ORACLE,
    "Right-to-be-forgotten on the persisted IVF-PQ store "
    "(operators/ann_index.py::forget, VERDICT r9 ask #4): a deletion "
    "request (vec_id % 7 = 3) PHYSICALLY purges its rows from the "
    "cid-partitioned codes and the __vb-bucketed vectors — file surgery "
    "over only the partitions the deleted ids live in (dynamic partition "
    "overwrite; emptied partitions dropped), never a corpus rewrite — "
    "and the XOR fingerprint composes back out, so "
    "is_stale(corpus-without-the-rows) is False afterwards (that gate IS "
    "this query's warm path: a rerun proves the composed fingerprint "
    "equals the rebuild-without fingerprint or it would rebuild+forget "
    "again). Serve-after-forget is value-identical to a rebuild without "
    "the rows; the oracle is the full IVF-PQ core recomputed from "
    "scratch on the remaining corpus. Centroids stay frozen — a coarse "
    "quantizer holds no member data. Unit twin: tests/test_forget.py.",
)
def q_ann_index_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from yaml_pipe_spark.operators.ann_index import IvfPqIndexStore

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corp = emb.filter(F.col("vec_id") >= 20).select("vec_id", "embedding")
    keep = corp.filter(F.col("vec_id") % 7 != 3)
    gone = corp.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    cents = emb.filter(
        (F.col("vec_id") >= 20) & (F.col("vec_id") < 28)
    ).select(
        (F.col("vec_id") - 20).alias("cid"), F.col("embedding").alias("cv")
    )
    store = IvfPqIndexStore(
        os.path.join(
            "spark-warehouse",
            f"ann_ivfpq_forget_{os.path.basename(os.path.normpath(sf_dir))}",
        )
    )
    if store.is_stale(keep, centroids=cents):
        store.build(corp, cents)
        store.forget(gone)
        # the composed fingerprint must equal the rebuild-without scan —
        # asserted only on the cold path, same policy as bm25_index_persisted
        assert store.is_stale(keep, centroids=cents) is False
    return store.serve(q, k=5, nprobe=2, rerank_m=20)


@register(
    "ann_index_compact",
    ANN_INDEX_FORGET_ORACLE,
    "Small-file compaction on the persisted IVF-PQ store "
    "(operators/ann_index.py::compact, round 10) — the maintenance "
    "operation that completes the build/append/forget lifecycle: every "
    "append lands one part-file per touched cid cell / __vb bucket per "
    "increment, so a long maintenance chain fragments the index and "
    "every serve pays the per-file open cost (the economics behind "
    "OPTIMIZE / rewrite_data_files in transactional table formats). The "
    "chain here is build(standing) -> two appends -> forget(vec_id%7=3) "
    "-> compact(), which rewrites ONLY partitions holding >1 data file "
    "(file surgery proportional to fragmentation, never corpus size) and "
    "coalesces each to one file. Compaction is value-neutral: rows, "
    "fingerprint and meta are untouched, so the oracle is the "
    "rebuild-without-the-forgotten-rows oracle UNCHANGED — the same "
    "IVF-PQ core recomputed from scratch — and the post-compact serve "
    "must hash-equal it. Unit twin: tests/test_ann_compact.py.",
)
def q_ann_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from yaml_pipe_spark.operators.ann_index import (
        IvfPqIndexStore,
        _partition_file_counts,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corp = emb.filter(F.col("vec_id") >= 20).select("vec_id", "embedding")
    keep = corp.filter(F.col("vec_id") % 7 != 3)
    gone = corp.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    cents = emb.filter(
        (F.col("vec_id") >= 20) & (F.col("vec_id") < 28)
    ).select(
        (F.col("vec_id") - 20).alias("cid"), F.col("embedding").alias("cv")
    )
    # deterministic 80/10/10 split: standing build + two fragmenting
    # appends (the daily-increment chain, two days of it)
    split = corp.agg(
        F.floor(0.8 * F.max("vec_id")).cast("long").alias("__s1"),
        F.floor(0.9 * F.max("vec_id")).cast("long").alias("__s2"),
    )
    staged = corp.crossJoin(F.broadcast(split))
    standing = staged.filter(F.col("vec_id") < F.col("__s1")).select(
        "vec_id", "embedding"
    )
    inc1 = staged.filter(
        (F.col("vec_id") >= F.col("__s1")) & (F.col("vec_id") < F.col("__s2"))
    ).select("vec_id", "embedding")
    inc2 = staged.filter(F.col("vec_id") >= F.col("__s2")).select(
        "vec_id", "embedding"
    )
    store = IvfPqIndexStore(
        os.path.join(
            "spark-warehouse",
            f"ann_ivfpq_compact_{os.path.basename(os.path.normpath(sf_dir))}",
        )
    )
    if store.is_stale(keep, centroids=cents):
        import shutil

        shutil.rmtree(store.base_path, ignore_errors=True)
        store.build(standing, cents)
        store.append(inc1)
        store.append(inc2)
        store.forget(gone)
        store.compact()
        # compaction left no fragmented partition behind, and the
        # fingerprint (untouched by compact) still composes to the
        # remaining corpus
        assert all(
            n <= 1
            for n in _partition_file_counts(
                spark, store.codes_path, store.cid_col
            ).values()
        )
        assert store.is_stale(keep, centroids=cents) is False
    return store.serve(q, k=5, nprobe=2, rerank_m=20)


# Shared by text_bigram_logprob (per-lang rollup) and corpus_ccnet_buckets
# (per-lang perplexity terciles): per-doc mean bigram log10-probability under
# the corpus's own per-language bigram LM (operators/text_stats.py::
# bigram_doc_logprob is the Spark twin — change them together).
_DK_BIGRAM_DOC = r"""toks AS (
  SELECT lang, doc_id, regexp_extract_all(lower(text), '\p{L}+') AS t
  FROM documents
),
bg0 AS (
  SELECT lang, doc_id, UNNEST(generate_series(1, len(t) - 1)) AS i, t
  FROM toks WHERE len(t) >= 2
),
bgs AS (SELECT lang, doc_id, t[i] AS prev, t[i+1] AS cur FROM bg0),
dt AS (
  SELECT lang, doc_id, prev, cur, count(*) AS c_dt
  FROM bgs GROUP BY 1, 2, 3, 4
),
lm AS (SELECT lang, prev, cur, sum(c_dt) AS c_bg FROM dt GROUP BY 1, 2, 3),
pv AS (SELECT lang, prev, sum(c_bg) AS c_prev FROM lm GROUP BY 1, 2),
lmj AS (
  SELECT lm.lang, lm.prev, lm.cur,
         log10(CAST(lm.c_bg AS DOUBLE))
           - log10(CAST(pv.c_prev AS DOUBLE)) AS lp
  FROM lm JOIN pv ON lm.lang = pv.lang AND lm.prev = pv.prev
),
doc AS (
  SELECT dt.lang, dt.doc_id,
         sum(dt.c_dt * lmj.lp) / sum(dt.c_dt) AS lp0
  FROM dt JOIN lmj ON dt.lang = lmj.lang AND dt.prev = lmj.prev
                  AND dt.cur = lmj.cur
  GROUP BY 1, 2
)"""


@register(
    "text_bigram_logprob",
    "WITH " + _DK_BIGRAM_DOC + """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(lp0), 4) AS avg_logprob,
       round(min(lp0), 4) AS min_logprob
FROM doc GROUP BY lang
""",
    "Bigram-LM quality proxy — the conditional-probability extension of "
    "text_unigram_logprob: per-lang P(cur | prev) trained on the corpus "
    "itself (no smoothing needed: every scored bigram is in its own "
    "training set), per-doc mean log10 probability, per-lang rollup. "
    "Plan: one (doc, bigram) count shuffle; the bigram LM and the "
    "prev-marginal both derive from it (vocabulary-sized aggs); the "
    "conditional log-prob attaches at the LM level (vocab⋈vocab on "
    "(lang, prev)) so the hot-prev skew never touches the doc-level "
    "stream, which joins once on the full (lang, prev, cur) key. "
    "Registered after the round-4 50-slot driver prefix: locally "
    "verified at sf0.01+sf0.1, queued for the round-5 driver front.",
)
def q_text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.text_stats import bigram_doc_logprob

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "text"
    )
    doc = bigram_doc_logprob(docs)
    return doc.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("lp0"), 4).alias("avg_logprob"),
        F.round(F.min("lp0"), 4).alias("min_logprob"),
    )


@register(
    "text_lang_confusion",
    f"""
WITH p0 AS (SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents),
s AS (SELECT doc_id, lang, {_dk_lang_scores()} FROM p0),
pred AS (SELECT doc_id, lang, {_lang_case_sql()} AS lang_pred FROM s)
SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n,
       round(count(*) / CAST(sum(count(*)) OVER (PARTITION BY lang)
                             AS DOUBLE), 4) AS share
FROM pred GROUP BY 1, 2
""",
    "Language-ID confusion matrix: the n-gram-marker classifier's "
    "predictions crossed with the ground-truth lang column, with each "
    "row's share of its true language — the accuracy/confusion report "
    "that turns text_lang_id from a black box into a measured component "
    "(same closes-the-loop pattern as ann_recall_measured and "
    "dedup_lsh_recall_audit). One narrow classify pass, one tiny "
    "|langs|^2 rollup, row-normalization window on the matrix frame. "
    "Registered after the round-4 50-slot driver prefix: locally "
    "verified at sf0.01+sf0.1, queued for the round-5 driver front.",
)
def q_text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from yaml_pipe_spark.operators.text_stats import language_id

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    pred = docs.select(
        "lang", language_id(F.col("text")).alias("lang_pred")
    )
    agg = pred.groupBy("lang", "lang_pred").agg(
        F.count("*").cast("long").alias("n")
    )
    w = W.partitionBy("lang")
    return agg.select(
        "lang",
        "lang_pred",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(w).cast("double"), 4
        ).alias("share"),
    )


@register(
    "dedup_lsh_recall_audit",
    f"""
WITH {_DK_SHINGLES},
{_DK_DF_CUT},
sigs AS (SELECT doc_id, {_DK_SIGS} FROM shingles GROUP BY doc_id),
buckets0 AS ({_DK_BUCKETS}),
buckets AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT *, count(*) OVER (PARTITION BY band_id, band_key) AS bn
    FROM buckets0
  ) WHERE bn <= 10000
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a
  JOIN buckets b ON a.band_id = b.band_id AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM shf a
  JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE round(i.inter / (sa.n + sb.n - i.inter), 4) >= 0.8
),
tcnt AS (SELECT count(*) AS n FROM truth),
ccnt AS (SELECT count(*) AS n FROM cands),
hcnt AS (
  SELECT count(*) AS n FROM truth t
  JOIN cands c ON t.id_a = c.id_a AND t.id_b = c.id_b
)
SELECT CAST(tcnt.n AS BIGINT) AS n_true_pairs,
       CAST(ccnt.n AS BIGINT) AS n_candidates,
       CAST(hcnt.n AS BIGINT) AS n_hit,
       round(CASE WHEN tcnt.n = 0 THEN 1.0
                  ELSE hcnt.n / CAST(tcnt.n AS DOUBLE) END, 4) AS recall
FROM tcnt, ccnt, hcnt
""",
    "Measured recall of the MinHash-LSH candidate generator against the "
    "exact inverted-index Jaccard pairs at 0.8 "
    "(operators/dedup.py::lsh_recall_audit) — the dedup twin of "
    "ann_recall_measured: closes the 'is the banding any good' loop with "
    "a number the oracle recomputes end to end (signatures, banding, "
    "bucket cap, exact truth set, intersection). The shingle frame is "
    "materialized once and feeds both sides; truth/candidate frames are "
    "checkpointed because each is consumed twice (count + semi-join). "
    "Registered after the round-4 50-slot driver prefix: locally "
    "verified at sf0.01+sf0.1, queued for the round-5 driver front.",
)
def q_dedup_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.dedup import lsh_recall_audit

    return lsh_recall_audit(load_table(spark, sf_dir, "documents"))


def _dk_band_buckets(bands: int) -> str:
    rows = 16 // bands
    return "\nUNION ALL\n".join(
        f"SELECT doc_id, {i} AS band_id, md5('{i}|' || "
        + " || ".join(f"sig_{i * rows + r}" for r in range(rows))
        + ") AS band_key FROM sigs"
        for i in range(bands)
    )


def _dk_band_curve_oracle(bands_list=(2, 4, 8)) -> str:
    per_band = []
    selects = []
    for b in bands_list:
        per_band.append(
            f"""
bk0_{b} AS ({_dk_band_buckets(b)}),
bk_{b} AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT *, count(*) OVER (PARTITION BY band_id, band_key) AS bn
    FROM bk0_{b}
  ) WHERE bn <= 10000
),
cd_{b} AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bk_{b} a
  JOIN bk_{b} b ON a.band_id = b.band_id AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
),
cc_{b} AS (SELECT count(*) AS n FROM cd_{b}),
hh_{b} AS (
  SELECT count(*) AS n FROM truth t
  JOIN cd_{b} c ON t.id_a = c.id_a AND t.id_b = c.id_b
)"""
        )
        selects.append(
            f"""
SELECT CAST({b} AS BIGINT) AS bands,
       CAST(cc_{b}.n AS BIGINT) AS n_candidates,
       CAST(hh_{b}.n AS BIGINT) AS n_hit,
       CAST(tcnt.n AS BIGINT) AS n_true_pairs,
       round(CASE WHEN tcnt.n = 0 THEN 1.0
                  ELSE hh_{b}.n / CAST(tcnt.n AS DOUBLE) END, 4) AS recall
FROM cc_{b}, hh_{b}, tcnt"""
        )
    return (
        f"""
WITH {_DK_SHINGLES},
{_DK_DF_CUT},
sigs AS (SELECT doc_id, {_DK_SIGS} FROM shingles GROUP BY doc_id),
sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM shf a
  JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE round(i.inter / (sa.n + sb.n - i.inter), 4) >= 0.8
),
tcnt AS (SELECT count(*) AS n FROM truth),"""
        + ",".join(per_band)
        + "\nUNION ALL\n".join(selects)
    )


@register(
    "dedup_minhash_band_curve",
    _dk_band_curve_oracle(),
    "Band-budget tuning curve for MinHash-LSH "
    "(operators/dedup.py::lsh_band_curve): recall and candidate volume "
    "at 2/4/8 bands over 16 signatures against ONE exact truth set — "
    "the dedup twin of ann_ivf_nprobe_curve: more bands = more "
    "candidates and higher recall but a bigger verify join, and this "
    "curve is how the operating point gets picked before a 100 TB run. "
    "Shingles, signatures, and the truth set are materialized once and "
    "shared across every configuration (same staged-materialization "
    "discipline as the dedup funnel); the oracle recomputes all three "
    "banded candidate sets and the recall arithmetic end to end. "
    "Registered after the round-4 50-slot driver prefix: locally "
    "verified at sf0.01+sf0.1, queued for the round-5 driver front.",
)
def q_dedup_minhash_band_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.dedup import lsh_band_curve

    return lsh_band_curve(load_table(spark, sf_dir, "documents"))


@register(
    "emb_pq_distortion",
    f"""
WITH c AS (
  SELECT CAST(label AS BIGINT) AS label,
         list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xv,
         list_transform(embedding, v ->
           (CAST(least(greatest(
              CAST(floor(CAST(v AS DOUBLE) * 8) AS BIGINT) + 2,
              CAST(0 AS BIGINT)), CAST(3 AS BIGINT)) AS DOUBLE)
            - 1.5) / 8) AS rv
  FROM embeddings
),
m AS (
  SELECT label,
         list_sum(list_transform(generate_series(1, len(xv)),
                  i -> (xv[i] - rv[i]) * (xv[i] - rv[i]))) / len(xv) AS mse,
         1 - {_dk_cos('xv', 'rv')} AS cosd
  FROM c
)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       round(avg(mse), 6) AS avg_mse,
       round(max(mse), 6) AS max_mse,
       round(avg(cosd), 6) AS avg_cos_drift
FROM m GROUP BY label
""",
    "Quantization-distortion report for the 2-bit PQ codes "
    "(operators/similarity.py::sq2_codes): per-label reconstruction MSE "
    "and cosine drift between each embedding and its code "
    "reconstruction — the distortion gate that complements "
    "ann_pq_adc_topk's retrieval-hit view (emb_int8_quant's twin for "
    "the product codebook). Pure Catalyst narrow map + one tiny label "
    "rollup; every per-vector value is an exact shared fold, so the "
    "oracle recomputes codes, reconstructions, MSE, and drift "
    "identically. Registered after the round-4 50-slot driver prefix: "
    "locally verified at sf0.01+sf0.1, queued for the round-5 driver "
    "front.",
)
def q_emb_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.functions.vectors import cosine
    from yaml_pipe_spark.operators.similarity import (
        sq2_adc_dist_sq,
        sq2_codes,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("label").cast("long").alias("label"),
        F.col("embedding").alias("xv"),
        sq2_codes(F.col("embedding")).alias("code"),
    )
    recon = F.transform(F.col("code"), lambda c: (c - 1.5) / 8)
    m = emb.select(
        "label",
        (
            sq2_adc_dist_sq(F.col("xv"), F.col("code"))
            / F.size("xv")
        ).alias("mse"),
        (F.lit(1) - cosine(F.col("xv"), recon)).alias("cosd"),
    )
    return m.groupBy("label").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.avg("mse"), 6).alias("avg_mse"),
        F.round(F.max("mse"), 6).alias("max_mse"),
        F.round(F.avg("cosd"), 6).alias("avg_cos_drift"),
    )




# ---------------------------------------------------------------------------
# Round 5: heuristic quality curation (Gopher rules, repetition signals,
# staged quality funnel), CCNet-style perplexity bucketing, and the
# leakage-safe train/valid split audit. The reference stops at chunk/embed
# (components/chunkers.py, embedders.py); these are the curation stages a
# 100 TB corpus build runs in front of it (SURVEY §2.9 north-star scope).
# ---------------------------------------------------------------------------

# DuckDB twins of operators/quality.py — change them together.
_DK_GOPHER = r"""gt AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
gc AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_words,
         list_sum(list_transform(t, x -> length(x))) AS word_chars,
         len(list_filter(t, x -> regexp_matches(x, '\p{L}'))) AS alpha_words,
         (CAST(list_contains(t, 'the') AS INT)
          + CAST(list_contains(t, 'and') AS INT)
          + CAST(list_contains(t, 'of') AS INT)
          + CAST(list_contains(t, 'is') AS INT)) AS stop_distinct
  FROM gt
),
g0 AS (
  SELECT doc_id, n_words, stop_distinct,
         CASE WHEN n_words > 0
              THEN word_chars / CAST(n_words AS DOUBLE) ELSE 0.0 END AS mwl,
         CASE WHEN n_words > 0
              THEN alpha_words / CAST(n_words AS DOUBLE) ELSE 0.0 END AS alpha
  FROM gc
),
gflags AS (
  SELECT doc_id, n_words, mwl, alpha, stop_distinct,
         CAST(n_words BETWEEN 50 AND 100000 AS INT) AS pass_words,
         CAST(mwl BETWEEN 3 AND 10 AS INT) AS pass_mean_word_len,
         CAST(alpha >= 0.8 AS INT) AS pass_alpha,
         CAST(stop_distinct >= 1 AS INT) AS pass_stop
  FROM g0
)"""

_DK_REP = r"""rt AS (
  SELECT doc_id, CAST(length(text) AS DOUBLE) AS n_chars,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
rg AS (
  SELECT doc_id, n_chars, 2 AS n, array_to_string(t[i:i+1], ' ') AS gram
  FROM (SELECT doc_id, n_chars, t,
               UNNEST(generate_series(1, len(t) - 1)) AS i
        FROM rt WHERE len(t) >= 2)
  UNION ALL
  SELECT doc_id, n_chars, 3 AS n, array_to_string(t[i:i+2], ' ') AS gram
  FROM (SELECT doc_id, n_chars, t,
               UNNEST(generate_series(1, len(t) - 2)) AS i
        FROM rt WHERE len(t) >= 3)
),
rcnt AS (
  SELECT doc_id, n, gram, count(*) AS c, max(n_chars) AS n_chars
  FROM rg GROUP BY 1, 2, 3
),
rtop AS (
  SELECT doc_id, n, c AS top_c, gram AS top_gram FROM rcnt
  QUALIFY row_number() OVER (PARTITION BY doc_id, n
                             ORDER BY c DESC, gram DESC) = 1
),
rdup AS (
  SELECT doc_id, n,
         sum(CASE WHEN c >= 2 THEN c * length(gram) ELSE 0 END) AS dup_chars,
         max(n_chars) AS n_chars
  FROM rcnt GROUP BY 1, 2
),
rpern AS (
  SELECT d.doc_id, d.n, t.top_c, t.top_gram, d.dup_chars, d.n_chars
  FROM rdup d JOIN rtop t USING (doc_id, n)
),
rdoc0 AS (
  SELECT doc_id,
    max(CASE WHEN n = 2
        THEN round(top_c * length(top_gram) / n_chars, 4) END) AS top2_frac,
    max(CASE WHEN n = 3
        THEN round(top_c * length(top_gram) / n_chars, 4) END) AS top3_frac,
    max(CASE WHEN n = 2
        THEN round(dup_chars / n_chars, 4) END) AS dup2_frac
  FROM rpern GROUP BY 1
),
rdoc AS (
  SELECT b.doc_id, coalesce(top2_frac, 0.0) AS top2_frac,
         coalesce(top3_frac, 0.0) AS top3_frac,
         coalesce(dup2_frac, 0.0) AS dup2_frac
  FROM documents b LEFT JOIN rdoc0 USING (doc_id)
)"""


@register(
    "text_gopher_quality",
    "WITH " + _DK_GOPHER + """
SELECT doc_id, n_words,
       round(mwl, 4) AS mean_word_len,
       round(alpha, 4) AS alpha_word_ratio,
       stop_distinct, pass_words, pass_mean_word_len, pass_alpha, pass_stop,
       pass_words * pass_mean_word_len * pass_alpha * pass_stop
         AS gopher_pass
FROM gflags
""",
    "Gopher document-quality rules (Rae et al. 2021 Appendix A1, the "
    "filter set RedPajama/Dolma reuse): per-doc word-count bounds, "
    "mean-word-length bounds, alphabetic-word ratio, required-stopword "
    "presence, plus per-rule pass flags and the conjunction. Pure "
    "Catalyst narrow projection — no shuffle, codegen'd, "
    "pushdown-friendly (operators/quality.py::gopher_quality_signals; "
    "the flags compare unrounded doubles so the oracle recomputes the "
    "exact same boundary decisions).",
)
def q_text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.quality import gopher_quality_signals

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return gopher_quality_signals(docs)


@register(
    "text_repetition_ratios",
    "WITH " + _DK_REP + """
SELECT doc_id, top2_frac, top3_frac, dup2_frac FROM rdoc
""",
    "Gopher repetition rules: fraction of characters in the most frequent "
    "word 2-/3-gram and in word 2-grams occurring twice or more "
    "(operators/quality.py::repetition_signals; Gopher's n=5..10 "
    "duplicated-gram rule never fires on these short synthetic docs, so "
    "the duplicate rule runs at n=2 where it bites — each occurrence "
    "contributes length(gram) chars, a documented deviation from the "
    "paper's count-each-char-once rule). One explode + one "
    "(doc, n, gram) count shuffle + one per-doc rollup; ties on the top "
    "gram break toward the lexicographically largest gram in both "
    "engines ((count, gram) struct max vs ORDER BY c DESC, gram DESC).",
)
def q_text_repetition_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.quality import repetition_signals

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_signals(docs)


@register(
    "corpus_gopher_funnel",
    "WITH " + _DK_GOPHER + ",\n" + _DK_REP + """,
j AS (
  SELECT g.doc_id, g.pass_words, g.pass_mean_word_len, g.pass_alpha,
         g.pass_stop, r.dup2_frac
  FROM gflags g JOIN rdoc r USING (doc_id)
),
a AS (
  SELECT count(*) AS s_raw,
    count(*) FILTER (WHERE pass_words = 1) AS s_word_count,
    count(*) FILTER (WHERE pass_words = 1 AND pass_mean_word_len = 1)
      AS s_mean_word_len,
    count(*) FILTER (WHERE pass_words = 1 AND pass_mean_word_len = 1
                       AND pass_alpha = 1) AS s_alpha_ratio,
    count(*) FILTER (WHERE pass_words = 1 AND pass_mean_word_len = 1
                       AND pass_alpha = 1 AND pass_stop = 1) AS s_stopwords,
    count(*) FILTER (WHERE pass_words = 1 AND pass_mean_word_len = 1
                       AND pass_alpha = 1 AND pass_stop = 1
                       AND dup2_frac <= 0.30) AS s_repetition
  FROM j
)
SELECT CAST(0 AS INT) AS stage_idx, 'raw' AS stage,
       CAST(s_raw AS BIGINT) AS n_docs,
       round(s_raw / CAST(s_raw AS DOUBLE), 4) AS retention FROM a
UNION ALL SELECT 1, 'word_count', CAST(s_word_count AS BIGINT),
       round(s_word_count / CAST(s_raw AS DOUBLE), 4) FROM a
UNION ALL SELECT 2, 'mean_word_len', CAST(s_mean_word_len AS BIGINT),
       round(s_mean_word_len / CAST(s_raw AS DOUBLE), 4) FROM a
UNION ALL SELECT 3, 'alpha_ratio', CAST(s_alpha_ratio AS BIGINT),
       round(s_alpha_ratio / CAST(s_raw AS DOUBLE), 4) FROM a
UNION ALL SELECT 4, 'stopwords', CAST(s_stopwords AS BIGINT),
       round(s_stopwords / CAST(s_raw AS DOUBLE), 4) FROM a
UNION ALL SELECT 5, 'repetition', CAST(s_repetition AS BIGINT),
       round(s_repetition / CAST(s_raw AS DOUBLE), 4) FROM a
""",
    "Staged quality-attrition report: documents surviving each Gopher "
    "rule applied cumulatively, ending with the dup2<=0.30 repetition "
    "cut — the quality twin of corpus_dedup_funnel "
    "(operators/quality.py::gopher_funnel). Both signal frames join "
    "once on doc_id and collapse to ONE aggregate row fanned out with "
    "stack() — no per-stage rescans of the corpus.",
)
def q_corpus_gopher_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.quality import gopher_funnel

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return gopher_funnel(docs)


@register(
    "corpus_ccnet_buckets",
    "WITH " + _DK_BIGRAM_DOC + """,
r AS (SELECT lang, doc_id, round(lp0, 6) AS lp0r FROM doc),
b AS (
  SELECT lang, doc_id, lp0r,
         ntile(3) OVER (PARTITION BY lang
                        ORDER BY lp0r DESC, doc_id) AS trc
  FROM r
)
SELECT lang,
       CASE trc WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(lp0r), 4) AS avg_lp,
       round(min(lp0r), 4) AS min_lp
FROM b GROUP BY 1, 2
""",
    "CCNet-style quality bucketing (Wenzek et al. 2020): score every "
    "document with the per-language bigram LM "
    "(text_stats.bigram_doc_logprob, the engine's KenLM stand-in), then "
    "split each language into head/middle/tail perplexity terciles — "
    "the pre-filter CCNet/CCNet-descendant corpora ship with. The "
    "per-doc logprob is rounded to 6dp BEFORE the tercile ordering in "
    "both engines so boundary membership never hinges on "
    "last-ulp summation differences; doc_id breaks exact ties. One "
    "bigram diamond + one per-lang window + one tiny rollup.",
)
def q_corpus_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from yaml_pipe_spark.operators.text_stats import bigram_doc_logprob

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "text"
    )
    doc = bigram_doc_logprob(docs).select(
        "lang", "doc_id", F.round("lp0", 6).alias("lp0r")
    )
    w = W.partitionBy("lang").orderBy(
        F.col("lp0r").desc(), F.col("doc_id")
    )
    b = doc.withColumn("trc", F.ntile(3).over(w))
    bucket = (
        F.when(F.col("trc") == 1, F.lit("head"))
        .when(F.col("trc") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return b.groupBy("lang", bucket.alias("bucket")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("lp0r"), 4).alias("avg_lp"),
        F.round(F.min("lp0r"), 4).alias("min_lp"),
    )


@register(
    "corpus_split_leakage_audit",
    f"""
WITH RECURSIVE {_SIMHASH_PAIR_CTES},
p AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
edges AS (
  SELECT id_a AS a, id_b AS b FROM p
  UNION
  SELECT id_b AS a, id_a AS b FROM p
),
reach(n, m) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
),
cc AS (SELECT n AS doc_id, min(m) AS cluster_rep FROM reach GROUP BY n),
labeled AS (
  SELECT d.doc_id, coalesce(cc.cluster_rep, d.doc_id) AS cluster_key
  FROM documents d LEFT JOIN cc USING (doc_id)
),
splits AS (
  SELECT 'by_doc_hash' AS strategy, doc_id,
         {_dk_byte0("CAST(doc_id AS VARCHAR)")} < 0.8 * 256 AS in_train
  FROM labeled
  UNION ALL
  SELECT 'by_cluster_hash' AS strategy, doc_id,
         {_dk_byte0("CAST(cluster_key AS VARCHAR)")} < 0.8 * 256 AS in_train
  FROM labeled
),
counts AS (
  SELECT strategy,
         CAST(count(*) FILTER (WHERE in_train) AS BIGINT) AS n_train,
         CAST(count(*) FILTER (WHERE NOT in_train) AS BIGINT) AS n_valid
  FROM splits GROUP BY 1
),
leaks AS (
  SELECT sa.strategy,
         sum(CASE WHEN sa.in_train <> sb.in_train THEN 1 ELSE 0 END)
           AS leaked
  FROM p
  JOIN splits sa ON sa.doc_id = p.id_a
  JOIN splits sb ON sb.doc_id = p.id_b AND sb.strategy = sa.strategy
  GROUP BY 1
)
SELECT c.strategy, c.n_train, c.n_valid,
       CAST(coalesce(l.leaked, 0) AS BIGINT) AS leaked_pairs
FROM counts c LEFT JOIN leaks l USING (strategy)
""",
    "Leakage-safe train/valid split audit: the same deterministic 80/20 "
    "hash split keyed two ways — by doc_id (naive) and by near-dup "
    "cluster representative (SimHash pairs -> connected components, the "
    "dedup_cluster_resolution machinery) — reporting, for each "
    "strategy, the split sizes and the number of near-duplicate pairs "
    "straddling the boundary. Splitting by cluster key drives "
    "leaked_pairs to zero BY CONSTRUCTION (every member hashes the "
    "same rep), which is why eval decontamination splits by cluster, "
    "never by document (operators/sampling.py::hash_sample_flag is the "
    "shared split primitive). Pair frame and labeled frame are "
    "localCheckpointed once and reused by both strategies.",
)
def q_corpus_split_leakage_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from yaml_pipe_spark.operators.sampling import hash_sample_flag

    docs = load_table(spark, sf_dir, "documents")
    store = _pair_graph_store(spark, sf_dir)
    prs = store.pairs(spark).select("id_a", "id_b")
    cc = store.labels(spark)
    labeled = (
        docs.select("doc_id")
        .join(cc, docs["doc_id"] == cc["node"], "left")
        .select(
            "doc_id",
            F.coalesce("cluster_rep", "doc_id").alias("cluster_key"),
        )
        .localCheckpoint(eager=True)  # consumed by both strategies
    )
    rate = F.lit(0.8)

    def strategy_frame(key_col: str, name: str) -> DataFrame:
        split = labeled.select(
            "doc_id",
            hash_sample_flag(F.col(key_col), rate).alias("in_train"),
        )
        counts = split.agg(
            F.sum(F.col("in_train").cast("long")).alias("n_train"),
            F.sum((~F.col("in_train")).cast("long")).alias("n_valid"),
        )
        leaks = (
            prs.join(
                split.select(
                    F.col("doc_id").alias("id_a"),
                    F.col("in_train").alias("ta"),
                ),
                "id_a",
            )
            .join(
                split.select(
                    F.col("doc_id").alias("id_b"),
                    F.col("in_train").alias("tb"),
                ),
                "id_b",
            )
            .agg(
                F.coalesce(
                    F.sum((F.col("ta") != F.col("tb")).cast("long")),
                    F.lit(0),
                ).alias("leaked_pairs")
            )
        )
        return counts.crossJoin(leaks).select(
            F.lit(name).alias("strategy"), "n_train", "n_valid",
            "leaked_pairs",
        )

    return strategy_frame("doc_id", "by_doc_hash").unionByName(
        strategy_frame("cluster_key", "by_cluster_hash")
    )




@register(
    "text_zipf_fit",
    r"""
WITH wx AS (
  SELECT lang, UNNEST(regexp_extract_all(lower(text), '\p{L}+')) AS word
  FROM documents WHERE lang IS NOT NULL
),
cnt AS (SELECT lang, word, count(*) AS c FROM wx GROUP BY 1, 2),
rk AS (
  SELECT lang, c,
         row_number() OVER (PARTITION BY lang
                            ORDER BY c DESC, word) AS rank
  FROM cnt
),
xy AS (
  SELECT lang, log10(CAST(rank AS DOUBLE)) AS x,
         log10(CAST(c AS DOUBLE)) AS y
  FROM rk
),
m AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM xy GROUP BY 1
)
SELECT lang, n_types,
       round(CASE WHEN n_types * sxx - sx * sx <> 0
                  THEN (n_types * sxy - sx * sy)
                       / (n_types * sxx - sx * sx) END, 4) AS zipf_slope,
       round(CASE WHEN n_types * sxx - sx * sx <> 0
                  THEN (sy - (n_types * sxy - sx * sy)
                             / (n_types * sxx - sx * sx) * sx)
                       / n_types END, 4) AS zipf_intercept
FROM m
""",
    "Zipf's-law fit per language: OLS slope/intercept of log10(frequency) "
    "vs log10(rank) over the full word-frequency table — the corpus-"
    "health audit that flags synthetic or boilerplate-heavy text (natural "
    "language sits near slope -1; word soup flattens). Ranking ties "
    "break on the word string identically in both engines; one "
    "(lang, word) count shuffle + one per-lang window + a tiny moment "
    "rollup, same OLS-from-moments shape as rel_revenue_trend.",
)
def q_text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    t = F.regexp_extract_all(F.lower("text"), F.lit(r"\p{L}+"), F.lit(0))
    words = (
        docs.filter(F.col("lang").isNotNull())
        .select("lang", F.explode(t).alias("word"))
    )
    cnt = words.groupBy("lang", "word").agg(F.count("*").alias("c"))
    rk = cnt.withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("lang").orderBy(F.col("c").desc(), "word")
        ),
    )
    xy = rk.select(
        "lang",
        F.log10(F.col("rank").cast("double")).alias("x"),
        F.log10(F.col("c").cast("double")).alias("y"),
    )
    m = xy.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    denom = F.col("n_types") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (
        F.col("n_types") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / denom
    return m.select(
        "lang",
        "n_types",
        F.round(F.when(denom != 0, slope), 4).alias("zipf_slope"),
        F.round(
            F.when(
                denom != 0,
                (F.col("sy") - slope * F.col("sx")) / F.col("n_types"),
            ),
            4,
        ).alias("zipf_intercept"),
    )


@register(
    "corpus_epoch_schedule",
    r"""
WITH t AS (
  SELECT lang, doc_id,
         len(list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '')) AS n_tok
  FROM documents
),
c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS n_tokens
  FROM t GROUP BY 1
),
w AS (SELECT lang, n_docs, n_tokens,
             sqrt(CAST(n_tokens AS DOUBLE)) AS wt FROM c),
r AS (
  SELECT lang, n_docs, n_tokens,
         round(wt / (SELECT sum(wt) FROM w), 6) AS weight,
         (SELECT sum(n_tokens) FROM c) * 2 AS budget
  FROM w
)
SELECT lang, n_docs, n_tokens, weight,
       CAST(floor(weight * budget) AS BIGINT) AS target_tokens,
       round(floor(weight * budget) / CAST(n_tokens AS DOUBLE), 4)
         AS epochs,
       least(round(floor(weight * budget) / CAST(n_tokens AS DOUBLE), 4),
             4.0) AS epochs_capped
FROM r
""",
    "Epoch/repeat schedule for temperature mixing: per-language token "
    "counts, sqrt-temperature weights (same alpha=0.5 family as "
    "corpus_temperature_mix), a 2x-corpus token budget, and the derived "
    "repeat factor per language with the standard <=4-epoch cap from "
    "data-mixing practice — the accounting a trainer consumes to decide "
    "how many passes of each subset fill the budget. Weight rounded to "
    "6dp before the budget multiply and floor'd to integer tokens so "
    "both engines derive identical schedules.",
)
def q_corpus_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    c = docs.select(
        "lang", F.size(tokens(F.col("text"))).alias("n_tok")
    ).groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )
    tot = c.agg(
        F.sum(F.sqrt(F.col("n_tokens").cast("double"))).alias("swt"),
        (F.sum("n_tokens") * 2).cast("long").alias("budget"),
    )
    r = c.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round(
            F.sqrt(F.col("n_tokens").cast("double")) / F.col("swt"), 6
        ).alias("weight"),
        "budget",
    )
    target = F.floor(F.col("weight") * F.col("budget"))
    epochs = F.round(target / F.col("n_tokens").cast("double"), 4)
    return r.select(
        "lang",
        "n_docs",
        "n_tokens",
        "weight",
        target.cast("long").alias("target_tokens"),
        epochs.alias("epochs"),
        F.least(epochs, F.lit(4.0)).alias("epochs_capped"),
    )


@register(
    "sink_partition_skew_audit",
    """
WITH p AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS est_bytes
  FROM documents GROUP BY 1, 2
),
t AS (SELECT sum(est_bytes) AS total, avg(est_bytes) AS mean_bytes FROM p)
SELECT p.lang, p.source, p.n_docs, p.est_bytes,
       round(p.est_bytes / CAST(t.total AS DOUBLE), 6) AS pct_of_total,
       CAST(p.est_bytes < 0.5 * t.mean_bytes AS INT) AS small_flag
FROM p, t
""",
    "Pre-write layout audit for a dynamic-partition parquet sink: "
    "per-(lang, source) partition sizes (n_chars as the byte proxy), "
    "share of total, and a small-partition flag at half the mean — the "
    "check that catches the small-files problem BEFORE a 100 TB write "
    "fans out into millions of tiny objects (the fix being partition "
    "coalescing or a coarser partition spec, operators/sinks.py). One "
    "tiny two-level rollup + a broadcast scalar join.",
)
def q_sink_partition_skew_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "source", "n_chars"
    )
    p = docs.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("est_bytes"),
    )
    t = p.agg(
        F.sum("est_bytes").alias("total"),
        F.avg("est_bytes").alias("mean_bytes"),
    )
    return p.crossJoin(F.broadcast(t)).select(
        "lang",
        "source",
        "n_docs",
        "est_bytes",
        F.round(
            F.col("est_bytes") / F.col("total").cast("double"), 6
        ).alias("pct_of_total"),
        (F.col("est_bytes") < 0.5 * F.col("mean_bytes"))
        .cast("int")
        .alias("small_flag"),
    )




# ---------------------------------------------------------------------------
# Round 5e: distributed-sketch heavy hitters, threshold calibration,
# dup-mass attribution, IVF cell-balance audit. Registered after the
# round-5 50-slot driver prefix (locally verified at sf0.01+sf0.1);
# fronted in ROUND 6 per tests/test_registry_order.py::ROUND6_QUEUE.
# ---------------------------------------------------------------------------



def _dk_hex4_at(key_hex: str, start: int) -> str:
    digs = [
        f"(strpos('0123456789abcdef', substr({key_hex}, {start + i}, 1)) - 1)"
        for i in range(4)
    ]
    return (
        f"((({digs[0]} * 16 + {digs[1]}) * 16 + {digs[2]}) * 16 + {digs[3]})"
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
    "text_quality_thresholds",
    "WITH " + _DK_REP + r""",
nw AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                              x -> x <> '')) AS DOUBLE) AS n_words
  FROM documents
),
j AS (
  SELECT nw.lang, nw.n_words, r.dup2_frac
  FROM nw JOIN rdoc r USING (doc_id)
)
SELECT lang,
       round(quantile_cont(CAST(round(dup2_frac * 10000) AS BIGINT), 0.5)
             / 10000.0, 6) AS p50_dup2,
       round(quantile_cont(CAST(round(dup2_frac * 10000) AS BIGINT), 0.9)
             / 10000.0, 6) AS p90_dup2,
       round(quantile_cont(n_words, 0.5), 4) AS p50_words,
       round(quantile_cont(n_words, 0.9), 4) AS p90_words
FROM j GROUP BY lang
""",
    "Quality-threshold calibration: per-language exact interpolated "
    "percentiles of the repetition signal and document length — the "
    "data-driven grounding for the funnel's cut points (pick the p90 of "
    "dup2_frac instead of guessing 0.30). Same percentile "
    "array-of-fractions buffer as rel_percentiles. The dup2 percentile "
    "interpolates over the EXACT integer domain (x10000 of the "
    "4dp-rounded signal) because midpoints of adjacent integers are "
    "exactly representable: with double-domain interpolation an "
    "even-count group can land on a half-point the two engines round "
    "apart (the sf0.1 sweep caught exactly that).",
)
def q_text_quality_thresholds(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from yaml_pipe_spark.functions.text import tokens
    from yaml_pipe_spark.operators.quality import repetition_signals

    docs = load_table(spark, sf_dir, "documents")
    rep = repetition_signals(docs.select("doc_id", "text")).select(
        "doc_id", "dup2_frac"
    )
    nw = docs.select(
        "doc_id",
        "lang",
        F.size(tokens(F.col("text"))).cast("double").alias("n_words"),
    )
    j = nw.join(rep, "doc_id")
    out = j.groupBy("lang").agg(
        F.percentile(
            F.round(F.col("dup2_frac") * 10000).cast("long"),
            F.array(F.lit(0.5), F.lit(0.9)),
        ).alias("__d"),
        F.percentile(
            "n_words", F.array(F.lit(0.5), F.lit(0.9))
        ).alias("__w"),
    )
    return out.select(
        "lang",
        F.round(F.element_at("__d", 1) / 10000.0, 6).alias("p50_dup2"),
        F.round(F.element_at("__d", 2) / 10000.0, 6).alias("p90_dup2"),
        F.round(F.element_at("__w", 1), 4).alias("p50_words"),
        F.round(F.element_at("__w", 2), 4).alias("p90_words"),
    )


@register(
    "corpus_dup_rate_by_source",
    f"""
WITH p AS ({MINHASH_ORACLE}),
ds AS (SELECT doc_id, source FROM documents),
j AS (
  SELECT least(a.source, b.source) AS src_a,
         greatest(a.source, b.source) AS src_b
  FROM p
  JOIN ds a ON a.doc_id = p.id_a
  JOIN ds b ON b.doc_id = p.id_b
)
SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs
FROM j GROUP BY 1, 2
""",
    "Near-dup mass attribution: verified MinHash pairs rolled up by "
    "normalized source pair (least/greatest, so intra-source dup shows "
    "on the diagonal) — the corpus report that says WHERE duplication "
    "comes from, which decides crawl-source pruning before anyone "
    "spends a 100 TB dedup pass. The pair frame is the standard banded "
    "join; source attachment is two broadcast-size dimension joins.",
)
def q_corpus_dup_rate_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        _minhash_overlap_store(spark, sf_dir)
        .jaccard_pairs(spark, 0.8)
        .select("id_a", "id_b")
    )
    ds = docs.select("doc_id", "source")
    j = (
        pairs.join(
            ds.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("sa")
            ),
            "id_a",
        )
        .join(
            ds.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("sb")
            ),
            "id_b",
        )
        .select(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
        )
    )
    return j.groupBy("src_a", "src_b").agg(
        F.count("*").cast("long").alias("n_pairs")
    )


@register(
    "emb_ivf_cell_balance",
    f"""
WITH c AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
),
a AS (
  SELECT e.vec_id, c.cid,
         round({_dk_cos('e.embedding', 'c.cv')}, 6) AS s
  FROM embeddings e, c
),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY s DESC, cid) AS rn
    FROM a
  ) WHERE rn = 1
),
sz AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_vectors FROM asg GROUP BY 1),
t AS (SELECT avg(n_vectors) AS mean_n, sum(n_vectors) AS total FROM sz)
SELECT sz.cid, sz.n_vectors,
       round(sz.n_vectors / CAST(t.total AS DOUBLE), 6) AS share,
       round(sz.n_vectors / t.mean_n, 4) AS imbalance,
       CAST(sz.n_vectors > 2 * t.mean_n AS INT) AS skewed
FROM sz, t
""",
    "IVF cell-balance audit: per-cell population, share, and imbalance "
    "factor vs the mean cell, with a 2x-mean skew flag — the "
    "partition-health check for the IVF/IVF-PQ serving layout (a hot "
    "cell is a hot partition: probe latency and shuffle skew both "
    "follow it; the fix is re-clustering or cell splitting). Same "
    "pinned-centroid assignment as ann_ivf_topk so the oracle "
    "recomputes the argmax with the identical (score, cid) tiebreak.",
)
def q_emb_ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.similarity import ivf_assign

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    asg = ivf_assign(emb, centroids)
    sz = asg.groupBy("cid").agg(
        F.count("*").cast("long").alias("n_vectors")
    )
    t = sz.agg(
        F.avg("n_vectors").alias("mean_n"),
        F.sum("n_vectors").alias("total"),
    )
    return sz.crossJoin(F.broadcast(t)).select(
        "cid",
        "n_vectors",
        F.round(
            F.col("n_vectors") / F.col("total").cast("double"), 6
        ).alias("share"),
        F.round(F.col("n_vectors") / F.col("mean_n"), 4).alias("imbalance"),
        (F.col("n_vectors") > 2 * F.col("mean_n"))
        .cast("int")
        .alias("skewed"),
    )




@register(
    "s1_parse_warc",
    _PARSE_ROUNDTRIP_ORACLE,
    "S1 parse seam for .warc.gz, ORACLE-CHECKED end to end: a complete "
    "gzipped WARC file per doc (warcinfo record + a response record whose "
    "payload is a full HTTP message carrying the text as its UTF-8 body, "
    "ISO 28500 framing with exact Content-Length accounting), the real "
    "stdlib extractor (sources/warc.py: gzip sniff, record walk, "
    "non-response skip, HTTP header strip) pulls the text back out, and "
    "the normalization must reproduce the elements of the original text "
    "exactly — the Common Crawl ingest format, so a framing or "
    "byte-accounting bug here is a 100 TB ingest bug.",
)
def q_s1_parse_warc(spark: SparkSession, sf_dir: str) -> DataFrame:
    import gzip
    from typing import Iterator

    import pandas as pd

    from yaml_pipe_spark.sources.parsers import parse_warc

    def build(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        def rec(rtype: bytes, payload: bytes, extra: bytes = b"") -> bytes:
            return (
                b"WARC/1.0\r\nWARC-Type: " + rtype + b"\r\n" + extra
                + b"Content-Length: " + str(len(payload)).encode()
                + b"\r\n\r\n" + payload + b"\r\n\r\n"
            )

        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                body = (text or "").encode("utf-8")
                http = (
                    b"HTTP/1.1 200 OK\r\n"
                    b"Content-Type: text/plain; charset=utf-8\r\n\r\n"
                    + body
                )
                raw = rec(b"warcinfo", b"software: yaml-pipe-spark\r\n") + rec(
                    b"response",
                    http,
                    b"WARC-Target-URI: http://corpus/doc/"
                    + str(int(doc_id)).encode() + b"\r\n",
                )
                payloads.append(gzip.compress(raw, mtime=0))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "lang": pdf["lang"],
                 "raw": payloads}
            )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    built = docs.mapInPandas(build, "doc_id long, lang string, raw binary")
    return _parse_rollup(built.withColumn("parsed", parse_warc(F.col("raw"))))


@register(
    "s1_parse_tar",
    _PARSE_ROUNDTRIP_ORACLE,
    "S1 parse seam for .tar, ORACLE-CHECKED end to end: a deterministic "
    "tar archive per doc (pinned mtime/uid, a text member carrying the "
    "document plus a json sidecar the extractor must skip — the "
    "WebDataset sample layout), the real stdlib extractor "
    "(sources/tar.py: tarfile walk, name-ordered text members) pulls the "
    "text back out, and the normalization must reproduce the elements of "
    "the original text exactly.",
)
def q_s1_parse_tar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import pandas as pd

    from yaml_pipe_spark.sources.parsers import parse_tar
    from yaml_pipe_spark.sources.tar import build_tar

    def build(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            payloads = [
                build_tar(
                    {
                        f"{int(doc_id):08d}.txt": (text or "").encode(
                            "utf-8"
                        ),
                        f"{int(doc_id):08d}.json": b'{"source": "tar"}',
                    }
                )
                for doc_id, text in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "lang": pdf["lang"],
                 "raw": payloads}
            )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    built = docs.mapInPandas(build, "doc_id long, lang string, raw binary")
    return _parse_rollup(built.withColumn("parsed", parse_tar(F.col("raw"))))




@register(
    "sample_bottom_k_sketch",
    f"""
WITH h AS (
  SELECT DISTINCT md5(text) AS hx FROM documents
),
f AS (
  SELECT hx,
         ({_dk_hex4_at('hx', 1)} * 65536.0 + {_dk_hex4_at('hx', 5)})
           / 4294967296.0 AS frac
  FROM (SELECT md5(hx) AS hx FROM h)
),
rk AS (
  SELECT frac, row_number() OVER (ORDER BY frac, hx) AS rn FROM f
),
kth AS (SELECT frac AS kth FROM rk WHERE rn = 32),
ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM h)
SELECT CAST(32 AS BIGINT) AS k,
       round(kth.kth, 6) AS kth_min_frac,
       CAST(round(31 / kth.kth) AS BIGINT) AS est_distinct,
       ex.exact_distinct,
       round(abs(round(31 / kth.kth) - ex.exact_distinct)
             / CAST(ex.exact_distinct AS DOUBLE), 4) AS rel_error,
       CAST(abs(round(31 / kth.kth) - ex.exact_distinct)
            <= 0.5 * ex.exact_distinct AS INT) AS bound_ok
FROM kth, ex
""",
    "Bottom-k (KMV) distinct-count sketch with a measured error: hash "
    "every distinct document content to a uniform fraction (md5-derived, "
    "the cross-engine hash family), keep the k=32 smallest, estimate "
    "distinct = (k-1)/kth_min — the mergeable sketch behind "
    "theta/KMV engines, validated against the exact count in the same "
    "query (fourth sketch gate after HLL, GK, and CMS). Scale shape: "
    "the k smallest hashes come from a TakeOrdered-style total order "
    "over DISTINCT hashes (cardinality of the sketch input is the "
    "distinct set, already one hash-shuffle); two sketches merge by "
    "keeping the k smallest of the union — the property that lets "
    "every partition sketch independently.",
)
def q_sample_bottom_k_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from yaml_pipe_spark.functions.hashing import hex_pair_to_int

    k = 32
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(F.md5("text").alias("hx")).distinct()
    hh = h.select(F.md5("hx").alias("hx"))
    frac = (
        (
            (
                (hex_pair_to_int(F.col("hx"), 1) * 256
                 + hex_pair_to_int(F.col("hx"), 3)) * 256
                + hex_pair_to_int(F.col("hx"), 5)
            ) * 256
            + hex_pair_to_int(F.col("hx"), 7)
        )
        / F.lit(4294967296.0)
    )
    f = hh.select(F.col("hx"), frac.alias("frac"))
    # k smallest via TakeOrderedAndProject (per-partition heap, k rows to
    # the driver side of the exchange) — NEVER a global row_number window,
    # which would serialize the whole distinct set on one reducer. With
    # fewer than k distinct hashes the sketch is undefined: emit ZERO
    # rows, exactly like the oracle's row_number-=-k filter (a max over
    # the short set would grossly overestimate instead of degrading).
    kth = (
        f.orderBy("frac", "hx")
        .limit(k)
        .agg(F.max("frac").alias("frac"), F.count("*").alias("__n"))
        .filter(F.col("__n") == k)
        .drop("__n")
    )
    ex = h.agg(F.count("*").cast("long").alias("exact_distinct"))
    est = F.round(F.lit(k - 1) / F.col("frac"))
    return kth.crossJoin(F.broadcast(ex)).select(
        F.lit(k).cast("long").alias("k"),
        F.round("frac", 6).alias("kth_min_frac"),
        est.cast("long").alias("est_distinct"),
        "exact_distinct",
        F.round(
            F.abs(est - F.col("exact_distinct"))
            / F.col("exact_distinct").cast("double"),
            4,
        ).alias("rel_error"),
        (
            F.abs(est - F.col("exact_distinct"))
            <= 0.5 * F.col("exact_distinct")
        )
        .cast("int")
        .alias("bound_ok"),
    )


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


@register(
    "text_bigram_holdout_ppl",
    r"""
WITH toks AS (
  SELECT lang, doc_id, regexp_extract_all(lower(text), '\p{L}+') AS t,
""" + f"""
         {_dk_byte0("CAST(doc_id AS VARCHAR)")} < 0.8 * 256 AS in_train
""" + r"""
  FROM documents
),
bg0 AS (
  SELECT lang, doc_id, in_train,
         UNNEST(generate_series(1, len(t) - 1)) AS i, t
  FROM toks WHERE len(t) >= 2
),
bgs AS (SELECT lang, doc_id, in_train, t[i] AS prev, t[i+1] AS cur
        FROM bg0),
lm AS (
  SELECT lang, prev, cur, count(*) AS c_bg
  FROM bgs WHERE in_train GROUP BY 1, 2, 3
),
pv AS (SELECT lang, prev, sum(c_bg) AS c_prev FROM lm GROUP BY 1, 2),
vocab AS (
  SELECT lang, CAST(count(DISTINCT cur) AS BIGINT) AS v
  FROM bgs WHERE in_train GROUP BY 1
),
vd AS (
  SELECT b.lang, b.doc_id, b.prev, b.cur, count(*) AS c_dt
  FROM bgs b WHERE NOT in_train GROUP BY 1, 2, 3, 4
),
scored AS (
  SELECT vd.lang, vd.doc_id, vd.c_dt,
         log10((coalesce(lm.c_bg, 0) + 1.0)
               / (coalesce(pv.c_prev, 0) + vocab.v)) AS lp
  FROM vd
  JOIN vocab ON vd.lang = vocab.lang
  LEFT JOIN pv ON vd.lang = pv.lang AND vd.prev = pv.prev
  LEFT JOIN lm ON vd.lang = lm.lang AND vd.prev = lm.prev
              AND vd.cur = lm.cur
),
doc AS (
  SELECT lang, doc_id, sum(c_dt * lp) / sum(c_dt) AS lp0
  FROM scored GROUP BY 1, 2
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_valid_docs,
       round(avg(lp0), 4) AS avg_logprob,
       round(min(lp0), 4) AS min_logprob
FROM doc GROUP BY lang
""",
    "Held-out bigram perplexity with Laplace smoothing: the LM trains "
    "ONLY on the deterministic 80% hash split and scores only the 20% "
    "valid docs, P(cur|prev) = (c+1)/(c_prev+V) with V = the train "
    "vocabulary — the methodologically honest version of "
    "text_bigram_logprob/corpus_ccnet_buckets, whose self-trained "
    "scores can never see an unseen bigram. Laplace keeps every "
    "probability strictly positive and deterministic (integer counts "
    "both sides of the division), so unseen bigrams and even unseen "
    "prev-words score exactly 1/(0+V) identically in both engines. "
    "Plan: the train LM and valid doc counts derive from ONE (lang, "
    "doc, bigram) lineage forked by a narrow hash flag; vocab and "
    "marginals are vocabulary-sized; the doc-level stream joins once "
    "on the full key.",
)
def q_text_bigram_holdout_ppl(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from yaml_pipe_spark.operators.sampling import hash_sample_flag

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "text"
    )
    t = F.regexp_extract_all(F.lower("text"), F.lit(r"\p{L}+"), F.lit(0))
    base = docs.select(
        "lang",
        "doc_id",
        t.alias("t"),
        hash_sample_flag(F.col("doc_id"), F.lit(0.8)).alias("in_train"),
    ).filter(F.size("t") >= 2)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.struct(
            F.get(F.col("t"), i - 1).alias("prev"),
            F.get(F.col("t"), i).alias("cur"),
        ),
    )
    bgs = (
        base.select(
            "lang", "doc_id", "in_train", F.explode(grams).alias("g")
        )
        .select(
            "lang", "doc_id", "in_train",
            F.col("g.prev"), F.col("g.cur"),
        )
        .filter(
            F.col("lang").isNotNull()
            & F.col("prev").isNotNull()
            & F.col("cur").isNotNull()
        )
    )
    train = bgs.filter(F.col("in_train"))
    lm = train.groupBy("lang", "prev", "cur").agg(
        F.count("*").alias("c_bg")
    )
    pv = lm.groupBy("lang", "prev").agg(F.sum("c_bg").alias("c_prev"))
    vocab = train.groupBy("lang").agg(
        F.countDistinct("cur").cast("long").alias("v")
    )
    vd = (
        bgs.filter(~F.col("in_train"))
        .groupBy("lang", "doc_id", "prev", "cur")
        .agg(F.count("*").alias("c_dt"))
    )
    scored = (
        vd.join(F.broadcast(vocab), "lang")
        .join(pv, ["lang", "prev"], "left")
        .join(lm, ["lang", "prev", "cur"], "left")
        .select(
            "lang",
            "doc_id",
            "c_dt",
            F.log10(
                (F.coalesce(F.col("c_bg"), F.lit(0)) + 1.0)
                / (F.coalesce(F.col("c_prev"), F.lit(0)) + F.col("v"))
            ).alias("lp"),
        )
    )
    doc = scored.groupBy("lang", "doc_id").agg(
        (F.sum(F.col("c_dt") * F.col("lp")) / F.sum("c_dt")).alias("lp0")
    )
    return doc.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_valid_docs"),
        F.round(F.avg("lp0"), 4).alias("avg_logprob"),
        F.round(F.min("lp0"), 4).alias("min_logprob"),
    )




ANN_IVFPQ_RESIDUAL_ORACLE = f"""
WITH c AS (
  SELECT vec_id - 20 AS cid, embedding AS cv
  FROM embeddings WHERE vec_id >= 20 AND vec_id < 28
),
x0 AS (
  SELECT vec_id, embedding AS xv FROM embeddings WHERE vec_id >= 20
),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT x0.vec_id, c.cid,
           row_number() OVER (PARTITION BY x0.vec_id
             ORDER BY round({_dk_cos('x0.xv', 'c.cv')}, 6) DESC, c.cid) AS rn
    FROM x0, c
  ) WHERE rn = 1
),
x AS (
  SELECT x0.vec_id, x0.xv, asg.cid,
         list_transform(generate_series(1, len(x0.xv)),
           i -> least(greatest(
             CAST(floor((CAST(x0.xv[i] AS DOUBLE)
                         - CAST(c.cv[i] AS DOUBLE)) * 8) AS BIGINT) + 2,
             CAST(0 AS BIGINT)), CAST(3 AS BIGINT))) AS code
  FROM x0 JOIN asg ON asg.vec_id = x0.vec_id
          JOIN c ON c.cid = asg.cid
),
q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20
),
probes AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           row_number() OVER (PARTITION BY q.qid
             ORDER BY round({_dk_cos('q.qv', 'c.cv')}, 6) DESC, c.cid) AS rn
    FROM q, c
  ) WHERE rn <= 2
),
adc AS (
  SELECT p.qid, x.vec_id,
         round(list_sum(list_transform(
           list_transform(generate_series(1, len(q.qv)),
             i -> (CAST(q.qv[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))
                  - (CAST(x.code[i] AS DOUBLE) - 1.5) / 8),
           y -> y * y)), 6) AS adc_r
  FROM probes p
  JOIN c ON c.cid = p.cid
  JOIN x ON x.cid = p.cid
  JOIN q ON q.qid = p.qid
),
topm AS (
  SELECT qid, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY adc_r, vec_id) AS ar
    FROM adc
  ) WHERE ar <= 20
),
rer AS (
  SELECT t.qid, t.vec_id, round({_dk_cos('x.xv', 'q.qv')}, 6) AS score
  FROM topm t
  JOIN x ON x.vec_id = t.vec_id
  JOIN q ON q.qid = t.qid
),
final AS (
  SELECT qid, vec_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, vec_id) AS rank
  FROM rer
),
exact AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, x.vec_id,
           row_number() OVER (PARTITION BY q.qid
             ORDER BY round({_dk_cos('x.xv', 'q.qv')}, 6) DESC, x.vec_id)
             AS rn
    FROM x, q
  ) WHERE rn <= 5
)
SELECT f.qid, CAST(f.rank AS BIGINT) AS rank, f.vec_id, f.score,
       CAST(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS hit
FROM final f
LEFT JOIN exact e ON e.qid = f.qid AND e.vec_id = f.vec_id
WHERE f.rank <= 5
"""


@register(
    "ann_ivfpq_residual_topk",
    ANN_IVFPQ_RESIDUAL_ORACLE,
    "IVF-PQ with RESIDUAL quantization "
    "(similarity.ivfpq_residual_topk) — the faithful production layout "
    "(Jégou et al. 2011): codes quantize v - centroid(cell), queries "
    "compare their per-cell residual against the reconstructions. The "
    "residual codebook step is MEASURED, not assumed: the testbed's "
    "residual range is wider than raw (pinned-vector centroids, |r| "
    "p90 0.26 vs 0.21), yet the range-matched wider step ranked WORSE "
    "(hit 0.24 vs 0.32 at sf0.1) — clipping tails preserves ADC "
    "ordering better, so the residual quantizer keeps scale=8 (see "
    "similarity.sq2_residual_codes). Same cost tiers and join shape as "
    "ann_ivfpq_topk (the comparison pair); `hit` marks exact-top-5 "
    "membership so both variants' retrieval quality is measured side "
    "by side in CORRECTNESS.",
)
def q_ann_ivfpq_residual_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    from yaml_pipe_spark.functions.vectors import cosine
    from yaml_pipe_spark.operators.similarity import ivfpq_residual_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corp = emb.filter(F.col("vec_id") >= 20).select("vec_id", "embedding")
    cents = emb.filter(
        (F.col("vec_id") >= 20) & (F.col("vec_id") < 28)
    ).select(
        (F.col("vec_id") - 20).alias("cid"), F.col("embedding").alias("cv")
    )
    final = ivfpq_residual_topk(q, corp, cents, k=5, nprobe=2, rerank_m=20)
    exact = (
        corp.join(F.broadcast(q), how="cross")
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("__s"),
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.desc("__s"), "vec_id")
            ),
        )
        .filter(F.col("__rn") <= 5)
        .select("qid", "vec_id", F.lit(1).alias("__hit"))
    )
    return final.join(exact, ["qid", "vec_id"], "left").select(
        "qid",
        "rank",
        "vec_id",
        "score",
        F.coalesce(F.col("__hit"), F.lit(0)).cast("long").alias("hit"),
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


# Deterministic synthetic raw URL per document (the documents table has no
# URL column; same derivation trick as media_from_documents): three raw
# spellings of the same logical URL — www.+mixed-case host, host:443, plain
# host — plus tracking params in two orders and an occasional fragment /
# trailing slash, so canonicalization has real work to do and collisions are
# guaranteed (host = id%5, page = id%7, id-param = id%3 -> every 105 ids
# share a canonical URL).
_URL_EXPR = """
concat(
  'https://',
  CASE WHEN doc_id % 3 = 0 THEN concat('www.SITE', CAST(doc_id % 5 AS STRING), '.example.com')
       WHEN doc_id % 3 = 1 THEN concat('site', CAST(doc_id % 5 AS STRING), '.EXAMPLE.com:443')
       ELSE concat('site', CAST(doc_id % 5 AS STRING), '.example.com') END,
  '/docs/page-', CAST(doc_id % 7 AS STRING),
  CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END,
  CASE WHEN doc_id % 2 = 0
       THEN concat('?utm_source=feed&id=', CAST(doc_id % 3 AS STRING))
       ELSE concat('?id=', CAST(doc_id % 3 AS STRING), '&utm_campaign=x') END,
  CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END
)
"""

_DK_URL_EXPR = _URL_EXPR.replace("AS STRING", "AS VARCHAR")


@register(
    "corpus_url_canonical_dedup",
    f"""
WITH raw AS (SELECT doc_id, {_DK_URL_EXPR} AS url FROM documents),
parts AS (
  SELECT doc_id, url,
         regexp_replace(lower(regexp_extract(url, '^[a-z]+://([^/?#:]+)', 1)),
                        '^www\\.', '') AS host,
         regexp_replace(regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1),
                        '/$', '') AS path,
         coalesce(regexp_extract(url, '\\?([^#]*)', 1), '') AS q
  FROM raw
),
canon AS (
  SELECT doc_id, host,
         concat('https://', host, path,
                CASE WHEN cq = '' THEN '' ELSE concat('?', cq) END) AS curl
  FROM (
    SELECT doc_id, host, path,
           array_to_string(list_sort(list_filter(string_split(q, '&'),
             p -> p <> '' AND NOT regexp_matches(p,
                    '^(utm_[a-z]+|fbclid|gclid|ref)='))), '&') AS cq
    FROM parts
  )
)
SELECT host,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT curl) AS BIGINT) AS n_canonical,
       CAST(count(*) - count(DISTINCT curl) AS BIGINT) AS n_url_dups,
       round((count(*) - count(DISTINCT curl)) * 1.0 / count(*), 4)
         AS dup_rate,
       min(curl) AS sample_canonical
FROM canon GROUP BY host
""",
    "URL canonicalization + URL-level dedup (functions/urls.py::"
    "canonicalize_url) — the crawl-curation step that runs BEFORE any "
    "content dedup: scheme/host lowercased, www. and port stripped, "
    "fragment dropped, utm_*/fbclid/gclid/ref tracking params removed, "
    "surviving params sorted, trailing slash stripped. Three raw "
    "spellings of each logical URL (www+mixed case, :443, plain; two "
    "param orders; fragments) are derived deterministically per doc_id, "
    "and the per-host rollup reports how much of the fetch list "
    "collapses (n_url_dups / dup_rate) — the fetch-budget decision "
    "input. Pure Catalyst (parse_url + regexp/array ops in codegen, no "
    "UDF): a narrow projection plus one host-keyed shuffle; the oracle "
    "re-implements the parse with regexps and recomputes every "
    "canonical form.",
)
def q_corpus_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.functions.urls import canonical_host, canonicalize_url

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_URL_EXPR).alias("url")
    )
    canon = docs.select(
        canonical_host(F.col("url")).alias("host"),
        canonicalize_url(F.col("url")).alias("curl"),
    )
    return canon.groupBy("host").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("curl").cast("long").alias("n_canonical"),
        (F.count("*") - F.countDistinct("curl")).cast("long").alias(
            "n_url_dups"
        ),
        F.round(
            (F.count("*") - F.countDistinct("curl")) / F.count("*"), 4
        ).alias("dup_rate"),
        F.min("curl").alias("sample_canonical"),
    )


# Deterministic encoding-damage injection for the scrub query: each clause
# appends a distinct anomaly class to a doc_id-keyed slice of the corpus
# (clauses stack for ids hitting several moduli). The suffix literals are
# Python constants so the Spark expression and the DuckDB oracle embed
# byte-identical UTF-8.
_ENC_SUFFIXES = (
    (13, " cafÃ© menu"),       # mojibake 'Ã©' (é double-encoded)
    (17, " donâ€™t miss"),  # mojibake 'â€™' (cp1252 ’)
    (19, " data�loss"),             # U+FFFD replacement char
    (23, " price 100"),             # NBSP
    (29, " bellring"),             # C0 control (BEL)
)


def _enc_concat() -> str:
    parts = ["text"]
    for mod, suffix in _ENC_SUFFIXES:
        lit = suffix.replace("'", "''")
        parts.append(
            f"CASE WHEN doc_id % {mod} = 0 THEN '{lit}' ELSE '' END"
        )
    return "concat(" + ", ".join(parts) + ")"


@register(
    "text_encoding_scrub",
    f"""
WITH damaged AS (SELECT doc_id, {_enc_concat()} AS text FROM documents),
m AS (
  SELECT doc_id,
         CAST((length(text) - length(replace(text, 'Ã©', ''))) / 2
            + (length(text) - length(replace(text, 'Ã¤', ''))) / 2
            + (length(text) - length(replace(text, 'â€™', ''))) / 3
           AS BIGINT) AS n_mojibake,
         CAST(length(text) - length(replace(text, '�', ''))
           AS BIGINT) AS n_replacement,
         CAST(length(text) - length(replace(text, ' ', ''))
           AS BIGINT) AS n_nbsp,
         CAST(length(regexp_replace(text,
              '[^\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'))
           AS BIGINT) AS n_control,
         sha256(regexp_replace(
           replace(replace(replace(replace(replace(text,
             'Ã©', 'é'), 'Ã¤', 'ä'), 'â€™', '’'),
             ' ', ' '), '�', ''),
           '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'))
           AS cleaned_hash
  FROM damaged
)
SELECT doc_id, n_mojibake, n_replacement, n_nbsp, n_control, cleaned_hash
FROM m
WHERE n_mojibake > 0 OR n_replacement > 0 OR n_nbsp > 0 OR n_control > 0
""",
    "Encoding-anomaly detect + repair (operators/quality.py::"
    "encoding_anomaly_scrub) — the ingest-hygiene pass every crawl corpus "
    "needs: mojibake from the classic UTF-8-as-Latin-1 double-encode "
    "repaired via a pinned auditable map (the ftfy core trick), U+FFFD "
    "replacement chars dropped (bytes already lost), NBSP normalized, "
    "C0 controls stripped. Five anomaly classes are injected "
    "deterministically by doc_id modulus, and the per-doc report pins "
    "counts per class AND the sha256 of the repaired text, so the oracle "
    "re-runs the whole repair under the same pinned fix order. Pure "
    "Catalyst fixed-string replaces + one char-class regexp in codegen — "
    "narrow projection, no shuffle, no UDF.",
)
def q_text_encoding_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.quality import encoding_anomaly_scrub

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_enc_concat()).alias("text")
    )
    return encoding_anomaly_scrub(docs)


@register(
    "sql_udtf_chunk",
    """
WITH base AS (
  SELECT doc_id, text FROM documents
  WHERE length(trim(text, e' \\n\\r\\t')) > 0 AND doc_id % 7 = 0
),
starts AS (
  SELECT doc_id, text,
         UNNEST(generate_series(1, length(text), 48)) AS s
  FROM base
)
SELECT doc_id,
       CAST((s - 1) / 48 + 1 AS BIGINT) AS chunk_index,
       substr(text, s, 64) AS chunk
FROM starts
""",
    "Python UDTF registration surface (functions/udtfs.py, closing the "
    "SURVEY §2.9 'UDTF registration' gap): the fixed-window chunker "
    "registered as a named SQL table function and invoked via LATERAL "
    "from spark.sql — the reference's hardcoded chunk expansion made a "
    "first-class, composable table function. Arrow-batched (useArrow); "
    "semantics mirror operators/chunkers.py::fixed_window_chunks exactly, "
    "so the fixed-window DuckDB twin oracles the registered surface end "
    "to end. Documented slow path: anything Catalyst-expressible stays "
    "Catalyst (the production chunkers are plan-asserted UDF-free); this "
    "surface is for expansions that genuinely need Python.",
)
def q_sql_udtf_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from yaml_pipe_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    path = os.path.join(sf_dir, "documents.parquet")
    spark.read.parquet(path).createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_index, c.chunk
        FROM __udtf_docs d,
        LATERAL fixed_window_chunks(d.text, 64, 16) c
        WHERE d.doc_id % 7 = 0
        """
    )


@register(
    "stream_ann_serve",
    ANN_INDEX_PERSISTED_ORACLE,
    "The ANN production loop closed end to end (operators/ann_index.py::"
    "serve_query_stream): the IVF-PQ index is built ONCE into the "
    "persisted store, then the queries arrive as a file STREAM and each "
    "micro-batch runs the identical three-tier serve (broadcast probes, "
    "dynamic-partition-pruned 2-bit ADC scan, broadcast top-m re-rank) "
    "through foreachBatch, landing in a content-keyed dynamic-overwrite "
    "results table. One drained batch equals the batch serve exactly, so "
    "the oracle is the persisted-index oracle unchanged; replay "
    "idempotency and multi-batch equivalence are unit-tested in "
    "tests/test_ann_index.py.",
)
def q_stream_ann_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from yaml_pipe_spark.operators.ann_index import (
        IvfPqIndexStore,
        serve_query_stream,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    corp = emb.filter(F.col("vec_id") >= 20).select("vec_id", "embedding")
    cents = emb.filter(
        (F.col("vec_id") >= 20) & (F.col("vec_id") < 28)
    ).select(
        (F.col("vec_id") - 20).alias("cid"), F.col("embedding").alias("cv")
    )
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    store = IvfPqIndexStore(
        os.path.join("spark-warehouse", f"ann_ivfpq_index_{sf_name}")
    )
    store.build_if_stale(corp, cents)
    base = os.path.join("spark-warehouse", f"stream_ann_serve_{sf_name}")
    shutil.rmtree(base, ignore_errors=True)  # fresh drain every invocation
    q.coalesce(1).write.parquet(os.path.join(base, "queries"))
    serve_query_stream(
        spark,
        store,
        os.path.join(base, "queries"),
        os.path.join(base, "results"),
        os.path.join(base, "ckpt"),
    )
    return spark.read.parquet(os.path.join(base, "results")).select(
        "qid", "rank", "vec_id", "score"
    )


@register(
    "quality_score_calibration",
    "WITH " + _DK_GOPHER + """,
scored AS (
  SELECT doc_id,
         round(0.5 * round(alpha, 4)
               + 0.3 * least(n_words, 100) / 100.0
               + 0.2 * least(stop_distinct, 5) / 5.0, 6) AS score,
         pass_words * pass_mean_word_len * pass_alpha * pass_stop AS truth
  FROM gflags
),
taus(tau) AS (VALUES (0.3), (0.5), (0.6), (0.7), (0.85)),
agg AS (
  SELECT t.tau,
         CAST(sum(CASE WHEN s.score >= t.tau THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pred,
         CAST(sum(CASE WHEN s.score >= t.tau AND s.truth = 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(s.truth) AS BIGINT) AS n_pos,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM scored s CROSS JOIN taus t GROUP BY t.tau
),
pr AS (
  -- integer ratios, floor-quantized to a 1e-4 grid held as exact small
  -- integers (round-10 hazard sweep): tp/n can sit exactly on a 4dp
  -- round tie; floor of the identical double has none
  SELECT tau, n_pred, tp, n_pos, n_docs,
         CASE WHEN n_pred = 0 THEN 0.0
              ELSE floor(CAST(tp AS DOUBLE) * 10000 / n_pred) END AS p4,
         CASE WHEN n_pos = 0 THEN 0.0
              ELSE floor(CAST(tp AS DOUBLE) * 10000 / n_pos) END AS r4
  FROM agg
)
SELECT tau, n_pred, tp, n_pos, n_docs,
       p4 / 10000 AS precision,
       r4 / 10000 AS recall,
       -- f1 over the EXACT quantized grid integers: 2*p4*r4 <= 2e8 is
       -- exact in double, so the floor is engine-identical
       CASE WHEN p4 + r4 = 0 THEN 0.0
            ELSE floor(2 * p4 * r4 / (p4 + r4)) / 10000 END AS f1
FROM pr
""",
    "Quality-score calibration curve — the measurement that gates "
    "replacing the Gopher RULE CONJUNCTION with a cheap continuous "
    "score (the classifier-distillation step every curation pipeline "
    "eventually takes): a pinned composite score (alpha ratio + clamped "
    "word count + clamped stopword count) is thresholded at five "
    "operating points and scored against the full rule conjunction as "
    "pseudo-truth, reporting n_pred/tp/precision/recall/f1 per "
    "threshold. f1 is computed from the ROUNDED precision/recall so "
    "boundary arithmetic is engine-exact. One narrow scoring pass, one "
    "explode over five literals, one tiny tau-keyed rollup.",
)
def q_quality_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.quality import gopher_quality_signals

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sig = gopher_quality_signals(docs)
    scored = sig.select(
        F.round(
            0.5 * F.col("alpha_word_ratio")
            + 0.3 * F.least(F.col("n_words"), F.lit(100)) / 100.0
            + 0.2 * F.least(F.col("stop_distinct"), F.lit(5)) / 5.0,
            6,
        ).alias("score"),
        F.col("gopher_pass").alias("truth"),
    )
    taus = F.explode(
        F.array(*[F.lit(t) for t in (0.3, 0.5, 0.6, 0.7, 0.85)])
    ).alias("tau")
    per = scored.select("score", "truth", taus)
    agg = per.groupBy("tau").agg(
        F.sum((F.col("score") >= F.col("tau")).cast("int"))
        .cast("long")
        .alias("n_pred"),
        F.sum(
            ((F.col("score") >= F.col("tau")) & (F.col("truth") == 1)).cast(
                "int"
            )
        )
        .cast("long")
        .alias("tp"),
        F.sum("truth").cast("long").alias("n_pos"),
        F.count("*").cast("long").alias("n_docs"),
    )
    # integer-ratio floor-quantize onto a 1e-4 grid held as exact small
    # integers (round-10 hazard sweep); f1 recombines the grid integers
    # in exact double arithmetic (products <= 2e8), so no tie anywhere
    p4 = F.when(F.col("n_pred") == 0, F.lit(0.0)).otherwise(
        F.floor(F.col("tp").cast("double") * 10000 / F.col("n_pred"))
    )
    r4 = F.when(F.col("n_pos") == 0, F.lit(0.0)).otherwise(
        F.floor(F.col("tp").cast("double") * 10000 / F.col("n_pos"))
    )
    out = agg.select(
        "tau",
        "n_pred",
        "tp",
        "n_pos",
        "n_docs",
        p4.alias("__p4"),
        r4.alias("__r4"),
    )
    f1 = F.when(F.col("__p4") + F.col("__r4") == 0, F.lit(0.0)).otherwise(
        F.floor(
            2
            * F.col("__p4")
            * F.col("__r4")
            / (F.col("__p4") + F.col("__r4"))
        )
        / 10000
    )
    return out.select(
        "tau",
        "n_pred",
        "tp",
        "n_pos",
        "n_docs",
        (F.col("__p4") / 10000).alias("precision"),
        (F.col("__r4") / 10000).alias("recall"),
        f1.alias("f1"),
    )


@register(
    "q2_ranking_metrics",
    f"""
WITH q AS (
  SELECT vec_id AS qid, label AS expected, embedding AS qv
  FROM embeddings WHERE vec_id < 20
),
scored AS (
  SELECT q.qid, q.expected, e.vec_id, e.label,
         round({_dk_cos('e.embedding', 'q.qv')}, 6) AS score
  FROM embeddings e, q WHERE e.vec_id <> q.qid
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY score DESC, vec_id) AS rn
  FROM scored
),
nrel AS (
  SELECT q.qid, least(count(*), 10) AS n_rel
  FROM q JOIN embeddings e
    ON e.label = q.expected AND e.vec_id <> q.qid
  GROUP BY q.qid
),
perq AS (
  SELECT qid,
         coalesce(max(CASE WHEN label = expected
                           THEN 1.0 / rn END), 0.0) AS rr,
         list_sum(list(CASE WHEN label = expected
                            THEN 1.0 / log2(rn + 1) ELSE 0.0 END
                       ORDER BY rn)) AS dcg,
         sum(CASE WHEN label = expected THEN 1 ELSE 0 END) / 10.0 AS p10
  FROM ranked WHERE rn <= 10 GROUP BY qid
),
m AS (
  SELECT p.qid,
         round(p.rr, 6) AS rr,
         round(CASE WHEN n.n_rel = 0 THEN 0.0
                    ELSE p.dcg / list_sum(list_transform(
                      generate_series(1, CAST(n.n_rel AS BIGINT)),
                      i -> 1.0 / log2(i + 1))) END, 6) AS ndcg,
         round(p.p10, 6) AS p10
  FROM perq p JOIN nrel n ON n.qid = p.qid
)
-- means over EXACT integer micro-units, floor-quantized (round-9 hazard
-- sweep): rr/ndcg/p10 are 6dp-rounded grid values, so their avg() can land
-- exactly on a 4dp round boundary where engine fold orders disagree
SELECT floor(CAST(sum(CAST(round(rr * 1000000) AS BIGINT)) AS DOUBLE)
             / (count(*) * 100)) / 10000 AS mrr,
       floor(CAST(sum(CAST(round(ndcg * 1000000) AS BIGINT)) AS DOUBLE)
             / (count(*) * 100)) / 10000 AS ndcg_at_10,
       floor(CAST(sum(CAST(round(p10 * 1000000) AS BIGINT)) AS DOUBLE)
             / (count(*) * 100)) / 10000 AS precision_at_10,
       CAST(count(*) AS BIGINT) AS n_queries
FROM m
""",
    "The standard IR metrics the reference's hit-rate eval "
    "(core/evaluation.py:66-109) stops short of: MRR, NDCG@10, and "
    "precision@10 of the exact cosine ranking against label relevance — "
    "the numbers a retrieval deployment actually reports. Per-query DCG "
    "is an ORDERED fold over the rank-sorted gain list in both engines "
    "(ascending-rank left-to-right sum), ideal DCG uses the true per-"
    "label relevant count capped at the cutoff, and every per-query "
    "metric is rounded before the mean so boundary arithmetic is "
    "engine-exact. One broadcast pair scan + one qid window — the same "
    "plan family as q2_hitrate.",
)
def q_q2_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from yaml_pipe_spark.operators.similarity import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("expected"),
        F.col("embedding").alias("qv"),
    )
    nn = knn_join(q, emb, k=10)
    rel = (F.col("label") == F.col("expected")).cast("int")
    perq = nn.groupBy("qid").agg(
        F.coalesce(
            F.max(F.when(rel == 1, 1.0 / F.col("rank"))), F.lit(0.0)
        ).alias("rr"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("rank"),
                        F.when(rel == 1, 1.0 / F.log2(F.col("rank") + 1))
                        .otherwise(F.lit(0.0))
                        .alias("g"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["g"],
        ).alias("dcg"),
        (F.sum(rel) / F.lit(10.0)).alias("p10"),
    )
    nrel = (
        q.alias("q")
        .join(
            emb.alias("e"),
            (F.col("e.label") == F.col("q.expected"))
            & (F.col("e.vec_id") != F.col("q.qid")),
        )
        .groupBy("q.qid")
        .agg(F.least(F.count("*"), F.lit(10)).alias("n_rel"))
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.col("n_rel").cast("long")),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i + 1),
    )
    m = perq.join(nrel, "qid").select(
        F.round("rr", 6).alias("rr"),
        F.round(
            F.when(F.col("n_rel") == 0, F.lit(0.0)).otherwise(
                F.col("dcg") / idcg
            ),
            6,
        ).alias("ndcg"),
        F.round("p10", 6).alias("p10"),
    )
    # means over EXACT integer micro-units, floor-quantized (round-9
    # hazard sweep): the per-query metrics are 6dp-rounded grid values,
    # so avg() can land exactly on a 4dp round boundary where engine
    # fold orders disagree
    n = F.count("*")
    return m.agg(
        fq_unit_mean(F.col("rr"), 6, 4, n).alias("mrr"),
        fq_unit_mean(F.col("ndcg"), 6, 4, n).alias("ndcg_at_10"),
        fq_unit_mean(F.col("p10"), 6, 4, n).alias("precision_at_10"),
        n.cast("long").alias("n_queries"),
    )


@register(
    "dedup_lsh_scurve",
    f"""
WITH {_DK_SHINGLES},
{_DK_DF_CUT},
sigs AS (SELECT doc_id, {_DK_SIGS} FROM shingles GROUP BY doc_id),
buckets0 AS ({_DK_BUCKETS}),
buckets AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT *, count(*) OVER (PARTITION BY band_id, band_key) AS bn
    FROM buckets0
  ) WHERE bn <= 10000
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a
  JOIN buckets b ON a.band_id = b.band_id AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM shf a
  JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.id_a, i.id_b,
         round(i.inter / (sa.n + sb.n - i.inter), 4) AS j
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
),
dec AS (
  SELECT p.id_a, p.id_b, p.j,
         CAST(least(floor(p.j * 10), 9) AS BIGINT) AS decile,
         round(1 - pow(1 - pow(p.j, 4), 4), 6) AS theory,
         CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS is_cand
  FROM pairs p
  LEFT JOIN cands c ON c.id_a = p.id_a AND c.id_b = p.id_b
)
-- means over EXACT integer units, floor-quantized (round-9 hazard sweep):
-- theory is a 6dp-rounded grid value and is_cand/n is a small-denominator
-- rational — either avg() can land exactly on a 4dp round boundary where
-- engine fold orders disagree
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(is_cand) AS BIGINT) AS n_candidates,
       floor(CAST(sum(is_cand) AS DOUBLE) * 10000 / count(*)) / 10000
         AS measured_rate,
       floor(CAST(sum(CAST(round(theory * 1000000) AS BIGINT)) AS DOUBLE)
             / (count(*) * 100)) / 10000 AS theory_rate
FROM dec GROUP BY decile
""",
    "The MinHash-LSH S-curve, measured against its closed form: for every "
    "shingle-sharing pair (the exact inverted-index pair set), the "
    "probability the banding scheme (16 signatures, 4 bands of 4 rows) "
    "surfaces it as a candidate is theoretically 1-(1-j^4)^4; this audit "
    "buckets pairs by jaccard decile and reports measured candidate rate "
    "next to the mean theoretical rate — the textbook figure (MMDS "
    "ch. 3) as an oracled table, and the design justification behind "
    "dedup_minhash_band_curve's banding budget. Shares the dedup "
    "family's staged shapes: one shingle frame, one inverted-index pair "
    "join (df-cut on), one banded self-join, then a decile rollup.",
)
def q_dedup_lsh_scurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.dedup import (
        exact_jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        token_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    shingles = token_shingles(docs, "text", "doc_id").localCheckpoint()
    pairs = exact_jaccard_pairs(shingles)
    cands = lsh_candidate_pairs(
        minhash_signatures(shingles), "doc_id", 16, 4
    ).withColumn("__c", F.lit(1))
    dec = pairs.join(cands, ["id_a", "id_b"], "left").select(
        F.least(F.floor(F.col("jaccard") * 10), F.lit(9))
        .cast("long")
        .alias("decile"),
        F.round(
            1 - F.pow(1 - F.pow(F.col("jaccard"), 4), 4), 6
        ).alias("theory"),
        F.coalesce(F.col("__c"), F.lit(0)).alias("is_cand"),
    )
    # means over EXACT integer units, floor-quantized (round-9 hazard
    # sweep; see the oracle comment)
    return dec.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("is_cand").cast("long").alias("n_candidates"),
        (
            F.floor(F.sum("is_cand").cast("double") * 1e4 / F.count("*"))
            / 1e4
        ).alias("measured_rate"),
        fq_unit_mean(F.col("theory"), 6, 4, F.count("*")).alias(
            "theory_rate"
        ),
    )


@register(
    "ann_index_incremental",
    ANN_INDEX_PERSISTED_ORACLE,
    "Incremental ANN index maintenance (IvfPqIndexStore.append) — the "
    "daily-increment mode that completes the build/serve split: the index "
    "is built on the standing 80% of vectors, the last 20% arrive as an "
    "increment that is assigned + 2-bit-encoded against the PERSISTED "
    "centroids only (no corpus rescan) and appended into the existing "
    "cid partitions; the corpus fingerprint composes incrementally "
    "because it is a bit_xor fold (order-free over disjoint row sets), so "
    "staleness stays exact across append chains. Serving the appended "
    "index is value-identical to a full rebuild (unit-pinned), so the "
    "oracle is the persisted-index oracle unchanged. Centroids are "
    "frozen by contract — a coarse-quantizer refit must rebuild "
    "(enforced by the centroid fingerprint). Like ann_index_persisted, "
    "the chain runs only when the full-corpus fingerprint is stale: the "
    "steady-state cost is the serve path, with the build+append paid "
    "once per corpus snapshot (the production amortization this query "
    "models; the fresh-directory chain is exercised by the driver's "
    "fresh sf0.01 runs and tests/test_ann_index.py).",
)
def q_ann_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from yaml_pipe_spark.operators.ann_index import IvfPqIndexStore

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corp = emb.filter(F.col("vec_id") >= 20).select("vec_id", "embedding")
    cents = emb.filter(
        (F.col("vec_id") >= 20) & (F.col("vec_id") < 28)
    ).select(
        (F.col("vec_id") - 20).alias("cid"), F.col("embedding").alias("cv")
    )
    split = corp.agg(
        F.floor(0.8 * F.max("vec_id")).cast("long").alias("__s")
    )
    staged = corp.crossJoin(F.broadcast(split))
    standing = staged.filter(F.col("vec_id") < F.col("__s")).select(
        "vec_id", "embedding"
    )
    increment = staged.filter(F.col("vec_id") >= F.col("__s")).select(
        "vec_id", "embedding"
    )
    base = os.path.join(
        "spark-warehouse",
        f"ann_ivfpq_inc_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    store = IvfPqIndexStore(base)
    if store.is_stale(corp):
        # a half-appended crash leaves the composed fingerprint stale, so
        # the chain restarts from a clean directory — never double-appends
        shutil.rmtree(base, ignore_errors=True)
        store.build(standing, cents)
        store.append(increment)
        # verify composition only where it could have broken — on the
        # warm path this assert would just repeat the staleness scan
        assert store.is_stale(corp) is False
    return store.serve(q, k=5, nprobe=2, rerank_m=20)


def _dk_hex_int(expr: str, start: int, n: int) -> str:
    """DuckDB SQL for int(substr(md5-hex, start, n), 16) — no conv() there,
    so spell the base-16 positional sum with strpos arithmetic (the
    _DK_MD5_BYTE trick generalized to n hex chars)."""
    terms = [
        f"(strpos('0123456789abcdef', substr({expr}, {start + i}, 1)) - 1)"
        f" * {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return "(" + " + ".join(terms) + ")"


# 5-gram stream shared by the bloom gate's engine and oracle: same lead()
# construction as text_decontaminate, with source carried for the rollup.
_DK_BLOOM_GRAMS = """toks AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS w,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
  FROM documents
),
grams AS (
  SELECT doc_id, source,
         w || ' ' || lead(w)    OVER (PARTITION BY doc_id ORDER BY pos)
           || ' ' || lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos)
           || ' ' || lead(w, 3) OVER (PARTITION BY doc_id ORDER BY pos)
           || ' ' || lead(w, 4) OVER (PARTITION BY doc_id ORDER BY pos)
           AS gram
  FROM toks
),
train AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % 10 < 8 AND gram IS NOT NULL
),
js AS (SELECT unnest([{js}]) AS j)"""

_BLOOM_M, _BLOOM_K = 16384, 3
# probe indices generated from _BLOOM_K so the oracle can never probe a
# different count than the Spark side (review finding)
_DK_BLOOM_GRAMS = _DK_BLOOM_GRAMS.format(
    js=", ".join(str(j) for j in range(_BLOOM_K))
)


@register(
    "text_bloom_decontaminate",
    f"""
WITH {_DK_BLOOM_GRAMS},
th AS (SELECT gram, md5(gram) AS h FROM train),
bits AS (
  SELECT DISTINCT
         ({_dk_hex_int('h', 1, 4)}
          + j * (2 * {_dk_hex_int('h', 5, 4)} + 1)) % {_BLOOM_M} AS pos
  FROM th CROSS JOIN js
),
fill AS (SELECT count(*) AS n_set FROM bits),
test AS (
  SELECT doc_id, source, gram FROM grams
  WHERE doc_id % 10 >= 8 AND gram IS NOT NULL
),
tg AS (SELECT DISTINCT gram FROM test),
tgh AS (SELECT gram, md5(gram) AS h FROM tg),
probe AS (
  SELECT gram,
         ({_dk_hex_int('h', 1, 4)}
          + j * (2 * {_dk_hex_int('h', 5, 4)} + 1)) % {_BLOOM_M} AS pos
  FROM tgh CROSS JOIN js
),
flag AS (
  SELECT probe.gram,
         min(CASE WHEN bits.pos IS NULL THEN 0 ELSE 1 END) AS flagged
  FROM probe LEFT JOIN bits USING (pos) GROUP BY 1
),
truth AS (
  SELECT tg.gram, CASE WHEN tr.gram IS NULL THEN 0 ELSE 1 END AS conta
  FROM tg LEFT JOIN train tr USING (gram)
),
v AS (SELECT flag.gram, flagged, conta FROM flag JOIN truth USING (gram)),
per AS (
  SELECT t.source,
         count(*) AS n_grams,
         sum(conta) AS n_contaminated,
         sum(flagged) AS n_flagged,
         sum(CASE WHEN flagged = 1 AND conta = 0 THEN 1 ELSE 0 END)
           AS n_false_pos,
         sum(CASE WHEN conta = 1 AND flagged = 0 THEN 1 ELSE 0 END)
           AS n_missed
  FROM test t JOIN v ON t.gram = v.gram GROUP BY 1
)
SELECT source,
       CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_contaminated AS BIGINT) AS n_contaminated,
       CAST(n_flagged AS BIGINT) AS n_flagged,
       CAST(n_false_pos AS BIGINT) AS n_false_pos,
       CAST(n_missed AS BIGINT) AS n_missed,
       round(n_false_pos * 1.0
             / nullif(n_grams - n_contaminated, 0), 6) AS fp_rate,
       round(pow(n_set * 1.0 / {_BLOOM_M}, {_BLOOM_K}), 6)
         AS theory_fp_rate
FROM per, fill
""",
    "Bloom-filter decontamination gate (operators/bloom.py) measured "
    "against the exact join it replaces: the train split's distinct "
    "5-grams fold into a 16384-bit / 3-probe filter (Kirsch-Mitzenmacher "
    "double hashing off md5, the repo's cross-engine hash), held-out "
    "grams probe the BROADCAST bit set, and the per-source rollup "
    "reports flagged vs exactly-contaminated counts, the measured FP "
    "rate, the observed-fill theory rate f^k, and n_missed — pinned 0, "
    "a Bloom filter has no false negatives. The 100 TB point: the exact "
    "gate's corpus-sized train join is replaced by m/8 bytes of "
    "broadcast state and local probes (GPT-3 appendix-C style); the "
    "probe side touches only DISTINCT held-out grams, then verdicts "
    "join back to occurrences on the gram key. Plan: one distinct "
    "shuffle per side, one <=m-row broadcast, zero UDFs.",
)
def q_text_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from yaml_pipe_spark.operators.bloom import bloom_bits, bloom_flag

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    toks = docs.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", " ")).alias("pos", "w"),
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", i).over(w) for i in range(1, 5)]
    gram = F.concat_ws(" ", *parts)
    grams = toks.select(
        "doc_id",
        "source",
        F.when(F.lead("w", 4).over(w).isNotNull(), gram).alias("gram"),
    ).filter(F.col("gram").isNotNull())
    train = (
        grams.filter(F.col("doc_id") % 10 < 8).select("gram").distinct()
    )
    bits = bloom_bits(train, m=_BLOOM_M, k=_BLOOM_K)
    test = grams.filter(F.col("doc_id") % 10 >= 8)
    tg = test.select("gram").distinct()
    flag = bloom_flag(tg, bits, m=_BLOOM_M, k=_BLOOM_K)
    truth = tg.join(
        train.withColumnRenamed("gram", "tr_gram"),
        tg.gram == F.col("tr_gram"),
        "left",
    ).select(
        "gram",
        F.when(F.col("tr_gram").isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .alias("conta"),
    )
    v = flag.join(truth, "gram")
    per = (
        test.join(v, "gram")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("conta").cast("long").alias("n_contaminated"),
            F.sum("flagged").cast("long").alias("n_flagged"),
            F.sum(
                ((F.col("flagged") == 1) & (F.col("conta") == 0)).cast(
                    "long"
                )
            ).alias("n_false_pos"),
            F.sum(
                ((F.col("conta") == 1) & (F.col("flagged") == 0)).cast(
                    "long"
                )
            ).alias("n_missed"),
        )
    )
    fill = bits.agg(F.count("*").alias("n_set"))
    return per.crossJoin(F.broadcast(fill)).select(
        "source",
        "n_grams",
        "n_contaminated",
        "n_flagged",
        "n_false_pos",
        "n_missed",
        F.round(
            F.col("n_false_pos")
            / F.nullif(F.col("n_grams") - F.col("n_contaminated"), F.lit(0)),
            6,
        ).alias("fp_rate"),
        F.round(
            F.pow(F.col("n_set") / F.lit(float(_BLOOM_M)), _BLOOM_K), 6
        ).alias("theory_fp_rate"),
    )


@register(
    "corpus_snapshot_psi",
    """
WITH f0 AS (
  SELECT doc_id, 'n_chars' AS feature, CAST(n_chars AS DOUBLE) AS x
  FROM documents
  UNION ALL
  SELECT doc_id, 'n_tokens',
         CAST(len(string_split(text, ' ')) AS DOUBLE)
  FROM documents
  UNION ALL
  SELECT doc_id, 'alpha_frac',
         round(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
               / nullif(len(text), 0), 4)
  FROM documents
),
f AS (
  SELECT feature, x,
         CASE WHEN doc_id % 2 = 0 THEN 'base' ELSE 'inc' END AS side
  FROM f0 WHERE x IS NOT NULL
),
e AS (
  SELECT feature,
         list_transform(
           quantile_cont(x, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
           v -> round(v, 4)) AS edges
  FROM f WHERE side = 'base' GROUP BY 1
),
b AS (
  SELECT f.feature, side,
         len(list_filter(e.edges, v -> v <= f.x)) AS bin
  FROM f JOIN e USING (feature)
),
c AS (
  SELECT feature, bin,
         sum(CASE WHEN side = 'base' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN side = 'inc' THEN 1 ELSE 0 END) AS cb
  FROM b GROUP BY 1, 2
),
d AS (SELECT feature, unnest(generate_series(0, 9)) AS bin FROM e),
fc AS (
  SELECT d.feature, d.bin, coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
  FROM d LEFT JOIN c ON d.feature = c.feature AND d.bin = c.bin
),
t AS (SELECT feature, sum(ca) AS na, sum(cb) AS nb FROM fc GROUP BY 1),
p AS (
  SELECT fc.feature, na, nb,
         (ca + 0.5) / (na + 5.0) AS pa,
         (cb + 0.5) / (nb + 5.0) AS pb
  FROM fc JOIN t USING (feature)
)
SELECT feature,
       CAST(max(na) AS BIGINT) AS n_base,
       CAST(max(nb) AS BIGINT) AS n_incoming,
       round(sum((pb - pa) * ln(pb / pa)), 6) + 0.0 AS psi,
       round(max(abs(pb - pa)), 6) AS max_shift
FROM p GROUP BY 1
""",
    "Population-stability-index drift monitor between corpus snapshots "
    "(the go/no-go check before an increment joins the training mix): "
    "per feature (n_chars, whitespace token count, alpha fraction), the "
    "baseline snapshot's exact deciles (Spark percentile = DuckDB "
    "quantile_cont, edges rounded before binning so bin assignment is "
    "bit-stable across engines) define 10 bins; both snapshots "
    "histogram into them and PSI = sum((pb-pa)*ln(pb/pa)) with add-0.5 "
    "smoothing (industry bands: <0.1 stable, >0.25 drifted). Plan: one "
    "narrow stacked map over documents, decile agg on the base side "
    "comes back as a 3-row broadcast, two bounded aggs — nothing "
    "corpus-sized shuffles; at 100 TB swap percentile for "
    "approx_percentile on the base side (edges are a monitoring "
    "artifact, not a correctness surface).",
)
def q_corpus_snapshot_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    ntok = F.size(F.split("text", " "))
    alpha = F.round(
        F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
        / F.nullif(F.length("text"), F.lit(0)),
        4,
    )
    feats = (
        docs.select(
            "doc_id",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("n_chars").alias("feature"),
                        F.col("n_chars").cast("double").alias("x"),
                    ),
                    F.struct(
                        F.lit("n_tokens").alias("feature"),
                        ntok.cast("double").alias("x"),
                    ),
                    F.struct(
                        F.lit("alpha_frac").alias("feature"),
                        alpha.cast("double").alias("x"),
                    ),
                )
            ).alias("f"),
        )
        .select(
            F.when(F.col("doc_id") % 2 == 0, F.lit("base"))
            .otherwise(F.lit("inc"))
            .alias("side"),
            F.col("f.feature").alias("feature"),
            F.col("f.x").alias("x"),
        )
        .filter(F.col("x").isNotNull())
    )
    edges = (
        feats.filter(F.col("side") == "base")
        .groupBy("feature")
        .agg(
            F.percentile(
                "x", F.array(*[F.lit(i / 10) for i in range(1, 10)])
            ).alias("e0")
        )
        .select(
            "feature",
            F.transform("e0", lambda v: F.round(v, 4)).alias("edges"),
        )
    )
    binned = feats.join(F.broadcast(edges), "feature").select(
        "feature",
        "side",
        F.size(
            F.filter("edges", lambda v: v <= F.col("x"))
        ).alias("bin"),
    )
    counts = binned.groupBy("feature", "bin").agg(
        F.sum((F.col("side") == "base").cast("long")).alias("ca"),
        F.sum((F.col("side") == "inc").cast("long")).alias("cb"),
    )
    domain = edges.select(
        "feature", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bin")
    )
    full = domain.join(counts, ["feature", "bin"], "left").select(
        "feature",
        "bin",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    tot = full.groupBy("feature").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    p = full.join(F.broadcast(tot), "feature").select(
        "feature",
        "na",
        "nb",
        ((F.col("ca") + 0.5) / (F.col("na") + 5.0)).alias("pa"),
        ((F.col("cb") + 0.5) / (F.col("nb") + 5.0)).alias("pb"),
    )
    return p.groupBy("feature").agg(
        F.max("na").cast("long").alias("n_base"),
        F.max("nb").cast("long").alias("n_incoming"),
        # +0.0 folds a rounded -0.0 to +0.0 (the driver hash is
        # sign-of-zero sensitive; FP can make a term of the always-
        # nonnegative PSI sum infinitesimally negative)
        (
            F.round(
                F.sum(
                    (F.col("pb") - F.col("pa"))
                    * F.log(F.col("pb") / F.col("pa"))
                ),
                6,
            )
            + 0.0
        ).alias("psi"),
        F.round(F.max(F.abs(F.col("pb") - F.col("pa"))), 6).alias(
            "max_shift"
        ),
    )


_Z_BITS = 8  # 256 buckets per dimension -> 16-bit z-values


def _dk_zorder(d1: str, d2: str) -> str:
    """DuckDB bit-interleave of two 8-bit bucket ids (d2 in the even bit
    positions) — same arithmetic the Spark side spells with
    shiftleft/shiftright/bitwiseAND."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({d1} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({d2} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


@register(
    "layout_zorder_locality",
    f"""
WITH o AS (
  SELECT o_orderkey,
         (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS d1v,
         o_custkey AS d2v
  FROM orders
),
mm AS (
  SELECT min(d1v) AS mn1, max(d1v) AS mx1,
         min(d2v) AS mn2, max(d2v) AS mx2
  FROM o
),
s AS (
  SELECT o_orderkey,
         CAST(floor(256.0 * (d1v - mn1) / (mx1 - mn1 + 1)) AS BIGINT) AS d1,
         CAST(floor(256.0 * (d2v - mn2) / (mx2 - mn2 + 1)) AS BIGINT) AS d2
  FROM o, mm
),
z AS (SELECT *, {_dk_zorder('d1', 'd2')} AS zval FROM s),
laid AS (
  SELECT 'natural' AS layout, d1, d2,
         ntile(64) OVER (ORDER BY o_orderkey) AS file_id FROM z
  UNION ALL
  SELECT 'linear', d1, d2,
         ntile(64) OVER (ORDER BY d1, d2, o_orderkey) FROM z
  UNION ALL
  SELECT 'zorder', d1, d2,
         ntile(64) OVER (ORDER BY zval, o_orderkey) FROM z
),
files AS (
  SELECT layout, file_id,
         min(d1) AS mn1, max(d1) AS mx1,
         min(d2) AS mn2, max(d2) AS mx2,
         count(*) AS n_rows,
         sum(CASE WHEN d1 BETWEEN 96 AND 127
                   AND d2 BETWEEN 96 AND 127 THEN 1 ELSE 0 END) AS in_box
  FROM laid GROUP BY 1, 2
)
SELECT layout,
       CAST(count(*) AS BIGINT) AS n_files,
       round(avg(mx1 - mn1), 4) AS avg_span_d1,
       round(avg(mx2 - mn2), 4) AS avg_span_d2,
       CAST(sum(CASE WHEN mx1 >= 96 AND mn1 <= 127
                      AND mx2 >= 96 AND mn2 <= 127
                     THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       CAST(sum(in_box) AS BIGINT) AS rows_in_box
FROM files GROUP BY 1
""",
    "Z-order layout audit — the data-layout decision that makes "
    "multi-dimensional pruning work at 100 TB (Delta OPTIMIZE ZORDER / "
    "Iceberg sort-order semantics, built from scratch): orders are "
    "bucketed to 8 bits per dimension (order date, customer key), the "
    "z-value bit-interleaves them (pure shiftleft/bitwiseAND Catalyst "
    "arithmetic), and the corpus is carved into 64 equal 'files' under "
    "three write orders — natural (arrival), lexicographic (d1,d2), and "
    "z-order. Per layout: the mean per-file min/max span of each "
    "dimension and how many files a 1/8 x 1/8 box query must scan given "
    "file-level min/max stats (the manifest-pruning model). Z-order "
    "bounds BOTH spans, so it prunes on both predicates; lexicographic "
    "only bounds the leading one; natural bounds neither. The ntile "
    "windows model the writer's global sort — the production write is "
    "repartitionByRange(zval) + sortWithinPartitions, one range "
    "shuffle; tests/test_layout.py measures real parquet row-group "
    "pruning for the same three layouts with pyarrow footer stats.",
)
def q_layout_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).alias("d1v"),
        F.col("o_custkey").alias("d2v"),
    )
    mm = o.agg(
        F.min("d1v").alias("mn1"),
        F.max("d1v").alias("mx1"),
        F.min("d2v").alias("mn2"),
        F.max("d2v").alias("mx2"),
    )

    def bucket(v: str, mn: str, mx: str):
        return F.floor(
            256.0 * (F.col(v) - F.col(mn)) / (F.col(mx) - F.col(mn) + 1)
        ).cast("long")

    s = o.crossJoin(F.broadcast(mm)).select(
        "o_orderkey",
        bucket("d1v", "mn1", "mx1").alias("d1"),
        bucket("d2v", "mn2", "mx2").alias("d2"),
    )
    zterms = []
    for i in range(_Z_BITS):
        zterms.append(
            F.shiftleft(
                F.shiftright(F.col("d1"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
        zterms.append(
            F.shiftleft(
                F.shiftright(F.col("d2"), i).bitwiseAND(F.lit(1)), 2 * i
            )
        )
    zexpr = zterms[0]
    for t in zterms[1:]:
        zexpr = zexpr + t
    z = s.withColumn("zval", zexpr)
    from pyspark.sql import Window as W

    orders_by = {
        "natural": [F.col("o_orderkey")],
        "linear": [F.col("d1"), F.col("d2"), F.col("o_orderkey")],
        "zorder": [F.col("zval"), F.col("o_orderkey")],
    }
    branches = [
        z.select(
            F.lit(name).alias("layout"),
            "d1",
            "d2",
            F.ntile(64).over(W.orderBy(*cols)).alias("file_id"),
        )
        for name, cols in orders_by.items()
    ]
    laid = branches[0].unionAll(branches[1]).unionAll(branches[2])
    in_box = (
        F.col("d1").between(96, 127) & F.col("d2").between(96, 127)
    ).cast("long")
    files = laid.groupBy("layout", "file_id").agg(
        F.min("d1").alias("mn1"),
        F.max("d1").alias("mx1"),
        F.min("d2").alias("mn2"),
        F.max("d2").alias("mx2"),
        F.sum(in_box).alias("in_box"),
    )
    scanned = (
        (F.col("mx1") >= 96)
        & (F.col("mn1") <= 127)
        & (F.col("mx2") >= 96)
        & (F.col("mn2") <= 127)
    ).cast("long")
    return files.groupBy("layout").agg(
        F.count("*").cast("long").alias("n_files"),
        F.round(F.avg(F.col("mx1") - F.col("mn1")), 4).alias("avg_span_d1"),
        F.round(F.avg(F.col("mx2") - F.col("mn2")), 4).alias("avg_span_d2"),
        F.sum(scanned).cast("long").alias("files_scanned"),
        F.sum("in_box").cast("long").alias("rows_in_box"),
    )


@register(
    "dedup_canonical_quality",
    f"""
WITH RECURSIVE {_SIMHASH_PAIR_CTES},
p AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
edges AS (
  SELECT id_a AS a, id_b AS b FROM p
  UNION
  SELECT id_b AS a, id_a AS b FROM p
),
reach(n, m) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
),
cc AS (SELECT n AS doc_id, min(m) AS cluster_rep FROM reach GROUP BY n),
score AS (
  SELECT doc_id,
         round(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
               / nullif(len(text), 0)
               * ln(1 + len(string_split(text, ' '))), 4) AS q
  FROM documents
),
m AS (
  SELECT cc.cluster_rep, cc.doc_id, s.q,
         row_number() OVER (PARTITION BY cc.cluster_rep
                            ORDER BY s.q DESC, cc.doc_id) AS rn
  FROM cc JOIN score s USING (doc_id)
)
SELECT m.cluster_rep,
       min(CASE WHEN rn = 1 THEN m.doc_id END) AS keep_doc,
       CAST(count(*) AS BIGINT) AS n_members,
       round(max(CASE WHEN rn = 1 THEN q END), 4) AS best_q,
       round(max(CASE WHEN m.doc_id = m.cluster_rep THEN q END), 4)
         AS minid_q,
       round(max(CASE WHEN rn = 1 THEN q END)
             - max(CASE WHEN m.doc_id = m.cluster_rep THEN q END), 4)
         AS quality_gain
FROM m GROUP BY 1
""",
    "Quality-aware canonical selection for near-dup clusters — the "
    "curation step after cluster resolution: instead of keeping the "
    "min-id member (dedup_cluster_resolution's label), keep the argmax "
    "of a quality score (alpha fraction x log token count; ties to the "
    "lower doc_id) and report per cluster the kept doc, the naive "
    "min-id keeper's score, and the quality mass the smarter keep "
    "recovers. Composes the checkpointed SimHash-pair/CC frame with a "
    "narrow per-doc score map and ONE cluster-keyed window over "
    "cluster-sized groups (bounded by the max component, never a "
    "corpus-wide sort).",
)
def q_dedup_canonical_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    store = _pair_graph_store(spark, sf_dir)
    cc = store.labels(spark).select(
        F.col("node").alias("doc_id"), "cluster_rep"
    )
    score = docs.select(
        "doc_id",
        F.round(
            F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
            / F.nullif(F.length("text"), F.lit(0))
            * F.log(1 + F.size(F.split("text", " "))),
            4,
        ).alias("q"),
    )
    m = cc.join(score, "doc_id").withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("cluster_rep").orderBy(
                F.desc("q"), F.col("doc_id")
            )
        ),
    )
    best_q = F.max(F.when(F.col("rn") == 1, F.col("q")))
    minid_q = F.max(
        F.when(F.col("doc_id") == F.col("cluster_rep"), F.col("q"))
    )
    return m.groupBy("cluster_rep").agg(
        F.min(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("keep_doc"),
        F.count("*").cast("long").alias("n_members"),
        F.round(best_q, 4).alias("best_q"),
        F.round(minid_q, 4).alias("minid_q"),
        F.round(best_q - minid_q, 4).alias("quality_gain"),
    )


# Lexical-retrieval core shared by q3_bm25_topk / q3_hybrid_rrf /
# q3_bm25_index_persisted / q3_hybrid_lexical_vector (and their oracles):
# token stats, tf-idf-selected pseudo-queries (the top-3 most
# discriminative terms of every 97th doc — known-item search, so the source
# doc's self-retrieval rank is a built-in sanity signal), and the candidate
# grid of docs sharing at least one query term with tf=0 rows preserved
# (query-likelihood needs the smoothing-only contribution of absent terms).
# `src` parametrizes the corpus (the hybrid query restricts documents to
# the embedded subset so both arms rank the same universe).
def _dk_retrieval_core(src: str = "documents") -> str:
    return rf"""toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\p{{L}}+')) AS tok
  FROM {src}
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
cf AS (SELECT tok, count(*) AS df, sum(tf) AS cf FROM tf GROUP BY 1),
ctot AS (SELECT sum(dl) AS c FROM dl),
qtf AS (
  SELECT tf.doc_id AS qid, tf.tok, tf.tf,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * ln(s.n_docs * 1.0 / c.df) DESC, tf.tok
         ) AS rn
  FROM tf JOIN cf c USING (tok) CROSS JOIN stats s
  WHERE tf.doc_id % 97 = 0 AND len(tf.tok) >= 4
),
qterms AS (SELECT qid, tok FROM qtf WHERE rn <= 3),
cand AS (SELECT DISTINCT q.qid, t.doc_id FROM qterms q JOIN tf t USING (tok)),
grid AS (SELECT c.qid, c.doc_id, q.tok FROM cand c JOIN qterms q USING (qid)),
g AS (
  SELECT grid.qid, grid.doc_id, grid.tok, coalesce(t.tf, 0) AS tf
  FROM grid LEFT JOIN tf t
    ON grid.doc_id = t.doc_id AND grid.tok = t.tok
),
sc AS (
  SELECT g.qid, g.doc_id,
         sum(ln(1 + (s.n_docs - c.df + 0.5) / (c.df + 0.5))
             * g.tf * 2.2
             / (g.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS bm25,
         sum(ln((g.tf + 300.0 * c.cf / ct.c) / (d.dl + 300.0))) AS ql
  FROM g
  JOIN dl d ON g.doc_id = d.doc_id
  JOIN cf c ON g.tok = c.tok
  CROSS JOIN stats s CROSS JOIN ctot ct
  GROUP BY 1, 2
)"""


_DK_RETRIEVAL_CORE = _dk_retrieval_core()

# ONE oracle for both BM25 rankings: the in-query q3_bm25_topk and the
# persisted-index q3_bm25_index_persisted, whose contract is value-equality
# with it (editing one convention cannot desynchronize the twin).
_BM25_TOPK_ORACLE = f"""
WITH {_DK_RETRIEVAL_CORE},
r AS (SELECT qid, doc_id, round(bm25, 4) AS score FROM sc),
rk AS (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id) AS rank
  FROM r
)
SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id, score,
       CAST(CASE WHEN doc_id = qid THEN 1 ELSE 0 END AS BIGINT) AS is_self
FROM rk WHERE rank <= 10
"""


@register(
    "q3_bm25_topk",
    _BM25_TOPK_ORACLE,
    "BM25 top-10 lexical retrieval (Robertson/Sparck Jones; the Lucene "
    "ln(1+(N-df+0.5)/(df+0.5)) idf and k1=1.2/b=0.75 length-normalized "
    "tf) — the lexical side every RAG stack runs next to its vector "
    "index. Pseudo-queries are each 97th doc's top-3 tf-idf terms, so "
    "posting lists stay short by construction and the source doc's "
    "self-retrieval flag is a built-in relevance sanity check. Plan: "
    "ONE token shuffle feeds tf/dl/df/cf as an exchange-reuse diamond; "
    "scoring touches only the inverted-index candidates (docs sharing "
    "a query term), never the corpus; scores round before ranking so "
    "rank membership is engine-exact. At 100 TB this is the "
    "impact-ordered posting join: candidates ~ sum of 3 short posting "
    "lists per query, top-k per query is a bounded window.",
)
def q_q3_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.retrieval import (
        bm25_ql_scores,
        rank_bm25_topk,
    )

    return rank_bm25_topk(
        bm25_ql_scores(load_table(spark, sf_dir, "documents")), k=10
    )


@register(
    "q3_hybrid_rrf",
    f"""
WITH {_DK_RETRIEVAL_CORE},
rb AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(bm25, 4) DESC, doc_id) AS r_bm25
  FROM sc
),
rq AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(ql, 4) DESC, doc_id) AS r_ql
  FROM sc
),
fused AS (
  SELECT rb.qid, rb.doc_id, rb.r_bm25, rq.r_ql,
         round(1.0 / (60 + rb.r_bm25) + 1.0 / (60 + rq.r_ql), 6) AS rrf
  FROM rb JOIN rq ON rb.qid = rq.qid AND rb.doc_id = rq.doc_id
),
rk AS (
  SELECT qid, doc_id, r_bm25, r_ql, rrf,
         row_number() OVER (PARTITION BY qid
                            ORDER BY rrf DESC, doc_id) AS rank
  FROM fused
)
SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id,
       CAST(r_bm25 AS BIGINT) AS r_bm25, CAST(r_ql AS BIGINT) AS r_ql, rrf
FROM rk WHERE rank <= 10
""",
    "Hybrid retrieval via reciprocal-rank fusion (Cormack et al. 2009, "
    "k=60) of two lexical systems over one candidate pool: BM25 and a "
    "Dirichlet-smoothed query-likelihood LM (mu=300; absent query terms "
    "contribute their smoothing-only mass, which is why the candidate "
    "grid keeps tf=0 rows). RRF fuses RANKS, not scores, so the two "
    "incomparable score scales need no calibration — the same fusion "
    "production stacks use for lexical+vector hybrid (swap either arm "
    "for ann_index_persisted's serve to get that). Both rankings come "
    "off ONE shared scoring aggregate (exchange reuse), ranks are "
    "integer-exact, and the fused top-10 is a bounded per-query window.",
)
def q_q3_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from yaml_pipe_spark.operators.retrieval import bm25_ql_scores

    sc = bm25_ql_scores(load_table(spark, sf_dir, "documents"))
    rb = sc.withColumn(
        "r_bm25",
        F.row_number().over(
            W.partitionBy("qid").orderBy(
                F.desc(F.round("bm25", 4)), F.col("doc_id")
            )
        ),
    )
    both = rb.withColumn(
        "r_ql",
        F.row_number().over(
            W.partitionBy("qid").orderBy(
                F.desc(F.round("ql", 4)), F.col("doc_id")
            )
        ),
    )
    fused = both.select(
        "qid",
        "doc_id",
        "r_bm25",
        "r_ql",
        F.round(
            1.0 / (60 + F.col("r_bm25")) + 1.0 / (60 + F.col("r_ql")), 6
        ).alias("rrf"),
    )
    rk = fused.withColumn(
        "rank",
        F.row_number()
        .over(W.partitionBy("qid").orderBy(F.desc("rrf"), "doc_id"))
        .cast("long"),
    )
    return rk.filter(F.col("rank") <= 10).select(
        "qid",
        "rank",
        "doc_id",
        F.col("r_bm25").cast("long").alias("r_bm25"),
        F.col("r_ql").cast("long").alias("r_ql"),
        "rrf",
    )


@register(
    "corpus_snapshot_churn",
    """
WITH b0 AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 13 = 0
              THEN substr(text, 1, greatest(len(text) - 7, 1)) || ' [rev2]'
              ELSE text END AS text
  FROM documents WHERE doc_id % 17 <> 0
),
b AS (
  SELECT doc_id, source, text FROM b0
  UNION ALL
  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents), source, text
  FROM documents WHERE doc_id % 19 = 0
),
d AS (
  SELECT coalesce(a.source, b.source) AS source,
         CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN md5(a.text) <> md5(b.text) THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id
),
per AS (
  SELECT source,
         sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS n_added,
         sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS n_removed,
         sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS n_changed,
         sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END)
           AS n_unchanged
  FROM d GROUP BY 1
)
SELECT source,
       CAST(n_added AS BIGINT) AS n_added,
       CAST(n_removed AS BIGINT) AS n_removed,
       CAST(n_changed AS BIGINT) AS n_changed,
       CAST(n_unchanged AS BIGINT) AS n_unchanged,
       round((n_added + n_removed + n_changed) * 1.0
             / (n_added + n_removed + n_changed + n_unchanged), 4)
         AS churn_rate
FROM per GROUP BY 1, 2, 3, 4, 5, 6
""",
    "Snapshot-diff churn accounting — the daily ops report between two "
    "corpus snapshots (operators/state.py::has_changed generalized from "
    "a changed-only anti-join to the full 3-way diff): ONE full-outer "
    "hash join on doc_id classifies every doc added / removed / changed "
    "(content-hash compare) / unchanged, rolled up per source with a "
    "churn rate. Snapshot B is derived deterministically (every 17th "
    "doc deleted, every 13th revised, every 19th re-keyed as new) so "
    "both engines diff identical inputs; re-keyed ids offset past "
    "max(doc_id) so they can never collide with a real doc at any "
    "scale. At 100 TB this is one "
    "co-partitionable join on the primary key — the cheap daily check "
    "that catches a silently truncated crawl before it trains.",
)
def q_corpus_snapshot_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    revised = F.when(
        F.col("doc_id") % 13 == 0,
        F.concat(
            F.substring(
                "text", 1, F.greatest(F.length("text") - 7, F.lit(1))
            ),
            F.lit(" [rev2]"),
        ),
    ).otherwise(F.col("text"))
    b0 = docs.filter(F.col("doc_id") % 17 != 0).select(
        "doc_id", "source", revised.alias("text")
    )
    off = docs.agg((F.max("doc_id") + 1).alias("__off"))
    added = (
        docs.filter(F.col("doc_id") % 19 == 0)
        .crossJoin(F.broadcast(off))
        .select(
            (F.col("doc_id") + F.col("__off")).alias("doc_id"),
            "source",
            "text",
        )
    )
    b = b0.unionAll(added)
    a = docs.select(
        F.col("doc_id").alias("a_id"),
        F.col("source").alias("a_source"),
        F.md5("text").alias("a_h"),
    )
    bb = b.select(
        F.col("doc_id").alias("b_id"),
        F.col("source").alias("b_source"),
        F.md5("text").alias("b_h"),
    )
    d = a.join(bb, a.a_id == bb.b_id, "full_outer").select(
        F.coalesce("a_source", "b_source").alias("source"),
        F.when(F.col("a_id").isNull(), F.lit("added"))
        .when(F.col("b_id").isNull(), F.lit("removed"))
        .when(F.col("a_h") != F.col("b_h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
    per = d.groupBy("source").agg(
        F.sum((F.col("status") == "added").cast("long")).alias("n_added"),
        F.sum((F.col("status") == "removed").cast("long")).alias(
            "n_removed"
        ),
        F.sum((F.col("status") == "changed").cast("long")).alias(
            "n_changed"
        ),
        F.sum((F.col("status") == "unchanged").cast("long")).alias(
            "n_unchanged"
        ),
    )
    moved = F.col("n_added") + F.col("n_removed") + F.col("n_changed")
    return per.select(
        "source",
        "n_added",
        "n_removed",
        "n_changed",
        "n_unchanged",
        F.round(moved / (moved + F.col("n_unchanged")), 4).alias(
            "churn_rate"
        ),
    )


@register(
    "graph_pagerank_centrality",
    f"""
WITH {_SIMHASH_PAIR_CTES},
p AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
edges AS (
  SELECT id_a AS a, id_b AS b FROM p
  UNION
  SELECT id_b AS a, id_a AS b FROM p
),
deg AS (SELECT a AS node, count(*) AS deg FROM edges GROUP BY 1),
nn AS (SELECT count(*) AS n FROM deg),
pr0 AS (SELECT node, deg, 1.0 / n AS pr FROM deg, nn),
it1 AS (
  SELECT e.b AS node, sum(p.pr / p.deg) AS s
  FROM edges e JOIN pr0 p ON e.a = p.node GROUP BY 1
),
pr1 AS (
  SELECT d.node, d.deg,
         {1.0 - 0.85!r} / nn.n + 0.85 * coalesce(it1.s, 0.0) AS pr
  FROM deg d CROSS JOIN nn LEFT JOIN it1 ON d.node = it1.node
),
it2 AS (
  SELECT e.b AS node, sum(p.pr / p.deg) AS s
  FROM edges e JOIN pr1 p ON e.a = p.node GROUP BY 1
),
pr2 AS (
  SELECT d.node, d.deg,
         {1.0 - 0.85!r} / nn.n + 0.85 * coalesce(it2.s, 0.0) AS pr
  FROM deg d CROSS JOIN nn LEFT JOIN it2 ON d.node = it2.node
),
it3 AS (
  SELECT e.b AS node, sum(p.pr / p.deg) AS s
  FROM edges e JOIN pr2 p ON e.a = p.node GROUP BY 1
),
pr3 AS (
  SELECT d.node, d.deg,
         {1.0 - 0.85!r} / nn.n + 0.85 * coalesce(it3.s, 0.0) AS pr
  FROM deg d CROSS JOIN nn LEFT JOIN it3 ON d.node = it3.node
)
SELECT node AS doc_id, CAST(deg AS BIGINT) AS degree,
       round(pr, 6) AS pagerank
FROM pr3
""",
    "PageRank centrality over the SimHash near-dup graph "
    "(operators/graph.py) — the canonical-template detector on top of "
    "cluster resolution: a boilerplate page cloned across many hosts "
    "accumulates centrality mass a raw degree count under-ranks, and "
    "sorting clusters by their most-central member surfaces the "
    "template worth blocklisting at the source. Three fixed damped "
    "iterations (d=0.85; every node of the undirected graph has "
    "degree >= 1, so no dangling-mass term), each ONE join + ONE "
    "aggregate shuffle with lineage cut per round — the same "
    "iterative-loop discipline as connected_components, and at 100 TB "
    "the same cost shape: proportional to the PAIR graph, which the "
    "banding guards keep orders of magnitude below the corpus. The "
    "oracle unrolls the identical three rounds as chained CTEs; the "
    "teleport constant is the same repr'd double in both engines.",
)
def q_graph_pagerank_centrality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from yaml_pipe_spark.operators.graph import pagerank

    store = _pair_graph_store(spark, sf_dir)
    prs = store.pairs(spark)
    return pagerank(prs, iterations=3, damping=0.85).select(
        F.col("node").alias("doc_id"), "degree", "pagerank"
    )


@register(
    "q3_bm25_index_persisted",
    _BM25_TOPK_ORACLE,
    "Build-once/serve-many persisted BM25 index with append-only "
    "maintenance (operators/retrieval.py::Bm25IndexStore) — the lexical "
    "twin of ann_index_persisted/ann_index_incremental, closing the "
    "build/serve split on the retrieval arm: the index is built on the "
    "standing 80% of docs, the last 20% arrive as an increment that is "
    "tokenized ALONE — its tf/dl rows append, the vocabulary df/cf "
    "stats merge additively (one vocab-sized full-outer join, no corpus "
    "rescan; committed as a pointer-swapped generation), and "
    "n_docs/total_tokens/the bit_xor fingerprint compose exactly over "
    "disjoint doc sets. Because every persisted statistic is additive, "
    "serving the appended index is value-identical to a full-corpus "
    "recompute — the oracle IS q3_bm25_topk's oracle unchanged. Serve "
    "reads ONLY the persisted tables (qterms from stored tf/cf, global "
    "stats from the meta scalars). The chain runs only when the "
    "full-corpus fingerprint is stale (the production amortization); "
    "the fresh chain is exercised by fresh sf0.01 driver runs and "
    "tests/test_retrieval.py.",
)
def q_q3_bm25_index_persisted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil

    from yaml_pipe_spark.operators.retrieval import Bm25IndexStore

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    split = docs.agg(
        F.floor(0.8 * F.max("doc_id")).cast("long").alias("__s")
    )
    staged = docs.crossJoin(F.broadcast(split))
    standing = staged.filter(F.col("doc_id") < F.col("__s")).select(
        "doc_id", "text"
    )
    increment = staged.filter(F.col("doc_id") >= F.col("__s")).select(
        "doc_id", "text"
    )
    base = os.path.join(
        "spark-warehouse",
        f"bm25_index_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    store = Bm25IndexStore(base)
    if store.is_stale(docs):
        # a half-appended crash leaves the composed fingerprint stale —
        # restart from a clean directory, never double-append
        shutil.rmtree(base, ignore_errors=True)
        store.build(standing)
        store.append(increment)
        # verify additive composition only on the rebuild path; repeating
        # the fingerprint scan on every warm serve doubles its cost
        assert store.is_stale(docs) is False
    return store.serve(k=10)


@register(
    "q3_bm25_compact",
    _BM25_TOPK_ORACLE,
    "Small-file compaction on the persisted BM25 store "
    "(operators/retrieval.py::compact without tombstones — the "
    "unpartitioned twin of ann_index_compact, round 10): every "
    "append/streamed micro-batch lands one more tf/dl part-file pair, "
    "so a long-running maintenance chain grows the file count without "
    "bound and every serve pays the per-file open cost. The chain here "
    "is build(standing 80%) -> two appends -> compact(min_files=2, the "
    "maintenance schedule's trigger knob), which rewrites tf/dl into "
    "balanced round-robin partitions — value-neutral by construction "
    "(statistics, fingerprint and meta untouched), so the oracle is "
    "q3_bm25_topk's full-corpus oracle UNCHANGED and the post-compact "
    "serve must hash-equal it. Unit twin: "
    "tests/test_forget.py::test_bm25_compact_defragments_append_growth.",
)
def q_q3_bm25_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from yaml_pipe_spark.operators.retrieval import Bm25IndexStore

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    split = docs.agg(
        F.floor(0.8 * F.max("doc_id")).cast("long").alias("__s1"),
        F.floor(0.9 * F.max("doc_id")).cast("long").alias("__s2"),
    )
    staged = docs.crossJoin(F.broadcast(split))
    standing = staged.filter(F.col("doc_id") < F.col("__s1")).select(
        "doc_id", "text"
    )
    inc1 = staged.filter(
        (F.col("doc_id") >= F.col("__s1")) & (F.col("doc_id") < F.col("__s2"))
    ).select("doc_id", "text")
    inc2 = staged.filter(F.col("doc_id") >= F.col("__s2")).select(
        "doc_id", "text"
    )
    base = os.path.join(
        "spark-warehouse",
        f"bm25_compact_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    store = Bm25IndexStore(base)
    if store.is_stale(docs):
        shutil.rmtree(base, ignore_errors=True)
        store.build(standing)
        store.append(inc1)
        store.append(inc2)
        # no tombstones: this exercises the pure defragmentation path
        assert store.compact(min_files=2) == 0
        # compaction is physical only — the fingerprint still composes
        assert store.is_stale(docs) is False
    return store.serve(k=10)


# Rebuild-without-the-rows oracle for the BM25 delete: the SAME retrieval
# core, corpus restricted to the docs that survive the deletion request
# (doc_id % 11 <> 7) — every statistic (tf, dl, df, cf, n_docs, avgdl,
# collection total) recomputes from the remaining docs, including the
# pseudo-query set (a forgotten doc stops being a query too).
_BM25_FORGET_ORACLE = f"""
WITH {_dk_retrieval_core(
    "(SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 7)"
)},
r AS (SELECT qid, doc_id, round(bm25, 4) AS score FROM sc),
rk AS (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id) AS rank
  FROM r
)
SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id, score,
       CAST(CASE WHEN doc_id = qid THEN 1 ELSE 0 END AS BIGINT) AS is_self
FROM rk WHERE rank <= 10
"""


@register(
    "q3_bm25_forget",
    _BM25_FORGET_ORACLE,
    "Right-to-be-forgotten on the persisted BM25 store "
    "(operators/retrieval.py::forget + compact, VERDICT r9 ask #4): the "
    "deletion request (doc_id % 11 = 7, passed as id+text rows so the "
    "XOR fingerprint composes back out without the store persisting raw "
    "text) drives a SUBTRACTIVE df/cf merge — the same one "
    "vocabulary-sized join as append's additive merge, committed as a "
    "pointer-swapped cf generation, tokens at df=0 leaving the "
    "vocabulary — plus a tombstone table that serve() anti-joins "
    "(broadcast; the deletion-vector pattern, O(deletes) per request), "
    "n_docs/total_tokens subtracting exactly. compact() then makes the "
    "purge PHYSICAL (tf/dl rewritten minus tombstones, tombstones "
    "cleared) without changing a single served value, because BM25 is a "
    "pure function of the already-exact statistics. The staleness gate "
    "is the warm path: is_stale(corpus-without-the-rows) False proves "
    "the composed fingerprint equals a rebuild-without scan. Oracle = "
    "the full retrieval core recomputed on the remaining docs. Unit "
    "twin: tests/test_forget.py.",
)
def q_q3_bm25_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from yaml_pipe_spark.operators.retrieval import Bm25IndexStore

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    keep = docs.filter(F.col("doc_id") % 11 != 7)
    gone = docs.filter(F.col("doc_id") % 11 == 7)
    base = os.path.join(
        "spark-warehouse",
        f"bm25_forget_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    store = Bm25IndexStore(base)
    if store.is_stale(keep):
        # a half-forgotten crash leaves the composed fingerprint stale —
        # restart from a clean directory, same policy as the append chain
        shutil.rmtree(base, ignore_errors=True)
        store.build(docs)
        store.forget(gone)
        assert store.is_stale(keep) is False
        store.compact()
        # compaction is physical only: statistics and fingerprint untouched
        assert store.is_stale(keep) is False
    return store.serve(k=10)


@register(
    "stream_bm25_append",
    _BM25_TOPK_ORACLE,
    "Streaming BM25 index maintenance (streaming.run_bm25_append_stream) "
    "— the lexical twin of stream_ann_serve/stream_incremental_dedup, "
    "closing the build-once/maintain-forever lifecycle on the retrieval "
    "arm: the standing 80% of doc_ids build the persisted index, the "
    "last 20% arrive as a file-stream increment, and foreachBatch "
    "APPENDS each micro-batch (tf/dl rows append; df/cf merge "
    "additively through pointer-committed generations; n_docs/"
    "total_tokens/XOR fingerprint compose over disjoint doc sets). "
    "Because every persisted statistic is additive, the drained serve "
    "is value-identical to a full rebuild on the union — the oracle is "
    "_BM25_TOPK_ORACLE unchanged. At-least-once replay is guarded by "
    "per-batch applied markers; the one unguarded crash window "
    "(between append and marker) is DETECTED by the stale composed "
    "fingerprint, same contract as the batch append.",
)
def q_stream_bm25_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from yaml_pipe_spark.operators.retrieval import Bm25IndexStore
    from yaml_pipe_spark.streaming.stream import run_bm25_append_stream

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    split = docs.agg(
        F.floor(0.8 * F.max("doc_id")).cast("long").alias("__s")
    )
    staged = docs.crossJoin(F.broadcast(split))
    standing = staged.filter(F.col("doc_id") < F.col("__s")).select(
        "doc_id", "text"
    )
    increment = staged.filter(F.col("doc_id") >= F.col("__s")).select(
        "doc_id", "text"
    )
    sf_base = os.path.basename(os.path.normpath(sf_dir))
    # the STANDING index is what production has before the stream starts.
    # Re-invocations REWIND the previous drain to the standing snapshot
    # (restore_manifest: file surgery proportional to the increment)
    # instead of recopying the whole token-scale index (the copytree this
    # replaces), then pay only the drain — the marginal maintenance cost
    # the bench row is meant to measure. The rewind is fingerprint-
    # verified: a bad restore reads as stale and falls back to a clean
    # rebuild, never a silently wrong serve.
    base = os.path.join("spark-warehouse", f"stream_bm25_{sf_base}")
    store = Bm25IndexStore(os.path.join(base, "index"))
    if not (store.restore_manifest() and not store.is_stale(standing)):
        shutil.rmtree(base, ignore_errors=True)
        store.build(standing)
        store.snapshot_manifest()
    # per-run streaming scratch (input + checkpoint) is always fresh;
    # the increment arrives as ONE file -> one micro-batch
    run_dir = os.path.join(base, "run")
    shutil.rmtree(run_dir, ignore_errors=True)
    increment.coalesce(1).write.parquet(os.path.join(run_dir, "input"))
    run_bm25_append_stream(
        spark,
        os.path.join(run_dir, "input"),
        store,
        os.path.join(run_dir, "ckpt"),
    )
    return store.serve(k=10)


_DK_EMB_DOCS = (
    "(SELECT d.doc_id, d.text FROM documents d "
    "JOIN embeddings x ON d.doc_id = x.vec_id) __d"
)


@register(
    "q3_hybrid_lexical_vector",
    f"""
WITH {_dk_retrieval_core(_DK_EMB_DOCS)},
rb AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(bm25, 4) DESC, doc_id) AS r_lex
  FROM sc
),
rbc AS (SELECT qid, doc_id, r_lex FROM rb WHERE r_lex <= 100),
qv AS (
  SELECT DISTINCT q.qid, e.embedding AS qe
  FROM (SELECT DISTINCT qid FROM qterms) q
  JOIN embeddings e ON e.vec_id = q.qid
),
vs AS (
  SELECT qv.qid, e.vec_id AS doc_id,
         round({_dk_cos('e.embedding', 'qv.qe')}, 6) AS cos
  FROM qv JOIN embeddings e ON TRUE
),
rv AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos DESC, doc_id) AS r_vec
  FROM vs
),
rvc AS (SELECT qid, doc_id, r_vec FROM rv WHERE r_vec <= 100),
fused AS (
  SELECT coalesce(rbc.qid, rvc.qid) AS qid,
         coalesce(rbc.doc_id, rvc.doc_id) AS doc_id,
         coalesce(rbc.r_lex, 0) AS r_lex,
         coalesce(rvc.r_vec, 0) AS r_vec,
         round(
           (CASE WHEN rbc.r_lex IS NULL
                 THEN 0.0 ELSE 1.0 / (60 + rbc.r_lex) END)
           + (CASE WHEN rvc.r_vec IS NULL
                   THEN 0.0 ELSE 1.0 / (60 + rvc.r_vec) END), 6) AS rrf
  FROM rbc FULL OUTER JOIN rvc
    ON rbc.qid = rvc.qid AND rbc.doc_id = rvc.doc_id
),
rk AS (
  SELECT qid, doc_id, r_lex, r_vec, rrf,
         row_number() OVER (PARTITION BY qid
                            ORDER BY rrf DESC, doc_id) AS rank
  FROM fused
)
SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id,
       CAST(r_lex AS BIGINT) AS r_lex, CAST(r_vec AS BIGINT) AS r_vec, rrf
FROM rk WHERE rank <= 10
""",
    "TRUE lexical+vector hybrid retrieval — the production RAG serving "
    "pattern end to end: over the embedded subset of the corpus (both "
    "arms must rank the same universe), arm 1 is BM25 and arm 2 is exact "
    "embedding cosine from the query doc's own vector; each arm keeps "
    "its top-100, reciprocal-rank fusion (k=60) merges the UNION of "
    "candidate lists — a doc missing from one arm contributes zero from "
    "it, the standard convention — and the fused top-10 ships. Ranks "
    "are integer-exact, per-arm scores round before ranking. Plan: the "
    "lexical arm is the checkpointed inverted-index pipeline; the "
    "vector arm broadcasts the ~queries-sized vector set against the "
    "embedding table (swap in ann_index_persisted.serve for the 100 TB "
    "corpus — the fusion is rank-based, so the arm is pluggable).",
)
def q_q3_hybrid_lexical_vector(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    from yaml_pipe_spark.functions.vectors import cosine
    from yaml_pipe_spark.operators.retrieval import bm25_ql_scores

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings")
    docs_e = docs.join(
        emb.select(F.col("vec_id").alias("doc_id")), "doc_id"
    )
    sc = bm25_ql_scores(docs_e)
    rb = sc.withColumn(
        "r_lex",
        F.row_number().over(
            W.partitionBy("qid").orderBy(
                F.desc(F.round("bm25", 4)), F.col("doc_id")
            )
        ),
    ).filter(F.col("r_lex") <= 100).select("qid", "doc_id", "r_lex")
    qv = (
        sc.select("qid")
        .distinct()
        .join(emb, F.col("qid") == F.col("vec_id"))
        .select("qid", F.col("embedding").alias("qe"))
    )
    vs = F.broadcast(qv).crossJoin(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    ).select(
        "qid",
        "doc_id",
        F.round(cosine(F.col("embedding"), F.col("qe")), 6).alias("cos"),
    )
    rv = vs.withColumn(
        "r_vec",
        F.row_number().over(
            W.partitionBy("qid").orderBy(F.desc("cos"), F.col("doc_id"))
        ),
    ).filter(F.col("r_vec") <= 100).select("qid", "doc_id", "r_vec")
    fused = rb.join(rv, ["qid", "doc_id"], "full_outer").select(
        "qid",
        "doc_id",
        F.coalesce("r_lex", F.lit(0)).alias("r_lex"),
        F.coalesce("r_vec", F.lit(0)).alias("r_vec"),
        F.round(
            F.when(
                F.col("r_lex").isNull(), F.lit(0.0)
            ).otherwise(1.0 / (60 + F.col("r_lex")))
            + F.when(
                F.col("r_vec").isNull(), F.lit(0.0)
            ).otherwise(1.0 / (60 + F.col("r_vec"))),
            6,
        ).alias("rrf"),
    )
    rk = fused.withColumn(
        "rank",
        F.row_number()
        .over(W.partitionBy("qid").orderBy(F.desc("rrf"), "doc_id"))
        .cast("long"),
    )
    return rk.filter(F.col("rank") <= 10).select(
        "qid",
        "rank",
        "doc_id",
        F.col("r_lex").cast("long").alias("r_lex"),
        F.col("r_vec").cast("long").alias("r_vec"),
        "rrf",
    )


# ---------------------------------------------------------------------------
# 6h wave: SemDeDup, NB quality distillation, DoReMi mixture weights,
# perplexity-vs-quality correlation — registered after the round-6 50-slot
# prefix was spent; queued for the round-7 driver front (ROUND7_QUEUE).
# ---------------------------------------------------------------------------

SEMDEDUP_ORACLE = f"""
WITH c AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
),
a AS (
  SELECT e.vec_id, e.embedding, c.cid,
         round({_dk_cos('e.embedding', 'c.cv')}, 6) AS s
  FROM embeddings e, c
),
asg AS (
  SELECT vec_id, embedding, cid, s AS centroid_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY s DESC, cid) AS rn
    FROM a
  ) WHERE rn = 1
),
p AS (
  SELECT * FROM (
    SELECT x.vec_id AS id_a, y.vec_id AS id_b,
           round({_dk_cos('x.embedding', 'y.embedding')}, 6) AS cosine
    FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id < y.vec_id
  ) WHERE cosine >= 0.4
),
e AS (
  SELECT id_a AS x, id_b AS y FROM p
  UNION ALL
  SELECT id_b AS x, id_a AS y FROM p
),
ej AS (
  SELECT e.x, e.y, cx.centroid_sim AS cs_x, cy.centroid_sim AS cs_y
  FROM e JOIN asg cx ON cx.vec_id = e.x JOIN asg cy ON cy.vec_id = e.y
),
dom AS (
  SELECT x, y, cs_y FROM ej
  WHERE cs_y < cs_x OR (cs_y = cs_x AND y < x)
),
best AS (
  SELECT x, y AS dropped_for FROM (
    SELECT x, y, row_number() OVER (PARTITION BY x
                                    ORDER BY cs_y, y) AS rn
    FROM dom
  ) WHERE rn = 1
)
SELECT a2.vec_id, a2.cid, a2.centroid_sim + 0.0 AS centroid_sim,
       CAST(CASE WHEN b.dropped_for IS NULL THEN 1 ELSE 0 END AS INT) AS kept,
       b.dropped_for
FROM asg a2 LEFT JOIN best b ON b.x = a2.vec_id
"""


@register(
    "dedup_semantic_cluster",
    SEMDEDUP_ORACLE,
    "SemDeDup (Abbas et al. 2023): cluster embeddings to pinned centroids "
    "(the IVF coarse quantizer doubles as the clustering — one k-means "
    "serves ANN and semantic dedup), prune near-duplicates WITHIN each "
    "cluster keeping the member farthest from its centroid. The keep rule "
    "is the order-free dominance relaxation of the paper's greedy "
    "(centroid_sim ASC, id ASC priority), deterministic in both engines. "
    "Scale: broadcast centroid assignment, cid-blocked equi-join pairs "
    "(never global quadratic), edge-keyed dominance rollup. Registered "
    "after the round-6 50-slot prefix: locally verified at sf0.01+sf0.1, "
    "queued for the round-7 driver front.",
)
def q_dedup_semantic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.dedup import semdedup

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    return semdedup(emb, cents, threshold=0.4)


NB_DISTILL_ORACLE = f"""
WITH {_DK_GOPHER},
lbl AS (
  SELECT doc_id,
         pass_words * pass_mean_word_len * pass_alpha * pass_stop AS y
  FROM gflags
),
toks AS (
  SELECT d.doc_id, l.y,
         CASE WHEN {_dk_byte0("CAST(d.doc_id AS VARCHAR)")} < 0.8 * 256
              THEN 1 ELSE 0 END AS train,
         UNNEST(list_filter(regexp_split_to_array(d.text, '\\s+'),
                            x -> x <> '')) AS tok
  FROM documents d JOIN lbl l USING (doc_id)
),
tf AS (
  SELECT doc_id, y, train, tok, count(*) AS tf FROM toks GROUP BY 1, 2, 3, 4
),
ct AS (SELECT tok, y, sum(tf) AS c FROM tf WHERE train = 1 GROUP BY 1, 2),
vocab AS (SELECT DISTINCT tok FROM ct),
grid AS (
  SELECT v.tok, cls.y, coalesce(ct.c, 0) AS c
  FROM vocab v CROSS JOIN (SELECT 0 AS y UNION ALL SELECT 1) cls
  LEFT JOIN ct ON ct.tok = v.tok AND ct.y = cls.y
),
consts AS (
  SELECT coalesce(sum(CASE WHEN y = 1 THEN c END), 0) AS tot1,
         coalesce(sum(CASE WHEN y = 0 THEN c END), 0) AS tot0,
         (SELECT count(*) FROM vocab) AS v,
         (SELECT count(DISTINCT doc_id) FROM tf
          WHERE train = 1 AND y = 1) AS nd1,
         (SELECT count(DISTINCT doc_id) FROM tf
          WHERE train = 1 AND y = 0) AS nd0
  FROM grid
),
wts AS (
  SELECT g.tok,
         round(log10((sum(CASE WHEN g.y = 1 THEN g.c END) + 1)
                     / CAST(c.tot1 + c.v AS DOUBLE))
               - log10((sum(CASE WHEN g.y = 0 THEN g.c END) + 1)
                       / CAST(c.tot0 + c.v AS DOUBLE)), 6) AS w
  FROM grid g, consts c GROUP BY g.tok, c.tot1, c.tot0, c.v
),
pw AS (
  SELECT round(log10(CAST(nd1 + 1 AS DOUBLE))
               - log10(CAST(nd0 + 1 AS DOUBLE)), 6) AS pw
  FROM consts
),
sc AS (
  SELECT t.doc_id, t.y, sum(t.tf * w.w) AS s
  FROM tf t JOIN wts w USING (tok) WHERE t.train = 0 GROUP BY 1, 2
),
td AS (SELECT DISTINCT doc_id, y FROM tf WHERE train = 0),
mg AS (
  SELECT td.doc_id, td.y,
         round(coalesce(sc.s, 0.0) + pw.pw, 6) AS margin
  FROM td LEFT JOIN sc USING (doc_id, y), pw
),
pr AS (
  SELECT CAST(y AS BIGINT) AS gopher_label,
         CAST(margin >= 0 AS BIGINT) AS pred
  FROM mg
)
SELECT gopher_label, pred, CAST(count(*) AS BIGINT) AS n_docs,
       round(count(*) / CAST(sum(count(*)) OVER (PARTITION BY gopher_label)
                             AS DOUBLE), 4) AS share
FROM pr GROUP BY 1, 2
"""


@register(
    "quality_nb_distill",
    NB_DISTILL_ORACLE,
    "Quality-classifier distillation (the CCNet/fastText stage, Wenzek "
    "et al. 2020 / Joulin et al. 2017): multinomial Naive Bayes over "
    "whitespace tokens, teacher = the Gopher rule conjunction, trained "
    "closed-form on the hash-80% split and reported as the held-out "
    "confusion matrix. NB over token counts IS a linear classifier "
    "(per-token weight = Laplace-smoothed log-likelihood ratio), so both "
    "training and inference are DataFrame aggregates: one (doc, token) "
    "count shuffle, vocabulary-sized model aggregates, broadcast V x 1 "
    "weight join for scoring. Weights and margins round to 6dp before "
    "every sum/sign so the verdict never hinges on float summation order. "
    "Registered after the round-6 50-slot prefix: locally verified at "
    "sf0.01+sf0.1, queued for the round-7 driver front.",
)
def q_quality_nb_distill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.classifier import nb_quality_distill
    from yaml_pipe_spark.operators.quality import gopher_quality_signals

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    labels = gopher_quality_signals(docs).select("doc_id", "gopher_pass")
    return nb_quality_distill(docs, labels)


DOREMI_ORACLE = r"""
WITH toks AS (
  SELECT source, doc_id, regexp_extract_all(lower(text), '\p{L}+') AS t
  FROM documents
),
bg0 AS (
  SELECT source, doc_id, UNNEST(generate_series(1, len(t) - 1)) AS i, t
  FROM toks WHERE len(t) >= 2
),
bgs AS (SELECT source, doc_id, t[i] AS prev, t[i+1] AS cur FROM bg0),
dt AS (
  SELECT source, doc_id, prev, cur, count(*) AS c_dt
  FROM bgs GROUP BY 1, 2, 3, 4
),
lm_s AS (
  SELECT source, prev, cur, sum(c_dt) AS c_bg FROM dt GROUP BY 1, 2, 3
),
pv_s AS (SELECT source, prev, sum(c_bg) AS c_prev FROM lm_s GROUP BY 1, 2),
lp_s AS (
  SELECT lm_s.source, lm_s.prev, lm_s.cur,
         log10(CAST(c_bg AS DOUBLE)) - log10(CAST(c_prev AS DOUBLE)) AS lps
  FROM lm_s JOIN pv_s ON lm_s.source = pv_s.source AND lm_s.prev = pv_s.prev
),
lm_g AS (SELECT prev, cur, sum(c_bg) AS g_bg FROM lm_s GROUP BY 1, 2),
pv_g AS (SELECT prev, sum(g_bg) AS g_prev FROM lm_g GROUP BY 1),
lp_g AS (
  SELECT lm_g.prev, lm_g.cur,
         log10(CAST(g_bg AS DOUBLE)) - log10(CAST(g_prev AS DOUBLE)) AS lpg
  FROM lm_g JOIN pv_g ON lm_g.prev = pv_g.prev
),
doc AS (
  SELECT dt.source, dt.doc_id,
         round(sum(dt.c_dt * (lp_s.lps - lp_g.lpg)) / sum(dt.c_dt), 6) AS exc
  FROM dt
  JOIN lp_s ON dt.source = lp_s.source AND dt.prev = lp_s.prev
           AND dt.cur = lp_s.cur
  JOIN lp_g ON dt.prev = lp_g.prev AND dt.cur = lp_g.cur
  GROUP BY 1, 2
),
src AS (
  -- mean over EXACT integer micro-units, floor-quantized: exc is
  -- 6dp-rounded, so avg(exc) can land exactly on a 6dp round boundary
  -- where engine fold orders disagree (round-9 hazard sweep)
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         floor(CAST(sum(CAST(round(exc * 1000000) AS BIGINT)) AS DOUBLE)
               / count(*)) / 1000000 + 0.0 AS excess_loss
  FROM doc GROUP BY 1
),
w AS (
  SELECT source, n_docs, excess_loss,
         n_docs / CAST(sum(n_docs) OVER () AS DOUBLE) AS share0,
         (n_docs / CAST(sum(n_docs) OVER () AS DOUBLE))
           * exp(2.0 * excess_loss) AS un
  FROM src
)
-- share is n/total — a small-denominator rational that CAN sit exactly on
-- a 6dp round tie; floor-quantize. weight stays round(): exp() is a
-- continuum map whose outputs hit a 6dp boundary with measure ~0
SELECT source, n_docs, floor(share0 * 1000000) / 1000000 AS baseline_share,
       excess_loss,
       round(un / sum(un) OVER (), 6) AS weight
FROM w
"""


@register(
    "corpus_doremi_weights",
    DOREMI_ORACLE,
    "DoReMi-style domain reweighting (Xu et al. 2023): per-source excess "
    "loss of the corpus-wide bigram LM over a source-specialized one, "
    "mapped through the paper's exponentiated-gradient step "
    "w(s) ~ share(s) * exp(eta * excess(s)) — the deterministic "
    "specialist-vs-generalist analog of the Group-DRO proxy/reference "
    "pair, so mixture weights are measurable without model training. ONE "
    "(doc, bigram) shuffle; the corpus LM aggregates FROM the source LM "
    "(no second scan); the weight normalization is a window over the "
    "|sources|-row frame. Registered after the round-6 50-slot prefix: "
    "locally verified at sf0.01+sf0.1, queued for the round-7 driver "
    "front.",
)
def q_corpus_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.sampling import doremi_source_weights

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "text"
    )
    return doremi_source_weights(docs)


@register(
    "corpus_ppl_quality_corr",
    "WITH " + _DK_BIGRAM_DOC + f""",
q AS (
  SELECT doc_id,
         round(least({_DK_NTOK} / 100.0, 1.0) * 0.25
               + (1 - least({_DK_PUNCT} / greatest(length(text), 1) * 4,
                            1.0)) * 0.25
               + least(({_dk_stop_hits()})
                       / greatest({_DK_NTOK}, 1) * 3, 1.0) * 0.25
               + least({_DK_NTOK} / CAST(greatest(length(text), 1)
                                         AS DOUBLE) * 6, 1.0) * 0.25,
               4) AS quality_score
  FROM documents
),
j AS (
  SELECT doc.lang, round(doc.lp0, 6) AS lp, q.quality_score AS qs,
         CAST(round(round(doc.lp0, 6) * 1000000) AS BIGINT) AS lp_u,
         CAST(round(q.quality_score * 10000) AS BIGINT) AS qs_u
  FROM doc JOIN q USING (doc_id)
)
-- the per-group means AND the correlation run over EXACT integer
-- micro-units and floor-quantize to 4dp: avg()/corr() over doubles fold
-- in partition order, and a mean of 6dp-rounded values can land exactly
-- on a 4dp round boundary (observed flaking 0.6679 vs 0.668 between
-- parallelism levels); integer sums are fold-order-exact and
-- floor(identical double) has no tie to break. corr is shift/scale
-- invariant, so Pearson over the units equals Pearson over lp/qs; the
-- five sums stay exact (DuckDB HUGEINT / Spark decimal(38,0)) and both
-- engines evaluate the SAME closed form over identical integers
, s AS (
  -- HUGEINT products before summing (mirrors Spark's decimal(38,0) cast):
  -- a BIGINT*BIGINT square would overflow-error for extreme unit values
  SELECT lang, count(*) AS n,
         sum(lp_u) AS sx, sum(qs_u) AS sy,
         sum(CAST(lp_u AS HUGEINT) * lp_u) AS sxx,
         sum(CAST(qs_u AS HUGEINT) * qs_u) AS syy,
         sum(CAST(lp_u AS HUGEINT) * qs_u) AS sxy
  FROM j GROUP BY lang
)
SELECT lang, CAST(n AS BIGINT) AS n_docs,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE)
                 * CAST(n * syy - sy * sy AS DOUBLE) > 0
            THEN floor(CAST(n * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE))
                       * 10000) / 10000 + 0.0
       END AS corr_lp_quality,
       floor(CAST(sx AS DOUBLE) / (n * 100)) / 10000 + 0.0 AS avg_lp,
       floor(CAST(sy AS DOUBLE) / n) / 10000 AS avg_quality
FROM s
""",
    "Perplexity-vs-quality link audit: Pearson correlation per language "
    "between the bigram-LM doc logprob (the CCNet signal) and the "
    "composite heuristic quality score (the Gopher-style signal) — the "
    "measured answer to 'do our two quality filters agree, and where?', "
    "same closes-the-loop family as quality_score_calibration and "
    "text_lang_confusion. Reuses the bigram diamond + the narrow quality "
    "projection; the rollup is |langs| rows. lp0 rounds to 6dp before "
    "the correlation so both engines correlate identical inputs, and the "
    "per-group MEANS and the CORRELATION both run over exact integer "
    "micro-unit sums (Pearson closed form, floor-quantized) — an avg() "
    "or corr() over doubles folds in partition order and can land "
    "exactly on a round boundary (round-8 flake fix; corr hardened in "
    "round 9 per ADVICE).",
)
def q_corpus_ppl_quality_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.text_stats import (
        bigram_doc_logprob,
        text_statistics,
    )

    docs = load_table(spark, sf_dir, "documents")
    lp = bigram_doc_logprob(docs.select("lang", "doc_id", "text")).select(
        "lang", "doc_id", F.round("lp0", 6).alias("lp")
    )
    qs = text_statistics(docs.select("doc_id", "text")).select(
        "doc_id", F.col("quality_score").alias("qs")
    )
    j = lp.join(qs, "doc_id").select(
        "lang",
        "lp",
        "qs",
        # exact integer micro-units (lp is 6dp-rounded, qs 4dp-rounded, so
        # the scaled values are within 0.5 of an integer and the 0-dp
        # round is exact and engine-identical)
        F.round(F.col("lp") * 1e6).cast("long").alias("lp_u"),
        F.round(F.col("qs") * 1e4).cast("long").alias("qs_u"),
    )
    # EXACT integer sums (decimal(38,0) so the squared-unit sums can't
    # overflow long), then the closed-form Pearson over identical integers
    # in both engines: corr() over doubles folds in partition order and can
    # flip a 4dp boundary between parallelism levels — the same flake class
    # as the means (ADVICE r8). corr is shift/scale invariant, so Pearson
    # over the units equals Pearson over lp/qs.
    dec = "decimal(38,0)"
    # cast BEFORE multiplying: a long*long product would silently wrap for
    # |lp| beyond ~3037 (lp_u^2 > 2^63) — impossible for a per-token mean
    # logprob, but the decimal product costs nothing and the oracle's
    # HUGEINT cast mirrors it exactly
    lp_d, qs_d = F.col("lp_u").cast(dec), F.col("qs_u").cast(dec)
    s = j.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("lp_u").alias("sx"),
        F.sum("qs_u").alias("sy"),
        F.sum(lp_d * lp_d).alias("sxx"),
        F.sum(qs_d * qs_d).alias("syy"),
        F.sum(lp_d * qs_d).alias("sxy"),
    )
    n, sx, sy = F.col("n").cast(dec), F.col("sx").cast(dec), F.col("sy").cast(dec)
    vx = (n * F.col("sxx") - sx * sx).cast("double")
    vy = (n * F.col("syy") - sy * sy).cast("double")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    # floor-quantized (no tie to break) and NULL on zero variance in BOTH
    # engines (Spark / would NULL on a zero divisor, DuckDB would NaN);
    # + 0.0 normalizes a possible -0.0 (suite-wide negative-zero contract)
    corr = F.when(
        vx * vy > 0, F.floor(num / F.sqrt(vx * vy) * 1e4) / 1e4 + F.lit(0.0)
    )
    return s.select(
        "lang",
        F.col("n").cast("long").alias("n_docs"),
        corr.alias("corr_lp_quality"),
        # means over EXACT integer sums, floor-quantized to 4dp: avg() of
        # rounded doubles can land exactly on a 4dp round boundary where
        # engine fold orders disagree (round-8 flake fix; see the oracle)
        (
            F.floor(F.col("sx").cast("double") / (F.col("n") * 100)) / 1e4
            + F.lit(0.0)
        ).alias("avg_lp"),
        (F.floor(F.col("sy").cast("double") / F.col("n")) / 1e4).alias(
            "avg_quality"
        ),
    )


def _dk_kcenter_step(prev_d: str, prev_c: str, step: int) -> str:
    """One unrolled greedy k-center round: pick argmax(mind) from the
    previous distance frame, then fold its distance in with least()."""
    return f"""
c{step} AS (
  SELECT vec_id AS cid, embedding AS cv FROM {prev_d}
  ORDER BY mind DESC, vec_id LIMIT 1
),
d{step} AS (
  SELECT d.vec_id, d.embedding,
         least(d.mind,
               round(1 - {_dk_cos('d.embedding', 'c.cv')}, 6)) AS mind
  FROM {prev_d} d, c{step} c
),
r{step} AS (SELECT max(mind) AS radius FROM d{step})"""


KCENTER_ORACLE = f"""
WITH c1 AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  ORDER BY vec_id LIMIT 1
),
d1 AS (
  SELECT e.vec_id, e.embedding,
         round(1 - {_dk_cos('e.embedding', 'c.cv')}, 6) AS mind
  FROM embeddings e, c1 c
),
r1 AS (SELECT max(mind) AS radius FROM d1),
{_dk_kcenter_step('d1', 'c1', 2)},
{_dk_kcenter_step('d2', 'c2', 3)},
{_dk_kcenter_step('d3', 'c3', 4)}
SELECT 1 AS step, c1.cid AS center_id, r1.radius FROM c1, r1
UNION ALL SELECT 2, c2.cid, r2.radius FROM c2, r2
UNION ALL SELECT 3, c3.cid, r3.radius FROM c3, r3
UNION ALL SELECT 4, c4.cid, r4.radius FROM c4, r4
"""


@register(
    "sample_kcenter_coreset",
    KCENTER_ORACLE,
    "Greedy k-center coreset selection (Sener & Savarese 2018): k=4 "
    "diversity-first centers over the embedding corpus, each round adding "
    "the point with max-min cosine distance to the chosen set, plus the "
    "per-step coverage radius (the k-center objective curve). The driver "
    "holds only the k x dim centers; every round is one narrow "
    "literal-distance projection + one max/max_by aggregate — k columnar "
    "scans, zero shuffles, nothing corpus-sized collected. Registered "
    "after the round-6 50-slot prefix: locally verified at sf0.01+sf0.1, "
    "queued for the round-7 driver front.",
)
def q_sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.sampling import kcenter_coreset

    emb = load_table(spark, sf_dir, "embeddings")
    return kcenter_coreset(emb, k=4)


# ---------------------------------------------------------------------------
# Wave 8: soft dedup reweighting (SoftDeDup), winnowing fingerprints
# (Schleimer/Wilkerson/Aiken, SIGMOD '03 / MOSS), UniMax source mixing
# (Chung et al. 2023) — three more published-pipeline curation algorithms.
# ---------------------------------------------------------------------------

SOFT_REWEIGHT_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
sh0 AS (
  SELECT doc_id, UNNEST(generate_series(1, len(t) - 4)) AS i, t
  FROM toks WHERE len(t) >= 5
),
sh AS (
  SELECT DISTINCT doc_id,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' '
              || t[i+4] AS shingle
  FROM sh0
),
dft AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
pd AS (
  SELECT s.doc_id, count(*) AS n_grams,
         avg(CASE WHEN df >= 2 THEN 1.0 ELSE 0.0 END) AS dup_frac
  FROM sh s JOIN dft USING (shingle) GROUP BY s.doc_id
)
SELECT d.doc_id, d.source,
       CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
       round(coalesce(dup_frac, 0), 4) AS dup_frac,
       round(1.0 / (1.0 + 4.0 * coalesce(dup_frac, 0)), 4) AS weight
FROM documents d LEFT JOIN pd USING (doc_id)
"""


@register(
    "dedup_soft_reweight",
    SOFT_REWEIGHT_ORACLE,
    "SoftDeDup-style reweighting (Xia et al. 2024): instead of DROPPING "
    "near-duplicate docs, downweight by duplicated-content commonness — "
    "dup_frac = fraction of a doc's distinct word 5-grams that occur in "
    ">= 2 docs, sampling weight = 1/(1 + 4*dup_frac). The hard-dedup "
    "complement (dedup_exact/minhash remove; this preserves tail content "
    "inside boilerplate-heavy docs). One (doc,gram) shuffle + one "
    "vocabulary-scale df aggregate + one equi-join back — the exact "
    "text_shared_ngrams cost family, linear in corpus size.",
)
def q_dedup_soft_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.dedup import soft_dedup_weights

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    per_doc = soft_dedup_weights(docs, "text", "doc_id", k=5, lam=4.0)
    dup = F.coalesce(F.col("dup_frac"), F.lit(0.0))
    return (
        docs.select("doc_id", "source")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.round(dup, 4).alias("dup_frac"),
            F.round(F.coalesce(F.col("weight"), F.lit(1.0)), 4).alias("weight"),
        )
    )


WINNOW_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
g AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, len(t) - 3),
           i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
         ) AS hs
  FROM toks WHERE len(t) >= 4
),
w AS (
  SELECT doc_id, len(hs) AS n_grams,
         list_transform(
           generate_series(1, len(hs) - 3),
           i -> list_min(hs[i:i+3])
         ) AS fps
  FROM g WHERE len(hs) >= 4
)
SELECT doc_id,
       CAST(n_grams AS BIGINT) AS n_grams,
       CAST(len(fps) AS BIGINT) AS n_windows,
       CAST(len(list_distinct(fps)) AS BIGINT) AS n_fps,
       list_min(fps) AS min_fp,
       list_max(fps) AS max_fp
FROM w
"""


@register(
    "text_winnow_fingerprint",
    WINNOW_ORACLE,
    "Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD "
    "'03 — the MOSS algorithm): hash every word 4-gram, slide a window of "
    "4 consecutive hashes, keep each window's minimum — guarantees any "
    "shared run of >= 7 words between two docs shares a fingerprint, at "
    "~1/4 the storage of full k-gram sets. Hashes are md5 hex strings "
    "(lexicographic min is engine-identical). Pure per-doc expressions "
    "(transform/slice/array_min inside codegen): zero shuffles, zero "
    "Python; at 100 TB this is a narrow map the scan absorbs.",
)
def q_text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.text_stats import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    out = winnow_fingerprints(docs, "text", "doc_id", k=4, w=4)
    return out.select(
        "doc_id",
        "n_grams",
        F.size("fps").cast("long").alias("n_windows"),
        F.size(F.array_distinct("fps")).cast("long").alias("n_fps"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp"),
    )


WINNOW_PAIRS_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
g AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, len(t) - 3),
           i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
         ) AS hs
  FROM toks WHERE len(t) >= 4
),
wf AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, len(hs) - 3),
           i -> list_min(hs[i:i+3])
         ) AS fps
  FROM g WHERE len(hs) >= 4
),
fp AS (
  SELECT DISTINCT doc_id, fp
  FROM (SELECT doc_id, UNNEST(fps) AS fp FROM wf)
),
dfc AS (SELECT fp, count(*) AS df FROM fp GROUP BY fp),
kept AS (
  SELECT f.doc_id, f.fp FROM fp f JOIN dfc USING (fp) WHERE df <= 50
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 2
"""


@register(
    "dedup_winnow_pairs",
    WINNOW_PAIRS_ORACLE,
    "Winnowing as a DEDUP path (the MOSS use-case): candidate near-dup "
    "pairs = documents sharing >= 2 winnow fingerprints. Detection "
    "guarantee differs from the probabilistic MinHash banding: any shared "
    "token run of >= 7 words is caught DETERMINISTICALLY (each run "
    "contributes a shared fingerprint), at ~1/w the index size of full "
    "k-gram sets — the plagiarism-detection complement of "
    "dedup_minhash_lsh (Jaccard resemblance) and dedup_substring_span "
    "(exact >= 8-token spans). Scale shape: per-doc fingerprints are "
    "narrow expressions, candidate generation is ONE (fp, doc) equi-join "
    "with a df <= 50 hot-fingerprint cap (the same bucket-cap guard as "
    "the LSH band join), pair mass bounded by sum(df^2) over kept "
    "fingerprints, never all-pairs.",
)
def q_dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.text_stats import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    fps = winnow_fingerprints(docs, "text", "doc_id", k=4, w=4)
    ex = fps.select("doc_id", F.explode(F.array_distinct("fps")).alias("fp"))
    dfc = ex.groupBy("fp").agg(F.count("*").alias("df"))
    kept = ex.join(dfc.filter(F.col("df") <= 50), "fp").select("doc_id", "fp")
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


UNIMAX_ORACLE = """
WITH c AS (
  SELECT source,
         CAST(sum(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                  x -> x <> ''))) AS DOUBLE) AS toks
  FROM documents GROUP BY source
),
-- toks = 0 sources are excluded from the waterfill (cap 0, alloc 0, and
-- the epochs division diverges: Spark / yields NULL on a zero divisor
-- where DuckDB yields NaN) — mirrored in unimax_allocation
cap AS (SELECT source, toks, 2.0 * toks AS cap FROM c WHERE toks > 0),
tot AS (SELECT 1.9 * sum(toks) AS budget, count(*) AS n FROM cap),
ord AS (
  SELECT source, toks, cap,
         row_number() OVER (ORDER BY cap, source) AS i,
         sum(cap) OVER (ORDER BY cap, source
                        ROWS UNBOUNDED PRECEDING) AS csum
  FROM cap
),
k AS (
  SELECT coalesce(max(i), 0) AS kk, coalesce(max(csum), 0.0) AS csum_k
  FROM ord, tot
  WHERE csum + (n - i) * cap <= budget
),
alloc AS (
  SELECT o.source, o.toks,
         CASE WHEN o.i <= k.kk THEN o.cap
              ELSE (t.budget - k.csum_k) / (t.n - k.kk) END AS a
  FROM ord o, k, tot t
)
-- floor-quantized, NOT round(): the uniform share is an arbitrary rational
-- whose double can land exactly on a x.xx5*100 tie after the *100 step,
-- where Spark (BigDecimal HALF_UP on the true value) and DuckDB
-- (x*100 -> round -> /100) disagree; floor has no tie to break, so
-- identical input doubles give identical output in both engines.
SELECT source, CAST(toks AS BIGINT) AS tokens,
       floor(a * 100) / 100 AS alloc_tokens,
       floor(a / toks * 10000) / 10000 AS epochs
FROM alloc
"""


@register(
    "corpus_unimax_mix",
    UNIMAX_ORACLE,
    "UniMax source mixing (Chung et al. 2023): allocate a token budget "
    "(1.9x the corpus) as uniformly as possible across sources subject to "
    "a hard cap of 2 epochs per source — the closed-form waterfill: sort "
    "by capacity ascending, a source is capped iff giving every remaining "
    "source at least its capacity still fits the budget, survivors split "
    "the remainder evenly. Complements temperature mixing (no tail "
    "over-repetition) and DoReMi (no proxy model needed). The frame is "
    "source-cardinality-sized (thousands at 100 TB), so the single-"
    "partition window over it is deliberate and bounded; the only "
    "corpus-scale work is the per-source token-count aggregate.",
)
def q_corpus_unimax_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.sampling import unimax_allocation

    docs = load_table(spark, sf_dir, "documents")
    out = unimax_allocation(
        docs, "source", "text", epoch_cap=2.0, budget_factor=1.9
    )
    # floor-quantize (see the oracle comment): round() tie-breaks half-way
    # cases differently across engines; floor of the identical double never
    # does
    return out.select(
        "source",
        F.col("toks").cast("long").alias("tokens"),
        (F.floor(F.col("alloc") * 100) / 100).alias("alloc_tokens"),
        (F.floor(F.col("alloc") / F.col("toks") * 10000) / 10000).alias(
            "epochs"
        ),
    )


PHASH_DEDUP_ORACLE = """
WITH d AS (
  SELECT doc_id, CAST(doc_id // 4 AS VARCHAR) AS bs, doc_id % 4 AS v
  FROM documents
),
hx AS (
  SELECT doc_id, v,
         md5(bs || '_0') AS h0,
         md5(bs || '_1') AS h1,
         md5(bs || '_3') AS h3,
         md5(bs || '_5') AS h5,
         md5(bs || '_7') AS h7,
         md5(bs || '_8') AS h8,
         md5(bs || '_10') AS h10,
         md5(bs || '_12') AS h12,
         md5(bs || '_14') AS h14,
         md5(bs || '_16') AS h16,
         md5(bs || '_17') AS h17,
         md5(bs || '_19') AS h19,
         md5(bs || '_21') AS h21,
         md5(bs || '_23') AS h23,
         md5(bs || '_24') AS h24,
         md5(bs || '_26') AS h26,
         md5(bs || '_28') AS h28,
         md5(bs || '_30') AS h30,
         md5(bs || '_32') AS h32,
         md5(bs || '_33') AS h33,
         md5(bs || '_35') AS h35,
         md5(bs || '_37') AS h37,
         md5(bs || '_39') AS h39,
         md5(bs || '_40') AS h40,
         md5(bs || '_42') AS h42,
         md5(bs || '_44') AS h44,
         md5(bs || '_46') AS h46,
         md5(bs || '_48') AS h48,
         md5(bs || '_49') AS h49,
         md5(bs || '_51') AS h51,
         md5(bs || '_53') AS h53,
         md5(bs || '_55') AS h55,
         md5(bs || '_56') AS h56,
         md5(bs || '_58') AS h58,
         md5(bs || '_60') AS h60,
         md5(bs || '_62') AS h62,
         md5(bs || '_64') AS h64,
         md5(bs || '_65') AS h65,
         md5(bs || '_67') AS h67,
         md5(bs || '_69') AS h69,
         md5(bs || '_71') AS h71,
         md5(bs || '_72') AS h72,
         md5(bs || '_74') AS h74,
         md5(bs || '_76') AS h76,
         md5(bs || '_78') AS h78,
         md5(bs || '_80') AS h80,
         md5(bs || '_81') AS h81,
         md5(bs || '_83') AS h83,
         md5(bs || '_85') AS h85,
         md5(bs || '_87') AS h87,
         md5(bs || '_88') AS h88,
         md5(bs || '_90') AS h90,
         md5(bs || '_92') AS h92,
         md5(bs || '_94') AS h94,
         md5(bs || '_96') AS h96,
         md5(bs || '_97') AS h97,
         md5(bs || '_99') AS h99,
         md5(bs || '_101') AS h101,
         md5(bs || '_103') AS h103,
         md5(bs || '_104') AS h104,
         md5(bs || '_106') AS h106,
         md5(bs || '_108') AS h108,
         md5(bs || '_110') AS h110,
         md5(bs || '_112') AS h112,
         md5(bs || '_113') AS h113,
         md5(bs || '_115') AS h115,
         md5(bs || '_117') AS h117,
         md5(bs || '_119') AS h119,
         md5(bs || '_120') AS h120,
         md5(bs || '_122') AS h122,
         md5(bs || '_124') AS h124,
         md5(bs || '_126') AS h126
  FROM d
),
gr AS (
  SELECT doc_id, v,
         [(((strpos('0123456789abcdef', substr(h112, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h112, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h112, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h112, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h112, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h112, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h113, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h113, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h113, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h113, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h113, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h113, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h115, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h115, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h115, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h115, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h115, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h115, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h117, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h117, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h117, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h117, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h117, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h117, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h119, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h119, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h119, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h119, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h119, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h119, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h120, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h120, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h120, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h120, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h120, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h120, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h122, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h122, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h122, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h122, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h122, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h122, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h124, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h124, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h124, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h124, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h124, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h124, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h126, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h126, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h126, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h126, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h126, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h126, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h96, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h96, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h96, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h96, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h96, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h96, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h97, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h97, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h97, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h97, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h97, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h97, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h99, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h99, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h99, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h99, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h99, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h99, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h101, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h101, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h101, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h101, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h101, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h101, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h103, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h103, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h103, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h103, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h103, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h103, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h104, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h104, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h104, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h104, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h104, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h104, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h106, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h106, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h106, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h106, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h106, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h106, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h108, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h108, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h108, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h108, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h108, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h108, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h110, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h110, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h110, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h110, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h110, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h110, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h80, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h80, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h80, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h80, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h80, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h80, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h81, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h81, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h81, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h81, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h81, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h81, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h83, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h83, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h83, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h83, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h83, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h83, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h85, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h85, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h85, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h85, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h85, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h85, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h87, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h87, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h87, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h87, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h87, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h87, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h88, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h88, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h88, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h88, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h88, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h88, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h90, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h90, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h90, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h90, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h90, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h90, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h92, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h92, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h92, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h92, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h92, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h92, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h94, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h94, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h94, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h94, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h94, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h94, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h64, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h64, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h64, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h64, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h64, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h64, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h65, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h65, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h65, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h65, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h65, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h65, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h67, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h67, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h67, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h67, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h67, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h67, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h69, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h69, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h69, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h69, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h69, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h69, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h71, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h71, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h71, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h71, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h71, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h71, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h72, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h72, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h72, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h72, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h72, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h72, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h74, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h74, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h74, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h74, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h74, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h74, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h76, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h76, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h76, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h76, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h76, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h76, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h78, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h78, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h78, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h78, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h78, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h78, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h48, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h48, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h48, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h48, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h48, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h48, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h49, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h49, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h49, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h49, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h49, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h49, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h51, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h51, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h51, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h51, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h51, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h51, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h53, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h53, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h53, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h53, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h53, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h53, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h55, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h55, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h55, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h55, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h55, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h55, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h56, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h56, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h56, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h56, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h56, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h56, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h58, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h58, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h58, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h58, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h58, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h58, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h60, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h60, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h60, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h60, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h60, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h60, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h62, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h62, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h62, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h62, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h62, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h62, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h32, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h32, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h32, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h32, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h32, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h32, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h33, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h33, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h33, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h33, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h33, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h33, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h35, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h35, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h35, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h35, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h35, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h35, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h37, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h37, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h37, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h37, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h37, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h37, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h39, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h39, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h39, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h39, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h39, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h39, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h40, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h40, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h40, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h40, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h40, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h40, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h42, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h42, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h42, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h42, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h42, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h42, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h44, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h44, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h44, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h44, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h44, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h44, 6, 1)) - 1)) // 3,
          (((strpos('0123456789abcdef', substr(h46, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h46, 2, 1)) - 1) + ((strpos('0123456789abcdef', substr(h46, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h46, 4, 1)) - 1) + ((strpos('0123456789abcdef', substr(h46, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h46, 6, 1)) - 1)) // 3,
          (((((strpos('0123456789abcdef', substr(h16, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h16, 2, 1)) - 1) + CASE WHEN v > 0 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h16, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h16, 4, 1)) - 1) + CASE WHEN v > 0 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h16, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h16, 6, 1)) - 1) + CASE WHEN v > 0 THEN 128 ELSE 0 END) % 256)) // 3,
          (((((strpos('0123456789abcdef', substr(h17, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h17, 2, 1)) - 1) + CASE WHEN v > 1 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h17, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h17, 4, 1)) - 1) + CASE WHEN v > 1 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h17, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h17, 6, 1)) - 1) + CASE WHEN v > 1 THEN 128 ELSE 0 END) % 256)) // 3,
          (((((strpos('0123456789abcdef', substr(h19, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h19, 2, 1)) - 1) + CASE WHEN v > 3 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h19, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h19, 4, 1)) - 1) + CASE WHEN v > 3 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h19, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h19, 6, 1)) - 1) + CASE WHEN v > 3 THEN 128 ELSE 0 END) % 256)) // 3,
          (((((strpos('0123456789abcdef', substr(h21, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h21, 2, 1)) - 1) + CASE WHEN v > 1 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h21, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h21, 4, 1)) - 1) + CASE WHEN v > 1 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h21, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h21, 6, 1)) - 1) + CASE WHEN v > 1 THEN 128 ELSE 0 END) % 256)) // 3,
          (((((strpos('0123456789abcdef', substr(h23, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h23, 2, 1)) - 1) + CASE WHEN v > 3 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h23, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h23, 4, 1)) - 1) + CASE WHEN v > 3 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h23, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h23, 6, 1)) - 1) + CASE WHEN v > 3 THEN 128 ELSE 0 END) % 256)) // 3,
          (((((strpos('0123456789abcdef', substr(h24, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h24, 2, 1)) - 1) + CASE WHEN v > 0 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h24, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h24, 4, 1)) - 1) + CASE WHEN v > 0 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h24, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h24, 6, 1)) - 1) + CASE WHEN v > 0 THEN 128 ELSE 0 END) % 256)) // 3,
          (((((strpos('0123456789abcdef', substr(h26, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h26, 2, 1)) - 1) + CASE WHEN v > 2 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h26, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h26, 4, 1)) - 1) + CASE WHEN v > 2 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h26, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h26, 6, 1)) - 1) + CASE WHEN v > 2 THEN 128 ELSE 0 END) % 256)) // 3,
          (((((strpos('0123456789abcdef', substr(h28, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h28, 2, 1)) - 1) + CASE WHEN v > 0 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h28, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h28, 4, 1)) - 1) + CASE WHEN v > 0 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h28, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h28, 6, 1)) - 1) + CASE WHEN v > 0 THEN 128 ELSE 0 END) % 256)) // 3,
          (((((strpos('0123456789abcdef', substr(h30, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h30, 2, 1)) - 1) + CASE WHEN v > 2 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h30, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h30, 4, 1)) - 1) + CASE WHEN v > 2 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h30, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h30, 6, 1)) - 1) + CASE WHEN v > 2 THEN 128 ELSE 0 END) % 256)) // 3,
          (((((strpos('0123456789abcdef', substr(h0, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h0, 2, 1)) - 1) + CASE WHEN v > 0 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h0, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h0, 4, 1)) - 1) + CASE WHEN v > 0 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h0, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h0, 6, 1)) - 1) + CASE WHEN v > 0 THEN 128 ELSE 0 END) % 256)) // 3,
          (((((strpos('0123456789abcdef', substr(h1, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h1, 2, 1)) - 1) + CASE WHEN v > 1 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h1, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h1, 4, 1)) - 1) + CASE WHEN v > 1 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h1, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h1, 6, 1)) - 1) + CASE WHEN v > 1 THEN 128 ELSE 0 END) % 256)) // 3,
          (((((strpos('0123456789abcdef', substr(h3, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h3, 2, 1)) - 1) + CASE WHEN v > 3 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h3, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h3, 4, 1)) - 1) + CASE WHEN v > 3 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h3, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h3, 6, 1)) - 1) + CASE WHEN v > 3 THEN 128 ELSE 0 END) % 256)) // 3,
          (((((strpos('0123456789abcdef', substr(h5, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h5, 2, 1)) - 1) + CASE WHEN v > 1 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h5, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h5, 4, 1)) - 1) + CASE WHEN v > 1 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h5, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h5, 6, 1)) - 1) + CASE WHEN v > 1 THEN 128 ELSE 0 END) % 256)) // 3,
          (((((strpos('0123456789abcdef', substr(h7, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h7, 2, 1)) - 1) + CASE WHEN v > 3 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h7, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h7, 4, 1)) - 1) + CASE WHEN v > 3 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h7, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h7, 6, 1)) - 1) + CASE WHEN v > 3 THEN 128 ELSE 0 END) % 256)) // 3,
          (((((strpos('0123456789abcdef', substr(h8, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h8, 2, 1)) - 1) + CASE WHEN v > 0 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h8, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h8, 4, 1)) - 1) + CASE WHEN v > 0 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h8, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h8, 6, 1)) - 1) + CASE WHEN v > 0 THEN 128 ELSE 0 END) % 256)) // 3,
          (((((strpos('0123456789abcdef', substr(h10, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h10, 2, 1)) - 1) + CASE WHEN v > 2 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h10, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h10, 4, 1)) - 1) + CASE WHEN v > 2 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h10, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h10, 6, 1)) - 1) + CASE WHEN v > 2 THEN 128 ELSE 0 END) % 256)) // 3,
          (((((strpos('0123456789abcdef', substr(h12, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h12, 2, 1)) - 1) + CASE WHEN v > 0 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h12, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h12, 4, 1)) - 1) + CASE WHEN v > 0 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h12, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h12, 6, 1)) - 1) + CASE WHEN v > 0 THEN 128 ELSE 0 END) % 256)) // 3,
          (((((strpos('0123456789abcdef', substr(h14, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h14, 2, 1)) - 1) + CASE WHEN v > 2 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h14, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h14, 4, 1)) - 1) + CASE WHEN v > 2 THEN 128 ELSE 0 END) % 256) + ((((strpos('0123456789abcdef', substr(h14, 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(h14, 6, 1)) - 1) + CASE WHEN v > 2 THEN 128 ELSE 0 END) % 256)) // 3] AS g
  FROM hx
),
bnd AS (
  SELECT doc_id,
     (CASE WHEN g[2] > g[1] THEN 1 ELSE 0 END
     + CASE WHEN g[3] > g[2] THEN 2 ELSE 0 END
     + CASE WHEN g[4] > g[3] THEN 4 ELSE 0 END
     + CASE WHEN g[5] > g[4] THEN 8 ELSE 0 END
     + CASE WHEN g[6] > g[5] THEN 16 ELSE 0 END
     + CASE WHEN g[7] > g[6] THEN 32 ELSE 0 END
     + CASE WHEN g[8] > g[7] THEN 64 ELSE 0 END
     + CASE WHEN g[9] > g[8] THEN 128 ELSE 0 END
     + CASE WHEN g[11] > g[10] THEN 256 ELSE 0 END
     + CASE WHEN g[12] > g[11] THEN 512 ELSE 0 END
     + CASE WHEN g[13] > g[12] THEN 1024 ELSE 0 END
     + CASE WHEN g[14] > g[13] THEN 2048 ELSE 0 END
     + CASE WHEN g[15] > g[14] THEN 4096 ELSE 0 END
     + CASE WHEN g[16] > g[15] THEN 8192 ELSE 0 END
     + CASE WHEN g[17] > g[16] THEN 16384 ELSE 0 END
     + CASE WHEN g[18] > g[17] THEN 32768 ELSE 0 END) AS b0,
     (CASE WHEN g[20] > g[19] THEN 1 ELSE 0 END
     + CASE WHEN g[21] > g[20] THEN 2 ELSE 0 END
     + CASE WHEN g[22] > g[21] THEN 4 ELSE 0 END
     + CASE WHEN g[23] > g[22] THEN 8 ELSE 0 END
     + CASE WHEN g[24] > g[23] THEN 16 ELSE 0 END
     + CASE WHEN g[25] > g[24] THEN 32 ELSE 0 END
     + CASE WHEN g[26] > g[25] THEN 64 ELSE 0 END
     + CASE WHEN g[27] > g[26] THEN 128 ELSE 0 END
     + CASE WHEN g[29] > g[28] THEN 256 ELSE 0 END
     + CASE WHEN g[30] > g[29] THEN 512 ELSE 0 END
     + CASE WHEN g[31] > g[30] THEN 1024 ELSE 0 END
     + CASE WHEN g[32] > g[31] THEN 2048 ELSE 0 END
     + CASE WHEN g[33] > g[32] THEN 4096 ELSE 0 END
     + CASE WHEN g[34] > g[33] THEN 8192 ELSE 0 END
     + CASE WHEN g[35] > g[34] THEN 16384 ELSE 0 END
     + CASE WHEN g[36] > g[35] THEN 32768 ELSE 0 END) AS b1,
     (CASE WHEN g[38] > g[37] THEN 1 ELSE 0 END
     + CASE WHEN g[39] > g[38] THEN 2 ELSE 0 END
     + CASE WHEN g[40] > g[39] THEN 4 ELSE 0 END
     + CASE WHEN g[41] > g[40] THEN 8 ELSE 0 END
     + CASE WHEN g[42] > g[41] THEN 16 ELSE 0 END
     + CASE WHEN g[43] > g[42] THEN 32 ELSE 0 END
     + CASE WHEN g[44] > g[43] THEN 64 ELSE 0 END
     + CASE WHEN g[45] > g[44] THEN 128 ELSE 0 END
     + CASE WHEN g[47] > g[46] THEN 256 ELSE 0 END
     + CASE WHEN g[48] > g[47] THEN 512 ELSE 0 END
     + CASE WHEN g[49] > g[48] THEN 1024 ELSE 0 END
     + CASE WHEN g[50] > g[49] THEN 2048 ELSE 0 END
     + CASE WHEN g[51] > g[50] THEN 4096 ELSE 0 END
     + CASE WHEN g[52] > g[51] THEN 8192 ELSE 0 END
     + CASE WHEN g[53] > g[52] THEN 16384 ELSE 0 END
     + CASE WHEN g[54] > g[53] THEN 32768 ELSE 0 END) AS b2,
     (CASE WHEN g[56] > g[55] THEN 1 ELSE 0 END
     + CASE WHEN g[57] > g[56] THEN 2 ELSE 0 END
     + CASE WHEN g[58] > g[57] THEN 4 ELSE 0 END
     + CASE WHEN g[59] > g[58] THEN 8 ELSE 0 END
     + CASE WHEN g[60] > g[59] THEN 16 ELSE 0 END
     + CASE WHEN g[61] > g[60] THEN 32 ELSE 0 END
     + CASE WHEN g[62] > g[61] THEN 64 ELSE 0 END
     + CASE WHEN g[63] > g[62] THEN 128 ELSE 0 END
     + CASE WHEN g[65] > g[64] THEN 256 ELSE 0 END
     + CASE WHEN g[66] > g[65] THEN 512 ELSE 0 END
     + CASE WHEN g[67] > g[66] THEN 1024 ELSE 0 END
     + CASE WHEN g[68] > g[67] THEN 2048 ELSE 0 END
     + CASE WHEN g[69] > g[68] THEN 4096 ELSE 0 END
     + CASE WHEN g[70] > g[69] THEN 8192 ELSE 0 END
     + CASE WHEN g[71] > g[70] THEN 16384 ELSE 0 END
     + CASE WHEN g[72] > g[71] THEN 32768 ELSE 0 END) AS b3
  FROM gr
),
ex AS (
  SELECT doc_id, 0 AS j, b0 AS w, b0, b1, b2, b3 FROM bnd UNION ALL
  SELECT doc_id, 1, b1, b0, b1, b2, b3 FROM bnd UNION ALL
  SELECT doc_id, 2, b2, b0, b1, b2, b3 FROM bnd UNION ALL
  SELECT doc_id, 3, b3, b0, b1, b2, b3 FROM bnd
),
ok AS (SELECT j, w FROM ex GROUP BY j, w HAVING count(*) <= 50),
exk AS (SELECT ex.* FROM ex JOIN ok USING (j, w))
SELECT id_a, id_b, hamming FROM (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
              + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
              AS BIGINT) AS hamming
  FROM exk a JOIN exk b
    ON a.j = b.j AND a.w = b.w AND a.doc_id < b.doc_id
) WHERE hamming <= 12
"""


@register(
    "multimodal_phash_dedup",
    PHASH_DEDUP_ORACLE,
    "Image near-duplicate dedup via perceptual hash (dHash, Krawetz) - "
    "the round-8 VERDICT gap: decoders and banding existed but nothing "
    "composed them, and every multimodal training corpus dedups images "
    "(the reference has no image path at all). Complete 16x8 BMPs are "
    "built from md5-noise pixel formulas (groups of 4 doc_ids share a "
    "base image, variants perturb only the bottom two rows), REALLY "
    "decoded (header offsets, 4-byte stride, bottom-up rows), grayscale "
    "9x8-grid difference-hashed into four 16-bit bands executor-side "
    "(Arrow mapInPandas), then paired by band equi-join with the dedup "
    "family's hot-bucket cap and verified EXACTLY with bit_count(xor) "
    "in Catalyst. The oracle replays pixels, grays, all 64 hash bits, "
    "banding, and Hamming verification from the generating formulas - "
    "a wrong stride, flipped row order, or off-by-one grid sample "
    "hash-mismatches. Scale: the hash index is ~1e-6 of payload bytes; "
    "ONE (band, word) shuffle; pair mass bounded by band buckets, "
    "never all-pairs.",
)
def q_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.multimodal.phash import (
        phash_bands,
        phash_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    bands = phash_bands(docs, "doc_id")
    return phash_near_dup_pairs(bands, max_hamming=12, max_bucket=50).select(
        "id_a", "id_b", "hamming"
    )


# The PNG corpus is the BMP corpus re-keyed: every md5 pixel seed gains a
# "png" salt (distinct images, hence distinct pairs, same structural
# contract), so its oracle is the generated BMP oracle with the salt
# spliced into each of the 72 gray-sample seeds. The assert pins the
# splice count to the 9x8 grid's sample set.
PHASH_PNG_ORACLE = PHASH_DEDUP_ORACLE.replace(
    "md5(bs || '_", "md5('png' || bs || '_"
)
assert PHASH_DEDUP_ORACLE.count("md5(bs || '_") == 72


@register(
    "multimodal_phash_png",
    PHASH_PNG_ORACLE,
    "Perceptual near-dup dedup over COMPRESSED payloads — the format a "
    "real crawl actually stores (VERDICT r9 ask #6): complete valid "
    "non-interlaced 8-bit RGB PNGs (scanline y filtered with type y%5, "
    "so all five PNG filters are live corpus-wide) are REALLY decoded "
    "executor-side — chunk walk, zlib inflate, Sub/Up/Average/Paeth "
    "unfiltering (multimodal.binary.decode_png) — then difference-hashed "
    "through the SAME shared gray/grid/band core as the BMP path and "
    "paired by the same capped band equi-join + bit_count(xor) verify. "
    "The oracle replays the DECODED pixels from the generating formulas "
    "(the multimodal_png_decode pattern: DuckDB cannot inflate, so the "
    "pixel values are the recomputable ground truth) through all 64 "
    "hash bits, banding, and Hamming verification — one wrong byte out "
    "of the unfilter chain anywhere in the corpus flips a hash bit and "
    "mismatches. Same 100 TB shape as the BMP row: 64-bit index per "
    "image, ONE (band, word) shuffle, pair mass bounded by buckets.",
)
def q_multimodal_phash_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.multimodal.phash import (
        phash_bands,
        phash_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    bands = phash_bands(docs, "doc_id", fmt="png")
    return phash_near_dup_pairs(bands, max_hamming=12, max_bucket=50).select(
        "id_a", "id_b", "hamming"
    )


BPE_TRAIN_ORACLE = """
WITH occ AS (
  SELECT UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents
),
vocab AS (SELECT word, count(*) AS cnt FROM occ GROUP BY 1),
v0 AS (
  SELECT word, cnt,
         list_transform(generate_series(1, len(word)), i -> word[i]) AS syms
  FROM vocab
),
p1 AS (
  SELECT syms[i] AS l, syms[i+1] AS r, sum(cnt) AS c
  FROM (SELECT cnt, syms, UNNEST(generate_series(1, len(syms) - 1)) AS i
        FROM v0 WHERE len(syms) >= 2)
  GROUP BY 1, 2
),
b1 AS (SELECT l, r, CAST(c AS BIGINT) AS c
         FROM p1 ORDER BY c DESC, l, r LIMIT 1),
v1 AS (
  SELECT v.word, v.cnt,
         str_split(list_reduce(v.syms, (acc, x) ->
           CASE WHEN (acc = b.l OR ends_with(acc, chr(9) || b.l))
                     AND x = b.r
                THEN acc || b.r ELSE acc || chr(9) || x END),
           chr(9)) AS syms
  FROM v0 v, b1 b
),
s1 AS (
  SELECT CAST(1 AS BIGINT) AS rank, b.l AS lft, b.r AS rgt,
         b.c AS pair_count,
         (SELECT CAST(sum(cnt * len(syms)) AS BIGINT) FROM v1)
           AS tokens_after
  FROM b1 b
),
p2 AS (
  SELECT syms[i] AS l, syms[i+1] AS r, sum(cnt) AS c
  FROM (SELECT cnt, syms, UNNEST(generate_series(1, len(syms) - 1)) AS i
        FROM v1 WHERE len(syms) >= 2)
  GROUP BY 1, 2
),
b2 AS (SELECT l, r, CAST(c AS BIGINT) AS c
         FROM p2 ORDER BY c DESC, l, r LIMIT 1),
v2 AS (
  SELECT v.word, v.cnt,
         str_split(list_reduce(v.syms, (acc, x) ->
           CASE WHEN (acc = b.l OR ends_with(acc, chr(9) || b.l))
                     AND x = b.r
                THEN acc || b.r ELSE acc || chr(9) || x END),
           chr(9)) AS syms
  FROM v1 v, b2 b
),
s2 AS (
  SELECT CAST(2 AS BIGINT) AS rank, b.l AS lft, b.r AS rgt,
         b.c AS pair_count,
         (SELECT CAST(sum(cnt * len(syms)) AS BIGINT) FROM v2)
           AS tokens_after
  FROM b2 b
),
p3 AS (
  SELECT syms[i] AS l, syms[i+1] AS r, sum(cnt) AS c
  FROM (SELECT cnt, syms, UNNEST(generate_series(1, len(syms) - 1)) AS i
        FROM v2 WHERE len(syms) >= 2)
  GROUP BY 1, 2
),
b3 AS (SELECT l, r, CAST(c AS BIGINT) AS c
         FROM p3 ORDER BY c DESC, l, r LIMIT 1),
v3 AS (
  SELECT v.word, v.cnt,
         str_split(list_reduce(v.syms, (acc, x) ->
           CASE WHEN (acc = b.l OR ends_with(acc, chr(9) || b.l))
                     AND x = b.r
                THEN acc || b.r ELSE acc || chr(9) || x END),
           chr(9)) AS syms
  FROM v2 v, b3 b
),
s3 AS (
  SELECT CAST(3 AS BIGINT) AS rank, b.l AS lft, b.r AS rgt,
         b.c AS pair_count,
         (SELECT CAST(sum(cnt * len(syms)) AS BIGINT) FROM v3)
           AS tokens_after
  FROM b3 b
),
p4 AS (
  SELECT syms[i] AS l, syms[i+1] AS r, sum(cnt) AS c
  FROM (SELECT cnt, syms, UNNEST(generate_series(1, len(syms) - 1)) AS i
        FROM v3 WHERE len(syms) >= 2)
  GROUP BY 1, 2
),
b4 AS (SELECT l, r, CAST(c AS BIGINT) AS c
         FROM p4 ORDER BY c DESC, l, r LIMIT 1),
v4 AS (
  SELECT v.word, v.cnt,
         str_split(list_reduce(v.syms, (acc, x) ->
           CASE WHEN (acc = b.l OR ends_with(acc, chr(9) || b.l))
                     AND x = b.r
                THEN acc || b.r ELSE acc || chr(9) || x END),
           chr(9)) AS syms
  FROM v3 v, b4 b
),
s4 AS (
  SELECT CAST(4 AS BIGINT) AS rank, b.l AS lft, b.r AS rgt,
         b.c AS pair_count,
         (SELECT CAST(sum(cnt * len(syms)) AS BIGINT) FROM v4)
           AS tokens_after
  FROM b4 b
),
p5 AS (
  SELECT syms[i] AS l, syms[i+1] AS r, sum(cnt) AS c
  FROM (SELECT cnt, syms, UNNEST(generate_series(1, len(syms) - 1)) AS i
        FROM v4 WHERE len(syms) >= 2)
  GROUP BY 1, 2
),
b5 AS (SELECT l, r, CAST(c AS BIGINT) AS c
         FROM p5 ORDER BY c DESC, l, r LIMIT 1),
v5 AS (
  SELECT v.word, v.cnt,
         str_split(list_reduce(v.syms, (acc, x) ->
           CASE WHEN (acc = b.l OR ends_with(acc, chr(9) || b.l))
                     AND x = b.r
                THEN acc || b.r ELSE acc || chr(9) || x END),
           chr(9)) AS syms
  FROM v4 v, b5 b
),
s5 AS (
  SELECT CAST(5 AS BIGINT) AS rank, b.l AS lft, b.r AS rgt,
         b.c AS pair_count,
         (SELECT CAST(sum(cnt * len(syms)) AS BIGINT) FROM v5)
           AS tokens_after
  FROM b5 b
),
p6 AS (
  SELECT syms[i] AS l, syms[i+1] AS r, sum(cnt) AS c
  FROM (SELECT cnt, syms, UNNEST(generate_series(1, len(syms) - 1)) AS i
        FROM v5 WHERE len(syms) >= 2)
  GROUP BY 1, 2
),
b6 AS (SELECT l, r, CAST(c AS BIGINT) AS c
         FROM p6 ORDER BY c DESC, l, r LIMIT 1),
v6 AS (
  SELECT v.word, v.cnt,
         str_split(list_reduce(v.syms, (acc, x) ->
           CASE WHEN (acc = b.l OR ends_with(acc, chr(9) || b.l))
                     AND x = b.r
                THEN acc || b.r ELSE acc || chr(9) || x END),
           chr(9)) AS syms
  FROM v5 v, b6 b
),
s6 AS (
  SELECT CAST(6 AS BIGINT) AS rank, b.l AS lft, b.r AS rgt,
         b.c AS pair_count,
         (SELECT CAST(sum(cnt * len(syms)) AS BIGINT) FROM v6)
           AS tokens_after
  FROM b6 b
),
p7 AS (
  SELECT syms[i] AS l, syms[i+1] AS r, sum(cnt) AS c
  FROM (SELECT cnt, syms, UNNEST(generate_series(1, len(syms) - 1)) AS i
        FROM v6 WHERE len(syms) >= 2)
  GROUP BY 1, 2
),
b7 AS (SELECT l, r, CAST(c AS BIGINT) AS c
         FROM p7 ORDER BY c DESC, l, r LIMIT 1),
v7 AS (
  SELECT v.word, v.cnt,
         str_split(list_reduce(v.syms, (acc, x) ->
           CASE WHEN (acc = b.l OR ends_with(acc, chr(9) || b.l))
                     AND x = b.r
                THEN acc || b.r ELSE acc || chr(9) || x END),
           chr(9)) AS syms
  FROM v6 v, b7 b
),
s7 AS (
  SELECT CAST(7 AS BIGINT) AS rank, b.l AS lft, b.r AS rgt,
         b.c AS pair_count,
         (SELECT CAST(sum(cnt * len(syms)) AS BIGINT) FROM v7)
           AS tokens_after
  FROM b7 b
),
p8 AS (
  SELECT syms[i] AS l, syms[i+1] AS r, sum(cnt) AS c
  FROM (SELECT cnt, syms, UNNEST(generate_series(1, len(syms) - 1)) AS i
        FROM v7 WHERE len(syms) >= 2)
  GROUP BY 1, 2
),
b8 AS (SELECT l, r, CAST(c AS BIGINT) AS c
         FROM p8 ORDER BY c DESC, l, r LIMIT 1),
v8 AS (
  SELECT v.word, v.cnt,
         str_split(list_reduce(v.syms, (acc, x) ->
           CASE WHEN (acc = b.l OR ends_with(acc, chr(9) || b.l))
                     AND x = b.r
                THEN acc || b.r ELSE acc || chr(9) || x END),
           chr(9)) AS syms
  FROM v7 v, b8 b
),
s8 AS (
  SELECT CAST(8 AS BIGINT) AS rank, b.l AS lft, b.r AS rgt,
         b.c AS pair_count,
         (SELECT CAST(sum(cnt * len(syms)) AS BIGINT) FROM v8)
           AS tokens_after
  FROM b8 b
)
SELECT * FROM s1
UNION ALL
SELECT * FROM s2
UNION ALL
SELECT * FROM s3
UNION ALL
SELECT * FROM s4
UNION ALL
SELECT * FROM s5
UNION ALL
SELECT * FROM s6
UNION ALL
SELECT * FROM s7
UNION ALL
SELECT * FROM s8
"""


@register(
    "text_bpe_train",
    BPE_TRAIN_ORACLE,
    "Distributed BPE merge TRAINING (Sennrich et al. 2016) - learns the "
    "merge table bpe_encode/text_bpe_encode apply from a pinned one "
    "(operators/text_stats.py BPE_MERGES): 8 unrolled rounds, each ONE "
    "vocabulary-level (l, r) pair aggregation weighted by word counts, "
    "a 1-row argmax winner ((count desc, l, r) tiebreak) joined back by "
    "broadcast (no driver collect), and the same left-to-right fold "
    "bpe_encode uses to apply it. Output is the learned table in rank "
    "order plus the corpus token count after each merge - the "
    "compression curve that justifies a vocabulary budget; the rows "
    "feed bpe_encode(word, merges=...) directly (pinned by pytest). "
    "Oracle: 8 chained CTE rounds, the graph_pagerank_centrality "
    "unrolled pattern, sharing the encode oracle's list_reduce fold "
    "idiom. Scale: the corpus is tokenized/counted ONCE; every round "
    "runs at vocabulary scale (Heaps law), so 100x the corpus grows "
    "the per-round aggregation input hardly at all.",
)
def q_text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.text_stats import bpe_train_merges

    docs = load_table(spark, sf_dir, "documents").select("text")
    return bpe_train_merges(docs, "text", rounds=8)


# Image near-dup CLUSTERS: the phash pair oracle (with its generated
# 72-gray-expression body) nested as a CTE, closed transitively with the
# same WITH RECURSIVE reach pattern as dedup_cluster_resolution, rolled up
# to keep-decisions. Membership is pinned by an md5 over the numerically
# sorted member list so a single mis-clustered doc hash-mismatches.
PHASH_CLUSTERS_ORACLE = (
    "WITH RECURSIVE p0 AS (" + PHASH_DEDUP_ORACLE + """),
edges AS (
  SELECT id_a AS a, id_b AS b FROM p0
  UNION
  SELECT id_b AS a, id_a AS b FROM p0
),
reach(n, m) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
),
cc AS (SELECT n AS doc_id, min(m) AS rep FROM reach GROUP BY n)
SELECT rep AS keep_id, CAST(count(*) AS BIGINT) AS n_members,
       bit_xor(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT)) AS members_fp
FROM cc GROUP BY rep
"""
)


@register(
    "multimodal_phash_clusters",
    PHASH_CLUSTERS_ORACLE,
    "Image near-dup dedup taken to its KEEP decision: the phash Hamming "
    "pairs resolve into clusters (iterative min-label propagation, the "
    "same connected_components the text dedup family uses) and each "
    "cluster keeps its min-id representative — (keep_id, n_members, "
    "members_fp), with membership pinned by a COMMUTATIVE fingerprint: "
    "bit_xor over a per-member 60-bit md5-prefix hash plus the member "
    "count. Unlike a collect_list/string_agg digest, the xor reduces "
    "member-by-member with a constant-size aggregation buffer, so an "
    "adversarial mega-cluster (boilerplate images chaining thousands of "
    "members) can never concentrate a cluster's membership in one "
    "buffer (VERDICT r9 'what's wrong' #2). The oracle nests the full "
    "generated phash pair oracle as a CTE and closes it with WITH "
    "RECURSIVE reachability (the dedup_cluster_resolution pattern). "
    "Scale: pair graph << corpus (matched images only), per-round cost "
    "is one edge-sized shuffle, rounds ~ cluster diameter (<= 4-member "
    "groups here).",
)
def q_multimodal_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.multimodal.phash import (
        phash_bands,
        phash_near_dup_pairs,
    )
    from yaml_pipe_spark.operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = phash_near_dup_pairs(
        phash_bands(docs, "doc_id"), max_hamming=12, max_bucket=50
    ).select("id_a", "id_b")
    cc = connected_components(pairs)
    # 60-bit hash (15 hex chars) so the unsigned conv result always fits
    # a signed BIGINT in both engines; xor is order-insensitive, so no
    # sort and no per-cluster membership materialization
    member_h = F.conv(
        F.substring(F.md5(F.col("node").cast("string")), 1, 15), 16, 10
    ).cast("long")
    return cc.groupBy(F.col("cluster_rep").alias("keep_id")).agg(
        F.count("*").cast("long").alias("n_members"),
        F.bit_xor(member_h).alias("members_fp"),
    )


# The round driver validates a *prefix* of the queries() dict (each round
# records exactly the first 50 entries in insertion order). Round 9 rotation,
# in priority order:
#   1. flagship (the smoke-checked canary),
#   2. the ROUND9_QUEUE — the twenty-nine round-4-generation rows whose
#      newest driver row is still r4 (VERDICT r8 ask #1), plus the eight
#      ROUND4_FILL rows that fell past round 8's 50-entry boundary — after
#      these the oldest attestation anywhere in the registry is >= r5,
#   3. queries NEW in round 9 or whose implementation CHANGED in round 9
#      (the ADVICE fixes, the float-hazard hardening sweep, the
#      perceptual-hash dedup / BPE-training additions; grows as waves land),
#   4. round-5-generation refresh fill, oldest-first as slots allow (only
#      entries inside the first 50 get a driver row; the rest stay r5 and
#      queue for round 10).
# Registry entries not listed here follow in registration order (still covered
# by bench.py and the local sf0.001/sf0.01/sf0.1 oracle-parity runs every
# round). Keep the sets in tests/test_registry_order.py in sync so the prefix
# invariant stays pinned.
DRIVER_ORDER: list[str] = [
    "flagship",  # canary: the smoke-checked query stays first
    # -- (2) ROUND11_QUEUE: round-6-generation attestation debt (VERDICT
    #        r10 ask #1), by family --
    "ann_index_persisted",
    "ann_ivf_nprobe_curve",
    "ann_ivfpq_residual_topk",
    "ann_ivfpq_topk",
    "dedup_minhash_band_curve",
    "emb_ivf_cell_balance",
    "events_anomaly_zscore",
    "events_cms_heavy_hitters",
    "events_decayed_score",
    "events_funnel",
    "events_grouping_sets",
    "events_interval_join",
    "events_retention_cohorts",
    "events_rfm_segments",
    "events_top_paths",
    "multimodal_decode_check",
    "multimodal_gif_decode",
    "rel_equidepth_histogram",
    "rel_large_volume_customers",
    "rel_nation_balance_fulljoin",
    "rel_price_histogram",
    "rel_salted_join",
    "rel_scd2_history",
    "s1_parse_dispatch",
    "s1_parse_tar",
    "s1_parse_warc",
    "sample_bottom_k_sketch",
    "sample_weighted",
    "sql_udtf_chunk",
    "stream_ann_serve",
    "stream_incremental_dedup",
    "t4_timestamp_cursor",
    "text_bigram_holdout_ppl",
    "text_bpe_encode",
    "text_encoding_scrub",
    "text_entropy",
    "text_quality_thresholds",
    # -- (3) ROUND11_NEW: registered after round 10's 50-slot prefix was
    #        spent — never driver-attested (VERDICT r10 ask #1) --
    "ann_index_compact",
    "q3_bm25_compact",
    # -- (4) NEW or CHANGED in round 11 (grown as round-11 waves land) --
    # -- (5) round-7-generation refresh fill (only entries inside the
    #        first 50 get a driver row; the other 35 r7 rows queue for
    #        round 12 — ROUND12_QUEUE in tests/test_registry_order.py) --
    "s1_scan_nonempty",
    "t2_changed_anti_join",
    "c1_fixed_chunk",
    "dedup_minhash_lsh",
    "q3_bm25_topk",
    "ann_index_incremental",
    "stream_stateful_counter",
    "text_bloom_decontaminate",
    "stream_tumbling_agg",
    "text_pii_redact",
]


def _ordered_names() -> list[str]:
    """DRIVER_ORDER entries that exist, then the rest in registration order."""
    head = [n for n in DRIVER_ORDER if n in REGISTRY]
    tail = [n for n in REGISTRY if n not in set(head)]
    return head + tail


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
