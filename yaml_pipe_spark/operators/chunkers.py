"""Chunkers — row-expanding transforms (the reference's UDTF surface).

Reference semantics (SURVEY §2.2, components/chunkers.py):
- C1 RecursiveCharacterChunker (chunkers.py:39-87): langchain-style recursive
  split on paragraph -> line -> word -> char boundaries with overlap;
  empty/whitespace doc -> no chunks; chunk_index is 1-based.
- C2 MarkdownChunker (chunkers.py:90-138): split on #/##/### headers, header
  titles become metadata, hierarchical inheritance of parent headers.
- C3 AdaptiveChunker (chunkers.py:141-183): per-doc dispatch — markdown
  strategy iff content has >= 2 occurrences of "\\n# "/"\\n## "/"\\n### ".

Spark design: three operators.
- `fixed_window_chunks` — the oracle-checkable chunker: overlapping character
  windows via sequence+substring+posexplode. Fully SQL-expressible; this is
  the scale path (pure codegen, no Python).
- `markdown_chunks` — sentinel-split on header lines + posexplode, header
  metadata via regexp + last-ignorenulls window. SQL-expressible.
- `recursive_character_chunks` — parity with the reference's langchain
  splitter (validated against the reference's golden strings,
  tests/components/test_chunkers.py:19-26) as an Arrow-batched pandas UDF.
  Not oracle-checkable (rows-only); use fixed_window_chunks at scale.

All chunkers drop empty/whitespace docs and emit 1-based `chunk_index`.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from yaml_pipe_spark.functions.text import non_empty

SENTINEL = "\x01"

# ---------------------------------------------------------------------------
# C1a: fixed-window chunker (SQL-expressible; the 100 TB path)
# ---------------------------------------------------------------------------


def fixed_window_chunks(
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = 200,
    chunk_overlap: int = 40,
    chunk_col: str = "chunk",
    index_col: str = "chunk_index",
) -> DataFrame:
    """Overlapping character windows: starts 1, 1+step, ... step=size-overlap.

    Narrow transform (explode) — no shuffle; Catalyst pushes any downstream
    filter on the parent columns below the explode.

    DuckDB twin:
        SELECT ..., (s-1)//step + 1 AS chunk_index, substr(text, s, size)
        FROM t, UNNEST(generate_series(1, length(text), step)) ... (as list)
    """
    if chunk_overlap >= chunk_size:
        raise ValueError("chunk_overlap must be < chunk_size")
    step = chunk_size - chunk_overlap
    text = F.col(text_col)
    starts = F.sequence(F.lit(1), F.length(text), F.lit(step))
    other = [c for c in df.columns]
    return (
        df.filter(non_empty(text))
        .select(*other, F.posexplode(starts).alias("__pos", "__start"))
        .withColumn(index_col, (F.col("__pos") + 1).cast("long"))
        .withColumn(chunk_col, F.substring(text, F.col("__start"), F.lit(chunk_size)))
        .drop("__pos", "__start")
    )


# ---------------------------------------------------------------------------
# C2: markdown chunker (SQL-expressible)
# ---------------------------------------------------------------------------

_HEADER_SPLIT_RE = r"(?m)^(#{1,3} )"


def markdown_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    chunk_col: str = "chunk",
    index_col: str = "chunk_index",
) -> DataFrame:
    """Split a markdown document into header-delimited sections.

    Each section keeps its header line (the reference's tests assert chunks
    start with their header, tests/components/test_chunkers.py:29-39).
    Emits `header1/2/3` metadata with hierarchical inheritance: a `##` section
    inherits the most recent `#` title, mirroring MarkdownHeaderTextSplitter
    (components/chunkers.py:100-128).

    One window per doc_id (partitioned by the doc, ordered by section index) —
    at scale this is a single narrow shuffle on the doc key, bounded per-doc.
    """
    id_cols = id_cols or [c for c in df.columns if c != text_col]
    text = F.col(text_col)
    marked = F.regexp_replace(text, _HEADER_SPLIT_RE, SENTINEL + "$1")
    sections = F.split(marked, SENTINEL)
    out = (
        df.filter(non_empty(text))
        .select(*df.columns, F.posexplode(sections).alias("__pos", "__sec"))
        .withColumn("__sec", F.btrim(F.col("__sec"), F.lit(" \n\r\t")))
        .filter(F.length(F.col("__sec")) > 0)
    )
    first_line = F.split(F.col("__sec"), "\n").getItem(0)
    level = F.length(F.regexp_extract(first_line, r"^(#{1,3}) ", 1)).cast("long")
    title = F.regexp_extract(first_line, r"^#{1,3} (.*)$", 1)
    out = out.withColumn("__level", level).withColumn(
        "__title", F.when(level > 0, title)
    )

    from pyspark.sql import Window as W

    w = (
        W.partitionBy(*id_cols)
        .orderBy("__pos")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    h = {}
    for lvl in (1, 2, 3):
        # last seen title of level `lvl`, reset (null) when a shallower header
        # started a new scope after it: implemented as last-ignorenulls of
        # "title if level==lvl else null-marker", where any shallower header
        # emits an explicit reset marker.
        marker = F.when(F.col("__level") == lvl, F.col("__title")).when(
            (F.col("__level") > 0) & (F.col("__level") < lvl), F.lit(SENTINEL)
        )
        out = out.withColumn(f"__h{lvl}", F.last(marker, ignorenulls=True).over(w))
        h[lvl] = F.when(F.col(f"__h{lvl}") != SENTINEL, F.col(f"__h{lvl}"))

    w_idx = W.partitionBy(*id_cols).orderBy("__pos")
    out = (
        out.withColumn(index_col, F.row_number().over(w_idx).cast("long"))
        .withColumn(chunk_col, F.col("__sec"))
        .withColumn("header1", h[1])
        .withColumn("header2", h[2])
        .withColumn("header3", h[3])
    )
    return out.select(*id_cols, index_col, chunk_col, "header1", "header2", "header3")


# ---------------------------------------------------------------------------
# C3: adaptive dispatch
# ---------------------------------------------------------------------------

_MD_HINT_RES = (r"\n# ", r"\n## ", r"\n### ")


def is_markdownish(col: Column) -> Column:
    """Reference dispatch rule, EXACT semantics (chunkers.py:161-171):
    markdown iff >= 2 headers of the SAME level — count("\\n# ") >= 2 OR
    count("\\n## ") >= 2 OR count("\\n### ") >= 2. One "#" plus one "##"
    is NOT markdownish (and a header at position 0 has no leading newline,
    so it never counts), matching the reference's substring counts."""
    out = F.lit(False)
    for pat in _MD_HINT_RES:
        out = out | (F.size(F.regexp_extract_all(col, F.lit(pat), 0)) >= 2)
    return out


def adaptive_chunks(
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = 200,
    chunk_overlap: int = 40,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Per-row strategy choice (components/chunkers.py:173-183): markdown docs
    go through markdown_chunks, the rest through fixed_window_chunks.

    Implemented as filter + filter + unionByName — both branches stay lazy and
    Catalyst prunes each branch's scan to the rows it needs.
    """
    id_cols = id_cols or [c for c in df.columns if c != text_col]
    md = markdown_chunks(
        df.filter(is_markdownish(F.col(text_col))), text_col, id_cols=id_cols
    )
    fixed = (
        fixed_window_chunks(
            df.filter(~is_markdownish(F.col(text_col))),
            text_col,
            chunk_size,
            chunk_overlap,
        )
        .withColumn("header1", F.lit(None).cast("string"))
        .withColumn("header2", F.lit(None).cast("string"))
        .withColumn("header3", F.lit(None).cast("string"))
        .select(*id_cols, "chunk_index", "chunk", "header1", "header2", "header3")
    )
    return md.unionByName(fixed)


# ---------------------------------------------------------------------------
# C1b: langchain-parity recursive character chunker (pandas UDF)
# ---------------------------------------------------------------------------

DEFAULT_SEPARATORS = ["\n\n", "\n", " ", ""]


def _split_with_separator(text: str, sep: str) -> list[str]:
    """Split keeping the separator attached to the *following* piece
    (langchain keep_separator=True semantics)."""
    if sep == "":
        return [c for c in text]
    parts = re.split(f"({re.escape(sep)})", text)
    merged = [parts[i] + parts[i + 1] for i in range(1, len(parts) - 1, 2)]
    if len(parts) % 2 == 0:
        merged += parts[-1:]
    return [s for s in ([parts[0]] + merged) if s != ""]


def _merge_splits(
    splits: list[str], chunk_size: int, chunk_overlap: int
) -> list[str]:
    docs: list[str] = []
    current: list[str] = []
    total = 0
    for d in splits:
        dl = len(d)
        if total + dl > chunk_size and current:
            doc = "".join(current).strip()
            if doc:
                docs.append(doc)
            while total > chunk_overlap or (total + dl > chunk_size and total > 0):
                total -= len(current[0])
                current.pop(0)
        current.append(d)
        total += dl
    doc = "".join(current).strip()
    if doc:
        docs.append(doc)
    return docs


def recursive_split(
    text: str,
    chunk_size: int = 100,
    chunk_overlap: int = 20,
    separators: list[str] | None = None,
) -> list[str]:
    """Recursive character splitting, langchain-compatible (public algorithm:
    RecursiveCharacterTextSplitter with keep_separator=True). Validated
    against the reference's golden chunks (test_chunkers.py:19-26)."""
    seps = separators if separators is not None else DEFAULT_SEPARATORS
    sep = seps[-1]
    remaining: list[str] = []
    for i, s in enumerate(seps):
        if s == "" or s in text:
            sep = s
            remaining = seps[i + 1 :]
            break
    splits = _split_with_separator(text, sep)
    out: list[str] = []
    good: list[str] = []
    for s in splits:
        if len(s) < chunk_size:
            good.append(s)
        else:
            if good:
                out.extend(_merge_splits(good, chunk_size, chunk_overlap))
                good = []
            if not remaining:
                out.append(s)
            else:
                out.extend(recursive_split(s, chunk_size, chunk_overlap, remaining))
    if good:
        out.extend(_merge_splits(good, chunk_size, chunk_overlap))
    return out


def recursive_character_chunks(
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = 100,
    chunk_overlap: int = 20,
    chunk_col: str = "chunk",
    index_col: str = "chunk_index",
) -> DataFrame:
    """C1 parity operator: Arrow-batched pandas UDF returning the chunk array,
    then posexplode for 1-based chunk_index. Per-doc failures yield [] (the
    reference drops failed docs, core/pipeline.py:26-32)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def split_udf(s: pd.Series) -> pd.Series:
        def safe(t):
            try:
                if t is None or not t.strip():
                    return []
                return recursive_split(t, chunk_size, chunk_overlap)
            except Exception:
                return []

        return s.map(safe)

    from yaml_pipe_spark.session import spread_for_expansion

    chunks = split_udf(F.col(text_col))
    # the Python splitter is the CPU cost here — make sure an
    # under-partitioned scan doesn't serialize it on one worker
    return (
        spread_for_expansion(df.filter(non_empty(F.col(text_col))))
        .select(*df.columns, F.posexplode(chunks).alias("__pos", chunk_col))
        .withColumn(index_col, (F.col("__pos") + 1).cast("long"))
        .drop("__pos")
    )
