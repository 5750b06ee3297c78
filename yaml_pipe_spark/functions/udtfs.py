"""Python UDTF registration surface (SURVEY §2.9 gap ledger).

The reference's chunkers ARE hardcoded UDTFs — one input row expands to
many output rows — but it has no *registration* surface: a user cannot name
a table function and call it from a query. Spark 4's Python UDTFs close
that gap: `spark.udtf.register` makes the chunker a first-class SQL table
function callable via LATERAL, composable with any relational clause.

Performance note (documented, deliberate): a Python UDTF is the SLOW PATH
even Arrow-batched — the sanctioned production chunkers stay pure-Catalyst
(`operators/chunkers.py`, posexplode + substring in codegen, asserted
UDF-free in tests/test_plans.py). This module exists to cover the API
surface: user-defined expansions that genuinely need Python (a bespoke
tokenizer, a binary format walker) register here and inherit the same
LATERAL call syntax; anything expressible as Catalyst should be Catalyst.

The fixed-window UDTF mirrors `fixed_window_chunks` semantics EXACTLY
(starts 1, 1+step, ...; 1-based chunk_index; substring clamps the tail),
which is what makes the registered surface oracle-checkable end to end
(`sql_udtf_chunk` shares the fixed-window DuckDB twin).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_index bigint, chunk string", useArrow=True)
class FixedWindowChunksUDTF:
    """LATERAL fixed_window_chunks(text, size, overlap) — same contract as
    operators/chunkers.py::fixed_window_chunks: one output row per window
    start 1, 1+step, ... <= length(text), step = size - overlap."""

    def eval(self, text: str, chunk_size: int, chunk_overlap: int):
        # blank-skip predicate = functions.text.non_empty EXACTLY (btrim of
        # space/\n/\r/\t — not Python .strip(), which trims ALL unicode
        # whitespace and would diverge from the Catalyst chunkers and the
        # DuckDB twin on NBSP/vertical-tab-only documents)
        if text is None or not text.strip(" \n\r\t"):
            return
        if chunk_overlap >= chunk_size:
            raise ValueError("chunk_overlap must be < chunk_size")
        step = chunk_size - chunk_overlap
        idx = 0
        for start in range(0, len(text), step):
            idx += 1
            yield idx, text[start : start + chunk_size]


def register_udtfs(spark: SparkSession) -> None:
    """Idempotent: register every packaged UDTF under its SQL name."""
    spark.udtf.register("fixed_window_chunks", FixedWindowChunksUDTF)
