"""Text-normalization and tokenization expressions.

Semantics carried over from the reference:
- empty-document skip: sources.py:94-96 / chunkers.py:70-74 drop documents
  whose content is empty/whitespace -> `non_empty`.
- WebSource line normalization: sources.py:136-137 strips each line, drops
  blank lines, re-joins with "\\n" -> `normalize_lines`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def non_empty(col: Column) -> Column:
    """True iff the text has any non-whitespace content.

    Reference: components/sources.py:94-96 (skip empty files),
    components/chunkers.py:70-74 (empty doc -> no chunks). The reference
    uses Python str.strip(), which strips ALL whitespace — so the filter
    trims space/newline/cr/tab, not SQL trim()'s spaces-only default.
    DuckDB twin: length(trim(text, e' \\n\\r\\t')) > 0.
    """
    return F.length(F.btrim(col, F.lit(" \n\r\t"))) > 0


def normalize_lines(col: Column) -> Column:
    """Strip each line, drop blank lines, re-join with newline.

    Reference: components/sources.py:134-137 (WebSource text cleanup).
    DuckDB twin: array_to_string(list_filter(list_transform(
    string_split(t, chr(10)), x -> trim(x)), x -> length(x) > 0), chr(10)).
    """
    lines = F.split(col, "\n")
    stripped = F.transform(lines, lambda x: F.trim(x))
    kept = F.filter(stripped, lambda x: F.length(x) > 0)
    return F.array_join(kept, "\n")


def tokens(col: Column) -> Column:
    """Whitespace tokens with empties removed (array<string>).

    DuckDB twin: list_filter(regexp_split_to_array(t, '\\s+'), x -> x <> '').
    """
    return F.filter(F.split(col, r"\s+"), lambda x: x != F.lit(""))


def token_count(col: Column) -> Column:
    """Number of whitespace tokens (bigint)."""
    return F.size(tokens(col)).cast("long")
