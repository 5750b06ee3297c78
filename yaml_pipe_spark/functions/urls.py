"""URL canonicalization — the crawl-curation primitive that runs BEFORE
URL-level dedup (a Common-Crawl-scale pipeline dedups fetch lists and
post-fetch records on the canonical URL long before any content dedup).

Pure Catalyst column expressions (try_parse_url + regexp/array ops inside
whole-stage codegen — no UDF), so the same definition canonicalizes
10^11 URLs as a narrow projection on the scan. Every rule is mirrored
one-to-one by the DuckDB oracle in entrypoints.py (corpus_url_canonical_
dedup), which re-implements the parse with regexps.

Canonical form (documented contract, applied in order):
  1. scheme lowercased;
  2. host lowercased, one leading `www.` stripped, port dropped;
  3. fragment dropped;
  4. tracking params removed: utm_* / fbclid / gclid / ref;
  5. surviving query params sorted bytewise (key=value strings);
  6. trailing `/` stripped from the path;
  7. empty query -> no `?`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking parameters dropped by rule 4 — one place, shared with the oracle
TRACKING_PARAM_RE = "^(utm_[a-z]+|fbclid|gclid|ref)="


def canonical_host(url: Column) -> Column:
    """Lowercased host, one leading `www.` stripped, port dropped
    (parse_url HOST already excludes the port)."""
    return F.regexp_replace(
        F.lower(F.try_parse_url(url, F.lit("HOST"))), "^www\\.", ""
    )


def canonical_query(url: Column) -> Column:
    """Tracking params dropped, the rest sorted bytewise; '' if none."""
    q = F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    return F.array_join(kept, "&")


def canonicalize_url(url: Column) -> Column:
    """The full canonical form (see module docstring for the rules).

    Scheme-less / unparseable URLs (try_parse_url yields NULL scheme or
    host; the non-try parse_url would THROW and kill the whole scan on one
    bad row) pass through RAW instead of null-propagating: collapsing every
    malformed URL into one NULL canonical key would make countDistinct
    ignore them and inflate dup rates on real crawl input."""
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = canonical_host(url)
    path = F.regexp_replace(
        F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")), "/$", ""
    )
    q = canonical_query(url)
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(scheme.isNull() | host.isNull(), url).otherwise(canon)
