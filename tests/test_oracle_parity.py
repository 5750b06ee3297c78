"""Mirror of the driver's correctness gate: every registered query with an
oracle must hash-match DuckDB at sf0.001 (fast) — the driver re-runs the same
check at sf0.01."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from yaml_pipe_spark.entrypoints import REGISTRY
from yaml_pipe_spark.testing import check_query


@pytest.mark.parametrize("name", sorted(REGISTRY))
@pytest.mark.slow  # driver fast lane (r14)
def test_oracle_parity(spark, name):
    problems = check_query(spark, name, SF_SMALL)
    assert not problems, f"{name}: {problems}"


# Fast-lane oracle smoke (r14): one representative per query family, so
# the default (-m "not slow") lane still exercises the Spark-vs-DuckDB
# comparison end to end. The exhaustive 243-query sweep above is
# slow-lane only — it mirrors the driver's own oracle gate, which runs
# against this repo every round regardless.
FAMILY_SMOKE = [
    "flagship",
    "ann_signlsh_topk",
    "corpus_holdout_split",
    "dedup_exact",
    "events_sessionize",
    "graph_pagerank_centrality",
    "multimodal_phash_bmp",
    "s2_normalize_lines",
    "rel_pricing_summary",
    "q1_topk_cosine",
    "stream_tumbling_agg",
    "text_repetition",
    "quality_logreg_distill",
]


@pytest.mark.parametrize("name", [n for n in FAMILY_SMOKE if n in REGISTRY])
def test_oracle_parity_family_smoke(spark, name):
    problems = check_query(spark, name, SF_SMALL)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    from yaml_pipe_spark.entrypoints import entry

    df = entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "lang",
        "n_chunks",
        "n_docs",
        "n_uniq_chunks",
        "avg_chunk_len",
    }
