"""Mirror of the driver's correctness gate: every registered query with an
oracle must hash-match DuckDB at sf0.001 (fast) — the driver re-runs the same
check at sf0.01."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from yaml_pipe_spark.entrypoints import REGISTRY
from yaml_pipe_spark.testing import check_query


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(spark, name):
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
