"""Round-8 curation operators: SoftDeDup reweighting, winnowing
fingerprints (the MOSS guarantee), UniMax waterfill allocation — each
validated against a pure-Python reference on hand-built corpora (the
registered queries add the DuckDB-oracle attestation on the driver data)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from yaml_pipe_spark.operators.dedup import soft_dedup_weights
from yaml_pipe_spark.operators.sampling import unimax_allocation
from yaml_pipe_spark.operators.text_stats import winnow_fingerprints


# ---------------------------------------------------------------------------
# winnowing
# ---------------------------------------------------------------------------


def _py_winnow(text: str, k: int = 4, w: int = 4) -> list[str]:
    toks = [t for t in text.split() if t]
    hs = [
        hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
        for i in range(len(toks) - k + 1)
    ]
    return [min(hs[i : i + w]) for i in range(len(hs) - w + 1)]


def test_winnow_matches_python_reference(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        (3, "one two three four five six seven"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["fps"]
        for r in winnow_fingerprints(df, "text", "doc_id", k=4, w=4).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _py_winnow(text), doc_id


def test_winnow_shared_run_guarantee(spark):
    """The SIGMOD '03 guarantee: two documents sharing a token run of
    length >= k + w - 1 (= 7 here) share at least one fingerprint."""
    shared = "lorem ipsum dolor sit amet consectetur adipiscing"  # 7 tokens
    rows = [
        (1, f"unrelated prefix words here {shared} and a tail"),
        (2, f"{shared} completely different continuation tokens now"),
        (3, "nothing in common with either document at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {
        r["doc_id"]: set(r["fps"])
        for r in winnow_fingerprints(df, "text", "doc_id", k=4, w=4).collect()
    }
    assert fps[1] & fps[2], "shared 7-token run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_winnow_short_docs_opt_out(spark):
    df = spark.createDataFrame(
        [(1, "just six words not enough here"), (2, "way too short")],
        "doc_id long, text string",
    )
    # 6 tokens -> 3 grams -> no complete window of 4; 3 tokens -> no gram
    assert winnow_fingerprints(df, "text", "doc_id", k=4, w=4).count() == 0


# ---------------------------------------------------------------------------
# soft dedup reweighting
# ---------------------------------------------------------------------------


def test_soft_dedup_weight_bounds(spark):
    uniq = "entirely unique words appear in this sentence only once ever"
    dup = "this exact boilerplate paragraph repeats verbatim across documents"
    rows = [(1, uniq), (2, dup), (3, dup), (4, dup + " plus a unique tail here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in soft_dedup_weights(df, "text", "doc_id", k=5, lam=4.0).collect()
    }
    # fully unique doc: no shared gram, weight 1
    assert got[1]["dup_frac"] == 0.0 and got[1]["weight"] == 1.0
    # verbatim duplicates: every gram shared, weight 1/(1+4) = 0.2
    assert got[2]["dup_frac"] == 1.0 and got[2]["weight"] == pytest.approx(0.2)
    assert got[3]["dup_frac"] == 1.0
    # partial overlap lands strictly between
    assert 0.0 < got[4]["dup_frac"] < 1.0
    assert 0.2 < got[4]["weight"] < 1.0


def test_soft_dedup_preserves_rows_not_drops(spark):
    """The point of SOFT dedup: every doc keeps a row (with a weight),
    unlike exact/minhash dedup which removes members."""
    dup = "repeated content block shared by absolutely every document here"
    df = spark.createDataFrame(
        [(i, dup) for i in range(6)], "doc_id long, text string"
    )
    out = soft_dedup_weights(df, "text", "doc_id").collect()
    assert len(out) == 6
    assert all(r["weight"] == pytest.approx(0.2) for r in out)


# ---------------------------------------------------------------------------
# UniMax waterfill
# ---------------------------------------------------------------------------


def _py_unimax(toks: dict[str, float], epoch_cap: float, budget_factor: float):
    """Direct greedy reference: repeatedly give every undecided source the
    fair share, capping any source whose capacity falls below it."""
    budget = budget_factor * sum(toks.values())
    cap = {s: epoch_cap * t for s, t in toks.items()}
    alloc: dict[str, float] = {}
    remaining = dict(cap)
    while remaining:
        share = budget / len(remaining)
        below = {s: c for s, c in remaining.items() if c <= share}
        if not below:
            for s in remaining:
                alloc[s] = share
            break
        for s, c in below.items():
            alloc[s] = c
            budget -= c
            del remaining[s]
    return alloc


def test_unimax_matches_greedy_reference(spark):
    toks = {"a": 100.0, "b": 400.0, "c": 1000.0, "d": 2500.0, "e": 3000.0}
    rows = [(s, "w " * int(n)) for s, n in toks.items()]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        r["source"]: r["alloc"]
        for r in unimax_allocation(
            df, "source", "text", epoch_cap=2.0, budget_factor=1.9
        ).collect()
    }
    want = _py_unimax(toks, 2.0, 1.9)
    assert set(got) == set(want)
    for s in want:
        assert got[s] == pytest.approx(want[s]), s
    # budget fully spent, nobody above the epoch cap
    assert sum(got.values()) == pytest.approx(1.9 * sum(toks.values()))
    for s in got:
        assert got[s] / toks[s] <= 2.0 + 1e-9


def test_unimax_uniform_when_nothing_caps(spark):
    toks = {"a": 1000.0, "b": 1000.0, "c": 1000.0}
    df = spark.createDataFrame(
        [(s, "w " * int(n)) for s, n in toks.items()],
        "source string, text string",
    )
    got = {
        r["source"]: r["alloc"]
        for r in unimax_allocation(
            df, epoch_cap=2.0, budget_factor=1.5
        ).collect()
    }
    assert all(v == pytest.approx(1500.0) for v in got.values())


def test_unimax_excludes_zero_token_sources(spark):
    """A source whose every text tokenizes to nothing has cap 0 / alloc 0
    and makes the epochs division (alloc / toks) diverge across engines
    (Spark NULL vs IEEE NaN) — the waterfill drops it up front, leaving
    the live sources' allocation untouched (a 0-capacity source absorbs
    no budget in the greedy reference either)."""
    toks = {"a": 1000.0, "b": 1000.0, "c": 1000.0}
    rows = [(s, "w " * int(n)) for s, n in toks.items()]
    rows.append(("empty", "   "))  # whitespace-only: zero tokens
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        r["source"]: r["alloc"]
        for r in unimax_allocation(
            df, epoch_cap=2.0, budget_factor=1.5
        ).collect()
    }
    assert "empty" not in got
    assert set(got) == set(toks)
    assert all(v == pytest.approx(1500.0) for v in got.values())


def test_unimax_rejects_degenerate_budget(spark):
    df = spark.createDataFrame([("a", "w w w")], "source string, text string")
    with pytest.raises(ValueError, match="budget_factor"):
        unimax_allocation(df, epoch_cap=2.0, budget_factor=2.0)


# ---------------------------------------------------------------------------
# fused bigram-LM arms (quality_rho_excess round-8 rewrite)
# ---------------------------------------------------------------------------


def test_bigram_logprob_from_dt_equals_direct(spark):
    """The fused path (one bigram_doc_table + group dims attached by
    equi-join) must equal the direct carried-group path for every grouping
    — the group column is functional of the doc, so the counts are the
    same statistic. Tolerance is last-ulp only (different physical plans
    fold the identical multiset in different orders; the registered query
    rounds to 4dp, far above this)."""
    from pyspark.sql import functions as F

    from yaml_pipe_spark.operators.text_stats import (
        bigram_doc_logprob,
        bigram_doc_logprob_from_dt,
        bigram_doc_table,
    )

    rows = [
        (1, "srcA", "the cat sat on the mat and the cat ran"),
        (2, "srcA", "the dog sat on the rug and the dog slept"),
        (3, "srcB", "a completely different vocabulary lives here today"),
        (4, "srcB", "a completely different grammar lives there today"),
        (5, "srcB", "one"),  # < 2 tokens: contributes no bigrams
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    dt = bigram_doc_table(docs)
    for dim, group in (
        (docs.select("doc_id", "source"), "source"),
        (docs.select("doc_id", F.lit("all").alias("__g")), "__g"),
    ):
        direct_df = (
            bigram_doc_logprob(
                docs.withColumn("__g", F.lit("all")), group_col=group
            )
            if group == "__g"
            else bigram_doc_logprob(docs, group_col=group)
        )
        direct = sorted(map(tuple, direct_df.collect()))
        served = sorted(
            map(tuple, bigram_doc_logprob_from_dt(dt, dim, group).collect())
        )
        assert len(served) == len(direct) > 0
        for s, d in zip(served, direct):
            assert s[:2] == d[:2]
            assert s[2] == pytest.approx(d[2], rel=1e-12, abs=1e-12)


def test_winnow_pairs_detect_shared_runs(spark):
    """The registered dedup path: docs sharing a >= 7-token run must pair
    (deterministic detection, unlike MinHash banding's probabilistic
    recall), unrelated docs must not, and the hot-fingerprint cap bounds
    the join (boilerplate shared by MANY docs is dropped from candidate
    generation, exactly like the LSH bucket cap)."""
    from pyspark.sql import functions as F

    from yaml_pipe_spark.operators.text_stats import winnow_fingerprints

    shared = (
        "the quick brown fox jumps over the lazy dog near the river bank"
    )
    rows = [
        (1, f"document one begins here {shared} and then diverges fully"),
        (2, f"{shared} while document two continues on its own path now"),
        (3, "completely unrelated text with no overlap whatsoever at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(docs, "text", "doc_id", k=4, w=4)
    ex = fps.select("doc_id", F.explode(F.array_distinct("fps")).alias("fp"))
    dfc = ex.groupBy("fp").agg(F.count("*").alias("df"))
    kept = ex.join(dfc.filter(F.col("df") <= 50), "fp").select("doc_id", "fp")
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .collect()
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(1, 2)}
