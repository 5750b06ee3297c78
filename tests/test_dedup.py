"""Dedup operator semantics on hand-built corpora."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from yaml_pipe_spark.operators.dedup import (
    cosine_pairs,
    drop_exact_duplicates,
    exact_dedup_summary,
    exact_jaccard_pairs,
    minhash_near_duplicates,
    simhash_fingerprints,
    simhash_near_duplicates,
    token_shingles,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 1
    (3, "completely different text about spark dataframes and parquet files"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (5, "hi"),  # too short for 3-gram shingles
]


def _docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_exact_dedup(spark):
    row = exact_dedup_summary(_docs(spark)).collect()[0]
    assert (row.n_docs, row.n_unique, row.n_dup_docs) == (5, 4, 1)
    kept = drop_exact_duplicates(_docs(spark)).select("doc_id").collect()
    ids = {r.doc_id for r in kept}
    assert 1 in ids and 4 not in ids  # lowest-id representative survives


def test_token_shingles_short_doc(spark):
    sh = token_shingles(_docs(spark), k=3)
    assert sh.filter(F.col("doc_id") == 5).count() == 0


def test_exact_jaccard_pairs(spark):
    sh = token_shingles(_docs(spark), k=3)
    pairs = {(r.id_a, r.id_b): r.jaccard for r in exact_jaccard_pairs(sh).collect()}
    assert pairs[(1, 4)] == 1.0  # exact dup
    assert 0.5 < pairs[(1, 2)] < 1.0  # near-dup
    assert (1, 3) not in pairs  # no shared shingles


def test_minhash_finds_near_dups(spark):
    out = minhash_near_duplicates(_docs(spark), threshold=0.5)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert (1, 4) in got and (1, 2) in got and (2, 4) in got
    assert all(3 not in p and 5 not in p for p in got)


def test_simhash(spark):
    fps = simhash_fingerprints(_docs(spark))
    by_id = {r.doc_id: r.simhash for r in fps.collect()}
    assert len(by_id[1]) == 64 and set(by_id[1]) <= {"0", "1"}
    assert by_id[1] == by_id[4]  # identical text -> identical fingerprint
    ham_12 = sum(a != b for a, b in zip(by_id[1], by_id[2]))
    ham_13 = sum(a != b for a, b in zip(by_id[1], by_id[3]))
    assert ham_12 < ham_13  # near-dup closer than unrelated
    pairs = simhash_near_duplicates(fps, max_hamming=0).collect()
    assert {(r.id_a, r.id_b) for r in pairs} >= {(1, 4)}


def test_cosine_pairs_with_blocking(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "a"),
            (2, [0.99, 0.1], "a"),
            (3, [0.0, 1.0], "a"),
            (4, [1.0, 0.01], "b"),  # close to 1 but different block
        ],
        "vec_id long, embedding array<double>, blk string",
    )
    allp = {(r.id_a, r.id_b) for r in cosine_pairs(df, threshold=0.9, allow_quadratic=True).collect()}
    assert (1, 2) in allp and (1, 4) in allp and (1, 3) not in allp
    blocked = {
        (r.id_a, r.id_b)
        for r in cosine_pairs(df, threshold=0.9, block_col="blk").collect()
    }
    assert (1, 2) in blocked and (1, 4) not in blocked  # cross-block pruned


def test_cc_partitions_adapt_to_edge_count():
    from yaml_pipe_spark.operators.dedup import _cc_partitions

    # tiny near-dup graph: collapse to the floor
    assert _cc_partitions(1_000, 32, 2_000_000) == 2
    # large graph: one partition per target chunk
    assert _cc_partitions(50_000_000, 256, 2_000_000) == 25
    # capped at 4x cluster parallelism
    assert _cc_partitions(500_000_000, 8, 2_000_000) == 32
    assert _cc_partitions(0, 32, 2_000_000) == 2


def test_cc_large_graph_keeps_parallelism(spark):
    from pyspark.sql import functions as F

    from yaml_pipe_spark.operators.dedup import connected_components

    # 100k disjoint 2-node clusters (converges in one round); a small
    # per-partition target must NOT collapse the iteration to 2 partitions
    pairs = spark.range(100_000).select(
        (F.col("id") * 2).alias("id_a"), (F.col("id") * 2 + 1).alias("id_b")
    )
    out = connected_components(pairs, target_edges_per_partition=25_000)
    assert out.rdd.getNumPartitions() >= 8
    sample = {r.node: r.cluster_rep for r in out.filter(F.col("node") < 10).collect()}
    assert sample == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4, 5: 4, 6: 6, 7: 6, 8: 8, 9: 8}


def test_quadratic_cosine_pairs_is_gated(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="O\\(n\\^2\\)"):
        cosine_pairs(df)


def test_df_guard_drops_boilerplate_shingle(spark):
    """Default document-frequency cut: a shingle present in > max(floor(
    0.005*n_docs), 50) docs leaves the inverted index, so docs whose ONLY
    overlap is boilerplate never pair. 60 docs share one header line; each
    doc's remaining text is unique."""
    rows = [
        (i, f"shared header boilerplate line unique{i} tail{i} words{i} here{i}")
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = token_shingles(docs, k=3)
    # guarded default: the only shared shingles have df=60 > 50 -> no pairs
    assert exact_jaccard_pairs(sh).count() == 0
    # guard disabled: every pair shares the boilerplate shingles
    unguarded = exact_jaccard_pairs(sh, df_max_frac=None)
    assert unguarded.count() == 60 * 59 // 2


def test_bucket_cap_drops_degenerate_lsh_bucket(spark):
    """max_bucket_size keeps a hot band bucket from going quadratic: with
    identical docs all bands collide, a cap below the group size drops the
    buckets (and with ALL bands identical, recall for that blob is the
    documented trade)."""
    from yaml_pipe_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    rows = [(i, "identical boilerplate blob repeated every single time")
            for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(token_shingles(docs, k=3))
    assert lsh_candidate_pairs(sigs, max_bucket_size=10).count() == 0
    assert lsh_candidate_pairs(sigs).count() == 20 * 19 // 2  # default 10k cap


@pytest.mark.slow  # driver fast lane (r14)
def test_candidate_cut_runs_below_pair_self_join(spark):
    """With candidates, the id-level semi-joins must sit BELOW the
    pair-generating shingle self-join (cutting its input), and the verify
    result must equal the unfiltered exact join restricted to the
    candidate pairs."""
    from yaml_pipe_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    sh = token_shingles(_docs(spark), k=3)
    cands = lsh_candidate_pairs(minhash_signatures(sh))
    verified = exact_jaccard_pairs(sh, candidates=cands)

    plan = verified._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    self_join = next(
        i
        for i, l in enumerate(lines)
        if "Join Inner" in l and "shingle" in l
    )
    semis_below = [
        i for i, l in enumerate(lines) if "LeftSemi" in l and i > self_join
    ]
    assert len(semis_below) >= 2, plan  # one id-level cut per join side

    got = {(r.id_a, r.id_b): r.jaccard for r in verified.collect()}
    cand_set = {(r.id_a, r.id_b) for r in cands.collect()}
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in exact_jaccard_pairs(sh).collect()
    }
    assert got == {p: j for p, j in full.items() if p in cand_set}
    assert len(got) > 0


def test_cosine_pairs_zero_norm_opts_out_identically(spark):
    """Zero-norm vectors have undefined cosine (0/0: DIVIDE_BY_ZERO under
    ANSI Spark, NaN in numpy) — both the interpreted baseline and the
    Arrow twin must apply the SAME explicit rule: the vector opts out of
    pairing; everything else still pairs."""
    from yaml_pipe_spark.operators.dedup import cosine_pairs, cosine_pairs_arrow

    rows = [
        (1, [0.0, 0.0, 0.0]),  # zero norm -> opts out
        (2, [1.0, 0.0, 0.0]),
        (3, [1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = {
        (r.id_a, r.id_b)
        for r in cosine_pairs(
            emb, "vec_id", "embedding", threshold=0.5, allow_quadratic=True
        ).collect()
    }
    b = {
        (r.id_a, r.id_b)
        for r in cosine_pairs_arrow(
            emb, "vec_id", "embedding", threshold=0.5
        ).collect()
    }
    assert a == b == {(2, 3)}


def test_cosine_pairs_arrow_bit_identical_to_interpreted(spark):
    """The Arrow scorer must reproduce the interpreted zip_with fold
    EXACTLY — same pairs, same rounded scores — or the oracle contract
    (and the recall ground truth) silently forks."""
    from yaml_pipe_spark.operators.dedup import cosine_pairs, cosine_pairs_arrow
    from tests.conftest import SF_SMALL

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    a = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_pairs(
            emb, "vec_id", "embedding", threshold=0.4, allow_quadratic=True
        ).collect()
    }
    b = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_pairs_arrow(
            emb, "vec_id", "embedding", threshold=0.4
        ).collect()
    }
    assert a == b and len(a) > 0
