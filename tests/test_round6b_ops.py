"""Round-6 session-3 wave: SemDeDup, NB quality distillation, DoReMi
mixture weights, perplexity-vs-quality correlation."""

from __future__ import annotations

from pyspark.sql import functions as F


# ------------------------------------------------------------------ SemDeDup


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_keeps_farthest_from_centroid(spark):
    """Within a near-dup pair, the member with the LOWER centroid cosine
    (farther from the centroid) survives — the paper's keep policy."""
    from yaml_pipe_spark.operators.dedup import semdedup

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid long, cv array<double>"
    )
    # 10/11 are near-dups in cluster 0; 11 is farther from the centroid.
    # 20 sits alone in cluster 1.
    emb = _emb_df(
        spark,
        [
            (10, [1.0, 0.05]),
            (11, [1.0, 0.30]),
            (20, [0.1, 1.0]),
        ],
    )
    out = {
        r["vec_id"]: r
        for r in semdedup(emb, cents, threshold=0.9).collect()
    }
    assert out[10]["cid"] == 0 and out[11]["cid"] == 0
    assert out[20]["cid"] == 1
    assert out[11]["kept"] == 1 and out[11]["dropped_for"] is None
    assert out[10]["kept"] == 0 and out[10]["dropped_for"] == 11
    assert out[20]["kept"] == 1


def test_semdedup_never_keeps_two_near_duplicates(spark):
    """The dominance relaxation's safety invariant: for every same-cluster
    pair above threshold, at most one member is kept — even on chains
    where the greedy and the relaxation disagree on WHICH extras drop."""
    from yaml_pipe_spark.operators.dedup import cosine_pairs, semdedup

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0])], "cid long, cv array<double>"
    )
    # a chain a~b~c~d of slowly rotating vectors: adjacent ones are
    # near-dups, distant ones fall under the threshold
    emb = _emb_df(
        spark,
        [
            (1, [1.0, 0.00, 0.0]),
            (2, [1.0, 0.20, 0.0]),
            (3, [1.0, 0.40, 0.0]),
            (4, [1.0, 0.60, 0.0]),
        ],
    )
    thr = 0.97
    verdicts = {
        r["vec_id"]: r["kept"]
        for r in semdedup(emb, cents, threshold=thr).collect()
    }
    pairs = cosine_pairs(
        emb.withColumn("b", F.lit(0)),
        threshold=thr,
        block_col="b",
    ).collect()
    assert pairs, "fixture must produce at least one near-dup pair"
    for p in pairs:
        assert verdicts[p["id_a"]] + verdicts[p["id_b"]] <= 1, (
            p["id_a"],
            p["id_b"],
        )
    assert any(v == 1 for v in verdicts.values())


def test_semdedup_assignment_tie_goes_to_lowest_cid(spark):
    from yaml_pipe_spark.operators.dedup import semdedup

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0])], "cid long, cv array<double>"
    )
    emb = _emb_df(spark, [(5, [0.7, 0.1])])
    (row,) = semdedup(emb, cents, threshold=0.5).collect()
    assert row["cid"] == 0


# ------------------------------------------------------- NB quality distill


def test_nb_distill_confusion_shares_sum_to_one(spark):
    """Class-pure vocabularies must classify perfectly on the held-out
    split (diagonal confusion), and each true-label row's shares sum
    to 1."""
    from yaml_pipe_spark.operators.classifier import nb_quality_distill

    rows = [
        (i, ("good solid fine " * 10) if i % 2 else ("junk spam bad " * 10))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    labels = docs.select(
        "doc_id", (F.col("doc_id") % 2).cast("int").alias("gopher_pass")
    )
    out = nb_quality_distill(docs, labels).collect()
    by_label: dict[int, float] = {}
    for r in out:
        by_label[r["gopher_label"]] = by_label.get(r["gopher_label"], 0.0) + (
            r["share"]
        )
    for label, s in by_label.items():
        assert abs(s - 1.0) < 1e-6, (label, s)
    # class-pure vocabularies separate perfectly: every cell is diagonal
    for r in out:
        assert r["gopher_label"] == r["pred"], r


def test_nb_distill_all_oov_doc_falls_back_to_prior(spark):
    """A test doc whose tokens never appear in training must still get a
    verdict (the prior margin), not vanish from the matrix."""
    from yaml_pipe_spark.operators.classifier import nb_quality_distill

    # doc_id 1 hashes into the test split (md5 byte0("1") = 0xc4 = 196...
    # depends; instead force it by train_rate=0.5 and checking totals)
    rows = [(i, "alpha beta " * 5) for i in range(40)] + [
        (1000, "zzz qqq xxx")
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    labels = docs.select(
        "doc_id", F.lit(1).cast("int").alias("gopher_pass")
    )
    out = nb_quality_distill(docs, labels)
    total = sum(r["n_docs"] for r in out.collect())
    # every held-out doc is accounted for
    from yaml_pipe_spark.operators.sampling import hash_sample_flag

    n_test = docs.filter(
        ~hash_sample_flag(F.col("doc_id"), F.lit(0.8))
    ).count()
    assert total == n_test


# ------------------------------------------------------------ DoReMi weights


def test_doremi_upweights_distinctive_sources(spark):
    """A source whose bigrams diverge from the corpus LM gains weight over
    its baseline share; a source that IS the corpus distribution cannot."""
    from yaml_pipe_spark.operators.sampling import doremi_source_weights

    # the two sources SHARE prev-tokens ("the", "on") but continue them
    # differently, so the corpus-blended conditional deviates from each
    # specialist — much more for the minority source
    rows = [("common", i, "the cat sat on the mat") for i in range(30)] + [
        ("niche", 100 + i, "the tensor sat on the gradient")
        for i in range(5)
    ]
    docs = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = {r["source"]: r for r in doremi_source_weights(docs).collect()}
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-5
    # the niche source's specialist LM beats the generalist by more
    assert out["niche"]["excess_loss"] >= out["common"]["excess_loss"]
    # and its weight rises above its share while common's falls
    assert out["niche"]["weight"] > out["niche"]["baseline_share"]
    assert out["common"]["weight"] < out["common"]["baseline_share"]


def test_doremi_identical_sources_keep_their_shares(spark):
    from yaml_pipe_spark.operators.sampling import doremi_source_weights

    text = "alpha beta gamma delta epsilon zeta"
    rows = [("s1", i, text) for i in range(10)] + [
        ("s2", 100 + i, text) for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = {r["source"]: r for r in doremi_source_weights(docs).collect()}
    for s in ("s1", "s2"):
        assert out[s]["excess_loss"] == 0.0
        assert abs(out[s]["weight"] - out[s]["baseline_share"]) < 1e-5


# ------------------------------------------------------- k-center coreset


def test_kcenter_picks_maxmin_and_radius_shrinks(spark):
    from yaml_pipe_spark.operators.sampling import kcenter_coreset

    # four directions at increasing angles from e1; greedy from id 1 (e1)
    # must pick the opposite pole (id 4) next, then the midpoints
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.92, 0.39]),   # ~23 deg
            (3, [0.38, 0.92]),   # ~67 deg
            (4, [0.0, 1.0]),     # 90 deg — farthest from e1
        ],
        "vec_id long, embedding array<double>",
    )
    rows = kcenter_coreset(emb, k=3).collect()
    steps = {r["step"]: r for r in rows}
    assert steps[1]["center_id"] == 1
    assert steps[2]["center_id"] == 4
    assert steps[3]["center_id"] in (2, 3)
    radii = [steps[s]["radius"] for s in (1, 2, 3)]
    assert radii == sorted(radii, reverse=True)
    assert radii[2] < radii[0]


def test_kcenter_deterministic_tiebreak_lowest_id(spark):
    from yaml_pipe_spark.operators.sampling import kcenter_coreset

    # two identical candidates equidistant from the start: lowest id wins
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (5, [0.0, 1.0]),
            (9, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {r["step"]: r for r in kcenter_coreset(emb, k=2).collect()}
    assert rows[2]["center_id"] == 5
