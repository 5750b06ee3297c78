"""Round-4 operator semantics on hand-built corpora + plan-shape pins."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pack_windows_semantics(spark):
    """Docs of known token counts, ctx=4: offsets 0,3,5,11 -> windows
    computed by hand; a doc crossing a boundary counts in both windows."""
    from yaml_pipe_spark.operators.sampling import pack_windows

    rows = [
        (1, "a b c"),          # n=3, off=0,  spans w0 only (tokens 0-2)
        (2, "d e"),            # n=2, off=3,  tokens 3-4 -> w0 (3) + w1 (4)
        (3, "f g h i j k"),    # n=6, off=5,  tokens 5-10 -> w1, w2
        (4, ""),               # zero tokens: opts out
        (5, "l"),              # n=1, off=11, token 11 -> w2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.window_id: (r.n_docs, r.n_docs_starting, r.n_tokens)
        for r in pack_windows(docs, ctx=4, shard_size=2).collect()
    }
    assert out == {
        0: (2, 2, 4),  # doc1 (3 tok) + doc2 head (1 tok)
        1: (2, 1, 4),  # doc2 tail (1) + doc3 head (3); only doc3 starts
        2: (2, 1, 4),  # doc3 tail (3) + doc5 (1); doc5 starts here
    }


def test_pack_windows_two_pass_cumsum_matches_global(spark):
    """The sharded two-pass offset must equal a plain global cumsum for any
    shard size (including one doc per shard)."""
    from yaml_pipe_spark.operators.sampling import pack_windows

    rows = [(i, " ".join(["w"] * (1 + i * 7 % 13))) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = {(r.window_id, r.n_docs, r.n_docs_starting, r.n_tokens)
         for r in pack_windows(docs, ctx=16, shard_size=1).collect()}
    b = {(r.window_id, r.n_docs, r.n_docs_starting, r.n_tokens)
         for r in pack_windows(docs, ctx=16, shard_size=10_000).collect()}
    assert a == b and len(a) > 0


def test_pack_windows_plan_has_no_global_sort_over_corpus(spark):
    """The only single-partition exchange is the tiny per-shard prefix; the
    corpus-scale window runs under a hash exchange on shard, and the prefix
    joins back as a broadcast."""
    from yaml_pipe_spark.entrypoints import REGISTRY
    from tests.conftest import SF_SMALL

    df = REGISTRY["corpus_pack_windows"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange SinglePartition") == 1
    assert "hashpartitioning(shard" in plan
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_substring_span_duplicates(spark):
    """Doc 2 repeats an 8-token span of doc 1 (plus one extra shared gram
    from the 9-token overlap); doc 3 shares nothing that long."""
    from yaml_pipe_spark.operators.dedup import substring_span_duplicates

    span = "one two three four five six seven eight nine"  # 9 tokens
    rows = [
        (1, f"{span} unique tail of document one"),
        (2, f"totally different head then {span} ending here"),
        (3, "one two three four short overlap only plus other words"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.n_dup_spans
           for r in substring_span_duplicates(docs, k=8).collect()}
    # 9 shared tokens -> 2 shared 8-grams, owned by doc 1
    assert out == {2: 2}


def test_containment_catches_quote_jaccard_misses(spark):
    """A short doc quoted verbatim inside a much longer one: containment of
    the short side is 1.0 while Jaccard stays low — the asymmetric case
    the containment measure exists for."""
    from yaml_pipe_spark.operators.dedup import (
        containment_pairs,
        exact_jaccard_pairs,
        token_shingles,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"filler{i}" for i in range(60))
    rows = [(1, quote), (2, f"{filler} {quote} {filler} end words")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = token_shingles(docs, k=3)
    cont = containment_pairs(sh).collect()[0]
    jac = exact_jaccard_pairs(sh).collect()[0]
    assert cont.cont_a == 1.0  # every shingle of doc 1 is inside doc 2
    assert cont.cont_b < 0.15
    assert jac.jaccard < 0.15  # jaccard alone would never flag this pair


def test_substring_span_plan_never_explodes_pairs(spark):
    from yaml_pipe_spark.entrypoints import REGISTRY
    from tests.conftest import SF_SMALL

    df = REGISTRY["dedup_substring_span"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_segment_dedup_semantics(spark):
    """Hand-built corpus, seg_words=2: a 2-token block shared verbatim by
    two docs is boilerplate in both; everything else survives, and the
    cleaned hash equals sha256 of the kept blocks re-joined in order."""
    import hashlib

    from yaml_pipe_spark.operators.dedup import segment_exact_dedup

    rows = [
        (1, "spam spam a b c d"),   # segs: "spam spam" | "a b" | "c d"
        (2, "spam spam x y"),       # segs: "spam spam" | "x y"
        (3, "u v w"),               # segs: "u v" | "w"  (all unique)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in segment_exact_dedup(docs, seg_words=2).collect()
    }
    assert (out[1].n_segments, out[1].n_dup_segments,
            out[1].n_kept_tokens) == (3, 1, 4)
    assert (out[2].n_segments, out[2].n_dup_segments,
            out[2].n_kept_tokens) == (2, 1, 2)
    assert (out[3].n_segments, out[3].n_dup_segments,
            out[3].n_kept_tokens) == (2, 0, 3)
    sha = lambda s: hashlib.sha256(s.encode()).hexdigest()  # noqa: E731
    assert out[1].cleaned_hash == sha("a b c d")
    assert out[2].cleaned_hash == sha("x y")
    assert out[3].cleaned_hash == sha("u v w")


def test_segment_dedup_fully_boilerplate_doc(spark):
    """A doc made entirely of shared blocks cleans to the empty string."""
    import hashlib

    from yaml_pipe_spark.operators.dedup import segment_exact_dedup

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b c d")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in segment_exact_dedup(docs, seg_words=2).collect()
    }
    empty = hashlib.sha256(b"").hexdigest()
    assert out[1].cleaned_hash == empty and out[1].n_kept_tokens == 0
    assert out[2].cleaned_hash == empty
    # doc3 shares the "a b" block but keeps its unique "c d" tail
    assert out[3].n_dup_segments == 1 and out[3].n_kept_tokens == 2


def test_temperature_mix_upweights_low_resource(spark):
    """alpha=0.5 mixing must give a LOW-resource stratum a keep-rate at
    least as high as a high-resource one, rates stay in (0, 1], and the
    sampled count never exceeds the stratum size."""
    from yaml_pipe_spark.operators.sampling import temperature_mix

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = {r.lang: r for r in temperature_mix(df, "lang", "doc_id").collect()}
    assert out["small"].rate >= out["big"].rate
    for r in out.values():
        assert 0.0 < r.rate <= 1.0
        assert 0 <= r.n_sampled <= r.n_docs
    # q is a distribution over strata (rounding slack)
    assert abs(sum(r.q_temp for r in out.values()) - 1.0) < 1e-4
    # sqrt weighting: small keeps a larger SHARE of itself than big
    assert (out["small"].n_sampled / out["small"].n_docs
            >= out["big"].n_sampled / out["big"].n_docs)


def test_sq2_codes_levels_and_adc(spark):
    """Code assignment follows the closed-form floor rule (levels at
    (-1.5,-0.5,0.5,1.5)/8, boundaries at -1/8, 0, 1/8) and ADC distance
    of an exactly-representable level vector is 0."""
    from yaml_pipe_spark.operators.similarity import (
        sq2_adc_dist_sq,
        sq2_codes,
    )

    vec = [-0.5, -0.1875, -0.125, -0.01, 0.0, 0.0625, 0.125, 0.9]
    #      <-1/8  =level0  ==-1/8  bin1  ==0  =level2  ==1/8  >1/8
    df = spark.createDataFrame([(vec,)], "v array<double>")
    codes = df.select(sq2_codes(F.col("v")).alias("c")).first().c
    assert codes == [0, 0, 1, 1, 2, 2, 3, 3]
    # a vector sitting exactly on the reconstruction levels round-trips
    levels = [(c - 1.5) / 8 for c in (0, 1, 2, 3, 3, 1, 0, 2)]
    df2 = spark.createDataFrame([(levels,)], "v array<double>")
    d = df2.select(
        sq2_adc_dist_sq(F.col("v"), sq2_codes(F.col("v"))).alias("d")
    ).first().d
    assert d == 0.0


def test_matryoshka_agreement_bounds(spark):
    """Per-query overlap is within [0, 5]; a query's full_top1 matches the
    exact knn_join rank-1 neighbor on the same corpus."""
    from tests.conftest import SF_SMALL as sf_small

    from yaml_pipe_spark.entrypoints import REGISTRY
    from yaml_pipe_spark.operators.similarity import knn_join
    from yaml_pipe_spark.tables import load_table

    out = REGISTRY["emb_matryoshka_agreement"].fn(spark, sf_small).collect()
    assert len(out) == 20
    assert all(0 <= r.n_common <= 5 for r in out)
    emb = load_table(spark, sf_small, "embeddings")
    q = emb.filter(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
    )
    corpus = emb.filter(F.col("vec_id") >= 20)
    nn1 = (
        knn_join(q, corpus, k=1, exclude_self=False)
        .first()
    )
    row3 = [r for r in out if r.qid == 3][0]
    assert row3.full_top1 == nn1.vec_id


def test_resample_wav_zero_frames():
    """A valid zero-frame WAV resamples to a valid zero-frame WAV at the
    target rate instead of crashing on the forced first sample."""
    import io
    import wave

    from yaml_pipe_spark.multimodal.binary import resample_wav

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(b"")
    out = resample_wav(buf.getvalue(), 4000)
    with wave.open(io.BytesIO(out), "rb") as w:
        assert w.getnframes() == 0 and w.getframerate() == 4000


def test_temperature_mix_null_stratum_not_dropped(spark):
    """Documents with a NULL stratum form a real rate group: the audit
    counts their sample and the pipeline filter keeps its share of them
    (a plain equi-join would silently drop every one)."""
    from yaml_pipe_spark.operators.sampling import temperature_mix
    from yaml_pipe_spark.plans.config import ComponentSpec
    from yaml_pipe_spark.plans.factory import build_component

    rows = [(i, "en" if i % 3 else None) for i in range(300)]
    df = spark.createDataFrame(rows, "item_id long, lang string")
    audit = {r.lang: r for r in temperature_mix(df, "lang", "item_id").collect()}
    assert None in audit and audit[None].n_sampled > 0
    f = build_component(
        "filter",
        ComponentSpec(type="temperature_mix", config={"stratum_col": "lang"}),
    )
    kept = f.apply(df).collect()
    null_kept = sum(1 for r in kept if r.lang is None)
    assert null_kept == audit[None].n_sampled > 0
