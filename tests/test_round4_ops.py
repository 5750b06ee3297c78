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
