"""Property-based invariants (hypothesis) over the core operators.

The reference tests only golden strings (SURVEY §5); these add randomized
structural guarantees. Each property batches its generated examples into ONE
DataFrame per case so the Spark-job count stays small.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

TEXTS = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c\nd#ef "), min_size=0, max_size=400
    ),
    min_size=1,
    max_size=12,
)

SETTINGS = dict(max_examples=5, deadline=None)


@given(texts=TEXTS)
@settings(**SETTINGS)
def test_fixed_chunks_reconstruct_text(spark, texts):
    """Chunks tile the text: chunk i covers [i*stride, i*stride+size); the
    stride-prefixes of all chunks plus the tail reconstruct the document,
    and chunk_index is contiguous from 1."""
    from yaml_pipe_spark.operators.chunkers import fixed_window_chunks

    size, overlap = 50, 10
    stride = size - overlap
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    chunks = (
        fixed_window_chunks(df, "text", size, overlap)
        .orderBy("doc_id", "chunk_index")
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        rows = by_doc.get(i, [])
        if not t.strip():
            assert rows == []  # empty docs chunk to nothing (S1 semantics)
            continue
        assert [r.chunk_index for r in rows] == list(range(1, len(rows) + 1))
        rebuilt = "".join(r.chunk[:stride] for r in rows[:-1]) + rows[-1].chunk
        assert rebuilt == t
        assert all(len(r.chunk) <= size for r in rows)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-1000, 1000)),
        min_size=1,
        max_size=50,
    )
)
@settings(**SETTINGS)
def test_salted_aggregate_equals_plain(spark, rows):
    from yaml_pipe_spark.operators.skew import salted_aggregate

    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)],
        "k long, v long, rid long",
    )
    salted = salted_aggregate(
        df,
        ["k"],
        {
            "n": (F.count("*"), F.sum),
            "s": (F.sum("v"), F.sum),
            "mx": (F.max("v"), F.max),
        },
        salt_col=F.col("rid"),
        n_salts=4,
    )
    plain = df.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 2**64 - 1), st.integers(0, 2**64 - 1)),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_hamming_matches_popcount(spark, pairs):
    from yaml_pipe_spark.operators.dedup import hamming_distance

    df = spark.createDataFrame(
        [(format(a, "064b"), format(b, "064b")) for a, b in pairs],
        "fa string, fb string",
    )
    got = [
        r.h
        for r in df.select(
            hamming_distance(F.col("fa"), F.col("fb"), 64).alias("h")
        ).collect()
    ]
    want = [bin(a ^ b).count("1") for a, b in pairs]
    assert got == want


@given(texts=TEXTS)
@settings(**SETTINGS)
def test_jaccard_pairs_bounded_and_canonical(spark, texts):
    from yaml_pipe_spark.operators.dedup import (
        exact_jaccard_pairs,
        token_shingles,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sh = token_shingles(df, "text", "doc_id", k=2)
    rows = exact_jaccard_pairs(sh).collect()
    for r in rows:
        assert r.id_a < r.id_b
        assert 0.0 < r.jaccard <= 1.0


@given(texts=st.lists(st.text(max_size=100), min_size=1, max_size=10))
@settings(**SETTINGS)
def test_hash_embedding_shape_and_range(spark, texts):
    from yaml_pipe_spark.functions.hashing import hash_embedding

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    vecs = [
        r.e
        for r in df.select(hash_embedding(F.col("text"), 8).alias("e")).collect()
    ]
    for v in vecs:
        assert len(v) == 8
        assert all(-1.0 <= x <= 1.0 for x in v)
    # determinism: same text -> same vector
    again = [
        r.e
        for r in df.select(hash_embedding(F.col("text"), 8).alias("e")).collect()
    ]
    assert vecs == again
