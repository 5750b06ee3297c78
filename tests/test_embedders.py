"""Contract tests for the remote-embedder surfaces (no model/API in this
container): micro-batch arithmetic, key handling, UDF output types."""

from __future__ import annotations

import pytest

from yaml_pipe_spark.operators.embedders import (
    HashEmbedder,
    OpenAIEmbedder,
    batched_embed,
)


def test_batched_embed_contract():
    calls = []

    def fake(batch):
        calls.append(list(batch))
        return [[float(len(t))] for t in batch]

    out = batched_embed(["a", "bb", None, "cccc", "d"], fake, batch_size=2)
    assert [len(c) for c in calls] == [2, 2, 1]  # batch bounds respected
    assert out == [[1.0], [2.0], [0.0], [4.0], [1.0]]  # order kept, None->''


def test_batched_embed_rejects_wrong_cardinality():
    with pytest.raises(ValueError, match="2 vectors for 3"):
        batched_embed(["a", "b", "c"], lambda b: [[0.0]] * 2, batch_size=8)


def test_openai_embedder_key_handling(spark, monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    # construction succeeds without a key (configs must compile anywhere);
    # the apply stage is where the key becomes mandatory
    e = OpenAIEmbedder()
    df = spark.createDataFrame([("x",)], "chunk string")
    with pytest.raises(ValueError, match="key missing"):
        e.apply(df)
    monkeypatch.setenv("OPENAI_API_KEY", "sk-env")
    assert OpenAIEmbedder().api_key == "sk-env"
    assert OpenAIEmbedder(api_key="sk-arg").api_key == "sk-arg"
    # reference-config key alias
    assert OpenAIEmbedder(model_name="text-embedding-ada-002").model == (
        "text-embedding-ada-002"
    )


def test_hash_embedder_shape_and_determinism(spark):
    df = spark.createDataFrame([("x",), ("x",), ("y",)], "chunk string")
    out = HashEmbedder(dim=8).apply(df).collect()
    assert all(len(r.embedding) == 8 for r in out)
    assert out[0].embedding == out[1].embedding
    assert out[0].embedding != out[2].embedding
    assert all(-1.0 <= v <= 1.0 for r in out for v in r.embedding)
