"""Embedders — the batch-vector UDF surface (SURVEY §2.3).

Reference: SentenceTransformerEmbedder (components/embedders.py:29-62) runs
ONE model.encode over the whole corpus in driver memory; OpenAIEmbedder
(embedders.py:65-91) one API call. The Spark translation of "one big batched
call" is an Arrow-batched pandas UDF with a per-executor model cache: every
Arrow batch is encoded model-side in bulk, executors each load the model
once, and the embedding becomes a first-class ArrayType(FloatType) column
(never stuffed into metadata like pipeline.py:90-91 does).

Three embedders:
- HashEmbedder: deterministic, oracle-checkable (functions.hashing) — the
  default for correctness work, mirroring the reference's own test practice
  of mocking embedders (tests/test_sinks.py:20-24).
- SentenceTransformerEmbedder: real model behind an import-try (the library
  is not in this container; the UDF raises a clear error at call time).
- OpenAIEmbedder: HTTP micro-batching inside the UDF, import-try gated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from yaml_pipe_spark.functions.hashing import hash_embedding

# per-executor-process model cache: populated lazily inside the UDF, so each
# Python worker loads the model once and reuses it across Arrow batches.
_MODEL_CACHE: dict[str, object] = {}


class HashEmbedder:
    """Deterministic pseudo-embedder; embed(text) is a pure expression."""

    def __init__(self, dim: int = 16):
        self.dim = dim

    def expr(self, col: Column) -> Column:
        return hash_embedding(col, self.dim)

    def apply(self, df: DataFrame, text_col: str = "chunk") -> DataFrame:
        return df.withColumn("embedding", self.expr(F.col(text_col)))


class SentenceTransformerEmbedder:
    """Local-model embedder (reference default all-MiniLM-L6-v2,
    embedders.py:32) as a pandas UDF with executor-side model cache."""

    def __init__(self, model_name: str = "sentence-transformers/all-MiniLM-L6-v2"):
        self.model_name = model_name

    def apply(self, df: DataFrame, text_col: str = "chunk") -> DataFrame:
        model_name = self.model_name

        @F.pandas_udf(T.ArrayType(T.FloatType()))
        def embed_udf(s):  # pd.Series -> pd.Series[list[float]]
            try:
                from sentence_transformers import SentenceTransformer
            except ImportError as e:  # pragma: no cover - lib not in container
                raise RuntimeError(
                    "sentence-transformers is not installed; use the 'hash' "
                    "embedder or install the library on the cluster"
                ) from e
            model = _MODEL_CACHE.get(model_name)
            if model is None:
                model = SentenceTransformer(model_name)
                _MODEL_CACHE[model_name] = model
            vecs = model.encode(s.fillna("").tolist())
            return type(s)([list(map(float, v)) for v in vecs])

        return df.withColumn("embedding", embed_udf(F.col(text_col)))


def batched_embed(texts, embed_batch, batch_size):
    """Micro-batching contract for remote embedders, as a pure function so
    the batch arithmetic is testable without a network or a Spark worker:
    every batch has <= batch_size texts, order is preserved, None -> ''.
    `embed_batch` is called once per slice and must return one vector per
    input text (the reference loops per batch the same way,
    embedders.py:75-84)."""
    clean = ["" if t is None else t for t in texts]
    out = []
    for i in range(0, len(clean), batch_size):
        batch = clean[i : i + batch_size]
        vecs = embed_batch(batch)
        if len(vecs) != len(batch):
            raise ValueError(
                f"embedder returned {len(vecs)} vectors for {len(batch)} texts"
            )
        out.extend(vecs)
    return out


class OpenAIEmbedder:
    """Remote-API embedder (reference embedders.py:65-91): micro-batched HTTP
    calls inside the UDF; key from config or OPENAI_API_KEY."""

    def __init__(
        self, model: str = "text-embedding-3-small", api_key: str | None = None,
        batch_size: int = 256, model_name: str | None = None,
    ):
        import os

        # `model_name` accepted for reference-config compatibility
        # (reference embedders.py uses model_name across all embedders)
        self.model = model_name or model
        self.api_key = api_key or os.environ.get("OPENAI_API_KEY")
        self.batch_size = batch_size

    def apply(self, df: DataFrame, text_col: str = "chunk") -> DataFrame:
        # key validated at plan-build time, not construction: configs must
        # parse/compile on machines that never run the embed stage
        if not self.api_key:
            raise ValueError(
                "OpenAI API key missing: pass api_key or set OPENAI_API_KEY"
            )
        model, key, bs = self.model, self.api_key, self.batch_size

        @F.pandas_udf(T.ArrayType(T.FloatType()))
        def embed_udf(s):
            try:
                import openai
            except ImportError as e:  # pragma: no cover - lib not in container
                raise RuntimeError("openai client is not installed") from e
            client = openai.OpenAI(api_key=key)

            def embed_batch(batch):
                resp = client.embeddings.create(model=model, input=batch)
                return [d.embedding for d in resp.data]

            out = batched_embed(s.tolist(), embed_batch, bs)
            return type(s)(out)

        return df.withColumn("embedding", embed_udf(F.col(text_col)))
