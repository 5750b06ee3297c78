"""Real vector-store sink adapters, config-compatible with the reference
(components/sinks.py:33-162): `lancedb` takes (uri, table_name), `chromadb`
takes (collection_name, path | host+port). Both implement the Sink protocol
(operators/sinks.py) with the reference's idempotency rule — every source in
the batch is deleted before insert — so a reference pipeline YAML runs here
unchanged once the library is installed.

Neither library exists in this container, so construction is import-gated
with an actionable message; the adapter motions themselves are exercised
against DuckDBSink (same protocol, same staged-batch upsert shape) and the
config-key compatibility is tested by parsing the reference's own pipeline
YAMLs (tests/test_vector_sinks.py).

These stores are embedded/single-node: the write path necessarily funnels
through the driver (collect per batch) — that is a property of the target
store, not the pipeline; the 100 TB path is ParquetSink/BucketedTable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _require(module: str, pip_name: str):
    try:
        return __import__(module)
    except ImportError as e:
        raise RuntimeError(
            f"the '{pip_name}' library is not installed in this environment; "
            f"`pip install {pip_name}` on the cluster/driver to use this sink "
            f"(the parquet and duckdb sinks need no extra dependencies)"
        ) from e


class LanceDBSink:
    """Reference LanceDBSink (sinks.py:33-103): delete-where-source, add,
    schema migration handled by LanceDB's native schema evolution."""

    def __init__(self, uri: str, table_name: str):
        self._lancedb = _require("lancedb", "lancedb")
        self.uri = uri
        self.table_name = table_name

    def write(self, df: DataFrame) -> None:  # pragma: no cover - needs lancedb
        db = self._lancedb.connect(self.uri)
        pdf = df.toPandas()
        if self.table_name in db.table_names():
            table = db.open_table(self.table_name)
            sources = pdf["source"].drop_duplicates().tolist()
            quoted = ", ".join("'" + s.replace("'", "''") + "'" for s in sources)
            table.delete(f"source IN ({quoted})")
            table.add(pdf)
        else:
            db.create_table(self.table_name, pdf)

    def read(self, spark: SparkSession) -> DataFrame:  # pragma: no cover
        db = self._lancedb.connect(self.uri)
        return spark.createDataFrame(
            db.open_table(self.table_name).to_pandas()
        )

    def test_connection(self, spark: SparkSession) -> None:  # pragma: no cover
        self._lancedb.connect(self.uri).table_names()


class ChromaDBSink:
    """Reference ChromaDBSink (sinks.py:106-162): supports on-disk
    (PersistentClient) and remote (HttpClient); upsert keyed by a stable
    content id, metadata carries the source for delete-by-source."""

    def __init__(
        self,
        collection_name: str,
        path: str | None = None,
        host: str | None = None,
        port: int | None = None,
    ):
        self._chromadb = _require("chromadb", "chromadb")
        if path is None and host is None:
            raise ValueError("chromadb sink needs either path or host/port")
        self.collection_name = collection_name
        self.path, self.host, self.port = path, host, port

    def _client(self):  # pragma: no cover - needs chromadb
        if self.path is not None:
            return self._chromadb.PersistentClient(path=self.path)
        return self._chromadb.HttpClient(host=self.host, port=self.port)

    def write(self, df: DataFrame) -> None:  # pragma: no cover - needs chromadb
        import hashlib

        col = self._client().get_or_create_collection(self.collection_name)
        pdf = df.toPandas()
        for source in pdf["source"].drop_duplicates().tolist():
            col.delete(where={"source": source})
        ids = [
            hashlib.sha256(f"{s}\x1f{t}".encode()).hexdigest()
            for s, t in zip(pdf["source"], pdf["text"])
        ]
        col.add(
            ids=ids,
            documents=pdf["text"].tolist(),
            embeddings=[list(map(float, v)) for v in pdf["embedding"]],
            metadatas=[{"source": s} for s in pdf["source"]],
        )

    def read(self, spark: SparkSession) -> DataFrame:  # pragma: no cover
        col = self._client().get_or_create_collection(self.collection_name)
        got = col.get(include=["documents", "embeddings", "metadatas"])
        rows = [
            (m["source"], d, [float(x) for x in e])
            for m, d, e in zip(
                got["metadatas"], got["documents"], got["embeddings"]
            )
        ]
        return spark.createDataFrame(
            rows, "source string, text string, embedding array<double>"
        )

    def test_connection(self, spark: SparkSession) -> None:  # pragma: no cover
        self._client().heartbeat() if self.host else self._client().list_collections()
