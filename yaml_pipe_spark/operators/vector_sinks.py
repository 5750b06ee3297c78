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

LanceDB writes go through a Spark-distributed parquet staging directory and
stream into the store as an Arrow RecordBatchReader — the driver holds at
most one Arrow batch, never the frame. Chroma's PersistentClient is
embedded/single-process: its write path necessarily funnels through the
driver — a property of the target store, not the pipeline; the 100 TB path
is ParquetSink/BucketedTable. Chroma's HttpClient is a REMOTE server, so
that case writes per-partition (foreachPartition, batched `collection.add`)
— executors talk to the store directly and the driver never materializes
the batch. Delete-by-source always runs first, once, driver-side,
preserving the reference's idempotency rule.
"""

from __future__ import annotations

import hashlib
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def content_id(source: str, text: str) -> str:
    """Stable chunk id: sha256 over (source, text) — identical across
    re-runs so upserts are idempotent (reference sinks.py:131-141)."""
    return hashlib.sha256(f"{source}\x1f{text}".encode()).hexdigest()


def chroma_partition_writer(
    collection_name: str,
    host: str | None,
    port: int | None,
    batch_size: int = 1_000,
    client_factory: Callable | None = None,
) -> Callable:
    """Build the foreachPartition callable for the HttpClient write path.

    Runs on EXECUTORS: each partition opens its own connection (one client
    per task, the store is remote) and streams `add` calls of at most
    `batch_size` rows. No driver materialization, no cross-partition
    coordination — delete-by-source already happened driver-side.
    `client_factory` is the test seam; by default the worker imports
    chromadb and dials host:port.
    """

    def write_partition(rows) -> None:
        factory = client_factory
        if factory is None:  # pragma: no cover - needs chromadb on workers
            import chromadb

            def factory():
                return chromadb.HttpClient(host=host, port=port)

        col = None
        ids: list[str] = []
        docs: list[str] = []
        embs: list[list[float]] = []
        metas: list[dict] = []

        def flush():
            nonlocal col
            if not ids:
                return
            if col is None:  # connect lazily: empty partitions never dial
                col = factory().get_or_create_collection(collection_name)
            col.add(
                ids=list(ids),
                documents=list(docs),
                embeddings=list(embs),
                metadatas=list(metas),
            )
            ids.clear(), docs.clear(), embs.clear(), metas.clear()

        for row in rows:
            ids.append(content_id(row["source"], row["text"]))
            docs.append(row["text"])
            embs.append([float(x) for x in row["embedding"]])
            metas.append({"source": row["source"]})
            if len(ids) >= batch_size:
                flush()
        flush()

    return write_partition


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
    schema migration handled by LanceDB's native schema evolution.

    The batch is staged as parquet by Spark (a DISTRIBUTED write, same
    pattern as DuckDBSink) and then streamed into LanceDB as an Arrow
    RecordBatchReader — the driver holds at most one Arrow batch at a time,
    never the whole frame, so the adapter survives batches far larger than
    driver memory. The staging directory lives beside the store (same
    storage system, so executors can reach it on a real cluster) and is
    removed after the load. `db_factory` is the dependency-injection seam
    for tests; without it the real lancedb library is required up front.
    """

    def __init__(self, uri: str, table_name: str, db_factory: Callable | None = None):
        if db_factory is None:
            self._lancedb = _require("lancedb", "lancedb")
        self.uri = uri
        self.table_name = table_name
        self._db_factory = db_factory

    def _db(self):
        if self._db_factory is not None:
            return self._db_factory()
        return self._lancedb.connect(self.uri)  # pragma: no cover - needs lancedb

    @staticmethod
    def _staging_fs(staging: str):
        """(pyarrow FileSystem, path) for the staging location. Local paths
        (the embedded-store common case) use LocalFileSystem; s3a:// (the
        Hadoop spelling Spark writes) maps to pyarrow's s3://; file:/ (what
        Hadoop's makeQualified prints for a local defaultFS) is stripped to
        a plain local path. Driver-local glob/shutil would silently read
        the wrong filesystem for remote URIs — everything below goes
        through this one abstraction."""
        from urllib.parse import unquote, urlparse

        from pyarrow import fs as pafs

        if staging.startswith("file:"):
            # Hadoop prints file:/path (single slash); urlparse handles
            # both that and file:///path
            return pafs.LocalFileSystem(), unquote(urlparse(staging).path)
        if "://" not in staging:
            return pafs.LocalFileSystem(), staging
        uri = staging.replace("s3a://", "s3://", 1)
        return pafs.FileSystem.from_uri(uri)

    @staticmethod
    def _qualify(spark, staging: str) -> str:
        """Qualify a scheme-less staging path against the Hadoop defaultFS.
        Spark resolves bare paths against fs.defaultFS while pyarrow's
        LocalFileSystem reads the driver's local disk — on a cluster whose
        defaultFS is HDFS the two would silently address DIFFERENT
        filesystems and the load would find no data. Qualifying up front
        makes both sides agree (and makes the mismatch loud: an hdfs://
        URI reaches _staging_fs, which pyarrow resolves via from_uri)."""
        if "://" in staging or staging.startswith("file:"):
            return staging
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(staging)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return str(fs.makeQualified(hpath).toUri())

    def write(self, df: DataFrame) -> None:
        import posixpath

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        staging = self._qualify(
            df.sparkSession,
            posixpath.join(self.uri.rstrip("/"), f"_staging_{self.table_name}"),
        )
        filesystem, path = self._staging_fs(staging)
        df.write.mode("overwrite").parquet(staging)
        try:
            # pyarrow's default ignore_prefixes skips Spark's _SUCCESS /
            # .crc markers; the dataset streams batches without ever
            # materializing the frame
            dataset = pads.dataset(path, format="parquet", filesystem=filesystem)
            reader = pa.RecordBatchReader.from_batches(
                dataset.schema, dataset.to_batches()
            )
            # delete-by-source first (reference idempotency rule,
            # sinks.py:61-76): the distinct-source list is tiny (file
            # paths) and comes from a single-column scan of the staged
            # dataset — no second Spark job
            # a NULL source must not reach the quoting below (reference
            # sinks.py skips falsy sources: `if doc.metadata.get("source")`)
            sources = [
                s
                for s in pc.unique(
                    dataset.to_table(columns=["source"]).column("source")
                ).to_pylist()
                if s is not None
            ]
            db = self._db()
            if self.table_name in db.table_names():
                if dataset.count_rows():  # empty batch: nothing to add
                    table = db.open_table(self.table_name)
                    if sources:  # all-NULL sources: nothing to delete
                        quoted = ", ".join(
                            "'" + s.replace("'", "''") + "'" for s in sources
                        )
                        table.delete(f"source IN ({quoted})")
                    table.add(reader)
            else:
                db.create_table(self.table_name, reader)
        finally:
            try:
                filesystem.delete_dir(path)
            except OSError:  # ArrowIOError subclasses OSError
                pass

    def read(self, spark: SparkSession) -> DataFrame:  # pragma: no cover
        db = self._db()
        return spark.createDataFrame(
            db.open_table(self.table_name).to_pandas()
        )

    def delete_sources(self, spark: SparkSession, sources: list[str]):
        """Right-to-be-forgotten delete: the write path's delete-by-source
        idiom (reference sinks.py:61-76 quoting, NULLs skipped) run on its
        own. Returns None — LanceDB exposes no cheap deleted-row count."""
        db = self._db()
        if self.table_name not in db.table_names():
            return None
        src = [s for s in sources if s is not None]
        if src:
            quoted = ", ".join(
                "'" + s.replace("'", "''") + "'" for s in src
            )
            db.open_table(self.table_name).delete(f"source IN ({quoted})")
        return None

    def test_connection(self, spark: SparkSession) -> None:  # pragma: no cover
        self._db().table_names()


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
        client_factory: Callable | None = None,
    ):
        # client_factory is the dependency-injection seam (tests, custom
        # auth); without it the real chromadb library is required up front
        if client_factory is None:
            self._chromadb = _require("chromadb", "chromadb")
        if path is None and host is None:
            raise ValueError("chromadb sink needs either path or host/port")
        self.collection_name = collection_name
        self.path, self.host, self.port = path, host, port
        self._client_factory = client_factory

    def _client(self):
        if self._client_factory is not None:
            return self._client_factory()
        if self.path is not None:  # pragma: no cover - needs chromadb
            return self._chromadb.PersistentClient(path=self.path)
        return self._chromadb.HttpClient(  # pragma: no cover
            host=self.host, port=self.port
        )

    def write(self, df: DataFrame) -> None:
        # Idempotency first, once, driver-side: every source in the batch is
        # deleted before any insert (reference sinks.py:121-129). The source
        # list is tiny (distinct file paths), never the chunk rows.
        col = self._client().get_or_create_collection(self.collection_name)
        if self.host is not None:
            # NULL sources are skipped from the delete (reference
            # falsy-source rule; Chroma where-clauses reject None) but
            # their rows still land below
            sources = [
                r[0]
                for r in df.select("source").distinct().collect()
                if r[0] is not None
            ]
            for source in sources:
                col.delete(where={"source": source})
            # remote server: executors write their own partitions in
            # batches — the driver never holds the chunk rows
            df.select("source", "text", "embedding").foreachPartition(
                chroma_partition_writer(
                    self.collection_name,
                    self.host,
                    self.port,
                    client_factory=self._client_factory,
                )
            )
            return
        # embedded PersistentClient: single-process local store, so the
        # rows must still funnel through the driver (a property of the
        # target, not the pipeline) — but they STREAM through in O(batch)
        # chunks via toLocalIterator, never a full-frame toPandas
        # (mirrors the LanceDB RecordBatchReader fix; ParquetSink remains
        # the 100 TB path). Delete-by-source still happens once, first,
        # from a tiny distinct list; NULL sources are skipped from the
        # delete (reference falsy-source rule) but their rows still land.
        # the frame is consumed twice (distinct-source pass for the
        # idempotent deletes, then the row stream) — persist so an
        # expensive upstream lineage (chunk/embed UDFs) computes once
        rows = df.select("source", "text", "embedding").persist()
        try:
            sources = [
                r[0]
                for r in rows.select("source").distinct().collect()
                if r[0] is not None
            ]
            for source in sources:
                col.delete(where={"source": source})

            batch: list = []

            def flush() -> None:
                if not batch:
                    return
                col.add(
                    ids=[content_id(s, t) for s, t, _ in batch],
                    documents=[t for _, t, _ in batch],
                    embeddings=[list(map(float, v)) for _, _, v in batch],
                    metadatas=[{"source": s} for s, _, _ in batch],
                )
                batch.clear()

            for row in rows.toLocalIterator(prefetchPartitions=True):
                batch.append(
                    (row["source"], row["text"], row["embedding"])
                )
                if len(batch) >= 512:
                    flush()
            flush()
        finally:
            rows.unpersist()

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

    def delete_sources(self, spark: SparkSession, sources: list[str]):
        """Right-to-be-forgotten delete: the write path's per-source
        metadata delete run on its own (reference sinks.py:121-129; NULLs
        skipped — Chroma where-clauses reject None). Returns None — the
        API exposes no deleted-row count."""
        col = self._client().get_or_create_collection(self.collection_name)
        for source in sources:
            if source is not None:
                col.delete(where={"source": source})
        return None

    def test_connection(self, spark: SparkSession) -> None:  # pragma: no cover
        self._client().heartbeat() if self.host else self._client().list_collections()
