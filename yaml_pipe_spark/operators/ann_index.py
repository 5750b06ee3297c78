"""Persisted IVF-PQ index lifecycle — build once, serve many (SURVEY §2.7).

The reference separates index building from querying: `core/pipeline.py`
builds the LanceDB table once, `core/evaluation.py:44-64` opens the standing
table and only runs searches against it. The in-query `ivfpq_topk` collapses
that split (it re-assigns and re-encodes the corpus inside every query) —
fine for an oracle query, wrong for production, where the corpus-scale
assign+encode must be paid once per corpus snapshot and amortized over every
search.

`IvfPqIndexStore` is the Spark-native build/serve split:

  build  — one corpus pass: IVF-assign every vector to its nearest pinned
           centroid AND compress it to 2-bit PQ codes; persist
             <base>/centroids  (k x dim, tiny)
             <base>/codes      (id, code) parquet PARTITIONED BY cid
             <base>/vectors    (id, full-precision vector) parquet
             <base>/meta       (one row: corpus fingerprint + build params)
  serve  — reads only the persisted tables. The coarse probe touches the
           broadcast centroids; the ADC scan joins the BROADCAST probe set
           against the codes table, so the index side has NO shuffle and —
           because the codes are laid out by cid — only the probed cells'
           files are read (partition pruning, nprobe/n_cells of 2-bit data).
           Exact re-rank joins the broadcast ADC top-m back to the vectors
           table. Identical `_pq_serve` semantics to the in-query path, so
           a persisted serve is value-equal to a fresh build.

Layout note: the codes table is hive-PARTITIONED by cid rather than
bucketed (`operators/sinks.py::BucketedTable`): bucketing pre-shuffles for
equi-joins between two large tables, but the serve-side join partner (the
probe set) is queries x nprobe rows and always broadcast — what the index
needs is *pruning*, and directory-partitioning by cid is what turns a probe
into a subset scan. (See `tests/test_ann_recall.py::
test_ivf_assignment_partition_pruned_probe` for the pruning assertion.)

Staleness: `build` stamps the corpus fingerprint (row count + a bit_xor
fold of per-row xxhash64 over id and vector — order-insensitive, computed
in one cheap aggregate; XOR, not a sum, so append() can compose it
incrementally over disjoint row sets) and the build params into
<base>/meta. `build_if_stale`
rebuilds iff the fingerprint or params changed; callers with a snapshot
version string can pass `version=` to skip the fingerprint scan entirely
(the metastore-driven production mode).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yaml_pipe_spark.operators.similarity import (
    _coarse_probes,
    _pq_serve,
    ivf_assign,
    sq2_codes,
)


class IvfPqIndexStore:
    """Build-once / serve-many persisted IVF-PQ index at `base_path`."""

    def __init__(
        self,
        base_path: str,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        cid_col: str = "cid",
        cvec_col: str = "cv",
        scale: int = 8,
        score_decimals: int = 6,
    ):
        self.base_path = base_path
        self.vec_col = vec_col
        self.id_col = id_col
        self.cid_col = cid_col
        self.cvec_col = cvec_col
        self.scale = scale
        self.score_decimals = score_decimals

    # -- paths ----------------------------------------------------------
    @property
    def centroids_path(self) -> str:
        return os.path.join(self.base_path, "centroids")

    @property
    def codes_path(self) -> str:
        return os.path.join(self.base_path, "codes")

    @property
    def vectors_path(self) -> str:
        return os.path.join(self.base_path, "vectors")

    @property
    def meta_path(self) -> str:
        return os.path.join(self.base_path, "meta")

    # -- fingerprint (shared with Bm25IndexStore via index_meta) ---------
    @staticmethod
    def _fp_of(df: DataFrame, *cols: str) -> tuple[int, int]:
        from yaml_pipe_spark.operators.index_meta import fingerprint_of

        return fingerprint_of(df, *cols)

    def _fingerprint(self, corpus: DataFrame) -> tuple[int, int]:
        return self._fp_of(corpus, self.id_col, self.vec_col)

    def _centroid_fingerprint(self, centroids: DataFrame) -> tuple[int, int]:
        return self._fp_of(centroids, self.cid_col, self.cvec_col)

    def _read_meta(self, spark: SparkSession) -> dict | None:
        from yaml_pipe_spark.operators.index_meta import read_meta

        return read_meta(spark, self.meta_path)

    # -- lifecycle ------------------------------------------------------
    def build(
        self,
        corpus: DataFrame,
        centroids: DataFrame,
        version: str | None = None,
    ) -> None:
        """One corpus pass: assign + encode, then persist all four tables.

        The assign/encode job is embarrassingly parallel (centroids are
        broadcast; the only shuffle is ivf_assign's groupBy on the vector
        id) and the codes write is partitioned by cid so serves prune."""
        spark = corpus.sparkSession
        corpus = corpus.select(self.id_col, self.vec_col)
        coded = ivf_assign(
            corpus,
            centroids,
            self.vec_col,
            self.id_col,
            self.cid_col,
            self.cvec_col,
            self.score_decimals,
        ).select(
            self.id_col,
            self.cid_col,
            sq2_codes(F.col(self.vec_col)).alias("code"),
        )
        # STATIC overwrite, pinned per-write: the session default here (and
        # in any pipeline session) is partitionOverwriteMode=dynamic, under
        # which a rebuild would only replace partitions present in the NEW
        # data — an IVF cell emptied by the corpus change would keep
        # advertising its old codes and serve deleted vectors
        (
            coded.write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy(self.cid_col)
            .parquet(self.codes_path)
        )
        corpus.write.mode("overwrite").parquet(self.vectors_path)
        centroids.write.mode("overwrite").parquet(self.centroids_path)
        if version is None:
            n, h = self._fingerprint(corpus)
        else:
            n, h = -1, -1
        cn, ch = self._centroid_fingerprint(centroids)
        spark.createDataFrame(
            [(n, h, cn, ch, version, self.scale, self.score_decimals)],
            "fp_n long, fp_h long, cfp_n long, cfp_h long, version string, "
            "scale int, score_decimals int",
        ).coalesce(1).write.mode("overwrite").parquet(self.meta_path)

    def is_stale(
        self,
        corpus: DataFrame,
        version: str | None = None,
        centroids: DataFrame | None = None,
    ) -> bool:
        """True iff no index exists, build params changed, the CENTROIDS
        changed (a refit coarse quantizer invalidates every code), or the
        corpus moved on (by `version` when given, else by fingerprint
        scan)."""
        meta = self._read_meta(corpus.sparkSession)
        if meta is None:
            return True
        if (
            meta["scale"] != self.scale
            or meta["score_decimals"] != self.score_decimals
        ):
            return True
        if centroids is not None:
            cn, ch = self._centroid_fingerprint(centroids)
            # metas written before the centroid fingerprint existed force a
            # rebuild rather than silently serving an unverifiable index
            if (meta.get("cfp_n"), meta.get("cfp_h")) != (cn, ch):
                return True
        if version is not None:
            return meta["version"] != version
        n, h = self._fingerprint(corpus.select(self.id_col, self.vec_col))
        return (meta["fp_n"], meta["fp_h"]) != (n, h)

    def build_if_stale(
        self,
        corpus: DataFrame,
        centroids: DataFrame,
        version: str | None = None,
    ) -> bool:
        """Rebuild when stale; returns whether a rebuild ran."""
        if not self.is_stale(corpus, version, centroids=centroids):
            return False
        self.build(corpus, centroids, version)
        return True

    def append(
        self, increment: DataFrame, version: str | None = None
    ) -> None:
        """Incremental index maintenance — the daily-increment mode: assign
        + encode ONLY the increment against the PERSISTED centroids and
        append its code/vector rows into the existing tables; no corpus
        rescan, no rebuild. Cost tracks the increment, exactly like
        incremental_minhash_dedup on the text side.

        The corpus fingerprint updates INCREMENTALLY and stays exact:
        count adds and the content hash is a bit_xor fold, which is
        order-free and composes over disjoint row sets — after any append
        chain, is_stale(full_corpus) still compares equal iff the indexed
        rows are exactly the corpus rows. (This is why the fingerprint is
        XOR, not a sum.)

        Contract: increment ids must be NEW — appending an already-indexed
        id duplicates its rows (and flips its hash back OUT of the
        fingerprint, so the next is_stale correctly reports the corruption
        rather than masking it). Re-ingestion of changed rows goes through
        build(). Centroids are frozen by design: a coarse-quantizer refit
        invalidates every code and must rebuild (is_stale's centroid
        fingerprint enforces this).
        """
        spark = increment.sparkSession
        meta = self._read_meta(spark)
        if meta is None:
            raise ValueError("append() requires an existing index; build() first")
        if (meta["version"] is None) != (version is None):
            # composing a real fingerprint with the version-mode (-1,-1)
            # sentinel would stamp garbage meta; fail at the caller's bug
            raise ValueError(
                "append() staleness mode must match the build: the index "
                f"was built with version={meta['version']!r}, append got "
                f"version={version!r}"
            )
        centroids = spark.read.parquet(self.centroids_path)
        inc = increment.select(self.id_col, self.vec_col)
        coded = ivf_assign(
            inc,
            centroids,
            self.vec_col,
            self.id_col,
            self.cid_col,
            self.cvec_col,
            self.score_decimals,
        ).select(
            self.id_col,
            self.cid_col,
            sq2_codes(F.col(self.vec_col)).alias("code"),
        )
        coded.write.mode("append").partitionBy(self.cid_col).parquet(
            self.codes_path
        )
        inc.write.mode("append").parquet(self.vectors_path)
        if meta["fp_n"] >= 0:
            n, h = self._fp_of(inc, self.id_col, self.vec_col)
            fp_n, fp_h = meta["fp_n"] + n, meta["fp_h"] ^ h
        else:
            fp_n, fp_h = -1, -1  # version-managed index stays version-managed
        spark.createDataFrame(
            [
                (
                    fp_n,
                    fp_h,
                    meta["cfp_n"],
                    meta["cfp_h"],
                    version if version is not None else meta["version"],
                    self.scale,
                    self.score_decimals,
                )
            ],
            "fp_n long, fp_h long, cfp_n long, cfp_h long, version string, "
            "scale int, score_decimals int",
        ).coalesce(1).write.mode("overwrite").parquet(self.meta_path)

    # -- serve ----------------------------------------------------------
    def serve(
        self,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 2,
        rerank_m: int = 20,
        query_id: str = "qid",
        query_vec: str = "qv",
    ) -> DataFrame:
        """Top-k from the PERSISTED tables only — no assign/encode rerun.

        Plan contract (asserted in tests/test_ann_index.py): exactly three
        parquet scans (centroids, codes, vectors); the probe set joins the
        codes scan as the BROADCAST side, so the index never shuffles; the
        closed-form code assignment (`floor(v*8)`) appears nowhere in the
        serve plan because codes come off disk."""
        spark = queries.sparkSession
        centroids = spark.read.parquet(self.centroids_path)
        codes = spark.read.parquet(self.codes_path).withColumnRenamed(
            "code", "__code"
        )
        vectors = spark.read.parquet(self.vectors_path)
        qprobe = _coarse_probes(
            queries,
            centroids,
            nprobe,
            query_id,
            query_vec,
            self.cid_col,
            self.cvec_col,
            self.score_decimals,
            with_residual=False,
        )
        # match the hive-inferred partition-column dtype (int) on the probe
        # side so the equi-join needs no cast above the pruned codes scan
        qprobe = qprobe.withColumn(
            self.cid_col,
            F.col(self.cid_col).cast(
                dict(codes.dtypes)[self.cid_col]
            ),
        )
        return _pq_serve(
            vectors,
            codes,
            F.broadcast(qprobe),
            self.scale,
            k,
            rerank_m,
            query_id,
            query_vec,
            self.vec_col,
            self.id_col,
            self.cid_col,
            self.score_decimals,
        )


def serve_query_stream(
    spark: SparkSession,
    store: IvfPqIndexStore,
    input_dir: str,
    results_dir: str,
    checkpoint_dir: str,
    schema: str = "qid long, qv array<double>",
    k: int = 5,
    nprobe: int = 2,
    rerank_m: int = 20,
    query_id: str = "qid",
    query_vec: str = "qv",
    max_files_per_trigger: int | None = None,
) -> None:
    """The ANN production loop closed: a STREAM of queries served against
    the persisted index — build once (IvfPqIndexStore.build), then every
    query micro-batch runs the same three-tier serve (broadcast probes,
    pruned 2-bit ADC scan, broadcast re-rank) via foreachBatch and lands
    in `results_dir` partitioned by a content-derived batch key.

    Idempotency matches run_incremental_dedup_stream: the partition key
    __snap = min(query id) of the batch is content-derived (epoch ids are
    not replay-stable) and the write is a dynamic partition overwrite, so
    a crash-replay of a drained batch overwrites its own partition with
    identical rows. The contract is per BATCH SPLIT — exactly what crash
    replay re-reads from the checkpoint's offsets; re-draining the same
    input under a different split keys different partitions and needs a
    fresh results_dir. The serve itself is stateless over the index,
    which only changes through build_if_stale, between drains.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        batch = batch_df.select(query_id, query_vec).localCheckpoint()
        row = batch.agg(F.min(query_id).alias("m")).collect()[0]
        if row["m"] is None:
            return
        out = store.serve(
            batch, k=k, nprobe=nprobe, rerank_m=rerank_m,
            query_id=query_id, query_vec=query_vec,
        )
        (
            out.withColumn("__snap", F.lit(int(row["m"])))
            .write.mode("overwrite")
            .partitionBy("__snap")
            .parquet(results_dir)
        )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(input_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
