"""Persisted near-dup pair graph — the graph twin of the IVF-PQ vector
store (operators/ann_index.py) and the BM25 inverted-index store
(operators/retrieval.py).

Why it exists: the near-dup audit family — cluster resolution, quality-aware
canonical selection, split-leakage accounting, PageRank template detection —
all start from the SAME SimHash pair frame and its connected-component
labels, and before this store each query re-shingled the corpus and re-ran
the banding join + iterative CC from scratch. At 100 TB that is the single
most expensive frame in the curation pipeline (a full-corpus tokenize +
(doc, token) shuffle + band self-join + an iterative label loop), paid once
per AUDIT instead of once per CORPUS. The store materializes pairs + labels
once, stamps the same (count, bit_xor(xxhash64)) corpus fingerprint the
other two stores use (operators/index_meta.py — ONE narrow aggregate to
check staleness), and every downstream audit becomes a parquet scan over a
frame that is orders of magnitude smaller than the corpus.

No append mode, deliberately: near-dup pairs do NOT compose over disjoint
row sets (new docs pair against STANDING docs), so incremental maintenance
is the minhash band-state path (operators/dedup.py::minhash_band_state and
streaming/stream.py::run_incremental_dedup_stream), not a pair-table
append. A changed corpus rebuilds; the fingerprint makes that decision one
aggregate.

Reference parity: the reference has no graph store (its dedup surface is
content-hash state, utils/state_manager.py) — this is part of the
training-data-pipeline extension surface, same contract as the other
persisted stores.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class PairGraphStore:
    """Build-once / serve-many persisted SimHash pair graph + CC labels."""

    def __init__(
        self,
        base_path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        bits: int = 64,
        bands: int = 4,
        max_hamming: int = 3,
    ):
        self.base_path = base_path
        self.id_col = id_col
        self.text_col = text_col
        self.bits = bits
        self.bands = bands
        self.max_hamming = max_hamming

    # -- paths ----------------------------------------------------------
    @property
    def pairs_path(self) -> str:
        return os.path.join(self.base_path, "pairs")

    @property
    def labels_path(self) -> str:
        return os.path.join(self.base_path, "labels")

    @property
    def meta_path(self) -> str:
        return os.path.join(self.base_path, "meta")

    # -- fingerprint (shared with the other stores via index_meta) -------
    def _fingerprint(self, docs: DataFrame) -> tuple[int, int]:
        from yaml_pipe_spark.operators.index_meta import fingerprint_of

        return fingerprint_of(docs, self.id_col, self.text_col)

    def _read_meta(self, spark: SparkSession) -> dict | None:
        from yaml_pipe_spark.operators.index_meta import read_meta

        return read_meta(spark, self.meta_path)

    # -- lifecycle ------------------------------------------------------
    def build(self, docs: DataFrame, version: str | None = None) -> None:
        """ONE corpus pass: shingle -> SimHash banding join -> Hamming
        verify -> iterative CC; persist pairs, labels, and the meta row.

        The pair frame is localCheckpointed before CC so the banding join
        runs once and feeds both tables; writes are plain overwrites (the
        tables are unpartitioned — the pair graph is pair-mass-sized, not
        corpus-sized, and downstream audits always read it whole)."""
        from yaml_pipe_spark.operators.dedup import (
            connected_components,
            simhash_fingerprints,
            simhash_near_duplicates,
        )

        spark = docs.sparkSession
        docs = docs.select(self.id_col, self.text_col)
        fps = simhash_fingerprints(docs, self.text_col, self.id_col, self.bits)
        pairs = simhash_near_duplicates(
            fps,
            self.id_col,
            bits=self.bits,
            bands=self.bands,
            max_hamming=self.max_hamming,
        ).localCheckpoint(eager=True)
        labels = connected_components(pairs)
        pairs.write.mode("overwrite").parquet(self.pairs_path)
        labels.write.mode("overwrite").parquet(self.labels_path)
        if version is None:
            n, h = self._fingerprint(docs)
        else:
            n, h = -1, -1
        spark.createDataFrame(
            [(n, h, version, self.bits, self.bands, self.max_hamming)],
            "fp_n long, fp_h long, version string, bits int, bands int, "
            "max_hamming int",
        ).coalesce(1).write.mode("overwrite").parquet(self.meta_path)

    def is_stale(self, docs: DataFrame, version: str | None = None) -> bool:
        """True iff no store exists, the banding params changed, or the
        corpus moved on (by `version` when given, else by the one-aggregate
        fingerprint scan)."""
        meta = self._read_meta(docs.sparkSession)
        if meta is None:
            return True
        if (
            meta["bits"] != self.bits
            or meta["bands"] != self.bands
            or meta["max_hamming"] != self.max_hamming
        ):
            return True
        if version is not None:
            return meta["version"] != version
        n, h = self._fingerprint(docs.select(self.id_col, self.text_col))
        return (meta["fp_n"], meta["fp_h"]) != (n, h)

    def build_if_stale(
        self, docs: DataFrame, version: str | None = None
    ) -> bool:
        """Rebuild when stale; returns whether a rebuild ran."""
        if not self.is_stale(docs, version):
            return False
        self.build(docs, version)
        return True

    # -- serve ----------------------------------------------------------
    def pairs(self, spark: SparkSession) -> DataFrame:
        """(id_a, id_b, hamming) — the verified near-dup pairs."""
        return spark.read.parquet(self.pairs_path)

    def labels(self, spark: SparkSession) -> DataFrame:
        """(node, cluster_rep) — CC labels; singletons absent by
        construction (only matched docs enter the pair graph)."""
        return spark.read.parquet(self.labels_path)
