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
        from yaml_pipe_spark.operators.index_meta import tiny_local_df

        tiny_local_df(
            spark,
            [(n, h, version, self.bits, self.bands, self.max_hamming)],
            "fp_n long, fp_h long, version string, bits int, bands int, "
            "max_hamming int",
        ).write.mode("overwrite").parquet(self.meta_path)

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


class MinHashOverlapStore:
    """Persisted MinHash candidate-pair OVERLAP — the MinHash twin of
    PairGraphStore, amortizing the OTHER half of the dedup audit family.

    Five queries consume the same standard-config (k=3, 16 hashes,
    4 bands) MinHash verify frame: jaccard pairs (dedup_minhash_lsh),
    containment pairs (dedup_containment), the per-source dup-rate rollup,
    the per-lang dedup funnel, and the fuzzy benchmark-decontamination
    gate (whose cross-strata candidates are a strata-filtered SUBSET of
    the standard bucket pairs). The expensive stages — corpus shingle,
    16-hash signatures, banding join, df-guarded inverted-index verify —
    are identical across all five; the store materializes their shared
    product ONCE per corpus:

      overlap/   (id_a, id_b, inter, na, nb) — candidate-pair-sized,
                 orders of magnitude below the corpus; every downstream
                 metric (jaccard, containment, loser sets, strata
                 filters) is a narrow projection of it
      meta/      corpus fingerprint + banding/df params

    Same staleness contract as the other stores: one-aggregate
    (count, bit_xor(xxhash64)) fingerprint, rebuild on any param change.
    No append mode — candidate pairs do not compose over disjoint row
    sets; incremental MinHash is the band-state path
    (operators/dedup.py::minhash_band_state).
    """

    def __init__(
        self,
        base_path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        k: int = 3,
        n_hashes: int = 16,
        bands: int = 4,
    ):
        self.base_path = base_path
        self.id_col = id_col
        self.text_col = text_col
        self.k = k
        self.n_hashes = n_hashes
        self.bands = bands

    @property
    def overlap_path(self) -> str:
        return os.path.join(self.base_path, "overlap")

    @property
    def meta_path(self) -> str:
        return os.path.join(self.base_path, "meta")

    def _fingerprint(self, docs: DataFrame) -> tuple[int, int]:
        from yaml_pipe_spark.operators.index_meta import fingerprint_of

        return fingerprint_of(docs, self.id_col, self.text_col)

    def _read_meta(self, spark: SparkSession) -> dict | None:
        from yaml_pipe_spark.operators.index_meta import read_meta

        return read_meta(spark, self.meta_path)

    def build(self, docs: DataFrame, version: str | None = None) -> None:
        """ONE corpus pass: shingle -> sign -> band -> bucket-join ->
        df-guarded inverted-index verify; persist the overlap + meta."""
        from yaml_pipe_spark.operators.dedup import (
            DEFAULT_DF_MAX_FRAC,
            DEFAULT_DF_MIN_CUT,
            _pair_overlap,
            lsh_candidate_pairs,
            minhash_signatures,
            token_shingles,
        )

        spark = docs.sparkSession
        docs = docs.select(self.id_col, self.text_col)
        shingles = token_shingles(docs, self.text_col, self.id_col, self.k)
        cands = lsh_candidate_pairs(
            minhash_signatures(shingles, self.id_col, self.n_hashes),
            self.id_col,
            self.n_hashes,
            self.bands,
        )
        overlap = _pair_overlap(
            shingles,
            cands,
            self.id_col,
            None,
            DEFAULT_DF_MAX_FRAC,
            DEFAULT_DF_MIN_CUT,
        )
        overlap.write.mode("overwrite").parquet(self.overlap_path)
        if version is None:
            n, h = self._fingerprint(docs)
        else:
            n, h = -1, -1
        from yaml_pipe_spark.operators.index_meta import tiny_local_df

        tiny_local_df(
            spark,
            [(n, h, version, self.k, self.n_hashes, self.bands)],
            "fp_n long, fp_h long, version string, k int, n_hashes int, "
            "bands int",
        ).write.mode("overwrite").parquet(self.meta_path)

    def is_stale(self, docs: DataFrame, version: str | None = None) -> bool:
        meta = self._read_meta(docs.sparkSession)
        if meta is None:
            return True
        if (
            meta["k"] != self.k
            or meta["n_hashes"] != self.n_hashes
            or meta["bands"] != self.bands
        ):
            return True
        if version is not None:
            return meta["version"] != version
        n, h = self._fingerprint(docs.select(self.id_col, self.text_col))
        return (meta["fp_n"], meta["fp_h"]) != (n, h)

    def build_if_stale(
        self, docs: DataFrame, version: str | None = None
    ) -> bool:
        if not self.is_stale(docs, version):
            return False
        self.build(docs, version)
        return True

    def overlap(self, spark: SparkSession) -> DataFrame:
        """(id_a, id_b, inter, na, nb) for every surviving candidate pair."""
        return spark.read.parquet(self.overlap_path)

    def jaccard_pairs(
        self, spark: SparkSession, threshold: float = 0.8
    ) -> DataFrame:
        """(id_a, id_b, jaccard) at `threshold` — dedup_minhash_lsh's
        frame as a projection of the persisted overlap."""
        j = F.round(
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
        )
        return (
            self.overlap(spark)
            .select("id_a", "id_b", j.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
        )
