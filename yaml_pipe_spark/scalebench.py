"""Scale-growth measurement harness (VERDICT r6 ask #5).

The 100 TB story rested on plan shapes plus fixed-size sf0.1 timings; this
harness measures how the HEAVY operator families actually grow: each family
runs on deterministic synthetic corpora (operators/scalegen.py — constant
near-dup density, fixed vocabulary, fixed cluster structure) at two sizes,
and the empirical scaling exponent is

    alpha = ln(t_big / t_small) / ln(n_big / n_small)

so alpha ~ 1 is linear, 2 quadratic. Guarded paths must stay near-linear:
scripts/scale_growth.py records the 5k -> 50k (10x) table for PERF.md, and
tests/test_scale_growth.py pins alpha <= 1.3 at a smaller, CI-sized pair.

Inputs are eagerly localCheckpointed before the clock starts, so generator
cost never leaks into an operator's exponent; every family takes min-of-N
reps (scheduling jitter is one-sided noise).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yaml_pipe_spark.operators.scalegen import (
    synthetic_documents,
    synthetic_embeddings,
)


def _fam_minhash_lsh(spark, docs, emb, tmp):
    from yaml_pipe_spark.operators.dedup import minhash_near_duplicates

    return minhash_near_duplicates(
        docs, "text", "doc_id", k=3, n_hashes=16, bands=4, threshold=0.8
    ).count()


def _fam_simhash_cc(spark, docs, emb, tmp):
    from yaml_pipe_spark.operators.dedup import (
        connected_components,
        simhash_fingerprints,
        simhash_near_duplicates,
    )

    fps = simhash_fingerprints(docs, "text", "doc_id")
    prs = simhash_near_duplicates(
        fps, "doc_id", bits=64, bands=4, max_hamming=3
    )
    return connected_components(prs).count()


def _fam_bm25_build_serve(spark, docs, emb, tmp):
    from yaml_pipe_spark.operators.retrieval import Bm25IndexStore

    store = Bm25IndexStore(os.path.join(tmp, "bm25"))
    store.build(docs.select("doc_id", "text"))
    return store.serve(k=10).count()


def _fam_ivfpq_build_serve(spark, docs, emb, tmp):
    from yaml_pipe_spark.operators.ann_index import IvfPqIndexStore

    cents = emb.filter(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    qs = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    store = IvfPqIndexStore(os.path.join(tmp, "ivfpq"))
    store.build(emb, cents)
    return store.serve(qs, k=5, nprobe=4, rerank_m=20).count()


def _fam_bloom_decontaminate(spark, docs, emb, tmp):
    from yaml_pipe_spark.operators.bloom import bloom_bits, bloom_flag

    grams = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.filter(
                    F.sequence(
                        F.lit(0),
                        F.size(F.split("text", " ")) - 3,
                    ),
                    lambda i: i % 7 == F.lit(0),
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(F.split("text", " "), i + 1, 3)
                ),
            )
        ).alias("gram"),
    )
    train = grams.filter(F.col("doc_id") % 11 == 0).select("gram").distinct()
    probe = grams.filter(F.col("doc_id") % 11 != 0)
    bits = bloom_bits(train)
    return bloom_flag(probe.select("gram").distinct(), bits).count()


def _fam_stream_bm25_append(spark, docs, emb, tmp):
    """Streaming BM25 maintenance drain (VERDICT r7 ask #5): a CONSTANT
    64-doc standing index, then the scaling remainder drains through
    run_bm25_append_stream as three micro-batches — the timed work is
    staging + drain, so the exponent tracks the maintenance path, not the
    initial build."""
    from yaml_pipe_spark.operators.retrieval import Bm25IndexStore
    from yaml_pipe_spark.streaming.stream import run_bm25_append_stream

    standing = docs.filter(F.col("doc_id") < 64).select("doc_id", "text")
    inc = docs.filter(F.col("doc_id") >= 64).select("doc_id", "text")
    inp = os.path.join(tmp, "in")
    inc.repartition(3).write.mode("overwrite").parquet(inp)
    store = Bm25IndexStore(os.path.join(tmp, "bm25"))
    store.build(standing)
    run_bm25_append_stream(
        spark,
        inp,
        store,
        os.path.join(tmp, "ckpt"),
        max_files_per_trigger=1,
    )
    return store.serve(k=10).count()


def _fam_stream_incremental_dedup(spark, docs, emb, tmp):
    """Streaming incremental near-dup drain (VERDICT r7 ask #5): the corpus
    drains through run_incremental_dedup_stream as three micro-batches,
    each deduping against the accumulated band state — per batch ONE
    equi-join vs standing state, so the whole drain must stay near-linear
    in corpus size."""
    from yaml_pipe_spark.streaming.stream import run_incremental_dedup_stream

    inp = os.path.join(tmp, "in")
    docs.select("doc_id", "text").repartition(3).write.mode(
        "overwrite"
    ).parquet(inp)
    state = os.path.join(tmp, "state")
    run_incremental_dedup_stream(
        spark,
        inp,
        state,
        os.path.join(tmp, "ckpt"),
        k=3,
        n_hashes=16,
        bands=4,
        threshold=0.8,
        max_files_per_trigger=1,
    )
    return spark.read.parquet(os.path.join(state, "verdicts")).count()


def _fam_phash_dedup(spark, docs, emb, tmp):
    """Perceptual-hash image near-dup (round 9): hashing is a linear
    per-row Python stage (build + decode + dHash per doc_id); pairing is
    ONE (band, word) equi-join behind the bucket cap, and the 4-variant
    group structure keeps found-pair mass linear in n — a superlinear
    exponent here means the band join lost its cap."""
    from yaml_pipe_spark.multimodal.phash import (
        phash_bands,
        phash_near_dup_pairs,
    )

    return phash_near_dup_pairs(
        phash_bands(docs.select("doc_id"), "doc_id")
    ).count()


def _fam_bpe_train(spark, docs, emb, tmp):
    """Distributed BPE merge training (round 9): ONE corpus tokenize +
    count, then per-round vocabulary-scale aggregations — with the
    generator's constant vocabulary the rounds are ~flat and the corpus
    pass dominates, so the exponent must stay near-linear. Four rounds
    keep the CI pair fast; the round count multiplies a vocab-scale
    constant, not the exponent."""
    from yaml_pipe_spark.operators.text_stats import bpe_train_merges

    return bpe_train_merges(docs, "text", rounds=4).count()


def _fam_bm25_lifecycle(spark, docs, emb, tmp):
    """forget -> compact -> serve on the persisted BM25 store (VERDICT r10
    ask #6): standing build is UNTIMED setup; the timed chain appends a
    proportional increment (doc_id%13==5), forgets a proportional slice
    (doc_id%7==3), physically compacts (tombstone purge + defragment), and
    serves. The claim under guard: every step is increment/deletion/
    fragmentation-proportional or one linear rewrite — never superlinear."""
    from yaml_pipe_spark.operators.retrieval import Bm25IndexStore

    all_docs = docs.select("doc_id", "text")
    standing = all_docs.filter(F.col("doc_id") % 13 != 5)
    inc = all_docs.filter(F.col("doc_id") % 13 == 5).localCheckpoint()
    gone = all_docs.filter(F.col("doc_id") % 7 == 3).localCheckpoint()
    store = Bm25IndexStore(os.path.join(tmp, "bm25fc"))
    store.build(standing)
    t0 = time.monotonic()
    store.append(inc)
    store.forget(gone)
    store.compact(min_files=1)  # force the defragmentation rewrite too
    rows = store.serve(k=10).count()
    return rows, time.monotonic() - t0


def _fam_ivfpq_lifecycle(spark, docs, emb, tmp):
    """The IVF-PQ twin of _fam_bm25_lifecycle: append (bucket-proportional)
    -> forget (partition surgery) -> compact (fragmented partitions only)
    -> pruned serve, timed without the standing build."""
    from yaml_pipe_spark.operators.ann_index import IvfPqIndexStore

    cents = emb.filter(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    qs = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    standing = emb.filter(F.col("vec_id") % 13 != 5)
    inc = emb.filter(F.col("vec_id") % 13 == 5).localCheckpoint()
    gone = (
        emb.filter(F.col("vec_id") % 7 == 3)
        .select("vec_id")
        .localCheckpoint()
    )
    store = IvfPqIndexStore(os.path.join(tmp, "ivfpqfc"))
    store.build(standing, cents)
    t0 = time.monotonic()
    store.append(inc)
    store.forget(gone)
    store.compact()
    rows = store.serve(qs, k=5, nprobe=4, rerank_m=20).count()
    return rows, time.monotonic() - t0


def _fam_kmeans_lloyd(spark, docs, emb, tmp):
    """The trained coarse quantizer (round 12): 3 exact-integer Lloyd
    rounds + final assignment. Per round ONE vec_id shuffle and ONE
    k*dim-bounded combine, so the exponent must stay ~linear in corpus
    size; the per-round localCheckpoint jobs are a fixed constant."""
    from yaml_pipe_spark.operators.similarity import kmeans_lloyd_u6

    seeds = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    _, asg = kmeans_lloyd_u6(emb, seeds, rounds=3)
    return asg.count()


def _fam_logreg_distill(spark, docs, emb, tmp):
    """The GD-trained quality classifier (round 12): feature hashing is
    the (doc, token) diamond; each of the 12 rounds is one doc-keyed
    shuffle + one 66-row combine, so growth must track the corpus, with
    the fixed per-round job overhead amortizing away at scale."""
    from yaml_pipe_spark.operators.classifier import logreg_quality_distill
    from yaml_pipe_spark.operators.quality import gopher_quality_signals

    labels = gopher_quality_signals(docs).select("doc_id", "gopher_pass")
    row = logreg_quality_distill(docs, labels).collect()[0]
    return int(row.n_train + row.n_test)


def _fam_nprobe_tune(spark, docs, emb, tmp):
    """The measured nprobe auto-tune (round 13): ONE corpus-scale ADC
    join at max(nprobes) with probe ranks attached, per-curve-point
    windows over the shared frame, one batched rerank over the union of
    top-m sets, the guarded Arrow exact side over a FIXED query sample,
    and a |nprobes|-row selection window — the corpus-growing parts are
    the ADC join and the exact side's corpus scan, so the exponent must
    stay ~linear."""
    from yaml_pipe_spark.operators.similarity import (
        ivfpq_recall_curve,
        select_nprobe,
    )

    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    sel = select_nprobe(
        ivfpq_recall_curve(queries, emb, cents, nprobes=(1, 2, 4))
    )
    return sel.count()


FAMILIES = {
    "minhash_lsh_pairs": _fam_minhash_lsh,
    "simhash_cc": _fam_simhash_cc,
    "bm25_build_serve": _fam_bm25_build_serve,
    "ivfpq_build_serve": _fam_ivfpq_build_serve,
    "bloom_decontaminate": _fam_bloom_decontaminate,
    "stream_bm25_append": _fam_stream_bm25_append,
    "stream_incremental_dedup": _fam_stream_incremental_dedup,
    "phash_dedup": _fam_phash_dedup,
    "bpe_train": _fam_bpe_train,
    "bm25_lifecycle": _fam_bm25_lifecycle,
    "ivfpq_lifecycle": _fam_ivfpq_lifecycle,
    "kmeans_lloyd": _fam_kmeans_lloyd,
    "logreg_distill": _fam_logreg_distill,
    "nprobe_tune": _fam_nprobe_tune,
}


def corpus_at(spark: SparkSession, n_docs: int) -> tuple[DataFrame, DataFrame]:
    """Eagerly materialized (docs, embeddings) at size n.

    Embeddings scale with n_docs but never drop below 64 vectors: the
    IVF-PQ family needs more points than coarse cells to fit a meaningful
    quantizer, and CI runs measurement pairs as small as a few dozen docs.
    At the alpha-measurement sizes (>= 5000) the floor is inert and the
    two modalities scale together exactly (ADVICE r7)."""
    from yaml_pipe_spark.session import spread_for_expansion

    docs = spread_for_expansion(
        synthetic_documents(spark, n_docs)
    ).localCheckpoint(eager=True)
    emb = spread_for_expansion(
        synthetic_embeddings(spark, max(64, n_docs))
    ).localCheckpoint(eager=True)
    return docs, emb


def run_scale_growth(
    spark: SparkSession,
    tmp: str,
    sizes: tuple[int, int] = (5000, 50000),
    reps: int = 2,
    families: dict | None = None,
) -> dict:
    """{family: {n_small, n_big, t_small, t_big, rows_small, rows_big,
    alpha}} with min-of-`reps` timings."""
    import math

    fams = families or FAMILIES
    n1, n2 = sizes
    data = {n: corpus_at(spark, n) for n in sizes}
    out = {}
    for name, fn in fams.items():
        res = {}
        for n in sizes:
            docs, emb = data[n]
            best, rows = None, None
            for r in range(reps):
                t = os.path.join(tmp, f"{name}_{n}_{r}")
                os.makedirs(t, exist_ok=True)
                t0 = time.monotonic()
                ret = fn(spark, docs, emb, t)
                dt = time.monotonic() - t0
                # a family may time a SUB-CHAIN itself (returning
                # (rows, elapsed)) so untimed setup — e.g. the standing
                # build ahead of a forget->compact->serve chain — cannot
                # mask the exponent of the maintenance path under test
                if isinstance(ret, tuple):
                    rows, dt = ret[0], ret[1]
                else:
                    rows = ret
                best = dt if best is None else min(best, dt)
            res[n] = (best, rows)
        (t1, r1), (t2, r2) = res[n1], res[n2]
        out[name] = {
            "n_small": n1,
            "n_big": n2,
            "t_small": round(t1, 3),
            "t_big": round(t2, 3),
            "rows_small": r1,
            "rows_big": r2,
            "alpha": round(math.log(t2 / t1) / math.log(n2 / n1), 3),
        }
    return out
