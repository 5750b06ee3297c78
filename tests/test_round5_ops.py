"""Round-5 additions: ADVICE fixes (wav passthrough, RTF \\bin, EPUB
mixed content) and the round-5 operator wave."""

from __future__ import annotations

import io
import wave

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------- ADVICE fixes


def _wav(sampwidth: int, channels: int, rate: int, frames: bytes) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue()


def test_resample_media_passes_through_out_of_scope_wav(spark):
    """A 16-bit or stereo WAV (outside resample_wav's stdlib scope) must
    pass through resample_media UNCHANGED, not crash the Spark stage
    (ADVICE r4: the RIFF sniff dispatched payloads resample_wav then
    raised NotImplementedError on)."""
    from yaml_pipe_spark.multimodal.binary import resample_media

    w8 = _wav(1, 1, 8000, bytes(range(16)))
    w16 = _wav(2, 1, 8000, bytes(32))  # 16-bit: out of stdlib scope
    wst = _wav(1, 2, 8000, bytes(32))  # stereo: out of stdlib scope
    trunc = w8[:20]  # RIFF/WAVE magic intact, body truncated
    rows = [
        (1, "audio", w8, {}),
        (2, "audio", w16, {}),
        (3, "audio", wst, {}),
        (4, "audio", trunc, {}),
        (5, "image", b"BM\x00", {}),
        (6, "audio", None, {}),
    ]
    df = spark.createDataFrame(
        rows, "item_id long, modality string, payload binary, meta map<string,string>"
    )
    out = {
        r["item_id"]: r["payload"]
        for r in resample_media(df, target_rate=4000).collect()
    }
    # in-scope: really resampled (different bytes, valid WAV at 4000 Hz)
    with wave.open(io.BytesIO(bytes(out[1])), "rb") as w:
        assert w.getframerate() == 4000 and w.getnframes() == 8
    # out-of-scope / truncated / non-WAV / null: byte-identical passthrough
    assert bytes(out[2]) == w16
    assert bytes(out[3]) == wst
    assert bytes(out[4]) == trunc
    assert bytes(out[5]) == b"BM\x00"
    assert out[6] is None


def test_rtf_bin_control_word_skips_raw_bytes():
    """\\binN is followed by N RAW bytes that may contain { } \\ — they
    must be skipped, not scanned as RTF (ADVICE r4)."""
    from yaml_pipe_spark.sources.rtf import extract_rtf_text

    # 4 raw bytes including '}' and '\' — scanning them would close the
    # group early and corrupt state
    assert extract_rtf_text(b"{\\rtf1 a\\bin4 }\\{xb}") == "ab"
    # \bin0 consumes nothing
    assert extract_rtf_text(b"{\\rtf1 a\\bin0 b}") == "ab"


def test_epub_bare_body_text_kept_with_blocks():
    """Mixed content: bare text that is a direct child of body (or the
    tail of a block) must survive even when block elements exist
    (ADVICE r4: it was dropped unless NO blocks were found)."""
    from yaml_pipe_spark.sources.epub import _xhtml_paragraphs

    xhtml = (
        b"<html xmlns='http://www.w3.org/1999/xhtml'><body>"
        b"intro<p>x</p>tail"
        b"<div>wrapped<p>y</p></div>"
        b"</body></html>"
    )
    assert _xhtml_paragraphs(xhtml) == ["intro", "x", "tail", "wrapped", "y"]


# ------------------------------------------- incremental minhash dedup


def test_incremental_minhash_dedup_and_idempotent_rerun(spark):
    """A near-dup of a standing doc is dropped as dup_old, a near-dup
    inside the increment as dup_new, novel docs kept; after
    merge_band_state, re-running the SAME increment yields the same
    verdicts (no self-pairing, no double-drop)."""
    from yaml_pipe_spark.operators.dedup import (
        incremental_minhash_dedup,
        merge_band_state,
        minhash_band_state,
        minhash_signatures,
        lsh_band_table,
        token_shingles,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    old_rows = [
        (1, base + " lambda mu"),
        (2, "one two three four five six seven eight nine ten"),
    ]
    new_rows = [
        (10, base + " lambda nu"),  # near-dup of doc 1 -> dup_old
        (11, "completely different words with no overlap at all here"),
        (12, "completely different words with no overlap at all there"),
        # 12 near-dups 11 (same snapshot) -> dup_new
        (13, "tiny"),  # < k tokens: opts out -> kept
    ]
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    state = minhash_band_state(old)
    out = {
        r["doc_id"]: (r["reason"], r["dup_of"], r["jaccard"])
        for r in incremental_minhash_dedup(
            new, state, old, threshold=0.7
        ).collect()
    }
    assert out[10][:2] == ("dup_old", 1)
    assert out[11][:2] == ("kept", None)
    assert out[12][:2] == ("dup_new", 11)
    assert out[13][:2] == ("kept", None)
    # jaccard is a set ratio: never above 1.0
    assert all(j is None or j <= 1.0 for (_, _, j) in out.values())

    # merge the increment's bands into the state; rerun -> same verdicts
    # AND the same jaccard values: in rerun mode corpus2 contains the
    # increment, and re-shingling those ids used to double-count shingle
    # rows, inflating na/inter (jaccard > 1.0 on borderline pairs)
    new_bands = lsh_band_table(
        minhash_signatures(token_shingles(new, "text", "doc_id"))
    )
    merged = merge_band_state(state, new_bands, new_ids=new)
    corpus2 = old.unionByName(new)
    out2 = {
        r["doc_id"]: (r["reason"], r["dup_of"], r["jaccard"])
        for r in incremental_minhash_dedup(
            new, merged, corpus2, threshold=0.7
        ).collect()
    }
    assert out2 == out
    # merge really superseded: one band-row set per id, no duplicates
    # (doc 13 has < k tokens, so no shingles and no band rows: 5 ids)
    n_ids = merged.select("doc_id").distinct().count()
    assert n_ids == 5

    # supersede-by-id holds even when the re-ingested text yields ZERO
    # band rows: re-ingest doc 1 as an under-k-token doc -> its stale
    # bands must be evicted, not kept advertising the old content
    reingest = spark.createDataFrame(
        [(1, "tiny")], "doc_id long, text string"
    )
    re_bands = lsh_band_table(
        minhash_signatures(token_shingles(reingest, "text", "doc_id"))
    )
    merged2 = merge_band_state(merged, re_bands, new_ids=reingest)
    assert merged2.filter("doc_id = 1").count() == 0
    assert merged.groupBy("doc_id", "band_id").count().filter(
        "count > 1"
    ).count() == 0


# ------------------------------------------------- real stdlib PNG decode


def test_png_roundtrip_all_filters():
    """build_png cycles filter types per scanline; decode_png must undo
    None/Sub/Up/Average/Paeth exactly (h=9 docs exercise all five in one
    image)."""
    from yaml_pipe_spark.multimodal.binary import build_png, decode_png

    for i in (0, 1, 5, 8, 13, 44, 125, 126):
        w, h, pix = decode_png(build_png(i))
        assert (w, h) == (2 + i % 14, 1 + i % 9)
        assert pix == bytes(
            (i + r * 31 + c * 7) % 256 for r in range(h) for c in range(3 * w)
        )


def test_png_out_of_scope_raises():
    import zlib

    from yaml_pipe_spark.multimodal.binary import build_png, decode_png

    with pytest.raises(ValueError):
        decode_png(b"notapng")
    # flip color type to 6 (RGBA): out of stdlib scope
    png = bytearray(build_png(3))
    ihdr_off = 8 + 8  # sig + len/type
    png[ihdr_off + 9] = 6
    # CRC is now wrong but decode_png doesn't verify CRC; the IHDR gate fires
    with pytest.raises(NotImplementedError):
        decode_png(bytes(png))


def test_png_decode_payload_sniff():
    from yaml_pipe_spark.multimodal.binary import build_png, decode_payload

    w, h, n_frames, feat = decode_payload(build_png(7), "image", real_decode=True)
    assert (w, h, n_frames) == (2 + 7 % 14, 1 + 7 % 9)[0:2] + (1,)
    assert feat[0] == (7 % 256) / 255.0


# --------------------------------------------------- real BPE merge loop


def test_bpe_encode_min_rank_iteration():
    """Lowest-rank pair merges first; merged outputs feed later merges
    ((t,h) -> (th,e); (i,n)+(ti,on) -> tion); left-to-right non-overlap
    on repeated pairs."""
    from yaml_pipe_spark.operators.text_stats import bpe_encode

    assert bpe_encode("the") == ["the"]
    assert bpe_encode("thing") == ["th", "ing"]
    assert bpe_encode("tion") == ["tion"]
    # in 'nation', (a,t) rank 9 consumes the t before (t,i) rank 12 can
    # fire — min-rank order, not longest-match greed
    assert bpe_encode("nation") == ["n", "at", "i", "on"]
    assert bpe_encode("x") == ["x"]
    assert bpe_encode("zz") == ["z", "z"]
    # repeated pair run: (i,n) merges both occurrences in one pass
    assert bpe_encode("ininin") == ["in", "in", "in"]
    # merge output must NOT re-trigger its own rule mid-fold
    assert bpe_encode("ththth") == ["th", "th", "th"]


def test_bpe_token_stats_small(spark):
    from yaml_pipe_spark.operators.text_stats import bpe_token_stats

    df = spark.createDataFrame(
        [("en", "the thing"), ("en", "the"), ("de", "zz"), (None, "the")],
        "lang string, text string",
    )
    rows = {r["lang"]: r for r in bpe_token_stats(df).collect()}
    # en: words the(x2), thing(x1) -> tokens 1*2 + 2 = 4 over 3 occurrences
    assert rows["en"]["n_word_occurrences"] == 3
    assert rows["en"]["total_bpe_tokens"] == 4
    assert rows["en"]["n_token_types"] == 3  # {the, th, ing}
    # de: zz -> [z, z]: 2 tokens, 1 type
    assert rows["de"]["total_bpe_tokens"] == 2
    assert rows["de"]["n_token_types"] == 1
    # NULL lang is reported under the 'und' sentinel, not silently dropped
    assert rows["und"]["n_word_occurrences"] == 1
    assert rows["und"]["total_bpe_tokens"] == 1
    assert set(rows) == {"en", "de", "und"}


# -------------------------------------------------------- IVF-PQ composed


def test_ivfpq_recall_floor_clustered(spark):
    """On a clustered corpus the composed IVF-PQ (coarse prune + 2-bit
    ADC + exact re-rank) must keep recall@5 >= 0.8 — the PQ stage may
    only cost recall that the re-rank window cannot recover."""
    import numpy as np

    from yaml_pipe_spark.operators.similarity import (
        ivfpq_topk,
        knn_join,
        recall_at_k,
    )

    rng = np.random.RandomState(11)
    dim, n, ncl = 32, 400, 10
    centers = rng.standard_normal((ncl, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, ncl, n)
    vecs = centers[labels] + 0.08 * rng.standard_normal((n, dim))
    # keep components inside the sq2 quantizer's representable range
    vecs = np.clip(vecs, -0.45, 0.45)
    corpus = spark.createDataFrame(
        [(int(i), [float(x) for x in np.round(v, 6)]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    ).cache()
    cents = spark.createDataFrame(
        [(int(c), [float(x) for x in np.round(np.clip(v, -0.45, 0.45), 6)])
         for c, v in enumerate(centers)],
        "cid long, cv array<double>",
    )
    q = corpus.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    exact = knn_join(q, corpus, k=5, id_col="vec_id")
    # exact excludes self; ivfpq does not — ask for 6, drop the self row,
    # leaving 5 comparable neighbors. The saturating 2-bit quantizer makes
    # the ADC ordering coarse on cluster-scale components, so the refine
    # window does the recall work (the standard IVF-PQ trade: scan cheap,
    # re-rank wide).
    approx = ivfpq_topk(q, corpus, cents, k=6, nprobe=3, rerank_m=60)
    approx = approx.filter(F.col("qid") != F.col("vec_id"))
    r = recall_at_k(approx, exact).collect()[0]
    corpus.unpersist()
    assert r.n_queries == 50
    assert r.recall >= 0.8, f"ivfpq recall@5={r.recall}"


def test_ivfpq_plan_shape(spark):
    """The ADC scan must reach the code table through an equi-join on the
    cell id (partition-prunable at scale), never a cartesian product
    against the corpus; the only Cross joins are against broadcast
    centroid/query frames."""
    from tests.conftest import SF_SMALL
    from yaml_pipe_spark.entrypoints import REGISTRY

    import contextlib, io

    df = REGISTRY["ann_ivfpq_topk"].fn(spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "Join [cid" in plan or "Join [cid".replace(" ", "") in plan.replace(" ", "")
    # every Cross join is a broadcast nested-loop against a tiny frame
    for line in plan.splitlines():
        if "Cross" in line:
            assert "BroadcastNestedLoopJoin" in line, line


# ------------------------------------------------------ explain CLI command


def test_explain_cli_registered_query(spark, capsys):
    from yaml_pipe_spark import cli
    from tests.conftest import SF_SMALL

    rc = cli.main(
        ["explain", "rel_pricing_summary", "-d", SF_SMALL, "-m", "formatted"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "PushedFilters" in out and "HashAggregate" in out


def test_explain_cli_sql_and_errors(spark, capsys):
    from yaml_pipe_spark import cli
    from tests.conftest import SF_SMALL

    rc = cli.main(
        ["explain", "SELECT count(*) FROM lineitem", "--sql", "-d", SF_SMALL]
    )
    out = capsys.readouterr().out
    assert rc == 0 and "HashAggregate" in out

    assert cli.main(["explain", "no_such_query", "-d", SF_SMALL]) == 1
    err = capsys.readouterr().err
    assert "unknown query" in err
    # near-miss hint
    assert cli.main(["explain", "pricing_summary", "-d", SF_SMALL]) == 1
    assert "did you mean" in capsys.readouterr().err
    # broken SQL is an honest non-zero
    assert cli.main(["explain", "SELEC 1", "--sql", "-d", SF_SMALL]) == 1
