"""Streaming pipeline (checkpoint-driven incrementality) and multimodal
column plumbing."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F


def _write(path, text):
    with open(path, "w", encoding="utf-8") as f:
        f.write(text)


def test_streaming_pipeline_exactly_once(spark):
    from yaml_pipe_spark.streaming.stream import run_streaming_pipeline

    with tempfile.TemporaryDirectory() as tmp:
        inp = os.path.join(tmp, "in")
        os.makedirs(inp)
        _write(os.path.join(inp, "a.txt"), "alpha " * 50)
        sink = os.path.join(tmp, "sink")
        ckpt = os.path.join(tmp, "ckpt")

        run_streaming_pipeline(spark, inp, sink, ckpt, chunk_size=60,
                               chunk_overlap=10, embed_dim=4)
        n1 = spark.read.parquet(sink).count()
        assert n1 > 0

        # re-run with no new files: checkpoint prevents reprocessing
        run_streaming_pipeline(spark, inp, sink, ckpt, chunk_size=60,
                               chunk_overlap=10, embed_dim=4)
        assert spark.read.parquet(sink).count() == n1

        # new file: only it is processed (append grows, old rows unchanged)
        _write(os.path.join(inp, "b.txt"), "bravo " * 30)
        run_streaming_pipeline(spark, inp, sink, ckpt, chunk_size=60,
                               chunk_overlap=10, embed_dim=4)
        out = spark.read.parquet(sink)
        assert out.count() > n1
        assert out.filter(out.source.contains("a.txt")).count() == n1


def test_streaming_tumbling_agg_matches_batch(spark):
    from yaml_pipe_spark.operators.events import tumbling_agg
    from yaml_pipe_spark.streaming.stream import (
        stream_events,
        streaming_tumbling_agg,
    )
    from yaml_pipe_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    stream = stream_events(spark, sf)
    agg = streaming_tumbling_agg(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_agg_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM stream_agg_test").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in tumbling_agg(load_table(spark, sf, "events")).collect()
    }
    assert got == want  # stream plan == batch plan (oracle-checked in batch)


def test_multimodal_features(spark):
    from yaml_pipe_spark.multimodal.binary import (
        extract_features,
        sample_frames,
        synthetic_media,
    )

    media = synthetic_media(spark, 30)
    assert media.schema["payload"].dataType.typeName() == "binary"
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    by_id = {r.item_id: r for r in rows}
    assert by_id[0].modality == "image" and by_id[2].modality == "video"
    assert all(len(r.feat) == 8 for r in rows)
    assert all(r.n_bytes == 32 * (1 + r.item_id % 7) for r in rows)
    # determinism: same payload -> same features on a second run
    rows2 = extract_features(synthetic_media(spark, 30)).collect()
    assert {r.item_id: r.payload_sha for r in rows2} == {
        r.item_id: r.payload_sha for r in rows
    }
    frames = sample_frames(feats, every_n=25)
    fr = frames.collect()
    assert all(r.frame_idx % 25 == 0 and r.frame_idx < r.n_frames for r in fr)
    assert {r.item_id for r in fr} == {r.item_id for r in rows if r.modality == "video"}


def test_multimodal_real_decode_unknown_format_is_marked(spark):
    from yaml_pipe_spark.multimodal.binary import decode_payload

    # MP4 — a real format the stdlib can't decode stays the stub
    with pytest.raises(NotImplementedError, match="codec libraries"):
        decode_payload(
            b"\x00\x00\x00\x18ftypmp42\x00\x00\x00\x00", "video",
            real_decode=True,
        )
    # PNG is stdlib-decodable since round 5, so its magic now dispatches to
    # the real decoder — a bare signature with no chunks is a corrupt file
    with pytest.raises(ValueError, match="IHDR"):
        decode_payload(b"\x89PNG\r\n\x1a\n", "image", real_decode=True)
    # baseline JPEG is stdlib-decodable since round 11 — its magic likewise
    # dispatches to the real decoder, and a bare JFIF header with no scan
    # is a corrupt file, not a stub
    with pytest.raises(ValueError, match="SOF0"):
        decode_payload(b"\xff\xd8\xff\xe0\x00\x10JFIF", "image", real_decode=True)


def test_real_decode_bmp_golden():
    """Decode a 2x1 24-bit BMP written out literally, byte by byte — not
    via build_bmp, so builder and decoder are cross-checked independently."""
    from yaml_pipe_spark.multimodal.binary import build_bmp, decode_payload

    pixels = bytes([10, 20, 30, 40, 50, 60, 0, 0])  # 2 BGR px + 2 pad
    golden = (
        b"BM" + (54 + 8).to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little") + (1).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + (8).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2 + (0).to_bytes(4, "little") * 2
        + pixels
    )
    w, h, nf, feat = decode_payload(golden, "image", real_decode=True)
    assert (w, h, nf) == (2, 1, 1)
    assert feat == [b / 255.0 for b in pixels]

    # the builder's files round-trip through the same real decoder
    for doc_id in (0, 7, 13):
        w, h, nf, feat = decode_payload(
            build_bmp(doc_id), "image", real_decode=True
        )
        assert (w, h, nf) == (2 + doc_id % 14, 1 + doc_id % 9, 1)
        assert feat[0] == (doc_id % 256) / 255.0


def test_real_decode_wav_golden():
    from yaml_pipe_spark.multimodal.binary import build_wav, decode_payload

    for doc_id in (1, 9, 55):
        payload = build_wav(doc_id)
        assert len(payload) == 44 + 16 + doc_id % 50  # PCM header + frames
        rate, ch, nf, feat = decode_payload(payload, "audio", real_decode=True)
        assert rate == 8000 + (doc_id % 8) * 1000
        assert (ch, nf) == (1, 16 + doc_id % 50)
        assert feat[0] == ((doc_id * 3) % 256) / 255.0


def test_resize_bmp_golden():
    """2x2 BMP with four distinct pixels resized to 1x1: nearest-neighbor
    with floor mapping picks IMAGE pixel (0,0) — the top-left, which lives
    in the stored BOTTOM row. A resize that ignored bottom-up storage
    would return the bottom-left pixel instead."""
    from yaml_pipe_spark.multimodal.binary import (
        _decode_bmp,
        build_bmp,
        resize_bmp,
    )

    # stored rows (8 bytes each: 2 px * 3 + 2 pad): row0 = image row 1
    pixels = bytes(
        [1, 1, 1, 2, 2, 2, 0, 0]  # stored row 0: image row 1 -> px C, D
        + [3, 3, 3, 4, 4, 4, 0, 0]  # stored row 1: image row 0 -> px A, B
    )
    src = (
        b"BM" + (54 + 16).to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little") + (2).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + (16).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2 + (0).to_bytes(4, "little") * 2
        + pixels
    )
    out = resize_bmp(src, 1, 1)
    w, h, nf, feat = _decode_bmp(out)
    assert (w, h) == (1, 1)
    assert feat[:3] == [3 / 255.0] * 3  # image (0,0) = px A, not px C

    # builder files roundtrip: dims stick, output is a valid BMP
    big = resize_bmp(build_bmp(12), 7, 3)
    w, h, nf, _ = _decode_bmp(big)
    assert (w, h, nf) == (7, 3, 1)
    assert len(big) == 54 + ((3 * 7 + 3) // 4) * 4 * 3


def test_real_decode_ppm_golden():
    from yaml_pipe_spark.multimodal.binary import decode_payload

    rgb = bytes(range(18))  # 3x2 px * 3 bytes
    w, h, nf, feat = decode_payload(
        b"P6\n# a comment\n3 2\n255\n" + rgb, "image", real_decode=True
    )
    assert (w, h, nf) == (3, 2, 1)
    assert feat == [b / 255.0 for b in rgb[:8]]


def test_watermark_drops_late_data(spark):
    """Deterministic late-data semantics: an event arriving after the
    watermark has passed its window must be dropped, not aggregated.

    Two availableNow drains over one checkpoint: run 1 sets the watermark
    (max event time 14:00 - 1h delay = 13:00); run 2 delivers a late 10:45
    event (beyond the persisted watermark -> dropped) plus a 16:00 event.
    The 10:00-11:00 window must stay at count 2 forever.
    """
    import json

    def _jwrite(path, rows):
        with open(path, "w", encoding="utf-8") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    with tempfile.TemporaryDirectory() as tmp:
        inp = os.path.join(tmp, "in")
        sink = os.path.join(tmp, "sink")
        ckpt = os.path.join(tmp, "ckpt")
        os.makedirs(inp)

        def drain():
            stream = (
                spark.readStream.schema("ts timestamp, k string")
                .json(inp)
                .withWatermark("ts", "1 hour")
                .groupBy(F.window("ts", "1 hour").alias("w"), "k")
                .count()
                .select(F.col("w.start").alias("ws"), "k", "count")
            )

            def write_batch(df, _epoch):
                df.write.mode("append").parquet(sink)

            q = (
                stream.writeStream.outputMode("append")
                .foreachBatch(write_batch)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        _jwrite(
            os.path.join(inp, "b1.json"),
            [
                {"ts": "2024-01-01 10:00:00", "k": "a"},
                {"ts": "2024-01-01 10:30:00", "k": "a"},
                {"ts": "2024-01-01 14:00:00", "k": "a"},
            ],
        )
        drain()
        first = {
            (r.ws.hour, r.k): r["count"]
            for r in spark.read.parquet(sink).collect()
        }
        # watermark reached 13:00 -> the 10:00 window is final at count 2
        assert first[(10, "a")] == 2

        _jwrite(
            os.path.join(inp, "b2.json"),
            [
                {"ts": "2024-01-01 10:45:00", "k": "a"},  # late: beyond wm
                {"ts": "2024-01-01 16:00:00", "k": "a"},
            ],
        )
        drain()
        final = {}
        for r in spark.read.parquet(sink).collect():
            final[(r.ws.hour, r.k)] = final.get((r.ws.hour, r.k), 0) + r["count"]
        # late row dropped: 10:00 window still 2 and emitted exactly once
        assert final[(10, "a")] == 2
        # watermark moved to 15:00 -> the 14:00 window finalized at 1
        assert final[(14, "a")] == 1


def test_transform_with_state_counter_matches_batch(spark):
    """Spark 4 TransformWithState twin of the applyInPandasWithState
    counter: per-key MAX(running_total) over the drain equals the batch
    per-key count. Skips where google.protobuf (required by the TWS state
    server) is unavailable."""
    from yaml_pipe_spark.streaming.stream import (
        _tws_available,
        stateful_user_counter_tws,
        stream_events,
    )

    if not _tws_available():
        pytest.skip("google.protobuf unavailable: TWS state server cannot start")

    sf = "/root/testdata/sf0.001"
    out = stateful_user_counter_tws(stream_events(spark, sf))
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_counter")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.user_id: r.n
        for r in spark.sql(
            "SELECT user_id, max(running_total) AS n FROM tws_counter "
            "GROUP BY user_id"
        ).collect()
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    want = {
        r.user_id: r.n
        for r in spark.read.parquet(f"{sf}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_streaming_agg_on_rocksdb_state_store(spark):
    """The production state backend: the tumbling agg drain produces
    identical results on the RocksDB state store provider (bounded memory,
    changelog checkpointing at scale) as on the default HDFS-backed one."""
    from yaml_pipe_spark.operators.events import tumbling_agg
    from yaml_pipe_spark.streaming.stream import (
        stream_events,
        streaming_tumbling_agg,
    )
    from yaml_pipe_spark.tables import load_table

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        sf = "/root/testdata/sf0.001"
        agg = streaming_tumbling_agg(stream_events(spark, sf))
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("rocksdb_agg")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in spark.sql("SELECT * FROM rocksdb_agg").collect()
        }
        want = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in tumbling_agg(load_table(spark, sf, "events")).collect()
        }
        assert got == want
    finally:
        spark.conf.set(key, prev)


def test_resample_passthrough_survives_truncated_data_chunk(spark):
    """A WAV whose header is intact but whose data chunk is shorter than
    its declared size must pass through unchanged (IndexError inside
    resample_wav), not kill the stage — the review-confirmed gap in the
    round-5 passthrough fix."""
    from yaml_pipe_spark.multimodal.binary import (
        MEDIA_SCHEMA,
        build_wav,
        resample_media,
    )

    good = build_wav(1)
    truncated = good[:50]  # header parses; readframes comes up short
    df = spark.createDataFrame(
        [
            (1, "audio", bytearray(good), {}),
            (2, "audio", bytearray(truncated), {}),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["item_id"]: bytes(r["payload"])
            for r in resample_media(df).collect()}
    assert rows[2] == truncated  # untouched passthrough
    assert rows[1] != good  # the good one actually resampled
