"""Multimodal column plumbing: binary payloads + typed metadata, processed
through Arrow-batched mapInPandas.

North-star requirement: treat image/audio/video as opaque `binary` columns
with typed metadata, and make the Spark-side plumbing (schema, partitioning,
UDF signature, batch shape) real and tested while the actual codec work is
stubbed — the decode libraries (PIL/torchaudio/ffmpeg) are not in this
container. `decode_payload(real_decode=True)` is the marked extension point;
the default is a deterministic fake derived from the payload bytes so tests
and oracles are stable.

Scale notes: payloads travel as Arrow binary batches (zero-copy into
pandas); per-batch vectorized feature extraction; partition by modality so
per-modality pipelines prune at the scan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = (
    "item_id long, modality string, n_bytes long, payload_sha string, "
    "width int, height int, n_frames int, feat array<float>"
)


def synthetic_media(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic fake corpus: payload bytes derived from item_id."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"]
            rows = {
                "item_id": ids,
                "modality": [
                    ["image", "audio", "video"][int(i) % 3] for i in ids
                ],
                "payload": [
                    hashlib.sha256(str(i).encode()).digest()
                    * (1 + int(i) % 7)
                    for i in ids
                ],
                "meta": [{"origin": f"synthetic/{int(i)}"} for i in ids],
            }
            yield pd.DataFrame(rows)

    # bound the partition count for small synthetic corpora: spark.range
    # defaults to defaultParallelism partitions, and each partition costs a
    # Python-worker round trip in mapInPandas — 32 workers for 300 rows is
    # all overhead (real corpora size partitions by payload bytes instead)
    n_parts = max(1, min(8, n // 64))
    return spark.range(n, numPartitions=n_parts).mapInPandas(gen, MEDIA_SCHEMA)


def decode_payload(payload: bytes, modality: str, real_decode: bool = False):
    """Decode stub. With real_decode, this is where PIL/torchaudio/ffmpeg
    plug in; in this container it raises. The fake path derives stable
    pseudo-dimensions and features from the bytes themselves."""
    if real_decode:
        raise NotImplementedError(
            "real decode requires codec libraries (PIL/torchaudio/ffmpeg) "
            "not present in this container; install them on the cluster and "
            "implement per-modality decoding here"
        )
    digest = hashlib.sha256(payload).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    n_frames = 1 if modality != "video" else 1 + digest[2] % 120
    feat = [b / 255.0 for b in digest[:8]]
    return width, height, n_frames, feat


def extract_features(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out.
    The UDF signature and batch shape are the production contract; only the
    decode body is stubbed."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "item_id": pdf["item_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["payload"].map(len),
                "payload_sha": pdf["payload"].map(
                    lambda b: hashlib.sha256(b).hexdigest()
                ),
            }
            decoded = [
                decode_payload(p, m, real_decode)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            out["width"] = [d[0] for d in decoded]
            out["height"] = [d[1] for d in decoded]
            out["n_frames"] = [d[2] for d in decoded]
            out["feat"] = [d[3] for d in decoded]
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video rows: explode frame indices 0, n, 2n, ...
    (from the decoded frame count). Pure DataFrame op over the feature
    output — the explode pattern is what a real frame extractor feeds."""
    vids = df.filter(F.col("modality") == "video")
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return vids.select(
        "item_id", F.explode(idx).alias("frame_idx"), "n_frames"
    )


def resize_stub(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize plumbing: records target dims; the byte transform is the
    cluster-side extension point (same mapInPandas shape as
    extract_features)."""
    return df.withColumn("target_width", F.lit(width)).withColumn(
        "target_height", F.lit(height)
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media corpus keyed to the `documents` table: payload is
    the UTF-8 bytes of `repeat(str(doc_id), 1 + doc_id % 7)`.

    The payload happens to be ASCII so an external SQL engine can recompute
    `sha256(payload)` (DuckDB's sha256 only accepts VARCHAR) — which makes
    the *whole decode path* oracle-checkable end-to-end, not just rows>0.
    The Spark side still treats it as an opaque `binary` column through the
    same Arrow mapInPandas contract as any real image/audio/video payload.

    Scale: payload construction is a narrow Catalyst projection on the
    documents scan — no Python until the decode UDF itself.
    """
    return docs.select(
        F.col("doc_id").cast("long").alias("item_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(
            F.repeat(F.col("doc_id").cast("string"), (F.col("doc_id") % 7 + 1).cast("int")),
            "UTF-8",
        ).alias("payload"),
        F.create_map(
            F.lit("origin"), F.concat(F.lit("documents/"), F.col("doc_id"))
        ).alias("meta"),
    )
