"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata (SURVEY.md §7 Phase 4; §2.10 extension surface).

Design for 100 TB of media:
- payloads are opaque ``binary`` columns with a ``meta`` struct
  (kind/format/width/height/duration_ms/size_bytes) so planning-time
  operations (filtering, routing, sampling) never touch bytes;
- ingestion from object storage via ``spark.read.format("binaryFile")``
  (path/length/modificationTime/content);
- decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` Arrow-batched pipelines — the ONLY place in the
  engine where Python touches row data, because codecs are Python-only;
- the actual codec call is isolated behind ``_decode_payload``: with
  no imaging libraries in this container it is a STUB — a
  deterministic fake decoder for payloads carrying the engine's own
  fake header, and ``NotImplementedError`` for real media bytes. The
  Spark-side plumbing (schemas, batch iteration, partitioning) is
  real and tested.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("size_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

_FAKE_MAGIC = b"SSFK"  # sync_spark fake-media header


def fake_payload(media_id: int, kind: str, width: int, height: int, duration_ms: int) -> bytes:
    """Deterministic fake media bytes: magic + dims header + seeded
    body. Lets tests exercise the full pipeline without codecs."""
    body = hashlib.sha256(f"{kind}:{media_id}".encode()).digest() * 4
    return _FAKE_MAGIC + struct.pack("<iii", width, height, duration_ms) + body


def _decode_payload(payload: bytes | None) -> tuple[int | None, int | None, int | None]:
    """STUB decode step → (width, height, duration_ms).

    NULL / too-short payloads decode to NULL metadata (the schema
    declares payload nullable; one bad row must not kill the whole
    Arrow batch). Fake-header payloads decode deterministically;
    anything else would need a real codec (PIL/av), which this
    container does not ship.
    """
    if payload is None or len(payload) < 16:
        return (None, None, None)
    if payload[:4] == _FAKE_MAGIC:
        return struct.unpack("<iii", payload[4:16])
    raise NotImplementedError(
        "real media decoding requires an imaging/av library; only the "
        "deterministic fake codec is available in this environment"
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched decode: one pandas batch in, one out — no
    per-row Python calls from the JVM."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_decode_payload(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "duration_ms": [d[2] for d in decoded],
                    "size_bytes": [len(p) if p is not None else None for p in pdf["payload"]],
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(batches, DECODED_SCHEMA)


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction stub: deterministic pseudo-embedding from a
    payload digest (a real model would run here, batched exactly the
    same way)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p in pdf["payload"]:
                if p is None:
                    feats.append(None)
                    continue
                dig = hashlib.sha256(p).digest()
                feats.append(
                    [int.from_bytes(dig[2 * i : 2 * i + 2], "little") / 65535.0 for i in range(FEATURE_DIM)]
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.select("media_id", "payload").mapInPandas(batches, FEATURES_SCHEMA)


def resize_meta(df: DataFrame, max_side: int) -> DataFrame:
    """Resize planning is pure column math (aspect-preserving target
    dims); only the pixel rewrite would enter the stub codec. Keeping
    the math JVM-side means the 100 TB 'what would this cost' pass
    never decodes a byte."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(
        F.greatest(w, h) > max_side, F.greatest(w, h).cast("double") / F.lit(max_side)
    ).otherwise(F.lit(1.0))
    return df.withColumn("target_width", F.round(w / scale).cast("int")).withColumn(
        "target_height", F.round(h / scale).cast("int")
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.IntegerType()),
        T.StructField("frame_digest", T.StringType()),
    ]
)


def sample_frames(df: DataFrame, every_ms: int) -> DataFrame:
    """Frame sampling stub for video payloads: emits one row per
    sampled timestamp (digest stands in for the decoded frame). The
    explode happens inside the Arrow batch — output rows ≫ input rows
    without a JVM-side explode of the binary column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame_digest": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, _, duration_ms = _decode_payload(payload)
                if duration_ms is None:
                    continue  # null/undecodable payload: no frames
                for idx, ts in enumerate(range(0, max(duration_ms, 1), every_ms)):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_ts_ms"].append(ts)
                    out["frame_digest"].append(
                        hashlib.sha256(payload + ts.to_bytes(4, "little")).hexdigest()[:16]
                    )
            yield pd.DataFrame(out)

    return df.filter(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        batches, FRAMES_SCHEMA
    )


def synthetic_media_table(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake corpus for tests/demos."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h = (64 + i % 7 * 32, 48 + i % 5 * 32) if kind == "image" else (0, 0)
        dur = 0 if kind == "image" else 1000 + (i % 10) * 500
        payload = fake_payload(i, kind, w, h, dur)
        rows.append(
            (
                i,
                kind,
                payload,
                {"format": "fake", "width": w, "height": h, "duration_ms": dur, "size_bytes": len(payload)},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
