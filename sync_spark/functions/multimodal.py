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
- the codec call is isolated behind ``_decode_payload``. UNCOMPRESSED
  formats are decoded FOR REAL with stdlib + numpy (RIFF/PCM WAV:
  fmt/data chunk walk → sample rate, channels, duration; binary PPM
  P6: header parse → dims; pixel/sample math in ``audio_features`` /
  ``image_stats``). COMPRESSED formats (JPEG/PNG/MP3/H.264) need
  external codec libraries this container does not ship — those
  raise ``NotImplementedError`` behind the same seam, and the
  engine's deterministic fake header keeps end-to-end tests
  independent of any codec.
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


def wav_payload(
    media_id: int, seconds: float = 1.0, rate: int = 8000, amplitude: int = 8000
) -> bytes:
    """Build a REAL (playable) mono 16-bit PCM WAV: a deterministic
    sine whose frequency derives from media_id. Sample synthesis is
    one numpy vector op (per-sample struct.pack measured ~10× slower
    across a corpus of files); truncation toward zero matches the
    old int() rounding exactly."""
    import numpy as np

    n = int(seconds * rate)
    freq = 220.0 + (media_id % 16) * 55.0
    i = np.arange(n, dtype=np.float64)
    vals = np.trunc(amplitude * np.sin(2 * np.pi * freq * i / rate)).astype("<i2")
    samples = vals.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)  # PCM, mono, 16-bit
    data = samples
    riff_body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    riff_body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def ppm_payload(media_id: int, width: int = 8, height: int = 6) -> bytes:
    """Build a REAL binary PPM (P6) image: deterministic RGB gradient
    seeded by media_id. Pure stdlib."""
    header = f"P6\n{width} {height}\n255\n".encode()
    px = bytearray()
    for y in range(height):
        for x in range(width):
            px += bytes(((x * 7 + media_id) % 256, (y * 11 + media_id) % 256, (x + y) % 256))
    return header + bytes(px)


def _parse_wav(payload: bytes) -> tuple[int, int, int, int, int, int, int]:
    """ONE walk of the RIFF chunk list → (fmt_tag, rate, channels,
    bits, duration_ms, data_off, data_len). Raises ValueError on a
    structurally broken file (missing/truncated fmt chunk, data chunk
    overrunning the payload) — callers decide whether that is a NULL
    row (feature kernels) or an error (nothing currently)."""
    fmt_tag = rate = channels = bits = None
    data_off = data_len = 0
    seen_data = False
    pos = 12  # past RIFF....WAVE
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid == b"fmt ":
            # bound against BOTH the payload and the chunk's own
            # declared length — an ln < 16 fmt chunk would otherwise
            # silently parse bytes of the next chunk's header
            if ln < 16 or pos + 24 > len(payload):
                raise ValueError("malformed WAV: truncated fmt chunk")
            fmt_tag, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[pos + 8 : pos + 24]
            )
        elif cid == b"data":
            data_off, data_len, seen_data = pos + 8, ln, True
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if not rate or not channels or not bits:
        raise ValueError("malformed WAV: missing fmt chunk")
    if bits % 8 != 0:
        # sub-byte widths would divide by zero below; byte-aligned
        # widths we can't SAMPLE-decode (24-bit) still parse here —
        # duration is metadata; the feature kernel's dtype table
        # rejects them per-row
        raise ValueError(f"malformed WAV: unsupported bits_per_sample {bits}")
    if not seen_data:
        # without this a fmt-only file would read as fabricated
        # silence (0 samples, rms 0.0) instead of a NULL row
        raise ValueError("malformed WAV: missing data chunk")
    if data_off + data_len > len(payload):
        raise ValueError("malformed WAV: data chunk overruns payload")
    duration_ms = int(data_len * 1000 // (rate * channels * (bits // 8)))
    return fmt_tag, rate, channels, bits, duration_ms, data_off, data_len


def _parse_ppm_header(payload: bytes) -> tuple[int, int, int]:
    """P6 header → (width, height, pixel_offset). Handles the
    whitespace/comment grammar of the format; raises ValueError on a
    malformed or truncated header (callers map that to a NULL row)."""
    fields: list[int] = []
    i = 2  # past 'P6'
    while len(fields) < 3 and i < len(payload):
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to EOL
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        try:
            fields.append(int(payload[i:j]))
        except ValueError as exc:
            raise ValueError(f"malformed PPM header token {payload[i:j]!r}") from exc
        i = j
    if len(fields) < 3:
        raise ValueError("malformed PPM: truncated header")
    w, h, off = fields[0], fields[1], i + 1
    if w <= 0 or h <= 0:
        # a negative dimension makes w*h*3 negative, defeating the
        # truncation guard below AND numpy's count= (negative reads
        # the whole buffer) — fabricated stats instead of a NULL row;
        # zero-area would mean NaN channel means
        raise ValueError(f"malformed PPM: non-positive dimensions {w}x{h}")
    if off + w * h * 3 > len(payload):
        raise ValueError("malformed PPM: pixel data truncated")
    return w, h, off


def _decode_payload(payload: bytes | None) -> tuple[int | None, int | None, int | None]:
    """Decode step → (width, height, duration_ms).

    NULL / too-short payloads decode to NULL metadata (the schema
    declares payload nullable; one bad row must not kill the whole
    Arrow batch). RIFF/PCM WAV and binary PPM decode FOR REAL
    (stdlib chunk/header walks); the engine's fake header decodes
    deterministically; compressed formats raise — they need codec
    libraries this container does not ship.
    """
    if payload is None or len(payload) < 16:
        return (None, None, None)
    if payload[:4] == _FAKE_MAGIC:
        return struct.unpack("<iii", payload[4:16])
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        try:
            _, _, _, _, duration_ms, _, _ = _parse_wav(payload)
        except (ValueError, struct.error):
            return (None, None, None)  # corrupt file = one NULL row, not a dead batch
        return (None, None, duration_ms)
    if payload[:2] == b"P6":
        try:
            w, h, _ = _parse_ppm_header(payload)
        except ValueError:
            return (None, None, None)
        return (w, h, None)
    raise NotImplementedError(
        "compressed media decoding (JPEG/PNG/MP3/H.264) requires codec "
        "libraries; WAV, PPM, and the deterministic fake codec are "
        "available in this environment"
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


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
    ]
)

# WAVE format tags → sample dtype per bit width. 1 = integer PCM
# (8-bit is UNSIGNED, bias 128; wider widths signed), 3 = IEEE float.
_WAV_DTYPES = {
    (1, 8): ("u1", 128.0),
    (1, 16): ("<i2", 0.0),
    (1, 32): ("<i4", 0.0),
    (3, 32): ("<f4", 0.0),
    (3, 64): ("<f8", 0.0),
}


def audio_features(df: DataFrame) -> DataFrame:
    """REAL audio feature extraction for PCM / IEEE-float WAV
    payloads: numpy frombuffer over the data chunk → RMS energy +
    peak amplitude + exact sample counts. 8-bit PCM is unsigned with
    a 128 bias — removed before energy math (digital silence must
    read rms 0, not 128). Arrow-batched mapInPandas like every media
    kernel; NULL / non-WAV / corrupt / unsupported-format payloads
    yield NULL features — ONE bad row never kills the batch."""
    import numpy as np

    cols = ("media_id", "sample_rate", "n_samples", "duration_ms", "rms", "peak")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in cols}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                row = (None, None, None, None, None)
                try:
                    if p is not None and len(p) >= 16 and p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                        fmt_tag, rate, channels, bits, duration_ms, off, ln = _parse_wav(p)
                        dtype, bias = _WAV_DTYPES[(fmt_tag, bits)]
                        x = np.frombuffer(p, dtype=dtype, count=ln // (bits // 8), offset=off)
                        xf = x.astype(np.float64) - bias
                        row = (
                            rate,
                            len(x) // channels,
                            duration_ms,
                            float(np.sqrt((xf * xf).mean())) if len(x) else 0.0,
                            float(np.abs(xf).max()) if len(x) else 0.0,
                        )
                except (ValueError, KeyError, struct.error):
                    pass  # corrupt or unsupported variant → NULL row
                for k, v in zip(cols[1:], row):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def image_stats(df: DataFrame) -> DataFrame:
    """REAL image statistics for binary PPM (P6) payloads: numpy view
    over the pixel plane → per-channel means. NULL / non-PPM /
    malformed payloads yield NULL stats — one bad row never kills the
    batch."""
    import numpy as np

    cols = ("media_id", "width", "height", "mean_r", "mean_g", "mean_b")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in cols}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                row = (None, None, None, None, None)
                try:
                    if p is not None and len(p) >= 2 and p[:2] == b"P6":
                        w, h, off = _parse_ppm_header(p)
                        px = np.frombuffer(
                            p, dtype=np.uint8, count=w * h * 3, offset=off
                        ).reshape(h, w, 3)
                        means = px.reshape(-1, 3).mean(axis=0)
                        row = (w, h, float(means[0]), float(means[1]), float(means[2]))
                except (ValueError, IndexError):
                    pass  # malformed header / truncated pixels → NULL row
                for k, v in zip(cols[1:], row):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(batches, IMAGE_STATS_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_image(df: DataFrame, max_side: int) -> DataFrame:
    """REAL aspect-preserving nearest-neighbor resize of binary PPM
    (P6) payloads: numpy fancy-indexing over the pixel plane, emitting
    a valid resized P6 payload + its dims. Images already within
    ``max_side`` pass through byte-identical (no decode-re-encode
    drift). Target-dim math is EXACTLY ``resize_meta``'s plan-time
    column math (HALF_UP rounding — consistency asserted in tests), so
    the plan-time cost estimate and the pixel kernel can never
    disagree. NULL / non-PPM / malformed payloads yield a NULL row —
    one bad row never kills the Arrow batch."""
    import numpy as np

    cols = ("media_id", "width", "height", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in cols}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                row = (None, None, None)
                try:
                    if p is not None and len(p) >= 2 and p[:2] == b"P6":
                        w, h, off = _parse_ppm_header(p)
                        if max(w, h) <= max_side:
                            row = (w, h, p)  # pass-through, byte-identical
                        else:
                            scale = max(w, h) / max_side
                            # int(x + 0.5) == Spark F.round HALF_UP for
                            # positive x — keep in lockstep with
                            # resize_meta
                            tw = max(1, int(w / scale + 0.5))
                            th = max(1, int(h / scale + 0.5))
                            px = np.frombuffer(
                                p, dtype=np.uint8, count=w * h * 3, offset=off
                            ).reshape(h, w, 3)
                            ys = (np.arange(th) * h) // th
                            xs = (np.arange(tw) * w) // tw
                            rp = px[ys][:, xs]
                            header = f"P6\n{tw} {th}\n255\n".encode()
                            row = (tw, th, header + rp.tobytes())
                except (ValueError, IndexError):
                    pass  # malformed → NULL row
                for k, v in zip(cols[1:], row):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(batches, RESIZED_SCHEMA)


RESAMPLED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resample_audio(df: DataFrame, target_rate: int) -> DataFrame:
    """REAL nearest-sample resampling of mono 16-bit PCM WAV payloads
    to ``target_rate``: numpy index mapping (sample i of the output
    reads input sample ⌊i·src/dst⌋ — decimation keeps every k-th
    sample, upsampling repeats), emitting a valid WAV at the new rate.
    Payloads already at ``target_rate`` pass through byte-identical.
    Non-mono / non-16-bit / compressed / malformed payloads yield a
    NULL row (a production resampler would route those to a codec
    library; the Spark plumbing — batch shape, pass-through, error
    isolation — is exactly what that version needs too)."""
    import numpy as np

    cols = ("media_id", "sample_rate", "n_samples", "duration_ms", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in cols}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                row = (None, None, None, None)
                try:
                    if p is not None and len(p) >= 16 and p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                        fmt_tag, rate, channels, bits, dur, off, ln = _parse_wav(p)
                        if fmt_tag == 1 and channels == 1 and bits == 16:
                            if rate == target_rate:
                                row = (rate, ln // 2, dur, p)
                            else:
                                x = np.frombuffer(p, dtype="<i2", count=ln // 2, offset=off)
                                n_out = int(len(x) * target_rate // rate)
                                idx = (np.arange(n_out) * rate) // target_rate
                                y = x[idx].astype("<i2")
                                data = y.tobytes()
                                fmt = struct.pack(
                                    "<HHIIHH", 1, 1, target_rate, target_rate * 2, 2, 16
                                )
                                body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                                body += b"data" + struct.pack("<I", len(data)) + data
                                wav = b"RIFF" + struct.pack("<I", len(body)) + body
                                row = (
                                    target_rate,
                                    n_out,
                                    int(n_out * 1000 // target_rate),
                                    wav,
                                )
                except (ValueError, struct.error):
                    pass  # malformed → NULL row
                for k, v in zip(cols[1:], row):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(batches, RESAMPLED_SCHEMA)
