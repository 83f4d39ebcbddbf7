"""Multimodal plumbing: binary payload schema, Arrow-batched decode /
feature / frame-sample pipelines, binaryFile ingestion, stub gating."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sync_spark.functions.multimodal import (
    FEATURE_DIM,
    _decode_payload,
    decode_media,
    extract_features,
    fake_payload,
    resize_meta,
    sample_frames,
    synthetic_media_table,
)


def test_decode_media_schema_and_values(spark):
    media = synthetic_media_table(spark, 12)
    out = decode_media(media)
    assert [f.name for f in out.schema.fields] == [
        "media_id",
        "kind",
        "width",
        "height",
        "duration_ms",
        "size_bytes",
    ]
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 12
    img = next(r for r in rows.values() if r.kind == "image")
    assert img.width > 0 and img.duration_ms == 0
    vid = next(r for r in rows.values() if r.kind == "video")
    assert vid.duration_ms >= 1000


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError, match="codec"):
        _decode_payload(b"\x89PNG\r\n\x1a\nxxxxxxxxxxxx")


def test_features_deterministic_and_shaped(spark):
    media = synthetic_media_table(spark, 6)
    f1 = {r.media_id: list(r.features) for r in extract_features(media).collect()}
    f2 = {r.media_id: list(r.features) for r in extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == FEATURE_DIM for v in f1.values())
    assert all(0.0 <= x <= 1.0 for v in f1.values() for x in v)


def test_resize_planning_jvm_side(spark):
    media = synthetic_media_table(spark, 9).filter(F.col("kind") == "image")
    out = resize_meta(media, max_side=100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan.lower()  # pure column math, no Python
    for r in out.collect():
        assert max(r.target_width, r.target_height) <= 100
        # aspect preserved within rounding
        if r.meta.width >= r.meta.height:
            assert r.target_width >= r.target_height


def test_frame_sampling_explodes_in_batch(spark):
    media = synthetic_media_table(spark, 9)
    frames = sample_frames(media, every_ms=500).collect()
    assert len(frames) > media.filter(F.col("kind") == "video").count()
    by_media = {}
    for fr in frames:
        by_media.setdefault(fr.media_id, []).append(fr)
    for mid, frs in by_media.items():
        assert [f.frame_idx for f in sorted(frs, key=lambda f: f.frame_ts_ms)] == list(
            range(len(frs))
        )
        assert len({f.frame_digest for f in frs}) == len(frs)


def test_binaryfile_ingestion(spark, tmp_path):
    p = tmp_path / "blobs"
    p.mkdir()
    for i in range(3):
        (p / f"m{i}.bin").write_bytes(fake_payload(i, "image", 10 + i, 20, 0))
    df = spark.read.format("binaryFile").load(str(p))
    assert {f.name for f in df.schema.fields} == {"path", "modificationTime", "length", "content"}
    decoded = [
        _decode_payload(bytes(r.content)) for r in df.collect()
    ]
    assert sorted(d[0] for d in decoded) == [10, 11, 12]
