"""Focused pins for the round-12 ADVICE fixes (robustness, not perf):
qmap VALUES escaping/empty handling, the mp3 fixture pattern bound,
bounded simhash chunk-cache lifetime, and the bucketed base-frame
memo's mutation-generation key."""

from __future__ import annotations

import os

import pytest


def test_qmap_values_escapes_quotes_and_parses(spark):
    from sync_spark.operators.retrieval import _qmap_values

    vals = _qmap_values([(1, ["o'brien", "plain"])])
    assert "''" in vals  # SQL-standard doubling, not a raw quote
    rows = spark.sql(
        f"SELECT * FROM VALUES {vals} AS q(query_id, tok) ORDER BY tok"
    ).collect()
    assert [r.tok for r in rows] == ["o'brien", "plain"]


def test_qmap_values_empty_yields_joinable_null_row(spark):
    from sync_spark.operators.retrieval import _qmap_values

    vals = _qmap_values([])
    # parses, and the NULL tok matches nothing in an inner join
    q = spark.sql(f"SELECT * FROM VALUES {vals} AS q(query_id, tok)")
    posting = spark.createDataFrame([("a", 1)], "tok string, doc_id int")
    assert posting.join(q, "tok").count() == 0


def test_mp3_payload_max_bitrate_frames_full_length():
    from sync_spark.functions.mp3 import mp3_meta, mp3_payload

    # 320 kbps @ 32 kHz is the max representable V1 L3 frame (base
    # 1440); the old 1255-byte pattern silently truncated its body
    payload = mp3_payload(7, n_frames=5, rate=32000, bitrate_kbps=320)
    # the meta walk only counts a frame when every byte its header
    # claims is present — short-sliced bodies would break the chain
    meta = mp3_meta(payload)
    assert meta["n_frames"] == 5
    assert meta["bitrate"] == 320000


def test_simhash_chunk_cache_bounded_to_one_entry(spark, sf_small):
    from sync_spark.operators import dedup
    from sync_spark.session import load_tables

    load_tables(spark, sf_small)
    dedup.simhash_pairs_cached(spark, "documents").count()
    assert len(dedup._live_chunk_cache) == 1
    first = dedup._live_chunk_cache[0]
    dedup.simhash_pairs_cached(spark, "documents").count()
    assert len(dedup._live_chunk_cache) == 1
    assert dedup._live_chunk_cache[0] is not first


def test_swap_dir_bumps_store_generation(tmp_path):
    from sync_spark.sources import bucketed

    gen0 = bucketed._store_mutation_gen
    stage = tmp_path / "stage"
    stage.mkdir()
    (stage / "f.txt").write_text("x")
    dst = tmp_path / "store"
    bucketed._swap_dir(str(stage), str(dst))
    assert bucketed._store_mutation_gen == gen0 + 1
    assert os.path.exists(dst / "f.txt")
