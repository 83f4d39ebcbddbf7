"""H.264 SPS-walk metadata decode (functions/h264.py): exp-Golomb
reader, emulation-prevention escaping, SPS geometry incl. cropping
and the high-profile conditional block, Annex-B NAL walking, frame
counting, engine wiring, and the m_media_h264 registry row vs its
closed-form oracle."""

from __future__ import annotations

import pytest

from sync_spark.functions.h264 import (
    _BitReader,
    _BitWriter,
    _escape,
    _unescape,
    h264_meta,
    h264_payload,
    parse_sps,
)


def test_dims_roundtrip_including_crop():
    for w, h in [(64, 48), (1920, 1080), (16, 16), (30, 18), (1280, 720)]:
        m = h264_meta(h264_payload(5, width=w, height=h, n_frames=4))
        assert (m["width"], m["height"]) == (w, h)
        assert m["n_frames"] == 4
        assert m["profile_idc"] == 66 and m["frame_mbs_only"] == 1


def test_exp_golomb_reader_writer_inverse():
    w = _BitWriter()
    vals = [0, 1, 2, 3, 7, 8, 255, 1023]
    for v in vals:
        w.ue(v)
    r = _BitReader(w.bytes_aligned())
    assert [r.ue() for _ in vals] == vals


def test_escape_unescape_inverse():
    import random

    rnd = random.Random(7)
    for _ in range(300):
        b = bytes(rnd.choice([0, 0, 0, 1, 2, 3, 0xFF]) for _ in range(50))
        esc = _escape(b)
        assert _unescape(esc) == b
        # no illegal 00 00 0x (x<=2) sequence survives escaping —
        # 00 00 03 is legal (it IS the emulation-prevention marker)
        for i in range(len(esc) - 2):
            assert not (esc[i] == 0 and esc[i + 1] == 0 and esc[i + 2] <= 2)


def test_high_profile_sps_conditional_block():
    """High profile (100) inserts chroma/bit-depth fields before the
    geometry — a baseline-only parser would misread every dimension."""
    w = _BitWriter()
    w.u(100, 8)  # profile: high
    w.u(0, 8)
    w.u(40, 8)  # level 4.0
    w.ue(0)  # sps id
    w.ue(1)  # chroma_format_idc 4:2:0
    w.ue(0)  # bit_depth_luma_minus8
    w.ue(0)  # bit_depth_chroma_minus8
    w.u(0, 1)  # qpprime
    w.u(0, 1)  # no scaling matrix
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # poc type 2
    w.ue(1)  # max refs
    w.u(0, 1)
    w.ue(119)  # 120 MBs wide = 1920
    w.ue(67)  # 68 units = 1088
    w.u(1, 1)  # frame_mbs_only
    w.u(1, 1)  # direct_8x8
    w.u(1, 1)  # cropping
    w.ue(0); w.ue(0); w.ue(0); w.ue(4)  # crop bottom 4*2=8 -> 1080
    w.u(0, 1)  # no vui
    m = parse_sps(w.bytes_aligned())
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["profile_idc"] == 100 and m["level_idc"] == 40


def test_frame_count_and_truncation():
    p = h264_payload(2, n_frames=5)
    assert h264_meta(p)["n_frames"] == 5
    # cutting into the tail loses at most trailing frames, never dims
    m = h264_meta(p[: len(p) - 8])
    assert (m["width"], m["height"]) == (64, 48)
    assert m["n_frames"] <= 5


def test_invalid_streams():
    with pytest.raises(ValueError):
        h264_meta(b"\x00\x00\x00\x01\x65\x88\x80")  # slices, no SPS
    with pytest.raises(ValueError):
        parse_sps(b"\x42")  # truncated


def test_decode_payload_wiring():
    from sync_spark.functions.multimodal import _decode_payload

    assert _decode_payload(h264_payload(9, width=320, height=240)) == (320, 240, None)
    assert _decode_payload(b"\x00\x00\x00\x01\x65" + b"\x88" * 32) == (
        None,
        None,
        None,
    )


def test_m_media_h264_vs_oracle(spark):
    from sync_spark.registry import all_queries
    from sync_spark.testing import run_compare

    spec = all_queries()["m_media_h264"]
    assert run_compare(spark, spec, "/root/testdata/sf0.001") is None
