"""Baseline JPEG codec (functions/jpeg.py): roundtrip fidelity
floors, a HAND-CRAFTED byte stream with a closed-form expected output
(independent of the encoder — the same oracle style as the PNG/WAV
codecs), restart markers, malformed/unsupported rejection, and the
multimodal kernel integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sync_spark.functions.jpeg import (
    AC_LUM_BITS,
    AC_LUM_VALS,
    DC_LUM_BITS,
    DC_LUM_VALS,
    jpeg_decode,
    jpeg_encode,
    parse_jpeg_header,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.dstack(
        [
            xx * 255 / max(w - 1, 1),
            yy * 255 / max(h - 1, 1),
            (xx + yy) * 255 / max(w + h - 2, 1),
        ]
    ).astype(np.uint8)


def _psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


@pytest.mark.parametrize("sub,floor", [("444", 40.0), ("420", 32.0)])
def test_roundtrip_psnr_floor_odd_dims(sub, floor):
    img = _gradient(17, 24)  # not multiples of 8 — edge padding path
    data = jpeg_encode(img, quality=90, subsampling=sub)
    assert parse_jpeg_header(data) == (24, 17)
    w, h, out = jpeg_decode(data)
    assert (w, h) == (24, 17) and out.shape == (17, 24, 3)
    assert _psnr(out, img) > floor


def test_flat_image_near_exact_and_deterministic():
    flat = np.full((8, 8, 3), 130, dtype=np.uint8)
    data = jpeg_encode(flat, quality=90)
    assert data == jpeg_encode(flat, quality=90)
    _, _, out = jpeg_decode(data)
    assert int(np.max(np.abs(out.astype(int) - 130))) <= 1


def _dht(tc, th, bits, vals):
    return (
        b"\xff\xc4"
        + struct.pack(">H", 19 + len(vals))
        + bytes([(tc << 4) | th])
        + bytes(bits)
        + bytes(vals)
    )


def _handmade_gray(w, n_mcus, dri=0, samp=0x11):
    """Grayscale 8-tall stream, quant table all ones, each block one
    DC diff of +8 then EOB. With the orthonormal IDCT a DC
    coefficient c contributes c/8 per pixel, so every pixel is
    EXACTLY 128 + 8/8 = 129 — a closed-form oracle no part of our
    encoder touches. Entropy per block: DC sym 4 = '101', 4 magnitude
    bits '1000', EOB = '1010' -> 11 bits -> 1-padded byte pair B1 5F."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    out += b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
    out += struct.pack(">HH", 8, w) + bytes([1, 1, samp, 0])
    out += _dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    out += _dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    if dri:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", dri)
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    block = bytes([0xB1, 0x5F])
    for i in range(n_mcus):
        if dri and i:
            out += bytes([0xFF, 0xD0 + ((i - 1) % 8)])
        out += block
    out += b"\xff\xd9"
    return bytes(out)


def test_handcrafted_dc_only_stream_closed_form():
    w, h, px = jpeg_decode(_handmade_gray(8, 1))
    assert (w, h) == (8, 8)
    assert px.shape == (8, 8, 3)
    assert np.all(px == 129)


def test_restart_markers_reset_dc_prediction():
    # DRI=1, two MCUs, RST0 between them: each block's diff of +8 is
    # absolute again after the reset — both blocks decode to 129
    w, h, px = jpeg_decode(_handmade_gray(16, 2, dri=1))
    assert (w, h) == (16, 8)
    assert np.all(px == 129)


def test_unsupported_and_malformed_raise_valueerror():
    img = _gradient(8, 8)
    good = jpeg_encode(img, quality=85)
    # progressive SOF2
    bad = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive"):
        jpeg_decode(bad)
    # truncated entropy data
    with pytest.raises(ValueError):
        jpeg_decode(good[: len(good) // 2])
    # missing SOI
    with pytest.raises(ValueError):
        jpeg_decode(b"\x00" + good)
    # header walk rejects garbage too
    with pytest.raises(ValueError):
        parse_jpeg_header(b"\xff\xd8\x00\x00\x00\x00")


def test_multimodal_kernels_decode_and_resize_jpeg(spark):
    from pyspark.sql import Row

    from sync_spark.functions.multimodal import decode_media, image_stats, resize_image

    img = _gradient(32, 48)
    payload = jpeg_encode(img, quality=90)
    df = spark.createDataFrame(
        [
            Row(media_id=1, kind="image", payload=bytearray(payload)),
            Row(media_id=2, kind="image", payload=bytearray(b"\xff\xd8broken")),
        ],
        "media_id long, kind string, payload binary",
    )
    dims = {r.media_id: (r.width, r.height) for r in decode_media(df).collect()}
    assert dims[1] == (48, 32) and dims[2] == (None, None)

    stats = {r.media_id: r for r in image_stats(df).collect()}
    assert stats[1].width == 48
    # channel means within JPEG loss of the source's true means
    true = img.reshape(-1, 3).mean(axis=0)
    assert abs(stats[1].mean_r - true[0]) < 3.0
    assert stats[2].width is None  # corrupt → NULL row, batch alive

    resized = {r.media_id: r for r in resize_image(df, 24).collect()}
    assert (resized[1].width, resized[1].height) == (24, 16)
    # re-encoded in the SAME container, decodable, right size
    w2, h2, px2 = jpeg_decode(bytes(resized[1].payload))
    assert (w2, h2) == (24, 16)
    assert resized[2].payload is None


def test_single_component_scan_ignores_sampling_factors():
    """T.81 A.2: a one-component scan is NON-interleaved regardless of
    the frame's declared sampling factors — a grayscale stream with
    samp=2x2 must decode block-raster, same closed-form 129s."""
    # dri=1: each hand-made block is byte-aligned, so restarts must
    # separate them (same as the restart test). Under the OLD
    # interleaved-MCU bug this stream would decode as ONE 2x2-block
    # MCU and fail on the restart cadence.
    w, h, px = jpeg_decode(_handmade_gray(16, 2, dri=1, samp=0x22))
    assert (w, h) == (16, 8)
    assert np.all(px == 129)


def test_truncated_segments_raise_valueerror_not_struct_error():
    # SOF segment shorter than its dims field: must surface as
    # ValueError (the kernels' NULL-row contract), never struct.error
    bad_sof = b"\xff\xd8\xff\xc0" + struct.pack(">H", 4) + b"\x08\x00"
    with pytest.raises(ValueError):
        jpeg_decode(bad_sof)
    with pytest.raises(ValueError):
        parse_jpeg_header(bad_sof)
    bad_dri = (
        b"\xff\xd8\xff\xdd" + struct.pack(">H", 3) + b"\x01"
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError):
        jpeg_decode(bad_dri)


def test_dimension_bomb_rejected_before_allocation():
    """A ~100-byte payload claiming 65500x65500 must raise ValueError
    from the entropy-plausibility bound, not allocate ~34 GB."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    out += b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
    out += struct.pack(">HH", 65500, 65500) + bytes([1, 1, 0x11, 0])
    out += _dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    out += _dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    out += bytes([0xB1, 0x5F]) + b"\xff\xd9"
    with pytest.raises(ValueError, match="blocks"):
        jpeg_decode(bytes(out))
