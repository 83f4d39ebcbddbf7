"""Pure-stdlib GIF codec (functions/gif.py) + its multimodal kernel
integration: lossless exact-palette roundtrips, the deterministic
3-3-2 quantize fallback, LZW width-growth/table-freeze stress,
interlaced + sub-rectangle + extension-block decode, and the
one-bad-row-never-kills-the-batch contract through the Spark kernels."""

from __future__ import annotations

import struct

import numpy as np

from sync_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    gif_decode,
    gif_encode,
    parse_gif_header,
)


def _grad(mid: int, w: int, h: int) -> np.ndarray:
    rgb = np.zeros((h, w, 3), dtype=np.uint8)
    ys, xs = np.mgrid[0:h, 0:w]
    rgb[..., 0] = (xs * 7 + mid) % 256
    rgb[..., 1] = (ys * 11 + mid) % 256
    rgb[..., 2] = (xs + ys) % 256
    return rgb


def _img_descriptor_offset(p: bytes) -> int:
    """Structural offset of the image descriptor (never a byte
    search — 0x2C can occur inside the color table)."""
    n = 2 << (p[10] & 0x07) if p[10] & 0x80 else 0
    return 13 + 3 * n


def test_gif_roundtrip_lossless():
    """<= 256 unique colors -> exact palette -> byte-level construct +
    parse must reproduce the closed-form gradient exactly."""
    for mid, w, h in [(1, 4, 3), (9, 8, 5), (17, 6, 4), (3, 16, 16)]:
        rgb = _grad(mid, w, h)
        assert len(np.unique(rgb.reshape(-1, 3), axis=0)) <= 256
        p = gif_encode(rgb)
        assert p[:6] == b"GIF89a"
        assert parse_gif_header(p) == (w, h)
        dw, dh, px = gif_decode(p)
        assert (dw, dh) == (w, h)
        assert (px == rgb).all()


def test_gif_quantize_fallback_is_exact_332():
    """> 256 unique colors falls back to the deterministic 3-3-2
    truncation palette: decoded pixels equal the input masked to
    R7..5 G7..5 B7..6 — quantized, but bit-exactly predictable."""
    big = _grad(33, 64, 48)
    assert len(np.unique(big.reshape(-1, 3), axis=0)) > 256
    dw, dh, px = gif_decode(gif_encode(big))
    assert (dw, dh) == (64, 48)
    assert (px == (big & np.array([0xE0, 0xE0, 0xC0], np.uint8))).all()


def test_gif_lzw_width_growth_and_table_freeze():
    """A 256x200 high-entropy image drives the code width through
    every step to 12 bits and past the 4096-entry freeze; the
    deferred-clear encoder and the decoder must stay in lockstep."""
    raw = np.random.RandomState(7).randint(0, 256, size=(200, 256, 3)).astype(np.uint8)
    assert len(np.unique(raw.reshape(-1, 3), axis=0)) > 256  # quantize path
    dw, dh, px = gif_decode(gif_encode(raw))
    assert (dw, dh) == (256, 200)
    assert (px == (raw & np.array([0xE0, 0xE0, 0xC0], np.uint8))).all()


def test_gif_lzw_pair_fuzz():
    """Seeded fuzz of the raw LZW pair across alphabet sizes and
    stream lengths (covers KwKwK, width growth, freeze)."""
    for mcs in (2, 4, 8):
        for n in (1, 10, 1000, 20000):
            rng = np.random.RandomState(n + mcs)
            idx = rng.randint(0, 1 << mcs, size=n).astype(np.uint8)
            enc = _lzw_encode(idx.tobytes(), mcs)
            dec = np.frombuffer(_lzw_decode(enc, mcs, n), dtype=np.uint8)
            assert (dec == idx).all(), (mcs, n)


def test_gif_interlaced_decode():
    """Rows permuted into the 4-pass interlace order + the interlace
    flag must decode back to the original image."""
    rgb = _grad(5, 7, 10)
    order = [
        y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for y in range(start, 10, step)
    ]
    p = bytearray(gif_encode(rgb[order]))
    i = _img_descriptor_offset(p)
    p[i + 9] |= 0x40  # interlace flag
    dw, dh, px = gif_decode(bytes(p))
    assert (dw, dh) == (7, 10)
    assert (px == rgb).all()


def test_gif_extension_skip_and_subrect_composite():
    """A graphic-control extension before the frame is skipped per
    spec; a sub-rectangle frame composites onto a background-color
    canvas at its (left, top)."""
    rgb = _grad(5, 7, 10)
    p = bytearray(gif_encode(rgb))
    i = _img_descriptor_offset(p)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    dw, dh, px = gif_decode(bytes(p[:i]) + gce + bytes(p[i:]))
    assert (px == rgb).all()

    small = _grad(3, 3, 2)
    q = bytearray(gif_encode(small))
    struct.pack_into("<HH", q, 6, 6, 5)  # canvas 6x5
    j = _img_descriptor_offset(q)
    struct.pack_into("<HH", q, j + 1, 2, 1)  # frame at left=2, top=1
    dw, dh, px = gif_decode(bytes(q))
    assert (dw, dh) == (6, 5)
    assert (px[1:3, 2:5] == small).all()
    # everything outside the frame is the background color (index 0)
    mask = np.ones((5, 6), dtype=bool)
    mask[1:3, 2:5] = False
    assert (px[mask] == px[0, 0]).all()


def test_gif_frame_multiplication_bomb_raises():
    """A tiny payload declaring a large canvas plus many small frames
    must not accumulate unbounded canvas copies: the pixel budget
    covers the WHOLE animation, not just one still."""
    from sync_spark.functions.gif import gif_encode_frames, gif_frames

    one_px = [np.zeros((1, 1, 3), np.uint8)] * 6
    p = bytearray(gif_encode_frames(one_px, delay_ms=100))
    struct.pack_into("<HH", p, 6, 4096, 4096)  # 16.7M-px canvas per frame
    try:
        gif_frames(bytes(p))
        raise AssertionError("frame bomb decoded")
    except ValueError as exc:
        assert "decode-budget" in str(exc)


def test_gif_malformed_raises_valueerror_only():
    truncated_lzw = gif_encode(_grad(1, 6, 5))[:-10]
    cases = [
        b"GIF89a\x00\x00\x00",  # truncated header
        b"NOTGIF" + b"\x00" * 20,  # bad signature
        b"GIF89a" + struct.pack("<HHBBB", 0, 5, 0, 0, 0),  # zero width
        b"GIF89a" + struct.pack("<HHBBB", 60000, 60000, 0, 0, 0),  # bomb
        truncated_lzw,
        b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0, 0, 0) + b"\x99",  # bad block
    ]
    for payload in cases:
        try:
            gif_decode(payload)
            raise AssertionError(f"decoded malformed payload {payload[:12]!r}")
        except ValueError:
            pass  # the ONLY acceptable error class (codec contract)


def test_gif_animation_roundtrip_and_meta():
    """Animated encode → gif_frames plays every frame losslessly with
    its delay; gif_meta walks the same numbers without touching LZW."""
    from sync_spark.functions.gif import gif_encode_frames, gif_frames, gif_meta

    frames = [_grad(5 + f, 6, 4) for f in range(3)]
    p = gif_encode_frames(frames, delay_ms=250)
    assert gif_meta(p) == (6, 4, 3, 750)
    w, h, decoded = gif_frames(p)
    assert (w, h) == (6, 4) and len(decoded) == 3
    for (delay, px), exp in zip(decoded, frames):
        assert delay == 250
        assert (px == exp).all()


def test_gif_transparency_and_disposal():
    """A transparent index keeps the underlying canvas pixel; disposal
    method 2 restores the frame rect to background before the next
    frame composites."""
    from sync_spark.functions.gif import gif_encode_frames, gif_frames

    base = np.full((4, 4, 3), 200, np.uint8)
    over = np.zeros((4, 4, 3), np.uint8)
    over[1:3, 1:3] = 50
    p = bytearray(gif_encode_frames([base, over], delay_ms=100))
    # locate the SECOND graphic control block and mark color index of
    # value-200 pixels transparent in frame 2, disposal=2 on frame 1
    gces = [i for i in range(len(p) - 8) if p[i] == 0x21 and p[i + 1] == 0xF9]
    assert len(gces) == 2
    # palette: sorted unique colors → index 0 = (0,0,0), 1 = (50..), 2 = (200..)
    # mark frame 2's BLACK border (index 0) transparent: those pixels
    # must keep showing whatever is already on the canvas
    p[gces[1] + 3] |= 0x01  # transparency flag
    p[gces[1] + 6] = 0
    w, h, decoded = gif_frames(bytes(p))
    f1, f2 = decoded[0][1], decoded[1][1]
    assert (f1 == base).all()
    # frame 2's 200-pixels are transparent → canvas (still frame 1) shows
    assert (f2[1:3, 1:3] == 50).all()
    assert (f2[0, 0] == 200).all()  # transparent over frame-1 pixels
    # now disposal=2 on frame 1: canvas resets to background (index 0 =
    # black) before frame 2, so transparent pixels show background
    p[gces[0] + 3] = (p[gces[0] + 3] & ~0x1C) | 0x08  # disposal field := 2
    w, h, decoded = gif_frames(bytes(p))
    f2 = decoded[1][1]
    assert (f2[0, 0] == 0).all()
    assert (f2[1:3, 1:3] == 50).all()


def test_gif_sample_frames_real_digests(spark):
    """sample_frames on an animated GIF emits REAL per-frame digests:
    the digest at a timestamp equals the sha256 of the directly
    decoded frame the timestamp lands in — and changes across frames."""
    import hashlib

    from sync_spark.functions.gif import gif_frames
    from sync_spark.functions.multimodal import animated_gif_payload, sample_frames

    p = animated_gif_payload(7, width=6, height=5, n_frames=4, delay_ms=100)
    df = spark.createDataFrame(
        [(1, "video", p), (2, "video", p[:20]), (3, "image", p)],
        "media_id long, kind string, payload binary",
    )
    rows = sample_frames(df, every_ms=100).collect()
    got = {(r.media_id, r.frame_ts_ms): r.frame_digest for r in rows}
    assert {m for m, _ in got} == {1}  # corrupt row → no rows; non-video filtered
    _, _, frames = gif_frames(p)
    expected = [hashlib.sha256(px.tobytes()).hexdigest()[:16] for _d, px in frames]
    assert [got[(1, ts)] for ts in (0, 100, 200, 300)] == expected
    assert len(set(expected)) == 4  # every frame genuinely distinct


def test_gif_decode_media_reports_animation_duration(spark):
    from sync_spark.functions.multimodal import animated_gif_payload, decode_media, gif_payload

    rows = [
        (1, "video", animated_gif_payload(3, width=5, height=4, n_frames=3, delay_ms=200)),
        (2, "image", gif_payload(3, width=5, height=4)),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {r.media_id: r for r in decode_media(df).collect()}
    assert (out[1].width, out[1].height, out[1].duration_ms) == (5, 4, 600)
    assert (out[2].width, out[2].height, out[2].duration_ms) == (5, 4, None)


def test_gif_decode_media_and_null_rows(spark):
    """decode_media reports GIF dims via the header walk; corrupt
    payloads yield NULL rows, never a dead Arrow batch."""
    from sync_spark.functions.multimodal import decode_media, gif_payload

    good = gif_payload(11, width=6, height=5)
    rows = [
        (1, "image", good),
        (2, "image", good[:-10]),  # header fine, stream truncated: dims still parse
        (3, "image", b"GIF89a" + struct.pack("<HHBBB", 60000, 60000, 0, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {r.media_id: r for r in decode_media(df).collect()}
    assert (out[1].width, out[1].height) == (6, 5)
    assert (out[2].width, out[2].height) == (6, 5)  # header-only walk
    assert out[3].width is None and out[3].height is None


def test_gif_image_stats_match_ppm(spark):
    """Same gradient, two containers (exact-palette GIF is lossless):
    channel means must agree exactly — independent decode paths."""
    from sync_spark.functions.multimodal import gif_payload, image_stats, ppm_payload

    rows = [
        (1, gif_payload(9, width=8, height=6)),
        (2, ppm_payload(9, width=8, height=6)),
        (3, gif_payload(9, width=8, height=6)[:-10]),  # truncated LZW → NULL stats
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in image_stats(df).collect()}
    assert out[1].mean_r == out[2].mean_r
    assert out[1].mean_g == out[2].mean_g
    assert out[1].mean_b == out[2].mean_b
    assert (out[1].width, out[1].height) == (8, 6)
    assert out[3].mean_r is None and out[3].width is None


def test_gif_resize_reencodes_as_gif(spark):
    """Resize keeps the container: GIF in → valid GIF out, re-parsed
    pixel-exactly against the PPM kernel's grid on the same gradient."""
    from sync_spark.functions.multimodal import (
        _parse_ppm_header,
        gif_payload,
        ppm_payload,
        resize_image,
    )

    rows = [
        (1, gif_payload(5, width=10, height=8)),
        (2, ppm_payload(5, width=10, height=8)),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in resize_image(df, max_side=4).collect()}
    assert (out[1].width, out[1].height) == (4, 3) == (out[2].width, out[2].height)
    gp = bytes(out[1].payload)
    assert gp[:6] == b"GIF89a"
    gw, gh, gif_px = gif_decode(gp)
    assert (gw, gh) == (4, 3)
    pp = bytes(out[2].payload)
    w, h, off = _parse_ppm_header(pp)
    ppm_px = np.frombuffer(pp, np.uint8, count=w * h * 3, offset=off).reshape(h, w, 3)
    assert (gif_px == ppm_px).all()  # resized grid stays <=256 colors → lossless
