"""Pure-stdlib GIF87a/89a codec (LZW): encode + decode for the
multimodal image kernels.

Implemented from the public GIF89a specification (CompuServe, 1990)
and the standard variable-width LZW formulation — no external codec
libraries (this container ships none). The reference engine handles
images through native codec libraries (see reference media handling;
cited for parity, not ported) — this module closes the palette-image
path the same way functions/jpeg.py closed baseline JPEG and
multimodal.py closed PNG.

Scope, matching the in-engine thumbnail + frame-sampling use cases:
- Encode: single-frame (``gif_encode``) and animated
  (``gif_encode_frames``: per-frame graphic-control delays, NETSCAPE
  loop) GIF89a with a global color table. Content with <= 256 unique
  colors encodes LOSSLESSLY (exact palette, sorted for determinism);
  more colors fall back to a deterministic 3-3-2 truncation palette
  (documented lossy, like the JPEG leg — only dims ride the shared
  closed-form oracle for such payloads).
- Decode: ``gif_frames`` plays the full animation (GCE delays,
  transparency, disposal 0/1/2; 3 treated as 1), ``gif_decode``
  returns the first frame, ``gif_meta`` is the light no-LZW walk the
  scan-time metadata kernel uses (dims, frame count, total duration);
  global and local color tables; interlaced and non-interlaced;
  non-graphic extension blocks are skipped per spec; sub-rectangle
  frames composite onto a background-color canvas.
- Error discipline (repo-wide codec contract): every malformed-input
  path raises ValueError — struct/LZW/palette errors are normalized so
  one bad payload yields one NULL row, never a dead Arrow batch; and
  header-claimed dimensions are validated BEFORE any allocation
  (dimension-bomb guard).
"""

from __future__ import annotations

import struct

_MAX_PIXELS = 1 << 26  # dimension-bomb guard: 64M px is far beyond thumbnails
_GIF_SIGS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------- LZW


class _BitWriter:
    """LSB-first bit packer (GIF appendix F byte order)."""

    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """Variable-width GIF LZW. Widening is the canonical emit-side
    rule (grow AFTER assigning code 2^width, i.e. when next_code hits
    (1 << width) + 1 — one step ahead of the decoder, which adds its
    entries one code later). The table freezes at 4096 entries
    (deferred-clear form, legal per spec and matched by the decoder
    below and by mainstream decoders)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    bw.write(clear, width)
    buf = b""
    for k in indices:
        nxt = buf + bytes([k])
        if nxt in table:
            buf = nxt
            continue
        bw.write(table[buf], width)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        buf = bytes([k])
    if buf:
        bw.write(table[buf], width)
    bw.write(eoi, width)
    return bw.flush()


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytearray:
    """Decode exactly ``n_expected`` indices; raises ValueError on a
    corrupt stream (bad code, truncation, overrun)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"malformed GIF: LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("malformed GIF: LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = table[: eoi + 1]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("malformed GIF: first LZW code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK case
        else:
            raise ValueError("malformed GIF: LZW code out of range")
        out += entry
        if len(out) > n_expected:
            raise ValueError("malformed GIF: LZW output exceeds image area")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) != n_expected:
        raise ValueError(
            f"malformed GIF: LZW produced {len(out)} of {n_expected} pixels"
        )
    return out


# ------------------------------------------------------------- encode


def _global_palette(flat, np):
    """Exact palette + indices when <= 256 unique colors, else the
    deterministic 3-3-2 truncation (R7..5 G7..5 B7..6)."""
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) <= 256:
        return colors, inverse.astype(np.uint8)
    indices = (
        (flat[:, 0] & 0xE0) | ((flat[:, 1] & 0xE0) >> 3) | (flat[:, 2] >> 6)
    ).astype(np.uint8)
    ii = np.arange(256, dtype=np.uint8)
    palette = np.stack(
        [ii & 0xE0, (ii << 3) & 0xE0, (ii << 6) & 0xC0], axis=1
    ).astype(np.uint8)
    return palette, indices


def _write_frame(out: bytearray, indices: bytes, w: int, h: int, mcs: int) -> None:
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    out.append(mcs)
    data = _lzw_encode(indices, mcs)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator


def _gif_header(palette, w: int, h: int, np) -> tuple[bytearray, int]:
    # pad the table to a power-of-two size >= 4 (the spec's smallest
    # LZW-friendly table; min code size must be >= 2)
    size = 4
    while size < len(palette):
        size *= 2
    mcs = max(2, size.bit_length() - 1)
    lsd_packed = 0x80 | ((size.bit_length() - 2) & 0x07)  # GCT flag + size
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, lsd_packed, 0, 0)
    out += bytearray(palette.tobytes()) + bytes(3 * (size - len(palette)))
    return out, mcs


def gif_encode(rgb) -> bytes:
    """(h, w, 3) uint8 array -> single-frame GIF89a bytes. Exact
    (lossless) palette when the image has <= 256 unique colors, else a
    deterministic 3-3-2 truncation palette."""
    import numpy as np

    h, w, _ = rgb.shape
    palette, indices = _global_palette(rgb.reshape(-1, 3).astype(np.uint8), np)
    out, mcs = _gif_header(palette, w, h, np)
    _write_frame(out, indices.tobytes(), w, h, mcs)
    out += b"\x3b"  # trailer
    return bytes(out)


def gif_encode_frames(frames_rgb, delay_ms: int = 100) -> bytes:
    """list of same-shape (h, w, 3) uint8 arrays -> animated GIF89a:
    ONE global palette over the whole animation (exact when <= 256
    unique colors across all frames — lossless per frame), a
    NETSCAPE2.0 infinite-loop extension, and a per-frame graphic
    control block (disposal=1 'do not dispose', delay rounded to the
    spec's centisecond grain)."""
    import numpy as np

    if not frames_rgb:
        raise ValueError("gif_encode_frames needs at least one frame")
    h, w, _ = frames_rgb[0].shape
    for f in frames_rgb:
        if f.shape != (h, w, 3):
            raise ValueError("all animation frames must share one shape")
    flat = np.concatenate([f.reshape(-1, 3).astype(np.uint8) for f in frames_rgb])
    palette, idx_all = _global_palette(flat, np)
    out, mcs = _gif_header(palette, w, h, np)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    delay_cs = max(1, round(delay_ms / 10))
    gce = b"\x21\xf9\x04\x04" + struct.pack("<H", delay_cs) + b"\x00\x00"
    span = w * h
    for i in range(len(frames_rgb)):
        out += gce
        _write_frame(out, idx_all[i * span : (i + 1) * span].tobytes(), w, h, mcs)
    out += b"\x3b"
    return bytes(out)


# ------------------------------------------------------------- decode


def parse_gif_header(payload: bytes) -> tuple[int, int]:
    """Signature + logical screen descriptor -> (width, height).
    Raises ValueError on malformed/truncated headers or bomb-sized
    dimension claims (checked BEFORE any allocation)."""
    if len(payload) < 13 or payload[:6] not in _GIF_SIGS:
        raise ValueError("malformed GIF: bad signature or truncated")
    try:
        w, h = struct.unpack("<HH", payload[6:10])
    except struct.error as exc:  # pragma: no cover - length-guarded above
        raise ValueError("malformed GIF: truncated screen descriptor") from exc
    if w <= 0 or h <= 0:
        raise ValueError(f"malformed GIF: non-positive dimensions {w}x{h}")
    if w * h > _MAX_PIXELS:
        raise ValueError(f"malformed GIF: dimension bomb {w}x{h}")
    return w, h


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_decode(payload: bytes):
    """First image frame -> (canvas_w, canvas_h, RGB uint8 array).
    All malformed-input errors are ValueError (codec contract)."""
    w, h, frames = gif_frames(payload)
    return w, h, frames[0][1]


def gif_frames(payload: bytes):
    """Full animation decode -> (canvas_w, canvas_h,
    [(delay_ms, RGB canvas array), ...]) with GIF89a graphic-control
    semantics: per-frame delays (centiseconds -> ms), transparency
    (transparent indices keep the underlying canvas pixel), and
    disposal methods 0/1 (leave) and 2 (restore frame rect to the
    background color); method 3 (restore-previous) is treated as 1 —
    the encoder below never emits it and mainstream content rarely
    does. All malformed-input errors are ValueError."""
    import numpy as np

    try:
        return _gif_frames_inner(payload, np)
    except ValueError:
        raise
    except (struct.error, IndexError, OverflowError) as exc:
        # normalize every parse-time error class: one bad payload must
        # yield one NULL row, never escape an except-ValueError kernel
        raise ValueError(f"malformed GIF: {exc}") from exc


def _skip_subblocks(payload: bytes, pos: int, what: str) -> int:
    while True:
        if pos >= len(payload):
            raise ValueError(f"malformed GIF: truncated {what}")
        ln = payload[pos]
        pos += 1 + ln
        if ln == 0:
            return pos


def _gif_frames_inner(payload: bytes, np):
    w, h = parse_gif_header(payload)
    packed = payload[10]
    bg_index = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    bg = (
        gct[bg_index]
        if gct is not None and bg_index < len(gct)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.empty((h, w, 3), dtype=np.uint8)
    canvas[:, :] = bg
    frames = []
    delay_ms, disposal, t_index = 0, 0, None  # pending GCE state
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control: applies to next frame
                ln = payload[pos]
                if ln != 4 or pos + 5 > len(payload):
                    raise ValueError("malformed GIF: bad graphic control block")
                gpacked = payload[pos + 1]
                (delay_cs,) = struct.unpack("<H", payload[pos + 2 : pos + 4])
                delay_ms = delay_cs * 10
                disposal = (gpacked >> 2) & 0x07
                t_index = payload[pos + 4] if gpacked & 0x01 else None
                pos += 5
                if payload[pos] != 0:
                    raise ValueError("malformed GIF: unterminated graphic control")
                pos += 1
            else:  # other extensions (NETSCAPE loop, comments): skipped
                pos = _skip_subblocks(payload, pos, "extension")
            continue
        if block != 0x2C:
            raise ValueError(f"malformed GIF: unknown block 0x{block:02x}")
        left, top, iw, ih, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        if iw <= 0 or ih <= 0 or left + iw > w or top + ih > h:
            raise ValueError("malformed GIF: frame exceeds canvas")
        palette = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(
                payload, np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("malformed GIF: no color table for frame")
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("malformed GIF: truncated image data")
            ln = payload[pos]
            pos += 1
            if ln == 0:
                break
            data += payload[pos : pos + ln]
            pos += ln
        indices = np.frombuffer(
            _lzw_decode(bytes(data), mcs, iw * ih), dtype=np.uint8
        )
        if int(indices.max(initial=0)) >= len(palette):
            raise ValueError("malformed GIF: pixel index outside color table")
        frame = palette[indices].reshape(ih, iw, 3)
        idx2 = indices.reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            order = [
                y
                for start, step in _INTERLACE_PASSES
                for y in range(start, ih, step)
            ]
            deinterlaced = np.empty_like(frame)
            deinterlaced[order] = frame
            frame = deinterlaced
            di = np.empty_like(idx2)
            di[order] = idx2
            idx2 = di
        rect = canvas[top : top + ih, left : left + iw]
        if t_index is not None:
            opaque = idx2 != t_index
            rect[opaque] = frame[opaque]
        else:
            rect[:, :] = frame
        if (len(frames) + 1) * w * h > _MAX_PIXELS:
            # frame-multiplication bomb: a tiny payload with a large
            # canvas and many 1x1 frames would otherwise accumulate
            # unbounded canvas copies — the per-still dimension guard
            # must hold for the WHOLE animation's materialized pixels.
            # NOTE: a legitimately long large animation hits this too
            # — it is an "unsupported at this budget" refusal (still
            # ValueError = one NULL row, the only contract callers
            # have), not a corruption claim
            raise ValueError(
                f"unsupported GIF: animation exceeds {_MAX_PIXELS} "
                "total decoded pixels (decode-budget refusal)"
            )
        frames.append((delay_ms, canvas.copy()))
        if disposal == 2:  # restore frame rect to background
            canvas[top : top + ih, left : left + iw] = bg
        delay_ms, disposal, t_index = 0, 0, None
    if not frames:
        raise ValueError("malformed GIF: no image frame")
    return w, h, frames


def gif_meta(payload: bytes):
    """Light metadata walk (no LZW decode — the header-only
    discipline the decode_media kernel runs at scan time):
    -> (width, height, n_frames, total_delay_ms). Raises ValueError
    on malformed streams."""
    try:
        w, h = parse_gif_header(payload)
        packed = payload[10]
        pos = 13
        if packed & 0x80:
            pos += 3 * (2 << (packed & 0x07))
        n_frames, total_ms = 0, 0
        while pos < len(payload):
            block = payload[pos]
            pos += 1
            if block == 0x3B:
                break
            if block == 0x21:
                label = payload[pos]
                pos += 1
                if label == 0xF9 and pos + 4 <= len(payload) and payload[pos] == 4:
                    (delay_cs,) = struct.unpack("<H", payload[pos + 2 : pos + 4])
                    total_ms += delay_cs * 10
                pos = _skip_subblocks(payload, pos, "extension")
                continue
            if block != 0x2C:
                raise ValueError(f"malformed GIF: unknown block 0x{block:02x}")
            _, _, iw, ih, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
            pos += 9
            if ipacked & 0x80:
                pos += 3 * (2 << (ipacked & 0x07))
            pos += 1  # LZW min code size
            pos = _skip_subblocks(payload, pos, "image data")
            n_frames += 1
        if n_frames == 0:
            raise ValueError("malformed GIF: no image frame")
        return w, h, n_frames, total_ms
    except ValueError:
        raise
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"malformed GIF: {exc}") from exc
