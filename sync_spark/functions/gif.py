"""Pure-stdlib GIF87a/89a codec (LZW): encode + decode for the
multimodal image kernels.

Implemented from the public GIF89a specification (CompuServe, 1990)
and the standard variable-width LZW formulation — no external codec
libraries (this container ships none). The reference engine handles
images through native codec libraries (see reference media handling;
cited for parity, not ported) — this module closes the palette-image
path the same way functions/jpeg.py closed baseline JPEG and
multimodal.py closed PNG.

Scope, matching the in-engine thumbnail use case:
- Encode: single-frame GIF89a, global color table. Images with <= 256
  unique colors encode LOSSLESSLY (exact palette, sorted for
  determinism); more colors fall back to a deterministic 3-3-2
  truncation palette (documented lossy, like the JPEG leg — only dims
  ride the shared closed-form oracle for such payloads).
- Decode: first image frame of an 87a/89a stream; global and local
  color tables; interlaced and non-interlaced; extension blocks are
  skipped per spec; sub-rectangle frames composite onto a
  background-color canvas. Later animation frames are ignored (the
  metadata/stat kernels treat a GIF as its first frame).
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


def gif_encode(rgb) -> bytes:
    """(h, w, 3) uint8 array -> single-frame GIF89a bytes. Exact
    (lossless) palette when the image has <= 256 unique colors, else a
    deterministic 3-3-2 truncation palette."""
    import numpy as np

    h, w, _ = rgb.shape
    px = rgb.reshape(-1, 3).astype(np.uint8)
    colors, inverse = np.unique(px, axis=0, return_inverse=True)
    if len(colors) <= 256:
        palette = colors
        indices = inverse.astype(np.uint8)
    else:  # deterministic quantization: R7..5 G7..5 B7..6
        indices = (
            (px[:, 0] & 0xE0) | ((px[:, 1] & 0xE0) >> 3) | (px[:, 2] >> 6)
        ).astype(np.uint8)
        ii = np.arange(256, dtype=np.uint8)
        palette = np.stack(
            [ii & 0xE0, (ii << 3) & 0xE0, (ii << 6) & 0xC0], axis=1
        ).astype(np.uint8)
    # pad the table to a power-of-two size >= 4 (the spec's smallest
    # LZW-friendly table; min code size must be >= 2)
    size = 4
    while size < len(palette):
        size *= 2
    table = bytearray(palette.tobytes()) + bytes(3 * (size - len(palette)))
    mcs = max(2, size.bit_length() - 1)
    lsd_packed = 0x80 | ((size.bit_length() - 2) & 0x07)  # GCT flag + size
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, lsd_packed, 0, 0)
    out += table
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    out.append(mcs)
    data = _lzw_encode(indices.tobytes(), mcs)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
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
    import numpy as np

    try:
        return _gif_decode_inner(payload, np)
    except ValueError:
        raise
    except (struct.error, IndexError, OverflowError) as exc:
        # normalize every parse-time error class: one bad payload must
        # yield one NULL row, never escape an except-ValueError kernel
        raise ValueError(f"malformed GIF: {exc}") from exc


def _gif_decode_inner(payload: bytes, np):
    w, h = parse_gif_header(payload)
    packed = payload[10]
    bg_index = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:, :] = gct[bg_index]
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("malformed GIF: truncated extension")
                ln = payload[pos]
                pos += 1 + ln
                if ln == 0:
                    break
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
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            order = [
                y
                for start, step in _INTERLACE_PASSES
                for y in range(start, ih, step)
            ]
            deinterlaced = np.empty_like(frame)
            deinterlaced[order] = frame
            frame = deinterlaced
        canvas[top : top + ih, left : left + iw] = frame
        return w, h, canvas  # first frame only (animation ignored)
    raise ValueError("malformed GIF: no image frame")
