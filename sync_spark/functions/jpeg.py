"""Pure-stdlib + numpy baseline JPEG codec (ITU-T T.81).

Closes the last lossless-vs-lossy image seam the same way round 4's
PNG codec did: the container ships no codec libraries, and the spec is
public — baseline sequential DCT with the Annex-K quantization and
Huffman tables is implementable with a bit reader, a canonical-Huffman
walk and two 8x8 matrix multiplies. Scope (exactly what the engine's
thumbnail-scale media kernels need):

- DECODE: baseline DCT (SOF0), 8-bit, grayscale or YCbCr with any
  sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), multiple scans
  not supported (progressive SOF2 raises ValueError — as does every
  malformed stream, so one bad payload stays one NULL row), restart
  intervals (DRI / RSTn) honored.
- ENCODE: 4:4:4 or 4:2:0 YCbCr, quality-scaled Annex-K tables
  (libjpeg's 5000/Q | 200-2Q scaling), standard Huffman tables, JFIF
  APP0. Deterministic: same pixels + quality -> same bytes.

The DCT is the orthonormal matrix form (D = M B M^T): floating-point,
bit-exact across runs on the same platform, and the roundtrip error
bound is pinned by tests (PSNR floor + closed-form DC-only stream).

Reference parity note: the reference engine treats media as opaque
BLOBs (no pixel semantics) — this codec exists for the ENGINE's
multimodal operators (image_stats / resize), cited in
functions/multimodal.py.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K — public spec constants)
# ---------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

Q_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
Q_CHROM = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix():
    """Orthonormal DCT-II basis: M[k,n] = c(k)/2 · cos((2n+1)kπ/16),
    so forward = M B Mᵀ and inverse = Mᵀ S M exactly."""
    import numpy as np

    M = np.zeros((8, 8))
    for k in range(8):
        c = (1 / (2 ** 0.5)) if k == 0 else 1.0
        for n in range(8):
            M[k, n] = 0.5 * c * np.cos((2 * n + 1) * k * np.pi / 16)
    return M


def _scaled_qtable(base, quality: int):
    import numpy as np

    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (np.array(base, dtype=np.int64) * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32).reshape(8, 8)


def _canonical_codes(bits, vals):
    """(symbol -> (code, length)) per the canonical assignment."""
    codes = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return codes


def _decode_table(bits, vals):
    """((length, code) -> symbol): the same canonical assignment as
    _canonical_codes, orientation flipped — ONE copy of the
    algorithm."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, vals).items()}


# ---------------------------------------------------------------------------
# Bit I/O (0xFF byte stuffing per T.81 B.1.1.5)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("malformed JPEG: entropy data truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("malformed JPEG: dangling 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                # a real marker inside entropy data: signal to caller
                raise _MarkerInData(b, nxt)
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.acc = 0
        self.nbits = 0


class _MarkerInData(Exception):
    def __init__(self, ff, marker):
        self.marker = marker
        super().__init__(f"marker 0x{marker:02x} in entropy data")


def _huff_decode(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("malformed JPEG: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def jpeg_decode(payload: bytes):
    """(width, height, RGB uint8 array). Raises ValueError on any
    malformed or non-baseline stream (kernels map that to NULL) —
    including short-segment struct.error, normalized here so the
    one-bad-row contract holds at the codec boundary."""
    try:
        return _jpeg_decode_impl(payload)
    except struct.error as exc:
        raise ValueError(f"malformed JPEG: truncated segment: {exc}") from exc


def _jpeg_decode_impl(payload: bytes):
    import numpy as np

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("malformed JPEG: missing SOI")
    pos = 2
    qtables: dict[int, "np.ndarray"] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("malformed JPEG: expected marker")
        marker = payload[pos + 1]
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        if marker == 0xD9:  # EOI before scan
            raise ValueError("malformed JPEG: EOI before SOS")
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("malformed JPEG: truncated segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                n = 64 * (2 if prec else 1)
                raw = seg[i : i + n]
                if len(raw) < n:
                    raise ValueError("malformed JPEG: short DQT")
                if prec:
                    vals = np.frombuffer(raw, dtype=">u2").astype(np.int32)
                else:
                    vals = np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                t = np.zeros(64, dtype=np.int32)
                t[np.array(ZIGZAG)] = vals  # de-zigzag into raster order
                qtables[tid] = t.reshape(8, 8)
                i += n
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nvals])
                if len(vals) < nvals:
                    raise ValueError("malformed JPEG: short DHT")
                htables[(tc, th)] = _decode_table(bits, vals)
                i += 17 + nvals
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG: {prec}-bit precision")
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG: {nc} components")
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq})
            for c in comps:
                if not (1 <= c["h"] <= 2 and 1 <= c["v"] <= 2):
                    raise ValueError("unsupported JPEG: sampling factor > 2")
            frame = {"w": w, "h": h, "comps": comps}
            if w <= 0 or h <= 0:
                raise ValueError("malformed JPEG: non-positive dimensions")
        elif marker == 0xC2:
            raise ValueError("unsupported JPEG: progressive (SOF2)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG: SOF marker 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("malformed JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(
                    (x for x in frame["comps"] if x["id"] == cs), None
                )
                if comp is None:
                    raise ValueError("malformed JPEG: scan names unknown component")
                scan.append({**comp, "td": tt >> 4, "ta": tt & 0x0F})
            if len(scan) != len(frame["comps"]):
                raise ValueError("unsupported JPEG: multi-scan file")
            if len(scan) == 1:
                # T.81 A.2: a single-component scan is NON-interleaved
                # — one data unit per MCU in plain raster order; the
                # frame's sampling factors do not tile it
                scan[0] = {**scan[0], "h": 1, "v": 1}
            return _decode_scan(
                payload, pos + 2 + seglen, frame, scan, qtables, htables,
                restart_interval,
            )
        # APPn / COM / others: skip
        pos += 2 + seglen
    raise ValueError("malformed JPEG: no SOS")


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    import numpy as np

    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    # plausibility bound BEFORE any allocation: every block costs at
    # least ~2 entropy bits (shortest DC code + EOB), so a tiny
    # payload claiming 65500x65500 (a ~34 GB plane) is rejected here
    # with a ValueError instead of an uncatchable MemoryError mid-batch
    total_blocks = mcus_x * mcus_y * sum(c["h"] * c["v"] for c in scan)
    if total_blocks // 4 > len(data) - pos:
        raise ValueError(
            f"malformed JPEG: {w}x{h} declares {total_blocks} blocks but only "
            f"{len(data) - pos} entropy bytes remain"
        )
    M = _dct_matrix()
    planes = []
    for c in scan:
        cw, ch = mcus_x * c["h"] * 8, mcus_y * c["v"] * 8
        planes.append(np.zeros((ch, cw), dtype=np.float64))
        if c["tq"] not in qtables:
            raise ValueError("malformed JPEG: missing quant table")
        if (0, c["td"]) not in htables or (1, c["ta"]) not in htables:
            raise ValueError("malformed JPEG: missing Huffman table")
    reader = _BitReader(data, pos)
    pred = [0] * len(scan)
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                _expect_restart(reader)
                pred = [0] * len(scan)
            for ci, c in enumerate(scan):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = _decode_block(
                            reader,
                            htables[(0, c["td"])],
                            htables[(1, c["ta"])],
                        )
                        pred[ci] += block[0]
                        blk = np.zeros(64, dtype=np.int32)
                        blk[np.array(ZIGZAG)] = block
                        blk[0] = pred[ci]
                        sp = blk.reshape(8, 8) * qtables[c["tq"]]
                        px = M.T @ sp @ M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_index += 1
    # upsample to full MCU grid, crop, color-convert
    full = []
    for ci, c in enumerate(scan):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return w, h, np.dstack([y, y, y]).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.dstack([r, g, b]), 0, 255).astype(np.uint8)
    return w, h, rgb


def _decode_block(reader, dc_table, ac_table):
    """One block in ZIGZAG order; [0] holds the DC DIFF (caller adds
    the predictor)."""
    out = [0] * 64
    try:
        s = _huff_decode(reader, dc_table)
        diff = _extend(reader.read_bits(s), s) if s else 0
        out[0] = diff
        k = 1
        while k < 64:
            rs = _huff_decode(reader, ac_table)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("malformed JPEG: AC run past block end")
            out[k] = _extend(reader.read_bits(s), s)
            k += 1
    except _MarkerInData as exc:
        raise ValueError(
            f"malformed JPEG: unexpected marker 0x{exc.marker:02x} mid-block"
        ) from exc
    return out


def _expect_restart(reader: _BitReader) -> None:
    reader.byte_align()
    data, pos = reader.data, reader.pos
    if pos + 2 > len(data) or data[pos] != 0xFF or not (0xD0 <= data[pos + 1] <= 0xD7):
        raise ValueError("malformed JPEG: expected restart marker")
    reader.pos = pos + 2


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def jpeg_encode(px, quality: int = 85, subsampling: str = "444") -> bytes:
    """RGB uint8 (h, w, 3) -> baseline JFIF bytes. ``subsampling``:
    '444' (default — best fidelity for the resize path) or '420'."""
    import numpy as np

    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("jpeg_encode expects (h, w, 3) RGB")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = px.shape[:2]
    sub = 2 if subsampling == "420" else 1
    qy = _scaled_qtable(Q_LUM, quality)
    qc = _scaled_qtable(Q_CHROM, quality)
    f = px.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + 128.0
    cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + 128.0
    if sub == 2:
        cb = _box_down2(cb)
        cr = _box_down2(cr)

    M = _dct_matrix()
    wtr = _BitWriter()
    dc_y = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_y = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_c = _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)

    mcu_w = mcu_h = 8 * sub
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    ypad = _pad_to(y, mcus_y * mcu_h, mcus_x * mcu_w)
    cpad_h = mcus_y * 8 if sub == 2 else mcus_y * mcu_h
    cpad_w = mcus_x * 8 if sub == 2 else mcus_x * mcu_w
    cbpad = _pad_to(cb, cpad_h, cpad_w)
    crpad = _pad_to(cr, cpad_h, cpad_w)

    pred = [0, 0, 0]
    zz = np.array(ZIGZAG)

    def emit(plane, my, mx, ci, qt, dct, act):
        block = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - 128.0
        coeffs = M @ block @ M.T
        q = np.round(coeffs / qt).astype(np.int64)
        flat = q.reshape(64)[zz]
        diff = int(flat[0]) - pred[ci]
        pred[ci] = int(flat[0])
        s = _category(diff)
        code, length = dct[s]
        wtr.write(code, length)
        if s:
            v = diff if diff >= 0 else diff + (1 << s) - 1
            wtr.write(v, s)
        run = 0
        last = 63
        while last > 0 and flat[last] == 0:
            last -= 1
        for k in range(1, last + 1):
            v = int(flat[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = act[0xF0]  # ZRL
                wtr.write(code, length)
                run -= 16
            s = _category(v)
            code, length = act[(run << 4) | s]
            wtr.write(code, length)
            ev = v if v >= 0 else v + (1 << s) - 1
            wtr.write(ev, s)
            run = 0
        if last < 63:
            code, length = act[0x00]  # EOB
            wtr.write(code, length)

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(sub):
                for bx in range(sub):
                    emit(ypad, my * sub + by, mx * sub + bx, 0, qy, dc_y, ac_y)
            emit(cbpad, my, mx, 1, qc, dc_c, ac_c)
            emit(crpad, my, mx, 2, qc, dc_c, ac_c)
    entropy = wtr.flush()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(qt.reshape(64)[i]) for i in ZIGZAG)
    samp = 0x22 if sub == 2 else 0x11
    out += b"\xff\xc0" + struct.pack(">H", 17) + bytes([8])
    out += struct.pack(">HH", h, w) + bytes([3])
    out += bytes([1, samp, 0, 2, 0x11, 1, 3, 0x11, 1])
    for tc, th, bits, vals in (
        (0, 0, DC_LUM_BITS, DC_LUM_VALS),
        (1, 0, AC_LUM_BITS, AC_LUM_VALS),
        (0, 1, DC_CHROM_BITS, DC_CHROM_VALS),
        (1, 1, AC_CHROM_BITS, AC_CHROM_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">H", 12) + bytes([3])
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def _pad_to(plane, H, W):
    import numpy as np

    h, w = plane.shape
    if h == H and w == W:
        return plane
    out = np.empty((H, W), dtype=plane.dtype)
    out[:h, :w] = plane
    if w < W:
        out[:h, w:] = plane[:, w - 1 : w]
    if h < H:
        out[h:, :] = out[h - 1 : h, :]
    return out


def _box_down2(plane):
    import numpy as np

    h, w = plane.shape
    # pad to even with edge replicate, then 2x2 box average
    if h % 2:
        plane = np.vstack([plane, plane[-1:, :]])
    if w % 2:
        plane = np.hstack([plane, plane[:, -1:]])
    return (
        plane[0::2, 0::2] + plane[1::2, 0::2] + plane[0::2, 1::2] + plane[1::2, 1::2]
    ) / 4.0


def parse_jpeg_header(payload: bytes):
    """(width, height) from the SOF marker only — the cheap metadata
    walk decode_media uses (no entropy decode)."""
    try:
        return _parse_jpeg_header_impl(payload)
    except struct.error as exc:
        raise ValueError(f"malformed JPEG: truncated segment: {exc}") from exc


def _parse_jpeg_header_impl(payload: bytes):
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("malformed JPEG: missing SOI")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("malformed JPEG: expected marker")
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker in (0xC0, 0xC1, 0xC2):
            seg = payload[pos + 4 : pos + 2 + seglen]
            if len(seg) < 5:
                raise ValueError("malformed JPEG: short SOF")
            h, w = struct.unpack(">HH", seg[1:5])
            if w <= 0 or h <= 0:
                raise ValueError("malformed JPEG: non-positive dimensions")
            return w, h
        pos += 2 + seglen
    raise ValueError("malformed JPEG: no SOF marker")
