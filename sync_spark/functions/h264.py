"""H.264/AVC metadata decode — SPS header walk, no codec libraries
(SURVEY.md §2.10 multimodal; the video analog of the JPEG/PNG
dims-from-header parses and the MP3 frame walk).

Scope, stated precisely: a spec-correct parse of the public Annex-B
byte-stream framing (start codes, emulation-prevention-byte removal,
NAL headers — ISO/IEC 14496-10 §B.1/§7.3.1) and the sequence
parameter set (§7.3.2.1): exp-Golomb field walk through the
profile-conditional chroma/bit-depth block, pic-order-cnt variants,
frame/MB geometry and frame cropping — yielding the REAL coded
width/height (crop applied with 4:2:0/4:2:2/4:4:4 crop units),
profile, level, and the access-unit (frame) count from slice NALs
with first_mb_in_slice == 0. This is what ffprobe reports for dims
without decoding a single macroblock. Full pixel reconstruction
(CABAC/CAVLC entropy decode + intra/inter prediction + deblocking)
stays behind the documented codec boundary.

Scale posture: a byte walk per payload inside the existing Arrow
``mapInPandas`` media islands — no allocation proportional to video
length beyond the de-escaped SPS (tens of bytes).
"""

from __future__ import annotations


class _BitReader:
    """MSB-first bit reader with exp-Golomb (ue/se) support."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("SPS truncated")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("invalid exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _unescape(rbsp: bytes) -> bytes:
    """Remove emulation-prevention bytes: 00 00 03 -> 00 00."""
    out = bytearray()
    i = 0
    while i < len(rbsp):
        if i + 2 < len(rbsp) and rbsp[i] == 0 and rbsp[i + 1] == 0 and rbsp[i + 2] == 3:
            out += rbsp[i : i + 2]
            i += 3
        else:
            out.append(rbsp[i])
            i += 1
    return bytes(out)


_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}

# (SubWidthC, SubHeightC) per chroma_format_idc; crop units scale by
# these (and by 2 vertically for field coding)
_SUB_WH = {0: (1, 1), 1: (2, 2), 2: (2, 1), 3: (1, 1)}


def parse_sps(sps_rbsp: bytes) -> dict:
    """Parse a (de-escaped) SPS RBSP → {width, height, profile_idc,
    level_idc, chroma_format_idc, frame_mbs_only}. Raises ValueError
    on malformed input."""
    r = _BitReader(sps_rbsp)
    profile_idc = r.u(8)
    r.u(8)  # constraint_set flags + reserved
    level_idc = r.u(8)
    r.ue()  # seq_parameter_set_id
    chroma_format_idc = 1  # 4:2:0 default for non-high profiles
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)  # separate_colour_plane_flag
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            n_lists = 8 if chroma_format_idc != 3 else 12
            for i in range(n_lists):
                if r.u(1):  # seq_scaling_list_present_flag[i]
                    # scaling_list(): delta-coded; walk to stay aligned
                    size = 16 if i < 6 else 64
                    last, nxt = 8, 8
                    for _ in range(size):
                        if nxt != 0:
                            nxt = (last + r.se() + 256) % 256
                        last = nxt if nxt != 0 else last
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)  # delta_pic_order_always_zero_flag
        r.se()  # offset_for_non_ref_pic
        r.se()  # offset_for_top_to_bottom_field
        for _ in range(r.ue()):  # num_ref_frames_in_pic_order_cnt_cycle
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    width_mbs = r.ue() + 1
    height_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    width = width_mbs * 16
    height = (2 - frame_mbs_only) * height_units * 16
    if r.u(1):  # frame_cropping_flag
        left, right, top, bottom = r.ue(), r.ue(), r.ue(), r.ue()
        sub_w, sub_h = _SUB_WH.get(chroma_format_idc, (2, 2))
        crop_x = sub_w if chroma_format_idc in (1, 2) else 1
        crop_y = (sub_h if chroma_format_idc == 1 else 1) * (2 - frame_mbs_only)
        width -= crop_x * (left + right)
        height -= crop_y * (top + bottom)
    if width <= 0 or height <= 0:
        raise ValueError("SPS crop exceeds coded size")
    return {
        "width": width,
        "height": height,
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "chroma_format_idc": chroma_format_idc,
        "frame_mbs_only": frame_mbs_only,
    }


def _nals(annexb: bytes):
    """Yield (nal_type, payload) for each Annex-B NAL unit."""
    i = 0
    n = len(annexb)
    starts = []
    while i + 3 <= n:
        if annexb[i] == 0 and annexb[i + 1] == 0:
            if annexb[i + 2] == 1:
                starts.append(i + 3)
                i += 3
                continue
            if i + 4 <= n and annexb[i + 2] == 0 and annexb[i + 3] == 1:
                starts.append(i + 4)
                i += 4
                continue
        i += 1
    for idx, s in enumerate(starts):
        e = n
        if idx + 1 < len(starts):
            e = starts[idx + 1]
            # strip the next start code (3 or 4 bytes) and trailing zeros
            e -= 4 if annexb[e - 4 : e] == b"\x00\x00\x00\x01" else 3
        if s >= e:
            continue
        header = annexb[s]
        if header & 0x80:
            continue  # forbidden_zero_bit set: not a NAL
        yield header & 0x1F, annexb[s + 1 : e]


def h264_meta(payload: bytes) -> dict:
    """Walk an Annex-B H.264 elementary stream: returns {width,
    height, profile_idc, level_idc, n_frames}. Frames are counted as
    slice NALs (type 1/5) whose first_mb_in_slice == 0 — the start of
    an access unit. Raises ValueError when no SPS is present."""
    sps = None
    n_frames = 0
    for nal_type, body in _nals(payload):
        if nal_type == 7 and sps is None:
            sps = parse_sps(_unescape(body))
        elif nal_type in (1, 5) and body:
            try:
                if _BitReader(_unescape(body[:8])).ue() == 0:
                    n_frames += 1
            except ValueError:
                pass  # truncated slice header: not a counted frame
    if sps is None:
        raise ValueError("no SPS NAL in stream")
    return {**sps, "n_frames": n_frames}


# ---------------------------------------------------------------------------
# Fixture side: a minimal bit-writer producing valid SPS + slice NALs
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        k = v + 1
        n = k.bit_length() - 1
        self.u(0, n)
        self.u(k, n + 1)

    def bytes_aligned(self) -> bytes:
        bits = self.bits + [1]  # rbsp_stop_one_bit
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _escape(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes (00 00 0x → 00 00 03 0x for
    x ≤ 3), the §7.4.1.1 encoder-side rule."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def h264_payload(
    media_id: int,
    width: int = 64,
    height: int = 48,
    n_frames: int = 3,
) -> bytes:
    """Structurally-valid baseline-profile Annex-B fixture: SPS with
    exact cropping for non-MB-multiple dims, PPS, and ``n_frames``
    IDR-ish slice NALs whose headers start with first_mb_in_slice=0
    and whose bodies are media_id-seeded filler (the walk never
    entropy-decodes them)."""
    if width <= 0 or height <= 0:
        raise ValueError("dims must be positive")
    w = _BitWriter()
    w.u(66, 8)  # profile_idc: baseline
    w.u(0, 8)  # constraint flags
    w.u(30, 8)  # level 3.0
    w.ue(0)  # sps id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type = 2 (no extra fields)
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num
    mbs_w = (width + 15) // 16
    mbs_h = (height + 15) // 16
    w.ue(mbs_w - 1)
    w.ue(mbs_h - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(1, 1)  # direct_8x8_inference
    crop_r = (mbs_w * 16 - width) // 2  # 4:2:0 crop unit x = 2
    crop_b = (mbs_h * 16 - height) // 2
    if crop_r or crop_b:
        if (mbs_w * 16 - width) % 2 or (mbs_h * 16 - height) % 2:
            raise ValueError("4:2:0 crop must be even")
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present_flag
    sps = b"\x67" + _escape(w.bytes_aligned())

    p = _BitWriter()
    p.ue(0)  # pps id
    p.ue(0)  # sps id
    p.u(0, 1)  # entropy_coding_mode (CAVLC)
    p.u(0, 1)  # bottom_field_pic_order_in_frame_present
    p.ue(0)  # num_slice_groups_minus1
    p.ue(0)  # num_ref_idx_l0_default_active_minus1
    p.ue(0)  # num_ref_idx_l1_default_active_minus1
    p.u(0, 1)  # weighted_pred_flag
    p.u(0, 2)  # weighted_bipred_idc
    p.ue(0)  # pic_init_qp_minus26 — se(0) and ue(0) share the '1' bit
    p.ue(0)  # pic_init_qs_minus26
    p.ue(0)  # chroma_qp_index_offset
    p.u(0, 1)  # deblocking_filter_control_present
    p.u(0, 1)  # constrained_intra_pred
    p.u(0, 1)  # redundant_pic_cnt_present
    pps = b"\x68" + _escape(p.bytes_aligned())

    out = bytearray(b"\x00\x00\x00\x01" + sps + b"\x00\x00\x00\x01" + pps)
    for i in range(n_frames):
        s = _BitWriter()
        s.ue(0)  # first_mb_in_slice = 0 → new access unit
        s.ue(7)  # slice_type: I (all)
        s.ue(0)  # pps id
        s.u(i % 16, 4)  # frame_num (log2_max_frame_num = 4)
        s.ue(i)  # idr_pic_id (IDR NAL)
        body = bytes(((media_id + i + j) % 251) for j in range(24))
        out += b"\x00\x00\x00\x01" + b"\x65" + _escape(s.bytes_aligned() + body)
    return bytes(out)
