"""Pure-stdlib VP8 keyframe (intra-frame) decoder — RFC 6386.

This closes the last mainstream still-image gap in the media layer:
lossy WebP (a ``VP8 `` chunk in a RIFF container) is by far the most
common WebP flavor on the web, and until now it probed header-only
(dimensions via media_probe) while pixels needed a codec library.
This module decodes the complete VP8 KEYFRAME path — which is the
entire format for still images, since a lossy WebP is exactly one
VP8 keyframe:

- boolean arithmetic decoder (RFC 6386 section 7)
- uncompressed frame tag + keyframe start code / dimensions (9.1)
- compressed header: segmentation, loop-filter params, token
  partitions, quantizer indices, token probability updates, skip
  probability (9.2-9.11)
- per-macroblock intra modes: 16x16 Y modes, 4x4 B_PRED submodes
  with above/left context, chroma modes (11.2-11.5)
- token/coefficient decoding with band/context modeling and the
  category extra-bit trees (13.2-13.5)
- dequantization incl. the Y2 and chroma special cases (14.1)
- inverse WHT (Y2) and the exact integer inverse DCT (14.3-14.4)
- intra prediction: DC/V/H/TM at 16x16 and 8x8, all ten 4x4
  submodes with the VP8 border conventions (12.2-12.3)
- the normal and simple in-loop deblocking filters with segment /
  mode deltas, interior-limit and high-edge-variance logic (15)

Everything here derives from the public spec; the five large
normative tables live in _vp8_data.py (generated from the system
libwebp by tools/extract_vp8_tables.py — spec data, not code).
Correctness is pinned behaviorally in tests/test_vp8.py: images are
encoded with the REAL libwebp encoder over a sweep of qualities,
sizes and content classes, and this decoder's Y/U/V planes must be
byte-identical to libwebp's own WebPDecodeYUV output — the boolean
coder desynchronizes on any single wrong probability, table byte or
filter decision, so agreement is an end-to-end proof.

Inter-frame features (motion vectors, golden/altref buffers) do not
exist in still images and are out of scope; a non-keyframe stream
raises VP8Error honestly.
"""
from __future__ import annotations

import struct

from goose_parser_spark.ops._vp8_data import (
    AC_QLOOKUP,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
)

__all__ = ["VP8Error", "decode_vp8", "decode_vp8_gray"]


class VP8Error(ValueError):
    """Raised for malformed, truncated or unsupported VP8 streams."""


# ---------------------------------------------------------------------------
# Boolean arithmetic decoder (RFC 6386 section 7.3's exact algorithm)
# ---------------------------------------------------------------------------

class _Bool:
    __slots__ = ("d", "n", "pos", "value", "range", "bits", "over")

    def __init__(self, d: bytes) -> None:
        self.d = d
        self.n = len(d)
        b0 = d[0] if self.n > 0 else 0
        b1 = d[1] if self.n > 1 else 0
        self.value = (b0 << 8) | b1
        self.pos = 2
        self.range = 255
        self.bits = 0
        self.over = 0  # zero bytes fed past the end (bounded)

    def get(self, prob: int) -> int:
        r = self.range
        split = 1 + (((r - 1) * prob) >> 8)
        big = split << 8
        v = self.value
        if v >= big:
            bit = 1
            r -= split
            v -= big
        else:
            bit = 0
            r = split
        bits = self.bits
        while r < 128:
            v <<= 1
            r <<= 1
            bits += 1
            if bits == 8:
                bits = 0
                if self.pos < self.n:
                    v |= self.d[self.pos]
                else:
                    self.over += 1
                    if self.over > 64:
                        raise VP8Error("bool decoder ran off the "
                                       "end of the partition")
                self.pos += 1
        self.value = v
        self.range = r
        self.bits = bits
        return bit

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.get(128) else v

    def tree(self, tree: tuple, probs) -> int:
        i = tree[self.get(probs[0])]
        while i > 0:
            i = tree[i + self.get(probs[i >> 1])]
        return -i


# ---------------------------------------------------------------------------
# Normative trees and small constant tables (RFC 6386 sections 11 and 13)
# ---------------------------------------------------------------------------

# 16x16 luma modes; B_PRED (4) switches the MB to 4x4 submodes.
_DC, _V, _H, _TM, _B_PRED = 0, 1, 2, 3, 4
_KF_YMODE_TREE = (-_B_PRED, 2, 4, 6, -_DC, -_V, -_H, -_TM)
_KF_YMODE_PROBS = (145, 156, 163, 128)
_UV_TREE = (-_DC, 2, -_V, 4, -_H, -_TM)
_KF_UV_PROBS = (142, 114, 183)
# 4x4 submodes 0..9: DC,TM,VE,HE,LD,RD,VR,VL,HD,HU
_BMODE_TREE = (0, 2, -1, 4, -2, 6, 8, 12, -3, 10,
               -5, -6, -4, 14, -7, 16, -8, -9)
# 16x16 mode -> equivalent submode for keyframe bmode context
_MODE_TO_SUB = (0, 2, 3, 1)  # DC->B_DC, V->B_VE, H->B_HE, TM->B_TM
_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

# DCT value categories: (probabilities, base value)
_CATS = (
    ((159,), 5),
    ((165, 145), 7),
    ((173, 148, 140), 11),
    ((176, 155, 140, 135), 19),
    ((180, 157, 141, 134, 130), 35),
    ((254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129), 67),
)


def _nested_probs(flat: bytes) -> list:
    """[4][8][3] -> mutable 11-entry probability rows."""
    out = []
    k = 0
    for _t in range(4):
        bands = []
        for _b in range(8):
            ctxs = []
            for _c in range(3):
                ctxs.append(list(flat[k:k + 11]))
                k += 11
            bands.append(ctxs)
        out.append(bands)
    return out


def _clamp_q(i: int, hi: int = 127) -> int:
    return 0 if i < 0 else hi if i > hi else i


# ---------------------------------------------------------------------------
# Inverse transforms (RFC 6386 section 14.3/14.4, exact integer math)
# ---------------------------------------------------------------------------

def _iwht4x4(ip: list) -> list:
    """Inverse Walsh-Hadamard for the Y2 block; output[i] is the DC
    coefficient of luma subblock i (raster order)."""
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


_C1 = 20091  # cos(pi/8)*sqrt(2) - 1, Q16
_C2 = 35468  # sin(pi/8)*sqrt(2),     Q16


def _idct4x4(ip: list) -> list:
    """The exact VP8 integer inverse DCT (python's >> on negatives is
    arithmetic, matching the spec's two's-complement shifts)."""
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * _C2) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * _C1) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * _C1) >> 16)
        t2 = (ip[12 + i] * _C2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * _C2) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * _C1) >> 16)
        t2 = (tmp[r + 3] * _C2) >> 16
        d1 = t1 + t2
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


# ---------------------------------------------------------------------------
# Header parsing
# ---------------------------------------------------------------------------

class _Frame:
    """Parsed frame-level state shared by the MB loops."""
    __slots__ = (
        "w", "h", "mb_w", "mb_h", "probs", "partitions",
        "seg_enabled", "seg_update_map", "seg_abs", "seg_tree_probs",
        "seg_quant", "seg_lf",
        "filter_simple", "filter_level", "sharpness",
        "lf_delta_enabled", "ref_lf_delta", "mode_lf_delta",
        "q_index", "y1dc", "y1ac", "y2dc", "y2ac", "uvdc", "uvac",
        "skip_enabled", "skip_prob",
    )


def _parse_header(data: bytes) -> tuple[_Frame, _Bool]:
    if len(data) < 10:
        raise VP8Error("truncated VP8 stream")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise VP8Error("not a keyframe (inter frames need reference "
                       "buffers; still images are always keyframes)")
    version = (tag >> 1) & 7
    if version > 3:
        raise VP8Error(f"unknown VP8 profile {version}")
    part0_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise VP8Error("bad keyframe start code")
    w16, h16 = struct.unpack_from("<HH", data, 6)
    f = _Frame()
    f.w = w16 & 0x3FFF
    f.h = h16 & 0x3FFF
    if f.w == 0 or f.h == 0:
        raise VP8Error("zero frame dimension")
    f.mb_w = (f.w + 15) >> 4
    f.mb_h = (f.h + 15) >> 4
    if 10 + part0_size > len(data):
        raise VP8Error("first partition overruns the stream")
    br = _Bool(data[10:10 + part0_size])

    br.get(128)  # color space (0 = YCbCr as specified)
    br.get(128)  # clamping type (reconstruction is clamped anyway)

    # --- segmentation (RFC 9.3) ---
    f.seg_quant = [0, 0, 0, 0]
    f.seg_lf = [0, 0, 0, 0]
    f.seg_abs = False
    f.seg_tree_probs = [255, 255, 255]
    f.seg_update_map = False
    f.seg_enabled = bool(br.get(128))
    if f.seg_enabled:
        f.seg_update_map = bool(br.get(128))
        update_data = br.get(128)
        if update_data:
            f.seg_abs = bool(br.get(128))
            for i in range(4):
                if br.get(128):
                    f.seg_quant[i] = br.signed_literal(7)
            for i in range(4):
                if br.get(128):
                    f.seg_lf[i] = br.signed_literal(6)
        if f.seg_update_map:
            for i in range(3):
                f.seg_tree_probs[i] = br.literal(8) if br.get(128) \
                    else 255

    # --- loop filter (RFC 9.4) ---
    f.filter_simple = bool(br.get(128))
    f.filter_level = br.literal(6)
    f.sharpness = br.literal(3)
    f.lf_delta_enabled = bool(br.get(128))
    f.ref_lf_delta = [0, 0, 0, 0]
    f.mode_lf_delta = [0, 0, 0, 0]
    if f.lf_delta_enabled:
        if br.get(128):  # deltas updated this frame
            for i in range(4):
                if br.get(128):
                    f.ref_lf_delta[i] = br.signed_literal(6)
            for i in range(4):
                if br.get(128):
                    f.mode_lf_delta[i] = br.signed_literal(6)

    # --- token partitions (RFC 9.5) ---
    n_parts = 1 << br.literal(2)
    rest = data[10 + part0_size:]
    f.partitions = []
    if n_parts > 1:
        sizes = rest[:3 * (n_parts - 1)]
        if len(sizes) < 3 * (n_parts - 1):
            raise VP8Error("truncated partition size table")
        ofs = 3 * (n_parts - 1)
        for i in range(n_parts - 1):
            sz = sizes[3 * i] | (sizes[3 * i + 1] << 8) | \
                (sizes[3 * i + 2] << 16)
            if ofs + sz > len(rest):
                raise VP8Error("token partition overruns the stream")
            f.partitions.append(_Bool(rest[ofs:ofs + sz]))
            ofs += sz
        f.partitions.append(_Bool(rest[ofs:]))
    else:
        f.partitions.append(_Bool(rest))

    # --- quantizer indices (RFC 9.6) ---
    f.q_index = br.literal(7)
    y1dc_d = br.signed_literal(4) if br.get(128) else 0
    y2dc_d = br.signed_literal(4) if br.get(128) else 0
    y2ac_d = br.signed_literal(4) if br.get(128) else 0
    uvdc_d = br.signed_literal(4) if br.get(128) else 0
    uvac_d = br.signed_literal(4) if br.get(128) else 0

    def quants(q: int) -> tuple:
        y1dc = DC_QLOOKUP[_clamp_q(q + y1dc_d)]
        y1ac = AC_QLOOKUP[_clamp_q(q)]
        y2dc = DC_QLOOKUP[_clamp_q(q + y2dc_d)] * 2
        y2ac = AC_QLOOKUP[_clamp_q(q + y2ac_d)] * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = DC_QLOOKUP[_clamp_q(q + uvdc_d, 117)]
        uvac = AC_QLOOKUP[_clamp_q(q + uvac_d)]
        return y1dc, y1ac, y2dc, y2ac, uvdc, uvac

    # per-segment quantizers (segment 0 == frame-level when disabled)
    f.y1dc, f.y1ac, f.y2dc, f.y2ac, f.uvdc, f.uvac = \
        [], [], [], [], [], []
    for s in range(4):
        if f.seg_enabled:
            q = f.seg_quant[s] if f.seg_abs \
                else f.q_index + f.seg_quant[s]
            q = _clamp_q(q)
        else:
            q = f.q_index
        a, b, c, d, e, g = quants(q)
        f.y1dc.append(a)
        f.y1ac.append(b)
        f.y2dc.append(c)
        f.y2ac.append(d)
        f.uvdc.append(e)
        f.uvac.append(g)

    br.get(128)  # refresh entropy probs (meaningless for one frame)

    # --- token probability updates (RFC 13.4) ---
    f.probs = _nested_probs(COEFF_PROBS)
    up = COEFF_UPDATE_PROBS
    k = 0
    for t in range(4):
        for b in range(8):
            for c in range(3):
                row = f.probs[t][b][c]
                for p in range(11):
                    if br.get(up[k]):
                        row[p] = br.literal(8)
                    k += 1

    # --- macroblock skip flag (RFC 9.10) ---
    f.skip_enabled = bool(br.get(128))
    f.skip_prob = br.literal(8) if f.skip_enabled else 0
    return f, br


# ---------------------------------------------------------------------------
# Coefficient decoding (RFC 13.2/13.3)
# ---------------------------------------------------------------------------

def _get_coeffs(br: _Bool, type_probs, ctx: int, dq: tuple,
                first: int, out: list) -> int:
    """Decode one 4x4 block's coefficients into ``out`` (raster
    order, dequantized). Returns 1 + the scan position of the last
    nonzero coefficient, or ``first`` if the block is empty."""
    n = first
    p = type_probs[_BANDS[n]][ctx]
    get = br.get
    while True:
        if not get(p[0]):  # end of block
            return n
        # zero run: after a zero, EOB cannot follow (skip p[0])
        while not get(p[1]):
            n += 1
            if n == 16:
                return 16
            p = type_probs[_BANDS[n]][0]
        # nonzero value
        if not get(p[2]):
            v = 1
            nctx = 1
        else:
            nctx = 2
            if not get(p[3]):
                if not get(p[4]):
                    v = 2
                else:
                    v = 3 + get(p[5])
            elif not get(p[6]):
                if not get(p[7]):
                    v = 5 + get(159)
                else:
                    v = 7 + 2 * get(165) + get(145)
            else:
                cat = 2 * get(p[8])
                cat += get(p[9 + (cat >> 1)])
                probs_cat, base = _CATS[2 + cat]
                extra = 0
                for cp in probs_cat:
                    extra = (extra << 1) | get(cp)
                v = base + extra
        if get(128):  # sign
            v = -v
        out[_ZIGZAG[n]] = v * dq[n > 0]
        n += 1
        if n == 16:
            return 16
        p = type_probs[_BANDS[n]][nctx]


# ---------------------------------------------------------------------------
# Intra prediction (RFC 12.2/12.3)
# ---------------------------------------------------------------------------

def _clamp255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _pred_mb(plane: bytearray, stride: int, x: int, y: int,
             size: int, mode: int) -> list:
    """16x16 / 8x8 whole-macroblock prediction. Returns a flat
    size*size list. Border conventions: off-frame above = 127,
    off-frame left = 129 (above wins at the corner)."""
    has_a = y > 0
    has_l = x > 0
    if has_a:
        base = (y - 1) * stride + x
        above = list(plane[base:base + size])
    else:
        above = [127] * size
    if has_l:
        left = [plane[(y + j) * stride + x - 1] for j in range(size)]
    else:
        left = [129] * size
    if mode == _V:
        return above * size
    if mode == _H:
        out = []
        for j in range(size):
            out.extend([left[j]] * size)
        return out
    if mode == _TM:
        p = 127 if not has_a else (129 if not has_l
                                   else plane[(y - 1) * stride + x - 1])
        out = []
        for j in range(size):
            lj = left[j] - p
            out.extend([_clamp255(lj + a) for a in above])
        return out
    # DC
    if has_a and has_l:
        dc = (sum(above) + sum(left) + size) >> \
            (5 if size == 16 else 4)
    elif has_a:
        dc = (sum(above) + (size >> 1)) >> (4 if size == 16 else 3)
    elif has_l:
        dc = (sum(left) + (size >> 1)) >> (4 if size == 16 else 3)
    else:
        dc = 128
    return [dc] * (size * size)


def _avg2(a: int, b: int) -> int:
    return (a + b + 1) >> 1


def _avg3(a: int, b: int, c: int) -> int:
    return (a + 2 * b + c + 2) >> 2


def _pred_b(mode: int, a: list, left: list, p: int) -> list:
    """One 4x4 submode prediction. ``a`` holds the 8 above pixels
    (incl. above-right), ``left`` the 4 left pixels, ``p`` the
    above-left corner. Returns 16 pixels, raster order."""
    if mode == 0:  # B_DC
        dc = (sum(a[:4]) + sum(left) + 4) >> 3
        return [dc] * 16
    if mode == 1:  # B_TM
        out = []
        for j in range(4):
            lj = left[j] - p
            out.extend([_clamp255(lj + a[i]) for i in range(4)])
        return out
    if mode == 2:  # B_VE: 3-tap smoothed vertical
        row = [_avg3(p, a[0], a[1]), _avg3(a[0], a[1], a[2]),
               _avg3(a[1], a[2], a[3]), _avg3(a[2], a[3], a[4])]
        return row * 4
    if mode == 3:  # B_HE: 3-tap smoothed horizontal
        vals = [_avg3(p, left[0], left[1]),
                _avg3(left[0], left[1], left[2]),
                _avg3(left[1], left[2], left[3]),
                _avg3(left[2], left[3], left[3])]
        out = []
        for v in vals:
            out.extend([v] * 4)
        return out
    if mode == 4:  # B_LD: down-left diagonal
        out = [0] * 16
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    out[4 * r + c] = _avg3(a[i], a[i + 1], a[i + 2])
                else:
                    out[4 * r + c] = _avg3(a[6], a[7], a[7])
        return out
    # modes 5..9 share the edge array E = L3 L2 L1 L0 P A0 A1 A2 A3
    e = [left[3], left[2], left[1], left[0], p,
         a[0], a[1], a[2], a[3]]
    out = [0] * 16
    if mode == 5:  # B_RD: down-right diagonal
        for r in range(4):
            for c in range(4):
                i = 1 + c - r
                out[4 * r + c] = _avg3(e[i + 2], e[i + 3], e[i + 4])
        return out
    if mode == 6:  # B_VR: vertical-right (RFC 12.3 geometry)
        x = e
        out = [
            _avg2(x[4], x[5]), _avg2(x[5], x[6]),
            _avg2(x[6], x[7]), _avg2(x[7], x[8]),
            _avg3(x[3], x[4], x[5]), _avg3(x[4], x[5], x[6]),
            _avg3(x[5], x[6], x[7]), _avg3(x[6], x[7], x[8]),
            _avg3(x[2], x[3], x[4]), _avg2(x[4], x[5]),
            _avg2(x[5], x[6]), _avg2(x[6], x[7]),
            _avg3(x[1], x[2], x[3]), _avg3(x[3], x[4], x[5]),
            _avg3(x[4], x[5], x[6]), _avg3(x[5], x[6], x[7]),
        ]
        return out
    if mode == 7:  # B_VL: vertical-left (uses above incl. a-right)
        out = [
            _avg2(a[0], a[1]), _avg2(a[1], a[2]),
            _avg2(a[2], a[3]), _avg2(a[3], a[4]),
            _avg3(a[0], a[1], a[2]), _avg3(a[1], a[2], a[3]),
            _avg3(a[2], a[3], a[4]), _avg3(a[3], a[4], a[5]),
            _avg2(a[1], a[2]), _avg2(a[2], a[3]),
            _avg2(a[3], a[4]), _avg3(a[4], a[5], a[6]),
            _avg3(a[1], a[2], a[3]), _avg3(a[2], a[3], a[4]),
            _avg3(a[3], a[4], a[5]), _avg3(a[5], a[6], a[7]),
        ]
        return out
    if mode == 8:  # B_HD: horizontal-down
        x = e
        out = [
            _avg2(x[3], x[4]), _avg3(x[3], x[4], x[5]),
            _avg3(x[4], x[5], x[6]), _avg3(x[5], x[6], x[7]),
            _avg2(x[2], x[3]), _avg3(x[2], x[3], x[4]),
            _avg2(x[3], x[4]), _avg3(x[3], x[4], x[5]),
            _avg2(x[1], x[2]), _avg3(x[1], x[2], x[3]),
            _avg2(x[2], x[3]), _avg3(x[2], x[3], x[4]),
            _avg2(x[0], x[1]), _avg3(x[0], x[1], x[2]),
            _avg2(x[1], x[2]), _avg3(x[1], x[2], x[3]),
        ]
        return out
    # mode 9: B_HU: horizontal-up
    ll = left
    out = [
        _avg2(ll[0], ll[1]), _avg3(ll[0], ll[1], ll[2]),
        _avg2(ll[1], ll[2]), _avg3(ll[1], ll[2], ll[3]),
        _avg2(ll[1], ll[2]), _avg3(ll[1], ll[2], ll[3]),
        _avg2(ll[2], ll[3]), _avg3(ll[2], ll[3], ll[3]),
        _avg2(ll[2], ll[3]), _avg3(ll[2], ll[3], ll[3]),
        ll[3], ll[3],
        ll[3], ll[3], ll[3], ll[3],
    ]
    return out


# ---------------------------------------------------------------------------
# Loop filter (RFC 6386 section 15)
# ---------------------------------------------------------------------------

def _c128(v: int) -> int:
    return -128 if v < -128 else 127 if v > 127 else v


def _filter_px(plane: bytearray, idx: int, step: int, mb_edge: bool,
               limit: int, ilimit: int, hev_t: int) -> None:
    """Filter one length-8 pixel segment across an edge. ``idx`` is
    the offset of q0; p-side pixels sit at idx-step*k."""
    p3 = plane[idx - 4 * step]
    p2 = plane[idx - 3 * step]
    p1 = plane[idx - 2 * step]
    p0 = plane[idx - step]
    q0 = plane[idx]
    q1 = plane[idx + step]
    q2 = plane[idx + 2 * step]
    q3 = plane[idx + 3 * step]
    if (abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) > limit or
            abs(p3 - p2) > ilimit or abs(p2 - p1) > ilimit or
            abs(p1 - p0) > ilimit or abs(q1 - q0) > ilimit or
            abs(q2 - q1) > ilimit or abs(q3 - q2) > ilimit):
        return
    hev = abs(p1 - p0) > hev_t or abs(q1 - q0) > hev_t
    P2, P1, P0 = p2 - 128, p1 - 128, p0 - 128
    Q0, Q1, Q2 = q0 - 128, q1 - 128, q2 - 128
    if mb_edge and not hev:
        w = _c128(_c128(P1 - Q1) + 3 * (Q0 - P0))
        a = (27 * w + 63) >> 7
        Q0 = _c128(Q0 - a)
        P0 = _c128(P0 + a)
        a = (18 * w + 63) >> 7
        Q1 = _c128(Q1 - a)
        P1 = _c128(P1 + a)
        a = (9 * w + 63) >> 7
        Q2 = _c128(Q2 - a)
        P2 = _c128(P2 + a)
        plane[idx - 3 * step] = P2 + 128
        plane[idx + 2 * step] = Q2 + 128
    else:
        a = 3 * (Q0 - P0)
        if hev:
            a += _c128(P1 - Q1)
        a = _c128(a)
        f1 = _c128(a + 4) >> 3
        f2 = _c128(a + 3) >> 3
        Q0 = _c128(Q0 - f1)
        P0 = _c128(P0 + f2)
        if not hev:
            a = (f1 + 1) >> 1
            Q1 = _c128(Q1 - a)
            P1 = _c128(P1 + a)
    plane[idx - 2 * step] = P1 + 128
    plane[idx - step] = P0 + 128
    plane[idx] = Q0 + 128
    plane[idx + step] = Q1 + 128


def _filter_px_simple(plane: bytearray, idx: int, step: int,
                      limit: int) -> None:
    p1 = plane[idx - 2 * step]
    p0 = plane[idx - step]
    q0 = plane[idx]
    q1 = plane[idx + step]
    if abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) > limit:
        return
    P1, P0, Q0, Q1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
    a = _c128(_c128(P1 - Q1) + 3 * (Q0 - P0))
    f1 = _c128(a + 4) >> 3
    f2 = _c128(a + 3) >> 3
    plane[idx] = _c128(Q0 - f1) + 128
    plane[idx - step] = _c128(P0 + f2) + 128


def _filter_edge(plane: bytearray, stride: int, x: int, y: int,
                 n: int, vertical: bool, mb_edge: bool, limit: int,
                 ilimit: int, hev_t: int) -> None:
    """Filter an n-pixel-long edge; vertical=True means a vertical
    edge (horizontal filtering), q0 column at x / row at y."""
    if vertical:
        for j in range(n):
            _filter_px(plane, (y + j) * stride + x, 1, mb_edge,
                       limit, ilimit, hev_t)
    else:
        for i in range(n):
            _filter_px(plane, y * stride + x + i, stride, mb_edge,
                       limit, ilimit, hev_t)


# ---------------------------------------------------------------------------
# Main decode
# ---------------------------------------------------------------------------

def decode_vp8(data: bytes, max_pixels: int = 1 << 24,
               stats: dict | None = None
               ) -> tuple[int, int, bytes, bytes, bytes]:
    """Decode a VP8 keyframe bitstream (the payload of a ``VP8 ``
    chunk) to ``(width, height, y_plane, u_plane, v_plane)``. The Y
    plane is width*height; U/V are ceil(w/2)*ceil(h/2) (4:2:0).
    ``stats``, if given, collects which bitstream features the frame
    exercised (tests use it to prove the fixture sweep covers every
    mode/filter/partition path)."""
    f, br = _parse_header(data)
    if f.w * f.h > max_pixels:
        raise VP8Error("frame exceeds the decode pixel budget")
    mb_w, mb_h = f.mb_w, f.mb_h

    # ---- pass 1: per-MB prediction records from partition 0 ----
    seg_ids = [0] * (mb_w * mb_h)
    skips = [False] * (mb_w * mb_h)
    ymodes = [0] * (mb_w * mb_h)
    uvmodes = [0] * (mb_w * mb_h)
    bmodes: list = [None] * (mb_w * mb_h)
    above_sub = [[0, 0, 0, 0] for _ in range(mb_w)]
    tp = f.seg_tree_probs
    for mby in range(mb_h):
        left_sub = [0, 0, 0, 0]
        for mbx in range(mb_w):
            i = mby * mb_w + mbx
            if f.seg_update_map:
                seg_ids[i] = br.tree(_SEGMENT_TREE, tp)
            if f.skip_enabled:
                skips[i] = bool(br.get(f.skip_prob))
            ym = br.tree(_KF_YMODE_TREE, _KF_YMODE_PROBS)
            ymodes[i] = ym
            if ym == _B_PRED:
                subs = [0] * 16
                asub = above_sub[mbx]
                for r in range(4):
                    lmode = left_sub[r]
                    for c in range(4):
                        amode = subs[(r - 1) * 4 + c] if r > 0 \
                            else asub[c]
                        k = (amode * 10 + lmode) * 9
                        probs = KF_BMODE_PROBS[k:k + 9]
                        m = br.tree(_BMODE_TREE, probs)
                        subs[r * 4 + c] = m
                        lmode = m
                    left_sub[r] = lmode
                bmodes[i] = subs
                above_sub[mbx] = subs[12:16]
            else:
                sub = _MODE_TO_SUB[ym]
                above_sub[mbx] = [sub] * 4
                left_sub = [sub] * 4
            uvmodes[i] = br.tree(_UV_TREE, _KF_UV_PROBS)

    # ---- pass 2: residuals + reconstruction ----
    ys = mb_w * 16
    cs = mb_w * 8
    Y = bytearray(ys * mb_h * 16)
    U = bytearray(cs * mb_h * 8)
    V = bytearray(cs * mb_h * 8)

    # nonzero contexts: per MB column above / per MB left
    top_nz = [[0] * 9 for _ in range(mb_w)]  # 4 luma, 2 u, 2 v, y2
    any_coeffs = [False] * (mb_w * mb_h)
    probs = f.probs
    zero16 = [0] * 16

    for mby in range(mb_h):
        token_br = f.partitions[mby % len(f.partitions)]
        left_nz = [0] * 9
        for mbx in range(mb_w):
            i = mby * mb_w + mbx
            seg = seg_ids[i]
            ym = ymodes[i]
            has_y2 = ym != _B_PRED
            tnz = top_nz[mbx]
            coeffs = None
            if skips[i]:
                left_nz[0] = left_nz[1] = left_nz[2] = left_nz[3] = 0
                left_nz[4] = left_nz[5] = 0
                left_nz[6] = left_nz[7] = 0
                tnz[0] = tnz[1] = tnz[2] = tnz[3] = 0
                tnz[4] = tnz[5] = tnz[6] = tnz[7] = 0
                if has_y2:
                    left_nz[8] = tnz[8] = 0
            else:
                coeffs = [zero16[:] for _ in range(25)]
                got_nz = False
                if has_y2:
                    ctx = left_nz[8] + tnz[8]
                    dq = (f.y2dc[seg], f.y2ac[seg])
                    n = _get_coeffs(token_br, probs[1], ctx, dq, 0,
                                    coeffs[24])
                    nz = 1 if n > 0 else 0
                    left_nz[8] = tnz[8] = nz
                    got_nz = got_nz or nz
                    first = 1
                    ltype = 0
                else:
                    first = 0
                    ltype = 3
                dqy = (f.y1dc[seg], f.y1ac[seg])
                tprobs = probs[ltype]
                for r in range(4):
                    lnz = left_nz[r]
                    for c in range(4):
                        ctx = lnz + tnz[c]
                        n = _get_coeffs(token_br, tprobs, ctx, dqy,
                                        first, coeffs[r * 4 + c])
                        lnz = tnz[c] = 1 if n > first else 0
                        got_nz = got_nz or lnz
                    left_nz[r] = lnz
                dquv = (f.uvdc[seg], f.uvac[seg])
                cprobs = probs[2]
                for pl in range(2):  # u, v
                    boff = 16 + pl * 4
                    for r in range(2):
                        lnz = left_nz[4 + pl * 2 + r]
                        for c in range(2):
                            ti = 4 + pl * 2 + c
                            ctx = lnz + tnz[ti]
                            n = _get_coeffs(token_br, cprobs, ctx,
                                            dquv, 0,
                                            coeffs[boff + r * 2 + c])
                            lnz = tnz[ti] = 1 if n > 0 else 0
                            got_nz = got_nz or lnz
                        left_nz[4 + pl * 2 + r] = lnz
                any_coeffs[i] = got_nz
                if has_y2:
                    dcs = _iwht4x4(coeffs[24])
                    for b in range(16):
                        coeffs[b][0] = dcs[b]

            # ---- reconstruction ----
            x0, y0 = mbx * 16, mby * 16
            if ym == _B_PRED:
                subs = bmodes[i]
                # above-right of the MB, reused by every row-3 block
                if mby > 0:
                    if mbx < mb_w - 1:
                        base = (y0 - 1) * ys + x0 + 16
                        ar_mb = list(Y[base:base + 4])
                    else:
                        px = Y[(y0 - 1) * ys + x0 + 15]
                        ar_mb = [px] * 4
                else:
                    ar_mb = [127] * 4
                for r in range(4):
                    by = y0 + r * 4
                    for c in range(4):
                        bx = x0 + c * 4
                        # above pixels + above-right
                        if by > 0:
                            base = (by - 1) * ys + bx
                            a4 = list(Y[base:base + 4])
                            if c == 3:
                                ar = ar_mb
                            elif bx + 8 <= ys:
                                ar = list(Y[base + 4:base + 8])
                            else:
                                ar = [127] * 4
                        else:
                            a4 = [127] * 4
                            ar = [127] * 4
                        a = a4 + ar
                        if bx > 0:
                            left = [Y[(by + j) * ys + bx - 1]
                                    for j in range(4)]
                        else:
                            left = [129] * 4
                        if by == 0:
                            p = 127
                        elif bx == 0:
                            p = 129
                        else:
                            p = Y[(by - 1) * ys + bx - 1]
                        pred = _pred_b(subs[r * 4 + c], a, left, p)
                        blk = coeffs[r * 4 + c] if coeffs else None
                        if blk is not None:
                            res = _idct4x4(blk)
                            for j in range(4):
                                ro = (by + j) * ys + bx
                                po = 4 * j
                                for k in range(4):
                                    Y[ro + k] = _clamp255(
                                        pred[po + k] + res[po + k])
                        else:
                            for j in range(4):
                                ro = (by + j) * ys + bx
                                po = 4 * j
                                for k in range(4):
                                    Y[ro + k] = pred[po + k]
            else:
                pred = _pred_mb(Y, ys, x0, y0, 16, ym)
                if coeffs is None:
                    for j in range(16):
                        ro = (y0 + j) * ys + x0
                        po = 16 * j
                        Y[ro:ro + 16] = bytes(pred[po:po + 16])
                else:
                    for r in range(4):
                        for c in range(4):
                            res = _idct4x4(coeffs[r * 4 + c])
                            for j in range(4):
                                ro = (y0 + r * 4 + j) * ys + x0 + c * 4
                                po = 16 * (r * 4 + j) + c * 4
                                so = 4 * j
                                for k in range(4):
                                    Y[ro + k] = _clamp255(
                                        pred[po + k] + res[so + k])
            # chroma
            cx0, cy0 = mbx * 8, mby * 8
            uvm = uvmodes[i]
            for pl, plane in ((0, U), (1, V)):
                pred = _pred_mb(plane, cs, cx0, cy0, 8, uvm)
                if coeffs is None:
                    for j in range(8):
                        ro = (cy0 + j) * cs + cx0
                        po = 8 * j
                        plane[ro:ro + 8] = bytes(pred[po:po + 8])
                else:
                    boff = 16 + pl * 4
                    for r in range(2):
                        for c in range(2):
                            res = _idct4x4(coeffs[boff + r * 2 + c])
                            for j in range(4):
                                ro = (cy0 + r * 4 + j) * cs + \
                                    cx0 + c * 4
                                po = 8 * (r * 4 + j) + c * 4
                                so = 4 * j
                                for k in range(4):
                                    plane[ro + k] = _clamp255(
                                        pred[po + k] + res[so + k])

    # ---- loop filter ----
    if f.filter_level > 0:
        _loop_filter(f, Y, U, V, ys, cs, seg_ids, ymodes, any_coeffs,
                     skips)

    if stats is not None:
        stats["ymodes"] = sorted(set(ymodes))
        stats["uvmodes"] = sorted(set(uvmodes))
        stats["bmodes"] = sorted(
            {m for subs in bmodes if subs for m in subs})
        stats["segments"] = sorted(set(seg_ids))
        stats["seg_enabled"] = f.seg_enabled
        stats["n_partitions"] = len(f.partitions)
        stats["skip_enabled"] = f.skip_enabled
        stats["skipped_mbs"] = sum(skips)
        stats["filter_simple"] = f.filter_simple
        stats["filter_level"] = f.filter_level
        stats["sharpness"] = f.sharpness

    # crop
    w, h = f.w, f.h
    cw, ch = (w + 1) >> 1, (h + 1) >> 1
    yout = b"".join(bytes(Y[r * ys:r * ys + w]) for r in range(h))
    uout = b"".join(bytes(U[r * cs:r * cs + cw]) for r in range(ch))
    vout = b"".join(bytes(V[r * cs:r * cs + cw]) for r in range(ch))
    return w, h, yout, uout, vout


def _loop_filter(f: _Frame, Y: bytearray, U: bytearray,
                 V: bytearray, ys: int, cs: int, seg_ids: list,
                 ymodes: list, any_coeffs: list,
                 skips: list) -> None:
    """In-loop deblocking, macroblocks in raster order: all vertical
    edges of an MB (left MB edge, then interior), then all
    horizontal edges — the spec's in-place order."""
    # per-(segment, is_b_pred) strengths
    strengths = {}
    for seg in range(4):
        if f.seg_enabled:
            base = f.seg_lf[seg] if f.seg_abs \
                else f.filter_level + f.seg_lf[seg]
        else:
            base = f.filter_level
        for b_pred in (False, True):
            level = base
            if f.lf_delta_enabled:
                level += f.ref_lf_delta[0]
                if b_pred:
                    level += f.mode_lf_delta[0]
            level = 0 if level < 0 else 63 if level > 63 else level
            ilimit = level
            if f.sharpness > 0:
                ilimit >>= 2 if f.sharpness > 4 else 1
                if ilimit > 9 - f.sharpness:
                    ilimit = 9 - f.sharpness
            if ilimit < 1:
                ilimit = 1
            hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
            strengths[(seg, b_pred)] = (level, ilimit, hev_t)

    mb_w, mb_h = f.mb_w, f.mb_h
    for mby in range(mb_h):
        for mbx in range(mb_w):
            i = mby * mb_w + mbx
            b_pred = ymodes[i] == _B_PRED
            level, ilimit, hev_t = strengths[(seg_ids[i], b_pred)]
            if level == 0:
                continue
            inner = b_pred or (any_coeffs[i] and not skips[i])
            lim_mb = 2 * level + ilimit + 4
            lim_in = 2 * level + ilimit
            x0, y0 = mbx * 16, mby * 16
            cx0, cy0 = mbx * 8, mby * 8
            if f.filter_simple:
                if mbx > 0:
                    for j in range(16):
                        _filter_px_simple(Y, (y0 + j) * ys + x0, 1,
                                          lim_mb)
                if inner:
                    for dx in (4, 8, 12):
                        for j in range(16):
                            _filter_px_simple(
                                Y, (y0 + j) * ys + x0 + dx, 1, lim_in)
                if mby > 0:
                    for k in range(16):
                        _filter_px_simple(Y, y0 * ys + x0 + k, ys,
                                          lim_mb)
                if inner:
                    for dy in (4, 8, 12):
                        for k in range(16):
                            _filter_px_simple(
                                Y, (y0 + dy) * ys + x0 + k, ys,
                                lim_in)
                continue
            # normal filter
            if mbx > 0:
                _filter_edge(Y, ys, x0, y0, 16, True, True, lim_mb,
                             ilimit, hev_t)
                for p in (U, V):
                    _filter_edge(p, cs, cx0, cy0, 8, True, True,
                                 lim_mb, ilimit, hev_t)
            if inner:
                for dx in (4, 8, 12):
                    _filter_edge(Y, ys, x0 + dx, y0, 16, True, False,
                                 lim_in, ilimit, hev_t)
                for p in (U, V):
                    _filter_edge(p, cs, cx0 + 4, cy0, 8, True, False,
                                 lim_in, ilimit, hev_t)
            if mby > 0:
                _filter_edge(Y, ys, x0, y0, 16, False, True, lim_mb,
                             ilimit, hev_t)
                for p in (U, V):
                    _filter_edge(p, cs, cx0, cy0, 8, False, True,
                                 lim_mb, ilimit, hev_t)
            if inner:
                for dy in (4, 8, 12):
                    _filter_edge(Y, ys, x0, y0 + dy, 16, False,
                                 False, lim_in, ilimit, hev_t)
                for p in (U, V):
                    _filter_edge(p, cs, cx0, cy0 + 4, 8, False,
                                 False, lim_in, ilimit, hev_t)


def decode_vp8_gray(data: bytes,
                    max_pixels: int = 1 << 24) -> tuple:
    """Decode a VP8 keyframe to ``(width, height, gray_pixels)``.
    For lossy WebP the Y plane IS the BT.601 luma the rest of the
    image pipeline uses as gray — no conversion step."""
    w, h, y, _u, _v = decode_vp8(data, max_pixels=max_pixels)
    return w, h, list(y)
