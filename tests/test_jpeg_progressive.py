"""Progressive-JPEG decoder tests (round 6).

Independence: the progressive path must reproduce EXACTLY the pixels
of the baseline path for the same quantized coefficients — and the
baseline path is itself pinned by tests/test_jpeg.py against an
independent float IDCT and hand-crafted byte-aligned fixtures. The
test-side progressive ENCODER below implements T.81 G.1 (successive
approximation + spectral selection encoding, libjpeg-style correction
-bit buffering) independently of the decoder's G.2 logic.
"""

import struct

import pytest

from goose_parser_spark.ops.imagecodec import _jpeg_gray
from tests.test_jpeg import (
    _BitWriter, _canon_codes, _category, _fdct, _pattern, _ZIGZAG,
    encode_jpeg_gray)

# DC categories 0-11 at length 4; AC table with every (run, size),
# all EOBn (r<<4 | 0, incl. 0x00=EOB1 and 0xF0=ZRL) at length 9
_DC_COUNTS = bytes([0, 0, 0, 12] + [0] * 12)
_DC_SYMBOLS = bytes(range(12))
_AC2_SYMBOLS = bytes(sorted(
    [r << 4 for r in range(16)]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]))
_AC2_COUNTS = bytes([0] * 8 + [len(_AC2_SYMBOLS)] + [0] * 7)


class _ProgWriter:
    """Bit emission with libjpeg-style buffered correction bits: the
    buffer flushes right after each emitted symbol (+ its immediate
    value bits), which is exactly the positional order the decoder
    consumes them in."""

    def __init__(self, ac_codes):
        self.bw = _BitWriter()
        self.ac = ac_codes
        self.be: list[int] = []
        self.eobrun = 0

    def sym(self, rs, val=None, nbits=0):
        ln, code = self.ac[rs]
        self.bw.write(code, ln)
        if nbits:
            self.bw.write(val, nbits)
        for b in self.be:
            self.bw.write(b, 1)
        self.be.clear()

    def flush_eobrun(self):
        if self.eobrun == 0:
            return
        e = self.eobrun
        r = e.bit_length() - 1
        self.sym(r << 4, e - (1 << r), r)
        self.eobrun = 0


def _quantize_blocks(width, height, pixels, quant):
    bw, bh = (width + 7) // 8, (height + 7) // 8
    blocks = []
    for by in range(bh):
        for bx in range(bw):
            block = []
            for y in range(8):
                for x in range(8):
                    px = min(bx * 8 + x, width - 1)
                    py = min(by * 8 + y, height - 1)
                    block.append(pixels[py * width + px])
            coef = _fdct(block)
            # zigzag-order quantized coefficients
            blocks.append([int(round(coef[_ZIGZAG[k]] / quant[_ZIGZAG[k]]))
                           for k in range(64)])
    return blocks


def _encode_dc_scan(blocks, dc_codes, ah, al):
    bw = _BitWriter()
    pred = 0
    for blk in blocks:
        if ah == 0:
            v = blk[0] >> al          # arithmetic shift (T.81 DC PT)
            diff = v - pred
            pred = v
            s = _category(diff)
            ln, code = dc_codes[s]
            bw.write(code, ln)
            if s:
                bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        else:
            bw.write((blk[0] >> al) & 1, 1)
    return bw.flush()


def _ac_pt(v, al):
    # AC point transform: magnitude shift, sign preserved (T.81 G.1.2.1)
    t = abs(v) >> al
    return -t if v < 0 else t


def _encode_ac_first(blocks, ac_codes, ss, se, al):
    w = _ProgWriter(ac_codes)
    for blk in blocks:
        vals = [_ac_pt(blk[k], al) for k in range(ss, se + 1)]
        if not any(vals):
            w.eobrun += 1
            if w.eobrun == 0x7FFF:
                w.flush_eobrun()
            continue
        w.flush_eobrun()
        r = 0
        last = max(i for i, v in enumerate(vals) if v)
        for i, v in enumerate(vals[:last + 1]):
            if v == 0:
                r += 1
                continue
            while r > 15:
                w.sym(0xF0)
                r -= 16
            s = _category(v)
            w.sym((r << 4) | s,
                  v if v >= 0 else v + (1 << s) - 1, s)
            r = 0
        if last < len(vals) - 1:
            w.eobrun += 1
    w.flush_eobrun()
    return w.bw.flush()


def _encode_ac_refine(blocks, ac_codes, ss, se, ah, al):
    """Span-accurate refinement encoding: each emitted symbol is
    immediately followed by exactly the correction bits of the span of
    positions the decoder walks for that symbol (T.81 G.2 decode
    order); band tails and fully-EOB blocks buffer their bits on the
    EOB run and flush after the EOBn symbol in block order."""
    w = _ProgWriter(ac_codes)
    for blk in blocks:
        hist = [(abs(blk[k]) >> ah) != 0 for k in range(64)]
        nowb = [(abs(blk[k]) >> al) & 1 for k in range(64)]
        news = [k for k in range(ss, se + 1)
                if not hist[k] and (abs(blk[k]) >> al) == 1]
        if news:
            w.flush_eobrun()
        pos = ss
        for nk in news:
            while True:
                span = range(pos, nk)
                zeros = [k for k in span if not hist[k]]
                if len(zeros) <= 15:
                    break
                z16 = zeros[15]  # position of the ZRL span's 16th zero
                w.sym(0xF0)
                for k in range(pos, z16):
                    if hist[k]:
                        w.bw.write(nowb[k], 1)
                pos = z16 + 1
            span = list(range(pos, nk))
            r = sum(1 for k in span if not hist[k])
            w.sym((r << 4) | 1, 1 if blk[nk] > 0 else 0, 1)
            for k in span:
                if hist[k]:
                    w.bw.write(nowb[k], 1)
            pos = nk + 1
        if pos <= se or not news:
            # band tail (or the whole block) rides on the EOB run
            w.eobrun += 1
            w.be.extend(nowb[k] for k in range(pos, se + 1) if hist[k])
            if w.eobrun == 0x7FFF:
                w.flush_eobrun()
    w.flush_eobrun()
    assert not w.be, "unflushed correction bits at scan end"
    return w.bw.flush()


def encode_jpeg_progressive(width, height, pixels, quant, script):
    """Single-component progressive encoder. ``script`` is a list of
    (kind, ss, se, ah, al) with kind in {'dc','ac'}."""
    dc_codes = _canon_codes(_DC_COUNTS, _DC_SYMBOLS)
    ac_codes = _canon_codes(_AC2_COUNTS, _AC2_SYMBOLS)
    blocks = _quantize_blocks(width, height, pixels, quant)
    zz_quant = bytes(quant[_ZIGZAG[k]] for k in range(64))
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_quant
    out += (b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, height, width, 1)
            + bytes([1, 0x11, 0]))
    out += (b"\xff\xc4" + struct.pack(">H", 19 + len(_DC_SYMBOLS))
            + b"\x00" + _DC_COUNTS + _DC_SYMBOLS)
    out += (b"\xff\xc4" + struct.pack(">H", 19 + len(_AC2_SYMBOLS))
            + b"\x10" + _AC2_COUNTS + _AC2_SYMBOLS)
    for kind, ss, se, ah, al in script:
        if kind == "dc":
            scan = _encode_dc_scan(blocks, dc_codes, ah, al)
        elif ah == 0:
            scan = _encode_ac_first(blocks, ac_codes, ss, se, al)
        else:
            scan = _encode_ac_refine(blocks, ac_codes, ss, se, ah, al)
        out += (b"\xff\xda" + struct.pack(">H", 8)
                + bytes([1, 1, 0x00, ss, se, (ah << 4) | al]) + scan)
    out += b"\xff\xd9"
    return bytes(out)


_FULL_SCRIPT = [
    ("dc", 0, 0, 0, 1), ("dc", 0, 0, 1, 0),
    ("ac", 1, 5, 0, 1), ("ac", 6, 63, 0, 1),
    ("ac", 1, 5, 1, 0), ("ac", 6, 63, 1, 0),
]


def _baseline_pixels(w, h, img, quant):
    return _jpeg_gray(encode_jpeg_gray(w, h, img, quant))


@pytest.mark.parametrize("w,h,seed", [(24, 16, 0), (16, 16, 5),
                                      (13, 9, 2), (40, 8, 7)])
def test_progressive_equals_baseline(w, h, seed):
    img = _pattern(w, h, seed)
    quant = [1 + ((i % 8) + (i // 8)) // 2 for i in range(64)]
    base = _baseline_pixels(w, h, img, quant)
    prog = _jpeg_gray(encode_jpeg_progressive(w, h, img, quant,
                                              _FULL_SCRIPT))
    assert prog == base


def test_progressive_single_full_band_no_refinement():
    w, h = 16, 16
    img = _pattern(w, h, 3)
    quant = [2] * 64
    script = [("dc", 0, 0, 0, 0), ("ac", 1, 63, 0, 0)]
    assert _jpeg_gray(encode_jpeg_progressive(w, h, img, quant, script)) \
        == _baseline_pixels(w, h, img, quant)


def test_progressive_deep_successive_approximation():
    w, h = 16, 8
    img = _pattern(w, h, 11)
    quant = [1] * 64
    script = [
        ("dc", 0, 0, 0, 2), ("dc", 0, 0, 2, 1), ("dc", 0, 0, 1, 0),
        ("ac", 1, 63, 0, 2), ("ac", 1, 63, 2, 1), ("ac", 1, 63, 1, 0),
    ]
    assert _jpeg_gray(encode_jpeg_progressive(w, h, img, quant, script)) \
        == _baseline_pixels(w, h, img, quant)


def test_progressive_eob_runs_over_flat_blocks():
    # mostly-flat image: long multi-block EOB runs in the AC scans
    w, h = 64, 16  # 16 blocks
    img = [100] * (w * h)
    for i in range(8):  # one busy block
        img[(i % 8) * w + i] = 30 + 20 * i
    quant = [3] * 64
    assert _jpeg_gray(encode_jpeg_progressive(w, h, img, quant,
                                              _FULL_SCRIPT)) \
        == _baseline_pixels(w, h, img, quant)


def test_progressive_dimensions_and_crop():
    w, h = 13, 9
    img = _pattern(w, h, 4)
    gw, gh, px = _jpeg_gray(encode_jpeg_progressive(w, h, img, [1] * 64,
                                                    _FULL_SCRIPT))
    assert (gw, gh) == (w, h)
    assert len(px) == w * h


def test_progressive_ycbcr_chroma_scans_skipped():
    """3-component 4:2:0 progressive: interleaved DC scan decodes all
    components' symbols (bit position!), chroma AC scans are skipped
    at the byte level, and gray output equals the single-component
    decode of the same luma."""
    w, h = 16, 16  # one MCU: 4 luma blocks in raster==MCU order
    img = _pattern(w, h, 13)
    quant = [2] * 64
    dc_codes = _canon_codes(_DC_COUNTS, _DC_SYMBOLS)
    ac_codes = _canon_codes(_AC2_COUNTS, _AC2_SYMBOLS)
    blocks = _quantize_blocks(w, h, img, quant)
    # interleaved DC-first scan (Al=0): 4 luma diffs then Cb, Cr zero
    bw = _BitWriter()
    pred = 0
    for blk in blocks:
        v = blk[0]
        diff, pred = v - pred, v
        s = _category(diff)
        ln, code = dc_codes[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    for _chroma in range(2):  # zero diff = category 0
        ln, code = dc_codes[0]
        bw.write(code, ln)
    dc_scan = bw.flush()
    # luma AC full band
    luma_ac = _encode_ac_first(blocks, ac_codes, 1, 63, 0)
    # chroma AC scans: single zero block each -> EOB1
    wz = _ProgWriter(ac_codes)
    wz.eobrun = 1
    wz.flush_eobrun()
    chroma_ac = wz.bw.flush()
    zz_quant = bytes(quant[_ZIGZAG[k]] for k in range(64))
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_quant
    out += (b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)
            + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0])
            + bytes([3, 0x11, 0]))
    out += (b"\xff\xc4" + struct.pack(">H", 19 + len(_DC_SYMBOLS))
            + b"\x00" + _DC_COUNTS + _DC_SYMBOLS)
    out += (b"\xff\xc4" + struct.pack(">H", 19 + len(_AC2_SYMBOLS))
            + b"\x10" + _AC2_COUNTS + _AC2_SYMBOLS)
    out += (b"\xff\xda" + struct.pack(">H", 12)
            + bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0]) + dc_scan)
    out += (b"\xff\xda" + struct.pack(">H", 8)
            + bytes([1, 1, 0x00, 1, 63, 0]) + luma_ac)
    for cs in (2, 3):
        out += (b"\xff\xda" + struct.pack(">H", 8)
                + bytes([1, cs, 0x00, 1, 63, 0]) + chroma_ac)
    out += b"\xff\xd9"
    got = _jpeg_gray(bytes(out))
    want = _jpeg_gray(encode_jpeg_progressive(
        w, h, img, quant, [("dc", 0, 0, 0, 0), ("ac", 1, 63, 0, 0)]))
    assert got == want
