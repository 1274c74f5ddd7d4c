"""Baseline-JPEG decoder tests (round 6).

The decoder under test is pure stdlib (ops/imagecodec._jpeg_gray).
Independence of the checks:

- The integer IDCT is compared against a NAIVE float IDCT written
  here from the T.81 definition (direct double cosine sum) — not a
  re-run of the decoder's own tables.
- The Huffman/bitstream layer is exercised by a test-side ENCODER
  (forward float DCT + quantization + canonical Huffman writer) whose
  only shared artifact with the decoder is the JPEG standard itself;
  decode(encode(img)) must reproduce the image within the known
  quantization error bound.
- A hand-crafted DC-only fixture with a degenerate all-8-bit-code
  Huffman table is byte-aligned by construction, so every scan byte
  is hand-predictable; expected pixels are computed analytically
  (flat block = DC + 128 at q0=8).
"""

import math
import struct

import pytest

from goose_parser_spark.ops.imagecodec import (
    _idct_block, _jpeg_gray, decode_image_gray)


# ---------------------------------------------------------------- helpers

def _naive_idct(coef):
    """Direct T.81 float IDCT reference (O(64^2)), +128, clamp."""
    out = []
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (cu * cv * coef[v * 8 + u]
                          * math.cos((2 * x + 1) * u * math.pi / 16)
                          * math.cos((2 * y + 1) * v * math.pi / 16))
            p = round(s / 4) + 128
            out.append(max(0, min(255, p)))
    return out


def _fdct(pixels):
    """Forward float DCT of one 8x8 block (level-shifted)."""
    coef = []
    for v in range(8):
        for u in range(8):
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += ((pixels[y * 8 + x] - 128)
                          * math.cos((2 * x + 1) * u * math.pi / 16)
                          * math.cos((2 * y + 1) * v * math.pi / 16))
            coef.append(cu * cv * s / 4)
    return coef


_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1s per T.81
        return bytes(self.out)


def _canon_codes(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


# simple self-built tables (NOT Annex K): DC categories 0-11 all at
# length 4; every AC (run, size) symbol + EOB + ZRL at length 9
_DC_COUNTS = bytes([0, 0, 0, 12] + [0] * 12)
_DC_SYMBOLS = bytes(range(12))
_AC_SYMBOLS = bytes(sorted(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]))
_AC_COUNTS = bytes([0] * 8 + [len(_AC_SYMBOLS)] + [0] * 7)


def _category(v):
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _encode_block(bw, qcoef, pred, dc_codes, ac_codes):
    diff = qcoef[0] - pred
    s = _category(diff)
    ln, code = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last = max((k for k in range(1, 64) if qcoef[_ZIGZAG[k]]), default=0)
    for k in range(1, last + 1):
        v = qcoef[_ZIGZAG[k]]
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        ln, code = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        ln, code = ac_codes[0x00]
        bw.write(code, ln)
    return qcoef[0]


def encode_jpeg_gray(width, height, pixels, quant):
    """Minimal single-component baseline JPEG encoder (test-side)."""
    dc_codes = _canon_codes(_DC_COUNTS, _DC_SYMBOLS)
    ac_codes = _canon_codes(_AC_COUNTS, _AC_SYMBOLS)
    bw = _BitWriter()
    pred = 0
    bw_blocks, bh_blocks = (width + 7) // 8, (height + 7) // 8
    for by in range(bh_blocks):
        for bx in range(bw_blocks):
            block = []
            for y in range(8):
                for x in range(8):
                    px = min(bx * 8 + x, width - 1)
                    py = min(by * 8 + y, height - 1)
                    block.append(pixels[py * width + px])
            coef = _fdct(block)
            qcoef = [int(round(coef[i] / quant[i])) for i in range(64)]
            pred = _encode_block(bw, qcoef, pred, dc_codes, ac_codes)
    scan = bw.flush()
    zz_quant = bytes(quant[_ZIGZAG[k]] for k in range(64))
    return (b"\xff\xd8"
            + b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_quant
            + b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1)
            + bytes([1, 0x11, 0])
            + b"\xff\xc4" + struct.pack(">H", 19 + len(_DC_SYMBOLS))
            + b"\x00" + _DC_COUNTS + _DC_SYMBOLS
            + b"\xff\xc4" + struct.pack(">H", 19 + len(_AC_SYMBOLS))
            + b"\x10" + _AC_COUNTS + _AC_SYMBOLS
            + b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
            + scan + b"\xff\xd9")


def _pattern(width, height, seed=0):
    return [(x * 7 + y * 13 + seed * 31 + (x * y) % 11) % 256
            for y in range(height) for x in range(width)]


# ------------------------------------------------------------------ tests

def test_integer_idct_matches_naive_float_reference():
    import random
    rng = random.Random(6)
    for _ in range(40):
        coef = [0] * 64
        for _k in range(rng.randint(1, 20)):
            coef[rng.randrange(64)] = rng.randint(-1024, 1024)
        got = _idct_block(list(coef))
        want = _naive_idct(coef)
        assert all(abs(g - w) <= 1 for g, w in zip(got, want)), (
            coef, got, want)


def test_dc_only_blocks_are_exactly_flat():
    for dc in (-300, -128, -5, 0, 7, 127, 900):
        got = _idct_block([dc * 8] + [0] * 63)
        want = max(0, min(255, dc + 128))
        assert got == [want] * 64, (dc, got[:4])


def test_roundtrip_quality_100_like():
    # quant all-1: decode error bounded by fdct rounding + idct ±1
    w, h = 24, 16
    img = _pattern(w, h)
    data = encode_jpeg_gray(w, h, img, [1] * 64)
    gw, gh, px = _jpeg_gray(data)
    assert (gw, gh) == (w, h)
    worst = max(abs(a - b) for a, b in zip(px, img))
    assert worst <= 3, worst


def test_roundtrip_real_quant_table():
    # a mid-quality table: error bounded by ~max quant step
    quant = [(1 + ((i % 8) + (i // 8))) for i in range(64)]  # 1..15
    w, h = 32, 24
    img = [(128 + 60 * math.sin(x / 3) + 40 * math.cos(y / 2)) // 1
           for y in range(h) for x in range(w)]
    img = [int(max(0, min(255, v))) for v in img]
    data = encode_jpeg_gray(w, h, img, quant)
    gw, gh, px = _jpeg_gray(data)
    assert (gw, gh) == (w, h)
    # energy-bound: mean abs error well under half the max quant step
    mae = sum(abs(a - b) for a, b in zip(px, img)) / len(img)
    assert mae < 8, mae


def test_non_multiple_of_8_crops_padding():
    w, h = 13, 9
    img = _pattern(w, h, seed=2)
    data = encode_jpeg_gray(w, h, img, [1] * 64)
    gw, gh, px = _jpeg_gray(data)
    assert (gw, gh) == (w, h)
    assert len(px) == w * h


def test_handcrafted_dc_only_byte_aligned_fixture():
    """Degenerate all-8-bit-code tables make the scan byte-exact:
    each block is [cat8_code][diff_byte][EOB] = 3 hand-written bytes;
    expected pixels are flat quadrants of cumulative DC + 128."""
    dc_counts = bytes([0] * 7 + [12] + [0] * 8)      # 12 codes, length 8
    dc_syms = bytes(range(12))                       # cat c -> code c
    ac_counts = bytes([0] * 7 + [1] + [0] * 8)       # EOB -> code 0
    ac_syms = bytes([0x00])
    quant = bytes([8] + [1] * 63)                    # q0=8: pixel = DC+128
    diffs = [130, 0x50, 200, 0x10]                   # raw scan bytes
    # category-8 EXTEND: byte >= 128 -> +byte, byte < 128 -> byte-255
    vals = [(b if b >= 128 else b - 255) for b in diffs]
    cums = []
    c = 0
    for v in vals:
        c += v
        cums.append(max(0, min(255, c + 128)))
    scan = b"".join(bytes([8, d, 0]) for d in diffs)
    data = (b"\xff\xd8"
            + b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + quant
            + b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 16, 16, 1)
            + bytes([1, 0x11, 0])
            + b"\xff\xc4" + struct.pack(">H", 19 + 12) + b"\x00"
            + dc_counts + dc_syms
            + b"\xff\xc4" + struct.pack(">H", 19 + 1) + b"\x10"
            + ac_counts + ac_syms
            + b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
            + scan + b"\xff\xd9")
    gw, gh, px = _jpeg_gray(data)
    assert (gw, gh) == (16, 16)
    # blocks raster order: quadrant k flat at cums[k]
    for k, (bx, by) in enumerate([(0, 0), (8, 0), (0, 8), (8, 8)]):
        for y in range(8):
            for x in range(8):
                assert px[(by + y) * 16 + bx + x] == cums[k], (k, x, y)


def test_ycbcr_420_gray_equals_luma():
    """3-component 4:2:0: gray output must equal the decoded Y plane;
    chroma blocks advance the bitstream but are never IDCT'd. Built by
    interleaving the single-component encoder's block stream."""
    w, h = 16, 16
    img = _pattern(w, h, seed=5)
    dc_codes = _canon_codes(_DC_COUNTS, _DC_SYMBOLS)
    ac_codes = _canon_codes(_AC_COUNTS, _AC_SYMBOLS)
    bw = _BitWriter()
    preds = {0: 0, 1: 0, 2: 0}
    # one MCU row x one MCU col of 16x16: Y blocks (0,0)(8,0)(0,8)(8,8)
    # then one Cb block, one Cr block (flat 128 -> all-zero coefs)
    for my in range(h // 16):
        for mx in range(w // 16):
            for by in range(2):
                for bx in range(2):
                    block = [img[(my * 16 + by * 8 + y) * w
                                 + mx * 16 + bx * 8 + x]
                             for y in range(8) for x in range(8)]
                    coef = _fdct(block)
                    q = [int(round(c)) for c in coef]
                    preds[0] = _encode_block(bw, q, preds[0],
                                             dc_codes, ac_codes)
            for comp in (1, 2):
                preds[comp] = _encode_block(bw, [0] * 64, preds[comp],
                                            dc_codes, ac_codes)
    scan = bw.flush()
    quant = bytes([1] * 64)
    data = (b"\xff\xd8"
            + b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + quant
            + b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
            + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
            + b"\xff\xc4" + struct.pack(">H", 19 + len(_DC_SYMBOLS))
            + b"\x00" + _DC_COUNTS + _DC_SYMBOLS
            + b"\xff\xc4" + struct.pack(">H", 19 + len(_AC_SYMBOLS))
            + b"\x10" + _AC_COUNTS + _AC_SYMBOLS
            + b"\xff\xda" + struct.pack(">H", 12)
            + bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
            + scan + b"\xff\xd9")
    gw, gh, px = _jpeg_gray(data)
    assert (gw, gh) == (w, h)
    worst = max(abs(a - b) for a, b in zip(px, img))
    assert worst <= 3, worst


def test_restart_markers():
    w, h = 32, 8  # 4 blocks, restart interval 2 -> one RST0
    img = _pattern(w, h, seed=9)
    dc_codes = _canon_codes(_DC_COUNTS, _DC_SYMBOLS)
    ac_codes = _canon_codes(_AC_COUNTS, _AC_SYMBOLS)
    parts = []
    pred = 0
    bw = _BitWriter()
    for bi in range(4):
        if bi and bi % 2 == 0:
            parts.append(bw.flush())
            parts.append(bytes([0xFF, 0xD0 + (bi // 2 - 1) % 8]))
            bw = _BitWriter()
            pred = 0
        block = [img[y * w + bi * 8 + x] for y in range(8) for x in range(8)]
        q = [int(round(c)) for c in _fdct(block)]
        pred = _encode_block(bw, q, pred, dc_codes, ac_codes)
    parts.append(bw.flush())
    scan = b"".join(parts)
    data = (b"\xff\xd8"
            + b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
            + b"\xff\xdd" + struct.pack(">HH", 4, 2)
            + b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
            + bytes([1, 0x11, 0])
            + b"\xff\xc4" + struct.pack(">H", 19 + len(_DC_SYMBOLS))
            + b"\x00" + _DC_COUNTS + _DC_SYMBOLS
            + b"\xff\xc4" + struct.pack(">H", 19 + len(_AC_SYMBOLS))
            + b"\x10" + _AC_COUNTS + _AC_SYMBOLS
            + b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
            + scan + b"\xff\xd9")
    gw, gh, px = _jpeg_gray(data)
    assert (gw, gh) == (w, h)
    worst = max(abs(a - b) for a, b in zip(px, img))
    assert worst <= 3, worst


def test_progressive_without_scans_rejected():
    # SOF2 alone (no SOS) must still error out cleanly
    data = (b"\xff\xd8" + b"\xff\xc2"
            + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
            + b"\xff\xd9")
    with pytest.raises(ValueError, match="without SOS"):
        _jpeg_gray(data)


def test_unsupported_coding_process_rejected():
    # SOF3 (lossless sequential) is out of scope
    data = (b"\xff\xd8" + b"\xff\xc3"
            + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(ValueError, match="coding process"):
        _jpeg_gray(data)


def test_dispatcher_routes_jpeg():
    img = _pattern(8, 8)
    data = encode_jpeg_gray(8, 8, img, [1] * 64)
    gw, gh, px = decode_image_gray(data)
    assert (gw, gh) == (8, 8)
    assert max(abs(a - b) for a, b in zip(px, img)) <= 3
