"""VP8L (lossless WebP) decoder tests.

Streams are authored with a test-side LSB bit-writer and an
independent canonical-code assigner, exercising: simple (1/2-symbol)
and normal prefix codes, LZ77 backward references (neighborhood map
and absolute distances), the color cache, all four transforms, the
meta prefix (entropy image), the RIFF/VP8X envelopes — and ONE
genuinely external bitstream: the 195-byte VP8L-coded alpha plane
from CPython's own test WebP (Lib/test/test_email/data/python.webp,
PSF-licensed public test data), which libwebp encoded — if any bit
convention (LSB packing, canonical code order, LZ77, cache) were
wrong, parsing 195 foreign bytes to exactly 16x16 samples would fail
with overwhelming probability.
"""

import base64
import struct

import pytest

from goose_parser_spark.ops.imagecodec import (
    _LsbReader,
    _VP8L_DIST,
    _gray,
    _vp8l_canonical,
    _webp_gray,
    decode_alpha_plane,
    decode_image_gray,
)

# The ALPH chunk of CPython's Lib/test/test_email/data/python.webp
# (16x16 logo): header byte = method 1 (VP8L-coded), no filter.
CPYTHON_ALPH = base64.b64decode(
    "ASeiqJEk5XrnGF/n3yqZiJj/dHGN4CYw4uGLdzLIwRFcgysw6LB4FY54UTXBCAwC"
    "T5KgarBVGRzWtm1GL07Gdjy27Xf7rymuIaL/SdH9j5D3ukRJJBs6JZE08xRtDsfT"
    "5RYg9AsUvpDhg7caMp42gn8dKX5Odgj7iJ6zke+Zc0boMoLb+MxIsvdFMH0g/TYX"
    "jCEyVi2l1msjvF3jpVkV1ZyBpNlulnWKGDEPiqosUDT6MILfumtQUim1Lc/pVBQK"
    "AQAA")


class W:
    """LSB-first bit writer mirroring the reader convention."""

    def __init__(self):
        self.bits: list[int] = []

    def b(self, v: int, n: int) -> None:
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def code(self, code: int, n: int) -> None:
        """Emit a prefix code MSB-first (deflate convention)."""
        for i in range(n - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, bit in enumerate(self.bits):
            out[i >> 3] |= bit << (i & 7)
        return bytes(out)


def canon_assign(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """Independent canonical assigner: symbol -> (code, nbits)."""
    out = {}
    code = 0
    prev = 0
    for ln, sym in sorted((ln, s) for s, ln in lengths.items() if ln):
        code <<= ln - prev
        out[sym] = (code, ln)
        code += 1
        prev = ln
    return out


_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16,
             6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def simple1(w: W, sym: int) -> None:
    w.b(1, 1)
    w.b(0, 1)
    w.b(1, 1)
    w.b(sym, 8)


def simple2(w: W, s0: int, s1: int) -> None:
    w.b(1, 1)
    w.b(1, 1)
    w.b(1, 1)
    w.b(s0, 8)
    w.b(s1, 8)


def normal_code(w: W, lengths: dict[int, int], alphabet: int):
    """Write a 'normal' prefix code: per-symbol lengths coded by a
    code-length code, no 16/17/18 repeats (each array entry emitted
    literally). Returns the canonical symbol->(code,nbits) map."""
    w.b(0, 1)  # not simple
    used = sorted({0} | set(lengths.values()))
    if len(used) == 1:
        cl_lengths = {used[0]: 1}
    elif len(used) == 2:
        cl_lengths = {used[0]: 1, used[1]: 1}
    elif len(used) == 3:
        cl_lengths = {used[0]: 1, used[1]: 2, used[2]: 2}
    elif len(used) == 4:
        cl_lengths = {u: 2 for u in used}
    else:
        raise AssertionError("test helper supports <= 4 length values")
    n_cl = max(_CL_ORDER.index(u) for u in cl_lengths) + 1
    assert n_cl >= 4
    w.b(n_cl - 4, 4)
    for i in range(n_cl):
        w.b(cl_lengths.get(_CL_ORDER[i], 0), 3)
    cl_code = canon_assign(cl_lengths)
    w.b(0, 1)  # no explicit max-symbol count
    for s in range(alphabet):
        c, n = cl_code[lengths.get(s, 0)]
        w.code(c, n)
    return canon_assign(lengths)


def vp8l_payload(w_px: int, h_px: int, body: W) -> bytes:
    head = W()
    head.b(w_px - 1, 14)
    head.b(h_px - 1, 14)
    head.b(0, 1)  # alpha hint
    head.b(0, 3)  # version
    head.bits.extend(body.bits)
    return b"\x2f" + head.tobytes()


def wrap_webp(payload: bytes, vp8x: bool = False) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    if vp8x:
        body = struct.pack("<I", 0) + b"\x00\x00\x00\x00\x00\x00"
        chunk = b"VP8X" + struct.pack("<I", len(body)) + body + chunk
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def prologue(w: W, cache_bits: int = 0, transforms: bool = False):
    if not transforms:
        w.b(0, 1)  # no transforms
    if cache_bits:
        w.b(1, 1)
        w.b(cache_bits, 4)
    else:
        w.b(0, 1)
    w.b(0, 1)  # no meta prefix


def test_distance_table_matches_spec_prefix():
    # the first 34 entries of the published neighborhood table
    spec_prefix = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
        (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
        (1, 3), (-1, 3), (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2),
        (-3, 2), (0, 4), (4, 0), (1, 4), (-1, 4), (4, 1), (-4, 1),
        (3, 3), (-3, 3), (2, 4), (-2, 4), (4, 2), (-4, 2)]
    assert _VP8L_DIST[:34] == spec_prefix
    assert len(_VP8L_DIST) == len(set(_VP8L_DIST)) == 120
    # domain pinned to libwebp's kCodeToPlane packing (x = 8 - nibble,
    # nibble 0..15): dx in [-7, 8] — the positive side is WIDER
    assert {d for d, _ in _VP8L_DIST} == set(range(-7, 9))
    assert max(d for d, _ in _VP8L_DIST) == 8
    assert min(d for d, _ in _VP8L_DIST) == -7
    # the seven |dx| = 8 entries all sit on the positive side
    assert sum(1 for d, _ in _VP8L_DIST if abs(d) == 8) == 8
    assert all(d == 8 for d, _ in _VP8L_DIST if abs(d) == 8)


def test_lsb_reader_and_canonical():
    br = _LsbReader(bytes([0b10110100, 0xFF]))
    assert br.read(3) == 0b100
    assert br.read(5) == 0b10110
    assert br.read(4) == 0xF
    t = _vp8l_canonical([2, 2, 2, 2])
    assert t == {(2, 0): 0, (2, 1): 1, (2, 2): 2, (2, 3): 3}
    with pytest.raises(ValueError):
        _vp8l_canonical([1, 1, 1])  # over-subscribed


def _const_body(g, r, b, a=0xFF):
    w = W()
    prologue(w)
    simple1(w, g)
    simple1(w, r)
    simple1(w, b)
    simple1(w, a)
    simple1(w, 0)  # distance code, unused
    return w


def test_constant_color_zero_bit_pixels():
    data = wrap_webp(vp8l_payload(4, 3, _const_body(0x40, 0x30, 0x20)))
    wpx, hpx, gray = _webp_gray(data)
    assert (wpx, hpx) == (4, 3)
    assert gray == [_gray(0x30, 0x40, 0x20)] * 12


def test_dispatcher_and_vp8x_envelope_and_lossy_rejection():
    payload = vp8l_payload(4, 3, _const_body(1, 2, 3))
    assert decode_image_gray(wrap_webp(payload))[0] == 4
    assert decode_image_gray(wrap_webp(payload, vp8x=True))[0] == 4
    lossy = (b"RIFF" + struct.pack("<I", 12 + 8) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(ValueError):
        decode_image_gray(lossy)


def test_two_symbol_simple_code_bit_image():
    w = W()
    prologue(w)
    simple2(w, 0, 255)  # green: bit 0 -> 0, bit 1 -> 255
    simple1(w, 0)
    simple1(w, 0)
    simple1(w, 255)
    simple1(w, 0)
    bits = [0, 1, 1, 0, 1, 0, 0, 1, 1, 1, 0, 0, 0, 0, 1, 1]
    for bit in bits:
        w.b(bit, 1)
    _, _, gray = _webp_gray(wrap_webp(vp8l_payload(8, 2, w)))
    g1 = _gray(0, 255, 0)
    assert gray == [g1 if bit else 0 for bit in bits]


def test_two_symbol_simple_code_is_canonical_not_read_order():
    # symbols written big-first: canonical assignment still gives the
    # SMALLER symbol code 0
    w = W()
    prologue(w)
    simple2(w, 200, 10)  # read order reversed
    simple1(w, 0)
    simple1(w, 0)
    simple1(w, 255)
    simple1(w, 0)
    w.b(0, 1)  # code 0 -> symbol 10
    w.b(1, 1)  # code 1 -> symbol 200
    _, _, gray = _webp_gray(wrap_webp(vp8l_payload(2, 1, w)))
    assert gray == [_gray(0, 10, 0), _gray(0, 200, 0)]


def test_normal_code_and_lz77_neighborhood_distance():
    # 4x1: literal 'A'-green, then a length-3 copy at neighborhood
    # code 2 = (1, 0) -> distance 1
    w = W()
    prologue(w)
    green = normal_code(w, {65: 1, 258: 1}, 280)
    simple1(w, 5)
    simple1(w, 9)
    simple1(w, 255)
    simple1(w, 1)  # distance prefix symbol 1 -> value 2 -> map (1,0)
    w.code(*green[65])
    w.code(*green[258])  # length symbol 258 -> length 3, no extra
    _, _, gray = _webp_gray(wrap_webp(vp8l_payload(4, 1, w)))
    assert gray == [_gray(5, 65, 9)] * 4


def test_lz77_absolute_distance_with_extra_bits():
    # 6x1: literals A, B then a length-4 copy at absolute distance 2
    # (code 122 = prefix symbol 13 + 5 extra bits of 25)
    w = W()
    prologue(w)
    green = normal_code(w, {65: 2, 66: 2, 259: 1}, 280)
    simple1(w, 0)
    simple1(w, 0)
    simple1(w, 255)
    simple1(w, 13)
    w.code(*green[65])
    w.code(*green[66])
    w.code(*green[259])  # length 4
    w.b(25, 5)           # distance extras: 96 + 25 + 1 = 122
    _, _, gray = _webp_gray(wrap_webp(vp8l_payload(6, 1, w)))
    ga, gb = _gray(0, 65, 0), _gray(0, 66, 0)
    assert gray == [ga, gb, ga, gb, ga, gb]


def test_color_cache_roundtrip():
    cache_bits = 4
    px = (0xFF << 24) | (1 << 16) | (2 << 8) | 3
    idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
    w = W()
    prologue(w, cache_bits=cache_bits)
    green = normal_code(w, {2: 1, 280 + idx: 1}, 280 + (1 << cache_bits))
    simple1(w, 1)
    simple1(w, 3)
    simple1(w, 255)
    simple1(w, 0)
    w.code(*green[2])          # literal -> inserted into cache
    w.code(*green[280 + idx])  # cache hit
    w.code(*green[280 + idx])  # cache hit again
    _, _, gray = _webp_gray(wrap_webp(vp8l_payload(3, 1, w)))
    assert gray == [_gray(1, 2, 3)] * 3


def test_subtract_green_transform():
    w = W()
    w.b(1, 1)
    w.b(2, 2)  # SUBTRACT_GREEN
    w.b(0, 1)  # end of transforms
    w.b(0, 1)  # no cache
    w.b(0, 1)  # no meta
    simple1(w, 100)  # green
    simple1(w, 10)   # stored red
    simple1(w, 250)  # stored blue
    simple1(w, 255)
    simple1(w, 0)
    _, _, gray = _webp_gray(wrap_webp(vp8l_payload(2, 2, w)))
    assert gray == [_gray((10 + 100) & 255, 100, (250 + 100) & 255)] * 4


def _ref_predict_inverse(resid, w_px, h_px, mode):
    """Independent predictor reference (spec pseudo-code, single
    tile): contiguous-buffer TR, border rules, mod-256 add."""
    def chans(p):
        return [(p >> s) & 255 for s in (24, 16, 8, 0)]

    def pack(c):
        return (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]

    def avg2(a, b):
        return pack([(x + y) // 2 for x, y in zip(chans(a), chans(b))])

    def clamp(v):
        return 0 if v < 0 else 255 if v > 255 else v

    out = list(resid)
    for y in range(h_px):
        for x in range(w_px):
            i = y * w_px + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = out[i - 1]
            elif x == 0:
                pred = out[i - w_px]
            else:
                left, top = out[i - 1], out[i - w_px]
                tl, tr = out[i - w_px - 1], out[i - w_px + 1]
                if mode == 1:
                    pred = left
                elif mode == 9:
                    pred = avg2(top, tr)
                elif mode == 12:
                    pred = pack([clamp(a + b - c) for a, b, c in
                                 zip(chans(left), chans(top), chans(tl))])
                elif mode == 13:
                    ave = chans(avg2(left, top))
                    cc = chans(tl)
                    pred = pack([
                        clamp(a + ((a - c) // 2 if a >= c
                                   else -((c - a) // 2)))
                        for a, c in zip(ave, cc)])
                else:
                    raise AssertionError(mode)
            out[i] = pack([(a + b) & 255 for a, b in
                           zip(chans(out[i]), chans(pred))])
    return out


def _channel_stream(values):
    """lengths dict for a complete canonical code over the distinct
    values of a channel sequence (1, 2 or 4 distinct values)."""
    vals = sorted(set(values))
    if len(vals) == 1:
        return {vals[0]: 0}, True  # simple1 marker
    if len(vals) == 2:
        return {vals[0]: 1, vals[1]: 1}, False
    for size, ln in ((4, 2), (8, 3)):
        if len(vals) <= size:
            while len(vals) < size:  # pad unused symbols: keep Kraft
                filler = next(v for v in range(256) if v not in vals)
                vals.append(filler)
                vals.sort()
            return {v: ln for v in vals}, False
    raise AssertionError("helper supports <= 8 distinct values")


def _write_channel_code(w, values, alphabet=256):
    lengths, is_single = _channel_stream(values)
    if is_single:
        simple1(w, values[0])
        return {values[0]: (0, 0)}
    return normal_code(w, lengths, alphabet)


@pytest.mark.parametrize("mode", [1, 9, 12, 13])
def test_predictor_transform_modes(mode):
    w_px, h_px = 3, 2
    rgb = [(3, 7, 1), (10, 0, 2), (5, 5, 5),
           (1, 9, 4), (0, 3, 8), (6, 2, 7)]
    resid = [(0xFF << 24) | (r << 16) | (g << 8) | b for r, g, b in rgb]
    w = W()
    w.b(1, 1)
    w.b(0, 2)
    w.b(1, 3)  # size_bits = 3 -> single tile
    w.b(0, 1)  # tile subimage: no cache
    simple1(w, mode)
    simple1(w, 0)
    simple1(w, 0)
    simple1(w, 255)
    simple1(w, 0)
    w.b(0, 1)  # end transforms
    w.b(0, 1)  # no cache
    w.b(0, 1)  # no meta
    gseq = [g for _, g, _ in rgb]
    rseq = [r for r, _, _ in rgb]
    bseq = [b for _, _, b in rgb]
    gc = _write_channel_code(w, gseq, 280)
    rc = _write_channel_code(w, rseq)
    bc = _write_channel_code(w, bseq)
    simple1(w, 255)  # alpha
    simple1(w, 0)    # distance
    for g, r, b in zip(gseq, rseq, bseq):
        w.code(*gc[g])
        w.code(*rc[r])
        w.code(*bc[b])
    _, _, gray = _webp_gray(wrap_webp(vp8l_payload(w_px, h_px, w)))
    exp = _ref_predict_inverse(resid, w_px, h_px, mode)
    assert gray == [_gray((p >> 16) & 255, (p >> 8) & 255, p & 255)
                    for p in exp]


def test_color_indexing_packed():
    # palette of 4 -> 2-bit indices, 4 pixels per packed byte
    pal = [(0xFF << 24) | (10 << 16) | (20 << 8) | 30,
           (0xFF << 24) | (200 << 16) | (100 << 8) | 50,
           (0xFF << 24) | (0 << 16) | (255 << 8) | 0,
           (0xFF << 24) | (7 << 16) | (8 << 8) | 9]
    deltas = []
    prev = 0
    for p in pal:
        deltas.append(tuple((p >> s) - (prev >> s) & 255
                            for s in (24, 16, 8, 0)))
        prev = p
    idx = [0, 1, 2, 3, 3, 2]  # 6x1 image
    packed = [idx[0] | idx[1] << 2 | idx[2] << 4 | idx[3] << 6,
              idx[4] | idx[5] << 2]
    w = W()
    w.b(1, 1)
    w.b(3, 2)      # COLOR_INDEXING
    w.b(3, 8)      # n_colors - 1
    # palette subimage 4x1 (deltas), channel codes
    w.b(0, 1)      # no cache
    ga = [d[2] for d in deltas]
    ra = [d[1] for d in deltas]
    ba = [d[3] for d in deltas]
    aa = [d[0] for d in deltas]
    gc = _write_channel_code(w, ga, 280)
    rc = _write_channel_code(w, ra)
    bc = _write_channel_code(w, ba)
    ac = _write_channel_code(w, aa)
    simple1(w, 0)
    for g, r, b, a in zip(ga, ra, ba, aa):
        w.code(*gc[g])
        w.code(*rc[r])
        w.code(*bc[b])
        w.code(*ac[a])
    w.b(0, 1)      # end transforms
    w.b(0, 1)      # no cache (main)
    w.b(0, 1)      # no meta
    pgc = _write_channel_code(w, packed, 280)
    simple1(w, 0)
    simple1(w, 0)
    simple1(w, 255)
    simple1(w, 0)
    for pb in packed:
        w.code(*pgc[pb])
    _, _, gray = _webp_gray(wrap_webp(vp8l_payload(6, 1, w)))
    assert gray == [_gray((pal[i] >> 16) & 255, (pal[i] >> 8) & 255,
                          pal[i] & 255) for i in idx]


def test_meta_prefix_group_switch():
    # 32x1, meta_bits=4 -> two 16px tiles selecting two code groups
    w = W()
    w.b(0, 1)  # no transforms
    w.b(0, 1)  # no cache
    w.b(1, 1)  # meta prefix present
    w.b(2, 3)  # meta_bits = 4
    # entropy image 2x1: greens 0 / 1 (meta index), red 0
    w.b(0, 1)  # no cache in subimage
    simple2(w, 0, 1)
    simple1(w, 0)
    simple1(w, 0)
    simple1(w, 255)
    simple1(w, 0)
    w.b(0, 1)  # tile 0 -> group 0
    w.b(1, 1)  # tile 1 -> group 1
    # group 0 codes: constant green 10; group 1: constant green 200
    for gval in (10, 200):
        simple1(w, gval)
        simple1(w, 0)
        simple1(w, 0)
        simple1(w, 255)
        simple1(w, 0)
    _, _, gray = _webp_gray(wrap_webp(vp8l_payload(32, 1, w)))
    assert gray[:16] == [_gray(0, 10, 0)] * 16
    assert gray[16:] == [_gray(0, 200, 0)] * 16


def test_cpython_alpha_plane_decodes():
    """The real-world check: a genuine libwebp-encoded VP8L stream
    (CPython's 16x16 python.webp alpha plane) must decode to exactly
    256 samples, deterministically, with logo-like content (a mix of
    opaque/transparent with antialiased edges)."""
    plane = decode_alpha_plane(CPYTHON_ALPH, 16, 16)
    assert len(plane) == 256
    assert plane == decode_alpha_plane(CPYTHON_ALPH, 16, 16)
    assert all(0 <= v <= 255 for v in plane)
    n_extreme = sum(1 for v in plane if v in (0, 255))
    assert n_extreme >= 128, f"implausible alpha histogram: {plane}"
    assert len(set(plane)) > 2, "expected antialiased edge values"


def test_phash_image_accepts_vp8l(spark):
    from goose_parser_spark.ops.multimodal import phash_image
    payload = wrap_webp(vp8l_payload(8, 8, _const_body(9, 9, 9)))
    df = spark.createDataFrame(
        [(1, bytearray(payload)),
         (2, bytearray(b"RIFF____WEBPVP8 garbage"))],
        "doc_id long, payload binary")
    rows = {r["doc_id"]: r["phash"] for r in phash_image(df).collect()}
    assert rows[1] is not None
    assert rows[2] is None  # lossy VP8 -> NULL, not a crash
