"""FLAC decoder (ops/flaccodec.py) — behavioral pins.

Pin posture, stated honestly: this container ships NO FLAC reference
implementation and no third-party .flac artifact, so the
external-artifact pin the zstd/brotli/VP8 layers enjoy is not
available. The decode is pinned by:

1. the PUBLISHED CRC check values for both frame polynomials
   (CRC-8/0x07 and CRC-16/0x8005 over "123456789");
2. round-trips through the INDEPENDENT encoder below, which covers
   every subframe type (constant/verbatim/fixed 0-4/LPC), Rice
   partitions and escapes in both parameter widths, wasted bits,
   and all four channel decorrelation modes;
3. the STREAMINFO MD5: the decoder recomputes it from decoded
   samples, so the first real-world FLAC this engine meets either
   agrees bit-exactly or fails loudly — every conforming encoder
   records it;
4. the house fuzz battery (truncations, bit flips, garbage).
"""
from __future__ import annotations

import hashlib
import random
import struct

import pytest

from goose_parser_spark.ops.flaccodec import (
    FlacError,
    crc8,
    crc16,
    decode_flac,
    parse_streaminfo,
)

# ---------------------------------------------------------------------------
# independent test-side encoder
# ---------------------------------------------------------------------------


class _W:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def w(self, v: int, k: int) -> None:
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.nbits += k
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.w(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _rice(w: _W, v: int, p: int) -> None:
    u = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
    q = u >> p
    for _ in range(q):
        w.w(0, 1)
    w.w(1, 1)
    if p:
        w.w(u & ((1 << p) - 1), p)


def _utf8_number(w: _W, n: int) -> None:
    if n < 0x80:
        w.w(n, 8)
        return
    tail = []
    nbytes = 1
    while True:
        tail.append(0x80 | (n & 0x3F))
        n >>= 6
        nbytes += 1
        lead_bits = 7 - nbytes
        if n < (1 << lead_bits):
            break
    lead = (0xFF << (8 - nbytes)) & 0xFF | n
    w.w(lead, 8)
    for b in reversed(tail):
        w.w(b, 8)


def _residual_enc(w: _W, res: list[int], order: int, blocksize: int,
                  param: int, po: int = 0, method: int = 0,
                  escape_part: int = -1) -> None:
    w.w(method, 2)
    pbits = 4 if method == 0 else 5
    w.w(po, 4)
    parts = 1 << po
    idx = 0
    for p in range(parts):
        count = (blocksize >> po) - (order if p == 0 else 0)
        if p == escape_part:
            w.w((1 << pbits) - 1, pbits)
            raw = 18
            w.w(raw, 5)
            for _ in range(count):
                w.w(res[idx] & ((1 << raw) - 1), raw)
                idx += 1
        else:
            w.w(param, pbits)
            for _ in range(count):
                _rice(w, res[idx], param)
                idx += 1


def _subframe_enc(w: _W, x: list[int], bps: int, kind: str,
                  wasted: int = 0, lpc=None, param: int = 4,
                  po: int = 0, method: int = 0,
                  escape_part: int = -1) -> None:
    w.w(0, 1)
    if wasted:
        assert all(v % (1 << wasted) == 0 for v in x)
        x = [v >> wasted for v in x]
    eff = bps - wasted
    if kind == "constant":
        w.w(0, 6)
    elif kind == "verbatim":
        w.w(1, 6)
    elif kind.startswith("fixed"):
        w.w(8 + int(kind[5:]), 6)
    else:  # lpc
        order = len(lpc[0])
        w.w(32 + order - 1, 6)
    if wasted:
        w.w(1, 1)
        for _ in range(wasted - 1):
            w.w(0, 1)
        w.w(1, 1)
    else:
        w.w(0, 1)
    if kind == "constant":
        w.w(x[0], eff)
        return
    if kind == "verbatim":
        for v in x:
            w.w(v, eff)
        return
    if kind.startswith("fixed"):
        order = int(kind[5:])
        coefs = ((), (1,), (2, -1), (3, -3, 1), (4, -6, 4, -1))[order]
        for v in x[:order]:
            w.w(v, eff)
        res = []
        for i in range(order, len(x)):
            pred = sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
            res.append(x[i] - pred)
        _residual_enc(w, res, order, len(x), param, po, method,
                      escape_part)
        return
    coefs, shift, prec = lpc
    order = len(coefs)
    for v in x[:order]:
        w.w(v, eff)
    w.w(prec - 1, 4)
    w.w(shift, 5)
    for c in coefs:
        w.w(c, prec)
    res = []
    for i in range(order, len(x)):
        pred = sum(coefs[j] * x[i - 1 - j]
                   for j in range(order)) >> shift
        res.append(x[i] - pred)
    _residual_enc(w, res, order, len(x), param, po, method,
                  escape_part)


def encode_flac(chans: list[list[int]], rate: int, bps: int,
                blocksize: int = 64, mode: str = "indep",
                kind: str = "verbatim", **kw) -> bytes:
    """Independent FLAC encoder (tests only): one subframe strategy
    for the whole stream, explicit 16-bit block sizes, rate taken
    from STREAMINFO (code 0)."""
    nch = len(chans)
    total = len(chans[0])
    width = (bps + 7) // 8
    md5 = hashlib.md5()
    for i in range(total):
        for c in range(nch):
            md5.update((chans[c][i] & ((1 << (8 * width)) - 1)
                        ).to_bytes(width, "little"))
    si = _W()
    si.w(blocksize, 16)
    si.w(blocksize, 16)
    si.w(0, 24)
    si.w(0, 24)
    si.w(rate, 20)
    si.w(nch - 1, 3)
    si.w(bps - 1, 5)
    si.w(total, 36)
    stream = bytearray(b"fLaC")
    streaminfo = si.bytes() + md5.digest()
    stream += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + \
        streaminfo
    frame_no = 0
    for start in range(0, total, blocksize):
        block = [c[start:start + blocksize] for c in chans]
        bs = len(block[0])
        w = _W()
        w.w(0x3FFE, 14)
        w.w(0, 1)
        w.w(0, 1)  # fixed blocksize strategy
        w.w(7, 4)  # 16-bit blocksize follows
        w.w(0, 4)  # rate from STREAMINFO
        if mode == "indep":
            w.w(nch - 1, 4)
        else:
            w.w({"left": 8, "right": 9, "mid": 10}[mode], 4)
        w.w(0, 3)  # sample size from STREAMINFO
        w.w(0, 1)
        _utf8_number(w, frame_no)
        w.w(bs - 1, 16)
        w.align()
        head = w.bytes()
        w2 = _W()
        if mode == "indep":
            for c in range(nch):
                _subframe_enc(w2, block[c], bps, kind, **kw)
        else:
            left, right = block
            side = [left[i] - right[i] for i in range(bs)]
            if mode == "left":
                _subframe_enc(w2, left, bps, kind, **kw)
                _subframe_enc(w2, side, bps + 1, kind, **kw)
            elif mode == "right":
                _subframe_enc(w2, side, bps + 1, kind, **kw)
                _subframe_enc(w2, right, bps, kind, **kw)
            else:
                mid = [(left[i] + right[i]) >> 1 for i in range(bs)]
                _subframe_enc(w2, mid, bps, kind, **kw)
                _subframe_enc(w2, side, bps + 1, kind, **kw)
        w2.align()
        body = head + bytes([crc8(head)]) + w2.bytes()
        frame = body + struct.pack(">H", crc16(body))
        stream += frame
        frame_no += 1
    return bytes(stream)


# ---------------------------------------------------------------------------
# content generators
# ---------------------------------------------------------------------------

def _noise(n, bps, seed=1):
    rnd = random.Random(seed)
    lim = 1 << (bps - 1)
    return [rnd.randrange(-lim, lim) for _ in range(n)]


def _smooth(n, bps, seed=2):
    rnd = random.Random(seed)
    lim = (1 << (bps - 1)) - 1
    out = [0]
    for _ in range(n - 1):
        out.append(max(-lim, min(lim, out[-1] + rnd.randrange(-9, 10))))
    return out


def _expected(chans):
    nch = len(chans)
    if nch == 1:
        return list(chans[0])
    return [sum(c[i] for c in chans) // nch
            for i in range(len(chans[0]))]


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_crc_published_check_values():
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_roundtrip_verbatim_and_constant():
    x = _noise(200, 16)
    data = encode_flac([x], 44100, 16, blocksize=64, kind="verbatim")
    assert decode_flac(data) == (44100, 1, x)
    c = [-1234] * 150
    data = encode_flac([c], 8000, 16, blocksize=50, kind="constant")
    assert decode_flac(data) == (8000, 1, c)


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_roundtrip_fixed_orders(order):
    x = _smooth(256, 16, seed=order)
    data = encode_flac([x], 22050, 16, blocksize=64,
                       kind=f"fixed{order}", param=5)
    assert decode_flac(data) == (22050, 1, x)


@pytest.mark.parametrize("po,method", [(0, 0), (2, 0), (3, 1)])
def test_roundtrip_rice_partitions(po, method):
    x = _smooth(256, 16, seed=9)
    data = encode_flac([x], 32000, 16, blocksize=128, kind="fixed2",
                       param=6, po=po, method=method)
    assert decode_flac(data) == (32000, 1, x)


def test_roundtrip_escape_partition():
    x = _noise(128, 16, seed=4)
    data = encode_flac([x], 16000, 16, blocksize=128, kind="fixed1",
                       param=8, po=2, escape_part=1)
    assert decode_flac(data) == (16000, 1, x)


def test_roundtrip_lpc():
    x = _smooth(320, 16, seed=7)
    for coefs, shift, prec in [((205, -102), 7, 12),
                               ((700, -300, 120, -50), 9, 14),
                               (tuple(range(1, 9)), 5, 10)]:
        data = encode_flac([x], 48000, 16, blocksize=80, kind="lpc",
                           lpc=(list(coefs), shift, prec), param=9)
        assert decode_flac(data) == (48000, 1, x)


def test_roundtrip_wasted_bits():
    x = [v << 3 for v in _smooth(128, 12, seed=3)]
    data = encode_flac([x], 8000, 16, blocksize=64, kind="fixed1",
                       param=5, wasted=3)
    assert decode_flac(data) == (8000, 1, x)


@pytest.mark.parametrize("mode", ["indep", "left", "right", "mid"])
def test_roundtrip_stereo_decorrelation(mode):
    left = _smooth(192, 16, seed=11)
    right = [v + d for v, d in zip(_smooth(192, 16, seed=12),
                                   _smooth(192, 16, seed=13))]
    right = [max(-32768, min(32767, v)) for v in right]
    data = encode_flac([left, right], 44100, 16, blocksize=64,
                       mode=mode, kind="fixed2", param=6)
    assert decode_flac(data) == (44100, 2, _expected([left, right]))


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_roundtrip_sample_widths(bps):
    x = _smooth(128, bps, seed=bps)
    data = encode_flac([x], 12000, bps, blocksize=64, kind="fixed1",
                       param=min(14, bps - 2))
    assert decode_flac(data) == (12000, 1, x)


def test_md5_and_crc_guard_corruption():
    x = _smooth(128, 16, seed=21)
    data = bytearray(encode_flac([x], 44100, 16, blocksize=64,
                                 kind="fixed2", param=6))
    # flip one bit inside the first frame body: CRC-16 must object
    data[60] ^= 0x10
    with pytest.raises(FlacError):
        decode_flac(bytes(data))
    # a wrong STREAMINFO md5 (bytes 26..42) must fail verification
    data2 = bytearray(encode_flac([x], 44100, 16, blocksize=64,
                                  kind="fixed2", param=6))
    data2[30] ^= 0xFF
    with pytest.raises(FlacError):
        decode_flac(bytes(data2))
    # ...unless verification is off
    info = parse_streaminfo(bytes(data2))
    assert info["total_samples"] == 128
    assert decode_flac(bytes(data2), verify_md5=False)[2] == x


def test_streaminfo_parse():
    x = _noise(70, 16, seed=5)
    info = parse_streaminfo(encode_flac([x], 96000, 16))
    assert info["rate"] == 96000 and info["channels"] == 1
    assert info["bps"] == 16 and info["total_samples"] == 70


def test_fuzz_truncation_bitflips_garbage():
    import time
    x = _smooth(256, 16, seed=31)
    valid = encode_flac([x], 44100, 16, blocksize=64, kind="fixed3",
                        param=6, po=1)
    rnd = random.Random(6)
    t0 = time.monotonic()
    for cut in range(0, len(valid), max(1, len(valid) // 40)):
        try:
            decode_flac(valid[:cut])
        except FlacError:
            pass
    for _ in range(80):
        buf = bytearray(valid)
        for _ in range(rnd.randrange(1, 4)):
            buf[rnd.randrange(len(buf))] ^= 1 << rnd.randrange(8)
        try:
            decode_flac(bytes(buf))
        except FlacError:
            pass
    for n in (0, 4, 100, 5000):
        blob = b"fLaC" + bytes(rnd.randrange(256) for _ in range(n))
        try:
            decode_flac(blob)
        except FlacError:
            pass
    assert time.monotonic() - t0 < 30


def test_sample_budget():
    x = _noise(64, 16, seed=8)
    data = encode_flac([x], 44100, 16)
    with pytest.raises(FlacError):
        decode_flac(data, max_samples=32)


def test_flac_via_decode_audio_pcm_matches_wav():
    """Cross-format identity through the public audio entry point:
    the same samples shipped as WAV and FLAC decode identically."""
    from goose_parser_spark.ops.imagecodec import decode_audio_pcm
    x = _smooth(300, 16, seed=41)
    flac = encode_flac([x], 16000, 16, blocksize=100, kind="fixed2",
                       param=6)
    pcm = struct.pack("<%dh" % len(x), *x)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", len(pcm)) + pcm)
    assert decode_audio_pcm(flac) == decode_audio_pcm(wav)
