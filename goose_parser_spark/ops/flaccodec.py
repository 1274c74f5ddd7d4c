"""Pure-stdlib FLAC decoder — RFC 9639 (the IETF FLAC specification).

FLAC is the lossless audio format actually hosted on the open web
(music archives, dataset mirrors, podcast masters), and the last
lossless gap in this engine's audio layer: WAV/AIFF/AU integer PCM
and the G.711 companded family already decode. This module
implements the full decode path:

- stream header: the fLaC marker and metadata blocks — STREAMINFO
  (block/frame size bounds, 20-bit sample rate, channels, bits per
  sample, 36-bit total samples, the 16-byte MD5 of the original
  PCM) parsed; all other block types skipped by length (§8)
- frames: the 15-bit sync code, blocking strategy, coded block
  size / sample rate / channel assignment / sample size fields, the
  UTF-8-style coded frame-or-sample number, and the CRC-8 header
  check (§9.1, polynomial x^8+x^2+x+1)
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4 (the standard
  polynomial predictors) and LPC orders 1-32 (quantized
  coefficients, signed shift), each with the wasted-bits-per-sample
  unary prefix (§9.2)
- residuals: Rice codes in both 4-bit and 5-bit parameter widths,
  2^n partitioning with the first-partition order adjustment, and
  the escape-to-raw-bits case (§9.2.7); zigzag mapping per spec
- inter-channel decorrelation: left/side, right/side and mid/side
  (the side channel carries one extra bit; mid/side reconstruction
  uses the side LSB as the mid carry bit, §9.1.3)
- the frame-trailing CRC-16 (polynomial x^16+x^15+x^2+1) and the
  STREAMINFO MD5 of the decoded stream, both VERIFIED — a single
  wrong sample anywhere flips the MD5, so a file produced by any
  conforming encoder self-checks the decode end to end

Pin posture (tests/test_flac.py): no FLAC reference
encoder/decoder or third-party .flac artifact exists in this
container, so the external-artifact pin the zstd/brotli/VP8 layers
enjoy is NOT available — documented honestly. The decode is pinned
by (a) the published CRC check values for both polynomials,
(b) round-trips through an INDEPENDENTLY written test-side encoder
covering constant/verbatim/fixed/LPC subframes, Rice partitions,
escapes, wasted bits and all four channel modes, (c) the embedded
STREAMINFO MD5, which any real-world file carries and which the
decoder verifies — the first genuine FLAC this engine meets will
either agree bit-exactly or fail loudly, and (d) the house fuzz
battery (truncations, bit flips, garbage, budget bombs).
"""
from __future__ import annotations

import hashlib
import struct

__all__ = ["FlacError", "decode_flac", "parse_streaminfo"]


class FlacError(ValueError):
    """Raised for malformed, truncated or unsupported FLAC data."""


# ---------------------------------------------------------------------------
# CRCs (§9.1/§9.3): CRC-8 poly 0x07 init 0; CRC-16 poly 0x8005 init 0
# ---------------------------------------------------------------------------

def _make_crc8_table() -> list[int]:
    t = []
    for b in range(256):
        r = b
        for _ in range(8):
            r = ((r << 1) ^ 0x07 if r & 0x80 else r << 1) & 0xFF
        t.append(r)
    return t


def _make_crc16_table() -> list[int]:
    t = []
    for b in range(256):
        r = b << 8
        for _ in range(8):
            r = ((r << 1) ^ 0x8005 if r & 0x8000 else r << 1) & 0xFFFF
        t.append(r)
    return t


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC16[(r >> 8) ^ b] ^ ((r << 8) & 0xFFFF)
    return r


# ---------------------------------------------------------------------------
# MSB-first bit reader
# ---------------------------------------------------------------------------

class _Bits:
    __slots__ = ("d", "pos", "bit", "n")

    def __init__(self, d: bytes, pos: int = 0) -> None:
        self.d = d
        self.pos = pos
        self.bit = 0
        self.n = len(d)

    def read(self, k: int) -> int:
        v = 0
        pos, bit, d = self.pos, self.bit, self.d
        while k > 0:
            if pos >= self.n:
                raise FlacError("bitstream overrun")
            avail = 8 - bit
            take = avail if avail < k else k
            byte = d[pos]
            v = (v << take) | ((byte >> (avail - take))
                               & ((1 << take) - 1))
            bit += take
            k -= take
            if bit == 8:
                bit = 0
                pos += 1
        self.pos, self.bit = pos, bit
        return v

    def read_signed(self, k: int) -> int:
        v = self.read(k)
        return v - (1 << k) if v >> (k - 1) else v

    def unary(self, limit: int = 1 << 20) -> int:
        q = 0
        while not self.read(1):
            q += 1
            if q > limit:
                raise FlacError("unreasonable unary run")
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


# ---------------------------------------------------------------------------
# header / metadata
# ---------------------------------------------------------------------------

def parse_streaminfo(data: bytes) -> dict:
    """STREAMINFO fields + the offset where frames begin."""
    if data[:4] != b"fLaC":
        raise FlacError("missing fLaC marker")
    pos = 4
    info: dict | None = None
    while pos + 4 <= len(data):
        head = data[pos]
        btype = head & 0x7F
        last = bool(head & 0x80)
        size = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + size]
        if len(body) < size:
            raise FlacError("truncated metadata block")
        pos += 4 + size
        if btype == 0:
            if size < 34:
                raise FlacError("short STREAMINFO")
            br = _Bits(body)
            info = {
                "min_block": br.read(16), "max_block": br.read(16),
                "min_frame": br.read(24), "max_frame": br.read(24),
                "rate": br.read(20),
                "channels": br.read(3) + 1,
                "bps": br.read(5) + 1,
                "total_samples": br.read(36),
                "md5": body[18:34],
            }
        if last:
            break
    if info is None:
        raise FlacError("no STREAMINFO block")
    info["frames_at"] = pos
    return info


_BLOCKSIZES = (0, 192, 576, 1152, 2304, 4608, -1, -2,
               256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
_RATES = (0, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
          32000, 44100, 48000, 96000, -1, -2, -3, 0)
_FIXED_COEFS = ((), (1,), (2, -1), (3, -3, 1), (4, -6, 4, -1))


def _coded_number(br: _Bits) -> int:
    """The UTF-8-style frame/sample number (§9.1.5, up to 7 bytes)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise FlacError("bad coded number")
    v = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise FlacError("bad coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _residual(br: _Bits, blocksize: int, order: int,
              out: list[int]) -> None:
    """Rice-coded residual into ``out[order:]`` (§9.2.7)."""
    method = br.read(2)
    if method > 1:
        raise FlacError("reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    parts = 1 << po
    # RFC 9639 requires the first partition to hold at least one
    # sample: (blocksize >> po) must be STRICTLY greater than the
    # predictor order (ADVICE r6 — equality previously slipped
    # through and decoded an empty first partition).
    if blocksize % parts or (blocksize >> po) <= order:
        raise FlacError("bad partition order")
    idx = order
    for p in range(parts):
        count = (blocksize >> po) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for _ in range(count):
                out[idx] = br.read_signed(raw) if raw else 0
                idx += 1
        else:
            for _ in range(count):
                q = br.unary()
                v = (q << param) | br.read(param)
                out[idx] = (v >> 1) ^ -(v & 1)
                idx += 1


def _subframe(br: _Bits, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise FlacError("bad subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
    eff = bps - wasted
    if eff <= 0:
        raise FlacError("wasted bits exceed sample size")
    out = [0] * blocksize
    if stype == 0:  # CONSTANT
        v = br.read_signed(eff)
        out = [v] * blocksize
    elif stype == 1:  # VERBATIM
        for i in range(blocksize):
            out[i] = br.read_signed(eff)
    elif 8 <= stype <= 12:  # FIXED order 0..4
        order = stype - 8
        if order > blocksize:
            raise FlacError("fixed order exceeds block size")
        for i in range(order):
            out[i] = br.read_signed(eff)
        _residual(br, blocksize, order, out)
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * out[i - 1 - j]
            out[i] += pred
    elif stype >= 32:  # LPC order 1..32
        order = stype - 31
        if order > blocksize:
            raise FlacError("LPC order exceeds block size")
        for i in range(order):
            out[i] = br.read_signed(eff)
        prec = br.read(4) + 1
        if prec == 16:
            raise FlacError("invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        _residual(br, blocksize, order, out)
        for i in range(order, blocksize):
            pred = 0
            for j in range(order):
                pred += coefs[j] * out[i - 1 - j]
            out[i] += pred >> shift
    else:
        raise FlacError(f"reserved subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(data: bytes, max_samples: int = 1 << 26,
                verify_md5: bool = True) -> tuple[int, int, list[int]]:
    """Decode a FLAC stream to ``(sample_rate, n_channels,
    mono_samples)`` — same contract (exact sum//n downmix) as
    :func:`goose_parser_spark.ops.imagecodec.decode_audio_pcm`, so
    the same recording in WAV and FLAC decodes identically. Frame
    CRC-8/CRC-16 always verify; the STREAMINFO MD5 verifies when the
    encoder recorded one (all real encoders do) unless
    ``verify_md5=False``."""
    info = parse_streaminfo(data)
    rate = info["rate"]
    channels = info["channels"]
    bps = info["bps"]
    if rate == 0 or channels < 1:
        raise FlacError("bad STREAMINFO")
    total = info["total_samples"]
    if total and total * channels > max_samples:
        raise FlacError("stream exceeds the decode sample budget")
    pos = info["frames_at"]
    chans: list[list[int]] = [[] for _ in range(channels)]
    md5 = hashlib.md5() if verify_md5 else None
    got = 0
    while pos < len(data):
        if pos + 2 > len(data):
            break
        sync = (data[pos] << 8) | data[pos + 1]
        if sync >> 2 != 0x3FFE:
            raise FlacError("lost frame sync")
        br = _Bits(data, pos)
        br.read(14)
        if br.read(1):
            raise FlacError("reserved sync bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        rate_code = br.read(4)
        chan_code = br.read(4)
        size_code = br.read(3)
        if br.read(1):
            raise FlacError("reserved frame header bit set")
        _coded_number(br)
        if bs_code == 0:
            raise FlacError("reserved block size code")
        blocksize = _BLOCKSIZES[bs_code]
        if blocksize == -1:
            blocksize = br.read(8) + 1
        elif blocksize == -2:
            blocksize = br.read(16) + 1
        if rate_code == 15:
            raise FlacError("invalid sample rate code")
        rr = _RATES[rate_code]
        if rr == -1:
            rr = br.read(8) * 1000
        elif rr == -2:
            rr = br.read(16)
        elif rr == -3:
            rr = br.read(16) * 10
        elif rr == 0:
            rr = rate
        if size_code == 3:
            raise FlacError("reserved sample size code")
        fbps = bps if size_code == 0 else \
            (8, 12, 0, 16, 20, 24, 32)[size_code - 1]
        if fbps != bps:
            raise FlacError("frame/stream sample size mismatch")
        # all header fields are whole bytes past the 32-bit prefix,
        # so the reader is byte-aligned here
        hdr_end = br.pos
        if crc8(data[pos:hdr_end]) != br.read(8):
            raise FlacError("frame header CRC-8 mismatch")
        if chan_code < 8:
            nch = chan_code + 1
            if nch != channels:
                raise FlacError("frame/stream channel mismatch")
            sub = [_subframe(br, blocksize, fbps)
                   for _ in range(nch)]
        elif chan_code in (8, 9, 10):
            if channels != 2:
                raise FlacError("side coding in non-stereo stream")
            if chan_code == 8:  # left/side
                left = _subframe(br, blocksize, fbps)
                side = _subframe(br, blocksize, fbps + 1)
                sub = [left, [left[i] - side[i]
                              for i in range(blocksize)]]
            elif chan_code == 9:  # right/side
                side = _subframe(br, blocksize, fbps + 1)
                right = _subframe(br, blocksize, fbps)
                sub = [[right[i] + side[i] for i in range(blocksize)],
                       right]
            else:  # mid/side
                mid = _subframe(br, blocksize, fbps)
                side = _subframe(br, blocksize, fbps + 1)
                left = [0] * blocksize
                right = [0] * blocksize
                for i in range(blocksize):
                    m = (mid[i] << 1) | (side[i] & 1)
                    left[i] = (m + side[i]) >> 1
                    right[i] = (m - side[i]) >> 1
                sub = [left, right]
        else:
            raise FlacError("reserved channel assignment")
        br.align()
        if crc16(data[pos:br.pos]) != br.read(16):
            raise FlacError("frame CRC-16 mismatch")
        got += blocksize * channels
        if got > max_samples:
            raise FlacError("stream exceeds the decode sample budget")
        for c in range(channels):
            chans[c].extend(sub[c])
        if md5 is not None:
            width = (bps + 7) // 8
            mask = (1 << (8 * width)) - 1
            frame = bytearray()
            for i in range(blocksize):
                for c in range(channels):
                    frame += (sub[c][i] & mask).to_bytes(
                        width, "little")
            md5.update(bytes(frame))
        pos = br.pos
    if total and len(chans[0]) < total:
        raise FlacError("stream ends before total_samples")
    if total:
        chans = [c[:total] for c in chans]
    if md5 is not None and info["md5"] != b"\x00" * 16 and total \
            and len(chans[0]) == total:
        if md5.digest() != info["md5"]:
            raise FlacError("decoded stream fails the STREAMINFO MD5")
    if channels == 1:
        mono = chans[0]
    else:
        mono = [sum(chans[c][i] for c in range(channels)) // channels
                for i in range(len(chans[0]))]
    return rate, channels, mono
