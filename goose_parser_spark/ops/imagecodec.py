"""Pure-stdlib media decoding for the formats that need no codec
library: PNG (zlib inflate + per-scanline unfilter, all legal bit
depths 1/2/4/8/16, Adam7 interlace), BMP (24/32-bit uncompressed),
GIF (LZW, first frame, interlace), TIFF (uncompressed, LZW with the
early-change quirk, Deflate, PackBits, horizontal-differencing
predictor), binary PPM/PGM,
RIFF/WAVE audio (integer PCM plus the G.711 μ-law/A-law companded
telephony codecs), and — since round 6 — Huffman-coded
JPEG, both baseline (SOF0/SOF1) and progressive (SOF2, spectral
selection + successive approximation), through one integer
fixed-point IDCT, plus lossless WebP (VP8L: LSB bitstream, canonical
prefix codes, LZ77 + color cache, all four inverse transforms) and
AVI container walking for MJPEG frame sampling. LOSSY WebP decodes
for real too: ops/vp8.py implements the full VP8 keyframe path
(boolean coder, token trees, intra prediction, integer IDCT/WHT,
both loop filters) and its Y plane IS the BT.601 luma this pipeline
uses as gray. This upgrades the multimodal pipeline's decode stage
from a stand-in to a REAL decoder wherever pure stdlib suffices —
AVIF and arithmetic-coded JPEG remain out of scope offline and
raise ValueError, isolated per document upstream.

Everything is integer arithmetic and therefore bit-deterministic
across machines: grayscale is ITU-R BT.601 in fixed point
((299*R + 587*G + 114*B + 500) // 1000) and resize is exact-count
box averaging (sum // count).
"""

from __future__ import annotations

import math
import struct
import zlib

__all__ = ["decode_image_gray", "resize_gray_box",
           "decode_audio_pcm", "audio_frame_features",
           "probe_media", "avi_video_chunks", "gif_frames_gray",
           "webp_frames_gray", "decode_alpha_plane",
           "parse_exif", "parse_id3"]


def _gray(r: int, g: int, b: int) -> int:
    return (299 * r + 587 * g + 114 * b + 500) // 1000


# Adversarial-input guards: these parsers run against arbitrary web
# bytes, so dimension fields and compressed streams must never drive
# unbounded allocations (a 4-byte header claiming a 65535x65535
# canvas would otherwise allocate tens of GB in one uninterruptible
# step, and a kilobyte zlib bomb can inflate to GBs). The cap is a
# DECODE budget, not a size policy: 16 MP (4096x4096) covers the web
# imagery a pure-Python pixel loop can realistically chew through,
# and anything larger still gets true dimensions from probe_media
# (header-only), so size gates fire before decode ever runs. Each
# Python list pixel costs ~8 bytes of pointer, so 16 MP bounds any
# single canvas at ~128 MB instead of the ~0.5 GB a 64 MP budget
# allowed (repeated 0.5 GB lists fragment the allocator — observed
# as multi-GB RSS growth under the decoder fuzz suite).
MAX_PIXELS = 16_000_000

# Animation walks compose one canvas per frame; without a ceiling a
# crafted file with thousands of tiny frame records multiplies the
# canvas cost. Callers sampling frames pass their own max_frames;
# this is the backstop when they don't. The frame COUNT cap alone is
# not a memory bound — 256 composed copies of a 16 MP canvas would be
# ~30 GiB — so the walks also budget canvas_pixels x frames jointly
# (MAX_ANIM_PIXELS) and stop emitting early, the same truncation
# semantics as max_frames. 64 MP total = four max-size frames, or the
# full 256 frames for canvases up to 500x500.
MAX_FRAMES = 256
MAX_ANIM_PIXELS = 64_000_000


def _check_pixels(w: int, h: int, what: str) -> None:
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise ValueError(f"implausible {what} dimensions {w}x{h}")


def _bounded_inflate(data: bytes, limit: int) -> bytes:
    """zlib decompress with an output cap (bomb guard): anything past
    ``limit`` bytes means the stream disagrees with the declared
    geometry and the document is rejected, not inflated."""
    d = zlib.decompressobj()
    out = d.decompress(data, limit + 1)
    if len(out) > limit:
        raise ValueError("compressed stream exceeds declared size")
    return out


def _png_unfilter(raw: bytes, pos: int, ph: int, bpl: int,
                  bpp: int) -> bytearray:
    """Undo per-scanline filters 0-4 (None/Sub/Up/Average/Paeth) for
    one (sub-)image of ``ph`` rows x ``bpl`` filtered bytes; ``bpp``
    is the filter byte-distance (max(1, channels*depth//8))."""
    out = bytearray(ph * bpl)
    for y in range(ph):
        f = raw[pos]
        pos += 1
        off = y * bpl
        line = raw[pos:pos + bpl]
        pos += bpl
        if f == 0:
            out[off:off + bpl] = line
        elif f == 1:  # Sub
            for x in range(bpl):
                a = out[off + x - bpp] if x >= bpp else 0
                out[off + x] = (line[x] + a) & 0xFF
        elif f == 2:  # Up
            for x in range(bpl):
                b = out[off - bpl + x] if y else 0
                out[off + x] = (line[x] + b) & 0xFF
        elif f == 3:  # Average
            for x in range(bpl):
                a = out[off + x - bpp] if x >= bpp else 0
                b = out[off - bpl + x] if y else 0
                out[off + x] = (line[x] + (a + b) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(bpl):
                a = out[off + x - bpp] if x >= bpp else 0
                b = out[off - bpl + x] if y else 0
                c = out[off - bpl + x - bpp] if (y and x >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    b if pb <= pc else c
                out[off + x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out


def _png_samples(row: bytes, count: int, depth: int) -> list[int]:
    """Unpack ``count`` samples from one unfiltered scanline: sub-byte
    depths are MSB-first packed; 16-bit keeps the high byte (the
    standard 16-to-8 reduction)."""
    if depth == 8:
        return list(row[:count])
    if depth == 16:
        return list(row[0:2 * count:2])
    per = 8 // depth
    mask = (1 << depth) - 1
    out = []
    for i in range(count):
        byte = row[i // per]
        shift = 8 - depth * (i % per + 1)
        out.append((byte >> shift) & mask)
    return out


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_gray(data: bytes) -> tuple[int, int, list[int]]:
    pos = 8  # signature already checked
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette: bytes | None = None
    n = len(data)
    while pos + 8 <= n:
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = bytes(body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("malformed PNG")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError("unsupported PNG color type")
    # spec-legal depths per color type (sub-byte only for gray and
    # palette; palette never 16-bit)
    legal = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8)}.get(
        color_type, (8, 16))
    if bit_depth not in legal or interlace not in (0, 1):
        raise ValueError("unsupported PNG depth/interlace combination")
    _check_pixels(width, height, "PNG")
    if width * height * channels > MAX_PIXELS:
        # the decode buffers are per-SAMPLE, not per-pixel: an RGBA
        # canvas costs 4x what the pixel check bounds
        raise ValueError("PNG sample budget exceeded")
    passes = _ADAM7 if interlace == 1 else ((0, 0, 1, 1),)
    bpp = max(1, channels * bit_depth // 8)
    expected = 0
    for x0, y0, dx, dy in passes:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            expected += ph * (1 + (pw * channels * bit_depth + 7) // 8)
    raw = _bounded_inflate(bytes(idat), expected)
    img = [0] * (width * height * channels)
    pos = 0
    for x0, y0, dx, dy in passes:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        bpl = (pw * channels * bit_depth + 7) // 8
        if len(raw) < pos + ph * (1 + bpl):
            raise ValueError("truncated PNG pixel data")
        sub = _png_unfilter(raw, pos, ph, bpl, bpp)
        pos += ph * (1 + bpl)
        for j in range(ph):
            samps = _png_samples(sub[j * bpl:(j + 1) * bpl],
                                 pw * channels, bit_depth)
            base = (y0 + j * dy) * width
            for i in range(pw):
                at = (base + x0 + i * dx) * channels
                for c in range(channels):
                    img[at + c] = samps[i * channels + c]
    if color_type != 3 and bit_depth < 8:
        scale = 255 // ((1 << bit_depth) - 1)
        img = [v * scale for v in img]
    gray: list[int]
    if color_type == 0:
        gray = img
    elif color_type == 4:  # gray+alpha
        gray = img[0::2]
    elif color_type == 3:  # palette (indices, never scaled)
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        lut = [_gray(palette[3 * i], palette[3 * i + 1],
                     palette[3 * i + 2])
               for i in range(len(palette) // 3)]
        gray = [lut[v] for v in img]
    else:  # RGB / RGBA
        gray = [_gray(img[i], img[i + 1], img[i + 2])
                for i in range(0, len(img), channels)]
    return width, height, gray


def _bmp_gray(data: bytes) -> tuple[int, int, list[int]]:
    if len(data) < 54:
        raise ValueError("truncated BMP")
    off = struct.unpack("<I", data[10:14])[0]
    hdr = struct.unpack("<I", data[14:18])[0]
    if hdr < 40:
        raise ValueError("unsupported BMP header")
    width, height = struct.unpack("<ii", data[18:26])
    bpp = struct.unpack("<H", data[28:30])[0]
    comp = struct.unpack("<I", data[30:34])[0]
    if comp != 0 or bpp not in (24, 32):
        raise ValueError("unsupported BMP (need uncompressed 24/32-bit)")
    flip = height > 0  # positive height = bottom-up storage
    height = abs(height)
    _check_pixels(width, height, "BMP")
    step = bpp // 8
    stride = (width * step + 3) & ~3
    gray: list[int] = []
    for row in range(height):
        y = (height - 1 - row) if flip else row
        base = off + y * stride
        line = data[base:base + width * step]
        if len(line) < width * step:
            raise ValueError("truncated BMP pixel data")
        for x in range(width):
            b, g, r = line[x * step], line[x * step + 1], line[x * step + 2]
            gray.append(_gray(r, g, b))
    return width, height, gray


def _pnm_gray(data: bytes) -> tuple[int, int, list[int]]:
    # binary PGM (P5) / PPM (P6), maxval <= 255
    fields: list[bytes] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            pos = data.find(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(data[start:pos])
    width, height, maxval = (int(f) for f in fields)
    _check_pixels(width, height, "PNM")
    if maxval > 255:
        raise ValueError("unsupported PNM maxval")
    pos += 1  # single whitespace after maxval
    if data[:2] == b"P5":
        px = data[pos:pos + width * height]
        if len(px) < width * height:
            raise ValueError("truncated PGM")
        return width, height, list(px)
    px = data[pos:pos + 3 * width * height]
    if len(px) < 3 * width * height:
        raise ValueError("truncated PPM")
    return width, height, [_gray(px[i], px[i + 1], px[i + 2])
                           for i in range(0, len(px), 3)]


def decode_image_gray(data: bytes) -> tuple[int, int, list[int]]:
    """Decode PNG / GIF / TIFF / BMP / binary PPM-PGM / JPEG
    (baseline + progressive) / WebP (lossless VP8L and lossy VP8
    keyframe) bytes to ``(width, height,
    grayscale_pixels_row_major)`` with pure stdlib. Raises
    ValueError for other formats (AVIF and video codecs need codec
    libraries)."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return _png_gray(data)
    if data[:2] == b"BM":
        return _bmp_gray(data)
    if data[:2] in (b"P5", b"P6"):
        return _pnm_gray(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return _gif_gray(data)
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return _tiff_gray(data)
    if data[:2] == b"\xff\xd8":
        return _jpeg_gray(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return _webp_gray(data)
    if data[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"):
        return _ico_gray(data)
    raise ValueError("unsupported image format (stdlib decoders: "
                     "PNG, GIF, BMP, TIFF, PPM/PGM, JPEG, WebP, ICO)")


def _ico_entries(data: bytes) -> list[tuple[int, int, int, int]]:
    """ICONDIR entries as ``(w, h, size, offset)`` — 0 in a dimension
    byte means 256 (the favicon format caps at 256)."""
    if len(data) < 6:
        raise ValueError("truncated ICO")
    _res, typ, cnt = struct.unpack("<HHH", data[:6])
    if typ not in (1, 2) or cnt == 0:
        raise ValueError("not an ICO/CUR file")
    out = []
    for i in range(min(cnt, 64)):
        e = data[6 + 16 * i:6 + 16 * (i + 1)]
        if len(e) < 16:
            break
        size, off = struct.unpack("<II", e[8:16])
        out.append((e[0] or 256, e[1] or 256, size, off))
    if not out:
        raise ValueError("ICO without directory entries")
    return out


def _ico_gray(data: bytes) -> tuple[int, int, list[int]]:
    """Decode an ICO/CUR favicon: the LARGEST directory entry wins
    (the analytics-useful rendition). Entries are either embedded
    PNG (modern 256px icons) or a headerless BMP DIB whose height
    field is DOUBLED (XOR image + AND mask share one header) — the
    DIB is re-wrapped as a plain BMP so the pinned BMP decoder does
    the pixels; palettized DIBs (bpp<=8) raise honestly."""
    w, h, size, off = max(_ico_entries(data),
                          key=lambda e: e[0] * e[1])
    payload = data[off:off + size]
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _png_gray(payload)
    if len(payload) < 40:
        raise ValueError("truncated ICO bitmap entry")
    hdr = struct.unpack("<I", payload[0:4])[0]
    if hdr < 40:
        raise ValueError("unsupported ICO bitmap header")
    bw, bh2 = struct.unpack("<ii", payload[4:12])
    bpp = struct.unpack("<H", payload[14:16])[0]
    if bpp not in (24, 32):
        raise ValueError("unsupported ICO bitmap depth (palettized "
                         "favicons need a palette decoder)")
    bh = abs(bh2) // 2 if abs(bh2) == 2 * h else abs(bh2)
    # re-wrap as a BMP file: patch the height to the XOR image only
    patched = bytearray(payload)
    struct.pack_into("<i", patched, 8, bh if bh2 > 0 else -bh)
    pix_off = 14 + hdr
    bmp = (b"BM" + struct.pack("<IHHI", 14 + len(payload), 0, 0,
                               pix_off) + bytes(patched))
    gw, gh, px = _bmp_gray(bmp)
    if (gw, gh) != (w, h) and (gw, gh) != (bw, bh):
        raise ValueError("ICO bitmap dimension mismatch")
    return gw, gh, px


def resize_gray_box(width: int, height: int, pixels: list[int],
                    out_w: int = 8, out_h: int = 8) -> list[int]:
    """Exact integer box-average resize (the pHash front-end): output
    cell (i, j) averages the input box [floor(j*h/out_h),
    floor((j+1)*h/out_h)) × [floor(i*w/out_w), floor((i+1)*w/out_w)),
    value = sum // count. Deterministic on every machine."""
    if width < out_w or height < out_h:
        raise ValueError("image smaller than target grid")
    out: list[int] = []
    for j in range(out_h):
        y0, y1 = j * height // out_h, (j + 1) * height // out_h
        for i in range(out_w):
            x0, x1 = i * width // out_w, (i + 1) * width // out_w
            s = 0
            for y in range(y0, y1):
                row = y * width
                s += sum(pixels[row + x0:row + x1])
            out.append(s // ((y1 - y0) * (x1 - x0)))
    return out


def _ulaw_to_linear(b: int) -> int:
    """ITU-T G.711 μ-law byte → 14-bit linear sample. The segment
    expansion formula is public knowledge (G.711 / the classic
    public-domain Sun g711.c): complement, bias-132 mantissa shifted
    by the 3-bit segment, sign from bit 7 of the complemented byte."""
    u = ~b & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw_to_linear(b: int) -> int:
    """ITU-T G.711 A-law byte → 13-bit linear sample (same public
    formula family: XOR 0x55, segment 0 linear / segments 1..7
    chord-exponential, sign bit SET means positive)."""
    a = b ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def _downmix(samples: list[int], channels: int) -> list[int]:
    """Exact integer mean downmix (sum // n) — the one convention all
    audio containers share so cross-container identity tests hold."""
    if channels > 1:
        usable = (len(samples) // channels) * channels
        samples = [sum(samples[i:i + channels]) // channels
                   for i in range(0, usable, channels)]
    return samples


def _pcm_samples(pcm: bytes, bits: int, big_endian: bool,
                 signed8: bool = False) -> list[int]:
    """Interleaved integer PCM bytes → native-depth signed samples
    (8/16/24/32-bit, either endianness; 8-bit is unsigned in WAV but
    signed in AIFF/AU — ``signed8`` selects)."""
    if bits == 8:
        if signed8:
            return [b - 256 if b >= 128 else b for b in pcm]
        return [b - 128 for b in pcm]
    step = bits // 8
    if bits not in (16, 24, 32):
        raise ValueError("unsupported PCM sample width")
    out = []
    order = "big" if big_endian else "little"
    full = (len(pcm) // step) * step
    for i in range(0, full, step):
        out.append(int.from_bytes(pcm[i:i + step], order,
                                  signed=True))
    return out


def decode_audio_pcm(data: bytes) -> tuple[int, int, list[int]]:
    """Decode an audio container to ``(sample_rate, n_channels,
    mono_samples)`` with pure stdlib:

    - RIFF/WAVE: integer PCM 8/16/24/32-bit, G.711 A-law/μ-law
      (format tags 1/6/7)
    - AIFF and AIFC (FORM containers, big-endian PCM; AIFC
      compression types NONE, sowt = little-endian PCM 16,
      ulaw/ULAW and alaw/ALAW via the same G.711 expanders)
    - Sun AU/SND (encodings 1 μ-law, 2-5 linear PCM 8/16/24/32,
      27 A-law)

    The companded telephony codecs expand to 13/14-bit linear via
    the public G.711 segment formulas. Multi-channel audio is
    downmixed by exact integer mean (sum // n_channels) in every
    container, so the SAME recording shipped as WAV, AIFF or AU
    decodes to identical samples — the cross-container identity the
    tests pin with CPython's pluck-pcm* fixtures. Raises ValueError
    for perceptual codecs (MP3/AAC/Vorbis need codec libraries) and
    malformed files."""
    if data[:4] == b"FORM" and data[8:12] in (b"AIFF", b"AIFC"):
        return _aiff_audio(data)
    if data[:4] == b".snd":
        return _au_audio(data)
    if data[:4] == b"fLaC":
        from goose_parser_spark.ops.flaccodec import decode_flac
        return decode_flac(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE, AIFF/AIFC, AU or FLAC "
                         "file")
    pos = 12
    fmt = None
    pcm: bytes | None = None
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, _, _, bits = fmt
    if channels < 1:
        raise ValueError("bad channel count")
    if tag == 1 and bits in (8, 16, 24, 32):
        samples = _pcm_samples(pcm, bits, big_endian=False)
    elif tag == 7 and bits == 8:
        samples = [_ulaw_to_linear(b) for b in pcm]
    elif tag == 6 and bits == 8:
        samples = [_alaw_to_linear(b) for b in pcm]
    else:
        raise ValueError(
            "unsupported WAV (need PCM 8..32-bit or G.711 a/u-law)")
    return rate, channels, _downmix(samples, channels)


def _f80_int(b: bytes) -> int:
    """80-bit IEEE 754 extended float → nearest int (AIFF sample
    rates are small integers; the format is exponent:15 in a u16 +
    explicit-leading-bit mantissa u64)."""
    if len(b) < 10:
        raise ValueError("truncated extended float")
    se = struct.unpack(">H", b[:2])[0]
    mant = struct.unpack(">Q", b[2:10])[0]
    exp = (se & 0x7FFF) - 16383 - 63
    if mant == 0:
        return 0
    v = mant * (2.0 ** exp)
    return int(v + 0.5) if se < 0x8000 else -int(v + 0.5)


def _aiff_audio(data: bytes) -> tuple[int, int, list[int]]:
    pos = 12
    n = len(data)
    is_aifc = data[8:12] == b"AIFC"
    comm = None
    comp = b"NONE"
    ssnd: bytes | None = None
    while pos + 8 <= n:
        cid = data[pos:pos + 4]
        size = struct.unpack(">I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
        if cid == b"COMM" and len(body) >= 18:
            channels, _frames, bits = struct.unpack(">HIH", body[:8])
            rate = _f80_int(body[8:18])
            comm = (channels, bits, rate)
            if is_aifc and len(body) >= 22:
                comp = body[18:22]
        elif cid == b"SSND" and len(body) >= 8:
            off = struct.unpack(">I", body[:4])[0]
            ssnd = body[8 + off:]
    if comm is None or ssnd is None:
        raise ValueError("missing COMM/SSND chunk")
    channels, bits, rate = comm
    if channels < 1:
        raise ValueError("bad channel count")
    ctag = comp.upper()
    if ctag == b"NONE":
        samples = _pcm_samples(ssnd, bits, big_endian=True,
                               signed8=True)
    elif ctag == b"SOWT" and bits == 16:
        samples = _pcm_samples(ssnd, 16, big_endian=False)
    elif ctag == b"ULAW":
        samples = [_ulaw_to_linear(b) for b in ssnd]
    elif ctag == b"ALAW":
        samples = [_alaw_to_linear(b) for b in ssnd]
    else:
        raise ValueError(f"unsupported AIFC compression "
                         f"{comp.decode('latin-1')!r}")
    return rate, channels, _downmix(samples, channels)


def _au_audio(data: bytes) -> tuple[int, int, list[int]]:
    if len(data) < 24:
        raise ValueError("truncated AU header")
    off, size, enc, rate, channels = struct.unpack(">5I", data[4:24])
    if off < 24 or channels < 1:
        raise ValueError("bad AU header")
    end = len(data) if size in (0, 0xFFFFFFFF) \
        else min(len(data), off + size)
    pcm = data[off:end]
    if enc == 1:
        samples = [_ulaw_to_linear(b) for b in pcm]
    elif enc == 27:
        samples = [_alaw_to_linear(b) for b in pcm]
    elif enc in (2, 3, 4, 5):
        bits = (8, 16, 24, 32)[enc - 2]
        samples = _pcm_samples(pcm, bits, big_endian=True,
                               signed8=True)
    else:
        raise ValueError(f"unsupported AU encoding {enc}")
    return rate, channels, _downmix(samples, channels)


def audio_frame_features(samples: list[int],
                         frame: int = 400) -> list[tuple[int, int]]:
    """Per-frame (mean_abs_amplitude, zero_crossings) over fixed-size
    windows — the deterministic integer front-end for audio quality /
    silence filtering (no floats, no FFT: bit-identical everywhere).
    The trailing partial frame is dropped (its statistics are not
    comparable)."""
    out = []
    for off in range(0, len(samples) - frame + 1, frame):
        w = samples[off:off + frame]
        energy = sum(abs(s) for s in w) // frame
        zc = sum(1 for i in range(1, frame)
                 if (w[i - 1] < 0) != (w[i] < 0))
        out.append((energy, zc))
    return out


def avi_video_chunks(data: bytes) -> tuple[int | None, list[bytes]]:
    """Parse a RIFF/AVI container and return ``(micro_sec_per_frame,
    video-stream chunk payloads in file order)`` — pure container
    walking, no codec work. Video chunks are the ``##dc``/``##db``
    (compressed/uncompressed DIB) ids inside the ``movi`` LIST; the
    ``avih`` main header contributes the frame period when present.
    The bytes INSIDE each chunk are whatever the stream's codec
    emits — MJPEG chunks decode via :func:`decode_image_gray`
    downstream; other codecs are poison-isolated per frame upstream.
    Raises ValueError when the RIFF/AVI envelope is absent."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    uspf: int | None = None
    frames: list[bytes] = []
    hexdig = frozenset(b"0123456789ABCDEFabcdef")

    def walk(pos: int, end: int) -> None:
        nonlocal uspf
        while pos + 8 <= end:
            cid = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            body = pos + 8
            bend = min(body + size, end)
            if cid == b"LIST":
                walk(body + 4, bend)
            elif cid == b"avih" and size >= 4 and uspf is None:
                uspf = struct.unpack("<I", data[body:body + 4])[0]
            elif (cid[2:4] in (b"dc", b"db")
                  and cid[0] in hexdig and cid[1] in hexdig):
                frames.append(data[body:bend])
            pos = body + size + (size & 1)  # chunks are word-aligned

    # the RIFF size field counts from offset 8 (it includes 'AVI ')
    walk(12, min(8 + struct.unpack("<I", data[4:8])[0], len(data)))
    return uspf, frames


def probe_media(data: bytes) -> tuple[str, int | None, int | None,
                                      int | None]:
    """Header-only media probe: ``(format, width, height,
    duration_ms)`` WITHOUT decoding — the size/duration filter a
    100 TB multimodal pipeline runs before paying for any decode
    (LAION-style min-resolution rules, clip-length caps). Pure struct
    parsing, so it covers formats whose PIXEL decode needs codec
    libraries: JPEG (SOF scan), PNG (IHDR), GIF (logical screen),
    BMP, WebP (VP8/VP8L/VP8X), WAV (duration from fmt+data sizes),
    ISO-BMFF (MP4 mvhd/tkhd; AVIF/HEIF dims via meta>iprp>ipco>ispe),
    MP3 (frame-header bitrate behind an optional ID3v2 tag, CBR
    duration estimate), FLAC (STREAMINFO exact duration), Ogg
    (Opus/Vorbis id packet + last-page granule duration) and
    Matroska/WebM (EBML DocType, Info duration, Video dims). Returns NULLs for fields a format does not carry;
    raises ValueError for unrecognized bytes."""
    n = len(data)
    if data[:3] == b"\xff\xd8\xff":  # JPEG: scan markers for SOFn
        pos = 2
        while pos + 9 < n:
            if data[pos] != 0xFF:
                pos += 1
                continue
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            size = struct.unpack(">H", data[pos + 2:pos + 4])[0]
            if (0xC0 <= marker <= 0xCF
                    and marker not in (0xC4, 0xC8, 0xCC)):
                h, w = struct.unpack(">HH", data[pos + 5:pos + 9])
                return ("jpeg", w, h, None)
            pos += 2 + size
        raise ValueError("JPEG without SOF marker")
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", data[16:24])
        return ("png", w, h, None)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return ("gif", w, h, None)
    if data[:2] == b"BM":
        w, h = struct.unpack("<ii", data[18:26])
        return ("bmp", w, abs(h), None)
    if data[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"):
        try:
            w, h, _sz, _off = max(_ico_entries(data),
                                  key=lambda e: e[0] * e[1])
        except ValueError:
            return (None, None, None, None)
        return ("ico", w, h, None)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        tag = data[12:16]
        if tag == b"VP8X":
            w = 1 + int.from_bytes(data[24:27], "little")
            h = 1 + int.from_bytes(data[27:30], "little")
            return ("webp", w, h, None)
        if tag == b"VP8L":
            bits = int.from_bytes(data[21:25], "little")
            return ("webp", (bits & 0x3FFF) + 1,
                    ((bits >> 14) & 0x3FFF) + 1, None)
        if tag == b"VP8 ":
            w, h = struct.unpack("<HH", data[26:30])
            return ("webp", w & 0x3FFF, h & 0x3FFF, None)
        raise ValueError("unrecognized WebP variant")
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        rate, nch, bits, dsize = None, None, None, None
        pos = 12
        while pos + 8 <= n:
            cid = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            if cid == b"fmt ":
                _, nch, rate, _, _, bits = struct.unpack(
                    "<HHIIHH", data[pos + 8:pos + 24])
            elif cid == b"data":
                dsize = size
            pos += 8 + size + (size & 1)
        if rate and nch and bits and dsize is not None:
            dur = dsize * 8000 // (rate * nch * bits)
            return ("wav", None, None, dur)
        raise ValueError("malformed WAV")
    if data[:4] == b"FORM" and data[8:12] in (b"AIFF", b"AIFC"):
        pos = 12
        while pos + 8 <= n:
            cid = data[pos:pos + 4]
            size = struct.unpack(">I", data[pos + 4:pos + 8])[0]
            if cid == b"COMM" and size >= 18:
                _ch, frames, _bits = struct.unpack(
                    ">HIH", data[pos + 8:pos + 16])
                rate = _f80_int(data[pos + 16:pos + 26])
                if rate:
                    return ("aiff", None, None,
                            frames * 1000 // rate)
            pos += 8 + size + (size & 1)
        raise ValueError("malformed AIFF")
    if data[:4] == b".snd" and n >= 24:
        off, dsize, enc, rate, nch = struct.unpack(">5I", data[4:24])
        widths = {1: 1, 2: 1, 3: 2, 4: 3, 5: 4, 27: 1}
        if rate and nch and enc in widths:
            if dsize in (0, 0xFFFFFFFF):
                dsize = max(0, n - off)
            dur = dsize * 1000 // (rate * nch * widths[enc])
            return ("au", None, None, dur)
        raise ValueError("malformed AU")
    if data[:4] in (b"II*\x00", b"MM\x00*"):  # TIFF: dims from tags
        try:
            e = "<" if data[:2] == b"II" else ">"
            ifd = struct.unpack(e + "I", data[4:8])[0]
            n_tags = struct.unpack(e + "H", data[ifd:ifd + 2])[0]
            w = h = None
            for i in range(n_tags):
                off = ifd + 2 + 12 * i
                tag, typ, _cnt = struct.unpack(e + "HHI",
                                               data[off:off + 8])
                if tag in (256, 257) and typ in (3, 4):
                    fmt = "H" if typ == 3 else "I"
                    v = struct.unpack(e + fmt,
                                      data[off + 8:off + 8
                                           + (2 if typ == 3 else 4)])[0]
                    if tag == 256:
                        w = v
                    else:
                        h = v
            if w and h:
                return ("tiff", w, h, None)
        except struct.error:
            pass
        raise ValueError("TIFF without dimension tags")
    if n >= 12 and data[4:8] == b"ftyp":  # ISO-BMFF: MP4 / AVIF / HEIF
        dur_ms = width = height = None
        ftyp_len = struct.unpack(">I", data[:4])[0]
        brands = {bytes(data[i:i + 4])
                  for i in range(8, min(ftyp_len, n) - 3, 4)}
        if brands & {b"avif", b"avis"}:
            fmt = "avif"
        elif brands & {b"heic", b"heix", b"mif1"}:
            fmt = "heif"
        else:
            fmt = "mp4"

        def walk(lo: int, hi: int) -> None:
            nonlocal dur_ms, width, height
            pos = lo
            while pos + 8 <= hi:
                size = struct.unpack(">I", data[pos:pos + 4])[0]
                btype = data[pos + 4:pos + 8]
                body = pos + 8
                if size == 1:  # 64-bit box size
                    size = struct.unpack(">Q", data[body:body + 8])[0]
                    body += 8
                if size < 8 or pos + size > hi:
                    break
                if btype in (b"moov", b"trak"):
                    walk(body, pos + size)
                elif btype == b"meta":   # FullBox: skip version/flags
                    walk(body + 4, pos + size)
                elif btype in (b"iprp", b"ipco"):
                    walk(body, pos + size)
                elif btype == b"ispe" and width is None:
                    width, height = struct.unpack(
                        ">II", data[body + 4:body + 12])
                elif btype == b"mvhd":
                    ver = data[body]
                    if ver == 1:
                        ts, dur = struct.unpack(
                            ">IQ", data[body + 20:body + 32])
                    else:
                        ts, dur = struct.unpack(
                            ">II", data[body + 12:body + 20])
                    if ts:
                        dur_ms = dur * 1000 // ts
                elif btype == b"tkhd" and width is None:
                    ver = data[body]
                    off = body + (88 if ver == 1 else 76)
                    w16, h16 = struct.unpack(">II", data[off:off + 8])
                    if w16 and h16:  # 16.16 fixed point
                        width, height = w16 >> 16, h16 >> 16
                pos += size

        walk(0, n)
        if dur_ms is None and width is None:
            raise ValueError("ISO-BMFF without moov/meta metadata")
        return (fmt, width, height, dur_ms)
    if data[:4] == b"OggS" and n >= 28:
        return _probe_ogg(data)
    if data[:4] == b"\x1a\x45\xdf\xa3":  # EBML: Matroska / WebM
        return _probe_ebml(data)
    if data[:4] == b"fLaC" and n >= 22:
        # STREAMINFO is the mandatory first metadata block: 4-byte
        # block header, then min/max blocksize (4) + min/max
        # framesize (6), then 20 bits sample rate | 3 bits channels-1
        # | 5 bits bps-1 | 36 bits total samples (big-endian packing)
        word = int.from_bytes(data[18:26], "big")
        rate = word >> 44
        total = word & ((1 << 36) - 1)
        dur = (total * 1000 // rate) if rate and total else None
        return ("flac", None, None, dur)
    mp3 = _probe_mp3(data)
    if mp3 is not None:
        return mp3
    raise ValueError("unrecognized media container")


# MPEG audio frame-header tables (public: ISO/IEC 11172-3): Layer III
# bitrates (kbps; index 0 = "free", 15 = invalid) and sample rates by
# version (MPEG1 / MPEG2 / MPEG2.5), index 3 invalid.
_MP3_BITRATE_V1 = (0, 32, 40, 48, 56, 64, 80, 96, 112,
                   128, 160, 192, 224, 256, 320)
_MP3_BITRATE_V2 = (0, 8, 16, 24, 32, 40, 48, 56, 64,
                   80, 96, 112, 128, 144, 160)
_MP3_RATES = {3: (44100, 48000, 32000),    # MPEG1
              2: (22050, 24000, 16000),    # MPEG2
              0: (11025, 12000, 8000)}     # MPEG2.5


def _probe_ogg(data: bytes) -> tuple[str, None, None, int | None]:
    """Ogg container probe: the first page's first packet identifies
    the codec (OpusHead / \\x01vorbis — RFC 7845 / Vorbis I spec),
    and duration comes from the LAST page's granule position (Opus
    granules run at a fixed 48 kHz minus pre-skip; Vorbis granules at
    the id-header sample rate). Pages are walked via their segment
    tables — no payload scanning heuristics."""
    n = len(data)
    nseg = data[26]
    body = 27 + nseg
    first = data[body:body + 16]
    fmt, rate, pre_skip = "ogg", None, 0
    if first.startswith(b"OpusHead") and body + 12 <= n:
        fmt = "ogg-opus"
        rate = 48000
        pre_skip = struct.unpack("<H", data[body + 10:body + 12])[0]
    elif first[:7] == b"\x01vorbis" and body + 16 <= n:
        fmt = "ogg-vorbis"
        rate = struct.unpack("<I", data[body + 12:body + 16])[0]
    granule = None
    pos = 0
    while pos + 27 <= n and data[pos:pos + 4] == b"OggS":
        g = struct.unpack("<q", data[pos + 6:pos + 14])[0]
        ns = data[pos + 26]
        seg = data[pos + 27:pos + 27 + ns]
        if len(seg) < ns:
            break
        if g >= 0:
            granule = g
        pos += 27 + ns + sum(seg)
    dur = None
    if rate and granule:
        samples = max(0, granule - pre_skip)
        dur = samples * 1000 // rate
    return (fmt, None, None, dur)


def _ebml_vint(data: bytes, pos: int,
               keep_marker: bool) -> tuple[int, int]:
    """EBML variable-width integer at ``pos``: element IDs keep the
    length-marker bit (matching the spec's hex notation), sizes strip
    it. Returns (value, total_bytes)."""
    b0 = data[pos]
    if b0 == 0:
        raise ValueError("bad EBML vint")
    mask = 0x80
    length = 1
    while not (b0 & mask):
        mask >>= 1
        length += 1
    v = b0 if keep_marker else b0 & (mask - 1)
    for i in range(1, length):
        v = (v << 8) | data[pos + i]
    return v, length


def _probe_ebml(data: bytes) -> tuple[str, int | None, int | None,
                                      int | None]:
    """Matroska / WebM probe (public EBML + Matroska specs): DocType
    from the EBML header names the format; Segment > Info yields
    TimestampScale (default 10^6 ns) + float Duration; Segment >
    Tracks > TrackEntry > Video yields PixelWidth/PixelHeight.
    Unknown-size elements (all-ones vint — common for streamed
    Segments) extend to the end of the available bytes."""
    n = len(data)
    fmt = "mkv"
    dur_ticks: float | None = None
    scale = 1_000_000
    width = height = None

    def walk(pos: int, end: int, depth: int) -> None:
        nonlocal fmt, dur_ticks, scale, width, height
        while pos + 2 <= end:
            try:
                eid, idlen = _ebml_vint(data, pos, True)
                size, szlen = _ebml_vint(data, pos + idlen, False)
            except (ValueError, IndexError):
                return
            body = pos + idlen + szlen
            unknown = size == (1 << (7 * szlen)) - 1
            bend = end if unknown else min(body + size, end)
            if eid == 0x1A45DFA3 and depth == 0:      # EBML header
                walk(body, bend, depth + 1)
            elif eid == 0x4282:                        # DocType
                name = data[body:bend].split(b"\x00")[0]
                fmt = {b"webm": "webm"}.get(name, "mkv")
            elif eid == 0x18538067 and depth == 0:     # Segment
                walk(body, bend, depth + 1)
            elif eid in (0x1549A966, 0x1654AE6B):      # Info / Tracks
                walk(body, bend, depth + 1)
            elif eid == 0xAE or eid == 0xE0:           # TrackEntry/Video
                walk(body, bend, depth + 1)
            elif eid == 0x2AD7B1:                      # TimestampScale
                scale = int.from_bytes(data[body:bend], "big")
            elif eid == 0x4489:                        # Duration (float)
                raw = data[body:bend]
                if len(raw) == 4:
                    dur_ticks = struct.unpack(">f", raw)[0]
                elif len(raw) == 8:
                    dur_ticks = struct.unpack(">d", raw)[0]
            elif eid == 0xB0:                          # PixelWidth
                width = int.from_bytes(data[body:bend], "big")
            elif eid == 0xBA:                          # PixelHeight
                height = int.from_bytes(data[body:bend], "big")
            if unknown:
                # can't know where an unknown-size element ends
                # without full parsing; its children were walked
                return
            pos = body + size

    walk(0, n, 0)
    dur_ms = None
    if dur_ticks is not None and scale:
        dur_ms = int(dur_ticks * scale / 1_000_000_000 * 1000)
    return (fmt, width, height, dur_ms)


def _probe_mp3(data: bytes) -> tuple[str, None, None, int | None] | None:
    """Recognize an MPEG Layer III stream (optionally behind an ID3v2
    tag) from its first frame header and estimate duration from the
    CBR bitrate — the clip-length filter for the web's most common
    audio format, no decode. Returns None when the bytes are not an
    MP3 (the caller falls through to 'unrecognized')."""
    pos = 0
    n = len(data)
    if data[:3] == b"ID3" and n >= 10:
        # ID3v2 size: 4 synchsafe bytes (7 bits each) after flags;
        # flag bit 4 adds a 10-byte footer between tag and first frame
        size = _synchsafe(data[6:10])
        pos = 10 + size + (10 if data[5] & 0x10 else 0)
    if pos + 4 > n or data[pos] != 0xFF or (data[pos + 1] & 0xE0) != 0xE0:
        return None
    b1, b2 = data[pos + 1], data[pos + 2]
    version = (b1 >> 3) & 0x03          # 3=MPEG1 2=MPEG2 0=MPEG2.5
    layer = (b1 >> 1) & 0x03            # 1 = Layer III
    br_idx = (b2 >> 4) & 0x0F
    sr_idx = (b2 >> 2) & 0x03
    if version == 1 or layer != 1 or br_idx == 15 or sr_idx == 3:
        return None
    table = _MP3_BITRATE_V1 if version == 3 else _MP3_BITRATE_V2
    kbps = table[br_idx]
    # duration: audio bytes at the first frame's (CBR-assumed)
    # bitrate; VBR streams get the same first-frame estimate every
    # CBR-unaware tool gives. Free-format (index 0) -> unknown.
    dur = ((n - pos) * 8 // kbps) if kbps else None
    return ("mp3", None, None, dur)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> list[int]:
    """GIF-flavor LZW: variable-width codes (LSB-first bit packing),
    CLEAR resets the table, EOI ends the stream; code width grows
    after the table fills 2^width (capped at 12 bits per the spec).
    The spec cap also bounds ``min_code_size``: width starts at
    mcs+1 and may never exceed 12, so mcs>11 is corrupt — and must
    be rejected BEFORE ``reset()`` builds a 2^mcs-entry table (a
    single flipped byte would otherwise drive an unbounded
    allocation loop)."""
    if not 1 <= min_code_size <= 11:
        raise ValueError("corrupt LZW minimum code size")
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset() -> int:
        nonlocal table
        table = [[i] for i in range(clear)] + [[], []]
        return min_code_size + 1

    width = reset()
    acc = bits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                width = reset()
                prev = None
                continue
            if code == eoi:
                return out
            if code < len(table) and table[code]:
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + [prev[0]]  # the KwKwK case
            else:
                raise ValueError("corrupt LZW stream")
            out.extend(entry)
            if prev is not None:
                table.append(prev + [entry[0]])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= n_expected:
                return out[:n_expected]
    return out


def _gif_gray(data: bytes) -> tuple[int, int, list[int]]:
    """Still-image GIF decode: the COMPOSED first frame on the
    logical screen (delegates to :func:`gif_frames_gray` with
    ``max_frames=1`` — one block walk, one LZW, one palette/interlace
    path for stills and animations alike). Sub-rect first frames
    composite over the background color; GCE transparency is
    honored — what a viewer shows, which is what the pHash should
    fingerprint. Stops after the first frame, so trailing garbage
    blocks cannot fail a decodable still."""
    sw, sh, frames = gif_frames_gray(data, max_frames=1)
    return sw, sh, frames[0]


def gif_frames_gray(data: bytes,
                    max_frames: int | None = None,
                    ) -> tuple[int, int, list[list[int]]]:
    """Decode an animated GIF into COMPOSED grayscale canvases, one
    per frame: sub-rectangle frames are painted onto the logical
    screen honoring the Graphic Control Extension — transparency
    (transparent-index pixels leave the canvas untouched) and
    disposal methods 0/1 (leave), 2 (restore rect to background) and
    3 (restore the pre-frame canvas). Local palettes and per-frame
    interlace supported. Returns ``(screen_w, screen_h, frames)``
    where each frame is the full composed canvas — what a viewer
    shows at that point of the animation, which is what frame
    sampling should fingerprint. ``max_frames`` stops the walk early
    (the still-image path uses 1, staying tolerant of trailing
    garbage blocks)."""
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        raise ValueError("not a GIF")
    if max_frames is None:
        max_frames = MAX_FRAMES
    sw, sh, flags, bg_idx = struct.unpack("<HHBB", data[6:12])
    if sw > 0 and sh > 0:
        max_frames = min(max_frames, max(1, MAX_ANIM_PIXELS // (sw * sh)))
    pos = 13
    global_pal: bytes | None = None
    if flags & 0x80:
        size = 3 * (2 << (flags & 7))
        global_pal = data[pos:pos + size]
        pos += size
    if global_pal is not None and 3 * bg_idx + 2 < len(global_pal):
        bg_gray = _gray(global_pal[3 * bg_idx],
                        global_pal[3 * bg_idx + 1],
                        global_pal[3 * bg_idx + 2])
    else:
        bg_gray = 0
    _check_pixels(sw, sh, "GIF screen")
    canvas = [bg_gray] * (sw * sh)
    frames: list[list[int]] = []
    disposal = 0
    transparent = -1
    n = len(data)
    while pos < n:
        b = data[pos]
        if b == 0x21:  # extension
            label = data[pos + 1] if pos + 1 < n else 0
            pos += 2
            if label == 0xF9 and pos < n and data[pos] >= 4:
                gflags = data[pos + 1]
                disposal = (gflags >> 2) & 7
                transparent = data[pos + 4] if gflags & 1 else -1
            while pos < n and data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            fx, fy, w, h, iflags = struct.unpack(
                "<HHHHB", data[pos + 1:pos + 10])
            _check_pixels(w, h, "GIF frame")
            pos += 10
            pal = global_pal
            if iflags & 0x80:
                size = 3 * (2 << (iflags & 7))
                pal = data[pos:pos + size]
                pos += size
            if pal is None:
                raise ValueError("GIF frame without color table")
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while pos < n and data[pos]:
                cnt = data[pos]
                lzw += data[pos + 1:pos + 1 + cnt]
                pos += 1 + cnt
            pos += 1  # block terminator
            idx = _lzw_decode(bytes(lzw), mcs, w * h)
            if len(idx) < w * h:
                raise ValueError("truncated GIF frame data")
            if iflags & 0x40:  # interlaced rows
                order = ([*range(0, h, 8)] + [*range(4, h, 8)]
                         + [*range(2, h, 4)] + [*range(1, h, 2)])
                rows = [idx[i * w:(i + 1) * w] for i in range(h)]
                remap: list = [None] * h
                for src, dst in enumerate(order):
                    remap[dst] = rows[src]
                idx = [v for row in remap for v in row]
            lut = [_gray(pal[3 * i], pal[3 * i + 1], pal[3 * i + 2])
                   if 3 * i + 2 < len(pal) else 0
                   for i in range(256)]
            saved = list(canvas) if disposal == 3 else None
            for j in range(h):
                if fy + j >= sh:
                    break
                row = (fy + j) * sw
                src = j * w
                for i in range(min(w, sw - fx)):
                    v = idx[src + i]
                    if v != transparent:
                        canvas[row + fx + i] = lut[v]
            frames.append(list(canvas))
            if max_frames is not None and len(frames) >= max_frames:
                return sw, sh, frames
            if disposal == 2:
                for j in range(h):
                    if fy + j >= sh:
                        break
                    row = (fy + j) * sw
                    for i in range(min(w, sw - fx)):
                        canvas[row + fx + i] = bg_gray
            elif disposal == 3 and saved is not None:
                canvas = saved
            disposal = 0
            transparent = -1
        elif b == 0x3B:
            break
        else:
            raise ValueError("corrupt GIF block stream")
    if not frames:
        raise ValueError("GIF without an image frame")
    return sw, sh, frames


def _tiff_gray(data: bytes) -> tuple[int, int, list[int]]:
    if data[:4] == b"II*\x00":
        e = "<"
    elif data[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF")
    ifd = struct.unpack(e + "I", data[4:8])[0]
    if ifd + 2 > len(data):
        raise ValueError("truncated TIFF (IFD out of range)")
    n_tags = struct.unpack(e + "H", data[ifd:ifd + 2])[0]
    if ifd + 2 + 12 * n_tags > len(data):
        raise ValueError("truncated TIFF (IFD entries out of range)")
    tags: dict[int, list[int]] = {}
    for i in range(n_tags):
        off = ifd + 2 + 12 * i
        tag, typ, cnt = struct.unpack(e + "HHI", data[off:off + 8])
        size = {1: 1, 3: 2, 4: 4}.get(typ)
        if size is None:
            continue
        total = size * cnt
        voff = off + 8 if total <= 4 else \
            struct.unpack(e + "I", data[off + 8:off + 12])[0]
        if voff + total > len(data):
            raise ValueError("truncated TIFF (tag value out of range)")
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack(
            e + fmt * cnt, data[voff:voff + total]))
    try:
        width, height = tags[256][0], tags[257][0]
        offsets, counts = tags[273], tags[279]
    except KeyError:
        raise ValueError("TIFF missing required tags") from None
    _check_pixels(width, height, "TIFF")
    comp = tags.get(259, [1])[0]
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [1] * spp)
    if any(b != 8 for b in bps) or spp not in (1, 3):
        raise ValueError("unsupported TIFF (need 8-bit gray or RGB)")
    rows_per_strip = tags.get(278, [height])[0] or height
    need = width * height * spp
    strips = []
    total = 0
    for si, (o, c) in enumerate(zip(offsets, counts)):
        if total >= need:
            # budget: overlapping/duplicated strip entries (a crafted
            # file can declare millions pointing at one region) must
            # not accumulate past the geometry-implied size — without
            # this a 124 KB file assembled GBs before the length check
            break
        raw = data[o:o + c]
        if comp == 1:
            strips.append(raw)
        elif comp == 5:
            n_rows = min(rows_per_strip, height - si * rows_per_strip)
            strips.append(_tiff_lzw(raw, width * spp * n_rows))
        elif comp in (8, 32946):  # Deflate (Adobe & legacy tags)
            n_rows = min(rows_per_strip, height - si * rows_per_strip)
            strips.append(_bounded_inflate(raw, width * spp * n_rows))
        elif comp == 32773:
            strips.append(_packbits(raw, need - total))
        else:
            raise ValueError("unsupported TIFF compression")
        total += len(strips[-1])
    raw = b"".join(bytes(s) for s in strips)
    if len(raw) < need:
        raise ValueError("truncated TIFF pixel data")
    if tags.get(317, [1])[0] == 2:  # horizontal differencing
        raw = bytearray(raw[:need])
        stride = width * spp
        for y in range(height):
            row = y * stride
            for x in range(spp, stride):
                raw[row + x] = (raw[row + x] + raw[row + x - spp]) & 255
    if spp == 1:
        return width, height, list(raw[:need])
    return width, height, [_gray(raw[i], raw[i + 1], raw[i + 2])
                           for i in range(0, need, 3)]


def _tiff_lzw(data: bytes, n_expected: int) -> bytearray:
    """TIFF-flavor LZW (TIFF 6.0 §13): MSB-first bit packing, codes
    256=Clear / 257=EOI, table entries from 258, and the early-change
    quirk — the code width grows when the table reaches 2^width - 1
    (one code earlier than GIF's variant)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = bits = 0
    for byte in data:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= width:
            code = (acc >> (bits - width)) & ((1 << width) - 1)
            bits -= width
            if code == 256:
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == 257:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            # "early change" (the Aldus off-by-one the TIFF world
            # standardized on): transition exactly ONE code earlier
            # than real LZW. The known-good GIF pair in this module
            # is decoder >= 2^w / encoder == 2^w + 1; shifting both
            # by one gives the TIFF pair decoder >= 2^w - 1 /
            # encoder == 2^w (libtiff: maxcodep at MAXCODE(nbits)-1,
            # i.e. the decoder widens at table length 511/1023/2047).
            if len(table) >= (1 << width) - 1 and width < 12:
                width += 1
            if len(out) >= n_expected:
                return out
    return out


def _packbits(data: bytes, limit: int) -> bytearray:
    """TIFF PackBits (Apple RLE): n in 0..127 = copy n+1 literals;
    n in -127..-1 = repeat next byte 1-n times; -128 is a no-op.
    ``limit`` caps the output (RLE inflates up to 128x — a crafted
    strip must stop at the geometry-implied size, not at OOM)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < limit:
        c = data[i]
        i += 1
        if c < 128:
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:
            if i < n:
                out += bytes([data[i]]) * (257 - c)
                i += 1
    return out


# ---------------------------------------------------------------------------
# Baseline JPEG (SOF0/SOF1, Huffman-coded) — pure-stdlib, integer-only.
# Public-knowledge sources: ITU-T T.81 (the JPEG standard: marker
# segments §B, Huffman decode procedure §F.2, DC prediction, zigzag),
# ITU-R BT.601 (YCbCr: the Y channel IS the BT.601 luma, so the gray
# output needs no RGB round-trip). Progressive (SOF2) and arithmetic
# coding stay honestly out of scope (ValueError; probe_media still
# reports their dimensions). The IDCT is fixed-point integer
# (precomputed 13-bit scaled cosine tables, separable rows-then-
# columns) so decoded pixels are bit-deterministic on every machine —
# the property every other codec in this module guarantees and the
# driver value oracle depends on.
# ---------------------------------------------------------------------------

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# CU[u][x] = round(alpha(u) * cos((2x+1) u pi / 16) * 2^13), the
# orthonormal-scaled 1-D IDCT basis in 13-bit fixed point
# (alpha(0) = 1/sqrt(2), alpha(u>0) = 1)
_IDCT_CU = [
    [round((0.7071067811865476 if u == 0 else 1.0)
           * math.cos((2 * x + 1) * u * math.pi / 16) * 8192)
     for x in range(8)]
    for u in range(8)
]


class _BitReader:
    """JPEG entropy-coded segment bit reader: MSB-first, 0xFF00 byte
    stuffing unstuffed, stops (returns None / raises) at any real
    marker. ``align_restart`` consumes an expected RSTn marker."""

    __slots__ = ("data", "pos", "bits", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d, p = self.data, self.pos
        if p >= len(d):
            return False
        b = d[p]
        if b == 0xFF:
            if p + 1 < len(d) and d[p + 1] == 0x00:
                self.pos = p + 2
            else:
                return False  # a real marker: scan data ends here
        else:
            self.pos = p + 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8
        return True

    def read(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                raise ValueError("truncated JPEG scan data")
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return v

    def restart(self, expect: int) -> None:
        # byte-align, then consume RSTn (n cycles 0-7)
        self.bits = 0
        self.nbits = 0
        d, p = self.data, self.pos
        if p + 2 > len(d) or d[p] != 0xFF or d[p + 1] != 0xD0 + expect:
            raise ValueError("missing JPEG restart marker")
        self.pos = p + 2


def _huff_table(counts: bytes, symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table → {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size`` magnitude bits to a signed
    coefficient value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _idct_block(coef: list[int]) -> list[int]:
    """Separable integer IDCT of one dequantized 8x8 block (natural
    order) → 64 clamped pixels. Rows through the 13-bit basis, then
    columns; one rounding shift of the combined 2^26 scale and the /4
    normalization at the end (floor shift on the offset sum —
    deterministic everywhere)."""
    cu = _IDCT_CU
    tmp = [0] * 64  # tmp[v*8+x] = sum_u coef[v*8+u] * cu[u][x]
    for v in range(8):
        row = coef[v * 8:v * 8 + 8]
        if not any(row):
            continue
        base = v * 8
        for x in range(8):
            s = 0
            for u in range(8):
                c = row[u]
                if c:
                    s += c * cu[u][x]
            tmp[base + x] = s
    out = [0] * 64
    for x in range(8):
        col = [tmp[v * 8 + x] for v in range(8)]
        for y in range(8):
            s = 0
            cy = cu
            for v in range(8):
                t = col[v]
                if t:
                    s += t * cy[v][y]
            # scale: 2^13 * 2^13 = 2^26, IDCT norm /4 → >> 28, +128
            p = ((s + (1 << 27)) >> 28) + 128
            out[y * 8 + x] = 0 if p < 0 else (255 if p > 255 else p)
    return out


def _entropy_end(data: bytes, start: int) -> int:
    """First position at/after ``start`` holding a REAL marker (0xFF
    followed by anything but 0x00 stuffing or RST0-7) — the end of an
    entropy-coded segment."""
    pos = start
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                return pos
            pos += 2
        else:
            pos += 1
    return n


def _jpeg_gray(data: bytes) -> tuple[int, int, list[int]]:
    """Baseline (SOF0/SOF1) and progressive (SOF2) JPEG → (width,
    height, BT.601-luma pixels): the Y channel is decoded fully
    (Huffman → dequant → integer IDCT); chroma is entropy-decoded
    only where it shares a scan with luma (baseline interleave /
    progressive interleaved DC) and chroma-only progressive scans are
    skipped outright — gray output equals luma by YCbCr definition.
    Requires the luma component at maximal sampling factors (true of
    every standard 4:4:4 / 4:2:2 / 4:2:0 encoder output)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (w, h, comps) comps: [(cid, hs, vs, tq)]
    restart_interval = 0
    progressive = False
    scans = []  # progressive: per-SOS decode context
    pos = 2
    n = len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG marker stream")
        marker = data[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > n:
            break
        seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        body = data[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq == 0:
                    vals = list(body[i:i + 64]); i += 64
                else:
                    vals = list(struct.unpack(">64H", body[i:i + 128]))
                    i += 128
                qt[tq] = vals
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 15
                counts = body[i + 1:i + 17]
                total = sum(counts)
                syms = body[i + 17:i + 17 + total]
                huff[(tc, th)] = _huff_table(counts, syms)
                i += 17 + total
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("unsupported JPEG precision")
            _check_pixels(w, h, "JPEG")
            comps = []
            for c in range(nc):
                cid, hv, tq_ = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq_))
            frame = (w, h, comps)
            progressive = marker == 0xC2
        elif 0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise ValueError("unsupported JPEG coding process")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []  # (comp_index, dc_table, ac_table)
            for s in range(ns):
                cs, tda = body[1 + 2 * s], body[2 + 2 * s]
                ci = next(i for i, c in enumerate(frame[2])
                          if c[0] == cs)
                scan.append((ci, tda >> 4, tda & 15))
            if not progressive:
                return _jpeg_scan(data, pos + 2 + seglen, frame, scan,
                                  qt, huff, restart_interval)
            ss, se, ahl = body[1 + 2 * ns:4 + 2 * ns]
            entropy_start = pos + 2 + seglen
            scans.append((scan, ss, se, ahl >> 4, ahl & 15,
                          entropy_start, dict(huff), restart_interval))
            pos = _entropy_end(data, entropy_start)
            continue
        pos += 2 + seglen
    if progressive and scans:
        return _jpeg_progressive(data, frame, scans, qt)
    raise ValueError("JPEG without SOS scan")


def _jpeg_scan(data, start, frame, scan, qt, huff, restart_interval):
    w, h, comps = frame
    if w == 0 or h == 0:
        raise ValueError("empty JPEG frame")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    luma_ci = scan[0][0] if len(comps) == 1 else next(
        i for i, c in enumerate(comps) if c[0] == comps[0][0])
    # the luma (first) component must carry the max sampling factors
    # so its plane is the full-resolution gray image
    if comps[luma_ci][1] != hmax or comps[luma_ci][2] != vmax:
        raise ValueError("unsupported JPEG sampling (luma not maximal)")
    br = _BitReader(data, start)
    pred = [0] * len(comps)
    plane = [0] * (((w + 7) // 8 * 8) * ((h + 7) // 8 * 8))
    if len(scan) == 1:
        # non-interleaved single-component scan: MCU = one block
        ci, tdc, tac = scan[0]
        bw, bh = (w + 7) // 8, (h + 7) // 8
        stride = bw * 8
        nblocks = bw * bh
        for bi in range(nblocks):
            if restart_interval and bi and bi % restart_interval == 0:
                br.restart((bi // restart_interval - 1) % 8)
                pred = [0] * len(comps)
            block = _decode_block(br, huff, tdc, tac, qt[comps[ci][3]],
                                  pred, ci)
            _place(plane, stride, (bi % bw) * 8, (bi // bw) * 8, block)
        return w, h, _crop(plane, stride, w, h)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    stride = mcux * 8 * hmax
    plane = [0] * (stride * mcuy * 8 * vmax)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                br.restart((mcu_count // restart_interval - 1) % 8)
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, tdc, tac in scan:
                _, hs, vs, tq = comps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        if ci == luma_ci:
                            block = _decode_block(
                                br, huff, tdc, tac, qt[tq], pred, ci)
                            _place(plane, stride,
                                   (mx * hs + bx) * 8, (my * vs + by) * 8,
                                   block)
                        else:
                            _skip_block(br, huff, tdc, tac, pred, ci)
    return w, h, _crop(plane, stride, w, h)


def _decode_block(br, huff, tdc, tac, q, pred, ci) -> list[int]:
    coef = [0] * 64
    s = _huff_decode(br, huff[(0, tdc)])
    diff = _extend(br.read(s), s) if s else 0
    pred[ci] += diff
    coef[0] = pred[ci] * q[0]
    k = 1
    ac = huff[(1, tac)]
    while k < 64:
        rs = _huff_decode(br, ac)
        r, size = rs >> 4, rs & 15
        if size == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        coef[_ZIGZAG[k]] = _extend(br.read(size), size) * q[k]
        k += 1
    return _idct_block(coef)


def _skip_block(br, huff, tdc, tac, pred, ci) -> None:
    """Entropy-decode one block to advance the bitstream (and keep
    the DC predictor), skipping dequant + IDCT — the chroma path."""
    s = _huff_decode(br, huff[(0, tdc)])
    if s:
        pred[ci] += _extend(br.read(s), s)
    k = 1
    ac = huff[(1, tac)]
    while k < 64:
        rs = _huff_decode(br, ac)
        r, size = rs >> 4, rs & 15
        if size == 0:
            if r == 15:
                k += 16
                continue
            break
        k += r + 1
        br.read(size)


def _place(plane, stride, x0, y0, block) -> None:
    for y in range(8):
        row = (y0 + y) * stride + x0
        plane[row:row + 8] = block[y * 8:y * 8 + 8]


def _crop(plane, stride, w, h) -> list[int]:
    if stride == w:
        return plane[:w * h]
    return [plane[y * stride + x] for y in range(h) for x in range(w)]


# ----- progressive JPEG (T.81 Annex G.2: spectral selection + -----
# ----- successive approximation, Huffman entropy coding)       -----

def _jpeg_progressive(data, frame, scans, qt):
    """Decode the collected progressive scans into the luma plane.
    Coefficients accumulate across scans in ZIGZAG order per block;
    dequant + IDCT run once at the end. Chroma-only scans were never
    collected (skipped at the byte level upstream); interleaved DC
    scans decode chroma symbols only to keep bit position."""
    w, h, comps = frame
    if w == 0 or h == 0:
        raise ValueError("empty JPEG frame")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    luma_ci = 0
    if comps[luma_ci][1] != hmax or comps[luma_ci][2] != vmax:
        raise ValueError("unsupported JPEG sampling (luma not maximal)")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    hs, vs = comps[luma_ci][1], comps[luma_ci][2]
    bwp, bhp = mcux * hs, mcuy * vs      # padded luma block grid
    bw, bh = (w + 7) // 8, (h + 7) // 8  # real luma blocks
    coefs = [[0] * 64 for _ in range(bwp * bhp)]
    for scan, ss, se, ah, al, start, huff, ri in scans:
        if luma_ci not in [c[0] for c in scan]:
            continue  # chroma-only scan: independent segment, skip
        br = _BitReader(data, start)
        if ss == 0:
            if se != 0:
                raise ValueError("bad progressive DC scan band")
            _prog_dc_scan(br, scan, comps, huff, coefs, luma_ci,
                          mcux, mcuy, bwp, bw, bh, ah, al, ri)
        else:
            if len(scan) != 1:
                raise ValueError("interleaved progressive AC scan")
            _prog_ac_scan(br, scan[0], huff, coefs, bwp, bw, bh,
                          ss, se, ah, al, ri)
    q = qt[comps[luma_ci][3]]
    stride = bw * 8
    plane = [0] * (stride * bh * 8)
    for byi in range(bh):
        for bxi in range(bw):
            cz = coefs[byi * bwp + bxi]
            nat = [0] * 64
            for k in range(64):
                c = cz[k]
                if c:
                    nat[_ZIGZAG[k]] = c * q[k]
            _place(plane, stride, bxi * 8, byi * 8, _idct_block(nat))
    return w, h, _crop(plane, stride, w, h)


def _prog_dc_scan(br, scan, comps, huff, coefs, luma_ci,
                  mcux, mcuy, bwp, bw, bh, ah, al, ri):
    pred = [0] * len(comps)
    count = 0
    if len(scan) == 1:
        ci, tdc, _ = scan[0]
        # non-interleaved: the component's own block raster
        for byi in range(bh):
            for bxi in range(bw):
                if ri and count and count % ri == 0:
                    br.restart((count // ri - 1) % 8)
                    pred = [0] * len(comps)
                count += 1
                blk = coefs[byi * bwp + bxi]
                if ah == 0:
                    s = _huff_decode(br, huff[(0, tdc)])
                    diff = _extend(br.read(s), s) if s else 0
                    pred[ci] += diff
                    blk[0] = pred[ci] << al
                elif br.read(1):
                    blk[0] |= 1 << al  # two's-complement OR: sign-safe
        return
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and count and count % ri == 0:
                br.restart((count // ri - 1) % 8)
                pred = [0] * len(comps)
            count += 1
            for ci, tdc, _ in scan:
                _, chs, cvs, _tq = comps[ci]
                for by in range(cvs):
                    for bx in range(chs):
                        if ah == 0:
                            s = _huff_decode(br, huff[(0, tdc)])
                            diff = _extend(br.read(s), s) if s else 0
                            pred[ci] += diff
                            if ci == luma_ci:
                                coefs[(my * cvs + by) * bwp
                                      + mx * chs + bx][0] = pred[ci] << al
                        else:
                            bit = br.read(1)
                            if ci == luma_ci and bit:
                                coefs[(my * cvs + by) * bwp
                                      + mx * chs + bx][0] |= 1 << al


def _prog_ac_scan(br, sc, huff, coefs, bwp, bw, bh, ss, se, ah, al, ri):
    _ci, _tdc, tac = sc
    table = huff[(1, tac)]
    eobrun = 0
    count = 0
    for byi in range(bh):
        for bxi in range(bw):
            if ri and count and count % ri == 0:
                br.restart((count // ri - 1) % 8)
                eobrun = 0
            count += 1
            blk = coefs[byi * bwp + bxi]
            if ah == 0:
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _huff_decode(br, table)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.read(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC run past band end")
                    blk[k] = _extend(br.read(s), s) << al
                    k += 1
            else:
                eobrun = _prog_ac_refine_block(
                    br, table, blk, ss, se, al, eobrun)


def _prog_ac_refine_block(br, table, blk, ss, se, al, eobrun):
    """One block of an AC successive-approximation refinement scan
    (T.81 G.2.2): newly-significant coefficients arrive as ±1<<al;
    every already-nonzero coefficient IN THE PATH receives one
    correction bit (appended to its magnitude when the bit at al is
    still clear). Bitwise ops on Python ints are two's-complement, so
    the sign-carrying |/& match the spec arithmetic exactly."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(br, table)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read(r)
                    break
                # r == 15 (ZRL): pass over 16 zero-history coefs
            else:
                if s != 1:
                    raise ValueError("bad AC refinement magnitude")
                val = p1 if br.read(1) else m1
            while k <= se:
                if blk[k] != 0:
                    if br.read(1) and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if br.read(1) and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


# ------------------------------------------------------------------
# VP8L — lossless WebP (public spec: "WebP Lossless Bitstream
# Specification"). Pure stdlib: LSB-first bit reading, deflate-style
# canonical prefix codes, LZ77 backward references with the 2D
# distance neighborhood, color cache, and all four inverse transforms
# (predictor, color, subtract-green, color-indexing) plus the meta
# prefix (entropy image). Lossy VP8 still needs a real codec library
# and stays honestly rejected.

_VP8L_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16,
                  6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _vp8l_dist_table() -> list[tuple[int, int]]:
    """The 120-entry LZ77 distance neighborhood (dy=0: dx 1..8;
    dy 1..7: dx -7..8 — libwebp's kCodeToPlane packs the x offset as
    8 - nibble with nibble 0..15, so the range is [-7, 8], POSITIVE
    side wider), ordered by ascending squared Euclidean distance,
    then |dx|, then positive dx first — the rule reproduces the
    spec's published table (prefix pinned by test; the [-7,8] domain
    was review-verified against libwebp's inverse LUT, where the
    first [-8,7] cut mismapped the seven |dx|=8 codes)."""
    cand = [(dx, 0) for dx in range(1, 9)]
    cand += [(dx, dy) for dy in range(1, 8) for dx in range(-7, 9)]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1],
                             abs(p[0]), p[0] < 0))
    return cand


_VP8L_DIST = _vp8l_dist_table()


class _LsbReader:
    """LSB-first bit reader (deflate packing convention): bit 0 of
    byte 0 is the first bit of the stream. Up to 64 bits of implicit
    zero padding past the end are tolerated (encoders do not flush
    trailing zero bits); anything further raises."""

    __slots__ = ("data", "bitpos", "limit")

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.bitpos = byte_pos * 8
        self.limit = len(data) * 8

    def read(self, n: int) -> int:
        p = self.bitpos
        self.bitpos = p + n
        if self.bitpos > self.limit + 64:
            raise ValueError("VP8L bitstream overrun")
        b0 = p >> 3
        shift = p & 7
        span = (shift + n + 7) >> 3
        chunk = int.from_bytes(self.data[b0:b0 + span], "little")
        return (chunk >> shift) & ((1 << n) - 1)


def _vp8l_canonical(lengths: list[int]):
    """Canonical prefix decode table {(nbits, code): symbol} from
    per-symbol code lengths (deflate convention: codes assigned in
    (length, symbol) order, first stream bit = MSB of the code). A
    single used symbol yields the 0-bit sentinel (VP8L decodes such
    trees without consuming bits)."""
    nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
    if not nz:
        raise ValueError("empty prefix code")
    if len(nz) == 1:
        return {"single": nz[0][1]}
    table: dict = {}
    code = 0
    prev = 0
    for ln, sym in sorted(nz):
        if ln > 15:
            raise ValueError("prefix code length > 15")
        code <<= ln - prev
        table[(ln, code)] = sym
        code += 1
        prev = ln
    if code != (1 << prev):
        raise ValueError("prefix code not complete")
    return table


def _vp8l_sym(br: _LsbReader, table) -> int:
    if "single" in table:
        return table["single"]
    code = 0
    n = 0
    while n <= 15:
        code = (code << 1) | br.read(1)
        n += 1
        sym = table.get((n, code))
        if sym is not None:
            return sym
    raise ValueError("prefix code walk exceeded 15 bits")


def _vp8l_read_prefix(br: _LsbReader, alphabet: int):
    """One prefix code: 'simple' (1-2 literal symbols) or 'normal'
    (code lengths themselves prefix-coded with 16/17/18 repeats)."""
    if br.read(1):  # simple
        n_sym = br.read(1) + 1
        sym0 = br.read(8) if br.read(1) else br.read(1)
        if n_sym == 1:
            return {"single": sym0}
        sym1 = br.read(8)
        # the spec builds the canonical code from code_lengths, so
        # the numerically SMALLER symbol gets code 0 (not read order)
        lo, hi = sorted((sym0, sym1))
        return {(1, 0): lo, (1, 1): hi}
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_VP8L_CL_ORDER[i]] = br.read(3)
    cl_table = _vp8l_canonical(cl_lengths)
    if br.read(1):  # explicit number of coded symbols
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet and max_symbol > 0:
        max_symbol -= 1
        cl = _vp8l_sym(br, cl_table)
        if cl < 16:
            lengths[i] = cl
            i += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            for _ in range(min(rep, alphabet - i)):
                lengths[i] = prev
                i += 1
        elif cl == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    if i > alphabet:
        raise ValueError("code length repeat overflow")
    return _vp8l_canonical(lengths)


def _vp8l_extra(br: _LsbReader, sym: int) -> int:
    """Length/distance prefix value: symbols 0-3 literal, above that
    (2 + lsb) << extra_bits + extra + 1."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _vp8l_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _VP8L_DIST[code - 1]
    return max(1, dy * xsize + dx)


def _px_add(a: int, b: int) -> int:
    """Per-channel mod-256 addition of two ARGB words."""
    return ((((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00)
            | (((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF))


def _avg2(a: int, b: int) -> int:
    """Per-channel (a + b) // 2 (SWAR floor average)."""
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _chans(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 255, (p >> 16) & 255, (p >> 8) & 255, p & 255


def _vp8l_select(left: int, top: int, tl: int) -> int:
    la, lr, lg, lb = _chans(left)
    ta, tr_, tg, tb = _chans(top)
    ca, cr, cg, cb = _chans(tl)
    pa, pr = la + ta - ca, lr + tr_ - cr
    pg, pb = lg + tg - cg, lb + tb - cb
    p_left = (abs(pa - la) + abs(pr - lr) + abs(pg - lg) + abs(pb - lb))
    p_top = (abs(pa - ta) + abs(pr - tr_) + abs(pg - tg) + abs(pb - tb))
    return left if p_left < p_top else top


def _clamp255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _vp8l_cas_full(left: int, top: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        c = _clamp255(((left >> sh) & 255) + ((top >> sh) & 255)
                      - ((tl >> sh) & 255))
        out |= c << sh
    return out


def _vp8l_cas_half(left: int, top: int, tl: int) -> int:
    ave = _avg2(left, top)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 255
        d = a - ((tl >> sh) & 255)
        half = d // 2 if d >= 0 else -((-d) // 2)  # C trunc division
        out |= _clamp255(a + half) << sh
    return out


def _vp8l_predict(mode: int, left: int, top: int, tl: int,
                  tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), top)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(tl, top)
    if mode == 9:
        return _avg2(top, tr)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(top, tr))
    if mode == 11:
        return _vp8l_select(left, top, tl)
    if mode == 12:
        return _vp8l_cas_full(left, top, tl)
    if mode == 13:
        return _vp8l_cas_half(left, top, tl)
    raise ValueError("bad predictor mode")


def _int8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ctd(m: int, c: int) -> int:
    """ColorTransformDelta: (int8)m * (int8)c >> 5 (arithmetic)."""
    return (_int8(m) * _int8(c)) >> 5


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _vp8l_decode_stream(br: _LsbReader, w: int, h: int,
                        is_level0: bool) -> list[int]:
    """Decode one VP8L image stream to ARGB words. ``is_level0``
    enables transforms + the meta prefix (entropy image); subimages
    (transform data, entropy image, palette) recurse with False."""
    transforms: list[tuple] = []
    xsize = w
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate transform")
            seen.add(ttype)
            if ttype == 2:  # subtract green
                transforms.append((2, xsize, None))
            elif ttype in (0, 1):  # predictor / cross-color
                size_bits = br.read(3) + 2
                tw = _ceil_div(xsize, 1 << size_bits)
                th = _ceil_div(h, 1 << size_bits)
                tiles = _vp8l_decode_stream(br, tw, th, False)
                transforms.append((ttype, xsize, (size_bits, tw, tiles)))
            elif ttype == 3:  # color indexing
                n_colors = br.read(8) + 1
                pal = _vp8l_decode_stream(br, n_colors, 1, False)
                for i in range(1, n_colors):
                    pal[i] = _px_add(pal[i], pal[i - 1])
                width_bits = (3 if n_colors <= 2 else 2 if n_colors <= 4
                              else 1 if n_colors <= 16 else 0)
                transforms.append((3, xsize, (width_bits, pal)))
                if width_bits:
                    xsize = _ceil_div(xsize, 1 << width_bits)
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    meta = None
    meta_bits = 0
    meta_w = 0
    n_groups = 1
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        meta_w = _ceil_div(xsize, 1 << meta_bits)
        meta_h = _ceil_div(h, 1 << meta_bits)
        meta = _vp8l_decode_stream(br, meta_w, meta_h, False)
        n_groups = max((p >> 8) & 0xFFFF for p in meta) + 1
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append((_vp8l_read_prefix(br, green_alpha),
                       _vp8l_read_prefix(br, 256),
                       _vp8l_read_prefix(br, 256),
                       _vp8l_read_prefix(br, 256),
                       _vp8l_read_prefix(br, 40)))
    _check_pixels(max(1, xsize), max(1, h), "VP8L image")
    npix = xsize * h
    out = [0] * npix
    pos = 0
    cg, cr, cb, ca, cd = groups[0]
    while pos < npix:
        if meta is not None:
            x, y = pos % xsize, pos // xsize
            mp = meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]
            cg, cr, cb, ca, cd = groups[(mp >> 8) & 0xFFFF]
        s = _vp8l_sym(br, cg)
        if s < 256:
            r = _vp8l_sym(br, cr)
            b = _vp8l_sym(br, cb)
            a = _vp8l_sym(br, ca)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF)
                      >> (32 - cache_bits)] = px
        elif s < 280:
            length = _vp8l_extra(br, s - 256)
            dist = _vp8l_distance(_vp8l_extra(br, _vp8l_sym(br, cd)),
                                  xsize)
            if dist > pos or pos + length > npix:
                raise ValueError("LZ77 reference out of range")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = px
        else:
            if cache is None:
                raise ValueError("cache symbol without color cache")
            out[pos] = cache[s - 280]
            pos += 1
    # inverse transforms, reverse reading order; each was recorded
    # with the xsize current when it was READ, so the buffer width
    # always matches the transform's own geometry
    width = xsize
    for ttype, wr, arg in reversed(transforms):
        if ttype == 3:
            width_bits, pal = arg
            if width_bits:
                packed_w = width
                unpacked = [0] * (wr * h)
                ppb = 1 << width_bits          # pixels per packed byte
                ibits = 8 >> width_bits        # bits per index
                imask = (1 << ibits) - 1
                for y in range(h):
                    row = y * packed_w
                    orow = y * wr
                    for x in range(wr):
                        g = (out[row + (x >> width_bits)] >> 8) & 255
                        idx = (g >> ((x & (ppb - 1)) * ibits)) & imask
                        unpacked[orow + x] = (pal[idx]
                                              if idx < len(pal) else 0)
                out = unpacked
            else:
                for i in range(len(out)):
                    idx = (out[i] >> 8) & 255
                    out[i] = pal[idx] if idx < len(pal) else 0
            width = wr
        elif ttype == 2:
            for i in range(len(out)):
                p = out[i]
                g = (p >> 8) & 255
                r = ((p >> 16) + g) & 255
                b = (p + g) & 255
                out[i] = (p & 0xFF00FF00) | (r << 16) | b
        elif ttype == 0:  # predictor
            size_bits, tw, tiles = arg
            for y in range(h):
                row = y * width
                for x in range(width):
                    i = row + x
                    if x == 0 and y == 0:
                        pred = 0xFF000000
                    elif y == 0:
                        pred = out[i - 1]
                    elif x == 0:
                        pred = out[i - width]
                    else:
                        mode = (tiles[(y >> size_bits) * tw
                                      + (x >> size_bits)] >> 8) & 255
                        # contiguous-buffer TR: for the last column
                        # this wraps to the current row's first pixel
                        pred = _vp8l_predict(
                            mode, out[i - 1], out[i - width],
                            out[i - width - 1], out[i - width + 1])
                    out[i] = _px_add(out[i], pred)
        else:  # ttype == 1, cross-color
            size_bits, tw, tiles = arg
            for y in range(h):
                row = y * width
                for x in range(width):
                    i = row + x
                    cte = tiles[(y >> size_bits) * tw + (x >> size_bits)]
                    g2r = cte & 255          # stored in blue channel
                    g2b = (cte >> 8) & 255   # stored in green channel
                    r2b = (cte >> 16) & 255  # stored in red channel
                    p = out[i]
                    g = (p >> 8) & 255
                    r = (((p >> 16) & 255) + _ctd(g2r, g)) & 255
                    b = ((p & 255) + _ctd(g2b, g) + _ctd(r2b, r)) & 255
                    out[i] = (p & 0xFF00FF00) | (r << 16) | b
    return out


def _webp_gray(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a WebP file to grayscale — lossless (VP8L) or lossy
    (VP8 keyframe via ops/vp8.py), directly or inside a VP8X
    extended container. For lossy streams the decoded Y plane is
    returned as-is: it already is the BT.601 luma the gray pipeline
    computes from RGB everywhere else."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if tag == b"VP8L":
            payload = data[pos + 8:pos + 8 + size]
            break
        if tag == b"VP8 ":
            from goose_parser_spark.ops.vp8 import decode_vp8_gray
            return decode_vp8_gray(data[pos + 8:pos + 8 + size],
                                   max_pixels=MAX_PIXELS)
        pos += 8 + size + (size & 1)
    if payload is None or payload[:1] != b"\x2f":
        raise ValueError("no VP8L chunk")
    br = _LsbReader(payload, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    pix = _vp8l_decode_stream(br, w, h, True)
    gray = [_gray((p >> 16) & 255, (p >> 8) & 255, p & 255)
            for p in pix]
    return w, h, gray


def webp_frames_gray(
        data: bytes) -> tuple[int, int, list[list[int] | None]]:
    """Decode an ANIMATED WebP (VP8X + ANIM/ANMF, container spec) into
    composed grayscale canvases, one per frame: each ANMF sub-frame's
    VP8L or lossy VP8 payload is decoded and painted at its
    (2x-coded) offset; disposal bit 1 restores the rect to the ANIM
    background color after the frame. A malformed sub-frame yields
    ``None`` at that index (the sampler emits a per-frame poison
    row) — partial honesty beats failing the document. A plain
    VP8L file decodes as a single frame. Alpha blending is not
    applied (the gray pipeline carries no alpha); frames composite as
    opaque rects, documented behavior."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    n = len(data)
    max_frames = MAX_FRAMES
    canvas_w = canvas_h = None
    bg_gray = 0
    frames: list[list[int] | None] = []
    canvas: list[int] | None = None
    while pos + 8 <= n:
        tag = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
        if tag == b"VP8X":
            canvas_w = 1 + int.from_bytes(body[4:7], "little")
            canvas_h = 1 + int.from_bytes(body[7:10], "little")
        elif tag == b"ANIM" and len(body) >= 6:
            b_, g_, r_ = body[0], body[1], body[2]  # BGRA order
            bg_gray = _gray(r_, g_, b_)
        elif tag == b"ANMF" and len(body) >= 16:
            if canvas_w is None:
                raise ValueError("ANMF before VP8X")
            if canvas is None:
                _check_pixels(canvas_w, canvas_h, "WebP canvas")
                canvas = [bg_gray] * (canvas_w * canvas_h)
                max_frames = min(max_frames, max(
                    1, MAX_ANIM_PIXELS // (canvas_w * canvas_h)))
            fx = 2 * int.from_bytes(body[0:3], "little")
            fy = 2 * int.from_bytes(body[3:6], "little")
            fw = 1 + int.from_bytes(body[6:9], "little")
            fh = 1 + int.from_bytes(body[9:12], "little")
            dispose = body[15] & 1
            # frame data: sub-chunks (ALPH? then VP8/VP8L)
            sub = 16
            frame_px = None
            while sub + 8 <= len(body):
                stag = body[sub:sub + 8][:4]
                ssize = struct.unpack("<I", body[sub + 4:sub + 8])[0]
                sbody = body[sub + 8:sub + 8 + ssize]
                sub += 8 + ssize + (ssize & 1)
                if stag == b"VP8L" and sbody[:1] == b"\x2f":
                    br = _LsbReader(sbody, 1)
                    w = br.read(14) + 1
                    h = br.read(14) + 1
                    br.read(1)
                    if br.read(3) != 0:
                        raise ValueError("unknown VP8L version")
                    if (w, h) != (fw, fh):
                        raise ValueError("ANMF/VP8L dimension mismatch")
                    pix = _vp8l_decode_stream(br, w, h, True)
                    frame_px = [_gray((p >> 16) & 255, (p >> 8) & 255,
                                      p & 255) for p in pix]
                    break
                if stag == b"VP8 ":
                    from goose_parser_spark.ops.vp8 import (
                        VP8Error, decode_vp8_gray)
                    try:
                        w, h, px = decode_vp8_gray(
                            sbody, max_pixels=MAX_PIXELS)
                    except VP8Error:
                        break  # malformed sub-frame: poison below
                    if (w, h) != (fw, fh):
                        # header/bitstream disagreement: THIS frame
                        # is malformed — per-frame poison, not a
                        # dead document (code-review finding)
                        break
                    frame_px = px
                    break
            if frame_px is None:
                frames.append(None)
                continue
            for j in range(fh):
                if fy + j >= canvas_h:
                    break
                row = (fy + j) * canvas_w
                src = j * fw
                for i in range(min(fw, canvas_w - fx)):
                    canvas[row + fx + i] = frame_px[src + i]
            frames.append(list(canvas))
            if len(frames) >= max_frames:
                break
            if dispose:
                for j in range(fh):
                    if fy + j >= canvas_h:
                        break
                    row = (fy + j) * canvas_w
                    for i in range(min(fw, canvas_w - fx)):
                        canvas[row + fx + i] = bg_gray
        elif tag in (b"VP8L", b"VP8 ") and not frames:
            w, h, px = _webp_gray(data)
            return w, h, [px]
    if not frames or canvas_w is None:
        raise ValueError("WebP without animation frames")
    return canvas_w, canvas_h, frames


def decode_alpha_plane(chunk: bytes, w: int, h: int) -> list[int]:
    """Decode a WebP ALPH chunk (the alpha plane of a lossy VP8X
    file): method 0 = raw, method 1 = a VP8L-coded image whose green
    channel carries alpha, then one of 4 inverse prediction filters.
    Useful on its own (transparency statistics without a VP8 codec)
    and as the real-world-bitstream exercise of the VP8L entropy
    layer."""
    if not chunk:
        raise ValueError("empty ALPH chunk")
    head = chunk[0]
    method = head & 3
    filt = (head >> 2) & 3
    if method == 0:
        plane = list(chunk[1:1 + w * h])
        if len(plane) != w * h:
            raise ValueError("short raw alpha plane")
    elif method == 1:
        br = _LsbReader(chunk, 1)
        pix = _vp8l_decode_stream(br, w, h, True)
        plane = [(p >> 8) & 255 for p in pix]
    else:
        raise ValueError("reserved alpha compression method")
    if filt:
        for y in range(h):
            row = y * w
            for x in range(w):
                i = row + x
                if x == 0 and y == 0:
                    pred = 0
                elif y == 0:
                    pred = plane[i - 1]
                elif x == 0:
                    pred = plane[i - w]
                elif filt == 1:    # horizontal
                    pred = plane[i - 1]
                elif filt == 2:    # vertical
                    pred = plane[i - w]
                else:              # gradient
                    pred = _clamp255(plane[i - 1] + plane[i - w]
                                     - plane[i - w - 1])
                plane[i] = (plane[i] + pred) & 255
    return plane


# ------------------------------------------------------------------
# EXIF — camera metadata from a JPEG's APP1 segment (public specs:
# CIPA DC-008 / EXIF 2.3, TIFF 6.0 IFD structure). Pure struct
# parsing, both byte orders; the corpus-curation signals only
# (provenance, orientation for decode, capture time, true pixel
# dims, GPS presence as a privacy flag) — thumbnails, MakerNotes and
# rational GPS coordinates are deliberately not materialized.

_EXIF_ASCII = 2
_EXIF_SHORT = 3
_EXIF_LONG = 4


def _exif_ifd(exif: bytes, off: int, e: str) -> dict[int, tuple]:
    """One IFD: {tag: (type, count, value_bytes)} with offset-stored
    values resolved. Bounds-guarded; malformed entries are skipped
    (the caller treats missing tags as absent)."""
    out: dict[int, tuple] = {}
    if off + 2 > len(exif):
        return out
    n = struct.unpack(e + "H", exif[off:off + 2])[0]
    for i in range(n):
        ent = off + 2 + 12 * i
        if ent + 12 > len(exif):
            break
        tag, typ, count = struct.unpack(e + "HHI", exif[ent:ent + 8])
        size = count * {1: 1, _EXIF_ASCII: 1, _EXIF_SHORT: 2,
                        _EXIF_LONG: 4}.get(typ, 0)
        if size == 0:
            continue
        if size <= 4:
            val = exif[ent + 8:ent + 8 + size]
        else:
            voff = struct.unpack(e + "I", exif[ent + 8:ent + 12])[0]
            if voff + size > len(exif):
                continue
            val = exif[voff:voff + size]
        out[tag] = (typ, count, val)
    return out


def _exif_str(entry: tuple | None) -> str | None:
    if entry is None or entry[0] != _EXIF_ASCII:
        return None
    return entry[2].split(b"\x00", 1)[0].decode("ascii", "replace")


def _exif_int(entry: tuple | None, e: str) -> int | None:
    if entry is None:
        return None
    typ, _, val = entry
    if typ == _EXIF_SHORT and len(val) >= 2:
        return struct.unpack(e + "H", val[:2])[0]
    if typ == _EXIF_LONG and len(val) >= 4:
        return struct.unpack(e + "I", val[:4])[0]
    return None


def parse_exif(data: bytes) -> dict:
    """Extract camera metadata from a JPEG's EXIF APP1 segment:
    ``make, model, orientation, datetime_original, exif_width,
    exif_height, has_gps``. Absent tags come back None; raises
    ValueError when the file is not a JPEG or carries no EXIF
    (callers poison-isolate per document)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    exif = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        if marker in (0xD9, 0xDA):
            break
        size = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        if marker == 0xE1 and data[pos + 4:pos + 10] == b"Exif\x00\x00":
            exif = data[pos + 10:pos + 2 + size]
            break
        pos += 2 + size
    if exif is None:
        raise ValueError("no EXIF APP1 segment")
    if exif[:4] == b"II*\x00":
        e = "<"
    elif exif[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("bad TIFF header in EXIF")
    ifd0_off = struct.unpack(e + "I", exif[4:8])[0]
    ifd0 = _exif_ifd(exif, ifd0_off, e)
    sub = {}
    exif_ptr = _exif_int(ifd0.get(0x8769), e)
    if exif_ptr is not None:
        sub = _exif_ifd(exif, exif_ptr, e)
    return {
        "make": _exif_str(ifd0.get(0x010F)),
        "model": _exif_str(ifd0.get(0x0110)),
        "orientation": _exif_int(ifd0.get(0x0112), e),
        "datetime_original": (_exif_str(sub.get(0x9003))
                              or _exif_str(ifd0.get(0x0132))),
        "exif_width": _exif_int(sub.get(0xA002), e),
        "exif_height": _exif_int(sub.get(0xA003), e),
        "has_gps": 0x8825 in ifd0,
    }


def _synchsafe(b: bytes) -> int:
    return ((b[0] & 0x7F) << 21 | (b[1] & 0x7F) << 14
            | (b[2] & 0x7F) << 7 | (b[3] & 0x7F))


def parse_id3(data: bytes) -> dict:
    """Extract the provenance text frames from an ID3v2.3/2.4 tag
    (public spec: id3.org): TIT2 title, TPE1 artist, TALB album,
    with the four declared text encodings (latin-1, UTF-16 w/BOM,
    UTF-16BE, UTF-8). v2.4 frame sizes are synchsafe, v2.3 plain
    big-endian. Absent frames come back None; raises ValueError when
    no ID3v2 tag leads the payload (callers poison-isolate).
    Unsynchronised tags (rare with v2.3+) are not rewritten —
    documented boundary."""
    if data[:3] != b"ID3" or len(data) < 10:
        raise ValueError("no ID3v2 tag")
    ver = data[3]
    if ver < 3:  # v2.2 uses 3-byte frame ids/sizes — different walk
        raise ValueError("ID3v2.2 not supported")
    flags = data[5]
    size = _synchsafe(data[6:10])
    pos = 10
    end = min(10 + size, len(data))
    if flags & 0x40 and pos + 4 <= end:  # extended header present
        ext = _synchsafe(data[pos:pos + 4]) if ver >= 4 else \
            struct.unpack(">I", data[pos:pos + 4])[0]
        # v2.4 size INCLUDES the whole extended header; v2.3 excludes
        # its own 4 size bytes
        pos += ext if ver >= 4 else 4 + ext
    mapping = {b"TIT2": "title", b"TPE1": "artist", b"TALB": "album"}
    out: dict = dict.fromkeys(mapping.values())
    while pos + 10 <= end:
        fid = data[pos:pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break
        raw = data[pos + 4:pos + 8]
        fsize = _synchsafe(raw) if ver >= 4 else \
            struct.unpack(">I", raw)[0]
        body = data[pos + 10:pos + 10 + fsize]
        pos += 10 + fsize
        key = mapping.get(fid)
        if key is None or not body:
            continue
        enc, txt = body[0], body[1:]
        if enc == 0:
            val = txt.decode("latin-1", "replace")
        elif enc == 1:
            val = txt.decode("utf-16", "replace")
        elif enc == 2:
            val = txt.decode("utf-16-be", "replace")
        elif enc == 3:
            val = txt.decode("utf-8", "replace")
        else:
            continue
        out[key] = val.split("\x00", 1)[0]
    return out
