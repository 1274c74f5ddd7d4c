"""VP8 keyframe decoder (ops/vp8.py) — behavioral pins.

The decoder's correctness argument has three independent legs:

1. ROUND-TRIPS THROUGH THE REAL ENCODER: images are encoded with the
   system libwebp (simple API and, via ctypes structs mirroring the
   public encode.h, the advanced API that can force segmentation,
   the simple loop filter, sharpness levels, multiple token
   partitions and skip-enabled streams) and this decoder's Y/U/V
   planes must equal libwebp's own WebPDecodeYUV output BYTE FOR
   BYTE. The boolean arithmetic coder desynchronizes on any wrong
   probability table byte, tree shape, context rule or filter
   decision, so agreement is an end-to-end proof of every layer.
2. AN EXTERNAL FIXTURE: CPython's Lib/test/test_email/data/
   python.webp (PSF public test data, embedded below) was encoded by
   whoever produced it years ago — not by the encoder in this test —
   and must decode to the recognizable logo with pinned plane
   digests. This breaks any residual encode/decode circularity.
3. FEATURE-COVERAGE ASSERTIONS: the sweep must actually exercise
   all ten 4x4 submodes, all four 16x16/chroma modes, B_PRED,
   segmentation, 2/4/8 token partitions, skip streams and both loop
   filters — a sweep that silently stopped covering a path would
   fail, not fade.

Plus the house fuzz battery: truncations, bit flips and garbage must
raise VP8Error/ValueError (or decode) quickly — never hang, crash,
or blow the pixel budget.
"""
from __future__ import annotations

import base64
import ctypes
import hashlib
import random
import struct

import pytest

from goose_parser_spark.ops.imagecodec import (
    decode_image_gray,
    webp_frames_gray,
)
from goose_parser_spark.ops.vp8 import (
    VP8Error,
    decode_vp8,
    decode_vp8_gray,
)

# ---------------------------------------------------------------------------
# libwebp via ctypes (the reference implementation, BSD-licensed)
# ---------------------------------------------------------------------------

try:
    _LW = ctypes.CDLL("libwebp.so.7")
except OSError:  # pragma: no cover - present in the target container
    _LW = None

needs_libwebp = pytest.mark.skipif(_LW is None,
                                   reason="libwebp.so.7 not present")

_ABI = 0x020F  # libwebp 1.2.x encoder ABI version


class _WebPConfig(ctypes.Structure):
    # mirrors the public webp/encode.h WebPConfig (1.2.x layout)
    _fields_ = [
        ("lossless", ctypes.c_int), ("quality", ctypes.c_float),
        ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int),
        ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int),
        ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int),
        ("preprocessing", ctypes.c_int), ("partitions", ctypes.c_int),
        ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int),
        ("thread_level", ctypes.c_int), ("low_memory", ctypes.c_int),
        ("near_lossless", ctypes.c_int), ("exact", ctypes.c_int),
        ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int),
        ("qmin", ctypes.c_int), ("qmax", ctypes.c_int),
    ]


class _WebPMemoryWriter(ctypes.Structure):
    _fields_ = [("mem", ctypes.POINTER(ctypes.c_uint8)),
                ("size", ctypes.c_size_t),
                ("max_size", ctypes.c_size_t),
                ("pad", ctypes.c_uint32 * 1)]


class _WebPPicture(ctypes.Structure):
    # mirrors the public webp/encode.h WebPPicture (1.2.x layout)
    _fields_ = [
        ("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int), ("height", ctypes.c_int),
        ("y", ctypes.POINTER(ctypes.c_uint8)),
        ("u", ctypes.POINTER(ctypes.c_uint8)),
        ("v", ctypes.POINTER(ctypes.c_uint8)),
        ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
        ("a", ctypes.POINTER(ctypes.c_uint8)),
        ("a_stride", ctypes.c_int), ("pad1", ctypes.c_uint32 * 2),
        ("argb", ctypes.POINTER(ctypes.c_uint32)),
        ("argb_stride", ctypes.c_int), ("pad2", ctypes.c_uint32 * 3),
        ("writer", ctypes.c_void_p), ("custom_ptr", ctypes.c_void_p),
        ("extra_info_type", ctypes.c_int),
        ("extra_info", ctypes.POINTER(ctypes.c_uint8)),
        ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
        ("progress_hook", ctypes.c_void_p),
        ("user_data", ctypes.c_void_p), ("pad3", ctypes.c_uint32 * 3),
        ("pad4", ctypes.POINTER(ctypes.c_uint8)),
        ("pad5", ctypes.POINTER(ctypes.c_uint8)),
        ("pad6", ctypes.c_uint32 * 8), ("memory_", ctypes.c_void_p),
        ("memory_argb_", ctypes.c_void_p),
        ("pad7", ctypes.c_void_p * 2),
    ]


def _encode_simple(rgb: bytes, w: int, h: int, q: float) -> bytes:
    _LW.WebPEncodeRGB.restype = ctypes.c_size_t
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LW.WebPEncodeRGB(rgb, w, h, w * 3, ctypes.c_float(q),
                          ctypes.byref(out))
    assert n > 0, "libwebp encode failed"
    data = ctypes.string_at(out, n)
    _LW.WebPFree(out)
    return data


def _encode_adv(rgb: bytes, w: int, h: int, **knobs) -> bytes:
    cfg = _WebPConfig()
    assert _LW.WebPConfigInitInternal(ctypes.byref(cfg), 0,
                                      ctypes.c_float(75.0), _ABI), \
        "WebPConfig ABI mismatch"
    for k, v in knobs.items():
        setattr(cfg, k, v)
    assert _LW.WebPValidateConfig(ctypes.byref(cfg))
    pic = _WebPPicture()
    assert _LW.WebPPictureInitInternal(ctypes.byref(pic), _ABI)
    pic.width, pic.height, pic.use_argb = w, h, 0
    assert _LW.WebPPictureImportRGB(ctypes.byref(pic), rgb, w * 3)
    mw = _WebPMemoryWriter()
    _LW.WebPMemoryWriterInit(ctypes.byref(mw))
    pic.writer = ctypes.cast(_LW.WebPMemoryWrite, ctypes.c_void_p)
    pic.custom_ptr = ctypes.cast(ctypes.byref(mw), ctypes.c_void_p)
    ok = _LW.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    _LW.WebPPictureFree(ctypes.byref(pic))
    assert ok, f"libwebp advanced encode failed: {knobs}"
    data = ctypes.string_at(mw.mem, mw.size)
    _LW.WebPMemoryWriterClear(ctypes.byref(mw))
    return data


def _ref_yuv(webp: bytes) -> tuple:
    _LW.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    st = ctypes.c_int()
    uvst = ctypes.c_int()
    y = _LW.WebPDecodeYUV(webp, len(webp), ctypes.byref(w),
                          ctypes.byref(h), ctypes.byref(u),
                          ctypes.byref(v), ctypes.byref(st),
                          ctypes.byref(uvst))
    assert y, "libwebp reference decode failed"
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    ybuf = ctypes.string_at(y, st.value * H)
    ubuf = ctypes.string_at(u, uvst.value * ch)
    vbuf = ctypes.string_at(v, uvst.value * ch)
    Y = b"".join(ybuf[r * st.value:r * st.value + W]
                 for r in range(H))
    Uo = b"".join(ubuf[r * uvst.value:r * uvst.value + cw]
                  for r in range(ch))
    Vo = b"".join(vbuf[r * uvst.value:r * uvst.value + cw]
                  for r in range(ch))
    _LW.WebPFree(y)
    return W, H, Y, Uo, Vo


def _vp8_chunk(webp: bytes) -> bytes:
    assert webp[:4] == b"RIFF" and webp[8:12] == b"WEBP"
    pos = 12
    while pos + 8 <= len(webp):
        tag = webp[pos:pos + 4]
        size = struct.unpack("<I", webp[pos + 4:pos + 8])[0]
        if tag == b"VP8 ":
            return webp[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


# ---------------------------------------------------------------------------
# deterministic content generators
# ---------------------------------------------------------------------------

def _noise(w, h, seed=7):
    out = bytearray()
    s = seed
    for _ in range(w * h * 3):
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        out.append((s >> 16) & 255)
    return bytes(out)


def _gradient(w, h):
    return bytes(((x * 255 // max(w - 1, 1)) if ch == 0 else
                  (y * 255 // max(h - 1, 1)) if ch == 1 else
                  ((x ^ y) & 255))
                 for y in range(h) for x in range(w)
                 for ch in range(3))


def _flat(w, h, rgb=(120, 80, 200)):
    return bytes(rgb[i % 3] for i in range(w * h * 3))


def _mixed(w, h):
    n = _noise(w, h)
    g = _gradient(w, h)
    out = bytearray()
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 3
            src = n if (x < w // 2) ^ (y < h // 2) else g
            out += src[i:i + 3]
    return bytes(out)


def _mostly_flat(w, h):
    img = bytearray(_flat(w, h))
    nz = _noise(16, 16)
    for y in range(min(16, h)):
        row = (y * w) * 3
        img[row:row + 48] = nz[y * 48:(y + 1) * 48]
    return bytes(img)


def _roundtrip(webp: bytes, stats: dict | None = None) -> None:
    payload = _vp8_chunk(webp)
    ref = _ref_yuv(webp)
    mine = decode_vp8(payload, stats=stats)
    assert mine[0] == ref[0] and mine[1] == ref[1]
    assert mine[2] == ref[2], "Y plane mismatch"
    assert mine[3] == ref[3], "U plane mismatch"
    assert mine[4] == ref[4], "V plane mismatch"


# ---------------------------------------------------------------------------
# 1. round-trips (simple API): sizes x qualities x content
# ---------------------------------------------------------------------------

@needs_libwebp
def test_roundtrip_simple_api_sweep():
    merged: dict = {"bmodes": set(), "ymodes": set(), "uvmodes": set()}
    for w, h in [(1, 1), (3, 2), (5, 17), (16, 16), (17, 15),
                 (31, 33), (64, 48), (97, 61)]:
        for q in (0, 40, 75, 95, 100):
            for gen in (_noise, _gradient, _mixed):
                st: dict = {}
                _roundtrip(_encode_simple(gen(w, h), w, h, q), st)
                for k in ("bmodes", "ymodes", "uvmodes"):
                    merged[k].update(st[k])
    # the sweep must exercise every prediction mode the spec defines
    assert merged["bmodes"] == set(range(10)), merged["bmodes"]
    assert merged["ymodes"] == {0, 1, 2, 3, 4}, merged["ymodes"]
    assert merged["uvmodes"] == {0, 1, 2, 3}, merged["uvmodes"]


# ---------------------------------------------------------------------------
# 2. round-trips (advanced API): segments / filters / partitions / skip
# ---------------------------------------------------------------------------

@needs_libwebp
def test_roundtrip_segmentation():
    st: dict = {}
    _roundtrip(_encode_adv(_mixed(96, 96), 96, 96, segments=4,
                           sns_strength=90, method=6), st)
    assert st["seg_enabled"] and len(st["segments"]) > 1


@needs_libwebp
def test_roundtrip_token_partitions():
    for log2, method in ((1, 2), (2, 1), (3, 0)):
        st: dict = {}
        _roundtrip(_encode_adv(_noise(48, 200), 48, 200,
                               partitions=log2, method=method), st)
        assert st["n_partitions"] == 1 << log2, st


@needs_libwebp
def test_roundtrip_skip_streams():
    st: dict = {}
    _roundtrip(_encode_adv(_mostly_flat(64, 256), 64, 256, method=1,
                           quality=10), st)
    assert st["skip_enabled"] and st["skipped_mbs"] > 0, st


@needs_libwebp
def test_roundtrip_simple_loop_filter():
    st: dict = {}
    _roundtrip(_encode_adv(_gradient(80, 64), 80, 64, filter_type=0,
                           filter_strength=60, autofilter=0), st)
    assert st["filter_simple"] and st["filter_level"] > 0, st


@needs_libwebp
def test_roundtrip_sharpness_levels():
    for sharp in (1, 3, 7):
        st: dict = {}
        _roundtrip(_encode_adv(_mixed(96, 96), 96, 96,
                               filter_sharpness=sharp,
                               filter_strength=100), st)
        assert st["sharpness"] == sharp and st["filter_level"] > 0


# ---------------------------------------------------------------------------
# 3. the external fixture: CPython's python.webp (PSF public test
#    data) — encoded by a third party, not by this test's encoder.
# ---------------------------------------------------------------------------

CPYTHON_WEBP = base64.b64decode(
    "UklGRqgBAABXRUJQVlA4WAoAAAAQAAAADwAADwAAQUxQSMMAAAABJ6KokSTleucY"
    "X+ffKpmImP90cY3gJjDi4Yt3MsjBEVyDKzDosHgVjnhRNcEIDAJPkqBqsFUZHNa2"
    "bUYvTsZ2PLbtd/uvKa4hov9J0f2PkPe6REkkGzolkTTzFG0Ox9PlFiD0CxS+kOGD"
    "txoynjaCfx0pfk52CPuInrOR75lzRugygtv4zEiy90UwfSD9NheMITJWLaXWayO8"
    "XeOlWRXVnIGk2W6WdYoYMQ+KqixQNPowgt+6a1BSKbUtz+lUFAoBAAAAVlA4IL4A"
    "AACQAgCdASoQABAAAwA0JbACdDBPCIUMfAMdCCz96AD+/XSg/QKbH4r3Q3ycN/bS"
    "DK/T/zVo4u6nvclvG/SqxWOuup+XhN9BojvaW+Tv+MvxvX/hr/o/5Qns9LtmX/+q"
    "Kdl/yWznhuasl7nkxvSTI4xf3Y85VSB/lU/8Ofj/b9JrA+ifvIOYZm2x1RP/dhfm"
    "sf5diuSfR7+z+r/+HR3zEo/+XM/B+vkYw73Pzx+ROaAB/ZoBSzEs3rzZe6qsAAAA"
)


def test_cpython_fixture_decodes_to_pinned_planes():
    w, h, y, u, v = decode_vp8(_vp8_chunk(CPYTHON_WEBP))
    assert (w, h) == (16, 16)
    assert hashlib.md5(y).hexdigest() == \
        "dfe4982372c6c01faa923c2d30af586d"
    assert hashlib.md5(u).hexdigest() == \
        "5c048a58ac9d2fb87442e3c601232840"
    assert hashlib.md5(v).hexdigest() == \
        "58be420aae529777874b3041d05200d9"


@needs_libwebp
def test_cpython_fixture_matches_reference_decoder():
    ref = _ref_yuv(CPYTHON_WEBP)
    mine = decode_vp8(_vp8_chunk(CPYTHON_WEBP))
    assert mine == ref


# ---------------------------------------------------------------------------
# 4. container integration: decode_image_gray / animated frames
# ---------------------------------------------------------------------------

@needs_libwebp
def test_decode_image_gray_lossy_webp_is_the_y_plane():
    webp = _encode_simple(_gradient(33, 21), 33, 21, 80)
    w, h, gray = decode_image_gray(webp)
    _, _, y, _, _ = decode_vp8(_vp8_chunk(webp))
    assert (w, h) == (33, 21) and bytes(gray) == y


@needs_libwebp
def test_animated_webp_with_lossy_subframes_composes():
    """An ANMF animation whose sub-frames are lossy VP8 now composes
    real canvases (it used to emit poison rows per frame)."""
    sub = _vp8_chunk(_encode_simple(_noise(16, 16), 16, 16, 80))
    w, h, y, _, _ = decode_vp8(sub)

    def chunk(tag, body):
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    vp8x = chunk(b"VP8X", bytes([0x02, 0, 0, 0]) +
                 (32 - 1).to_bytes(3, "little") +
                 (16 - 1).to_bytes(3, "little"))
    anim = chunk(b"ANIM", struct.pack("<IHH", 0xFF000000, 0, 0))

    def anmf(fx, fy):
        head = ((fx // 2).to_bytes(3, "little") +
                (fy // 2).to_bytes(3, "little") +
                (16 - 1).to_bytes(3, "little") +
                (16 - 1).to_bytes(3, "little") +
                (50).to_bytes(3, "little") + bytes([0]))
        return chunk(b"ANMF", head + chunk(b"VP8 ", sub))

    body = b"WEBP" + vp8x + anim + anmf(0, 0) + anmf(16, 0)
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    cw, ch, frames = webp_frames_gray(data)
    assert (cw, ch) == (32, 16) and len(frames) == 2
    assert frames[0] is not None and frames[1] is not None
    # frame 1 paints the decoded luma at (0,0)
    for r in range(16):
        assert bytes(frames[0][r * 32:r * 32 + 16]) == \
            y[r * 16:(r + 1) * 16]
    # frame 2 adds the same tile at (16,0), first tile still there
    for r in range(16):
        assert bytes(frames[1][r * 32:r * 32 + 16]) == \
            y[r * 16:(r + 1) * 16]
        assert bytes(frames[1][r * 32 + 16:r * 32 + 32]) == \
            y[r * 16:(r + 1) * 16]


# ---------------------------------------------------------------------------
# 5. honesty / fuzz battery
# ---------------------------------------------------------------------------

def test_non_keyframe_rejected():
    bad = bytes([0x01, 0x00, 0x00]) + b"\x9d\x01\x2a" + b"\x00" * 20
    with pytest.raises(VP8Error):
        decode_vp8(bad)


def test_pixel_budget_enforced():
    # a legal header declaring 16383x16383 must be rejected upfront
    tag = 0 | (0 << 1) | (1 << 4) | (100 << 5)
    head = tag.to_bytes(3, "little") + b"\x9d\x01\x2a" + \
        struct.pack("<HH", 16383, 16383) + b"\x00" * 200
    with pytest.raises(VP8Error):
        decode_vp8(head)


@needs_libwebp
def test_fuzz_truncations_and_bitflips_never_hang():
    webp = _encode_simple(_mixed(48, 32), 48, 32, 60)
    payload = _vp8_chunk(webp)
    for cut in range(0, len(payload), max(1, len(payload) // 40)):
        try:
            decode_vp8(payload[:cut])
        except (VP8Error, ValueError):
            pass
    rnd = random.Random(42)
    for _ in range(60):
        buf = bytearray(payload)
        for _ in range(rnd.randrange(1, 4)):
            buf[rnd.randrange(len(buf))] ^= 1 << rnd.randrange(8)
        try:
            decode_vp8(bytes(buf))
        except (VP8Error, ValueError):
            pass


def test_fuzz_garbage_rejected():
    rnd = random.Random(9)
    for n in (0, 1, 9, 10, 64, 500):
        blob = bytes(rnd.randrange(256) for _ in range(n))
        try:
            decode_vp8(blob)
        except (VP8Error, ValueError):
            pass
        # magic-prefixed garbage: valid tag, garbage partitions
        tag = (0 | (40 << 5)).to_bytes(3, "little")
        blob2 = tag + b"\x9d\x01\x2a" + \
            struct.pack("<HH", 16, 16) + blob
        try:
            decode_vp8(blob2)
        except (VP8Error, ValueError):
            pass
