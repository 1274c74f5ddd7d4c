"""Adversarial robustness fuzz for every binary parser: at corpus
scale these face arbitrary hostile bytes, so the contract is
"return a valid result or raise a catchable exception, promptly" —
never hang, never segfault-style corruption, never an unbounded
loop. Seeded random blobs, magic-prefixed garbage, and bit-flipped
mutations of VALID payloads (the nastiest class: mostly-plausible
headers with corrupt interiors)."""

import random
import struct

import pytest

from goose_parser_spark.ops import imagecodec as ic

MAGICS = [
    b"\x89PNG\r\n\x1a\n", b"GIF89a", b"GIF87a", b"BM", b"P5 ", b"P6 ",
    b"II*\x00", b"MM\x00*", b"\xff\xd8\xff", b"RIFF1234WEBP",
    b"RIFF1234WAVE", b"RIFF1234AVI ", b"OggS", b"\x1a\x45\xdf\xa3",
    b"fLaC", b"ID3", b"\xff\xfb", b"\x00\x00\x00\x18ftypisom",
    b"\x00\x00\x00\x18ftypavif",
]

PARSERS = [
    ic.decode_image_gray,
    ic.probe_media,
    ic.decode_audio_pcm,
    ic.parse_exif,
    ic.parse_id3,
    lambda b: ic.avi_video_chunks(b),
    lambda b: ic.gif_frames_gray(b),
    lambda b: ic.webp_frames_gray(b),
    lambda b: ic.decode_alpha_plane(b, 8, 8),
]


def _run_all(blob: bytes) -> None:
    for fn in PARSERS:
        try:
            fn(blob)
        except Exception:  # noqa: BLE001 — any exception is the contract
            pass


def test_random_blobs_never_hang_or_crash():
    rng = random.Random(1234)
    for trial in range(150):
        n = rng.choice([0, 1, 3, 9, 40, 300, 4096])
        _run_all(bytes(rng.randrange(256) for _ in range(n)))


def test_magic_prefixed_garbage():
    rng = random.Random(99)
    for magic in MAGICS:
        for trial in range(25):
            tail = bytes(rng.randrange(256)
                         for _ in range(rng.choice([0, 5, 60, 900])))
            _run_all(magic + tail)


def _valid_payloads():
    """One valid payload per format family, built with the test-side
    encoders (imported lazily to reuse their helpers)."""
    from tests.test_gif_anim import RAMP, _anim, _frame
    from tests.test_imagecodec import (
        _compress_tiff, _ogg_page, _write_png, _write_wav)
    from tests.test_jpeg import _pattern, encode_jpeg_gray
    from tests.test_vp8l import _const_body, vp8l_payload, wrap_webp
    from tests.test_exif import _id3, build_exif
    g = [(x + y) % 128 for y in range(8) for x in range(8)]
    gray = [v * 2 for v in g]
    out = [
        _write_png(8, 8, [gray[i * 8:(i + 1) * 8] for i in range(8)]),
        encode_jpeg_gray(16, 16, _pattern(16, 16), [1] * 64),
        _compress_tiff(None, 8, 8, gray, 5),
        _anim(8, 8, [_frame(0, 0, 8, 8, g)], RAMP),
        wrap_webp(vp8l_payload(8, 8, _const_body(1, 2, 3))),
        _write_wav([100, -100] * 64),
        build_exif(gps=True),
        _id3({b"TIT2": (0, b"t")}) + b"\xff\xfb\x90\x00",
        _ogg_page(0, b"OpusHead" + bytes((1, 1)) + struct.pack("<H", 0)
                  + struct.pack("<I", 48000) + b"\x00" * 3),
    ]
    return out


def test_bitflipped_valid_payloads():
    """Flip bytes inside valid files — the mostly-plausible corruption
    class — at every structural region (header/middle/tail)."""
    rng = random.Random(7)
    for payload in _valid_payloads():
        for trial in range(40):
            blob = bytearray(payload)
            for _ in range(rng.choice([1, 2, 8])):
                pos = rng.randrange(len(blob))
                blob[pos] = rng.randrange(256)
            _run_all(bytes(blob))


def test_truncations_of_valid_payloads():
    for payload in _valid_payloads():
        for cut in (0, 1, 4, len(payload) // 2, len(payload) - 1):
            _run_all(bytes(payload[:cut]))


def test_pathological_structures():
    # EBML deep nesting must not blow the stack uncontrollably:
    # 'Segment' wrappers nested; the walk recurses only on KNOWN
    # container ids, so unknown deep nesting is skipped linearly
    deep = b"\x1a\x45\xdf\xa3\x80" + b"\x18\x53\x80\x67\xff" * 3000
    _run_all(deep)
    # AVI with a zero-size LIST loop candidate: pos must still advance
    avi = (b"RIFF" + struct.pack("<I", 400) + b"AVI "
           + (b"LIST" + struct.pack("<I", 4) + b"movi") * 30)
    _run_all(avi)
    # Ogg page chain whose segment table claims more than exists
    ogg = b"OggS\x00\x00" + b"\x00" * 20 + bytes((255,)) + b"\xff" * 3
    _run_all(ogg)
    # VP8L stream of all 1-bits (max-length vints / code walks)
    _run_all(b"RIFF\x20\x00\x00\x00WEBPVP8L\x10\x00\x00\x00\x2f"
             + b"\xff" * 15)
    # GIF with a huge claimed logical screen but no data: the canvas
    # allocation is bounded by the header fields actually present
    _run_all(b"GIF89a" + struct.pack("<HHBBB", 200, 200, 0, 0, 0)
             + b"\x3b")


def test_animation_budget_bounds_pixels_times_frames():
    """Frame count and canvas size must be budgeted JOINTLY: a large
    canvas with many tiny frame records multiplies the composed-copy
    cost (256 x 16 MP would be ~30 GiB). The walk stops emitting at
    MAX_ANIM_PIXELS total composed pixels."""
    import struct as st
    sw = sh = 2000  # 4 MP canvas -> budget allows 16 composed frames
    gct = bytes(3)  # 2-entry global color table (1-bit)
    frame = (b"\x2c" + st.pack("<HHHHB", 0, 0, 1, 1, 0)
             + b"\x07" + b"\x03" + bytes([0x80, 0x00, 0x81]) + b"\x00")
    gif = (b"GIF89a" + st.pack("<HHBBB", sw, sh, 0x80, 0, 0)
           + gct + gct + frame * 64 + b"\x3b")
    got_sw, got_sh, frames = ic.gif_frames_gray(gif)
    assert (got_sw, got_sh) == (sw, sh)
    assert len(frames) == ic.MAX_ANIM_PIXELS // (sw * sh)  # 16, not 64


def test_tiff_overlapping_strips_capped_at_geometry():
    """Overlapping/duplicated strip entries must stop accumulating at
    the geometry-implied byte count — a small file can otherwise
    declare thousands of entries pointing at one region and assemble
    GBs before any length check."""
    import struct as st
    w = h = 64
    px = bytes(w)  # one row of zeros per strip region
    # header: II, magic, IFD at 8
    entries = []
    n_strips = 5000  # all pointing at the same row
    def entry(tag, typ, cnt, val):
        return st.pack("<HHI4s", tag, typ, cnt, val)
    # layout: [8: IFD] then arrays then pixel row
    ifd_count = 8
    ifd_size = 2 + ifd_count * 12 + 4
    off_arr = 8 + ifd_size
    cnt_arr = off_arr + 4 * n_strips
    px_off = cnt_arr + 4 * n_strips
    ifd = st.pack("<H", ifd_count)
    ifd += entry(256, 3, 1, st.pack("<HH", w, 0))      # width
    ifd += entry(257, 3, 1, st.pack("<HH", h, 0))      # height
    ifd += entry(258, 3, 1, st.pack("<HH", 8, 0))      # bits
    ifd += entry(259, 3, 1, st.pack("<HH", 1, 0))      # comp=none
    ifd += entry(277, 3, 1, st.pack("<HH", 1, 0))      # spp=1
    ifd += entry(278, 3, 1, st.pack("<HH", 1, 0))      # rows/strip
    ifd += entry(273, 4, n_strips, st.pack("<I", off_arr))
    ifd += entry(279, 4, n_strips, st.pack("<I", cnt_arr))
    ifd += st.pack("<I", 0)
    data = (b"II*\x00" + st.pack("<I", 8) + ifd
            + st.pack("<I", px_off) * n_strips
            + st.pack("<I", len(px)) * n_strips
            + px)
    gw, gh, gray = ic.decode_image_gray(data)
    # decodes (enough strips cover the geometry) without assembling
    # 5000 copies: the budget slices exactly need bytes
    assert (gw, gh) == (w, h) and len(gray) == w * h


def test_png_sample_budget_counts_channels():
    """An RGBA canvas costs 4x the per-pixel budget; the sample check
    must reject what the pixel check alone would admit."""
    import struct as st, zlib as zl
    w = h = 3000  # 9 MP pixels -> 36 M samples at RGBA: over budget
    def chunk(typ, body):
        c = st.pack(">I", len(body)) + typ + body
        return c + st.pack(">I", zl.crc32(typ + body))
    ihdr = st.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)  # RGBA8
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zl.compress(b"\x00" * 1000))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="sample budget"):
        ic.decode_image_gray(png)
