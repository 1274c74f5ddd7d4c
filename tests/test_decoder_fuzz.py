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
