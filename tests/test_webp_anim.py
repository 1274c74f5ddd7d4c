"""Animated WebP (VP8X/ANIM/ANMF) composition: sub-rect VP8L frames
painted on the canvas, background disposal, lossy-frame per-frame
poison, and cross-modal hash identity with still VP8L files. Frames
are authored with the test-side VP8L bit-writer from test_vp8l."""

import struct

import pytest

from tests.test_vp8l import (
    W, _const_body, prologue, simple1, simple2, vp8l_payload)


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _u24(v: int) -> bytes:
    return struct.pack("<I", v)[:3]


def _anmf(x, y, w, h, payload: bytes, dispose=0) -> bytes:
    head = (_u24(x // 2) + _u24(y // 2) + _u24(w - 1) + _u24(h - 1)
            + _u24(40) + bytes((dispose & 1,)))
    return _chunk(b"ANMF", head + _chunk(b"VP8L", payload))


def _awebp(cw, ch, anmfs: list[bytes], bg=(0, 0, 0, 255)) -> bytes:
    vp8x = bytes((0x02, 0, 0, 0)) + _u24(cw - 1) + _u24(ch - 1)
    b_, g_, r_, a_ = bg[2], bg[1], bg[0], bg[3]
    anim = bytes((b_, g_, r_, a_)) + struct.pack("<H", 0)
    body = (b"WEBP" + _chunk(b"VP8X", vp8x) + _chunk(b"ANIM", anim)
            + b"".join(anmfs))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _const_payload(w, h, g, r, b):
    return vp8l_payload(w, h, _const_body(g, r, b))


def test_two_full_frames():
    from goose_parser_spark.ops.imagecodec import _gray, webp_frames_gray
    f0 = _const_payload(4, 4, 10, 20, 30)
    f1 = _const_payload(4, 4, 200, 100, 50)
    cw, chh, frames = webp_frames_gray(
        _awebp(4, 4, [_anmf(0, 0, 4, 4, f0), _anmf(0, 0, 4, 4, f1)]))
    assert (cw, chh, len(frames)) == (4, 4, 2)
    assert frames[0] == [_gray(20, 10, 30)] * 16
    assert frames[1] == [_gray(100, 200, 50)] * 16


def test_subrect_and_background_disposal():
    from goose_parser_spark.ops.imagecodec import _gray, webp_frames_gray
    base = _const_payload(4, 4, 10, 10, 10)
    patch = _const_payload(2, 2, 250, 0, 0)
    data = _awebp(4, 4, [
        _anmf(0, 0, 4, 4, base),
        _anmf(2, 2, 2, 2, patch, dispose=1),
        _anmf(0, 0, 1, 1, _const_payload(1, 1, 77, 0, 0)),
    ], bg=(100, 100, 100, 255))
    _, _, frames = webp_frames_gray(data)
    gb = _gray(10, 10, 10)
    gp = _gray(0, 250, 0)
    exp1 = [gb] * 16
    for y, x in ((2, 2), (2, 3), (3, 2), (3, 3)):
        exp1[y * 4 + x] = gp
    assert frames[1] == exp1
    # frame 2: the patch rect was restored to the ANIM background
    exp2 = [gb] * 16
    for y, x in ((2, 2), (2, 3), (3, 2), (3, 3)):
        exp2[y * 4 + x] = 100
    exp2[0] = _gray(0, 77, 0)
    assert frames[2] == exp2


def test_lossy_subframe_is_per_frame_none():
    from goose_parser_spark.ops.imagecodec import webp_frames_gray
    good = _const_payload(4, 4, 9, 9, 9)
    lossy_anmf = _chunk(
        b"ANMF",
        _u24(0) + _u24(0) + _u24(3) + _u24(3) + _u24(40) + b"\x00"
        + _chunk(b"VP8 ", b"\x00" * 10))
    _, _, frames = webp_frames_gray(
        _awebp(4, 4, [_anmf(0, 0, 4, 4, good), lossy_anmf]))
    assert frames[0] is not None
    assert frames[1] is None


def test_plain_vp8l_is_single_frame():
    from goose_parser_spark.ops.imagecodec import (
        _webp_gray, webp_frames_gray)
    from tests.test_vp8l import wrap_webp
    still = wrap_webp(_const_payload(4, 3, 1, 2, 3))
    w, h, frames = webp_frames_gray(still)
    assert (w, h, len(frames)) == (4, 3, 1)
    assert frames[0] == _webp_gray(still)[2]


def test_rejects_garbage_and_lossy_still():
    from goose_parser_spark.ops.imagecodec import webp_frames_gray
    with pytest.raises(ValueError):
        webp_frames_gray(b"not riff")
    lossy = (b"RIFF" + struct.pack("<I", 14) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 2) + b"\x00\x00")
    with pytest.raises(ValueError):
        webp_frames_gray(lossy)


def test_video_frames_samples_webp_and_cross_modal(spark):
    from goose_parser_spark.ops.multimodal import phash_image, video_frames
    from tests.test_vp8l import wrap_webp
    # 8x8 two-symbol bit frames so canvases differ per frame
    payloads = []
    for f in range(3):
        w = W()
        prologue(w)
        simple2(w, 0, 255)
        simple1(w, 40 + f)
        simple1(w, 90)
        simple1(w, 255)
        simple1(w, 0)
        for k in range(64):
            w.b((k * (f + 3)) % 2, 1)
        payloads.append(vp8l_payload(8, 8, w))
    anim = _awebp(8, 8, [_anmf(0, 0, 8, 8, p) for p in payloads])
    df = spark.createDataFrame([(1, bytearray(anim))],
                               "doc_id long, payload binary")
    got = {r["frame_no"]: r for r in video_frames(df).collect()}
    assert sorted(got) == [0, 1, 2]
    # cross-modal: frame 1's canvas as a STILL VP8L hashes identically
    sdf = spark.createDataFrame([(9, bytearray(wrap_webp(payloads[1])))],
                                "doc_id long, payload binary")
    still = phash_image(sdf).collect()[0]["phash"]
    assert got[1]["phash"] == still
