"""Animated-GIF frame composition (imagecodec.gif_frames_gray) and
its video_frames integration: sub-rect painting, transparency,
disposal methods 2 (background) and 3 (previous), local palettes —
frames authored with the independent test-side LZW encoder from
test_imagecodec."""

import struct

import pytest

from tests.test_imagecodec import _gray, _lzw_encode


def _gce(disposal=0, transparent=None):
    flags = (disposal & 7) << 2
    tidx = 0
    if transparent is not None:
        flags |= 1
        tidx = transparent
    return b"\x21\xf9\x04" + bytes((flags, 0, 0, tidx)) + b"\x00"


def _frame(x, y, w, h, indices, mcs=7, local_palette=None,
           interlaced=False):
    iflags = 0x40 if interlaced else 0
    out = bytearray()
    if local_palette is not None:
        size_bits = 6  # 128 entries
        iflags |= 0x80 | size_bits
        pal = bytearray()
        for r, g, b in local_palette:
            pal += bytes((r, g, b))
        pal += bytes(3 * (128 - len(local_palette)))
    out += b"\x2c" + struct.pack("<HHHHB", x, y, w, h, iflags)
    if local_palette is not None:
        out += bytes(pal)
    lzw = _lzw_encode(indices, mcs)
    out += bytes((mcs,))
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes((len(chunk),)) + chunk
    out += b"\x00"
    return bytes(out)


def _anim(sw, sh, parts, palette, bg=0):
    """parts: sequence of raw byte blocks (GCEs + frames)."""
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes((r, g, b))
    pal += bytes(3 * (128 - len(palette)))
    flags = 0x80 | 6  # global palette, 128 entries
    return (b"GIF89a" + struct.pack("<HHBBB", sw, sh, flags, bg, 0)
            + bytes(pal) + b"".join(parts) + b"\x3b")


# grayscale ramp palette: gray(index i) == 2*i exactly
RAMP = [(2 * i, 2 * i, 2 * i) for i in range(128)]


def test_two_full_frames_compose_to_themselves():
    from goose_parser_spark.ops.imagecodec import gif_frames_gray
    f0 = [(x + y) % 128 for y in range(4) for x in range(5)]
    f1 = [(3 * x + 2 * y) % 128 for y in range(4) for x in range(5)]
    data = _anim(5, 4, [_frame(0, 0, 5, 4, f0),
                        _frame(0, 0, 5, 4, f1)], RAMP)
    sw, sh, frames = gif_frames_gray(data)
    assert (sw, sh, len(frames)) == (5, 4, 2)
    assert frames[0] == [2 * v for v in f0]
    assert frames[1] == [2 * v for v in f1]


def test_subrect_transparency_and_disposals():
    from goose_parser_spark.ops.imagecodec import gif_frames_gray
    base = [10] * 16  # 4x4 canvas of index 10
    patch = [50, 0, 50, 50]  # 2x2 patch, index 0 transparent
    data = _anim(4, 4, [
        _gce(disposal=1),
        _frame(0, 0, 4, 4, base),
        _gce(disposal=3, transparent=0),
        _frame(1, 1, 2, 2, patch),          # painted, then UNDONE
        _gce(disposal=2),
        _frame(2, 2, 2, 2, [60] * 4),       # painted, then bg-cleared
        _frame(0, 0, 1, 1, [70]),
    ], RAMP, bg=3)
    sw, sh, frames = gif_frames_gray(data)
    assert len(frames) == 4
    g = lambda i: 2 * i  # noqa: E731
    # frame 1: patch over base; (1,2) stays base via transparency
    # (patch index 0 is the transparent slot)
    exp1 = [g(10)] * 16
    exp1[1 * 4 + 1] = g(50)
    exp1[2 * 4 + 1] = g(50)
    exp1[2 * 4 + 2] = g(50)
    assert frames[1] == exp1
    # frame 2: disposal 3 restored frame-0 canvas before painting
    exp2 = [g(10)] * 16
    for y, x in ((2, 2), (2, 3), (3, 2), (3, 3)):
        exp2[y * 4 + x] = g(60)
    assert frames[2] == exp2
    # frame 3: disposal 2 cleared the (2,2)-(3,3) rect to background
    exp3 = [g(10)] * 16
    for y, x in ((2, 2), (2, 3), (3, 2), (3, 3)):
        exp3[y * 4 + x] = g(3)
    exp3[0] = g(70)
    assert frames[3] == exp3


def test_local_palette_frame():
    from goose_parser_spark.ops.imagecodec import gif_frames_gray
    loc = [(255, 0, 0)] + [(0, 0, 0)] * 127
    data = _anim(2, 2, [
        _frame(0, 0, 2, 2, [1] * 4),
        _frame(0, 0, 2, 2, [0] * 4, local_palette=loc),
    ], RAMP)
    _, _, frames = gif_frames_gray(data)
    assert frames[0] == [2] * 4
    assert frames[1] == [_gray(255, 0, 0)] * 4


def test_still_gif_single_composed_frame_matches_decoder():
    from goose_parser_spark.ops.imagecodec import (
        decode_image_gray, gif_frames_gray)
    idx = [(x * 3 + y) % 128 for y in range(6) for x in range(7)]
    data = _anim(7, 6, [_frame(0, 0, 7, 6, idx)], RAMP)
    sw, sh, frames = gif_frames_gray(data)
    assert (sw, sh, len(frames)) == (7, 6, 1)
    assert decode_image_gray(data) == (7, 6, frames[0])


def test_corrupt_animation_raises():
    from goose_parser_spark.ops.imagecodec import gif_frames_gray
    with pytest.raises(ValueError):
        gif_frames_gray(b"GIF89a" + b"\x00" * 6 + b"\x3b")
    with pytest.raises(ValueError):
        gif_frames_gray(b"not a gif at all")


def test_video_frames_samples_gif_canvases(spark):
    from goose_parser_spark.ops.multimodal import phash_image, video_frames
    import random
    rng = random.Random(7)
    fr = [[rng.randrange(128) for _ in range(16 * 16)] for _ in range(4)]
    data = _anim(16, 16, [_frame(0, 0, 16, 16, f) for f in fr], RAMP)
    df = spark.createDataFrame([(1, bytearray(data))],
                               "doc_id long, payload binary")
    got = {r["frame_no"]: r for r in video_frames(df, every=2).collect()}
    assert sorted(got) == [0, 2]
    assert all(r["width"] == 16 and r["height"] == 16
               for r in got.values())
    # cross-modal identity: frame 2's canvas as a STILL GIF hashes
    # the same through the image path
    still = _anim(16, 16, [_frame(0, 0, 16, 16, fr[2])], RAMP)
    sdf = spark.createDataFrame([(9, bytearray(still))],
                                "doc_id long, payload binary")
    still_hash = phash_image(sdf).collect()[0]["phash"]
    assert got[2]["phash"] == still_hash
