"""AVI container walk + MJPEG frame-sampling pipeline.

The container parser is exercised against hand-built RIFF trees
(word-aligned chunks, nested LISTs, avih header, truncation), and the
Spark ``video_frames`` op against real MJPEG streams authored with
the test-side baseline encoder from test_jpeg — decoded frames must
land in the same pHash space as the still-image path (an identical
image embedded as a video frame hashes identically).
"""

import struct

import pytest

from tests.test_jpeg import _pattern, encode_jpeg_gray

FLAT_QUANT = [1] * 64


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def _avi(frames: list[bytes], uspf: int | None = 40000,
         junk_tail: bytes = b"") -> bytes:
    hdrl = b""
    if uspf is not None:
        avih = struct.pack("<IIIIII", uspf, 0, 0, 0, len(frames), 0)
        hdrl = _list(b"hdrl", _chunk(b"avih", avih))
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body + junk_tail


def test_avi_walk_chunks_and_header():
    from goose_parser_spark.ops.imagecodec import avi_video_chunks
    frames = [b"frameA", b"frameBB", b"x"]  # odd lengths force padding
    uspf, got = avi_video_chunks(_avi(frames))
    assert uspf == 40000
    assert got == frames


def test_avi_without_header_and_db_chunks():
    from goose_parser_spark.ops.imagecodec import avi_video_chunks
    movi = _list(b"movi", _chunk(b"01db", b"raw") + _chunk(b"00dc", b"jp")
                 + _chunk(b"01wb", b"audio-ignored")
                 + _chunk(b"idx1", b"index-ignored"))
    body = b"AVI " + movi
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    uspf, got = avi_video_chunks(data)
    assert uspf is None
    assert got == [b"raw", b"jp"]


def test_avi_riff_size_bounds_the_walk():
    from goose_parser_spark.ops.imagecodec import avi_video_chunks
    # a video chunk appended BEYOND the declared RIFF size is ignored
    data = _avi([b"inside"]) + _chunk(b"00dc", b"outside")
    _, got = avi_video_chunks(data)
    assert got == [b"inside"]


def test_avi_rejects_non_avi():
    from goose_parser_spark.ops.imagecodec import avi_video_chunks
    with pytest.raises(ValueError):
        avi_video_chunks(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        avi_video_chunks(b"\x89PNG not a riff")


def test_video_frames_sampling_and_cross_modal_hash(spark):
    from goose_parser_spark.ops.multimodal import phash_image, video_frames
    imgs = [encode_jpeg_gray(16, 16, _pattern(16, 16, seed=s), FLAT_QUANT)
            for s in range(4)]
    avi = _avi(imgs)
    df = spark.createDataFrame([(1, bytearray(avi))],
                               "doc_id long, payload binary")
    rows = {r["frame_no"]: r
            for r in video_frames(df, every=2).collect()}
    assert sorted(rows) == [0, 2]
    assert all(r["width"] == 16 and r["height"] == 16
               for r in rows.values())
    # the same image as a plain still must hash IDENTICALLY — one
    # fingerprint space across modalities
    stills = spark.createDataFrame(
        [(s, bytearray(imgs[s])) for s in (0, 2)],
        "doc_id long, payload binary")
    still_hash = {r["doc_id"]: r["phash"]
                  for r in phash_image(stills).collect()}
    assert rows[0]["phash"] == still_hash[0]
    assert rows[2]["phash"] == still_hash[2]


def test_video_frames_poison_isolation(spark):
    from goose_parser_spark.ops.multimodal import video_frames
    good = encode_jpeg_gray(8, 8, _pattern(8, 8), FLAT_QUANT)
    mixed = _avi([good, b"not a jpeg frame"])
    data = [(1, bytearray(mixed)),
            (2, bytearray(b"total garbage, not RIFF")),
            (3, bytearray(_avi([])))]
    df = spark.createDataFrame(data, "doc_id long, payload binary")
    out = video_frames(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: frame 0 decodes, frame 1 is a per-frame NULL row
    f = {r["frame_no"]: r for r in by_doc[1]}
    assert f[0]["phash"] is not None and f[0]["width"] == 8
    assert f[1]["phash"] is None and f[1]["width"] is None
    # doc 2: container-level poison row
    assert [(r["frame_no"], r["phash"]) for r in by_doc[2]] == [(-1, None)]
    # doc 3: zero frames -> zero rows
    assert 3 not in by_doc
