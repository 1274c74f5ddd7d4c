"""EXIF APP1 parsing: hand-built TIFF IFD structures in both byte
orders, inline vs offset-stored values, the Exif sub-IFD, GPS
presence, and poison isolation through the Spark wrapper."""

import struct

import pytest

from goose_parser_spark.ops.imagecodec import parse_exif


def build_exif(e: str = "<", make: bytes = b"CamCo\x00",
               orientation: int = 6, dto: bytes | None = None,
               dims: tuple[int, int] | None = (640, 480),
               gps: bool = False, model: bytes = b"X100\x00\x00") -> bytes:
    """Minimal EXIF APP1 JPEG: IFD0 with Make/Model (offset-stored),
    Orientation (inline SHORT), optional Exif sub-IFD with
    DateTimeOriginal + pixel dims, optional GPS pointer."""
    def u16(v):
        return struct.pack(e + "H", v)

    def u32(v):
        return struct.pack(e + "I", v)

    entries0 = []
    tail = b""
    # compute layout: IFD0 at 8; entries 12 bytes + count(2) + next(4)
    n0 = 3 + (1 if dims or dto else 0) + (1 if gps else 0)
    ifd0_end = 8 + 2 + 12 * n0 + 4
    make_off = ifd0_end
    model_off = make_off + len(make)
    cur = model_off + len(model)
    entries0.append((0x010F, 2, len(make), u32(make_off)))
    entries0.append((0x0110, 2, len(model), u32(model_off)))
    entries0.append((0x0112, 3, 1, u16(orientation) + b"\x00\x00"))
    tail += make + model
    if dims or dto:
        exif_off = cur
        nsub = (1 if dto else 0) + (2 if dims else 0)
        sub_end = exif_off + 2 + 12 * nsub + 4
        sub_entries = []
        sub_tail = b""
        if dto:
            sub_entries.append((0x9003, 2, len(dto), u32(sub_end)))
            sub_tail += dto
        if dims:
            sub_entries.append((0xA002, 4, 1, u32(dims[0])))
            sub_entries.append((0xA003, 4, 1, u32(dims[1])))
        entries0.append((0x8769, 4, 1, u32(exif_off)))
        sub = u16(nsub)
        for tag, typ, cnt, val in sub_entries:
            sub += u16(tag) + u16(typ) + u32(cnt) + val
        sub += u32(0) + sub_tail
        tail += sub
        cur = sub_end + len(sub_tail)
    if gps:
        gps_off = cur
        gps_ifd = (u16(1) + u16(0x0000) + u16(1) + u32(4)
                   + b"\x02\x02\x00\x00" + u32(0))
        entries0.append((0x8825, 4, 1, u32(gps_off)))
        tail += gps_ifd
    entries0.sort()
    header = (b"II*\x00" if e == "<" else b"MM\x00*") + u32(8)
    ifd0 = u16(n0)
    for tag, typ, cnt, val in entries0:
        ifd0 += u16(tag) + u16(typ) + u32(cnt) + val
    ifd0 += u32(0)
    exif = header + ifd0 + tail
    app1 = b"Exif\x00\x00" + exif
    return (b"\xff\xd8\xff\xe1" + struct.pack(">H", len(app1) + 2)
            + app1 + b"\xff\xd9")


def test_exif_little_endian_full():
    data = build_exif(dto=b"2021:05:06 07:08:09\x00", gps=True)
    m = parse_exif(data)
    assert m == {"make": "CamCo", "model": "X100", "orientation": 6,
                 "datetime_original": "2021:05:06 07:08:09",
                 "exif_width": 640, "exif_height": 480,
                 "has_gps": True}


def test_exif_big_endian_and_no_gps():
    m = parse_exif(build_exif(e=">", orientation=1,
                              dims=(4032, 3024), gps=False))
    assert m["orientation"] == 1
    assert (m["exif_width"], m["exif_height"]) == (4032, 3024)
    assert m["has_gps"] is False
    assert m["make"] == "CamCo"


def test_exif_missing_sub_ifd_and_strings_stop_at_nul():
    m = parse_exif(build_exif(make=b"A\x00junk--", dims=None, dto=None))
    assert m["make"] == "A"
    assert m["datetime_original"] is None
    assert m["exif_width"] is None


def test_exif_rejects_non_jpeg_and_exifless():
    with pytest.raises(ValueError):
        parse_exif(b"\x89PNG....")
    # a JPEG with only a quant table, no APP1
    bare = b"\xff\xd8\xff\xdb" + struct.pack(">H", 4) + b"\x00\x00\xff\xd9"
    with pytest.raises(ValueError):
        parse_exif(bare)
    # APP1 present but not EXIF (XMP)
    xmp = (b"\xff\xd8\xff\xe1" + struct.pack(">H", 12)
           + b"http://ns.." + b"\xff\xd9")
    with pytest.raises(ValueError):
        parse_exif(xmp)


def test_exif_truncated_offsets_are_skipped_not_fatal():
    data = bytearray(build_exif(gps=False))
    # corrupt the Make value offset to point far past the end
    idx = data.find(b"CamCo")
    # find the IFD0 entry for 0x010F and break its offset
    app1 = data.find(b"II*\x00")
    m_entry = data.find(struct.pack("<H", 0x010F), app1)
    data[m_entry + 8:m_entry + 12] = struct.pack("<I", 999999)
    m = parse_exif(bytes(data))
    assert m["make"] is None          # skipped, not crashed
    assert m["orientation"] == 6      # inline values still parse
    assert idx > 0


def test_exif_metadata_dataframe_and_poison(spark):
    from goose_parser_spark.ops.multimodal import exif_metadata
    rows = [(1, bytearray(build_exif(dto=b"2020:01:02 03:04:05\x00",
                                     gps=True))),
            (2, bytearray(b"not an image at all")),
            (3, bytearray(build_exif(e=">", orientation=8, gps=False)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in exif_metadata(df).collect()}
    assert got[1]["datetime_original"] == "2020:01:02 03:04:05"
    assert got[1]["has_gps"] is True
    assert got[2]["make"] is None and got[2]["has_gps"] is None
    assert got[3]["orientation"] == 8 and got[3]["has_gps"] is False


def _id3(frames: dict[bytes, tuple[int, bytes]], ver=3) -> bytes:
    """frames: {frame_id: (encoding, payload_bytes)}."""
    body = bytearray()
    for fid, (enc, txt) in frames.items():
        fb = bytes((enc,)) + txt
        if ver >= 4:
            sz = bytes(((len(fb) >> 21) & 0x7F, (len(fb) >> 14) & 0x7F,
                        (len(fb) >> 7) & 0x7F, len(fb) & 0x7F))
        else:
            sz = struct.pack(">I", len(fb))
        body += fid + sz + b"\x00\x00" + fb
    sz = len(body)
    ss = bytes(((sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                (sz >> 7) & 0x7F, sz & 0x7F))
    return b"ID3" + bytes((ver, 0, 0)) + ss + bytes(body)


def test_id3_v23_and_v24_all_encodings():
    from goose_parser_spark.ops.imagecodec import parse_id3
    tag = _id3({b"TIT2": (0, b"Hello\x00"),
                b"TPE1": (1, "Ärtist".encode("utf-16")),
                b"TALB": (3, "Albüm".encode("utf-8"))}, ver=3)
    m = parse_id3(tag + b"\xff\xfb\x90\x00" + b"\x00" * 32)
    assert m == {"title": "Hello", "artist": "Ärtist", "album": "Albüm"}
    tag4 = _id3({b"TIT2": (2, "T24".encode("utf-16-be"))}, ver=4)
    m4 = parse_id3(tag4)
    assert m4["title"] == "T24" and m4["artist"] is None


def test_id3_rejects_untagged():
    from goose_parser_spark.ops.imagecodec import parse_id3
    import pytest as _pytest
    with _pytest.raises(ValueError):
        parse_id3(b"\xff\xfb\x90\x00 raw mp3, no tag")


def test_id3_metadata_dataframe(spark):
    from goose_parser_spark.ops.multimodal import id3_metadata
    tag = _id3({b"TIT2": (0, b"Song"), b"TPE1": (0, b"Band")})
    rows = [(1, bytearray(tag)), (2, bytearray(b"no tag here"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in id3_metadata(df).collect()}
    assert got[1]["title"] == "Song" and got[1]["artist"] == "Band"
    assert got[1]["album"] is None
    assert got[2]["title"] is None


def test_id3_extended_header_and_v22_rejection():
    from goose_parser_spark.ops.imagecodec import parse_id3
    import pytest as _pytest
    # v2.3 extended header: 4-byte size (excl. itself) + body
    ext = struct.pack(">I", 6) + b"\x00" * 6
    frame = b"TIT2" + struct.pack(">I", 4) + b"\x00\x00" + b"\x00Abc"
    body = ext + frame
    ss = bytes(((len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
                (len(body) >> 7) & 0x7F, len(body) & 0x7F))
    tag = b"ID3\x03\x00\x40" + ss + body
    assert parse_id3(tag)["title"] == "Abc"
    # v2.4 extended header: synchsafe size INCLUDING itself
    ext4 = bytes((0, 0, 0, 8)) + b"\x01\x00\x00\x00"
    body4 = ext4 + frame
    ss4 = bytes(((len(body4) >> 21) & 0x7F, (len(body4) >> 14) & 0x7F,
                 (len(body4) >> 7) & 0x7F, len(body4) & 0x7F))
    tag4 = b"ID3\x04\x00\x40" + ss4 + body4
    assert parse_id3(tag4)["title"] == "Abc"
    with _pytest.raises(ValueError):
        parse_id3(b"ID3\x02\x00\x00\x00\x00\x00\x00")


def test_audio_fingerprint_envelope_properties(spark):
    """Volume scaling preserves most delta signs (envelope shape),
    unrelated audio diverges, short/poison docs behave, and the
    fingerprints drop into the shared Hamming machinery."""
    import math
    from tests.test_imagecodec import _write_wav
    from goose_parser_spark.ops.dedup import hamming_pairs
    from goose_parser_spark.ops.multimodal import audio_fingerprint
    import random
    rng = random.Random(5)
    # a smooth envelope: 40 frames x 50 samples
    base = []
    for f in range(41):
        amp = int(4000 + 3500 * math.sin(f / 3) + rng.randrange(200))
        base += [amp if i % 2 == 0 else -amp for i in range(50)]
    quieter = [int(s * 0.7) for s in base]
    other = [rng.randrange(-8000, 8000) for _ in range(len(base))]
    rows = [(1, bytearray(_write_wav(base))),
            (2, bytearray(_write_wav(quieter))),
            (3, bytearray(_write_wav(other))),
            (4, bytearray(b"ID3 only, no frame")),
            (5, bytearray(_write_wav(base[:30])))]  # < 1 frame
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r
           for r in audio_fingerprint(df, frame=50, bits=39).collect()}
    assert got[4]["afp"] is None and got[4]["n_frames"] == 0
    # a doc shorter than one frame yields no frames and therefore no
    # fingerprint row (audio_features emits nothing for it)
    assert 5 not in got
    same = bin(got[1]["afp"] ^ got[2]["afp"]).count("1")
    diff = bin(got[1]["afp"] ^ got[3]["afp"]).count("1")
    assert same <= 6, same       # envelope survives volume scaling
    assert diff >= 10, diff      # unrelated audio lands far
    fps = spark.createDataFrame(
        [(i, got[i]["afp"]) for i in (1, 2, 3)], "doc_id long, afp long")
    pairs = {(r["doc_a"], r["doc_b"])
             for r in hamming_pairs(fps, "afp", max_hamming=6,
                                    bits=39).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs
