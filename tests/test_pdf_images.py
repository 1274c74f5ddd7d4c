"""PDF filter chain completeness + embedded-image extraction.

Round-6 session 6: ops/layout.py grew the remaining standard
non-image stream filters (LZWDecode, ASCIIHexDecode, ASCII85Decode,
RunLengthDecode, PNG/TIFF predictors for Flate/LZW) and
parse_pdf_images / pdf_images — figure mining into the cross-modal
pHash space, with the DCTDecode path riding the round-6 pure-stdlib
JPEG decoder. Encoders used to author fixtures are the test-side
implementations already pinned elsewhere (tests/test_jpeg
encode_jpeg_gray, tests/test_imagecodec _tiff_lzw_encode — the pair
whose conventions were anchored against libtiff in the session-4
review pass); ASCII85/Hex authoring uses the stdlib encoders.
"""
from __future__ import annotations

import base64
import zlib

import pytest

from goose_parser_spark.ops.layout import (
    _apply_filters,
    _ascii85,
    _asciihex,
    _filter_names,
    _png_unpredict,
    _runlength,
    parse_pdf_images,
    parse_pdf_text,
)

# ---------------------------------------------------------------------------
# PDF authoring helpers (fixtures, not production code)
# ---------------------------------------------------------------------------


def _obj(num: int, body: bytes, stream: bytes | None = None) -> bytes:
    out = b"%d 0 obj\n" % num + body
    if stream is not None:
        out += b"\nstream\n" + stream + b"\nendstream"
    return out + b"\nendobj\n"


def _pdf(objects: list[bytes]) -> bytes:
    return b"%PDF-1.4\n" + b"".join(objects) + b"%%EOF\n"


def _page_skeleton(content: bytes,
                   extra_objects: list[bytes] | None = None,
                   resources: bytes = b"") -> bytes:
    objs = [
        _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        _obj(3, b"<< /Type /Page /Parent 2 0 R " + resources +
             b" /Contents 5 0 R >>"),
        _obj(5, b"<< /Length %d >>" % len(content), content),
    ]
    return _pdf(objs + (extra_objects or []))


def _text_content(s: bytes) -> bytes:
    return b"BT /F1 12 Tf 72 720 Td (" + s + b") Tj ET"


# ---------------------------------------------------------------------------
# filter primitives
# ---------------------------------------------------------------------------

def test_asciihex_decode():
    assert _asciihex(b"48 65 6C 6C 6F>") == b"Hello"
    # odd final digit behaves as if followed by 0
    assert _asciihex(b"7>") == b"\x70"


def test_ascii85_decode():
    enc = base64.a85encode(b"some binary \x00\xff payload")
    assert _ascii85(enc + b"~>") == b"some binary \x00\xff payload"
    assert _ascii85(enc) == b"some binary \x00\xff payload"


def test_runlength_decode():
    # 2 literals, a 5-byte run of 'x', EOD
    raw = bytes([1]) + b"ab" + bytes([252]) + b"x" + bytes([128])
    assert _runlength(raw) == b"ab" + b"x" * 5


def test_filter_name_parsing_and_aliases():
    assert _filter_names(b"<< /Filter /FlateDecode >>") == \
        [b"FlateDecode"]
    assert _filter_names(
        b"<< /Filter [/ASCII85Decode /LZWDecode] >>") == \
        [b"ASCII85Decode", b"LZWDecode"]
    assert _filter_names(b"<< /Filter [/A85 /Fl] >>") == \
        [b"ASCII85Decode", b"FlateDecode"]
    assert _filter_names(b"<< >>") == []


def test_png_predictor_roundtrip():
    # author: apply PNG filters forward (types 0..4 across rows),
    # inverse must reproduce the raw rows
    import random
    rnd = random.Random(5)
    columns, rows, bpp = 16, 6, 1
    raw = [bytes(rnd.randrange(256) for _ in range(columns))
           for _ in range(rows)]
    enc = bytearray()
    prev = bytes(columns)
    for r, row in enumerate(raw):
        ft = r % 5
        enc.append(ft)
        for i in range(columns):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                v = row[i]
            elif ft == 1:
                v = row[i] - a
            elif ft == 2:
                v = row[i] - b
            elif ft == 3:
                v = row[i] - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else \
                    (b if pb <= pc else c)
                v = row[i] - pr
            enc.append(v & 255)
        prev = row
    head = b"<< /DecodeParms << /Predictor 15 /Columns 16 >> >>"
    assert _png_unpredict(bytes(enc), head) == b"".join(raw)


def test_lzw_filter_via_known_good_encoder():
    from tests.test_imagecodec import _tiff_lzw_encode
    data = b"aaaabbbbccccddddaaaabbbb" * 40
    enc = _tiff_lzw_encode(data)
    head = b"<< /Filter /LZWDecode >>"
    assert _apply_filters(head, enc, [b"LZWDecode"]) == data


def test_chained_filters_in_text_extraction():
    """A content stream Flate-compressed THEN ASCII85-armored — the
    chain must apply in spec order (85 first, then Flate)."""
    content = _text_content(b"chained filters work")
    armored = base64.a85encode(zlib.compress(content)) + b"~>"
    objs = [
        _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        _obj(3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
        _obj(5, b"<< /Length %d /Filter [/ASCII85Decode "
             b"/FlateDecode] >>" % len(armored), armored),
    ]
    pages = parse_pdf_text(_pdf(objs))
    assert pages == ["chained filters work"]


def test_runlength_and_hex_in_text_extraction():
    content = _text_content(b"rle+hex")
    rle = bytes([len(content) - 1]) + content + bytes([128])
    hexed = rle.hex().encode() + b">"
    objs = [
        _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        _obj(3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
        _obj(5, b"<< /Length %d /Filter [/ASCIIHexDecode "
             b"/RunLengthDecode] >>" % len(hexed), hexed),
    ]
    assert parse_pdf_text(_pdf(objs)) == ["rle+hex"]


# ---------------------------------------------------------------------------
# embedded images
# ---------------------------------------------------------------------------

def _gray_pattern(w, h, seed=3):
    return [(x * 7 + y * 13 + seed * 29) % 256
            for y in range(h) for x in range(w)]


def _image_obj(num, w, h, head_extra: bytes, stream: bytes) -> bytes:
    return _obj(num, b"<< /Subtype /Image /Width %d /Height %d "
                b"/BitsPerComponent 8 %s /Length %d >>"
                % (w, h, head_extra, len(stream)), stream)


def test_pdf_images_dct_and_raw_and_poison():
    from tests.test_jpeg import encode_jpeg_gray
    w, h = 16, 16
    px = _gray_pattern(w, h)
    jpeg = encode_jpeg_gray(w, h, px, [1] * 64)  # near-lossless quant
    gray = bytes(_gray_pattern(8, 8, seed=4))
    rgb = bytes(b for p in _gray_pattern(8, 8, seed=5)
                for b in (p, 255 - p, (p * 3) % 256))
    doc = _page_skeleton(
        _text_content(b"figures"),
        extra_objects=[
            _image_obj(6, w, h, b"/ColorSpace /DeviceGray "
                       b"/Filter /DCTDecode", jpeg),
            _image_obj(7, 8, 8, b"/ColorSpace /DeviceGray "
                       b"/Filter /FlateDecode", zlib.compress(gray)),
            _image_obj(8, 8, 8, b"/ColorSpace /DeviceRGB", rgb),
            _image_obj(9, 8, 8, b"/ColorSpace /DeviceGray "
                       b"/Filter /JPXDecode", b"\x00" * 16),
        ],
        resources=b"/Resources << /XObject << /Im1 6 0 R >> >>")
    images = parse_pdf_images(doc)
    assert [i["image_no"] for i in images] == [0, 1, 2, 3]
    # DCT image: decoded by the pinned JPEG decoder
    from goose_parser_spark.ops.imagecodec import decode_image_gray
    jw, jh, jpx = decode_image_gray(jpeg)
    assert images[0]["fmt"] == "jpeg"
    assert (images[0]["width"], images[0]["height"]) == (w, h)
    assert images[0]["pixels"] == jpx
    # raw gray after Flate
    assert images[1]["fmt"] == "raw"
    assert bytes(images[1]["pixels"]) == gray
    # raw RGB -> BT.601 gray
    exp = [(299 * rgb[i] + 587 * rgb[i + 1] + 114 * rgb[i + 2]
            + 500) // 1000 for i in range(0, len(rgb), 3)]
    assert images[2]["pixels"] == exp
    # JPX: per-image poison, the others still extracted
    assert images[3]["fmt"] == "undecodable"
    assert images[3]["pixels"] is None


def test_pdf_images_pixel_budget():
    huge = _image_obj(6, 10000, 10000,
                      b"/ColorSpace /DeviceGray", b"\x00" * 10)
    doc = _page_skeleton(_text_content(b"x"), extra_objects=[huge])
    images = parse_pdf_images(doc)
    assert images[0]["fmt"] == "undecodable"
    assert images[0]["pixels"] is None


def test_pdf_images_encrypted_rejected():
    doc = _page_skeleton(_text_content(b"x"))
    doc = doc.replace(b"%PDF-1.4\n", b"%PDF-1.4\n% /Encrypt\n")
    with pytest.raises(ValueError):
        parse_pdf_images(doc)


# ---------------------------------------------------------------------------
# Spark op
# ---------------------------------------------------------------------------

def test_pdf_images_spark_op(spark):
    from tests.test_jpeg import encode_jpeg_gray

    from goose_parser_spark.ops.layout import pdf_images
    w, h = 16, 16
    jpeg = encode_jpeg_gray(w, h, _gray_pattern(w, h), [1] * 64)
    gray = bytes(_gray_pattern(8, 8, seed=4))
    doc = _page_skeleton(
        _text_content(b"figures"),
        extra_objects=[
            _image_obj(6, w, h, b"/ColorSpace /DeviceGray "
                       b"/Filter /DCTDecode", jpeg),
            _image_obj(7, 8, 8, b"/ColorSpace /DeviceGray", gray),
            _image_obj(8, 8, 8, b"/ColorSpace /DeviceGray "
                       b"/Filter /JPXDecode", b"\x00" * 9),
        ])
    df = spark.createDataFrame(
        [(1, bytearray(doc)), (2, bytearray(b"not a pdf"))],
        "doc_id long, payload binary")
    rows = {(r.doc_id, r.image_no): r for r in pdf_images(df).collect()}
    assert set(rows) == {(1, 0), (1, 1), (1, 2), (2, -1)}
    assert rows[(1, 0)].fmt == "jpeg" and rows[(1, 0)].phash is not None
    assert rows[(1, 1)].fmt == "raw" and rows[(1, 1)].phash is not None
    assert rows[(1, 2)].phash is None       # per-image poison
    assert rows[(2, -1)].phash is None      # per-document poison
    # cross-modal identity: the raw 8x8 image's hash equals the hash
    # phash_image computes for the same pixels shipped as a PGM —
    # PDF figures land in the same Hamming space as stills
    from goose_parser_spark.ops.multimodal import phash_image
    pgm = b"P5 8 8 255\n" + gray
    still = spark.createDataFrame([(7, bytearray(pgm))],
                                  "doc_id long, payload binary")
    sh = phash_image(still).collect()[0].phash
    assert rows[(1, 1)].phash == sh


# ---------------------------------------------------------------------------
# object streams (PDF 1.5+ compressed xref)
# ---------------------------------------------------------------------------

def _objstm_pdf(content: bytes) -> bytes:
    """A modern-shape PDF: catalog, page tree and page dict packed
    inside a Flate-compressed /ObjStm; only the content stream is a
    direct object."""
    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
    ]
    bodies = b""
    pairs = b""
    for num, body in inner:
        pairs += b"%d %d " % (num, len(bodies))
        bodies += body + b" "
    payload = pairs + bodies
    z = zlib.compress(payload)
    objs = [
        _obj(9, b"<< /Type /ObjStm /N %d /First %d /Length %d "
             b"/Filter /FlateDecode >>" % (len(inner), len(pairs),
                                           len(z)), z),
        _obj(5, b"<< /Length %d >>" % len(content), content),
    ]
    return _pdf(objs)


def test_object_stream_pdf_extracts():
    pages = parse_pdf_text(_objstm_pdf(_text_content(b"objstm ok")))
    assert pages == ["objstm ok"]


def test_object_stream_direct_definition_wins():
    doc = _objstm_pdf(_text_content(b"from objstm"))
    # append a DIRECT page object 3 pointing at a different content
    extra_content = _text_content(b"direct wins")
    doc = doc.replace(b"%%EOF\n", b"")
    doc += _obj(3, b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>")
    doc += _obj(6, b"<< /Length %d >>" % len(extra_content),
                extra_content)
    doc += b"%%EOF\n"
    assert parse_pdf_text(doc) == ["direct wins"]


_TASN1 = "/usr/share/doc/libtasn1-doc/libtasn1.pdf"
_MIME = "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf"


@pytest.mark.skipif(not __import__("os").path.exists(_TASN1),
                    reason="Debian doc PDF not present")
def test_real_world_objstm_pdf_libtasn1():
    """A REAL pdfTeX 1.5 PDF (Debian-shipped GNU manual): object
    streams + xref streams + Flate throughout. 36 pages must extract
    with recognizable text — the external-world pin for the ObjStm
    and filter layers."""
    from goose_parser_spark.ops.layout import parse_pdf_info
    data = open(_TASN1, "rb").read()
    pages = parse_pdf_text(data)
    assert len(pages) == 36
    assert "Libtasn1" in pages[0]
    assert "Abstract Syntax Notation One" in pages[0]
    joined = "\n".join(pages)
    assert "asn1_parser2tree" in joined  # API docs deep in the file
    info = parse_pdf_info(data)
    assert info["n_pages"] == 36
    assert info["producer"].startswith("pdfTeX")


@pytest.mark.skipif(not __import__("os").path.exists(_MIME),
                    reason="Debian doc PDF not present")
def test_real_world_objstm_pdf_mime_spec():
    data = open(_MIME, "rb").read()
    pages = parse_pdf_text(data)
    assert len(pages) == 17
    assert "Shared MIME-info Database" in pages[0]
    # the /Encoding /Differences glyph table must resolve the Type1
    # ligature codes: "specification" used to extract as
    # "speci\x02cation" before the AGL table landed
    assert "specification" in pages[0]
    assert not any("\x02" in p or "\x01" in p for p in pages)


# ---------------------------------------------------------------------------
# /ToUnicode CMaps (modern CID/Identity-H text)
# ---------------------------------------------------------------------------

_CMAP = b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
1 begincodespacerange <0000> <FFFF> endcodespacerange
3 beginbfchar
<0041> <0048>
<0042> <0065>
<0100> <00660069>
endbfchar
1 beginbfrange
<0050> <0052> <006C>
endbfrange
1 beginbfrange
<0060> <0062> [<0057> <006F573E> <0072>]
endbfrange
endcmap end end"""


def _cid_pdf(content: bytes, cmap: bytes = _CMAP,
             inherit_resources: bool = False) -> bytes:
    res = (b"/Resources << /Font << /G1 7 0 R >> >> ")
    page = b"<< /Type /Page /Parent 2 0 R " + \
        (b"" if inherit_resources else res) + b"/Contents 5 0 R >>"
    pages = b"<< /Type /Pages /Kids [3 0 R] /Count 1 " + \
        (res if inherit_resources else b"") + b">>"
    objs = [
        _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        _obj(2, pages),
        _obj(3, page),
        _obj(5, b"<< /Length %d >>" % len(content), content),
        _obj(7, b"<< /Type /Font /Subtype /Type0 /BaseFont /X "
             b"/Encoding /Identity-H /ToUnicode 8 0 R >>"),
        _obj(8, b"<< /Length %d >>" % len(cmap), cmap),
    ]
    return _pdf(objs)


def test_tounicode_bfchar_and_bfrange():
    # codes: 0041->H, 0042->e, 0050..0052 -> l,m,n (increment form)
    content = (b"BT /G1 12 Tf 72 720 Td "
               b"<00410042005000510052> Tj ET")
    assert parse_pdf_text(_cid_pdf(content)) == ["Helmn"]


def test_tounicode_ligature_expansion():
    # one CID expands to two characters ("fi")
    content = b"BT /G1 12 Tf 72 720 Td <0100> Tj ET"
    assert parse_pdf_text(_cid_pdf(content)) == ["fi"]


def test_tounicode_bfrange_array_form():
    # 0060->W, 0061->two UTF-16 units "o"+U+573E, 0062->r
    content = b"BT /G1 12 Tf 72 720 Td <006000610062> Tj ET"
    assert parse_pdf_text(_cid_pdf(content)) == ["Wo圾r"]


def test_tounicode_tj_array_with_kerning():
    content = (b"BT /G1 12 Tf 72 720 Td "
               b"[<0041> -300 <0042>] TJ ET")
    assert parse_pdf_text(_cid_pdf(content)) == ["H e"]


def test_tounicode_unmapped_code_is_replacement():
    content = b"BT /G1 12 Tf 72 720 Td <0041FFFE> Tj ET"
    assert parse_pdf_text(_cid_pdf(content)) == ["H\N{REPLACEMENT CHARACTER}"]


def test_tounicode_inherited_resources():
    """Pages-node /Resources inherit down to the page (PDF 32000
    §7.7.3.4) — the common writer layout."""
    content = b"BT /G1 12 Tf 72 720 Td <00410042> Tj ET"
    assert parse_pdf_text(
        _cid_pdf(content, inherit_resources=True)) == ["He"]


def test_font_switching_mid_page():
    """Tf switches decode per font: simple fonts (no ToUnicode) keep
    latin-1, the CID font rides its CMap, and switching back works."""
    content = (b"BT /F1 10 Tf 72 720 Td (plain) Tj "
               b"/G1 10 Tf <0041> Tj "
               b"/F1 10 Tf (tail) Tj ET")
    doc = _cid_pdf(content)
    # add a simple font F1 without ToUnicode to the same dict
    doc = doc.replace(b"/Font << /G1 7 0 R >>",
                      b"/Font << /G1 7 0 R /F1 10 0 R >>")
    doc = doc.replace(b"%%EOF\n", b"")
    doc += _obj(10, b"<< /Type /Font /Subtype /Type1 "
                b"/BaseFont /Helvetica >>") + b"%%EOF\n"
    assert parse_pdf_text(doc) == ["plainHtail"]


# ---------------------------------------------------------------------------
# simple-font /Encoding /Differences (glyph-name tables)
# ---------------------------------------------------------------------------

def _diff_pdf(content: bytes, differences: bytes) -> bytes:
    objs = [
        _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        _obj(3, b"<< /Type /Page /Parent 2 0 R /Resources "
             b"<< /Font << /T1 7 0 R >> >> /Contents 5 0 R >>"),
        _obj(5, b"<< /Length %d >>" % len(content), content),
        _obj(7, b"<< /Type /Font /Subtype /Type1 /BaseFont /Q "
             b"/Encoding 8 0 R >>"),
        _obj(8, b"<< /Type /Encoding /Differences [" + differences
             + b"] >>"),
    ]
    return _pdf(objs)


def test_differences_ligatures_and_names():
    # pdfTeX shape: fi/fl at codes 2/3, unmapped codes latin-1
    content = b"BT /T1 10 Tf 72 720 Td (speci\x02c \x03ow) Tj ET"
    doc = _diff_pdf(content, b"2/fi/fl")
    assert parse_pdf_text(doc) == ["specific flow"]


def test_differences_systematic_glyph_names():
    content = b"BT /T1 10 Tf 72 720 Td (\x01\x02\x03\x04) Tj ET"
    doc = _diff_pdf(content,
                    b"1/endash/uni20AC/x/quotedblleft")
    assert parse_pdf_text(doc) == ["–€x“"]


def test_differences_unknown_glyph_skipped():
    # /nonsenseglyph resolves to nothing -> latin-1 fallback for 5
    content = b"BT /T1 10 Tf 72 720 Td (\x05A) Tj ET"
    doc = _diff_pdf(content, b"5/nonsenseglyphxyz")
    assert parse_pdf_text(doc) == ["\x05A"]


# ---------------------------------------------------------------------------
# fuzz: the PDF layer parses arbitrary web bytes
# ---------------------------------------------------------------------------

def test_fuzz_pdf_paths_never_hang_or_blow():
    """Random blobs, magic-prefixed garbage and bit-flips of a valid
    document through all three entry points: bounded time, no
    uncaught exceptions beyond ValueError."""
    import random
    import time

    from goose_parser_spark.ops.layout import (
        parse_pdf_images, parse_pdf_info, parse_pdf_text)
    rnd = random.Random(17)
    valid = _cid_pdf(b"BT /G1 12 Tf 72 720 Td <00410042> Tj ET")
    t0 = time.monotonic()
    cases = []
    for n in (0, 7, 300, 4096):
        cases.append(bytes(rnd.randrange(256) for _ in range(n)))
        cases.append(b"%PDF-1.7\n" +
                     bytes(rnd.randrange(256) for _ in range(n)))
    for _ in range(40):
        buf = bytearray(valid)
        for _ in range(rnd.randrange(1, 5)):
            buf[rnd.randrange(len(buf))] ^= 1 << rnd.randrange(8)
        cases.append(bytes(buf))
    for cut in range(0, len(valid), max(1, len(valid) // 25)):
        cases.append(valid[:cut])
    for blob in cases:
        for fn in (parse_pdf_text, parse_pdf_images, parse_pdf_info):
            try:
                fn(blob)
            except ValueError:
                pass
    assert time.monotonic() - t0 < 30


def test_crafted_cmap_bombs_bounded():
    """A CMap declaring huge bfranges and a full-digit ObjStm prefix
    must stay inside the entry/size caps."""
    import time

    from goose_parser_spark.ops.layout import _parse_tounicode
    # many maximal ranges: table must stop at the entry cap
    bomb = b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
    bomb += b"1 beginbfrange\n" + \
        b"\n".join(b"<0000> <FFFF> <0041>" for _ in range(64)) + \
        b"\nendbfrange"
    t0 = time.monotonic()
    clen, table = _parse_tounicode(bomb)
    assert len(table) <= (1 << 17) + 0x10000
    assert time.monotonic() - t0 < 10
    # oversized stream rejected outright
    with pytest.raises(ValueError):
        _parse_tounicode(b"x" * ((4 << 20) + 1))
    # base+k overflow in the increment form must not raise
    _clen, t = _parse_tounicode(
        b"1 beginbfrange <0000> <00FF> <FFFF> endbfrange")
    assert len(t) == 256


def test_crafted_objstm_digit_prefix_bounded():
    """/First pointing at megabytes of digits with a huge /N claim
    must not materialize millions of matches."""
    import time
    import zlib as _z

    from goose_parser_spark.ops.layout import (
        _expand_object_streams, _scan_objects)
    digits = b"1 " * 500_000
    z = _z.compress(digits)
    doc = _pdf([_obj(4, b"<< /Type /ObjStm /N 999999999 /First "
                     b"999999999 /Length %d /Filter /FlateDecode >>"
                     % len(z), z)])
    objects = _scan_objects(doc)
    t0 = time.monotonic()
    _expand_object_streams(objects)
    assert time.monotonic() - t0 < 10


def test_octal_escape_overflow_ignored():
    """PDF 32000 §7.3.4.2: high-order overflow in \\400..\\777 octal
    escapes is ignored — such strings must extract, not poison the
    document (code-review finding: bytearray.append(511) crashed)."""
    pages = parse_pdf_text(_page_skeleton(
        b"BT (\\777abc \\101) Tj ET"))
    assert pages == ["\xffabc A"]
