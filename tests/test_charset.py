"""Charset sniffing/decoding tests (ops/charset, round 6)."""

from goose_parser_spark.ops.charset import sniff_decode


def test_utf8_bom():
    assert sniff_decode(b"\xef\xbb\xbfU \xc3\xa9") == ("U é",
                                                       "utf-8-bom", 0)


def test_strict_utf8_pass():
    assert sniff_decode("héllo".encode()) == ("héllo", "utf-8", 0)


def test_utf16_boms():
    assert sniff_decode(b"\xff\xfe" + "C1".encode("utf-16-le")) == (
        "C1", "utf-16-le", 0)
    assert sniff_decode(b"\xfe\xff" + "C2".encode("utf-16-be")) == (
        "C2", "utf-16-be", 0)


def test_meta_charset_rung_after_strict_utf8_fails():
    raw = b'<meta charset="iso-8859-1">B \xe9'
    text, cs, n = sniff_decode(raw)
    assert (text, cs, n) == ('<meta charset="iso-8859-1">B é',
                             "iso-8859-1", 0)


def test_meta_http_equiv_form():
    raw = (b'<meta http-equiv="Content-Type" '
           b'content="text/html; charset=koi8-r">\xc1')
    text, cs, _ = sniff_decode(raw)
    assert cs == "koi8-r"
    assert text.endswith("а")  # koi8-r 0xC1 = CYRILLIC SMALL A


def test_meta_ignored_when_utf8_valid():
    # a valid-UTF-8 page with a (wrong) legacy declaration stays UTF-8
    raw = '<meta charset="iso-8859-1">ok é'.encode()
    assert sniff_decode(raw)[1] == "utf-8"


def test_untrusted_codec_name_rejected():
    raw = b'<meta charset="unicode_escape">\xe9'
    text, cs, _ = sniff_decode(raw)
    assert cs == "windows-1252"          # whitelist miss -> fallback
    assert text.endswith("é")


def test_fallback_1252_and_replacement_count():
    # 0x81 is unmapped in cp1252 -> replacement char, counted
    text, cs, n = sniff_decode(b"x \x81 y \xe9")
    assert cs == "windows-1252"
    assert n == 1 and "�" in text and text.endswith("é")


def test_whatwg_latin1_folds_to_1252():
    raw = b'<meta charset="latin-1">\x93quoted\x94'
    text, cs, _ = sniff_decode(raw)
    assert cs == "latin-1"
    # 0x93/0x94 are curly quotes in cp1252 (undefined in true latin-1)
    assert "“quoted”" in text


def test_decode_html_bytes_dataframe(spark):
    from goose_parser_spark.ops.charset import decode_html_bytes
    df = spark.createDataFrame(
        [(1, bytearray("ok é".encode())), (2, None),
         (3, bytearray(b"\xff\xfe" + "w".encode("utf-16-le")))],
        ["doc_id", "payload"])
    rows = {r.doc_id: r for r in decode_html_bytes(df).collect()}
    assert rows[1].text == "ok é" and rows[1].charset == "utf-8"
    assert rows[2].text is None and rows[2].charset == "null"
    assert rows[3].text == "w" and rows[3].charset == "utf-16-le"
