"""PDF /Info metadata tests (ops/layout.parse_pdf_info, round 6)."""

import pytest

from goose_parser_spark.ops.layout import parse_pdf_info


def _pdf(info_obj=b"", trailer=b"", pages=1):
    kids = " ".join(f"{10 + i} 0 R" for i in range(pages)).encode()
    page_objs = b"".join(
        b"%d 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
        b"\nendobj\n" % (10 + i) for i in range(pages))
    return (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [" + kids
            + b"] /Count %d >>\nendobj\n" % pages
            + page_objs
            + b"4 0 obj\n<< /Length 14 >>\nstream\nBT (pg) Tj ET\n"
            b"endstream\nendobj\n"
            + info_obj + b"trailer\n<< /Size 9 /Root 1 0 R "
            + trailer + b">>\n%%EOF")


def test_basic_fields_and_page_count():
    info = (b"5 0 obj\n<< /Title (Hello) /Author (me) "
            b"/Subject (s) /Producer (p) /CreationDate (D:2024) >>\n"
            b"endobj\n")
    got = parse_pdf_info(_pdf(info, b"/Info 5 0 R ", pages=3))
    assert got == {"n_pages": 3, "title": "Hello", "author": "me",
                   "subject": "s", "producer": "p", "created": "D:2024"}


def test_escapes_octal_hex_nested_parens():
    info = (b"5 0 obj\n<< /Title (a \\(b\\) \\101\\12) "
            b"/Author <48490A> /Producer (x (nested) y) >>\nendobj\n")
    got = parse_pdf_info(_pdf(info, b"/Info 5 0 R "))
    assert got["title"] == "a (b) A\n"
    assert got["author"] == "HI\n"
    assert got["producer"] == "x (nested) y"


def test_no_info_reference():
    got = parse_pdf_info(_pdf())
    assert got["n_pages"] == 1
    assert got["title"] is None and got["producer"] is None


def test_last_info_reference_wins():
    # incremental update: a second trailer points at a newer Info
    info = (b"5 0 obj\n<< /Title (old) >>\nendobj\n"
            b"6 0 obj\n<< /Title (new) >>\nendobj\n")
    data = _pdf(info, b"/Info 5 0 R ")
    data += b"\ntrailer\n<< /Size 9 /Root 1 0 R /Info 6 0 R >>\n%%EOF"
    assert parse_pdf_info(data)["title"] == "new"


def test_encrypted_rejected():
    with pytest.raises(ValueError, match="encrypted"):
        parse_pdf_info(b"%PDF-1.4\n/Encrypt 1 0 obj endobj")


def test_pdf_metadata_dataframe(spark):
    from pyspark.sql import functions as F
    from goose_parser_spark.ops.layout import pdf_metadata
    info = b"5 0 obj\n<< /Title (T1) >>\nendobj\n"
    good = _pdf(info, b"/Info 5 0 R ")
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a pdf at all"))],
        ["doc_id", "payload"])
    rows = {r.doc_id: r for r in pdf_metadata(df).collect()}
    assert rows[1].title == "T1" and rows[1].n_pages == 1
    assert rows[1].error is None
    assert rows[2].n_pages == -1 and rows[2].error  # I4 isolation
