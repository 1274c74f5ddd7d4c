"""EPUB ingestion (ops/epub.py): zip walk, OPF spine, DOM text."""
from __future__ import annotations

import io
import zipfile

import pytest

from goose_parser_spark.ops.epub import parse_epub


def _epub(chapters, compress=zipfile.ZIP_DEFLATED, opf_dir="OEBPS"):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compress) as zf:
        zf.writestr("mimetype", "application/epub+zip",
                    zipfile.ZIP_STORED)
        zf.writestr("META-INF/container.xml",
                    '<?xml version="1.0"?><container>'
                    f'<rootfiles><rootfile full-path="{opf_dir}/'
                    'content.opf" media-type="application/'
                    'oebps-package+xml"/></rootfiles></container>')
        items = "".join(
            f'<item id="c{i}" href="ch{i}.xhtml" '
            'media-type="application/xhtml+xml"/>'
            for i in range(len(chapters)))
        spine = "".join(f'<itemref idref="c{i}"/>'
                        for i in range(len(chapters)))
        zf.writestr(f"{opf_dir}/content.opf",
                    f'<package><manifest>{items}</manifest>'
                    f'<spine>{spine}</spine></package>')
        for i, html in enumerate(chapters):
            zf.writestr(f"{opf_dir}/ch{i}.xhtml", html)
    return buf.getvalue()


def test_parse_epub_spine_order_and_text():
    book = _epub([
        "<html><body><h1>One</h1><p>First &amp; chapter.</p></body></html>",
        "<html><body><p>Second chapter text.</p></body></html>",
    ])
    chapters = parse_epub(book)
    assert [c["chapter_no"] for c in chapters] == [0, 1]
    assert "First & chapter." in chapters[0]["text"]
    assert chapters[0]["text"].startswith("One")
    assert chapters[1]["text"] == "Second chapter text."


def test_parse_epub_rejects_non_epub():
    with pytest.raises(ValueError):
        parse_epub(b"not a zip")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("random.txt", "zip but not epub")
    with pytest.raises(ValueError):
        parse_epub(buf.getvalue())


def test_parse_epub_bomb_budgets():
    import goose_parser_spark.ops.epub as ep
    old = ep._MAX_TOTAL_BYTES
    ep._MAX_TOTAL_BYTES = 1 << 16
    try:
        book = _epub(["<html><body>" + "x" * (1 << 20) +
                      "</body></html>"])
        with pytest.raises(ValueError):
            parse_epub(book)
    finally:
        ep._MAX_TOTAL_BYTES = old


def test_epub_chapters_spark_op(spark):
    from goose_parser_spark.ops.epub import epub_chapters
    book = _epub(["<html><body><p>Alpha.</p></body></html>",
                  "<html><body><p>Beta.</p></body></html>"])
    df = spark.createDataFrame(
        [(1, bytearray(book)), (2, bytearray(b"junk bytes"))],
        "doc_id long, payload binary")
    rows = {(r.doc_id, r.chapter_no): r
            for r in epub_chapters(df).collect()}
    assert rows[(1, 0)].text == "Alpha."
    assert rows[(1, 1)].text == "Beta."
    assert rows[(2, -1)].text is None  # per-document poison


def test_fuzz_epub_never_hangs():
    import random
    import time
    rnd = random.Random(11)
    valid = _epub(["<html><body><p>ok</p></body></html>"])
    t0 = time.monotonic()
    for cut in range(0, len(valid), max(1, len(valid) // 30)):
        try:
            parse_epub(valid[:cut])
        except ValueError:
            pass
    for _ in range(40):
        buf = bytearray(valid)
        for _ in range(rnd.randrange(1, 4)):
            buf[rnd.randrange(len(buf))] ^= 1 << rnd.randrange(8)
        try:
            parse_epub(bytes(buf))
        except ValueError:
            pass
    assert time.monotonic() - t0 < 20


def test_corrupt_chapter_isolates_not_fails_book():
    """Per-chapter isolation (code-review finding): a chapter with
    corrupt deflate data yields ITS None-text entry while the rest
    of the book extracts."""
    book = bytearray(_epub([
        "<html><body><p>Good one.</p></body></html>",
        "<html><body><p>Will be corrupted badly here.</p></body></html>",
    ]))
    # flip bytes inside the SECOND chapter's deflate stream (the
    # FIRST ch1.xhtml occurrence is its local header; data follows
    # the 9-byte name)
    pos = bytes(book).find(b"ch1.xhtml") + 9
    book[pos + 4] ^= 0xFF
    book[pos + 5] ^= 0xFF
    chapters = parse_epub(bytes(book))
    assert chapters[0]["text"] == "Good one."
    assert chapters[1]["text"] is None
