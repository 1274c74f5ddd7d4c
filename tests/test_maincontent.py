"""Main-content extraction (boilerplate strip) + PDF plumbing."""

import pytest

from goose_parser_spark.ops.layout import extract_pdf_pages, parse_pdf_stub
from goose_parser_spark.ops.maincontent import extract_main_content, main_content

ARTICLE = ("The quick brown goose jumped over the lazy crawler and "
           "wrote a long and informative article about web extraction "
           "engines that scale to a trillion documents without breaking.")

LAYOUTS = [
    # classic: nav + sidebar + article + footer
    ('<div class="nav"><a href="/">Home</a><a href="/x">News</a></div>'
     '<article><p>{A}</p></article>'
     '<div class="footer">© <a href="/t">Terms</a></div>'),
    # article via id hint, wrapped in a page container div
    ('<div id="page"><div id="header"><a href="/">logo</a></div>'
     '<div id="main-content"><p>{A}</p></div>'
     '<div id="sidebar"><a href="/a">a</a><a href="/b">b</a></div></div>'),
    # table layout (td candidates)
    ('<table><tr><td class="menu"><a href="/1">one</a><a href="/2">two</a></td>'
     "<td>{A}</td></tr></table>"),
    # comment section after content
    ('<section class="post-body">{A}</section>'
     '<section class="comments"><a href="/u1">user1</a> nice post '
     '<a href="/u2">user2</a> thanks for sharing this</section>'),
]


@pytest.mark.parametrize("layout", LAYOUTS)
def test_main_content_recovers_article(layout):
    html = f"<html><body>{layout.format(A=ARTICLE)}</body></html>"
    text, score = main_content(html)
    assert ARTICLE in text, text[:120]
    # chrome must be stripped
    for junk in ("Home", "Terms", "logo", "user1"):
        assert junk not in text


def test_main_content_plain_text_fallback():
    text, score = main_content("<html><body>just words</body></html>")
    assert "just words" in text


def test_main_content_wrapper_does_not_beat_article():
    # outer div contains article + junk; deepest-wins tie-break plus
    # link-density must pick the article
    html = ('<html><body><div class="wrapper">'
            '<div class="ads"><a href="/buy">BUY NOW!!</a></div>'
            f'<article class="content"><p>{ARTICLE}</p></article>'
            "</div></body></html>")
    text, _ = main_content(html)
    assert text == ARTICLE


def test_extract_main_content_dataframe(spark):
    rows = [("u1", f"<html><body>{LAYOUTS[0].format(A=ARTICLE)}</body></html>".encode()),
            ("u2", None)]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = {r["url"]: r for r in extract_main_content(df).collect()}
    assert ARTICLE in out["u1"]["main_text"]
    assert out["u1"]["error"] is None and out["u1"]["content_score"] > 0
    assert out["u2"]["error"] is not None


def test_pdf_stub_contract():
    with pytest.raises(NotImplementedError):
        parse_pdf_stub(b"%PDF-1.4", fake=False)
    pages = parse_pdf_stub(b"x" * 1100)
    assert [len(p) for p in pages] == [512, 512, 76]
    assert parse_pdf_stub(b"") == [""]


def test_extract_pdf_pages_dataframe(spark):
    rows = [(1, bytearray(b"a" * 700)), (2, bytearray(b"b" * 100)), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = extract_pdf_pages(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 2 and by_doc[1][0]["n_pages"] == 2
    assert len(by_doc[2]) == 1
    assert 3 not in by_doc  # NULL payload skipped
    assert sorted(r["page_no"] for r in by_doc[1]) == [0, 1]


def test_html_to_markdown_structure():
    from goose_parser_spark.ops.maincontent import html_to_markdown
    html = ('<html><head><style>x{}</style></head><body>'
            '<h1>T</h1><p>Hi <a href="/x">lnk</a> and <b>bold</b>.</p>'
            '<ul><li>a</li><li>b</li></ul>'
            '<ol><li>one</li><li>two</li></ol>'
            '<table><tr><th>k</th></tr><tr><td>v</td></tr></table>'
            '<blockquote><p>q</p></blockquote>'
            '<pre>c</pre><hr><h2>S</h2></body></html>')
    md = html_to_markdown(html)
    assert md.startswith("# T\n\nHi [lnk](/x) and **bold**.")
    assert "- a\n- b" in md
    assert "1. one\n2. two" in md
    assert "| k |\n|---|\n| v |" in md
    assert "> q" in md
    assert "```\nc\n```" in md
    assert "\n\n---\n\n## S" in md
    assert "style" not in md


def test_extract_markdown_spark_maponly(spark):
    from goose_parser_spark.ops.maincontent import extract_markdown
    pages = spark.createDataFrame(
        [("u1", "<html><body><h1>A</h1><p>b</p></body></html>"),
         ("u2", None)],
        "url string, html string")
    out = extract_markdown(pages)
    rows = {r["url"]: r for r in out.collect()}
    assert rows["u1"]["markdown"] == "# A\n\nb"
    assert rows["u2"]["error"] is not None      # poison isolation
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
