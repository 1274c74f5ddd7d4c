"""Differential tests: fast regex tokenizer vs stdlib html.parser —
identical trees on fixtures, tricky markup, and random documents."""

from hypothesis import given, settings, strategies as st

from goose_parser_spark.dom.parser import Element, parse_html
from goose_parser_spark.sources.fixtures import pages_rows


def tree_repr(el: Element) -> object:
    return (el.tag, tuple(sorted(el.attrs.items())),
            tuple(tree_repr(c) if isinstance(c, Element) else ("#t", c)
                  for c in el.children))


def assert_same(html: str | bytes) -> None:
    fast = parse_html(html, backend="fast")
    std = parse_html(html, backend="stdlib")
    assert tree_repr(fast) == tree_repr(std), html


TRICKY = [
    "",
    "plain text only",
    "<p>a<p>b<p>c",
    "<ul><li>1<li>2<ul><li>2a</ul><li>3</ul>",
    "<table><tr><td>a<td>b<tr><td>c</table>",
    '<a href="?x=1&amp;y=2" title=\'it&apos;\'>caf&eacute;</a>',
    "<div>a <b>b</b>\n c</div>",
    "<!DOCTYPE html><!-- c --><html><head><title>t</title></head><body>x</body></html>",
    "<script>if (a < b && c > d) { x = '<div>'; }</script><p>after</p>",
    "<style>.x > .y { color: red; }</style><p>ok</p>",
    "<div class='single'>single-quoted</div>",
    "<div data-empty>novalue</div>",
    "<img src=x><br><hr><input type=text>",
    "<div>3 < 5 and 7 > 2</div>",
    "<div>unclosed <b>bold",
    "</stray>end tags</div> everywhere</p>",
    "<div CLASS='UP'>case</div>",
    "<área>unicode-ish tag</área>",
    "<div><!-- unterminated comment <p>hidden",
    "<p>&not-an-entity; &amp; &#65; &#x42;</p>",
    "<select><option>a<option>b</select>",
    "<div a=1 a=2>dupe attr</div>",
    "<svg/><math/>",
    "北京 plain unicode 🦢 <span>x</span>",
    "<div><![CDATA[a > b]]></div>",
    "<div><![CDATA[unterminated > stuff",
    "<div><?php if ($a > $b) { ?>x<?php } ?></div>",
    '<!--[if IE]><p class="ie">old</p><![endif]--><p class="m">new</p>',
    '<div data-x="a>b">gt in attr</div>',
    # ADVICE r01 (high): unquoted attr values ending in '/' must keep
    # the slash and NOT self-close the element (html.parser bare value
    # is [^>\s]* — the '/' belongs to the value).
    '<a href=http://x.com/>link</a>',
    '<a href=/foo/>rel</a>',
    '<img src=/a/b/><span>after</span>',
    '<a foo=bar/>slash-in-value</a>',
    '<a href=http://x.com/ >spaced</a>',
    '<a href=http://x.com/ />self-closed-after-space</a>',
    # XHTML-ish self-closing forms (must self-close: '/' unconsumed)
    '<div/>after',
    '<span attr="v"/>after',
    '<span attr/>boolean-then-slash',
    # self-closed script/style: html.parser skips cdata mode
    '<script/>&amp;<p>x</p>',
    '<style/>&amp;text',
    '<script src=/static/app.js></script><p>y</p>',
]


def test_tricky_markup_identical():
    for html in TRICKY:
        assert_same(html)


def test_all_fixture_pages_identical():
    for row in pages_rows(66):
        assert_same(row["html"])


_TAGS = ["div", "span", "p", "b", "ul", "li", "table", "tr", "td", "a", "br"]


@st.composite
def _rand_html(draw, depth=3):
    def node(d):
        kind = draw(st.integers(0, 5))
        if kind == 0 or d == 0:
            return draw(st.text(
                alphabet=st.characters(blacklist_characters="<>&",
                                       blacklist_categories=("Cs", "Cc")),
                max_size=12))
        tag = draw(st.sampled_from(_TAGS))
        cls = draw(st.sampled_from(["", ' class="x"', ' class="x y"',
                                    ' id="i7"', " data-k='v'"]))
        kids = "".join(node(d - 1) for _ in range(draw(st.integers(0, 3))))
        if kind == 1:
            return f"<{tag}{cls}>{kids}"          # unclosed
        return f"<{tag}{cls}>{kids}</{tag}>"
    return node(depth)


@settings(max_examples=150, deadline=None)
@given(html=_rand_html())
def test_random_documents_identical(html):
    assert_same(html)


def test_markup_soup_differential():
    """Adversarial markup soup: both backends must agree except the
    documented unbalanced-quote-in-tag class (fastparser.py header)."""
    import random
    rng = random.Random(42)
    pieces = ['<div class="a">', "</div>", "<p>", "</p>", "<span>",
              "</span>", "text ", "&amp;", "&eacute;", "<!-- c -->",
              "<![CDATA[x > y]]>", "<?pi a > b ?>", "<br>",
              "<img src=x>", "<b", ">", '<a href="u?a=1&amp;b=2">',
              "</a>", "<li>", "<ul>", "</ul>", "<table>", "<tr>",
              "<td>", "</table>", "3 < 5", "&#65;",
              "<a href=http://x/>", "<img src=/a/b/>", "<a foo=bar/>",
              "<div/>", '<span a="v"/>', "<script/>"]
    diffs = 0
    for _ in range(1500):
        html = "".join(rng.choice(pieces) for _ in range(rng.randint(1, 25)))
        fast = tree_repr(parse_html(html, backend="fast"))
        std = tree_repr(parse_html(html, backend="stdlib"))
        if fast != std:
            diffs += 1
    assert diffs == 0, diffs


def test_unbalanced_quote_divergence_is_stable():
    """The known-divergent inputs must still parse without error on
    both backends and never lose following well-formed content on the
    fast path."""
    from goose_parser_spark.dom.selector import select
    for h in ['<b3 < 5"<p>x', "<b3 < 5'<p>x"]:
        fast = parse_html(h, backend="fast")
        parse_html(h, backend="stdlib")  # no crash
        assert [e.text() for e in select(fast, "p")] == ["x"]


def test_hard_scanner_paths_through_full_extraction():
    """Quoted '>' and '<' inside attribute values — the split-scanner's
    exact-regex fallback paths — must survive the FULL rule pipeline:
    selectors still match and attr extraction returns the raw value."""
    from goose_parser_spark.rules.compiler import RuleCompiler
    from goose_parser_spark.rules.evaluator import evaluate_document
    html = ('<html><body>'
            '<div class="doc" title="a > b and a < b">'
            '<h1 class="t">Title</h1>'
            "<p class=\"b\" data-x='1<2>3'>Body text</p>"
            '</div></body></html>')
    compiled = RuleCompiler().compile({
        "scope": "div.doc",
        "collection": [
            {"name": "title", "scope": "h1.t"},
            {"name": "body", "scope": "p.b"},
            {"name": "note", "scope": "div.doc", "attr": "title",
             "parentScope": "body"},
            {"name": "x", "scope": "p.b", "attr": "data-x",
             "parentScope": "body"},
        ],
    })
    out = evaluate_document(compiled, html)
    assert out["title"] == "Title"
    assert out["body"] == "Body text"
    assert out["note"] == "a > b and a < b"
    assert out["x"] == "1<2>3"
