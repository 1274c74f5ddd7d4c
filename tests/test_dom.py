"""DOM backend unit tests: parsing, recovery, textContent fidelity
(SURVEY.md §2.2 C1-C8; FIXTURES.md F-18/F-19/F-21)."""

from goose_parser_spark.dom.parser import parse_html
from goose_parser_spark.dom.selector import select


def _one(root, sel):
    els = select(root, sel)
    assert len(els) == 1, f"{sel} matched {len(els)}"
    return els[0]


def test_basic_tree():
    root = parse_html("<div><p>a</p><p>b</p></div>")
    ps = select(root, "div p")
    assert [p.text() for p in ps] == ["a", "b"]


def test_text_content_no_normalization():
    root = parse_html('<div class="w">a <b>b</b>\n c</div>')
    assert _one(root, "div.w").text() == "a b\n c"


def test_entities_decoded_in_text_and_attrs():
    root = parse_html('<a href="?a=1&amp;b=2">caf&eacute; &amp; x</a>')
    a = _one(root, "a")
    assert a.text() == "café & x"
    assert a.attr("href") == "?a=1&b=2"


def test_void_elements_do_not_nest():
    root = parse_html("<p>a<br>b<img src=x>c</p>")
    p = _one(root, "p")
    assert p.text() == "abc"
    assert len(select(root, "p br")) == 1
    assert len(select(root, "p img")) == 1


def test_p_auto_close():
    root = parse_html('<div><p class="a">alpha<p class="b">beta</div>')
    a = _one(root, "p.a")
    b = _one(root, "p.b")
    assert a.text() == "alpha"
    assert b.text() == "beta"
    # beta's <p> is a sibling, not a child, of alpha's
    assert b.parent is a.parent


def test_li_auto_close():
    root = parse_html("<ul><li>one<li>two<li>three</ul>")
    lis = select(root, "ul > li")
    assert [li.text() for li in lis] == ["one", "two", "three"]


def test_nested_list_li_not_closed_by_inner():
    root = parse_html("<ul><li>a<ul><li>a1</li></ul></li><li>b</li></ul>")
    outer = select(root, "body > ul > li")
    assert len(outer) == 2
    assert outer[0].text() == "aa1"


def test_tbody_inserted_like_browsers():
    root = parse_html("<table><tr><td>x</td></tr></table>")
    assert len(select(root, "table > tbody > tr")) == 1
    assert len(select(root, "table tr")) == 1
    # explicit tbody not duplicated
    root2 = parse_html("<table><tbody><tr><td>x</td></tr></tbody></table>")
    assert len(select(root2, "table > tbody")) == 1


def test_td_th_tr_implied_ends():
    root = parse_html("<table><tr><td>a<td>b<tr><td>c</table>")
    rows = select(root, "tr")
    assert len(rows) == 2
    assert [td.text() for td in select(root, "td")] == ["a", "b", "c"]


def test_stray_end_tags_ignored():
    root = parse_html("<div>a</span></div></div>")
    assert _one(root, "div").text() == "a"


def test_duplicate_attr_first_wins():
    root = parse_html('<a class="x" class="y">t</a>')
    assert _one(root, "a").attr("class") == "x"


def test_comments_not_in_text():
    root = parse_html("<div>a<!-- nope -->b</div>")
    assert _one(root, "div").text() == "ab"


def test_script_style_text_kept():
    # textContent DOES include script/style character data (DOM spec)
    root = parse_html("<div><style>.x{}</style>ok</div>")
    assert _one(root, "div").text() == ".x{}ok"


def test_inner_html_roundtrip():
    root = parse_html('<div id="d"><b>x</b> &amp; <i>y</i></div>')
    assert _one(root, "#d").inner_html() == "<b>x</b> &amp; <i>y</i>"


def test_bytes_input_utf8():
    root = parse_html("<p>北京 🦢</p>".encode("utf-8"))
    assert _one(root, "p").text() == "北京 🦢"


def test_document_order_is_global():
    root = parse_html("<div><a>1</a></div><div><a>2</a></div>")
    els = select(root, "a")
    assert [e.text() for e in els] == ["1", "2"]
    assert els[0].order < els[1].order
