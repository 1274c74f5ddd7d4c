"""HTML-table extraction tests (ops/maincontent.html_tables /
extract_tables, round 6)."""

from goose_parser_spark.ops.maincontent import html_tables


def test_basic_rows_and_header():
    rows = html_tables(
        "<table><tr><th>a</th><th>b</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table>")
    assert rows == [(0, 0, True, ["a", "b"]),
                    (0, 1, False, ["1", "2"])]


def test_whitespace_collapse_and_trim():
    rows = html_tables(
        "<table><tr><td>  x \n y </td><td></td></tr></table>")
    assert rows == [(0, 0, False, ["x y", ""])]


def test_nested_table_rows_stay_with_inner_table():
    rows = html_tables(
        "<table><tr><td>outer"
        "<table><tr><td>inner</td></tr></table>"
        "</td></tr></table>")
    # document order: outer table is table 0, inner is table 1
    outer = [r for r in rows if r[0] == 0]
    inner = [r for r in rows if r[0] == 1]
    assert len(outer) == 1 and len(inner) == 1
    assert inner[0][3] == ["inner"]
    # outer cell text includes the nested content (textContent), but
    # the nested ROW never leaks into the outer table
    assert outer[0][3][0].startswith("outer")


def test_multiple_tables_document_order():
    rows = html_tables(
        "<p>x</p><table><tr><td>t0</td></tr></table>"
        "<div><table><tr><td>t1a</td></tr>"
        "<tr><td>t1b</td></tr></table></div>")
    assert [(r[0], r[1]) for r in rows] == [(0, 0), (1, 0), (1, 1)]
    assert rows[2][3] == ["t1b"]


def test_thead_tbody_sections():
    rows = html_tables(
        "<table><thead><tr><th>h</th></tr></thead>"
        "<tbody><tr><td>d</td></tr></tbody></table>")
    assert rows == [(0, 0, True, ["h"]), (0, 1, False, ["d"])]


def test_mixed_th_td_row_is_not_header():
    rows = html_tables("<table><tr><th>h</th><td>d</td></tr></table>")
    assert rows == [(0, 0, False, ["h", "d"])]


def test_empty_row_not_header():
    # a <tr> with no cells: present, zero cols, not a header
    rows = html_tables("<table><tr></tr><tr><td>x</td></tr></table>")
    assert rows == [(0, 0, False, []), (0, 1, False, ["x"])]


def test_unclosed_tags_auto_close():
    # the parser auto-closes td/tr (browser behavior)
    rows = html_tables(
        "<table><tr><td>a<td>b<tr><td>c</table>")
    assert rows == [(0, 0, False, ["a", "b"]),
                    (0, 1, False, ["c"])]


def test_page_without_tables():
    assert html_tables("<html><body><p>no tables</p></body></html>") == []


def test_extract_tables_dataframe(spark):
    from goose_parser_spark.ops.maincontent import extract_tables
    pages = spark.createDataFrame(
        [("u1", "<table><tr><th>k</th></tr><tr><td>v</td></tr></table>"),
         ("u2", None),
         ("u3", "<p>none</p>")],
        ["url", "html"])
    out = extract_tables(pages).collect()
    by_url = {}
    for r in out:
        by_url.setdefault(r.url, []).append(r)
    assert [(r.table_no, r.row_no, r.is_header, r.n_cols, r.cells)
            for r in by_url["u1"]] == [(0, 0, True, 1, "k"),
                                       (0, 1, False, 1, "v")]
    assert by_url["u2"][0].error and by_url["u2"][0].cells is None
    assert "u3" not in by_url  # tableless pages emit nothing
