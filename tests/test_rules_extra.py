"""Evaluator corners beyond the FIXTURES.md goldens: prop extraction,
deep nesting, pseudo-selector scopes, schema edge cases."""

import pytest

from goose_parser_spark.rules.compiler import RuleCompiler, RuleError
from goose_parser_spark.rules.evaluator import evaluate_document

C = RuleCompiler()


def run(html, rules):
    return evaluate_document(C.compile(rules), f"<html><body>{html}</body></html>")


def test_prop_inner_html():
    out = run('<div class="x"><b>a</b> &amp; <i>b</i></div>',
              {"name": "v", "scope": "div.x", "prop": "innerHTML"})
    assert out == {"v": "<b>a</b> &amp; <i>b</i>"}


def test_prop_inner_text_and_value():
    html = '<input class="f" value="42"><div class="x">te<b>x</b>t</div>'
    assert run(html, {"name": "v", "scope": "input.f", "prop": "value"}) == {"v": "42"}
    assert run(html, {"name": "v", "scope": "div.x", "prop": "innerText"}) == {"v": "text"}


def test_grid_in_collection_in_grid():
    html = ('<div class="g"><h3 class="t">G1</h3>'
            '  <div class="sub"><span class="s">a</span><span class="s">b</span></div></div>'
            '<div class="g"><h3 class="t">G2</h3>'
            '  <div class="sub"><span class="s">c</span></div></div>')
    rules = {"scope": "div.g", "collection": [[
        {"name": "t", "scope": "h3.t"},
        {"name": "sub", "scope": "div.sub", "collection": [
            {"name": "first", "scope": "span.s:first-child"},
            {"name": "all", "scope": "span.s", "type": "array"},
        ]},
    ]]}
    out = run(html, rules)
    assert out == [
        {"t": "G1", "sub": {"first": "a", "all": ["a", "b"]}},
        {"t": "G2", "sub": {"first": "c", "all": ["c"]}},
    ]


def test_pseudo_selectors_in_scopes():
    html = ('<ul><li>one</li><li>two</li><li>three</li></ul>')
    assert run(html, {"name": "v", "scope": "li:eq(1)"}) == {"v": "two"}
    assert run(html, {"name": "v", "scope": "li:last"}) == {"v": "three"}
    assert run(html, {"name": "v", "scope": "li:contains(thr)"}) == {"v": "three"}
    assert run(html, {"name": "v", "scope": "ul:has(li) li:first-child"}) == {"v": "one"}


def test_transforms_on_array_rule():
    html = '<i class="n"> a </i><i class="n"> b </i>'
    out = run(html, {"name": "v", "scope": "i.n", "type": "array",
                     "transform": [{"type": "trim"}]})
    assert out == {"v": ["a", "b"]}


def test_conditional_branches_with_different_fields():
    # union schema: non-taken branch fields are absent from the value
    # (null in the Spark column)
    rules = {"actions": [{"type": "cases", "cases": [
        [{"type": "exist", "scope": ".kind-a"},
         {"type": "provideRules", "rules": {
             "scope": ".kind-a", "collection": [{"name": "a", "scope": "b.x"}]}}],
        [{"type": "provideRules", "rules": {
            "scope": "body", "collection": [{"name": "b", "scope": "i.y"}]}}],
    ]}]}
    compiled = C.compile(rules)
    assert [f.name for f in compiled.schema.fields] == ["a", "b"]
    out_a = evaluate_document(compiled, '<div class="kind-a"><b class="x">A</b></div>')
    assert out_a == {"a": "A"}
    out_b = evaluate_document(compiled, '<i class="y">B</i>')
    assert out_b == {"b": "B"}


def test_conflicting_branch_types_rejected():
    rules = {"actions": [{"type": "cases", "cases": [
        [{"type": "exist", "scope": ".x"},
         {"type": "provideRules", "rules": {"name": "v", "scope": "p"}}],
        [{"type": "provideRules", "rules": {"name": "v", "scope": "p",
                                            "type": "array"}}],
    ]}]}
    with pytest.raises(RuleError):
        C.compile(rules)


def test_empty_collection_rejected_nameless_child():
    with pytest.raises(RuleError):
        C.compile({"scope": "div", "collection": [{"scope": "p"}]})


def test_deeply_nested_document_no_recursion_error():
    html = "<div>" * 400 + "deep" + "</div>" * 400
    out = run(html, {"name": "v", "scope": "div div div"})
    assert "deep" in out["v"]


def test_huge_flat_document():
    html = "".join(f'<span class="s">v{i}</span>' for i in range(5000))
    out = run(html, {"name": "v", "scope": "span.s:eq(4999)"})
    assert out == {"v": "v4999"}
