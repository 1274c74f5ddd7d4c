"""Differential fuzzing: production rule evaluation vs an independent
naive evaluator over hypothesis-generated rule trees and documents.

The naive evaluator re-implements the pinned semantics (FIXTURES.md)
from scratch on top of the SLOW set-based selector walker — agreement
means compiler, indexed selectors, memoization, and evaluator all
compose correctly on shapes the goldens never enumerate."""

from hypothesis import given, settings, strategies as st

from goose_parser_spark.dom.parser import parse_html
from goose_parser_spark.dom.selector import select
from goose_parser_spark.rules.compiler import RuleCompiler
from goose_parser_spark.rules.evaluator import evaluate_document

# --- naive reference implementation ------------------------------------------


def naive_eval_rule(rule: dict, context, root):
    base = context
    if rule.get("parentScope"):
        base = select([root], rule["parentScope"])
    if rule.get("scope"):
        matched = select(base, rule["scope"])
    else:
        matched = base

    coll = rule.get("collection")
    if coll is not None:
        if len(coll) == 1 and isinstance(coll[0], list):
            rows = matched
            if rule.get("maxResultsCount") is not None:
                rows = rows[:rule["maxResultsCount"]]
            return [
                {c["name"]: naive_eval_rule(c, [node], root)
                 for c in coll[0] if not c.get("virtual")}
                for node in rows
            ]
        return {c["name"]: naive_eval_rule(c, matched[:1], root)
                for c in coll if not c.get("virtual")}

    if rule.get("attr"):
        vals = [el.attr(rule["attr"]) or "" for el in matched]
    else:
        vals = [el.text() for el in matched]
    if rule.get("type") == "array":
        return vals
    return str(rule.get("separator", " ")).join(vals)


def naive_eval(spec: dict, html: str):
    root = parse_html(html)
    rule = spec.get("rules", spec)
    out = naive_eval_rule(rule, [root], root)
    if "collection" in rule:
        return out
    return {rule["name"]: out}


# --- generators ---------------------------------------------------------------

_TAGS = ["div", "span", "p", "b", "li"]
_CLASSES = ["a", "b", "c", "d"]


@st.composite
def _docs(draw, depth=3):
    def node(d):
        tag = draw(st.sampled_from(_TAGS))
        cls = draw(st.lists(st.sampled_from(_CLASSES), max_size=2))
        attrs = f' class="{" ".join(cls)}"' if cls else ""
        if draw(st.booleans()):
            attrs += f' data-k="v{draw(st.integers(0, 3))}"'
        if d == 0:
            return f"<{tag}{attrs}>t{draw(st.integers(0, 9))}</{tag}>"
        kids = "".join(node(d - 1) for _ in range(draw(st.integers(0, 3))))
        return f"<{tag}{attrs}>{kids or 'x'}</{tag}>"
    return "<html><body>" + node(depth) + node(depth) + "</body></html>"


@st.composite
def _selectors(draw):
    tag = draw(st.sampled_from(_TAGS + ["*"]))
    cls = draw(st.sampled_from([None] + _CLASSES))
    sel = tag + (f".{cls}" if cls else "")
    if draw(st.booleans()):
        sel = draw(st.sampled_from(_TAGS)) + " " + sel
    return sel


@st.composite
def _leaf_rules(draw, name):
    rule = {"name": name, "scope": draw(_selectors())}
    if draw(st.booleans()):
        rule["type"] = "array"
    elif draw(st.booleans()):
        rule["separator"] = draw(st.sampled_from([" ", ", ", "|"]))
    if draw(st.booleans()):
        rule["attr"] = "data-k"
    if draw(st.booleans()):
        rule["parentScope"] = "body"
    return rule


@st.composite
def _rule_trees(draw):
    kind = draw(st.integers(0, 2))
    if kind == 0:
        return draw(_leaf_rules("v"))
    children = [draw(_leaf_rules(f"f{i}"))
                for i in range(draw(st.integers(1, 3)))]
    if kind == 1:
        return {"scope": draw(_selectors()), "collection": children}
    grid = {"scope": draw(_selectors()), "collection": [children]}
    if draw(st.booleans()):
        grid["maxResultsCount"] = draw(st.integers(0, 3))
    return grid


@settings(max_examples=200, deadline=None)
@given(html=_docs(), rules=_rule_trees())
def test_production_matches_naive(html, rules):
    compiled = RuleCompiler().compile(rules)
    got = evaluate_document(compiled, html)
    want = naive_eval(rules, html)
    assert got == want, (rules, html)
