"""Native lowering correctness gate (functions/native.py, SURVEY.md
§2.5/§4.2): the Spark path with lowered transform suffixes must be
value-identical to the pure-Python path on every lowerable shape."""

import pytest
from pyspark.sql import functions as F

from goose_parser_spark.extractor import extract
from goose_parser_spark.functions.native import python_prefix_len
from goose_parser_spark.rules.compiler import RuleCompiler
from goose_parser_spark.rules.evaluator import evaluate_document

HTML = ('<html><body><div class="d">'
        '<p class="v">  a,b , c </p>'
        '<span class="m">x</span><span class="m">y</span><span class="m">z</span>'
        '</div></body></html>')

# (rules, description). Each runs through BOTH paths.
CASES = [
    ({"name": "v", "scope": "p.v", "transform": [
        {"type": "split", "separator": ","}]}, "split only"),
    ({"name": "v", "scope": "p.v", "transform": [
        {"type": "split", "separator": ","}, {"type": "pick", "prop": 1}]},
     "split->pick"),
    ({"name": "v", "scope": "p.v", "transform": [
        {"type": "split", "separator": ","}, {"type": "pick", "prop": 9}]},
     "pick out of range -> ''"),
    ({"name": "v", "scope": "p.v", "transform": [
        {"type": "split", "separator": ","}, {"type": "join", "glue": "|"}]},
     "split->join"),
    ({"name": "v", "scope": "p.v", "transform": [{"type": "trim"}]},
     "trim (JS charset incl NBSP)"),
    ({"name": "v", "scope": "p.v", "transform": [
        {"type": "trim"}, {"type": "split", "separator": " "}]},
     "trim->split"),
    ({"name": "m", "scope": "span.m", "type": "array", "transform": [
        {"type": "join", "glue": "-"}]}, "array rule -> join"),
    ({"name": "v", "scope": ".absent", "transform": [
        {"type": "split", "separator": ","}, {"type": "pick", "prop": 0}]},
     "empty match through lowered chain"),
    ({"name": "v", "scope": "p.v", "transform": [
        {"type": "replace", "re": ["a", "g"], "to": "A"},
        {"type": "split", "separator": ","}]},
     "python prefix (replace) + lowered suffix (split)"),
    ({"scope": "div.d", "collection": [
        {"name": "first", "scope": "p.v", "transform": [
            {"type": "split", "separator": ","}, {"type": "pick", "prop": 0},
            {"type": "trim"}]},
        {"name": "tags", "scope": "span.m"},
    ]}, "collection with mixed lowered/plain leaves"),
    ({"scope": "span.m", "collection": [[
        {"name": "up", "scope": "span.m", "transform": [
            {"type": "split", "separator": "x"}, {"type": "join", "glue": "+"}]},
    ]]}, "grid leaves with lowered chains"),
    # regex-special separators must be literal under \\Q...\\E quoting
    ({"name": "v", "scope": "p.v", "transform": [
        {"type": "split", "separator": "."}, {"type": "join", "glue": ";"}]},
     "split on '.' stays literal"),
    ({"name": "v", "scope": "p.v", "transform": [
        {"type": "split", "separator": "("}]},
     "split on '(' stays literal"),
    ({"name": "v", "scope": "p.v", "transform": [
        {"type": "split", "separator": "*|"}]},
     "split on '*|' stays literal"),
]


def _norm(v):
    if hasattr(v, "asDict"):  # pyspark Row
        v = v.asDict(True)
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    return v


@pytest.mark.parametrize("rules,desc", CASES, ids=[c[1] for c in CASES])
def test_lowered_path_equals_python_path(spark, rules, desc):
    compiled = RuleCompiler().compile(rules)
    want = _norm(evaluate_document(compiled, HTML))
    df = spark.createDataFrame([("u", HTML)], "url string, html string")
    out = extract(df, rules)
    got = _norm(out.select("extracted").head()["extracted"])
    if not isinstance(want, (dict, list)):  # named simple rule at root
        want = {rules["name"]: want}
    assert got == want, desc


def test_lowering_actually_happens(spark):
    rules = {"name": "v", "scope": "p.v", "transform": [
        {"type": "split", "separator": ","}, {"type": "pick", "prop": 0}]}
    compiled = RuleCompiler().compile(rules)
    assert compiled.has_lowered
    # the UDF emits the raw string; split+pick run as Column exprs
    assert str(compiled.udf_schema["v"].dataType) == "StringType()"
    assert str(compiled.schema["v"].dataType) == "StringType()"
    leaf = compiled.branches[0].rules
    assert len(leaf.lowered_specs) == 2 and leaf.n_python == 0


def test_conditional_specs_never_lower():
    rules = {"actions": [{"type": "cases", "cases": [
        [{"type": "exist", "scope": ".a"},
         {"type": "provideRules", "rules": {"name": "v", "scope": ".a",
          "transform": [{"type": "trim"}]}}],
        [{"type": "provideRules", "rules": {"name": "v", "scope": ".b"}}],
    ]}]}
    compiled = RuleCompiler().compile(rules)
    assert not compiled.has_lowered
    assert compiled.udf_schema == compiled.schema


def test_prefix_split_logic():
    # replace is never lowerable; the suffix after it is
    assert python_prefix_len([{"type": "replace", "re": "a", "to": "b"},
                              {"type": "split", "separator": ","}],
                             input_is_array=False) == 1
    # chain ENDING in replace lowers nothing
    assert python_prefix_len([{"type": "split", "separator": ","},
                              {"type": "pick", "prop": 0},
                              {"type": "replace", "re": "a", "to": "b"}],
                             input_is_array=False) == 3
    # empty separator split must stay in Python (JS error semantics)
    assert python_prefix_len([{"type": "split", "separator": ""}],
                             input_is_array=False) == 1
    # negative pick index must stay in Python
    assert python_prefix_len([{"type": "split", "separator": ","},
                              {"type": "pick", "prop": -1}],
                             input_is_array=False) == 2
    # trim on an array input must stay in Python (maps elementwise)
    assert python_prefix_len([{"type": "trim"}], input_is_array=True) == 1
    # fully lowerable
    assert python_prefix_len([{"type": "trim"},
                              {"type": "split", "separator": " "},
                              {"type": "join", "glue": ","}],
                             input_is_array=False) == 0


def test_error_docs_stay_null(spark):
    rules = {"name": "v", "scope": "p", "transform": [
        {"type": "split", "separator": ","}, {"type": "pick", "prop": 0}]}
    df = spark.createDataFrame([("u1", None), ("u2", "<p>a,b</p>")],
                               "url string, html string")
    rows = {r["url"]: r for r in extract(df, rules).collect()}
    assert rows["u1"]["extracted"] is None
    assert rows["u1"]["error"] is not None
    assert rows["u2"]["extracted"]["v"] == "a"


# --- property fuzz: random lowerable/mixed chains, random docs ---------------

from hypothesis import given, settings, strategies as st


def _chain_step(draw):
    kind = draw(st.sampled_from(["trim", "split", "pick", "join", "replace"]))
    if kind == "trim":
        return {"type": "trim"}
    if kind == "split":
        return {"type": "split",
                "separator": draw(st.sampled_from([",", " ", "|", "ab"]))}
    if kind == "pick":
        return {"type": "pick", "prop": draw(st.integers(0, 4))}
    if kind == "join":
        return {"type": "join",
                "glue": draw(st.sampled_from([",", "-", "", "+"]))}
    return {"type": "replace",
            "re": [draw(st.sampled_from(["a", "b,", " "])), "g"],
            "to": draw(st.sampled_from(["X", "", ",,"]))}


@st.composite
def _chain_and_text(draw):
    chain = [_chain_step(draw) for _ in range(draw(st.integers(0, 4)))]
    text = draw(st.text(
        alphabet=st.sampled_from(list("ab, | x")), max_size=24))
    return chain, text


@settings(max_examples=25, deadline=None)
@given(ct=_chain_and_text())
def test_fuzz_lowered_equals_python(spark, ct):
    chain, text = ct
    html = f'<html><body><p class="v">{text}</p></body></html>'
    rules = {"name": "v", "scope": "p.v", "transform": chain}
    compiled = RuleCompiler().compile(rules)
    want = _norm(evaluate_document(compiled, html))
    df = spark.createDataFrame([("u", html)], "url string, html string")
    got = _norm(extract(df, rules).select("extracted").head()["extracted"])
    assert got == want, (chain, text)
