"""Differential tests for the PROVISIONAL semantics knobs
(rules/conventions.py, FIXTURES.md §4, VERDICT r01 #9).

Each test runs the same rule under BOTH candidate conventions and
asserts the exact output of each — so the M8 swap (re-pinning against
the real reference fixtures) is a constant flip verified by this file,
not a hunt through the evaluator. The first case of every pair is the
SHIPPED convention; goldens and oracles assert that one.
"""

import pytest

from goose_parser_spark.rules import conventions
from goose_parser_spark.rules.compiler import RuleCompiler
from goose_parser_spark.rules.evaluator import evaluate_document

HTML_MULTI = """<div>
<span class="tag">red</span><span class="tag">green</span>
<span class="tag">blue</span><div class="present">here</div>
</div>"""


def _run(rules: dict, html: str) -> object:
    return evaluate_document(RuleCompiler().compile(rules), html)


# --- knob 1: DEFAULT_SEPARATOR (F-03b / F-09) ------------------------------

SEPARATOR_CASES = [
    # (convention value, expected joined output)
    (" ", "red green blue"),   # SHIPPED
    ("", "redgreenblue"),      # alternative: plain concat
    (", ", "red, green, blue"),  # alternative: jQuery-text-style list
]


@pytest.mark.parametrize("sep,expected", SEPARATOR_CASES)
def test_default_separator_conventions(monkeypatch, sep, expected):
    monkeypatch.setattr(conventions, "DEFAULT_SEPARATOR", sep)
    out = _run({"name": "tags", "scope": "span.tag"}, HTML_MULTI)
    assert out == {"tags": expected}


def test_explicit_separator_immune_to_convention(monkeypatch):
    """Rules that PASS a separator never change under the knob —
    only no-separator multi-match rules are in the blast radius."""
    for sep in (" ", "", ", "):
        monkeypatch.setattr(conventions, "DEFAULT_SEPARATOR", sep)
        out = _run({"name": "tags", "scope": "span.tag", "separator": "|"},
                   HTML_MULTI)
        assert out == {"tags": "red|green|blue"}


def test_single_match_immune_to_separator_convention(monkeypatch):
    for sep in (" ", "", ", "):
        monkeypatch.setattr(conventions, "DEFAULT_SEPARATOR", sep)
        assert _run({"name": "p", "scope": "div.present"}, HTML_MULTI) == \
            {"p": "here"}


# --- knob 2: EMPTY_MATCH_VALUE (F-08a) --------------------------------------

EMPTY_CASES = [
    ("", {"missing": ""}),        # SHIPPED: empty string
    (None, {"missing": None}),    # alternative: null (JS undefined)
]


@pytest.mark.parametrize("empty,expected", EMPTY_CASES)
def test_empty_match_conventions(monkeypatch, empty, expected):
    monkeypatch.setattr(conventions, "EMPTY_MATCH_VALUE", empty)
    out = _run({"name": "missing", "scope": ".absent"}, HTML_MULTI)
    assert out == expected


@pytest.mark.parametrize("empty", ["", None])
def test_empty_match_array_rules_immune(monkeypatch, empty):
    """Array rules return [] on no match under EITHER convention
    (F-08b is NOT provisional)."""
    monkeypatch.setattr(conventions, "EMPTY_MATCH_VALUE", empty)
    out = _run({"name": "m", "scope": ".absent", "type": "array"},
               HTML_MULTI)
    assert out == {"m": []}


@pytest.mark.parametrize("empty", ["", None])
def test_empty_match_matched_rules_immune(monkeypatch, empty):
    monkeypatch.setattr(conventions, "EMPTY_MATCH_VALUE", empty)
    assert _run({"name": "p", "scope": "div.present"}, HTML_MULTI) == \
        {"p": "here"}


def test_empty_match_none_skips_transforms(monkeypatch):
    """Under the null convention a transform chain on a missing field
    must not crash — it is skipped (None propagates)."""
    monkeypatch.setattr(conventions, "EMPTY_MATCH_VALUE", None)
    out = _run({"name": "m", "scope": ".absent",
                "transform": [{"type": "trim"}]}, HTML_MULTI)
    assert out == {"m": None}


def test_collection_blast_radius_under_alternatives(monkeypatch):
    """The combined blast radius for a collection: exactly the
    no-separator multi-match fields and the unmatched simple fields
    change; everything else is byte-identical."""
    rules = {
        "scope": "div",
        "collection": [
            {"name": "tags", "scope": "span.tag"},          # changes (sep)
            {"name": "missing", "scope": ".absent"},         # changes (empty)
            {"name": "p", "scope": "div.present"},          # immune
            {"name": "piped", "scope": "span.tag", "separator": "|"},  # immune
        ],
    }
    shipped = _run(rules, HTML_MULTI)
    assert shipped == {"tags": "red green blue", "missing": "",
                       "p": "here", "piped": "red|green|blue"}
    monkeypatch.setattr(conventions, "DEFAULT_SEPARATOR", "")
    monkeypatch.setattr(conventions, "EMPTY_MATCH_VALUE", None)
    alt = _run(rules, HTML_MULTI)
    assert alt == {"tags": "redgreenblue", "missing": None,
                   "p": "here", "piped": "red|green|blue"}
    changed = {k for k in shipped if shipped[k] != alt[k]}
    assert changed == {"tags", "missing"}
