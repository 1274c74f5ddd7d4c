"""Golden correctness: every FIXTURES.md family, evaluated through the
full pure-Python path (DOM parse → rule tree → transforms), byte-compared
as canonical JSON. This is the binding byte-identity contract
(BASELINE.json:6) until /root/reference is populated (milestone M8)."""

import json

import pytest

from goose_parser_spark.rules.compiler import RuleCompiler
from goose_parser_spark.rules.evaluator import evaluate_document
from goose_parser_spark.sources.fixtures import (
    FAMILIES,
    expected_for,
    family_of,
    pages_rows,
)


def _canon(v):
    return json.dumps(v, ensure_ascii=False, separators=(",", ":"),
                      sort_keys=False)


@pytest.mark.parametrize("fid", sorted(FAMILIES))
@pytest.mark.parametrize("i", [0, 1, 7, 96])
def test_family_golden(fid, i):
    fam = FAMILIES[fid]
    compiled = RuleCompiler().compile(fam.rules)
    html = ("<!DOCTYPE html><html><head><title>t</title></head><body>"
            f"{fam.html(i)}</body></html>")
    got = evaluate_document(compiled, html)
    assert _canon(got) == _canon(fam.expected(i)), fid


def test_pages_rows_match_goldens_bytewise():
    """Full fixture pages (with filler + skew) through extraction."""
    compilers = {fid: RuleCompiler().compile(f.rules)
                 for fid, f in FAMILIES.items()}
    for i, row in enumerate(pages_rows(150)):
        fam = family_of(i)
        got = evaluate_document(compilers[fam.fid], row["html"])
        assert _canon(got) == expected_for(i), f"row {i} family {fam.fid}"


def test_schema_is_static_per_family():
    """Output schema derives from the rule JSON alone (SURVEY.md §1.2)."""
    c = RuleCompiler()
    s1 = c.compile(FAMILIES["f06"].rules).schema
    assert s1.simpleString() == "array<struct<sku:string,price:string>>"
    s2 = c.compile(FAMILIES["f04"].rules).schema
    assert s2.simpleString() == "struct<tags:array<string>>"
    s3 = c.compile(FAMILIES["f14"].rules).schema   # split→pick ⇒ string
    assert s3.simpleString() == "struct<v:string>"
    s4 = c.compile(FAMILIES["f17"].rules).schema   # conditional branches merge
    assert s4.simpleString() == "struct<t:string>"
