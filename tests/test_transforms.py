"""Transform chain tests: JS-semantics shims (SURVEY.md §2.5)."""

import pytest
from hypothesis import given, settings, strategies as st

from goose_parser_spark.functions.transforms import (
    MomentFormat,
    TransformError,
    apply_chain,
    default_registry,
    js_trim,
)

REG = default_registry()


def run(specs, value):
    return apply_chain(REG.compile_chain(specs), value)


# --- trim: exact JS String.prototype.trim charset (F-11) --------------------

@pytest.mark.parametrize("raw,want", [
    ("  x  ", "x"),
    ("\t\n\r\xa0x\xa0 ", "x"),        # NBSP is JS whitespace
    ("\ufeffx\ufeff", "x"),            # ZWNBSP/BOM is JS whitespace
    ("\u2028x\u2029", "x"),            # line/para separators
    ("\u200bx", "\u200bx"),            # ZWSP is NOT JS whitespace
    ("", ""),
])
def test_js_trim_charset(raw, want):
    assert js_trim(raw) == want
    assert run([{"type": "trim"}], raw) == want


# --- replace: JS RegExp dialect (F-12, F-16) ---------------------------------

def test_replace_global_vs_first():
    assert run([{"type": "replace", "re": ["a", "g"], "to": "-"}], "aaa") == "---"
    assert run([{"type": "replace", "re": ["a"], "to": "-"}], "aaa") == "-aa"
    assert run([{"type": "replace", "re": "a", "to": "-"}], "aaa") == "-aa"


def test_replace_flags_and_refs():
    assert run([{"type": "replace", "re": ["AB", "gi"], "to": "x"}], "ab AB Ab") == "x x x"
    assert run([{"type": "replace", "re": [r"(\w+)@(\w+)", "g"], "to": "$2.$1"}],
               "a@b c@d") == "b.a d.c"
    assert run([{"type": "replace", "re": ["b", "g"], "to": "[$&]"}], "abc") == "a[b]c"
    assert run([{"type": "replace", "re": ["b", "g"], "to": "$$"}], "abc") == "a$c"


def test_replace_applies_elementwise_to_arrays():
    assert run([{"type": "replace", "re": ["x", "g"], "to": "y"}],
               ["ax", "xx"]) == ["ay", "yy"]


# --- date: moment tokens + locales (F-13) ------------------------------------

def test_date_fixture_ru():
    assert run([{"type": "date", "locale": "ru",
                 "from": "HH:mm D MMMM YYYY", "to": "YYYY-MM-DD HH:mm"}],
               "21:10 30 августа 2016") == "2016-08-30 21:10"


@pytest.mark.parametrize("locale,value,fmt,want", [
    ("en", "30 August 2016", "D MMMM YYYY", "2016-08-30"),
    ("en", "5 Sep 16", "D MMM YY", "2016-09-05"),
    ("de", "1 März 2020", "D MMMM YYYY", "2020-03-01"),
    ("es", "9 enero 1999", "D MMMM YYYY", "1999-01-09"),
    ("en", "12/31/2021", "MM/DD/YYYY", "2021-12-31"),
    ("pt", "9 março 2021", "D MMMM YYYY", "2021-03-09"),
    ("it", "2 luglio 2018", "D MMMM YYYY", "2018-07-02"),
    ("nl", "5 mrt 19", "D MMM YY", "2019-03-05"),
    ("pl", "3 września 2022", "D MMMM YYYY", "2022-09-03"),
    ("sv", "17 augusti 2015", "D MMMM YYYY", "2015-08-17"),
    ("tr", "29 Ağustos 2019", "D MMMM YYYY", "2019-08-29"),
    ("tr", "1 May 20", "D MMM YY", "2020-05-01"),
    # ja: numeric month names where 1月 prefixes 10月/11月/12月 —
    # the longest-first matcher must pick the full name
    ("ja", "11月 3 2023", "MMMM D YYYY", "2023-11-03"),
    ("ja", "1月 3 2023", "MMMM D YYYY", "2023-01-03"),
    ("ja", "12月 31 1999", "MMMM D YYYY", "1999-12-31"),
])
def test_date_locales(locale, value, fmt, want):
    assert run([{"type": "date", "locale": locale,
                 "from": fmt, "to": "YYYY-MM-DD"}], value) == want


def test_date_meridiem_and_output_tokens():
    out = run([{"type": "date", "from": "h:mm a", "to": "HH:mm"}], "9:05 pm")
    assert out == "21:05"
    out = run([{"type": "date", "from": "HH:mm", "to": "h:mm A"}], "00:30")
    assert out == "12:30 AM"


def test_date_invalid_like_moment():
    assert run([{"type": "date", "from": "YYYY-MM-DD", "to": "YYYY"}],
               "not a date") == "Invalid date"


def test_moment_roundtrip():
    fmt = MomentFormat("YYYY-MM-DD HH:mm:ss")
    parts = fmt.parse("2023-07-04 08:09:10")
    assert fmt.format(parts) == "2023-07-04 08:09:10"


# --- split / pick / join (F-14, F-15) ----------------------------------------

def test_split_is_literal_not_regex():
    assert run([{"type": "split", "separator": "."}], "a.b.c") == ["a", "b", "c"]
    assert run([{"type": "split", "separator": "|"}], "a|b") == ["a", "b"]


def test_pick_index_and_out_of_range():
    assert run([{"type": "split", "separator": ","},
                {"type": "pick", "prop": 1}], "x,y,z") == "y"
    assert run([{"type": "split", "separator": ","},
                {"type": "pick", "prop": 9}], "x,y") == ""


def test_join_glue():
    assert run([{"type": "join", "glue": "|"}], ["a", "b"]) == "a|b"
    assert run([{"type": "join"}], ["a", "b"]) == "a,b"


def test_decode_html_and_match():
    assert run([{"type": "decodeHTML"}], "a &amp; b") == "a & b"
    assert run([{"type": "match", "re": [r"id=(\d+)"]}], "x id=42 y") == "42"
    assert run([{"type": "match", "re": [r"id=(\d+)"]}], "nothing") == ""


def test_unknown_transform_raises():
    with pytest.raises(TransformError):
        REG.compile_chain([{"type": "nope"}])


def test_custom_transform_registration():
    reg = default_registry()
    reg.register_simple("upper", lambda v: v.upper() if isinstance(v, str) else v)
    chain = reg.compile_chain([{"type": "upper"}])
    assert apply_chain(chain, "ab") == "AB"


# --- property: join(split(x)) == x when glue == separator --------------------

@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_characters=",", blacklist_categories=("Cs",)), max_size=40))
def test_split_join_roundtrip(s):
    assert run([{"type": "split", "separator": ","},
                {"type": "join", "glue": ","}], s) == s
