"""Native lowering of byte-safe transform suffixes (SURVEY.md §2.5,
§4.2 "Native lowering of byte-safe transforms"; VERDICT r01 #7).

Transforms normally run inside the Arrow extraction UDF (Python) so
that JS-semantics shims guarantee byte identity. A subset is provably
byte-identical to a Catalyst expression; for those, the compiler
splits each leaf's chain into a Python PREFIX (executed in the UDF)
and a native SUFFIX (executed post-UDF as whole-stage-codegen'd
`Column` expressions) — per-value work moves from the contended
Python workers to the JVM.

Lowerable (each with its exact-equivalence argument; the property
test in tests/test_native_lowering.py re-proves equality on fixtures):

- ``trim``  (scalar input): JS trim strips a fixed char set from both
  ends == ``regexp_replace('^[set]+|[set]+$', '')``.
- ``split`` (scalar input, non-empty literal separator): JS split is
  a literal split keeping trailing empties == Spark ``split`` with a
  ``\\Q…\\E``-quoted pattern and limit -1.
- ``pick``  (array input, non-negative int index): Python shim yields
  '' past the end == ``coalesce(get(col, i), '')`` (``get`` is
  0-based, NULL out of range).
- ``join``  (array input): shim maps None→'' == ``array_join(col,
  glue, '')``.

NOT lowerable: ``replace``/``match`` (JS vs Java regex dialects
differ), ``date`` (moment semantics), ``decodeHTML`` (entity tables),
custom transforms, and any step whose static input type doesn't match
the cases above. Conditional (multi-branch) rule trees never lower:
the merged output struct can't tell which branch produced a row, so a
post-UDF expression could apply the wrong suffix.
"""

from __future__ import annotations

from goose_parser_spark.functions.transforms import _JS_WHITESPACE

_TRIM_RE = f"^[{_JS_WHITESPACE}]+|[{_JS_WHITESPACE}]+$"


def _is_native_safe(spec: dict, input_is_array: bool) -> tuple[bool, bool]:
    """(safe, output_is_array) for one transform spec given the static
    input shape. Unsafe specs report their normal output shape."""
    t = spec.get("type")
    if t == "trim":
        return (not input_is_array, input_is_array)
    if t == "split":
        sep = spec.get("separator", ",")
        ok = (not input_is_array and isinstance(sep, str) and sep != ""
              and "\\E" not in sep)
        return (ok, True)
    if t == "pick":
        prop = spec.get("prop", spec.get("index", 0))
        ok = (input_is_array and isinstance(prop, int)
              and not isinstance(prop, bool) and prop >= 0)
        return (ok, False)
    if t == "join":
        return (input_is_array, False)
    # everything else (replace/date/decodeHTML/match/custom): not
    # lowerable; these all preserve the value's shape
    return (False, input_is_array)


# Transform types whose VALUE SHAPE (scalar vs array) is statically
# known. Anything outside this set — user-registered custom transforms
# in particular — may convert scalar<->array at runtime, so the static
# shape walk below would mis-classify every later step (ADVICE r02).
_KNOWN_SHAPE_TYPES = frozenset(
    {"trim", "split", "pick", "join", "replace", "date", "decodeHTML",
     "match"})


def python_prefix_len(specs: list[dict], input_is_array: bool) -> int:
    """Length of the Python-executed prefix: the smallest k such that
    every step in specs[k:] is native-safe given its static input
    shape. Returns len(specs) when nothing lowers.

    A chain containing ANY unknown/custom transform type never lowers:
    its runtime output shape is unknowable statically, and a wrong
    shape guess would surface as an Arrow/analysis type error in the
    lowered path instead of falling back to Python.
    """
    n = len(specs)
    if any(spec.get("type") not in _KNOWN_SHAPE_TYPES for spec in specs):
        return n
    # static shape before each step
    shapes = [input_is_array]
    for spec in specs:
        t = spec.get("type")
        prev = shapes[-1]
        if t == "split":
            shapes.append(True)
        elif t in ("join", "pick"):
            shapes.append(False)
        else:
            shapes.append(prev)
    k = n
    while k > 0:
        safe, _ = _is_native_safe(specs[k - 1], shapes[k - 1])
        if not safe:
            break
        k -= 1
    return k


def native_column(spec: dict, col):
    """Catalyst expression for one lowered transform step."""
    from pyspark.sql import functions as F

    t = spec.get("type")
    if t == "trim":
        return F.regexp_replace(col, _TRIM_RE, "")
    if t == "split":
        sep = str(spec.get("separator", ","))
        return F.split(col, "\\Q" + sep + "\\E", -1)
    if t == "pick":
        prop = int(spec.get("prop", spec.get("index", 0)))
        return F.coalesce(F.get(col, prop), F.lit(""))
    if t == "join":
        glue = str(spec.get("glue", spec.get("separator", ",")))
        return F.array_join(col, glue, "")
    raise ValueError(f"transform {t!r} is not native-lowerable")


def apply_native_suffix(specs: list[dict], col):
    for spec in specs:
        col = native_column(spec, col)
    return col
