"""Transform chain: the engine's scalar expression surface.

Implements the reference's transforms with **JavaScript semantics**
(SURVEY.md §2.5 T1-T8): values extracted from the DOM are JS strings in
the reference, and byte-identity (BASELINE.json:6) requires matching
JS behavior exactly where it diverges from JVM/SQL builtins:

- ``trim``  — JS ``String.prototype.trim`` strips the full Unicode
  WhiteSpace + LineTerminator set (incl. U+00A0, U+FEFF); SQL ``trim``
  strips ASCII space only.  (FIXTURES.md F-11)
- ``replace`` — JS ``RegExp`` dialect with ``g/i/m/s`` flags and
  ``$1/$&/$$`` replacement references; Python ``re`` is close enough
  after a small replacement-reference shim.  (F-12, F-16)
- ``date``  — moment.js format tokens + locale month tables, not JVM
  ``DateTimeFormatter`` patterns.  (F-13)
- ``pick`` / ``join`` / ``split`` — exact.  (F-14, F-15)

Transforms run inside the Arrow-batched extraction UDF (placement
rationale: SURVEY.md §2.5) — plain Python per extracted value, with
the compiled form (pattern objects, token lists) built ONCE per rule
tree on the driver and shipped in the UDF closure.
"""

from __future__ import annotations

import re
from collections.abc import Callable


class TransformError(ValueError):
    pass


# --------------------------------------------------------------------------
# trim — exact JS String.prototype.trim character set
# --------------------------------------------------------------------------

# ECMA-262 WhiteSpace: TAB VT FF SP NBSP ZWNBSP + Unicode Zs;
# LineTerminator: LF CR LS PS.
_JS_WHITESPACE = (
    "\t\x0b\x0c\x20\xa0\ufeff"
    "\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007"
    "\u2008\u2009\u200a\u202f\u205f\u3000"
    "\n\r\u2028\u2029"
)


def js_trim(value: str) -> str:
    return value.strip(_JS_WHITESPACE)


# --------------------------------------------------------------------------
# replace — JS RegExp dialect shim
# --------------------------------------------------------------------------

_JS_FLAG_MAP = {"i": re.IGNORECASE, "m": re.MULTILINE, "s": re.DOTALL,
                "u": 0, "y": 0}


def compile_js_regex(pattern: str, flags: str = "") -> tuple[re.Pattern, bool]:
    """Compile a JS regex literal (pattern, flags) to a Python pattern.

    Returns (compiled, global_flag). The dialects agree on the subset
    goose rules use (char classes, anchors, quantifiers, groups); the
    notable runtime difference is the ``g`` flag (replace-all vs
    replace-first), which Python expresses via ``count``.
    """
    py_flags = 0
    global_flag = False
    for f in flags or "":
        if f == "g":
            global_flag = True
        elif f in _JS_FLAG_MAP:
            py_flags |= _JS_FLAG_MAP[f]
        else:
            raise TransformError(f"unsupported JS regex flag {f!r}")
    return re.compile(pattern, py_flags), global_flag


_JS_REPL_REF = re.compile(r"\$(\$|&|\d{1,2})")


def _js_replacement_to_python(repl: str) -> str:
    """Translate JS replacement references ($1, $&, $$) to Python's
    (\\1, \\g<0>, $); escape backslashes so Python re doesn't interpret
    JS-literal backslashes as group refs."""
    out = repl.replace("\\", "\\\\")

    def sub(m: re.Match) -> str:
        ref = m.group(1)
        if ref == "$":
            return "$"
        if ref == "&":
            return "\\g<0>"
        return f"\\g<{int(ref)}>"

    return _JS_REPL_REF.sub(sub, out)


# --------------------------------------------------------------------------
# date — moment.js token translation + locale tables
# --------------------------------------------------------------------------

# Minimal locale month tables (no ICU offline — SURVEY.md §2.5 T3).
# Russian month names in genitive case, as rendered inside dates.
_LOCALE_MONTHS: dict[str, dict[str, list[str]]] = {
    "en": {
        "MMMM": ["January", "February", "March", "April", "May", "June",
                  "July", "August", "September", "October", "November",
                  "December"],
        "MMM": ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                 "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"],
    },
    "ru": {
        "MMMM": ["января", "февраля", "марта", "апреля", "мая", "июня",
                  "июля", "августа", "сентября", "октября", "ноября",
                  "декабря"],
        "MMM": ["янв", "фев", "мар", "апр", "мая", "июн",
                 "июл", "авг", "сен", "окт", "ноя", "дек"],
    },
    "de": {
        "MMMM": ["Januar", "Februar", "März", "April", "Mai", "Juni",
                  "Juli", "August", "September", "Oktober", "November",
                  "Dezember"],
        "MMM": ["Jan", "Feb", "Mär", "Apr", "Mai", "Jun",
                 "Jul", "Aug", "Sep", "Okt", "Nov", "Dez"],
    },
    "es": {
        "MMMM": ["enero", "febrero", "marzo", "abril", "mayo", "junio",
                  "julio", "agosto", "septiembre", "octubre", "noviembre",
                  "diciembre"],
        "MMM": ["ene", "feb", "mar", "abr", "may", "jun",
                 "jul", "ago", "sep", "oct", "nov", "dic"],
    },
    "fr": {
        "MMMM": ["janvier", "février", "mars", "avril", "mai", "juin",
                  "juillet", "août", "septembre", "octobre", "novembre",
                  "décembre"],
        "MMM": ["janv", "févr", "mars", "avr", "mai", "juin",
                 "juil", "août", "sept", "oct", "nov", "déc"],
    },
    "pt": {
        "MMMM": ["janeiro", "fevereiro", "março", "abril", "maio", "junho",
                  "julho", "agosto", "setembro", "outubro", "novembro",
                  "dezembro"],
        "MMM": ["jan", "fev", "mar", "abr", "mai", "jun",
                 "jul", "ago", "set", "out", "nov", "dez"],
    },
    "it": {
        "MMMM": ["gennaio", "febbraio", "marzo", "aprile", "maggio",
                  "giugno", "luglio", "agosto", "settembre", "ottobre",
                  "novembre", "dicembre"],
        "MMM": ["gen", "feb", "mar", "apr", "mag", "giu",
                 "lug", "ago", "set", "ott", "nov", "dic"],
    },
    "nl": {
        "MMMM": ["januari", "februari", "maart", "april", "mei", "juni",
                  "juli", "augustus", "september", "oktober", "november",
                  "december"],
        "MMM": ["jan", "feb", "mrt", "apr", "mei", "jun",
                 "jul", "aug", "sep", "okt", "nov", "dec"],
    },
    "pl": {
        "MMMM": ["stycznia", "lutego", "marca", "kwietnia", "maja",
                  "czerwca", "lipca", "sierpnia", "września",
                  "października", "listopada", "grudnia"],
        "MMM": ["sty", "lut", "mar", "kwi", "maj", "cze",
                 "lip", "sie", "wrz", "paź", "lis", "gru"],
    },
    "sv": {
        "MMMM": ["januari", "februari", "mars", "april", "maj", "juni",
                  "juli", "augusti", "september", "oktober", "november",
                  "december"],
        "MMM": ["jan", "feb", "mar", "apr", "maj", "jun",
                 "jul", "aug", "sep", "okt", "nov", "dec"],
    },
    "tr": {
        "MMMM": ["Ocak", "Şubat", "Mart", "Nisan", "Mayıs", "Haziran",
                  "Temmuz", "Ağustos", "Eylül", "Ekim", "Kasım",
                  "Aralık"],
        "MMM": ["Oca", "Şub", "Mar", "Nis", "May", "Haz",
                 "Tem", "Ağu", "Eyl", "Eki", "Kas", "Ara"],
    },
    "ja": {
        "MMMM": ["1月", "2月", "3月", "4月", "5月", "6月",
                  "7月", "8月", "9月", "10月", "11月", "12月"],
        "MMM": ["1月", "2月", "3月", "4月", "5月", "6月",
                 "7月", "8月", "9月", "10月", "11月", "12月"],
    },
}

# moment tokens, longest-first so the tokenizer is greedy.
_MOMENT_TOKENS = ["YYYY", "MMMM", "MMM", "MM", "DD", "HH", "hh", "mm",
                  "ss", "SSS", "YY", "M", "D", "H", "h", "m", "s", "A", "a"]
_moment_token_re = re.compile("|".join(_MOMENT_TOKENS) + r"|\[[^\]]*\]|.")


class MomentFormat:
    """A compiled moment.js format string: parse() and format()."""

    def __init__(self, fmt: str, locale: str = "en") -> None:
        self.fmt = fmt
        self.locale = locale if locale in _LOCALE_MONTHS else "en"
        self.tokens: list[str] = _moment_token_re.findall(fmt)

    # parsing -------------------------------------------------------------

    def parse(self, value: str) -> dict[str, int]:
        """Parse ``value`` → dict(year, month, day, hour, minute, second,
        millisecond). Missing parts default to moment's defaults
        (1970-01-01 00:00:00.000)."""
        parts = {"year": 1970, "month": 1, "day": 1,
                 "hour": 0, "minute": 0, "second": 0, "millisecond": 0}
        pos = 0
        pm = None
        for tok in self.tokens:
            if pos > len(value):
                raise TransformError(
                    f"date {value!r} too short for format {self.fmt!r}")
            if tok in ("MMMM", "MMM"):
                months = _LOCALE_MONTHS[self.locale][tok]
                found = None
                # longest name first: in locales with numeric month
                # names (ja: 1月..12月) shorter names prefix longer ones
                for i, name in sorted(enumerate(months),
                                      key=lambda p: -len(p[1])):
                    if value[pos:pos + len(name)].lower() == name.lower():
                        found = (i + 1, len(name))
                        break
                if found is None:
                    raise TransformError(
                        f"no {self.locale} month name at {value[pos:pos+16]!r}")
                parts["month"], consumed = found
                pos += consumed
            elif tok == "YYYY":
                parts["year"] = int(value[pos:pos + 4]); pos += 4
            elif tok == "YY":
                yy = int(value[pos:pos + 2]); pos += 2
                parts["year"] = 2000 + yy if yy < 69 else 1900 + yy
            elif tok in ("MM", "DD", "HH", "hh", "mm", "ss"):
                field = {"MM": "month", "DD": "day", "HH": "hour",
                         "hh": "hour", "mm": "minute", "ss": "second"}[tok]
                parts[field] = int(value[pos:pos + 2]); pos += 2
            elif tok == "SSS":
                parts["millisecond"] = int(value[pos:pos + 3]); pos += 3
            elif tok in ("M", "D", "H", "h", "m", "s"):
                m = re.match(r"\d{1,2}", value[pos:])
                if not m:
                    raise TransformError(
                        f"expected number at {value[pos:pos+8]!r} for {tok}")
                field = {"M": "month", "D": "day", "H": "hour",
                         "h": "hour", "m": "minute", "s": "second"}[tok]
                parts[field] = int(m.group(0)); pos += m.end()
            elif tok in ("A", "a"):
                mer = value[pos:pos + 2].lower()
                if mer in ("am", "pm"):
                    pm = mer == "pm"; pos += 2
            elif tok.startswith("["):
                lit = tok[1:-1]
                if value[pos:pos + len(lit)] != lit:
                    raise TransformError(f"literal {lit!r} not found")
                pos += len(lit)
            else:  # literal char — moment is lenient about punctuation
                if pos < len(value) and value[pos] == tok:
                    pos += 1
                elif tok.isspace() and pos < len(value) and value[pos].isspace():
                    pos += 1
                elif not tok.isspace():
                    raise TransformError(
                        f"expected {tok!r} at {value[pos:pos+8]!r}")
        if pm is not None:
            h = parts["hour"] % 12
            parts["hour"] = h + 12 if pm else h
        return parts

    # formatting ------------------------------------------------------------

    def format(self, parts: dict[str, int]) -> str:
        out: list[str] = []
        for tok in self.tokens:
            if tok == "YYYY":
                out.append(f"{parts['year']:04d}")
            elif tok == "YY":
                out.append(f"{parts['year'] % 100:02d}")
            elif tok == "MMMM":
                out.append(_LOCALE_MONTHS[self.locale]["MMMM"][parts["month"] - 1])
            elif tok == "MMM":
                out.append(_LOCALE_MONTHS[self.locale]["MMM"][parts["month"] - 1])
            elif tok == "MM":
                out.append(f"{parts['month']:02d}")
            elif tok == "M":
                out.append(str(parts["month"]))
            elif tok == "DD":
                out.append(f"{parts['day']:02d}")
            elif tok == "D":
                out.append(str(parts["day"]))
            elif tok == "HH":
                out.append(f"{parts['hour']:02d}")
            elif tok == "H":
                out.append(str(parts["hour"]))
            elif tok == "hh":
                out.append(f"{(parts['hour'] % 12) or 12:02d}")
            elif tok == "h":
                out.append(str((parts["hour"] % 12) or 12))
            elif tok == "mm":
                out.append(f"{parts['minute']:02d}")
            elif tok == "m":
                out.append(str(parts["minute"]))
            elif tok == "ss":
                out.append(f"{parts['second']:02d}")
            elif tok == "s":
                out.append(str(parts["second"]))
            elif tok == "SSS":
                out.append(f"{parts['millisecond']:03d}")
            elif tok == "A":
                out.append("PM" if parts["hour"] >= 12 else "AM")
            elif tok == "a":
                out.append("pm" if parts["hour"] >= 12 else "am")
            elif tok.startswith("["):
                out.append(tok[1:-1])
            else:
                out.append(tok)
        return "".join(out)


# --------------------------------------------------------------------------
# Transform registry
# --------------------------------------------------------------------------

# A compiled transform is a callable value -> value. Compilation happens
# once per rule tree on the driver; the callables are closure-shipped.
CompiledTransform = Callable[[object], object]
TransformFactory = Callable[[dict], CompiledTransform]


def _make_trim(spec: dict) -> CompiledTransform:
    def run(v: object) -> object:
        if isinstance(v, list):
            return [run(x) for x in v]
        return js_trim(v) if isinstance(v, str) else v
    return run


def _make_replace(spec: dict) -> CompiledTransform:
    re_spec = spec.get("re")
    if isinstance(re_spec, (list, tuple)):
        pattern = re_spec[0]
        flags = re_spec[1] if len(re_spec) > 1 else ""
    elif isinstance(re_spec, str):
        pattern, flags = re_spec, ""
    else:
        raise TransformError(f"replace: bad 're' spec {re_spec!r}")
    compiled, global_flag = compile_js_regex(pattern, flags)
    repl = _js_replacement_to_python(str(spec.get("to", "")))
    count = 0 if global_flag else 1

    def run(v: object) -> object:
        if isinstance(v, list):
            return [run(x) for x in v]
        return compiled.sub(repl, v, count=count) if isinstance(v, str) else v
    return run


def _make_date(spec: dict) -> CompiledTransform:
    locale = str(spec.get("locale", "en"))
    from_fmt = MomentFormat(str(spec["from"]), locale)
    # output format uses the same locale unless the caller overrides
    to_fmt = MomentFormat(str(spec["to"]), str(spec.get("toLocale", locale)))

    def run(v: object) -> object:
        if isinstance(v, list):
            return [run(x) for x in v]
        if not isinstance(v, str):
            return v
        try:
            return to_fmt.format(from_fmt.parse(js_trim(v)))
        except (TransformError, ValueError):
            # moment returns "Invalid date" on parse failure
            return "Invalid date"
    return run


def _make_pick(spec: dict) -> CompiledTransform:
    prop = spec.get("prop", spec.get("index", 0))

    def run(v: object) -> object:
        if isinstance(v, list):
            try:
                return v[int(prop)]
            except (IndexError, ValueError, TypeError):
                return ""
        if isinstance(v, dict):
            return v.get(str(prop), "")
        return v
    return run


def _make_join(spec: dict) -> CompiledTransform:
    glue = str(spec.get("glue", spec.get("separator", ",")))

    def run(v: object) -> object:
        if isinstance(v, list):
            return glue.join("" if x is None else str(x) for x in v)
        return v
    return run


def _make_split(spec: dict) -> CompiledTransform:
    sep = str(spec.get("separator", ","))
    # JS String.split(sep) with a string separator is a LITERAL split
    # (not a regex — unlike Spark's F.split; SURVEY.md §2.5 T6).

    def run(v: object) -> object:
        if isinstance(v, str):
            return v.split(sep)
        return v
    return run


def _make_decode_html(spec: dict) -> CompiledTransform:
    import html as _html

    def run(v: object) -> object:
        if isinstance(v, list):
            return [run(x) for x in v]
        return _html.unescape(v) if isinstance(v, str) else v
    return run


def _make_match(spec: dict) -> CompiledTransform:
    """Regex match transform: returns group ``index`` of the first match
    (existence upstream uncertain — SURVEY.md §2.5 T8; kept behind the
    registry so rule files using it load)."""
    re_spec = spec.get("re")
    if isinstance(re_spec, (list, tuple)):
        pattern = re_spec[0]
        flags = re_spec[1] if len(re_spec) > 1 else ""
    else:
        pattern, flags = str(re_spec), ""
    compiled, _ = compile_js_regex(pattern, flags)
    index = int(spec.get("index", 1))

    def run(v: object) -> object:
        if isinstance(v, list):
            return [run(x) for x in v]
        if not isinstance(v, str):
            return v
        m = compiled.search(v)
        if not m:
            return ""
        try:
            return m.group(index) or ""
        except IndexError:
            return ""
    return run


class TransformRegistry:
    """Named transform factories; the extension point matching the
    reference's ``parser.addTransform(type, fn)`` (SURVEY.md §2.5 T7)."""

    # Transforms whose output type differs from their input type; used
    # by the rule compiler for static schema derivation (SURVEY.md §1.2).
    ARRAY_PRODUCING = frozenset(["split"])
    SCALAR_PRODUCING = frozenset(["join", "pick"])

    def __init__(self) -> None:
        self._factories: dict[str, TransformFactory] = {}

    def register(self, name: str, factory: TransformFactory) -> None:
        self._factories[name] = factory

    def register_simple(self, name: str, fn: Callable[[object], object]) -> None:
        """Register a parameterless per-value transform (user extension)."""
        self._factories[name] = lambda spec: fn

    def compile_chain(self, specs: list[dict]) -> list[CompiledTransform]:
        chain: list[CompiledTransform] = []
        for spec in specs or []:
            t = spec.get("type")
            if t not in self._factories:
                raise TransformError(f"unknown transform type {t!r}")
            chain.append(self._factories[t](spec))
        return chain

    def knows(self, name: str) -> bool:
        return name in self._factories


def default_registry() -> TransformRegistry:
    reg = TransformRegistry()
    reg.register("trim", _make_trim)
    reg.register("replace", _make_replace)
    reg.register("date", _make_date)
    reg.register("pick", _make_pick)
    reg.register("join", _make_join)
    reg.register("split", _make_split)
    reg.register("decodeHTML", _make_decode_html)
    reg.register("match", _make_match)
    return reg


def apply_chain(chain: list[CompiledTransform], value: object) -> object:
    for t in chain:
        value = t(value)
    return value
