"""Adversarial robustness for the INGEST surface: HTML parse, PDF
text/metadata extraction, WARC record iteration, charset sniffing.
Same contract as test_decoder_fuzz: valid result or catchable
exception, PROMPTLY — at corpus scale one hostile page must never
hang an executor or drive an unbounded allocation. Every scenario
here reproduces (or guards against) a failure class that profiling
actually found:

- quadratic tree-builder scans on deep nesting / implied-end storms
  (the _imply_ends_for stack walk, now index-based);
- O(n^3) regex backtracking on stray '<' streams (the _TOKEN_RE
  name/attrs ambiguity, now possessive + next_gt cursor);
- quadratic text-node accumulation from tiny fragments;
- PDF FlateDecode bombs (kilobytes inflating to gigabytes);
- WARC gzip bombs with no newline (an unbounded readline would
  materialize the whole inflated stream) and giant declared
  Content-Lengths.
"""

import gzip
import random
import signal
import time
import zlib

import pytest

from goose_parser_spark.dom.parser import parse_document, parse_html
from goose_parser_spark.ops.charset import sniff_decode
from goose_parser_spark.ops.layout import parse_pdf_info, parse_pdf_text
from goose_parser_spark.sources.warc import iter_warc_records


class _Hang(AssertionError):
    pass


class _deadline:
    """Fail (don't hang) if the block exceeds ``seconds`` wall time."""

    def __init__(self, seconds: float, what: str):
        self.seconds = seconds
        self.what = what

    def __enter__(self):
        def _fire(sig, frm):
            raise _Hang(f"{self.what} exceeded {self.seconds}s")
        self._old = signal.signal(signal.SIGALRM, _fire)
        signal.setitimer(signal.ITIMER_REAL, self.seconds)
        return self

    def __exit__(self, *exc):
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, self._old)
        return False


# ---- HTML parser ---------------------------------------------------------

HOSTILE_HTML = {
    "deep_nesting": "<div>" * 100_000,
    "deep_then_close": "<div>" * 50_000 + "</div>" * 50_000,
    "p_storm": "<p>x" * 100_000,
    "stray_lt_no_gt": "a<" * 100_000,
    "text_fragments": "a<b c" * 100_000,
    "stray_then_gt": "a<" * 100_000 + ">",
    "fragments_then_gt": "a<b c" * 100_000 + ">",
    "unbalanced_quotes": '<a "' * 50_000,
    "implied_end_storm": "<table>" + "<div>" * 20_000 + "<li></li>" * 20_000,
    "unmatched_ends": "<div>" * 20_000 + "</x>" * 20_000,
    "decl_soup": "<!x" * 100_000,
    "bogus_end_soup": "</ " * 100_000,
    "giant_attr": "<a href='" + "x" * 5_000_000 + "'>t</a>",
    "unclosed_comment": "<!--" + "x" * 1_000_000,
    "entity_storm": "&amp;" * 300_000,
    "table_soup": "<table>" * 20_000,
    "adoption_soup": "<b><i></b></i>" * 30_000,
    "rawtext_unclosed": "<script>" + "x<y" * 100_000,
}


@pytest.mark.parametrize("name", sorted(HOSTILE_HTML))
def test_hostile_html_parses_promptly(name):
    html = HOSTILE_HTML[name]
    with _deadline(20.0, f"parse_html({name})"):
        root = parse_html(html)
    assert root.tag == "#document"


def test_hostile_html_scales_linearly():
    """The killer class is superlinear growth: time 4x the input and
    require well under the quadratic 16x ratio. Only the stray-text
    shapes are ratio-checked — they build a tiny tree, so the timing
    isolates the scan itself (a deep-nesting parse is dominated by
    allocating the 100k-deep live tree, which makes ratios
    allocator-noisy; it gets an absolute budget below instead). GC is
    disabled inside the timed region for the same reason."""
    import gc
    for mk in (lambda n: "a<" * n,
               lambda n: "a<b c" * n):
        t = {}
        for n in (25_000, 100_000):
            best = 1e9
            for _ in range(3):
                gc.disable()
                try:
                    t0 = time.perf_counter()
                    parse_html(mk(n))
                    best = min(best, time.perf_counter() - t0)
                finally:
                    gc.enable()
                gc.collect()
            t[n] = best
        ratio = t[100_000] / max(t[25_000], 1e-4)
        assert ratio < 9.0, f"superlinear: {t} (ratio {ratio:.1f})"


def test_deep_nesting_absolute_budget():
    """400k-deep nesting in 20 s: the pre-fix quadratic stack scan
    needed ~3.4 s at EIGHT thousand — 400k would be hours. Linear
    parse measures ~1 s, so the bound has 20x headroom for host noise
    while catching any quadratic reintroduction outright."""
    with _deadline(20.0, "parse_html(400k-deep nesting)"):
        root = parse_html("<div>" * 400_000)
    assert root.tag == "#document"


def test_random_markup_soup_never_hangs():
    rng = random.Random(42)
    atoms = ["<", ">", "/", '"', "'", "=", "!", "-", "a", "div", "p",
             " ", "&amp;", "&", "<!--", "-->", "<![CDATA[", "]]>",
             "<script>", "</script>", "\x00", "�"]
    for trial in range(200):
        soup = "".join(rng.choice(atoms)
                       for _ in range(rng.choice([10, 100, 2000])))
        with _deadline(10.0, f"soup trial {trial}"):
            root, _ = parse_document(soup)
        assert root.tag == "#document"


# ---- PDF -----------------------------------------------------------------

def _pdf_with_stream(stream: bytes, head_extra: bytes = b"/Filter /FlateDecode") -> bytes:
    return (b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
            b"4 0 obj << /Length " + str(len(stream)).encode() + b" "
            + head_extra + b" >>\nstream\n" + stream + b"\nendstream endobj\n"
            b"%%EOF")


def test_pdf_flate_bomb_rejected_not_inflated():
    bomb = zlib.compress(b"\x00" * (512 * 1024 * 1024), 9)  # ~0.5 MB -> 512 MB
    assert len(bomb) < 2 * 1024 * 1024
    pdf = _pdf_with_stream(bomb)
    with _deadline(20.0, "pdf bomb"):
        with pytest.raises(ValueError, match="decode budget"):
            parse_pdf_text(pdf)


def test_pdf_random_bytes_and_bitflips():
    rng = random.Random(5)
    valid = _pdf_with_stream(zlib.compress(b"BT (hello) Tj ET"))
    with _deadline(10.0, "valid pdf"):
        assert "hello" in "\n".join(parse_pdf_text(valid))
    for trial in range(120):
        blob = bytearray(valid)
        for _ in range(rng.choice([1, 3, 10])):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        for fn in (parse_pdf_text, parse_pdf_info):
            with _deadline(10.0, f"pdf flip {trial}"):
                try:
                    fn(bytes(blob))
                except Exception:
                    pass
    for trial in range(60):
        junk = b"%PDF-" + bytes(rng.randrange(256) for _ in range(800))
        for fn in (parse_pdf_text, parse_pdf_info):
            with _deadline(10.0, f"pdf junk {trial}"):
                try:
                    fn(junk)
                except Exception:
                    pass


# ---- WARC ----------------------------------------------------------------

def _gz(payload: bytes) -> bytes:
    return gzip.compress(payload)


def test_warc_gzip_bomb_newline_free():
    """An inflated run of zeros has no newline: a capped readline must
    bound the read instead of materializing the whole bomb."""
    bomb = _gz(b"\x00" * (256 * 1024 * 1024))
    with _deadline(30.0, "warc zero bomb"):
        assert list(iter_warc_records(bomb)) == []


def test_warc_giant_declared_length_skipped():
    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Target-URI: http://big.example/\r\n"
           b"Content-Length: 999999999\r\n\r\n" + b"x" * 1000)
    ok = (b"WARC/1.0\r\n"
          b"WARC-Type: response\r\n"
          b"WARC-Target-URI: http://ok.example/\r\n"
          b"Content-Length: 2\r\n\r\nhi\r\n\r\n")
    # oversize record first: must be drained/skipped without 1 GB held
    with _deadline(30.0, "warc giant length"):
        out = list(iter_warc_records(rec))
    assert out == []
    with _deadline(10.0, "warc ok record"):
        out = list(iter_warc_records(ok))
    assert [r["url"] for r in out] == ["http://ok.example/"]
    assert out[0]["payload"] == b"hi"


def test_warc_header_line_storm():
    """A bomb of endless tiny header lines must hit the line-count cap,
    not loop for the whole inflated stream."""
    storm = b"WARC/1.0\r\n" + b"a: b\r\n" * 100_000 + b"\r\n"
    with _deadline(20.0, "warc header storm"):
        assert list(iter_warc_records(_gz(storm))) == []


def test_warc_non_numeric_length_aborts_cleanly():
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: banana\r\n\r\nxx")
    with _deadline(10.0, "warc bad length"):
        assert list(iter_warc_records(bad)) == []


def test_warc_random_bytes_and_bitflips():
    rng = random.Random(11)
    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>hi"
    valid = (b"WARC/1.0\r\nWARC-Type: response\r\n"
             b"WARC-Target-URI: http://e.com/\r\n"
             b"Content-Length: " + str(len(body)).encode()
             + b"\r\n\r\n" + body + b"\r\n\r\n")
    assert [r["payload"] for r in iter_warc_records(valid)] == [b"<p>hi"]
    for compressed in (False, True):
        base = _gz(valid) if compressed else valid
        for trial in range(80):
            blob = bytearray(base)
            for _ in range(rng.choice([1, 4])):
                blob[rng.randrange(len(blob))] = rng.randrange(256)
            with _deadline(10.0, f"warc flip {compressed}/{trial}"):
                try:
                    list(iter_warc_records(bytes(blob)))
                except Exception:
                    pass


# ---- charset sniff ---------------------------------------------------------

def test_charset_sniff_hostile_inputs():
    rng = random.Random(3)
    blobs = [
        b"",
        b"\xff\xfe" + b"\x00" * 100_000,            # UTF-16 BOM + NULs
        b"\xef\xbb\xbf" + bytes(range(256)) * 400,
        b"<meta charset='" + b"x" * 100_000 + b"'>",
        ("<meta charset=utf-8>" * 20_000).encode(),
        bytes(rng.randrange(256) for _ in range(100_000)),
    ]
    for i, blob in enumerate(blobs):
        with _deadline(10.0, f"sniff {i}"):
            text, enc, repl = sniff_decode(blob)
        assert isinstance(text, str) and isinstance(enc, str)


# ---- deep-document traversal (legit-deep pages must not poison) -----------

def test_deep_page_inner_html_iterative():
    """innerHTML serialization is stack-based: a 30k-deep page (far
    past the ~1000-frame interpreter default that used to cap the old
    recursive _serialize) must round-trip, not RecursionError."""
    depth = 30_000
    root = parse_html("<div>" * depth + "x")
    body = root
    html = None
    for el in root.iter_elements():
        if el.tag == "body":
            html = el.inner_html()
            break
    assert html is not None
    assert html.count("<div>") == depth and html.endswith("x" + "</div>" * depth)


def test_deep_page_markdown_with_worker_ceiling():
    """html_to_markdown recurses per nesting level; the Arrow worker
    raises the interpreter limit to 30k (ops/maincontent.extract_
    markdown), which a 20k-deep page must fit under — and a 400k-deep
    hostile page must still fail as a catchable exception, not a
    crash."""
    import sys
    from goose_parser_spark.ops.maincontent import html_to_markdown
    old = sys.getrecursionlimit()
    try:
        if sys.getrecursionlimit() < 30_000:
            sys.setrecursionlimit(30_000)  # what the worker does
        md = html_to_markdown("<div>" * 20_000 + "deep text")
        assert "deep text" in md
        with pytest.raises(RecursionError):
            html_to_markdown("<div>" * 400_000 + "x")
    finally:
        sys.setrecursionlimit(old)


# ---- selector engine on hostile trees --------------------------------------

def test_hostile_trees_selector_deadlines():
    """Each (tree, selector) pair here was a measured >15 s quadratic
    before the evaluation-context memos (per-parent position maps,
    monotone chain memos, :has marked-ancestor sets). All of them
    together must now run in seconds."""
    from goose_parser_spark.dom.selector import DocIndex, select_indexed

    trees = {
        "wide": "<ul>" + "<li class='a'>x</li>" * 100_000 + "</ul>",
        "deep": "<div class='a'>" * 30_000 + "x",
        "sibs": "<p>x</p>" * 100_000,
    }
    sels = ["li:nth-child(2n+1)", "li:last-child", "li:nth-of-type(3)",
            "p + p", "p ~ p", "span ~ p", "p + p + p",
            "div:has(span)", "div:has(.a)", "#top div",
            "div:not(.a) div"]
    with _deadline(60.0, "hostile selector matrix"):
        for html in trees.values():
            root, created = parse_document(html)
            idx = DocIndex(root, created)
            for s in sels:
                select_indexed(idx, root, s)
