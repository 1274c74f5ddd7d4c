"""Fast HTML tokenizer: a single compiled-regex scan instead of
``html.parser``'s incremental state machine.

Profiling showed the stdlib parser at ~57% of per-document extraction
time (SURVEY.md §7.2 ranks "hot inner loop" as the perf battleground).
This tokenizer produces the exact same Element tree — it drives the
same HTML5 recovery logic (implied end tags, void elements,
auto-tbody, document-structure synthesis) as ``parser._TreeBuilder``
— and is differential-tested against the stdlib backend on every
golden fixture plus hypothesis-generated random documents.

Dialect notes (all matched to html.parser's observable behavior so the
two backends agree byte-for-byte):
- entities decoded in text and attribute values (only when ``&``
  present — the common no-entity case pays nothing);
- comments, doctypes, CDATA and processing instructions skipped;
- ``<script>``/``<style>`` content is raw text up to the matching
  close tag when the start tag is not self-closed (ONLY those two —
  html.parser's CDATA_CONTENT_ELEMENTS; ``<title>``/``<textarea>``
  content parses normally so the two backends agree byte-for-byte);
- stray ``<`` that does not open a tag is literal text.

Known divergence (documented, not chased): a tag with an UNBALANCED
quote in its attribute region (``<b x="1<p>``) — html.parser scans
ahead with bespoke heuristics, HTML5 consumes to the closing quote,
and this tokenizer treats the unparseable ``<`` as text. All three
disagree with each other; adversarial-soup fuzzing shows 2997/3000
random markup strings identical to html.parser, with the remainder
all in this class (see test_fastparser.py).
"""

from __future__ import annotations

import re
from html import unescape

from goose_parser_spark.dom.parser import (
    Element,
    IMPLIED_END,
    P_CLOSERS,
    VOID_ELEMENTS,
    _TreeBuilder,
    _ensure_document_structure,
)

# One scan token: comment | declaration/PI | end tag | start tag.
_TOKEN_RE = re.compile(
    r"""<(?:
        !--(?P<comment>.*?)-->
      | (?P<badcomment>!--.*)$
      | !\[(?P<marked>[^\]>]*)\[(?P<markedbody>.*?)\]\]>
      | (?P<badmarked>!\[[^\]>]*\[.*)$
      | (?P<decl>[!?][^>]*)>
      | /(?P<end>[a-zA-Z][-a-zA-Z0-9:._]*)\s*>
      | /(?P<bogus>[^>]*)>
      | (?P<start>[a-zA-Z][^\t\n\r\f\x20/>\x00]*)
        (?P<attrs>(?:[^>"']|"[^"]*"|'[^']*')*)>
    )""",
    re.DOTALL | re.VERBOSE,
)

# group indices for lastindex-based token dispatch (kept in sync with
# _TOKEN_RE by the assertion below)
_G_BADCOMMENT = _TOKEN_RE.groupindex["badcomment"]
_G_BADMARKED = _TOKEN_RE.groupindex["badmarked"]
_G_END = _TOKEN_RE.groupindex["end"]
_G_START = _TOKEN_RE.groupindex["start"]
_G_ATTRS = _TOKEN_RE.groupindex["attrs"]
assert _G_ATTRS == max(_TOKEN_RE.groupindex.values()), \
    "attrs must be the last group: the dispatch keys on lastindex"

_ATTR_RE = re.compile(
    r"""([^\s=/>]+)(?:\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]*)))?""",
)

# fast path for the overwhelmingly common attribute shape — exactly
# one double-quoted attribute, no entity, e.g. ' class="title"'.
# Cannot be self-closing (ends in `"` or space) and needs no unescape,
# so the general finditer loop + trailing-slash analysis is skipped.
_FAST_ONE_ATTR = re.compile(r'\s*([A-Za-z-]+)\s*=\s*"([^"&]*)"\s*\Z')

# ...and for the next-most-common shape: a run of K double-quoted,
# entity-free attributes (`<div class="doc" data-lang="en">`). Same
# no-self-closing / no-unescape guarantees; pair extraction is one
# C-level findall instead of the general finditer + group juggling.
_FAST_ALL_ATTRS = re.compile(r'(?:\s+[A-Za-z-]+="[^"&]*")+\s*\Z')
_FAST_PAIR = re.compile(r'([A-Za-z-]+)="([^"]*)"')

# Content of these elements is raw character data (no tags inside).
# Deliberately ONLY script/style: html.parser parses title/textarea
# content normally and the two backends must agree byte-for-byte.
_RAWTEXT = {
    "script": re.compile(r"</script\s*>", re.IGNORECASE),
    "style": re.compile(r"</style\s*>", re.IGNORECASE),
}


# start tags that can imply an end tag / tbody insertion — everything
# else skips the _imply_ends_for/_maybe_insert_tbody calls entirely
# (their bodies would no-op; the call frames were ~6% of parse time)
_IMPLIERS = frozenset(P_CLOSERS) | frozenset(IMPLIED_END)


class _FastBuilder(_TreeBuilder):
    """Reuses every recovery rule from _TreeBuilder; only the
    HTMLParser-driven feed() machinery is bypassed."""

    def start(self, tag: str, attr_str: str) -> bool:
        """Insert a start tag; returns whether the tag was self-closing.

        Self-closing detection mirrors html.parser's locatestarttagend
        semantics: a trailing ``/`` marks the tag self-closed ONLY when
        it is not consumed as part of an unquoted attribute value
        (``<a href=http://x.com/>`` keeps the slash in href and is a
        normal start tag; ``<br/>`` / ``<a href="x"/>`` self-close).
        """
        if tag in _IMPLIERS:  # most tags imply nothing: skip the frames
            self._imply_ends_for(tag)
            if tag == "tr":
                self._maybe_insert_tbody(tag)
        attrs: dict[str, str] = {}
        self_closing = False
        if attr_str and not attr_str.isspace():
            fm = _FAST_ONE_ATTR.match(attr_str)
            if fm is not None:
                name = fm.group(1)
                attrs[name if name.islower() else name.lower()] = fm.group(2)
            elif _FAST_ALL_ATTRS.match(attr_str) is not None:
                for name, v in _FAST_PAIR.findall(attr_str):
                    if not name.islower():
                        name = name.lower()
                    if name not in attrs:  # first occurrence wins (HTML5)
                        attrs[name] = v
            else:
                last_end = 0
                for m in _ATTR_RE.finditer(attr_str):
                    last_end = m.end()
                    name, v1, v2, v3 = m.group(1, 2, 3, 4)
                    name = name.lower()
                    if name in attrs:
                        continue  # first occurrence wins (HTML5)
                    v = v1 if v1 is not None else v2 if v2 is not None \
                        else v3 if v3 is not None else ""
                    attrs[name] = unescape(v) if "&" in v else v
                if "/" in attr_str:
                    stripped = attr_str.rstrip()
                    self_closing = (stripped.endswith("/")
                                    and last_end < len(stripped))
        parent = self.stack[-1]
        el = Element(tag, attrs, parent, self._next_order())
        parent.children.append(el)
        self.created.append(el)
        if tag not in VOID_ELEMENTS and not self_closing:
            self.stack.append(el)
        return self_closing

    def text(self, data: str) -> None:
        parent = self.stack[-1]
        if parent.children and isinstance(parent.children[-1], str):
            parent.children[-1] += data
        else:
            parent.children.append(data)


def parse_html_fast(html: str | bytes) -> Element:
    """Drop-in replacement for :func:`parser.parse_html`."""
    return parse_document_fast(html)[0]


def parse_document_fast(html: str | bytes):
    """(root, elements_in_doc_order_or_None) — see parser.parse_document."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    b = _FastBuilder()
    token = _TOKEN_RE
    pos = 0
    n = len(html)
    text_cb = b.text
    end_cb = b.handle_endtag
    while pos < n:
        lt = html.find("<", pos)
        if lt < 0:
            chunk = html[pos:]
            if chunk:
                text_cb(unescape(chunk) if "&" in chunk else chunk)
            break
        if lt > pos:
            chunk = html[pos:lt]
            text_cb(unescape(chunk) if "&" in chunk else chunk)
        m = token.match(html, lt)
        if m is None:
            # stray '<' — literal text (html.parser behavior)
            text_cb("<")
            pos = lt + 1
            continue
        # dispatch on the last participating group index — one C-level
        # attribute read instead of up to four named-group lookups per
        # token (the token loop is the hottest code in the engine)
        gi = m.lastindex
        if gi == _G_ATTRS:  # start tag (attrs participates, may be '')
            pos = m.end()
            tag = m.group(_G_START).lower()
            self_closing = b.start(tag, m.group(_G_ATTRS))
            # html.parser enters cdata mode only for NON-self-closed
            # script/style (parse_starttag's startendtag branch skips
            # set_cdata_mode) — mirror that so backends stay identical.
            raw = None if self_closing else _RAWTEXT.get(tag)
            if raw is not None:
                mm = raw.search(html, pos)
                if mm is None:
                    content, pos = html[pos:], n
                else:
                    content, pos = html[pos:mm.start()], mm.end()
                if content:
                    text_cb(content)
                end_cb(tag)
            continue
        if gi == _G_END:
            pos = m.end()
            end_cb(m.group(_G_END).lower())
            continue
        if gi == _G_BADCOMMENT or gi == _G_BADMARKED:
            # unterminated comment/marked section: html.parser flushes
            # the remainder as raw text at close()
            text_cb(html[lt:])
            break
        pos = m.end()
        # comments/decls/bogus end tags: skipped
    changed = _ensure_document_structure(b.root)
    return b.root, (None if changed else b.created)
