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
# The start branch's name and attrs quantifiers are POSSESSIVE: the
# two character classes overlap (both accept '<', letters, ...), so
# on a failing match a backtracking engine would try every (name,
# attrs) split point — O(n^2) per attempt, O(n^3) over a document of
# stray '<'s (a 2 KB hostile page measured >20 s). Possessive
# matching is semantics-preserving here: the attrs alternatives are
# first-character-disjoint (a position starting with a quote can
# only ever be a quoted run), so giving characters back can never
# turn a failure into a match — except the degenerate quote-in-name
# case, which sits in the module's documented all-three-disagree
# divergence class and is differential-tested.
_TOKEN_RE = re.compile(
    r"""<(?:
        !--(?P<comment>.*?)-->
      | (?P<badcomment>!--.*)$
      | !\[(?P<marked>[^\]>]*)\[(?P<markedbody>.*?)\]\]>
      | (?P<badmarked>!\[[^\]>]*\[.*)$
      | (?P<decl>[!?][^>]*)>
      | /(?P<end>[a-zA-Z][-a-zA-Z0-9:._]*)\s*>
      | /(?P<bogus>[^>]*)>
      | (?P<start>[a-zA-Z][^\t\n\r\f\x20/>\x00]*+)
        (?P<attrs>(?:[^>"']|"[^"]*+"|'[^']*+')*+)>
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
        stack = self.stack
        parent = stack[-1]
        order = self._order + 1  # inlined _next_order: one method
        self._order = order      # call per element is ~4% of parse
        el = Element(tag, attrs, parent, order)
        parent.children.append(el)
        self.created.append(el)
        if tag not in VOID_ELEMENTS and not self_closing:
            tp = self._tag_pos  # inlined _push (same frame argument)
            try:
                tp[tag].append(len(stack))
            except KeyError:
                tp[tag] = [len(stack)]
            stack.append(el)
        return self_closing

    def text(self, data: str) -> None:
        children = self.stack[-1].children
        if children and isinstance(children[-1], str):
            # pop into a local so the string has one reference: CPython
            # then extends it in place (amortized O(1)) instead of
            # copying the accumulated node per fragment — a hostile
            # stream of tiny text fragments is quadratic otherwise
            merged = children.pop()
            merged += data
            children.append(merged)
        else:
            children.append(data)


# tag name inside a '<'-delimited segment (same charclass as the
# start branch of _TOKEN_RE; first char guaranteed alpha by dispatch)
_NAME_RE = re.compile(r"[a-zA-Z][^\t\n\r\f\x20/>\x00]*")

# end tag anchored at a part start (== the char after '<'); same
# dialect as the end branch of _TOKEN_RE. An end-tag token can never
# contain '<' (name charclass and \s both exclude it), so failing
# within the part == failing in the full document.
_END_FAST = re.compile(r"/([a-zA-Z][-a-zA-Z0-9:._]*)\s*>")

# a complete quoted attribute run; used to prove every quote in an
# attrs region closes before the candidate '>' (sub leaves nothing
# quote-like ⇒ the '>' is outside quotes and really ends the tag)
_QUOTED_RUN = re.compile("\"[^\"]*\"|'[^']*'")

# rawtext close tags anchored at a part start ('</script…' always
# begins with '<', i.e. always sits at a split boundary)
_RAW_CLOSE_PART = {
    "script": re.compile(r"/script\s*>", re.IGNORECASE),
    "style": re.compile(r"/style\s*>", re.IGNORECASE),
}


def parse_html_fast(html: str | bytes) -> Element:
    """Drop-in replacement for :func:`parser.parse_html`."""
    return parse_document_fast(html)[0]


def _slow_token(html: str, lt: int, b: _FastBuilder) -> int:
    """Consume ONE token at ``html[lt] == '<'`` with the full regex —
    byte-identical to the pre-split scan loop. Returns the next scan
    position (``len(html)`` when the remainder was flushed). Only
    reached for shapes the split fast paths cannot prove local to one
    part: quoted attrs that may hide ``>``/``<``, start tags with no
    ``>`` before the next ``<``, marked sections, spanning decls."""
    m = _TOKEN_RE.match(html, lt)
    if m is None:
        # stray '<' — literal text (html.parser behavior)
        b.text("<")
        return lt + 1
    gi = m.lastindex
    if gi == _G_ATTRS:  # start tag (attrs participates, may be '')
        pos = m.end()
        tag = m.group(_G_START).lower()
        self_closing = b.start(tag, m.group(_G_ATTRS))
        raw = None if self_closing else _RAWTEXT.get(tag)
        if raw is not None:
            mm = raw.search(html, pos)
            if mm is None:
                content, pos = html[pos:], len(html)
            else:
                content, pos = html[pos:mm.start()], mm.end()
            if content:
                b.text(content)
            b.handle_endtag(tag)
        return pos
    if gi == _G_END:
        b.handle_endtag(m.group(_G_END).lower())
        return m.end()
    if gi == _G_BADCOMMENT or gi == _G_BADMARKED:
        # unterminated comment/marked section: html.parser flushes
        # the remainder as raw text at close()
        b.text(html[lt:])
        return len(html)
    return m.end()  # comments/decls/bogus end tags: skipped


def parse_document_fast(html: str | bytes):
    """(root, elements_in_doc_order_or_None) — see parser.parse_document.

    Scan strategy: ``html.split("<")`` and classify each part by its
    first character — one C-level split replaces the per-token
    find+match sequence of the previous loop (~1.8× faster scanning on
    crawl-shaped pages). Every fast path below is taken only when the
    token provably cannot extend past the part (no quote ambiguity, a
    real ``>`` present); anything else defers to :func:`_slow_token`,
    which runs the ORIGINAL full regex at the absolute offset, so the
    two scanners are byte-identical by construction on the hard cases
    and differential-tested (vs html.parser, goldens + random soup)
    on everything else.
    """
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    b = _FastBuilder()
    text_cb = b.text
    end_cb = b.handle_endtag
    start_cb = b.start
    parts = html.split("<")
    head = parts[0]
    if head:
        text_cb(unescape(head) if "&" in head else head)
    pos = len(head)  # abs index of the '<' that opens parts[i]
    np_ = len(parts)
    # lazily-advanced position of the next '>' at-or-after pos. Every
    # token shape reaching _slow_token below needs a '>' to terminate,
    # so when none remains the regex provably fails and the '<' is
    # literal text — decided here in O(1). Without this, each stray
    # '<' in a '>'-free tail pays a full scan-to-EOF inside the regex:
    # quadratic on hostile pages like "a<b c" * 100k (measured >30 s;
    # linear now). The cursor only moves forward, so maintaining it is
    # amortized O(n) over the document.
    next_gt = -2
    nh_ = len(html)  # "no '>' remains" is cached as len(html), not -1:
    # a -1 sentinel would satisfy `next_gt < pos` forever and re-scan
    # the whole tail per stray token (quadratic again)
    i = 1
    while i < np_:
        p = parts[i]
        plen = len(p)
        tail_from = plen  # offset in p where trailing text starts
        c = p[:1]
        if ("a" <= c <= "z") or ("A" <= c <= "Z"):
            gt = p.find(">")
            if gt < 0:
                # no '>' before the next '<': the token (quoted attr /
                # exotic name — both may contain '<') spans parts, or
                # it is a stray '<'. Exact regex decides — unless no
                # '>' remains at all, where it provably fails.
                if next_gt < pos:
                    next_gt = html.find(">", pos)
                    if next_gt < 0:
                        next_gt = nh_
                if next_gt >= nh_:
                    text_cb("<")
                    tail_from = 0
                    newpos = -1
                else:
                    newpos = _slow_token(html, pos, b)
            else:
                seg = p[:gt]
                if '"' in seg or "'" in seg:
                    m2 = _NAME_RE.match(seg)
                    attr_str = seg[m2.end():]
                    # quote-closure proof (quotes in the attrs region
                    # strictly alternate open/close): with one quote
                    # kind, even count == all closed — C-level count.
                    # Mixed kinds need the full quoted-run strip.
                    if "'" not in attr_str:
                        bad = attr_str.count('"') & 1
                    elif '"' not in attr_str:
                        bad = attr_str.count("'") & 1
                    else:
                        residue = _QUOTED_RUN.sub("", attr_str)
                        bad = '"' in residue or "'" in residue
                    if bad:
                        # an unclosed quote may hide this '>' (or a
                        # '<') inside a value — exact regex decides
                        newpos = _slow_token(html, pos, b)
                    else:
                        newpos = -1
                        name = m2.group()
                else:
                    m2 = _NAME_RE.match(seg)
                    attr_str = seg[m2.end():]
                    newpos = -1
                    name = m2.group()
                if newpos < 0:
                    tag = name if name.islower() else name.lower()
                    self_closing = start_cb(tag, attr_str)
                    rawc = None if self_closing \
                        else _RAW_CLOSE_PART.get(tag)
                    if rawc is None:
                        tail_from = gt + 1
                    else:
                        # rawtext: content runs to '</tag\s*>', which
                        # always sits at a part boundary
                        chunks = [p[gt + 1:]]
                        j = i + 1
                        qlt = pos + 1 + plen
                        mm = None
                        while j < np_:
                            pj = parts[j]
                            mm = rawc.match(pj)
                            if mm is not None:
                                break
                            chunks.append("<")
                            chunks.append(pj)
                            qlt += 1 + len(pj)
                            j += 1
                        content = "".join(chunks)
                        if mm is None:
                            # unterminated: rest is raw content
                            if content:
                                text_cb(content)
                            end_cb(tag)
                            return _finish(b)
                        if content:
                            text_cb(content)
                        end_cb(tag)
                        i, pos, p, plen = j, qlt, pj, len(pj)
                        tail_from = mm.end()
        elif c == "/":
            m2 = _END_FAST.match(p)
            if m2 is not None:
                name = m2.group(1)
                end_cb(name if name.islower() else name.lower())
                tail_from = m2.end()
                newpos = -1
            else:
                gt = p.find(">")
                if gt >= 0:
                    # bogus end tag ('</ x>', '</3>'): skipped; its
                    # [^>]* body cannot hide this first '>'
                    tail_from = gt + 1
                    newpos = -1
                else:
                    # bogus end spanning '<'s (or stray) — exact regex;
                    # with no '>' left it can only be the stray case
                    if next_gt < pos:
                        next_gt = html.find(">", pos)
                    if next_gt < 0:
                        next_gt = nh_
                    if next_gt >= nh_:
                        text_cb("<")
                        tail_from = 0
                        newpos = -1
                    else:
                        newpos = _slow_token(html, pos, b)
        elif c == "!" or c == "?":
            newpos = -1
            if p.startswith("!--"):
                k = p.find("-->", 3)
                if k >= 0:
                    tail_from = k + 3
                else:
                    # comment body spans '<'s; '-->' contains no '<'
                    # so it lies wholly inside some later part
                    j = i + 1
                    qlt = pos + 1 + plen
                    k2 = -1
                    while j < np_:
                        pj = parts[j]
                        k2 = pj.find("-->")
                        if k2 >= 0:
                            break
                        qlt += 1 + len(pj)
                        j += 1
                    if k2 < 0:
                        # unterminated comment: flush remainder raw
                        text_cb(html[pos:])
                        return _finish(b)
                    i, pos, p, plen = j, qlt, pj, len(pj)
                    tail_from = k2 + 3
            elif p.startswith("!["):
                # marked section (CDATA etc.) — rare; exact regex
                newpos = _slow_token(html, pos, b)
            else:
                gt = p.find(">")
                if gt >= 0:
                    tail_from = gt + 1  # declaration/PI: skipped
                else:
                    # decl spanning '<'s (its [^>]* may contain them)
                    # or never terminated — exact regex decides; with
                    # no '>' left only the stray outcome is possible
                    # (the badcomment/badmarked prefixes are excluded
                    # by this branch's dispatch)
                    if next_gt < pos:
                        next_gt = html.find(">", pos)
                    if next_gt < 0:
                        next_gt = nh_
                    if next_gt >= nh_:
                        text_cb("<")
                        tail_from = 0
                        newpos = -1
                    else:
                        newpos = _slow_token(html, pos, b)
        else:
            # '<' not opening any token: literal text
            text_cb("<")
            tail_from = 0
            newpos = -1
        if newpos < 0:
            if tail_from < plen:
                t = p[tail_from:]
                text_cb(unescape(t) if "&" in t else t)
            pos += 1 + plen
            i += 1
            continue
        # resync after a slow token: skip parts the token consumed
        # strictly past (newpos == part_end means the next '<' is
        # unconsumed and its part must be processed normally), then
        # emit the landing part's tail as text
        while i < np_:
            part_end = pos + 1 + len(parts[i])
            if newpos > part_end:
                pos = part_end
                i += 1
                continue
            if newpos < part_end:
                t = html[newpos:part_end]
                if t:
                    text_cb(unescape(t) if "&" in t else t)
            pos = part_end
            i += 1
            break
    return _finish(b)


def _finish(b: _FastBuilder):
    changed = _ensure_document_structure(b.root)
    return b.root, (None if changed else b.created)
