"""Main-content extraction: boilerplate strip via DOM heuristics.

The north rule (BASELINE.json:14) scopes the engine to "main-content
extraction (HTML boilerplate strip, PDF/layout parse, DOM heuristics)".
This module is the rules-free counterpart of the rule-tree extractor:
a readability-style scorer that picks the dominant content block of a
page and strips chrome (nav/header/footer/sidebar/ads/comments).

Heuristic (deterministic, frozen — the driver oracle depends on it):
for every candidate container (`article main section div td`) compute

    score = own_text_len × (1 − link_density) × class_weight

where ``link_density`` is the fraction of the candidate's text that
lives inside <a> descendants, and ``class_weight`` down-weights
candidates whose class/id match boilerplate patterns (nav, footer,
sidebar, ad, …) and up-weights content-ish names (article, content,
main, post, body). Deepest-wins on ties so a page wrapper never beats
the article it contains. Runs Arrow-batched via mapInArrow — same
execution profile as the rule-tree extractor (map-only, no shuffle).
"""

from __future__ import annotations

import re
import time
from typing import TYPE_CHECKING

from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from goose_parser_spark.dom.parser import Element, parse_html

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

_CANDIDATE_TAGS = frozenset(["article", "main", "section", "div", "td"])

_NEGATIVE = re.compile(
    r"nav|menu|header|footer|sidebar|side-bar|aside|banner|breadcrumb|"
    r"comment|share|social|sponsor|advert|\bad\b|ads|promo|related|"
    r"widget|cookie|popup|masthead", re.IGNORECASE)
_POSITIVE = re.compile(
    r"article|content|main|post|body|entry|text|story|column", re.IGNORECASE)


def _class_weight(el: Element) -> float:
    hint = f"{el.attrs.get('class', '')} {el.attrs.get('id', '')}"
    w = 1.0
    if _NEGATIVE.search(hint):
        w *= 0.2
    if _POSITIVE.search(hint):
        w *= 1.5
    return w


def _subtree_lengths(root: Element) -> tuple[dict[int, int], dict[int, int]]:
    """(text_len, link_text_len) per element id() in ONE post-order
    pass — the naive per-candidate text()/anchor walk is
    O(candidates × subtree), quadratic on deeply nested pages; this is
    O(nodes). An anchor's whole subtree counts as link text exactly
    once (nested <a> is not double-counted)."""
    tl: dict[int, int] = {}
    ll: dict[int, int] = {}
    stack: list[tuple[Element, bool]] = [(root, False)]
    while stack:
        el, done = stack.pop()
        if done:
            t = 0
            link = 0
            for c in el.children:
                if isinstance(c, str):
                    t += len(c)
                else:
                    t += tl[id(c)]
                    link += ll[id(c)]
            if el.tag == "a":
                link = t
            tl[id(el)] = t
            ll[id(el)] = link
        else:
            stack.append((el, True))
            for c in el.children:
                if not isinstance(c, str):
                    stack.append((c, False))
    return tl, ll


def score_candidates(root: Element) -> list[tuple[float, int, Element]]:
    """All candidates scored; returns (score, depth, element)."""
    tl, ll = _subtree_lengths(root)
    out = []
    depth = {id(root): 0}
    stack = [c for c in root.children if isinstance(c, Element)]
    for el in stack:
        depth[id(el)] = 1
    while stack:
        el = stack.pop()
        d = depth[id(el)]
        for c in el.children:
            if isinstance(c, Element):
                depth[id(c)] = d + 1
                stack.append(c)
        if el.tag not in _CANDIDATE_TAGS:
            continue
        n = tl[id(el)]
        if n == 0:
            continue
        link_density = ll[id(el)] / n
        score = n * (1.0 - link_density) * _class_weight(el)
        out.append((score, d, el))
    return out


def main_content(html: str | bytes) -> tuple[str, float]:
    """Extract (main_text, score) from one document. Falls back to the
    whole-body text when no candidate scores (text-only pages)."""
    root = parse_html(html)
    cands = score_candidates(root)
    if not cands:
        body = next(iter(root.iter_elements()), None)
        return (root.text(), 0.0)
    # max score; deepest wins ties so wrappers never beat the article
    best = max(cands, key=lambda t: (t[0], t[1]))
    return (best[2].text(), best[0])


def extract_main_content(
    df: "DataFrame",
    html_col: str = "html",
    url_col: str = "url",
) -> "DataFrame":
    """Boilerplate-strip over a pages DataFrame.

    Output: ``url, main_text, content_score, parse_ns, error``. Same
    scale profile as the rule extractor: column-pruned scan →
    mapInArrow → no shuffle.
    """
    from pyspark.sql.pandas.types import to_arrow_schema
    from goose_parser_spark.deploy import ship_package

    ship_package(df.sparkSession)

    out_schema = StructType([
        StructField(url_col, StringType(), False),
        StructField("main_text", StringType(), True),
        StructField("content_score", DoubleType(), True),
        StructField("parse_ns", LongType(), True),
        StructField("error", StringType(), True),
    ])
    arrow_schema = to_arrow_schema(out_schema)

    def run(batches):
        import pyarrow as pa
        for batch in batches:
            names = batch.schema.names
            urls = batch.column(names.index(url_col))
            raws = batch.column(names.index(html_col)).to_pylist()
            n = batch.num_rows
            texts: list[str | None] = [None] * n
            scores: list[float] = [0.0] * n
            parse_ns: list[int] = [0] * n
            errors: list[str | None] = [None] * n
            for i in range(n):
                t0 = time.perf_counter_ns()
                try:
                    raw = raws[i]
                    if raw is None:
                        raise ValueError("html is NULL")
                    texts[i], scores[i] = main_content(raw)
                except Exception as exc:  # noqa: BLE001 — I4 isolation
                    errors[i] = f"{type(exc).__name__}: {exc}"
                parse_ns[i] = time.perf_counter_ns() - t0
            yield pa.RecordBatch.from_arrays([
                urls,
                pa.array(texts, type=pa.string()),
                pa.array(scores, type=pa.float64()),
                pa.array(parse_ns, type=pa.int64()),
                pa.array(errors, type=pa.string()),
            ], schema=arrow_schema)

    pruned = df.select(url_col, html_col)
    return pruned.mapInArrow(run, schema=out_schema)
