"""Crawl-support operators: sitemap parsing and Common-Crawl-style
CDX index-line parsing.

Sitemaps (sitemaps.org protocol, public spec) are the crawl
scheduler's seed source; CDX(J) lines ("urlkey timestamp {json}") are
the public Common Crawl index format used to locate captures inside
WARC files without scanning them. Both parse scan-side — a single
projection per row, no shuffle, no Python — so at 10^12 rows they run
inside whole-stage codegen at scan speed.

Sitemap parsing deliberately dogfoods the extraction engine: a
sitemap is an XML document and the rule-tree compiler + DOM parser
already handle it (unknown tags nest normally, ``<?xml?>`` prolog
tokens are skipped like any other declaration), so ``sitemap_urls``
is literally a compiled rule tree over the pages DataFrame — the same
batched-Arrow path, the same poison-document isolation, the same
lineage columns as any page extraction.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# One rule tree handles both sitemap flavors: <urlset> entry pages and
# <sitemapindex> pointer pages (sitemaps.org §"Using sitemap index
# files"). Branches are not needed — a urlset page simply yields an
# empty subsitemap grid and vice versa.
SITEMAP_RULES: dict = {
    "collection": [
        {"name": "entries", "scope": "urlset > url", "collection": [[
            {"name": "loc", "scope": "loc"},
            {"name": "lastmod", "scope": "lastmod"},
            {"name": "changefreq", "scope": "changefreq"},
            {"name": "priority", "scope": "priority"},
        ]]},
        {"name": "subsitemaps", "scope": "sitemapindex > sitemap",
         "collection": [[
             {"name": "loc", "scope": "loc"},
             {"name": "lastmod", "scope": "lastmod"},
         ]]},
    ],
}


def sitemap_urls(
    df: DataFrame,
    xml_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Parse sitemap / sitemap-index XML documents into one row per
    referenced URL.

    Output: ``url`` (the sitemap's own URL), ``kind`` (``'url'`` for
    page entries, ``'sitemap'`` for index pointers — feed the latter
    back into the fetch frontier), ``loc``, ``lastmod``,
    ``changefreq``, ``priority`` (empty string where the optional tag
    is absent, the engine's empty-match convention). Malformed
    documents surface per-row in ``error`` upstream and yield zero
    rows here — one bad sitemap never poisons the batch.

    Map-only: extraction UDF → two ``inline`` explodes unioned; no
    shuffle anywhere.
    """
    from goose_parser_spark.extractor import extract
    ex = extract(df, SITEMAP_RULES, html_col=xml_col, url_col=url_col)
    entries = ex.select(
        F.col(url_col),
        F.lit("url").alias("kind"),
        F.inline("extracted.entries"))
    subs = ex.select(
        F.col(url_col),
        F.lit("sitemap").alias("kind"),
        F.inline("extracted.subsitemaps")).select(
            url_col, "kind", "loc", "lastmod",
            F.lit("").alias("changefreq"), F.lit("").alias("priority"))
    return entries.unionByName(subs)


def parse_cdx(
    df: DataFrame,
    line_col: str = "line",
) -> DataFrame:
    """Parse CDXJ index lines (``urlkey timestamp {json}`` — the
    public Common Crawl index format) into typed columns.

    Output: ``urlkey, ts (timestamp), url, mime, status (int),
    digest, length (bigint), offset (bigint), filename``. Lines that
    do not match the three-field shape yield NULL fields (never an
    exception — index files contain the occasional torn line).

    Pure projection: ``split`` with limit 3 + ``get_json_object`` —
    scan-level, codegen, no shuffle. At full-index scale (~3·10^9
    lines per crawl) this is the cheapest possible shape; predicate
    pushdown on the output columns still works because the projection
    is deterministic and per-row.
    """
    # F.get (not parts[i]): bare array indexing raises
    # INVALID_ARRAY_INDEX under ANSI mode on lines with fewer than 3
    # space-separated fields; F.get degrades to NULL. Likewise
    # try_cast for status/length/offset — CDX revisit records carry
    # status "-" which a plain cast would throw on.
    parts = F.split(F.col(line_col), " ", 3)
    j = F.get(parts, 2)
    return df.select(
        F.get(parts, 0).alias("urlkey"),
        F.try_to_timestamp(F.get(parts, 1),
                           F.lit("yyyyMMddHHmmss")).alias("ts"),
        F.get_json_object(j, "$.url").alias("url"),
        F.get_json_object(j, "$.mime").alias("mime"),
        F.get_json_object(j, "$.status").try_cast("int").alias("status"),
        F.get_json_object(j, "$.digest").alias("digest"),
        F.get_json_object(j, "$.length").try_cast("bigint").alias("length"),
        F.get_json_object(j, "$.offset").try_cast("bigint").alias("offset"),
        F.get_json_object(j, "$.filename").alias("filename"),
    )


def schedule_frontier(
    frontier: DataFrame,
    delays: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    priority_col: str | None = None,
    default_delay_s: float = 1.0,
) -> DataFrame:
    """Politeness-aware fetch scheduling: assign each frontier URL its
    per-host fetch slot and earliest start offset.

    ``delays`` is ``(host, crawl_delay)`` (e.g. from
    :func:`goose_parser_spark.ops.robots.robots_directives`); hosts
    without a row (or with NULL delay) use ``default_delay_s``. Within
    a host, URLs are ordered by ``priority_col`` descending when given
    (ties and the default by url — deterministic), and slot k starts
    at ``k * delay`` seconds.

    Plan: one left join on the bounded host table + one window over
    ``host`` — a single hash-partitioned shuffle keyed on host. A
    pathologically hot host makes a wide window partition; that is the
    CRAWL's constraint (politeness serializes a host), not the plan's
    — the scheduler output is exactly as parallel as politeness
    allows.

    Columns: ``url, host, fetch_slot (0-based), start_offset_ms``.
    """
    from pyspark.sql import Window
    d = (delays.select(F.col(host_col),
                       F.col("crawl_delay").cast("double").alias("_d")))
    if priority_col is not None:
        order = [F.col(priority_col).desc(), F.col(url_col)]
    else:
        order = [F.col(url_col)]
    w = Window.partitionBy(host_col).orderBy(*order)
    delay_ms = (F.coalesce(F.col("_d"), F.lit(float(default_delay_s)))
                * 1000.0)
    return (frontier.join(d, on=host_col, how="left")
            .withColumn("fetch_slot",
                        (F.row_number().over(w) - 1).cast("long"))
            .select(F.col(url_col), F.col(host_col), "fetch_slot",
                    # round before the cast: (slot * delay) in double
                    # can land at 299.999... ms for non-binary delays
                    # (crawl_delay=0.3); a bare cast truncates to 299
                    # where the oracle (and intuition) round to 300.
                    F.round(F.col("fetch_slot") * delay_ms)
                    .cast("long").alias("start_offset_ms")))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    content_col: str = "text",
) -> DataFrame:
    """Crawl-snapshot delta: classify every url across two crawls as
    ``added`` (new only), ``gone`` (old only), ``changed`` (both, body
    differs) or ``unchanged`` — the incremental-processing primitive
    (re-extract/re-score only ``added``+``changed``; retire ``gone``),
    same shape as comparing two Common Crawl monthly snapshots.

    Bodies are compared by md5 digest so the join shuffles 32-byte
    hashes, never page bodies; at 10^12 urls this is one url-keyed
    full-outer hash join (AQE handles hot-host skew) over two narrow
    projections. Inputs with duplicate urls should be pre-deduplicated
    (e.g. ops/urls.dedup_by_url keep-latest); otherwise the join
    multiplies matches per url.

    Columns: ``url, status, old_digest, new_digest`` — digests NULL on
    the side where the url is absent. A NULL body (fetched but empty /
    failed capture) digests as the empty string rather than NULL, so a
    url PRESENT in both snapshots can never masquerade as added/gone —
    NULL-vs-text compares as changed, NULL-vs-NULL as unchanged.
    """
    # coalesce the DIGEST (not the body): md5('') == md5(x'') so the
    # sentinel is type-agnostic across string and binary content cols
    empty = F.md5(F.lit(""))
    o = old.select(F.col(url_col).alias("url"),
                   F.coalesce(F.md5(F.col(content_col)), empty)
                   .alias("old_digest"))
    n = new.select(F.col(url_col).alias("url"),
                   F.coalesce(F.md5(F.col(content_col)), empty)
                   .alias("new_digest"))
    j = o.join(n, on="url", how="full_outer")
    status = (F.when(F.col("old_digest").isNull(), F.lit("added"))
              .when(F.col("new_digest").isNull(), F.lit("gone"))
              .when(F.col("old_digest") == F.col("new_digest"),
                    F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return j.select("url", status.alias("status"),
                    "old_digest", "new_digest")


def capture_history(
    df: DataFrame,
    urlkey_col: str = "urlkey",
    ts_col: str = "ts",
    digest_col: str = "digest",
    status_col: str = "status",
) -> DataFrame:
    """Per-URL capture history over a parsed CDX index (the CDX-server
    summary every crawl operator reads): first/last capture time,
    capture count, distinct content versions, and OK-status count —
    the url-stability signals that pick refresh candidates (many
    versions = churny) and prioritize stable pages for training
    corpora (one version across months = durable content).

    One hash-aggregate keyed on ``urlkey``; map-side partial
    aggregation means the exchange carries one partial row per
    (task, urlkey), not the 3·10^9 raw index lines. Distinct-version
    counting uses ``count_distinct`` on the digest — an exact
    expand-style distinct under the same agg (swap to
    ``approx_count_distinct`` at full-index scale if 2% error is
    acceptable; documented, not defaulted).

    Columns: ``urlkey, first_seen, last_seen, n_captures, n_versions,
    n_ok``. NULL urlkeys (torn lines) are dropped.
    """
    ok = (F.col(status_col) >= 200) & (F.col(status_col) < 300)
    return (df.where(F.col(urlkey_col).isNotNull())
            .groupBy(urlkey_col)
            .agg(F.min(ts_col).alias("first_seen"),
                 F.max(ts_col).alias("last_seen"),
                 F.count("*").alias("n_captures"),
                 F.count_distinct(F.col(digest_col)).alias("n_versions"),
                 F.sum(F.when(ok, 1).otherwise(0)).alias("n_ok")))


def _xml_field(block: Column, tag: str) -> Column:
    """Inner text of ``<tag>…</tag>`` inside one feed item block:
    CDATA wrapper content taken LITERALLY (per XML — no entity
    decoding inside CDATA); otherwise the five predefined XML
    entities are decoded (chained replace with ``&amp;`` LAST, which
    is exactly single-pass-correct for the predefined five: the
    earlier replaces can never match inside an ``&amp;``-escaped
    sequence). Numeric character references are deliberately left
    as-is (documented boundary — they need a per-codepoint decode).
    Absent tag → NULL."""
    # Linear-time field grab (hostile-input bound): split ONCE on the
    # literal closer and take everything after the first opener in
    # the part before it. Equivalent to the lazy-regex first
    # <tag>...</tag> pair for any well-formed feed; the one
    # divergence (a stray closer BEFORE the first opener hides a
    # later pair) is malformed XML and documented. The lazy original
    # re-scanned the block from every unclosed opener — quadratic on
    # crafted blocks; attribute regions are capped at 4 KB for the
    # same reason (real feed tags carry bytes of attributes, not KBs).
    before_close = F.split(block, re.escape(f"</{tag}>"), 2)[0]
    raw = F.regexp_extract(
        before_close, f"(?s)<{tag}(?:\\s[^>]{{0,4096}})?>(.*)$", 1)
    raw = F.when(F.size(F.split(block, re.escape(f"</{tag}>"), 2)) > 1,
                 raw).otherwise(F.lit(""))
    raw = F.nullif(raw, F.lit(""))
    cdata = F.regexp_extract(
        raw, "(?s)^\\s*<!\\[CDATA\\[(.*?)\\]\\]>\\s*$", 1)
    decoded = raw
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        decoded = F.replace(decoded, F.lit(ent), F.lit(ch))
    return F.when(raw.isNull(), F.lit(None).cast("string")) \
            .when(cdata != "", cdata) \
            .otherwise(F.trim(decoded))


def feed_entries(
    df: DataFrame,
    xml_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Parse RSS 2.0 / Atom feed documents into one row per entry —
    the feed leg of a crawl's discovery frontier (new-content URLs
    surface in feeds long before sitemaps refresh).

    Output: ``url`` (the feed's own URL), ``kind`` (``'rss'`` |
    ``'atom'``), ``title``, ``link`` (RSS ``<link>`` text or Atom
    ``<link href>``), ``published`` (RSS ``pubDate`` / Atom
    ``updated``, raw string — date parsing is a downstream transform),
    ``guid`` (RSS ``guid`` / Atom ``id``), ``summary`` (RSS
    ``description`` / Atom ``summary``). Optional fields NULL when
    absent; non-feed documents yield zero rows.

    Like :func:`parse_cdx` this is pure scan-side Catalyst — one
    regexp_extract_all explode plus per-field projections, no Python,
    no shuffle: feeds are machine-generated XML, so regex item
    splitting is exact in practice, and the whole operator runs at
    scan speed at 10^9-document scale. CDATA-wrapped fields keep
    their content literally; the five predefined XML entities are
    decoded elsewhere.
    """
    xml = F.col(xml_col)
    kind = (F.when(xml.rlike("(?s)<rss[\\s>]"), F.lit("rss"))
            .when(xml.rlike("(?s)<feed[\\s>]"), F.lit("atom")))

    def _blocks(tag: str) -> Column:
        # Linear block split (hostile-input bound): the old
        # ``<item...>.*?</item>`` find-all re-scanned to EOF from
        # every unclosed opener — O(openers x doc) on a crafted
        # pseudo-feed, minutes of JVM time per MB with no Python-side
        # isolation around it. Splitting on the literal closer is one
        # linear pass; each piece then yields the segment from its
        # first opener, which pairs openers to nearest closers exactly
        # like the lazy regex did on any well-formed feed. The piece
        # after the last closer is dropped (no closer == no match).
        pieces = F.split(xml, re.escape(f"</{tag}>"))
        pieces = F.slice(pieces, F.lit(1),
                         F.greatest(F.size(pieces) - 1, F.lit(0)))
        opener = f"(?s)<{tag}(?:\\s[^>]{{0,4096}})?>.*"
        found = F.transform(pieces, lambda p: F.regexp_extract(p, opener, 0))
        return F.filter(found, lambda b: b != "")

    blocks = F.when(kind == "rss", _blocks("item")).otherwise(_blocks("entry"))
    base = (df.select(F.col(url_col), kind.alias("kind"),
                      F.explode(blocks).alias("_b"))
            .where(F.col("kind").isNotNull()))
    b = F.col("_b")
    is_rss = F.col("kind") == "rss"
    atom_href = F.nullif(F.regexp_extract(
        b, "(?s)<link[^>]{0,4096}\\shref\\s*=\\s*\"([^\"]*)\"", 1),
        F.lit(""))  # attr cap bounds the [^>]*-then-\s backtrack
    return base.select(
        url_col, "kind",
        _xml_field(b, "title").alias("title"),
        F.when(is_rss, _xml_field(b, "link"))
         .otherwise(atom_href).alias("link"),
        F.when(is_rss, _xml_field(b, "pubDate"))
         .otherwise(_xml_field(b, "updated")).alias("published"),
        F.when(is_rss, _xml_field(b, "guid"))
         .otherwise(_xml_field(b, "id")).alias("guid"),
        F.when(is_rss, _xml_field(b, "description"))
         .otherwise(_xml_field(b, "summary")).alias("summary"),
    )


def _http_header(head: Column, name: str) -> Column:
    """First occurrence of ``name`` in a response head, value trimmed,
    NULL when absent or empty. Case-insensitive per RFC 9110; the
    multiline anchor keeps the pattern single-pass (no lazy dots).
    Deliberately NO trailing ``$``: the value class already stops at
    the line break, and RE2 (the DuckDB oracle engine) only matches a
    multiline ``$`` before ``\\n`` — on CRLF lines Java would accept
    where RE2 refuses, a silent engine divergence."""
    return F.nullif(F.trim(F.regexp_extract(
        head, f"(?im)^{name}[ \\t]*:[ \\t]*([^\\r\\n]*)", 1)), F.lit(""))


def parse_http_headers(
    df: DataFrame,
    head_col: str = "http_headers",
) -> DataFrame:
    """HTTP response head → typed columns — the status/content-type
    gate a crawl pipeline applies BEFORE any byte of parsing:

    ``status`` (int), ``reason``, ``content_type`` (media type only,
    lowercased), ``charset`` (from the Content-Type parameter,
    lowercased), ``content_length`` (bigint, NULL when non-numeric),
    ``content_language`` (first tag, lowercased), ``last_modified``
    (raw string — date parsing is a downstream transform, house
    rule), ``location``. Torn/non-HTTP rows yield all-NULL columns.

    Pure scan-side Catalyst projections (anchored single-pass
    regexes, no lazy dots, no Python), so it runs at scan speed at
    10^9-record scale; duplicate headers resolve to the FIRST
    occurrence (RFC 9110 singleton-field semantics). Anything after
    the first blank line is ignored (defense against body content
    spoofing header lines when callers pass head+body)."""
    head = F.split(F.col(head_col), "\\r?\\n\\r?\\n", 2).getItem(0)
    status = F.nullif(F.regexp_extract(
        head, "^HTTP/[0-9.]+[ \\t]+([0-9]{3})", 1), F.lit("")).try_cast("int")
    reason = F.nullif(F.trim(F.regexp_extract(
        head, "^HTTP/[0-9.]+[ \\t]+[0-9]{3}[ \\t]+([^\\r\\n]*)", 1)),
        F.lit(""))
    ct_raw = _http_header(head, "content-type")
    content_type = F.lower(F.trim(F.regexp_extract(ct_raw, "^([^;]*)", 1)))
    charset = F.lower(F.nullif(F.regexp_extract(
        ct_raw, "(?i)charset[ \\t]*=[ \\t]*\"?([A-Za-z0-9_.:-]+)", 1),
        F.lit("")))
    clen = _http_header(head, "content-length").try_cast("bigint")
    lang = F.lower(F.trim(F.regexp_extract(
        _http_header(head, "content-language"), "^([^,]*)", 1)))
    out_names = ("status", "reason", "content_type", "charset",
                 "content_length", "content_language", "last_modified",
                 "location")
    # parsed values take precedence over same-named input columns —
    # read_warc carries the WARC record header's content_type
    # ("application/http; msgtype=response"), which is not the page's
    base = df.drop(*[c for c in out_names
                     if c in df.columns and c != head_col])
    return base.select(
        "*",
        status.alias("status"),
        reason.alias("reason"),
        F.nullif(content_type, F.lit("")).alias("content_type"),
        charset.alias("charset"),
        clen.alias("content_length"),
        F.nullif(lang, F.lit("")).alias("content_language"),
        _http_header(head, "last-modified").alias("last_modified"),
        _http_header(head, "location").alias("location"),
    ).drop(head_col)
