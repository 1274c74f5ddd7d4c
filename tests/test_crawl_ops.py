"""Crawl-layer operators: sitemap parsing (through the extraction
engine), CDXJ index-line parsing, anchor-text aggregation."""

from pyspark.sql import functions as F


def test_sitemap_urlset_and_index(spark):
    from goose_parser_spark.ops.crawl import sitemap_urls
    sm = ('<?xml version="1.0" encoding="UTF-8"?>'
          '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
          '<url><loc>https://ex.test/a</loc><lastmod>2024-01-01</lastmod>'
          '<changefreq>daily</changefreq><priority>0.8</priority></url>'
          '<url><loc>https://ex.test/b</loc></url></urlset>')
    idx = ('<?xml version="1.0"?><sitemapindex><sitemap>'
           '<loc>https://ex.test/sitemap1.xml</loc>'
           '<lastmod>2024-02-02</lastmod></sitemap></sitemapindex>')
    df = spark.createDataFrame(
        [("https://ex.test/sitemap.xml", sm),
         ("https://ex.test/sitemap_index.xml", idx)], ["url", "html"])
    out = sitemap_urls(df).orderBy("url", "loc").collect()
    assert len(out) == 3
    assert out[0]["loc"] == "https://ex.test/a"
    assert out[0]["lastmod"] == "2024-01-01"
    assert out[0]["priority"] == "0.8"
    # optional tags absent -> empty-match convention ('')
    assert out[1]["loc"] == "https://ex.test/b" and out[1]["lastmod"] == ""
    assert out[2]["kind"] == "sitemap"
    assert out[2]["loc"] == "https://ex.test/sitemap1.xml"


def test_sitemap_poison_doc_yields_no_rows_not_failure(spark):
    from goose_parser_spark.ops.crawl import sitemap_urls
    df = spark.createDataFrame(
        [("https://ex.test/s.xml",
          '<urlset><url><loc>https://ex.test/ok</loc></url></urlset>'),
         ("https://ex.test/empty.xml", "plain text, no sitemap tags")],
        ["url", "html"])
    out = sitemap_urls(df).collect()
    assert [r["loc"] for r in out] == ["https://ex.test/ok"]


def test_parse_cdx_typed_fields_and_torn_lines(spark):
    from goose_parser_spark.ops.crawl import parse_cdx
    lines = [
        ('org,example)/ 20240101120000 {"url": "https://example.org/", '
         '"mime": "text/html", "status": "200", "digest": "AAA", '
         '"length": "1234", "offset": "567", '
         '"filename": "crawl-00.warc.gz"}',),
        ("torn 1234 notjson",),
    ]
    out = parse_cdx(spark.createDataFrame(lines, ["line"])).collect()
    ok, torn = out
    assert ok["urlkey"] == "org,example)/"
    assert str(ok["ts"]).startswith("2024-01-01 12:00:00")
    assert ok["status"] == 200 and ok["length"] == 1234
    assert ok["offset"] == 567 and ok["filename"] == "crawl-00.warc.gz"
    assert torn["ts"] is None and torn["url"] is None
    assert torn["urlkey"] == "torn"  # row survives, fields NULL


def test_parse_cdx_short_lines_and_unparsable_numerics(spark):
    """ANSI-mode safety: lines with FEWER than 3 space-separated
    fields must degrade to NULL columns (F.get, not bare array
    indexing, which raises INVALID_ARRAY_INDEX under Spark 4 ANSI),
    and non-numeric status/length/offset (CDX revisit records carry
    status '-') must try_cast to NULL, not throw."""
    from goose_parser_spark.ops.crawl import parse_cdx
    lines = [
        ("justonefield",),
        ("two fields",),
        ("",),
        ('org,example)/ 20240101120000 {"url": "https://example.org/", '
         '"status": "-", "length": "n/a", "offset": "-"}',),
    ]
    out = parse_cdx(spark.createDataFrame(lines, ["line"])).collect()
    one, two, empty, revisit = out
    assert one["urlkey"] == "justonefield"
    assert one["ts"] is None and one["url"] is None
    assert two["urlkey"] == "two" and two["url"] is None
    assert empty["url"] is None and empty["status"] is None
    assert revisit["url"] == "https://example.org/"
    assert revisit["status"] is None          # '-' -> NULL, no throw
    assert revisit["length"] is None and revisit["offset"] is None


def test_schedule_frontier_fractional_delay_rounds(spark):
    """crawl_delay=0.3 → 300 ms per slot: the double product lands at
    299.999... for slot 1; the offset must round (not truncate)."""
    from goose_parser_spark.ops.crawl import schedule_frontier
    fr = spark.createDataFrame(
        [(f"https://f.test/{i}", "f.test", 0) for i in range(4)],
        "url string, host string, priority int")
    dl = spark.createDataFrame([("f.test", 0.3)],
                               "host string, crawl_delay double")
    out = {r["url"]: r["start_offset_ms"]
           for r in schedule_frontier(fr, dl).collect()}
    assert out["https://f.test/0"] == 0
    assert out["https://f.test/1"] == 300
    assert out["https://f.test/2"] == 600
    assert out["https://f.test/3"] == 900


def test_anchor_text_stats_dedup_sort_cap_and_blanks(spark):
    from goose_parser_spark.ops.linkgraph import anchor_text_stats
    links = [("p1", "t", "b"), ("p1", "t", "a"), ("p2", "t", "a"),
             ("p2", "t", "  "), ("p3", "t", "c"), ("p3", "t", "d"),
             ("p3", "t", "e"), ("p3", "t", "f"), ("p4", "u", " ")]
    out = {r["target"]: r for r in anchor_text_stats(
        spark.createDataFrame(links, ["src", "target", "anchor"]),
        top_k=5).collect()}
    t = out["t"]
    assert t["n_links"] == 8 and t["n_src_pages"] == 3
    # distinct, sorted, capped at 5, blanks excluded
    assert t["top_anchors"] == "a | b | c | d | e"
    assert out["u"]["top_anchors"] == "" and out["u"]["n_links"] == 1


def test_schedule_frontier_slots_and_delays(spark):
    from goose_parser_spark.ops.crawl import schedule_frontier
    fr = spark.createDataFrame(
        [("https://a.test/1", "a.test", 5),
         ("https://a.test/2", "a.test", 9),
         ("https://a.test/3", "a.test", 9),   # tie -> url order
         ("https://b.test/x", "b.test", 1)],
        "url string, host string, priority int")
    dl = spark.createDataFrame([("a.test", 2.5), ("c.test", 9.0)],
                               "host string, crawl_delay double")
    out = {r["url"]: r
           for r in schedule_frontier(fr, dl,
                                      priority_col="priority").collect()}
    assert out["https://a.test/2"]["fetch_slot"] == 0
    assert out["https://a.test/3"]["fetch_slot"] == 1   # tie by url asc
    assert out["https://a.test/1"]["fetch_slot"] == 2
    assert out["https://a.test/1"]["start_offset_ms"] == 5000
    # unknown host: default 1s delay, own slot sequence
    assert out["https://b.test/x"]["fetch_slot"] == 0
    assert out["https://b.test/x"]["start_offset_ms"] == 0


def test_snapshot_diff_null_bodies_never_add_or_gone(spark):
    """A url present in BOTH snapshots classifies changed/unchanged
    even when a body is NULL (failed capture): NULL-vs-text is
    changed, NULL-vs-NULL unchanged."""
    from goose_parser_spark.ops.crawl import snapshot_diff
    old = spark.createDataFrame(
        [("u/a", None), ("u/b", None), ("u/c", "x")],
        "url string, text string")
    new = spark.createDataFrame(
        [("u/a", "now has text"), ("u/b", None), ("u/c", None)],
        "url string, text string")
    out = {r["url"]: r["status"]
           for r in snapshot_diff(old, new).collect()}
    assert out == {"u/a": "changed", "u/b": "unchanged",
                   "u/c": "changed"}


def test_parse_http_headers_shapes(spark):
    """Edge shapes beyond the oracle corpus: header folding absent,
    spoofed header in the body ignored, first-wins duplicates, CR-only
    values trimmed, torn rows all-NULL."""
    from goose_parser_spark.ops.crawl import parse_http_headers
    heads = [
        ("full", "HTTP/1.1 200 OK\r\n"
         "Content-Type: Text/HTML; charset=UTF-8\r\n"
         "Content-Length: 123\r\n"
         "Content-Language: en-US, fr\r\n"
         "Last-Modified: Mon, 01 Jan 2024 00:00:00 GMT\r\n"
         "\r\n"
         "Content-Type: image/png\r\nbody"),
        ("dup", "HTTP/1.0 404 Not Found\nContent-Type: a/b\n"
         "content-type: c/d\nContent-Length: nope\n"),
        ("redir", "HTTP/1.1 301 Moved Permanently\r\n"
         "Location: https://x.test/\r\n"),
        ("torn", "not http at all"),
        ("nohdrs", "HTTP/1.1 204 No Content\r\n"),
    ]
    df = spark.createDataFrame(heads, ["k", "http_headers"])
    rows = {r.k: r for r in parse_http_headers(df).collect()}
    full = rows["full"]
    assert (full.status, full.reason) == (200, "OK")
    assert full.content_type == "text/html"      # params stripped, lower
    assert full.charset == "utf-8"
    assert full.content_length == 123
    assert full.content_language == "en-us"      # first tag only
    assert full.last_modified == "Mon, 01 Jan 2024 00:00:00 GMT"
    dup = rows["dup"]
    assert dup.status == 404 and dup.reason == "Not Found"
    assert dup.content_type == "a/b"             # FIRST occurrence wins
    assert dup.content_length is None            # non-numeric -> NULL
    assert rows["redir"].location == "https://x.test/"
    torn = rows["torn"]
    assert all(torn[c] is None for c in (
        "status", "reason", "content_type", "charset", "content_length",
        "content_language", "last_modified", "location"))
    assert rows["nohdrs"].status == 204
    assert rows["nohdrs"].content_type is None


def test_read_warc_keep_http_headers_feeds_parser(spark, tmp_path):
    """read_warc(keep_http_headers=True) → parse_http_headers: the
    status/content-type gate composes with the WARC source in one
    pass (head column ridden along, body still stripped)."""
    from goose_parser_spark.ops.crawl import parse_http_headers
    from goose_parser_spark.sources.warc import read_warc, write_warc_bytes
    recs = [
        # http=False: these payloads carry their own HTTP envelope
        # (write_warc_bytes would otherwise wrap them in a second one)
        {"url": "http://a.test/", "warc_ts": "2024-01-01T00:00:00Z",
         "record_type": "response", "http": False,
         "payload": b"HTTP/1.1 200 OK\r\n"
                    b"Content-Type: text/html; charset=utf-8\r\n\r\n"
                    b"<p>hi"},
        {"url": "http://b.test/", "warc_ts": "2024-01-01T00:00:01Z",
         "record_type": "response", "http": False,
         "payload": b"HTTP/1.1 404 Not Found\r\n\r\ngone"},
    ]
    p = tmp_path / "t.warc.gz"
    p.write_bytes(write_warc_bytes(recs))
    df = read_warc(spark, str(tmp_path), keep_http_headers=True)
    out = {r.url: r for r in parse_http_headers(df).collect()}
    assert out["http://a.test/"].status == 200
    assert out["http://a.test/"].content_type == "text/html"
    assert out["http://a.test/"].charset == "utf-8"
    assert bytes(out["http://a.test/"].html) == b"<p>hi"
    assert out["http://b.test/"].status == 404
    assert out["http://b.test/"].content_type is None


def test_http_body_transfer_and_content_codings():
    """Chunked framing and gzip/deflate content codings are undone
    (bounded, best-effort); malformed framing and bombs keep the raw
    bytes; truncated captures keep what arrived."""
    import gzip as _gzip
    import zlib as _zlib
    from goose_parser_spark.sources.warc import decode_http_body

    def chunked(*chunks: bytes) -> bytes:
        out = b"".join(b"%x\r\n" % len(c) + c + b"\r\n" for c in chunks)
        return out + b"0\r\n\r\n"

    te = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked"
    assert decode_http_body(te, chunked(b"<p>", b"hi")) == b"<p>hi"
    # chunk extension + trailer tolerated
    ext = b"3;name=v\r\n<p>\r\n0\r\nX-T: 1\r\n\r\n"
    assert decode_http_body(te, ext) == b"<p>"
    # truncated capture: keep what arrived of the last chunk
    trunc = b"a\r\n12345"
    assert decode_http_body(te, trunc) == b"12345"
    # malformed size line: raw bytes kept
    bad = b"zz\r\nxxxx"
    assert decode_http_body(te, bad) == bad

    gz = "HTTP/1.1 200 OK\r\nContent-Encoding: gzip"
    assert decode_http_body(gz, _gzip.compress(b"<p>zip")) == b"<p>zip"
    # non-gzip bytes under a gzip label: kept as-is
    assert decode_http_body(gz, b"plain") == b"plain"
    df = "HTTP/1.1 200 OK\r\nContent-Encoding: deflate"
    assert decode_http_body(df, _zlib.compress(b"d1")) == b"d1"  # zlib
    raw = _zlib.compressobj(wbits=-15)
    assert decode_http_body(
        df, raw.compress(b"d2") + raw.flush()) == b"d2"  # raw deflate
    # both codings stacked: chunked framing around a gzip body
    both = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
            "Content-Encoding: gzip")
    assert decode_http_body(both, chunked(_gzip.compress(b"x"))) == b"x"
    # bomb: 256 MB of zeros stays compressed rather than inflating
    bomb = _gzip.compress(b"\x00" * (256 * 1024 * 1024))
    assert decode_http_body(gz, bomb) == bomb
    # brotli: decoded for real since session 5 (ops/brotlicodec.py);
    # 8b 00 80 'h' 'i' 03 is the uncompressed-metablock encoding
    br = "HTTP/1.1 200 OK\r\nContent-Encoding: br"
    assert decode_http_body(br, b"\x8b\x00\x80hi\x03") == b"hi"
    # malformed brotli keeps the raw bytes (best-effort contract)
    assert decode_http_body(br, b"\x0b\x02\x80hi") == b"\x0b\x02\x80hi"


def test_dechunk_accepts_long_chunk_extensions():
    """RFC 7230 chunk extensions can legitimately exceed a few bytes
    (';signature=<hex>' style); the size-line search window must not
    reject them (an 18-byte window did)."""
    from goose_parser_spark.sources.warc import decode_http_body
    te = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked"
    ext = b";signature=abcdef0123456789abcdef0123456789"
    body = b"5" + ext + b"\r\nhello\r\n0\r\n\r\n"
    assert decode_http_body(te, body) == b"hello"
    # but a 'size line' past the 4 KB frame bound is not chunked data
    junk = b"5" + b";x" * 3000 + b"hello"
    assert decode_http_body(te, junk) == junk
