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
