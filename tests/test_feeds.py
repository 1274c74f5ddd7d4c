"""RSS/Atom feed parsing tests (ops/crawl.feed_entries, round 6)."""

import pytest


@pytest.fixture(scope="module")
def feed_rows(spark):
    from goose_parser_spark.ops.crawl import feed_entries
    rss = """<?xml version="1.0"?>
<rss version="2.0"><channel><title>chan</title>
<item><title>T &amp; A</title><link>https://e.test/a</link>
<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate><guid>g1</guid>
<description><![CDATA[keep &amp; <b>literal</b>]]></description></item>
<item><title>  padded  </title></item>
</channel></rss>"""
    atom = """<feed xmlns="http://www.w3.org/2005/Atom"><title>af</title>
<entry><title>E &lt;1&gt;</title>
<link rel="alternate" href="https://e.test/e1"/>
<updated>2024-02-02T00:00:00Z</updated><id>i1</id>
<summary>s &quot;q&quot;</summary></entry>
</feed>"""
    plain = "<html><body>not a feed</body></html>"
    df = spark.createDataFrame(
        [("u-rss", rss), ("u-atom", atom), ("u-plain", plain)],
        ["url", "html"])
    rows = feed_entries(df).collect()
    return {u: [r for r in rows if r.url == u]
            for u in ("u-rss", "u-atom", "u-plain")}


def test_rss_items(feed_rows):
    rows = feed_rows["u-rss"]
    assert len(rows) == 2
    r0, r1 = rows
    assert r0.kind == "rss"
    assert r0.title == "T & A"                # entities decoded
    assert r0.link == "https://e.test/a"
    assert r0.published == "Mon, 01 Jan 2024 00:00:00 GMT"
    assert r0.guid == "g1"
    assert r0.summary == "keep &amp; <b>literal</b>"  # CDATA literal
    assert r1.title == "padded"               # trimmed
    assert (r1.link, r1.published, r1.guid, r1.summary) == (
        None, None, None, None)


def test_atom_entries(feed_rows):
    rows = feed_rows["u-atom"]
    assert len(rows) == 1
    r = rows[0]
    assert r.kind == "atom"
    assert r.title == "E <1>"
    assert r.link == "https://e.test/e1"       # from @href
    assert r.published == "2024-02-02T00:00:00Z"
    assert r.guid == "i1"
    assert r.summary == 's "q"'


def test_non_feed_yields_nothing(feed_rows):
    assert feed_rows["u-plain"] == []


def test_double_escaped_amp_single_pass(spark):
    # '&amp;lt;' must decode to the literal text '&lt;' (single-pass
    # semantics), never to '<'
    from goose_parser_spark.ops.crawl import feed_entries
    rss = ("<rss><channel><item><title>&amp;lt;x</title></item>"
           "</channel></rss>")
    r = feed_entries(spark.createDataFrame([("u", rss)],
                                           ["url", "html"])).collect()[0]
    assert r.title == "&lt;x"


def test_hostile_pseudo_feed_is_linear(spark):
    """A crafted pseudo-feed of unclosed openers drove the old lazy
    ``<item...>.*?</item>`` find-all to re-scan to EOF from every
    opener — O(openers x doc), minutes of un-isolatable JVM time per
    MB. The split-on-closer plan is one linear pass: 50k unclosed
    openers must yield zero rows in seconds, and a single well-formed
    item buried after them must still be found."""
    import time
    from goose_parser_spark.ops.crawl import feed_entries

    openers = "<rss><channel>" + "<item>" * 50_000
    cases = [
        ("u-unclosed", openers + "</channel></rss>", []),
        ("u-trailing", openers + "<title>t</title></item></channel></rss>",
         ["t"]),
        # attr region past the 4 KB hostile-input cap: opener ignored
        ("u-fat-attr", "<rss><item " + "a" * 5000 + "><title>x</title>"
         "</item></rss>", [None]),
    ]
    df = spark.createDataFrame([(u, x) for u, x, _ in cases],
                               ["url", "html"])
    t0 = time.time()
    rows = feed_entries(df).collect()
    elapsed = time.time() - t0
    by_url = {}
    for r in rows:
        by_url.setdefault(r.url, []).append(r.title)
    assert by_url.get("u-unclosed") is None
    assert by_url.get("u-trailing") == ["t"]
    # the fat-attr item still splits into a block (closer present) but
    # its opener is unmatchable, so the block is dropped entirely
    assert by_url.get("u-fat-attr") is None
    assert elapsed < 30, f"hostile feed took {elapsed:.1f}s"
