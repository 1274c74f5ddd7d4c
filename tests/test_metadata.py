"""Page-metadata extraction (title/canonical/OpenGraph/JSON-LD)."""


def test_extract_page_metadata_full_and_edge_cases(spark):
    from goose_parser_spark.ops.metadata import extract_page_metadata
    html = (
        "<html><head><title>My Page</title>"
        '<link rel="canonical" href="https://ex.test/canon">'
        '<meta name="description" content="A page about things">'
        '<meta property="og:title" content="OG My Page">'
        '<meta property="og:type" content="article">'
        '<script type="application/ld+json">'
        '{"@context": "https://schema.org", "@type": "Article", '
        '"name": "My Article"}</script>'
        '<script type="application/ld+json">{"@type": "Breadcrumb"}'
        "</script></head><body><p>body</p></body></html>")
    bare = "<html><head></head><body>no meta</body></html>"
    broken = ('<html><head><script type="application/ld+json">{not json'
              "</script></head></html>")
    df = spark.createDataFrame(
        [("u1", html), ("u2", bare), ("u3", broken)], ["url", "html"])
    out = {r["url"]: r for r in extract_page_metadata(df).collect()}

    r = out["u1"]
    assert r["title"] == "My Page"
    assert r["canonical"] == "https://ex.test/canon"
    assert r["description"] == "A page about things"
    assert r["og_title"] == "OG My Page" and r["og_type"] == "article"
    assert r["og_url"] == ""  # absent tag -> empty-match convention
    assert r["n_jsonld"] == 2
    # probe reads the FIRST block only
    assert r["jsonld_type"] == "Article"
    assert r["jsonld_name"] == "My Article"

    assert out["u2"]["title"] == ""
    assert out["u2"]["n_jsonld"] == 0
    assert out["u2"]["jsonld_type"] is None

    # malformed JSON-LD: block counted, probe NULL, no job failure
    assert out["u3"]["n_jsonld"] == 1
    assert out["u3"]["jsonld_type"] is None


def test_extract_image_text_pairs(spark):
    from goose_parser_spark.ops.metadata import extract_image_text_pairs
    html = ('<html><body>'
            '<figure><img src="/a.jpg" alt="an apple">'
            '<figcaption>A ripe apple on a table</figcaption></figure>'
            '<p><img src="/b.png" alt="a banana"></p>'
            '<img alt="no src here">'
            '</body></html>')
    df = spark.createDataFrame([("u1", html)], ["url", "html"])
    rows = extract_image_text_pairs(df).collect()
    figs = [r for r in rows if r["kind"] == "figure"]
    imgs = [r for r in rows if r["kind"] == "img"]
    assert len(figs) == 1
    assert figs[0]["src"] == "/a.jpg"
    # caption preferred over alt for the text column
    assert figs[0]["text"] == "A ripe apple on a table"
    assert figs[0]["alt"] == "an apple"
    # bare list includes the figure's img too (consumers dedup by src)
    assert sorted(r["src"] for r in imgs) == ["/a.jpg", "/b.png"]
    b = next(r for r in imgs if r["src"] == "/b.png")
    assert b["text"] == "a banana" and b["caption"] == ""
    # src-less images are dropped entirely
    assert all(r["src"] for r in rows)
