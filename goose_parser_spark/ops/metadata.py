"""Page-metadata extraction: title / canonical / OpenGraph /
meta-description / JSON-LD, as a canned rule tree over the extraction
engine.

This is the highest-frequency real-world extraction ask (article and
product metadata for corpus curation: canonical URLs feed dedup,
og:/JSON-LD typed data feeds quality and topic signals — all public
specs: ogp.me, schema.org, WHATWG link-rel). Expressing it as a rule
tree — not a bespoke parser — keeps the batched-Arrow path, the
selector engine, per-document poison isolation, and the lineage
columns identical to any user ruleset, and demonstrates attribute
selectors + ``attr`` extraction + array rules in one canned spec.

JSON-LD blocks come back as raw text (``<script>`` content is RAWTEXT
in the DOM layer); field probing stays JVM-side via
``get_json_object`` — no Python JSON parsing in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

METADATA_RULES: dict = {
    "collection": [
        {"name": "title", "scope": "head > title"},
        {"name": "canonical", "scope": 'link[rel="canonical"]',
         "attr": "href"},
        {"name": "description", "scope": 'meta[name="description"]',
         "attr": "content"},
        {"name": "og_title", "scope": 'meta[property="og:title"]',
         "attr": "content"},
        {"name": "og_type", "scope": 'meta[property="og:type"]',
         "attr": "content"},
        {"name": "og_image", "scope": 'meta[property="og:image"]',
         "attr": "content"},
        {"name": "og_url", "scope": 'meta[property="og:url"]',
         "attr": "content"},
        {"name": "jsonld", "scope": 'script[type="application/ld+json"]',
         "type": "array"},
    ],
}


def extract_page_metadata(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """One row per page: ``url, title, canonical, description,
    og_title, og_type, og_image, og_url, n_jsonld, jsonld_type,
    jsonld_name``.

    ``jsonld_type``/``jsonld_name`` probe the FIRST JSON-LD block's
    ``@type``/``name`` via ``get_json_object`` (NULL when absent or
    unparseable — crawl JSON-LD is frequently malformed, which must
    never fail the scan). Missing tags follow the engine's
    empty-match convention (``''``). Map-only end to end.
    """
    from goose_parser_spark.extractor import extract
    ex = extract(df, METADATA_RULES, html_col=html_col, url_col=url_col)
    m = F.col("extracted")
    first = F.col("_j0")
    return (ex
            .withColumn("_j0", F.try_element_at(m["jsonld"], F.lit(1)))
            .select(
                F.col(url_col),
                m["title"].alias("title"),
                m["canonical"].alias("canonical"),
                m["description"].alias("description"),
                m["og_title"].alias("og_title"),
                m["og_type"].alias("og_type"),
                m["og_image"].alias("og_image"),
                m["og_url"].alias("og_url"),
                F.size(m["jsonld"]).alias("n_jsonld"),
                F.get_json_object(first, "$['@type']").alias("jsonld_type"),
                F.get_json_object(first, "$['name']").alias("jsonld_name"),
            ))


IMGTEXT_RULES: dict = {
    "collection": [
        # captioned figures: the strongest alt-text pairs
        {"name": "figures", "scope": "figure", "collection": [[
            {"name": "src", "scope": "img", "attr": "src"},
            {"name": "alt", "scope": "img", "attr": "alt"},
            {"name": "caption", "scope": "figcaption"},
        ]]},
        # bare images elsewhere: alt text only
        {"name": "images", "scope": "img", "collection": [[
            {"name": "src", "scope": "", "attr": "src"},
            {"name": "alt", "scope": "", "attr": "alt"},
        ]]},
    ],
}


def extract_image_text_pairs(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """LAION-style image-text pair mining (public knowledge: web-scale
    image-caption corpora pair each ``<img>``'s URL with its alt text
    and any ``<figcaption>``): one row per image with the best
    available text.

    ``kind='figure'`` rows carry caption + alt from captioned
    figures; ``kind='img'`` rows are bare images (alt only) — figures'
    images also appear in the bare list, so consumers dedup by
    ``(url, src)`` keeping the figure row (``text`` preference:
    caption if non-empty else alt). Empty-src images are dropped;
    empty text is preserved (downstream filters decide).

    Map-only: one extraction pass, two ``inline`` explodes.
    Columns: ``url, kind, src, alt, caption, text``.
    """
    from goose_parser_spark.extractor import extract
    ex = extract(df, IMGTEXT_RULES, html_col=html_col, url_col=url_col)
    figs = (ex.select(F.col(url_col), F.lit("figure").alias("kind"),
                      F.inline("extracted.figures"))
            .where(F.col("src") != ""))
    imgs = (ex.select(F.col(url_col), F.lit("img").alias("kind"),
                      F.inline("extracted.images"))
            .where(F.col("src") != "")
            .withColumn("caption", F.lit("")))
    both = figs.unionByName(imgs)
    text = F.when(F.trim(F.col("caption")) != "", F.col("caption")) \
            .otherwise(F.col("alt"))
    return both.withColumn("text", text)
