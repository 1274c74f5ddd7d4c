"""URL operators: host/path/normalize/registered-domain."""

import pytest
from pyspark.sql import functions as F

from goose_parser_spark.ops.urls import (
    host_stats, registered_domain, url_host, url_normalize, url_path,
)

CASES = [
    # url, host, path, normalized, domain
    ("https://WWW.Example.COM:443/a/b/?x=1#f",
     "www.example.com", "/a/b/", "https://www.example.com/a/b?x=1", "example.com"),
    ("http://news.site.co.uk:80/path/",
     "news.site.co.uk", "/path/", "http://news.site.co.uk/path", "site.co.uk"),
    ("http://sub.blog.org:8080/",
     "sub.blog.org", "/", "http://sub.blog.org:8080", "blog.org"),
    ("https://example.com.au/x#y",
     "example.com.au", "/x", "https://example.com.au/x", "example.com.au"),
    ("ftp://Files.Archive.net/data",
     "files.archive.net", "/data", "ftp://files.archive.net/data", "archive.net"),
    ("https://user:pw@secret.example.org/p",
     "secret.example.org", "/p", "https://secret.example.org/p", "example.org"),
    ("https://localhost/x", "localhost", "/x", "https://localhost/x", "localhost"),
    # expanded suffix table (VERDICT r01 #8): previously mis-grouped
    ("https://shop.example.com.sg/p",
     "shop.example.com.sg", "/p", "https://shop.example.com.sg/p",
     "example.com.sg"),
    ("http://blog.kiwi.co.nz/p",
     "blog.kiwi.co.nz", "/p", "http://blog.kiwi.co.nz/p", "kiwi.co.nz"),
    ("https://portal.gob.mx/x",
     "portal.gob.mx", "/x", "https://portal.gob.mx/x", "portal.gob.mx"),
    ("https://www.uni.ac.za/d",
     "www.uni.ac.za", "/d", "https://www.uni.ac.za/d", "uni.ac.za"),
    ("https://www.city.lg.jp/",
     "www.city.lg.jp", "/", "https://www.city.lg.jp", "city.lg.jp"),
    ("https://dept.gouv.fr/x",
     "dept.gouv.fr", "/x", "https://dept.gouv.fr/x", "dept.gouv.fr"),
    # host that IS a public suffix: degrades to the suffix itself
    ("https://co.uk/", "co.uk", "/", "https://co.uk", "co.uk"),
]


@pytest.mark.parametrize("url,host,path,norm,domain", CASES)
def test_url_ops(spark, url, host, path, norm, domain):
    df = spark.createDataFrame([(url,)], "url string")
    row = df.select(
        url_host("url").alias("h"), url_path("url").alias("p"),
        url_normalize("url").alias("n"), registered_domain("url").alias("d"),
    ).collect()[0]
    assert row["h"] == host
    assert row["p"] == path
    assert row["n"] == norm
    assert row["d"] == domain


def test_host_stats_orders_by_skew(spark):
    urls = [("https://big.test/a%d" % i,) for i in range(8)] + \
           [("https://small.test/b",)]
    df = spark.createDataFrame(urls, "url string")
    rows = host_stats(df).collect()
    assert (rows[0]["host"], rows[0]["count"]) == ("big.test", 8)


def test_url_ops_no_python(spark):
    df = spark.createDataFrame([("https://x.test/a",)], "url string")
    out = df.select(url_normalize("url"), registered_domain("url"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


PSL_CASES = [
    # (host, expected registered domain) through the broadcast-join
    # full-PSL path (wildcard / exception / geographic; VERDICT r02 #5)
    ("www.example.com", "example.com"),            # default rule
    ("news.site.co.uk", "site.co.uk"),             # normal 2-label
    ("shop.tours.ck", "shop.tours.ck"),            # *.ck wildcard
    ("a.shop.tours.ck", "shop.tours.ck"),          # *.ck, deeper host
    ("tours.ck", "tours.ck"),                      # host IS the suffix
    ("www.ck", "www.ck"),                          # !www.ck exception
    ("a.www.ck", "www.ck"),                        # exception, deeper
    ("foo.kawasaki.jp", "foo.kawasaki.jp"),        # *.kawasaki.jp: host IS suffix+0
    ("bar.foo.kawasaki.jp", "bar.foo.kawasaki.jp"),  # *.kawasaki.jp +1
    ("x.bar.foo.kawasaki.jp", "bar.foo.kawasaki.jp"),
    ("city.kawasaki.jp", "city.kawasaki.jp"),      # !city.kawasaki.jp
    ("web.city.kawasaki.jp", "city.kawasaki.jp"),
    ("pref.aichi.jp", "pref.aichi.jp"),            # prefecture normal
    ("blog.pref.aichi.jp", "pref.aichi.jp"),
    ("single", "single"),                          # bare host
]


def test_registered_domain_psl_cases(spark):
    from goose_parser_spark.ops.urls import registered_domain_psl
    rows = [(f"https://{h}/p", h, want) for h, want in PSL_CASES]
    df = spark.createDataFrame(rows, "url string, host string, want string")
    out = registered_domain_psl(df, "url").collect()
    for r in out:
        assert r["domain"] == r["want"], (r["host"], r["domain"], r["want"])


def test_registered_domain_psl_plan_is_broadcast_maponly(spark):
    """The rules side must broadcast (bounded by the PSL, not the
    corpus) and the pages side must not shuffle — map-only at 100 TB."""
    from goose_parser_spark.ops.urls import registered_domain_psl
    df = spark.createDataFrame([("https://a.co.uk/x",)], "url string")
    out = registered_domain_psl(df, "url")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_psl_agrees_with_literal_path_on_two_label_table(spark):
    """On hosts covered by the literal two-label table the join path
    must agree with the literal column exactly."""
    from goose_parser_spark.ops.urls import (
        _TWO_LABEL_SUFFIXES, registered_domain, registered_domain_psl)
    hosts = [f"www.site.{s}" for s in _TWO_LABEL_SUFFIXES[:60]]
    df = spark.createDataFrame([(f"https://{h}/",) for h in hosts],
                               "url string")
    lit_rows = df.select("url", registered_domain("url").alias("d")).collect()
    psl_rows = registered_domain_psl(df, "url").collect()
    lit = {r["url"]: r["d"] for r in lit_rows}
    psl = {r["url"]: r["domain"] for r in psl_rows}
    assert lit == psl


def test_resolve_href_forms(spark):
    from goose_parser_spark.ops.urls import resolve_href
    from pyspark.sql import functions as F
    cases = [
        ("https://a.com/dir/page", "https://b.org/x", "https://b.org/x"),
        ("https://a.com/dir/page", "//cdn.b.org/x", "https://cdn.b.org/x"),
        ("http://a.com/dir/page", "//cdn.b.org/x", "http://cdn.b.org/x"),
        ("https://a.com/dir/page", "/root/x", "https://a.com/root/x"),
        ("https://a.com/dir/page", "sib.html", "https://a.com/dir/sib.html"),
        ("https://a.com", "/x", "https://a.com/x"),
        # non-hierarchical schemes → NULL (not fetchable; ADVICE r03)
        ("https://a.com/dir/page", "mailto:a@b.c", None),
        ("https://a.com/dir/page", "javascript:void(0)", None),
        ("https://a.com/dir/page", "tel:+15551234", None),
        ("https://a.com/dir/page", "data:text/plain,hi", None),
        # fragment-/query-only refs resolve against the base (RFC 3986)
        ("https://a.com/dir/page#old", "#frag", "https://a.com/dir/page#frag"),
        ("https://a.com/dir/page?x=2", "?q=1", "https://a.com/dir/page?q=1"),
        ("https://a.com/dir/page#old", "", "https://a.com/dir/page"),
    ]
    df = spark.createDataFrame(cases, "base string, href string, want string")
    out = df.select(resolve_href(F.col("base"), F.col("href")).alias("got"),
                    "want").collect()
    for r in out:
        assert r["got"] == r["want"], (r["got"], r["want"])
