"""Robots META tag tests (ops/robots.robots_meta, round 6)."""

import pytest


@pytest.fixture(scope="module")
def rows(spark):
    from goose_parser_spark.ops.robots import robots_meta
    pages = [
        ("none", "<html><head><title>x</title></head></html>"),
        ("ni", '<head><meta name="robots" content="noindex"></head>'),
        ("nf-rev", '<head><meta content="nofollow" name=robots></head>'),
        ("both", "<head><meta name='robots' content='NONE'></head>"),
        ("ok", '<head><meta name="robots" content="index, follow"></head>'),
        ("multi", '<head><meta name="robots" '
                  'content="noarchive, NOINDEX,nofollow"></head>'),
        ("other", '<head><meta name="description" content="noindex"></head>'),
        ("caps", '<head><META NAME="ROBOTS" CONTENT="NoIndex"></head>'),
    ]
    df = spark.createDataFrame(pages, ["url", "html"])
    return {r.url: r for r in robots_meta(df).collect()}


def test_absent_tag(rows):
    r = rows["none"]
    assert r.robots_content is None
    assert (r.noindex, r.nofollow) == (False, False)


def test_noindex(rows):
    assert (rows["ni"].noindex, rows["ni"].nofollow) == (True, False)


def test_content_before_name(rows):
    assert (rows["nf-rev"].noindex, rows["nf-rev"].nofollow) == (False, True)


def test_none_implies_both(rows):
    assert (rows["both"].noindex, rows["both"].nofollow) == (True, True)


def test_index_follow(rows):
    assert (rows["ok"].noindex, rows["ok"].nofollow) == (False, False)


def test_comma_separated_multi(rows):
    assert (rows["multi"].noindex, rows["multi"].nofollow) == (True, True)


def test_other_meta_not_matched(rows):
    assert rows["other"].robots_content is None


def test_case_insensitive(rows):
    assert rows["caps"].noindex is True
