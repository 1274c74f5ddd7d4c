"""URL operators for crawl pipelines: host extraction, normalization,
registered-domain grouping.

All pure Catalyst expressions (regexp_extract / lower / rtrim —
whole-stage codegen), reproducible in the DuckDB oracle. These are the
keys every crawl-side groupBy/join uses (per-host budgets, domain-level
dedup, politeness partitioning), so they must be cheap and exactly
deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


def url_host(col: str | Column) -> Column:
    """Lower-cased hostname (no scheme/userinfo/port/path)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(c, _HOST_RE, 1))


def url_path(col: str | Column) -> Column:
    """Path component (leading '/', no query/fragment); '' if none."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1)


def url_normalize(col: str | Column) -> Column:
    """Canonical form for dedup keys: lower-cased scheme+host, default
    ports dropped, trailing slash trimmed from the path, fragment
    dropped, query kept (it is content-addressing for many sites)."""
    c = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = url_host(c)
    port = F.regexp_extract(c, _HOST_RE + r":(\d+)", 2)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = F.regexp_replace(url_path(c), "/+$", "")
    query = F.regexp_extract(c, r"\?([^#]*)", 1)
    return F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )


# A tiny frozen multi-label-suffix table; a real deployment ships the
# full public-suffix list the same way (a broadcast lookup).
_TWO_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tr", "com.ar",
)


def registered_domain(col: str | Column) -> Column:
    """eTLD+1-style registered domain from a url (frozen suffix table;
    the grouping key for domain-level dedup and politeness)."""
    host = url_host(col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    is_two_label = last2.isin(*_TWO_LABEL_SUFFIXES)
    last3 = F.concat_ws(".", F.element_at(parts, -3),
                        F.element_at(parts, -2), F.element_at(parts, -1))
    return (F.when(n <= 2, host)
             .when(is_two_label & (n >= 3), last3)
             .otherwise(last2))


def host_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Docs per host — the skew profile the salted bucketing defeats."""
    return (df.select(url_host(url_col).alias("host"))
            .groupBy("host").count()
            .orderBy(F.desc("count"), "host"))
