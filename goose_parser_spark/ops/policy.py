"""Policy filtering: blocklist-driven document exclusion.

The C4/RefinedWeb-style compliance stage (public knowledge: Raffel et
al. 2020 filtered C4 against a public "bad words" list; production web
pipelines additionally drop whole domains from curated blocklists such
as UT1). Kept separate from quality scoring — policy drops are
categorical (the document is excluded whatever its quality), and
pipelines need the REASON for audit.

Scale shape: the badword list compiles to ONE case-insensitive
word-boundary regex evaluated in a scan-level codegen projection (the
list is bounded configuration, not data); the domain blocklist is a
bounded table joined on the host key — AQE broadcasts it. The corpus
is never shuffled by this op.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

from goose_parser_spark.ops.urls import url_host


def badwords_pattern(words: list[str]) -> str:
    """One RE2-compatible case-insensitive alternation with word
    boundaries. Words are regex-escaped — the list is data, not
    patterns. Longest-first ordering so overlapping entries ("bad",
    "badge") match deterministically in both engines."""
    if not words:
        raise ValueError("badwords list must be non-empty")
    escaped = sorted((re.escape(w.lower()) for w in words),
                     key=len, reverse=True)
    return r"(?i)\b(" + "|".join(escaped) + r")\b"


def policy_filter(
    df: DataFrame,
    badwords: list[str],
    blocked_hosts: DataFrame | None = None,
    text_col: str = "text",
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag documents violating content policy.

    ``blocked_hosts``: a bounded ``(host)`` table (e.g. a UT1-style
    category export keyed however the deployment canonicalizes hosts).
    Reason precedence is fixed — ``blocked_domain`` wins over
    ``badword`` — so the output is deterministic when both trip.

    Columns: ``doc_id, keep (bool), reason (string, NULL when kept)``.
    """
    pat = badwords_pattern(badwords)
    host = url_host(F.col(url_col))
    out = df.select(F.col(id_col), F.col(text_col).alias("_t"),
                    host.alias("_h"))
    if blocked_hosts is not None:
        b = blocked_hosts.select(F.col("host").alias("_h"),
                                 F.lit(True).alias("_blocked"))
        out = out.join(b, on="_h", how="left")
    else:
        out = out.withColumn("_blocked", F.lit(None).cast("boolean"))
    reason = (F.when(F.col("_blocked"), F.lit("blocked_domain"))
              .when(F.col("_t").rlike(pat), F.lit("badword")))
    return out.select(F.col(id_col), reason.isNull().alias("keep"),
                      reason.alias("reason"))
