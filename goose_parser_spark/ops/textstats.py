"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All pure Catalyst expressions (split / filter / size / md5 / crc32 —
whole-stage codegen, zero Python), so they run at scan speed and are
exactly reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language stopword tables for the n-gram/stopword-voting
# heuristic. Deliberately small and frozen: the oracle SQL embeds the
# same lists, so the two engines agree token-for-token.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "de": ("der", "die", "das", "und", "ist", "in", "den", "von", "zu", "mit"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
}


def _tokens(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: str | Column) -> Column:
    """Whitespace token count (the BPE-ish regex variant is
    :func:`subword_count`)."""
    return F.size(_tokens(col))


def subword_count(col: str | Column) -> Column:
    """BPE-ish proxy: count of letter-runs, digit-runs and punctuation
    marks — a deterministic upper-ish bound on BPE token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def stopword_hits(col: str | Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(_tokens(col), lambda w: w.isin(*words)))


def quality_score(col: str | Column, round_to: int = 6) -> Column:
    """Cheap quality heuristic in [0, 1]: blend of stopword ratio,
    mean token length band, and alpha ratio. Frozen formula — the
    DuckDB oracle reproduces it digit-for-digit (rounded)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = _tokens(c)
    n = F.size(toks)
    stop_ratio = stopword_hits(c, "en") / n
    mean_len = F.length(c) / n
    len_band = F.when((mean_len >= 3) & (mean_len <= 10), F.lit(1.0)) \
                .otherwise(F.lit(0.5))
    # empty text: 0/0 would be NULL (or an ANSI-mode error) — a defined
    # 0.0 alpha ratio keeps empty documents scored on both engines
    # (ADVICE r01; the DuckDB oracle carries the same CASE guard).
    alpha_ratio = F.when(
        F.length(c) > 0,
        F.length(F.regexp_replace(c, r"[^A-Za-z ]", "")) / F.length(c),
    ).otherwise(F.lit(0.0))
    return F.round(
        F.least(F.lit(1.0),
                stop_ratio * 2.0 * F.lit(0.4) + len_band * F.lit(0.3)
                + alpha_ratio * F.lit(0.3)),
        round_to)


def lang_id(col: str | Column) -> Column:
    """Stopword-voting language ID over the frozen tables; ``und``
    when nothing votes. Ties break in fixed order en>es>de>fr."""
    c = F.col(col) if isinstance(col, str) else col
    hits = {lang: stopword_hits(c, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.when((best > 0) & (hits["en"] == best), F.lit("en")) \
        .when((best > 0) & (hits["es"] == best), F.lit("es")) \
        .when((best > 0) & (hits["de"] == best), F.lit("de")) \
        .when((best > 0) & (hits["fr"] == best), F.lit("fr")) \
        .otherwise(F.lit("und"))
    return expr


def doc_fingerprint(col: str | Column) -> Column:
    """Deterministic document fingerprint: md5 hex of the text (the
    rolling-hash variant at scale is xxhash64 over shingles — see
    dedup.minhash_signature)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("binary"))


def text_stats(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """One-pass per-document stats frame: all expressions fuse into a
    single projection over the scan (one WholeStageCodegen span)."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(c).alias("n_tokens"),
        F.length(c).alias("n_chars"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        doc_fingerprint(c).alias("fingerprint"),
    )
