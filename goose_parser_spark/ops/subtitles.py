"""Subtitle / caption parsing (SRT + WebVTT) — pure Catalyst.

Subtitle tracks are the text side of video corpora (speech-aligned
prose, the backbone of ASR and video-grounded datasets). Both
mainstream formats are line-oriented text, so the whole parse is
Catalyst: block split + posexplode + regexp extraction — no Python,
fully replayable by the SQL oracle, codegen end to end.

Handled per the public format definitions:
- SRT: numbered cue blocks, ``HH:MM:SS,mmm --> HH:MM:SS,mmm``
  timestamps (comma decimal), blank-line separated
- WebVTT: the ``WEBVTT`` header, ``NOTE``/``STYLE``/``REGION``
  blocks skipped, optional cue identifiers, dot-decimal timestamps
  with optional cue settings after the arrow, and inline markup
  (``<c.class>``, ``<i>``, ``<00:00:01.000>`` karaoke tags)
  stripped from the cue text

Output: one row per cue — ``(id, cue_no, start_ms, end_ms, text)``.
``cue_no`` is the RAW blank-line-block index within the document, not
a per-cue ordinal (ADVICE r6): WEBVTT headers and NOTE/STYLE blocks
consume indices before the timestamp filter drops them, so cue
numbering is neither 0-based nor contiguous — it is a stable join key
back into the source, which is what downstream ops use it for.
Blocks without a valid timestamp line yield no row (headers, notes,
stray numbering); a document with no cues at all yields nothing —
callers anti-join for the poison set.
"""
from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

__all__ = ["subtitle_cues", "TS_RE"]

# one timestamp: HH:MM:SS,mmm or HH:MM:SS.mmm or MM:SS.mmm (VTT
# allows dropping the hour field)
_T = r"(?:(\d{1,2}):)?(\d{1,2}):(\d{2})[.,](\d{3})"
TS_RE = rf"{_T}\s*-->\s*{_T}"


def _ms(h: F.Column, m: F.Column, s: F.Column,
        ms: F.Column) -> F.Column:
    hh = F.when(h == "", F.lit(0)).otherwise(h.cast("long"))
    return (hh * 3600000 + m.cast("long") * 60000
            + s.cast("long") * 1000 + ms.cast("long"))


def subtitle_cues(df: "DataFrame", text_col: str = "subs",
                  id_col: str = "doc_id") -> "DataFrame":
    """One row per subtitle cue; module docstring for the format
    scope. 100-TB shape: zero Python, one generator + codegen'd
    projections, no shuffle."""
    norm = F.regexp_replace(F.col(text_col), r"\r\n?", "\n")
    blocks = F.split(norm, r"\n\s*\n")
    b = (df.select(id_col, F.posexplode(blocks)
                   .alias("cue_no", "block"))
         .where(F.col("block").rlike(TS_RE)))
    blk = F.col("block")
    g = [F.regexp_extract(blk, TS_RE, i) for i in range(9)]
    start = _ms(g[1], g[2], g[3], g[4])
    end = _ms(g[5], g[6], g[7], g[8])
    # cue text: everything after the timestamp line (the arrow line
    # also carries optional VTT cue settings — drop the whole line)
    text = F.regexp_replace(blk, r"(?s)^.*?-->[^\n]*\n?", "")
    text = F.regexp_replace(text, r"<[^<>]*>", "")  # inline markup
    # trim() strips spaces only — cue text needs newline trimming too
    text = F.regexp_replace(text, r"(?s)^\s+|\s+$", "")
    return (b.select(id_col, "cue_no",
                     start.alias("start_ms"), end.alias("end_ms"),
                     text.alias("text"))
            .where(F.col("text") != ""))
