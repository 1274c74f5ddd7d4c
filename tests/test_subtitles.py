"""SRT / WebVTT cue parsing (ops/subtitles.py) — pure Catalyst."""
from __future__ import annotations

SRT = """1
00:00:01,000 --> 00:00:03,500
Hello there.

2
00:00:04,000 --> 00:00:06,250
Second line
continues here.
"""

VTT = """WEBVTT - some header text

NOTE
this block is a comment

style-cue-id
00:09.000 --> 00:11.000 align:start position:10%
<c.yellow>Styled</c> and <i>italic</i> text
with <00:00:10.000>karaoke tags

1:00:00.000 --> 1:00:02.000
Hour field present.
"""


def test_srt_cues(spark):
    from goose_parser_spark.ops.subtitles import subtitle_cues
    df = spark.createDataFrame([(1, SRT)], "doc_id long, subs string")
    rows = sorted(subtitle_cues(df).collect(), key=lambda r: r.cue_no)
    assert [(r.start_ms, r.end_ms, r.text) for r in rows] == [
        (1000, 3500, "Hello there."),
        (4000, 6250, "Second line\ncontinues here."),
    ]


def test_vtt_cues_markup_and_settings(spark):
    from goose_parser_spark.ops.subtitles import subtitle_cues
    df = spark.createDataFrame([(1, VTT)], "doc_id long, subs string")
    rows = sorted(subtitle_cues(df).collect(), key=lambda r: r.cue_no)
    assert len(rows) == 2
    assert rows[0].start_ms == 9000 and rows[0].end_ms == 11000
    assert rows[0].text == ("Styled and italic text\n"
                            "with karaoke tags")
    assert rows[1].start_ms == 3600000
    assert rows[1].text == "Hour field present."


def test_no_cues_yields_nothing(spark):
    from goose_parser_spark.ops.subtitles import subtitle_cues
    df = spark.createDataFrame(
        [(1, "WEBVTT\n\nNOTE nothing here"), (2, "plain prose")],
        "doc_id long, subs string")
    assert subtitle_cues(df).count() == 0


def test_zero_python_plan(spark):
    from goose_parser_spark.ops.subtitles import subtitle_cues
    df = spark.createDataFrame([(1, SRT)], "doc_id long, subs string")
    plan = subtitle_cues(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
