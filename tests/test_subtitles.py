"""Subtitle parsing tests: real SRT and WebVTT shapes — CRLF, hourless
VTT times, cue ids, NOTE blocks, markup tags, stats."""

from __future__ import annotations

from evm_archive_spark.operators import subtitles


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


SRT = (
    "1\r\n"
    "00:00:01,000 --> 00:00:04,000\r\n"
    "first cue line one\r\n"
    "and line two\r\n"
    "\r\n"
    "2\r\n"
    "01:00:00,250 --> 01:00:02,500\r\n"
    "<i>styled</i> text\r\n"
)

VTT = (
    "WEBVTT\n"
    "\n"
    "NOTE this block is metadata\n"
    "\n"
    "intro-cue-id\n"
    "00:05.000 --> 00:07.040\n"
    "<c.yellow>colored</c> words\n"
    "\n"
    "02:10.500 --> 02:12.000\n"
    "tail cue\n"
)


def test_srt_cues(spark):
    rows = sorted(
        (r["cue_idx"], r["start_ms"], r["end_ms"], r["text"])
        for r in subtitles.subtitle_cues(_df(spark, [(0, SRT)])).collect()
    )
    assert rows == [
        (0, 1000, 4000, "first cue line one\nand line two"),
        (1, 3_600_000 + 250, 3_600_000 + 2500, "styled text"),
    ]


def test_vtt_cues_and_skipped_blocks(spark):
    rows = sorted(
        (r["cue_idx"], r["start_ms"], r["end_ms"], r["text"])
        for r in subtitles.subtitle_cues(_df(spark, [(0, VTT)])).collect()
    )
    # hourless times, NOTE/WEBVTT blocks skipped, cue-id line skipped
    assert rows == [
        (0, 5000, 7040, "colored words"),
        (1, 130_500, 132_000, "tail cue"),
    ]


def test_subtitle_stats_and_degenerates(spark):
    df = _df(spark, [(0, SRT), (1, "no cues here at all"), (2, None)])
    cues = subtitles.subtitle_cues(df)
    stats = {
        r["doc_id"]: r for r in subtitles.subtitle_stats(cues).collect()
    }
    assert list(stats) == [0]
    s = stats[0]
    assert s["n_cues"] == 2
    assert s["covered_ms"] == 3000 + 2250
    assert s["span_ms"] == (3_600_000 + 2500) - 1000
    assert s["n_chars"] == len("first cue line one\nand line two") + len(
        "styled text"
    )
