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


def test_interval_overlap_join_no_duplicates(spark):
    """A pair sharing MANY buckets appears exactly once (the
    first-shared-bucket predicate replaces DISTINCT), keyed by doc;
    non-overlapping and cross-doc pairs are excluded."""
    from evm_archive_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(0, 0, 100_000), (0, 200_000, 201_000), (1, 0, 100_000)],
        "doc_id long, l_lo long, l_hi long",
    )
    right = spark.createDataFrame(
        [(0, 50_000, 300_000), (1, 500_000, 600_000)],
        "doc_id long, r_lo long, r_hi long",
    )
    got = sorted(
        (r["doc_id"], r["l_lo"], r["r_lo"])
        for r in interval_overlap_join(
            left, right, "l_lo", "l_hi", "r_lo", "r_hi",
            1000, keys=["doc_id"],
        ).collect()
    )
    # the [0,100k]x[50k,300k] pair shares ~50 buckets -> ONE row
    assert got == [(0, 0, 50_000), (0, 200_000, 50_000)]


def test_align_cues_to_segments(spark):
    """Split segments sum their clipped overlaps; uncovered cues get
    zero; full coverage reads 1e6 ppm."""
    from evm_archive_spark.operators.subtitles import (
        align_cues_to_segments,
    )

    cues = spark.createDataFrame(
        [
            (0, 0, 1000, 5000),   # covered by two split segments
            (0, 1, 10_000, 12_000),  # uncovered
            (0, 2, 20_000, 21_000),  # fully inside one segment
        ],
        "doc_id long, cue_idx long, start_ms long, end_ms long",
    )
    segs = spark.createDataFrame(
        [(0, 0, 2000), (0, 3000, 4500), (0, 19_000, 30_000)],
        "doc_id long, seg_start_ms long, seg_end_ms long",
    )
    rows = {
        r["cue_idx"]: r
        for r in align_cues_to_segments(cues, segs, bucket_ms=2000)
        .collect()
    }
    assert rows[0]["overlap_ms"] == 1000 + 1500
    assert rows[0]["aligned_ppm"] == (2500 * 1_000_000) // 4000
    assert rows[1]["overlap_ms"] == 0 and rows[1]["aligned_ppm"] == 0
    assert rows[2]["overlap_ms"] == 1000
    assert rows[2]["aligned_ppm"] == 1_000_000


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


def test_ass_cues(spark):
    """ASS/SSA Dialogue-line parse: centisecond times, 10th-field
    text with commas, override blocks and linebreak literals."""
    import pandas as pd

    from evm_archive_spark.operators.subtitles import ass_cues

    ass = (
        "[Script Info]\nTitle: x\n\n[Events]\n"
        "Format: Layer, Start, End, Style, Name, MarginL, MarginR,"
        " MarginV, Effect, Text\n"
        "Dialogue: 0,0:00:01.50,0:00:03.20,Default,,0,0,0,,"
        "{\\i1}Hello{\\i0} there\\Nsecond, line\n"
        "Comment: 0,0:00:04.00,0:00:05.00,Default,,0,0,0,,not a cue\n"
        "Dialogue: 1,1:02:03.04,1:02:05.67,Alt,,0,0,0,fx,"
        "plain\\htext"
    )
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [ass, "no events"]}))
    rows = [tuple(r) for r in
            ass_cues(df).orderBy("doc_id", "cue_idx").collect()]
    assert rows == [
        (1, 0, 1500, 3200, "Hello there\nsecond, line"),
        (1, 1, 3723040, 3725670, "plain text"),
    ]
