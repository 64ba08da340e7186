"""Subtitle parsing (SRT + WebVTT + ASS/SSA) as pure JVM expressions.

Subtitles are the text half of a video training corpus (caption
alignment, ASR supervision, frame-text pairing against
``multimodal.frame_sample``).  Both formats are line-oriented blocks:

    [index or cue-id]               (SRT: number; VTT: optional)
    HH:MM:SS,mmm --> HH:MM:SS,mmm   (VTT uses '.', hours optional)
    text lines...                    (until a blank line)

The parse is one split + explode + per-block regexps — no Python, no
UDF; cue times land as exact BIGINT milliseconds (the float-free
convention), ready for range joins against VAD/frame timelines.

Scale shape: map-side until the one per-document row_number window
that renumbers kept cues (bounded by cues-per-file, not corpus)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TIME_RE = r"(?:(\d+):)?(\d+):(\d+)[.,](\d+)"
_ARROW_RE = r"-->"


def _ms(block_col, group_base: int):
    """Milliseconds from the (optional-hours) time at group_base in
    the block's arrow line."""
    line = F.regexp_extract(
        block_col, r"([^\n]*-->[^\n]*)", 1
    )
    pat = _TIME_RE + r"\s*-->\s*" + _TIME_RE
    g = lambda i: F.regexp_extract(line, pat, i)  # noqa: E731
    h, m, s, ms = (g(group_base + k) for k in range(4))
    return (
        F.coalesce(F.nullif(h, F.lit("")), F.lit("0")).cast("long")
        * 3_600_000
        + m.cast("long") * 60_000
        + s.cast("long") * 1_000
        + F.rpad(ms, 3, "0").cast("long")
    )


def subtitle_cues(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """SRT/VTT payload -> one row per cue: ``(id, cue_idx, start_ms,
    end_ms, text)``.  Blocks without a ``-->`` line (the WEBVTT
    header, NOTE/STYLE blocks, stray numbers) are skipped; the cue
    text is everything after the arrow line with SRT/VTT markup tags
    (``<i>``, ``<c.class>``) dropped."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    blocks = F.split(F.regexp_replace(t, "\r\n?", "\n"), "\n\n+")
    b = df.select(
        F.col(id_col), F.posexplode(blocks).alias("__bi", "__blk")
    ).filter(F.col("__blk").rlike(_ARROW_RE))
    body = F.regexp_replace(
        F.col("__blk"),
        r"(?s)\A(?:(?![^\n]*-->)[^\n]*\n)*[^\n]*-->[^\n]*\n?",
        "",
    )
    body = F.regexp_replace(body, r"</?[A-Za-z][^>\n]*>", "")
    wnd = Window.partitionBy(id_col).orderBy("__bi")
    return (
        b.select(
            id_col,
            F.col("__bi"),
            _ms(F.col("__blk"), 1).alias("start_ms"),
            _ms(F.col("__blk"), 5).alias("end_ms"),
            F.regexp_replace(body, r"\n+$", "").alias("text"),
        )
        .withColumn(
            "cue_idx", (F.row_number().over(wnd) - 1).cast("long")
        )
        .select(id_col, "cue_idx", "start_ms", "end_ms", "text")
    )


_ASS_HEAD = r"^Dialogue:\s*[^,]*,([^,]*),([^,]*),"


def _ass_ms(line_col, group: int):
    """Milliseconds from an ASS ``H:MM:SS.cc`` field (centiseconds)."""
    field = F.regexp_extract(line_col, _ASS_HEAD, group)
    pat = r"(\d+):(\d+):(\d+)\.(\d+)"
    g = lambda i: F.regexp_extract(field, pat, i)  # noqa: E731
    return (
        g(1).cast("long") * 3_600_000
        + g(2).cast("long") * 60_000
        + g(3).cast("long") * 1_000
        + F.rpad(g(4), 3, "0").cast("long")
    )


def ass_cues(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """ASS/SSA payload -> the subtitle_cues schema: one row per
    ``Dialogue:`` event line ([Events] section), times from the
    centisecond ``H:MM:SS.cc`` fields, text from the 10th
    comma-field (commas inside the text are legal) with override
    blocks (brace-tags) dropped and the backslash-N / backslash-h
    literals mapped to newline / space — the anime-fansub subtitle
    format, parsed without leaving the JVM."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(F.regexp_replace(t, "\r\n?", "\n"), "\n")
    b = df.select(
        F.col(id_col), F.posexplode(lines).alias("__li", "__ln")
    ).filter(F.col("__ln").rlike("^Dialogue:"))
    body = F.regexp_extract(
        F.col("__ln"), r"^Dialogue:(?:[^,]*,){9}(.*)$", 1)
    body = F.regexp_replace(body, r"\{[^}]*\}", "")
    body = F.regexp_replace(body, r"\\[Nn]", "\n")
    body = F.regexp_replace(body, r"\\h", " ")
    wnd = Window.partitionBy(id_col).orderBy("__li")
    return (
        b.select(
            id_col,
            F.col("__li"),
            _ass_ms(F.col("__ln"), 1).alias("start_ms"),
            _ass_ms(F.col("__ln"), 2).alias("end_ms"),
            body.alias("text"),
        )
        .withColumn(
            "cue_idx", (F.row_number().over(wnd) - 1).cast("long")
        )
        .select(id_col, "cue_idx", "start_ms", "end_ms", "text")
    )


def align_cues_to_segments(
    cues: DataFrame,
    segments: DataFrame,
    id_col: str = "doc_id",
    bucket_ms: int = 30_000,
) -> DataFrame:
    """Caption-speech alignment: per cue, how many of its milliseconds
    fall inside the document's speech segments (``segments``: one row
    per (id, seg_start_ms, seg_end_ms), e.g. from ``audio_vad``'s
    leading/trailing profile or a diarization pass).  Output per cue:
    ``overlap_ms`` (exact, clipped per segment and summed) and
    ``aligned_ppm`` of the cue duration — the signal that drops
    mis-synced caption tracks before AV training.

    Plan: ``rangejoin.interval_overlap_join`` keyed by the document id
    (one bucketized equi-join, no nested loop, no DISTINCT), then one
    partial-agg groupBy per cue."""
    from .rangejoin import interval_overlap_join

    hits = interval_overlap_join(
        cues.select(
            id_col, "cue_idx", "start_ms", "end_ms"
        ),
        segments.select(id_col, "seg_start_ms", "seg_end_ms"),
        "start_ms",
        "end_ms",
        "seg_start_ms",
        "seg_end_ms",
        bucket_ms,
        keys=[id_col],
    ).select(
        id_col,
        "cue_idx",
        "start_ms",
        "end_ms",
        (
            F.least(F.col("end_ms"), F.col("seg_end_ms"))
            - F.greatest(F.col("start_ms"), F.col("seg_start_ms"))
        ).alias("__ov"),
    )
    agg = hits.groupBy(id_col, "cue_idx").agg(
        F.sum(F.greatest(F.col("__ov"), F.lit(0))).alias("overlap_ms"),
        F.first("start_ms").alias("__s"),
        F.first("end_ms").alias("__e"),
    )
    base = cues.select(
        id_col, "cue_idx",
        (F.col("end_ms") - F.col("start_ms")).alias("__dur"),
    )
    return (
        base.join(agg.drop("__s", "__e"), [id_col, "cue_idx"], "left")
        .select(
            id_col,
            "cue_idx",
            F.coalesce("overlap_ms", F.lit(0)).cast("long").alias(
                "overlap_ms"
            ),
            F.when(
                F.col("__dur") > 0,
                F.floor(
                    F.coalesce("overlap_ms", F.lit(0))
                    * 1_000_000
                    / F.col("__dur")
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("aligned_ppm"),
        )
    )


def subtitle_stats(cues: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-file caption profile: cue count, covered milliseconds,
    span, chars — the admission signals (drop empty/degenerate caption
    tracks, bucket by density).  One partial-agg groupBy."""
    return cues.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_cues"),
        F.sum(
            F.greatest(
                F.col("end_ms") - F.col("start_ms"), F.lit(0)
            )
        ).alias("covered_ms"),
        (F.max("end_ms") - F.min("start_ms")).alias("span_ms"),
        F.sum(F.length("text").cast("long")).alias("n_chars"),
    )
