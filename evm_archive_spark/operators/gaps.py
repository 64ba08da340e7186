"""Missing-range detection — the archive completeness check.

The reference's resume logic trusts ``max(block_number)`` (A10/A11); a
crashed backfill or a skipped poison window (rpc.py SkipWindow) can leave
HOLES below the high-water mark that max() never sees.  ``find_gaps``
returns every maximal missing integer range so the operator of a 100 TB
archive can re-enqueue exactly the missing windows.

Scale shape: the classic gaps-and-islands trick needs a GLOBAL dense rank
— ``row_number() OVER (ORDER BY v)`` collapses to one partition at scale,
so the rank comes from packing.with_global_index (the two-phase
distributed prefix sum).  Islands then form map-side (``v - rank`` is
constant within a contiguous run), one groupBy collapses each island to
(start, end), and only the ISLANDS table — bounded by #gaps+1, not data
volume — passes through the final ordering window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def find_gaps(df: DataFrame, col: str, *, shards: int = 256) -> DataFrame:
    """(gap_start, gap_end) for every maximal missing range strictly
    inside [min(col), max(col)] of the distinct integral values."""
    from .packing import with_global_index

    vals = df.select(F.col(col).cast("long").alias("v")).distinct()
    idx = with_global_index(vals, "v", index_col="__i", shards=shards)
    islands = (
        idx.withColumn("__island", F.col("v") - F.col("__i"))
        .groupBy("__island")
        .agg(F.min("v").alias("__is"), F.max("v").alias("__ie"))
    )
    w = Window.orderBy("__is")
    return (
        islands.select(
            (F.col("__ie") + 1).alias("gap_start"),
            (F.lead("__is").over(w) - 1).alias("gap_end"),
        )
        .filter(F.col("gap_end").isNotNull())
        .filter(F.col("gap_end") >= F.col("gap_start"))
    )


def plan_backfill(
    ingested: DataFrame,
    col: str,
    step: int,
    *,
    expected_lo: int | None = None,
    expected_hi: int | None = None,
    shards: int = 256,
):
    """Turn detected holes into fetchable block windows: find_gaps over
    the ingested block numbers (plus the open ranges against the
    expected bounds, when given), split into ``blockStep``-sized
    inclusive sub-ranges via the A12 window planner — exactly the
    re-enqueue list a recovering ingest loop feeds back into the RPC
    source.  Returns ``list[BlockRange]``.

    The gap list is driver-small by construction (bounded by #holes, not
    data volume), so the collect here is the same small-state pattern as
    the resume cursor (A10/A11).
    """
    from ..sources.rpc import plan_ranges

    gaps = [
        (int(r["gap_start"]), int(r["gap_end"]))
        for r in find_gaps(ingested, col, shards=shards).collect()
    ]
    if expected_lo is not None or expected_hi is not None:
        bounds = ingested.agg(
            F.min(F.col(col).cast("long")).alias("mn"),
            F.max(F.col(col).cast("long")).alias("mx"),
        ).collect()[0]
        mn, mx = bounds["mn"], bounds["mx"]
        if mn is None:  # nothing ingested: the whole expected span is a gap
            if expected_lo is not None and expected_hi is not None:
                gaps = [(expected_lo, expected_hi)]
        else:
            if expected_lo is not None and expected_lo < mn:
                gaps.insert(0, (expected_lo, mn - 1))
            if expected_hi is not None and expected_hi > mx:
                gaps.append((mx + 1, expected_hi))
    out = []
    for lo, hi in sorted(gaps):
        out.extend(plan_ranges(lo, hi, step))
    return out
