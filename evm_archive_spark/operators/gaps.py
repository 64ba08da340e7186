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
