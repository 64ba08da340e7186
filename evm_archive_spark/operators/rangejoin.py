"""Bucketized range join: point-in-interval without a cartesian product.

Spark has no native range-join optimization: ``l.p BETWEEN r.lo AND r.hi``
with no equi-key plans as BroadcastNestedLoopJoin (or a cartesian product),
O(|L|x|R|) — the classic OSS-Spark gap this operator closes (Databricks
ships the same idea as a range-join *hint*; here it is an explicit
composition of built-in operators, per the brief's custom-operator ladder).

Plan: quantize the value axis into fixed buckets of ``bucket_size``.  Each
left point lands in exactly ONE bucket; each right interval explodes into
the buckets it overlaps; an ordinary shuffled equi-join on the bucket id
collects candidates and the exact BETWEEN filter finishes.  Work is
O(|L| + |R| x avg_interval/bucket_size + candidates), all in whole-stage
codegen, with a plain hash shuffle both AQE and skew salting understand.

Correctness does not depend on float subtleties: bucket assignment is the
same monotone ``floor(x / bucket_size)`` expression on both sides, so a
point inside [lo, hi] always falls in one of the interval's exploded
buckets.

Choosing ``bucket_size``: ~ the typical interval width.  Too small →
interval explosion factor grows; too large → candidate filter does more
work.  Both degrade gracefully; neither is O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_B = "__range_bucket"


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lo: str,
    hi: str,
    bucket_size: float,
    *,
    how: str = "inner",
    left_key: str | None = None,
) -> DataFrame:
    """Join each left row to every right row with ``lo <= point <= hi``
    (inclusive).  Column names must be disjoint between the two sides;
    output carries all columns of both.

    ``how``: 'inner' (default) or 'left' (unmatched left rows kept with
    NULL right columns — implemented as an anti-join on ``left_key``, a
    non-null unique key of the left side, so the hot path stays a plain
    equi-join).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if how == "left" and not left_key:
        raise ValueError("how='left' requires left_key (unique, non-null)")

    l = left.withColumn(_B, F.floor(F.col(point) / F.lit(bucket_size)))
    r = right.withColumn(
        _B,
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / F.lit(bucket_size)),
                F.floor(F.col(hi) / F.lit(bucket_size)),
            )
        ),
    )
    matched = (
        l.join(r, _B)
        .filter((F.col(point) >= F.col(lo)) & (F.col(point) <= F.col(hi)))
        .drop(_B)
    )
    if how == "inner":
        return matched
    # left outer: add back left rows with no candidate match
    right_nulls = [
        F.lit(None).cast(t).alias(c) for c, t in right.dtypes
    ]
    unmatched = left.join(
        matched.select(left_key), [left_key], "left_anti"
    ).select("*", *right_nulls)
    return matched.unionByName(unmatched)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_size: float,
    keys: list[str] | None = None,
) -> DataFrame:
    """Interval-x-interval OVERLAP join (``l_lo <= r_hi AND r_lo <=
    l_hi``, inclusive) — the alignment primitive (subtitle cues x VAD
    segments, event windows x maintenance windows) that would otherwise
    be a BroadcastNestedLoopJoin.

    Both sides explode into the buckets they span and equi-join on the
    bucket id; a pair sharing several buckets would duplicate, so the
    join keeps ONLY the first shared bucket — the pair survives iff the
    bucket equals ``max(floor(l_lo/bs), floor(r_lo/bs))`` — a plain
    predicate instead of a DISTINCT (no second shuffle, no wide-row
    dedup state).  The exact overlap filter finishes.  Work is
    O(sum of interval spans / bucket_size + candidates), codegen'd,
    hash-shuffled (AQE/skew-friendly).  ``keys``: equi-columns shared
    by both sides (e.g. the document id) that join alongside the
    bucket — keyed alignment without a second shuffle."""
    lb = left.withColumn(
        _B,
        F.explode(
            F.sequence(
                F.floor(F.col(l_lo) / F.lit(bucket_size)),
                F.floor(F.col(l_hi) / F.lit(bucket_size)),
            )
        ),
    )
    rb = right.withColumn(
        _B,
        F.explode(
            F.sequence(
                F.floor(F.col(r_lo) / F.lit(bucket_size)),
                F.floor(F.col(r_hi) / F.lit(bucket_size)),
            )
        ),
    )
    return (
        lb.join(rb, [_B] + list(keys or []))
        .filter(
            (F.col(_B) == F.greatest(
                F.floor(F.col(l_lo) / F.lit(bucket_size)),
                F.floor(F.col(r_lo) / F.lit(bucket_size)),
            ))
            & (F.col(l_lo) <= F.col(r_hi))
            & (F.col(r_lo) <= F.col(l_hi))
        )
        .drop(_B)
    )
