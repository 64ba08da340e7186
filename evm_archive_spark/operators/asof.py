"""As-of join: nearest right-side value at/before/after each left point.

The reference implies this operator by design: prices are sampled per block
window (get_price.go:85, main.go:196) precisely so queries can join "value x
price as of that block" (schema.sql:78-81, SURVEY B26/Q-J7).  The
``direction`` / ``tolerance`` generalization matches the public
``pandas.merge_asof`` contract (backward / forward / nearest, max-distance
tolerance), which is the shape LLM-pipeline time alignment needs (align a
click to the nearest error, a log line to the nearest deploy, a sample to
the nearest checkpoint).

Implementation is the *union + window carry* plan rather than a range join:

    union(left tagged 0, right tagged 1)
      -> window PARTITION BY key ORDER BY (t, tag)
           last(value, ignoreNulls)  ROWS UNBOUNDED PRECEDING..CURRENT   (backward)
           first(value, ignoreNulls) ROWS CURRENT..UNBOUNDED FOLLOWING   (forward)
      -> filter tag = 0

Scale rationale (100 TB posture): ONE shuffle on the join key with no row
explosion — a naive range join (`r.t <= l.t`) explodes to O(|L|x|R|) per
key before aggregation, and a correlated subquery plans as such.  For
``nearest`` both frames run over the SAME sort order (t asc, right-first at
equal t), so Catalyst plans a single Exchange+Sort feeding both window
frames: equal-t matches are credited to the backward frame (distance 0,
and ties prefer backward anyway), so the forward frame only needs the
strictly-later rows that ordering already gives it.  Skewed keys degrade
to a single partition's sort — for known-skewed keys, pre-salt by
time-bucket and resolve boundaries with a second pass (documented
trade-off; not needed for (token, block) shapes).

Determinism: callers must ensure the right side is unique per
(by_right, on) — pre-aggregate duplicates (the gate queries use
``groupBy(key, t).agg(max(v))``); with duplicates the carried value
depends on sort tiebreaks Spark does not define.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_TAG = "__asof_is_right"
_RT = "__asof_rt"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by_left: str,
    by_right: str,
    value_cols: list[str],
    *,
    strict: bool = False,
    direction: str = "backward",
    tolerance: int | float | None = None,
    matched_on: str | None = None,
) -> DataFrame:
    """For each left row, attach the right ``value_cols`` at the matching
    ``on`` point: the latest with ``right.on <= left.on`` (``backward``,
    the default; ``<`` when ``strict``), the earliest with
    ``right.on >= left.on`` (``forward``; ``>`` when ``strict``), or
    whichever of the two is closest (``nearest``; ties prefer backward).

    ``tolerance`` (same units as ``on``, which must then be numeric)
    null-outs matches farther than the bound — for ``nearest`` it is
    applied per side *before* choosing, so a too-far backward match does
    not shadow an in-range forward one (pandas semantics).

    ``matched_on`` names an extra output column carrying the matched
    right-side ``on`` value (NULL when unmatched).  Left rows with no
    admissible right row get NULLs.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if direction == "nearest" and strict:
        raise ValueError("strict is undefined for direction='nearest'")

    key = "__asof_key"
    l = left.withColumn(key, F.col(by_left)).withColumn(_TAG, F.lit(0))
    r = right.withColumn(key, F.col(by_right)).withColumn(_TAG, F.lit(1))

    carried = [f"__asof_v_{c}" for c in value_cols]
    r_types = dict(right.dtypes)
    on_type = dict(left.dtypes)[on]

    l_u = l.select(
        key,
        F.col(on).alias("__asof_t"),
        _TAG,
        F.lit(None).cast(on_type).alias(_RT),
        *[F.lit(None).cast(r_types[c]).alias(v) for c, v in zip(value_cols, carried)],
        *[F.col(c) for c in left.columns],
    )
    r_u = r.select(
        key,
        F.col(on).alias("__asof_t"),
        _TAG,
        F.col(on).cast(on_type).alias(_RT),
        *[F.col(c).alias(v) for c, v in zip(value_cols, carried)],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns],
    )
    u = l_u.unionByName(r_u)

    # Inclusive backward needs right BEFORE left at equal t (tag desc);
    # inclusive forward needs right AFTER left (tag asc); strict flips each.
    # nearest uses the backward-inclusive order for BOTH frames (equal-t
    # rows are the backward candidate at distance 0; ties prefer backward).
    if direction == "forward" and not strict:
        tag_order: Column = F.col(_TAG).asc()
    elif direction == "backward" and strict:
        tag_order = F.col(_TAG).asc()
    else:
        tag_order = F.col(_TAG).desc()

    base = Window.partitionBy(key).orderBy(F.col("__asof_t"), tag_order)
    w_back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    def _carry(src: str, w) -> Column:
        fn = F.last if w is w_back else F.first
        return fn(F.col(src), ignorenulls=True).over(w)

    t = F.col("__asof_t")
    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        u = u.select(
            "*",
            *[_carry(v, w).alias(f"__w_{v}") for v in carried],
            _carry(_RT, w).alias("__rt"),
        )
        in_range = F.lit(True) if tolerance is None else (
            F.abs(t - F.col("__rt")) <= F.lit(tolerance)
        )
        picked = {
            c: F.when(in_range, F.col(f"__w_{v}"))
            for c, v in zip(value_cols, carried)
        }
        rt_out = F.when(in_range, F.col("__rt"))
    else:
        u = u.select(
            "*",
            *[_carry(v, w_back).alias(f"__b_{v}") for v in carried],
            _carry(_RT, w_back).alias("__brt"),
            *[_carry(v, w_fwd).alias(f"__f_{v}") for v in carried],
            _carry(_RT, w_fwd).alias("__frt"),
        )
        brt, frt = F.col("__brt"), F.col("__frt")
        b_ok = brt.isNotNull() & (
            F.lit(True) if tolerance is None else ((t - brt) <= F.lit(tolerance))
        )
        f_ok = frt.isNotNull() & (
            F.lit(True) if tolerance is None else ((frt - t) <= F.lit(tolerance))
        )
        # ties (equal distance) prefer backward
        use_fwd = f_ok & (~b_ok | ((frt - t) < (t - brt)))
        picked = {
            c: F.when(use_fwd, F.col(f"__f_{v}")).when(b_ok, F.col(f"__b_{v}"))
            for c, v in zip(value_cols, carried)
        }
        rt_out = F.when(use_fwd, frt).when(b_ok, brt)

    out_cols = [F.col(c) for c in left.columns]
    out_cols += [picked[c].alias(c) for c in value_cols]
    if matched_on is not None:
        out_cols.append(rt_out.alias(matched_on))
    return u.filter(F.col(_TAG) == 0).select(*out_cols)


def resample_carry_forward(
    df: DataFrame,
    by_col: str,
    on_col: str,
    value_cols: list[str],
    step: int,
    *,
    tolerance: int | None = None,
) -> DataFrame:
    """Regular time-grid resampling with last-observation-carried-forward
    (the TimescaleDB time_bucket_gapfill + locf shape): one output row
    per key per ``step`` tick covering [min(on), max(on)] of that key,
    carrying each ``value_cols`` from the latest observation at-or-before
    the tick (NULL before the first; ``tolerance`` caps staleness).

    ``on_col`` must be integral (epoch-µs longs); grid ticks are the
    multiples of ``step`` inside the key's observed span — integer
    arithmetic throughout (``DIV``-safe past 2^53, the NOTES.md rule).

    Plan: a per-key min/max aggregate (tiny), a map-side ``sequence``
    explode for the grid, then ONE asof_join — which is one shuffle on
    the key.  Grid volume is span/step per key; pick ``step`` for the
    report resolution, not the data rate.
    """
    b = df.groupBy(by_col).agg(
        F.min(on_col).alias("__mn"), F.max(on_col).alias("__mx")
    )
    start = F.expr(f"((__mn + {step} - 1) DIV {step}) * {step}")
    stop = F.expr(f"(__mx DIV {step}) * {step}")
    grid = (
        b.select(by_col, start.alias("__s"), stop.alias("__e"))
        .filter(F.col("__s") <= F.col("__e"))
        .select(
            by_col,
            F.explode(
                F.sequence(F.col("__s"), F.col("__e"), F.lit(step))
            ).alias(on_col),
        )
    )
    return asof_join(
        grid, df, on=on_col, by_left=by_col, by_right=by_col,
        value_cols=value_cols, direction="backward", tolerance=tolerance,
    )
