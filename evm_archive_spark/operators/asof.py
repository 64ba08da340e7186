"""As-of join: latest right-side value at-or-before each left-side point.

The reference implies this operator by design: prices are sampled per block
window (get_price.go:85, main.go:196) precisely so queries can join "value x
price as of that block" (schema.sql:78-81, SURVEY B26/Q-J7).

Implementation is the *union + window carry-forward* plan rather than a
range join:

    union(left tagged 0, right tagged 1)
      -> window PARTITION BY key ORDER BY (t, tag DESC)
           last(value, ignoreNulls) ROWS UNBOUNDED PRECEDING..CURRENT
      -> filter tag = 0

Scale rationale (100 TB posture): this is ONE shuffle on the join key with
no row explosion — a naive range join (`r.t <= l.t`) explodes to O(|L|x|R|)
per key before aggregation, and a correlated subquery plans as such.  The
right side sorting before the left at equal t gives the `<=` (inclusive)
as-of semantics.  Skewed keys degrade to a single partition's sort — for
known-skewed keys, pre-salt by time-bucket and resolve boundaries with a
second pass (documented trade-off; not needed for (token, block) shapes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_TAG = "__asof_is_right"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by_left: str,
    by_right: str,
    value_cols: list[str],
    *,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right ``value_cols`` with
    ``right.on <= left.on`` (or ``<`` when ``strict``) matching on the
    by-keys.  Left rows with no prior right row get NULLs.
    """
    key = "__asof_key"
    l = left.withColumn(key, F.col(by_left)).withColumn(_TAG, F.lit(0))
    r = right.withColumn(key, F.col(by_right)).withColumn(_TAG, F.lit(1))

    l_cols = set(left.columns)
    carried = [f"__asof_v_{c}" for c in value_cols]

    l_u = l.select(
        key,
        F.col(on).alias("__asof_t"),
        _TAG,
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(v) for c, v in zip(value_cols, carried)],
        *[F.col(c) for c in left.columns],
    )
    r_u = r.select(
        key,
        F.col(on).alias("__asof_t"),
        _TAG,
        *[F.col(c).alias(v) for c, v in zip(value_cols, carried)],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns],
    )
    u = l_u.unionByName(r_u)

    # right rows sort before left rows at equal t => inclusive (<=);
    # flip for strict (<).
    tag_order = F.col(_TAG).desc() if not strict else F.col(_TAG).asc()
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__asof_t"), tag_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c, v in zip(value_cols, carried):
        u = u.withColumn(v, F.last(v, ignorenulls=True).over(w))

    out = u.filter(F.col(_TAG) == 0).select(
        *[F.col(c) for c in left.columns],
        *[F.col(v).alias(c) for c, v in zip(value_cols, carried)],
    )
    return out
