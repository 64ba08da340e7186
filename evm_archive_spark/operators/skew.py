"""Skew-mitigation building blocks: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these operators are the explicit, plan-time version for the cases
AQE can't fix — a *logical* hot key in a shuffle join (one contract
address with 10% of all logs, one event_type with most events) or a
stateful/streaming aggregation where AQE doesn't apply.

Both operators are result-equivalent to their unsalted forms (that is the
parity gate: q_skew_join / q_skew_agg hash-match plain SQL oracles) — they
only change the shuffle layout:

- ``salted_join``: the big (skewed) side gets a deterministic salt in
  [0, buckets); the small side is replicated ``buckets`` times (explode),
  so one hot key spreads over ``buckets`` reducers.  Cost: small side
  × buckets — use for small-dim joins where broadcast is impossible
  (e.g. the dim exceeds the broadcast threshold but a key is hot).
- ``two_phase_agg``: groupBy(keys+salt) partial, then groupBy(keys)
  combine.  Spark's hash aggregate already does map-side partials for
  algebraic aggs; the explicit two-phase form matters for
  high-cardinality-input/low-cardinality-key COUNT DISTINCT-ish shapes
  and for streaming state (where one hot key = one hot state partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _salt(salt_on: str | Column, buckets: int) -> Column:
    c = F.col(salt_on) if isinstance(salt_on, str) else salt_on
    return F.pmod(F.xxhash64(c), F.lit(buckets)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_on: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted on a high-cardinality column and
    the small side replicated per salt bucket. Result == big.join(small,
    on, how) with the hot keys spread over ``buckets`` reducers."""
    b = big.withColumn("__salt", _salt(salt_on, buckets))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return b.join(s, on + ["__salt"], how).drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    salt_on: str,
    buckets: int = 16,
    count_alias: str = "n",
    sum_col: str | Column | None = None,
    sum_alias: str = "s",
) -> DataFrame:
    """Salted two-phase COUNT/SUM: partial per (keys, salt), combine per
    keys. Exact for algebraic aggregates (use decimal sums for
    associativity-proof results)."""
    aggs = [F.count(F.lit(1)).alias("__pc")]
    if sum_col is not None:
        c = F.col(sum_col) if isinstance(sum_col, str) else sum_col
        aggs.append(F.sum(c).alias("__ps"))
    partial = df.withColumn("__salt", _salt(salt_on, buckets)).groupBy(
        *keys, "__salt"
    ).agg(*aggs)
    final = [F.sum("__pc").alias(count_alias)]
    if sum_col is not None:
        final.append(F.sum("__ps").alias(sum_alias))
    return partial.groupBy(*keys).agg(*final)
