"""Deterministic frequency/cardinality sketches (north-star extension):
count-min sketch and HyperLogLog registers over corpus-scale columns.

Sketches are the sub-linear answer to "how often / how many distinct" at
100 TB: a CMS of depth 4 x width 2^20 is 32 MB regardless of corpus size
and merges associatively across partitions (a groupBy SUM), so frequency
estimates come from one scan + one tiny shuffle; HLL registers are 2^b
bytes and merge by MAX.  Spark's built-ins (approx_count_distinct) hide
their internals; these are built on the suite's portable md5 position
idiom (q_split / bloom.py), so every counter and register is reproducible
bit-for-bit by an independent engine — the parity gates hash-check the
sketch *contents*, not just derived estimates.

Plan shapes: builds are explode (map-side) + one groupBy on the tiny
(depth, position) / bucket domain with partial aggregation; point queries
fold over a dense literal of the sketch — zero shuffles on the probe side
(the bloom_contains shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _col(c) -> F.Column:
    return F.col(c) if isinstance(c, str) else c


def _h32(seed: F.Column | int, c: F.Column) -> F.Column:
    """Portable 32-bit hash: first 8 hex digits of md5(seed ':' value)."""
    s = seed if isinstance(seed, F.Column) else F.lit(seed)
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", s.cast("string"), c)), 1, 8),
        16,
        10,
    ).cast("long")


# --------------------------------------------------------------------------
# count-min sketch (Cormode & Muthukrishnan 2005)
# --------------------------------------------------------------------------

def cms_build(
    df: DataFrame, col, *, width: int = 1 << 10, depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Sparse count-min sketch of a value stream: one row per touched
    counter, ``(j BIGINT, p BIGINT, c BIGINT)`` for depth row j in
    [1, depth] and position p in [0, width).  Build cost: one map-side
    explode (depth rows per value) + one groupBy over at most
    ``depth * width`` keys with partial combine.  Sketches over different
    shards merge by summing ``c`` on (j, p).

    ``weight_col`` builds the identical sketch from pre-aggregated
    ``(value, count)`` rows — each value contributes ``weight`` instead
    of 1 per row.  A sketch over a token stream equals the weighted
    sketch over its frequency table cell-for-cell (integer sums commute),
    so a pipeline that already aggregates true counts can derive the
    sketch from the vocabulary-sized table instead of re-scanning the
    stream (r13)."""
    w = F.lit(1).cast("long") if weight_col is None else F.col(weight_col)
    pos = df.select(
        cms_positions(col, width=width, depth=depth).alias("jp"),
        w.alias("__w"),
    )
    return pos.groupBy(
        F.col("jp.j").alias("j"), F.col("jp.p").alias("p")
    ).agg(F.sum("__w").cast("long").alias("c"))


def cms_positions(col, *, width: int, depth: int) -> F.Column:
    """Exploded (j, p) counter coordinates for one value — shared by the
    batch build and the streaming maintenance path."""
    c = _col(col)
    return F.explode(
        F.transform(
            F.sequence(F.lit(1), F.lit(depth)),
            lambda j: F.struct(
                j.cast("long").alias("j"),
                (_h32(j, c) % width).alias("p"),
            ),
        )
    )


def cms_dense(
    cms_df: DataFrame, *, width: int, depth: int
) -> list[list[int]]:
    """Collect the sparse sketch into ``depth`` dense counter rows — the
    broadcast payload (``depth * width`` ints, size-invariant in the
    corpus)."""
    dense = [[0] * width for _ in range(depth)]
    for r in cms_df.collect():
        dense[int(r["j"]) - 1][int(r["p"])] = int(r["c"])
    return dense


def cms_estimate(
    col, dense: list[list[int]], *, width: int | None = None
) -> F.Column:
    """Point-frequency estimate ``min_j counter[j][h_j(v)]`` as a pure
    Column expression over the dense sketch literal — fuses into the scan,
    zero shuffles (the ``bloom_contains`` probe shape).  Overestimates
    only, never under — the CMS guarantee."""
    w = width if width is not None else len(dense[0])
    c = _col(col)
    # F.lit(list): one Catalyst Literal per depth row, materialized once —
    # never F.array(*lits), which rebuilds the array on every row
    ests = [
        F.element_at(
            F.lit([int(x) for x in row]).cast("array<bigint>"),
            ((_h32(j + 1, c) % w) + 1).cast("int"),
        )
        for j, row in enumerate(dense)
    ]
    return F.least(*ests)


# --------------------------------------------------------------------------
# HyperLogLog registers (Flajolet et al. 2007)
# --------------------------------------------------------------------------

HLL_HASH_BITS = 60  # 15 hex digits of md5 — fits BIGINT exactly


def hll_registers(df: DataFrame, col, *, b: int = 8) -> DataFrame:
    """HLL register table for a value column: ``(bucket BIGINT,
    maxrho BIGINT)``, bucket in [0, 2^b), rho = 1 + trailing zero bits of
    the remaining hash (the portable rank variant; w == 0 saturates at
    ``HLL_HASH_BITS - b + 1``).  Registers merge across shards by MAX on
    bucket — a 2^b-row shuffle no matter the corpus size.  Untouched
    buckets are simply absent (they contribute rho 0).

    The rho extraction stays integer-exact on every engine: trailing
    zeros are counted by stripping the binary string's trailing '0's with
    a regex — no float log2 anywhere."""
    bucket, rho = hll_bucket_rho(col, b=b)
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("maxrho"))
    )


def hll_bucket_rho(col, *, b: int = 8) -> tuple[F.Column, F.Column]:
    """The (bucket, rho) Column pair underlying ``hll_registers`` —
    exposed so streaming maintenance can reuse the identical extraction
    (register state is a MAX aggregate, monotonic and order-insensitive,
    which is what makes it streamable at all)."""
    m = 1 << b
    c = _col(col)
    h = F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
    bucket = h % m
    # exact integer h >> b — an h/m double division would round: h is
    # 60-bit, doubles carry 53
    w = F.shiftright(h, b)
    binw = F.bin(w)
    trail = F.length(binw) - F.length(
        F.regexp_replace(binw, "0+$", "")
    )
    rho = F.when(w == 0, F.lit(HLL_HASH_BITS - b + 1)).otherwise(
        trail + 1
    ).cast("long")
    return bucket, rho


def hll_estimate(registers: DataFrame, *, b: int = 8) -> float:
    """Distinct-count estimate from a register table (driver-side — the
    registers are 2^b rows).  Standard HLL: alpha_m * m^2 / sum(2^-M_j)
    with the small-range linear-counting correction."""
    import math

    m = 1 << b
    regs = {int(r["bucket"]): int(r["maxrho"]) for r in registers.collect()}
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -regs.get(i, 0) for i in range(m))
    est = alpha * m * m / s
    zeros = m - len([v for v in regs.values() if v > 0])
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est
