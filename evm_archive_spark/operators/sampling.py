"""Deterministic sampling / split operators for training-data pipelines.

Randomness-free by construction: assignment is a pure function of the row
key via a cryptographic hash, so splits are reproducible across runs,
engines, partitionings, and cluster sizes — the property that matters when
a 100 TB corpus is re-materialized and the val set must not drift.  Using
md5 (not xxhash64) keeps the function portable to the DuckDB oracle.

All map-side: no shuffle, no RNG state, works identically in streaming.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(key: str | Column, buckets: int = 10_000) -> F.Column:
    """Stable bucket in [0, buckets): first 8 hex chars of md5(key)."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
    return F.pmod(h.cast("long"), F.lit(buckets))


def hash_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given weights, e.g.
    ``{"train": 0.9, "val": 0.05, "test": 0.05}`` — deterministic per key,
    exact thresholds over 10_000 hash buckets."""
    total = sum(weights.values())
    bucket = hash_bucket(key)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total * 10_000
        cond = bucket < F.lit(int(round(acc)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn(split_col, expr)


def deterministic_sample(
    df: DataFrame, key: str, fraction: float
) -> DataFrame:
    """Keep a stable ``fraction`` of rows by key hash (same rows every
    run, no seed plumbing)."""
    return df.filter(hash_bucket(key) < int(round(fraction * 10_000)))


def deterministic_shuffle(
    df: DataFrame, key: str, partitions: int | None = None
) -> DataFrame:
    """Global, reproducible corpus shuffle: order rows by ``md5(key)`` —
    the 'random' order every run, engine, and reader sees identically (no
    seed plumbing, no RNG state to checkpoint).

    Implemented as repartitionByRange + sortWithinPartitions on the hash,
    so the TOTAL order is (partition range, within-partition sort) — a
    single range shuffle, no global single-partition sort.  Feed straight
    into pack_by_budget or a writer; downstream readers get the
    shuffled order for free from the file layout.
    """
    h = F.md5(F.col(key).cast("string"))
    parts = df.repartitionByRange(partitions, h) if partitions else (
        df.repartitionByRange(h)
    )
    return parts.sortWithinPartitions(h)


def weighted_mix(
    df: DataFrame,
    key: str,
    strata_col: str,
    weights: dict[str, float],
    copy_col: str = "copy_id",
) -> DataFrame:
    """Deterministic corpus mixing: resample each stratum to an effective
    weight — the core of domain-mixture construction (e.g. upsample
    books x2.5, downsample web x0.3) for a training run.

    ``weight = floor(w)`` full copies per row, plus one more iff the
    row's hash bucket falls under ``frac(w)`` — so the EXPECTED stratum
    multiplicity is exactly ``w`` and the realized multiset is a pure
    function of the key (reproducible across runs, engines, cluster
    sizes).  Output rows carry ``copy_col`` in [0, n_copies) so repeats
    stay distinguishable downstream.  Strata absent from the map are
    dropped.

    Map-side only: a per-row ``sequence`` + ``explode``, no shuffle, no
    RNG state; at 100 TB this runs inside the scan stage.
    """
    bucket = hash_bucket(key)
    n_copies = None
    for stratum, w in weights.items():
        whole = int(w)
        frac_b = int(round((w - whole) * 10_000))
        n = F.lit(whole) + (bucket < frac_b).cast("int")
        cond = F.col(strata_col) == stratum
        n_copies = (
            F.when(cond, n) if n_copies is None else n_copies.when(cond, n)
        )
    n_copies = (
        F.lit(0) if n_copies is None else n_copies.otherwise(F.lit(0))
    )
    # sequence(0, -1) would count DOWN; guard the zero-copy case with an
    # empty array (explode drops it).
    copies = F.when(
        F.col("_n") > 0, F.sequence(F.lit(0), F.col("_n") - 1)
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.withColumn("_n", n_copies)
        .select("*", F.explode(copies).alias(copy_col))
        .drop("_n")
    )


def stratified_sample(
    df: DataFrame, key: str, strata_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling, e.g. downsample boilerplate
    languages: ``{"en": 0.1, "de": 1.0}``; strata absent from the map are
    dropped (explicit is better than silently kept)."""
    bucket = hash_bucket(key)
    cond = None
    for stratum, frac in fractions.items():
        c = (F.col(strata_col) == stratum) & (
            bucket < int(round(frac * 10_000))
        )
        cond = c if cond is None else cond | c
    return df.filter(cond if cond is not None else F.lit(False))
