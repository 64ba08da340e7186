"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input has fewer partitions
    than the cluster has slots — the small-file / single-row-group
    artifact where a heavy downstream stage (token explode, pair
    generation) would otherwise run in one task.

    At 100 TB inputs already carry thousands of partitions, so this is a
    no-op there (and its shuffle would be the bug); the trigger condition
    means the shuffle only ever moves a small input.  Partition-count
    inspection is plan-side (no job)."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

