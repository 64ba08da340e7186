"""Incremental additive rollup — the hypertable continuous-aggregate shape.

A rollup table stores per-(bucket, dims) ADDITIVE measures (counts, sums —
the merge is SUM on both).  Maintenance therefore never re-reads the base
table: a new batch partial-aggregates map-side to at most
|buckets x dims| rows, merges with the CURRENT rollup rows of the touched
buckets only, and dynamic-partition-overwrite rewrites exactly those
bucket directories.  Untouched history is never read or written — cost is
O(batch + touched-bucket rollup rows) regardless of how many years of
history the rollup holds, which is the property that matters when the
base is 100 TB and a micro-batch touches the newest hour.

This is the batch twin of the streaming additive-state operators
(streaming/windows.py st_cms/st_hll): same merge algebra, same
idempotence caveat — re-running the SAME batch double-counts, so callers
dedupe/checkpoint batches upstream (pipeline._write_idempotent's
ingest_batch convention covers this for the ingest path).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

_BUCKET = "bucket_id"


def rollup_update(
    spark: SparkSession,
    new_rows: DataFrame,
    rollup_path: str,
    bucket: F.Column,
    group_cols: list[str],
    measures: dict[str, F.Column],
) -> None:
    """Fold one batch of base rows into the rollup at ``rollup_path``.

    ``bucket``: expression over ``new_rows`` producing the integral
    partition bucket (e.g. epoch-hours).  ``measures``: name -> ADDITIVE
    aggregate expression over the base rows (count/sum family); the
    cross-batch merge is SUM per measure, so anything non-additive
    (avg, distinct) must be stored as its additive parts instead.
    """
    partial = (
        new_rows.withColumn(_BUCKET, bucket.cast("long"))
        .groupBy(_BUCKET, *group_cols)
        .agg(*[m.cast("long").alias(name) for name, m in measures.items()])
    )

    if os.path.exists(rollup_path):
        existing = spark.read.parquet(rollup_path)
        touched = partial.select(_BUCKET).distinct()
        # broadcast the (tiny) touched-bucket list; partition pruning on
        # the rollup scan keeps the read bounded by touched buckets
        affected = existing.join(F.broadcast(touched), _BUCKET, "semi")
        merged = (
            affected.unionByName(partial)
            .groupBy(_BUCKET, *group_cols)
            .agg(
                *[
                    F.sum(name).cast("long").alias(name)
                    for name in measures
                ]
            )
        )
        # the write below targets the path this plan reads: materialize the
        # (small — touched buckets only) merge result and cut lineage, or
        # Spark rejects the self-overwrite.  Same localCheckpoint pattern
        # as the iterative dedup/ivf rounds.
        merged = merged.localCheckpoint(eager=True)
    else:
        merged = partial

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy(_BUCKET)
            .parquet(rollup_path)
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    return spark.read.parquet(rollup_path)
