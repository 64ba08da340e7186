"""Sequence packing for training-data pipelines: assign documents to
fixed-token-budget packs (concat-and-chunk semantics, the T5/GPT data
loader convention) with a DISTRIBUTED prefix sum.

The naive formulation — ``SUM(tokens) OVER (ORDER BY id)`` with no
PARTITION BY — collapses every row into one partition and dies at scale.
This module implements the classic two-phase parallel prefix sum instead:

  1. shard rows into contiguous key ranges (a pure column expression on
     the ordering key — no sampling, no skew surprises on dense ids);
  2. per-shard cumulative sums run in parallel (window partitioned by
     shard — one keyed shuffle);
  3. per-shard totals (one tiny row per shard) are prefix-summed and
     broadcast back as shard base offsets.

Every row's global running total = shard base + within-shard cumsum.
The only global object is the shard-totals table (``shards`` rows), so
the plan scales to any corpus size; correctness is engine-checkable
because the RESULT equals the naive global window's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def global_running_total(
    df: DataFrame,
    order_col: str,
    value_col: str,
    shards: int = 256,
) -> DataFrame:
    """Add ``running`` = cumulative sum of ``value_col`` in ``order_col``
    order (inclusive), computed as a two-phase distributed prefix sum.

    ``order_col`` must be unique and integral (doc ids).  Shard ranges are
    derived from min/max — a 2-row aggregate, broadcast, never collected
    wide.
    """
    bounds = df.agg(
        F.min(order_col).cast("long").alias("_lo"),
        F.max(order_col).cast("long").alias("_hi"),
    )
    # contiguous range shards: shard = (key - lo) DIV width
    width = (
        F.floor((F.col("_hi") - F.col("_lo")) / F.lit(shards)) + 1
    ).alias("_w")
    sharded = (
        df.crossJoin(F.broadcast(bounds.select("_lo", width)))
        .withColumn(
            "_shard",
            ((F.col(order_col).cast("long") - F.col("_lo")) / F.col("_w"))
            .cast("long"),
        )
        .drop("_lo", "_w")
    )
    within = F.sum(F.col(value_col).cast("long")).over(
        Window.partitionBy("_shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sharded = sharded.withColumn("_within", within)
    # per-shard totals: `shards` rows — the tiny global step
    totals = sharded.groupBy("_shard").agg(
        F.sum(F.col(value_col).cast("long")).alias("_tot")
    )
    base = totals.withColumn(
        "_base",
        F.coalesce(
            F.sum("_tot").over(
                Window.orderBy("_shard").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_shard", "_base")
    return (
        sharded.join(F.broadcast(base), "_shard")
        .withColumn("running", F.col("_base") + F.col("_within"))
        .drop("_shard", "_within", "_base")
    )


def pack_by_budget(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_col: str = "doc_id",
    shards: int = 256,
) -> DataFrame:
    """Assign each document to a training pack of ``budget`` tokens.

    Concat-and-chunk semantics: documents are laid out end-to-end in
    ``order_col`` order and the stream is cut every ``budget`` tokens; a
    document belongs to the pack in which it STARTS, at offset
    ``pack_off``.  Adds ``pack_id`` and ``pack_off`` (both long, exact
    integers — engine-independent).
    """
    with_run = global_running_total(df, order_col, token_col, shards)
    start = F.col("running") - F.col(token_col).cast("long")
    # integer DIV, not float division: past 2^53 cumulative tokens (real
    # at 100 TB) a double round-trip misplaces pack boundaries
    return (
        with_run.withColumn("_start", start)
        .withColumns(
            {
                "pack_id": F.expr(f"_start DIV {int(budget)}"),
                "pack_off": F.col("_start") % F.lit(budget),
            }
        )
        .drop("running", "_start")
    )


def with_global_index(
    df: DataFrame,
    order_col: str,
    *,
    index_col: str = "row_index",
    shards: int = 256,
) -> DataFrame:
    """Dense 0-based global ordinal in ``order_col`` order — the
    distributed answer to ``row_number() OVER (ORDER BY ...)``, whose
    empty PARTITION BY collapses every row into one partition at scale
    (and to ``monotonically_increasing_id``, whose values depend on
    partitioning and are neither dense nor ordered).  Implemented as the
    module's two-phase prefix sum over a constant 1 — shard-parallel
    windows plus a ``shards``-row broadcast base-offset table.

    ``order_col`` must be unique and integral (the prefix-sum contract);
    reruns over the same data give identical indexes."""
    out = global_running_total(
        df.withColumn("__one", F.lit(1)), order_col, "__one", shards
    )
    return (
        out.withColumn(index_col, (F.col("running") - 1).cast("long"))
        .drop("running", "__one")
    )


def materialize_packs(
    docs: DataFrame,
    assignment: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    copy_col: str = "copy_id",
    sep: str = "\n",
) -> DataFrame:
    """Turn a pack assignment (pack_by_budget / prepare_training_corpus
    output) into the actual training shards: one row per pack with the
    member texts concatenated in pack order — the step that hands a data
    loader real sequences instead of an assignment table.

    Output: (pack_id, n_docs, n_tokens, text).  One join of the
    assignment onto the documents (broadcast if the assignment is a
    gate-sized subset, shuffled hash join at corpus scale — both sides
    keyed by the id) and one ``groupBy(pack_id)`` whose groups are
    BOUNDED BY THE BUDGET by construction: a pack holds at most
    budget/min_tokens documents, so collect_list here — unlike on an
    unbounded key — cannot blow up a reducer.  Order within the pack is
    restored by array_sort on (pack_off, text) structs, no global sort.
    """
    joined = assignment.join(
        docs.select(F.col(id_col), F.col(text_col)), id_col
    )
    return (
        joined.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("pack_off"), F.col(text_col))
                        )
                    ),
                    lambda s: s[text_col],
                ),
            ).alias("text"),
        )
    )


def length_bucket_batches(
    df: DataFrame,
    token_col: str,
    batch_size: int,
    order_col: str = "doc_id",
    *,
    bucket_col: str = "bucket",
    batch_col: str = "batch_idx",
    shards: int = 256,
) -> DataFrame:
    """Dynamic-batching layout: bucket documents by length magnitude
    (``bucket = floor(log2(tokens))``) and cut each bucket, in
    ``order_col`` order, into fixed-count batches of ``batch_size`` rows.

    Padded-batch training/inference wastes ``max(len) - len`` tokens per
    row within a batch; power-of-two bucketing bounds that waste at 2x
    worst-case without a global sort.  The bucket is computed as
    ``length(bin(tokens)) - 1`` — pure integer arithmetic on the binary
    rendering, no float log2 edge cases, portable to the oracle.

    The within-bucket ordinal generalizes the module's two-phase prefix
    sum per bucket: windows partition by ``(bucket, shard-range)``, the
    global step is a (#buckets x shards)-row broadcast whose own window
    partitions by bucket over <= ``shards`` rows — no single-partition
    window at any scale.  Adds ``bucket_col`` and ``batch_col`` (both
    long); ``(bucket, batch_idx)`` identifies a batch.
    """
    tokens = F.greatest(F.col(token_col).cast("long"), F.lit(1))
    bucketed = df.withColumn(
        bucket_col, (F.length(F.bin(tokens)) - 1).cast("long")
    )
    bounds = bucketed.agg(
        F.min(order_col).cast("long").alias("_lo"),
        F.max(order_col).cast("long").alias("_hi"),
    )
    # Integer DIV (not float '/'), per the module's exact-integer rule
    # (see pack_by_budget): float division rounds the mantissa past 2^53,
    # which would skew shard boundaries for wide order_col ranges.
    width = F.expr(f"(_hi - _lo) DIV {int(shards)} + 1").alias("_w")
    sharded = (
        bucketed.crossJoin(F.broadcast(bounds.select("_lo", width)))
        .withColumn(
            "_shard",
            F.expr(f"(CAST({order_col} AS BIGINT) - _lo) DIV _w"),
        )
        .drop("_lo", "_w")
    )
    within = F.row_number().over(
        Window.partitionBy(bucket_col, "_shard").orderBy(order_col)
    )
    sharded = sharded.withColumn("_within", within.cast("long"))
    totals = sharded.groupBy(bucket_col, "_shard").agg(
        F.count(F.lit(1)).cast("long").alias("_tot")
    )
    base = totals.withColumn(
        "_base",
        F.coalesce(
            F.sum("_tot").over(
                Window.partitionBy(bucket_col)
                .orderBy("_shard")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select(bucket_col, "_shard", "_base")
    return (
        sharded.join(F.broadcast(base), [bucket_col, "_shard"])
        .withColumn(
            batch_col,
            F.expr(f"(_base + _within - 1) DIV {int(batch_size)}"),
        )
        .drop("_shard", "_within", "_base")
    )


def padding_waste(
    batched: DataFrame,
    token_col: str,
    *,
    bucket_col: str = "bucket",
    batch_col: str = "batch_idx",
) -> DataFrame:
    """Per-bucket padding-waste report over a ``length_bucket_batches``
    assignment — the number that justifies (or indicts) a bucketing
    scheme: a padded batch costs ``batch_max * rows`` tokens, of which
    ``batch_max * rows - sum(tokens)`` is padding.

    Output per bucket: ``n_batches, n_rows, sum_tokens, padded_tokens,
    waste_ppm`` (parts-per-million of the padded volume that is padding —
    integer DIV, exact and engine-portable).  Two partial-aggregated
    groupBys on compact keys: (bucket, batch) then bucket — no windows,
    no skew (batch groups are bounded by ``batch_size`` rows).
    """
    tok = F.col(token_col).cast("long")
    per_batch = batched.groupBy(bucket_col, batch_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(tok).alias("_sum"),
        F.max(tok).alias("_max"),
    )
    return (
        per_batch.groupBy(bucket_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_batches"),
            F.sum("_n").cast("long").alias("n_rows"),
            F.sum("_sum").cast("long").alias("sum_tokens"),
            F.sum(F.col("_max") * F.col("_n")).cast("long")
            .alias("padded_tokens"),
        )
        .withColumn(
            # padded_tokens = 0 is reachable: bucketing clamps tokens with
            # greatest(tokens, 1) but this statistic reads the raw token
            # column, so a bucket of all-zero-token rows must yield 0, not
            # NULL (or a DIVIDE_BY_ZERO under ANSI mode).
            "waste_ppm",
            F.expr(
                "CASE WHEN padded_tokens = 0 THEN CAST(0 AS BIGINT) "
                "ELSE CAST((padded_tokens - sum_tokens) * 1000000 "
                "DIV padded_tokens AS BIGINT) END"
            ),
        )
    )
