"""Table-level data quality: one-pass column profiling and constraint
checks — the dbt-test / Great-Expectations surface a 100 TB warehouse
runs before trusting a load.

- ``profile_table``: per-column null count, exact distinct count, min/max
  — computed in ONE scan (a single aggregate whose expressions cover
  every column).  Exact multi-column distincts plan as Expand (one input
  row per distinct-aggregated column) — the documented cost; pass
  ``approx=True`` to switch to approx_count_distinct and keep the
  aggregate expand-free for wide tables at full scale.
- ``check_primary_key`` / ``check_foreign_key``: uniqueness and
  referential-orphan violations as DataFrames (empty == healthy), both
  plain partial-aggregated groupBy / anti-join shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(
    df: DataFrame, cols: list[str] | None = None, *, approx: bool = False
) -> DataFrame:
    """Long-format profile: (col_name, n_rows, n_nulls, n_distinct, min_s,
    max_s) per column, min/max rendered as strings so one schema serves
    every column type.  One scan, one aggregate."""
    cols = cols or df.columns
    distinct = (
        F.approx_count_distinct if approx else F.count_distinct
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            distinct(F.col(c)).cast("long").alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_s"),
                F.col(f"__mx_{c}").alias("max_s"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("r")).select(
        "r.col_name", "r.n_rows", "r.n_nulls", "r.n_distinct",
        "r.min_s", "r.max_s",
    )


def check_primary_key(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Rows violating PK uniqueness: one row per duplicated key tuple
    with its multiplicity (empty == key is unique).  Partial-aggregated
    groupBy on the key — the dedup shuffle shape."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def check_foreign_key(
    child: DataFrame,
    parent: DataFrame,
    on: list[tuple[str, str]],
) -> DataFrame:
    """Orphaned child keys: distinct child key tuples with no matching
    parent row, with orphan multiplicities (empty == FK holds).
    ``on`` maps child column -> parent column.  Anti-join on the key
    only — the child never shuffles full rows."""
    ck = [c for c, _ in on]
    keys = child.groupBy(*ck).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    p = parent.select(
        *[F.col(pc).alias(f"__p_{cc}") for cc, pc in on]
    ).distinct()
    cond = None
    for cc, _ in on:
        e = F.col(cc) == F.col(f"__p_{cc}")
        cond = e if cond is None else cond & e
    return keys.join(p, cond, "left_anti")


def dataset_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
) -> DataFrame:
    """Reproducibility manifest: one row per shard (``id % n_shards``)
    with ``n_docs``, ``n_chars``, and ``xor_digest`` — the bitwise XOR
    of each document's 60-bit md5 content prefix.  Two corpus builds
    are byte-identical per shard iff all three columns match; a single
    flipped document flips the XOR.

    XOR (not a sorted-concat hash) is the 100-TB-safe choice: it is
    commutative/associative, so the aggregation is a plain map-side-
    combined groupBy with 8-byte state — no collect_list, no ordering
    shuffle, and the same fold replays exactly in DuckDB (bit_xor), so
    the q_manifest gate hash-checks real corpus content end-to-end.

    Output: (shard, n_docs, n_chars, xor_digest) — all BIGINT.
    """
    digest = F.conv(
        F.substring(F.md5(F.coalesce(F.col(text_col), F.lit(""))), 1, 15),
        16,
        10,
    ).cast("long")
    return (
        df.select(
            (F.col(id_col) % n_shards).cast("long").alias("shard"),
            digest.alias("__d"),
            F.length(F.coalesce(F.col(text_col), F.lit("")))
            .cast("long")
            .alias("__n"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").alias("n_chars"),
            F.expr("bit_xor(__d)").alias("xor_digest"),
        )
    )


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Build-to-build corpus diff — what changed between two dataset
    versions: one row per document present in either build with
    ``status`` 'added' (id only in new), 'removed' (only in old) or
    'changed' (same id, different content digest); unchanged documents
    are omitted (the interesting set is the delta).  The companion of
    ``dataset_manifest``: the manifest says WHETHER two builds differ,
    this says WHERE.

    Shape: digest each side map-side, one full-outer join on the id —
    at 100 TB the join carries (id, 16-byte digest) rows only, never
    content."""
    dig = lambda df: df.select(  # noqa: E731
        F.col(id_col).alias("doc_id"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("__d"),
    )
    o = dig(old).withColumnRenamed("__d", "__do")
    n = dig(new).withColumnRenamed("__d", "__dn")
    j = o.join(n, "doc_id", "full_outer")
    return (
        j.select(
            "doc_id",
            F.when(F.col("__do").isNull(), F.lit("added"))
            .when(F.col("__dn").isNull(), F.lit("removed"))
            .when(F.col("__do") != F.col("__dn"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
        .filter(F.col("status") != "unchanged")
    )
