"""Multi-column data skipping: Z-order layout + min/max file manifest.

The reference's multi-column access paths are btrees (schema.sql:54-62);
storage.py's single-sort layout serves the (address, topic0) composite but
a sort can only cluster its FIRST key.  For point/range predicates on TWO
columns at once the columnar answer is space-filling-curve clustering
(Z-order — the same design Delta/Iceberg expose as OPTIMIZE ZORDER BY)
plus file-level min/max pruning:

- ``write_zordered``: normalize each cluster column to a ``bits``-wide
  rank, interleave the bits into a Morton code, range-partition + sort by
  it.  Files then cover small hyper-rectangles of the key space instead
  of thin slices of one column, so BOTH columns' min/max statistics
  become selective.
- ``build_manifest``: per-file min/max of chosen columns, computed
  DISTRIBUTED (each task reads only parquet footers via pyarrow — no data
  pages), persisted as a tiny manifest table.  This is the
  Iceberg-manifest idea without a table format dependency.
- ``prune_files``: intersect range predicates with the manifest and read
  only surviving files — scan cost proportional to the predicate's
  key-space volume, not the table size.  At 100 TB the manifest for
  100k files is a few MB: a driver-side broadcast, never a bottleneck.

The min/max stats job in ``write_zordered`` collects 2 scalars per column
(driver state O(cols), one scan); outlier-heavy columns should be
quantile-clamped upstream (documented trade-off — rank-by-quantile needs
a second pass).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

Z = "__zorder"


def morton_interleave(cols: list[Column], bits: int = 16) -> Column:
    """Interleave ``bits`` low bits of each (already-normalized) column
    into one Morton code: bit b of column i lands at position
    ``b * len(cols) + i``.  Pure JVM bit expressions — whole-stage
    codegen, no UDF."""
    n = len(cols)
    parts = [
        F.shiftleft(
            F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)),
            b * n + i,
        )
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return reduce(lambda a, x: a.bitwiseOR(x), parts)


def _normalized(df: DataFrame, cols: list[str], bits: int) -> list[Column]:
    stats = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    out = []
    top = (1 << bits) - 1
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) or 1
        out.append(
            ((F.col(c) - F.lit(mn)) * F.lit(top) / F.lit(span)).cast("long")
        )
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 16,
    n_files: int | None = None,
) -> None:
    """Write ``df`` clustered by the Z-order of ``cols`` (numeric).

    One stats scan (2 scalars per column to the driver), then a single
    range shuffle on the Morton code and a within-partition sort — the
    same cost shape as storage.write_logs_partitioned's sort, buying
    min/max selectivity on EVERY clustered column instead of the first.
    """
    z = morton_interleave(_normalized(df, cols, bits), bits)
    with_z = df.withColumn(Z, z)
    parts = (
        with_z.repartitionByRange(n_files, Z)
        if n_files
        else with_z.repartitionByRange(Z)
    )
    (
        parts.sortWithinPartitions(Z)
        .drop(Z)
        .write.mode("overwrite")
        .parquet(path)
    )


def build_manifest(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-file min/max for ``cols``, computed distributed: the file list
    fans out and each task reads ONLY the parquet footer (pyarrow
    metadata; no row groups are decoded).  Returns columns
    ``file, <c>_min, <c>_max`` — persist next to the data and reuse
    until the directory changes."""
    import os

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    files_df = spark.createDataFrame([(f,) for f in files], "file string")

    def footer_stats(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for b in batches:
            rows = []
            for fname in b["file"]:
                md = pq.ParquetFile(fname).metadata
                idx = {
                    md.schema.column(i).name: i
                    for i in range(md.num_columns)
                }
                rec = {"file": fname}
                for c in cols:
                    lo, hi = None, None
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx[c]).statistics
                        if st is None or not st.has_min_max:
                            lo, hi = None, None
                            break
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
                    rec[f"{c}_min"], rec[f"{c}_max"] = lo, hi
                rows.append(rec)
            yield pd.DataFrame(rows)

    schema = "file string, " + ", ".join(
        f"{c}_min long, {c}_max long" for c in cols
    )
    return files_df.mapInPandas(footer_stats, schema)


def prune_files(
    manifest: DataFrame, predicates: dict[str, tuple]
) -> list[str]:
    """Files whose [min, max] intersects every ``col: (lo, hi)`` range
    (either bound may be None for open-ended).  Files with missing stats
    are conservatively kept."""
    keep = F.lit(True)
    for c, (lo, hi) in predicates.items():
        mn, mx = F.col(f"{c}_min"), F.col(f"{c}_max")
        no_stats = mn.isNull() | mx.isNull()
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (mx >= F.lit(lo))
        if hi is not None:
            cond = cond & (mn <= F.lit(hi))
        keep = keep & (no_stats | cond)
    return [r["file"] for r in manifest.filter(keep).select("file").collect()]


def read_pruned(
    spark: SparkSession,
    manifest: DataFrame,
    predicates: dict[str, tuple],
) -> DataFrame:
    """Read only the manifest-surviving files.  Callers re-apply the exact
    predicate (pruning is file-granular); the returned frame is empty
    when nothing survives."""
    files = prune_files(manifest, predicates)
    if not files:
        raise ValueError("no files survive pruning; nothing to read")
    return spark.read.parquet(*files)
