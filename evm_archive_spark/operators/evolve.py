"""Schema evolution: align a DataFrame to a target schema — the
migration lane when a corpus or archive table gains/renames/retypes
columns between snapshots (and the guard that makes unioning old and
new shards safe).

Pure projection: every alignment step (rename, cast, add-missing-as-
NULL, reorder) is a map-side ``select`` that Catalyst folds into the
scan — zero shuffles, and column pruning still reaches parquet for the
columns the target keeps.  Unknown source columns are an ERROR by
default (silent data loss during a migration is the bug this operator
exists to prevent); pass ``allow_drop=True`` to discard them on
purpose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructType


def evolve_schema(
    df: DataFrame,
    target: StructType | str,
    *,
    renames: dict[str, str] | None = None,
    allow_drop: bool = False,
) -> DataFrame:
    """Return ``df`` aligned to ``target`` (a StructType or DDL string):
    ``renames`` maps old -> new names first; columns present in the
    target are cast to the target type; target columns absent from the
    source are added as typed NULLs; source columns absent from the
    target raise (or drop with ``allow_drop``).  Output column order is
    the target order."""
    if isinstance(target, str):
        target = StructType.fromDDL(target)
    work = df
    for old, new in (renames or {}).items():
        work = work.withColumnRenamed(old, new)
    have = {f.lower() for f in work.columns}
    want = {f.name.lower() for f in target.fields}
    extra = sorted(have - want)
    if extra and not allow_drop:
        raise ValueError(
            f"evolve_schema: source columns {extra} absent from target; "
            "pass allow_drop=True to discard them"
        )
    cols = []
    for f in target.fields:
        if f.name.lower() in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return work.select(*cols)
