"""Chain-reorg tombstone resolution (§7 extension).

The reference stores ``removed`` tombstones verbatim and leaves a TODO to
reconcile them (get_logs.go:52, :107 "todo: if removed then delete by
unique key"). This operator implements that intended semantics on the
immutable-storage model: a log whose PK ever appears with
``removed = true`` was reorged out and must not surface; surviving PKs
keep exactly one row.

Scale shape: both passes are keyed on the PK — one ``dropDuplicates``
(map-side partial) and one left-anti join against the (tiny, reorgs are
rare) tombstone set, which AQE turns into a broadcast anti-join. Storing
tombstones instead of deleting keeps ingestion append-only/idempotent —
resolution is a view-time concern, exactly like decode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..schemas import LOGS_PK


def resolve_removed(logs: DataFrame, pk: list[str] | None = None) -> DataFrame:
    """Current-state view of an append-only logs table with tombstones:
    drop every PK that has a removed=true record, dedup the rest."""
    pk = pk or LOGS_PK
    tombstones = logs.filter(F.col("removed")).select(pk).distinct()
    return (
        logs.filter(~F.col("removed"))
        .dropDuplicates(pk)
        .join(F.broadcast(tombstones), pk, "left_anti")
    )
