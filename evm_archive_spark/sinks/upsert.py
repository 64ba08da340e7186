"""Idempotent conflict-ignoring DBAPI sink (reference A8/A9).

The reference achieves effectively-exactly-once rows from an at-least-once
loop via PK + ``INSERT ... ON CONFLICT DO NOTHING`` (get_logs.go:118-132,
get_price.go:96, schema.sql:51/73).  Spark's ``df.write.jdbc`` cannot
express conflict-ignore, so this module hand-rolls it (SURVEY §4.3.1):

- ``dropDuplicates(pk)`` inside the batch collapses intra-batch replays;
- each partition opens ONE connection from a picklable factory and issues
  batched multi-row ``INSERT ... ON CONFLICT DO NOTHING`` statements;
- rows-affected is surfaced per batch ("inserted X of Y", get_logs.go:132).

Works against any DBAPI engine: psycopg2/Postgres in production (factory =
``psycopg2.connect`` closure), DuckDB in tests.  Unlike the reference
(connection per window, zero parallelism — SURVEY §4.1 anti-patterns), the
partition-parallel path gives N writers with per-partition batching.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class UpsertResult:
    attempted: int
    inserted: int  # -1 when the DBAPI driver doesn't report rowcount


def conflict_ignore_sql(
    table: str, columns: list[str], pk: list[str], paramstyle: str = "qmark"
) -> str:
    ph = "?" if paramstyle == "qmark" else "%s"
    cols = ", ".join(columns)
    vals = ", ".join([ph] * len(columns))
    conflict = ", ".join(pk)
    return (
        f"INSERT INTO {table} ({cols}) VALUES ({vals}) "
        f"ON CONFLICT ({conflict}) DO NOTHING"
    )


def _write_rows(
    rows: Iterable,
    columns: list[str],
    sql: str,
    connection_factory: Callable,
    batch_size: int,
) -> UpsertResult:
    conn = connection_factory()
    attempted = inserted = 0
    try:
        cur = conn.cursor()
        batch: list[tuple] = []

        def flush():
            nonlocal inserted
            if not batch:
                return
            cur.executemany(sql, batch)
            rc = getattr(cur, "rowcount", -1)
            if rc is not None and rc >= 0 and inserted >= 0:
                inserted += rc
            else:
                inserted = -1
            batch.clear()

        for row in rows:
            batch.append(tuple(row[c] for c in columns))
            attempted += 1
            if len(batch) >= batch_size:
                flush()
        flush()
        conn.commit()
    finally:
        conn.close()
    return UpsertResult(attempted, inserted)


def write_conflict_ignore(
    df: DataFrame,
    table: str,
    pk: list[str],
    connection_factory: Callable,
    *,
    paramstyle: str = "qmark",
    batch_size: int = 1000,
    parallel: bool = True,
) -> UpsertResult:
    """Idempotent insert of ``df`` into ``table`` keyed by ``pk``.

    ``parallel=True`` writes partition-parallel from executors (Postgres
    and other multi-writer stores).  ``parallel=False`` streams batches
    through the driver — for single-writer engines (the DuckDB test
    harness) or when the target cannot take N connections.
    """
    columns = df.columns
    deduped = df.dropDuplicates(pk)
    sql = conflict_ignore_sql(table, columns, pk, paramstyle)

    if not parallel:
        return _write_rows(
            deduped.toLocalIterator(), columns, sql, connection_factory, batch_size
        )

    def part(rows) -> Iterable[tuple[int, int]]:
        res = _write_rows(rows, columns, sql, connection_factory, batch_size)
        yield (res.attempted, res.inserted)

    counts = deduped.rdd.mapPartitions(part).collect()
    attempted = sum(a for a, _ in counts)
    inserted = -1 if any(i < 0 for _, i in counts) else sum(i for _, i in counts)
    return UpsertResult(attempted, inserted)


def foreach_batch_upsert(
    table: str,
    pk: list[str],
    connection_factory: Callable,
    *,
    paramstyle: str = "qmark",
    batch_size: int = 1000,
    parallel: bool = True,
    on_result: Callable[[int, UpsertResult], None] | None = None,
):
    """``foreachBatch`` adapter: streaming micro-batches -> idempotent sink.

    Spark's checkpoint gives at-least-once batch delivery; the PK +
    DO NOTHING collapses replays to exactly-once rows — the same
    crash-safety argument as the reference loop (SURVEY §4.1)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        res = write_conflict_ignore(
            batch_df,
            table,
            pk,
            connection_factory,
            paramstyle=paramstyle,
            batch_size=batch_size,
            parallel=parallel,
        )
        if on_result is not None:
            on_result(batch_id, res)

    return write


LOGS_DDL_GENERIC = """
CREATE TABLE IF NOT EXISTS logs (
  address           TEXT,
  topic0            TEXT,
  topic1            TEXT,
  topic2            TEXT,
  topic3            TEXT,
  data              TEXT,
  block_hash        TEXT,
  block_number      BIGINT,
  transaction_hash  TEXT,
  transaction_index BIGINT,
  log_index         BIGINT,
  removed           BOOLEAN,
  block_timestamp   TIMESTAMP,
  PRIMARY KEY (block_hash, transaction_hash, log_index)
)
"""

PRICE_DDL_GENERIC = """
CREATE TABLE IF NOT EXISTS price (
  address       TEXT,
  block_number  BIGINT,
  price         DECIMAL(20,0),
  PRIMARY KEY (address, block_number)
)
"""
