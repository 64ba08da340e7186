"""Embedded columnar payloads (Parquet / Arrow IPC) -> the JSONL text
face.

Spark reads *files* of these formats natively, but corpora also carry
them as values in a binary column (dataset drops inside archives,
crawl artifacts, lakehouse exports) where only a per-payload reader
helps.  pyarrow is the canonical implementation and is part of this
environment's baseline (it already backs every mapInPandas boundary),
so unlike the from-scratch codec lanes this module deliberately
delegates the byte-level decoding to it and owns the dispatch,
bounding, and linearization:

- sniff: Parquet is ``PAR1`` at both ends; Arrow IPC files are
  ``ARROW1`` at the head.
- decode: ``pyarrow.parquet.read_table`` / ``pyarrow.ipc.open_file``
  over a BytesIO — no filesystem.
- linearize: one ``json.dumps`` object per row per line (the
  avrofile.avro_to_text contract): bytes hex-encode, dates/timestamps
  ISO-format, nested lists/structs/maps recurse.

Row and cell caps keep a crafted payload from exploding the task —
the archive-module bomb rule applied to columnar containers.
"""

from __future__ import annotations

import io
import json

from .codecerrors import guard

MAX_ROWS = 1 << 20          # linearization row cap
MAX_CELL_BYTES = 16 << 20   # single binary cell cap


class ColumnarError(Exception):
    """Malformed or out-of-scope Parquet/Arrow payload."""


def is_parquet(b: bytes) -> bool:
    return len(b) >= 12 and b[:4] == b"PAR1" and b[-4:] == b"PAR1"


def is_arrow_ipc(b: bytes) -> bool:
    return b[:6] == b"ARROW1"


def _table_to_jsonl(table) -> str:
    from .util import json_canonical

    if table.num_rows > MAX_ROWS:
        raise ColumnarError(
            f"{table.num_rows} rows exceed the linearization cap"
        )
    cols = table.column_names
    lines = []
    for row in table.to_pylist():
        # the shared canonicalizer raises ValueError past the cell
        # cap; @guard(ColumnarError) on the callers types it
        lines.append(
            json.dumps(
                {
                    k: json_canonical(row[k], MAX_CELL_BYTES)
                    for k in cols
                },
                ensure_ascii=False,
            )
        )
    return "\n".join(lines)


@guard(ColumnarError)
def parquet_to_text(b: bytes) -> str:
    """A Parquet payload -> JSONL, one object per row."""
    if not is_parquet(b):
        raise ColumnarError("not a Parquet payload")
    try:
        import pyarrow.parquet as pq
    except ImportError as e:                      # pragma: no cover
        raise ColumnarError(f"pyarrow unavailable: {e}") from e
    try:
        table = pq.read_table(io.BytesIO(b))
    except Exception as e:  # noqa: BLE001 - pyarrow raises ArrowInvalid etc.
        raise ColumnarError(f"bad Parquet payload: {e}") from e
    return _table_to_jsonl(table)


@guard(ColumnarError)
def arrow_ipc_to_text(b: bytes) -> str:
    """An Arrow IPC (Feather v2) file payload -> JSONL."""
    if not is_arrow_ipc(b):
        raise ColumnarError("not an Arrow IPC payload")
    try:
        import pyarrow.ipc as ipc
    except ImportError as e:                      # pragma: no cover
        raise ColumnarError(f"pyarrow unavailable: {e}") from e
    try:
        with ipc.open_file(io.BytesIO(b)) as rd:
            table = rd.read_all()
    except Exception as e:  # noqa: BLE001
        raise ColumnarError(f"bad Arrow payload: {e}") from e
    return _table_to_jsonl(table)
