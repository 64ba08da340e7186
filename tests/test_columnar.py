"""Embedded Parquet / Arrow IPC payload linearization: canonical-writer
round trips, JSON value canonicalization (bytes/dates/NaN/nested),
caps, typed boundaries, truncation fuzz, and the document_extract
routing."""

from __future__ import annotations

import io
import json

import pyarrow as pa
import pyarrow.ipc as ipc
import pyarrow.parquet as pq
import pytest

from evm_archive_spark.operators.columnar import (
    ColumnarError,
    arrow_ipc_to_text,
    is_arrow_ipc,
    is_parquet,
    parquet_to_text,
)


def _pq(table: pa.Table) -> bytes:
    buf = io.BytesIO()
    pq.write_table(table, buf)
    return buf.getvalue()


def _ipc(table: pa.Table) -> bytes:
    buf = io.BytesIO()
    with ipc.new_file(buf, table.schema) as w:
        w.write_table(table)
    return buf.getvalue()


def test_jsonl_face_and_value_canonicalization():
    import datetime as dt

    table = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "body": pa.array(["h\xe9llo 中", ""], pa.string()),
            "bl": pa.array([b"\xde\xad", None], pa.binary()),
            "f": pa.array([1.5, float("nan")], pa.float64()),
            "d": pa.array([dt.date(2024, 2, 29), None], pa.date32()),
            "xs": pa.array([[1, 2], []], pa.list_(pa.int64())),
        }
    )
    for blob, sniff in ((_pq(table), is_parquet), (_ipc(table), is_arrow_ipc)):
        assert sniff(blob)
        text = (
            parquet_to_text(blob)
            if sniff is is_parquet
            else arrow_ipc_to_text(blob)
        )
        rows = [json.loads(line) for line in text.split("\n")]
        assert rows[0] == {
            "id": 1, "body": "h\xe9llo 中", "bl": "dead", "f": 1.5,
            "d": "2024-02-29", "xs": [1, 2],
        }
        # NaN canonicalizes to null (valid JSON), None stays null
        assert rows[1]["f"] is None and rows[1]["bl"] is None


def test_sniffs_are_disjoint_and_boundaries_typed():
    t = pa.table({"a": pa.array([1], pa.int64())})
    p, a = _pq(t), _ipc(t)
    assert is_parquet(p) and not is_arrow_ipc(p)
    assert is_arrow_ipc(a) and not is_parquet(a)
    with pytest.raises(ColumnarError):
        parquet_to_text(b"PAR1 garbage PAR1")
    with pytest.raises(ColumnarError):
        arrow_ipc_to_text(b"ARROW1 garbage")
    with pytest.raises(ColumnarError):
        parquet_to_text(a)
    for cut in range(0, len(p), 37):
        try:
            parquet_to_text(p[:cut])
        except ColumnarError:
            pass
    for cut in range(0, len(a), 37):
        try:
            arrow_ipc_to_text(a[:cut])
        except ColumnarError:
            pass


def _pooled_document_extract_routes_columnar(spark):
    import pandas as pd

    from evm_archive_spark.operators.extract import document_extract

    t = pa.table({"v": pa.array(["row one"], pa.string())})
    rows = pd.DataFrame(
        {
            "media_id": [0, 1],
            "payload": [bytearray(_pq(t)), bytearray(_ipc(t))],
        }
    )
    out = {
        r["media_id"]: r
        for r in document_extract(spark.createDataFrame(rows)).collect()
    }
    assert out[0]["format"] == "parquet"
    assert out[0]["text"] == '{"v": "row one"}'
    assert out[1]["format"] == "arrow"
    assert out[1]["text"] == '{"v": "row one"}'

    df2 = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [0],
                "payload": [bytearray(_pq(t))],
                "mime": ["application/vnd.apache.parquet"],
            }
        )
    )
    assert (
        document_extract(df2, mime_col="mime").collect()[0]["format"]
        == "parquet"
    )


# (routing check pooled into test_officedoc.test_extract_routing_pooled)
