"""Avro object-container reader: full-type round trips, deflate codec,
multi-block files, hand-crafted byte-level fixtures the writer never
emits (size-prefixed negative array counts, sync mismatch), typed
boundaries, truncation fuzz, and the document_extract routing."""

from __future__ import annotations

import json
import struct

import pytest

from evm_archive_spark.operators.avrofile import (
    AvroError,
    avro_records,
    avro_to_text,
    build_avro,
    is_avro,
)

_SCHEMA = {
    "type": "record", "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "body", "type": "string"},
        {"name": "n", "type": "int"},
        {"name": "ok", "type": "boolean"},
        {"name": "score", "type": "double"},
        {"name": "opt", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {
            "name": "kind",
            "type": {"type": "enum", "name": "K", "symbols": ["A", "B"]},
        },
        {"name": "fp", "type": {"type": "fixed", "name": "F", "size": 4}},
        {"name": "blob", "type": "bytes"},
    ],
}
_RECS = [
    {
        "id": -5, "body": "h\xe9llo 中", "n": 42, "ok": True,
        "score": 3.5, "opt": None, "tags": ["x", "y"],
        "attrs": {"a": 1, "b": -2}, "kind": "B",
        "fp": b"\x01\x02\x03\x04", "blob": b"\xde\xad",
    },
    {
        "id": 2 ** 40, "body": "", "n": 0, "ok": False, "score": -0.25,
        "opt": "present", "tags": [], "attrs": {}, "kind": "A",
        "fp": b"zzzz", "blob": b"",
    },
]


def test_roundtrip_all_core_types_both_codecs():
    for codec in ("null", "deflate"):
        b = build_avro(_SCHEMA, _RECS, codec=codec)
        assert is_avro(b) and not is_avro(b"Obj\x02")
        schema, recs = avro_records(b)
        assert recs == _RECS
    line0 = avro_to_text(build_avro(_SCHEMA, _RECS[:1]))
    obj = json.loads(line0)
    assert obj["fp"] == "01020304" and obj["blob"] == "dead"
    assert obj["body"] == "h\xe9llo 中"


def test_multi_block_and_nested_named_reference():
    b = build_avro(_SCHEMA, _RECS * 500, records_per_block=7)
    _s, recs = avro_records(b)
    assert len(recs) == 1000 and recs[:2] == _RECS

    nested = {
        "type": "record", "name": "Outer",
        "fields": [
            {
                "name": "a",
                "type": {
                    "type": "record", "name": "Inner",
                    "fields": [{"name": "v", "type": "int"}],
                },
            },
            {"name": "b", "type": "Inner"},   # named-type reference
        ],
    }
    vals = [{"a": {"v": 1}, "b": {"v": 2}}]
    _s, recs = avro_records(build_avro(nested, vals))
    assert recs == vals


def _zz(v: int) -> bytes:
    n = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        byte = n & 0x7F
        n >>= 7
        if n:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def test_hand_crafted_negative_array_block_count():
    # the spec's size-prefixed form: count < 0 means |count| items
    # preceded by a byte-size long — build_avro never writes it
    schema = {
        "type": "record", "name": "R",
        "fields": [
            {"name": "xs", "type": {"type": "array", "items": "int"}}
        ],
    }
    sjson = json.dumps(schema, separators=(",", ":")).encode()
    sync = b"S" * 16
    body = _zz(-2) + _zz(2) + _zz(7) + _zz(8) + _zz(0)  # [-2 count][size][7,8][end]
    blob = (
        b"Obj\x01"
        + _zz(1) + _zz(len("avro.schema")) + b"avro.schema"
        + _zz(len(sjson)) + sjson + _zz(0)
        + sync
        + _zz(1) + _zz(len(body)) + body + sync
    )
    _s, recs = avro_records(blob)
    assert recs == [{"xs": [7, 8]}]


def test_typed_boundaries_and_fuzz():
    with pytest.raises(AvroError):
        avro_records(b"not avro")
    good = build_avro(_SCHEMA, _RECS)
    # sync marker mismatch is typed
    corrupt = good[:-1] + bytes([good[-1] ^ 0xFF])
    with pytest.raises(AvroError, match="sync"):
        avro_records(corrupt)
    # unsupported codec is typed ("deflate" appears nowhere else in
    # the header, unlike "null" which the union schema JSON contains)
    b = build_avro(_SCHEMA, _RECS, codec="deflate")
    bad = b.replace(b"deflate", b"zstdzzz", 1)
    with pytest.raises(AvroError, match="codec"):
        avro_records(bad)
    for cut in range(0, len(good), 31):
        try:
            avro_records(good[:cut])
        except AvroError:
            pass


def _pooled_document_extract_routes_avro(spark):
    import pandas as pd

    from evm_archive_spark.operators.extract import document_extract

    schema = {
        "type": "record", "name": "T",
        "fields": [{"name": "v", "type": "string"}],
    }
    avro = build_avro(schema, [{"v": "row one"}, {"v": "row two"}])
    out = document_extract(
        spark.createDataFrame(
            pd.DataFrame({"media_id": [0], "payload": [bytearray(avro)]})
        )
    ).collect()[0]
    assert out["format"] == "avro"
    assert out["text"] == '{"v": "row one"}\n{"v": "row two"}'

    df2 = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [0],
                "payload": [bytearray(avro)],
                "mime": ["application/avro"],
            }
        )
    )
    assert (
        document_extract(df2, mime_col="mime").collect()[0]["format"]
        == "avro"
    )


# (routing check pooled into test_officedoc.test_extract_routing_pooled)


def _container(schema_json: bytes, blocks: list[tuple[int, bytes]],
               sync: bytes = b"S" * 16) -> bytes:
    head = (
        b"Obj\x01"
        + _zz(1) + _zz(len("avro.schema")) + b"avro.schema"
        + _zz(len(schema_json)) + schema_json + _zz(0)
        + sync
    )
    for count, body in blocks:
        head += _zz(count) + _zz(len(body)) + body + sync
    return head


def test_zero_byte_record_amplification_is_capped():
    # empty records consume NO input bytes: 8 blocks x 4M empty
    # records in a ~100-byte container used to allocate 32M dicts.
    # The cumulative file budget must fire, and fast.
    import time

    sjson = json.dumps(
        {"type": "record", "name": "E", "fields": []},
        separators=(",", ":"),
    ).encode()
    bomb = _container(sjson, [(1 << 22, b"")] * 8)
    assert len(bomb) < 256
    t0 = time.monotonic()
    with pytest.raises(AvroError, match="file cap"):
        avro_records(bomb)
    assert time.monotonic() - t0 < 30


def test_recursive_value_depth_is_typed():
    # recursive named schema + a run of union-index-1 bytes used to
    # blow the Python stack with a RecursionError that escaped the
    # AvroError contract; now a typed nesting error
    sjson = json.dumps(
        {
            "type": "record", "name": "N",
            "fields": [{"name": "c", "type": ["null", "N"]}],
        },
        separators=(",", ":"),
    ).encode()
    body = _zz(1) * 500 + _zz(0)      # 500 levels, then the null branch
    with pytest.raises(AvroError, match="nesting"):
        avro_records(_container(sjson, [(1, body)]))


def test_deep_schema_json_is_typed():
    # json.loads of a deeply-nested schema raises RecursionError —
    # must surface as AvroError, not escape document_extract
    sjson = b"[" * 5000 + b"]" * 5000
    with pytest.raises(AvroError, match="schema"):
        avro_records(_container(sjson, []))


def test_deep_schema_registration_is_typed():
    # a parseable but deeply-nested schema must hit the _register
    # depth cap, not the interpreter stack
    inner: object = "int"
    for _ in range(200):
        inner = {"type": "array", "items": inner}
    sjson = json.dumps(inner, separators=(",", ":")).encode()
    with pytest.raises(AvroError, match="nesting"):
        avro_records(_container(sjson, []))
