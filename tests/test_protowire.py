"""Schemaless protobuf wire dump: round trips, repeated fields, all
wire types, flat-vs-nested determinism, typed boundaries, truncation
fuzz, and the MIME-only document_extract routing."""

from __future__ import annotations

import json
import struct

import pytest

from evm_archive_spark.operators.protowire import (
    ProtoWireError,
    build_protowire,
    protowire_fields,
    protowire_to_text,
)


def test_all_wire_types_and_repeated_fields():
    b = build_protowire(
        [
            (1, 5),
            (2, "hello \xe9"),
            (3, b"\x00\xff"),
            (2, "again"),
            (4, 1.5),
            (5, ""),
        ]
    )
    f = protowire_fields(b)
    assert f == {
        "1": 5,
        "2": ["hello \xe9", "again"],
        "3": b"\x00\xff",
        "4": struct.unpack("<Q", struct.pack("<d", 1.5))[0],
        "5": "",
    }
    obj = json.loads(protowire_to_text(b))
    assert obj["3"] == "00ff" and obj["2"] == ["hello \xe9", "again"]
    # hand-built i32 field (fixed32, wire type 5)
    hand = bytes([1 << 3 | 5]) + struct.pack("<I", 0xDEADBEEF)
    assert protowire_fields(hand) == {"1": 0xDEADBEEF}


def test_flat_mode_is_deterministic_nested_is_opt_in():
    inner = build_protowire([(1, 7)])
    outer = build_protowire([(5, inner)])
    # flat: the LEN payload has a control byte -> raw bytes (hex face)
    assert protowire_fields(outer) == {"5": inner}
    assert json.loads(protowire_to_text(outer)) == {"5": inner.hex()}
    # nested decode is explicit opt-in
    assert protowire_fields(outer, decode_nested=True) == {"5": {"1": 7}}
    # a LEN payload that fails nested parsing falls back to text/bytes
    s = build_protowire([(2, "plain words only")])
    assert protowire_fields(s, decode_nested=True)["2"] in (
        "plain words only",
        {"14": "in words only"},  # byte-coincidence parse is allowed
    )


def test_typed_boundaries_and_fuzz():
    with pytest.raises(ProtoWireError, match="empty"):
        protowire_fields(b"")
    with pytest.raises(ProtoWireError, match="field number 0"):
        protowire_fields(b"\x00")
    with pytest.raises(ProtoWireError, match="group"):
        protowire_fields(bytes([1 << 3 | 3]))
    with pytest.raises(ProtoWireError):
        build_protowire([(0, 1)])
    with pytest.raises(ProtoWireError):
        build_protowire([(1, -5)])
    good = build_protowire([(1, 300), (2, "text"), (3, b"\x01\x02")])
    for cut in range(0, len(good), 2):
        try:
            protowire_fields(good[:cut])
        except ProtoWireError:
            pass


def test_mime_only_dispatch(spark):
    import pandas as pd

    from evm_archive_spark.operators.extract import document_extract

    blob = build_protowire([(1, 9), (2, "row one")])
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [0],
                "payload": [bytearray(blob)],
                "mime": ["application/x-protobuf"],
            }
        )
    )
    got = document_extract(df, mime_col="mime").collect()[0]
    assert got["format"] == "protobuf"
    assert json.loads(got["text"]) == {"1": 9, "2": "row one"}
    # no mime -> never sniffed
    df2 = spark.createDataFrame(
        pd.DataFrame({"media_id": [0], "payload": [bytearray(blob)]})
    )
    assert document_extract(df2).collect()[0]["format"] == "text"


def test_varint_spec_cap_and_key_collision_canonicalization():
    """r7 review pins: varints cap at 10 bytes / 64 bits (an overlong
    one is a typed error, not a 2**70 value in the dump), and JSONL key
    canonicalization collisions raise rather than silently dropping a
    map entry."""
    from evm_archive_spark.operators.msgpackfile import (
        MsgpackError,
        msgpack_to_text,
    )
    from evm_archive_spark.operators.util import json_canonical

    # 11-byte varint -> typed (protobuf spec allows at most 10 bytes)
    with pytest.raises(ProtoWireError, match="varint"):
        protowire_fields(b"\x80" * 10 + b"\x01")
    # 10-byte varint whose value exceeds 64 bits -> typed
    with pytest.raises(ProtoWireError, match="64 bits"):
        protowire_fields(b"\xff" * 9 + b"\x7f")
    # max legal field key still parses
    assert protowire_fields(bytes([0xF8, 0x07, 0x2A])) == {"127": 42}

    # bytes key b'\xde\xad' vs str key 'dead' collide at the JSONL
    # face -> typed, never a silently dropped entry
    payload = b"\x82\xc4\x02\xde\xad\x01\xa4dead\x02"
    with pytest.raises(MsgpackError, match="collide"):
        msgpack_to_text(payload)
    with pytest.raises(ValueError, match="collide"):
        json_canonical({1: "a", "1": "b"})
    # non-colliding mixed keys stringify the way json.dumps would
    # (note {1: ..., True: ...} would collapse in the Python literal
    # itself before the canonicalizer could see it)
    assert json_canonical({2: "a", True: "b"}) == {"2": "a", "true": "b"}
