"""MessagePack decoder: full-type round trips, hand-crafted non-minimal
forms the writer never emits, caps, typed boundaries, truncation fuzz,
and the MIME-only document_extract routing (no sniff — the format has
no magic)."""

from __future__ import annotations

import struct

import pytest

from evm_archive_spark.operators.msgpackfile import (
    MsgpackError,
    build_msgpack,
    msgpack_records,
    msgpack_to_text,
)


def test_roundtrip_all_types_and_jsonl_face():
    vals = [
        {
            "id": 1, "body": "h\xe9llo 中", "n": -5, "ok": True,
            "x": None, "f": 3.5, "big": 2 ** 40, "huge": 2 ** 63,
            "neg": -(2 ** 20), "negbig": -(2 ** 40),
            "bl": b"\xde\xad", "xs": [1, "two", [3]],
            "m": {"k": 7, "nested": {"deep": [None, False]}},
        },
        "bare string", 42, -1, -32, 127, [True, False], {},
    ]
    b = build_msgpack(vals)
    assert msgpack_records(b) == vals
    import json

    line0 = msgpack_to_text(build_msgpack([vals[0]]))
    obj = json.loads(line0)
    assert obj["bl"] == "dead" and obj["huge"] == 2 ** 63


def test_hand_crafted_non_minimal_forms():
    # str16 for a 2-char string, map32, fixext4, uint64, bin16,
    # array16, float32 — forms build_msgpack never emits
    hand = (
        b"\xda\x00\x02hi"
        + b"\xdf\x00\x00\x00\x01\xa1k\x07"
        + b"\xd6\x05abcd"
        + b"\xcf" + struct.pack(">Q", 2 ** 63)
        + b"\xc5\x00\x03xyz"
        + b"\xdc\x00\x02\xc2\xc3"
        + b"\xca" + struct.pack(">f", 1.5)
    )
    got = msgpack_records(hand)
    assert got == [
        "hi",
        {"k": 7},
        {"__ext__": 5, "data": b"abcd"},
        2 ** 63,
        b"xyz",
        [False, True],
        1.5,
    ]


def test_caps_and_typed_boundaries():
    # reserved tag 0xc1 is typed
    with pytest.raises(MsgpackError, match="reserved"):
        msgpack_records(b"\xc1")
    # declared giant array is a typed cap error, not an allocation
    with pytest.raises(MsgpackError, match="cap"):
        msgpack_records(b"\xdd\xff\xff\xff\xff")
    # nesting bomb: 100 nested fixarray-of-1 ends in a typed error
    with pytest.raises(MsgpackError, match="depth"):
        msgpack_records(b"\x91" * 100 + b"\x01")
    # truncation fuzz
    good = build_msgpack(
        [{"a": [1, 2, {"b": b"xy"}], "s": "text"}, 7]
    )
    for cut in range(0, len(good), 3):
        try:
            msgpack_records(good[:cut])
        except MsgpackError:
            pass


def test_mime_only_dispatch(spark):
    import pandas as pd

    from evm_archive_spark.operators.extract import document_extract

    blob = build_msgpack([{"v": "row one"}])
    # WITH the msgpack MIME: decoded
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [0],
                "payload": [bytearray(blob)],
                "mime": ["application/x-msgpack"],
            }
        )
    )
    got = document_extract(df, mime_col="mime").collect()[0]
    assert got["format"] == "msgpack"
    assert got["text"] == '{"v": "row one"}'
    # WITHOUT a mime: never sniffed (no magic) — plain-text fallback
    df2 = spark.createDataFrame(
        pd.DataFrame({"media_id": [0], "payload": [bytearray(blob)]})
    )
    assert document_extract(df2).collect()[0]["format"] == "text"


def test_review_regressions_jsonl_validity_and_keys():
    """r7 review pins: infinities are valid-JSON null; bytes map keys
    round-trip at the records level and hex at the JSONL face;
    colliding numeric keys are a typed error; empty payloads are a
    typed error (dispatch falls through); out-of-range ints are typed
    at build time."""
    import json
    import struct

    # +/-inf -> null (bare 'Infinity' is not JSON)
    blob = b"\xcb" + struct.pack(">d", float("inf"))
    blob += b"\xcb" + struct.pack(">d", float("-inf"))
    lines = msgpack_to_text(blob).split("\n")
    assert [json.loads(ln) for ln in lines] == [None, None]

    # bytes map key: exact records round trip, hex in JSONL
    vals = [{b"\xde\xad": 1}]
    assert msgpack_records(build_msgpack(vals)) == vals
    assert json.loads(msgpack_to_text(build_msgpack(vals))) == {
        "dead": 1
    }

    # colliding keys (1 == true == 1.0) are typed, not silently merged
    collide = b"\x82" + b"\x01\x0a" + b"\xc3\x0b"   # {1:10, true:11}
    with pytest.raises(MsgpackError, match="colliding"):
        msgpack_records(collide)

    # empty payload is typed (so document_extract falls through)
    with pytest.raises(MsgpackError, match="empty"):
        msgpack_records(b"")
    # out-of-64-bit ints are typed at build time
    with pytest.raises(MsgpackError, match="64-bit"):
        build_msgpack([2 ** 64])
    with pytest.raises(MsgpackError, match="64-bit"):
        build_msgpack([-(2 ** 63) - 1])


def test_shared_canonicalizer_fixes_avro_nonfinite():
    """The consolidation onto util.json_canonical means an Avro double
    NaN/inf emits null in the JSONL face too (it used to leak the
    invalid bare token)."""
    import json

    from evm_archive_spark.operators.avrofile import (
        avro_to_text,
        build_avro,
    )

    schema = {
        "type": "record", "name": "F",
        "fields": [{"name": "x", "type": "double"}],
    }
    text = avro_to_text(
        build_avro(schema, [{"x": float("nan")}, {"x": float("inf")}])
    )
    assert [json.loads(ln) for ln in text.split("\n")] == [
        {"x": None},
        {"x": None},
    ]
