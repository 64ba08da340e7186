"""Protocol Buffers wire-format dump WITHOUT a schema — from scratch,
stdlib only (public spec: the protobuf.dev encoding documentation).

Crawls and log dumps carry protobuf payloads whose ``.proto`` schema is
long gone; the wire format alone still yields field numbers and values
(the protoscope idea).  The format has NO magic bytes, so dispatch is
MIME-driven only (the msgpack rule) — never sniffed.

Wire types: 0 VARINT, 1 I64 (8 bytes LE), 5 I32 (4 bytes LE), 2 LEN
(length-delimited).  Groups (3/4) are obsolete and surface as a typed
error.  Without a schema the dump is deliberately conservative and
DETERMINISTIC:

- varints/i64/i32 report as their raw unsigned integers (zigzag or
  float reinterpretation needs the schema);
- LEN fields report as UTF-8 text when they decode cleanly and carry
  no control characters (tab/newline allowed), else hex — nested
  messages are NOT auto-parsed by default because the "does it parse
  as a message" heuristic makes output depend on byte coincidences;
  ``decode_nested=True`` opts in for exploration;
- repeated fields collect into arrays in wire order.

Linearization: ONE JSON object per payload (a protobuf payload is one
message, not a stream): ``{"<field#>": value | [values]}`` — the
JSONL face contract via the shared canonicalizer.

``build_protowire`` encodes fixture messages; gate q_protowire
round-trips messages built from document text.
"""

from __future__ import annotations

import json
import struct

from .codecerrors import guard

MAX_FIELDS = 1 << 20   # field-count cap
MAX_DEPTH = 32         # opt-in nested decode cap


class ProtoWireError(Exception):
    """Malformed or out-of-scope protobuf wire payload."""


def _varint(b: bytes, i: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        if i >= len(b):
            raise ProtoWireError("truncated varint")
        byte = b[i]
        i += 1
        v |= (byte & 0x7F) << shift
        if not byte & 0x80:
            if v >> 64:
                raise ProtoWireError("varint exceeds 64 bits")
            return v, i
        shift += 7
        if shift >= 70:                # spec cap: 10 bytes / 64 bits
            raise ProtoWireError("varint too long")


def _text_or_bytes(raw: bytes) -> str | bytes:
    """LEN payload face: clean text stays text, anything else is raw
    bytes (hex at the JSONL face)."""
    try:
        s = raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw
    if any(ord(c) < 0x20 and c not in "\t\n\r" for c in s):
        return raw
    return s


def _parse(b: bytes, depth: int, decode_nested: bool) -> dict:
    out: dict[str, object] = {}
    i = 0
    nfields = 0
    while i < len(b):
        key, i = _varint(b, i)
        field, wt = key >> 3, key & 0x7
        if field == 0:
            raise ProtoWireError("field number 0 is invalid")
        nfields += 1
        if nfields > MAX_FIELDS:
            raise ProtoWireError("field count over cap")
        if wt == 0:
            v, i = _varint(b, i)
        elif wt == 1:
            if i + 8 > len(b):
                raise ProtoWireError("truncated i64 field")
            (v,) = struct.unpack_from("<Q", b, i)
            i += 8
        elif wt == 5:
            if i + 4 > len(b):
                raise ProtoWireError("truncated i32 field")
            (v,) = struct.unpack_from("<I", b, i)
            i += 4
        elif wt == 2:
            n, i = _varint(b, i)
            if n < 0 or i + n > len(b):
                raise ProtoWireError("LEN field overruns payload")
            raw = b[i:i + n]
            i += n
            v = None
            if decode_nested and raw and depth < MAX_DEPTH:
                try:
                    v = _parse(raw, depth + 1, decode_nested)
                except ProtoWireError:
                    v = None
            if v is None:
                v = _text_or_bytes(raw)
        elif wt in (3, 4):
            raise ProtoWireError(
                "deprecated group wire types are out of scope"
            )
        else:
            raise ProtoWireError(f"reserved wire type {wt}")
        k = str(field)
        if k in out:
            prev = out[k]
            if isinstance(prev, list):
                prev.append(v)
            else:
                out[k] = [prev, v]
        else:
            out[k] = v
    return out


@guard(ProtoWireError)
def protowire_fields(b: bytes, decode_nested: bool = False) -> dict:
    """Parse one schemaless protobuf message -> ``{"<field#>": value |
    [values]}``."""
    if not b:
        raise ProtoWireError("empty payload")
    return _parse(b, 0, decode_nested)


@guard(ProtoWireError)
def protowire_to_text(b: bytes) -> str:
    """One JSON object for the message (the JSONL face; bytes hex via
    the shared canonicalizer)."""
    from .util import json_canonical

    return json.dumps(
        json_canonical(protowire_fields(b)), ensure_ascii=False
    )


# -- synthesis writer ----------------------------------------------------------

def _put_varint(out: bytearray, v: int) -> None:
    if v < 0:
        raise ProtoWireError("wire varints are unsigned")
    while True:
        byte = v & 0x7F
        v >>= 7
        if v:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return


@guard(ProtoWireError)
def build_protowire(fields: list[tuple[int, object]]) -> bytes:
    """Encode ``(field_number, value)`` pairs in order: ints as
    varints, str/bytes as LEN, floats as I64 doubles' raw bits.  The
    decoder's dump of the result is exact for clean-text strings and
    unsigned ints."""
    out = bytearray()
    for field, v in fields:
        if field < 1:
            raise ProtoWireError("field numbers start at 1")
        if isinstance(v, bool) or isinstance(v, int):
            _put_varint(out, field << 3 | 0)
            _put_varint(out, int(v))
        elif isinstance(v, float):
            _put_varint(out, field << 3 | 1)
            out += struct.pack("<Q", struct.unpack("<Q", struct.pack("<d", v))[0])
        elif isinstance(v, str):
            raw = v.encode("utf-8")
            _put_varint(out, field << 3 | 2)
            _put_varint(out, len(raw))
            out += raw
        elif isinstance(v, bytes):
            _put_varint(out, field << 3 | 2)
            _put_varint(out, len(v))
            out += v
        else:
            raise ProtoWireError(f"unencodable type {type(v).__name__}")
    return bytes(out)
