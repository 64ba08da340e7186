"""MessagePack stream decoding — from scratch, stdlib only (public
spec: the msgpack.org format specification).

Data dumps and API captures ship as streams of concatenated
MessagePack objects.  The format has NO magic bytes, so dispatch is
MIME-driven only ("msgpack" in the declared type — the markdown rule);
the decoder never runs on sniffed bytes.

Full type coverage: nil/bool, all int widths (fixint through
u/int64), float32/64, str/bin in every length form, arrays and maps in
fix/16/32 forms, and ext/fixext (surfaced as ``{"__ext__": type,
"data": hex}``).  Depth and element caps bound crafted payloads.

Linearization (``msgpack_to_text``): one JSON object per TOP-LEVEL
value per line — the avrofile JSONL contract (bytes hex-encode,
non-string map keys stringify, NaN -> null).

``build_msgpack`` writes canonical smallest-form encodings for
fixtures and the q_msgpack gate; pytest additionally hand-crafts
non-minimal forms (str16 for a short string, map32, ext) the writer
never emits.
"""

from __future__ import annotations

import json
import struct

from .codecerrors import guard

MAX_ELEMENTS = 1 << 22   # per-container element cap
MAX_DEPTH = 64           # nesting cap


class MsgpackError(Exception):
    """Malformed or out-of-scope MessagePack payload."""


class _Reader:
    def __init__(self, b: bytes):
        self.b = b
        self.pos = 0

    def take(self, n: int) -> bytes:
        if n < 0 or self.pos + n > len(self.b):
            raise MsgpackError("truncated MessagePack data")
        out = self.b[self.pos:self.pos + n]
        self.pos += n
        return out

    def u(self, fmt: str) -> int:
        (v,) = struct.unpack(fmt, self.take(struct.calcsize(fmt)))
        return v

    def at_end(self) -> bool:
        return self.pos >= len(self.b)


def _decode(r: _Reader, depth: int = 0):
    if depth > MAX_DEPTH:
        raise MsgpackError("nesting over the depth cap")
    tag = r.take(1)[0]
    if tag <= 0x7F:                              # positive fixint
        return tag
    if 0x80 <= tag <= 0x8F:                      # fixmap
        return _map(r, tag & 0x0F, depth)
    if 0x90 <= tag <= 0x9F:                      # fixarray
        return _array(r, tag & 0x0F, depth)
    if 0xA0 <= tag <= 0xBF:                      # fixstr
        return r.take(tag & 0x1F).decode("utf-8", "replace")
    if tag >= 0xE0:                              # negative fixint
        return tag - 256
    if tag == 0xC0:
        return None
    if tag == 0xC2:
        return False
    if tag == 0xC3:
        return True
    if tag == 0xC4:
        return r.take(r.u(">B"))
    if tag == 0xC5:
        return r.take(r.u(">H"))
    if tag == 0xC6:
        return r.take(r.u(">I"))
    if tag in (0xC7, 0xC8, 0xC9):                # ext 8/16/32
        n = r.u({0xC7: ">B", 0xC8: ">H", 0xC9: ">I"}[tag])
        t = r.u(">b")
        return {"__ext__": t, "data": r.take(n)}
    if tag == 0xCA:
        return struct.unpack(">f", r.take(4))[0]
    if tag == 0xCB:
        return struct.unpack(">d", r.take(8))[0]
    if tag == 0xCC:
        return r.u(">B")
    if tag == 0xCD:
        return r.u(">H")
    if tag == 0xCE:
        return r.u(">I")
    if tag == 0xCF:
        return r.u(">Q")
    if tag == 0xD0:
        return r.u(">b")
    if tag == 0xD1:
        return r.u(">h")
    if tag == 0xD2:
        return r.u(">i")
    if tag == 0xD3:
        return r.u(">q")
    if 0xD4 <= tag <= 0xD8:                      # fixext 1/2/4/8/16
        t = r.u(">b")
        return {"__ext__": t, "data": r.take(1 << (tag - 0xD4))}
    if tag == 0xD9:
        return r.take(r.u(">B")).decode("utf-8", "replace")
    if tag == 0xDA:
        return r.take(r.u(">H")).decode("utf-8", "replace")
    if tag == 0xDB:
        return r.take(r.u(">I")).decode("utf-8", "replace")
    if tag == 0xDC:
        return _array(r, r.u(">H"), depth)
    if tag == 0xDD:
        return _array(r, r.u(">I"), depth)
    if tag == 0xDE:
        return _map(r, r.u(">H"), depth)
    if tag == 0xDF:
        return _map(r, r.u(">I"), depth)
    raise MsgpackError(f"reserved type tag 0x{tag:02X}")


def _array(r: _Reader, n: int, depth: int) -> list:
    if n > MAX_ELEMENTS:
        raise MsgpackError("array count over cap")
    return [_decode(r, depth + 1) for _ in range(n)]


def _map(r: _Reader, n: int, depth: int) -> dict:
    if n > MAX_ELEMENTS:
        raise MsgpackError("map count over cap")
    out = {}
    for _ in range(n):
        k = _decode(r, depth + 1)
        if not isinstance(k, (str, int, float, bool, bytes)):
            # container/ext keys can't be dict keys; canonicalize
            from .util import json_canonical

            k = json.dumps(json_canonical(k), ensure_ascii=False)
        if k in out:
            # Python collapses numerically-equal keys of different
            # msgpack types (1 == True == 1.0) — silent entry loss;
            # duplicate keys are spec-invalid anyway, so type it
            raise MsgpackError("duplicate or colliding map key")
        out[k] = _decode(r, depth + 1)
    return out


@guard(MsgpackError)
def msgpack_records(b: bytes) -> list:
    """Decode a stream of concatenated top-level MessagePack values."""
    if not b:
        # an empty payload must FALL THROUGH in document_extract, not
        # report a successful zero-record msgpack extraction (every
        # other lane raises on empty bytes)
        raise MsgpackError("empty payload")
    r = _Reader(b)
    out = []
    while not r.at_end():
        out.append(_decode(r))
        if len(out) > MAX_ELEMENTS:
            raise MsgpackError("stream object count over cap")
    return out


@guard(MsgpackError)
def msgpack_to_text(b: bytes) -> str:
    """Linearize a MessagePack stream to JSONL: one json.dumps object
    per top-level value per line (shared canonicalizer: bytes hex,
    non-finite floats null, bytes keys hex)."""
    from .util import json_canonical

    return "\n".join(
        json.dumps(json_canonical(v), ensure_ascii=False)
        for v in msgpack_records(b)
    )


# -- synthesis writer ----------------------------------------------------------

def _encode(out: bytearray, v, depth: int = 0):
    if depth > MAX_DEPTH:
        raise MsgpackError("nesting over the depth cap")
    if v is None:
        out.append(0xC0)
    elif isinstance(v, bool):
        out.append(0xC3 if v else 0xC2)
    elif isinstance(v, int):
        if v > 0xFFFFFFFFFFFFFFFF or v < -(1 << 63):
            raise MsgpackError(f"int {v} outside the 64-bit range")
        if 0 <= v <= 0x7F:
            out.append(v)
        elif -32 <= v < 0:
            out.append(v & 0xFF)
        elif 0 <= v <= 0xFF:
            out += struct.pack(">BB", 0xCC, v)
        elif 0 <= v <= 0xFFFF:
            out += struct.pack(">BH", 0xCD, v)
        elif 0 <= v <= 0xFFFFFFFF:
            out += struct.pack(">BI", 0xCE, v)
        elif 0 <= v:
            out += struct.pack(">BQ", 0xCF, v)
        elif v >= -(1 << 7):
            out += struct.pack(">Bb", 0xD0, v)
        elif v >= -(1 << 15):
            out += struct.pack(">Bh", 0xD1, v)
        elif v >= -(1 << 31):
            out += struct.pack(">Bi", 0xD2, v)
        else:
            out += struct.pack(">Bq", 0xD3, v)
    elif isinstance(v, float):
        out += struct.pack(">Bd", 0xCB, v)
    elif isinstance(v, str):
        raw = v.encode("utf-8")
        n = len(raw)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += struct.pack(">BB", 0xD9, n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDA, n)
        else:
            out += struct.pack(">BI", 0xDB, n)
        out += raw
    elif isinstance(v, bytes):
        n = len(v)
        if n <= 0xFF:
            out += struct.pack(">BB", 0xC4, n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xC5, n)
        else:
            out += struct.pack(">BI", 0xC6, n)
        out += v
    elif isinstance(v, list):
        n = len(v)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDC, n)
        else:
            out += struct.pack(">BI", 0xDD, n)
        for item in v:
            _encode(out, item, depth + 1)
    elif isinstance(v, dict):
        n = len(v)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDE, n)
        else:
            out += struct.pack(">BI", 0xDF, n)
        for k, item in v.items():
            _encode(out, k, depth + 1)
            _encode(out, item, depth + 1)
    else:
        raise MsgpackError(f"unencodable type {type(v).__name__}")


@guard(MsgpackError)
def build_msgpack(values: list) -> bytes:
    """Encode top-level values as a concatenated stream in canonical
    smallest forms.  ``msgpack_records(build_msgpack(vs))`` round-trips
    exactly (bytes map keys included; the JSONL face hexes them)."""
    out = bytearray()
    for v in values:
        _encode(out, v)
    return bytes(out)
