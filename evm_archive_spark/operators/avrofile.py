"""Apache Avro Object Container File reader/writer — from scratch,
stdlib only (public spec: Avro 1.11 "Object Container Files" +
"Binary Encoding").

Data pipelines meet ``.avro`` drops constantly (Kafka dumps, warehouse
exports).  A container file is:

    magic "Obj\\x01"
    file metadata (an Avro map<bytes>: avro.schema JSON, avro.codec)
    16-byte sync marker
    data blocks: [record count: long][serialized size: long]
                 [payload, possibly deflate][sync marker]

Binary encoding: long/int are zigzag base-128 varints; string/bytes are
length-prefixed; records are field concatenations in schema order;
arrays/maps are block sequences (negative count = abs count + a block
size long); unions are index + branch; enums an index; fixed raw
bytes.  The whole core type system is implemented — logical types
surface as their base type, which is all a text face needs.

Linearization (``avro_to_text``): one JSON object per record per line
(the JSONL face the rest of the extraction lane already speaks);
``bytes``/``fixed`` values hex-encode.

``build_avro`` is the synthesis writer (the pdf.build_simple_pdf
pattern) for fixtures and the q_avro gate; pytest additionally
hand-crafts byte-level fixtures (deflate codec, multi-block files,
size-prefixed negative array counts) the writer never emits.

Reference parity note: the reference (SummaryDev/evm-archive) has no
document surface; this extends the training-pipeline extraction lane.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

from .codecerrors import guard

MAGIC = b"Obj\x01"
MAX_BLOCK_BYTES = 64 * 1024 * 1024   # per-block inflate cap
MAX_ITEMS = 1 << 22                  # array/map/record-count sanity cap
MAX_TOTAL_ITEMS = 1 << 22            # cumulative decoded values per FILE:
                                     # empty records / null items consume
                                     # zero input bytes, so per-block caps
                                     # alone let a 500-byte container fan
                                     # out to GBs of allocations
MAX_DEPTH = 64                       # schema/value nesting cap (msgpack rule)


class _Budget:
    """Cumulative decoded-value allowance for one container file."""

    __slots__ = ("items",)

    def __init__(self, items: int = MAX_TOTAL_ITEMS):
        self.items = items

    def spend(self, n: int = 1):
        self.items -= n
        if self.items < 0:
            raise AvroError("decoded item count over file cap")


class AvroError(Exception):
    """Malformed or out-of-scope Avro payload."""


def is_avro(b: bytes) -> bool:
    return b[:4] == MAGIC


class _Reader:
    def __init__(self, b: bytes):
        self.b = b
        self.pos = 0

    def take(self, n: int) -> bytes:
        if n < 0 or self.pos + n > len(self.b):
            raise AvroError("truncated Avro data")
        out = self.b[self.pos:self.pos + n]
        self.pos += n
        return out

    def long(self) -> int:
        """Zigzag base-128 varint."""
        n = shift = 0
        while True:
            if self.pos >= len(self.b):
                raise AvroError("truncated varint")
            byte = self.b[self.pos]
            self.pos += 1
            n |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift >= 70:            # spec cap: 10 bytes / 64 bits
                raise AvroError("varint too long")
        return (n >> 1) ^ -(n & 1)

    def string(self) -> str:
        return self.take(self.long()).decode("utf-8", "replace")

    def at_end(self) -> bool:
        return self.pos >= len(self.b)


def _named(schema, names: dict):
    """Resolve a schema node: strings are primitive names or references
    to previously-defined named types."""
    if isinstance(schema, str):
        if schema in names:
            return names[schema]
        return schema
    return schema


def _register(schema, names: dict, depth: int = 0):
    """Walk a schema JSON, registering named types (record/enum/fixed)
    by full name so later references resolve."""
    if depth > MAX_DEPTH:
        raise AvroError("schema nesting too deep")
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed"):
            name = schema.get("name")
            if name:
                ns = schema.get("namespace")
                names[name] = schema
                if ns:
                    names[f"{ns}.{name}"] = schema
        if t == "record":
            for f in schema.get("fields", []):
                _register(f.get("type"), names, depth + 1)
        elif t in ("array",):
            _register(schema.get("items"), names, depth + 1)
        elif t in ("map",):
            _register(schema.get("values"), names, depth + 1)
    elif isinstance(schema, list):
        for s in schema:
            _register(s, names, depth + 1)


def _decode(r: _Reader, schema, names: dict, budget: _Budget,
            depth: int = 0):
    if depth > MAX_DEPTH:
        raise AvroError("value nesting too deep")
    budget.spend()
    schema = _named(schema, names)
    if isinstance(schema, list):                    # union
        idx = r.long()
        if not 0 <= idx < len(schema):
            raise AvroError(f"union index {idx} out of range")
        return _decode(r, schema[idx], names, budget, depth + 1)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: _decode(r, f["type"], names, budget, depth + 1)
                for f in schema.get("fields", [])
            }
        if t == "enum":
            idx = r.long()
            syms = schema.get("symbols", [])
            if not 0 <= idx < len(syms):
                raise AvroError(f"enum index {idx} out of range")
            return syms[idx]
        if t == "fixed":
            return r.take(int(schema["size"]))
        if t == "array":
            out = []
            while True:
                n = r.long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.long()                        # block size, unused
                if n > MAX_ITEMS:
                    raise AvroError("array block count over cap")
                for _ in range(n):
                    out.append(
                        _decode(r, schema["items"], names, budget,
                                depth + 1))
        if t == "map":
            out = {}
            while True:
                n = r.long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.long()
                if n > MAX_ITEMS:
                    raise AvroError("map block count over cap")
                for _ in range(n):
                    k = r.string()
                    out[k] = _decode(r, schema["values"], names, budget,
                                     depth + 1)
        # {"type": "string"} etc. — unwrap to the primitive
        return _decode(r, t, names, budget, depth + 1)
    if schema == "null":
        return None
    if schema == "boolean":
        v = r.take(1)[0]
        return v != 0
    if schema in ("int", "long"):
        return r.long()
    if schema == "float":
        return struct.unpack("<f", r.take(4))[0]
    if schema == "double":
        return struct.unpack("<d", r.take(8))[0]
    if schema == "bytes":
        return r.take(r.long())
    if schema == "string":
        return r.string()
    raise AvroError(f"unsupported schema {schema!r}")


def _read_meta_map(r: _Reader) -> dict[str, bytes]:
    out: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            return out
        if n < 0:
            n = -n
            r.long()
        if n > MAX_ITEMS:
            raise AvroError("metadata block count over cap")
        for _ in range(n):
            k = r.string()
            out[k] = r.take(r.long())


@guard(AvroError)
def avro_records(b: bytes) -> tuple[object, list]:
    """Parse an Avro Object Container File -> ``(schema_json,
    records)``."""
    if not is_avro(b):
        raise AvroError("not an Avro container")
    r = _Reader(b)
    r.take(4)
    meta = _read_meta_map(r)
    if "avro.schema" not in meta:
        raise AvroError("container missing avro.schema")
    try:
        schema = json.loads(meta["avro.schema"])
    except (ValueError, RecursionError) as e:
        raise AvroError(f"bad schema JSON: {e}") from e
    codec = meta.get("avro.codec", b"null").decode("ascii", "replace")
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    sync = r.take(16)
    names: dict = {}
    _register(schema, names)
    records = []
    budget = _Budget()                 # cumulative across ALL blocks
    while not r.at_end():
        count = r.long()
        size = r.long()
        if count < 0 or count > MAX_ITEMS:
            raise AvroError("block record count out of range")
        payload = r.take(size)
        if codec == "deflate":
            d = zlib.decompressobj(-15)
            payload = d.decompress(payload, MAX_BLOCK_BYTES)
            if d.unconsumed_tail:
                raise AvroError("deflate block exceeds the inflate cap")
            payload += d.flush()
        if r.take(16) != sync:
            raise AvroError("data block sync marker mismatch")
        br = _Reader(payload)
        for _ in range(count):
            records.append(_decode(br, schema, names, budget))
    return schema, records


@guard(AvroError)
def avro_to_text(b: bytes) -> str:
    """Linearize an Avro container to JSONL: one ``json.dumps`` object
    per record per line (bytes/fixed hex-encoded, non-finite doubles
    null — shared canonicalizer) — the text face the extraction lane
    already speaks for notebooks and JSON."""
    from .util import json_canonical

    _schema, records = avro_records(b)
    return "\n".join(
        json.dumps(json_canonical(rec), ensure_ascii=False)
        for rec in records
    )


# -- synthesis writer ----------------------------------------------------------

class _Writer:
    def __init__(self):
        self.buf = io.BytesIO()

    def raw(self, b: bytes):
        self.buf.write(b)

    def long(self, v: int):
        n = (v << 1) ^ (v >> 63)
        while True:
            byte = n & 0x7F
            n >>= 7
            if n:
                self.buf.write(bytes([byte | 0x80]))
            else:
                self.buf.write(bytes([byte]))
                return

    def string(self, s: str):
        raw = s.encode("utf-8")
        self.long(len(raw))
        self.raw(raw)

    def getvalue(self) -> bytes:
        return self.buf.getvalue()


def _encode(w: _Writer, schema, v, names: dict):
    schema = _named(schema, names)
    if isinstance(schema, list):
        for i, branch in enumerate(schema):
            bt = _named(branch, names)
            if _matches(bt, v):
                w.long(i)
                _encode(w, branch, v, names)
                return
        raise AvroError(f"no union branch for {type(v).__name__}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema.get("fields", []):
                _encode(w, f["type"], v[f["name"]], names)
            return
        if t == "enum":
            w.long(schema["symbols"].index(v))
            return
        if t == "fixed":
            if len(v) != int(schema["size"]):
                raise AvroError("fixed value size mismatch")
            w.raw(v)
            return
        if t == "array":
            if v:
                w.long(len(v))
                for item in v:
                    _encode(w, schema["items"], item, names)
            w.long(0)
            return
        if t == "map":
            if v:
                w.long(len(v))
                for k, item in v.items():
                    w.string(k)
                    _encode(w, schema["values"], item, names)
            w.long(0)
            return
        _encode(w, t, v, names)
        return
    if schema == "null":
        return
    if schema == "boolean":
        w.raw(b"\x01" if v else b"\x00")
    elif schema in ("int", "long"):
        w.long(int(v))
    elif schema == "float":
        w.raw(struct.pack("<f", v))
    elif schema == "double":
        w.raw(struct.pack("<d", v))
    elif schema == "bytes":
        w.long(len(v))
        w.raw(v)
    elif schema == "string":
        w.string(v)
    else:
        raise AvroError(f"unsupported schema {schema!r}")


def _matches(schema, v) -> bool:
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return isinstance(v, dict)
        if t == "enum":
            return isinstance(v, str)
        if t == "fixed":
            return isinstance(v, bytes)
        if t == "array":
            return isinstance(v, list)
        if t == "map":
            return isinstance(v, dict)
        schema = t
    return {
        "null": v is None,
        "boolean": isinstance(v, bool),
        "int": isinstance(v, int) and not isinstance(v, bool),
        "long": isinstance(v, int) and not isinstance(v, bool),
        "float": isinstance(v, float),
        "double": isinstance(v, float),
        "bytes": isinstance(v, bytes),
        "string": isinstance(v, str),
    }.get(schema, False)


def build_avro(
    schema, records: list, codec: str = "null",
    records_per_block: int = 1000,
) -> bytes:
    """Write an Avro Object Container File: metadata map, deterministic
    sync marker, records split across data blocks, optional deflate.
    ``avro_records(build_avro(s, recs))`` round-trips exactly."""
    import hashlib

    names: dict = {}
    _register(schema, names)
    schema_json = json.dumps(schema, separators=(",", ":"))
    sync = hashlib.md5(schema_json.encode()).digest()
    w = _Writer()
    w.raw(MAGIC)
    w.long(2)
    w.string("avro.schema")
    raw = schema_json.encode()
    w.long(len(raw))
    w.raw(raw)
    w.string("avro.codec")
    w.long(len(codec))
    w.raw(codec.encode())
    w.long(0)
    w.raw(sync)
    for off in range(0, len(records), records_per_block):
        chunk = records[off:off + records_per_block]
        bw = _Writer()
        for rec in chunk:
            _encode(bw, schema, rec, names)
        payload = bw.getvalue()
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]   # raw deflate
        w.long(len(chunk))
        w.long(len(payload))
        w.raw(payload)
        w.raw(sync)
    return w.getvalue()
