"""Font asset metadata — TTF/OTF, WOFF and WOFF2, from scratch
(public formats: the OpenType/SFNT spec, W3C WOFF 1.0, W3C WOFF 2.0).

Web crawls fetch font files constantly (every site serves WOFF2);
an asset pipeline needs their identity face for dedup and licensing
triage without a font renderer.  This module reads the metadata:

- **SFNT** (TTF ``\\x00\\x01\\x00\\x00`` / OTF ``OTTO``): table
  directory walk; ``head`` (unitsPerEm, revision), ``maxp`` (glyph
  count), ``name`` (family 1, subfamily 2, full 4, version 5,
  postscript 6 — platform 3/1 UTF-16-BE preferred, platform 1/0
  mac-roman fallback), ``OS/2`` (weight class) when present.
- **WOFF 1.0**: header + per-table zlib streams inflated (bounded)
  into an SFNT directory, then the same walk.
- **WOFF 2.0**: header + transformed table directory (UIntBase128
  sizes, known-table tags) and ONE brotli stream (decoded via the
  canonical pyarrow codec behind a bounded read — the archive.py
  rule).  ``glyf``/``loca`` arrive transformed (out of scope for
  reconstruction — we never need glyph outlines), but ``head`` /
  ``maxp`` / ``name`` / ``OS/2`` are stored verbatim, so the
  metadata face is exact.

``build_ttf`` / ``build_woff`` / ``build_woff2`` are the independent
fixture writers (minimal head/maxp/name/OS/2 fonts, checksums and
padding per spec).

Reference parity note: the reference (SummaryDev/evm-archive) stores
media as opaque bytea; this adds the web-asset identity face to the
multimodal lanes.  Placement: per-payload stdlib work inside Arrow
batches (the codec boundary).
"""

from __future__ import annotations

import struct
import zlib

MAX_FONT_TABLES = 512
MAX_TABLE_BYTES = 64 * 1024 * 1024

_NAME_IDS = {1: "family", 2: "subfamily", 4: "full_name",
             5: "version", 6: "postscript_name"}

# WOFF2 known-table tag list (the spec's 63-entry table, index order)
_W2_TAGS = [
    "cmap", "head", "hhea", "hmtx", "maxp", "name", "OS/2", "post",
    "cvt ", "fpgm", "glyf", "loca", "prep", "CFF ", "VORG", "EBDT",
    "EBLC", "gasp", "hdmx", "kern", "LTSH", "PCLT", "VDMX", "vhea",
    "vmtx", "BASE", "GDEF", "GPOS", "GSUB", "EBSC", "JSTF", "MATH",
    "CBDT", "CBLC", "COLR", "CPAL", "SVG ", "sbix", "acnt", "avar",
    "bdat", "bloc", "bsln", "cvar", "fdsc", "feat", "fmtx", "fvar",
    "gvar", "hsty", "just", "lcar", "mort", "morx", "opbd", "prop",
    "trak", "Zapf", "Silf", "Glat", "Gloc", "Feat", "Sill",
]


class FontError(ValueError):
    """Malformed or out-of-scope font payload."""


def font_kind(b: bytes) -> str | None:
    if b[:4] in (b"\x00\x01\x00\x00", b"OTTO", b"true"):
        return "sfnt"
    if b[:4] == b"wOFF":
        return "woff"
    if b[:4] == b"wOF2":
        return "woff2"
    return None


def is_font(b: bytes) -> bool:
    return font_kind(b) is not None


def _sfnt_tables(b: bytes) -> dict[str, bytes]:
    if len(b) < 12:
        raise FontError("truncated SFNT header")
    num_tables = struct.unpack_from(">H", b, 4)[0]
    if num_tables > MAX_FONT_TABLES:
        raise FontError("SFNT table count over cap")
    tables: dict[str, bytes] = {}
    for i in range(num_tables):
        e = 12 + 16 * i
        if e + 16 > len(b):
            raise FontError("truncated SFNT table directory")
        tag, _csum, off, length = struct.unpack_from(">4sIII", b, e)
        if length > MAX_TABLE_BYTES:
            raise FontError("SFNT table over cap")
        data = b[off:off + length]
        if len(data) < length:
            raise FontError(f"SFNT table {tag!r} overruns payload")
        tables[tag.decode("latin-1")] = data
    return tables


def _woff_tables(b: bytes) -> tuple[dict[str, bytes], bytes]:
    if len(b) < 44:
        raise FontError("truncated WOFF header")
    (_sig, flavor, _length, num_tables) = struct.unpack_from(
        ">4s4sIH", b, 0)
    if num_tables > MAX_FONT_TABLES:
        raise FontError("WOFF table count over cap")
    tables: dict[str, bytes] = {}
    for i in range(num_tables):
        e = 44 + 20 * i
        if e + 20 > len(b):
            raise FontError("truncated WOFF table directory")
        tag, off, comp_len, orig_len, _csum = struct.unpack_from(
            ">4sIIII", b, e)
        if orig_len > MAX_TABLE_BYTES:
            raise FontError("WOFF table over cap")
        raw = b[off:off + comp_len]
        if len(raw) < comp_len:
            raise FontError(f"WOFF table {tag!r} overruns payload")
        if comp_len < orig_len:
            try:
                data = zlib.decompressobj().decompress(
                    raw, orig_len + 1)
            except zlib.error as e2:
                raise FontError(
                    f"corrupt WOFF table {tag!r}: {e2!r}") from e2
            if len(data) != orig_len:
                raise FontError(f"WOFF table {tag!r} size mismatch")
        else:
            data = raw[:orig_len]
        tables[tag.decode("latin-1")] = data
    return tables, flavor


def _base128(b: bytes, pos: int) -> tuple[int, int]:
    """WOFF2 UIntBase128: big-endian 7-bit groups, high bit
    continues, max 5 bytes, no leading zero byte."""
    val = 0
    for i in range(5):
        if pos >= len(b):
            raise FontError("truncated UIntBase128")
        byte = b[pos]
        pos += 1
        if i == 0 and byte == 0x80:
            raise FontError("UIntBase128 leading zero")
        if val & 0xFE000000:
            raise FontError("UIntBase128 overflow")
        val = (val << 7) | (byte & 0x7F)
        if not byte & 0x80:
            return val, pos
    raise FontError("UIntBase128 too long")


def _woff2_tables(b: bytes) -> tuple[dict[str, bytes], bytes]:
    if len(b) < 48:
        raise FontError("truncated WOFF2 header")
    (_sig, flavor, _length, num_tables) = struct.unpack_from(
        ">4s4sIH", b, 0)
    (total_comp,) = struct.unpack_from(">I", b, 20)
    if num_tables > MAX_FONT_TABLES:
        raise FontError("WOFF2 table count over cap")
    pos = 48
    entries = []
    for _ in range(num_tables):
        if pos >= len(b):
            raise FontError("truncated WOFF2 table directory")
        flags = b[pos]
        pos += 1
        known = flags & 0x3F
        if known == 0x3F:
            if pos + 4 > len(b):
                raise FontError("truncated WOFF2 arbitrary tag")
            tag = b[pos:pos + 4].decode("latin-1")
            pos += 4
        else:
            tag = _W2_TAGS[known]
        orig_len, pos = _base128(b, pos)
        transform = (flags >> 6) & 0x3
        # glyf/loca: transform 0 means TRANSFORMED (length follows);
        # other tables: transform 0 is null (no extra length)
        transformed = (transform == 0) if tag in ("glyf", "loca") \
            else (transform != 0)
        t_len = orig_len
        if transformed:
            t_len, pos = _base128(b, pos)
        if orig_len > MAX_TABLE_BYTES or t_len > MAX_TABLE_BYTES:
            raise FontError("WOFF2 table over cap")
        entries.append((tag, orig_len, t_len, transformed))
    comp = b[pos:pos + total_comp]
    if len(comp) < total_comp:
        raise FontError("WOFF2 compressed block overruns payload")
    import pyarrow as pa

    cap = sum(e[2] for e in entries)
    try:
        st = pa.input_stream(pa.BufferReader(comp),
                             compression="brotli")
        stream = bytes(st.read(cap + 1))
    except (OSError, ValueError) as e:
        raise FontError(f"corrupt WOFF2 brotli block: {e!r}") from e
    if len(stream) != cap:
        raise FontError("WOFF2 decompressed size mismatch")
    tables: dict[str, bytes] = {}
    off = 0
    for tag, _orig_len, t_len, transformed in entries:
        data = stream[off:off + t_len]
        off += t_len
        if not transformed:
            tables[tag] = data
        # transformed glyf/loca are glyph-outline data — the metadata
        # face never needs them, so they are simply not surfaced
    return tables, flavor


def _parse_name(tb: bytes) -> dict[str, str]:
    out: dict[str, str] = {}
    if len(tb) < 6:
        return out
    _fmt, count, str_off = struct.unpack_from(">HHH", tb, 0)
    if count > 4096:
        raise FontError("name-table record count over cap")
    best: dict[int, tuple[int, str]] = {}
    for i in range(count):
        e = 6 + 12 * i
        if e + 12 > len(tb):
            break
        plat, enc, _lang, nid, length, off = struct.unpack_from(
            ">HHHHHH", tb, e)
        if nid not in _NAME_IDS:
            continue
        raw = tb[str_off + off: str_off + off + length]
        if len(raw) < length:
            continue
        if plat == 3 and enc in (1, 10):
            val, rank = raw.decode("utf-16-be", "replace"), 2
        elif plat == 0:
            val, rank = raw.decode("utf-16-be", "replace"), 1
        elif plat == 1 and enc == 0:
            val, rank = raw.decode("mac-roman", "replace"), 0
        else:
            continue
        if nid not in best or rank > best[nid][0]:
            best[nid] = (rank, val)
    for nid, (_rank, val) in best.items():
        out[_NAME_IDS[nid]] = val
    return out


def font_metadata(b: bytes) -> dict:
    """``{"container", "flavor", "n_tables", "n_glyphs",
    "units_per_em", "weight_class", "family", "subfamily",
    "full_name", "version", "postscript_name"}`` — absent fields
    None."""
    kind = font_kind(b)
    if kind is None:
        raise FontError("not a font payload")
    if kind == "sfnt":
        tables, flavor = _sfnt_tables(b), b[:4]
    elif kind == "woff":
        tables, flavor = _woff_tables(b)
    else:
        tables, flavor = _woff2_tables(b)
    meta: dict = {
        "container": kind,
        "flavor": "otf" if flavor == b"OTTO" else "ttf",
        "n_tables": len(tables),
        "n_glyphs": None, "units_per_em": None, "weight_class": None,
        "family": None, "subfamily": None, "full_name": None,
        "version": None, "postscript_name": None,
    }
    head = tables.get("head")
    if head is not None and len(head) >= 20:
        if struct.unpack_from(">I", head, 12)[0] != 0x5F0F3CF5:
            raise FontError("head table magic mismatch")
        meta["units_per_em"] = struct.unpack_from(">H", head, 18)[0]
    maxp = tables.get("maxp")
    if maxp is not None and len(maxp) >= 6:
        meta["n_glyphs"] = struct.unpack_from(">H", maxp, 4)[0]
    os2 = tables.get("OS/2")
    if os2 is not None and len(os2) >= 6:
        meta["weight_class"] = struct.unpack_from(">H", os2, 4)[0]
    name = tables.get("name")
    if name is not None:
        meta.update(_parse_name(name))
    return meta


# -- synthesis writers ---------------------------------------------------------


def _name_table(names: dict[int, str]) -> bytes:
    records = b""
    strings = b""
    for nid in sorted(names):
        raw = names[nid].encode("utf-16-be")
        records += struct.pack(">HHHHHH", 3, 1, 0x409, nid,
                               len(raw), len(strings))
        strings += raw
    return (struct.pack(">HHH", 0, len(names), 6 + 12 * len(names))
            + records + strings)


def build_ttf(family: str = "Synth Sans", subfamily: str = "Regular",
              n_glyphs: int = 10, units_per_em: int = 1000,
              weight: int = 400, version: str = "Version 1.0",
              flavor: bytes = b"\x00\x01\x00\x00") -> bytes:
    """A minimal valid SFNT with head/maxp/name/OS/2 (+ a stub glyf/
    loca pair so the directory looks like a real TrueType)."""
    head = (b"\x00\x01\x00\x00" + b"\x00\x01\x00\x00"
            + b"\x00\x00\x00\x00"
            + struct.pack(">I", 0x5F0F3CF5)
            + struct.pack(">HH", 0, units_per_em)
            + b"\x00" * 30 + struct.pack(">hh", 0, 0))
    maxp = b"\x00\x00\x50\x00" + struct.pack(">H", n_glyphs) \
        + b"\x00" * 26
    os2 = struct.pack(">HhHH", 4, 500, weight, 5) + b"\x00" * 88
    name = _name_table({1: family, 2: subfamily,
                        4: f"{family} {subfamily}", 5: version,
                        6: f"{family.replace(' ', '')}-{subfamily}"})
    loca = struct.pack(">HH", 0, 0)
    glyf = b"\x00\x00\x00\x00"
    tables = [(b"OS/2", os2), (b"glyf", glyf), (b"head", head),
              (b"loca", loca), (b"maxp", maxp), (b"name", name)]
    n = len(tables)
    search = 16 * (1 << (n.bit_length() - 1))
    out = struct.pack(">4sHHHH", flavor, n, search,
                      n.bit_length() - 1, 16 * n - search)
    off = 12 + 16 * n
    body = b""
    for tag, data in tables:
        pad = (-len(data)) % 4
        csum = sum(struct.unpack_from(
            f">{(len(data) + pad) // 4}I", data + b"\x00" * pad)
        ) & 0xFFFFFFFF
        out += struct.pack(">4sIII", tag, csum, off, len(data))
        body += data + b"\x00" * pad
        off += len(data) + pad
    return out + body


def build_woff(sfnt: bytes) -> bytes:
    """Wrap an SFNT in WOFF 1.0 (every table zlib-compressed when
    that shrinks it)."""
    flavor = sfnt[:4]
    tables = _sfnt_tables(sfnt)
    n = len(tables)
    dir_off = 44 + 20 * n
    entries = b""
    body = b""
    off = dir_off
    for tag in sorted(tables):
        data = tables[tag]
        comp = zlib.compress(data, 9)
        use = comp if len(comp) < len(data) else data
        entries += struct.pack(
            ">4sIIII", tag.encode("latin-1"), off, len(use),
            len(data), zlib.crc32(data))
        pad = (-len(use)) % 4
        body += use + b"\x00" * pad
        off += len(use) + pad
    total = dir_off + len(body)
    header = struct.pack(
        ">4s4sIHHIHHIIIII", b"wOFF", flavor, total, n, 0,
        12 + 16 * n + sum((len(t) + 3) // 4 * 4
                          for t in tables.values()),
        1, 0, 0, 0, 0, 0, 0)
    return header + entries + body


def build_woff2(sfnt: bytes) -> bytes:
    """Wrap an SFNT in WOFF 2.0: known-tag directory, UIntBase128
    sizes, one brotli stream (tables stored untransformed — the
    null-transform encoding the spec allows for glyf/loca too)."""
    import pyarrow as pa

    flavor = sfnt[:4]
    tables = _sfnt_tables(sfnt)
    entries = b""
    stream = b""
    for tag in sorted(tables):
        data = tables[tag]
        known = _W2_TAGS.index(tag) if tag in _W2_TAGS else 0x3F
        # glyf/loca: transform NUMBER 3 = null transform (bits 6-7
        # carry 3); other tables: 0 = null
        tbits = 3 if tag in ("glyf", "loca") else 0
        entries += bytes([known | (tbits << 6)])
        if known == 0x3F:
            entries += tag.encode("latin-1")

        def b128(v: int) -> bytes:
            out = bytearray([v & 0x7F])
            v >>= 7
            while v:
                out.insert(0, 0x80 | (v & 0x7F))
                v >>= 7
            return bytes(out)

        entries += b128(len(data))
        stream += data
    comp = pa.Codec("brotli").compress(stream, asbytes=True)
    header = struct.pack(
        ">4s4sIHHIIHHIIIII", b"wOF2", flavor,
        48 + len(entries) + len(comp), len(tables), 0,
        12 + 16 * len(tables) + len(stream), len(comp),
        1, 0, 0, 0, 0, 0, 0)
    return header + entries + comp
