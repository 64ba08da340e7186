"""HEIF / AVIF metadata face (ISO-BMFF image collections) — from
scratch, stdlib only (public formats: ISO/IEC 23008-12 HEIF structure
over ISO/IEC 14496-12 boxes; AVIF is the same structure with AV1
payloads).

HEIC is what iPhones shoot and AVIF is the modern web image format —
a crawl's image corpus contains both, and the ADMISSION decisions
(dims floors, orientation, EXIF provenance/GPS scrub) only need the
METADATA face: the ``meta`` box tree, not the HEVC/AV1 sample decode
(typed out of scope like the other perceptual codecs; the container
face here is real and cross-pinned against files produced by the
system libheif in tests).

Walk: ``ftyp`` brand -> ``meta`` (a FULL box: 4 bytes version/flags
before children) -> ``pitm`` primary item id -> ``iprp``/``ipco``
property containers and the ``ipma`` item->property association so
the PRIMARY item's ``ispe`` (pixel dimensions) and ``irot`` wins over
thumbnails/alpha auxiliaries -> ``iinf``/``iloc`` to locate an
``Exif`` item, whose TIFF body feeds the existing EXIF IFD parser
(make/model/timestamp/GPS — the scrub provenance fields).

``build_heif_meta`` is the independent synthesis writer (metadata-
only files with a stub mdat payload — the metadata face is what this
module reads; it shares no code with the reader).

Reference parity note: the reference (SummaryDev/evm-archive) stores
media as opaque bytea; this extends the multimodal admission lane's
image_metadata_of dispatch.

At 100 TB: header-only reads inside Arrow batches (the exif.py
placement); no decode, no shuffle.
"""

from __future__ import annotations

import struct

from .mp4 import Mp4Error, _boxes, _child

HEIF_BRANDS = {b"heic", b"heix", b"heim", b"heis", b"hevc", b"hevx",
               b"mif1", b"msf1"}
AVIF_BRANDS = {b"avif", b"avis"}

MAX_ITEMS = 4096


class HeifError(ValueError):
    """Malformed HEIF/AVIF metadata payload."""


def _brands(b: bytes) -> set[bytes]:
    if len(b) < 16 or b[4:8] != b"ftyp":
        return set()
    (size,) = struct.unpack_from(">I", b, 0)
    size = min(size, len(b))
    out = {b[8:12]}
    for i in range(16, size - 3, 4):
        out.add(b[i:i + 4])
    return out


def is_heif(b: bytes) -> bool:
    """ftyp sniff with a HEIF/AVIF brand (major or compatible) —
    takes precedence over the generic mp4 sniff for image files."""
    return bool(_brands(b) & (HEIF_BRANDS | AVIF_BRANDS))


def heif_metadata(b: bytes) -> dict:
    """Header-only metadata: ``{"format", "width", "height",
    "orientation", "make", "model", "datetime_original", "has_gps"}``
    — the image_metadata_of contract.  ``orientation`` maps the
    ``irot`` counter-clockwise quarter-turns onto the EXIF codes
    (0->1, 1->8, 2->3, 3->6).  Box-walk errors normalize to
    ``HeifError`` (a ValueError — the lane guards catch it)."""
    try:
        return _heif_metadata(b)
    except Mp4Error as e:
        raise HeifError(f"malformed HEIF box tree: {e}") from e
    except struct.error as e:
        raise HeifError(f"truncated HEIF structure: {e}") from e


def _heif_metadata(b: bytes) -> dict:
    brands = _brands(b)
    if not brands & (HEIF_BRANDS | AVIF_BRANDS):
        raise HeifError("not a HEIF/AVIF payload")
    fmt = "avif" if brands & AVIF_BRANDS else "heic"
    meta = _child(b, 0, len(b), b"meta")
    if meta is None:
        raise HeifError("HEIF payload missing the meta box")
    mb, me = meta
    mb += 4                                    # FullBox version/flags

    # primary item id (pitm: version 0 -> u16, else u32); bare boxes
    # with no room for even the FullBox header are ignored, not crashed
    primary = None
    pitm = _child(b, mb, me, b"pitm")
    if pitm is not None:
        pb, pe = pitm
        if pe - pb >= 6:
            ver = b[pb]
            if ver == 0:
                (primary,) = struct.unpack_from(">H", b, pb + 4)
            elif pe - pb >= 8:
                (primary,) = struct.unpack_from(">I", b, pb + 4)

    # property containers: ipco children in ORDER (1-based indices),
    # ipma associations item_id -> property indices
    props: list[tuple[bytes, int, int]] = []
    assoc: dict[int, list[int]] = {}
    iprp = _child(b, mb, me, b"iprp")
    if iprp is not None:
        ib, ie = iprp
        ipco = _child(b, ib, ie, b"ipco")
        if ipco is not None:
            props = list(_boxes(b, ipco[0], ipco[1]))
            if len(props) > MAX_ITEMS:
                raise HeifError("HEIF property count over cap")
        ipma = _child(b, ib, ie, b"ipma")
        if ipma is not None:
            ab, ae = ipma
            ver = b[ab]
            flags = int.from_bytes(b[ab + 1:ab + 4], "big")
            pos = ab + 4
            if pos + 4 > ae:
                raise HeifError("truncated ipma")
            (entry_count,) = struct.unpack_from(">I", b, pos)
            pos += 4
            if entry_count > MAX_ITEMS:
                raise HeifError("HEIF ipma entries over cap")
            for _ in range(entry_count):
                if ver == 0:
                    if pos + 3 > ae:
                        raise HeifError("truncated ipma entry")
                    (item_id,) = struct.unpack_from(">H", b, pos)
                    pos += 2
                else:
                    if pos + 5 > ae:
                        raise HeifError("truncated ipma entry")
                    (item_id,) = struct.unpack_from(">I", b, pos)
                    pos += 4
                n_assoc = b[pos]
                pos += 1
                idxs = []
                for _ in range(n_assoc):
                    if flags & 1:
                        if pos + 2 > ae:
                            raise HeifError("truncated ipma assoc")
                        (v,) = struct.unpack_from(">H", b, pos)
                        pos += 2
                        idxs.append(v & 0x7FFF)
                    else:
                        if pos + 1 > ae:
                            raise HeifError("truncated ipma assoc")
                        idxs.append(b[pos] & 0x7F)
                        pos += 1
                assoc[item_id] = idxs

    def _prop_of(item_id: int | None, fourcc: bytes):
        """The item's first associated property of a kind.  The global
        ipco scan is a fallback ONLY when the item has no association
        entry at all (writers omit ipma for single-item files) — when
        associations exist, a property bound to some OTHER item (a
        thumbnail's ispe, an auxiliary's irot) must NOT leak onto the
        primary image."""
        if item_id is not None and item_id in assoc:
            for idx in assoc[item_id]:
                if 1 <= idx <= len(props) and props[idx - 1][0] == fourcc:
                    return props[idx - 1]
            return None
        for p in props:
            if p[0] == fourcc:
                return p
        return None

    width = height = None
    ispe = _prop_of(primary, b"ispe")
    if ispe is not None:
        _, pb, pe = ispe
        if pe - pb >= 12:
            width, height = struct.unpack_from(">II", b, pb + 4)
    orientation = 1
    irot = _prop_of(primary, b"irot")
    if irot is not None:
        _, pb, pe = irot
        if pe > pb:
            # counter-clockwise quarter turns -> EXIF orientation code
            orientation = {0: 1, 1: 8, 2: 3, 3: 6}[b[pb] & 3]

    out = {
        "format": fmt,
        "width": int(width) if width is not None else None,
        "height": int(height) if height is not None else None,
        "make": None,
        "model": None,
        "orientation": orientation,
        "datetime_original": None,
        "has_gps": 0,
    }

    exif_body = _exif_item(b, mb, me)
    if exif_body is not None:
        from .exif import ExifError, parse_exif_tiff  # shared IFD parser

        try:
            fields = parse_exif_tiff(exif_body)
        except ExifError:
            fields = {}                        # EXIF is best-effort
        for k in ("make", "model", "datetime_original", "has_gps"):
            if fields.get(k):
                out[k] = fields[k]
        # irot is authoritative when present; otherwise EXIF's code
        if irot is None and fields.get("orientation"):
            out["orientation"] = fields["orientation"]
    return out


def _exif_item(b: bytes, mb: int, me: int) -> bytes | None:
    """Locate an 'Exif' item via iinf/infe + iloc and return its TIFF
    body (the item payload leads with a u32 offset to the TIFF
    header, ISO 23008-12 A.2.1)."""
    iinf = _child(b, mb, me, b"iinf")
    iloc = _child(b, mb, me, b"iloc")
    if iinf is None or iloc is None:
        return None
    exif_id = None
    ib, ie = iinf
    if ie - ib < 6:
        return None                            # bare/truncated iinf
    for fc, eb, ee in _boxes(b, ib + 4 + (2 if b[ib] == 0 else 4), ie):
        if fc != b"infe" or ee - eb < 12:
            continue
        ver = b[eb]
        if ver == 2:
            # v2: item_ID u16 @+4, protection u16 @+6, type @+8
            (item_id,) = struct.unpack_from(">H", b, eb + 4)
            item_type = b[eb + 8:eb + 12]
        elif ver == 3 and ee - eb >= 14:
            # v3: item_ID u32 @+4, protection u16 @+8, type @+10
            (item_id,) = struct.unpack_from(">I", b, eb + 4)
            item_type = b[eb + 10:eb + 14]
        else:
            continue
        if item_type == b"Exif":
            exif_id = item_id
            break
    if exif_id is None:
        return None
    lb, le = iloc
    if le - lb < 8:
        return None                            # bare/truncated iloc
    ver = b[lb]
    sizes = b[lb + 4]
    offset_size, length_size = sizes >> 4, sizes & 0x0F
    base_offset_size = b[lb + 5] >> 4
    index_size = b[lb + 5] & 0x0F if ver in (1, 2) else 0
    pos = lb + 6
    if ver < 2:
        (count,) = struct.unpack_from(">H", b, pos)
        pos += 2
    else:
        (count,) = struct.unpack_from(">I", b, pos)
        pos += 4
    if count > MAX_ITEMS:
        raise HeifError("HEIF iloc items over cap")

    def _uint(p: int, n: int) -> int:
        return int.from_bytes(b[p:p + n], "big")

    for _ in range(count):
        if ver < 2:
            item_id = _uint(pos, 2)
            pos += 2
        else:
            item_id = _uint(pos, 4)
            pos += 4
        construction_method = 0
        if ver in (1, 2):
            # low 4 bits: 0=file offsets, 1=idat-relative, 2=item-relative
            construction_method = _uint(pos, 2) & 0x0F
            pos += 2
        pos += 2                               # data_reference_index
        base = _uint(pos, base_offset_size)
        pos += base_offset_size
        extent_count = _uint(pos, 2)
        pos += 2
        if extent_count > MAX_ITEMS:
            raise HeifError("HEIF extent count over cap")
        extents = []
        for _ in range(extent_count):
            pos += index_size
            off = _uint(pos, offset_size)
            pos += offset_size
            ln = _uint(pos, length_size)
            pos += length_size
            extents.append((base + off, ln))
        if item_id == exif_id and construction_method != 0:
            # idat-/item-relative extents (method 1/2) are NOT file
            # offsets — reading them as absolute would pull garbage
            # bytes (r9 ADVICE); typed no-op instead.
            return None
        if item_id == exif_id and extents:
            # a fragmented item is legal: the payload is ALL extents
            # concatenated, not just the first
            payload = bytearray()
            for start, ln in extents:
                if start + ln > len(b):
                    raise HeifError("HEIF Exif extent overruns payload")
                payload += b[start:start + ln]
            if len(payload) < 4:
                return None
            (tiff_off,) = struct.unpack_from(">I", payload, 0)
            if 4 + tiff_off >= len(payload):
                return None
            return bytes(payload[4 + tiff_off:])
    return None


# -- synthesis writer ----------------------------------------------------------


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, bytes([version]) + flags.to_bytes(3, "big") + body)


def build_heif_meta(width: int, height: int, *, avif: bool = False,
                    rotation: int = 0, exif_tiff: bytes | None = None,
                    with_ipma: bool = True) -> bytes:
    """Write a structurally valid HEIF/AVIF METADATA file: ftyp,
    meta(hdlr, pitm, [iinf+iloc for an Exif item], iprp(ipco(ispe
    [, irot]) [, ipma])), and a stub mdat standing in for the coded
    image data (this module's readers never touch it).  Independent
    of the reader."""
    brand = b"avif" if avif else b"heic"
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mif1")

    hdlr = _full(b"hdlr", 0, 0,
                 b"\x00" * 4 + b"pict" + b"\x00" * 12 + b"w\x00")
    pitm = _full(b"pitm", 0, 0, struct.pack(">H", 1))
    ispe = _full(b"ispe", 0, 0, struct.pack(">II", width, height))
    props = ispe
    n_props = 1
    if rotation:
        props += _box(b"irot", bytes([rotation & 3]))
        n_props += 1
    ipco = _box(b"ipco", props)
    iprp_body = ipco
    if with_ipma:
        entry = struct.pack(">H", 1) + bytes([n_props]) + bytes(
            range(1, n_props + 1))
        iprp_body += _full(b"ipma", 0, 0, struct.pack(">I", 1) + entry)
    iprp = _box(b"iprp", iprp_body)

    meta_children = hdlr + pitm
    exif_blob = b""
    if exif_tiff is not None:
        infe = _full(b"infe", 2, 0,
                     struct.pack(">HH", 2, 0) + b"Exif" + b"\x00")
        iinf = _full(b"iinf", 0, 0, struct.pack(">H", 1) + infe)
        exif_blob = struct.pack(">I", 0) + exif_tiff
        # iloc version 0: offset/length size 4, one extent; the
        # absolute offset is computed after the meta box is sized, so
        # assemble with a placeholder then patch
        iloc = _full(b"iloc", 0, 0,
                     bytes([0x44, 0x00])
                     + struct.pack(">H", 1)
                     + struct.pack(">HH", 2, 0)
                     + struct.pack(">H", 1)
                     + struct.pack(">II", 0xDEADBEEF, len(exif_blob)))
        meta_children += iinf + iloc
    meta_children += iprp
    meta = _full(b"meta", 0, 0, meta_children)

    out = ftyp + meta
    mdat_body = b"\x00" * 8                   # stub coded data
    if exif_tiff is not None:
        exif_abs = len(out) + 8               # mdat header, exif first
        out_b = bytearray(out)
        i = out.index(struct.pack(">I", 0xDEADBEEF))
        out_b[i:i + 4] = struct.pack(">I", exif_abs)
        out = bytes(out_b)
        mdat_body = exif_blob + mdat_body
    return out + _box(b"mdat", mdat_body)


__all__ = ["HeifError", "Mp4Error", "build_heif_meta", "heif_metadata",
           "is_heif"]
