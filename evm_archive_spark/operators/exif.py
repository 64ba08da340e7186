"""Image metadata / EXIF extraction and scrubbing, from scratch.

Header-only parsing over the repo's from-scratch codec surface: format
sniff + pixel dimensions for PNG / JPEG / GIF / BMP / TIFF, and the
EXIF block (a TIFF IFD tree, CIPA DC-008 / TIFF 6.0) carried in JPEG
APP1 segments, PNG ``eXIf`` chunks, or a bare TIFF's IFD0 — camera
make/model, orientation, original timestamp, and a GPS-presence flag.

Why this is a first-class curation operator: multimodal training
pipelines key near-dup heuristics on camera metadata and must detect /
remove location EXIF before distribution — GPS coordinates embedded in
user photos are PII exactly like emails in text (``scrub_pii``'s image
mirror is ``scrub_exif``).  The reference stores payloads opaquely
(evm-archive keeps hex blobs and leaves interpretation to SQL,
main.go:217-241); interpreting container metadata is the analytics
engine's job here.

Scale shape: header walks touch only the first few KB of each payload
inside Arrow batches (mapInPandas); no shuffle, no full decode — at
100 TB the scan cost is the parquet read itself.  Scrubbing rewrites
segments by splicing byte ranges, never re-encodes pixels (lossless,
decoder-verified in tests).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ExifError(ValueError):
    pass


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}

# IFD0 tags (TIFF 6.0 / CIPA DC-008)
_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825
_TAG_DT_ORIGINAL = 0x9003  # in the Exif sub-IFD
_TAG_WIDTH = 0x0100
_TAG_HEIGHT = 0x0101


def _ifd_entries(data: bytes, off: int, bo: str) -> list[tuple]:
    """Generic single-IFD walk: [(tag, type, values), ...].  Unlike
    tiff._read_ifd this keeps every tag (EXIF tags aren't baseline
    strip tags) and never dereferences strip data."""
    if off < 0 or off + 2 > len(data):
        raise ExifError("truncated IFD")
    (n,) = struct.unpack_from(bo + "H", data, off)
    out = []
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(data):
            raise ExifError("truncated IFD entry")
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, e)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * cnt
        if total > len(data):
            raise ExifError("IFD value larger than payload")
        voff = (
            e + 8
            if total <= 4
            else struct.unpack_from(bo + "I", data, e + 8)[0]
        )
        raw = data[voff : voff + total]
        if len(raw) < total:
            raise ExifError(f"tag {tag}: value overruns payload")
        if typ in (3, 8):
            vals = struct.unpack_from(f"{bo}{cnt}H", raw)
        elif typ in (4, 9):
            vals = struct.unpack_from(f"{bo}{cnt}I", raw)
        elif typ == 2:
            vals = (raw,)
        elif typ in (1, 6, 7):
            vals = tuple(raw)
        else:  # rational types — presence is all we need
            vals = (raw,)
        out.append((tag, typ, vals))
    return out


def _ascii(vals: tuple) -> str | None:
    raw = vals[0] if vals and isinstance(vals[0], (bytes, bytearray)) else None
    if raw is None:
        return None
    return raw.split(b"\x00", 1)[0].decode("latin-1").strip() or None


def parse_exif_tiff(block: bytes) -> dict:
    """Parse a TIFF-structured EXIF block (the bytes after the JPEG
    APP1 ``Exif\\x00\\x00`` prefix, a PNG eXIf chunk body, or a whole
    .tif file).  Returns the metadata dict; missing fields are None /
    0."""
    if block[:4] == b"II*\x00":
        bo = "<"
    elif block[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ExifError("bad TIFF byte-order mark in EXIF block")
    (ifd0_off,) = struct.unpack_from(bo + "I", block, 4)
    meta = {
        "make": None,
        "model": None,
        "orientation": 0,
        "datetime_original": None,
        "has_gps": 0,
        "width": None,
        "height": None,
    }
    exif_off = gps_off = None
    for tag, _typ, vals in _ifd_entries(block, ifd0_off, bo):
        if tag == _TAG_MAKE:
            meta["make"] = _ascii(vals)
        elif tag == _TAG_MODEL:
            meta["model"] = _ascii(vals)
        elif tag == _TAG_ORIENTATION and vals:
            meta["orientation"] = int(vals[0])
        elif tag == _TAG_DATETIME and meta["datetime_original"] is None:
            meta["datetime_original"] = _ascii(vals)
        elif tag == _TAG_EXIF_IFD and vals:
            exif_off = int(vals[0])
        elif tag == _TAG_GPS_IFD and vals:
            gps_off = int(vals[0])
        elif tag == _TAG_WIDTH and vals:
            meta["width"] = int(vals[0])
        elif tag == _TAG_HEIGHT and vals:
            meta["height"] = int(vals[0])
    if exif_off is not None:
        try:
            for tag, _typ, vals in _ifd_entries(block, exif_off, bo):
                if tag == _TAG_DT_ORIGINAL:
                    dt = _ascii(vals)
                    if dt:
                        meta["datetime_original"] = dt
        except ExifError:
            pass  # a broken sub-IFD doesn't void IFD0 fields
    if gps_off is not None:
        try:
            meta["has_gps"] = int(bool(_ifd_entries(block, gps_off, bo)))
        except ExifError:
            meta["has_gps"] = 1  # pointer present but unreadable: assume
    return meta


def jpeg_segments(data: bytes) -> Iterator[tuple[int, int, int]]:
    """Walk JPEG marker segments up to SOS: yields (marker, start,
    end) byte ranges where ``start`` is the 0xFF position and ``end``
    is one past the segment (marker + length + payload).  Stops at SOS
    (entropy data follows) or EOI."""
    if data[:2] != b"\xff\xd8":
        raise ExifError("not a JPEG (SOI missing)")
    i = 2
    n = len(data)
    while i + 1 < n:
        if data[i] != 0xFF:
            raise ExifError(f"expected marker at offset {i}")
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            yield marker, i, i + 2
            i += 2
            continue
        if i + 4 > n:
            raise ExifError("truncated marker segment")
        (ln,) = struct.unpack_from(">H", data, i + 2)
        end = i + 2 + ln
        if ln < 2 or end > n:
            raise ExifError("marker length overruns payload")
        yield marker, i, end
        if marker == 0xDA:  # SOS — entropy-coded data follows
            return
        i = end


def _jpeg_meta(data: bytes) -> dict:
    meta = {
        "format": "jpeg",
        "width": None,
        "height": None,
        "make": None,
        "model": None,
        "orientation": 0,
        "datetime_original": None,
        "has_gps": 0,
    }
    sofs = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
    for marker, s, e in jpeg_segments(data):
        if marker in sofs and e - s >= 9:
            meta["height"], meta["width"] = struct.unpack_from(
                ">HH", data, s + 5
            )
        elif marker == 0xE1 and data[s + 4 : s + 10] == b"Exif\x00\x00":
            try:
                ex = parse_exif_tiff(data[s + 10 : e])
            except ExifError:
                continue  # bad APP1 doesn't void the image itself
            for k in (
                "make", "model", "orientation", "datetime_original",
                "has_gps",
            ):
                if ex[k] not in (None, 0):
                    meta[k] = ex[k]
    return meta


def is_webp(b: bytes) -> bool:
    return len(b) >= 16 and b[:4] == b"RIFF" and b[8:12] == b"WEBP"


def _webp_meta(b: bytes, base: dict) -> dict:
    """WebP (RIFF) header walk: dims from VP8X (extended canvas),
    VP8L (lossless signature word) or VP8 (lossy frame header start
    code), plus the TIFF-structured EXIF chunk when the extended
    format carries one.  Header-only — pixel DECODE of WebP is out of
    scope (VP8 needs a DCT/bool-coder stack; VP8L an LZ77+Huffman
    stack), same documented boundary as the perceptual audio codecs."""
    meta = dict(base, format="webp")
    pos = 12
    while pos + 8 <= len(b):
        fourcc = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ExifError(f"truncated WebP chunk {fourcc!r}")
        if fourcc == b"VP8X" and size >= 10 and meta["width"] is None:
            meta["width"] = 1 + int.from_bytes(body[4:7], "little")
            meta["height"] = 1 + int.from_bytes(body[7:10], "little")
        elif fourcc == b"VP8L" and size >= 5 and meta["width"] is None:
            if body[0] != 0x2F:
                raise ExifError("bad VP8L signature byte")
            (word,) = struct.unpack_from("<I", body, 1)
            meta["width"] = 1 + (word & 0x3FFF)
            meta["height"] = 1 + ((word >> 14) & 0x3FFF)
        elif fourcc == b"VP8 " and size >= 10 and meta["width"] is None:
            if body[3:6] != b"\x9d\x01\x2a":
                raise ExifError("bad VP8 key-frame start code")
            (w,) = struct.unpack_from("<H", body, 6)
            (h,) = struct.unpack_from("<H", body, 8)
            meta["width"] = w & 0x3FFF
            meta["height"] = h & 0x3FFF
        elif fourcc == b"EXIF":
            try:
                ex = parse_exif_tiff(body)
            except ExifError:
                pass
            else:
                for k in (
                    "make", "model", "orientation", "datetime_original",
                    "has_gps",
                ):
                    if ex[k] not in (None, 0):
                        meta[k] = ex[k]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if meta["width"] is None:
        raise ExifError("WebP payload has no VP8/VP8L/VP8X image chunk")
    return meta


def image_metadata_of(b: bytes) -> dict | None:
    """Header-only metadata for a known image payload; None when the
    format isn't one of the from-scratch codecs."""
    from .bmp import is_bmp
    from .gif import is_gif
    from .jpeg import is_jpeg
    from .png import is_png
    from .tiff import is_tiff

    base = {
        "width": None,
        "height": None,
        "make": None,
        "model": None,
        "orientation": 0,
        "datetime_original": None,
        "has_gps": 0,
    }
    if is_jpeg(b):
        return _jpeg_meta(b)
    if is_webp(b):
        return _webp_meta(b, base)
    from .heif import is_heif

    if is_heif(b):
        # HEIC (what iPhones shoot) / AVIF metadata face: ispe dims,
        # irot orientation, Exif item through this module's IFD parser
        from .heif import heif_metadata

        return heif_metadata(b)
    if is_png(b):
        if len(b) < 24:
            raise ExifError("truncated PNG header")
        w, h = struct.unpack_from(">II", b, 16)
        meta = dict(base, format="png", width=w, height=h)
        # PNG 1.2 eXIf extension chunk: TIFF-structured EXIF
        i = 8
        while i + 8 <= len(b):
            (ln,) = struct.unpack_from(">I", b, i)
            ctype = b[i + 4 : i + 8]
            if ctype == b"eXIf":
                try:
                    ex = parse_exif_tiff(b[i + 8 : i + 8 + ln])
                except ExifError:
                    break
                for k in (
                    "make", "model", "orientation", "datetime_original",
                    "has_gps",
                ):
                    if ex[k] not in (None, 0):
                        meta[k] = ex[k]
                break
            if ctype == b"IEND":
                break
            i += 12 + ln
        return meta
    if is_gif(b):
        if len(b) < 10:
            raise ExifError("truncated GIF header")
        w, h = struct.unpack_from("<HH", b, 6)
        return dict(base, format="gif", width=w, height=h)
    if is_bmp(b):
        if len(b) < 26:
            raise ExifError("truncated BMP header")
        w, h = struct.unpack_from("<ii", b, 18)
        return dict(base, format="bmp", width=abs(w), height=abs(h))
    if is_tiff(b):
        ex = parse_exif_tiff(b)
        return dict(
            base,
            format="tiff",
            width=ex["width"],
            height=ex["height"],
            make=ex["make"],
            model=ex["model"],
            orientation=ex["orientation"],
            datetime_original=ex["datetime_original"],
            has_gps=ex["has_gps"],
        )
    return None


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("make", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("orientation", T.LongType()),
        T.StructField("datetime_original", T.StringType()),
        T.StructField("has_gps", T.LongType()),
    ]
)


def image_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
) -> DataFrame:
    """Per-image metadata profile — format, dimensions, camera
    make/model, orientation, original timestamp, GPS-presence flag.

    ``strict=True``: unknown payload formats raise
    ``NotImplementedError``; corrupt known-format headers raise
    ``ValueError``.  ``strict=False``: both fall back to the
    deterministic sha256 fake (format ``'fake'``), replayed
    field-for-field by the q_image_meta oracle — the never-fail
    admission contract of the other multimodal lanes."""

    def fake_row(b: bytes) -> tuple:
        h = hashlib.sha256(b).digest()
        return (
            "fake",
            1 + int.from_bytes(h[0:2], "big") % 8192,
            1 + int.from_bytes(h[2:4], "big") % 8192,
            f"make_{h[4] % 16}",
            f"model_{h[5] % 64}",
            1 + h[6] % 8,
            f"2020:01:01 00:00:{h[7] % 60:02d}",
            h[8] % 2,
        )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        cols = [f.name for f in IMAGE_META_SCHEMA.fields]
        for pdf in it:
            out = {c: [] for c in cols}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload or b"")
                try:
                    meta = image_metadata_of(b)
                except (ExifError, struct.error, IndexError, ValueError):
                    if strict:
                        raise ValueError(f"bad image payload {mid}")
                    meta = None
                if meta is None:
                    if strict:
                        raise NotImplementedError(
                            "strict image metadata supports PNG, JPEG, "
                            "GIF, BMP, TIFF, WebP and HEIF/AVIF "
                            "headers; use strict=False for the "
                            "deterministic fake"
                        )
                    row = fake_row(b)
                else:
                    row = (
                        meta["format"],
                        meta["width"],
                        meta["height"],
                        meta["make"],
                        meta["model"],
                        meta["orientation"],
                        meta["datetime_original"],
                        meta["has_gps"],
                    )
                out["media_id"].append(mid)
                for c, v in zip(cols[1:], row):
                    out[c].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, IMAGE_META_SCHEMA)


SCRUB_EXIF_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("removed_segments", T.LongType()),
        T.StructField("bytes_removed", T.LongType()),
        T.StructField("residual_gps", T.LongType()),
    ]
)


def _splice(b: bytes, drops: list[tuple[int, int]]) -> tuple[bytes, int, int]:
    out, prev = [], 0
    for s, e in drops:
        out.append(b[prev:s])
        prev = e
    out.append(b[prev:])
    return b"".join(out), len(drops), sum(e - s for s, e in drops)


def strip_exif_bytes(b: bytes) -> tuple[bytes, int, int]:
    """Lossless EXIF removal: splice out JPEG APP1(Exif) segments, PNG
    eXIf chunks and WebP EXIF RIFF chunks; every other byte (including
    pixel data) passes through verbatim.  Non-image and EXIF-free
    payloads return unchanged with zero counts.

    A JPEG whose segment walk fails PARTWAY still has the segments
    collected before the failure spliced out (ADVICE r6: returning a
    GPS-bearing payload untouched because its tail is corrupt would be
    a silent privacy leak; the tail was undecodable either way).  WebP
    scrubbing also patches the RIFF size field and clears the VP8X
    EXIF flag bit so the container stays self-consistent."""
    from .jpeg import is_jpeg
    from .png import is_png

    if is_jpeg(b):
        drops = []
        try:
            for marker, s, e in jpeg_segments(b):
                if marker == 0xE1 and b[s + 4 : s + 10] == b"Exif\x00\x00":
                    drops.append((s, e))
        except ExifError:
            pass  # keep the drops collected before the failure
        if not drops:
            return b, 0, 0
        return _splice(b, drops)
    if is_png(b):
        drops = []
        i = 8
        while i + 8 <= len(b):
            (ln,) = struct.unpack_from(">I", b, i)
            ctype = b[i + 4 : i + 8]
            end = i + 12 + ln
            if end > len(b):
                break  # corrupt tail: splice what was collected
            if ctype == b"eXIf":
                drops.append((i, end))
            if ctype == b"IEND":
                break
            i = end
        if not drops:
            return b, 0, 0
        return _splice(b, drops)
    if is_webp(b):
        drops = []
        pos = 12
        while pos + 8 <= len(b):
            fourcc = b[pos : pos + 4]
            (size,) = struct.unpack_from("<I", b, pos + 4)
            end = pos + 8 + size + (size & 1)  # chunks are word-aligned
            if pos + 8 + size > len(b):
                break  # corrupt tail: splice what was collected
            if fourcc == b"EXIF":
                drops.append((pos, min(end, len(b))))
            pos = end
        if not drops:
            return b, 0, 0
        nb, nseg, nbytes = _splice(b, drops)
        out = bytearray(nb)
        # keep the container self-consistent: RIFF size counts
        # everything after its own 8-byte header
        struct.pack_into("<I", out, 4, len(out) - 8)
        if out[12:16] == b"VP8X" and len(out) >= 21:
            out[20] &= ~0x08  # clear the VP8X EXIF-present flag
        return bytes(out), nseg, nbytes
    return b, 0, 0


def scrub_exif(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """PII scrub for images — ``scrub_pii``'s multimodal mirror:
    remove EXIF blocks (camera serials, GPS coordinates) from JPEG /
    PNG / WebP payloads without re-encoding pixels.  Unknown formats
    pass through unchanged (never fails the job; TIFF EXIF is
    structural — IFD0 *is* the image directory — so TIFF passes through
    and the q_image_meta profile is the flagging tool there).

    ``residual_gps`` (ADVICE r6): 1 when a post-scrub header walk STILL
    reports GPS tags — structural-TIFF EXIF, or a container the splice
    couldn't reach — so admission pipelines can quarantine instead of
    silently admitting a GPS-bearing payload; 0 otherwise (including
    payloads whose headers don't parse at all — those fail admission's
    decode stages on their own)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out = {
                "media_id": [],
                "payload": [],
                "removed_segments": [],
                "bytes_removed": [],
                "residual_gps": [],
            }
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload or b"")
                nb, nseg, nbytes = strip_exif_bytes(b)
                try:
                    meta = image_metadata_of(nb)
                    residual = int(bool(meta and meta["has_gps"]))
                except (ExifError, struct.error, IndexError, ValueError):
                    residual = 0
                out["media_id"].append(mid)
                out["payload"].append(nb)
                out["removed_segments"].append(nseg)
                out["bytes_removed"].append(nbytes)
                out["residual_gps"].append(residual)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, SCRUB_EXIF_SCHEMA)
