"""DNG (Adobe Digital Negative) raw-image face — from scratch,
stdlib + numpy (public spec: the DNG specification over TIFF 6.0 /
TIFF-EP structure).

DNG is the interchange format camera raws converge on: a TIFF whose
IFD0 carries DNGVersion/UniqueCameraModel (and usually a small
preview) with the actual RAW — a CFA mosaic, 10-16 bits per sample —
in a SubIFD (NewSubfileType 0, PhotometricInterpretation 32803 CFA),
compressed as LOSSLESS JPEG (SOF3) tiles or strips, or stored as
uncompressed 16-bit samples.  With jpeglossless.py decoding any
2-16-bit SOF3 stream, the whole stack is now from scratch:

- ``dng_metadata``: DNGVersion, camera model, raw dims, bits per
  sample, compression, CFA repeat pattern ("RGGB", ...) — the
  admission/profiling face;
- ``decode_dng_raw``: the full CFA mosaic as a uint16 array (tiles
  edge-cropped, strips stitched) — real sample data, not a preview.

SOF3 chunks may be n-component frames at width/n — the
interleaved-columns layout real camera DNGs use — restored by a
row-major reshape.  ``build_dng`` is the independent synthesis writer
(IFD0 + SubIFD, SOF3 tiles via jpeglossless.build_jpeg_lossless —
optionally interleaved — or uncompressed samples: 16-bit in either
byte order, 8-bit plain, and tightly-packed sub-16-bit rows
(MSB-first, byte-padded per row — the TIFF-EP/DNG-SDK convention,
round 10).  Remaining scope (typed, named): lossy-JPEG / JPEG-XL DNG
variants and DNG opcode lists.

Reference parity note: the reference (SummaryDev/evm-archive) stores
media as opaque bytea; this extends the multimodal metadata/decode
lane to camera-raw corpora.  Placement: per-payload stdlib+numpy work
inside Arrow batches (the codec boundary).
"""

from __future__ import annotations

import struct

import numpy as np

TAG_NEW_SUBFILE = 254
TAG_WIDTH = 256
TAG_HEIGHT = 257
TAG_BITS = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_MODEL = 272
TAG_STRIP_OFFSETS = 273
TAG_SAMPLES_PER_PIXEL = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_COUNTS = 279
TAG_SUBIFDS = 330
TAG_TILE_W = 322
TAG_TILE_H = 323
TAG_TILE_OFFSETS = 324
TAG_TILE_COUNTS = 325
TAG_CFA_DIM = 33421
TAG_CFA_PATTERN = 33422
TAG_DNG_VERSION = 50706
TAG_UNIQUE_MODEL = 50708

PHOTO_CFA = 32803
MAX_IFDS = 64
MAX_CHUNKS = 1 << 16

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8}
_CFA_NAMES = {0: "R", 1: "G", 2: "B", 3: "C", 4: "M", 5: "Y", 6: "W"}


class DngError(ValueError):
    """Malformed or out-of-scope DNG payload."""


def _tag0(fields: dict[int, tuple], tag: int, default):
    """First value of a tag; the default also covers the crafted
    present-but-count-0 case (empty tuple), which must stay typed."""
    vals = fields.get(tag)
    return vals[0] if vals else default


def _read_ifd_all(data: bytes, off: int, bo: str) -> dict[int, tuple]:
    """Generic IFD read: {tag_number: values} (unknown tags kept)."""
    if off < 0 or off + 2 > len(data):
        raise DngError("truncated IFD")
    (n,) = struct.unpack_from(bo + "H", data, off)
    fields: dict[int, tuple] = {}
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(data):
            raise DngError("truncated IFD entry")
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, e)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * cnt
        if total > len(data):
            raise DngError(f"tag {tag}: value larger than payload")
        voff = e + 8 if total <= 4 else struct.unpack_from(
            bo + "I", data, e + 8)[0]
        raw = data[voff: voff + total]
        if len(raw) < total:
            raise DngError(f"tag {tag}: value overruns payload")
        if typ in (3, 8):
            vals = struct.unpack_from(f"{bo}{cnt}H", raw)
        elif typ in (4, 9):
            vals = struct.unpack_from(f"{bo}{cnt}I", raw)
        elif typ == 2:
            vals = (raw.split(b"\x00", 1)[0],)
        elif typ in (1, 6, 7):
            vals = tuple(raw)
        else:
            vals = (raw,)
        fields[tag] = vals
    return fields


def _ifds(data: bytes):
    """Yield every IFD dict: the IFD0 chain plus SubIFD trees."""
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        raise DngError("not a TIFF payload")
    bo = "<" if data[:2] == b"II" else ">"
    if struct.unpack_from(bo + "H", data, 2)[0] != 42:
        raise DngError("not a TIFF payload")
    seen: set[int] = set()
    queue = [struct.unpack_from(bo + "I", data, 4)[0]]
    while queue:
        off = queue.pop(0)
        if off == 0 or off in seen:
            continue
        if len(seen) >= MAX_IFDS:
            raise DngError("IFD count over cap")
        seen.add(off)
        f = _read_ifd_all(data, off, bo)
        yield f, bo
        for sub in f.get(TAG_SUBIFDS, ()):
            queue.append(int(sub))
        # next-IFD pointer
        (n,) = struct.unpack_from(bo + "H", data, off)
        nxt_pos = off + 2 + 12 * n
        if nxt_pos + 4 <= len(data):
            queue.append(struct.unpack_from(bo + "I", data, nxt_pos)[0])


def is_dng(b: bytes) -> bool:
    """TIFF magic + a DNGVersion tag in IFD0."""
    try:
        for f, _bo in _ifds(b):
            return TAG_DNG_VERSION in f
    except DngError:
        return False
    return False


def _raw_ifd(b: bytes):
    """The raw-mosaic IFD: photometric 32803 (CFA); ties broken by
    NewSubfileType 0 (the full-resolution image)."""
    best = None
    for f, bo in _ifds(b):
        if _tag0(f, TAG_PHOTOMETRIC, 0) != PHOTO_CFA:
            continue
        if _tag0(f, TAG_NEW_SUBFILE, 0) == 0:
            return f, bo
        if best is None:
            best = (f, bo)
    if best is None:
        raise DngError("DNG has no CFA raw IFD")
    return best


def dng_metadata(b: bytes) -> dict:
    """Header-only raw profile: ``{"dng_version", "camera_model",
    "width", "height", "bits_per_sample", "compression",
    "cfa_pattern"}``."""
    ifd0 = None
    for f, _bo in _ifds(b):
        ifd0 = f
        break
    if ifd0 is None or TAG_DNG_VERSION not in ifd0:
        raise DngError("not a DNG payload (no DNGVersion)")
    ver = ".".join(str(v) for v in ifd0[TAG_DNG_VERSION][:4])
    model = _tag0(ifd0, TAG_UNIQUE_MODEL, _tag0(ifd0, TAG_MODEL, b""))
    raw, _bo = _raw_ifd(b)
    pat = raw.get(TAG_CFA_PATTERN, ())
    cfa = "".join(_CFA_NAMES.get(v, "?") for v in pat)
    return {
        "dng_version": ver,
        "camera_model": model.decode("utf-8", "replace") or None,
        "width": int(_tag0(raw, TAG_WIDTH, 0)) or None,
        "height": int(_tag0(raw, TAG_HEIGHT, 0)) or None,
        "bits_per_sample": int(_tag0(raw, TAG_BITS, 16)),
        "compression": int(_tag0(raw, TAG_COMPRESSION, 1)),
        "cfa_pattern": cfa or None,
    }


def decode_dng_raw(b: bytes) -> tuple[np.ndarray, int]:
    """The full CFA mosaic: ``((h, w) uint16 array, bits_per_sample)``.
    Supports lossless-JPEG (compression 7, SOF3 at any 2-16-bit
    precision) tiles or strips, and uncompressed (1) samples: 16-bit
    both byte orders, 8-bit, and tightly-packed sub-16-bit rows."""
    from .jpeglossless import decode_jpeg_lossless_raw

    raw, bo = _raw_ifd(b)
    try:
        height = raw[TAG_HEIGHT][0]
        width = raw[TAG_WIDTH][0]
    except (KeyError, IndexError) as e:
        raise DngError(f"raw IFD missing tag {e!r}") from e
    bits = _tag0(raw, TAG_BITS, 16)
    comp = _tag0(raw, TAG_COMPRESSION, 1)
    spp = _tag0(raw, TAG_SAMPLES_PER_PIXEL, 1)
    if spp != 1:
        raise DngError("multi-sample CFA raws out of scope")
    if comp not in (1, 7):
        raise DngError(
            f"DNG compression {comp} out of scope (uncompressed and "
            "lossless-JPEG only)")
    if not (0 < height <= 0xFFFF and 0 < width <= 0xFFFF):
        raise DngError("bad raw dimensions")
    out = np.zeros((height, width), dtype=np.uint16)

    def chunk(off: int, cnt: int) -> bytes:
        c = b[off: off + cnt]
        if len(c) < cnt:
            raise DngError("raw chunk overruns payload")
        return c

    def decode_chunk(data: bytes, ch: int, cw: int) -> np.ndarray:
        if comp == 7:
            from .jpeg import JpegError

            try:
                planes, prec = decode_jpeg_lossless_raw(data)
            except JpegError as e:
                raise DngError(f"lossless-JPEG raw chunk: {e}") from e
            if prec != bits:
                raise DngError(
                    f"SOF3 precision {prec} != BitsPerSample {bits}")
            # real DNG writers often encode the mosaic as an
            # n-component SOF3 frame at width/n — the components are
            # the INTERLEAVED columns (row-major reshape restores the
            # full-width row exactly)
            tile2d = planes.reshape(planes.shape[0], -1)
            if tile2d.shape[0] < ch or tile2d.shape[1] < cw:
                raise DngError("raw chunk smaller than declared")
            return tile2d[:ch, :cw]
        if bits == 16:
            want = ch * cw * 2
            if len(data) < want:
                raise DngError("uncompressed raw chunk short")
            return np.frombuffer(data[:want], dtype=np.dtype(bo + "u2")
                                 ).reshape(ch, cw)
        if bits == 8:
            want = ch * cw
            if len(data) < want:
                raise DngError("uncompressed raw chunk short")
            return np.frombuffer(data[:want], dtype=np.uint8
                                 ).reshape(ch, cw).astype(np.uint16)
        # tightly-packed sub-16-bit rows (round 10): samples packed
        # MSB-first, each row padded to a byte boundary (the TIFF-EP /
        # DNG-SDK convention for 10/12/14-bit uncompressed raws)
        row_bytes = (cw * bits + 7) // 8
        want = row_bytes * ch
        if len(data) < want:
            raise DngError("uncompressed raw chunk short")
        bitarr = np.unpackbits(
            np.frombuffer(data[:want], dtype=np.uint8
                          ).reshape(ch, row_bytes), axis=1
        )[:, :cw * bits].reshape(ch, cw, bits)
        weights = (1 << np.arange(bits - 1, -1, -1)).astype(np.uint32)
        return (bitarr.astype(np.uint32) * weights).sum(
            axis=2).astype(np.uint16)

    if TAG_TILE_OFFSETS in raw:
        tw = _tag0(raw, TAG_TILE_W, 0)
        th = _tag0(raw, TAG_TILE_H, 0)
        if not tw or not th:
            raise DngError("bad tile dimensions")
        ta, td = -(-width // tw), -(-height // th)
        offs = raw[TAG_TILE_OFFSETS]
        cnts = raw.get(TAG_TILE_COUNTS, ())
        if ta * td > MAX_CHUNKS:
            raise DngError("tile count over cap")
        if len(offs) < ta * td or len(cnts) < ta * td:
            raise DngError("tile tables shorter than the tile grid")
        for ti in range(ta * td):
            ty, tx = divmod(ti, ta)
            hh = min(th, height - ty * th)
            ww = min(tw, width - tx * tw)
            tile = decode_chunk(chunk(offs[ti], cnts[ti]), th, tw)
            out[ty * th: ty * th + hh, tx * tw: tx * tw + ww] = \
                tile[:hh, :ww]
    else:
        offs = raw.get(TAG_STRIP_OFFSETS, ())
        cnts = raw.get(TAG_STRIP_COUNTS, ())
        if not offs or len(cnts) < len(offs):
            raise DngError("raw IFD missing strip tables")
        if len(offs) > MAX_CHUNKS:
            raise DngError("strip count over cap")
        rps = _tag0(raw, TAG_ROWS_PER_STRIP, height) or height
        row0 = 0
        for off, cnt in zip(offs, cnts):
            nrows = min(rps, height - row0)
            if nrows <= 0:
                break
            out[row0: row0 + nrows] = decode_chunk(
                chunk(off, cnt), nrows, width)
            row0 += nrows
        if row0 < height:
            raise DngError("strips cover fewer rows than ImageLength")
    return out, int(bits)


# -- synthesis writer ----------------------------------------------------------


def _ifd_bytes(bo: str, entries: list[tuple], base: int,
               tail: bytes) -> bytes:
    """Serialize one IFD at absolute offset ``base``; ``entries`` are
    (tag, type, values-or-bytes); oversize values land after the
    entry table, ``tail`` (chunk data) after those."""
    entries = sorted(entries, key=lambda e: e[0])
    n = len(entries)
    ext = bytearray()
    ext_base = base + 2 + 12 * n + 4
    out = struct.pack(bo + "H", n)
    for tag, typ, vals in entries:
        if typ == 2:
            vb = vals + b"\x00"
            cnt = len(vb)
        elif typ in (1, 7):
            vb = bytes(vals)
            cnt = len(vb)
        else:
            fmt = {3: "H", 4: "I"}[typ]
            vb = b"".join(struct.pack(bo + fmt, v) for v in vals)
            cnt = len(vals)
        if len(vb) <= 4:
            loc = vb.ljust(4, b"\x00")
        else:
            loc = struct.pack(bo + "I", ext_base + len(ext))
            ext.extend(vb)
        out += struct.pack(bo + "HHI", tag, typ, cnt) + loc
    return out + b"\x00\x00\x00\x00" + bytes(ext) + tail


_CFA_CODES = {v: k for k, v in _CFA_NAMES.items()}


def build_dng(mosaic: np.ndarray, *, bits: int = 16,
              cfa: str = "RGGB", model: str = "SynthCam DNG",
              compression: int = 7, tile_size: tuple | None = None,
              byte_order: str = "<", predictor: int = 1,
              sof3_components: int = 1,
              restart_rows: int = 0) -> bytes:
    """Write a structurally valid DNG: IFD0 (DNGVersion 1.4,
    UniqueCameraModel, SubIFDs pointer) + a raw SubIFD (CFA
    photometric, CFARepeatPatternDim/CFAPattern, lossless-JPEG tiles/
    strip or uncompressed 16-bit).  ``sof3_components`` > 1 writes
    the interleaved-columns layout real camera DNGs use (an
    n-component SOF3 frame at width/n).  Independent of the reader."""
    from .jpeglossless import build_jpeg_lossless

    h, w = mosaic.shape
    bo = byte_order
    if len(cfa) != 4 or any(c not in _CFA_CODES for c in cfa):
        raise DngError(f"bad CFA pattern {cfa!r} (4 letters of "
                       f"{''.join(_CFA_CODES)})")
    cfa_codes = bytes(_CFA_CODES[c] for c in cfa)
    nc = sof3_components
    if nc < 1 or (compression == 7 and w % nc):
        raise DngError("sof3_components must divide the chunk width")

    def sof3(chunk2d: np.ndarray) -> bytes:
        if nc > 1:
            chunk2d = chunk2d.reshape(chunk2d.shape[0], -1, nc)
        # restart_rows > 0 emits DRI/RSTn every that many MCU rows —
        # the row-aligned layout real DNG writers produce (MCU width
        # is shape[1] either way: one multi-component sample per MCU)
        ri = restart_rows * chunk2d.shape[1] if restart_rows else 0
        return build_jpeg_lossless(chunk2d, predictor=predictor,
                                   precision=bits,
                                   restart_interval=ri)

    def pack_raw(chunk2d: np.ndarray) -> bytes:
        """Uncompressed chunk: 16-bit samples in the file byte order,
        8-bit plain, or sub-16-bit packed MSB-first with rows padded
        to byte boundaries (the reader's convention)."""
        if bits == 16:
            return chunk2d.astype(bo + "u2").tobytes()
        if bits == 8:
            return chunk2d.astype(np.uint8).tobytes()
        shifts = np.arange(bits - 1, -1, -1)
        vb = ((chunk2d[:, :, None].astype(np.uint32) >> shifts) & 1
              ).astype(np.uint8).reshape(chunk2d.shape[0], -1)
        return np.packbits(vb, axis=1).tobytes()

    # raw chunks
    raw_entries: list[tuple] = [
        (TAG_NEW_SUBFILE, 4, (0,)),
        (TAG_WIDTH, 3, (w,)),
        (TAG_HEIGHT, 3, (h,)),
        (TAG_BITS, 3, (bits,)),
        (TAG_COMPRESSION, 3, (compression,)),
        (TAG_PHOTOMETRIC, 3, (PHOTO_CFA,)),
        (TAG_SAMPLES_PER_PIXEL, 3, (1,)),
        (TAG_CFA_DIM, 3, (2, 2)),
        (TAG_CFA_PATTERN, 1, tuple(cfa_codes)),
    ]
    chunks: list[bytes] = []
    if tile_size is not None:
        tw, th = tile_size
        if compression == 7 and tw % nc:
            raise DngError("sof3_components must divide the tile width")
        for ty in range(-(-h // th)):
            for tx in range(-(-w // tw)):
                tile = mosaic[ty * th:(ty + 1) * th,
                              tx * tw:(tx + 1) * tw]
                pad = ((0, th - tile.shape[0]), (0, tw - tile.shape[1]))
                if pad != ((0, 0), (0, 0)):
                    tile = np.pad(tile, pad, mode="edge")
                if compression == 7:
                    chunks.append(sof3(tile))
                else:
                    chunks.append(pack_raw(tile))
        raw_entries += [(TAG_TILE_W, 3, (tw,)), (TAG_TILE_H, 3, (th,))]
        off_tag, cnt_tag = TAG_TILE_OFFSETS, TAG_TILE_COUNTS
    else:
        if compression == 7:
            chunks.append(sof3(mosaic))
        else:
            chunks.append(pack_raw(mosaic))
        raw_entries.append((TAG_ROWS_PER_STRIP, 3, (h,)))
        off_tag, cnt_tag = TAG_STRIP_OFFSETS, TAG_STRIP_COUNTS

    # layout: header(8) + IFD0 + raw IFD + chunks; two passes so the
    # chunk offsets are known before the raw IFD serializes
    header = struct.pack(
        bo + "2sHI", b"II" if bo == "<" else b"MM", 42, 8)
    ifd0_entries = [
        (TAG_NEW_SUBFILE, 4, (1,)),
        (TAG_DNG_VERSION, 1, (1, 4, 0, 0)),
        (TAG_UNIQUE_MODEL, 2, model.encode()),
        (TAG_SUBIFDS, 4, (0,)),                # patched after layout
    ]

    def render(sub_off: int, chunk_offs: list[int]) -> bytes:
        i0 = [(t, ty, (sub_off,) if t == TAG_SUBIFDS else v)
              for t, ty, v in ifd0_entries]
        ifd0 = _ifd_bytes(bo, i0, 8, b"")
        entries = raw_entries + [
            (off_tag, 4, tuple(chunk_offs)),
            (cnt_tag, 4, tuple(len(c) for c in chunks)),
        ]
        raw_ifd = _ifd_bytes(bo, entries, sub_off, b"")
        return header + ifd0 + raw_ifd + b"".join(chunks)

    probe = render(0x7FFF, [0x7FFFFFF] * len(chunks))
    sub_off = 8 + len(_ifd_bytes(bo, ifd0_entries, 8, b""))
    chunk_base = len(probe) - sum(len(c) for c in chunks)
    offs = []
    pos = chunk_base
    for c in chunks:
        offs.append(pos)
        pos += len(c)
    return render(sub_off, offs)
