"""DICOM file reader — from scratch, stdlib + numpy (public standard:
DICOM PS3.10 file format + PS3.5 data-structure encoding).

Medical imagery is the classic lossless-JPEG corpus, and ``.dcm``
files are containers, not images: a 128-byte preamble + ``DICM``
magic, a File Meta Information group (always Explicit VR Little
Endian) declaring the Transfer Syntax UID, then the data set in that
syntax.  Implemented:

- **element grammar**: Explicit VR (2-byte lengths for the short VRs;
  2 reserved + 4-byte lengths for OB/OW/OF/OD/OL/SQ/UC/UR/UT/UN) and
  Implicit VR (4-byte lengths, VR from context), both endiannesses;
- **sequences**: SQ with defined AND undefined lengths, item tags
  (FFFE,E000), item/sequence delimiters (FFFE,E00D / FFFE,E0DD),
  recursively — undefined-length items inside undefined-length
  sequences included (the nested skip real files require);
- **transfer syntaxes**: Implicit VR LE (1.2.840.10008.1.2), Explicit
  VR LE (..1.2.1), Explicit VR BE (..1.2.2, retired but extant),
  Deflated Explicit VR LE (..1.2.1.99 — raw zlib inflate of the data
  set), and ENCAPSULATED pixel data for JPEG Lossless (..1.2.4.57 and
  the SV1 profile ..1.2.4.70 — decoded by jpeglossless.py, the T.81
  process-14 codec DNG already uses), JPEG-LS Lossless (..1.2.4.80
  and near-lossless ..4.81 via jpegls.py, the from-scratch T.87
  coder) and JPEG Baseline (..1.2.4.50, 8-bit, via jpeg.py);
- **pixel data**: native little-endian (0028,0100) BitsAllocated 8/16
  rasters, or the encapsulated form — Basic Offset Table item +
  fragment items, multi-fragment frames concatenated.

``dicom_metadata`` returns the identity face (modality, SOP class,
rows/cols, bits, photometric, transfer syntax); ``dicom_pixels``
returns ``((rows, cols, samples) uint16 array, bits_stored)``.

``build_dicom`` is the independent synthesis writer (all five
syntaxes, preamble, meta group with computed group length).  No
system DICOM library exists in this environment, so the pin is the
writer plus the already-pinned JPEG codecs underneath (jpeglossless
is own-encoder + libtiff-adjacent pinned; jpeg.py is libjpeg-pinned).

Reference parity note: the reference (SummaryDev/evm-archive) stores
media as opaque bytea; this extends the multimodal decode lanes.
Placement: per-payload work inside mapInPandas Arrow batches (the
codec boundary).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .codecerrors import guard

MAGIC_OFF = 128
MAX_DICOM_VALUE = 256 * 1024 * 1024

UID_IMPLICIT_LE = "1.2.840.10008.1.2"
UID_EXPLICIT_LE = "1.2.840.10008.1.2.1"
UID_DEFLATED_LE = "1.2.840.10008.1.2.1.99"
UID_EXPLICIT_BE = "1.2.840.10008.1.2.2"
UID_JPEG_BASELINE = "1.2.840.10008.1.2.4.50"
UID_JPEG_LOSSLESS = "1.2.840.10008.1.2.4.57"
UID_JPEG_LOSSLESS_SV1 = "1.2.840.10008.1.2.4.70"
UID_JPEG_LS = "1.2.840.10008.1.2.4.80"
UID_JPEG_LS_NEAR = "1.2.840.10008.1.2.4.81"
UID_J2K_LOSSLESS = "1.2.840.10008.1.2.4.90"
UID_J2K = "1.2.840.10008.1.2.4.91"
UID_RLE = "1.2.840.10008.1.2.5"

_ENCAPSULATED = {UID_JPEG_BASELINE, UID_JPEG_LOSSLESS,
                 UID_JPEG_LOSSLESS_SV1, UID_JPEG_LS,
                 UID_JPEG_LS_NEAR, UID_J2K_LOSSLESS, UID_J2K,
                 UID_RLE}

#: VRs whose explicit form carries 2 reserved bytes + a 4-byte length
_LONG_VRS = {b"OB", b"OW", b"OF", b"OD", b"OL", b"SQ", b"UC", b"UR",
             b"UT", b"UN"}


class DicomError(ValueError):
    """Malformed or out-of-scope DICOM payload."""


def is_dicom(b: bytes) -> bool:
    return len(b) > MAGIC_OFF + 4 and b[MAGIC_OFF:MAGIC_OFF + 4] == b"DICM"


def _walk(b: bytes, pos: int, end: int, explicit: bool,
          bo: str, out: dict, depth: int = 0) -> int:
    """Walk one data-set scope [pos, end), collecting interesting
    top-level elements into ``out`` keyed by (group, elem).  Returns
    the offset after the scope."""
    if depth > 16:
        raise DicomError("sequence nesting over cap")
    while pos + 8 <= end:
        group, elem = struct.unpack_from(bo + "HH", b, pos)
        if (group, elem) == (0xFFFE, 0xE00D) \
                or (group, elem) == (0xFFFE, 0xE0DD):
            # item/sequence delimiter at this level: scope is over
            return pos + 8
        if (group, elem) == (0xFFFE, 0xE000):    # item (inside SQ)
            (ln,) = struct.unpack_from(bo + "I", b, pos + 4)
            pos += 8
            if ln == 0xFFFFFFFF:
                pos = _walk(b, pos, end, explicit, bo, {}, depth + 1)
            else:
                pos += ln
            continue
        if explicit and group != 0xFFFE:
            vr = b[pos + 4:pos + 6]
            if vr in _LONG_VRS:
                (ln,) = struct.unpack_from(bo + "I", b, pos + 8)
                hdr = 12
            else:
                (ln,) = struct.unpack_from(bo + "H", b, pos + 6)
                hdr = 8
        else:
            vr = b""
            (ln,) = struct.unpack_from(bo + "I", b, pos + 4)
            hdr = 8
        pos += hdr
        undefined = ln == 0xFFFFFFFF
        if not undefined and ln > MAX_DICOM_VALUE:
            raise DicomError("element value over cap")
        is_sq = vr == b"SQ" or (undefined
                                and (group, elem) != (0x7FE0, 0x0010))
        if is_sq:
            if undefined:
                pos = _walk(b, pos, end, explicit, bo, {}, depth + 1)
            else:
                _walk(b, pos, pos + ln, explicit, bo, {}, depth + 1)
                pos += ln
            continue
        if undefined:                            # encapsulated pixels
            # fragments: items until the sequence delimiter
            frags = []
            offs = []                            # item-tag offsets
            base = None                          # after the BOT item
            while pos + 8 <= end:
                g2, e2 = struct.unpack_from(bo + "HH", b, pos)
                (l2,) = struct.unpack_from(bo + "I", b, pos + 4)
                if (g2, e2) == (0xFFFE, 0xE0DD):
                    pos += 8
                    break
                if (g2, e2) != (0xFFFE, 0xE000):
                    raise DicomError("bad encapsulated pixel item")
                if l2 > MAX_DICOM_VALUE or pos + 8 + l2 > end:
                    raise DicomError("pixel fragment over cap")
                if base is None:
                    base = pos + 8 + l2          # BOT offsets count
                else:                            # from after item 0
                    offs.append(pos - base)
                frags.append(b[pos + 8:pos + 8 + l2])
                pos += 8 + l2
            out[(group, elem)] = ("frags", frags, offs)
            continue
        if pos + ln > end:
            raise DicomError("element value overruns scope")
        out[(group, elem)] = (vr.decode("ascii", "replace"),
                              b[pos:pos + ln])
        pos += ln
    return pos


def _parse(b: bytes) -> tuple[dict, dict, str]:
    """(meta elements, data-set elements, transfer syntax uid)."""
    if not is_dicom(b):
        raise DicomError("not a DICOM payload")
    meta: dict = {}
    pos = MAGIC_OFF + 4
    # File Meta group: Explicit VR LE; (0002,0000) UL group length
    group, elem = struct.unpack_from("<HH", b, pos)
    if (group, elem) != (0x0002, 0x0000):
        raise DicomError("missing File Meta group length")
    (glen,) = struct.unpack_from("<I", b, pos + 8)
    meta_end = pos + 12 + glen
    if meta_end > len(b):
        raise DicomError("File Meta group overruns payload")
    _walk(b, pos, meta_end, explicit=True, bo="<", out=meta)
    ts_raw = meta.get((0x0002, 0x0010))
    if ts_raw is None:
        raise DicomError("missing TransferSyntaxUID")
    ts = ts_raw[1].decode("ascii", "replace").rstrip("\x00 ")
    ds: dict = {}
    body = b[meta_end:]
    if ts == UID_DEFLATED_LE:
        try:
            dco = zlib.decompressobj(wbits=-15)
            body = dco.decompress(body, MAX_DICOM_VALUE)
        except zlib.error as e:
            raise DicomError(f"deflated data set: {e!r}") from e
        if dco.unconsumed_tail:
            raise DicomError(
                "deflated data set exceeds MAX_DICOM_VALUE")
        _walk(body, 0, len(body), explicit=True, bo="<", out=ds)
        return meta, ds, ts
    if ts == UID_IMPLICIT_LE:
        explicit, bo = False, "<"
    elif ts == UID_EXPLICIT_BE:
        explicit, bo = True, ">"
    elif ts == UID_EXPLICIT_LE or ts in _ENCAPSULATED:
        explicit, bo = True, "<"
    else:
        raise DicomError(f"transfer syntax {ts} out of scope")
    _walk(body, 0, len(body), explicit=explicit, bo=bo, out=ds)
    return meta, ds, ts


def _text(ds: dict, tag: tuple, default: str = "") -> str:
    v = ds.get(tag)
    if v is None or v[0] == "frags":
        return default
    return v[1].decode("ascii", "replace").rstrip("\x00 ")


def _u16(ds: dict, tag: tuple, bo: str, default: int = 0) -> int:
    v = ds.get(tag)
    if v is None or v[0] == "frags" or len(v[1]) < 2:
        return default
    return struct.unpack_from(bo + "H", v[1], 0)[0]


@guard(DicomError)
def dicom_metadata(b: bytes) -> dict:
    meta, ds, ts = _parse(b)
    bo = ">" if ts == UID_EXPLICIT_BE else "<"
    return {
        "transfer_syntax": ts,
        "sop_class": _text(ds, (0x0008, 0x0016)),
        "modality": _text(ds, (0x0008, 0x0060)),
        "patient_name": _text(ds, (0x0010, 0x0010)),
        "rows": _u16(ds, (0x0028, 0x0010), bo),
        "cols": _u16(ds, (0x0028, 0x0011), bo),
        "bits_allocated": _u16(ds, (0x0028, 0x0100), bo),
        "bits_stored": _u16(ds, (0x0028, 0x0101), bo),
        "samples_per_pixel": _u16(ds, (0x0028, 0x0002), bo, 1),
        "photometric": _text(ds, (0x0028, 0x0004)),
    }


def _decode_encap_frame(ts: str, stream: bytes, rows: int, cols: int,
                        spp: int, alloc: int,
                        stored: int) -> np.ndarray:
    """One encapsulated frame's bitstream -> (rows, cols, spp)."""
    if ts == UID_RLE:
        return _rle_decode_frame(stream, rows, cols, spp, alloc)
    if ts in (UID_J2K_LOSSLESS, UID_J2K):
        # PS3.5 A.4.4: each fragment carries a JPEG 2000 codestream
        # (r13, jpeg2000.py — ..4.90 lossless 5/3; ..4.91 may also be
        # the irreversible 9/7 + scalar-quantization form)
        from .jpeg2000 import Jpeg2000Error, decode_j2k

        try:
            out = decode_j2k(stream)
        except Jpeg2000Error as e:
            raise DicomError(f"JPEG 2000 frame: {e}") from e
        if out.ndim != 2:
            raise DicomError("JPEG 2000 frame not single-component")
        if out.shape[0] < rows or out.shape[1] < cols:
            raise DicomError("frame smaller than Rows/Columns")
        return np.ascontiguousarray(
            out[:rows, :cols, None]).astype(np.uint16)
    if ts in (UID_JPEG_LS, UID_JPEG_LS_NEAR):
        from .jpegls import JpeglsError, decode_jpegls_raw as _jls

        try:
            out, prec = _jls(stream)
        except JpeglsError as e:
            raise DicomError(f"JPEG-LS frame: {e}") from e
        if prec != stored:
            raise DicomError(
                f"JPEG-LS precision {prec} != BitsStored {stored}")
        if out.shape[0] < rows or out.shape[1] < cols:
            raise DicomError("frame smaller than Rows/Columns")
        return np.ascontiguousarray(
            out[:rows, :cols]).astype(np.uint16)
    from .jpeg import JpegError
    if ts == UID_JPEG_BASELINE:
        from .jpeg import decode_jpeg

        try:
            rgba = decode_jpeg(stream)
        except JpegError as e:
            raise DicomError(f"baseline frame: {e}") from e
        out = rgba[:, :, :spp if spp in (1, 3) else 1].astype(
            np.uint16)
    else:
        from .jpeglossless import decode_jpeg_lossless_raw

        try:
            out, prec = decode_jpeg_lossless_raw(stream)
        except JpegError as e:
            raise DicomError(f"lossless frame: {e}") from e
        if prec != stored:
            raise DicomError(
                f"JPEG precision {prec} != BitsStored {stored}")
    if out.shape[0] < rows or out.shape[1] < cols:
        raise DicomError("frame smaller than Rows/Columns")
    return np.ascontiguousarray(out[:rows, :cols]).astype(np.uint16)


@guard(DicomError)
def dicom_frames(b: bytes) -> tuple[np.ndarray, int]:
    """Decode ALL frames -> ((frames, rows, cols, samples) uint16,
    bits_stored).  Multi-frame objects (0028,0008 NumberOfFrames)
    split native rasters by frame size and encapsulated streams by
    the Basic Offset Table (or one-fragment-per-frame when the BOT is
    empty, the common writer shortcut)."""
    meta, ds, ts = _parse(b)
    return _frames_parsed(ds, ts)


def _frames_parsed(ds: dict, ts: str) -> tuple[np.ndarray, int]:
    bo = ">" if ts == UID_EXPLICIT_BE else "<"
    rows = _u16(ds, (0x0028, 0x0010), bo)
    cols = _u16(ds, (0x0028, 0x0011), bo)
    alloc = _u16(ds, (0x0028, 0x0100), bo)
    stored = _u16(ds, (0x0028, 0x0101), bo) or alloc
    spp = _u16(ds, (0x0028, 0x0002), bo, 1)
    nframes = 1
    nf_raw = _text(ds, (0x0028, 0x0008))
    if nf_raw.strip():
        try:
            nframes = int(nf_raw.strip())
        except ValueError as e:
            raise DicomError(f"bad NumberOfFrames {nf_raw!r}") from e
    if nframes < 1 or nframes > 1 << 16:
        raise DicomError(f"NumberOfFrames {nframes} out of range")
    if not rows or not cols:
        raise DicomError("missing Rows/Columns")
    px = ds.get((0x7FE0, 0x0010))
    if px is None:
        raise DicomError("missing PixelData")
    if px[0] == "frags":
        if ts not in _ENCAPSULATED:
            raise DicomError(
                "encapsulated pixels under a native transfer syntax")
        frags, offs = px[1], px[2]
        if not frags:
            raise DicomError("no pixel fragments")
        bot = frags[0]
        data_frags = frags[1:] if len(frags) > 1 else [frags[0]]
        if nframes == 1:
            streams = [b"".join(data_frags)]
        elif bot:
            if len(bot) < 4 * nframes:
                raise DicomError("Basic Offset Table shorter than "
                                 "NumberOfFrames")
            starts = list(struct.unpack_from(
                f"<{nframes}I", bot, 0))
            if starts != sorted(starts) or starts[0] != 0:
                raise DicomError("Basic Offset Table not ascending")
            # group fragments by which BOT window their item falls in
            streams = [b""] * nframes
            fi = 0
            for k, frag in enumerate(data_frags):
                off = offs[k] if k < len(offs) else None
                if off is None:
                    raise DicomError("fragment offsets missing")
                while fi + 1 < nframes and off >= starts[fi + 1]:
                    fi += 1
                streams[fi] += frag
        else:
            if len(data_frags) != nframes:
                raise DicomError(
                    "empty Basic Offset Table needs one fragment per "
                    "frame")
            streams = [bytes(f) for f in data_frags]
        frames = [
            _decode_encap_frame(ts, s, rows, cols, spp, alloc, stored)
            for s in streams
        ]
        return np.stack(frames, axis=0), stored
    # native raster (PixelData always little-endian within the
    # supported syntaxes except Explicit BE, where OW words are BE)
    raw = px[1]
    per = rows * cols * spp
    if alloc == 8:
        need = per * nframes
        if len(raw) < need:
            raise DicomError("native raster short of Rows*Columns")
        arr = np.frombuffer(raw[:need], dtype=np.uint8)
    elif alloc == 16:
        need = per * nframes * 2
        if len(raw) < need:
            raise DicomError("native raster short of Rows*Columns")
        arr = np.frombuffer(raw[:need], dtype=bo + "u2")
    else:
        raise DicomError(f"BitsAllocated {alloc} out of scope")
    return (arr.astype(np.uint16).reshape(nframes, rows, cols, spp),
            stored)


@guard(DicomError)
def dicom_pixels(b: bytes) -> tuple[np.ndarray, int]:
    """Decode the FIRST frame -> ((rows, cols, samples) uint16,
    bits_stored).  Native LE rasters at 8/16 BitsAllocated, or the
    encapsulated JPEG/RLE forms."""
    frames, stored = dicom_frames(b)
    return frames[0], stored


@guard(DicomError)
def decode_dicom(b: bytes) -> np.ndarray:
    """Image-lane face: frame 0 as (rows, cols, 4) uint8 RGBA —
    samples downshifted to their top 8 bits (the 16-bit TIFF display
    rule), MONOCHROME1 inverted per PS3.3 (0 = white there), gray
    replicated, 3-sample frames taken as RGB."""
    meta = dicom_metadata(b)
    f0, stored = dicom_pixels(b)
    shift = max(0, stored - 8)
    disp = (f0 >> shift).astype(np.uint16)
    disp = np.clip(disp, 0, 255).astype(np.uint8)
    if meta["photometric"] == "MONOCHROME1":
        disp = 255 - disp
    h, w, spp = disp.shape
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[:, :, 3] = 255
    if spp >= 3:
        out[:, :, :3] = disp[:, :, :3]
    else:
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = disp[:, :, 0]
    return out


@guard(DicomError)
def dicom_rescaled(b: bytes) -> np.ndarray:
    """Modality values (PS3.3 C.11.1): all frames as float64
    ``stored * RescaleSlope + RescaleIntercept`` ((frames, rows,
    cols, samples)).  Missing elements default to slope 1 /
    intercept 0, so this is always safe to call; MONOCHROME1
    inversion stays a DISPLAY concern (``decode_dicom``) — rescaled
    values are physical units (e.g. Hounsfield) where inversion
    would be wrong."""
    _, ds, ts = _parse(b)               # ONE parse for tags + frames
    frames, _stored = _frames_parsed(ds, ts)

    def _ds_float(tag, default):
        v = _text(ds, tag).strip()
        if not v:
            return default
        try:
            return float(v)
        except ValueError as e:
            raise DicomError(f"bad DS value {v!r}") from e

    slope = _ds_float((0x0028, 0x1053), 1.0)
    intercept = _ds_float((0x0028, 0x1052), 0.0)
    return frames.astype(np.float64) * slope + intercept


def _packbits(data: bytes, want: int) -> bytes:
    """One DICOM RLE segment (PS3.5 Annex G — the PackBits scheme:
    n < 128 copies n+1 literals, n > 128 repeats the next byte
    257 - n times, 128 is a no-op)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < want:
        c = data[i]
        i += 1
        if c < 128:
            take = c + 1
            if i + take > n:
                raise DicomError("RLE literal overruns segment")
            out += data[i:i + take]
            i += take
        elif c > 128:
            if i >= n:
                raise DicomError("RLE run overruns segment")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    if len(out) < want:
        raise DicomError("RLE segment short of plane size")
    return bytes(out[:want])


def _rle_decode_frame(stream: bytes, rows: int, cols: int,
                      spp: int, alloc: int) -> np.ndarray:
    """PS3.5 Annex G frame: 64-byte header (u32 LE segment count + 15
    u32 LE offsets), one PackBits segment per byte plane — for 16-bit
    samples the MSB plane precedes the LSB plane ('composite pixel
    code' order), for RGB the planes run R, G, B."""
    if len(stream) < 64:
        raise DicomError("RLE frame shorter than its header")
    nseg = struct.unpack_from("<I", stream, 0)[0]
    bpp = alloc // 8
    if nseg != spp * bpp or not 1 <= nseg <= 15:
        raise DicomError(
            f"RLE segment count {nseg} != samples*bytes {spp * bpp}")
    offs = list(struct.unpack_from("<15I", stream, 4))[:nseg]
    plane_len = rows * cols
    planes = []
    for k, off in enumerate(offs):
        end = offs[k + 1] if k + 1 < nseg else len(stream)
        if not 64 <= off <= end <= len(stream):
            raise DicomError("RLE segment offsets out of order")
        planes.append(np.frombuffer(
            _packbits(stream[off:end], plane_len), dtype=np.uint8))
    out = np.zeros((rows * cols, spp), dtype=np.uint16)
    for s in range(spp):
        for bi in range(bpp):                    # MSB plane first
            out[:, s] |= planes[s * bpp + bi].astype(np.uint16) \
                << (8 * (bpp - 1 - bi))
    return out.reshape(rows, cols, spp)


def _rle_encode_frame(img: np.ndarray, alloc: int) -> bytes:
    """Independent Annex G writer: split into byte planes, PackBits
    each (greedy: runs >= 3 encoded, literals otherwise), even-pad
    segments, 64-byte offset header."""
    rows, cols = img.shape
    bpp = alloc // 8
    planes = []
    for bi in range(bpp):
        shift = 8 * (bpp - 1 - bi)
        planes.append(((img.astype(np.uint32) >> shift) & 0xFF)
                      .astype(np.uint8).reshape(-1).tobytes())

    def enc(p: bytes) -> bytes:
        out = bytearray()
        i = 0
        n = len(p)
        while i < n:
            run = 1
            while run < 128 and i + run < n and p[i + run] == p[i]:
                run += 1
            if run >= 3:
                out += bytes([257 - run, p[i]])
                i += run
                continue
            j = i
            lit = 0
            while lit < 128 and j + lit < n:
                if (j + lit + 2 < n and p[j + lit] == p[j + lit + 1]
                        == p[j + lit + 2]):
                    break
                lit += 1
            out += bytes([lit - 1]) + p[j:j + lit]
            i += lit
        if len(out) % 2:
            out += b"\x00"                       # even segment pad
        return bytes(out)

    segs = [enc(p) for p in planes]
    offs = []
    pos = 64
    for s in segs:
        offs.append(pos)
        pos += len(s)
    head = struct.pack("<I", len(segs)) + struct.pack(
        "<15I", *(offs + [0] * (15 - len(offs))))
    return head + b"".join(segs)


# -- synthesis writer ----------------------------------------------------------


def _elem_exp(group: int, elem: int, vr: bytes, val: bytes,
              bo: str = "<") -> bytes:
    if vr in _LONG_VRS:
        return struct.pack(bo + "HH", group, elem) + vr + b"\x00\x00" \
            + struct.pack(bo + "I", len(val)) + val
    return struct.pack(bo + "HH", group, elem) + vr \
        + struct.pack(bo + "H", len(val)) + val


def _elem_imp(group: int, elem: int, val: bytes) -> bytes:
    return struct.pack("<HHI", group, elem, len(val)) + val


def _pad(s: str) -> bytes:
    v = s.encode("ascii")
    return v + b"\x00" * (len(v) % 2)


def build_dicom(img: np.ndarray, *, bits_stored: int = 16,
                transfer_syntax: str = UID_EXPLICIT_LE,
                modality: str = "OT",
                patient: str = "SYNTH^PATIENT",
                predictor: int = 1,
                fragment_at: int | None = None,
                bot: bool = True,
                photometric: str = "MONOCHROME2",
                rescale: tuple | None = None,
                near: int = 2) -> bytes:
    """Independent PS3.10 writer: (rows, cols) gray uint16 samples —
    or (frames, rows, cols) for a multi-frame object (NumberOfFrames
    emitted; encapsulated frames indexed by a real Basic Offset Table
    when ``bot``, else the empty-BOT one-fragment-per-frame shortcut).
    For the lossless syntaxes frames come from jpeglossless'
    ``build_jpeg_lossless``; ``fragment_at`` splits a single-frame
    encapsulated stream into two fragments at that byte offset."""
    frames_arr = img[None] if img.ndim == 2 else img
    nf, rows, cols = frames_arr.shape
    ts = transfer_syntax
    alloc = 8 if bits_stored <= 8 and ts not in (
        UID_JPEG_LOSSLESS, UID_JPEG_LOSSLESS_SV1) else 16
    if int(img.max(initial=0)) >= 1 << bits_stored:
        raise DicomError("sample exceeds BitsStored")

    bo = ">" if ts == UID_EXPLICIT_BE else "<"
    explicit = ts != UID_IMPLICIT_LE

    def elem(group, elem_, vr, val):
        if explicit:
            return _elem_exp(group, elem_, vr, val, bo)
        return _elem_imp(group, elem_, val)

    def us(v: int) -> bytes:
        return struct.pack(bo + "H", v)

    ds = bytearray()
    ds += elem(0x0008, 0x0016, b"UI",
               _pad("1.2.840.10008.5.1.4.1.1.7"))
    ds += elem(0x0008, 0x0060, b"CS", _pad(modality))
    # a nested sequence exercises the SQ walk: defined-length SQ
    # holding one undefined-length item.  PS3.5 §7.1 requires data
    # elements in ascending (group,element) order, so the SQ at
    # (0008,1032) precedes (0010,0010).
    item_body = elem(0x0008, 0x0100, b"SH", _pad("SYNTH"))
    item = struct.pack(bo + "HHI", 0xFFFE, 0xE000, 0xFFFFFFFF) \
        + item_body + struct.pack(bo + "HHI", 0xFFFE, 0xE00D, 0)
    if explicit:
        sq = struct.pack(bo + "HH", 0x0008, 0x1032) + b"SQ\x00\x00" \
            + struct.pack(bo + "I", len(item)) + item
    else:
        sq = struct.pack(bo + "HHI", 0x0008, 0x1032, len(item)) + item
    ds += sq
    ds += elem(0x0010, 0x0010, b"PN", _pad(patient))
    ds += elem(0x0028, 0x0002, b"US", us(1))
    ds += elem(0x0028, 0x0004, b"CS", _pad(photometric))
    if nf > 1:
        ds += elem(0x0028, 0x0008, b"IS", _pad(str(nf)))
    ds += elem(0x0028, 0x0010, b"US", us(rows))
    ds += elem(0x0028, 0x0011, b"US", us(cols))
    ds += elem(0x0028, 0x0100, b"US", us(alloc))
    ds += elem(0x0028, 0x0101, b"US", us(bits_stored))
    ds += elem(0x0028, 0x0102, b"US", us(bits_stored - 1))
    ds += elem(0x0028, 0x0103, b"US", us(0))
    if rescale is not None:
        slope, intercept = rescale
        ds += elem(0x0028, 0x1052, b"DS", _pad(str(intercept)))
        ds += elem(0x0028, 0x1053, b"DS", _pad(str(slope)))

    if ts in _ENCAPSULATED:
        if ts == UID_JPEG_BASELINE:
            raise DicomError(
                "build_dicom writes lossless/RLE frames only "
                "(baseline streams come from the jpeg test encoder)")

        def encode_frame(fr: np.ndarray) -> bytes:
            if ts == UID_RLE:
                return _rle_encode_frame(fr, alloc)
            if ts in (UID_JPEG_LS, UID_JPEG_LS_NEAR):
                from .jpegls import build_jpegls

                return build_jpegls(
                    fr, precision=bits_stored,
                    near=near if ts == UID_JPEG_LS_NEAR else 0)
            if ts == UID_J2K_LOSSLESS:
                from .jpeg2000 import encode_j2k

                return encode_j2k(fr, depth=bits_stored, levels=2)
            if ts == UID_J2K:
                # writer emits the near-lossless 9/7 form (shift 0);
                # decode accepts any quantization the stream declares
                from .jpeg2000 import encode_j2k_lossy

                return encode_j2k_lossy(
                    fr, depth=bits_stored, levels=2, quality_shift=0)
            from .jpeglossless import build_jpeg_lossless

            sv1 = ts == UID_JPEG_LOSSLESS_SV1
            return build_jpeg_lossless(
                fr, predictor=1 if sv1 else predictor,
                precision=bits_stored)

        streams = []
        for fr in frames_arr:
            s = encode_frame(fr)
            streams.append(s + b"\x00" * (len(s) % 2))
        if nf == 1:
            frame = streams[0]
            if fragment_at and 0 < fragment_at < len(frame):
                fa = fragment_at + fragment_at % 2   # even split
                frame_frags = [frame[:fa], frame[fa:]]
            else:
                frame_frags = [frame]
            frags = [b""] + frame_frags
        elif bot:
            # real Basic Offset Table: item-relative frame starts
            starts, pos = [], 0
            for s in streams:
                starts.append(pos)
                pos += 8 + len(s)
            frags = [struct.pack(f"<{nf}I", *starts)] + streams
        else:
            frags = [b""] + streams              # 1 fragment / frame
        enc = struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00" \
            + struct.pack("<I", 0xFFFFFFFF)
        for fg in frags:
            if len(fg) % 2:
                fg += b"\x00"
            enc += struct.pack("<HHI", 0xFFFE, 0xE000, len(fg)) + fg
        enc += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
        ds += enc
    else:
        if alloc == 8:
            raw = frames_arr.astype(np.uint8).tobytes()
        else:
            raw = frames_arr.astype(bo + "u2").tobytes()
        if len(raw) % 2:
            raw += b"\x00"
        ds += elem(0x7FE0, 0x0010, b"OW" if alloc == 16 else b"OB",
                   raw)

    body = bytes(ds)
    if ts == UID_DEFLATED_LE:
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        body = co.compress(body) + co.flush()

    # PS3.10 File Meta elements in ascending tag order, including the
    # required (0002,0001) FileMetaInformationVersion.
    meta = bytearray()
    meta += _elem_exp(0x0002, 0x0001, b"OB", b"\x00\x01")
    meta += _elem_exp(0x0002, 0x0002, b"UI",
                      _pad("1.2.840.10008.5.1.4.1.1.7"))
    meta += _elem_exp(0x0002, 0x0010, b"UI", _pad(ts))
    head = _elem_exp(0x0002, 0x0000, b"UL",
                     struct.pack("<I", len(meta)))
    return b"\x00" * 128 + b"DICM" + head + bytes(meta) + body
