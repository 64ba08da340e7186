"""ICO / CUR (Windows icon) decoder — from scratch, stdlib + numpy.

Favicons are the most-fetched image kind in a web crawl (every site
root serves one), and they ship as ICO: a 6-byte header, a directory
of 16-byte entries, and per-entry payloads that are either a PNG
stream or a headerless BMP DIB whose declared height is DOUBLED (the
XOR color image stacked over a 1-bit AND transparency mask).

Decode strategy: PNG entries route to the shared decode_png; DIB
entries get a synthesized 14-byte BMP file header (computed pixel
offset, height halved back) and route through the shared decode_bmp,
after which the AND mask — decoded here — clears alpha (except for
32-bpp entries, whose per-pixel alpha is authoritative when any bit
is set, matching real renderers).  ``decode_ico`` returns the BEST
frame (largest area, then deepest bpp) as RGBA; ``ico_images`` yields
all frames.  The ICO magic is weak (leading zeros), so the sniff
validates the whole directory before claiming a payload.

``build_ico`` is the independent synthesis writer (PNG entries via
encode_png, or 32-bpp DIB entries with the doubled-height mask).

Reference parity note: the reference (SummaryDev/evm-archive) stores
media as opaque bytea; this extends the strict image lane to the
favicon format.  Placement: per-payload work inside Arrow batches
(the codec boundary).
"""

from __future__ import annotations

import struct

import numpy as np

from .codecerrors import guard

MAX_ICO_ENTRIES = 256


class IcoError(ValueError):
    """Malformed or out-of-scope ICO/CUR payload."""


def _entries(b: bytes):
    if len(b) < 6:
        raise IcoError("truncated ICO header")
    zero, kind, count = struct.unpack_from("<HHH", b, 0)
    if zero != 0 or kind not in (1, 2) or not 1 <= count <= MAX_ICO_ENTRIES:
        raise IcoError("not an ICO/CUR payload")
    out = []
    for i in range(count):
        e = 6 + 16 * i
        if e + 16 > len(b):
            raise IcoError("truncated ICO directory")
        w, h, _colors, _rsv, planes, bpp, size, off = struct.unpack_from(
            "<BBBBHHII", b, e)
        if size == 0 or off < 6 + 16 * count or off + size > len(b):
            raise IcoError("ICO entry overruns payload")
        out.append((w or 256, h or 256, planes, bpp, off, size))
    return kind, out


def is_ico(b: bytes) -> bool:
    """Directory-validated sniff (the 00 00 01/02 00 magic alone is
    too weak to claim arbitrary payloads)."""
    try:
        _entries(b)
        return True
    except IcoError:
        return False


def _decode_entry(b: bytes, off: int, size: int) -> np.ndarray:
    payload = b[off: off + size]
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import decode_png

        return decode_png(payload)
    # headerless DIB with doubled height: synthesize the BMP header
    from .bmp import BmpError, decode_bmp

    if len(payload) < 40:
        raise IcoError("truncated ICO DIB entry")
    (hdr_size,) = struct.unpack_from("<I", payload, 0)
    if hdr_size != 40:
        raise IcoError(f"ICO DIB header size {hdr_size} out of scope")
    width, dheight, _planes, bpp, compression = struct.unpack_from(
        "<iiHHI", payload, 4)
    if compression != 0:
        raise IcoError("compressed ICO DIB entries out of scope")
    if dheight % 2 or dheight <= 0 or width <= 0:
        raise IcoError("ICO DIB height must be doubled (XOR + mask)")
    height = dheight // 2
    colors_used = struct.unpack_from("<I", payload, 32)[0]
    n_pal = (colors_used or (1 << bpp)) if bpp <= 8 else 0
    pix_off = 14 + hdr_size + 4 * n_pal
    dib = bytearray(payload)
    struct.pack_into("<i", dib, 8, height)       # un-double for BMP
    bmp = (b"BM" + struct.pack("<IHHI", 14 + len(dib), 0, 0, pix_off)
           + bytes(dib))
    try:
        rgba = decode_bmp(bmp)
    except BmpError as e:
        raise IcoError(f"ICO DIB entry: {e}") from e
    # AND mask: 1-bit rows (bottom-up, 4-byte aligned) after the XOR
    # image; a set bit = transparent.  32-bpp entries keep their own
    # alpha channel when it is non-empty (real renderers' rule).
    xor_rows = (width * bpp + 31) // 32 * 4 * height
    mask_stride = (width + 31) // 32 * 4
    mask_off = hdr_size + 4 * n_pal + xor_rows
    mask = payload[mask_off: mask_off + mask_stride * height]
    if len(mask) < mask_stride * height:
        raise IcoError("ICO AND mask overruns entry")
    bits = np.unpackbits(
        np.frombuffer(mask, dtype=np.uint8).reshape(height, mask_stride),
        axis=1)[:, :width]
    bits = bits[::-1]                             # bottom-up like the DIB
    if bpp == 32 and rgba[:, :, 3].any():
        return rgba                               # alpha authoritative
    out = rgba.copy()
    out[:, :, 3] = np.where(bits == 1, 0, 255).astype(np.uint8)
    return out


def ico_images(b: bytes):
    """Yield ``(width, height, bpp, rgba)`` per directory entry."""
    _kind, entries = _entries(b)
    for _w, _h, _planes, bpp, off, size in entries:
        rgba = _decode_entry(b, off, size)
        yield rgba.shape[1], rgba.shape[0], bpp, rgba


@guard(IcoError)
def decode_ico(b: bytes) -> np.ndarray:
    """The best frame (largest area, then deepest bpp) as (h, w, 4)
    uint8 RGBA — the shared image-codec contract.

    Best-frame selection tolerates per-entry failures: a real favicon
    often mixes decodable frames with an out-of-scope one (e.g. a
    compressed DIB), and one bad entry must not fail the icon when
    another decodes (r9 ADVICE) — only an ICO whose EVERY entry fails
    raises."""
    if not is_ico(b):
        raise IcoError("not an ICO/CUR payload")
    _kind, entries = _entries(b)
    best = None
    best_key = (-1, -1)
    for _w, _h, bpp, off, size in (
            (e[0], e[1], e[3], e[4], e[5]) for e in entries):
        try:
            rgba = _decode_entry(b, off, size)
        except ValueError:
            # IcoError / BmpError / PngError are all ValueError-rooted
            continue
        key = (rgba.shape[1] * rgba.shape[0], bpp)
        if key > best_key:
            best_key, best = key, rgba
    if best is None:
        raise IcoError("ICO with no decodable entries")
    return best


# -- synthesis writer ----------------------------------------------------------


def build_ico(frames: list[np.ndarray], png: bool = False) -> bytes:
    """Write an ICO from (h, w, 4) RGBA frames: PNG entries (the
    modern favicon form) or 32-bpp DIB entries with the doubled-height
    AND mask derived from alpha.  Independent of the reader."""
    payloads = []
    dims = []
    for rgba in frames:
        h, w = rgba.shape[:2]
        if not (1 <= w <= 256 and 1 <= h <= 256):
            raise IcoError("ICO frames are at most 256x256")
        dims.append((w, h))
        if png:
            from .png import encode_png

            payloads.append(encode_png(rgba))
            continue
        bgra = rgba[::-1, :, [2, 1, 0, 3]].tobytes()   # bottom-up BGRA
        mask_stride = (w + 31) // 32 * 4
        alpha = rgba[:, :, 3] == 0
        mask = np.packbits(alpha[::-1], axis=1)
        rows = np.zeros((h, mask_stride), dtype=np.uint8)
        rows[:, : mask.shape[1]] = mask
        dib = struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 32, 0,
                          len(bgra) + rows.size, 0, 0, 0, 0)
        payloads.append(dib + bgra + rows.tobytes())
    out = struct.pack("<HHH", 0, 1, len(frames))
    off = 6 + 16 * len(frames)
    for (w, h), p in zip(dims, payloads):
        out += struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0, 1,
                           0 if png else 32, len(p), off)
        off += len(p)
    return out + b"".join(payloads)
