"""ZSoft PCX decoder — from scratch, stdlib + numpy (public format:
the ZSoft PCX technical reference).

PCX is the DOS-era paint format that still surfaces in retro-software
and clip-art corpora: a 128-byte header (magic 0x0A, version,
RLE-encoding flag, bits per plane, window, plane count, bytes per
scanline), per-row RLE (top-two-bits-set count byte runs), and either
a 16-color header palette, a 256-color palette 769 bytes from the end
(0x0C marker), or 3 planes of RGB.  Supported: 1-bit monochrome,
8-bit palette (1 plane), 24-bit RGB (3 planes of 8), and 4-bit
16-color (4 planes of 1 or 1 plane of 4).

``build_pcx`` is the independent fixture writer (8-bit palette and
24-bit planar forms).

Reference parity note: the reference (SummaryDev/evm-archive) stores
media as opaque bytea; this extends the strict image lane.
Placement: per-payload work inside Arrow batches (the codec
boundary).
"""

from __future__ import annotations

import struct

import numpy as np

from .codecerrors import guard

MAX_PCX_PIXELS = 64 * 1024 * 1024


class PcxError(ValueError):
    """Malformed or out-of-scope PCX payload."""


def is_pcx(b: bytes) -> bool:
    return (len(b) >= 128 and b[0] == 0x0A
            and b[1] in (0, 2, 3, 4, 5) and b[2] == 1
            and b[3] in (1, 2, 4, 8))


def _rle(b: bytes, pos: int, need: int) -> bytes:
    out = bytearray()
    n = len(b)
    while len(out) < need:
        if pos >= n:
            raise PcxError("PCX RLE stream exhausted")
        c = b[pos]
        pos += 1
        if c >= 0xC0:
            if pos >= n:
                raise PcxError("PCX RLE run overruns payload")
            out += bytes([b[pos]]) * (c & 0x3F)
            pos += 1
        else:
            out.append(c)
    return bytes(out[:need])


@guard(PcxError)
def decode_pcx(b: bytes) -> np.ndarray:
    """(h, w, 4) uint8 RGBA — the shared image-codec contract."""
    if not is_pcx(b):
        raise PcxError("not a PCX payload")
    bpp = b[3]
    x0, y0, x1, y1 = struct.unpack_from("<HHHH", b, 4)
    w, h = x1 - x0 + 1, y1 - y0 + 1
    planes = b[65]
    bpl = struct.unpack_from("<H", b, 66)[0]
    if w <= 0 or h <= 0 or w * h > MAX_PCX_PIXELS:
        raise PcxError("PCX dimensions out of range")
    if (bpp, planes) not in ((8, 1), (8, 3), (1, 1), (1, 4), (4, 1)):
        raise PcxError(
            f"PCX {bpp}-bit x {planes}-plane layout out of scope")
    if bpl < (w * bpp + 7) // 8:
        raise PcxError("PCX bytes-per-line smaller than the window")
    rows = _rle(b, 128, bpl * planes * h)
    arr = np.frombuffer(rows, dtype=np.uint8).reshape(h, planes, bpl)

    out = np.empty((h, w, 4), dtype=np.uint8)
    out[:, :, 3] = 255
    if (bpp, planes) == (8, 3):                 # 24-bit RGB planes
        out[:, :, 0] = arr[:, 0, :w]
        out[:, :, 1] = arr[:, 1, :w]
        out[:, :, 2] = arr[:, 2, :w]
        return out
    if (bpp, planes) == (8, 1):                 # 256-color palette
        if len(b) < 769 or b[-769] != 0x0C:
            raise PcxError("PCX missing 256-color palette marker")
        pal = np.frombuffer(b[-768:], dtype=np.uint8).reshape(256, 3)
        idx = arr[:, 0, :w]
        out[:, :, :3] = pal[idx]
        return out
    if (bpp, planes) == (1, 1):                 # monochrome
        bits = np.unpackbits(arr[:, 0, :], axis=1)[:, :w]
        g = (bits * 255).astype(np.uint8)
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = g
        return out
    # 16-color: indices from 4 1-bit planes or 1 4-bit plane, header
    # palette at offset 16 (16 RGB triples)
    pal = np.frombuffer(b[16:64], dtype=np.uint8).reshape(16, 3)
    if (bpp, planes) == (1, 4):
        bits = np.unpackbits(arr, axis=2)[:, :, :w]
        idx = (bits[:, 0] | (bits[:, 1] << 1) | (bits[:, 2] << 2)
               | (bits[:, 3] << 3))
    else:                                       # (4, 1)
        hi = arr[:, 0, :] >> 4
        lo = arr[:, 0, :] & 0xF
        idx = np.empty((h, bpl * 2), dtype=np.uint8)
        idx[:, 0::2] = hi
        idx[:, 1::2] = lo
        idx = idx[:, :w]
    out[:, :, :3] = pal[idx]
    return out


# -- synthesis writer ----------------------------------------------------------


def _rle_row(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and run < 63 and row[i + run] == row[i]:
            run += 1
        if run > 1 or row[i] >= 0xC0:
            out += bytes([0xC0 | run, row[i]])
        else:
            out.append(row[i])
        i += run
    return bytes(out)


def build_pcx(rgba: np.ndarray, palette: bool = False) -> bytes:
    """Write a PCX from (h, w, 4) RGBA: 24-bit 3-plane, or 8-bit
    palette (``palette=True``; <= 256 distinct colors).  Independent
    of the reader."""
    rgba = np.asarray(rgba, dtype=np.uint8)
    h, w = rgba.shape[:2]
    bpl = w + (w & 1)                           # even bytes-per-line
    if palette:
        flat = rgba[:, :, :3].reshape(-1, 3)
        colors, idx = np.unique(flat, axis=0, return_inverse=True)
        if colors.shape[0] > 256:
            raise PcxError("palette writer wants <= 256 colors")
        planes, nplanes = [idx.astype(np.uint8).reshape(h, w)], 1
        pal = np.zeros((256, 3), dtype=np.uint8)
        pal[:colors.shape[0]] = colors
        tail = b"\x0c" + pal.tobytes()
    else:
        planes = [rgba[:, :, c] for c in range(3)]
        nplanes = 3
        tail = b""
    head = bytearray(128)
    head[0], head[1], head[2], head[3] = 0x0A, 5, 1, 8
    struct.pack_into("<HHHH", head, 4, 0, 0, w - 1, h - 1)
    struct.pack_into("<HH", head, 12, 72, 72)
    head[65] = nplanes
    struct.pack_into("<H", head, 66, bpl)
    struct.pack_into("<H", head, 68, 1)
    body = bytearray()
    for y in range(h):
        for p in planes:
            row = bytes(p[y]) + b"\x00" * (bpl - w)
            body += _rle_row(row)
    return bytes(head) + bytes(body) + tail
