"""Truevision TGA decoder — from scratch, stdlib + numpy (public
format: the Truevision TGA 2.0 specification).

TGA is the classic texture/screenshot format still common in game
asset dumps and retro corpora: an 18-byte header (image type,
colormap spec, dims, pixel depth, descriptor), optional image ID and
palette, then pixels — raw or RLE-packed (high-bit run packets),
BGR(A) byte order, bottom-up unless the descriptor's top-to-bottom
bit is set.  Supported: types 1/2/3 (palette / truecolor / gray) and
their RLE forms 9/10/11 at 8/16(1-5-5-5)/24/32-bit depths.

TGA has NO magic header; the optional v2.0 footer signature
(``TRUEVISION-XFILE.\\x00`` in the last 26 bytes) is required by
``is_tga`` so the shared image-codec sniff never claims arbitrary
payloads — ``decode_tga`` itself accepts footerless (v1) files when
called directly.

``build_tga`` is the independent fixture writer (all three image
types, raw and RLE, both row orders, footer included).

Reference parity note: the reference (SummaryDev/evm-archive) stores
media as opaque bytea; this extends the strict image lane.
Placement: per-payload work inside Arrow batches (the codec
boundary).
"""

from __future__ import annotations

import struct

import numpy as np

from .codecerrors import guard

MAX_TGA_PIXELS = 64 * 1024 * 1024
_FOOTER_SIG = b"TRUEVISION-XFILE.\x00"


class TgaError(ValueError):
    """Malformed or out-of-scope TGA payload."""


def is_tga(b: bytes) -> bool:
    """Footer-validated sniff (the format is magic-less)."""
    if len(b) < 18 + 26 or not b.endswith(_FOOTER_SIG):
        return False
    return _header_ok(b)


def _header_ok(b: bytes) -> bool:
    if len(b) < 18:
        return False
    cmap_type, img_type = b[1], b[2]
    depth = b[16]
    w, h = struct.unpack_from("<HH", b, 12)
    return (cmap_type in (0, 1)
            and img_type in (1, 2, 3, 9, 10, 11)
            and depth in (8, 16, 24, 32)
            and w > 0 and h > 0)


def _expand(px: np.ndarray, depth: int, pal: np.ndarray | None,
            img_type: int) -> np.ndarray:
    """(n, bytes-per-pixel) uint8 -> (n, 4) RGBA."""
    n = px.shape[0]
    out = np.empty((n, 4), dtype=np.uint8)
    out[:, 3] = 255
    if img_type in (1, 9):                      # palette indices
        if pal is None:
            raise TgaError("palette TGA without a colormap")
        idx = px[:, 0]
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise TgaError("palette index out of range")
        return pal[idx]
    if img_type in (3, 11):                     # grayscale
        out[:, 0] = out[:, 1] = out[:, 2] = px[:, 0]
        return out
    if depth == 16:                             # A RRRRR GGGGG BBBBB
        v = px[:, 0].astype(np.uint16) | (px[:, 1].astype(
            np.uint16) << 8)
        out[:, 0] = (((v >> 10) & 31) * 255 // 31).astype(np.uint8)
        out[:, 1] = (((v >> 5) & 31) * 255 // 31).astype(np.uint8)
        out[:, 2] = ((v & 31) * 255 // 31).astype(np.uint8)
        return out
    out[:, 0] = px[:, 2]                        # BGR(A) order
    out[:, 1] = px[:, 1]
    out[:, 2] = px[:, 0]
    if depth == 32:
        out[:, 3] = px[:, 3]
    return out


@guard(TgaError)
def decode_tga(b: bytes) -> np.ndarray:
    """(h, w, 4) uint8 RGBA — the shared image-codec contract."""
    if not _header_ok(b):
        raise TgaError("not a TGA payload")
    id_len, cmap_type, img_type = b[0], b[1], b[2]
    cmap_first, cmap_len, cmap_bits = struct.unpack_from("<HHB", b, 3)
    w, h = struct.unpack_from("<HH", b, 12)
    depth, desc = b[16], b[17]
    if w * h > MAX_TGA_PIXELS:
        raise TgaError("TGA dimensions over cap")
    if img_type in (1, 9) and depth != 8:
        raise TgaError("palette TGA must be 8-bit indices")
    if img_type in (3, 11) and depth != 8:
        raise TgaError("gray TGA must be 8-bit")
    pos = 18 + id_len
    pal = None
    if cmap_type == 1:
        if cmap_bits not in (16, 24, 32):
            raise TgaError(f"colormap depth {cmap_bits} out of scope")
        entry = cmap_bits // 8
        raw = b[pos:pos + cmap_len * entry]
        if len(raw) < cmap_len * entry:
            raise TgaError("colormap overruns payload")
        pos += cmap_len * entry
        table = np.zeros((cmap_first + cmap_len, 4), dtype=np.uint8)
        ent = np.frombuffer(raw, dtype=np.uint8).reshape(-1, entry)
        pal_rgba = _expand(
            ent, cmap_bits, None, 2 if cmap_bits > 8 else 3)
        table[cmap_first:cmap_first + cmap_len] = pal_rgba
        pal = table
    bpp = depth // 8
    need = w * h * bpp
    if img_type >= 9:                           # RLE packets
        out = bytearray()
        p = pos
        while len(out) < need:
            if p >= len(b):
                raise TgaError("RLE stream exhausted")
            ctrl = b[p]
            p += 1
            count = (ctrl & 0x7F) + 1
            if ctrl & 0x80:
                pix = b[p:p + bpp]
                if len(pix) < bpp:
                    raise TgaError("RLE run overruns payload")
                p += bpp
                out += pix * count
            else:
                lit = b[p:p + count * bpp]
                if len(lit) < count * bpp:
                    raise TgaError("RLE literal overruns payload")
                p += count * bpp
                out += lit
        raw = bytes(out[:need])
    else:
        raw = b[pos:pos + need]
        if len(raw) < need:
            raise TgaError("pixel data overruns payload")
    px = np.frombuffer(raw, dtype=np.uint8).reshape(-1, bpp)
    rgba = _expand(px, depth, pal, img_type).reshape(h, w, 4)
    if not desc & 0x20:                         # bottom-up default
        rgba = rgba[::-1]
    if desc & 0x10:                             # right-to-left
        rgba = rgba[:, ::-1]
    return np.ascontiguousarray(rgba)


# -- synthesis writer ----------------------------------------------------------


def build_tga(rgba: np.ndarray, img_type: int = 2, rle: bool = False,
              top_down: bool = True, footer: bool = True) -> bytes:
    """Write a TGA from an (h, w, 4) RGBA array: type 2 (truecolor
    32-bit), 3 (gray from channel 0), or 1 (palette — the image must
    use <= 256 distinct colors).  Independent of the reader."""
    rgba = np.asarray(rgba, dtype=np.uint8)
    h, w = rgba.shape[:2]
    body = rgba if top_down else rgba[::-1]
    pal_blob = b""
    cmap_spec = (0, 0, 0)
    cmap_type = 0
    if img_type == 2:
        px = body[:, :, [2, 1, 0, 3]].reshape(-1, 4)
        depth = 32
    elif img_type == 3:
        px = body[:, :, 0].reshape(-1, 1)
        depth = 8
    elif img_type == 1:
        flat = body.reshape(-1, 4)
        colors, idx = np.unique(flat, axis=0, return_inverse=True)
        if colors.shape[0] > 256:
            raise TgaError("palette writer wants <= 256 colors")
        pal_blob = colors[:, [2, 1, 0, 3]].tobytes()
        cmap_spec = (0, colors.shape[0], 32)
        cmap_type = 1
        px = idx.astype(np.uint8).reshape(-1, 1)
        depth = 8
    else:
        raise TgaError(f"writer image type {img_type}")
    stream = px.tobytes()
    if rle:
        img_type += 8
        bpp = depth // 8
        out = bytearray()
        pix = [stream[i:i + bpp] for i in range(0, len(stream), bpp)]
        i = 0
        while i < len(pix):
            run = 1
            while (i + run < len(pix) and run < 128
                   and pix[i + run] == pix[i]):
                run += 1
            if run >= 2:
                out += bytes([0x80 | (run - 1)]) + pix[i]
                i += run
                continue
            lit = i
            while (i < len(pix) and i - lit < 128
                   and not (i + 1 < len(pix) and pix[i] == pix[i + 1])):
                i += 1
            out += bytes([i - lit - 1]) + b"".join(pix[lit:i])
        stream = bytes(out)
    head = struct.pack(
        "<BBBHHBHHHHBB", 0, cmap_type, img_type,
        cmap_spec[0], cmap_spec[1], cmap_spec[2],
        0, 0, w, h, depth, 0x20 if top_down else 0)
    out = head + pal_blob + stream
    if footer:
        out += struct.pack("<II", 0, 0) + _FOOTER_SIG
    return out
