"""From-scratch stdlib BMP decoder (no image libs in this env).

Implements the public Windows BMP format (BITMAPFILEHEADER + DIB
header): BITMAPCOREHEADER (12-byte, OS/2) and BITMAPINFOHEADER-family
(40/52/56/108/124-byte) headers, 1/4/8-bit palette images, 16-bit
RGB555, 24-bit BGR, 32-bit BGRX/BGRA, RLE8/RLE4 compression (run,
absolute, end-of-line/bitmap, delta escapes), bottom-up and top-down
row orders, and 4-byte row padding.

Out of scope (documented): BI_BITFIELDS with non-default masks,
BI_JPEG/BI_PNG embeddings, ICC-profiled V5 color spaces — these raise
``BmpError`` so the multimodal strict path surfaces them honestly.

Decode contract matches ``png.decode_png``: an (h, w, 4) uint8 RGBA
array, so the multimodal image operators route BMP payloads through
the same pixel paths (reference parity: evm-archive stores opaque
payload bytes; the decode boundary is ours — see multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np
from .codecerrors import guard


class BmpError(ValueError):
    """Malformed or out-of-scope BMP payload."""


def is_bmp(payload: bytes) -> bool:
    return len(payload) >= 2 and payload[:2] == b"BM"


def _palette_rgba(raw: bytes, n: int, quad: bool) -> np.ndarray:
    """Palette entries are BGRA quads (info headers) or BGR triples
    (core header); returns (n, 4) RGBA."""
    step = 4 if quad else 3
    if len(raw) < n * step:
        raise BmpError("truncated palette")
    pal = np.zeros((max(n, 1), 4), dtype=np.uint8)
    for i in range(n):
        b, g, r = raw[i * step], raw[i * step + 1], raw[i * step + 2]
        pal[i] = (r, g, b, 255)
    return pal


def _decode_rle(
    data: bytes, width: int, height: int, four_bit: bool
) -> np.ndarray:
    """RLE8/RLE4 to a (height, width) index array (top-down order)."""
    idx = np.zeros((height, width), dtype=np.uint8)
    x = y = 0
    pos = 0
    n = len(data)
    while pos + 1 < n:
        count, value = data[pos], data[pos + 1]
        pos += 2
        if count > 0:
            if four_bit:
                pair = [(value >> 4) & 0xF, value & 0xF]
                for i in range(count):
                    if y < height and x < width:
                        idx[y, x] = pair[i & 1]
                    x += 1
            else:
                end = min(x + count, width)
                if y < height and x < width:
                    idx[y, x:end] = value
                x += count
        elif value == 0:  # end of line
            x, y = 0, y + 1
        elif value == 1:  # end of bitmap
            return idx
        elif value == 2:  # delta
            if pos + 2 > n:
                raise BmpError("truncated RLE delta")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
        else:  # absolute mode: `value` raw pixels, word-aligned
            cnt = value
            if four_bit:
                nbytes = (cnt + 1) // 2
                if pos + nbytes > n:
                    raise BmpError("truncated RLE absolute run")
                for i in range(cnt):
                    byte = data[pos + i // 2]
                    v = (byte >> 4) & 0xF if i % 2 == 0 else byte & 0xF
                    if y < height and x < width:
                        idx[y, x] = v
                    x += 1
                pos += nbytes + (nbytes & 1)
            else:
                if pos + cnt > n:
                    raise BmpError("truncated RLE absolute run")
                for i in range(cnt):
                    if y < height and x < width:
                        idx[y, x] = data[pos + i]
                    x += 1
                pos += cnt + (cnt & 1)
    return idx


@guard(BmpError)
def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a BMP payload -> (h, w, 4) uint8 RGBA."""
    if not is_bmp(payload):
        raise BmpError("not a BMP payload")
    if len(payload) < 14 + 12:
        raise BmpError("truncated BMP header")
    pix_off = struct.unpack_from("<I", payload, 10)[0]
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if 14 + hdr_size > len(payload):
        raise BmpError("truncated DIB header")

    if hdr_size == 12:  # BITMAPCOREHEADER: u16 dims, BGR palette
        width, height, planes, bpp = struct.unpack_from("<HHHH", payload, 18)
        compression = 0
        colors_used = 0
        top_down = False
        quad_palette = False
    elif hdr_size in (40, 52, 56, 64, 108, 124):
        width, height, planes, bpp, compression, _imgsz = struct.unpack_from(
            "<iiHHII", payload, 18
        )
        colors_used = struct.unpack_from("<I", payload, 46)[0]
        top_down = height < 0
        height = abs(height)
        quad_palette = True
    else:
        raise BmpError(f"unsupported DIB header size {hdr_size}")

    if planes != 1:
        raise BmpError(f"bad plane count {planes}")
    if width <= 0 or height <= 0 or width * height > 1 << 28:
        raise BmpError(f"bad dimensions {width}x{height}")
    if compression == 3 and bpp in (16, 32):
        # BI_BITFIELDS with the default 555/888 masks behaves like BI_RGB;
        # reading the masks to verify is the honest boundary.  For a
        # 40-byte header the three masks follow it; V4/V5 embed them at
        # the same offset inside the header.
        mask_off = 14 + (hdr_size if hdr_size == 40 else 40)
        if mask_off + 12 > len(payload):
            raise BmpError("truncated bitfield masks")
        masks = struct.unpack_from("<III", payload, mask_off)
        default = (0x7C00, 0x3E0, 0x1F) if bpp == 16 else \
            (0xFF0000, 0xFF00, 0xFF)
        if masks != default:
            raise BmpError(f"unsupported bitfield masks {masks}")
        compression = 0
    if compression not in (0, 1, 2):
        raise BmpError(f"unsupported compression {compression}")
    if compression == 1 and bpp != 8:
        raise BmpError("RLE8 requires 8-bit pixels")
    if compression == 2 and bpp != 4:
        raise BmpError("RLE4 requires 4-bit pixels")
    if bpp not in (1, 4, 8, 16, 24, 32):
        raise BmpError(f"unsupported bit depth {bpp}")
    if top_down and compression:
        raise BmpError("top-down RLE is not valid BMP")

    # palette sits between the DIB header (+masks) and the pixel data
    pal_off = 14 + hdr_size
    if bpp <= 8:
        n_colors = colors_used or (1 << bpp)
        if n_colors > 256:
            raise BmpError(f"bad palette size {n_colors}")
        # writers may store fewer than 2^bpp entries (the gap before
        # pix_off is authoritative); indexes past the stored palette
        # are rejected below
        step = 4 if quad_palette else 3
        avail = max(0, (min(pix_off, len(payload)) - pal_off) // step)
        if avail == 0:
            raise BmpError("missing palette")
        palette = _palette_rgba(
            payload[pal_off:pix_off], min(n_colors, avail), quad_palette
        )
    if pix_off > len(payload):
        raise BmpError("pixel data offset beyond payload")
    data = payload[pix_off:]

    if compression:
        idx = _decode_rle(data, width, height, four_bit=(compression == 2))
        # RLE coordinates are bottom-up (y=0 is the bottom row)
        idx = idx[::-1]
        if int(idx.max()) >= len(palette):
            raise BmpError("palette index out of range")
        return palette[idx]

    row_bytes = (width * bpp + 7) // 8
    stride = (row_bytes + 3) & ~3
    if len(data) < stride * height - (stride - row_bytes):
        raise BmpError("truncated pixel data")
    rows = np.frombuffer(
        data[: stride * height].ljust(stride * height, b"\x00"),
        dtype=np.uint8,
    ).reshape(height, stride)[:, :row_bytes]
    if not top_down:
        rows = rows[::-1]

    if bpp == 1:
        bits = np.unpackbits(rows, axis=1)[:, :width]
        idx = bits.astype(np.uint8)
    elif bpp == 4:
        hi = (rows >> 4) & 0xF
        lo = rows & 0xF
        idx = np.stack([hi, lo], axis=2).reshape(height, -1)[:, :width]
    elif bpp == 8:
        idx = rows[:, :width]
    elif bpp == 16:
        px = rows[:, : width * 2].copy().view("<u2").reshape(height, width)
        out = np.zeros((height, width, 4), dtype=np.uint8)
        # RGB555, upscaled to 8-bit by bit replication
        for c, shift in ((0, 10), (1, 5), (2, 0)):
            v = ((px >> shift) & 0x1F).astype(np.uint16)
            out[..., c] = ((v << 3) | (v >> 2)).astype(np.uint8)
        out[..., 3] = 255
        return out
    elif bpp == 24:
        px = rows[:, : width * 3].reshape(height, width, 3)
        out = np.zeros((height, width, 4), dtype=np.uint8)
        out[..., 0] = px[..., 2]
        out[..., 1] = px[..., 1]
        out[..., 2] = px[..., 0]
        out[..., 3] = 255
        return out
    else:  # 32
        px = rows[:, : width * 4].reshape(height, width, 4)
        out = np.zeros((height, width, 4), dtype=np.uint8)
        out[..., 0] = px[..., 2]
        out[..., 1] = px[..., 1]
        out[..., 2] = px[..., 0]
        # alpha: BGRA carries it; BGRX writers leave 0 -> treat 0-everywhere
        # as opaque (the universal viewer convention)
        alpha = px[..., 3]
        out[..., 3] = alpha if alpha.any() else 255
        return out

    if int(idx.max()) >= len(palette):
        raise BmpError("palette index out of range")
    return palette[idx]
