"""GIF decoder (87a/89a, static + animated) — from scratch, stdlib + numpy.

Implements the public GIF specification: logical screen descriptor,
global/local color tables, variable-width LSB-first LZW decompression
(dictionary up to 4096 entries, CLEAR/END codes), interlaced row
reordering, Graphic Control Extensions (transparency + disposal), and
frame composition on the logical screen for animations (disposal methods
0/1 leave, 2 restore-background, 3 restore-previous).

Output contract matches ``png.py``/``jpeg.py``: ``(h, w, 4)`` uint8 RGBA
arrays, so the multimodal operators treat all three image codecs
uniformly.  The codec boundary is genuinely Python and runs inside
mapInPandas Arrow batches.

Reference parity note: the reference stores media as opaque bytea and
never decodes; this backs the strict=True paths of ``decode_images`` /
``image_ahash`` / ``frame_sample`` for ``image/gif`` payloads.
"""

from __future__ import annotations

import struct

import numpy as np
from .codecerrors import guard, guard_iter


class GifError(Exception):
    """Malformed or out-of-scope GIF payload."""


def is_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytearray:
    """Variable-width LSB-first GIF-LZW -> palette index stream."""
    if not 2 <= min_code_size <= 11:
        raise GifError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # dictionary as list of bytes; index = code
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    prev = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                return out  # tolerated: truncated stream ends the image
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise GifError("LZW: first code not in dictionary")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise GifError("LZW: code beyond dictionary")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


def _deinterlace(idx: np.ndarray, h: int, w: int) -> np.ndarray:
    rows = np.empty((h, w), dtype=np.uint8)
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    for src, dst in enumerate(order):
        rows[dst] = idx[src]
    return rows


def _sub_blocks(data: bytes, i: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at offset i; returns
    (payload, offset past the terminator)."""
    out = bytearray()
    n = len(data)
    while True:
        if i >= n:
            raise GifError("truncated sub-block chain")
        ln = data[i]
        i += 1
        if ln == 0:
            return bytes(out), i
        out += data[i : i + ln]
        if i + ln > n:
            raise GifError("sub-block overruns payload")
        i += ln


@guard_iter(GifError)
def decode_gif_frames(data: bytes):
    """Yield ``(frame_idx, width, height, rgba)`` — each frame composed
    on the logical screen per its predecessor's disposal method, the
    ``png.decode_apng_frames`` contract for GIF animations."""
    if not is_gif(data):
        raise GifError("bad signature: not a GIF payload")
    if len(data) < 13:
        raise GifError("truncated header")
    sw, sh = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    bg_index = data[11]
    gct = None
    i = 13
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[i : i + 3 * n], dtype=np.uint8)
        if gct.size != 3 * n:
            raise GifError("truncated global color table")
        gct = gct.reshape(n, 3)
        i += 3 * n

    # logical screen state (RGBA); background starts transparent per
    # every modern renderer (bg color applies only with a GCT + opaque
    # use-cases; transparent is the safe composition default)
    screen = np.zeros((sh, sw, 4), dtype=np.uint8)
    transparent_idx = None
    disposal = 0
    frame_idx = 0
    while True:
        if i >= len(data):
            raise GifError("missing trailer")
        b = data[i]
        i += 1
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension
            if i >= len(data):
                raise GifError("truncated extension")
            label = data[i]
            i += 1
            payload, i = _sub_blocks(data, i)
            if label == 0xF9 and len(payload) >= 4:
                flags = payload[0]
                disposal = (flags >> 2) & 0x07
                transparent_idx = payload[3] if flags & 0x01 else None
            continue
        if b != 0x2C:
            raise GifError(f"unknown block 0x{b:02x}")
        # image descriptor
        left, top, w, h = struct.unpack_from("<HHHH", data, i)
        ipacked = data[i + 8]
        i += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(data[i : i + 3 * n], dtype=np.uint8)
            if pal.size != 3 * n:
                raise GifError("truncated local color table")
            pal = pal.reshape(n, 3)
            i += 3 * n
        if pal is None:
            raise GifError("no color table for image")
        if left + w > sw or top + h > sh:
            raise GifError("frame exceeds logical screen")
        min_code = data[i]
        i += 1
        lzw, i = _sub_blocks(data, i)
        idx_stream = _lzw_decode(min_code, lzw, w * h)
        if len(idx_stream) < w * h:
            raise GifError("LZW stream short of frame size")
        idx = np.frombuffer(
            bytes(idx_stream[: w * h]), dtype=np.uint8
        ).reshape(h, w)
        if idx.max(initial=0) >= len(pal):
            raise GifError("palette index out of range")
        if ipacked & 0x40:
            idx = _deinterlace(idx, h, w)

        prev_region = screen[top : top + h, left : left + w].copy()
        rgba = np.zeros((h, w, 4), dtype=np.uint8)
        rgba[:, :, :3] = pal[idx]
        rgba[:, :, 3] = 255
        if transparent_idx is not None:
            mask = idx == transparent_idx
            # transparent pixels leave the underlying screen visible
            rgba[mask] = screen[top : top + h, left : left + w][mask]
        screen[top : top + h, left : left + w] = rgba
        yield frame_idx, sw, sh, screen.copy()
        frame_idx += 1

        if disposal == 2:  # restore to background (transparent)
            screen[top : top + h, left : left + w] = 0
        elif disposal == 3:  # restore to previous
            screen[top : top + h, left : left + w] = prev_region
        disposal = 0
        transparent_idx = None


@guard(GifError)
def decode_gif(data: bytes) -> np.ndarray:
    """First (or only) frame as (h, w, 4) uint8 RGBA."""
    for _, _, _, rgba in decode_gif_frames(data):
        return rgba
    raise GifError("no image data before trailer")
