"""PSD (Adobe Photoshop) composite decoder — from scratch, stdlib +
numpy (public format: Adobe's Photoshop File Format specification).

Design-asset corpora are full of PSDs, and every PSD carries a
flattened COMPOSITE image after the layer section — decoding it needs
no layer compositing: header ('8BPS', version 1, channel count, dims,
depth, color mode), three length-prefixed sections skipped over
(color-mode data — read for the indexed palette — image resources,
layers & masks), then the composite: a compression tag (0 raw /
1 PackBits RLE with a per-row byte-count table) over PLANAR channel
data (all of channel 0's rows, then channel 1, ...).

Scope: 8-bit depth; grayscale (mode 1, 1-2 channels), indexed
(mode 2, 768-byte planar palette), and RGB (mode 3, 3-4 channels,
the 4th taken as alpha).  16/32-bit depths, CMYK/Lab/duotone modes
and ZIP-compressed composites are typed, named.  ``build_psd`` is
the independent synthesis writer (raw and RLE, all three modes).

Reference parity note: the reference (SummaryDev/evm-archive) stores
media as opaque bytea; this extends the strict image lane to the
design-asset format.  Placement: per-payload work inside Arrow
batches (the codec boundary).
"""

from __future__ import annotations

import struct

import numpy as np

from .codecerrors import guard

MAX_PSD_PIXELS = 1 << 26


class PsdError(ValueError):
    """Malformed or out-of-scope PSD payload."""


def is_psd(b: bytes) -> bool:
    return len(b) >= 6 and b[:4] == b"8BPS" and b[4:6] == b"\x00\x01"


def _packbits_rows(data: bytes, counts, width: int) -> np.ndarray:
    """PackBits-decode one channel's rows (count-prefixed)."""
    from .tiff import TiffError, _packbits_decode

    rows = np.empty((len(counts), width), dtype=np.uint8)
    pos = 0
    for i, cnt in enumerate(counts):
        chunk = data[pos: pos + cnt]
        if len(chunk) < cnt:
            raise PsdError("PSD RLE row overruns payload")
        try:
            dec = _packbits_decode(chunk, width)
        except TiffError as e:
            raise PsdError(f"PSD RLE row: {e}") from e
        if len(dec) < width:
            raise PsdError("PSD RLE row short")
        rows[i] = np.frombuffer(dec[:width], dtype=np.uint8)
        pos += cnt
    return rows


@guard(PsdError)
def decode_psd(b: bytes) -> np.ndarray:
    """Decode the flattened composite to (h, w, 4) uint8 RGBA."""
    if not is_psd(b):
        raise PsdError("not a PSD payload (8BPS v1 missing)")
    if len(b) < 26:
        raise PsdError("truncated PSD header")
    channels, height, width, depth, mode = struct.unpack_from(
        ">HIIHH", b, 12)
    if depth != 8:
        raise PsdError(f"{depth}-bit PSD out of scope (8-bit only)")
    if height * width > MAX_PSD_PIXELS or height == 0 or width == 0:
        raise PsdError("PSD dimensions out of range")
    if mode not in (1, 2, 3):
        names = {0: "bitmap", 4: "CMYK", 7: "multichannel",
                 8: "duotone", 9: "Lab"}
        raise PsdError(
            f"PSD color mode {names.get(mode, mode)} out of scope "
            "(grayscale/indexed/RGB only)")
    pos = 26
    palette = None
    # three length-prefixed sections: color-mode data, resources, layers
    for section in range(3):
        if pos + 4 > len(b):
            raise PsdError("truncated PSD section header")
        (ln,) = struct.unpack_from(">I", b, pos)
        pos += 4
        if pos + ln > len(b):
            raise PsdError("PSD section overruns payload")
        if section == 0 and mode == 2:
            if ln != 768:
                raise PsdError("indexed PSD without a 768-byte palette")
            pal = np.frombuffer(b[pos:pos + 768], dtype=np.uint8)
            palette = pal.reshape(3, 256).T        # planar R,G,B
        pos += ln
    if pos + 2 > len(b):
        raise PsdError("truncated PSD composite")
    (comp,) = struct.unpack_from(">H", b, pos)
    pos += 2
    if comp not in (0, 1):
        raise PsdError(
            f"PSD compression {comp} out of scope (raw/RLE only)")

    planes = []
    if comp == 0:
        need = channels * height * width
        if pos + need > len(b):
            raise PsdError("raw PSD composite short")
        for c in range(channels):
            start = pos + c * height * width
            planes.append(np.frombuffer(
                b[start: start + height * width], dtype=np.uint8
            ).reshape(height, width))
    else:
        n_rows = channels * height
        if pos + 2 * n_rows > len(b):
            raise PsdError("PSD RLE count table short")
        counts = struct.unpack_from(f">{n_rows}H", b, pos)
        pos += 2 * n_rows
        data = b[pos:]
        off = 0
        for c in range(channels):
            ch_counts = counts[c * height: (c + 1) * height]
            planes.append(_packbits_rows(data[off:], ch_counts, width))
            off += sum(ch_counts)

    out = np.empty((height, width, 4), dtype=np.uint8)
    out[:, :, 3] = 255
    if mode == 1:                                  # grayscale (+alpha)
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = planes[0]
        if channels >= 2:
            out[:, :, 3] = planes[1]
    elif mode == 2:                                # indexed
        if palette is None:
            raise PsdError("indexed PSD without palette")
        idx = planes[0]
        out[:, :, :3] = palette[idx]
    else:                                          # RGB (+alpha)
        if channels < 3:
            raise PsdError("RGB PSD with fewer than 3 channels")
        for k in range(3):
            out[:, :, k] = planes[k]
        if channels >= 4:
            out[:, :, 3] = planes[3]
    return out


# -- synthesis writer ----------------------------------------------------------


def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit = i
        while (i < n and i - lit < 128
               and not (i + 2 < n and row[i] == row[i + 1] == row[i + 2])):
            i += 1
        out += bytes([i - lit - 1]) + row[lit:i]
    return bytes(out)


def build_psd(img: np.ndarray, *, rle: bool = True,
              mode: int | None = None,
              palette: np.ndarray | None = None) -> bytes:
    """Write a valid PSD: (h, w) gray, (h, w) indices + ``palette``
    (256x3) for mode 2, or (h, w, 3|4) RGB(A).  ``rle`` picks PackBits
    vs raw.  Independent of the reader."""
    if img.ndim == 2:
        planes = [np.ascontiguousarray(img, dtype=np.uint8)]
        mode = mode if mode is not None else 1
    else:
        planes = [np.ascontiguousarray(img[:, :, k], dtype=np.uint8)
                  for k in range(img.shape[2])]
        mode = 3
    h, w = planes[0].shape
    out = bytearray(b"8BPS\x00\x01" + b"\x00" * 6)
    out += struct.pack(">HIIHH", len(planes), h, w, 8, mode)
    if mode == 2:
        if palette is None or palette.shape != (256, 3):
            raise PsdError("indexed build needs a (256,3) palette")
        out += struct.pack(">I", 768)
        out += np.ascontiguousarray(palette.T, dtype=np.uint8).tobytes()
    else:
        out += struct.pack(">I", 0)
    out += struct.pack(">I", 0)                    # image resources
    out += struct.pack(">I", 0)                    # layers & masks
    if not rle:
        out += struct.pack(">H", 0)
        for p in planes:
            out += p.tobytes()
        return bytes(out)
    out += struct.pack(">H", 1)
    encoded = []
    counts = []
    for p in planes:
        for y in range(h):
            e = _packbits_encode(p[y].tobytes())
            encoded.append(e)
            counts.append(len(e))
    out += struct.pack(f">{len(counts)}H", *counts)
    out += b"".join(encoded)
    return bytes(out)
