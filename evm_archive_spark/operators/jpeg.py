"""Baseline JPEG decoder — from scratch, stdlib + numpy only.

Implements the baseline sequential DCT process of the public ITU-T T.81
(ISO/IEC 10918-1) specification: marker segment walk, DQT/DHT/SOF0/SOS/DRI
parsing, Huffman entropy decode with byte unstuffing and restart markers,
dequantization, zig-zag reorder, 8x8 inverse DCT (vectorized over all
blocks per component), chroma upsampling for any sampling factors declared
in SOF0 (4:4:4, 4:2:2, 4:2:0, ...), and JFIF YCbCr -> RGB conversion.

Scope (mirrors png.py's honest-boundary pattern — clear errors, no silent
wrong pixels):

- baseline sequential Huffman only: SOF0.  Progressive (SOF2), extended
  sequential (SOF1), lossless and arithmetic-coded processes raise
  ``JpegError`` with a named reason.
- 8-bit sample precision only (the only precision baseline allows).
- 1-component (grayscale) and 3-component (YCbCr) images; 4-component
  CMYK/Adobe raises.

Reference parity note: the reference repo stores media as opaque bytea and
delegates decoding to consumers; this codec backs the Spark-side
``multimodal`` operators (decode_images / image_ahash / resize_images) so
the strict=True path is REAL for the most common stored image format.
The codec boundary is genuinely Python and runs inside mapInPandas Arrow
batches — the correct placement for per-payload imperative work.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(Exception):
    """Malformed or out-of-scope JPEG payload."""


SOI = 0xD8
EOI = 0xD9
SOS = 0xDA
DQT = 0xDB
DRI = 0xDD
DHT = 0xC4
SOF_BASELINE = 0xC0
# SOFn markers for processes this decoder deliberately rejects
_SOF_UNSUPPORTED = {
    0xC1: "extended sequential",
    0xC2: "progressive",
    0xC3: "lossless",
    0xC5: "differential sequential",
    0xC6: "differential progressive",
    0xC7: "differential lossless",
    0xC9: "extended sequential (arithmetic)",
    0xCA: "progressive (arithmetic)",
    0xCB: "lossless (arithmetic)",
    0xCD: "differential sequential (arithmetic)",
    0xCE: "differential progressive (arithmetic)",
    0xCF: "differential lossless (arithmetic)",
}

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# 8x8 DCT-II basis (T.81 A.3.3): C[u,x] = c(u)/2 * cos((2x+1) u pi / 16).
# IDCT of block B is C.T @ B @ C — one einsum over all blocks at once.
_DCT_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
        _DCT_C[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def is_jpeg(data: bytes) -> bool:
    """SOI signature sniff (FF D8 FF)."""
    return len(data) >= 3 and data[:3] == b"\xff\xd8\xff"


# --------------------------------------------------------------------------
# Huffman tables (T.81 C.1/C.2: BITS + HUFFVAL -> canonical codes)
# --------------------------------------------------------------------------


class _HuffTable:
    """Canonical Huffman decode table built from DHT's BITS/HUFFVAL.

    Decoding uses the classic MINCODE/MAXCODE walk (T.81 F.2.2.3): one
    compare per code length, no code-string dict."""

    def __init__(self, bits: list[int], huffval: bytes):
        if sum(bits) != len(huffval):
            raise JpegError("DHT: BITS total != value count")
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            n = bits[ln - 1]
            self.valptr[ln] = k
            self.mincode[ln] = code
            code += n
            self.maxcode[ln] = code - 1 if n else -1
            k += n
            code <<= 1
        self.huffval = huffval

    def decode(self, br: "_BitReader") -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.read_bit()
            mx = self.maxcode[ln]
            if mx >= 0 and code <= mx:
                return self.huffval[
                    self.valptr[ln] + (code - self.mincode[ln])
                ]
        raise JpegError("invalid Huffman code in entropy stream")


class _BitReader:
    """MSB-first bit reader over an already-unstuffed entropy segment."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def read_bit(self) -> int:
        if self.pos >= self.nbits:
            raise JpegError("entropy stream truncated")
        b = self.data[self.pos >> 3]
        bit = (b >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --------------------------------------------------------------------------
# Marker walk
# --------------------------------------------------------------------------


def _u16(data: bytes, off: int) -> int:
    if off + 2 > len(data):
        raise JpegError("truncated marker segment")
    return struct.unpack_from(">H", data, off)[0]


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "blocks", "bw", "bh")

    def __init__(self, cid, h, v, tq):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG into an (h, w, 4) uint8 RGBA array (alpha
    255 — JPEG has no alpha; matches decode_png's output contract)."""
    if not is_jpeg(data):
        raise JpegError("bad signature: not a JPEG (SOI missing)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (height, width, components)

    i = 2
    n = len(data)
    while True:
        if i + 2 > n:
            raise JpegError("ran off end before SOS")
        if data[i] != 0xFF:
            raise JpegError(f"expected marker at offset {i}")
        marker = data[i + 1]
        i += 2
        if marker == 0xFF:  # fill byte
            i -= 1
            continue
        if marker == EOI:
            raise JpegError("EOI before scan data")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RSTn: no length
            continue
        seg_len = _u16(data, i)
        seg = data[i + 2 : i + seg_len]
        if len(seg) != seg_len - 2:
            raise JpegError("truncated segment body")
        if marker == DQT:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[j : j + 64], dtype=np.uint8)
                    j += 64
                elif pq == 1:
                    tbl = np.frombuffer(
                        seg[j : j + 128], dtype=">u2"
                    )
                    j += 128
                else:
                    raise JpegError(f"DQT: bad precision {pq}")
                if tbl.size != 64:
                    raise JpegError("DQT: short table")
                dq = np.zeros(64, dtype=np.int32)
                dq[ZIGZAG] = tbl.astype(np.int32)
                qt[tq] = dq.reshape(8, 8)
        elif marker == DHT:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                vals = seg[j + 17 : j + 17 + nv]
                j += 17 + nv
                tbl = _HuffTable(bits, vals)
                (huff_ac if tc else huff_dc)[th] = tbl
        elif marker == SOF_BASELINE:
            prec = seg[0]
            if prec != 8:
                raise JpegError(f"unsupported sample precision {prec}")
            height = struct.unpack_from(">H", seg, 1)[0]
            width = struct.unpack_from(">H", seg, 3)[0]
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise JpegError(
                    f"unsupported component count {ncomp} "
                    "(grayscale and YCbCr only)"
                )
            comps = []
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append(
                    _Component(cid, hv >> 4, hv & 0x0F, seg[8 + 3 * c])
                )
            if height == 0 or width == 0:
                raise JpegError("zero image dimension (DNL unsupported)")
            frame = (height, width, comps)
        elif marker in _SOF_UNSUPPORTED:
            raise JpegError(
                f"unsupported JPEG process: {_SOF_UNSUPPORTED[marker]} "
                "(baseline sequential only)"
            )
        elif marker == DRI:
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == SOS:
            if frame is None:
                raise JpegError("SOS before SOF0")
            ns = seg[0]
            comps = frame[2]
            by_id = {c.cid: c for c in comps}
            scan_comps = []
            for c in range(ns):
                cs = seg[1 + 2 * c]
                if cs not in by_id:
                    raise JpegError(f"SOS references unknown component {cs}")
                comp = by_id[cs]
                comp.td = seg[2 + 2 * c] >> 4
                comp.ta = seg[2 + 2 * c] & 0x0F
                scan_comps.append(comp)
            if ns != len(comps):
                raise JpegError("non-interleaved multi-scan not supported")
            scan_start = i + seg_len
            return _decode_scan(
                data, scan_start, frame, scan_comps, qt, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn / COM / anything else: skip
        i += seg_len


# --------------------------------------------------------------------------
# Entropy-coded scan
# --------------------------------------------------------------------------


def _split_entropy(data: bytes, start: int) -> list[bytes]:
    """Unstuff the entropy-coded segment from ``start`` to EOI, split at
    restart markers.  FF00 -> literal FF; FF D0-D7 -> segment boundary;
    FF D9 (EOI) or any other marker ends the scan."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or another marker: scan is over
            break
    segs.append(bytes(cur))
    return segs


def _decode_scan(
    data, start, frame, comps, qt, huff_dc, huff_ac, restart_interval
) -> np.ndarray:
    height, width, _ = frame
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise JpegError("bad sampling factors")
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    for c in comps:
        if c.tq not in qt:
            raise JpegError(f"missing quantization table {c.tq}")
        # blocks-per-MCU grid for this component
        c.bw = mcux * c.h
        c.bh = mcuy * c.v
        c.blocks = np.zeros((c.bh * c.bw, 8, 8), dtype=np.int32)

    segs = _split_entropy(data, start)
    n_mcu = mcux * mcuy
    mcus_per_seg = restart_interval if restart_interval else n_mcu
    mcu = 0
    seg_idx = 0
    while mcu < n_mcu:
        if seg_idx >= len(segs):
            raise JpegError("entropy stream ended early (missing restarts)")
        br = _BitReader(segs[seg_idx])
        pred = {id(c): 0 for c in comps}  # DC predictors reset per restart
        for _ in range(min(mcus_per_seg, n_mcu - mcu)):
            my, mx = divmod(mcu, mcux)
            for c in comps:
                if c.td not in huff_dc or c.ta not in huff_ac:
                    raise JpegError("missing Huffman table for scan")
                dq = qt[c.tq]
                for by in range(c.v):
                    for bx in range(c.h):
                        blk = _decode_block(
                            br, huff_dc[c.td], huff_ac[c.ta]
                        )
                        pred[id(c)] += blk[0]
                        blk[0] = pred[id(c)]
                        row = my * c.v + by
                        col = mx * c.h + bx
                        coeff = np.zeros(64, dtype=np.int32)
                        coeff[ZIGZAG] = blk
                        c.blocks[row * c.bw + col] = (
                            coeff.reshape(8, 8) * dq
                        )
            mcu += 1
        seg_idx += 1

    # vectorized IDCT per component, assemble planes, upsample, convert
    planes = []
    for c in comps:
        spatial = (
            np.einsum(
                "ux,nuv,vy->nxy", _DCT_C, c.blocks.astype(np.float64),
                _DCT_C,
            )
            + 128.0
        )
        plane = (
            spatial.reshape(c.bh, c.bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c.bh * 8, c.bw * 8)
        )
        # nearest-neighbor upsample to the full-resolution grid
        plane = np.repeat(
            np.repeat(plane, vmax // c.v, axis=0), hmax // c.h, axis=1
        )
        planes.append(plane[:height, :width])

    out = np.empty((height, width, 4), dtype=np.uint8)
    out[:, :, 3] = 255
    if len(planes) == 1:
        g = np.clip(planes[0], 0, 255).astype(np.uint8)
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = g
    else:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out[:, :, 0] = np.clip(r + 0.5, 0, 255).astype(np.uint8)
        out[:, :, 1] = np.clip(g + 0.5, 0, 255).astype(np.uint8)
        out[:, :, 2] = np.clip(b + 0.5, 0, 255).astype(np.uint8)
    return out


def _decode_block(br, dc_tbl, ac_tbl) -> np.ndarray:
    """One 8x8 block in zig-zag order; blk[0] holds the DC DIFF (caller
    applies the predictor)."""
    blk = np.zeros(64, dtype=np.int32)
    t = dc_tbl.decode(br)
    if t > 11:
        raise JpegError("DC category > 11")
    blk[0] = _extend(br.receive(t), t)
    k = 1
    while k < 64:
        rs = ac_tbl.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegError("AC run past end of block")
        blk[k] = _extend(br.receive(s), s)
        k += 1
    return blk
