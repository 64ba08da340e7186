"""JPEG decoder (baseline + progressive) — from scratch, stdlib + numpy.

Implements the DCT processes of the public ITU-T T.81 (ISO/IEC 10918-1)
specification: marker segment walk, DQT/DHT/SOF/SOS/DRI parsing, Huffman
entropy decode with byte unstuffing and restart markers, dequantization,
zig-zag reorder, 8x8 inverse DCT (vectorized over all blocks per
component), chroma upsampling for any sampling factors declared in the
frame header (4:4:4, 4:2:2, 4:2:0, ...), and JFIF YCbCr -> RGB
conversion.

Supported processes:

- **baseline sequential** (SOF0): single interleaved scan.
- **extended sequential, Huffman** (SOF1): at 8-bit precision a
  strict superset of baseline (more entropy tables permitted) —
  decoded by the baseline scan path.
- **progressive** (SOF2): multi-scan accumulation — DC first +
  refinement scans (successive approximation on coefficient 0), AC
  first scans with EOB-run coding over any spectral band (spectral
  selection), and AC refinement scans (correction bits per T.81
  G.1.2.3), interleaved DC scans and non-interleaved AC scans, with
  restart intervals resetting predictors and EOB runs per scan.
- **arithmetic-coded sequential and progressive** (SOF9 / SOF10 +
  DAC conditioning): the QM-coder entropy layer lives in
  ``jpegarith.py`` (from-scratch T.81 Annex D/F/G, pinned both
  directions against the system libjpeg); everything after the
  coefficients is shared with the Huffman paths.

- **lossless** (SOF3, via ``jpeglossless.py``): the DCT-free
  predictive process DNG raw files use — 7 predictors, Huffman
  difference categories, point transform.

Out of scope (clear errors, no silent wrong pixels): hierarchical
processes, >8-bit sample precision, and component counts other than
1 (grayscale) and 3.

Reference parity note: the reference repo stores media as opaque bytea
and delegates decoding to consumers; this codec backs the Spark-side
``multimodal`` operators (decode_images / image_ahash / resize_images /
frame_sample, plus ``avi.py``'s MJPEG frames) so the strict=True path
is REAL for the most common stored image format.  The codec boundary is
genuinely Python and runs inside mapInPandas Arrow batches — the
correct placement for per-payload imperative work.
"""

from __future__ import annotations

import struct

import numpy as np
from .codecerrors import guard


class JpegError(Exception):
    """Malformed or out-of-scope JPEG payload."""


SOI = 0xD8
EOI = 0xD9
SOS = 0xDA
DQT = 0xDB
DRI = 0xDD
DHT = 0xC4
SOF_BASELINE = 0xC0
SOF_EXTENDED = 0xC1        # extended sequential, Huffman — for 8-bit
#                            precision a strict superset of baseline
#                            (more tables allowed), same scan decode
SOF_PROGRESSIVE = 0xC2
SOF_ARITH_SEQ = 0xC9       # sequential, arithmetic entropy coding
SOF_ARITH_PROG = 0xCA      # progressive, arithmetic entropy coding
DAC = 0xCC                 # arithmetic conditioning (L/U, Kx)
# SOFn markers for processes this decoder deliberately rejects
_SOF_UNSUPPORTED = {
    0xC5: "differential sequential",
    0xC6: "differential progressive",
    0xC7: "differential lossless",
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
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "zz", "bw", "bh",
                 "nbw", "nbh")

    def __init__(self, cid, h, v, tq):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq


class _Frame:
    __slots__ = ("height", "width", "comps", "hmax", "vmax", "mcux",
                 "mcuy", "progressive", "arith")

    def __init__(self, height, width, comps, progressive, arith=False):
        self.height, self.width = height, width
        self.comps = comps
        self.progressive = progressive
        self.arith = arith
        self.hmax = max(c.h for c in comps)
        self.vmax = max(c.v for c in comps)
        if not (1 <= self.hmax <= 4 and 1 <= self.vmax <= 4):
            raise JpegError("bad sampling factors")
        self.mcux = -(-width // (8 * self.hmax))
        self.mcuy = -(-height // (8 * self.vmax))
        for c in comps:
            # MCU-padded coefficient grid (zig-zag order per block)
            c.bw = self.mcux * c.h
            c.bh = self.mcuy * c.v
            c.zz = np.zeros((c.bh * c.bw, 64), dtype=np.int32)
            # non-interleaved scan grid: the component's own pixel dims
            c.nbw = -(-(-(-width * c.h // self.hmax)) // 8)
            c.nbh = -(-(-(-height * c.v // self.vmax)) // 8)


@guard(JpegError)
def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline or progressive JPEG into an (h, w, 4) uint8
    RGBA array (alpha 255 — JPEG has no alpha; matches decode_png's
    output contract)."""
    if not is_jpeg(data):
        raise JpegError("bad signature: not a JPEG (SOI missing)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    dc_cond: dict[int, tuple[int, int]] = {}   # DAC: table -> (L, U)
    ac_cond: dict[int, int] = {}               # DAC: table -> Kx
    restart_interval = 0
    frame: _Frame | None = None
    saw_scan = False

    i = 2
    n = len(data)
    while True:
        if i + 2 > n:
            raise JpegError(
                "ran off end before EOI"
                if saw_scan else "ran off end before SOS"
            )
        if data[i] != 0xFF:
            raise JpegError(f"expected marker at offset {i}")
        marker = data[i + 1]
        i += 2
        if marker == 0xFF:  # fill byte
            i -= 1
            continue
        if marker == EOI:
            if frame is None or not saw_scan:
                raise JpegError("EOI before scan data")
            return _finish(frame, qt)
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
                    tbl = np.frombuffer(seg[j : j + 128], dtype=">u2")
                    j += 128
                else:
                    raise JpegError(f"DQT: bad precision {pq}")
                if tbl.size != 64:
                    raise JpegError("DQT: short table")
                # keep in zig-zag order: coefficients are stored zig-zag
                qt[tq] = tbl.astype(np.int32)
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
        elif marker == 0xC3:
            # lossless (SOF3, the DNG/medical process): its scan
            # structure shares nothing with the DCT paths — delegate
            # the whole decode to the dedicated module
            from .jpeglossless import decode_jpeg_lossless

            return decode_jpeg_lossless(data)
        elif marker in (SOF_BASELINE, SOF_EXTENDED, SOF_PROGRESSIVE,
                        SOF_ARITH_SEQ, SOF_ARITH_PROG):
            if frame is not None:
                raise JpegError("multiple SOF markers")
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
            frame = _Frame(
                height, width, comps,
                marker in (SOF_PROGRESSIVE, SOF_ARITH_PROG),
                marker in (SOF_ARITH_SEQ, SOF_ARITH_PROG),
            )
        elif marker in _SOF_UNSUPPORTED:
            raise JpegError(
                f"unsupported JPEG process: {_SOF_UNSUPPORTED[marker]} "
                "(sequential and progressive, Huffman or arithmetic)"
            )
        elif marker == DAC:
            # T.81 B.2.4.3: (Tc/Tb, value) pairs — DC: L = low nibble,
            # U = high nibble; AC: Kx
            j = 0
            while j + 2 <= len(seg):
                tc, tb = seg[j] >> 4, seg[j] & 0x0F
                v = seg[j + 1]
                j += 2
                if tc == 0:
                    lo, up = v & 0x0F, v >> 4
                    if lo > up or up > 15:
                        raise JpegError("DAC: bad DC conditioning")
                    dc_cond[tb] = (lo, up)
                else:
                    if not 1 <= v <= 63:
                        raise JpegError("DAC: bad AC conditioning")
                    ac_cond[tb] = v
        elif marker == DRI:
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == SOS:
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            by_id = {c.cid: c for c in frame.comps}
            scan_comps = []
            for c in range(ns):
                cs = seg[1 + 2 * c]
                if cs not in by_id:
                    raise JpegError(f"SOS references unknown component {cs}")
                comp = by_id[cs]
                comp.td = seg[2 + 2 * c] >> 4
                comp.ta = seg[2 + 2 * c] & 0x0F
                scan_comps.append(comp)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not frame.progressive:
                if ns != len(frame.comps):
                    raise JpegError(
                        "baseline: non-interleaved multi-scan unsupported"
                    )
                ss, se, ah, al = 0, 63, 0, 0
            saw_scan = True
            if frame.arith:
                from .jpegarith import JpegArithError, decode_scan_arith

                try:
                    i = decode_scan_arith(
                        data, i + seg_len, frame, scan_comps, ss, se,
                        ah, al, dc_cond, ac_cond, restart_interval,
                    )
                except JpegArithError as e:
                    raise JpegError(str(e)) from e
            else:
                i = _decode_scan(
                    data, i + seg_len, frame, scan_comps, ss, se, ah, al,
                    huff_dc, huff_ac, restart_interval,
                )
            continue
        # APPn / COM / anything else: skip
        i += seg_len


# --------------------------------------------------------------------------
# Entropy-coded scans
# --------------------------------------------------------------------------


def _split_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy-coded segment from ``start`` to the next
    non-RST marker, split at restart markers.  FF00 -> literal FF;
    FF D0-D7 -> segment boundary.  Returns (segments, offset of the
    terminating marker's FF byte)."""
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
            i = n
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
    return segs, i


class _ScanState:
    """Per-restart-segment mutable state: DC predictors + EOB run."""

    __slots__ = ("pred", "eobrun")

    def __init__(self, comps):
        self.pred = {id(c): 0 for c in comps}
        self.eobrun = 0


def _decode_scan(
    data, start, frame, comps, ss, se, ah, al, huff_dc, huff_ac,
    restart_interval,
) -> int:
    """Decode one scan into the components' coefficient storage; returns
    the offset of the marker that terminated the scan's entropy data."""
    if ss > se or se > 63:
        raise JpegError(f"bad spectral range {ss}..{se}")
    interleaved = len(comps) > 1
    if ss > 0 and interleaved:
        raise JpegError("progressive AC scans must be non-interleaved")
    segs, end = _split_entropy(data, start)

    if interleaved:
        n_units = frame.mcux * frame.mcuy
    else:
        c = comps[0]
        n_units = c.nbw * c.nbh
    units_per_seg = restart_interval if restart_interval else n_units

    unit = 0
    seg_idx = 0
    while unit < n_units:
        if seg_idx >= len(segs):
            raise JpegError("entropy stream ended early (missing restarts)")
        br = _BitReader(segs[seg_idx])
        st = _ScanState(comps)
        for _ in range(min(units_per_seg, n_units - unit)):
            if interleaved:
                my, mx = divmod(unit, frame.mcux)
                for c in comps:
                    for by in range(c.v):
                        for bx in range(c.h):
                            blk = c.zz[
                                (my * c.v + by) * c.bw + (mx * c.h + bx)
                            ]
                            _decode_block(
                                br, st, c, blk, ss, se, ah, al,
                                huff_dc, huff_ac,
                            )
            else:
                c = comps[0]
                row, col = divmod(unit, c.nbw)
                blk = c.zz[row * c.bw + col]
                _decode_block(
                    br, st, c, blk, ss, se, ah, al, huff_dc, huff_ac
                )
            unit += 1
        seg_idx += 1
    return end


def _decode_block(br, st, c, blk, ss, se, ah, al, huff_dc, huff_ac):
    """Decode one block's contribution for this scan into ``blk`` (a
    64-int32 view in zig-zag order)."""
    if ss == 0:
        if ah == 0:
            if c.td not in huff_dc:
                raise JpegError("missing DC Huffman table for scan")
            t = huff_dc[c.td].decode(br)
            if t > 11:
                raise JpegError("DC category > 11")
            diff = _extend(br.receive(t), t)
            st.pred[id(c)] += diff
            blk[0] = st.pred[id(c)] << al
        else:  # DC refinement: one bit
            if br.read_bit():
                blk[0] |= 1 << al
        if se == 0:
            return
        k = 1
    else:
        k = ss
    if c.ta not in huff_ac:
        raise JpegError("missing AC Huffman table for scan")
    ac = huff_ac[c.ta]
    if ah == 0:
        _ac_first(br, st, ac, blk, k, se, al)
    else:
        _ac_refine(br, st, ac, blk, k, se, al)


def _ac_first(br, st, ac, blk, k, se, al):
    """AC coefficients' first pass (T.81 G.1.2.2): run-length + EOB-run
    coding; also the baseline AC path (al == 0, eobrun unused there but
    harmless — baseline encoders never emit EOBn > EOB0)."""
    if st.eobrun > 0:
        st.eobrun -= 1
        return
    while k <= se:
        rs = ac.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            st.eobrun = (1 << r) - 1
            if r:
                st.eobrun += br.receive(r)
            break  # EOBn: this block is done
        k += r
        if k > se:
            raise JpegError("AC run past spectral band")
        blk[k] = _extend(br.receive(s), s) << al
        k += 1


def _ac_refine(br, st, ac, blk, k, se, al):
    """AC refinement pass (T.81 G.1.2.3): newly-significant coefficients
    arrive as ±1<<al; history coefficients receive correction bits."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(pos):
        if br.read_bit() and (blk[pos] & p1) == 0:
            blk[pos] += p1 if blk[pos] >= 0 else m1

    if st.eobrun == 0:
        while k <= se:
            rs = ac.decode(br)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    st.eobrun = 1 << r
                    if r:
                        st.eobrun += br.receive(r)
                    break  # drop to the EOB sweep below
                # r == 15: run of 16 zero-history coefficients
            else:
                if s != 1:
                    raise JpegError("AC refinement amplitude must be 1")
                val = p1 if br.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        if val:
                            blk[k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
            # outer while continues at the next unprocessed position
    if st.eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                correct(k)
            k += 1
        st.eobrun -= 1


# --------------------------------------------------------------------------
# Reconstruction
# --------------------------------------------------------------------------


def _finish(frame: _Frame, qt) -> np.ndarray:
    height, width = frame.height, frame.width
    planes = []
    for c in frame.comps:
        if c.tq not in qt:
            raise JpegError(f"missing quantization table {c.tq}")
        deq = (c.zz * qt[c.tq][None, :]).astype(np.float64)
        blocks = np.zeros((c.zz.shape[0], 64))
        blocks[:, ZIGZAG] = deq  # zig-zag -> raster within each block
        blocks = blocks.reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _DCT_C, blocks, _DCT_C) + 128.0
        plane = (
            spatial.reshape(c.bh, c.bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c.bh * 8, c.bw * 8)
        )
        plane = np.repeat(
            np.repeat(plane, frame.vmax // c.v, axis=0),
            frame.hmax // c.h,
            axis=1,
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
