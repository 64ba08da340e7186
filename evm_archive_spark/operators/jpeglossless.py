"""Lossless JPEG (ITU-T T.81 process 14, SOF3) — from scratch.

The lossless DCT-free JPEG process is what DNG raw files and medical
imagery actually use: per-sample prediction from the left/above/
above-left neighbors (7 selectable predictors), Huffman-coded
difference categories (the DC table format), modulo-2^16 arithmetic,
and an optional point transform.  ``decode_jpeg`` routes SOF3 frames
here; the Huffman plumbing (table build, bit reader, EXTEND,
restart-marker segment split) is shared with jpeg.py.

Scope: 2-16 bit precision headers parse, 8-bit samples decode (the
corpus case); single-component and interleaved multi-component scans
with h=v=1 sampling (what lossless writers emit — T.81 H.2 notes
subsampling is pointless without a transform); restart intervals
reset prediction to start-of-scan conditions per H.2.3.  Output
follows decode_jpeg's contract: (h, w, 4) RGBA, grayscale replicated,
3-component data taken as RGB (lossless JPEG carries no color
transform).

No system pin exists (libjpeg-turbo 2.1 predates lossless support,
restored upstream only in 3.0), so like BCJ2 the check is an
independent from-scratch ENCODER (``build_jpeg_lossless``) plus
spec-structure tests — predictors, first-row/first-column rules, the
SSSS=16 escape, and the point transform are all exercised by
round-trip equality, which lossless coding makes exact.

Reference parity note: the reference (SummaryDev/evm-archive) stores
media as opaque bytea; this closes the "lossless JPEG" typed boundary
in the multimodal strict decode path.  Placement: per-payload work
inside mapInPandas Arrow batches (the codec boundary).
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import (
    JpegError,
    _BitReader,
    _extend,
    _HuffTable,
    _split_entropy,
    _u16,
)

SOF_LOSSLESS = 0xC3


def _predict(ra: int, rb: int, rc: int, sel: int) -> int:
    """T.81 Table H.1 predictors (sel 1-7)."""
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    if sel == 7:
        return (ra + rb) >> 1
    raise JpegError(f"bad lossless predictor {sel}")


#: allocation bound for self-declared SOF3 dimensions (the webp
#: pixel-count rule: a ~100-byte crafted chunk must not force a
#: multi-GiB buffer before any entropy data is read)
MAX_LOSSLESS_SAMPLES = 1 << 24


def decode_jpeg_lossless(data: bytes) -> np.ndarray:
    """Decode an 8-bit SOF3 lossless JPEG to (h, w, 4) RGBA uint8 (the
    image-lane contract); >8-bit streams are rejected AT THE SOF
    marker (no wasted full decode)."""
    planes, prec, comps = _guarded_decode(data, max_prec=8)
    return _assemble_rgba(planes, comps)


def decode_jpeg_lossless_raw(data: bytes) -> tuple[np.ndarray, int]:
    """Decode an SOF3 stream at ANY precision 2-16 to its raw sample
    planes: ``((h, w, ncomp) uint16 array, precision)`` — what a DNG
    raw tile actually carries (10/12/14/16-bit CFA mosaics)."""
    planes, prec, comps = _guarded_decode(data, max_prec=16)
    stack = np.stack([planes[c] for c in comps], axis=2)
    return stack.astype(np.uint16), prec


def _guarded_decode(data: bytes, max_prec: int):
    """Normalize short-segment struct/index crashes to JpegError —
    the typed contract every caller (jpeg.py route, dng.py) relies
    on."""
    try:
        return _decode_lossless(data, max_prec)
    except (struct.error, IndexError) as e:
        raise JpegError(f"lossless: truncated structure: {e!r}") from e


def _decode_lossless(data: bytes, max_prec: int = 16):
    huff: dict[int, _HuffTable] = {}
    frame = None          # (precision, height, width, comps)
    restart_interval = 0
    out_planes: dict[int, np.ndarray] = {}

    i = 2
    n = len(data)
    while True:
        if i + 2 > n:
            raise JpegError("lossless: ran off end before EOI")
        if data[i] != 0xFF:
            raise JpegError(f"lossless: expected marker at offset {i}")
        marker = data[i + 1]
        i += 2
        if marker == 0xFF:
            i -= 1
            continue
        if marker == 0xD9:                       # EOI
            if frame is None or not out_planes:
                raise JpegError("lossless: EOI before scan data")
            prec, _h, _w, comps = frame
            missing = [c for c in comps if c not in out_planes]
            if missing:
                raise JpegError("lossless: scan missing components")
            return out_planes, prec, comps
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seg_len = _u16(data, i)
        seg = data[i + 2:i + seg_len]
        if len(seg) != seg_len - 2:
            raise JpegError("lossless: truncated segment body")
        if marker == 0xC4:                       # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1:j + 17])
                nv = sum(bits)
                vals = seg[j + 17:j + 17 + nv]
                j += 17 + nv
                if tc == 0:
                    huff[th] = _HuffTable(bits, vals)
        elif marker == SOF_LOSSLESS:
            if frame is not None:
                raise JpegError("lossless: multiple SOF markers")
            prec = seg[0]
            if not 2 <= prec <= 16:
                raise JpegError(f"lossless: bad precision {prec}")
            if prec > max_prec:
                raise JpegError(
                    f"lossless: {prec}-bit samples out of scope here "
                    f"(max {max_prec}; the raw path takes 2-16)")
            height = struct.unpack_from(">H", seg, 1)[0]
            width = struct.unpack_from(">H", seg, 3)[0]
            ncomp = seg[5]
            if height == 0 or width == 0:
                raise JpegError("lossless: zero dimension")
            if height * width * max(ncomp, 1) > MAX_LOSSLESS_SAMPLES:
                raise JpegError(
                    "lossless: declared dimensions exceed the sample "
                    "cap (decompression-bomb guard)")
            comps = []
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                if hv != 0x11:
                    raise JpegError(
                        "lossless: subsampled components out of scope")
                comps.append(cid)
            frame = (prec, height, width, comps)
        elif marker == 0xDD:                     # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:                     # SOS
            if frame is None:
                raise JpegError("lossless: SOS before SOF")
            prec, height, width, comps = frame
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs = seg[1 + 2 * c]
                if cs not in comps:
                    raise JpegError("lossless: unknown scan component")
                scan.append((cs, seg[2 + 2 * c] >> 4))
            sel = seg[1 + 2 * ns]                # Ss = predictor
            pt = seg[3 + 2 * ns] & 0x0F          # Al = point transform
            if not 1 <= sel <= 7:
                raise JpegError(f"bad lossless predictor {sel}")
            if pt >= prec:
                raise JpegError("lossless: point transform >= precision")
            i = _decode_scan(
                data, i + seg_len, height, width, prec, scan, sel, pt,
                huff, restart_interval, out_planes)
            continue
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            raise JpegError("lossless: mixed-process file")
        i += seg_len


def _decode_scan(data, start, height, width, prec, scan, sel, pt, huff,
                 restart_interval, out_planes) -> int:
    """One lossless scan; an MCU is one sample per scan component
    (h=v=1), row-major.  Restart intervals follow T.81 H.1.1/H.2.3:
    the bitstream byte-aligns and restarts at every RSTn, the first
    sample of each interval is predicted with the default
    2^(P-Pt-1), and the REST OF THAT LINE (to the next row boundary)
    uses the 1-D Ra predictor — H.1.1's "first line of samples at the
    start of the scan and at the beginning of each restart interval"
    rule, which libjpeg's and ffmpeg's lossless decoders share.
    Later lines inside the interval resume normal prediction.  Only
    ROW-ALIGNED intervals (Ri a multiple of the samples-per-line MCU
    count — what real DNG writers emit) are in scope: for mid-line
    restarts the readings genuinely diverge (ffmpeg left-predicts the
    part of the NEXT row before the resync column too, refusing
    neighbors decoded before the resync point; libjpeg does not), so
    those stay typed."""
    segs, end = _split_entropy(data, start)
    ri = restart_interval
    n_mcu = height * width
    if ri:
        if ri % width != 0:
            raise JpegError(
                "lossless: mid-line restart intervals out of scope "
                "(H.2.3 reset semantics are implementation-divergent "
                "off row boundaries)")
        need = (n_mcu + ri - 1) // ri
        if len(segs) < need:
            raise JpegError(
                f"lossless: {len(segs)} entropy segments for "
                f"{need} restart intervals")
    br = _BitReader(segs[0])
    half = 1 << (prec - pt - 1)
    planes = {cs: np.zeros((height, width), dtype=np.int32)
              for cs, _ in scan}
    tables = []
    for cs, td in scan:
        if td not in huff:
            raise JpegError("lossless: missing Huffman table")
        tables.append((planes[cs], huff[td]))
    ry = rx = 0                                  # current interval origin
    for y in range(height):
        for x in range(width):
            if ri:
                mcu = y * width + x
                if mcu and mcu % ri == 0:
                    br = _BitReader(segs[mcu // ri])
                    ry, rx = y, x
            for p, tbl in tables:
                t = tbl.decode(br)
                if t > 16:
                    raise JpegError("lossless: SSSS category > 16")
                if t == 16:
                    diff = 32768                 # the escape category
                else:
                    diff = _extend(br.receive(t), t)
                # H.1.1 prediction relative to the interval origin:
                # default at the origin; Ra along the origin's line;
                # Rb down the first column; else selected
                if y == ry and x == rx:
                    pred = half
                elif y == ry:
                    pred = int(p[y, x - 1])
                elif x == 0:
                    pred = int(p[y - 1, 0])
                else:
                    pred = _predict(int(p[y, x - 1]), int(p[y - 1, x]),
                                    int(p[y - 1, x - 1]), sel)
                p[y, x] = (pred + diff) & 0xFFFF
    mask = (1 << prec) - 1
    for cs, _ in scan:
        out_planes[cs] = ((planes[cs] & mask) << pt).astype(np.uint16)
    return end


def _assemble_rgba(out_planes, comps) -> np.ndarray:
    planes = [out_planes[c] for c in comps]
    height, width = planes[0].shape
    out = np.empty((height, width, 4), dtype=np.uint8)
    out[:, :, 3] = 255
    if len(planes) == 1:
        g = np.clip(planes[0], 0, 255).astype(np.uint8)
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = g
    elif len(planes) == 3:
        for k in range(3):
            out[:, :, k] = np.clip(planes[k], 0, 255).astype(np.uint8)
    else:
        raise JpegError(
            f"lossless: {len(planes)}-component output out of scope")
    return out


# -- synthesis writer ----------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, val: int, nbits: int) -> None:
        for k in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> k) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)        # byte stuffing
                self.acc, self.nacc = 0, 0

    def pad(self) -> None:
        while self.nacc:
            self.put(1, 1)


def build_jpeg_lossless(img: np.ndarray, predictor: int = 1,
                        point_transform: int = 0,
                        precision: int = 8,
                        restart_interval: int = 0) -> bytes:
    """Independent SOF3 writer: (h, w) gray or (h, w, 3) color samples
    at any ``precision`` 2-16 (uint8/uint16 input; a 12/14/16-bit
    grayscale frame is exactly what a DNG raw tile carries), any
    predictor 1-7, optional point transform (low bits dropped —
    samples are coded at ``v >> Pt``).  One DC-format Huffman table
    with equal-length canonical codes over the categories present.
    ``restart_interval`` (MCUs; must be row-aligned, i.e. a multiple
    of the width) emits a DRI segment plus cycling RSTn markers and
    resets prediction per T.81 H.1.1 — what real DNG writers emit."""
    if img.ndim == 2:
        planes = [img.astype(np.int32)]
    elif img.ndim == 3 and 2 <= img.shape[2] <= 4:
        # 2-component frames are how real DNG writers interleave a
        # CFA mosaic's columns into SOF3 (half width, two samples
        # per unit)
        planes = [img[:, :, k].astype(np.int32)
                  for k in range(img.shape[2])]
    else:
        raise JpegError("image must be (h,w) gray or (h,w,2..4) color")
    h, w = planes[0].shape
    prec, pt = precision, point_transform
    if not 2 <= prec <= 16:
        raise JpegError("bad precision")
    if not 0 <= pt < prec:
        raise JpegError("bad point transform")
    if any(int(p.max(initial=0)) >= (1 << prec) for p in planes):
        raise JpegError(f"sample exceeds {prec}-bit precision")
    planes = [p >> pt for p in planes]
    half = 1 << (prec - pt - 1)
    ri = restart_interval
    if ri and ri % w != 0:
        raise JpegError(
            "restart interval must be row-aligned (a multiple of the "
            "width) — mid-line resets are decoder-divergent")
    rpi = ri // w if ri else 0                   # rows per interval

    # pass 1: per-sample diffs (mod 2^16), category stats.  Prediction
    # resets at each interval origin row per T.81 H.1.1: default for
    # its first sample, Ra along its line.
    def diffs(p):
        out = np.zeros((h, w), dtype=np.int64)
        for y in range(h):
            first_line = y == 0 or (rpi and y % rpi == 0)
            for x in range(w):
                if first_line and x == 0:
                    pred = half
                elif first_line:
                    pred = p[y, x - 1]
                elif x == 0:
                    pred = p[y - 1, 0]
                else:
                    pred = _predict(int(p[y, x - 1]), int(p[y - 1, x]),
                                    int(p[y - 1, x - 1]), predictor)
                out[y, x] = int(p[y, x]) - int(pred)
        return out

    dplanes = [diffs(p) for p in planes]

    def category(d: int) -> int:
        d &= 0xFFFF
        if d == 32768:
            return 16
        if d >= 32768:
            d -= 65536                           # negative mod value
        return int(abs(d)).bit_length()

    cats = sorted({category(int(d))
                   for dp in dplanes for d in dp.flatten()})
    ln = 1
    while (1 << ln) - 1 < len(cats):
        ln += 1
    bits = [0] * 16
    bits[ln - 1] = len(cats)
    code = {c: (k, ln) for k, c in enumerate(cats)}

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + len(cats))
    out += bytes([0x00]) + bytes(bits) + bytes(cats)
    ncomp = len(planes)
    out += b"\xff\xc3" + struct.pack(">HBHHB", 8 + 3 * ncomp, prec,
                                     h, w, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x11, 0])
    if ri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, ri)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00])
    out += bytes([predictor, 0, pt])             # Ss / Se / AhAl

    bw = _BitWriter()
    rst = 0
    for y in range(h):
        for x in range(w):
            if ri:
                mcu = y * w + x
                if mcu and mcu % ri == 0:
                    bw.pad()                     # 1-bits to the byte edge
                    bw.out += bytes([0xFF, 0xD0 + rst])  # unstuffed
                    rst = (rst + 1) & 7
            for dp in dplanes:
                d = int(dp[y, x]) & 0xFFFF
                t = category(d)
                v, ln2 = code[t]
                bw.put(v, ln2)
                if t == 16:
                    continue                     # no extra bits
                if d >= 32768:
                    d -= 65536
                if t:
                    amp = d if d >= 0 else d + (1 << t) - 1
                    bw.put(amp, t)
    bw.pad()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
