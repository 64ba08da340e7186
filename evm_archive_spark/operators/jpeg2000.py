"""JPEG 2000 Part 1 (ISO/IEC 15444-1 / ITU-T T.800) — the PDF
``/JPXDecode`` and DICOM ``..4.90`` lane (VERDICT r12 what's-missing
#2/#3, unblocked by the r13 MQ coder in jbig2.py: T.800's arithmetic
coder IS the T.88 Annex E MQ coder, shared here).

Scope — the LOSSLESS Part-1 subset a scanned-document / medical corpus
hits first:

- reversible 5/3 integer DWT (Annex F lifting, whole-sample symmetric
  extension, any number of decomposition levels, odd sizes);
- EBCOT Tier-1 codeblock coding (Annex D): significance-propagation /
  magnitude-refinement / cleanup passes, zero-coding + sign-coding +
  magnitude-refinement contexts, run-length mode, single codeword
  segment (default coder options, no bypass/termall/reset);
- Tier-2 packet headers (Annex B.10): inclusion + zero-bitplane tag
  trees, pass-count and Lblock length coding, bit stuffing;
- codestream framing: SOC/SIZ/COD/QCD/SOT/SOD/EOC, single tile,
  single quality layer, LRCP, no precinct subdivision (defaults),
  1-16 bit unsigned samples, 1 or 3 components, optional reversible
  color transform (RCT);
- minimal JP2 container unwrap (signature/ftyp/jp2h/jp2c boxes).

Out of scope, typed: the irreversible 9/7 path + scalar quantization,
multiple tiles, lossy-TRUNCATED codeblocks (missing passes), precinct
subdivision, bypass/ERTERM coder options, ROI, and Part-2 extensions.

Pin strategy (the jbig2.py/jpegls.py pattern — no system JPEG 2000
codec exists in this container): the encoder is an independent
from-scratch implementation used for fixtures; evidence is round-trip
fuzz over sizes/depths/levels/components, structural properties (DWT
perfect reconstruction is tested standalone against a direct lifting
recompute; tag trees against a reference python recompute), golden
freezes, and truncation fuzz with typed errors.  The context-formation
tables (T.800 Tables D.1-D.3) are transliterated from the spec's
published rules; with no independent J2K stream source in-env their
interop exactness is documented rather than machine-pinned (a
bijective context relabeling is transparent to a matched pair — see
jbig2.py's note).

Reference parity: the reference stores media as opaque hex/bytea and
decodes nothing (multimodal extension surface, SURVEY §2 extensions).
"""

from __future__ import annotations

import struct

import numpy as np

from .codecerrors import guard
from .jbig2 import MqDecoder, MqEncoder


class Jpeg2000Error(ValueError):
    """Typed JPEG 2000 failure (corrupt/unsupported-but-named streams
    raise NotImplementedError where the variant is a known gap)."""


MAX_PIXELS = 1 << 24


# --------------------------------------------------------------------------
# reversible 5/3 DWT (Annex F): 1-D lifting with symmetric extension
# --------------------------------------------------------------------------

def _clip_take(a: np.ndarray, idx: np.ndarray, axis: int) -> np.ndarray:
    return np.take(a, np.clip(idx, 0, a.shape[axis] - 1), axis=axis)


def _fwd53_1d(a: np.ndarray, axis: int):
    """One 5/3 level along ``axis``: (low, high).  Even input indices
    feed the low band (origin-0 Part-1 convention).  Boundary handling
    is edge-clamp on the subband arrays — the exact consequence of
    whole-sample symmetric extension of the interleaved signal (e.g.
    h[-1] = x[1] - ((x[2]+x[0])>>1) = h[0]), the openjpeg convention.
    """
    x = np.asarray(a, dtype=np.int64)
    n = x.shape[axis]
    nh = n // 2
    nl = n - nh
    even = np.take(x, np.arange(0, n, 2), axis=axis)
    odd = np.take(x, np.arange(1, n, 2), axis=axis)
    if nh == 0:
        return even, odd
    # h[i] = x[2i+1] - floor((x[2i] + x[2i+2]) / 2)
    h = odd - ((np.take(even, np.arange(nh), axis=axis)
                + _clip_take(even, np.arange(1, nh + 1), axis)) >> 1)
    # lo[i] = x[2i] + floor((h[i-1] + h[i] + 2) / 4)
    lo = even + ((_clip_take(h, np.arange(-1, nl - 1), axis)
                  + _clip_take(h, np.arange(nl), axis) + 2) >> 2)
    return lo, h


def _inv53_1d(lo: np.ndarray, hi: np.ndarray, axis: int) -> np.ndarray:
    lo = np.asarray(lo, dtype=np.int64)
    hi = np.asarray(hi, dtype=np.int64)
    nl = lo.shape[axis]
    nh = hi.shape[axis]
    n = nl + nh
    if nh == 0:
        return lo.copy()
    even = lo - ((_clip_take(hi, np.arange(-1, nl - 1), axis)
                  + _clip_take(hi, np.arange(nl), axis) + 2) >> 2)
    odd = hi + ((np.take(even, np.arange(nh), axis=axis)
                 + _clip_take(even, np.arange(1, nh + 1), axis)) >> 1)
    out_shape = list(lo.shape)
    out_shape[axis] = n
    out = np.empty(out_shape, dtype=np.int64)
    sl_e = [slice(None)] * out.ndim
    sl_o = [slice(None)] * out.ndim
    sl_e[axis] = slice(0, n, 2)
    sl_o[axis] = slice(1, n, 2)
    out[tuple(sl_e)] = even
    out[tuple(sl_o)] = odd
    return out


def dwt53_forward(img: np.ndarray, levels: int):
    """Multi-level 2-D reversible 5/3 DWT.  Returns the list of level
    band dicts [{'HL','LH','HH'}...] from level 1 (finest) to
    ``levels`` plus the final 'LL' array."""
    ll = np.asarray(img, dtype=np.int64)
    bands = []
    for _ in range(levels):
        lo_r, hi_r = _fwd53_1d(ll, axis=1)       # columns (horizontal)
        llv, lhv = _fwd53_1d(lo_r, axis=0)       # rows (vertical)
        hlv, hhv = _fwd53_1d(hi_r, axis=0)
        bands.append({"HL": hlv, "LH": lhv, "HH": hhv})
        ll = llv
    return bands, ll


def dwt53_inverse(bands: list, ll: np.ndarray) -> np.ndarray:
    for lvl in reversed(bands):
        lo_r = _inv53_1d(ll, lvl["LH"], axis=0)
        hi_r = _inv53_1d(lvl["HL"], lvl["HH"], axis=0)
        ll = _inv53_1d(lo_r, hi_r, axis=1)
    return ll


# --------------------------------------------------------------------------
# EBCOT Tier-1 (Annex D): context formation
# --------------------------------------------------------------------------

N_CTX = 19          # 0-8 ZC, 9-13 SC, 14-16 MR, 17 RL, 18 UNIFORM
_CTX_RL = 17
_CTX_UNI = 18


def _fresh_stats() -> list:
    """Initial context states (Table D.7): all (state 0, MPS 0) except
    ZC context 0 -> state 4, RL -> state 3, UNIFORM -> state 46."""
    st = [0] * N_CTX
    st[0] = 4 << 1
    st[_CTX_RL] = 3 << 1
    st[_CTX_UNI] = 46 << 1
    return st


def _zc_ctx(band: str, h: int, v: int, d: int) -> int:
    """Zero-coding context (Table D.1).  h/v/d = significant counts of
    horizontal / vertical / diagonal neighbors."""
    if band == "HL":           # HL: the table with H and V swapped
        h, v = v, h
    if band != "HH":           # LL, LH (and swapped HL)
        if h == 2:
            return 8
        if h == 1:
            return 7 if v >= 1 else (6 if d >= 1 else 5)
        if v == 2:
            return 4
        if v == 1:
            return 3
        return 2 if d >= 2 else d
    # HH
    if d >= 3:
        return 8
    hv = h + v
    if d == 2:
        return 7 if hv >= 1 else 6
    if d == 1:
        return 5 if hv >= 2 else (4 if hv == 1 else 3)
    return 2 if hv >= 2 else hv


# (chi_h, chi_v) -> (context, xorbit)  — Table D.3
_SC_TAB = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


class _T1State:
    """Per-codeblock Tier-1 working state.  Arrays are padded by one on
    every side so neighborhood reads need no bounds checks; the pad is
    permanently insignificant (codeblocks are coded independently)."""

    def __init__(self, w: int, h: int, band: str):
        self.w, self.h, self.band = w, h, band
        self.sig = np.zeros((h + 2, w + 2), dtype=np.uint8)
        self.sgn = np.zeros((h + 2, w + 2), dtype=np.int8)  # +1/-1
        self.mag = np.zeros((h + 2, w + 2), dtype=np.int64)
        self.refined = np.zeros((h + 2, w + 2), dtype=np.uint8)
        self.visited = np.zeros((h + 2, w + 2), dtype=np.uint8)
        self.new_sig = np.zeros((h + 2, w + 2), dtype=np.uint8)

    def counts(self, y: int, x: int):
        s = self.sig
        hc = int(s[y, x - 1]) + int(s[y, x + 1])
        vc = int(s[y - 1, x]) + int(s[y + 1, x])
        dc = (int(s[y - 1, x - 1]) + int(s[y - 1, x + 1])
              + int(s[y + 1, x - 1]) + int(s[y + 1, x + 1]))
        return hc, vc, dc

    def zc(self, y: int, x: int) -> int:
        return _zc_ctx(self.band, *self.counts(y, x))

    def sc(self, y: int, x: int):
        s, g = self.sig, self.sgn
        ch = min(1, max(-1, int(s[y, x - 1]) * int(g[y, x - 1])
                        + int(s[y, x + 1]) * int(g[y, x + 1])))
        cv = min(1, max(-1, int(s[y - 1, x]) * int(g[y - 1, x])
                        + int(s[y + 1, x]) * int(g[y + 1, x])))
        return _SC_TAB[(ch, cv)]

    def scan(self):
        for y0 in range(1, self.h + 1, 4):
            for x in range(1, self.w + 1):
                for y in range(y0, min(y0 + 4, self.h + 1)):
                    yield y, x


def _t1_decode(mq: MqDecoder, stats: list, w: int, h: int, band: str,
               msb: int, n_passes: int | None = None) -> np.ndarray:
    """Decode one codeblock's coefficients (signed ints) from a single
    MQ codeword segment.  ``n_passes=None`` decodes the full
    3*msb-2 passes (lossless); a smaller count stops after that many
    passes (r13: lossy-truncated streams), leaving the remaining
    bitplanes zero."""
    t = _T1State(w, h, band)
    total = 3 * msb - 2 if n_passes is None else n_passes
    done = 0
    for p in range(msb - 1, -1, -1):
        if done >= total:
            break
        bitval = 1 << p
        if p != msb - 1:
            # significance propagation pass
            for y, x in t.scan():
                if t.sig[y, x]:
                    continue
                cx = t.zc(y, x)
                if cx == 0:
                    continue
                t.visited[y, x] = 1
                if mq.decode(stats, cx):
                    ctx, xor = t.sc(y, x)
                    sb = mq.decode(stats, ctx) ^ xor
                    t.sig[y, x] = 1
                    t.new_sig[y, x] = 1
                    t.sgn[y, x] = -1 if sb else 1
                    t.mag[y, x] = bitval
            done += 1
            if done >= total:
                break
            # magnitude refinement pass
            for y, x in t.scan():
                if not t.sig[y, x] or t.new_sig[y, x]:
                    continue
                if t.refined[y, x]:
                    ctx = 16
                else:
                    hc, vc, dc = t.counts(y, x)
                    ctx = 15 if hc + vc + dc else 14
                if mq.decode(stats, ctx):
                    t.mag[y, x] |= bitval
                t.refined[y, x] = 1
            done += 1
            if done >= total:
                break
        # cleanup pass
        for y0 in range(1, h + 1, 4):
            for x in range(1, w + 1):
                y = y0
                ylim = min(y0 + 4, h + 1)
                if (ylim - y0 == 4
                        and not any(t.visited[yy, x] or t.sig[yy, x]
                                    for yy in range(y0, ylim))
                        and all(t.zc(yy, x) == 0
                                for yy in range(y0, ylim))):
                    if not mq.decode(stats, _CTX_RL):
                        continue
                    r = (mq.decode(stats, _CTX_UNI) << 1) \
                        | mq.decode(stats, _CTX_UNI)
                    y = y0 + r
                    ctx, xor = t.sc(y, x)
                    sb = mq.decode(stats, ctx) ^ xor
                    t.sig[y, x] = 1
                    t.new_sig[y, x] = 1
                    t.sgn[y, x] = -1 if sb else 1
                    t.mag[y, x] = bitval
                    y += 1
                for yy in range(y, ylim):
                    if t.sig[yy, x] or t.visited[yy, x]:
                        continue
                    if mq.decode(stats, t.zc(yy, x)):
                        ctx, xor = t.sc(yy, x)
                        sb = mq.decode(stats, ctx) ^ xor
                        t.sig[yy, x] = 1
                        t.new_sig[yy, x] = 1
                        t.sgn[yy, x] = -1 if sb else 1
                        t.mag[yy, x] = bitval
        done += 1
        t.visited[:] = 0
        t.new_sig[:] = 0
    out = t.mag[1:h + 1, 1:w + 1] * t.sgn[1:h + 1, 1:w + 1]
    return out


def _t1_encode(mq: MqEncoder, stats: list, coeffs: np.ndarray,
               band: str, msb: int,
               n_passes: int | None = None) -> None:
    """Encode one codeblock (mirror of ``_t1_decode``);
    ``n_passes`` stops after that many passes (r13: rate-control
    truncation — the flushed codeword decodes exactly those
    passes)."""
    h, w = coeffs.shape
    total = 3 * msb - 2 if n_passes is None else n_passes
    done = 0
    t = _T1State(w, h, band)
    mag_in = np.zeros((h + 2, w + 2), dtype=np.int64)
    sgn_in = np.zeros((h + 2, w + 2), dtype=np.int8)
    mag_in[1:h + 1, 1:w + 1] = np.abs(coeffs)
    sgn_in[1:h + 1, 1:w + 1] = np.where(coeffs < 0, -1, 1)
    for p in range(msb - 1, -1, -1):
        if done >= total:
            break
        bitval = 1 << p

        def code_sig(y, x):
            bit = 1 if mag_in[y, x] & bitval else 0
            mq.encode(stats, t.zc(y, x), bit)
            if bit:
                ctx, xor = t.sc(y, x)
                sb = 0 if sgn_in[y, x] > 0 else 1
                mq.encode(stats, ctx, sb ^ xor)
                t.sig[y, x] = 1
                t.new_sig[y, x] = 1
                t.sgn[y, x] = sgn_in[y, x]
            return bit

        if p != msb - 1:
            for y, x in t.scan():
                if t.sig[y, x]:
                    continue
                if t.zc(y, x) == 0:
                    continue
                t.visited[y, x] = 1
                code_sig(y, x)
            done += 1
            if done >= total:
                break
            for y, x in t.scan():
                if not t.sig[y, x] or t.new_sig[y, x]:
                    continue
                if t.refined[y, x]:
                    ctx = 16
                else:
                    hc, vc, dc = t.counts(y, x)
                    ctx = 15 if hc + vc + dc else 14
                mq.encode(stats, ctx,
                          1 if mag_in[y, x] & bitval else 0)
                t.refined[y, x] = 1
            done += 1
            if done >= total:
                break
        for y0 in range(1, h + 1, 4):
            for x in range(1, w + 1):
                y = y0
                ylim = min(y0 + 4, h + 1)
                if (ylim - y0 == 4
                        and not any(t.visited[yy, x] or t.sig[yy, x]
                                    for yy in range(y0, ylim))
                        and all(t.zc(yy, x) == 0
                                for yy in range(y0, ylim))):
                    firsts = [yy for yy in range(y0, ylim)
                              if mag_in[yy, x] & bitval]
                    if not firsts:
                        mq.encode(stats, _CTX_RL, 0)
                        continue
                    mq.encode(stats, _CTX_RL, 1)
                    r = firsts[0] - y0
                    mq.encode(stats, _CTX_UNI, (r >> 1) & 1)
                    mq.encode(stats, _CTX_UNI, r & 1)
                    y = firsts[0]
                    ctx, xor = t.sc(y, x)
                    sb = 0 if sgn_in[y, x] > 0 else 1
                    mq.encode(stats, ctx, sb ^ xor)
                    t.sig[y, x] = 1
                    t.new_sig[y, x] = 1
                    t.sgn[y, x] = sgn_in[y, x]
                    y += 1
                for yy in range(y, ylim):
                    if t.sig[yy, x] or t.visited[yy, x]:
                        continue
                    code_sig(yy, x)
        t.visited[:] = 0
        t.new_sig[:] = 0


# --------------------------------------------------------------------------
# Tier-2 (Annex B): tag trees, packet-header bit I/O, packets
# --------------------------------------------------------------------------

class _TagTree:
    """Tag tree over a w x h leaf grid (B.10.2).  Shared by encoder
    (set leaf values first) and decoder (values discovered)."""

    def __init__(self, w: int, h: int):
        self.dims = []
        while True:
            self.dims.append((w, h))
            if w == 1 and h == 1:
                break
            w, h = (w + 1) // 2, (h + 1) // 2
        self.value = [np.full((hh, ww), 1 << 30, dtype=np.int64)
                      for ww, hh in self.dims]
        self.low = [np.zeros((hh, ww), dtype=np.int64)
                    for ww, hh in self.dims]
        self.known = [np.zeros((hh, ww), dtype=np.uint8)
                      for ww, hh in self.dims]

    def set_value(self, x: int, y: int, v: int) -> None:
        for lvl in range(len(self.dims)):
            if v < self.value[lvl][y, x]:
                self.value[lvl][y, x] = v
            x, y = x >> 1, y >> 1

    def _path(self, x: int, y: int):
        p = []
        for lvl in range(len(self.dims)):
            p.append((lvl, x >> lvl, y >> lvl))
        return reversed(p)  # root first

    def encode(self, bio, x: int, y: int, threshold: int) -> None:
        low = 0
        for lvl, xx, yy in self._path(x, y):
            if low > self.low[lvl][yy, xx]:
                self.low[lvl][yy, xx] = low
            else:
                low = int(self.low[lvl][yy, xx])
            while low < threshold:
                if low >= self.value[lvl][yy, xx]:
                    if not self.known[lvl][yy, xx]:
                        bio.write(1)
                        self.known[lvl][yy, xx] = 1
                    break
                bio.write(0)
                low += 1
            self.low[lvl][yy, xx] = low

    def decode(self, bio, x: int, y: int, threshold: int) -> bool:
        """True iff leaf value < threshold (value becomes known)."""
        low = 0
        leaf = None
        for lvl, xx, yy in self._path(x, y):
            if low > self.low[lvl][yy, xx]:
                self.low[lvl][yy, xx] = low
            else:
                low = int(self.low[lvl][yy, xx])
            while low < threshold and low < self.value[lvl][yy, xx]:
                if bio.read(1):
                    self.value[lvl][yy, xx] = low
                else:
                    low += 1
            self.low[lvl][yy, xx] = low
            leaf = (lvl, xx, yy)
        lvl, xx, yy = leaf
        return int(self.value[lvl][yy, xx]) < threshold

    def leaf_value(self, x: int, y: int) -> int:
        return int(self.value[0][y, x])


class _BitWriter:
    """Packet-header bit writer (B.10.1): MSB first; after an 0xFF
    byte the next byte carries 7 bits (MSB forced 0)."""

    def __init__(self):
        self.bytes = bytearray()
        self.buf = 0
        self.nbits = 0
        self.limit = 8

    def write(self, bit: int) -> None:
        self.buf = (self.buf << 1) | (bit & 1)
        self.nbits += 1
        if self.nbits == self.limit:
            self.bytes.append(self.buf & 0xFF)
            self.limit = 7 if self.bytes[-1] == 0xFF else 8
            self.buf = 0
            self.nbits = 0

    def write_int(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.write((v >> i) & 1)

    def flush(self) -> bytes:
        if self.nbits:
            self.buf <<= (self.limit - self.nbits)
            self.bytes.append(self.buf & 0xFF)
            self.buf = 0
            self.nbits = 0
        if self.bytes and self.bytes[-1] == 0xFF:
            self.bytes.append(0x00)   # header must not end in 0xFF
        return bytes(self.bytes)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.prev_ff = False

    def read(self, n: int = 1) -> int:
        v = 0
        for _ in range(n):
            if self.nbits == 0:
                if self.pos >= len(self.d):
                    raise Jpeg2000Error("packet header overruns data")
                b = self.d[self.pos]
                self.pos += 1
                if self.prev_ff:
                    if b & 0x80:
                        raise Jpeg2000Error("bad header stuffing")
                    self.nbits = 7
                else:
                    self.nbits = 8
                self.prev_ff = b == 0xFF
                self.buf = b
            self.nbits -= 1
            v = (v << 1) | ((self.buf >> self.nbits) & 1)
        return v

    def align(self) -> int:
        """End of packet header: discard partial bits; consume the
        trailing stuffed 0x00 if the final byte was 0xFF."""
        self.nbits = 0
        if self.prev_ff:
            if self.pos >= len(self.d) or self.d[self.pos] != 0x00:
                raise Jpeg2000Error("missing header stuffing byte")
            self.pos += 1
            self.prev_ff = False
        return self.pos


def _write_npasses(bio: _BitWriter, n: int) -> None:
    if n == 1:
        bio.write(0)
    elif n == 2:
        bio.write_int(0b10, 2)
    elif n <= 5:
        bio.write_int(0b11, 2)
        bio.write_int(n - 3, 2)
    elif n <= 36:
        bio.write_int(0b1111, 4)
        bio.write_int(n - 6, 5)
    elif n <= 164:
        bio.write_int(0b111111111, 9)
        bio.write_int(n - 37, 7)
    else:
        raise Jpeg2000Error(f"pass count {n} out of range")


def _read_npasses(bio: _BitReader) -> int:
    if not bio.read(1):
        return 1
    if not bio.read(1):
        return 2
    v = bio.read(2)
    if v < 3:
        return 3 + v
    v = bio.read(5)
    if v < 31:
        return 6 + v
    return 37 + bio.read(7)


# --------------------------------------------------------------------------
# codestream (Annex A): single tile, single layer, LRCP, no precincts
# --------------------------------------------------------------------------

_GUARD = 2
_GAIN = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}


def _band_list(levels: int):
    """(resolution, band-name, dwt-level) in LRCP packet order.
    Resolution 0 is the final LL; resolution r>=1 carries the level
    ``levels - r + 1`` detail bands."""
    out = [(0, "LL", levels)]
    for r in range(1, levels + 1):
        lvl = levels - r + 1
        out += [(r, "HL", lvl), (r, "LH", lvl), (r, "HH", lvl)]
    return out


def _codeblocks(bw: int, bh: int, cbw: int, cbh: int):
    """Raster-order codeblock rectangles of a (bw x bh) subband."""
    nx = max(1, (bw + cbw - 1) // cbw)
    ny = max(1, (bh + cbh - 1) // cbh)
    out = []
    for by in range(ny):
        for bx in range(nx):
            x0, y0 = bx * cbw, by * cbh
            out.append((x0, y0, min(cbw, bw - x0), min(cbh, bh - y0)))
    return nx, ny, out


def _encode_band_packet(band_arr: np.ndarray, band: str, depth: int,
                        cbw: int, cbh: int):
    """Tier-1 encode every codeblock of one subband; returns the
    per-codeblock (zero_bitplanes, n_passes, codeword) list + grid."""
    bh, bw = band_arr.shape
    mb = depth + _GAIN[band] + _GUARD - 1
    nx, ny, blocks = _codeblocks(bw, bh, cbw, cbh)
    entries = []
    for (x0, y0, w, h) in blocks:
        c = band_arr[y0:y0 + h, x0:x0 + w]
        mx = int(np.abs(c).max()) if c.size else 0
        msb = mx.bit_length()
        if msb > mb:
            raise Jpeg2000Error(
                f"coefficient overflows {mb} bitplanes in {band}")
        if msb == 0:
            entries.append((0, 0, b""))
            continue
        mq = MqEncoder()
        st = _fresh_stats()
        _t1_encode(mq, st, c, band, msb)
        entries.append((mb - msb, 3 * msb - 2, mq.flush()))
    return nx, ny, entries


class _BandState:
    """Per-subband Tier-2 state persisted across quality layers: the
    inclusion / zero-bitplane tag trees, per-codeblock Lblock, and the
    accumulated codeword segments."""

    def __init__(self, nx: int, ny: int, blocks: list, band: str,
                 mb: int):
        self.nx, self.ny = nx, ny
        self.blocks = blocks
        self.band = band
        self.mb = mb
        n = nx * ny
        self.incl = _TagTree(nx, ny)
        self.zbp = _TagTree(nx, ny)
        self.included = [False] * n
        self.msb = [0] * n
        self.lblock = [3] * n
        self.npass = [0] * n
        self.segs: list[list[bytes]] = [[] for _ in range(n)]


def _split_layers(entries: list, layers: int):
    """Assign each codeblock's passes/bytes to layers: first inclusion
    at layer (i % layers), remaining passes spread over later layers,
    byte split proportional to passes (any pass-aligned split decodes —
    segments are concatenated before Tier-1 runs)."""
    n = len(entries)
    plan = [[None] * n for _ in range(layers)]
    for i, (zb, npass, data) in enumerate(entries):
        if not data:
            continue
        first = i % layers
        nl = layers - first
        base, extra = divmod(npass, nl)
        counts = [base + (1 if k < extra else 0) for k in range(nl)]
        # make sure the first contribution is non-empty
        while counts[0] == 0 and any(counts):
            counts[0] += 1
            for k in range(nl - 1, 0, -1):
                if counts[k]:
                    counts[k] -= 1
                    break
        offs, acc = [], 0
        for k in range(nl):
            acc += counts[k]
            offs.append(round(len(data) * acc / npass))
        prev_b = prev_p = 0
        for k in range(nl):
            if counts[k] == 0:
                continue
            plan[first + k][i] = (zb, counts[k],
                                  data[prev_b:offs[k]])
            prev_b = offs[k]
            prev_p += counts[k]
    return plan


_SOP = b"\xff\x91"
_EPH = b"\xff\x92"


def _emit_packet_layer(st: _BandState, layer: int, contrib: list,
                       eph: bool) -> bytes:
    """One packet for one band at one layer; ``contrib[i]`` is
    (zb, npasses, bytes) or None."""
    bio = _BitWriter()
    if all(c is None for c in contrib):
        bio.write(0)
        out = bio.flush()
        return out + (_EPH if eph else b"")
    bio.write(1)
    body = bytearray()
    for i, c in enumerate(contrib):
        x, y = i % st.nx, i // st.nx
        if st.included[i]:
            bio.write(0 if c is None else 1)
            if c is None:
                continue
        else:
            # tag-tree leaf values (inclusion AND zero-bitplane) are
            # ALL pre-seeded by the caller: tag-tree internal nodes
            # are mins over every leaf, so setting leaves lazily as
            # blocks are first coded lets an earlier block commit a
            # wrong ancestor value (review r13 — silent multi-
            # codeblock corruption)
            st.incl.encode(bio, x, y, layer + 1)
            if c is None:
                continue
            st.zbp.encode(bio, x, y, 999)
            st.included[i] = True
        _, npass, data = c
        _write_npasses(bio, npass)
        nbits = st.lblock[i] + (npass.bit_length() - 1)
        while len(data) >= (1 << nbits):
            bio.write(1)
            st.lblock[i] += 1
            nbits += 1
        bio.write(0)
        bio.write_int(len(data), nbits)
        body += data
    return bio.flush() + (_EPH if eph else b"") + bytes(body)


def _read_packet_layer(data: bytes, pos: int, st: _BandState,
                       layer: int, sop: bool, eph: bool) -> int:
    """Decode one packet for one band at one layer into ``st``;
    returns the new position."""
    if sop:
        if data[pos:pos + 2] == _SOP:
            if pos + 6 > len(data):
                raise Jpeg2000Error("truncated SOP marker")
            pos += 6
    br = _BitReader(data, pos)
    if not br.read(1):
        pos = br.align()
        if eph:
            if data[pos:pos + 2] != _EPH:
                raise Jpeg2000Error("missing EPH marker")
            pos += 2
        return pos
    items: list = []
    for i in range(st.nx * st.ny):
        x, y = i % st.nx, i // st.nx
        if st.included[i]:
            if not br.read(1):
                continue
        else:
            if not st.incl.decode(br, x, y, layer + 1):
                continue
            t = 1
            while not st.zbp.decode(br, x, y, t):
                t += 1
            zb = st.zbp.leaf_value(x, y)
            msb = st.mb - zb
            if msb < 1 or msb > 40:
                raise Jpeg2000Error(f"bad zero-bitplane count {zb}")
            st.msb[i] = msb
            st.included[i] = True
        npass = _read_npasses(br)
        while br.read(1):
            st.lblock[i] += 1
        nbits = st.lblock[i] + (npass.bit_length() - 1)
        ln = br.read(nbits)
        items.append((i, npass, ln))
    pos = br.align()
    if eph:
        if data[pos:pos + 2] != _EPH:
            raise Jpeg2000Error("missing EPH marker")
        pos += 2
    for i, npass, ln in items:
        if pos + ln > len(data):
            raise Jpeg2000Error("packet body overruns data")
        st.npass[i] += npass
        st.segs[i].append(data[pos:pos + ln])
        pos += ln
    return pos


def encode_j2k(img: np.ndarray, depth: int = 8, levels: int = 2,
               rct: bool = True, cb_exp: tuple = (6, 6),
               layers: int = 1, sop: bool = False,
               eph: bool = False) -> bytes:
    """Lossless Part-1 codestream: single tile, LRCP, reversible 5/3,
    optional RCT for 3-component images; ``layers`` quality layers
    (every pass present overall — progressive ORDER, not truncation),
    optional SOP/EPH packet markers."""
    if not 1 <= layers <= 255:
        raise Jpeg2000Error(f"bad layer count {layers}")
    a = np.asarray(img)
    if a.ndim == 2:
        comps = [a.astype(np.int64)]
    elif a.ndim == 3 and a.shape[2] == 3:
        comps = [a[:, :, i].astype(np.int64) for i in range(3)]
    else:
        raise Jpeg2000Error("image must be (h,w) or (h,w,3)")
    h, w = comps[0].shape
    if w * h > MAX_PIXELS or w < 1 or h < 1:
        raise Jpeg2000Error(f"bad dimensions {w}x{h}")
    if not 1 <= depth <= 16:
        raise Jpeg2000Error(f"bad depth {depth}")
    if not 0 <= levels <= 32:
        raise Jpeg2000Error(f"bad decomposition levels {levels}")
    shift = 1 << (depth - 1)
    comps = [c - shift for c in comps]
    use_rct = rct and len(comps) == 3
    if use_rct:
        r, g, b = comps
        comps = [(r + 2 * g + b) >> 2, b - g, r - g]
    cbw, cbh = 1 << cb_exp[0], 1 << cb_exp[1]

    out = bytearray(b"\xff\x4f")                       # SOC
    siz = struct.pack(">HIIIIIIIIH", 0, w, h, 0, 0, w, h, 0, 0,
                      len(comps))
    for _ in comps:
        siz += struct.pack(">BBB", depth - 1, 1, 1)
    out += b"\xff\x51" + struct.pack(">H", len(siz) + 2) + siz
    scod = (2 if sop else 0) | (4 if eph else 0)
    cod = struct.pack(">BBHB", scod, 0, layers, 1 if use_rct else 0)
    cod += struct.pack(">BBBBB", levels, cb_exp[0] - 2, cb_exp[1] - 2,
                       0, 1)                            # 5/3
    out += b"\xff\x52" + struct.pack(">H", len(cod) + 2) + cod
    qcd = bytes([_GUARD << 5])                          # no quant
    for (_r, band, _lvl) in _band_list(levels):
        qcd += bytes([(depth + _GAIN[band]) << 3])
    out += b"\xff\x5c" + struct.pack(">H", len(qcd) + 2) + qcd

    # tile body: packets in LRCP order — LAYER is the outermost loop
    per_comp = []
    for c in comps:
        bands, ll = dwt53_forward(c, levels)
        per_comp.append({"LL": ll, "bands": bands})
    band_states = []          # (state, per-layer contribution plan)
    for r in range(levels + 1):
        blist = [b for b in _band_list(levels) if b[0] == r]
        for ci, pc in enumerate(per_comp):
            for (_r, band, lvl) in blist:
                arr = pc["LL"] if band == "LL" else \
                    pc["bands"][lvl - 1][band]
                if arr.size == 0:
                    continue          # zero-area band: no packet
                nx, ny, entries = _encode_band_packet(
                    arr, band, depth, cbw, cbh)
                mb = depth + _GAIN[band] + _GUARD - 1
                st = _BandState(nx, ny, [], band, mb)
                for i, (zb, npass, d) in enumerate(entries):
                    st.incl.set_value(i % nx, i // nx,
                                      (i % layers) if d else 999)
                    st.zbp.set_value(i % nx, i // nx,
                                     zb if d else 0)
                band_states.append((st, _split_layers(entries,
                                                      layers)))
    body = bytearray()
    nsop = 0
    for layer in range(layers):
        for st, plan in band_states:
            if sop:
                body += _SOP + struct.pack(">HH", 4, nsop & 0xFFFF)
                nsop += 1
            body += _emit_packet_layer(st, layer, plan[layer], eph)

    sot = struct.pack(">HHIBB", 10, 0, 14 + len(body), 0, 1)
    out += b"\xff\x90" + sot + b"\xff\x93" + body
    out += b"\xff\xd9"                                  # EOC
    return bytes(out)


@guard(Jpeg2000Error)
def decode_j2k(data: bytes) -> np.ndarray:
    """Decode a Part-1 codestream within this module's lossless scope
    (see module docstring); named NotImplementedError for the rest."""
    b = bytes(data)
    if b[:2] != b"\xff\x4f":
        raise Jpeg2000Error("not a JPEG 2000 codestream (no SOC)")
    pos = 2
    w = h = None
    comps: list = []
    levels = cbx = cby = None
    use_mct = False
    use_sop = use_eph = False
    irreversible = False
    layers = 1
    depth = None
    body = None
    qcd_seg = None
    while pos + 2 <= len(b):
        marker = b[pos:pos + 2]
        pos += 2
        if marker == b"\xff\xd9":
            break
        if marker == b"\xff\x93":                      # SOD
            raise Jpeg2000Error("SOD before SOT")
        if pos + 2 > len(b):
            raise Jpeg2000Error("truncated marker segment")
        ln = struct.unpack_from(">H", b, pos)[0]
        if ln < 2 or pos + ln > len(b):
            raise Jpeg2000Error("bad marker segment length")
        seg = b[pos + 2:pos + ln]
        if marker == b"\xff\x51":                      # SIZ
            if len(seg) < 36:
                raise Jpeg2000Error("truncated SIZ")
            (rsiz, xs, ys, xo, yo, xt, yt, xto, yto,
             nc) = struct.unpack_from(">HIIIIIIIIH", seg, 0)
            if xo or yo or xto or yto:
                raise NotImplementedError(
                    "JPEG 2000 non-zero grid offsets not supported")
            if xt < xs or yt < ys:
                raise NotImplementedError(
                    "JPEG 2000 multi-tile codestreams not supported")
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"JPEG 2000 {nc}-component images not supported")
            if xs * ys > MAX_PIXELS or xs < 1 or ys < 1:
                raise Jpeg2000Error(f"bad dimensions {xs}x{ys}")
            w, h = xs, ys
            if len(seg) < 36 + 3 * nc:
                raise Jpeg2000Error("SIZ short of component entries")
            comps = []
            for i in range(nc):
                ssiz, xr, yr = struct.unpack_from(
                    ">BBB", seg, 36 + 3 * i)
                if ssiz & 0x80:
                    raise NotImplementedError(
                        "signed components not supported")
                if xr != 1 or yr != 1:
                    raise NotImplementedError(
                        "subsampled components not supported")
                comps.append(ssiz + 1)
            if len(set(comps)) != 1:
                raise NotImplementedError(
                    "mixed component depths not supported")
            depth = comps[0]
            if depth > 16:
                raise NotImplementedError(">16-bit not supported")
        elif marker == b"\xff\x52":                    # COD
            if len(seg) < 10:
                raise Jpeg2000Error("truncated COD")
            scod, prog, layers, mct = struct.unpack_from(
                ">BBHB", seg, 0)
            if scod & 1:
                raise NotImplementedError(
                    "precinct subdivision not supported")
            use_sop = bool(scod & 2)
            use_eph = bool(scod & 4)
            if prog != 0:
                raise NotImplementedError(
                    f"progression order {prog} not supported (LRCP)")
            if not 1 <= layers <= 255:
                raise Jpeg2000Error(f"bad layer count {layers}")
            nl, cbxe, cbye, cbstyle, wavelet = struct.unpack_from(
                ">BBBBB", seg, 5)
            if cbstyle:
                raise NotImplementedError(
                    f"code-block style 0x{cbstyle:02x} (bypass/"
                    "termall/causal/...) not supported")
            if wavelet not in (0, 1):
                raise Jpeg2000Error(f"bad wavelet flag {wavelet}")
            irreversible = wavelet == 0
            levels, cbx, cby = nl, cbxe + 2, cbye + 2
            use_mct = bool(mct)
        elif marker == b"\xff\x5c":                    # QCD
            if not seg:
                raise Jpeg2000Error("empty QCD")
            qcd_seg = seg
        elif marker == b"\xff\x90":                    # SOT
            if len(seg) < 8:
                raise Jpeg2000Error("truncated SOT")
            isot, psot, tpsot, tnsot = struct.unpack_from(
                ">HIBB", seg, 0)
            if isot != 0 or tpsot != 0:
                raise NotImplementedError(
                    "multiple tiles / tile-parts not supported")
            if b[pos + ln:pos + ln + 2] != b"\xff\x93":
                raise Jpeg2000Error("SOT not followed by SOD")
            end = pos - 2 + psot if psot else len(b) - 2
            if end > len(b):
                raise Jpeg2000Error("Psot overruns stream")
            body = b[pos + ln + 2:end]
            pos = end
            continue
        elif marker in (b"\xff\x53", b"\xff\x5d", b"\xff\x5e",
                        b"\xff\x5f"):
            raise NotImplementedError(
                "COC/QCC/RGN/POC marker segments not supported")
        # advisory markers — TLM (FF55), PLM (FF57), PLT (FF58),
        # CRG (FF63), COM (FF64) — and unknown COM-class: skip
        pos += ln
    if w is None or levels is None or body is None or qcd_seg is None:
        raise Jpeg2000Error("missing SIZ/COD/QCD/tile data")

    # quantization parameters (E.1): guard bits + per-band (eps, mant)
    guard = qcd_seg[0] >> 5
    qstyle = qcd_seg[0] & 0x1F
    blist_all = _band_list(levels)
    quant: dict = {}
    if qstyle == 0:                      # reversible, 8-bit exponents
        if irreversible:
            raise Jpeg2000Error("9/7 stream without quantization")
        if len(qcd_seg) < 1 + len(blist_all):
            raise Jpeg2000Error("QCD short of subband entries")
        for k, (_r, band, _lvl) in enumerate(blist_all):
            quant[(_r, band)] = (qcd_seg[1 + k] >> 3, 0)
    elif qstyle == 1:                    # scalar derived
        if len(qcd_seg) < 3:
            raise Jpeg2000Error("QCD short")
        v = struct.unpack_from(">H", qcd_seg, 1)[0]
        e0, m0 = v >> 11, v & 0x7FF
        for (_r, band, lvl) in blist_all:
            dec_lvl = lvl if band != "LL" else levels
            quant[(_r, band)] = (e0 - (levels - dec_lvl), m0)
    elif qstyle == 2:                    # scalar expounded
        if len(qcd_seg) < 1 + 2 * len(blist_all):
            raise Jpeg2000Error("QCD short of subband entries")
        for k, (_r, band, _lvl) in enumerate(blist_all):
            v = struct.unpack_from(">H", qcd_seg, 1 + 2 * k)[0]
            quant[(_r, band)] = (v >> 11, v & 0x7FF)
    else:
        raise Jpeg2000Error(f"bad quantization style {qstyle}")

    nc = len(comps)
    cbw, cbh = 1 << cbx, 1 << cby
    # band geometry: replay the forward split sizes
    sizes = []
    ww, hh = w, h
    for _ in range(levels):
        nlw, nhw = ww - ww // 2, ww // 2
        nlh, nhh = hh - hh // 2, hh // 2
        sizes.append({"HL": (nlh, nhw), "LH": (nhh, nlw),
                      "HH": (nhh, nhw)})
        ww, hh = nlw, nlh
    ll_size = (hh, ww)

    per_comp = [{"LL": None,
                 "bands": [dict() for _ in range(levels)]}
                for _ in range(nc)]
    # walk 1: build per-band Tier-2 state in LRCP band order
    band_walk = []
    for r in range(levels + 1):
        blist = [x for x in _band_list(levels) if x[0] == r]
        for ci in range(nc):
            for (_r, band, lvl) in blist:
                bh_, bw_ = ll_size if band == "LL" else \
                    sizes[lvl - 1][band]
                eps_b, mant_b = quant[(r, band)]
                mb = guard + eps_b - 1
                if mb < 1 or mb > 40:
                    raise Jpeg2000Error(f"bad Mb {mb} for {band}")
                if bw_ == 0 or bh_ == 0:
                    empty = np.zeros((bh_, bw_), dtype=np.int64)
                    if band == "LL":
                        per_comp[ci]["LL"] = empty
                    else:
                        per_comp[ci]["bands"][lvl - 1][band] = empty
                    continue
                nx, ny, blocks = _codeblocks(bw_, bh_, cbw, cbh)
                st = _BandState(nx, ny, blocks, band, mb)
                band_walk.append((st, ci, band, lvl, bh_, bw_))
    # walk 2: packets, LAYER outermost (LRCP)
    pos = 0
    for layer in range(layers):
        for st, *_rest in band_walk:
            pos = _read_packet_layer(body, pos, st, layer,
                                     use_sop, use_eph)
    # walk 3: Tier-1 over the accumulated segments (r13: partial
    # pass counts decode the available planes — lossy truncation)
    for st, ci, band, lvl, bh_, bw_ in band_walk:
        arr = np.zeros((bh_, bw_), dtype=np.int64)
        for i, (x0, y0, wb, hb) in enumerate(st.blocks):
            if not st.included[i]:
                continue
            msb = st.msb[i]
            npass = min(st.npass[i], 3 * msb - 2)
            cw = b"".join(st.segs[i])
            mq = MqDecoder(cw)
            t1 = _fresh_stats()
            arr[y0:y0 + hb, x0:x0 + wb] = _t1_decode(
                mq, t1, wb, hb, band, msb, n_passes=npass)
        r_of = 0 if band == "LL" else levels - lvl + 1
        if irreversible:
            eps_b, mant_b = quant[(r_of, band)]
            delta = _delta_b(depth, band, eps_b, mant_b)
            farr = np.where(
                arr != 0,
                (np.abs(arr) + 0.5) * delta * np.sign(arr), 0.0)
            arr = farr
        if band == "LL":
            per_comp[ci]["LL"] = arr
        else:
            per_comp[ci]["bands"][lvl - 1][band] = arr

    outs = []
    for ci in range(nc):
        pc = per_comp[ci]
        if irreversible:
            outs.append(np.rint(dwt97_inverse(
                pc["bands"], pc["LL"])).astype(np.int64))
        else:
            outs.append(dwt53_inverse(pc["bands"], pc["LL"]))
    if use_mct and nc == 3:
        y, cb, cr = outs
        g = y - ((cb + cr) >> 2)
        outs = [cr + g, g, cb + g]
    shift = 1 << (depth - 1)
    mx = (1 << depth) - 1
    outs = [np.clip(o + shift, 0, mx) for o in outs]
    dt = np.uint8 if depth <= 8 else np.uint16
    if nc == 1:
        return outs[0].astype(dt)
    return np.stack(outs, axis=2).astype(dt)


# --------------------------------------------------------------------------
# JP2 container (15444-1 Annex I): minimal box unwrap / wrap
# --------------------------------------------------------------------------

_JP2_SIG = b"\x00\x00\x00\x0cjP  \r\n\x87\n"


def is_jpeg2000(b: bytes) -> bool:
    return b[:4] == b"\xff\x4f\xff\x51" or b[:12] == _JP2_SIG


@guard(Jpeg2000Error)
def decode_jpx(data: bytes) -> np.ndarray:
    """Decode either a raw J2K codestream or a JP2 container (the two
    payloads PDF's /JPXDecode carries)."""
    b = bytes(data)
    if b[:4] == b"\xff\x4f\xff\x51":
        return decode_j2k(b)
    if b[:12] != _JP2_SIG:
        raise Jpeg2000Error("neither J2K codestream nor JP2 container")
    pos = 0
    while pos + 8 <= len(b):
        ln, btype = struct.unpack_from(">I4s", b, pos)
        if ln == 1:
            if pos + 16 > len(b):
                raise Jpeg2000Error("truncated XLBox")
            ln = struct.unpack_from(">Q", b, pos + 8)[0]
            start = pos + 16
        else:
            start = pos + 8
        if ln == 0:
            end = len(b)
        else:
            end = pos + ln
        if end > len(b) or end <= pos:
            raise Jpeg2000Error("bad JP2 box length")
        if btype == b"jp2c":
            return decode_j2k(b[start:end])
        pos = end
    raise Jpeg2000Error("no jp2c codestream box")


def build_jp2(img: np.ndarray, depth: int = 8, **kw) -> bytes:
    """Wrap ``encode_j2k`` output in a minimal JP2 container."""
    code = encode_j2k(img, depth=depth, **kw)
    a = np.asarray(img)
    h, w = a.shape[:2]
    nc = 1 if a.ndim == 2 else a.shape[2]

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + btype + payload

    ftyp = box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    ihdr = box(b"ihdr", struct.pack(
        ">IIHBBBB", h, w, nc, depth - 1, 7, 0, 0))
    colr = box(b"colr", bytes([1, 0, 0]) + struct.pack(
        ">I", 16 if nc == 3 else 17))
    jp2h = box(b"jp2h", ihdr + colr)
    return _JP2_SIG + ftyp + jp2h + box(b"jp2c", code)


# --------------------------------------------------------------------------
# irreversible 9/7 path (Annex F.4 + E: scalar quantization) — r13
# --------------------------------------------------------------------------

_A97 = -1.586134342059924
_B97 = -0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971
_K97 = 1.230174104914001


def _fwd97_1d(a: np.ndarray, axis: int):
    x = np.asarray(a, dtype=np.float64)
    n = x.shape[axis]
    nh = n // 2
    nl = n - nh
    even = np.take(x, np.arange(0, n, 2), axis=axis)
    odd = np.take(x, np.arange(1, n, 2), axis=axis)
    if nh == 0:
        return even, odd
    il, ih = np.arange(nl), np.arange(nh)
    h = odd + _A97 * (np.take(even, ih, axis=axis)
                      + _clip_take(even, ih + 1, axis))
    lo = even + _B97 * (_clip_take(h, il - 1, axis)
                        + _clip_take(h, il, axis))
    h = h + _G97 * (np.take(lo, ih, axis=axis)
                    + _clip_take(lo, ih + 1, axis))
    lo = lo + _D97 * (_clip_take(h, il - 1, axis)
                      + _clip_take(h, il, axis))
    return lo / _K97, h * _K97


def _inv97_1d(lo: np.ndarray, hi: np.ndarray,
              axis: int) -> np.ndarray:
    lo = np.asarray(lo, dtype=np.float64) * _K97
    hi = np.asarray(hi, dtype=np.float64) / _K97
    nl = lo.shape[axis]
    nh = hi.shape[axis]
    n = nl + nh
    if nh == 0:
        return lo.copy()
    il, ih = np.arange(nl), np.arange(nh)
    lo = lo - _D97 * (_clip_take(hi, il - 1, axis)
                      + _clip_take(hi, il, axis))
    hi = hi - _G97 * (np.take(lo, ih, axis=axis)
                      + _clip_take(lo, ih + 1, axis))
    lo = lo - _B97 * (_clip_take(hi, il - 1, axis)
                      + _clip_take(hi, il, axis))
    even = lo
    odd = hi - _A97 * (np.take(even, ih, axis=axis)
                       + _clip_take(even, ih + 1, axis))
    out_shape = list(lo.shape)
    out_shape[axis] = n
    out = np.empty(out_shape, dtype=np.float64)
    sl_e = [slice(None)] * out.ndim
    sl_o = [slice(None)] * out.ndim
    sl_e[axis] = slice(0, n, 2)
    sl_o[axis] = slice(1, n, 2)
    out[tuple(sl_e)] = even
    out[tuple(sl_o)] = odd
    return out


def dwt97_forward(img: np.ndarray, levels: int):
    ll = np.asarray(img, dtype=np.float64)
    bands = []
    for _ in range(levels):
        lo_r, hi_r = _fwd97_1d(ll, axis=1)
        llv, lhv = _fwd97_1d(lo_r, axis=0)
        hlv, hhv = _fwd97_1d(hi_r, axis=0)
        bands.append({"HL": hlv, "LH": lhv, "HH": hhv})
        ll = llv
    return bands, ll


def dwt97_inverse(bands: list, ll: np.ndarray) -> np.ndarray:
    ll = np.asarray(ll, dtype=np.float64)
    for lvl in reversed(bands):
        lo_r = _inv97_1d(ll, lvl["LH"], axis=0)
        hi_r = _inv97_1d(lvl["HL"], lvl["HH"], axis=0)
        ll = _inv97_1d(lo_r, hi_r, axis=1)
    return ll


def _delta_b(depth: int, band: str, eps: int, mant: int) -> float:
    """Quantization step (E.1.1): 2^(Rb - eps) * (1 + mant/2^11)."""
    rb = depth + _GAIN[band]
    return (2.0 ** (rb - eps)) * (1.0 + mant / 2048.0)


def encode_j2k_lossy(img: np.ndarray, depth: int = 8, levels: int = 2,
                     cb_exp: tuple = (6, 6), layers: int = 1,
                     sop: bool = False, eph: bool = False,
                     quality_shift: int = 2,
                     mantissa: int = 410,
                     drop_passes: int = 0) -> bytes:
    """Irreversible Part-1 codestream: 9/7 float DWT + scalar
    quantization (expounded per-band steps), single tile, LRCP, no
    MCT.  ``quality_shift`` coarsens every step by 2^shift (0 =
    near-lossless); ``mantissa`` exercises the 11-bit mantissa path.
    The fixture-writer side of the lossy DECODE lane — round trips
    are approximate by design (PSNR-pinned in tests)."""
    a = np.asarray(img)
    if a.ndim == 2:
        comps = [a.astype(np.float64)]
    elif a.ndim == 3 and a.shape[2] == 3:
        comps = [a[:, :, i].astype(np.float64) for i in range(3)]
    else:
        raise Jpeg2000Error("image must be (h,w) or (h,w,3)")
    h, w = comps[0].shape
    if w * h > MAX_PIXELS or w < 1 or h < 1:
        raise Jpeg2000Error(f"bad dimensions {w}x{h}")
    if not 1 <= depth <= 16:
        raise Jpeg2000Error(f"bad depth {depth}")
    if not 0 <= quality_shift <= 8 or not 0 <= mantissa <= 2047:
        raise Jpeg2000Error("bad quantization parameters")
    shift = 1 << (depth - 1)
    comps = [c - shift for c in comps]
    cbw, cbh = 1 << cb_exp[0], 1 << cb_exp[1]

    out = bytearray(b"\xff\x4f")
    siz = struct.pack(">HIIIIIIIIH", 0, w, h, 0, 0, w, h, 0, 0,
                      len(comps))
    for _ in comps:
        siz += struct.pack(">BBB", depth - 1, 1, 1)
    out += b"\xff\x51" + struct.pack(">H", len(siz) + 2) + siz
    scod = (2 if sop else 0) | (4 if eph else 0)
    cod = struct.pack(">BBHB", scod, 0, layers, 0)
    cod += struct.pack(">BBBBB", levels, cb_exp[0] - 2,
                       cb_exp[1] - 2, 0, 0)              # 9/7
    out += b"\xff\x52" + struct.pack(">H", len(cod) + 2) + cod
    qcd = bytes([(_GUARD << 5) | 2])                     # expounded
    quant = []
    for (_r, band, _lvl) in _band_list(levels):
        eps = depth + _GAIN[band] - quality_shift
        if eps < 1:
            raise Jpeg2000Error("quality_shift too coarse for depth")
        quant.append((band, eps, mantissa))
        qcd += struct.pack(">H", (eps << 11) | mantissa)
    out += b"\xff\x5c" + struct.pack(">H", len(qcd) + 2) + qcd

    per_comp = []
    for c in comps:
        bands, ll = dwt97_forward(c, levels)
        per_comp.append({"LL": ll, "bands": bands})
    band_states = []
    qi = {(_r, band): (eps, mant) for (_r, band, _l), (b2, eps, mant)
          in zip(_band_list(levels), quant)}
    for r in range(levels + 1):
        blist = [b for b in _band_list(levels) if b[0] == r]
        for ci, pc in enumerate(per_comp):
            for (_r, band, lvl) in blist:
                arr = pc["LL"] if band == "LL" else \
                    pc["bands"][lvl - 1][band]
                if arr.size == 0:
                    continue
                eps, mant = qi[(r, band)]
                delta = _delta_b(depth, band, eps, mant)
                idx = np.sign(arr) * np.floor(
                    np.abs(arr) / delta)
                mb = eps + _GUARD - 1
                nx, ny, entries = _encode_band_packet_quant(
                    idx.astype(np.int64), band, mb, cbw, cbh,
                    drop_passes=drop_passes)
                st = _BandState(nx, ny, [], band, mb)
                for i, (zb, npass, d) in enumerate(entries):
                    st.incl.set_value(i % nx, i // nx,
                                      (i % layers) if d else 999)
                    st.zbp.set_value(i % nx, i // nx,
                                     zb if d else 0)
                band_states.append((st, _split_layers(entries,
                                                      layers)))
    body = bytearray()
    nsop = 0
    for layer in range(layers):
        for st, plan in band_states:
            if sop:
                body += _SOP + struct.pack(">HH", 4, nsop & 0xFFFF)
                nsop += 1
            body += _emit_packet_layer(st, layer, plan[layer], eph)
    sot = struct.pack(">HHIBB", 10, 0, 14 + len(body), 0, 1)
    out += b"\xff\x90" + sot + b"\xff\x93" + bytes(body)
    out += b"\xff\xd9"
    return bytes(out)


def _encode_band_packet_quant(idx: np.ndarray, band: str, mb: int,
                              cbw: int, cbh: int,
                              drop_passes: int = 0):
    """Tier-1 over pre-quantized indices with an explicit Mb;
    ``drop_passes`` truncates each codeblock's trailing passes (rate
    control — the codeword is re-encoded to end exactly at the pass
    boundary, so truncated streams decode cleanly)."""
    bh, bw = idx.shape
    nx, ny, blocks = _codeblocks(bw, bh, cbw, cbh)
    entries = []
    for (x0, y0, w, h) in blocks:
        c = idx[y0:y0 + h, x0:x0 + w]
        mx = int(np.abs(c).max()) if c.size else 0
        msb = mx.bit_length()
        if msb > mb:
            raise Jpeg2000Error(
                f"quantized index overflows {mb} bitplanes in {band}")
        if msb == 0:
            entries.append((0, 0, b""))
            continue
        npass = max(1, 3 * msb - 2 - drop_passes)
        mq = MqEncoder()
        st = _fresh_stats()
        _t1_encode(mq, st, c, band, msb, n_passes=npass)
        entries.append((mb - msb, npass, mq.flush()))
    return nx, ny, entries
