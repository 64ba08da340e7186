"""JPEG-LS (ITU-T T.87 / ISO 14495-1, LOCO-I) — from scratch.

JPEG-LS is the dominant lossless codec in medical imaging: DICOM
transfer syntax 1.2.840.10008.1.2.4.80 encapsulates exactly these
streams.  The algorithm is unrelated to T.81 lossless (SOF3): per
sample it quantizes the three local gradients into one of 365
contexts, predicts with the median (MED) edge-detecting predictor
plus a per-context bias correction, and Golomb-rice-codes the
mapped prediction residual; flat regions switch to a run mode with
melcode-style adaptive run-length segments (the J[] table) and a
dedicated two-context run-interruption coder.

Scope: lossless AND near-lossless (NEAR >= 0, r12: quantized
residuals, the (2*NEAR+1)-spaced reconstruction, NEAR-widened run
and context rules), precision 2-16 bits, single-component scans
(DICOM monochrome — multi-component/interleaved scans and restart
markers are typed), default or LSE-preset coding parameters
(MAXVAL / T1 / T2 / T3 / RESET all honored).

No system pin exists in this environment (no CharLS, no OpenJPEG,
no ffmpeg, libjpeg has no -LS support), so like the lossless-JPEG
and BCJ2 lanes the check is an independent from-scratch ENCODER
(``build_jpegls``) plus a straight-from-spec transliteration of the
encoder flowcharts in the test suite compared bitstream-for-
bitstream, a golden-bytes freeze, and truncation fuzz.

Reference parity note: the reference (SummaryDev/evm-archive) stores
media as opaque bytea; this closes the "DICOM JPEG-LS transfer
syntax" typed boundary (operators/dicom.py).  Placement: per-payload
work inside mapInPandas Arrow batches (the codec boundary).
"""

from __future__ import annotations

import struct

import numpy as np

from .codecerrors import guard


class JpeglsError(ValueError):
    """Typed JPEG-LS boundary (malformed stream, out-of-scope
    feature)."""


SOI = 0xFFD8
EOI = 0xFFD9
SOF55 = 0xFFF7
LSE = 0xFFF8
SOS = 0xFFDA

#: allocation bound for self-declared dimensions (the webp
#: pixel-count rule)
MAX_JPEGLS_SAMPLES = 1 << 24

#: melcode run-length order table (T.87 A.2.1)
_J = (0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
      4, 4, 5, 5, 6, 6, 7, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_MIN_C, _MAX_C = -128, 127


def default_thresholds(maxval: int, near: int = 0) -> tuple:
    """T1/T2/T3/RESET defaults (T.87 C.2.4.1.1.1)."""
    def clamp(v, lo):
        return min(max(v, lo), maxval)

    if maxval >= 128:
        factor = (min(maxval, 4095) + 128) // 256
        t1 = clamp(factor * (3 - 2) + 2 + 3 * near, near + 1)
        t2 = clamp(factor * (7 - 3) + 3 + 5 * near, t1)
        t3 = clamp(factor * (21 - 4) + 4 + 7 * near, t2)
    else:
        factor = 256 // (maxval + 1)
        t1 = clamp(max(2, 3 // factor) + 3 * near, near + 1)
        t2 = clamp(max(3, 7 // factor) + 5 * near, t1)
        t3 = clamp(max(4, 21 // factor) + 7 * near, t2)
    return t1, t2, t3, 64


class _Params:
    """Per-scan coding state (T.87 A.2)."""

    def __init__(self, maxval: int, t1: int, t2: int, t3: int,
                 reset: int, near: int = 0):
        if not 1 <= maxval < 1 << 16:
            raise JpeglsError(f"MAXVAL {maxval} out of range")
        if not (0 < t1 <= t2 <= t3 <= maxval) or reset < 3:
            raise JpeglsError("bad coding thresholds")
        if not 0 <= near <= min(255, maxval // 2):
            raise JpeglsError(f"NEAR {near} out of range")
        self.maxval, self.t1, self.t2, self.t3 = maxval, t1, t2, t3
        self.reset = reset
        self.near = near
        # A.2.1: RANGE of quantized prediction errors
        self.range = (maxval + 2 * near) // (2 * near + 1) + 1
        self.qbpp = max(1, (self.range - 1).bit_length())
        bpp = max(2, (maxval + 1 - 1).bit_length())
        self.bpp = bpp
        self.limit = 2 * (bpp + max(8, bpp))
        # contexts: 0..404 regular (sparse 81*q1 + 9*(q2+4) + q3+4),
        # 405/406 the two run-interruption contexts
        ainit = max(2, (self.range + 32) // 64)
        self.A = [ainit] * 407
        self.B = [0] * 405
        self.C = [0] * 405
        self.N = [1] * 407
        self.Nn = [0, 0]                       # for contexts 405/406
        self.run_index = 0

    def quantize(self, d: int) -> int:
        """Gradient -> region (T.87 A.3.3)."""
        if d <= -self.t3:
            return -4
        if d <= -self.t2:
            return -3
        if d <= -self.t1:
            return -2
        if d < -self.near:
            return -1
        if d <= self.near:
            return 0
        if d < self.t1:
            return 1
        if d < self.t2:
            return 2
        if d < self.t3:
            return 3
        return 4

    def quantize_err(self, errval: int) -> int:
        """A.4.4: residual quantization (identity when NEAR = 0)."""
        if self.near == 0:
            return errval
        if errval > 0:
            return (self.near + errval) // (2 * self.near + 1)
        return -((self.near - errval) // (2 * self.near + 1))

    def reconstruct(self, px: int, sign: int, errval: int) -> int:
        """A.4.5 / A.8.2: Rx from the quantized residual, range-
        reduced then clamped to [0, MAXVAL]."""
        rx = px + sign * errval * (2 * self.near + 1)
        full = self.range * (2 * self.near + 1)
        if rx < -self.near:
            rx += full
        elif rx > self.maxval + self.near:
            rx -= full
        return 0 if rx < 0 else (self.maxval if rx > self.maxval
                                 else rx)


def _golomb_k(a: int, n: int) -> int:
    k = 0
    while (n << k) < a:
        k += 1
    return k


# -- bit I/O with the T.87 marker-stuffing rule ---------------------------------
# A completed 0xFF byte is followed by a 7-bit byte (MSB forced 0) so
# no marker (FF 80..FF FF) can appear inside entropy data.


class _BW:
    __slots__ = ("out", "cur", "nbits", "cap")

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0
        self.cap = 8

    def bit(self, b: int) -> None:
        self.cur = (self.cur << 1) | b
        self.nbits += 1
        if self.nbits == self.cap:
            self.out.append(self.cur)
            self.cap = 7 if self.cur == 0xFF else 8
            self.cur = 0
            self.nbits = 0

    def bits(self, val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit((val >> i) & 1)

    def flush(self) -> bytes:
        while self.nbits:
            self.bit(0)
        return bytes(self.out)


class _BR:
    __slots__ = ("data", "pos", "cur", "nbits", "prev")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0
        self.prev = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise JpeglsError("entropy stream exhausted")
            b = self.data[self.pos]
            if self.prev == 0xFF:
                if b & 0x80:
                    raise JpeglsError(
                        f"marker FF{b:02X} inside entropy data "
                        "(restart/DNL markers not supported)")
                self.nbits = 7
            else:
                self.nbits = 8
            self.cur = b
            self.prev = b
            self.pos += 1
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _lg_encode(w: _BW, val: int, k: int, limit: int,
               qbpp: int) -> None:
    """Limited-length Golomb LG(k, limit) (T.87 A.5.3)."""
    hi = val >> k
    if hi < limit - qbpp - 1:
        w.bits(0, hi)                          # unary prefix
        w.bit(1)
        if k:
            w.bits(val & ((1 << k) - 1), k)
    else:
        w.bits(0, limit - qbpp - 1)
        w.bit(1)
        w.bits(val - 1, qbpp)


def _lg_decode(r: _BR, k: int, limit: int, qbpp: int) -> int:
    hi = 0
    while r.bit() == 0:
        hi += 1
        if hi > limit:
            raise JpeglsError("Golomb unary prefix over limit")
    if hi < limit - qbpp - 1:
        return (hi << k) | (r.read(k) if k else 0)
    if hi != limit - qbpp - 1:
        raise JpeglsError("Golomb escape prefix malformed")
    return r.read(qbpp) + 1


# -- core coder (shared encoder/decoder walk) ------------------------------------


def _context(p: _Params, d1: int, d2: int, d3: int):
    """(Q index, SIGN) after sign normalization; None = run mode."""
    q1, q2, q3 = p.quantize(d1), p.quantize(d2), p.quantize(d3)
    if q1 == 0 and q2 == 0 and q3 == 0:
        return None, 1
    if q1 < 0 or (q1 == 0 and (q2 < 0 or (q2 == 0 and q3 < 0))):
        return 81 * -q1 + 9 * (4 - q2) + (4 - q3), -1
    return 81 * q1 + 9 * (q2 + 4) + (q3 + 4), 1


def _bias_update(p: _Params, q: int, errval: int) -> None:
    """A.5.1 variables update + A.5.2 bias computation."""
    p.B[q] += errval * (2 * p.near + 1)
    p.A[q] += abs(errval)
    if p.N[q] == p.reset:
        p.A[q] >>= 1
        p.B[q] = p.B[q] >> 1 if p.B[q] >= 0 else -((1 - p.B[q]) >> 1)
        p.N[q] >>= 1
    p.N[q] += 1
    if p.B[q] <= -p.N[q]:
        p.B[q] += p.N[q]
        if p.C[q] > _MIN_C:
            p.C[q] -= 1
        if p.B[q] <= -p.N[q]:
            p.B[q] = -p.N[q] + 1
    elif p.B[q] > 0:
        p.B[q] -= p.N[q]
        if p.C[q] < _MAX_C:
            p.C[q] += 1
        if p.B[q] > 0:
            p.B[q] = 0


def _predict(ra: int, rb: int, rc: int) -> int:
    """MED predictor (T.87 A.4.1)."""
    if rc >= max(ra, rb):
        return min(ra, rb)
    if rc <= min(ra, rb):
        return max(ra, rb)
    return ra + rb - rc


def _mod_range(errval: int, rng: int) -> int:
    if errval < 0:
        errval += rng
    if errval >= (rng + 1) // 2:
        errval -= rng
    return errval


def _ri_params(p: _Params, ra: int, rb: int):
    """Run-interruption context setup (A.7.2): (RItype, q, k)."""
    ritype = 1 if abs(ra - rb) <= p.near else 0
    q = 405 + ritype
    temp = p.A[q] + ((p.N[q] >> 1) if ritype else 0)
    return ritype, q, _golomb_k(temp, p.N[q])


def _ri_update(p: _Params, q: int, ritype: int, errval: int,
               emerrval: int) -> None:
    if errval < 0:
        p.Nn[q - 405] += 1
    p.A[q] += (emerrval + 1 - ritype) >> 1
    if p.N[q] == p.reset:
        p.A[q] >>= 1
        p.N[q] >>= 1
        p.Nn[q - 405] >>= 1
    p.N[q] += 1


# -- encoder ---------------------------------------------------------------------


def _encode_scan(img: np.ndarray, p: _Params) -> bytes:
    h, w = img.shape
    near = p.near
    bw = _BW()
    prev = [0] * (w + 2)
    cur = [0] * (w + 2)
    px_rows = img.astype(np.int64).tolist()
    for row in px_rows:
        cur[0] = prev[1]
        prev[w + 1] = prev[w]
        i = 0
        while i < w:
            ra, rb = cur[i], prev[i + 1]
            rc, rd = prev[i], prev[i + 2]
            q, sign = _context(p, rd - rb, rb - rc, rc - ra)
            x = row[i]
            if q is None:
                # run mode (A.7): count samples equal to Ra
                runval = ra
                cnt = 0
                while i < w and abs(row[i] - runval) <= near:
                    cnt += 1
                    cur[i + 1] = runval
                    i += 1
                while cnt >= (1 << _J[p.run_index]):
                    bw.bit(1)
                    cnt -= 1 << _J[p.run_index]
                    if p.run_index < 31:
                        p.run_index += 1
                if i >= w:                     # broken by end of line
                    if cnt > 0:
                        bw.bit(1)
                    break
                bw.bit(0)
                if _J[p.run_index]:
                    bw.bits(cnt, _J[p.run_index])
                # run-interruption sample (A.7.2)
                x = row[i]
                ra = runval
                rb = prev[i + 1]
                ritype, qr, k = _ri_params(p, ra, rb)
                pxp = ra if ritype else rb
                errval = x - pxp
                if ritype == 0 and ra > rb:
                    errval = -errval
                    rsign = -1
                else:
                    rsign = 1
                errval = _mod_range(p.quantize_err(errval), p.range)
                if (k == 0 and errval > 0
                        and 2 * p.Nn[qr - 405] < p.N[qr]):
                    emap = 1
                elif errval < 0 and 2 * p.Nn[qr - 405] >= p.N[qr]:
                    emap = 1
                elif errval < 0 and k != 0:
                    emap = 1
                else:
                    emap = 0
                emerrval = 2 * abs(errval) - ritype - emap
                _lg_encode(bw, emerrval, k,
                           p.limit - _J[p.run_index] - 1, p.qbpp)
                _ri_update(p, qr, ritype, errval, emerrval)
                if p.run_index > 0:
                    p.run_index -= 1
                cur[i + 1] = p.reconstruct(pxp, rsign, errval)
                i += 1
                continue
            # regular mode (A.4-A.5)
            pxp = _predict(ra, rb, rc)
            pxp += p.C[q] if sign > 0 else -p.C[q]
            pxp = 0 if pxp < 0 else (p.maxval if pxp > p.maxval
                                     else pxp)
            errval = _mod_range(
                p.quantize_err((x - pxp) if sign > 0 else (pxp - x)),
                p.range)
            k = _golomb_k(p.A[q], p.N[q])
            if near == 0 and k == 0 and 2 * p.B[q] <= -p.N[q]:
                merr = 2 * errval + 1 if errval >= 0 \
                    else -2 * (errval + 1)
            else:
                merr = 2 * errval if errval >= 0 else -2 * errval - 1
            _lg_encode(bw, merr, k, p.limit, p.qbpp)
            _bias_update(p, q, errval)
            cur[i + 1] = p.reconstruct(pxp, sign, errval)
            i += 1
        prev, cur = cur, prev
    return bw.flush()


def build_jpegls(img: np.ndarray, precision: int | None = None,
                 thresholds: tuple | None = None,
                 near: int = 0) -> bytes:
    """Encode a (h, w) array as a single-component JPEG-LS
    interchange stream (lossless at ``near=0``, else near-lossless
    with |sample - reconstruction| <= near).  ``thresholds`` =
    (T1, T2, T3, RESET) overrides the defaults and is declared via
    an LSE segment."""
    img = np.asarray(img)
    if img.ndim != 2 or img.size == 0:
        raise JpeglsError("encoder wants a non-empty (h, w) array")
    h, w = img.shape
    if h * w > MAX_JPEGLS_SAMPLES or h >= 1 << 16 or w >= 1 << 16:
        raise JpeglsError("image too large")
    if precision is None:
        precision = max(2, int(img.max(initial=1)).bit_length())
    if not 2 <= precision <= 16:
        raise JpeglsError(f"precision {precision} out of range")
    maxval = (1 << precision) - 1
    if int(img.min(initial=0)) < 0 or int(img.max(initial=0)) > maxval:
        raise JpeglsError("sample exceeds declared precision")
    if thresholds is None:
        t1, t2, t3, reset = default_thresholds(maxval, near)
        lse = b""
    else:
        t1, t2, t3, reset = thresholds
        lse = struct.pack(">HHBHHHHH", LSE, 13, 1, maxval,
                          t1, t2, t3, reset)
    p = _Params(maxval, t1, t2, t3, reset, near)
    out = bytearray(struct.pack(">H", SOI))
    out += struct.pack(">HHBHHB", SOF55, 11, precision, h, w, 1)
    out += bytes((1, 0x11, 0))                 # C1, H1V1, Tq=0
    out += lse
    out += struct.pack(">HHB", SOS, 8, 1) + bytes((1, 0, near, 0, 0))
    # (Cs=1, mapping=0, NEAR, ILV=0, Al/Ah=0)
    out += _encode_scan(img, p)
    out += struct.pack(">H", EOI)
    return bytes(out)


# -- decoder ---------------------------------------------------------------------


@guard(JpeglsError)
def decode_jpegls_raw(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a single-component JPEG-LS stream (lossless or
    near-lossless, per the scan's NEAR) ->
    ((h, w, 1) uint16 samples, precision)."""
    if len(data) < 4 or struct.unpack_from(">H", data, 0)[0] != SOI:
        raise JpeglsError("not a JPEG-LS payload (no SOI)")
    pos = 2
    prec = h = w = ncomp = None
    maxval = t123r = None
    while pos + 4 <= len(data):
        marker, = struct.unpack_from(">H", data, pos)
        if marker >> 8 != 0xFF:
            raise JpeglsError(f"bad marker alignment at {pos}")
        if marker == SOF55:
            ln, = struct.unpack_from(">H", data, pos + 2)
            prec, h, w, ncomp = struct.unpack_from(
                ">BHHB", data, pos + 4)
            if ncomp != 1:
                raise JpeglsError(
                    f"{ncomp}-component JPEG-LS not supported "
                    "(single-component DICOM scope)")
            pos += 2 + ln
        elif marker == LSE:
            ln, = struct.unpack_from(">H", data, pos + 2)
            lid = data[pos + 4]
            if lid == 1:
                maxval, t1, t2, t3, reset = struct.unpack_from(
                    ">HHHHH", data, pos + 5)
                t123r = (t1, t2, t3, reset)
            else:
                raise JpeglsError(
                    f"LSE ID {lid} (mapping tables / extension) "
                    "not supported")
            pos += 2 + ln
        elif marker == SOS:
            ln, = struct.unpack_from(">H", data, pos + 2)
            ns = data[pos + 4]
            if prec is None:
                raise JpeglsError("SOS before SOF55")
            if ns != 1:
                raise JpeglsError("multi-component scan not supported")
            near = data[pos + 4 + 1 + 2 * ns]
            ilv = data[pos + 4 + 1 + 2 * ns + 1]
            pt = data[pos + 4 + 1 + 2 * ns + 2] & 0x0F
            if ilv:
                raise JpeglsError(f"interleave mode {ilv} "
                                  "not supported")
            if pt:
                raise JpeglsError("point transform not supported")
            pos += 2 + ln
            break
        elif marker == EOI:
            raise JpeglsError("EOI before any scan")
        elif 0xFFC0 <= marker <= 0xFFCF:
            raise JpeglsError(
                f"marker {marker:04X}: not a JPEG-LS stream")
        elif marker == 0xFF01 or 0xFFD0 <= marker <= 0xFFD8:
            # standalone markers carry no length segment (RST0-7 and
            # a stray repeated SOI included)
            raise JpeglsError(
                f"standalone marker {marker:04X} before scan")
        else:                                  # APPn/COM etc.
            ln, = struct.unpack_from(">H", data, pos + 2)
            pos += 2 + ln
    else:
        raise JpeglsError("no scan found")
    if not h or not w:
        raise JpeglsError("zero dimensions (DNL not supported)")
    if h * w > MAX_JPEGLS_SAMPLES:
        raise JpeglsError("image too large")
    if maxval is None:
        maxval = (1 << prec) - 1
        t1, t2, t3, reset = default_thresholds(maxval, near)
    else:
        if maxval >= 1 << prec:
            raise JpeglsError("LSE MAXVAL exceeds precision")
        t1, t2, t3, reset = t123r
    p = _Params(maxval, t1, t2, t3, reset, near)
    br = _BR(data, pos)
    out = np.zeros((h, w), dtype=np.uint16)
    prev = [0] * (w + 2)
    cur = [0] * (w + 2)
    for y in range(h):
        cur[0] = prev[1]
        prev[w + 1] = prev[w]
        i = 0
        while i < w:
            ra, rb = cur[i], prev[i + 1]
            rc, rd = prev[i], prev[i + 2]
            q, sign = _context(p, rd - rb, rb - rc, rc - ra)
            if q is None:
                # run mode
                runval = ra
                interrupted = False
                while True:
                    if br.bit() == 1:
                        seg = 1 << _J[p.run_index]
                        if seg <= w - i:
                            for _ in range(seg):
                                cur[i + 1] = runval
                                i += 1
                            if p.run_index < 31:
                                p.run_index += 1
                            if i >= w:
                                break
                        else:
                            while i < w:
                                cur[i + 1] = runval
                                i += 1
                            break
                    else:
                        jj = _J[p.run_index]
                        cnt = br.read(jj) if jj else 0
                        if cnt > w - i - 1:
                            raise JpeglsError(
                                "run length overruns line")
                        for _ in range(cnt):
                            cur[i + 1] = runval
                            i += 1
                        interrupted = True
                        break
                if not interrupted:
                    break                      # line consumed by run
                # run-interruption sample
                ra = runval
                rb = prev[i + 1]
                ritype, qr, k = _ri_params(p, ra, rb)
                pxp = ra if ritype else rb
                rsign = -1 if (ritype == 0 and ra > rb) else 1
                emerrval = _lg_decode(
                    br, k, p.limit - _J[p.run_index] - 1, p.qbpp)
                emap = (emerrval + ritype) & 1
                mag = (emerrval + ritype + emap) >> 1
                qflag = (k == 0
                         and 2 * p.Nn[qr - 405] < p.N[qr])
                if mag == 0:
                    errval = 0
                elif (emap == 1) == qflag:
                    errval = mag
                else:
                    errval = -mag
                _ri_update(p, qr, ritype, errval, emerrval)
                if p.run_index > 0:
                    p.run_index -= 1
                cur[i + 1] = p.reconstruct(pxp, rsign, errval)
                i += 1
                continue
            # regular mode
            pxp = _predict(ra, rb, rc)
            pxp += p.C[q] if sign > 0 else -p.C[q]
            pxp = 0 if pxp < 0 else (p.maxval if pxp > p.maxval
                                     else pxp)
            k = _golomb_k(p.A[q], p.N[q])
            merr = _lg_decode(br, k, p.limit, p.qbpp)
            if p.near == 0 and k == 0 and 2 * p.B[q] <= -p.N[q]:
                errval = (merr - 1) >> 1 if merr & 1 \
                    else -(merr >> 1) - 1
            else:
                errval = merr >> 1 if not merr & 1 \
                    else -((merr + 1) >> 1)
            _bias_update(p, q, errval)
            cur[i + 1] = p.reconstruct(pxp, sign, errval)
            i += 1
        out[y] = cur[1:w + 1]
        prev, cur = cur, prev
    return out[:, :, None], prec
