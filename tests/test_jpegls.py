"""JPEG-LS codec (operators/jpegls.py): round trips across precisions
and image shapes, a SECOND independent encoder transliterated
procedure-by-procedure from the T.87 flowcharts (A.4-A.7) compared
bitstream-for-bitstream against the module encoder, golden-bytes
freezes, the LSE preset-parameter path, marker-stuffing structure,
and typed boundaries with truncation fuzz.

No system JPEG-LS implementation exists in this environment (no
CharLS/OpenJPEG/ffmpeg; libjpeg has no -LS support), so the pin level
is the lossless-JPEG/BCJ2 one: two structurally different
implementations of the public spec agreeing bit-for-bit, plus frozen
golden streams."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from evm_archive_spark.operators.jpegls import (
    JpeglsError,
    build_jpegls,
    decode_jpegls_raw,
    default_thresholds,
)

# ------------------------------------------------------------------
# independent encoder: a literal transliteration of the T.87 encoding
# flowcharts, one helper per spec procedure, its own bit writer
# ------------------------------------------------------------------

J = [0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
     4, 4, 5, 5, 6, 6, 7, 7, 8, 9, 10, 11, 12, 13, 14, 15]


class SpecBits:
    """F.1 bit packing: MSB first; a byte equal to FF is followed by a
    7-bit byte whose MSB is 0."""

    def __init__(self):
        self.bytes_ = bytearray()
        self.acc = ""

    def append(self, bitstring):
        self.acc += bitstring
        while True:
            room = 7 if (self.bytes_ and self.bytes_[-1] == 0xFF) else 8
            if len(self.acc) < room:
                return
            self.bytes_.append(int(self.acc[:room], 2))
            self.acc = self.acc[room:]

    def done(self):
        if self.acc:
            room = 7 if (self.bytes_ and self.bytes_[-1] == 0xFF) else 8
            self.bytes_.append(int(self.acc.ljust(room, "0"), 2))
        return bytes(self.bytes_)


def spec_encode(img, P):
    """Single-component, NEAR=0, default thresholds."""
    img = np.asarray(img, dtype=np.int64)
    H, W = img.shape
    MAXVAL = (1 << P) - 1
    T1, T2, T3, RESET = default_thresholds(MAXVAL)
    RANGE = MAXVAL + 1
    qbpp = (RANGE - 1).bit_length()
    bpp = max(2, MAXVAL.bit_length())
    LIMIT = 2 * (bpp + max(8, bpp))
    # A.2.1 initialisation
    A = {}
    B = {}
    C = {}
    N = {}
    for q in range(-500, 500):
        A[q] = max(2, (RANGE + 2 ** 5) // 2 ** 6)
        B[q] = 0
        C[q] = 0
        N[q] = 1
    Nn = {365: 0, 366: 0}
    RUNindex = 0
    out = SpecBits()

    def quantize(Di):                          # A.3.3, NEAR = 0
        if Di <= -T3:
            return -4
        if Di <= -T2:
            return -3
        if Di <= -T1:
            return -2
        if Di < 0:
            return -1
        if Di == 0:
            return 0
        if Di < T1:
            return 1
        if Di < T2:
            return 2
        if Di < T3:
            return 3
        return 4

    def golomb(MErrval, k, limit):             # A.5.3
        hibits = MErrval >> k
        if hibits < limit - qbpp - 1:
            out.append("0" * hibits + "1")
            if k:
                out.append(format(MErrval & ((1 << k) - 1),
                                  f"0{k}b"))
        else:
            out.append("0" * (limit - qbpp - 1) + "1")
            out.append(format(MErrval - 1, f"0{qbpp}b"))

    def neighbors(y, x, rec):
        Rb = rec[y - 1][x] if y > 0 else 0
        Rd = rec[y - 1][x + 1] if y > 0 and x + 1 < W else Rb
        if x > 0:
            Ra = rec[y][x - 1]
            Rc = rec[y - 1][x - 1] if y > 0 else 0
        else:
            Ra = Rb
            # Rc at line start: the Ra used at the previous line's
            # start = Rb of the previous line's first sample
            Rc = (rec[y - 2][0] if y >= 2 else 0) if y > 0 else 0
        return Ra, Rb, Rc, Rd

    rec = img.tolist()                         # lossless: Rx == Ix
    for y in range(H):
        x = 0
        while x < W:
            Ra, Rb, Rc, Rd = neighbors(y, x, rec)
            D1, D2, D3 = Rd - Rb, Rb - Rc, Rc - Ra
            Q1, Q2, Q3 = quantize(D1), quantize(D2), quantize(D3)
            if (Q1, Q2, Q3) == (0, 0, 0):
                # A.7.1 run scanning and A.7.1.2 coding
                RUNval = Ra
                RUNcnt = 0
                while x < W and img[y][x] == RUNval:
                    RUNcnt += 1
                    x += 1
                while RUNcnt >= (1 << J[RUNindex]):
                    out.append("1")
                    RUNcnt -= 1 << J[RUNindex]
                    if RUNindex < 31:
                        RUNindex += 1
                if x >= W:                     # A.7.1.2 step 3
                    if RUNcnt > 0:
                        out.append("1")
                    continue
                out.append("0")
                if J[RUNindex]:
                    out.append(format(RUNcnt, f"0{J[RUNindex]}b"))
                # A.7.2 run interruption sample
                Ix = img[y][x]
                Rb_i = rec[y - 1][x] if y > 0 else 0
                Ra_i = RUNval
                RItype = 1 if Ra_i == Rb_i else 0
                Px = Ra_i if RItype else Rb_i
                Errval = Ix - Px
                if RItype == 0 and Ra_i > Rb_i:
                    Errval = -Errval
                    SIGN = -1
                else:
                    SIGN = 1
                if Errval < 0:
                    Errval += RANGE
                if Errval >= (RANGE + 1) // 2:
                    Errval -= RANGE
                Qr = 365 + RItype
                TEMP = A[Qr] + (N[Qr] >> 1 if RItype else 0)
                k = 0
                while (N[Qr] << k) < TEMP:
                    k += 1
                # A.7.2.1 error mapping
                if k == 0 and Errval > 0 and 2 * Nn[Qr] < N[Qr]:
                    mapv = 1
                elif Errval < 0 and 2 * Nn[Qr] >= N[Qr]:
                    mapv = 1
                elif Errval < 0 and k != 0:
                    mapv = 1
                else:
                    mapv = 0
                EMErrval = 2 * abs(Errval) - RItype - mapv
                golomb(EMErrval, k, LIMIT - J[RUNindex] - 1)
                # A.7.2.2 update
                if Errval < 0:
                    Nn[Qr] += 1
                A[Qr] += (EMErrval + 1 - RItype) >> 1
                if N[Qr] == RESET:
                    A[Qr] >>= 1
                    N[Qr] >>= 1
                    Nn[Qr] >>= 1
                N[Qr] += 1
                if RUNindex > 0:
                    RUNindex -= 1
                x += 1
                continue
            # A.3.4 sign normalisation
            if Q1 < 0 or (Q1 == 0 and Q2 < 0) or (
                    Q1 == 0 and Q2 == 0 and Q3 < 0):
                Q1, Q2, Q3 = -Q1, -Q2, -Q3
                SIGN = -1
            else:
                SIGN = 1
            Q = (Q1 * 9 + Q2) * 9 + Q3         # any bijection works
            # A.4.1 MED prediction, A.4.2 correction
            if Rc >= max(Ra, Rb):
                Px = min(Ra, Rb)
            elif Rc <= min(Ra, Rb):
                Px = max(Ra, Rb)
            else:
                Px = Ra + Rb - Rc
            Px = Px + SIGN * C[Q]
            Px = min(max(Px, 0), MAXVAL)
            # A.4.4 / A.4.5
            Ix = img[y][x]
            Errval = (Ix - Px) * SIGN
            if Errval < 0:
                Errval += RANGE
            if Errval >= (RANGE + 1) // 2:
                Errval -= RANGE
            # A.5.1
            k = 0
            while (N[Q] << k) < A[Q]:
                k += 1
            # A.5.3 mapping
            if k == 0 and 2 * B[Q] <= -N[Q]:
                MErrval = 2 * Errval + 1 if Errval >= 0 \
                    else -2 * (Errval + 1)
            else:
                MErrval = 2 * Errval if Errval >= 0 \
                    else -2 * Errval - 1
            golomb(MErrval, k, LIMIT)
            # A.5.1 update
            B[Q] += Errval
            A[Q] += abs(Errval)
            if N[Q] == RESET:
                A[Q] >>= 1
                B[Q] = B[Q] >> 1 if B[Q] >= 0 else -((1 - B[Q]) >> 1)
                N[Q] >>= 1
            N[Q] += 1
            # A.5.2 bias computation
            if B[Q] <= -N[Q]:
                B[Q] += N[Q]
                if C[Q] > -128:
                    C[Q] -= 1
                if B[Q] <= -N[Q]:
                    B[Q] = -N[Q] + 1
            elif B[Q] > 0:
                B[Q] -= N[Q]
                if C[Q] < 127:
                    C[Q] += 1
                if B[Q] > 0:
                    B[Q] = 0
            x += 1
    head = struct.pack(">HHHBHHB", 0xFFD8, 0xFFF7, 11, P, H, W, 1)
    head += bytes((1, 0x11, 0))
    head += struct.pack(">HHB", 0xFFDA, 8, 1) + bytes((1, 0, 0, 0, 0))
    return head + out.done() + struct.pack(">H", 0xFFD9)


# ------------------------------------------------------------------


def test_roundtrips_all_precisions_and_shapes():
    rng = np.random.default_rng(87)
    for prec in (2, 4, 8, 12, 16):
        mx = (1 << prec) - 1
        for h, w in [(1, 1), (1, 64), (17, 3), (13, 29)]:
            for style in range(3):
                if style == 0:
                    img = rng.integers(0, mx + 1, (h, w))
                elif style == 1:
                    img = np.full((h, w), mx // 2)
                    img[::3, ::4] = rng.integers(
                        0, mx + 1, img[::3, ::4].shape)
                else:
                    img = rng.choice([0, mx], size=(h, w))
                b = build_jpegls(img, precision=prec)
                out, p = decode_jpegls_raw(b)
                assert p == prec
                assert np.array_equal(
                    out[:, :, 0].astype(np.int64), img), \
                    (prec, h, w, style)


def test_bitstream_matches_spec_transliteration():
    """The module encoder agrees BIT-FOR-BIT with the independent
    flowchart transliteration above — the strongest check available
    with no system JPEG-LS in this environment."""
    rng = np.random.default_rng(887)
    for prec in (8, 12, 16):
        mx = (1 << prec) - 1
        for h, w in [(5, 7), (12, 31), (3, 64)]:
            for style in range(4):
                if style == 0:
                    img = rng.integers(0, mx + 1, (h, w))
                elif style == 1:                # run-heavy
                    img = np.repeat(
                        rng.integers(0, mx + 1, (h, (w + 4) // 5)),
                        5, axis=1)[:, :w]
                elif style == 2:                # flat + spots
                    img = np.full((h, w), 1)
                    img[h // 2, w // 2] = mx
                else:                           # gradient
                    img = (np.arange(h)[:, None] * 3
                           + np.arange(w)[None, :] * 5) % (mx + 1)
                assert build_jpegls(img, precision=prec) == \
                    spec_encode(img, prec), (prec, h, w, style)


def test_golden_freeze():
    """Frozen streams: any future change to the coder is loud."""
    img8 = (np.arange(64, dtype=np.int64).reshape(8, 8) * 37) % 256
    b8 = build_jpegls(img8, precision=8)
    assert hashlib.sha256(b8).hexdigest() == GOLDEN8
    img12 = (np.arange(60, dtype=np.int64).reshape(6, 10) * 331) % 4096
    b12 = build_jpegls(img12, precision=12)
    assert hashlib.sha256(b12).hexdigest() == GOLDEN12
    for b, img in ((b8, img8), (b12, img12)):
        out, _ = decode_jpegls_raw(b)
        assert np.array_equal(out[:, :, 0].astype(np.int64), img)


def test_marker_stuffing_structure():
    """No byte >= 0x80 ever follows an FF inside entropy data, so no
    marker can be forged; the stream stays parseable."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 40))
    b = build_jpegls(img, precision=8)
    scan = b[b.index(b"\xff\xda") + 10:-2]
    for i in range(len(scan) - 1):
        if scan[i] == 0xFF:
            assert scan[i + 1] < 0x80, i


def test_lse_preset_parameters():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (9, 14))
    b = build_jpegls(img, precision=8, thresholds=(2, 5, 9, 32))
    assert b"\xff\xf8" in b                     # LSE present
    out, _ = decode_jpegls_raw(b)
    assert np.array_equal(out[:, :, 0].astype(np.int64), img)
    # different thresholds give a different (still decodable) stream
    assert b != build_jpegls(img, precision=8)
    # defaults table sanity: the two published anchor rows
    assert default_thresholds(255) == (3, 7, 21, 64)
    assert default_thresholds(4095) == (18, 67, 276, 64)


def test_typed_boundaries_and_truncation_fuzz():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (6, 9))
    good = build_jpegls(img, precision=8)
    with pytest.raises(JpeglsError, match="SOI"):
        decode_jpegls_raw(b"\x00" + good)
    # ILV / multi-component are typed
    i = good.index(b"\xff\xda")
    ilv = bytearray(good)
    ilv[i + 8] = 1                              # ILV byte
    with pytest.raises(JpeglsError, match="interleave"):
        decode_jpegls_raw(bytes(ilv))
    multi = bytearray(good)
    multi[good.index(b"\xff\xf7") + 9] = 3      # Nf
    with pytest.raises(JpeglsError, match="component"):
        decode_jpegls_raw(bytes(multi))
    # truncation anywhere is typed, never a crash or hang
    for cut in range(2, len(good), 3):
        try:
            out, _ = decode_jpegls_raw(good[:cut])
            # a cut after the full scan may still decode
            assert np.array_equal(
                out[:, :, 0].astype(np.int64), img)
        except JpeglsError:
            pass


def test_encoder_input_validation():
    with pytest.raises(JpeglsError, match="non-empty"):
        build_jpegls(np.zeros((0, 4)))
    with pytest.raises(JpeglsError, match="precision"):
        build_jpegls(np.zeros((2, 2)), precision=1)
    with pytest.raises(JpeglsError, match="exceeds"):
        build_jpegls(np.full((2, 2), 300), precision=8)


GOLDEN8 = ("89c85135b87702597665dfcfa37d4696"
           "aca1630f328e1036ba69888e204a45af")
GOLDEN12 = ("0408cb3c93189537e6fcfc4418eb9f42"
            "af6c4f351732c089df9b9aa245e9f1de")


def test_near_lossless():
    """NEAR > 0 (r12): the reconstruction error is bounded by NEAR
    everywhere, streams shrink monotonically-ish with NEAR, run mode
    absorbs near-flat noise, and a golden freeze pins the coder."""
    import hashlib

    rng = np.random.default_rng(481)
    img = rng.integers(0, 4096, (14, 19))
    sizes = []
    for near in (0, 1, 3, 7):
        b = build_jpegls(img, precision=12, near=near)
        out, p = decode_jpegls_raw(b)
        assert p == 12
        err = np.abs(out[:, :, 0].astype(np.int64) - img)
        assert err.max() <= near, near
        sizes.append(len(b))
    assert sizes[0] > sizes[-1]                 # NEAR=7 beats lossless
    # near-flat noise within +-NEAR of a base: run mode absorbs it
    flat = np.clip(rng.integers(-2, 3, (9, 40)) + 128, 0, 255)
    b = build_jpegls(flat, precision=8, near=2)
    out, _ = decode_jpegls_raw(b)
    assert np.abs(out[:, :, 0].astype(np.int64) - flat).max() <= 2
    assert len(b) < 90                          # ~1 bit/sample: runs
    # golden freeze for the near coder
    g = build_jpegls((np.arange(64).reshape(8, 8) * 37) % 256,
                     precision=8, near=2)
    assert hashlib.sha256(g).hexdigest() == GOLDEN_NEAR
    # NEAR out of range is typed
    with pytest.raises(JpeglsError, match="NEAR"):
        build_jpegls(np.zeros((2, 2), dtype=np.int64) , precision=8,
                     near=200)


GOLDEN_NEAR = ("4bad03d1a3098eb97053adf29d159b1d"
               "2a90d7499547192e2e2ae6d2c7859ead")
