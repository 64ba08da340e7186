"""Tests for the from-scratch FLAC decoder (operators/flac.py) and the
codec-invariant strict-mode audio path it unlocks.

Fixture independence: the encoder below is written from the RFC 9639
spec directly in this file — bit writer, Rice coder, fixed/LPC residual
computation, stereo decorrelation, bitwise (table-free) CRC-8/CRC-16 —
so the decoder is checked against a second implementation of the
format, not its own inverse.  The strongest pin is losslessness: a FLAC
and a WAV of the SAME integer samples must decode to bit-equal arrays,
which also makes `audio_fingerprint` codec-invariant by construction.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from evm_archive_spark.operators.flac import (
    FlacError,
    decode_flac,
    is_flac,
)


# ---------------------------------------------------------------------------
# independent encoder (spec-derived, from scratch)
# ---------------------------------------------------------------------------


class W:
    """MSB-first bit writer."""

    def __init__(self):
        self.bits: list[int] = []

    def u(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def s(self, value: int, n: int):
        self.u(value & ((1 << n) - 1), n)

    def unary(self, q: int):
        self.bits.extend([0] * q)
        self.bits.append(1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _crc8_bitwise(data: bytes) -> int:
    c = 0
    for byte in data:
        c ^= byte
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16_bitwise(data: bytes) -> int:
    c = 0
    for byte in data:
        c ^= byte << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _rice_write(w: W, values: list[int], param: int):
    for v in values:
        u = (v << 1) if v >= 0 else (-v << 1) - 1  # zigzag
        w.unary(u >> param)
        w.u(u & ((1 << param) - 1), param)


FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _write_subframe(
    w: W,
    samples: list[int],
    bps: int,
    kind: str,
    order: int = 0,
    rice_param: int = 4,
    part_order: int = 0,
    lpc_coefs: list[int] | None = None,
    lpc_shift: int = 0,
    escape_raw_bits: int | None = None,
    wasted: int = 0,
):
    """Write one subframe header + body per the spec."""
    if wasted:
        assert all(s % (1 << wasted) == 0 for s in samples)
        samples = [s >> wasted for s in samples]
        bps -= wasted
    w.u(0, 1)  # padding
    if kind == "constant":
        w.u(0, 6)
    elif kind == "verbatim":
        w.u(1, 6)
    elif kind == "fixed":
        w.u(8 + order, 6)
    elif kind == "lpc":
        w.u(32 + order - 1, 6)
    else:  # pragma: no cover
        raise AssertionError(kind)
    if wasted:
        w.u(1, 1)
        w.unary(wasted - 1)
    else:
        w.u(0, 1)

    if kind == "constant":
        assert len(set(samples)) == 1
        w.s(samples[0], bps)
        return
    if kind == "verbatim":
        for s in samples:
            w.s(s, bps)
        return

    # predictive subframes: warmup + coded residual
    for s in samples[:order]:
        w.s(s, bps)
    if kind == "fixed":
        coefs, shift = FIXED[order], 0
    else:
        assert lpc_coefs is not None and len(lpc_coefs) == order
        precision = max(max(abs(c).bit_length() + 1 for c in lpc_coefs), 2)
        w.u(precision - 1, 4)
        w.s(lpc_shift, 5)
        for c in lpc_coefs:
            w.s(c, precision)
        coefs, shift = lpc_coefs, lpc_shift
    residual = []
    for i in range(order, len(samples)):
        pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        residual.append(samples[i] - (pred >> shift))

    w.u(0, 2)  # rice method 0 (4-bit params)
    w.u(part_order, 4)
    n_parts = 1 << part_order
    part_len = len(samples) >> part_order
    pos = 0
    for p in range(n_parts):
        n = part_len - (order if p == 0 else 0)
        chunk = residual[pos : pos + n]
        pos += n
        if escape_raw_bits is not None:
            w.u(15, 4)  # escape code
            w.u(escape_raw_bits, 5)
            for v in chunk:
                w.s(v, escape_raw_bits)
        else:
            w.u(rice_param, 4)
            _rice_write(w, chunk, rice_param)
    assert pos == len(residual)


def encode_flac(
    channels: list[list[int]],
    rate: int = 8000,
    bps: int = 16,
    blocksize: int = 256,
    kinds: str | list[str] = "verbatim",
    stereo_mode: str = "independent",
    **sub_kw,
) -> bytes:
    """Spec-derived FLAC writer: STREAMINFO + a sequence of frames.

    `kinds` may be one subframe kind for all channels/frames or a list
    cycled per frame.  `stereo_mode` in {independent, left_side,
    right_side, mid_side} (2-channel inputs only).
    """
    n_ch = len(channels)
    total = len(channels[0])
    assert all(len(c) == total for c in channels)

    # --- STREAMINFO
    head = W()
    head.u(blocksize, 16)
    head.u(blocksize, 16)
    head.u(0, 24)
    head.u(0, 24)
    head.u(rate, 20)
    head.u(n_ch - 1, 3)
    head.u(bps - 1, 5)
    head.u(total, 36)
    out = bytearray(b"fLaC")
    out.append(0x80)  # last block, type 0
    out += struct.pack(">I", 34)[1:]
    out += head.bytes() + b"\x00" * 16

    kind_list = [kinds] * 1000 if isinstance(kinds, str) else kinds
    frame_idx = 0
    for start in range(0, total, blocksize):
        block = [c[start : start + blocksize] for c in channels]
        bs = len(block[0])
        w = W()
        w.u(0b11111111111110, 14)
        w.u(0, 1)
        w.u(0, 1)  # fixed blocking
        w.u(7, 4)  # blocksize: 16-bit at end
        w.u(0, 4)  # rate: from STREAMINFO
        if stereo_mode == "independent":
            w.u(n_ch - 1, 4)
        else:
            assert n_ch == 2
            w.u(
                {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode],
                4,
            )
        w.u({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        w.u(0, 1)
        # coded frame number (UTF-8 style)
        fn = frame_idx
        if fn < 0x80:
            w.u(fn, 8)
        else:
            assert fn < 0x800
            w.u(0xC0 | (fn >> 6), 8)
            w.u(0x80 | (fn & 0x3F), 8)
        w.u(bs - 1, 16)
        w.align()
        header = w.bytes()
        header += bytes([_crc8_bitwise(header)])

        body = W()
        kind = kind_list[frame_idx % len(kind_list)]
        # a short final block can't hold the warmup: fall back to verbatim
        if kind in ("fixed", "lpc") and bs < max(sub_kw.get("order", 0), 1):
            kind = "verbatim"
        if stereo_mode == "independent":
            subs = [(ch, bps) for ch in block]
        elif stereo_mode == "left_side":
            side = [l - r for l, r in zip(block[0], block[1])]
            subs = [(block[0], bps), (side, bps + 1)]
        elif stereo_mode == "right_side":
            side = [l - r for l, r in zip(block[0], block[1])]
            subs = [(side, bps + 1), (block[1], bps)]
        else:  # mid_side
            mid = [(l + r) >> 1 for l, r in zip(block[0], block[1])]
            side = [l - r for l, r in zip(block[0], block[1])]
            subs = [(mid, bps), (side, bps + 1)]
        for ch, ch_bps in subs:
            _write_subframe(body, ch, ch_bps, kind, **sub_kw)
        body.align()
        frame = header + body.bytes()
        frame += struct.pack(">H", _crc16_bitwise(frame))
        out += frame
        frame_idx += 1
    return bytes(out)


def _ints(samples: np.ndarray, bps: int) -> np.ndarray:
    """Decoded floats back to integer sample values."""
    return np.rint(samples * (1 << (bps - 1))).astype(np.int64)


# ---------------------------------------------------------------------------
# decoder unit tests
# ---------------------------------------------------------------------------


def test_verbatim_round_trip_mono_16bit():
    rng = np.random.default_rng(7)
    data = rng.integers(-32768, 32768, 1000).tolist()
    rate, out = decode_flac(encode_flac([data], rate=44100, blocksize=256))
    assert rate == 44100 and out.shape == (1000, 1)
    assert _ints(out, 16)[:, 0].tolist() == data


def test_constant_and_partial_final_frame():
    data = [123] * 700  # 700 = 2 full 256-blocks + a 188 tail
    rate, out = decode_flac(encode_flac([data], kinds="constant"))
    assert out.shape == (700, 1)
    assert set(_ints(out, 16)[:, 0].tolist()) == {123}


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_predictors_round_trip(order):
    rng = np.random.default_rng(order)
    # smooth signal: fixed predictors leave small residuals
    t = np.arange(600)
    data = (
        (3000 * np.sin(t / 25) + rng.integers(-40, 40, 600))
        .astype(int)
        .tolist()
    )
    raw = encode_flac([data], kinds="fixed", order=order, rice_param=6)
    _, out = decode_flac(raw)
    assert _ints(out, 16)[:, 0].tolist() == data


def test_lpc_round_trip_and_shift():
    rng = np.random.default_rng(3)
    data = rng.integers(-2000, 2000, 512).tolist()
    raw = encode_flac(
        [data],
        kinds="lpc",
        order=3,
        lpc_coefs=[1229, -410, 205],
        lpc_shift=10,
        rice_param=12,
    )
    _, out = decode_flac(raw)
    assert _ints(out, 16)[:, 0].tolist() == data


def test_rice_partitions_and_escape_partitions():
    rng = np.random.default_rng(11)
    data = rng.integers(-500, 500, 512).tolist()
    parts = encode_flac(
        [data], kinds="fixed", order=1, rice_param=9, part_order=3
    )
    _, out = decode_flac(parts)
    assert _ints(out, 16)[:, 0].tolist() == data
    escaped = encode_flac(
        [data], kinds="fixed", order=2, escape_raw_bits=13
    )
    _, out2 = decode_flac(escaped)
    assert _ints(out2, 16)[:, 0].tolist() == data


def test_wasted_bits():
    rng = np.random.default_rng(5)
    data = (rng.integers(-1000, 1000, 300) << 3).tolist()  # 3 wasted bits
    _, out = decode_flac(encode_flac([data], kinds="verbatim", wasted=3))
    assert _ints(out, 16)[:, 0].tolist() == data


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side", "mid_side"])
def test_stereo_decorrelation_modes_bit_equal(mode):
    rng = np.random.default_rng(17)
    base = rng.integers(-8000, 8000, 500)
    left = base.tolist()
    right = (base + rng.integers(-100, 100, 500)).tolist()
    raw = encode_flac([left, right], stereo_mode=mode, kinds="verbatim")
    rate, out = decode_flac(raw)
    ints = _ints(out, 16)
    assert ints[:, 0].tolist() == left
    assert ints[:, 1].tolist() == right


def test_bps_variants_8_and_24():
    rng = np.random.default_rng(23)
    d8 = rng.integers(-128, 128, 256).tolist()
    _, out8 = decode_flac(encode_flac([d8], bps=8))
    assert _ints(out8, 8)[:, 0].tolist() == d8
    d24 = rng.integers(-(1 << 23), 1 << 23, 256).tolist()
    _, out24 = decode_flac(encode_flac([d24], bps=24))
    assert _ints(out24, 24)[:, 0].tolist() == d24


def test_flac_wav_bit_equal_lossless():
    """The losslessness pin: FLAC and WAV of the same 16-bit samples
    decode to the exact same float arrays."""
    import io
    import wave

    from evm_archive_spark.operators.wav import decode_wav

    rng = np.random.default_rng(31)
    ints = rng.integers(-32768, 32768, (800, 2))
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(2)
    w.setsampwidth(2)
    w.setframerate(16000)
    w.writeframes(ints.astype("<i2").tobytes())
    w.close()
    wav_rate, wav_out = decode_wav(buf.getvalue())
    flac_rate, flac_out = decode_flac(
        encode_flac([ints[:, 0].tolist(), ints[:, 1].tolist()], rate=16000)
    )
    assert wav_rate == flac_rate == 16000
    assert np.array_equal(wav_out, flac_out)


def test_mixed_subframe_kinds_across_frames():
    rng = np.random.default_rng(41)
    data = rng.integers(-3000, 3000, 1024).tolist()
    raw = encode_flac(
        [data], kinds=["verbatim", "fixed", "lpc", "fixed"],
        order=2, lpc_coefs=[800, -300], lpc_shift=9, rice_param=12,
    )
    _, out = decode_flac(raw)
    assert _ints(out, 16)[:, 0].tolist() == data


def test_rejections():
    good = encode_flac([[1, 2, 3, 4] * 64])
    assert is_flac(good) and not is_flac(b"RIFF....WAVE")
    with pytest.raises(FlacError):
        decode_flac(b"fLaC")  # truncated metadata
    # corrupt the frame sync byte
    bad = bytearray(good)
    bad[42] ^= 0xFF
    with pytest.raises(FlacError):
        decode_flac(bytes(bad))
    # corrupt one audio byte -> CRC-16 mismatch
    bad2 = bytearray(good)
    bad2[-3] ^= 0x01
    with pytest.raises(FlacError):
        decode_flac(bytes(bad2))
    # truncated mid-frame
    with pytest.raises(FlacError):
        decode_flac(good[: len(good) - len(good) // 3])


def test_decode_flac_property_random_sweep():
    rng = np.random.default_rng(97)
    for trial in range(12):
        n_ch = int(rng.integers(1, 3))
        n = int(rng.integers(1, 900))
        bps = [8, 16, 24][trial % 3]
        hi = 1 << (bps - 1)
        chans = [rng.integers(-hi, hi, n).tolist() for _ in range(n_ch)]
        blocksize = int(rng.integers(16, 512))
        kind = ["verbatim", "fixed", "constant"][trial % 3]
        kw = {}
        if kind == "fixed":
            kw = {
                "order": int(rng.integers(0, 5)),
                "rice_param": min(bps - 2, 14),
            }
            if kw["order"] > min(n, blocksize):
                kw["order"] = 0
        if kind == "constant":
            chans = [[c[0]] * n for c in chans]
        raw = encode_flac(chans, bps=bps, blocksize=blocksize, kinds=kind, **kw)
        rate, out = decode_flac(raw)
        ints = _ints(out, bps)
        for ci, ch in enumerate(chans):
            assert ints[:, ci].tolist() == ch, (trial, kind, n, blocksize)


# ---------------------------------------------------------------------------
# Spark integration (pooled into test_operators_pooled_heavy)
# ---------------------------------------------------------------------------


def _pooled_flac_through_spark_strict_paths(spark):
    """FLAC through the strict multimodal operators: real features equal
    to the WAV of the same samples (lossless ⇒ codec-invariant), and the
    same audio fingerprint; non-strict unknown payloads take the fake."""
    import io
    import wave

    import pandas as pd

    from evm_archive_spark.operators import multimodal

    rng = np.random.default_rng(53)
    ints = rng.integers(-20000, 20000, (2048, 2))
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(2)
    w.setsampwidth(2)
    w.setframerate(8000)
    w.writeframes(ints.astype("<i2").tobytes())
    w.close()
    wav_payload = buf.getvalue()
    flac_payload = encode_flac(
        [ints[:, 0].tolist(), ints[:, 1].tolist()],
        rate=8000,
        kinds="fixed",
        order=2,
        rice_param=13,
    )
    df = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [1, 2, 3], "payload": [wav_payload, flac_payload, b"mp3?"]}
        )
    )
    strict = multimodal.audio_features(
        df.filter("media_id < 3"), strict=True
    ).toPandas().set_index("media_id").sort_index()
    # identical features for the lossless pair
    assert strict.loc[1].tolist() == strict.loc[2].tolist()
    assert strict.loc[1, "sample_rate"] == 8000
    assert strict.loc[1, "n_channels"] == 2

    fps = multimodal.audio_fingerprint(
        df.filter("media_id < 3"), strict=True
    ).toPandas()
    assert fps.afp.nunique() == 1  # codec-invariant fingerprint

    # strict rejects unknown codecs; non-strict never fails
    with pytest.raises(Exception, match="WAV/PCM, FLAC and MP4/PCM"):
        multimodal.audio_features(df, strict=True).collect()
    loose = multimodal.audio_features(df, strict=False).toPandas()
    assert len(loose) == 3
