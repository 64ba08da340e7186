"""From-scratch stdlib FLAC decoder (no audio libs in this env).

Implements the public FLAC format (RFC 9639 / xiph.org spec): the
``fLaC`` metadata walk (STREAMINFO), frame-header parse (coded sample
number, block-size/rate/size codes, CRC-8), all four subframe types
(CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32), Rice-coded
residual partitions (4- and 5-bit parameters, escape partitions),
wasted-bits shifting, and inter-channel decorrelation (left/side,
right/side, mid/side), with the frame CRC-16 verified.

This closes the "compressed audio" slice of the multimodal codec
boundary that IS stdlib-feasible: FLAC is the lossless audio codec a
speech/audio training corpus actually stores alongside WAV, and its
entropy coding (Rice) + linear prediction are implementable exactly
from the public spec.  Perceptual codecs (MP3/AAC/Opus) remain
documented out of scope — they need filterbank/psychoacoustic DSP
libraries, not in this environment.

Decode contract matches ``wav.decode_wav``: ``(sample_rate, samples)``
with ``samples`` an (n_frames, n_channels) float64 array in [-1, 1],
so the multimodal audio operators route FLAC payloads through the same
feature / fingerprint code paths (reference parity: evm-archive stores
opaque payload bytes; the decode boundary is ours — see
multimodal.py's module docstring for the strict-mode contract).
"""

from __future__ import annotations

import struct

import numpy as np
from .codecerrors import guard


class FlacError(ValueError):
    """Malformed or out-of-scope FLAC payload."""


def is_flac(payload: bytes) -> bool:
    return len(payload) >= 4 and payload[:4] == b"fLaC"


# ---------------------------------------------------------------------------
# bit reader (MSB-first, as the FLAC bitstream is defined)
# ---------------------------------------------------------------------------


class _Bits:
    __slots__ = ("buf", "pos")  # pos in BITS

    def __init__(self, buf: bytes, byte_pos: int = 0):
        self.buf = buf
        self.pos = byte_pos * 8

    def at_end(self) -> bool:
        return self.pos >= len(self.buf) * 8

    def byte_pos(self) -> int:
        return self.pos // 8

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def u(self, n: int) -> int:
        """Read n bits as an unsigned int."""
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.buf) * 8:
            raise FlacError("bitstream truncated")
        first, last = self.pos >> 3, (end + 7) >> 3
        chunk = int.from_bytes(self.buf[first:last], "big")
        chunk >>= (last << 3) - end
        self.pos = end
        return chunk & ((1 << n) - 1)

    def s(self, n: int) -> int:
        """Read n bits as a two's-complement signed int."""
        v = self.u(n)
        return v - (1 << n) if v >= 1 << (n - 1) else v

    def unary(self) -> int:
        """Count 0-bits until the terminating 1-bit."""
        buf, pos = self.buf, self.pos
        total_bits = len(buf) * 8
        q = 0
        while True:
            if pos >= total_bits:
                raise FlacError("bitstream truncated in unary code")
            byte = buf[pos >> 3]
            rem = 8 - (pos & 7)
            window = byte & ((1 << rem) - 1)
            if window == 0:
                q += rem
                pos += rem
                continue
            lead = rem - window.bit_length()
            q += lead
            pos += lead + 1
            self.pos = pos
            return q


# ---------------------------------------------------------------------------
# CRCs (frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005)
# ---------------------------------------------------------------------------


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        c = byte << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) if c & top else (c << 1)
        table.append(c & mask)
    return table


_CRC8 = _crc_table(0x07, 8)
_CRC16 = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# metadata
# ---------------------------------------------------------------------------

_BLOCKSIZE_CODE = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
                   **{n: 256 << (n - 8) for n in range(8, 16)}}
_RATE_CODE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
              6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BPS_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _parse_streaminfo(payload: bytes) -> tuple[dict, int]:
    """Walk the metadata blocks; return (streaminfo, first_frame_offset)."""
    if not is_flac(payload):
        raise FlacError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise FlacError("truncated metadata block header")
        last = payload[pos] & 0x80
        btype = payload[pos] & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise FlacError("truncated metadata block")
        if btype == 0:
            if blen < 34:
                raise FlacError("STREAMINFO too short")
            bits = _Bits(body)
            info = {
                "min_blocksize": bits.u(16),
                "max_blocksize": bits.u(16),
                "min_framesize": bits.u(24),
                "max_framesize": bits.u(24),
                "sample_rate": bits.u(20),
                "channels": bits.u(3) + 1,
                "bps": bits.u(5) + 1,
                "total_samples": bits.u(36),
            }
        elif btype == 127:
            raise FlacError("invalid metadata block type 127")
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise FlacError("missing STREAMINFO block")
    if info["sample_rate"] == 0:
        raise FlacError("STREAMINFO sample rate is zero")
    return info, pos


def _coded_number(bits: _Bits) -> int:
    """The frame header's UTF-8-style coded sample/frame number
    (extended to 36 bits / up to 7 bytes)."""
    b0 = bits.u(8)
    if b0 < 0x80:
        return b0
    n_follow = 0
    mask = 0x40
    while b0 & mask:
        n_follow += 1
        mask >>= 1
    if n_follow == 0 or n_follow > 6:
        raise FlacError("bad coded-number lead byte")
    val = b0 & (mask - 1)
    for _ in range(n_follow):
        nb = bits.u(8)
        if nb & 0xC0 != 0x80:
            raise FlacError("bad coded-number continuation byte")
        val = (val << 6) | (nb & 0x3F)
    return val


# ---------------------------------------------------------------------------
# subframes
# ---------------------------------------------------------------------------

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.u(2)
    if method > 1:
        raise FlacError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = bits.u(4)
    if blocksize % (1 << po):
        raise FlacError("partition order does not divide block size")
    out: list[int] = []
    part_len = blocksize >> po
    if part_len < order:
        raise FlacError("first partition shorter than predictor order")
    for p in range(1 << po):
        n = part_len - (order if p == 0 else 0)
        param = bits.u(pbits)
        if param == escape:
            raw_bits = bits.u(5)
            if raw_bits == 0:
                out.extend([0] * n)
            else:
                out.extend(bits.s(raw_bits) for _ in range(n))
        else:
            for _ in range(n):
                q = bits.unary()
                v = (q << param) | bits.u(param)
                out.append((v >> 1) ^ -(v & 1))
    return out


def _subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.u(1):
        raise FlacError("subframe padding bit set")
    stype = bits.u(6)
    wasted = 0
    if bits.u(1):
        wasted = bits.unary() + 1
    ebps = bps - wasted
    if ebps <= 0:
        raise FlacError("wasted bits exceed sample size")

    if stype == 0:  # CONSTANT
        samples = [bits.s(ebps)] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [bits.s(ebps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        if order > blocksize:
            raise FlacError("predictor order exceeds block size")
        samples = [bits.s(ebps) for _ in range(order)]
        res = _residual(bits, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(pred + r)
    elif stype >= 32:  # LPC order 1-32
        order = (stype & 31) + 1
        if order > blocksize:
            raise FlacError("predictor order exceeds block size")
        samples = [bits.s(ebps) for _ in range(order)]
        precision = bits.u(4) + 1
        if precision == 16:
            raise FlacError("invalid LPC precision code 15")
        shift = bits.s(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coefs = [bits.s(precision) for _ in range(order)]
        res = _residual(bits, blocksize, order)
        for r in res:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append((pred >> shift) + r)
    else:
        raise FlacError(f"reserved subframe type {stype}")

    if wasted:
        samples = [s << wasted for s in samples]
    return samples


# ---------------------------------------------------------------------------
# frames
# ---------------------------------------------------------------------------


def _decode_frame(
    bits: _Bits, info: dict
) -> tuple[np.ndarray, int]:
    """Decode one frame; returns (samples[blocksize, channels], rate)."""
    header_start = bits.byte_pos()
    sync = bits.u(14)
    if sync != 0b11111111111110:
        raise FlacError("bad frame sync code")
    if bits.u(1):
        raise FlacError("reserved frame-header bit set")
    bits.u(1)  # blocking strategy (fixed/variable) — number is informational
    bs_code = bits.u(4)
    sr_code = bits.u(4)
    ch_code = bits.u(4)
    bps_code = bits.u(3)
    if bits.u(1):
        raise FlacError("reserved frame-header bit set")
    _coded_number(bits)

    if bs_code == 0:
        raise FlacError("reserved block size code 0")
    elif bs_code == 6:
        blocksize = bits.u(8) + 1
    elif bs_code == 7:
        blocksize = bits.u(16) + 1
    else:
        blocksize = _BLOCKSIZE_CODE[bs_code]

    if sr_code == 0:
        rate = info["sample_rate"]
    elif sr_code in _RATE_CODE:
        rate = _RATE_CODE[sr_code]
    elif sr_code == 12:
        rate = bits.u(8) * 1000
    elif sr_code == 13:
        rate = bits.u(16)
    elif sr_code == 14:
        rate = bits.u(16) * 10
    else:
        raise FlacError("invalid sample rate code 15")

    if bps_code == 0:
        bps = info["bps"]
    elif bps_code in _BPS_CODE:
        bps = _BPS_CODE[bps_code]
    else:
        raise FlacError(f"reserved sample size code {bps_code}")

    header_crc = crc8(bits.buf[header_start : bits.byte_pos()])
    if bits.u(8) != header_crc:
        raise FlacError("frame header CRC-8 mismatch")

    if ch_code <= 7:
        n_ch = ch_code + 1
        chans = [_subframe(bits, blocksize, bps) for _ in range(n_ch)]
    elif ch_code == 8:  # left/side
        left = _subframe(bits, blocksize, bps)
        side = _subframe(bits, blocksize, bps + 1)
        chans = [left, [l - s for l, s in zip(left, side)]]
    elif ch_code == 9:  # right/side
        side = _subframe(bits, blocksize, bps + 1)
        right = _subframe(bits, blocksize, bps)
        chans = [[r + s for r, s in zip(right, side)], right]
    elif ch_code == 10:  # mid/side
        mid = _subframe(bits, blocksize, bps)
        side = _subframe(bits, blocksize, bps + 1)
        left, right = [], []
        for m, s in zip(mid, side):
            m2 = (m << 1) | (s & 1)
            left.append((m2 + s) >> 1)
            right.append((m2 - s) >> 1)
        chans = [left, right]
    else:
        raise FlacError(f"reserved channel assignment {ch_code}")

    bits.align()
    frame_crc = crc16(bits.buf[header_start : bits.byte_pos()])
    if bits.u(16) != frame_crc:
        raise FlacError("frame CRC-16 mismatch")

    scale = float(1 << (bps - 1))
    arr = np.array(chans, dtype=np.float64).T / scale
    return arr, rate


@guard(FlacError)
def decode_flac(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a FLAC payload -> (sample_rate, samples) where ``samples``
    is (n_frames, n_channels) float64 in [-1, 1] — the same contract as
    ``wav.decode_wav`` so the audio operators are codec-invariant."""
    info, frame_off = _parse_streaminfo(payload)
    bits = _Bits(payload, frame_off)
    frames: list[np.ndarray] = []
    rate = info["sample_rate"]
    n_ch = info["channels"]
    while not bits.at_end():
        arr, rate = _decode_frame(bits, info)
        if arr.shape[1] != n_ch:
            raise FlacError(
                f"frame channel count {arr.shape[1]} != STREAMINFO {n_ch}"
            )
        frames.append(arr)
    if not frames:
        samples = np.zeros((0, n_ch), dtype=np.float64)
    else:
        samples = np.concatenate(frames, axis=0)
    total = info["total_samples"]
    if total and samples.shape[0] > total:
        # last frame may be padded by encoders that only emit full blocks
        samples = samples[:total]
    return rate, samples
