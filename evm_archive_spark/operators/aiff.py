"""From-scratch stdlib AIFF / AIFF-C decoder (public format: Apple's
Audio Interchange File Format 1.3 spec, an EA-IFF-85 container).

AIFF is the second classic PCM container after RIFF/WAVE (Mac-origin
audio corpora, samplers, podcast masters).  The walk: ``FORM`` header
with an ``AIFF`` or ``AIFC`` form type, ``COMM`` chunk (channels,
frame count, sample size, sample rate as an 80-bit IEEE 754 extended
float — parsed directly), ``SSND`` chunk (offset/blockSize header +
interleaved frames).  Chunks are big-endian and word-aligned (odd
sizes pad one byte).

Scope: signed 8/16/24/32-bit big-endian PCM (AIFF's 8-bit is SIGNED,
unlike WAV's unsigned), and the common AIFF-C compression types —
``NONE`` (BE PCM), ``sowt`` (little-endian 16-bit, the Mac OS X
default), ``fl32``/``FL32`` (IEEE float32), ``ulaw``/``ALAW`` G.711
companding (the wav.py tables).  Perceptual AIFC types (ima4, MACE,
AAC) raise ``AiffError`` — the documented strict-mode boundary.

``encode_aiff`` is the independent fixture writer; pytest also
cross-pins both directions against the stdlib ``aifc`` module (this
Python still ships it).

Reference parity note: the reference (SummaryDev/evm-archive) stores
media as opaque bytea; this extends the strict audio lane
(multimodal._audio_decoder) to AIFF corpora.  Placement: per-payload
stdlib+numpy work inside Arrow batches (the codec boundary).
"""

from __future__ import annotations

import struct

import numpy as np

from .codecerrors import guard
from .wav import WavError

MAX_AIFF_FRAMES = 1 << 28


class AiffError(WavError):
    """Malformed or out-of-scope AIFF payload.  Subclasses WavError
    so every audio-lane catch tuple (WavError, FlacError, Mp4Error)
    covers AIFF payloads without edits at ten call sites."""


def is_aiff(b: bytes) -> bool:
    return (len(b) >= 12 and b[:4] == b"FORM"
            and b[8:12] in (b"AIFF", b"AIFC"))


def _f80(b: bytes) -> float:
    """80-bit IEEE 754 extended float (the COMM sample rate)."""
    if len(b) != 10:
        raise AiffError("bad 80-bit float size")
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise AiffError("non-finite AIFF sample rate")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _chunks(b: bytes):
    (form_size,) = struct.unpack_from(">I", b, 4)
    end = min(8 + form_size, len(b))
    pos = 12
    while pos + 8 <= end:
        cid = b[pos:pos + 4]
        (size,) = struct.unpack_from(">I", b, pos + 4)
        body = b[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise AiffError(f"chunk {cid!r} overruns payload")
        yield cid, body
        pos += 8 + size + (size & 1)            # word alignment


@guard(AiffError)
def decode_aiff(b: bytes) -> tuple[int, np.ndarray]:
    """``(sample_rate, (n_frames, n_channels) float64 in [-1, 1])`` —
    the decode_wav contract."""
    if not is_aiff(b):
        raise AiffError("not an AIFF payload")
    is_aifc = b[8:12] == b"AIFC"
    comm = ssnd = None
    for cid, body in _chunks(b):
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
    if comm is None or len(comm) < 18:
        raise AiffError("AIFF missing/short COMM chunk")
    n_ch, n_frames, bits = struct.unpack_from(">HIH", comm, 0)
    rate = _f80(comm[8:18])
    ctype = comm[18:22] if is_aifc and len(comm) >= 22 else b"NONE"
    if n_ch < 1 or n_ch > 64 or n_frames > MAX_AIFF_FRAMES:
        raise AiffError("AIFF channel/frame counts out of range")
    if rate <= 0 or rate > 1e7:
        raise AiffError("AIFF sample rate out of range")
    if n_frames == 0:
        return int(round(rate)), np.zeros((0, n_ch), dtype=np.float64)
    if ssnd is None or len(ssnd) < 8:
        raise AiffError("AIFF missing/short SSND chunk")
    (offset, _blk) = struct.unpack_from(">II", ssnd, 0)
    data = ssnd[8 + offset:]

    if ctype in (b"NONE", b"sowt"):
        if bits not in (8, 16, 24, 32):
            raise AiffError(f"AIFF {bits}-bit PCM out of scope")
        bo = "<" if ctype == b"sowt" else ">"
        if ctype == b"sowt" and bits != 16:
            raise AiffError("sowt AIFC must be 16-bit")
        bpf = (bits // 8) * n_ch
        need = bpf * n_frames
        if len(data) < need:
            raise AiffError("AIFF sample data short of frame count")
        raw = data[:need]
        if bits == 8:
            vals = np.frombuffer(raw, dtype=np.int8).astype(np.float64)
            scale = 128.0
        elif bits == 24:
            u = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            if bo == ">":
                v = ((u[:, 0].astype(np.int64) << 16)
                     | (u[:, 1].astype(np.int64) << 8)
                     | u[:, 2])
            else:
                v = ((u[:, 2].astype(np.int64) << 16)
                     | (u[:, 1].astype(np.int64) << 8)
                     | u[:, 0])
            vals = np.where(v >= 1 << 23, v - (1 << 24), v).astype(
                np.float64)
            scale = float(1 << 23)
        else:
            dt = np.dtype(f"{bo}i{bits // 8}")
            vals = np.frombuffer(raw, dtype=dt).astype(np.float64)
            scale = float(1 << (bits - 1))
        out = vals.reshape(n_frames, n_ch) / scale
    elif ctype in (b"fl32", b"FL32"):
        need = 4 * n_ch * n_frames
        if len(data) < need:
            raise AiffError("AIFF sample data short of frame count")
        out = np.frombuffer(data[:need], dtype=">f4").astype(
            np.float64).reshape(n_frames, n_ch)
    elif ctype in (b"fl64", b"FL64"):
        need = 8 * n_ch * n_frames
        if len(data) < need:
            raise AiffError("AIFF sample data short of frame count")
        out = np.frombuffer(data[:need], dtype=">f8").astype(
            np.float64).reshape(n_frames, n_ch)
    elif ctype.lower() in (b"ulaw", b"alaw"):
        from .wav import _ALAW, _MULAW

        table = _MULAW if ctype.lower() == b"ulaw" else _ALAW
        need = n_ch * n_frames
        if len(data) < need:
            raise AiffError("AIFF sample data short of frame count")
        codes = np.frombuffer(data[:need], dtype=np.uint8)
        out = (table[codes].astype(np.float64) / 32768.0).reshape(
            n_frames, n_ch)
    else:
        raise AiffError(
            f"AIFC compression {ctype!r} out of scope "
            "(NONE/sowt/fl32/fl64/ulaw/alaw only)")
    return int(round(rate)), out


# -- synthesis writer ----------------------------------------------------------


def _to_f80(rate: float) -> bytes:
    if rate <= 0:
        raise AiffError("encoder wants a positive rate")
    exp = 16383 + 63
    mant = float(rate)
    while mant >= 1 << 64:
        mant /= 2.0
        exp += 1
    while mant < 1 << 63:
        mant *= 2.0
        exp -= 1
    return struct.pack(">HQ", exp, int(round(mant)))


def encode_aiff(rate: int, samples: np.ndarray, bits: int = 16,
                ctype: bytes = b"NONE") -> bytes:
    """Write an AIFF (ctype NONE at 8/16/24/32-bit) or AIFF-C (sowt /
    fl32) file from float64 samples in [-1, 1].  Independent of the
    reader's chunk walk."""
    samples = np.asarray(samples, dtype=np.float64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n_frames, n_ch = samples.shape
    is_aifc = ctype != b"NONE"
    if ctype == b"NONE":
        scale = (1 << (bits - 1)) - 1
        v = np.clip(np.round(samples * scale), -(1 << (bits - 1)),
                    (1 << (bits - 1)) - 1).astype(np.int64)
        if bits == 8:
            data = v.astype(np.int8).tobytes()
        elif bits == 24:
            u = (v & 0xFFFFFF).astype(np.uint32).flatten()
            data = np.stack([(u >> 16) & 0xFF, (u >> 8) & 0xFF,
                             u & 0xFF], axis=1).astype(
                np.uint8).tobytes()
        else:
            data = v.astype(np.dtype(f">i{bits // 8}")).tobytes()
    elif ctype == b"sowt":
        bits = 16
        v = np.clip(np.round(samples * 32767), -32768, 32767)
        data = v.astype("<i2").tobytes()
    elif ctype == b"fl32":
        bits = 32
        data = samples.astype(">f4").tobytes()
    elif ctype == b"fl64":
        bits = 64
        data = samples.astype(">f8").tobytes()
    else:
        raise AiffError(f"encoder ctype {ctype!r}")
    comm = struct.pack(">HIH", n_ch, n_frames, bits) + _to_f80(rate)
    if is_aifc:
        comm += ctype + b"\x00\x00"             # empty pascal name
    ssnd = struct.pack(">II", 0, 0) + data
    body = b""
    if is_aifc:
        body += b"FVER" + struct.pack(">II", 4, 0xA2805140)
    for cid, chunk in ((b"COMM", comm), (b"SSND", ssnd)):
        body += cid + struct.pack(">I", len(chunk)) + chunk
        if len(chunk) & 1:
            body += b"\x00"
    form = (b"AIFC" if is_aifc else b"AIFF") + body
    return b"FORM" + struct.pack(">I", len(form)) + form
