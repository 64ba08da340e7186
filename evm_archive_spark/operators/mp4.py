"""MP4 / ISO-BMFF container parsing — from scratch, stdlib only.

ISO/IEC 14496-12 (the public ISO Base Media File Format spec) lays a
file out as a tree of length-prefixed boxes:

    ftyp  [mdat]  moov( mvhd  trak( tkhd  mdia( mdhd  hdlr
        minf( stbl( stsd  stts  stsc  stsz  stco|co64 )))) ... )

The sample tables under ``stbl`` fully describe where each track's
samples live in the file: ``stsd`` names the codec (sample entry
fourcc), ``stsz`` the per-sample sizes, ``stco``/``co64`` the chunk
offsets, and ``stsc`` how samples group into chunks.  Resolving them is
pure arithmetic — no codec library — which makes the two
stdlib-feasible flavors fully decodable here:

- **Motion-JPEG video** (sample entry ``jpeg``/``mjpa``/``mjpb``
  [baseline part]): every video sample is a complete JPEG image,
  decoded by the from-scratch baseline/progressive decoder in
  ``jpeg.py`` — the MP4 mirror of ``avi.py``'s MJPEG walk.
- **PCM audio** (sample entries ``sowt`` little-endian 16-bit, ``twos``
  big-endian 16-bit, ``raw `` unsigned 8-bit, ``lpcm`` v2/QT,
  ``in24``/``in32`` big-endian integers): samples concatenate into the
  raw stream; decoded to the same float64 ``(n, channels)`` layout
  ``wav.decode_wav`` returns, so the audio operators treat an MP4/PCM
  payload exactly like a WAV.

Inter-frame video (H.264/HEVC, sample entries ``avc1``/``hvc1``...) and
perceptual audio (AAC, ``mp4a``) need codec libraries this environment
cannot install: those tracks raise ``Mp4Error`` naming the gap, and the
multimodal operators' ``strict=False`` paths fall back to the
deterministic twin — same honest boundary as ``avi.py``/``flac.py``.

Reference parity note: the reference stores media as opaque bytea and
never decodes (evm-archive stores no media at all); this backs
``multimodal.frame_sample`` / ``audio_features`` for ``video/mp4``
payloads, the most common real container in a multimodal corpus.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np

from .codecerrors import guard, guard_iter


class Mp4Error(Exception):
    """Malformed or out-of-scope MP4 payload."""


def is_mp4(data: bytes) -> bool:
    """``ftyp`` signature sniff (a conforming file leads with it)."""
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _boxes(data: bytes, start: int, end: int):
    """Yield ``(fourcc, body_start, body_end)`` for each box in a
    region; handles 64-bit largesize (size==1) and to-end (size==0)."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack_from(">I", data, i)
        fourcc = data[i + 4 : i + 8]
        body = i + 8
        if size == 1:
            if body + 8 > end:
                raise Mp4Error("truncated largesize box header")
            (size,) = struct.unpack_from(">Q", data, body)
            body += 8
            nxt = i + size
        elif size == 0:
            nxt = end
        else:
            nxt = i + size
        if nxt < body or nxt > end:
            raise Mp4Error(f"box {fourcc!r} overruns its parent")
        yield fourcc, body, nxt
        i = nxt


def _child(data: bytes, start: int, end: int, fourcc: bytes):
    for fc, b, e in _boxes(data, start, end):
        if fc == fourcc:
            return b, e
    return None


@dataclass
class Mp4Track:
    handler: str            # 'vide' / 'soun'
    codec: str              # sample entry fourcc, e.g. 'jpeg', 'sowt'
    timescale: int
    # audio sample-entry fields (0 for video)
    channels: int = 0
    sample_bits: int = 0
    sample_rate: int = 0
    # visual sample-entry fields (0 for audio)
    width: int = 0
    height: int = 0
    # mdhd duration in timescale ticks (0 when absent)
    duration: int = 0
    # resolved sample table: absolute (offset, size) per sample
    samples: list[tuple[int, int]] = field(default_factory=list)


def _parse_stbl(data: bytes, b: int, e: int) -> dict:
    out: dict = {}
    for fc, cb, ce in _boxes(data, b, e):
        if fc == b"stsd":
            cnt = struct.unpack_from(">I", data, cb + 4)[0]
            if cnt < 1:
                raise Mp4Error("empty stsd")
            entry = cb + 8
            (esize,) = struct.unpack_from(">I", data, entry)
            codec = data[entry + 4 : entry + 8]
            out["codec"] = codec.decode("latin-1")
            # AudioSampleEntry v0/v1 layout (14496-12 §12.2.3):
            # 8 reserved+index, 8 reserved, chan(2) bits(2) predef(2)
            # reserved(2) rate(4: 16.16 fixed)
            if entry + 36 <= entry + esize:
                ch, bits = struct.unpack_from(">HH", data, entry + 24)
                rate = struct.unpack_from(">I", data, entry + 32)[0] >> 16
                out["channels"], out["bits"], out["rate"] = ch, bits, rate
                # VisualSampleEntry (§12.1.3): width/height u16 at +32
                # (same bytes reinterpreted — mp4_tracks assigns the
                # audio or video fields per the track handler)
                vw, vh = struct.unpack_from(">HH", data, entry + 32)
                out["vwidth"], out["vheight"] = vw, vh
        elif fc == b"stsz":
            fixed, cnt = struct.unpack_from(">II", data, cb + 4)
            if fixed:
                out["sizes"] = [fixed] * cnt
            else:
                out["sizes"] = list(
                    struct.unpack_from(f">{cnt}I", data, cb + 12)
                )
        elif fc == b"stco":
            (cnt,) = struct.unpack_from(">I", data, cb + 4)
            out["offsets"] = list(
                struct.unpack_from(f">{cnt}I", data, cb + 8)
            )
        elif fc == b"co64":
            (cnt,) = struct.unpack_from(">I", data, cb + 4)
            out["offsets"] = list(
                struct.unpack_from(f">{cnt}Q", data, cb + 8)
            )
        elif fc == b"stsc":
            (cnt,) = struct.unpack_from(">I", data, cb + 4)
            vals = struct.unpack_from(f">{cnt * 3}I", data, cb + 8)
            out["stsc"] = [
                (vals[i * 3], vals[i * 3 + 1], vals[i * 3 + 2])
                for i in range(cnt)
            ]
    return out


def _resolve_samples(stbl: dict) -> list[tuple[int, int]]:
    """stsc x stco x stsz -> absolute (offset, size) per sample, in
    sample order (14496-12 §8.7.4: each stsc entry applies from its
    first_chunk until the next entry's first_chunk)."""
    sizes = stbl.get("sizes")
    offsets = stbl.get("offsets")
    stsc = stbl.get("stsc")
    if not sizes or not offsets or not stsc:
        raise Mp4Error("incomplete sample table (need stsz+stco+stsc)")
    samples: list[tuple[int, int]] = []
    si = 0
    n_chunks = len(offsets)
    for ei, (first, per_chunk, _desc) in enumerate(stsc):
        last = (
            stsc[ei + 1][0] - 1 if ei + 1 < len(stsc) else n_chunks
        )
        for chunk in range(first, last + 1):
            if chunk > n_chunks:
                break
            off = offsets[chunk - 1]
            for _ in range(per_chunk):
                if si >= len(sizes):
                    return samples
                samples.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    return samples


@guard(Mp4Error)
def mp4_tracks(data: bytes) -> list[Mp4Track]:
    """Walk ``moov`` and return every track with its codec, timing and
    fully-resolved sample table — the container-metadata face (the
    multimodal catalog columns: codec, channels, rate, n_samples)."""
    if not is_mp4(data):
        raise Mp4Error("bad signature: no ftyp box")
    moov = _child(data, 0, len(data), b"moov")
    if moov is None:
        raise Mp4Error("no moov box (not a playable MP4)")
    tracks: list[Mp4Track] = []
    for fc, tb, te in _boxes(data, *moov):
        if fc != b"trak":
            continue
        mdia = _child(data, tb, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _child(data, *mdia, b"hdlr")
        mdhd = _child(data, *mdia, b"mdhd")
        minf = _child(data, *mdia, b"minf")
        if hdlr is None or minf is None:
            continue
        handler = data[hdlr[0] + 8 : hdlr[0] + 12].decode("latin-1")
        timescale = 0
        duration = 0
        if mdhd is not None:
            ver = data[mdhd[0]]
            timescale = struct.unpack_from(
                ">I", data, mdhd[0] + (20 if ver == 1 else 12)
            )[0]
            duration = (
                struct.unpack_from(">Q", data, mdhd[0] + 24)[0]
                if ver == 1
                else struct.unpack_from(">I", data, mdhd[0] + 16)[0]
            )
        stbl_span = _child(data, *minf, b"stbl")
        if stbl_span is None:
            continue
        stbl = _parse_stbl(data, *stbl_span)
        tracks.append(
            Mp4Track(
                handler=handler,
                codec=stbl.get("codec", "?"),
                timescale=timescale,
                channels=stbl.get("channels", 0) if handler == "soun" else 0,
                sample_bits=stbl.get("bits", 0) if handler == "soun" else 0,
                sample_rate=stbl.get("rate", 0) if handler == "soun" else 0,
                width=stbl.get("vwidth", 0) if handler == "vide" else 0,
                height=stbl.get("vheight", 0) if handler == "vide" else 0,
                duration=duration,
                samples=_resolve_samples(stbl),
            )
        )
    if not tracks:
        raise Mp4Error("moov contains no parsable trak")
    return tracks


@guard_iter(Mp4Error)
def mp4_frames(data: bytes) -> Iterator[tuple[int, bytes]]:
    """Yield ``(frame_idx, payload)`` for the first video track's
    samples in order — the MP4 mirror of ``avi.avi_frames``.  Raises
    ``Mp4Error`` for inter-frame codecs (no JPEG per-sample payloads)."""
    video = next(
        (t for t in mp4_tracks(data) if t.handler == "vide"), None
    )
    if video is None:
        raise Mp4Error("no video track")
    if video.codec not in ("jpeg", "mjpa", "mjpb"):
        raise Mp4Error(
            f"video codec {video.codec!r} needs real video libraries "
            "(MJPEG-in-MP4 only)"
        )
    for idx, (off, size) in enumerate(video.samples):
        if off + size > len(data):
            raise Mp4Error(f"sample {idx} overruns payload")
        yield idx, data[off : off + size]


@guard_iter(Mp4Error)
def decode_mp4_frames(
    data: bytes,
) -> Iterator[tuple[int, int, int, "object"]]:
    """Yield ``(frame_idx, width, height, rgba)`` with every frame
    REALLY decoded via the stdlib JPEG decoder — mirrors
    ``avi.decode_avi_frames``."""
    from .jpeg import JpegError, decode_jpeg, is_jpeg

    for idx, payload in mp4_frames(data):
        if not is_jpeg(payload):
            raise Mp4Error(
                f"frame {idx} is not JPEG-compressed (MJPEG only)"
            )
        try:
            rgba = decode_jpeg(payload)
        except JpegError as e:
            raise Mp4Error(f"bad MJPEG frame {idx}: {e}") from e
        h, w = rgba.shape[:2]
        yield idx, w, h, rgba


_PCM_CODECS = {"sowt", "twos", "raw ", "in24", "in32", "lpcm"}


def has_pcm_audio(data: bytes) -> bool:
    """True when the payload is an MP4 whose first audio track is
    uncompressed PCM this module can decode."""
    if not is_mp4(data):
        return False
    try:
        t = next(
            (t for t in mp4_tracks(data) if t.handler == "soun"), None
        )
    except Mp4Error:
        return False
    return t is not None and t.codec in _PCM_CODECS


@guard(Mp4Error)
def decode_mp4_audio(data: bytes) -> tuple[int, np.ndarray]:
    """Decode the first audio track's PCM samples to
    ``(sample_rate, float64 (n_frames, n_channels) in [-1, 1])`` — the
    exact ``wav.decode_wav`` contract, so every audio operator treats
    MP4/PCM like WAV."""
    audio = next(
        (t for t in mp4_tracks(data) if t.handler == "soun"), None
    )
    if audio is None:
        raise Mp4Error("no audio track")
    if audio.codec not in _PCM_CODECS:
        raise Mp4Error(
            f"audio codec {audio.codec!r} needs real audio libraries "
            "(PCM-in-MP4 only; AAC/Opus are out of scope)"
        )
    raw = bytearray()
    for off, size in audio.samples:
        if off + size > len(data):
            raise Mp4Error("audio sample overruns payload")
        raw += data[off : off + size]
    ch = max(1, audio.channels)
    if audio.codec == "sowt":
        s = np.frombuffer(bytes(raw), dtype="<i2").astype(np.float64)
        s /= 32768.0
    elif audio.codec in ("twos", "lpcm"):
        bits = audio.sample_bits or 16
        if bits != 16:
            raise Mp4Error(f"unsupported lpcm bit depth {bits}")
        s = np.frombuffer(bytes(raw), dtype=">i2").astype(np.float64)
        s /= 32768.0
    elif audio.codec == "raw ":
        s = np.frombuffer(bytes(raw), dtype=np.uint8).astype(np.float64)
        s = (s - 128.0) / 128.0
    else:  # in24 / in32, big-endian signed
        width = 3 if audio.codec == "in24" else 4
        usable = len(raw) - len(raw) % width
        b = np.frombuffer(bytes(raw[:usable]), dtype=np.uint8)
        b = b.reshape(-1, width)
        acc = np.zeros(len(b), dtype=np.int64)
        for i in range(width):
            acc = (acc << 8) | b[:, i]
        sign = 1 << (8 * width - 1)
        acc = np.where(acc >= sign, acc - (sign << 1), acc)
        s = acc.astype(np.float64) / float(sign)
    usable = len(s) - len(s) % ch
    rate = audio.sample_rate or audio.timescale
    if rate <= 0:
        raise Mp4Error("no sample rate in sample entry or mdhd")
    return rate, s[:usable].reshape(-1, ch)
