"""MP4 / ISO-BMFF container tests.  The muxer below builds files
box-by-box straight from ISO/IEC 14496-12 (independent of mp4.py's
parser), embedding JPEG frames from test_jpeg's independent encoder and
raw PCM — so the walk, the sample-table resolution, and the decode
dispatch are all checked against fixtures the parser never saw."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from evm_archive_spark.operators.jpeg import decode_jpeg
from evm_archive_spark.operators.mp4 import (
    Mp4Error,
    decode_mp4_audio,
    decode_mp4_frames,
    has_pcm_audio,
    is_mp4,
    mp4_frames,
    mp4_tracks,
)
from test_jpeg import encode_jpeg


# --------------------------------------------------------------------------
# independent muxer
# --------------------------------------------------------------------------

def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, payload: bytes, version: int = 0) -> bytes:
    return _box(fourcc, bytes([version, 0, 0, 0]) + payload)


def _stbl(entry: bytes, sizes, chunk_offs, samples_per_chunk) -> bytes:
    stsd = _full(b"stsd", struct.pack(">I", 1) + entry)
    stts = _full(b"stts", struct.pack(">III", 1, len(sizes), 1))
    stsc = _full(
        b"stsc", struct.pack(">IIII", 1, 1, samples_per_chunk, 1)
    )
    stsz = _full(
        b"stsz",
        struct.pack(f">II{len(sizes)}I", 0, len(sizes), *sizes),
    )
    stco = _full(
        b"stco",
        struct.pack(f">I{len(chunk_offs)}I", len(chunk_offs), *chunk_offs),
    )
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def _trak(handler: bytes, timescale: int, stbl: bytes) -> bytes:
    tkhd = _full(
        b"tkhd", struct.pack(">II", 0, 0) + struct.pack(">I", 1) + bytes(68)
    )
    mdhd = _full(
        b"mdhd",
        struct.pack(">IIII", 0, 0, timescale, 0)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", struct.pack(">I", 0) + handler + bytes(12) + b"x\x00"
    )
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    return _box(b"trak", tkhd + mdia)


def _video_entry(fourcc: bytes, w: int, h: int) -> bytes:
    body = (
        bytes(6) + struct.pack(">H", 1)            # reserved + dri
        + bytes(16)                                # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x480000, 0x480000)   # 72 dpi
        + bytes(4) + struct.pack(">H", 1)          # reserved + frame_count
        + bytes(32)                                # compressorname
        + struct.pack(">Hh", 24, -1)               # depth + pre_defined
    )
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _audio_entry(fourcc: bytes, channels: int, bits: int, rate: int) -> bytes:
    body = (
        bytes(6) + struct.pack(">H", 1)            # reserved + dri
        + bytes(8)                                 # reserved
        + struct.pack(">HHHH", channels, bits, 0, 0)
        + struct.pack(">I", rate << 16)            # 16.16 fixed
    )
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def mux_mp4(
    video_frames=None,
    audio=None,                 # (codec4cc, channels, bits, rate, raw bytes)
    video_codec=b"jpeg",
    samples_per_chunk=2,
) -> bytes:
    """ftyp + mdat + moov (offsets into mdat known before moov is laid
    out).  Video chunks hold ``samples_per_chunk`` samples; audio is one
    sample per chunk — covering both stsc resolution shapes."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat_payload = b""
    video_meta = audio_meta = None
    base = len(ftyp) + 8  # absolute offset of mdat body
    if video_frames:
        sizes, offs = [], []
        for i, f in enumerate(video_frames):
            if i % samples_per_chunk == 0:
                offs.append(base + len(mdat_payload))
            sizes.append(len(f))
            mdat_payload += f
        video_meta = (sizes, offs)
    if audio:
        codec, ch, bits, rate, raw = audio
        frame_bytes = max(1, ch * (bits // 8))
        n = len(raw) // frame_bytes
        # one chunk holding all audio frames as equal-size samples
        audio_meta = (
            [frame_bytes] * n,
            [base + len(mdat_payload) + i * frame_bytes for i in range(n)],
        )
        mdat_payload += raw
    mdat = _box(b"mdat", mdat_payload)
    traks = b""
    if video_meta:
        w0, h0 = 16, 16
        traks += _trak(
            b"vide", 30,
            _stbl(
                _video_entry(video_codec, w0, h0),
                video_meta[0], video_meta[1], samples_per_chunk,
            ),
        )
    if audio_meta:
        codec, ch, bits, rate, _ = audio
        traks += _trak(
            b"soun", rate,
            _stbl(
                _audio_entry(codec, ch, bits, rate),
                audio_meta[0], audio_meta[1], 1,
            ),
        )
    mvhd = _full(b"mvhd", struct.pack(">IIII", 0, 0, 1000, 0) + bytes(80))
    moov = _box(b"moov", mvhd + traks)
    return ftyp + mdat + moov


def _frames(n=5, size=16):
    rng = np.random.default_rng(11)
    out = []
    for _ in range(n):
        img = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        out.append(encode_jpeg(img))
    return out


# --------------------------------------------------------------------------
# parser tests
# --------------------------------------------------------------------------

def test_track_metadata_parses():
    pcm = (np.arange(64, dtype=np.int16) * 300).tobytes()
    data = mux_mp4(
        video_frames=_frames(3),
        audio=(b"sowt", 1, 16, 8000, pcm),
    )
    assert is_mp4(data)
    tracks = mp4_tracks(data)
    assert [t.handler for t in tracks] == ["vide", "soun"]
    v, a = tracks
    assert v.codec == "jpeg" and len(v.samples) == 3
    assert a.codec == "sowt" and a.channels == 1
    assert a.sample_bits == 16 and a.sample_rate == 8000
    assert len(a.samples) == 64


def test_video_frames_roundtrip_through_stbl():
    frames = _frames(5)
    data = mux_mp4(video_frames=frames, samples_per_chunk=2)
    got = list(mp4_frames(data))
    assert [i for i, _ in got] == [0, 1, 2, 3, 4]
    assert [p for _, p in got] == frames  # byte-exact via stsc/stco/stsz
    for (idx, w, h, rgba), f in zip(decode_mp4_frames(data), frames):
        assert (w, h) == (16, 16)
        assert np.array_equal(rgba, decode_jpeg(f))


@pytest.mark.parametrize("codec", [b"sowt", b"twos", b"raw "])
def test_pcm_audio_decodes_like_wav(codec):
    rng = np.random.default_rng(3)
    pcm16 = (rng.random(200) * 60000 - 30000).astype(np.int16)
    if codec == b"sowt":
        raw, want = pcm16.astype("<i2").tobytes(), pcm16 / 32768.0
        bits = 16
    elif codec == b"twos":
        raw, want = pcm16.astype(">i2").tobytes(), pcm16 / 32768.0
        bits = 16
    else:
        u8 = rng.integers(0, 256, 200, dtype=np.uint8)
        raw, want = u8.tobytes(), (u8.astype(np.float64) - 128) / 128.0
        bits = 8
    data = mux_mp4(audio=(codec, 1, bits, 16000, raw))
    assert has_pcm_audio(data)
    rate, samples = decode_mp4_audio(data)
    assert rate == 16000 and samples.shape == (len(want), 1)
    assert np.allclose(samples[:, 0], want)


def test_stereo_interleave_preserved():
    left = np.arange(50, dtype=np.int16) * 100
    right = -left
    inter = np.empty(100, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    data = mux_mp4(audio=(b"sowt", 2, 16, 44100, inter.tobytes()))
    rate, samples = decode_mp4_audio(data)
    assert rate == 44100 and samples.shape == (50, 2)
    assert np.allclose(samples[:, 0] * 32768.0, left)
    assert np.allclose(samples[:, 1] * 32768.0, right)


def test_out_of_scope_codecs_raise_named_gap():
    data = mux_mp4(video_frames=_frames(2), video_codec=b"avc1")
    with pytest.raises(Mp4Error, match="avc1"):
        list(mp4_frames(data))
    aac = mux_mp4(audio=(b"mp4a", 2, 16, 44100, b"\x00" * 64))
    assert not has_pcm_audio(aac)
    with pytest.raises(Mp4Error, match="mp4a"):
        decode_mp4_audio(aac)


def test_truncation_fuzz_raises_only_mp4_error():
    data = mux_mp4(
        video_frames=_frames(2),
        audio=(b"sowt", 1, 16, 8000, bytes(64)),
    )
    for cut in range(0, len(data), 7):
        for fn in (mp4_tracks, lambda d: list(mp4_frames(d))):
            try:
                fn(data[:cut])
            except Mp4Error:
                pass


def test_largesize_and_to_end_boxes():
    frames = _frames(1)
    data = mux_mp4(video_frames=frames)
    # rewrite moov's 32-bit size as a 64-bit largesize box
    i = data.index(b"moov") - 4
    (size,) = struct.unpack_from(">I", data, i)
    body = data[i + 8 : i + size]
    large = (
        struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(body))
        + body
    )
    patched = data[:i] + large
    assert [p for _, p in mp4_frames(patched)] == frames


# --------------------------------------------------------------------------
# Spark integration (pooled into test_operators' heavy pool)
# --------------------------------------------------------------------------

def _media_df(spark, payloads):
    return spark.createDataFrame(
        [(i, bytearray(p), ("video/mp4", 0, 0)) for i, p in enumerate(payloads)],
        "media_id long, payload binary, "
        "meta struct<mime:string,a:int,b:int>",
    )


def _pooled_mp4_through_spark_strict_paths(spark):
    """A real muxed MP4 through the strict Spark operators: frame_sample
    yields the true per-frame pixel hashes (same dispatch as AVI), and
    audio_features over the PCM track equals the same samples via the
    WAV path — container-independent feature parity."""
    from evm_archive_spark.operators import multimodal

    frames = _frames(7)
    pcm = (np.arange(400, dtype=np.int16) * 80).astype("<i2")
    mp4_payload = mux_mp4(
        video_frames=frames, audio=(b"sowt", 1, 16, 8000, pcm.tobytes())
    )

    rows = (
        multimodal.frame_sample(
            _media_df(spark, [mp4_payload]), every_n=3, strict=True
        )
        .orderBy("frame_idx")
        .collect()
    )
    assert [r["frame_idx"] for r in rows] == [0, 3, 6]
    import hashlib

    for r in rows:
        rgba = decode_jpeg(frames[r["frame_idx"]])
        h, w = rgba.shape[:2]
        want = hashlib.sha256(
            w.to_bytes(4, "big") + h.to_bytes(4, "big") + rgba.tobytes()
        ).hexdigest()[:16]
        assert r["frame_hash"] == want

    # byte-identical int16 PCM in a RIFF wrapper (encode_wav re-quantizes
    # floats by 32767, which would drift the comparison by 1 LSB)
    raw = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    wav_payload = b"RIFF" + struct.pack("<I", len(body)) + body
    feats = {
        r["media_id"]: r
        for r in multimodal.audio_features(
            _media_df(spark, [mp4_payload, wav_payload]), strict=True
        ).collect()
    }
    mp4_row, wav_row = feats[0], feats[1]
    for c in ("sample_rate", "n_channels", "duration_ms", "rms_ppm", "zcr_ppm"):
        assert mp4_row[c] == wav_row[c], c
