"""MKV/Matroska EBML header walk: independent-writer fixtures,
unknown-size segments, WebM doctype, audio tracks, truncation fuzz, and
the Spark videometa routing."""

from __future__ import annotations

import struct

import pytest

from evm_archive_spark.operators.mkv import (
    MkvError,
    build_mkv,
    is_mkv,
    mkv_info,
    mkv_video_meta,
)

# -- independent element-level writer ----------------------------------------
# Deliberately different encoding choices from build_mkv: sizes are
# written as FIXED 8-byte vints (legal per RFC 8794 — vints need not be
# minimal), so a parser that only handles the writer's shortest-form
# sizes would fail here.


def _size8(n: int) -> bytes:
    return ((1 << 56) | n).to_bytes(8, "big")


def _iel(eid: int, payload: bytes) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big") + _size8(
        len(payload)
    ) + payload


def _iuint(eid: int, v: int, width: int = 4) -> bytes:
    return _iel(eid, v.to_bytes(width, "big"))


def _header(doctype: bytes = b"matroska") -> bytes:
    return _iel(0x1A45DFA3, _iel(0x4282, doctype))


def _video_entry(w: int, h: int, dd_ns: int | None = None) -> bytes:
    body = (
        _iuint(0x83, 1, 1)
        + _iel(0x86, b"V_VP9")
        + _iel(0xE0, _iuint(0xB0, w) + _iuint(0xBA, h))
    )
    if dd_ns is not None:
        body += _iuint(0x23E383, dd_ns)
    return _iel(0xAE, body)


def _audio_entry(rate: float, ch: int) -> bytes:
    return _iel(
        0xAE,
        _iuint(0x83, 2, 1)
        + _iel(0x86, b"A_OPUS")
        + _iel(0xE1, _iel(0xB5, struct.pack(">f", rate)) + _iuint(0x9F, ch, 1)),
    )


def _segment(info: bytes, tracks: bytes, unknown_size: bool = False) -> bytes:
    body = info + tracks
    if unknown_size:
        # size vint all-ones = unknown (streamed segment): body to EOF
        return (0x18538067).to_bytes(4, "big") + b"\xff" + body
    return _iel(0x18538067, body)


def _info(scale: int, dur_ticks: float) -> bytes:
    return _iel(
        0x1549A966,
        _iuint(0x2AD7B1, scale) + _iel(0x4489, struct.pack(">d", dur_ticks)),
    )


def test_independent_writer_roundtrip():
    mkv = _header() + _segment(
        _info(1_000_000, 3000.0),
        _iel(0x1654AE6B, _video_entry(1280, 720, 40_000_000)
             + _audio_entry(48000.0, 2)),
    )
    assert is_mkv(mkv)
    info = mkv_info(mkv)
    assert info["doctype"] == "matroska"
    assert info["timestamp_scale"] == 1_000_000
    assert info["duration_ticks"] == 3000.0
    v = [t for t in info["tracks"] if t["type"] == 1][0]
    a = [t for t in info["tracks"] if t["type"] == 2][0]
    assert (v["width"], v["height"], v["codec_id"]) == (1280, 720, "V_VP9")
    assert (a["sample_rate"], a["channels"], a["codec_id"]) == (
        48000, 2, "A_OPUS",
    )
    m = mkv_video_meta(mkv)
    assert m["format"] == "matroska-V_VP9"
    assert (m["width"], m["height"]) == (1280, 720)
    assert m["duration_ms"] == 3000
    assert m["n_frames"] == 75 and m["fps_millihz"] == 25000


def test_unknown_size_segment_and_webm():
    mkv = _header(b"webm") + _segment(
        _info(1_000_000, 500.0),
        _iel(0x1654AE6B, _video_entry(320, 240)),
        unknown_size=True,
    )
    m = mkv_video_meta(mkv)
    assert m["format"] == "webm-V_VP9"
    assert (m["width"], m["height"], m["duration_ms"]) == (320, 240, 500)
    assert m["n_frames"] == 0 and m["fps_millihz"] == 0  # no DefaultDuration


def test_nondefault_timestamp_scale():
    # 100 us ticks: duration 40000 ticks = 4000 ms
    mkv = _header() + _segment(
        _info(100_000, 40000.0),
        _iel(0x1654AE6B, _video_entry(64, 48, 20_000_000)),
    )
    m = mkv_video_meta(mkv)
    assert m["duration_ms"] == 4000
    assert m["n_frames"] == 200 and m["fps_millihz"] == 50000


def test_build_mkv_roundtrips_exact_fields():
    b = build_mkv(width=1920, height=1080, duration_ms=12345, frame_ms=25)
    m = mkv_video_meta(b)
    assert m == {
        "format": "matroska-V_UNCOMPRESSED",
        "width": 1920,
        "height": 1080,
        "n_frames": 12345 // 25,
        "fps_millihz": 1_000_000 // 25 * 1000 // 1000,
        "duration_ms": 12345,
    } | {"fps_millihz": 1_000_000_000_000 // (25 * 1_000_000)}


def test_errors_and_fuzz():
    with pytest.raises(MkvError):
        mkv_video_meta(b"not mkv at all")
    # audio-only container has no video track
    audio_only = _header() + _segment(
        _info(1_000_000, 100.0),
        _iel(0x1654AE6B, _audio_entry(16000.0, 1)),
    )
    with pytest.raises(MkvError, match="no video track"):
        mkv_video_meta(audio_only)
    # wrong doctype
    bad = _header(b"ebmlish") + _segment(
        _info(1_000_000, 1.0), _iel(0x1654AE6B, _video_entry(2, 2))
    )
    with pytest.raises(MkvError, match="doctype"):
        mkv_video_meta(bad)
    # truncation fuzz: every prefix either parses or raises MkvError
    good = build_mkv(width=640, height=360, duration_ms=2000, frame_ms=40)
    for cut in range(len(good)):
        try:
            mkv_video_meta(good[:cut])
        except MkvError:
            pass


def test_audiometa_routes_mkv_audio_track():
    from evm_archive_spark.operators.audiometa import (
        AudioMetaError,
        audio_metadata_of,
    )

    mkv = _header(b"webm") + _segment(
        _info(1_000_000, 2500.0),
        _iel(0x1654AE6B, _audio_entry(48000.0, 2)),
    )
    m = audio_metadata_of(mkv)
    assert m["format"] == "webm-A_OPUS"
    assert (m["sample_rate"], m["n_channels"]) == (48000, 2)
    assert m["duration_ms"] == 2500
    # video-only container: named error, not a silent zero profile
    video_only = _header() + _segment(
        _info(1_000_000, 100.0),
        _iel(0x1654AE6B, _video_entry(64, 48)),
    )
    with pytest.raises(AudioMetaError, match="no audio track"):
        audio_metadata_of(video_only)


def test_spark_videometa_routes_mkv(spark):
    import pandas as pd

    payloads = [
        bytearray(build_mkv(width=640, height=360, duration_ms=2000,
                            frame_ms=40)),
        bytearray(b"opaque not a video"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [0, 1], "payload": payloads})
    )
    from evm_archive_spark.operators.videometa import video_metadata

    rows = {
        r["media_id"]: r
        for r in video_metadata(df, strict=False).collect()
    }
    assert rows[0]["format"] == "matroska-V_UNCOMPRESSED"
    assert (rows[0]["width"], rows[0]["height"]) == (640, 360)
    assert rows[0]["n_frames"] == 50 and rows[0]["duration_ms"] == 2000
    assert rows[1]["format"] == "fake"
    with pytest.raises(Exception, match="not a video"):
        video_metadata(df, strict=True).collect()


# -- cluster / block walk (sample decode) -------------------------------------

def _simple_block(track: int, payload: bytes, flags: int = 0x80) -> bytes:
    return _iel(0xA3, bytes([0x80 | track]) + struct.pack(">h", 0)
                + bytes([flags]) + payload)


def _cluster(*blocks: bytes) -> bytes:
    return _iel(0x1F43B675, _iuint(0xE7, 0) + b"".join(blocks))


def test_mjpeg_frames_and_decode_via_independent_writer():
    import numpy as np
    from test_jpeg import encode_jpeg

    from evm_archive_spark.operators.jpeg import decode_jpeg
    from evm_archive_spark.operators.mkv import decode_mkv_frames, mkv_frames

    rgb0 = np.zeros((16, 16, 3), dtype=np.uint8)
    rgb0[:, :8] = (255, 0, 0)
    rgb1 = np.zeros((16, 16, 3), dtype=np.uint8)
    rgb1[:8, :] = (0, 255, 0)
    j0, j1 = encode_jpeg(rgb0), encode_jpeg(rgb1)
    entry = _iel(
        0xAE,
        _iuint(0xD7, 1, 1) + _iuint(0x83, 1, 1) + _iel(0x86, b"V_MJPEG")
        + _iel(0xE0, _iuint(0xB0, 16) + _iuint(0xBA, 16)),
    )
    seg = _iel(
        0x18538067,
        _info(1_000_000, 80.0) + _iel(0x1654AE6B, entry)
        + _cluster(_simple_block(1, j0), _simple_block(1, j1)),
    )
    b = _header() + seg
    frames = list(mkv_frames(b))
    assert [f[0] for f in frames] == [0, 1]
    assert frames[0][1] == j0 and frames[1][1] == j1
    decoded = list(decode_mkv_frames(b))
    assert len(decoded) == 2
    fi, w, h, rgba = decoded[0]
    assert (w, h) == (16, 16)
    assert (rgba == decode_jpeg(j0)).all()
    # a VP9 track is a typed strict boundary, not a crash
    with pytest.raises(MkvError, match="V_MJPEG only"):
        list(mkv_frames(_header() + _iel(
            0x18538067,
            _info(1_000_000, 80.0)
            + _iel(0x1654AE6B, _video_entry(32, 32)),
        )))


def test_block_lacing_variants_and_blockgroup():
    from evm_archive_spark.operators.mkv import mkv_frames

    entry = _iel(
        0xAE,
        _iuint(0xD7, 1, 1) + _iuint(0x83, 1, 1) + _iel(0x86, b"V_MJPEG")
        + _iel(0xE0, _iuint(0xB0, 4) + _iuint(0xBA, 4)),
    )
    f0, f1, f2 = b"A" * 7, b"B" * 300, b"C" * 5

    # Xiph lacing: sizes 7, 300 (255+45), last implied
    xiph = bytes([0x80 | 1]) + struct.pack(">h", 0) + bytes([0x02])
    xiph += bytes([2]) + bytes([7]) + bytes([255, 45]) + f0 + f1 + f2
    # EBML lacing: first size vint(7), delta vint(+293 signed), last implied
    delta = 293 + ((1 << 13) - 1)           # 2-byte signed vint bias
    ebml = bytes([0x80 | 1]) + struct.pack(">h", 0) + bytes([0x06])
    ebml += bytes([2]) + bytes([0x87]) + ((1 << 14) | delta).to_bytes(2, "big")
    ebml += f0 + f1 + f2
    # fixed lacing: 3 equal frames
    fixed = bytes([0x80 | 1]) + struct.pack(">h", 0) + bytes([0x04])
    fixed += bytes([2]) + b"X" * 6 + b"Y" * 6 + b"Z" * 6

    seg = _iel(
        0x18538067,
        _info(1_000_000, 80.0) + _iel(0x1654AE6B, entry)
        + _cluster(
            _iel(0xA3, xiph),
            _iel(0xA0, _iel(0xA1, ebml)),   # BlockGroup > Block
            _iel(0xA3, fixed),
        ),
    )
    frames = [p for _i, p in mkv_frames(_header() + seg)]
    assert frames == [f0, f1, f2, f0, f1, f2, b"X" * 6, b"Y" * 6, b"Z" * 6]


def test_pcm_audio_roundtrips_all_codecs():
    import numpy as np

    from evm_archive_spark.operators.mkv import (
        build_mkv_audio,
        decode_mkv_audio,
        mkv_has_pcm_audio,
    )

    n = 400
    vals = np.array(
        [((i * 13) % 2048) - 1024 for i in range(n)], dtype=np.int16
    )
    b = build_mkv_audio(8000, 1, vals.tobytes())
    assert mkv_has_pcm_audio(b) and is_mkv(b)
    rate, s = decode_mkv_audio(b)
    assert rate == 8000 and s.shape == (n, 1)
    assert (np.round(s[:, 0] * 32768).astype(np.int16) == vals).all()

    st = np.stack([vals, -vals], axis=1).astype(np.int16)
    rate, s = decode_mkv_audio(
        build_mkv_audio(44100, 2, st.tobytes(), block_samples=64)
    )
    assert s.shape == (n, 2)
    assert (np.round(s * 32768).astype(np.int16) == st).all()

    f32 = (vals.astype(np.float64) / 2048.0).astype("<f4")
    rate, s = decode_mkv_audio(
        build_mkv_audio(
            16000, 1, f32.tobytes(), codec_id="A_PCM/FLOAT/IEEE",
            bit_depth=32,
        )
    )
    assert np.allclose(s[:, 0], f32.astype(np.float64))

    be = vals.astype(">i2")
    rate, s = decode_mkv_audio(
        build_mkv_audio(8000, 1, be.tobytes(), codec_id="A_PCM/INT/BIG")
    )
    assert (np.round(s[:, 0] * 32768).astype(np.int16) == vals).all()

    opus = build_mkv_audio(48000, 2, b"\x00" * 64, codec_id="A_OPUS")
    assert not mkv_has_pcm_audio(opus)
    with pytest.raises(MkvError, match="A_OPUS"):
        decode_mkv_audio(opus)
    # truncation fuzz over a media-bearing file
    good = build_mkv_audio(8000, 1, vals.tobytes())
    for cut in range(0, len(good), 61):
        try:
            decode_mkv_audio(good[:cut])
        except MkvError:
            pass


def test_audio_decoder_dispatch_picks_mkv_pcm():
    import numpy as np

    from evm_archive_spark.operators.mkv import build_mkv_audio
    from evm_archive_spark.operators.multimodal import _audio_decoder

    vals = np.arange(-100, 100, dtype=np.int16)
    b = build_mkv_audio(8000, 1, vals.tobytes())
    dec = _audio_decoder(b)
    assert dec is not None
    rate, s = dec()
    assert rate == 8000 and s.shape == (200, 1)
    # perceptual MKV audio is NOT claimed decodable
    assert _audio_decoder(
        build_mkv_audio(48000, 2, b"\x00" * 64, codec_id="A_VORBIS")
    ) is None
