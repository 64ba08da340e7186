"""Header-only video metadata: spec-level AVI fixture + the
independent MP4 muxer from test_mp4."""

from __future__ import annotations

import struct

import pytest

from evm_archive_spark.operators.videometa import (
    VideoMetaError,
    _fake_meta,
    avi_meta,
    mp4_video_meta,
    video_metadata_of,
)


def _avi(usec=40000, frames=250, w=640, h=480) -> bytes:
    avih = struct.pack(
        "<10I", usec, 0, 0, 0, frames, 0, 1, 0, w, h
    )
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    lst = b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    body = b"AVI " + lst
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_meta():
    m = avi_meta(_avi())
    assert m["format"] == "avi"
    assert (m["width"], m["height"]) == (640, 480)
    assert m["n_frames"] == 250
    assert m["fps_millihz"] == 25000  # 40ms/frame = 25 fps
    assert m["duration_ms"] == 10000


def test_mp4_video_meta_via_independent_muxer():
    from test_mp4 import mux_mp4

    frames = [b"\x00" * 16] * 5
    data = mux_mp4(video_frames=frames, video_codec=b"jpeg")
    m = mp4_video_meta(data)
    assert m["format"] == "mp4-jpeg"
    assert m["n_frames"] == 5


def test_dispatch_and_fake():
    assert video_metadata_of(_avi())["format"] == "avi"
    assert video_metadata_of(b"not a video") is None
    f = _fake_meta(b"xyz")
    assert f == _fake_meta(b"xyz") and f["format"] == "fake"
    assert f["duration_ms"] == f["n_frames"] * 1_000_000 // f["fps_millihz"]


def test_truncation_fuzz_guard_contract():
    payload = _avi()
    for cut in range(0, len(payload), 3):
        try:
            video_metadata_of(payload[:cut])
        except VideoMetaError:
            pass


def test_zero_frame_period_raises():
    with pytest.raises(VideoMetaError):
        avi_meta(_avi(usec=0))
