"""Header-only video metadata (AVI + MP4/ISO-BMFF + MKV/Matroska) —
the video mirror of ``audiometa.audio_metadata``: a 100-TB video corpus
filters on dims / frame count / fps / duration long before it decodes a
frame, and those live in container headers:

- **AVI**: the ``avih`` main header (public 'AVI RIFF File Reference'):
  dwMicroSecPerFrame, dwTotalFrames, dwWidth, dwHeight.
- **MP4**: the first ``vide`` track (mp4.py box walk): visual sample
  entry dims, sample count, mdhd duration/timescale.
- **MKV/WebM**: the Segment's Info + Tracks (mkv.py EBML walk, RFC
  8794): PixelWidth/Height, Duration x TimestampScale,
  DefaultDuration-derived fps/frame count.

Codec payload decode stays behind the documented boundary (MJPEG is
real via jpeg.py; H.264/HEVC raise named gaps) — metadata needs none
of it.  One ``mapInPandas`` Arrow pass, map-side only.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .codecerrors import guard


class VideoMetaError(ValueError):
    """Raised on malformed payloads in strict mode."""


@guard(VideoMetaError)
def avi_meta(data: bytes) -> dict:
    """avih main-header walk (no frame decode)."""
    from .avi import is_avi

    if not is_avi(data):
        raise VideoMetaError("not an AVI payload")
    pos = 12
    avih = None
    codec = "avi"
    while pos + 8 <= len(data) and avih is None:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if fourcc == b"LIST" and data[pos + 8 : pos + 12] == b"hdrl":
            inner = pos + 12
            end = min(pos + 8 + size, len(data))
            while inner + 8 <= end:
                fc2 = data[inner : inner + 4]
                (sz2,) = struct.unpack_from("<I", data, inner + 4)
                if fc2 == b"avih" and sz2 >= 40:
                    avih = data[inner + 8 : inner + 8 + sz2]
                inner += 8 + sz2 + (sz2 & 1)
        pos += 8 + size + (size & 1)
    if avih is None:
        raise VideoMetaError("missing avih header")
    usec_per_frame, = struct.unpack_from("<I", avih, 0)
    n_frames, = struct.unpack_from("<I", avih, 16)
    width, height = struct.unpack_from("<II", avih, 32)
    if usec_per_frame == 0:
        raise VideoMetaError("zero frame period")
    return {
        "format": codec,
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "fps_millihz": 1_000_000_000 // usec_per_frame,
        "duration_ms": n_frames * usec_per_frame // 1000,
    }


@guard(VideoMetaError)
def mp4_video_meta(data: bytes) -> dict:
    """First video track of an MP4 container (mp4.py:189 walk)."""
    from .mp4 import Mp4Error, is_mp4, mp4_tracks

    if not is_mp4(data):
        raise VideoMetaError("not an MP4 payload")
    try:
        tracks = mp4_tracks(data)
    except Mp4Error as e:
        raise VideoMetaError(str(e)) from e
    vid = [t for t in tracks if t.handler == "vide"]
    if not vid:
        raise VideoMetaError("no video track")
    t = vid[0]
    n_frames = len(t.samples)
    dur_ms = (
        t.duration * 1000 // t.timescale if t.timescale else 0
    )
    fps_mhz = n_frames * 1_000_000 // dur_ms if dur_ms else 0
    return {
        "format": "mp4-" + t.codec.strip(),
        "width": t.width,
        "height": t.height,
        "n_frames": n_frames,
        "fps_millihz": fps_mhz,
        "duration_ms": dur_ms,
    }


def video_metadata_of(b: bytes) -> dict | None:
    from .avi import is_avi
    from .mkv import MkvError, is_mkv, mkv_video_meta
    from .mp4 import is_mp4

    if is_avi(b):
        return avi_meta(b)
    if is_mp4(b):
        return mp4_video_meta(b)
    if is_mkv(b):
        try:
            return mkv_video_meta(b)
        except MkvError as e:
            raise VideoMetaError(str(e)) from e
    return None


def _fake_meta(b: bytes) -> dict:
    """sha256-derived stand-in (the q_video_meta oracle twin)."""
    h = hashlib.sha256(b or b"").digest()
    n_frames = 1 + ((h[2] << 8 | h[3]) % 100000)
    fps_millihz = 1000 * (1 + h[4] % 60)
    return {
        "format": "fake",
        "width": 16 * (1 + h[0]),
        "height": 16 * (1 + h[1]),
        "n_frames": n_frames,
        "fps_millihz": fps_millihz,
        "duration_ms": n_frames * 1_000_000 // fps_millihz,
    }


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("fps_millihz", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def video_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
) -> DataFrame:
    """Header-only video metadata over a binary column (strict/fake
    contract identical to ``audiometa.audio_metadata``)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = {k.name: [] for k in VIDEO_META_SCHEMA.fields}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload or b"")
                meta = None
                if strict:
                    meta = video_metadata_of(b)
                    if meta is None:
                        raise VideoMetaError(
                            f"payload {mid}: not a video container"
                        )
                else:
                    try:
                        meta = video_metadata_of(b)
                    except (VideoMetaError, NotImplementedError):
                        meta = None
                    if meta is None:
                        meta = _fake_meta(b)
                rows["media_id"].append(mid)
                for k, v in meta.items():
                    rows[k].append(v)
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, VIDEO_META_SCHEMA)
