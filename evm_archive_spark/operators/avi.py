"""AVI/MJPEG container parsing — from scratch, stdlib only.

AVI is a RIFF container (public Microsoft 'AVI RIFF File Reference'):
``RIFF('AVI ' LIST('hdrl' ...) LIST('movi' chunks...) [idx1])`` where
each ``NNdc``/``NNdb`` chunk in the ``movi`` list is one video frame for
stream NN.  In the Motion-JPEG flavor every ``dc`` chunk is a complete
baseline JPEG image, so this module plus ``jpeg.py`` yields REAL decoded
video frames with no codec library: the container walk is ~100 lines of
struct parsing, and the frame payloads go through the same stdlib
baseline decoder the still-image path uses.

This deliberately covers only what frame sampling needs: enumerate the
video frames of stream 0 in order.  Audio chunks (``NNwb``), index
chunks, and header metadata are skipped; inter-frame codecs (H.264 etc.)
are out of scope — their ``dc`` payloads won't carry a JPEG signature
and ``frame_sample(strict=True)`` raises naming the gap.

Reference parity note: the reference stores media as opaque bytea and
never decodes; this backs ``multimodal.frame_sample``'s strict path for
``video/x-msvideo`` payloads.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from .codecerrors import guard_iter


class AviError(Exception):
    """Malformed or out-of-scope AVI payload."""


def is_avi(data: bytes) -> bool:
    """RIFF....AVI signature sniff."""
    return (
        len(data) >= 12
        and data[:4] == b"RIFF"
        and data[8:12] == b"AVI "
    )


def _walk_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_len) for each chunk in a RIFF
    region; chunks are word-aligned (odd sizes padded by one byte)."""
    i = start
    while i + 8 <= end:
        fourcc = data[i : i + 4]
        (size,) = struct.unpack_from("<I", data, i + 4)
        body = i + 8
        if body + size > end:
            raise AviError("chunk overruns its parent")
        yield fourcc, body, size
        i = body + size + (size & 1)


@guard_iter(AviError)
def avi_frames(data: bytes) -> Iterator[tuple[int, bytes]]:
    """Yield ``(frame_idx, payload)`` for every video frame of stream 0
    in the ``movi`` list, in file order.  ``payload`` is the raw frame
    chunk (a complete JPEG in the MJPEG flavor — callers signature-check
    and decode)."""
    if not is_avi(data):
        raise AviError("bad signature: not a RIFF/AVI payload")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)
    movi = None
    for fourcc, body, size in _walk_chunks(data, 12, end):
        if fourcc == b"LIST" and data[body : body + 4] == b"movi":
            movi = (body + 4, body + size)
            break
    if movi is None:
        raise AviError("no movi list (not a playable AVI)")
    idx = 0
    for fourcc, body, size in _walk_chunks(data, *movi):
        if fourcc == b"LIST":  # 'rec ' grouping — recurse one level
            for f2, b2, s2 in _walk_chunks(data, body + 4, body + size):
                if f2[:2] == b"00" and f2[2:] in (b"dc", b"db"):
                    yield idx, data[b2 : b2 + s2]
                    idx += 1
            continue
        if fourcc[:2] == b"00" and fourcc[2:] in (b"dc", b"db"):
            yield idx, data[body : body + size]
            idx += 1


@guard_iter(AviError)
def decode_avi_frames(data: bytes) -> Iterator[tuple[int, int, int, "object"]]:
    """Yield ``(frame_idx, width, height, rgba)`` with every frame REALLY
    decoded via the stdlib baseline-JPEG decoder — the video analogue of
    ``png.decode_apng_frames``.  Raises ``AviError`` for a non-MJPEG
    stream (frame payload without a JPEG signature)."""
    from .jpeg import JpegError, decode_jpeg, is_jpeg

    for idx, payload in avi_frames(data):
        if not is_jpeg(payload):
            raise AviError(
                f"frame {idx} is not JPEG-compressed (MJPEG only; "
                "inter-frame codecs need real video libraries)"
            )
        try:
            rgba = decode_jpeg(payload)
        except JpegError as e:
            raise AviError(f"bad MJPEG frame {idx}: {e}") from e
        h, w = rgba.shape[:2]
        yield idx, w, h, rgba
