"""Corrupt-payload exception taxonomy (ADVICE r5): every from-scratch
decoder must surface truncated/corrupt input as its OWN error class, so
the multimodal operators' strict=False fallbacks ('a dirty payload never
fails the job') actually catch it.  No Spark session needed — these are
pure decoder-boundary checks.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from evm_archive_spark.operators import codecerrors
from evm_archive_spark.operators.flac import FlacError, decode_flac
from evm_archive_spark.operators.gif import GifError, decode_gif
from evm_archive_spark.operators.jpeg import JpegError, decode_jpeg
from evm_archive_spark.operators.png import PngError, decode_png
from evm_archive_spark.operators.tiff import TiffError, decode_tiff
from evm_archive_spark.operators.wav import WavError, decode_wav


def test_gif_truncated_at_image_descriptor_raises_gif_error():
    """The ADVICE repro: a GIF cut mid image-descriptor used to escape
    as struct.error."""
    data = (
        b"GIF89a"
        + bytes([4, 0, 4, 0, 0x80, 0, 0])  # LSD w/ global color table
        + bytes(6)                          # 2-entry GCT
        + b"\x2c\x00\x00"                   # image descriptor, truncated
    )
    with pytest.raises(GifError):
        decode_gif(data)


def test_float_wav_ragged_data_chunk_raises_wav_error():
    """The ADVICE repro: float WAV whose data chunk isn't a multiple of
    4 used to escape as plain ValueError from np.frombuffer."""
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    data = b"\x01\x02\x03\x04\x05"  # 5 bytes, not % 4
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(WavError):
        decode_wav(payload)


def test_truncated_stereo_adpcm_raises_wav_error():
    """The ADVICE repro: ragged-channel np.array on a truncated
    multi-channel IMA ADPCM body."""
    block_align = 256
    fmt = struct.pack(
        "<HHIIHHH", 17, 2, 8000, 8000, block_align, 4, 2
    )  # IMA ADPCM stereo, cbSize=2 (samples/block implied)
    fmt += struct.pack("<H", 249)
    # one block's headers plus an odd, truncated nibble body
    data = (
        struct.pack("<hBB", 0, 0, 0)
        + struct.pack("<hBB", 0, 0, 0)
        + b"\x11" * 5  # not a multiple of the 4-byte channel interleave
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(WavError):
        decode_wav(payload)


@pytest.mark.parametrize(
    "decode,err",
    [
        (decode_png, PngError),
        (decode_jpeg, JpegError),
        (decode_flac, FlacError),
        (decode_tiff, TiffError),
    ],
    ids=["png", "jpeg", "flac", "tiff"],
)
def test_valid_magic_truncated_tail_raises_codec_error(decode, err):
    """Valid signature + garbage/truncated tail must raise the codec's
    own error, never a stray parsing exception."""
    magics = {
        decode_png: b"\x89PNG\r\n\x1a\n",
        decode_jpeg: b"\xff\xd8\xff\xe0",
        decode_flac: b"fLaC",
        decode_tiff: b"II*\x00",
    }
    for tail in (b"", b"\x00", b"\x04", b"\x00\x08\x00\x00", b"\xff" * 7):
        with pytest.raises((err, NotImplementedError)):
            decode(magics[decode] + tail)


def _minimal_deflate_tiff(strip: bytes, w: int, h: int) -> bytes:
    """Little-endian gray-8 single-strip Deflate TIFF around ``strip``."""
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 8),
        (262, 3, 1, 1), (273, 4, 1, None), (277, 3, 1, 1),
        (278, 3, 1, h), (279, 4, 1, len(strip)),
    ]
    strip_off = 8 + 2 + 12 * len(entries) + 4
    out = struct.pack("<2sHI", b"II", 42, 8)
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack(
            "<HHII", tag, typ, cnt, strip_off if tag == 273 else val
        )
    out += struct.pack("<I", 0)
    return out + strip


def test_tiff_deflate_inflation_capped_at_strip_size():
    """ADVICE r5: a deflate strip expanding far past the expected strip
    size must not be fully inflated (decompression bomb) — output is
    capped at ``want`` like the LZW/PackBits paths, and the pixels
    still decode exactly."""
    px = bytes(range(16))  # 4x4 gray
    bomb = zlib.compress(px + b"\x00" * (32 << 20))
    img = decode_tiff(_minimal_deflate_tiff(bomb, 4, 4))
    assert img.shape[:2] == (4, 4)
    assert img[..., 0].tobytes() == px


def test_guard_passes_codec_error_and_notimplemented_through():
    class MyErr(Exception):
        pass

    @codecerrors.guard(MyErr)
    def boom(kind):
        if kind == "own":
            raise MyErr("already typed")
        if kind == "ni":
            raise NotImplementedError("strict boundary")
        if kind == "stray":
            raise struct.error("truncated")
        raise TypeError("programming error")

    with pytest.raises(MyErr, match="already typed"):
        boom("own")
    with pytest.raises(NotImplementedError):
        boom("ni")
    with pytest.raises(MyErr, match="corrupt payload"):
        boom("stray")
    with pytest.raises(TypeError):  # non-parsing errors still loud
        boom("bug")


def test_guard_iter_normalizes_mid_iteration_errors():
    class MyErr(Exception):
        pass

    @codecerrors.guard_iter(MyErr)
    def frames():
        yield 0
        raise IndexError("slice past end")

    it = frames()
    assert next(it) == 0
    with pytest.raises(MyErr, match="corrupt payload"):
        next(it)


def test_fuzz_truncations_never_raise_stray_exceptions():
    """Every prefix truncation of real encoded fixtures either decodes
    or raises the codec's own error / NotImplementedError."""
    from evm_archive_spark.operators.png import encode_png
    from evm_archive_spark.operators.wav import encode_wav

    rng = np.random.default_rng(7)
    rgba = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    png_payload = encode_png(rgba)
    pcm = (rng.random(64) * 2 - 1).astype(np.float64)
    wav_payload = encode_wav(pcm.reshape(-1, 1), 8000)

    for payload, decode, err in (
        (png_payload, decode_png, PngError),
        (wav_payload, decode_wav, WavError),
    ):
        for cut in range(0, len(payload), 3):
            try:
                decode(payload[:cut])
            except (err, NotImplementedError):
                pass  # the contract: typed errors only
