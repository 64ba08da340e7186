"""Header-only audio metadata: MP3 / Ogg / WAV / FLAC fixtures are
hand-assembled at the spec level (ISO 11172-3 frame headers, ID3v2,
RFC 3533 pages, RFC 7845 OpusHead, FLAC STREAMINFO bit layout) so the
parser is checked against the published byte layouts, not against
itself."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from evm_archive_spark.operators.audiometa import (
    AudioMetaError,
    audio_metadata_of,
    flac_meta,
    mp3_meta,
    mp3_frames,
    ogg_meta,
    parse_id3v2,
    wav_meta,
    _fake_meta,
)


# -- fixture builders -------------------------------------------------------

def mp3_frame(bitrate_idx: int = 9, padding: int = 0) -> bytes:
    """One MPEG1 Layer III 44.1 kHz frame (zeroed audio data)."""
    b1 = 0b11111011  # MPEG1, Layer III, no CRC
    b2 = (bitrate_idx << 4) | (0 << 2) | (padding << 1)
    b3 = 0x00  # stereo
    kbps = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320][
        bitrate_idx
    ]
    flen = 144 * kbps * 1000 // 44100 + padding
    return bytes([0xFF, b1, b2, b3]) + b"\x00" * (flen - 4)


def id3v2_tag(frames: list[tuple[bytes, bytes]], ver: int = 3) -> bytes:
    body = b""
    for fid, payload in frames:
        if ver == 4:
            sz = bytes(
                [(len(payload) >> s) & 0x7F for s in (21, 14, 7, 0)]
            )
        else:
            sz = struct.pack(">I", len(payload))
        body += fid + sz + b"\x00\x00" + payload
    size = len(body)
    ss = bytes([(size >> s) & 0x7F for s in (21, 14, 7, 0)])
    return b"ID3" + bytes([ver, 0, 0]) + ss + body


def ogg_page(
    serial: int, htype: int, granule: int, body: bytes, seq: int = 0
) -> bytes:
    assert len(body) < 255 * 255
    lacing = []
    rest = len(body)
    while rest >= 255:
        lacing.append(255)
        rest -= 255
    lacing.append(rest)
    return (
        b"OggS"
        + bytes([0, htype])
        + struct.pack("<qIIi", granule, serial, seq, 0)
        + bytes([len(lacing)])
        + bytes(lacing)
        + body
    )


def vorbis_comment_block(tags: list[tuple[str, str]]) -> bytes:
    out = struct.pack("<I", 3) + b"ven" + struct.pack("<I", len(tags))
    for k, v in tags:
        item = f"{k}={v}".encode()
        out += struct.pack("<I", len(item)) + item
    return out


def ogg_vorbis(rate=44100, ch=2, samples=88200, tags=()) -> bytes:
    ident = (
        b"\x01vorbis"
        + struct.pack("<I", 0)
        + bytes([ch])
        + struct.pack("<IiiI", rate, 0, 0, 0)
        + bytes([0xB8, 0x01])
    )
    comment = b"\x03vorbis" + vorbis_comment_block(list(tags)) + b"\x01"
    return (
        ogg_page(7, 0x02, 0, ident, 0)
        + ogg_page(7, 0x00, -1, comment, 1)
        + ogg_page(7, 0x04, samples, b"\x00" * 64, 2)
    )


def ogg_opus(ch=2, preskip=312, granule=48312, tags=()) -> bytes:
    head = (
        b"OpusHead"
        + bytes([1, ch])
        + struct.pack("<HIh", preskip, 48000, 0)
        + b"\x00"
    )
    comment = b"OpusTags" + vorbis_comment_block(list(tags))
    return (
        ogg_page(9, 0x02, 0, head, 0)
        + ogg_page(9, 0x00, -1, comment, 1)
        + ogg_page(9, 0x04, granule, b"\x00" * 64, 2)
    )


def flac_stub(rate=48000, ch=2, bps=16, samples=96000, tags=()) -> bytes:
    def u(val, bits, acc):
        return (acc[0] << bits | val, acc[1] + bits)

    acc = (0, 0)
    for val, bits in [
        (1024, 16),
        (1024, 16),
        (0, 24),
        (0, 24),
        (rate, 20),
        (ch - 1, 3),
        (bps - 1, 5),
        (samples, 36),
    ]:
        acc = u(val, bits, acc)
    assert acc[1] == 144
    info = acc[0].to_bytes(18, "big") + b"\x00" * 16  # + md5
    blocks = b"\x00" + struct.pack(">I", len(info))[1:] + info
    if tags:
        body = vorbis_comment_block(list(tags))
        blocks += b"\x04" + struct.pack(">I", len(body))[1:] + body
    # mark the final block
    last_off = len(blocks) - (4 + (len(body) if tags else len(info)))
    blocks = (
        blocks[:last_off]
        + bytes([blocks[last_off] | 0x80])
        + blocks[last_off + 1 :]
    )
    return b"fLaC" + blocks


# -- MP3 --------------------------------------------------------------------

def test_mp3_cbr_duration_exact():
    data = mp3_frame() * 10
    m = mp3_meta(data)
    assert m["format"] == "mp3"
    assert m["sample_rate"] == 44100
    assert m["n_channels"] == 2
    assert m["duration_ms"] == 10 * 1152 * 1000 // 44100
    assert m["bitrate_kbps"] == 128
    assert m["vbr"] == 0


def test_mp3_vbr_flag_and_true_duration():
    data = mp3_frame(9) * 5 + mp3_frame(11) * 5
    m = mp3_meta(data)
    assert m["vbr"] == 1
    assert m["duration_ms"] == 10 * 1152 * 1000 // 44100
    assert 128 < m["bitrate_kbps"] < 192


def test_mp3_padding_bit_changes_frame_len():
    frames = list(mp3_frames(mp3_frame(9, padding=1)))
    assert frames[0][1] == 144 * 128000 // 44100 + 1


def test_id3v23_and_v24_text_frames():
    for ver in (3, 4):
        tag = id3v2_tag(
            [
                (b"TIT2", b"\x03Hello"),
                (b"TPE1", b"\x01" + "Wörld".encode("utf-16")),
            ],
            ver=ver,
        )
        data = tag + mp3_frame() * 3
        m = mp3_meta(data)
        assert m["title"] == "Hello"
        assert m["artist"] == "Wörld"
        assert m["n_tags"] == 2


def test_id3v22_three_byte_frames():
    body = b"TT2" + bytes([0, 0, 6]) + b"\x00Howdy"
    size = len(body)
    ss = bytes([(size >> s) & 0x7F for s in (21, 14, 7, 0)])
    tag = b"ID3" + bytes([2, 0, 0]) + ss + body
    m = mp3_meta(tag + mp3_frame() * 2)
    assert m["title"] == "Howdy"


def test_mp3_trailing_garbage_tolerated():
    m = mp3_meta(mp3_frame() * 4 + b"TAG" + b"\x00" * 125)
    assert m["duration_ms"] == 4 * 1152 * 1000 // 44100


def test_mp3_no_frames_raises():
    with pytest.raises(AudioMetaError):
        mp3_meta(id3v2_tag([(b"TIT2", b"\x03x")]))


# -- Ogg --------------------------------------------------------------------

def test_ogg_vorbis_meta():
    data = ogg_vorbis(
        rate=44100, ch=2, samples=88200, tags=[("TITLE", "Song"), ("ARTIST", "A")]
    )
    m = ogg_meta(data)
    assert m["format"] == "ogg-vorbis"
    assert (m["sample_rate"], m["n_channels"]) == (44100, 2)
    assert m["duration_ms"] == 2000
    assert m["title"] == "Song" and m["artist"] == "A" and m["n_tags"] == 2


def test_ogg_opus_preskip_subtracted():
    m = ogg_meta(ogg_opus(preskip=312, granule=48312, tags=[("title", "t")]))
    assert m["format"] == "ogg-opus"
    assert m["sample_rate"] == 48000
    assert m["duration_ms"] == 1000
    assert m["title"] == "t"


def test_ogg_no_audio_stream_raises():
    page = ogg_page(3, 0x02, 0, b"not-an-id-header")
    with pytest.raises(AudioMetaError):
        ogg_meta(page)


# -- WAV / FLAC -------------------------------------------------------------

def test_wav_meta_headers_only():
    from evm_archive_spark.operators.wav import encode_wav

    samples = np.zeros((4410, 2))
    m = wav_meta(encode_wav(samples, 44100))
    assert m["format"] == "wav"
    assert (m["sample_rate"], m["n_channels"], m["bits_per_sample"]) == (
        44100,
        2,
        16,
    )
    assert m["duration_ms"] == 100
    assert m["bitrate_kbps"] == 44100 * 2 * 2 * 8 // 1000


def test_flac_meta_streaminfo_and_comments():
    data = flac_stub(
        rate=48000, ch=2, bps=16, samples=96000, tags=[("TITLE", "Fl")]
    )
    m = flac_meta(data)
    assert m["format"] == "flac"
    assert m["duration_ms"] == 2000
    assert m["bits_per_sample"] == 16
    assert m["title"] == "Fl"


# -- dispatch + corrupt payloads -------------------------------------------

def test_dispatch_covers_all_formats():
    from evm_archive_spark.operators.wav import encode_wav

    cases = {
        "mp3": mp3_frame() * 2,
        "ogg-vorbis": ogg_vorbis(),
        "wav": encode_wav(np.zeros((100, 1)), 8000),
        "flac": flac_stub(),
    }
    for want, payload in cases.items():
        assert audio_metadata_of(payload)["format"] == want
    assert audio_metadata_of(b"plain text") is None


@pytest.mark.parametrize(
    "payload",
    [
        mp3_frame()[:3],
        b"OggS" + b"\x00" * 10,
        b"RIFF\x10\x00\x00\x00WAVE",
        b"fLaC\x00\x00\x00",
        b"ID3" + b"\x04" * 40,
    ],
)
def test_corrupt_payloads_raise_codec_error_only(payload):
    try:
        audio_metadata_of(payload)
    except AudioMetaError:
        pass  # the only acceptable failure type (guard contract)


def test_fake_meta_deterministic():
    a, b = _fake_meta(b"xyz"), _fake_meta(b"xyz")
    assert a == b and a["format"] == "fake"
    assert 1 <= a["duration_ms"] <= 600000


def test_parse_id3v2_absent():
    assert parse_id3v2(b"\xff\xfb\x90\x00") == ({}, 0)


def test_truncation_fuzz_guard_contract():
    """Every prefix truncation of every valid fixture either parses or
    raises AudioMetaError — never a stray struct.error/IndexError
    (the codecerrors guard contract, applied to the metadata lane)."""
    from evm_archive_spark.operators.wav import encode_wav

    fixtures = [
        id3v2_tag([(b"TIT2", b"\x03T")]) + mp3_frame() * 3,
        ogg_vorbis(tags=[("TITLE", "x")]),
        ogg_opus(tags=[("artist", "y")]),
        encode_wav(np.zeros((64, 2)), 8000),
        flac_stub(tags=[("TITLE", "z")]),
    ]
    for payload in fixtures:
        step = max(1, len(payload) // 97)
        for cut in range(0, len(payload), step):
            try:
                audio_metadata_of(payload[:cut])
            except AudioMetaError:
                pass  # the only acceptable failure type
