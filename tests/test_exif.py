"""EXIF extraction / scrubbing tests.

Fixtures are built by an INDEPENDENT spec-level writer in this file
(TIFF 6.0 / CIPA DC-008 IFD layout packed directly with struct), then
spliced into real JPEG / PNG payloads produced by the independent
encoders in test_jpeg / png.encode_png — so the parser and the fixture
generator share no code.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pytest

from evm_archive_spark.operators import exif
from evm_archive_spark.operators.jpeg import decode_jpeg
from evm_archive_spark.operators.png import decode_png, encode_png
from test_jpeg import encode_jpeg

BO = "<"
_SZ = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _pack_vals(typ, vals):
    if typ == 2:
        return vals  # bytes, caller includes the NUL
    if typ == 3:
        return struct.pack(f"{BO}{len(vals)}H", *vals)
    if typ == 4:
        return struct.pack(f"{BO}{len(vals)}I", *vals)
    if typ == 5:
        return b"".join(struct.pack(BO + "II", n, d) for n, d in vals)
    raise AssertionError(typ)


def build_exif_block(ifd0, exif_ifd=None, gps_ifd=None) -> bytes:
    """Independent TIFF/EXIF writer: IFD0 (+ optional Exif / GPS
    sub-IFDs appended as pointer tags), out-of-line values after the
    last IFD, little-endian."""
    ifd0 = list(ifd0)
    n0 = len(ifd0) + (exif_ifd is not None) + (gps_ifd is not None)
    off_ifd0 = 8
    off_exif = off_ifd0 + 2 + 12 * n0 + 4
    sz_exif = (2 + 12 * len(exif_ifd) + 4) if exif_ifd is not None else 0
    off_gps = off_exif + sz_exif
    sz_gps = (2 + 12 * len(gps_ifd) + 4) if gps_ifd is not None else 0
    data_off = off_gps + sz_gps
    if exif_ifd is not None:
        ifd0.append((0x8769, 4, [off_exif]))
    if gps_ifd is not None:
        ifd0.append((0x8825, 4, [off_gps]))
    ifd0.sort(key=lambda e: e[0])
    data = bytearray()

    def emit(entries):
        out = struct.pack(BO + "H", len(entries))
        for tag, typ, vals in sorted(entries, key=lambda e: e[0]):
            pv = _pack_vals(typ, vals)
            cnt = len(vals)
            if len(pv) <= 4:
                vf = pv + b"\x00" * (4 - len(pv))
            else:
                vf = struct.pack(BO + "I", data_off + len(data))
                data.extend(pv)
            out += struct.pack(BO + "HHI", tag, typ, cnt) + vf
        return out + struct.pack(BO + "I", 0)

    blob = emit(ifd0)
    if exif_ifd is not None:
        blob += emit(exif_ifd)
    if gps_ifd is not None:
        blob += emit(gps_ifd)
    return b"II*\x00" + struct.pack(BO + "I", off_ifd0) + blob + bytes(data)


def _std_block(gps=True) -> bytes:
    gps_entries = (
        [
            (0x0001, 2, b"N\x00"),  # GPSLatitudeRef
            (0x0002, 5, [(52, 1), (30, 1), (0, 1)]),  # GPSLatitude
        ]
        if gps
        else None
    )
    return build_exif_block(
        ifd0=[
            (0x010F, 2, b"CamCorp\x00"),
            (0x0110, 2, b"Model X100 Mark II\x00"),
            (0x0112, 3, [6]),
            (0x0132, 2, b"2023:05:01 10:00:00\x00"),
        ],
        exif_ifd=[(0x9003, 2, b"2023:04:30 18:22:07\x00")],
        gps_ifd=gps_entries,
    )


def _jpeg_with_exif(block: bytes | None = None) -> bytes:
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    base = encode_jpeg(rgb)
    if block is None:
        return base
    app1 = b"Exif\x00\x00" + block
    seg = b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
    return base[:2] + seg + base[2:]


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png_with_exif(block: bytes | None = None) -> bytes:
    rng = np.random.default_rng(8)
    rgba = rng.integers(0, 256, (9, 13, 4), dtype=np.uint8)
    base = encode_png(rgba)
    if block is None:
        return base
    # insert eXIf right after IHDR (8-byte sig + 25-byte IHDR chunk)
    ihdr_end = 8 + 12 + 13
    return base[:ihdr_end] + _png_chunk(b"eXIf", block) + base[ihdr_end:]


def test_parse_exif_tiff_fields():
    meta = exif.parse_exif_tiff(_std_block())
    assert meta["make"] == "CamCorp"
    assert meta["model"] == "Model X100 Mark II"
    assert meta["orientation"] == 6
    # DateTimeOriginal from the Exif sub-IFD wins over IFD0 DateTime
    assert meta["datetime_original"] == "2023:04:30 18:22:07"
    assert meta["has_gps"] == 1
    assert exif.parse_exif_tiff(_std_block(gps=False))["has_gps"] == 0
    with pytest.raises(exif.ExifError):
        exif.parse_exif_tiff(b"XX\x00\x00garbage")


def test_jpeg_metadata_and_dims():
    meta = exif.image_metadata_of(_jpeg_with_exif(_std_block()))
    assert meta["format"] == "jpeg"
    assert (meta["width"], meta["height"]) == (24, 16)
    assert meta["make"] == "CamCorp" and meta["has_gps"] == 1
    plain = exif.image_metadata_of(_jpeg_with_exif(None))
    assert plain["make"] is None and plain["has_gps"] == 0
    assert (plain["width"], plain["height"]) == (24, 16)


def test_png_gif_bmp_tiff_metadata():
    meta = exif.image_metadata_of(_png_with_exif(_std_block()))
    assert meta["format"] == "png"
    assert (meta["width"], meta["height"]) == (13, 9)
    assert meta["model"] == "Model X100 Mark II" and meta["has_gps"] == 1
    # GIF: logical screen descriptor only
    gif = b"GIF89a" + struct.pack("<HH", 40, 30) + b"\x00\x00\x00" + b"\x3b"
    m = exif.image_metadata_of(gif)
    assert m["format"] == "gif" and (m["width"], m["height"]) == (40, 30)
    # BMP: negative height = top-down, reported absolute
    bmp = (
        b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 17, -11, 1, 24, 0, 0, 0, 0, 0, 0)
    )
    m = exif.image_metadata_of(bmp)
    assert m["format"] == "bmp" and (m["width"], m["height"]) == (17, 11)
    # bare TIFF block: IFD0 is both image directory and EXIF carrier
    block = build_exif_block(
        ifd0=[
            (0x0100, 3, [320]),
            (0x0101, 3, [200]),
            (0x010F, 2, b"TiffCam\x00"),
        ],
        gps_ifd=[(0x0001, 2, b"E\x00")],
    )
    m = exif.image_metadata_of(block)
    assert m["format"] == "tiff"
    assert (m["width"], m["height"]) == (320, 200)
    assert m["make"] == "TiffCam" and m["has_gps"] == 1
    assert exif.image_metadata_of(b"not an image") is None


def test_strip_exif_lossless():
    blk = _std_block()
    for payload, dec in (
        (_jpeg_with_exif(blk), decode_jpeg),
        (_png_with_exif(blk), decode_png),
    ):
        out, nseg, nbytes = exif.strip_exif_bytes(payload)
        assert nseg == 1 and nbytes > len(blk)
        assert len(out) == len(payload) - nbytes
        # pixels bit-identical, EXIF gone
        assert np.array_equal(dec(out), dec(payload))
        m = exif.image_metadata_of(out)
        assert m["make"] is None and m["has_gps"] == 0
        # idempotent
        again, n2, _ = exif.strip_exif_bytes(out)
        assert n2 == 0 and again == out
    # unknown formats pass through bit-exactly
    raw = b"\x00\x01binary soup"
    assert exif.strip_exif_bytes(raw) == (raw, 0, 0)


def test_image_metadata_spark_and_fake(spark):
    import pandas as pd

    payloads = [
        _jpeg_with_exif(_std_block()),
        _png_with_exif(None),
        b"opaque bytes",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [0, 1, 2], "payload": payloads})
    )
    rows = {
        r["media_id"]: r
        for r in exif.image_metadata(df, strict=False).collect()
    }
    assert rows[0]["format"] == "jpeg" and rows[0]["has_gps"] == 1
    assert rows[1]["format"] == "png" and rows[1]["make"] is None
    # the fake row replays the sha256 recipe
    h = hashlib.sha256(b"opaque bytes").digest()
    fk = rows[2]
    assert fk["format"] == "fake"
    assert fk["width"] == 1 + int.from_bytes(h[0:2], "big") % 8192
    assert fk["make"] == f"make_{h[4] % 16}"
    assert fk["datetime_original"] == f"2020:01:01 00:00:{h[7] % 60:02d}"
    assert fk["has_gps"] == h[8] % 2

    with pytest.raises(Exception, match="NotImplementedError|strict image"):
        exif.image_metadata(
            df.filter("media_id = 2"), strict=True
        ).collect()

    scrubbed = {
        r["media_id"]: r for r in exif.scrub_exif(df).collect()
    }
    assert scrubbed[0]["removed_segments"] == 1
    assert bytes(scrubbed[0]["payload"]) == exif.strip_exif_bytes(
        payloads[0]
    )[0]
    assert scrubbed[1]["removed_segments"] == 0
    assert bytes(scrubbed[2]["payload"]) == payloads[2]


# -- WebP (RIFF) header metadata ---------------------------------------------

def _riff_webp(*chunks: tuple[bytes, bytes]) -> bytes:
    body = b"WEBP"
    for fourcc, payload in chunks:
        body += fourcc + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_webp_vp8l_dims():
    from evm_archive_spark.operators.exif import image_metadata_of

    w, h = 320, 200
    word = (w - 1) | ((h - 1) << 14)
    payload = b"\x2f" + struct.pack("<I", word)
    m = image_metadata_of(_riff_webp((b"VP8L", payload)))
    assert m["format"] == "webp" and (m["width"], m["height"]) == (320, 200)


def test_webp_vp8_lossy_dims():
    from evm_archive_spark.operators.exif import image_metadata_of

    payload = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 640, 480)
    m = image_metadata_of(_riff_webp((b"VP8 ", payload)))
    assert (m["width"], m["height"]) == (640, 480)


def test_webp_vp8x_canvas_and_exif_chunk():
    from evm_archive_spark.operators.exif import image_metadata_of

    vp8x = bytes([0x08]) + b"\x00\x00\x00" + (1023).to_bytes(
        3, "little"
    ) + (767).to_bytes(3, "little")
    m = image_metadata_of(
        _riff_webp((b"VP8X", vp8x), (b"EXIF", _std_block()))
    )
    assert (m["width"], m["height"]) == (1024, 768)
    assert m["make"] == "CamCorp" and m["has_gps"] == 1


def test_strip_exif_webp_and_partial_jpeg():
    """ADVICE r6: WebP EXIF chunks are spliced out (RIFF size patched,
    VP8X EXIF flag cleared), and a JPEG whose segment walk dies AFTER
    an Exif APP1 still has that segment removed."""
    # WebP: VP8X + EXIF(with GPS) -> scrub removes the chunk losslessly
    vp8x = bytes([0x08]) + b"\x00\x00\x00" + (1023).to_bytes(
        3, "little"
    ) + (767).to_bytes(3, "little")
    webp = _riff_webp((b"VP8X", vp8x), (b"EXIF", _std_block()))
    m0 = exif.image_metadata_of(webp)
    assert m0["has_gps"] == 1
    out, nseg, nbytes = exif.strip_exif_bytes(webp)
    assert nseg == 1 and nbytes > 0
    m = exif.image_metadata_of(out)
    assert m["has_gps"] == 0 and m["make"] is None
    assert (m["width"], m["height"]) == (1024, 768)  # canvas untouched
    # container self-consistent: RIFF size matches, EXIF flag cleared
    assert struct.unpack_from("<I", out, 4)[0] == len(out) - 8
    assert out[20] & 0x08 == 0
    # idempotent
    again, n2, _ = exif.strip_exif_bytes(out)
    assert n2 == 0 and again == out

    # JPEG with Exif APP1 then a corrupt tail: the APP1 still goes
    jpg = _jpeg_with_exif(_std_block())
    cut = jpg[: len(jpg) - 4]  # lop the scan tail -> walk raises late
    out2, nseg2, _ = exif.strip_exif_bytes(cut)
    assert nseg2 == 1
    assert b"Exif\x00\x00" not in out2


def test_scrub_exif_residual_gps(spark):
    """scrub_exif surfaces residual_gps=1 for structural-TIFF EXIF the
    splice can't remove, 0 for scrubbed JPEGs and opaque payloads."""
    import pandas as pd

    payloads = [
        _jpeg_with_exif(_std_block()),
        _std_block(),  # structural TIFF carrying a GPS IFD
        b"opaque bytes",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [0, 1, 2], "payload": payloads})
    )
    rows = {r["media_id"]: r for r in exif.scrub_exif(df).collect()}
    assert rows[0]["removed_segments"] == 1 and rows[0]["residual_gps"] == 0
    # TIFF EXIF is structural (IFD0 IS the image directory): the splice
    # passes it through and residual_gps flags it for quarantine
    assert rows[1]["removed_segments"] == 0 and rows[1]["residual_gps"] == 1
    assert rows[2]["residual_gps"] == 0


def test_webp_corrupt_raises_exif_error():
    from evm_archive_spark.operators.exif import ExifError, image_metadata_of

    with pytest.raises(ExifError):
        image_metadata_of(_riff_webp((b"VP8L", b"\x00\x00")))
    with pytest.raises(ExifError):
        image_metadata_of(_riff_webp((b"ALPH", b"\x00\x00")))
