"""HEIF/AVIF metadata face: independent-writer round trips, box-walk
hardening, the image_metadata_of dispatch, and the system-libheif pin
(REAL HEVC- and AV1-coded files — what iPhones and the modern web
actually produce)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from evm_archive_spark.operators.heif import (
    HeifError,
    build_heif_meta,
    heif_metadata,
    is_heif,
)


def test_roundtrip_dims_rotation_brands():
    for avif in (False, True):
        for rot in (0, 1, 2, 3):
            b = build_heif_meta(320, 240, avif=avif, rotation=rot)
            assert is_heif(b)
            m = heif_metadata(b)
            assert m["format"] == ("avif" if avif else "heic")
            assert (m["width"], m["height"]) == (320, 240)
            assert m["orientation"] == {0: 1, 1: 8, 2: 3, 3: 6}[rot]


def _tiff_ifd0(make: bytes, model: bytes) -> bytes:
    """Minimal little-endian TIFF with Make + Model ASCII tags."""
    hdr = b"II*\x00" + struct.pack("<I", 8)
    n = 2
    val_base = 8 + 2 + 12 * n + 4
    entries = struct.pack("<HHII", 0x010F, 2, len(make) + 1, val_base)
    entries += struct.pack("<HHII", 0x0110, 2, len(model) + 1,
                           val_base + len(make) + 1)
    ifd = struct.pack("<H", n) + entries + struct.pack("<I", 0)
    return hdr + ifd + make + b"\x00" + model + b"\x00"


def test_exif_item_through_iloc():
    tiff = _tiff_ifd0(b"Apple", b"iPhone 15 Pro")
    b = build_heif_meta(4032, 3024, exif_tiff=tiff)
    m = heif_metadata(b)
    assert (m["make"], m["model"]) == ("Apple", "iPhone 15 Pro")
    assert (m["width"], m["height"]) == (4032, 3024)


def test_no_ipma_fallback_and_dispatch():
    from evm_archive_spark.operators.exif import image_metadata_of

    b = build_heif_meta(12, 34, with_ipma=False)
    assert heif_metadata(b)["width"] == 12
    m = image_metadata_of(b)
    assert (m["format"], m["width"], m["height"]) == ("heic", 12, 34)


def test_truncation_and_garbage_are_typed():
    good = build_heif_meta(64, 48, exif_tiff=_tiff_ifd0(b"A", b"B"))
    with pytest.raises(HeifError):
        heif_metadata(b"not heif at all")
    for cut in range(8, len(good), 11):
        try:
            heif_metadata(good[:cut])
        except HeifError:
            pass            # typed is fine; silent wrong fields is not
    # corrupting a box size must surface typed, never Mp4Error/struct
    bad = bytearray(good)
    i = bad.find(b"meta") - 4
    struct.pack_into(">I", bad, i, 0xFFFFFF)
    with pytest.raises((HeifError, ValueError)):
        heif_metadata(bytes(bad))


def _libheif():
    import ctypes

    try:
        return ctypes.CDLL("libheif.so.1")
    except OSError:
        return None


def _libheif_encode(lib, w: int, h: int, fmt: int, path: bytes) -> bytes:
    """Encode a real HEIF/AVIF via the system libheif (fmt: 1 = HEVC,
    4 = AV1) and return its bytes."""
    import ctypes as C

    class HErr(C.Structure):
        _fields_ = [("code", C.c_int), ("subcode", C.c_int),
                    ("message", C.c_char_p)]

    lib.heif_context_alloc.restype = C.c_void_p
    for fn, argt in [
        ("heif_context_get_encoder_for_format",
         [C.c_void_p, C.c_int, C.POINTER(C.c_void_p)]),
        ("heif_image_create",
         [C.c_int, C.c_int, C.c_int, C.c_int, C.POINTER(C.c_void_p)]),
        ("heif_image_add_plane",
         [C.c_void_p, C.c_int, C.c_int, C.c_int, C.c_int]),
        ("heif_context_encode_image",
         [C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p,
          C.POINTER(C.c_void_p)]),
        ("heif_context_write_to_file", [C.c_void_p, C.c_char_p]),
    ]:
        getattr(lib, fn).restype = HErr
        getattr(lib, fn).argtypes = argt
    lib.heif_image_get_plane.restype = C.POINTER(C.c_ubyte)
    lib.heif_image_get_plane.argtypes = [C.c_void_p, C.c_int,
                                         C.POINTER(C.c_int)]

    ctx = lib.heif_context_alloc()
    enc = C.c_void_p()
    e = lib.heif_context_get_encoder_for_format(ctx, fmt, C.byref(enc))
    if e.code:
        pytest.skip(f"libheif has no encoder for format {fmt}")
    img = C.c_void_p()
    assert lib.heif_image_create(w, h, 1, 10, C.byref(img)).code == 0
    assert lib.heif_image_add_plane(img, 10, w, h, 8).code == 0
    stride = C.c_int()
    p = lib.heif_image_get_plane(img, 10, C.byref(stride))
    rows = np.zeros((h, stride.value), dtype=np.uint8)
    rows[:, : w * 3] = (np.arange(w * 3, dtype=np.uint32)[None, :]
                        % 256).astype(np.uint8)
    C.memmove(p, rows.tobytes(), rows.size)
    handle = C.c_void_p()
    assert lib.heif_context_encode_image(
        ctx, img, enc, None, C.byref(handle)).code == 0
    assert lib.heif_context_write_to_file(ctx, path).code == 0
    with open(path, "rb") as f:
        return f.read()


@pytest.mark.skipif(_libheif() is None, reason="no system libheif")
def test_real_files_from_system_libheif(tmp_path):
    """The from-scratch meta walk reads REAL libheif-encoded files:
    HEVC-coded HEIC and AV1-coded AVIF, dims and brand exact."""
    lib = _libheif()
    for fmt, want_fmt, name in [(1, "heic", b"t.heic"),
                                (4, "avif", b"t.avif")]:
        path = str(tmp_path / name.decode()).encode()
        data = _libheif_encode(lib, 96, 64, fmt, path)
        assert is_heif(data)
        m = heif_metadata(data)
        assert m["format"] == want_fmt, m
        assert (m["width"], m["height"]) == (96, 64), m


def test_associations_do_not_leak_across_items():
    """When ipma EXISTS, another item's irot/ispe must not be
    attributed to the primary item (review finding: the global ipco
    fallback leaked a thumbnail's rotation onto the primary)."""
    from evm_archive_spark.operators.heif import _box, _full

    brand = b"heic"
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mif1")
    hdlr = _full(b"hdlr", 0, 0,
                 b"\x00" * 4 + b"pict" + b"\x00" * 12 + b"w\x00")
    pitm = _full(b"pitm", 0, 0, struct.pack(">H", 1))
    ispe1 = _full(b"ispe", 0, 0, struct.pack(">II", 4032, 3024))
    ispe2 = _full(b"ispe", 0, 0, struct.pack(">II", 160, 120))
    irot2 = _box(b"irot", bytes([1]))
    ipco = _box(b"ipco", ispe1 + ispe2 + irot2)
    # item 1 (primary) -> prop 1 only; item 2 (thumb) -> props 2+3
    entries = (struct.pack(">I", 2)
               + struct.pack(">H", 1) + bytes([1, 1])
               + struct.pack(">H", 2) + bytes([2, 2, 3]))
    ipma = _full(b"ipma", 0, 0, entries)
    meta = _full(b"meta", 0, 0, hdlr + pitm + _box(b"iprp", ipco + ipma))
    data = ftyp + meta + _box(b"mdat", b"\x00" * 8)
    m = heif_metadata(data)
    assert (m["width"], m["height"]) == (4032, 3024), m
    assert m["orientation"] == 1, m          # thumb's irot must NOT leak


def test_iloc_construction_method_nonzero_is_typed_noop():
    """iloc version 1/2 items with construction_method != 0 carry
    idat-/item-relative extents, NOT file offsets — reading them as
    absolute pulls garbage (r9 ADVICE).  The Exif lookup must be a
    typed no-op: dims still parse, make/model absent."""
    from evm_archive_spark.operators.heif import _box, _full

    brand = b"heic"
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mif1")
    ispe = _full(b"ispe", 0, 0, struct.pack(">II", 10, 20))
    tiff = _tiff_ifd0(b"Apple", b"iPhone")
    exif_blob = struct.pack(">I", 0) + tiff
    infe = _full(b"infe", 2, 0,
                 struct.pack(">HH", 2, 0) + b"Exif" + b"\x00")
    iinf = _full(b"iinf", 0, 0, struct.pack(">H", 1) + infe)
    for method in (1, 2):
        # iloc VERSION 1: u16 item_id, u16 construction_method
        iloc = _full(b"iloc", 1, 0,
                     bytes([0x44, 0x00]) + struct.pack(">H", 1)
                     + struct.pack(">HHH", 2, method, 0)
                     + struct.pack(">H", 1)
                     + struct.pack(">II", 0xAAAAAAAA, len(exif_blob)))
        pitm = _full(b"pitm", 0, 0, struct.pack(">H", 1))
        meta = _full(b"meta", 0, 0,
                     pitm + iinf + iloc
                     + _box(b"iprp", _box(b"ipco", ispe)))
        head = ftyp + meta
        blob = (head + _box(b"mdat", exif_blob)).replace(
            struct.pack(">I", 0xAAAAAAAA), struct.pack(">I", len(head) + 8))
        m = heif_metadata(blob)
        assert (m["width"], m["height"]) == (10, 20), method
        assert m.get("make") is None and m.get("model") is None, method


def test_bare_boxes_and_v3_infe_and_multi_extent_exif():
    from evm_archive_spark.operators.heif import _box, _full

    # bare 8-byte pitm at end of meta: typed/ignored, never IndexError
    brand = b"heic"
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mif1")
    ispe = _full(b"ispe", 0, 0, struct.pack(">II", 10, 20))
    meta = _full(b"meta", 0, 0,
                 _box(b"iprp", _box(b"ipco", ispe)) + _box(b"pitm", b""))
    m = heif_metadata(ftyp + meta)
    assert (m["width"], m["height"]) == (10, 20)

    # infe VERSION 3 (u32 item_ID, type at +10) + Exif split across
    # TWO iloc extents: located and concatenated
    tiff = _tiff_ifd0(b"Apple", b"iPhone")
    exif_blob = struct.pack(">I", 0) + tiff
    cut = len(exif_blob) // 2
    infe = _full(b"infe", 3, 0,
                 struct.pack(">IH", 2, 0) + b"Exif" + b"\x00")
    iinf = _full(b"iinf", 0, 0, struct.pack(">H", 1) + infe)
    iloc = _full(b"iloc", 0, 0,
                 bytes([0x44, 0x00]) + struct.pack(">H", 1)
                 + struct.pack(">HH", 2, 0) + struct.pack(">H", 2)
                 + struct.pack(">II", 0xAAAAAAAA, cut)
                 + struct.pack(">II", 0xBBBBBBBB,
                               len(exif_blob) - cut))
    pitm = _full(b"pitm", 0, 0, struct.pack(">H", 1))
    meta = _full(b"meta", 0, 0,
                 pitm + iinf + iloc
                 + _box(b"iprp", _box(b"ipco", ispe)))
    head = ftyp + meta
    off1 = len(head) + 8
    off2 = off1 + cut
    blob = head + _box(b"mdat", exif_blob + b"\x00" * 4)
    blob = blob.replace(struct.pack(">I", 0xAAAAAAAA),
                        struct.pack(">I", off1))
    blob = blob.replace(struct.pack(">I", 0xBBBBBBBB),
                        struct.pack(">I", off2))
    m = heif_metadata(blob)
    assert (m["make"], m["model"]) == ("Apple", "iPhone"), m
