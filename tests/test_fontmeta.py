"""Font metadata (operators/fontmeta.py): TTF/OTF/WOFF/WOFF2 round
trips through the independent writers, name-table platform
preference, typed boundaries."""

from __future__ import annotations

import struct

import pytest

from evm_archive_spark.operators.fontmeta import (
    FontError,
    build_ttf,
    build_woff,
    build_woff2,
    font_kind,
    font_metadata,
    is_font,
)


def test_roundtrip_all_containers():
    ttf = build_ttf(family="Fam A", subfamily="Italic", n_glyphs=77,
                    units_per_em=1000, weight=300,
                    version="Version 3.1")
    want = {"family": "Fam A", "subfamily": "Italic", "n_glyphs": 77,
            "units_per_em": 1000, "weight_class": 300,
            "version": "Version 3.1", "full_name": "Fam A Italic",
            "postscript_name": "FamA-Italic"}
    for wrap, kind in ((lambda b: b, "sfnt"), (build_woff, "woff"),
                       (build_woff2, "woff2")):
        b = wrap(ttf)
        assert is_font(b) and font_kind(b) == kind
        m = font_metadata(b)
        assert m["container"] == kind
        for k, v in want.items():
            assert m[k] == v, (kind, k)
    # OTF flavor
    otf = build_ttf(flavor=b"OTTO")
    assert font_metadata(otf)["flavor"] == "otf"
    assert font_metadata(build_woff(otf))["flavor"] == "otf"


def test_name_table_platform_preference():
    from evm_archive_spark.operators.fontmeta import _parse_name

    # windows (3/1) beats mac-roman (1/0) for the same name id;
    # mac-roman is the fallback when it is the only record
    win_name = "WinNm".encode("utf-16-be")
    both = (struct.pack(">HHH", 0, 2, 6 + 24)
            + struct.pack(">HHHHHH", 1, 0, 0, 1, 5, 0)
            + struct.pack(">HHHHHH", 3, 1, 0x409, 1,
                          len(win_name), 5)
            + b"MacNm" + win_name)
    assert _parse_name(both)["family"] == "WinNm"
    mac_only = (struct.pack(">HHH", 0, 1, 18)
                + struct.pack(">HHHHHH", 1, 0, 0, 1, 5, 0) + b"MacNm")
    assert _parse_name(mac_only)["family"] == "MacNm"
    # build_ttf writes platform 3/1 records
    assert font_metadata(build_ttf(family="WinName"))["family"] \
        == "WinName"


def test_typed_boundaries():
    with pytest.raises(FontError, match="not a font"):
        font_metadata(b"nope")
    ttf = build_ttf()
    # head magic mismatch is typed
    bad = bytearray(ttf)
    i = bad.index(struct.pack(">I", 0x5F0F3CF5))
    struct.pack_into(">I", bad, i, 0xDEADBEEF)
    with pytest.raises(FontError, match="head table magic"):
        font_metadata(bytes(bad))
    # truncated WOFF/WOFF2 are typed
    w = build_woff(ttf)
    with pytest.raises(FontError):
        font_metadata(w[:60])
    w2 = build_woff2(ttf)
    with pytest.raises(FontError):
        font_metadata(w2[:-20])
    # corrupt zlib table is typed
    w = bytearray(build_woff(ttf))
    w[-8:] = b"\xff" * 8
    with pytest.raises(FontError):
        font_metadata(bytes(w))
