"""Archive fan-out tests: zip + tar member walks, bomb bounds,
corrupt-payload contract, and the composition into code curation."""

from __future__ import annotations

import io
import tarfile
import zipfile

import pytest

from evm_archive_spark.operators import archive


def _zip(members, compression=zipfile.ZIP_DEFLATED) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression) as zf:
        for name, data in members:
            zf.writestr(name, data)
    return buf.getvalue()


def _tar(members, gz=False) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz" if gz else "w") as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
        d = tarfile.TarInfo("emptydir")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
    return buf.getvalue()


MEMBERS = [("a.py", b"print(1)\n"), ("pkg/b.py", b"x = 2\n")]


def test_zip_and_tar_members():
    for payload in (
        _zip(MEMBERS),
        _zip(MEMBERS, zipfile.ZIP_STORED),
        _tar(MEMBERS),
    ):
        got = list(archive.archive_members(payload))
        assert [(p, s) for p, s, _ in got] == [
            ("a.py", 9), ("pkg/b.py", 6),
        ]
        assert got[0][2] == b"print(1)\n"
    # gzipped tar unwraps through one capped decompress (r8)
    got = list(archive.archive_members(_tar(MEMBERS, gz=True)))
    assert [(p, s) for p, s, _ in got] == [("a.py", 9), ("pkg/b.py", 6)]


def test_bounds_and_corruption():
    big = _zip([("big.bin", b"x" * 1000), ("ok.txt", b"y")])
    got = list(archive.archive_members(big, max_member_bytes=100))
    assert [p for p, _, _ in got] == ["ok.txt"]
    with pytest.raises(archive.ArchiveError):
        list(archive.archive_members(b"not an archive"))
    # truncated zip: typed error only (guard normalization)
    z = _zip(MEMBERS)
    for cut in range(4, len(z), 23):
        try:
            list(archive.archive_members(z[:cut]))
        except archive.ArchiveError:
            pass


def test_explode_archives_spark_and_code_composition(spark):
    import pandas as pd

    from evm_archive_spark.operators.sourcecode import code_stats

    repo_zip = _zip(
        [
            ("src/ok.py", b"def f():\n    return 1\n"),
            ("src/min.js", b"var " + b"x=1;" * 300),
        ]
    )
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [0, 1],
                "payload": [repo_zip, b"junk bytes"],
            }
        )
    )
    members = archive.explode_archives(df, strict=False)
    rows = sorted(
        (r["media_id"], r["path"], r["size"])
        for r in members.collect()
    )
    assert rows == [
        (0, "src/min.js", 1204),
        (0, "src/ok.py", 22),
    ]
    with pytest.raises(Exception, match="ArchiveError|not a zip"):
        archive.explode_archives(
            df.filter("media_id = 1"), strict=True
        ).collect()

    # members flow straight into the code lane
    texts = members.selectExpr(
        "media_id * 1000000 + crc32(encode(path, 'UTF-8')) AS doc_id",
        "decode(payload, 'UTF-8') AS text",
    )
    stats = code_stats(texts).collect()
    assert {r["n_long_lines"] for r in stats} == {0, 1}


# -- single-stream decompression (gzip/bz2/xz wrappers) ----------------------

def test_decompress_payload_all_codecs():
    import bz2
    import gzip
    import lzma

    from evm_archive_spark.operators.archive import (
        ArchiveError,
        compression_kind,
        decompress_payload,
    )

    data = b"hello corpus " * 100
    for blob, kind in (
        (gzip.compress(data), "gzip"),
        (bz2.compress(data), "bzip2"),
        (lzma.compress(data, format=lzma.FORMAT_XZ), "xz"),
    ):
        assert compression_kind(blob) == kind
        assert decompress_payload(blob) == data
    # multi-member gzip decodes all members
    two = gzip.compress(b"one.") + gzip.compress(b"two.")
    assert decompress_payload(two) == b"one.two."
    # bombs and truncations raise typed errors
    import pytest

    big = gzip.compress(b"\x00" * 1000)
    with pytest.raises(ArchiveError):
        decompress_payload(big, max_out=10)
    with pytest.raises(ArchiveError):
        decompress_payload(gzip.compress(data)[:-4])
    with pytest.raises(ArchiveError):
        decompress_payload(b"not compressed")


def test_document_extract_transparent_gzip(spark):
    import gzip

    from evm_archive_spark.operators.extract import document_extract

    rows = [
        (1, bytearray(gzip.compress("plain body text".encode()))),
        (2, bytearray(gzip.compress(b"<html><p>marked up</p></html>"))),
        (3, bytearray(b"\x1f\x8b broken gzip")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in document_extract(df).collect()}
    assert out[1].format == "text" and out[1].text == "plain body text"
    assert out[2].format == "html" and out[2].text == "marked up"
    # corrupt stream falls through as raw (never fails the job)
    assert out[3].format == "text"


# -- ar / cpio members (round 7) ------------------------------------------------

def _mk_ar(members: list[tuple[str, bytes]], gnu_long: bool = False) -> bytes:
    """Independent ar writer (BSD short names or GNU long-name table)."""
    out = bytearray(b"!<arch>\n")
    longtab = bytearray()
    names = []
    for name, _data in members:
        if gnu_long or len(name) > 15:
            names.append(f"/{len(longtab)}")
            longtab += name.encode() + b"/\n"
        else:
            names.append(name + "/")
    if longtab:
        hdr = f"{'//':<16}{'':<12}{'':<6}{'':<6}{'':<8}{len(longtab):<10}".encode()
        out += hdr + b"`\n" + longtab
        if len(longtab) & 1:
            out += b"\n"
    for nm, (_name, data) in zip(names, members):
        hdr = f"{nm:<16}{'0':<12}{'0':<6}{'0':<6}{'100644':<8}{len(data):<10}".encode()
        out += hdr + b"`\n" + data
        if len(data) & 1:
            out += b"\n"
    return bytes(out)


def _mk_cpio(members: list[tuple[str, bytes]]) -> bytes:
    """Independent cpio newc writer."""
    out = bytearray()

    def entry(name: str, data: bytes, mode: int):
        nm = name.encode() + b"\x00"
        hdr = b"070701" + b"".join(
            f"{v:08X}".encode()
            for v in (0, mode, 0, 0, 1, 0, len(data), 0, 0, 0, 0,
                      len(nm), 0)
        )
        out.extend(hdr + nm)
        out.extend(b"\x00" * (-len(out) % 4))
        out.extend(data)
        out.extend(b"\x00" * (-len(out) % 4))

    for name, data in members:
        entry(name, data, 0o100644)
    entry("TRAILER!!!", b"", 0)
    return bytes(out)


def test_ar_members_short_and_gnu_long_names():
    from evm_archive_spark.operators.archive import (
        archive_kind,
        archive_members,
    )

    members = [("hello.txt", b"hello world"), ("data.bin", b"\x00\x01ab")]
    b = _mk_ar(members)
    assert archive_kind(b) == "ar"
    assert [(n, d) for n, _s, d in archive_members(b)] == members

    longname = "a-very-long-member-name-over-16-chars.txt"
    b = _mk_ar([(longname, b"long payload")], gnu_long=True)
    got = list(archive_members(b))
    assert got == [(longname, 12, b"long payload")]

    # odd-size member alignment: second member still parses
    b = _mk_ar([("odd", b"xyz"), ("next", b"ok")])
    assert [n for n, _s, _d in archive_members(b)] == ["odd", "next"]


def test_cpio_members_and_trailer():
    from evm_archive_spark.operators.archive import (
        ArchiveError,
        archive_kind,
        archive_members,
    )

    members = [("etc/conf", b"key=value\n"), ("bin/x", b"\x7fELFfake")]
    b = _mk_cpio(members)
    assert archive_kind(b) == "cpio"
    assert [(n, d) for n, _s, d in archive_members(b)] == members

    # a directory entry (S_IFDIR) is skipped
    out = bytearray()
    nm = b"adir\x00"
    hdr = b"070701" + b"".join(
        f"{v:08X}".encode()
        for v in (0, 0o040755, 0, 0, 1, 0, 0, 0, 0, 0, 0, len(nm), 0)
    )
    out.extend(hdr + nm)
    out.extend(b"\x00" * (-len(out) % 4))
    dirent = bytes(out)
    b2 = dirent + _mk_cpio(members)[0:]  # dir entry then files+trailer
    assert [n for n, _s, _d in archive_members(b2)] == [
        "etc/conf", "bin/x"
    ]

    # truncation fuzz: typed error or short result, never a crash
    good = _mk_cpio(members)
    for cut in range(0, len(good), 13):
        try:
            list(archive_members(good[:cut]))
        except ArchiveError:
            pass
    good = _mk_ar(members)
    for cut in range(0, len(good), 13):
        try:
            list(archive_members(good[:cut]))
        except ArchiveError:
            pass


def test_compressed_archive_unwrap():
    """.tar.gz / .tgz / .cpio-style wrappers: one capped decompress,
    then the normal member walk; a decompressed archive over the cap
    is a typed error, and non-archive compressed payloads stay typed
    (document_extract's transparent-gzip lane owns those)."""
    import bz2
    import gzip

    def tar_of(members):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for name, data in members:
                ti = tarfile.TarInfo(name)
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))
        return buf.getvalue()

    members = [("a.txt", b"hello tar member"), ("d/b.bin", b"\x00\x01")]
    raw = tar_of(members)
    for wrap in (gzip.compress, bz2.compress):
        got = {n: d for n, _s, d in archive.archive_members(wrap(raw))}
        assert got == dict(members)
    # the cap applies to the DECOMPRESSED archive
    big = tar_of([("big.bin", b"z" * 4096)])
    with pytest.raises(archive.ArchiveError, match="cap"):
        list(archive.archive_members(
            gzip.compress(big), max_member_bytes=1024))
    # compressed NON-archive payloads are still typed errors
    with pytest.raises(archive.ArchiveError):
        list(archive.archive_members(
            gzip.compress(b"just text, no archive")))


def test_zstd_lz4_wrappers():
    """zstd / lz4-frame wrappers (the modern dataset-drop defaults)
    decode through the canonical pyarrow codecs with OUR caps: round
    trips, concatenated zstd frames, bounded bombs, typed truncation,
    and the .tar.zst/.tar.lz4 fan-out."""
    import pyarrow as pa

    from evm_archive_spark.operators.archive import (
        ArchiveError,
        archive_members,
        compression_kind,
        decompress_payload,
    )

    data = b"modern wrapper body " * 400
    for kind in ("zstd", "lz4"):
        comp = pa.Codec(kind).compress(data, asbytes=True)
        assert compression_kind(comp) == kind
        assert decompress_payload(comp) == data
        with pytest.raises(ArchiveError, match="cap"):
            decompress_payload(comp, max_out=64)
        with pytest.raises(ArchiveError):
            decompress_payload(comp[: len(comp) // 2])
        wrapped = pa.Codec(kind).compress(_tar(MEMBERS), asbytes=True)
        got = list(archive_members(wrapped))
        assert [(p, s) for p, s, _ in got] == [("a.py", 9), ("pkg/b.py", 6)]
    # concatenated zstd frames decode fully (the multi-member gzip rule)
    two = (pa.Codec("zstd").compress(b"one.", asbytes=True)
           + pa.Codec("zstd").compress(b"two.", asbytes=True))
    assert decompress_payload(two) == b"one.two."


def test_lzip_wrapper():
    """lzip (.lz — GNU distributes tarballs as .tar.lz): from-scratch
    container walk (coded dict byte, CRC32 + size trailer) over a
    liblzma LZMA1 stream; round trips, multi-member concatenation,
    bombs, trailer/CRC validation, truncation fuzz, .tar.lz fan-out."""
    from evm_archive_spark.operators.archive import (
        ArchiveError,
        archive_members,
        build_lzip,
        compression_kind,
        decompress_payload,
    )

    data = b"lzip wrapper body " * 400
    lz = build_lzip(data)
    assert compression_kind(lz) == "lzip"
    assert decompress_payload(lz) == data
    # multi-member concatenation (the multi-member gzip rule)
    assert decompress_payload(
        build_lzip(b"one.") + build_lzip(b"two.")) == b"one.two."
    # the cap applies to the decompressed payload
    with pytest.raises(ArchiveError, match="cap"):
        decompress_payload(lz, max_out=64)
    # corrupt payload -> CRC or stream error, typed
    bad = bytearray(lz)
    bad[10] ^= 0xFF
    with pytest.raises(ArchiveError):
        decompress_payload(bytes(bad))
    # trailer size lies are typed
    bad2 = bytearray(lz)
    bad2[-12] ^= 0x01                      # data-size field
    with pytest.raises(ArchiveError, match="trailer|CRC|corrupt"):
        decompress_payload(bytes(bad2))
    # truncation fuzz
    for cut in range(0, len(lz), 17):
        try:
            decompress_payload(lz[:cut])
        except ArchiveError:
            pass
    # .tar.lz rides the one-capped-decompress re-dispatch
    got = list(archive_members(build_lzip(_tar(MEMBERS))))
    assert [(p, s) for p, s, _ in got] == [("a.py", 9), ("pkg/b.py", 6)]


def test_document_extract_transparent_zstd_lz4(spark):
    import pandas as pd
    import pyarrow as pa

    from evm_archive_spark.operators.extract import document_extract

    rows = {
        "media_id": [1, 2],
        "payload": [
            bytearray(pa.Codec("zstd").compress(
                b"plain zstd doc text", asbytes=True)),
            bytearray(pa.Codec("lz4").compress(
                b"<html><p>lz4 marked up</p></html>", asbytes=True)),
        ],
    }
    out = {r.media_id: (r.format, r.text) for r in
           document_extract(spark.createDataFrame(pd.DataFrame(rows)))
           .collect()}
    assert out == {1: ("text", "plain zstd doc text"),
                   2: ("html", "lz4 marked up")}


def test_encrypted_zip_members_inventory():
    """Encrypted zip members (general-purpose flag bit 0) inventory
    with name + declared size and a None payload (the 7zAES rule,
    round 10) instead of failing the archive."""
    import io
    import re
    import zipfile

    from evm_archive_spark.operators.archive import archive_members

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("plain.txt", b"hello")
        zf.writestr("secret.txt", b"classified data")
    b = bytearray(buf.getvalue())
    for sig, name_off, flag_off in ((b"PK\x03\x04", 30, 6),
                                    (b"PK\x01\x02", 46, 8)):
        for m in re.finditer(re.escape(sig), b):
            off = m.start()
            if b[off + name_off:].startswith(b"secret"):
                b[off + flag_off] |= 1
    got = list(archive_members(bytes(b)))
    assert got == [("plain.txt", 5, b"hello"),
                   ("secret.txt", 15, None)]
