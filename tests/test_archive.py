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
    # gzipped tar via mode r:* sniffs as neither ustar-at-257 nor PK
    with pytest.raises(archive.ArchiveError):
        list(archive.archive_members(_tar(MEMBERS, gz=True)))


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
