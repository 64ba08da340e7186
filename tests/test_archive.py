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
