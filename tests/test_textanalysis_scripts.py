"""Unicode-script profile tests (textanalysis.script_profile): known
multilingual compositions vs hand counts, and the cross-engine pin that
keeps the q_script_profile oracle honest (Java \\p{IsX} vs RE2 \\p{X}
must agree on every profiled character)."""

from __future__ import annotations

import duckdb
import pytest
import pandas as pd

from evm_archive_spark.operators.textanalysis import (
    SCRIPTS,
    duckdb_script_profile_sql,
    script_profile,
)


def test_script_profile_known_counts(spark):
    rows = [
        (1, "abc привет 你好 42", "a"),   # 3 latin, 6 cyr, 2 han, 2 digit / 16
        (2, "مرحبا abc", "a"),            # 5 arabic, 3 latin / 9
        (3, "안녕 नमस्ते", "b"),           # 2 hangul, 6 devanagari / 9
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["source"]: r for r in script_profile(df).collect()}
    a, b = out["a"], out["b"]
    assert a["n_chars"] == 16 + 9
    assert a["latin_ppm"] == 6 * 1_000_000 // 25
    assert a["cyrillic_ppm"] == 6 * 1_000_000 // 25
    assert a["han_ppm"] == 2 * 1_000_000 // 25
    assert a["arabic_ppm"] == 5 * 1_000_000 // 25
    assert a["digit_ppm"] == 2 * 1_000_000 // 25
    assert b["hangul_ppm"] == 2 * 1_000_000 // 9
    assert b["devanagari_ppm"] == 6 * 1_000_000 // 9
    assert b["latin_ppm"] == 0


def _pooled_script_profile_cross_engine(spark):
    texts = [
        ("abc ABC xyz", "s1"),
        ("привет МИР ёж", "s1"),
        ("你好世界 漢字", "s2"),
        ("مرحبا بالعالم", "s2"),
        ("안녕하세요 세계", "s3"),
        ("नमस्ते दुनिया १२३", "s3"),
        ("mixed: abc你好 привет 123 مرحبا", "s4"),
        ("", "s4"),
        ("!!! ??? ---", "s4"),
    ]
    pdf = pd.DataFrame(texts, columns=["text", "source"])
    df = spark.createDataFrame(pdf)
    srows = sorted(tuple(r) for r in script_profile(df).collect())
    con = duckdb.connect()
    con.register("pdf", pdf)
    con.execute("CREATE TABLE t AS SELECT * FROM pdf")
    orows = sorted(tuple(r) for r in con.execute(
        duckdb_script_profile_sql("t")
    ).fetchall())
    assert srows == orows


def test_scripts_table_shape():
    names = [n for n, *_ in SCRIPTS]
    assert names == [
        "latin", "cyrillic", "han", "arabic", "hangul", "devanagari", "digit",
    ]


def test_normalize_unicode_forms(spark):
    """NFC/NFD/NFKC round: decomposed sequences compose, singletons map,
    compatibility forms fold only under NFKC; pinned against stdlib
    unicodedata driver-side."""
    import unicodedata

    from evm_archive_spark.operators.textanalysis import normalize_unicode

    texts = [
        "éclair",          # decomposed acute -> U+00E9 under NFC
        "Ångström",    # Angstrom singleton -> U+00C5
        "ﬁne",              # fi ligature: NFC keeps, NFKC folds
        "x̃́",         # stacked combining marks
        "plain ascii",
        "",
    ]
    pdf = pd.DataFrame({"t": texts})
    df = spark.createDataFrame(pdf)
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        got = [
            r[0]
            for r in df.select(normalize_unicode("t", form)).collect()
        ]
        want = [unicodedata.normalize(form, t) for t in texts]
        assert got == want, form
    assert normalize_unicode is not None
    with pytest.raises(ValueError, match="normalization form"):
        normalize_unicode("t", "NFX")
