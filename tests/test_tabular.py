"""Tabular lane: deterministic dialect sniff, header detection, RFC
4180 quoting, linearization — pure-Python units plus one Spark pass."""

from __future__ import annotations

from evm_archive_spark.operators.tabular import (
    csv_meta_and_text,
    detect_header,
    sniff_delimiter,
)


def test_sniff_comma_and_tab():
    assert sniff_delimiter("a,b,c\n1,2,3\n4,5,6\n") == ","
    assert sniff_delimiter("a\tb\n1\t2\n") == "\t"
    assert sniff_delimiter("x;y;z\n1;2;3\n") == ";"


def test_sniff_rejects_prose_and_single_column():
    assert sniff_delimiter("just a plain sentence\nand another one\n") is None
    assert sniff_delimiter("one\ntwo\nthree\n") is None
    # inconsistent counts -> not tabular
    assert sniff_delimiter("a,b\n1,2,3\n") is None


def test_sniff_prefers_wider_consistent_split():
    # ';' splits into 3 consistent cols, ',' into 2 -> ';' wins
    text = "a,x;b;c\n1,9;2;3\n"
    assert sniff_delimiter(text) == ";"


def test_quoted_delimiter_does_not_break_consistency():
    text = 'id,name,score\n1,"Smith, John",9\n2,"Lee, Ann",8\n'
    assert sniff_delimiter(text) == ","
    meta = csv_meta_and_text(text.encode())
    assert meta["n_cols"] == 3 and meta["has_header"] == 1
    assert "name: Smith, John" in meta["text"].splitlines()[0]


def test_header_detection_rules():
    assert detect_header([["id", "name"], ["1", "x"]]) is True
    assert detect_header([["1", "name"], ["2", "x"]]) is False  # numeric cell
    assert detect_header([["id", ""], ["1", "x"]]) is False  # empty cell
    assert detect_header([["id", "name"], ["a", "x"]]) is False  # no numeric row2
    assert detect_header([["id", "name"]]) is False  # single record


def test_linearization_headerless():
    meta = csv_meta_and_text(b"1|2|3\n4|5|6\n")
    assert meta["format"] == "csv" and meta["delimiter"] == "|"
    assert meta["text"] == "1 | 2 | 3\n4 | 5 | 6"
    assert meta["has_header"] == 0 and meta["n_records"] == 2


def test_tsv_format_tag():
    meta = csv_meta_and_text(b"a\tb\n1\t2\n")
    assert meta["format"] == "tsv"


def test_non_tabular_returns_none():
    assert csv_meta_and_text(b"hello world") is None


def test_csv_extract_spark_and_document_extract_route(spark):
    from evm_archive_spark.operators.extract import document_extract
    from evm_archive_spark.operators.tabular import csv_extract

    csv_b = b"id,score\n1,10\n2,20\n"
    rows = spark.createDataFrame(
        [(1, csv_b, "text/csv"), (2, b"plain words", None)],
        ["media_id", "payload", "mime"],
    )
    out = {r.media_id: r for r in csv_extract(rows).collect()}
    assert out[1].format == "csv" and out[1].n_records == 2
    assert out[1].text == "id: 1 | score: 10\nid: 2 | score: 20"
    assert out[2].format == "text" and out[2].text == "plain words"

    routed = {
        r.media_id: r
        for r in document_extract(rows, mime_col="mime").collect()
    }
    assert routed[1].format == "csv"
    assert routed[1].text.startswith("id: 1 | score: 10")
    assert routed[2].format == "text"


def test_csv_sniff_fuzz_roundtrip():
    """Randomized consistent tables: the sniffed delimiter must be the
    one used to build the table, and the linearization must preserve
    every (stripped) cell — including quoted cells embedding OTHER
    delimiters."""
    import csv
    import io
    import random

    from evm_archive_spark.operators.tabular import DELIMITERS

    rng = random.Random(3)
    for trial in range(60):
        d = rng.choice(DELIMITERS)
        n_cols = rng.randint(2, 6)
        n_rows = rng.randint(2, 8)
        rows = []
        for _r in range(n_rows):
            row = []
            for _c in range(n_cols):
                if rng.random() < 0.25:
                    # a cell embedding a foreign (or own) delimiter
                    row.append(
                        f"x{rng.randint(0,9)}{rng.choice(DELIMITERS)}y"
                    )
                else:
                    row.append(f"v{rng.randint(0, 99)}")
            rows.append(row)
        buf = io.StringIO()
        csv.writer(buf, delimiter=d, quoting=csv.QUOTE_MINIMAL).writerows(
            rows
        )
        meta = csv_meta_and_text(buf.getvalue().encode())
        assert meta is not None, (trial, d, rows)
        assert meta["delimiter"] == d, (trial, d, meta["delimiter"])
        assert meta["n_cols"] == n_cols
        got_cells = [
            line.split(" | ") for line in meta["text"].splitlines()
        ]
        body = rows[1:] if meta["has_header"] else rows
        want = [[c.strip() for c in r] for r in body]
        assert got_cells == want, (trial, d)
