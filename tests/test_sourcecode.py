"""Code-corpus curation tests: each admission rule pinned on a
constructed file that violates exactly that rule."""

from __future__ import annotations

from evm_archive_spark.operators import sourcecode


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_code_stats_fields(spark):
    good = "def f(x):\n    return x + 1\n# done"
    minified = "x=1;" * 300  # one 1200-char line
    rows = {
        r["doc_id"]: r
        for r in sourcecode.code_stats(
            _df(
                spark,
                [
                    (0, good),
                    (1, minified),
                    (2, "/* auto-generated file */\ncode"),
                    (3, None),
                ],
            )
        ).collect()
    }
    g = rows[0]
    assert g["n_lines"] == 3
    assert g["max_line_len"] == len("    return x + 1")
    assert g["total_chars"] == len(good)
    assert g["alnum_chars"] == sum(c.isalnum() for c in good)
    assert g["n_long_lines"] == 0 and g["autogen"] == 0
    m = rows[1]
    assert m["n_lines"] == 1 and m["max_line_len"] == 1200
    assert m["n_long_lines"] == 1
    assert rows[2]["autogen"] == 1
    assert rows[3]["total_chars"] == 0 and rows[3]["n_lines"] == 1


def test_license_tags(spark):
    rows = {
        r["doc_id"]: r
        for r in sourcecode.license_tags(
            _df(
                spark,
                [
                    (0, "// SPDX-License-Identifier: MIT\ncode"),
                    (1, "# SPDX-License-Identifier:   GPL-3.0-only"),
                    (2, "no tag here"),
                ],
            )
        ).collect()
    }
    assert rows[0]["license"] == "MIT" and rows[0]["permissive"] == 1
    assert rows[1]["license"] == "GPL-3.0-only"
    assert rows[1]["permissive"] == 0
    assert rows[2]["license"] == "" and rows[2]["permissive"] == 0


def test_ipynb_cells_and_notebook_text(spark):
    """Real nbformat-shaped JSON: array AND string sources, extra
    fields ignored, raw cells excluded from notebook_to_text, invalid
    JSON yields zero rows."""
    import json as J

    nb = J.dumps(
        {
            "nbformat": 4,
            "metadata": {"kernelspec": {"name": "python3"}},
            "cells": [
                {
                    "cell_type": "markdown",
                    "metadata": {},
                    "source": ["# Title\n", "intro line"],
                },
                {
                    "cell_type": "code",
                    "execution_count": 2,
                    "outputs": [{"output_type": "stream"}],
                    "source": "print('hi')",
                },
                {"cell_type": "raw", "source": ["skip me"]},
            ],
        }
    )
    df = _df(spark, [(0, nb), (1, "not json at all"), (2, None)])
    cells = sorted(
        (r["doc_id"], r["cell_idx"], r["cell_type"], r["source"])
        for r in sourcecode.ipynb_cells(df).collect()
    )
    assert cells == [
        (0, 0, "markdown", "# Title\nintro line"),
        (0, 1, "code", "print('hi')"),
        (0, 2, "raw", "skip me"),
    ]
    txt = {
        r["doc_id"]: r
        for r in sourcecode.notebook_to_text(df).collect()
    }
    assert list(txt) == [0]
    assert txt[0]["text"] == "# Title\nintro line\nprint('hi')"
    assert txt[0]["n_cells"] == 2


def _winnow_reference(text, k=5, window=4):
    """Independent python replay of the winnowing construction."""
    import hashlib

    toks = [t for t in text.split() if t]
    ghs = [
        int(
            hashlib.md5(
                " ".join(toks[i : i + k]).encode()
            ).hexdigest()[:8],
            16,
        )
        for i in range(len(toks) - k + 1)
    ]
    if not ghs:
        return set()
    if len(ghs) < window:
        return {min(ghs)}
    return {
        min(ghs[j : j + window]) for j in range(len(ghs) - window + 1)
    }


def test_winnow_fingerprints_vs_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "short one",
        "",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon",
    ]
    df = _df(spark, list(enumerate(texts)))
    got = {}
    for r in sourcecode.winnow_fingerprints(df).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _winnow_reference(t), i


def test_winnow_guarantee_and_clone_pairs(spark):
    """The winnowing guarantee: a shared run of >= k + window - 1
    tokens between two otherwise-different documents produces >= 1
    shared fingerprint; clone_pairs surfaces exactly that pair."""
    shared = "copyright acme corp all rights reserved license header"
    a = "totally unrelated preamble words here " + shared + " tail a"
    b = shared + " completely different body text with other words"
    c = "no overlap with anything else at all in this file body"
    fps = sourcecode.winnow_fingerprints(
        _df(spark, [(1, a), (2, b), (3, c)])
    )
    pairs = sourcecode.clone_pairs(fps, min_shared=1).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]


def test_code_filter_each_rule(spark):
    ok = "short lines\n" * 20
    rows = [
        (0, ok),
        (1, "y" * 1500),                       # max line length
        (2, ("w" * 150 + "\n") * 5),           # avg line length
        (3, "!@# $%^ &*()\n" * 10),            # alnum fraction
        (4, "// do not edit\n" + ok),          # autogen marker
    ]
    got = sorted(
        r["doc_id"]
        for r in sourcecode.code_filter(_df(spark, rows)).collect()
    )
    assert got == [0]
    # autogen drop is optional
    got2 = sorted(
        r["doc_id"]
        for r in sourcecode.code_filter(
            _df(spark, rows), drop_autogen=False
        ).collect()
    )
    assert got2 == [0, 4]
