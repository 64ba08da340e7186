"""Unified document_extract tests: content sniffing (no MIME),
email-html routing, dirty-payload fallbacks."""

from __future__ import annotations

import json

from evm_archive_spark.operators import extract
from evm_archive_spark.operators.pdf import build_simple_pdf


def test_sniff_dispatch(spark):
    import pandas as pd

    nb = json.dumps(
        {
            "cells": [
                {"cell_type": "code", "source": ["x = 1\n", "y = 2"]},
                {"cell_type": "raw", "source": "skip"},
            ]
        }
    ).encode()
    mbox = (
        b"From: a@x.com\nSubject: s\n"
        b"Content-Type: text/plain\n\nmail body"
    )
    payloads = [
        build_simple_pdf(["pdf words"]),
        b"From a@x Mon\n" + mbox,
        nb,
        b"<!DOCTYPE html><html><p>web</p></html>",
        b"just plain prose",
        b'{"cells": "not a real notebook"}',  # bad cells -> plain text
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": range(len(payloads)), "payload": payloads}
        )
    )
    rows = {
        r["media_id"]: (r["format"], r["text"])
        for r in extract.document_extract(df).collect()
    }
    assert rows[0] == ("pdf", "pdf words\n")
    assert rows[1] == ("email", "mail body")
    assert rows[2] == ("ipynb", "x = 1\ny = 2")
    assert rows[3] == ("html", "web")
    assert rows[4] == ("text", "just plain prose")
    assert rows[5][0] == "text"


def test_mime_wins_and_email_html(spark):
    import pandas as pd

    html_mail = (
        b"From: h@x.com\nSubject: h\n"
        b"Content-Type: text/html\n\n<p>rich <b>mail</b></p>"
    )
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [0, 1],
                "mime": ["text/markdown", "message/rfc822"],
                "payload": [b"# heading\nbody", html_mail],
            }
        )
    )
    rows = {
        r["media_id"]: (r["format"], r["text"])
        for r in extract.document_extract(df, mime_col="mime").collect()
    }
    assert rows[0] == ("markdown", "heading\nbody")
    # html-only mail routes through the JVM html stripper
    assert rows[1] == ("html", "rich mail")
