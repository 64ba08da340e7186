"""Email/MIME extraction tests: mbox splitting, transfer decodings,
html-only fallback, charset fallback, attachment accounting."""

from __future__ import annotations

import pytest

from evm_archive_spark.operators import mail


def _msg(subject=b"hi", body=b"plain body", extra_headers=b""):
    return (
        b"From: a@x.com\nSubject: " + subject + b"\n"
        b"Date: Mon, 02 Feb 2026 10:00:00 +0000\n" + extra_headers
        + b"Content-Type: text/plain; charset=\"utf-8\"\n\n" + body
    )


def test_mbox_split_and_bare_message():
    mbox = (
        b"From a@x.com Mon Feb  2 10:00:00 2026\n"
        + _msg(b"one")
        + b"\nFrom b@x.com Mon Feb  2 11:00:00 2026\n"
        + _msg(b"two")
    )
    msgs = list(mail.mbox_messages(mbox))
    assert len(msgs) == 2
    assert mail.parse_email(msgs[0])["subject"] == "one"
    assert mail.parse_email(msgs[1])["subject"] == "two"
    # bare message (no mbox From line) passes through whole
    assert len(list(mail.mbox_messages(_msg()))) == 1
    assert list(mail.mbox_messages(b"")) == []


def test_quoted_printable_and_charset_fallback():
    qp = (
        b"From: q@x.com\nSubject: qp\n"
        b"Content-Type: text/plain; charset=\"utf-8\"\n"
        b"Content-Transfer-Encoding: quoted-printable\n\n"
        b"caf=C3=A9 soft=\nwrap"
    )
    assert mail.parse_email(qp)["body"] == "café softwrap"
    # declared charset lies: utf-8 replacement fallback, never a crash
    lying = (
        b"From: l@x.com\nSubject: l\n"
        b"Content-Type: text/plain; charset=\"utf-8\"\n\n"
        b"\xff\xfe broken"
    )
    assert "�" in mail.parse_email(lying)["body"]


def test_html_only_fallback_and_attachments():
    m = (
        b"From: h@x.com\nSubject: h\nMIME-Version: 1.0\n"
        b"Content-Type: multipart/mixed; boundary=\"B\"\n\n"
        b"--B\nContent-Type: text/html\n\n<p>markup</p>\n"
        b"--B\nContent-Type: image/png\n"
        b"Content-Transfer-Encoding: base64\n\nAAAA\n"
        b"--B\nContent-Type: application/pdf\n"
        b"Content-Disposition: attachment; filename=\"d.pdf\"\n\nx\n"
        b"--B--\n"
    )
    row = mail.parse_email(m)
    assert row["is_html"] and "<p>markup</p>" in row["body"]
    assert row["n_attachments"] == 2  # inline image + explicit attach


def test_emails_to_rows_spark(spark):
    import pandas as pd

    mbox = (
        b"From a@x.com Mon Feb  2 10:00:00 2026\n" + _msg(b"s1")
        + b"\nFrom b@x.com Mon Feb  2 11:00:00 2026\n"
        + _msg(b"s2", b"second body")
    )
    df = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [0, 1], "payload": [mbox, b"\x00not mail"]}
        )
    )
    rows = sorted(
        (r["media_id"], r["msg_idx"], r["subject"], r["body"])
        for r in mail.emails_to_rows(df, strict=False).collect()
    )
    # the junk payload still "parses" as a headerless message (RFC 5322
    # parsers are maximally tolerant) — it yields empty headers
    assert (0, 0, "s1", "plain body") in rows
    assert (0, 1, "s2", "second body") in rows
    assert len(rows) == 3 and rows[2][2] == ""
