"""Email / MIME extraction (RFC 5322 + mbox), stdlib ``email`` module.

Mail archives are a classic text-corpus modality (support threads,
mailing lists, the Enron-style datasets); ingesting them needs header
extraction, MIME-part walking (base64 / quoted-printable transfer
decodings), charset fallback, and attachment accounting — all stdlib,
all per-payload inside Arrow batches (the codec-boundary placement).

``mbox_messages`` splits the classic mbox container (``From `` lines)
into raw RFC 5322 messages; ``parse_email`` extracts the curation
row: sender, subject, date, the FIRST text/plain non-attachment body
(decoded through its declared transfer encoding and charset, utf-8
replacement fallback — mail lies about charsets like crawls do), and
the attachment count.  html-only mail falls back to the first
text/html part's markup (route it through ``weburl.html_to_text``
downstream).

Scale shape: map-side fan-out, no shuffle; one mbox row explodes to
its messages inside the task (same contract as WARC segments and
archives)."""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .codecerrors import guard, guard_iter


class MailError(ValueError):
    pass


@guard_iter(MailError)
def mbox_messages(b: bytes) -> Iterator[bytes]:
    """Split an mbox payload into raw messages (the ``From `` line is
    the separator and is NOT part of the message).  A payload that
    doesn't start with ``From `` is treated as one bare RFC 5322
    message."""
    if not b:
        return
    if not b.startswith(b"From "):
        yield b
        return
    start = b.index(b"\n") + 1 if b"\n" in b else len(b)
    while start < len(b):
        nxt = b.find(b"\nFrom ", start)
        if nxt < 0:
            yield b[start:]
            return
        yield b[start:nxt]
        start = b.index(b"\n", nxt + 1) + 1 if b"\n" in b[nxt + 1:] else len(b)


def _part_text(part) -> str:
    raw = part.get_payload(decode=True)
    if raw is None:
        raw = (part.get_payload() or "").encode()
    charset = part.get_content_charset() or "utf-8"
    try:
        return raw.decode(charset, errors="strict")
    except (LookupError, UnicodeDecodeError):
        return raw.decode("utf-8", errors="replace")


@guard(MailError)
def parse_email(b: bytes) -> dict:
    """One RFC 5322 message -> the curation row dict."""
    import email as _email
    import email.policy as _policy

    msg = _email.message_from_bytes(b, policy=_policy.compat32)
    body = None
    html = None
    n_attachments = 0
    stack = [msg]
    while stack:
        m = stack.pop(0)
        if m.is_multipart():
            stack = list(m.get_payload()) + stack
            continue
        dispo = (m.get("Content-Disposition") or "").lower()
        ctype = m.get_content_type()
        if "attachment" in dispo:
            n_attachments += 1
            continue
        if ctype == "text/plain" and body is None:
            body = _part_text(m)
        elif ctype == "text/html" and html is None:
            html = _part_text(m)
        elif not ctype.startswith("text/"):
            n_attachments += 1
    return {
        "from_addr": (msg.get("From") or "").strip(),
        "subject": (msg.get("Subject") or "").strip(),
        "date_raw": (msg.get("Date") or "").strip(),
        "body": body if body is not None else html,
        "is_html": body is None and html is not None,
        "n_attachments": n_attachments,
    }


EMAIL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("msg_idx", T.LongType()),
        T.StructField("from_addr", T.StringType()),
        T.StructField("subject", T.StringType()),
        T.StructField("date_raw", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("is_html", T.LongType()),
        T.StructField("n_attachments", T.LongType()),
    ]
)


def emails_to_rows(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
) -> DataFrame:
    """Mail payloads (mbox or single message) -> one row per message.
    ``strict=False``: an unparseable payload yields zero rows (never
    fails the job); ``strict=True`` raises ``MailError``."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        cols = [f.name for f in EMAIL_SCHEMA.fields]
        for pdf in it:
            out = {c: [] for c in cols}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload or b"")
                try:
                    for i, raw in enumerate(mbox_messages(b)):
                        row = parse_email(raw)
                        out["media_id"].append(mid)
                        out["msg_idx"].append(i)
                        out["from_addr"].append(row["from_addr"])
                        out["subject"].append(row["subject"])
                        out["date_raw"].append(row["date_raw"])
                        out["body"].append(row["body"])
                        out["is_html"].append(int(row["is_html"]))
                        out["n_attachments"].append(
                            row["n_attachments"]
                        )
                except MailError:
                    if strict:
                        raise
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, EMAIL_SCHEMA)
