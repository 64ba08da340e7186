"""WARC (Web ARChive, ISO 28500) parsing — from scratch, stdlib only.

WARC is the container every serious web corpus arrives in (Common Crawl
publishes ~100 TB of it per crawl), so a 100-TB training-data pipeline
starts here: WARC bytes -> (url, html) page rows -> the weburl lane
(canonical dedup -> html_to_text -> quality floor).

Format (the public ISO 28500 / WARC 1.1 spec): a WARC file is a
sequence of records, each

    WARC/1.1\r\n
    <named-fields: WARC-Type, WARC-Target-URI, Content-Length, ...>\r\n
    \r\n
    <Content-Length bytes of block>
    \r\n\r\n

optionally gzip-compressed ONE MEMBER PER RECORD (the Common Crawl
layout — stdlib zlib handles concatenated members incrementally, so a
payload is decompressed record-at-a-time, never fully buffered twice).
A ``response`` record's block is a raw HTTP/1.x response; this module
parses the status line + headers, undoes ``Transfer-Encoding: chunked``
when present, and decodes the body by the Content-Type charset.

Spark-side plumbing lives in ``weburl.warc_to_pages`` (mapInPandas over
Arrow batches — the codec boundary, same placement as the image/audio
decoders).  Reference parity note: the reference has no web surface;
this extends the training-pipeline lane the brief makes first-class.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from .codecerrors import guard, guard_iter


class WarcError(Exception):
    """Malformed or out-of-scope WARC payload."""


_GZIP_MAGIC = b"\x1f\x8b"


def is_warc(data: bytes) -> bool:
    """Plain or per-record-gzipped WARC sniff."""
    if data[:5] in (b"WARC/",):
        return True
    if data[:2] == _GZIP_MAGIC:
        try:
            d = zlib.decompressobj(wbits=31)
            head = d.decompress(data[: 1 << 16], 5)
            return head == b"WARC/"
        except zlib.error:
            return False
    return False


# Total-decompressed cap for a per-record-gzip WARC payload (ADVICE r6:
# the archive.decompress_payload bomb rule applied here too).  One
# Common Crawl WARC slice handed to a single executor task is tens of
# MB compressed; 1 GiB decompressed is far above any legitimate record
# train yet bounds a crafted bomb to executor-safe memory.
MAX_WARC_BYTES = 1 << 30


def _gunzip_members(data: bytes, max_out: int = MAX_WARC_BYTES) -> bytes:
    """Decompress concatenated gzip members (one per record), with the
    TOTAL output capped at ``max_out`` — a crafted .warc.gz record must
    not be able to inflate unbounded and OOM an executor
    (decompression-bomb guard, the ``archive.decompress_payload``
    pattern: decompress with max_length in a loop, raise on excess)."""
    out = bytearray()
    rest = data
    while rest[:2] == _GZIP_MAGIC:
        d = zlib.decompressobj(wbits=31)
        chunk = rest
        while True:
            budget = max_out - len(out) + 1
            out += d.decompress(chunk, budget)
            if len(out) > max_out:
                raise WarcError(
                    f"gzip WARC inflates past {max_out} bytes"
                )
            if d.eof or not d.unconsumed_tail:
                break
            chunk = d.unconsumed_tail
        out += d.flush()
        if len(out) > max_out:
            raise WarcError(f"gzip WARC inflates past {max_out} bytes")
        if not d.eof:
            raise WarcError("truncated gzip member")
        rest = d.unused_data
    if rest.strip(b"\r\n\x00"):
        raise WarcError("trailing non-gzip bytes after gzip members")
    return bytes(out)


def _parse_fields(header: bytes) -> dict[str, str]:
    """Named fields; values may continue onto folded lines (LWS)."""
    fields: dict[str, str] = {}
    last = None
    for line in header.split(b"\r\n"):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            fields[last] += " " + line.strip().decode("latin-1")
            continue
        if b":" not in line:
            raise WarcError(f"malformed field line {line[:40]!r}")
        k, v = line.split(b":", 1)
        last = k.strip().decode("latin-1").lower()
        fields[last] = v.strip().decode("latin-1")
    return fields


@guard_iter(WarcError)
def warc_records(data: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record:
    ``{"type", "uri", "date", "fields", "block"}``.  Handles plain and
    per-record-gzip payloads; Content-Length is authoritative for the
    block (ISO 28500 §4)."""
    if data[:2] == _GZIP_MAGIC:
        data = _gunzip_members(data)
    i = 0
    n = len(data)
    while i < n:
        # tolerate inter-record CRLF padding
        while i < n and data[i : i + 2] == b"\r\n":
            i += 2
        if i >= n:
            return
        if data[i : i + 5] != b"WARC/":
            raise WarcError(f"bad record magic at offset {i}")
        hdr_end = data.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            raise WarcError("truncated record header")
        head = data[i:hdr_end]
        version_line, _, field_bytes = head.partition(b"\r\n")
        version = version_line[5:].decode("latin-1")
        if version not in ("0.18", "1.0", "1.1"):
            raise WarcError(f"unsupported WARC version {version!r}")
        fields = _parse_fields(field_bytes)
        try:
            length = int(fields["content-length"])
        except KeyError:
            raise WarcError("record missing Content-Length") from None
        block_start = hdr_end + 4
        if block_start + length > n:
            raise WarcError("record block overruns payload")
        yield {
            "type": fields.get("warc-type", ""),
            "uri": fields.get("warc-target-uri", ""),
            "date": fields.get("warc-date", ""),
            "fields": fields,
            "block": data[block_start : block_start + length],
        }
        i = block_start + length


def _dechunk(body: bytes) -> bytes:
    out = bytearray()
    i = 0
    while True:
        j = body.find(b"\r\n", i)
        if j < 0:
            raise WarcError("truncated chunked body")
        size_token = body[i:j].split(b";", 1)[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            raise WarcError(f"bad chunk size {size_token[:16]!r}") from None
        if size == 0:
            return bytes(out)
        start = j + 2
        if start + size > len(body):
            raise WarcError("chunk overruns body")
        out += body[start : start + size]
        i = start + size + 2  # skip trailing CRLF


# decoded-body cap per response (the decompress_payload bomb rule)
MAX_BODY_BYTES = 64 * 1024 * 1024

_CE_KNOWN = {"gzip", "x-gzip", "deflate", "br", "identity"}


def _decode_content_encoding(encoding: str, body: bytes,
                             max_out: int) -> bytes:
    """Apply HTTP Content-Encoding (RFC 9110 §8.4.1): gzip/x-gzip,
    deflate (servers send BOTH zlib-wrapped and raw-deflate bodies —
    try wrapped, fall back to raw), and br (brotli — no stdlib
    implementation exists, so the CANONICAL pyarrow codec behind a
    bounded streaming read, the archive.py zstd/lz4 rule).  Stacked
    encodings decode last-listed-first.  If ANY token is unknown the
    body passes through untouched (a crawler records what it got; the
    profile pass flags it) — partial decoding from the wrong end would
    corrupt.  Corrupt streams and cap breaches raise WarcError."""
    tokens = [t.strip().lower() for t in encoding.split(",") if t.strip()]
    if not tokens or any(t not in _CE_KNOWN for t in tokens):
        return body

    def inflate(data: bytes, wbits: int) -> bytes:
        # gzip (wbits=31) bodies may legally hold SEVERAL concatenated
        # members (RFC 1952 §2.2 / RFC 9110) — iterate via unused_data
        # like the record-level gzip walker above; a one-member-only
        # decode would silently truncate (r9 ADVICE).  Trailing bytes
        # that are NOT another gzip member are ignored as junk, which
        # matches gzip(1) and the browsers.
        pieces: list[bytes] = []
        total = 0
        while True:
            d = zlib.decompressobj(wbits=wbits)
            try:
                out = d.decompress(data, max_out + 1 - total)
            except zlib.error as e:
                raise WarcError(f"corrupt deflate/gzip body: {e!r}") from e
            pieces.append(out)
            total += len(out)
            if total > max_out:
                # cap breach: return as-is — the loop's post-check
                # raises OUTSIDE inflate so the deflate raw-fallback
                # (which retries on WarcError from the zlib-wrapped
                # attempt) cannot swallow it
                return b"".join(pieces)
            if not d.eof:
                # a truncated stream "decodes" to partial/empty bytes
                # without error — typed, never silently lossy (this
                # also makes the zlib->raw-deflate fallback correct
                # when a raw body's first bytes coincide with a zlib
                # header)
                raise WarcError("truncated deflate/gzip body")
            if wbits == 31 and d.unused_data.startswith(b"\x1f\x8b"):
                data = d.unused_data
                continue
            return b"".join(pieces)

    for token in reversed(tokens):
        if token == "identity":
            continue
        if token in ("gzip", "x-gzip"):
            body = inflate(body, 31)
        elif token == "deflate":
            try:
                body = inflate(body, 15)
            except WarcError:
                body = inflate(body, -15)      # raw-deflate servers
        else:                                  # br
            import pyarrow as pa

            try:
                st = pa.input_stream(pa.BufferReader(body),
                                     compression="brotli")
                decoded = bytes(st.read(max_out + 1))
            except (OSError, ValueError) as e:
                raise WarcError(f"corrupt brotli body: {e!r}") from e
            body = decoded
        if len(body) > max_out:
            raise WarcError(f"decoded body exceeds {max_out} bytes")
    return body


@guard(WarcError)
def http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """Parse a response record's HTTP block:
    ``(status, lowercase headers, body)`` with chunked transfer
    decoding and Content-Encoding (gzip / deflate / br) applied —
    raw crawls store bodies exactly as the server sent them."""
    hdr_end = block.find(b"\r\n\r\n")
    if hdr_end < 0:
        raise WarcError("truncated HTTP headers")
    head = block[:hdr_end]
    status_line, _, field_bytes = head.partition(b"\r\n")
    parts = status_line.split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise WarcError(f"bad HTTP status line {status_line[:40]!r}")
    status = int(parts[1])
    headers = _parse_fields(field_bytes)
    body = block[hdr_end + 4 :]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    enc = headers.get("content-encoding", "")
    if enc and body:
        body = _decode_content_encoding(enc, body, MAX_BODY_BYTES)
    return status, headers, body


def _charset(content_type: str) -> str:
    for token in content_type.split(";")[1:]:
        k, _, v = token.strip().partition("=")
        if k.strip().lower() == "charset":
            return v.strip().strip('"').strip("'") or "utf-8"
    return "utf-8"


@guard_iter(WarcError)
def warc_pages(data: bytes) -> Iterator[tuple[int, str, str]]:
    """Yield ``(record_idx, url, html)`` for every 200-status text/html
    response record — the crawl-to-corpus entry point.  Non-HTML and
    non-200 responses are skipped (not errors: a real crawl interleaves
    redirects, robots fetches, and binary assets); a body that does not
    decode in its declared charset falls back to UTF-8-with-replacement
    (crawls lie about charsets constantly)."""
    idx = 0
    for rec in warc_records(data):
        i = idx
        idx += 1
        if rec["type"] != "response" or not rec["uri"]:
            continue
        try:
            status, headers, body = http_response(rec["block"])
        except WarcError:
            continue  # one mangled response never drops the whole WARC
        ctype = headers.get("content-type", "")
        if status != 200 or "text/html" not in ctype.lower():
            continue
        try:
            html = body.decode(_charset(ctype), errors="strict")
        except (LookupError, UnicodeDecodeError):
            html = body.decode("utf-8", errors="replace")
        yield i, rec["uri"], html


@guard_iter(WarcError)
def warc_documents(
    data: bytes,
) -> Iterator[tuple[int, str, str, str | None, bytes | None]]:
    """Yield ``(record_idx, url, content_type, text, body)`` for every
    200-status response record of a corpus-relevant type — the
    mixed-content generalization of ``warc_pages``: HTML records carry
    their charset-decoded markup in ``text`` (``body`` None), PDF
    records carry raw bytes in ``body`` (``text`` None) for the
    downstream ``pdf_to_text`` dispatch.  Record indices line up with
    ``warc_pages``/``warc_page_digests`` by construction."""
    idx = 0
    for rec in warc_records(data):
        i = idx
        idx += 1
        if rec["type"] != "response" or not rec["uri"]:
            continue
        try:
            status, headers, body = http_response(rec["block"])
        except WarcError:
            continue
        if status != 200:
            continue
        ctype = headers.get("content-type", "")
        low = ctype.lower()
        if "text/html" in low:
            try:
                text = body.decode(_charset(ctype), errors="strict")
            except (LookupError, UnicodeDecodeError):
                text = body.decode("utf-8", errors="replace")
            yield i, rec["uri"], "text/html", text, None
        elif "application/pdf" in low:
            yield i, rec["uri"], "application/pdf", None, body


@guard_iter(WarcError)
def warc_page_digests(data: bytes) -> Iterator[tuple[int, str, str]]:
    """Yield ``(record_idx, url, payload_digest)`` for every 200-status
    text/html response record — the cheap pre-pass for content-level
    dedup BEFORE any HTML work: the WARC-Payload-Digest named field
    (ISO 28500 §5.9, what Common Crawl stamps on every record) when
    present, else ``sha256:<hex>`` computed over the HTTP body.  Record
    indices line up with ``warc_pages`` by construction, so a dedup
    decision made here maps 1:1 onto the parsed rows."""
    import hashlib

    idx = 0
    for rec in warc_records(data):
        i = idx
        idx += 1
        if rec["type"] != "response" or not rec["uri"]:
            continue
        try:
            status, headers, body = http_response(rec["block"])
        except WarcError:
            continue
        if status != 200 or "text/html" not in headers.get(
            "content-type", ""
        ).lower():
            continue
        digest = rec["fields"].get("warc-payload-digest") or (
            "sha256:" + hashlib.sha256(body).hexdigest()
        )
        yield i, rec["uri"], digest
