"""WARC (ISO 28500) parsing tests.  The writer below serializes records
straight from the spec, independently of warc.py's parser; gzip framing
uses stdlib gzip (one member per record, the Common Crawl layout)."""

from __future__ import annotations

import gzip

import pytest

from evm_archive_spark.operators.warc import (
    WarcError,
    http_response,
    is_warc,
    warc_pages,
    warc_records,
)


def _record(rtype: str, uri: str, block: bytes, version="1.1") -> bytes:
    fields = [
        f"WARC-Type: {rtype}",
        "WARC-Date: 2026-08-14T00:00:00Z",
        "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000001>",
    ]
    if uri:
        fields.append(f"WARC-Target-URI: {uri}")
    fields.append(f"Content-Length: {len(block)}")
    head = f"WARC/{version}\r\n" + "\r\n".join(fields) + "\r\n\r\n"
    return head.encode() + block + b"\r\n\r\n"


def _http(
    body: bytes,
    status: int = 200,
    ctype: str = "text/html; charset=utf-8",
    chunked: bool = False,
    extra: str = "",
) -> bytes:
    if chunked:
        # two chunks + terminator
        half = len(body) // 2
        body = (
            f"{half:x}".encode() + b"\r\n" + body[:half] + b"\r\n"
            + f"{len(body) - half:x}".encode() + b"\r\n" + body[half:]
            + b"\r\n0\r\n\r\n"
        )
        extra += "Transfer-Encoding: chunked\r\n"
    head = (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n{extra}"
        f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode() + body


def build_warc(pages, gzip_per_record=False, with_noise=True) -> bytes:
    """``pages``: list of (url, html-bytes).  Interleaves the
    non-response noise a real crawl carries."""
    recs = []
    if with_noise:
        recs.append(_record("warcinfo", "", b"software: test-writer\r\n"))
    for url, html in pages:
        if with_noise:
            recs.append(
                _record("request", url, b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
            )
        recs.append(_record("response", url, _http(html)))
    if gzip_per_record:
        return b"".join(gzip.compress(r) for r in recs)
    return b"".join(recs)


PAGES = [
    ("http://a.example/one", b"<html><body><p>alpha beta</p></body></html>"),
    ("http://b.example/two", b"<html><body><p>gamma</p></body></html>"),
]


@pytest.mark.parametrize("gz", [False, True], ids=["plain", "gzip"])
def test_roundtrip_pages(gz):
    data = build_warc(PAGES, gzip_per_record=gz)
    assert is_warc(data)
    got = list(warc_pages(data))
    assert [(u, h) for _, u, h in got] == [
        (u, b.decode()) for u, b in PAGES
    ]
    # record_idx counts ALL records (warcinfo + request + response)
    assert [i for i, _, _ in got] == [2, 4]


def test_record_walk_sees_all_types():
    types = [r["type"] for r in warc_records(build_warc(PAGES))]
    assert types == ["warcinfo", "request", "response", "request", "response"]


def test_chunked_and_charset():
    body = "héllo wörld".encode("latin-1")
    rec = _record(
        "response",
        "http://c.example/",
        _http(body, ctype="text/html; charset=latin-1", chunked=True),
    )
    got = list(warc_pages(rec))
    assert got == [(0, "http://c.example/", "héllo wörld")]
    # and the HTTP layer alone agrees
    status, headers, raw = http_response(
        _http(b"abcdefghij", chunked=True)
    )
    assert status == 200 and raw == b"abcdefghij"


def test_non_200_and_non_html_skipped():
    recs = (
        _record("response", "http://x/404", _http(b"gone", status=404))
        + _record(
            "response", "http://x/img",
            _http(b"\x89PNG", ctype="image/png"),
        )
        + _record("response", "http://x/ok", _http(b"<p>keep</p>"))
    )
    got = list(warc_pages(recs))
    assert [(u, h) for _, u, h in got] == [("http://x/ok", "<p>keep</p>")]


def test_mangled_response_skipped_not_fatal():
    recs = (
        _record("response", "http://x/bad", b"not http at all")
        + _record("response", "http://x/ok", _http(b"<p>fine</p>"))
    )
    assert [(u, h) for _, u, h in warc_pages(recs)] == [
        ("http://x/ok", "<p>fine</p>")
    ]


def test_folded_header_and_bad_charset_fallback():
    block = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html;\r\n charset=no-such-charset\r\n"
        b"\r\n<p>ok</p>"
    )
    rec = _record("response", "http://x/f", block)
    assert [h for _, _, h in warc_pages(rec)] == ["<p>ok</p>"]


def test_truncation_fuzz_raises_only_warc_error():
    for gz in (False, True):
        data = build_warc(PAGES, gzip_per_record=gz)
        for cut in range(0, len(data), 11):
            try:
                list(warc_records(data[:cut]))
            except WarcError:
                pass


def test_gzip_bomb_capped():
    """ADVICE r6: a crafted .warc.gz that inflates far past the cap
    raises WarcError instead of OOMing the executor, while a legitimate
    gzipped WARC under the cap still decodes (cap override exercised via
    _gunzip_members directly)."""
    import gzip

    from evm_archive_spark.operators.warc import _gunzip_members

    bomb = gzip.compress(b"\x00" * (1 << 22))  # 4 MiB of zeros, ~4 KiB gz
    with pytest.raises(WarcError, match="inflates past"):
        _gunzip_members(bomb, max_out=1 << 20)
    ok = build_warc(PAGES, gzip_per_record=True)
    assert _gunzip_members(ok, max_out=1 << 20)[:5] == b"WARC/"
    # and the full record walk still works under the default cap
    assert list(warc_records(ok))


def test_bad_version_and_missing_length():
    with pytest.raises(WarcError, match="version"):
        list(warc_records(b"WARC/9.9\r\nContent-Length: 0\r\n\r\n"))
    with pytest.raises(WarcError, match="Content-Length"):
        list(warc_records(b"WARC/1.1\r\nWARC-Type: response\r\n\r\n"))


def _pooled_warc_through_spark_pipeline(spark):
    """WARC segments through the Spark lane end-to-end: two binary WARC
    payloads (one plain, one per-record-gzip) fan out via warc_to_pages,
    then warc_corpus_pipeline dedups a cross-segment canonical-URL dup
    and strips HTML — the Common Crawl ingest shape."""
    from evm_archive_spark.operators.weburl import (
        warc_corpus_pipeline,
        warc_to_pages,
    )

    seg0 = build_warc(
        [
            ("http://a.example/one?utm_source=x", b"<p>alpha beta gamma delta epsilon zeta eta theta iota kappa</p>"),
            ("http://b.example/two", b"<p>first segment second page with plenty of tokens here ok</p>"),
        ]
    )
    seg1 = build_warc(
        [
            # canonical dup of seg0's first page (tracking param + www)
            ("http://www.a.example/one", b"<p>duplicate page body text should lose to the min doc id</p>"),
            ("http://c.example/three", b"<p>novel third page with plenty of tokens to pass the floor</p>"),
        ],
        gzip_per_record=True,
    )
    media = spark.createDataFrame(
        [(0, bytearray(seg0)), (1, bytearray(seg1))],
        "warc_id long, payload binary",
    )
    pages = warc_to_pages(media).collect()
    assert len(pages) == 4
    assert {r["url"] for r in pages} == {
        "http://a.example/one?utm_source=x", "http://b.example/two",
        "http://www.a.example/one", "http://c.example/three",
    }

    out = {
        r["canonical_url"]: r
        for r in warc_corpus_pipeline(media, min_tokens=5).collect()
    }
    assert set(out) == {
        "http://a.example/one", "http://b.example/two",
        "http://c.example/three",
    }
    # min-doc_id survivor for the cross-segment dup: seg0 record wins
    assert out["http://a.example/one"]["doc_id"] == 2  # warc 0, record 2
    assert out["http://a.example/one"]["text"].startswith("alpha beta")
    assert out["http://c.example/three"]["n_tokens"] >= 5


def test_warc_page_digests_prefers_stamped_field():
    from evm_archive_spark.operators.warc import warc_page_digests

    stamped = _record(
        "response", "http://x/s",
        _http(b"<p>body</p>"),
    ).replace(
        b"WARC-Type: response",
        b"WARC-Type: response\r\nWARC-Payload-Digest: sha1:ABCDEF",
    )
    computed = _record("response", "http://x/c", _http(b"<p>body</p>"))
    got = list(warc_page_digests(stamped + computed))
    assert got[0][1:] == ("http://x/s", "sha1:ABCDEF")
    assert got[1][1] == "http://x/c"
    assert got[1][2].startswith("sha256:")


def test_warc_documents_mixed_types():
    """warc_documents yields HTML rows as decoded text and PDF rows as
    raw bytes; other types and non-200s are skipped."""
    from evm_archive_spark.operators.pdf import build_simple_pdf
    from evm_archive_spark.operators.warc import warc_documents

    pdf_bytes = build_simple_pdf(["pdf body words"])
    data = (
        _record("response", "http://x/h", _http(b"<p>hyper text</p>"))
        + _record(
            "response", "http://x/p",
            _http(pdf_bytes, ctype="application/pdf"),
        )
        + _record(
            "response", "http://x/img",
            _http(b"GIF89a...", ctype="image/gif"),
        )
        + _record(
            "response", "http://x/gone",
            _http(b"<p>x</p>", status=404),
        )
    )
    got = list(warc_documents(data))
    assert [(g[1], g[2]) for g in got] == [
        ("http://x/h", "text/html"),
        ("http://x/p", "application/pdf"),
    ]
    assert got[0][3] == "<p>hyper text</p>" and got[0][4] is None
    assert got[1][3] is None and bytes(got[1][4]) == pdf_bytes


def _pooled_warc_mixed_corpus_html_and_pdf(spark):
    """warc_mixed_corpus end-to-end: one WARC with an HTML page and a
    real (from-scratch-built) PDF — both branches extract text, doc_ids
    follow the dense warc_id*K + record_idx contract."""
    import pandas as pd

    from evm_archive_spark.operators.pdf import build_simple_pdf
    from evm_archive_spark.operators.weburl import warc_mixed_corpus

    pdf_bytes = build_simple_pdf(["alpha pdf prose"], compress=True)
    seg = (
        _record("response", "http://m/h", _http(b"<p>web words</p>"))
        + _record(
            "response", "http://m/p",
            _http(pdf_bytes, ctype="application/pdf"),
        )
    )
    media = spark.createDataFrame(
        pd.DataFrame({"warc_id": [3], "payload": [seg]})
    )
    rows = {
        r["url"]: r for r in warc_mixed_corpus(media).collect()
    }
    assert rows["http://m/h"]["text"] == "web words"
    assert rows["http://m/h"]["doc_id"] == 3_000_000
    assert rows["http://m/p"]["text"] == "alpha pdf prose\n"
    assert rows["http://m/p"]["doc_id"] == 3_000_001
    assert rows["http://m/p"]["content_type"] == "application/pdf"


def _pooled_warc_digest_dedup_before_parse(spark):
    """Content-level dedup across WARC segments on payload digests —
    identical bodies collapse to the first (warc_id, record_idx)
    regardless of URL, before any HTML work."""
    from evm_archive_spark.operators.weburl import warc_digest_dedup

    body = b"<p>identical body shared across three captures</p>"
    seg0 = build_warc(
        [("http://a/x", body), ("http://a/y", b"<p>unique one</p>")]
    )
    seg1 = build_warc(
        [("http://b/z", body), ("http://b/w", b"<p>unique two</p>")],
        gzip_per_record=True,
    )
    media = spark.createDataFrame(
        [(0, bytearray(seg0)), (1, bytearray(seg1))],
        "warc_id long, payload binary",
    )
    rows = sorted(
        (r["warc_id"], r["record_idx"], r["url"])
        for r in warc_digest_dedup(media).collect()
    )
    # the duplicate body keeps only the (0, ...) capture
    assert rows == [
        (0, 2, "http://a/x"),
        (0, 4, "http://a/y"),
        (1, 4, "http://b/w"),
    ]


# --------------------------------------------------------------------------
# Content-Encoding (round 9): gzip / deflate (both framings) / brotli
# --------------------------------------------------------------------------


def _http_block(body: bytes, extra: bytes = b"") -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" + extra
            + b"\r\n" + body)


def test_content_encoding_gzip_deflate_brotli():
    import gzip
    import zlib

    import pyarrow as pa

    from evm_archive_spark.operators.warc import http_response

    raw = b"<html>encoded body</html>" * 20
    cases = [
        (gzip.compress(raw), b"Content-Encoding: gzip\r\n"),
        (gzip.compress(raw), b"Content-Encoding: x-gzip\r\n"),
        (zlib.compress(raw), b"Content-Encoding: deflate\r\n"),
        # raw-deflate servers (no zlib wrapper) are common in the wild
        ((lambda c: c.compress(raw) + c.flush())(
            zlib.compressobj(wbits=-15)),
         b"Content-Encoding: deflate\r\n"),
        (pa.Codec("brotli").compress(raw, asbytes=True),
         b"Content-Encoding: br\r\n"),
        (raw, b"Content-Encoding: identity\r\n"),
        (raw, b""),
    ]
    for enc_body, hdr in cases:
        status, headers, body = http_response(_http_block(enc_body, hdr))
        assert (status, body) == (200, raw), hdr


def test_content_encoding_multi_member_gzip():
    """An HTTP gzip body may hold several concatenated members
    (RFC 1952 §2.2) — all must decode, like the record-level gzip
    walker; trailing non-gzip junk after the last member is ignored
    (gzip(1) behavior)."""
    import gzip

    from evm_archive_spark.operators.warc import http_response

    parts = [b"first member " * 10, b"second " * 20, b"third!" * 5]
    enc = b"".join(gzip.compress(p) for p in parts)
    _, _, body = http_response(
        _http_block(enc, b"Content-Encoding: gzip\r\n"))
    assert body == b"".join(parts)
    # trailing junk that is NOT a gzip member: ignored, first member kept
    _, _, body = http_response(_http_block(
        gzip.compress(parts[0]) + b"\x00junk",
        b"Content-Encoding: gzip\r\n"))
    assert body == parts[0]


def test_content_encoding_raw_deflate_fallback():
    import zlib

    from evm_archive_spark.operators.warc import http_response

    raw = b"raw deflate no wrapper" * 9
    c = zlib.compressobj(wbits=-15)
    enc = c.compress(raw) + c.flush()
    _, _, body = http_response(
        _http_block(enc, b"Content-Encoding: deflate\r\n"))
    assert body == raw


def test_content_encoding_stacked_and_chunked():
    """Stacked encodings decode last-first; chunked transfer decoding
    happens BEFORE content decoding (RFC 9112 ordering)."""
    import gzip

    import pyarrow as pa

    from evm_archive_spark.operators.warc import http_response

    raw = b"stacked" * 30
    double = pa.Codec("brotli").compress(gzip.compress(raw), asbytes=True)
    _, _, body = http_response(_http_block(
        double, b"Content-Encoding: gzip, br\r\n"))
    assert body == raw
    # chunked + br
    br = pa.Codec("brotli").compress(raw, asbytes=True)
    chunked = f"{len(br):x}\r\n".encode() + br + b"\r\n0\r\n\r\n"
    _, _, body = http_response(_http_block(
        chunked,
        b"Content-Encoding: br\r\nTransfer-Encoding: chunked\r\n"))
    assert body == raw


def test_content_encoding_unknown_passes_through_corrupt_is_typed():
    import pytest as _pytest

    from evm_archive_spark.operators.warc import WarcError, http_response

    blob = b"\x01\x02opaque"
    _, _, body = http_response(
        _http_block(blob, b"Content-Encoding: zstd\r\n"))
    assert body == blob                     # unknown token: untouched
    # ANY unknown token in a stack disables decoding entirely
    _, _, body = http_response(
        _http_block(blob, b"Content-Encoding: gzip, zstd\r\n"))
    assert body == blob
    with _pytest.raises(WarcError, match="corrupt"):
        http_response(_http_block(b"\x1f\x8b garbage",
                                  b"Content-Encoding: gzip\r\n"))


def test_content_encoding_bomb_capped():
    import zlib

    import pytest as _pytest

    from evm_archive_spark.operators import warc as W

    bomb = zlib.compress(b"\x00" * 300000)
    block = _http_block(bomb, b"Content-Encoding: deflate\r\n")
    old = W.MAX_BODY_BYTES
    try:
        W.MAX_BODY_BYTES = 65536
        with _pytest.raises(W.WarcError, match="exceeds"):
            W.http_response(block)
    finally:
        W.MAX_BODY_BYTES = old


def test_truncated_compressed_bodies_are_typed():
    """A cut-off gzip/deflate body must raise, not silently decode to
    partial/empty bytes (review finding: missing d.eof check)."""
    import gzip
    import zlib

    import pytest as _pytest

    from evm_archive_spark.operators.warc import WarcError, http_response

    raw = b"<html>cut off mid-stream</html>" * 50
    enc = gzip.compress(raw)
    with _pytest.raises(WarcError, match="truncated|corrupt"):
        http_response(_http_block(enc[: len(enc) // 2],
                                  b"Content-Encoding: gzip\r\n"))
    enc = zlib.compress(raw)
    with _pytest.raises(WarcError, match="truncated|corrupt"):
        http_response(_http_block(enc[: len(enc) // 2],
                                  b"Content-Encoding: deflate\r\n"))
    # raw-deflate whose first two bytes happen to form a valid zlib
    # header still decodes through the fallback (the eof check makes
    # the wbits=15 attempt fail instead of returning partial bytes)
    c = zlib.compressobj(wbits=-15)
    body = c.compress(raw) + c.flush()
    if (body[0] & 0x0F) == 8 and ((body[0] << 8) | body[1]) % 31 == 0:
        _, _, out = http_response(_http_block(
            body, b"Content-Encoding: deflate\r\n"))
        assert out == raw
