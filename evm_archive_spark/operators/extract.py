"""Unified document-to-text dispatch — the single entry point a corpus
builder calls on a heterogeneous payload column.

Routes each payload to the right extractor by declared MIME type when
available (crawls and datasets usually carry one) with a content sniff
fallback, then applies the markup strippers JVM-side:

    application/pdf            -> pdf.extract_pdf_text (from scratch)
    message/rfc822 / mbox      -> mail.parse_email body
    ZIP document family        -> officedoc.zip_to_text: ONE container
      (.docx .xlsx .pptx          open dispatched on member names /
       .odt .ods .odp .epub)      mimetype member, then the format's
                                  from-scratch extractor
    .rtf                       -> officedoc.rtf_to_text (from scratch)
    .doc/.xls/.ppt (CFB/OLE2)  -> officedoc.cfb_to_text (one container
                                  parse; piece table / BIFF8 / PPT
                                  record walk)
    .sqlite/.db                -> sqlitefile.sqlite_to_text (b-tree walk)
    .avro                      -> avrofile.avro_to_text (JSONL face)
    .parquet / Arrow IPC       -> columnar.parquet_to_text /
                                  arrow_ipc_to_text (JSONL face)
    msgpack (MIME only)        -> msgpackfile.msgpack_to_text (the
                                  format has no magic; never sniffed)
    protobuf (MIME only)       -> protowire.protowire_to_text
                                  (schemaless field dump; no magic)
    .ipynb JSON                -> notebook cells (code+markdown)
    text/html                  -> weburl.html_to_text (JVM regexp)
    text/markdown              -> textanalysis.markdown_to_text (JVM)
    text/csv / tsv             -> tabular.csv_meta_and_text linearization
    anything else              -> text as-is (utf-8, replacement)

Row-EXPANDING formats stay explicit by design: archives
(``archive.explode_archives``), WARC segments
(``weburl.warc_mixed_corpus``), subtitles (``subtitles.subtitle_cues``)
produce many rows per payload and belong before this call, not inside
it.

Plan shape: one mapInPandas pass does the binary-side work (PDF, MIME,
notebook JSON) and tags html/markdown rows for the pure-JVM strippers
applied in the SAME projection afterwards — two map stages, no
shuffle."""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def _notebook_text(raw: str) -> str | None:
    try:
        nb = json.loads(raw)
        cells = nb["cells"]
    except (ValueError, TypeError, KeyError):
        return None
    out = []
    for c in cells:
        if not isinstance(c, dict):
            return None
        if c.get("cell_type") not in ("code", "markdown"):
            continue
        src = c.get("source", "")
        out.append("".join(src) if isinstance(src, list) else str(src))
    return "\n".join(out)


def document_extract(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    mime_col: str | None = None,
) -> DataFrame:
    """Heterogeneous payloads -> ``(media_id, format, text)``.  When
    ``mime_col`` is given it wins; otherwise the payload is sniffed.
    Never fails on dirty payloads (the admission contract): a corrupt
    PDF/notebook falls through to plain text."""
    from .archive import ArchiveError, compression_kind, decompress_payload
    from .avrofile import AvroError, avro_to_text, is_avro
    from .columnar import (
        ColumnarError,
        arrow_ipc_to_text,
        is_arrow_ipc,
        is_parquet,
        parquet_to_text,
    )
    from .mail import MailError, parse_email
    from .msgpackfile import MsgpackError, msgpack_to_text
    from .protowire import ProtoWireError, protowire_to_text
    from .officedoc import (
        OfficeDocError,
        cfb_to_text,
        is_doc,
        is_rtf,
        rtf_to_text,
        zip_to_text,
    )
    from .latex import is_latex as _is_latex
    from .latex import latex_to_text as _latex_to_text
    from .pdf import PdfError, extract_pdf_text, is_pdf
    from .sqlitefile import SqliteError, is_sqlite, sqlite_to_text
    from .tabular import csv_meta_and_text
    from .textanalysis import markdown_to_text
    from .vcal import VcalError, is_vcal, vcal_to_text
    from .weburl import html_to_text

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf_b in it:
            mimes = (
                pdf_b[mime_col]
                if mime_col is not None
                else [None] * len(pdf_b)
            )
            out = {"media_id": [], "format": [], "text": []}
            for mid, payload, mime in zip(
                pdf_b[id_col], pdf_b[payload_col], mimes
            ):
                b = bytes(payload or b"")
                m = (mime or "").lower()
                # transparent single-stream decompression (.jsonl.gz /
                # .txt.bz2 / .xz corpus wrappers): unwrap, then
                # dispatch on the inner bytes; a corrupt/bomb stream
                # falls through as raw bytes (admission contract)
                if compression_kind(b) is not None:
                    try:
                        b = decompress_payload(b)
                    except ArchiveError:
                        pass
                fmt, text = None, None
                if "pdf" in m or (not m and is_pdf(b)):
                    try:
                        text, _np = extract_pdf_text(b)
                        fmt = "pdf"
                    except (PdfError, NotImplementedError):
                        pass
                # the whole ZIP document family (docx/xlsx/pptx, the
                # ODF trio, epub) dispatches through ONE container
                # open on member names / mimetype member — not one
                # is_* reopen per format
                if fmt is None and (
                    "wordprocessingml" in m
                    or "spreadsheetml" in m
                    or "presentationml" in m
                    or "opendocument" in m
                    or "epub" in m
                    or (not m and b[:4] == b"PK\x03\x04")
                    # real-world mislabeling: servers routinely declare
                    # .xlsx/.docx with the LEGACY MIME types; when the
                    # bytes are ZIP, the member-name dispatch (not the
                    # CFB walk) is what can extract them
                    or (
                        b[:4] == b"PK\x03\x04"
                        and (
                            m.endswith("ms-excel")
                            or m.endswith("msword")
                            or "powerpoint" in m
                        )
                    )
                ):
                    try:
                        fmt, text = zip_to_text(b)
                    except OfficeDocError:
                        pass
                if fmt is None and (
                    m.endswith("msword")
                    or m.endswith("ms-excel")
                    # the legacy PowerPoint MIME zoo: ms-powerpoint,
                    # mspowerpoint, x-mspowerpoint, plain powerpoint
                    # (the word never appears in the OOXML
                    # presentationml MIME, so no overlap)
                    or "powerpoint" in m
                    or (not m and is_doc(b))
                ):
                    try:
                        fmt, text = cfb_to_text(b)
                    except OfficeDocError:
                        pass
                if fmt is None and ("rtf" in m or is_rtf(b)):
                    try:
                        text, fmt = rtf_to_text(b), "rtf"
                    except OfficeDocError:
                        pass
                if fmt is None and (
                    "sqlite" in m or (not m and is_sqlite(b))
                ):
                    try:
                        text, fmt = sqlite_to_text(b), "sqlite"
                    except SqliteError:
                        pass
                if fmt is None and (
                    "avro" in m or (not m and is_avro(b))
                ):
                    try:
                        text, fmt = avro_to_text(b), "avro"
                    except AvroError:
                        pass
                if fmt is None and (
                    "parquet" in m or (not m and is_parquet(b))
                ):
                    try:
                        text, fmt = parquet_to_text(b), "parquet"
                    except ColumnarError:
                        pass
                if fmt is None and (
                    "arrow" in m or "feather" in m
                    or (not m and is_arrow_ipc(b))
                ):
                    try:
                        text, fmt = arrow_ipc_to_text(b), "arrow"
                    except ColumnarError:
                        pass
                if fmt is None and "msgpack" in m:
                    try:
                        text, fmt = msgpack_to_text(b), "msgpack"
                    except MsgpackError:
                        pass
                if fmt is None and "protobuf" in m:
                    try:
                        text, fmt = protowire_to_text(b), "protobuf"
                    except ProtoWireError:
                        pass
                if fmt is None and (
                    "calendar" in m or "vcard" in m
                    or (not m and is_vcal(b))
                ):
                    try:
                        fmt, text = vcal_to_text(b)
                    except VcalError:
                        pass
                if fmt is None and (
                    "rfc822" in m
                    or (not m and b.startswith(b"From "))
                ):
                    try:
                        row = parse_email(b)
                        fmt = "email"
                        text = row["body"] or ""
                        if row["is_html"]:
                            fmt = "html"  # JVM strip downstream
                    except MailError:
                        pass
                if fmt is None:
                    raw = b.decode("utf-8", errors="replace")
                    stripped = raw.lstrip("﻿ \t\r\n")
                    low = stripped[:256].lower()
                    if "ipynb" in m or (
                        not m
                        and stripped.startswith("{")
                        and '"cells"' in low
                    ):
                        text = _notebook_text(stripped)
                        fmt = "ipynb" if text is not None else None
                    if fmt is None and (
                        "csv" in m or "tab-separated" in m or "tsv" in m
                    ):
                        meta = csv_meta_and_text(b)
                        if meta is not None:
                            fmt, text = meta["format"], meta["text"]
                    if fmt is None and (
                        "html" in m
                        or (
                            not m
                            and (
                                low.startswith("<!doctype")
                                or low.startswith("<html")
                            )
                        )
                    ):
                        fmt, text = "html", raw
                    if fmt is None and "markdown" in m:
                        fmt, text = "markdown", raw
                    if fmt is None and (
                        m.split("/")[-1]
                        in ("tex", "x-tex", "latex", "x-latex")
                        or (not m and _is_latex(stripped))
                    ):
                        fmt, text = "latex", _latex_to_text(raw)
                    if fmt is None:
                        fmt, text = "text", raw
                out["media_id"].append(mid)
                out["format"].append(fmt)
                out["text"].append(text)
            yield pd.DataFrame(out)

    tagged = df.mapInPandas(batches, EXTRACT_SCHEMA)
    return tagged.select(
        "media_id",
        "format",
        F.when(F.col("format") == "html", html_to_text("text"))
        .when(F.col("format") == "markdown", markdown_to_text("text"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
