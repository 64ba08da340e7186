"""Tabular (CSV/TSV) payloads -> linearized text for corpus admission.

Tabular files are a large slice of any crawled or uploaded-document
corpus, and feeding them to a text pipeline raw wastes the structure:
a delimiter-aware linearization ("header: value" pairs per record)
both reads better and tokenizes ~identically across dialects.  This
module gives the pipeline:

- a **deterministic dialect sniff** (no csv.Sniffer heuristics —
  candidate delimiters are scored by field-count consistency over the
  leading records, so the same bytes always sniff the same way),
- **header detection** (first record all-non-numeric + a numeric cell
  in the second record — the rule that separates a header row from a
  data row without locale guessing),
- **linearization** via the stdlib ``csv`` reader (RFC 4180 quoting —
  embedded delimiters and quoted quotes handled), emitting one line
  per record: ``h1: v1 | h2: v2`` with a header, ``v1 | v2`` without.

Spark-side: one ``mapInPandas`` Arrow pass (``csv_extract``), map-side
only; ``document_extract`` (extract.py) routes ``text/csv`` /
``text/tab-separated-values`` MIME rows here.
"""

from __future__ import annotations

import csv
import io
import re
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: sniff candidates, in tie-break preference order
DELIMITERS = (",", "\t", ";", "|")

_NUM_RE = re.compile(r"^-?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


class CsvError(ValueError):
    """Raised on undecodable/degenerate tabular payloads in strict mode."""


def _records(text: str, delim: str, limit: int | None = None) -> list[list[str]]:
    rdr = csv.reader(io.StringIO(text), delimiter=delim)
    out = []
    for rec in rdr:
        if rec and any(f.strip() for f in rec):
            out.append(rec)
            if limit is not None and len(out) >= limit:
                break
    return out


def sniff_delimiter(text: str, probe_records: int = 20) -> str | None:
    """Deterministic dialect sniff: the delimiter (from ``DELIMITERS``)
    whose field count over the first ``probe_records`` records is
    (a) at least 2 and (b) identical on every record.  Ties break by
    the larger field count, then by ``DELIMITERS`` order.  Returns
    ``None`` when nothing qualifies (payload is not tabular)."""
    best: tuple[int, int] | None = None  # (n_cols, -pref_index)
    best_d = None
    for i, d in enumerate(DELIMITERS):
        try:
            recs = _records(text, d, probe_records)
        except csv.Error:
            continue
        if len(recs) < 2:
            continue
        counts = {len(r) for r in recs}
        if len(counts) != 1:
            continue
        n = counts.pop()
        if n < 2:
            continue
        key = (n, -i)
        if best is None or key > best:
            best, best_d = key, d
    return best_d


def detect_header(records: list[list[str]]) -> bool:
    """Header iff the first record has no numeric and no empty cell
    while the second record has at least one numeric cell."""
    if len(records) < 2:
        return False
    first, second = records[0], records[1]
    if any(not c.strip() or _NUM_RE.match(c.strip()) for c in first):
        return False
    return any(_NUM_RE.match(c.strip()) for c in second)


def csv_meta_and_text(payload: bytes) -> dict | None:
    """Sniff + parse + linearize one payload.  Returns ``None`` when the
    payload does not sniff as tabular (caller falls through to plain
    text)."""
    text = payload.decode("utf-8", errors="replace")
    delim = sniff_delimiter(text)
    if delim is None:
        return None
    records = _records(text, delim)
    has_header = detect_header(records)
    header = records[0] if has_header else None
    body = records[1:] if has_header else records
    lines = []
    for rec in body:
        cells = [c.strip() for c in rec]
        if header is not None:
            lines.append(
                " | ".join(
                    f"{h.strip()}: {c}" for h, c in zip(header, cells)
                )
            )
        else:
            lines.append(" | ".join(cells))
    return {
        "format": "csv" if delim != "\t" else "tsv",
        "delimiter": delim,
        "n_records": len(body),
        "n_cols": len(records[0]),
        "has_header": 1 if has_header else 0,
        "text": "\n".join(lines),
    }


def jsonl_records(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    text_path: str = "$.text",
    meta_paths: dict[str, str] | None = None,
) -> DataFrame:
    """JSONL payloads -> one row per record: ``(media_id, rec_no,
    text_out, <meta columns>)`` — the unwrap step for the most common
    LLM-corpus interchange format (one JSON object per line, text under
    a known key).

    Pure JVM: newline split + explode + ``get_json_object`` path
    extraction (schema-free — no ``from_json`` schema to declare, so
    heterogeneous records coexist).  Lines that are not JSON objects or
    lack the text path yield NULL ``text_out`` (callers filter) —
    nothing ever fails on a dirty line.  ``meta_paths`` maps extra
    output columns to JSON paths (e.g. ``{"src": "$.metadata.source"}``).

    100-TB shape: rides the scan, no UDF, no shuffle — the fan-out
    twin of ``sitemap_urls`` for the JSONL world.
    """
    from pyspark.sql import functions as F

    c = F.col(payload_col)
    if dict(df.dtypes).get(payload_col) == "binary":
        c = F.decode(c, "UTF-8")
    lines = F.filter(F.split(c, "\r?\n"), lambda s: F.trim(s) != "")
    ex = df.select(
        F.col(id_col).alias("media_id"),
        F.posexplode(lines).alias("rec_no", "__line"),
    )
    cols = [
        "media_id",
        (F.col("rec_no") + 1).cast("long").alias("rec_no"),
        F.get_json_object(F.col("__line"), text_path).alias("text_out"),
    ]
    for name, path in (meta_paths or {}).items():
        cols.append(F.get_json_object(F.col("__line"), path).alias(name))
    return ex.select(*cols)


CSV_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("delimiter", T.StringType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("n_cols", T.LongType()),
        T.StructField("has_header", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def csv_extract(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
) -> DataFrame:
    """Tabular payloads -> ``(media_id, format, delimiter, n_records,
    n_cols, has_header, text)``.  Non-tabular payloads pass through as
    ``format='text'`` with the raw decode (``strict=True`` raises
    instead) — the admission contract: a dirty payload never fails the
    job.  One Arrow ``mapInPandas`` pass, map-side only."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = {k.name: [] for k in CSV_EXTRACT_SCHEMA.fields}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload or b"")
                try:
                    meta = csv_meta_and_text(b)
                except (csv.Error, ValueError):
                    meta = None
                if meta is None:
                    if strict:
                        raise CsvError(f"payload {mid}: not tabular")
                    meta = {
                        "format": "text",
                        "delimiter": None,
                        "n_records": 0,
                        "n_cols": 0,
                        "has_header": 0,
                        "text": b.decode("utf-8", errors="replace"),
                    }
                rows["media_id"].append(mid)
                for k, v in meta.items():
                    rows[k].append(v)
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, CSV_EXTRACT_SCHEMA)
