"""JSONL (newline-delimited JSON) corpus interchange.

LLM training corpora travel as JSONL; this is the import/export lane
between this engine's parquet-native tables and that world.  Thin by
design — Spark's JSON source is already distributed, schema-enforced and
codegen-friendly — the operator value is the CONTRACT: an explicit
schema on read (no inference pass over 100 TB, no silent type drift) and
a round-trip fidelity gate (q_jsonl) proving write -> read reproduces
the source table bit-for-bit, including JSON string escaping of
newlines/quotes/unicode in document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def write_jsonl(df: DataFrame, path: str, *, n_files: int | None = None) -> None:
    """Write as JSON Lines (one object per line, gzip-free for seekable
    sharding; compression is an option a real deployment sets)."""
    out = df.repartition(n_files) if n_files else df
    out.write.mode("overwrite").json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: str | StructType = DOCUMENTS_SCHEMA
) -> DataFrame:
    """Schema-enforced JSONL read: malformed lines fail loudly
    (FAILFAST) instead of silently nulling — corruption in a training
    corpus should stop the pipeline, not dilute it."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)
