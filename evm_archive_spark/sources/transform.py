"""Ingestion transform stage: LogRpc wire shape -> LogDb storage shape.

Re-expresses the reference's ``NewLogDb`` (get_logs.go:38-55, operators
A5-A7) as one declarative select — all JVM-side column expressions, no
Python in the row path:

- A5  topics[0..3] -> topic0..topic3, absent entries become ``''``
      (NOT NULL — the Go fixed ``[4]string`` semantics, get_logs.go:40-43)
- A6  hex -> decimal for blockNumber / transactionIndex / logIndex
      (types.go:27-34)
- A7  data ``'0x'`` / ``''`` -> NULL (get_logs.go:44-46)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hexutils import from_hex_long
from ..schemas import LOGS_SCHEMA


def _topic(n: int):
    # try_element_at: NULL (not an error) when the topic is absent — then
    # coalesce to '' to preserve the reference's empty-string semantics.
    return F.coalesce(
        F.try_element_at(F.col("topics"), F.lit(n + 1)), F.lit("")
    ).alias(f"topic{n}")


def log_rpc_to_log_db(df: DataFrame) -> DataFrame:
    """Wire-shape DataFrame (LOG_RPC_SCHEMA) -> storage shape (LOGS_SCHEMA)."""
    data = F.col("data")
    return df.select(
        F.col("address"),
        _topic(0),
        _topic(1),
        _topic(2),
        _topic(3),
        F.when(data.isNull() | data.isin("0x", ""), F.lit(None))
        .otherwise(data)
        .alias("data"),
        F.col("blockHash").alias("block_hash"),
        from_hex_long("blockNumber").alias("block_number"),
        F.col("transactionHash").alias("transaction_hash"),
        from_hex_long("transactionIndex").alias("transaction_index"),
        from_hex_long("logIndex").alias("log_index"),
        F.col("removed"),
        F.lit(None).cast("timestamp").alias("block_timestamp"),
    )


def read_ndjson_logs(spark, path: str) -> DataFrame:
    """Replay fixture reader: raw eth_getLogs ndjson (the capture format of
    curl-get-logs-moonbeam-loop.sh:11-17) -> storage-shape DataFrame."""
    from ..schemas import LOG_RPC_SCHEMA

    wire = spark.read.schema(LOG_RPC_SCHEMA).json(path)
    out = log_rpc_to_log_db(wire)
    assert [f.name for f in out.schema.fields] == [f.name for f in LOGS_SCHEMA.fields]
    return out
