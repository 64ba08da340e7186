"""Fixed schemas of the engine (SURVEY.md §1.2).

``logs`` mirrors /root/reference schema.sql:36-52; ``price`` mirrors
schema.sql:68-74; ``LOG_RPC_SCHEMA`` is the eth_getLogs wire shape
(get_logs.go:11-21).  Hex payloads stay ``StringType`` (0x-prefixed),
indices are ``LongType`` (hex-parsed uint64), and the raw Chainlink price is
``DecimalType(20,0)`` (USD x 1e8, schema.sql:78-81).
"""

from __future__ import annotations

from pyspark.sql import types as T

# schema.sql:36-52 — one row per emitted EVM event.
# PK / dedup key: (block_hash, transaction_hash, log_index)  [schema.sql:51]
LOGS_SCHEMA = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("topic0", T.StringType()),
        # absent topics are '' (NOT NULL) — get_logs.go:40-43
        T.StructField("topic1", T.StringType()),
        T.StructField("topic2", T.StringType()),
        T.StructField("topic3", T.StringType()),
        # '0x' / '' payloads become NULL — get_logs.go:44-46
        T.StructField("data", T.StringType()),
        T.StructField("block_hash", T.StringType()),
        T.StructField("block_number", T.LongType()),
        T.StructField("transaction_hash", T.StringType()),
        T.StructField("transaction_index", T.LongType()),
        T.StructField("log_index", T.LongType()),
        T.StructField("removed", T.BooleanType()),
        # declared in the reference but never populated by ingestion
        # (get_logs.go:118-119); we keep it nullable for parity.
        T.StructField("block_timestamp", T.TimestampType()),
    ]
)

LOGS_PK = ["block_hash", "transaction_hash", "log_index"]

# schema.sql:68-74 — point-in-time Chainlink price samples.
PRICE_SCHEMA = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("block_number", T.LongType()),
        T.StructField("price", T.DecimalType(20, 0)),
    ]
)

PRICE_PK = ["address", "block_number"]

# Block headers from eth_getBlockByNumber — the enrichment source that
# fills the reference's never-populated block_timestamp (schema.sql:50,
# SURVEY §1.2 / §7 extension).
BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("block_number", T.LongType()),
        T.StructField("block_hash", T.StringType()),
        T.StructField("block_timestamp", T.TimestampType()),
    ]
)

# get_logs.go:11-21 — raw eth_getLogs JSON shape (hex-string numerics,
# topics as a variable-length array).
LOG_RPC_SCHEMA = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("topics", T.ArrayType(T.StringType())),
        T.StructField("data", T.StringType()),
        T.StructField("blockHash", T.StringType()),
        T.StructField("blockNumber", T.StringType()),
        T.StructField("transactionHash", T.StringType()),
        T.StructField("transactionIndex", T.StringType()),
        T.StructField("logIndex", T.StringType()),
        T.StructField("removed", T.BooleanType()),
    ]
)

# Driver-generated synthetic tables (TESTDATA.md / FIXTURES.md §1-2).
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
