"""evm_archive_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of SummaryDev/evm-archive.

The reference (/root/reference) is an EVM-log ELT pipeline: a Go ingestion
loop (JSON-RPC -> Postgres, main.go) plus a SQL library of ABI decoders and
generated per-event views (init.sql), with the relational surface delegated
to Postgres.  This package re-expresses all of it Spark-first:

- ``functions.decode``   — the 20 ABI decoders (init.sql:53-207) as native
  Column expressions + Spark SQL scalar UDFs (whole-stage-codegen friendly).
- ``functions.hexutils`` — hex<->decimal conversions (types.go:27-39).
- ``views``              — the generated per-event decoded views
  (init.sql:213-222) as catalog temp views.
- ``sources``            — ndjson replay + JSON-RPC block-range sources
  (main.go / get_logs.go re-architected as partitioned Spark reads).
- ``sinks``              — idempotent conflict-ignoring DBAPI sink
  (get_logs.go:118-132 semantics) via foreachBatch.
- ``streaming``          — watermark/window semantics over event streams.
- ``operators``          — as-of join (schema.sql:78-81), dedup, similarity
  search, text analysis (north-star extensions).
- ``parity``             — the declared correctness query set (SURVEY.md
  §2.1) with paired DuckDB oracle SQL.
"""

__version__ = "0.1.0"
