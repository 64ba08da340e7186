"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's headline use-case end-to-end —
    decode raw EVM logs through the generated ``Transfer_...`` view
    (init.sql:221) and join the decoded flow against the TPC-H-ish
    fixtures at sf0.001 (broadcast join + aggregation).

    Mirrors README.md:172-179's worked example query shape.
    """
    from pyspark.sql import functions as F

    from evm_archive_spark import fixtures, views
    from evm_archive_spark.tables import register_testdata

    register_testdata(spark, "/root/testdata/sf0.001")
    logs = fixtures.logs_df(spark)
    views.register_event_views(spark, logs)
    transfers = spark.table("Transfer_address_from_address_to_uint256_amount_d")
    return (
        transfers.filter(~F.col("from").rlike("^0x0{40}$"))
        .groupBy("contract_address")
        .agg(
            F.count(F.lit(1)).alias("n_transfers"),
            F.sum("amount").cast("decimal(38,0)").alias("total_amount"),
            F.max("evt_block_number").alias("last_block"),
        )
        .orderBy("contract_address")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (see
    evm_archive_spark/parity/queries.py for the registry)."""
    from evm_archive_spark.parity.queries import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for the
    non-SQL-expressible ops, which get the weaker rows-only check)."""
    from evm_archive_spark.parity.queries import oracle_queries

    return oracle_queries()
