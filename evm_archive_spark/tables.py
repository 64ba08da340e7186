"""Register the driver's parquet fixtures as temp views.

Views keep the plan declarative: Catalyst pushes filters/projections into
the parquet scan (PushedFilters / ReadSchema), which is the Spark analog of
the reference's nine btree indexes (schema.sql:54-62).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def sf_dir_from_env() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table.

    ``events.parquet`` stores TIMESTAMP(NANOS), which Spark's parquet reader
    rejects by default; we read it as nanos-since-epoch longs
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microsecond
    TimestampType — the same ns->us truncation DuckDB applies, so both
    engines see identical timestamps.
    """
    from pyspark.sql import functions as F

    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS BIGINT)"))
            )
        return df
    return spark.read.parquet(path)


_REGISTERED_MARKER = "spark.evm_archive.registered_sf_dir"


def register_testdata(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """createOrReplaceTempView for each driver fixture table.

    Idempotent per (session, sf_dir): repeated calls (every parity query
    invokes this) skip the re-read unless the sf_dir changed."""
    if tables is None and spark.conf.get(_REGISTERED_MARKER, None) == sf_dir:
        return
    for name in tables or TESTDATA_TABLES:
        if os.path.exists(f"{sf_dir}/{name}.parquet"):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    if tables is None:
        spark.conf.set(_REGISTERED_MARKER, sf_dir)
