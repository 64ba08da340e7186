"""Namespace layout: one catalog database per (chain, network, namespace).

Mirrors the reference's db-per-deployment convention
(`moonbeam_mainnet_prod` — db-create.sql:5-10, db-create.sh:10-12,43) and
its three-layer schema semantics (schema.sql:1-4, README.md:56-67):

- ``data``  — raw ingested tables (`logs`, `price`)
- ``event`` — decoded canonical event views
- label layers per project (``aave``, ``erc20``, …) — curated views

Spark has a single-level database namespace, so the layers become a name
prefix inside the per-deployment database (``data_logs``,
``event_Transfer_...``) — same addressing semantics, catalog-native.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_NAME = re.compile(r"^[A-Za-z0-9_]+$")


def database_name(chain: str, network: str, namespace: str = "prod") -> str:
    """`moonbeam_mainnet_prod` naming convention (db-create.sh:10-12)."""
    parts = (chain, network, namespace)
    for p in parts:
        if not _NAME.match(p):
            raise ValueError(f"invalid namespace part: {p!r}")
    return "_".join(parts)


def create_deployment(
    spark: SparkSession, chain: str, network: str, namespace: str = "prod"
) -> str:
    db = database_name(chain, network, namespace)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    return db


def register_layer_table(
    spark: SparkSession, db: str, layer: str, name: str, df: DataFrame
) -> str:
    """Persist a DataFrame as the managed table `<db>.<layer>_<name>`
    (the ``data`` layer: real storage, parquet under the warehouse dir)."""
    if not _NAME.match(layer) or not _NAME.match(name):
        raise ValueError(f"invalid identifier: {layer!r}/{name!r}")
    full = f"{db}.{layer}_{name}"
    df.write.mode("overwrite").saveAsTable(full)
    return full


def register_layer_view(
    spark: SparkSession, db: str, layer: str, name: str, sql_text: str
) -> str:
    """Register the persistent view `<db>.<layer>_<name>` over persistent
    tables (the ``event`` / label layers: decode views, curated views)."""
    if not _NAME.match(layer) or not _NAME.match(name):
        raise ValueError(f"invalid identifier: {layer!r}/{name!r}")
    full = f"{db}.{layer}_{name}"
    spark.sql(f"CREATE OR REPLACE VIEW {full} AS {sql_text}")
    return full
