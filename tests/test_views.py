"""End-to-end view parity: the generated per-event views (init.sql:213-222)
over the logs fixture, including the corrected README worked example
(README.md:158-179, G13)."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from evm_archive_spark import fixtures, views


def test_transfer_view_readme_golden(spark):
    logs = fixtures.logs_df(spark)
    views.register_event_views(spark, logs)
    row = (
        spark.table("Transfer_address_from_address_to_uint256_amount_d")
        .filter(F.col("evt_block_number") == 222431)
        .collect()
    )
    # the README row appears twice in the fixture (duplicate PK row)
    assert len(row) == 2
    r = row[0]
    assert r["from"] == "0x0000000000000000000000000000000000000000"
    assert r["to"] == fixtures.README_TO_ADDR
    assert r["amount"] == Decimal(fixtures.README_AMOUNT)
    assert r["contract_address"] == fixtures.README_CONTRACT
    assert r["evt_block_time"] is None  # never populated (get_logs.go:118-119)


def test_all_default_views_register_and_run(spark):
    logs = fixtures.logs_df(spark)
    names = views.register_event_views(spark, logs)
    assert len(names) == 10
    counts = {n: spark.table(n).count() for n in names}
    assert counts["Transfer_address_from_address_to_uint256_amount_d"] == 13
    assert counts["Approval_address_owner_address_spender_uint256_amount_d"] == 4
    assert (
        counts[
            "Deposit_address_caller_address_owner_uint256_assets_d_uint256_shares_d"
        ]
        == 4
    )


def test_deposit_two_word_decode(spark):
    logs = fixtures.logs_df(spark)
    views.register_event_views(spark, logs)
    rows = (
        spark.table(
            "Deposit_address_caller_address_owner_uint256_assets_d_uint256_shares_d"
        )
        .orderBy("evt_block_number")
        .collect()
    )
    assert [(r["assets"], r["shares"]) for r in rows] == [
        (Decimal(1000), Decimal(2500)),
        (Decimal(2000), Decimal(5000)),
        (Decimal(3000), Decimal(7500)),
        (Decimal(4000), Decimal(10000)),
    ]


def test_topic0_filter_pushdown(spark, tmp_path):
    """The view's topic0 equality must reach the parquet scan (the Spark
    analog of the reference's btree index path, schema.sql:59)."""
    logs = fixtures.logs_df(spark)
    path = str(tmp_path / "logs_parquet")
    logs.write.mode("overwrite").parquet(path)
    pq = spark.read.parquet(path)
    spec = [s for s in views.DEFAULT_EVENTS if s.name == "Transfer"][0]
    df = views.event_view_df(pq, spec)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "ddf252ad" in plan  # the topic0 literal reached the scan


def test_catalog_deployment_layout(spark):
    from evm_archive_spark import catalog, fixtures

    db = catalog.create_deployment(spark, "moonbeam", "mainnet", "test")
    assert db == "moonbeam_mainnet_test"
    logs = fixtures.logs_df(spark)
    full = catalog.register_layer_table(spark, db, "data", "logs", logs)
    assert full == "moonbeam_mainnet_test.data_logs"
    assert spark.table(full).count() == logs.count()
    v = catalog.register_layer_view(
        spark, db, "event", "recent",
        f"SELECT * FROM {full} WHERE block_number > 0",
    )
    assert spark.table(v).count() > 0
    spark.sql(f"DROP VIEW {v}")
    spark.sql(f"DROP TABLE {full}")
    spark.sql(f"DROP DATABASE {db}")


def test_catalog_rejects_bad_identifiers():
    import pytest as _pytest

    from evm_archive_spark import catalog

    with _pytest.raises(ValueError):
        catalog.database_name("moon;beam", "mainnet")


def test_bootstrap_sql_matches_dataframe_views(spark):
    from evm_archive_spark import fixtures, views
    from evm_archive_spark.functions import decode

    decode.register_sql_functions(spark)
    fixtures.logs_df(spark).createOrReplaceTempView("logs")
    for stmt in views.bootstrap_sql("logs").split(";\n\n"):
        spark.sql(stmt)
    sql_rows = sorted(
        tuple(r)
        for r in spark.table(
            "Transfer_address_from_address_to_uint256_amount_d"
        ).collect()
    )
    df_rows = sorted(
        tuple(r)
        for r in views.event_view_df(
            fixtures.logs_df(spark),
            next(s for s in views.DEFAULT_EVENTS if s.name == "Transfer"),
        ).collect()
    )
    assert sql_rows == df_rows and len(sql_rows) > 0


def test_keccak_known_vectors():
    from evm_archive_spark.functions.keccak import event_topic0, keccak256

    # canonical ERC-20 Transfer topic0 (README.md:172-179 constant)
    assert event_topic0("Transfer(address,address,uint256)") == (
        "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
    )
    assert event_topic0("Approval(address,address,uint256)") == (
        "0x8c5be1e5ebec7d5bd14f71427d1e84f3dd0314c0f7b2291e5b200ac8c7c3b925"
    )
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    # multi-block message (> 136-byte rate) exercises absorb loop
    assert keccak256(b"a" * 200).hex() == keccak256(b"a" * 100 + b"a" * 100).hex()


def test_from_abi_matches_default_transfer_spec(spark):
    from evm_archive_spark import fixtures, views

    abi = [
        {
            "type": "event",
            "name": "Transfer",
            "inputs": [
                {"type": "address", "name": "from", "indexed": True},
                {"type": "address", "name": "to", "indexed": True},
                {"type": "uint256", "name": "amount", "indexed": False},
            ],
        },
        {"type": "function", "name": "transfer", "inputs": []},
        {"type": "event", "name": "Anon", "anonymous": True, "inputs": []},
    ]
    specs = views.from_abi(abi)
    assert len(specs) == 1
    spec = specs[0]
    default = next(s for s in views.DEFAULT_EVENTS if s.name == "Transfer")
    assert spec.topic0 == default.topic0
    assert spec.view_name == default.view_name
    # and the generated view decodes identically to the hand-declared one
    logs = fixtures.logs_df(spark)
    a = sorted(map(tuple, views.event_view_df(logs, spec).collect()))
    b = sorted(map(tuple, views.event_view_df(logs, default).collect()))
    assert a == b and len(a) > 0


def test_from_abi_expands_tuple_types():
    """Canonical event signatures expand tuple components recursively —
    keccak('Ev(tuple)') would be a wrong topic0 that matches nothing."""
    import pytest

    from evm_archive_spark import views
    from evm_archive_spark.functions.keccak import event_topic0

    abi = [
        {
            "type": "event",
            "name": "OrderPlaced",
            "inputs": [
                {"type": "address", "name": "maker", "indexed": True},
                {
                    "type": "tuple",
                    "name": "order",
                    "components": [
                        {"type": "address", "name": "token"},
                        {"type": "uint256", "name": "amount"},
                    ],
                },
                {
                    "type": "tuple[]",
                    "name": "fills",
                    "components": [
                        {"type": "uint256", "name": "qty"},
                        {
                            "type": "tuple",
                            "name": "leg",
                            "components": [{"type": "bytes32", "name": "h"}],
                        },
                    ],
                },
            ],
        }
    ]
    (spec,) = views.from_abi(abi)
    want = event_topic0(
        "OrderPlaced(address,(address,uint256),(uint256,(bytes32))[])"
    )
    assert spec.topic0 == want

    with pytest.raises(ValueError, match="components"):
        views.from_abi(
            [
                {
                    "type": "event",
                    "name": "Bad",
                    "inputs": [{"type": "tuple", "name": "x"}],
                }
            ]
        )
