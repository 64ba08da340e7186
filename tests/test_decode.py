"""Golden-vector tests for the ABI decode library (FIXTURES.md §4,
reference init.sql:53-207 — intended semantics, defects documented in
SURVEY.md §2.B)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from evm_archive_spark.functions import decode as D, hexutils as H


def w(v: int) -> str:
    return format(v, "064x")


def one(spark, data: str, col):
    df = spark.createDataFrame([(data,)], ["d"]).select(col.alias("v"))
    return df.collect()[0]["v"]


def test_g1_address(spark):
    t = "0x000000000000000000000000f78031c993afb43e79f017938326ff34418ec36e"
    assert one(spark, t, D.to_address(2, "d")) == (
        "0xf78031c993afb43e79f017938326ff34418ec36e"
    )


def test_g2_uint256_single_word(spark):
    d = "0x" + w(12309758656873032528)
    assert one(spark, d, D.to_uint256(2, "d")) == Decimal("12309758656873032528")


def test_g3_two_word_deposit_shape(spark):
    d = "0x" + w(1000) + w(2500)
    df = spark.createDataFrame([(d,)], ["d"]).select(
        D.to_uint256(2, "d").alias("assets"),
        D.to_uint256(66, "d").alias("shares"),
    )
    row = df.collect()[0]
    assert (row["assets"], row["shares"]) == (Decimal(1000), Decimal(2500))


def test_g4_int64_negative(spark):
    d = "0x" + "0" * 48 + "fffffffffffffffe"
    assert one(spark, d, D.to_int64(2, "d")) == -2


def test_int64_edges(spark):
    for v in (2**63 - 1, -(2**63), -1, 0, 1):
        word = w(v % 2**256)[-64:] if v < 0 else w(v)
        d = "0x" + ("f" * 48 + word[48:] if v < 0 else word)
        # build proper two's complement word
        d = "0x" + format(v % 2**64, "016x").rjust(64, "f" if v < 0 else "0")
        assert one(spark, d, D.to_int64(2, "d")) == v


def test_int32_intended(spark):
    # reference to_int32 is infinitely recursive (init.sql:68-72); ours works
    d = "0x" + "0" * 56 + "ffffffff"
    assert one(spark, d, D.to_int32(2, "d")) == -1
    d = "0x" + "0" * 56 + "7fffffff"
    assert one(spark, d, D.to_int32(2, "d")) == 2**31 - 1
    d = "0x" + "0" * 56 + "80000000"
    assert one(spark, d, D.to_int32(2, "d")) == -(2**31)


def test_g5_uint64(spark):
    d = "0x" + "0" * 48 + "0000000100000000"
    assert one(spark, d, D.to_uint64(2, "d")) == Decimal(4294967296)


def test_g6_uint32(spark):
    d = "0x" + "0" * 56 + "000000ff"
    assert one(spark, d, D.to_uint32(2, "d")) == 255


def test_g7_bool(spark):
    assert one(spark, "0x" + w(1), D.to_bool(2, "d")) is True
    assert one(spark, "0x" + w(0), D.to_bool(2, "d")) is False


def test_g8_string_dynamic(spark):
    d = "0x" + w(0x20) + w(5) + "737061726b" + "0" * 54
    assert one(spark, d, D.to_string(2, "d")) == "spark"


def test_empty_dynamic_string(spark):
    d = "0x" + w(0x20) + w(0)
    assert one(spark, d, D.to_string(2, "d")) == ""


def test_g9_bytes(spark):
    d = "0x" + w(0x20) + w(4) + "deadbeef" + "0" * 56
    assert one(spark, d, D.to_bytes(2, "d")) == "0xdeadbeef"


def test_g10_fixed_bytes_intended_vs_compat(spark):
    d = "0x" + "deadbe00" + "0" * 56
    assert one(spark, d, D.to_fixed_bytes(2, "d", 4)) == "0xdeadbe00"
    # reference-compat rtrim defect (init.sql:141)
    assert one(spark, d, D.to_fixed_bytes(2, "d", 4, compat=True)) == "0xdeadbe"


def test_g11_dynamic_array_beyond_reference_cap(spark):
    # 5 elements — the reference caps at 3 (init.sql:193)
    d = "0x" + w(0x20) + w(5) + w(1) + w(2) + w(3) + w(4) + w(5)
    assert one(spark, d, D.to_array(2, "d", "uint32")) == ["1", "2", "3", "4", "5"]
    assert one(spark, d, D.to_array_str(2, "d", "uint32")) == "[1,2,3,4,5]"


def test_empty_dynamic_array(spark):
    d = "0x" + w(0x20) + w(0)
    assert one(spark, d, D.to_array(2, "d", "uint32")) == []
    assert one(spark, d, D.to_array_str(2, "d", "uint32")) == "[]"


def test_fixed_array(spark):
    d = "0x" + w(7) + w(8) + w(9)
    assert one(spark, d, D.to_fixed_array(2, "d", "uint32", 3)) == ["7", "8", "9"]


def test_uint128_at_2_96(spark):
    d = "0x" + w(2**96)
    assert one(spark, d, D.to_uint128(2, "d")) == Decimal(2**96)


def test_uint256_beyond_64_bits(spark):
    d = "0x" + w(2**96 + 7)
    assert one(spark, d, D.to_uint256(2, "d")) == Decimal(2**96 + 7)


def test_uint256_overflow_decimal_yields_null_exact_string_path_works(spark):
    big = 2**255 + 12345
    d = "0x" + w(big)
    assert one(spark, d, D.to_uint256(2, "d")) is None
    assert one(spark, d, D.to_uint256_str(2, "d")) == str(big)


def test_uint128_overflow_decimal38_yields_null(spark):
    d = "0x" + w(2**128 - 1)  # 3.4e38 > Decimal(38) max
    assert one(spark, d, D.to_uint128(2, "d")) is None


def test_strtol_reference_semantics(spark):
    # bits arg ignored, always signed-64 of chars 49..64 (init.sql:85-88)
    d = "0" * 48 + "00000000000000ff"
    assert one(spark, d, D.strtol("d", 8)) == 255


def test_from_hex_from_varbyte(spark):
    d = "0x737061726b"
    assert one(spark, d, D.from_varbyte(D.from_hex("d"))) == "spark"


def test_g12_hex_roundtrip(spark):
    assert one(spark, "0x364df", H.from_hex_long("d")) == 222431
    df = spark.createDataFrame([(222431,)], ["n"]).select(H.to_hex("n").alias("v"))
    assert df.collect()[0]["v"] == "0x364df"


def test_hex_roundtrip_property(spark):
    import random

    rnd = random.Random(42)
    vals = [0, 1, 2**63 - 1, 222431] + [rnd.randrange(2**62) for _ in range(20)]
    df = spark.createDataFrame([(v,) for v in vals], ["n"]).select(
        "n", H.from_hex_long(H.to_hex("n")).alias("rt")
    )
    for r in df.collect():
        assert r["rt"] == r["n"]


def test_from_hex_parse_failure_yields_zero(spark):
    """types.go:29-33 parity: unparseable hex logs-and-yields-0 in the
    reference; our conv-based decode does the same (NULL stays NULL)."""
    df = spark.createDataFrame(
        [("0xzz",), ("garbage",), (None,), ("0x10",), ("0x0x10",)], ["h"]
    )
    vals = [r["v"] for r in df.select(H.from_hex_long("h").alias("v")).collect()]
    assert vals == [0, 0, None, 16, 16]  # '0x0x10': every 0x stripped


def _pooled_reference_lpad_defect_reproduction(spark):
    """SURVEY §2.B: under the reference's lpad-truncation the README's own
    worked example (value 12309758656873032528) does NOT reproduce — the
    66-char '0x…' word loses its last 2 hex chars.  Our compat helper
    reproduces that defect on demand; the default path decodes correctly."""
    d = "0x" + w(12309758656873032528)  # 66 chars
    assert one(spark, d, D.to_uint256(2, "d")) == Decimal(
        "12309758656873032528"
    )
    truncated = one(
        spark, d, D.to_uint256(0, D.reference_lpad64(F.col("d")))
    )
    # 0x + first 62 hex of the word => tail '50' dropped, value shifted
    assert truncated != Decimal("12309758656873032528")

    # byte-for-byte parity with PostgreSQL lpad semantics (DuckDB shares
    # them): truncate-to-64 for long inputs, zero-pad for short ones
    import duckdb

    vectors = [d, w(7), "abc", "f" * 64, "a" * 200, ""]
    con = duckdb.connect()
    want = [
        con.execute("SELECT lpad(?, 64, '0')", [v]).fetchone()[0]
        for v in vectors
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vectors)], ["i", "d"])
    got = [
        r["p"]
        for r in df.select("i", D.reference_lpad64(F.col("d")).alias("p"))
        .orderBy("i")
        .collect()
    ]
    assert got == want

    # multi-word payload under compat: word-2 read lands past the
    # truncated 64 chars -> empty hex -> NULL (conv('') is NULL), vs the
    # correct value on the default path
    d2 = "0x" + w(1) + w(42)
    assert one(spark, d2, D.to_uint64(2 + 64, F.col("d"))) == Decimal(42)
    assert (
        one(spark, d2, D.to_uint64(64, D.reference_lpad64(F.col("d"))))
        is None
    )


def test_array_str_compat_cap(spark):
    # dynamic uint array of 5 elements: intended render shows all 5,
    # compat cap=3 mirrors init.sql:193
    n = 5
    d = "0x" + w(0x20) + w(n) + "".join(w(i + 10) for i in range(n))
    full = one(spark, d, D.to_array_str(2, "d", "uint64"))
    capped = one(spark, d, D.to_array_str(2, "d", "uint64", cap=3))
    assert full == "[10,11,12,13,14]"
    assert capped == "[10,11,12]"


def _pooled_decode_encode_property(spark):
    """decode(encode(x)) == x over generated ABI words for every static
    decoder — one batched Spark job for the whole sample set."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        u256=st.integers(min_value=0, max_value=10**38 - 1),
        u64=st.integers(min_value=0, max_value=2**64 - 1),
        i64=st.integers(min_value=-(2**63), max_value=2**63 - 1),
        u32=st.integers(min_value=0, max_value=2**32 - 1),
        addr=st.integers(min_value=0, max_value=2**160 - 1),
        b=st.booleans(),
    )
    def check(u256, u64, i64, u32, addr, b):
        word = lambda v: format(v % 2**256, "064x")  # noqa: E731
        data = "0x" + word(u256) + word(u64) + word(i64) + word(u32) + word(
            addr
        ) + word(int(b))
        row = (
            spark.createDataFrame([(data,)], ["d"])
            .select(
                D.to_uint256(2, "d").alias("u256"),
                D.to_uint64(66, "d").alias("u64"),
                D.to_int64(130, "d").alias("i64"),
                D.to_uint32(194, "d").alias("u32"),
                D.to_address(258, "d").alias("addr"),
                D.to_bool(322, "d").alias("b"),
            )
            .collect()[0]
        )
        assert int(row["u256"]) == u256
        assert int(row["u64"]) == u64
        assert row["i64"] == i64
        assert row["u32"] == u32
        assert row["addr"] == "0x" + format(addr, "040x")
        assert row["b"] == b

    check()


def test_sql_function_surface(spark):
    D.register_sql_functions(spark)
    row = spark.sql(
        "SELECT to_address(2, '0x000000000000000000000000f78031c993afb43e"
        "79f017938326ff34418ec36e') AS a, "
        f"to_uint256(2, '0x{w(12309758656873032528)}') AS v, "
        f"to_int64(2, '0x{'0'*48}fffffffffffffffe') AS i, "
        f"to_string(2, '0x{w(0x20)}{w(5)}737061726b{'0'*54}') AS s, "
        f"from_hex_long('0x364df') AS fh, to_hex(222431) AS th"
    ).collect()[0]
    assert row["a"] == "0xf78031c993afb43e79f017938326ff34418ec36e"
    assert row["v"] == Decimal("12309758656873032528")
    assert row["i"] == -2
    assert row["s"] == "spark"
    assert row["fh"] == 222431
    assert row["th"] == "0x364df"


def test_uint256_expr_twin_bit_equal(spark):
    """VERDICT r3 #8: the pure-JVM limb-fold uint256 path must be
    bit-equal to the Arrow path (and to Python int(h, 16)) across the
    range — boundaries, mid-range, short/odd words, empty and NULL."""
    import random

    from evm_archive_spark.functions.decode import (
        _B13,
        _POW64_B13,
        _hex_word_to_int_str,
        _uint256_expr_str,
    )

    # the embedded constants really are the base-10^13 digits of 2^(64k)
    for k, digs in _POW64_B13.items():
        assert sum(d * _B13**j for j, d in enumerate(digs)) == 2 ** (64 * k)
        assert all(0 <= d < _B13 for d in digs)

    random.seed(20260814)
    cases = ["0" * 64, "f" * 64, "0" * 63 + "1", "1" + "0" * 63, "abc", "00", ""]
    cases += [
        f"{random.getrandbits(bits):064x}"
        for bits in (8, 64, 65, 128, 129, 192, 193, 255, 256)
        for _ in range(4)
    ]
    df = spark.createDataFrame([(c,) for c in cases] + [(None,)], ["w"])
    rows = df.select(
        "w",
        F.expr("lpad(w, 64, '0')").alias("_"),
    ).drop("_")
    out = rows.select(
        "w",
        _uint256_expr_str(F.col("w")).alias("e"),
        _hex_word_to_int_str(F.col("w")).alias("a"),
    ).collect()
    for r in out:
        want = str(int(r["w"], 16)) if r["w"] else None
        assert r["e"] == want and r["a"] == want, (r["w"], r["e"], r["a"], want)
    # the expr path is Python-free (no EvalPython in the physical plan)
    plan = (
        rows.select(_uint256_expr_str(F.col("w")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
