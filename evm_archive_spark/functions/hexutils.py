"""Hex <-> decimal conversions (reference types.go:27-39, operator A6).

The reference's ``FromHex`` strips every ``"0x"`` substring then parses
base-16 into uint64 (types.go:27-34); ``ToHex`` renders ``0x%x``
(types.go:36-39).  Both map to single JVM-side expressions — no Python in
the hot path, so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return col if isinstance(col, Column) else F.col(col)


def from_hex_long(col: Column | str) -> Column:
    """'0x364df' -> 222431 (LongType).

    Mirrors types.go:27-34 including the quirk that *every* '0x' substring
    is removed (Go strings.ReplaceAll), not just a prefix.  Unparseable
    input yields 0 exactly like the reference (types.go:29-33 logs the
    parse failure and returns 0; Spark's ``conv`` is likewise lenient);
    NULL input stays NULL.
    """
    return F.conv(F.regexp_replace(_c(col), "0x", ""), 16, 10).cast("long")


def to_hex(col: Column | str) -> Column:
    """222431 -> '0x364df' (types.go:36-39)."""
    return F.format_string("0x%x", _c(col).cast("long"))
