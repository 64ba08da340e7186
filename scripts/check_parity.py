"""Standalone mirror of the driver's correctness gate at an arbitrary SF.

Usage: python scripts/check_parity.py [sf_dir]

Runs every parity query on Spark and its oracle on DuckDB, canonicalizes
(order-insensitive rows, columns sorted by name), and prints PASS/FAIL per
query plus a summary — same convention as CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime as dt
import math
import sys
import time
from decimal import Decimal

import duckdb

from evm_archive_spark.parity.queries import PARITY_QUERIES
from evm_archive_spark.schemas import TESTDATA_TABLES
from evm_archive_spark.session import get_spark


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        return str(v.normalize()) if v == v.to_integral_value() else str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_value(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    duck = duckdb.connect()
    for t in TESTDATA_TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import os

    skip = set(filter(None, os.environ.get("SKIP_QUERIES", "").split(",")))
    only = set(filter(None, os.environ.get("ONLY_QUERIES", "").split(",")))
    failures = []
    for q in PARITY_QUERIES:
        if q.name in skip or (only and q.name not in only):
            continue
        t0 = time.time()
        try:
            sdf = q.spark(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(q.name)
            print(f"FAIL {q.name}: spark error {e!r}")
            continue
        if q.oracle is None:
            print(f"ok   {q.name} (rows-only, {len(srows)} rows, "
                  f"{time.time() - t0:.1f}s)")
            continue
        try:
            res = duck.execute(q.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(q.name)
            print(f"FAIL {q.name}: oracle error {e!r}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append(q.name)
            print(f"FAIL {q.name}: columns {scols} vs {ocols}")
            continue
        sc, oc = canon(srows, scols), canon(orows, ocols)
        if sc != oc:
            failures.append(q.name)
            diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
            print(f"FAIL {q.name}: rows {len(sc)} vs {len(oc)}, diffs {diffs}")
            continue
        print(f"PASS {q.name} ({len(sc)} rows, {time.time() - t0:.1f}s)")

    print(f"\n{len(PARITY_QUERIES) - len(failures)}/{len(PARITY_QUERIES)} ok; "
          f"failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
