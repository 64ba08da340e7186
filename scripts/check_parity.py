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
    pool = int(os.environ.get("POOL", "0"))
    todo = [
        q
        for q in PARITY_QUERIES
        if q.name not in skip and (not only or q.name in only)
    ]

    def check(q, con):
        """Returns (name, message-or-None, detail)."""
        t0 = time.time()
        try:
            sdf = q.spark(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            return q.name, f"spark error {e!r}", ""
        if q.oracle is None:
            return (q.name, None,
                    f"rows-only, {len(srows)} rows, "
                    f"{time.time() - t0:.1f}s",
                    {"rows": len(srows),
                     "wall_s": round(time.time() - t0, 2),
                     "mode": "ROWS_ONLY"})
        try:
            res = con.execute(q.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            return q.name, f"oracle error {e!r}", ""
        if sorted(scols) != sorted(ocols):
            return q.name, f"columns {scols} vs {ocols}", ""
        sc, oc = canon(srows, scols), canon(orows, ocols)
        if sc != oc:
            diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
            return q.name, f"rows {len(sc)} vs {len(oc)}, diffs {diffs}", ""
        return (q.name, None,
                f"{len(sc)} rows, {time.time() - t0:.1f}s",
                {"rows": len(sc), "wall_s": round(time.time() - t0, 2),
                 "mode": "PASS"})

    failures = []
    gates: dict[str, dict] = {}

    def report(name, msg, detail, rec=None):
        if msg:
            failures.append(name)
            gates[name] = {"pass": False, "mode": "FAIL", "why": msg}
            print(f"FAIL {name}: {msg}", flush=True)
        else:
            gates[name] = {"pass": True, **(rec or {})}
            print(f"PASS {name} ({detail})", flush=True)

    if pool > 1:
        # Same split as tests/test_parity.py: streaming + RPC-DataSource
        # gates serial, everything else thread-pooled with per-thread
        # DuckDB connections.
        from concurrent.futures import ThreadPoolExecutor

        serial_names = {"q_ingest_transform", "q_enrich_ts", "q_rpc_ingest",
                        "q_price_source"}
        pooled = [q for q in todo
                  if not q.name.startswith("q_st") and q.name not in serial_names]
        serial = [q for q in todo if q not in pooled]

        def run_pooled(q):
            con = duckdb.connect()
            try:
                for t in TESTDATA_TABLES:
                    con.execute(
                        f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')"
                    )
                return check(q, con)
            finally:
                con.close()

        with ThreadPoolExecutor(max_workers=pool) as ex:
            for res in ex.map(run_pooled, pooled):
                report(*res)
        for q in serial:
            report(*check(q, duck))
    else:
        for q in todo:
            report(*check(q, duck))

    print(f"\n{len(todo) - len(failures)}/{len(todo)} ok; "
          f"failures: {failures}")
    sweep_out = os.environ.get("SWEEP_OUT")
    if sweep_out:
        import json

        # keep the gates{pass,mode,rows,wall_s} shape the committed
        # SWEEP_r{N}.json artifacts use
        rec = {
            "sf_dir": sf_dir,
            "n_gates": len(todo),
            "n_pass": len(todo) - len(failures),
            "failures": failures,
            "gates": {
                n: {"pass": g["pass"], "mode": g.get("mode"),
                    "rows": g.get("rows"), "wall_s": g.get("wall_s")}
                for n, g in gates.items()
            },
        }
        with open(sweep_out, "w") as f:
            json.dump(rec, f, indent=1)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
