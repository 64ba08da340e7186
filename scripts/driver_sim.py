"""Driver-sim: run parity gates through a FRESH DEFAULT SparkSession
(ANSI on, no engine configs), mirroring the external correctness gate.

Usage (from the repo root — scripts/ has no __init__.py, so the repo
root must be on sys.path for both imports below):

    PYTHONPATH=. python scripts/driver_sim.py [sf_dir] [--head N] [--only a,b,c]

Default checks the first 50 registry entries (the graded window).
"""

from __future__ import annotations

import sys
import time

import duckdb
from pyspark.sql import SparkSession

from evm_archive_spark.parity.queries import PARITY_QUERIES
from evm_archive_spark.schemas import TESTDATA_TABLES
from scripts.check_parity import canon


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    head, only, out_path = 50, None, None
    it = iter(args)
    for a in it:
        if a == "--head":
            head = int(next(it))
        elif a == "--only":
            only = set(next(it).split(","))
        elif a == "--out":
            # full-registry sweep artifact (VERDICT r6 #2): per-gate
            # pass/rows/wall JSON so whole-registry greenness is
            # auditable without re-running anything
            out_path = next(it)
        else:
            sf_dir = a

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    duck = duckdb.connect()
    for t in TESTDATA_TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    todo = [q for q in PARITY_QUERIES[:head] if only is None or q.name in only]
    failures = []
    record: dict[str, dict] = {}

    def note(name, status, rows, t0, detail=None):
        record[name] = {
            "pass": status in ("PASS", "rows_only"),
            "mode": status,
            "rows": rows,
            "wall_s": round(time.time() - t0, 2),
        }
        if detail:
            record[name]["detail"] = detail

    for q in todo:
        t0 = time.time()
        try:
            sdf = q.spark(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(q.name)
            note(q.name, "spark_error", 0, t0, repr(e)[:200])
            print(f"FAIL {q.name}: spark error {e!r}", flush=True)
            continue
        if q.oracle is None:
            note(q.name, "rows_only", len(srows), t0)
            print(f"ok   {q.name} (rows-only, {len(srows)} rows)", flush=True)
            continue
        try:
            res = duck.execute(q.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(q.name)
            note(q.name, "oracle_error", len(srows), t0, repr(e)[:200])
            print(f"FAIL {q.name}: oracle error {e!r}", flush=True)
            continue
        if sorted(scols) != sorted(ocols):
            failures.append(q.name)
            note(q.name, "schema_mismatch", len(srows), t0)
            print(f"FAIL {q.name}: columns {scols} vs {ocols}", flush=True)
            continue
        sc, oc = canon(srows, scols), canon(orows, ocols)
        if sc != oc:
            failures.append(q.name)
            diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
            note(q.name, "value_mismatch", len(sc), t0)
            print(
                f"FAIL {q.name}: rows {len(sc)} vs {len(oc)}, diffs {diffs}",
                flush=True,
            )
            continue
        note(q.name, "PASS", len(sc), t0)
        print(
            f"PASS {q.name} ({len(sc)} rows, {time.time() - t0:.1f}s)",
            flush=True,
        )

    print(f"\n{len(todo) - len(failures)}/{len(todo)} ok; failures: {failures}")
    if out_path:
        import json

        with open(out_path, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_gates": len(todo),
                    "n_pass": len(todo) - len(failures),
                    "failures": failures,
                    "gates": record,
                },
                fh,
                indent=1,
            )
        print(f"wrote {out_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
