"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The query set covers each operator family (SURVEY §2.1) so the number
tracks the engine's overall plan quality, not one hot path.  DuckDB
oracle timings for the same queries land in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


HEADLINE = [
    # one per family: scan, filter, multiway join, semi, agg, rollup,
    # window, setop, date scalar, decode view, streaming window, dedup,
    # knn, text
    "q_sc1",
    "q_f1",
    "q_j2",
    "q_j4",
    "q_j7b",
    "q_a1",
    "q_a3",
    "q_w1",
    "q_u2",
    "q_x2",
    "q_d10",
    "q_st1",
    "q_dedup_exact",
    "q_knn",
    "q_text_tokens",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from evm_archive_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("evm-archive-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Steady-state warm-up: JVM/codegen spin-up and parquet footer reads are
    # session costs, not query costs — pay them once before the clock starts
    # (the DuckDB comparator in BASELINE.md is timed the same way, connection
    # open + first scan excluded).
    spark.range(1_000_000).selectExpr("sum(id) s").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    queries = entrymod.queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
