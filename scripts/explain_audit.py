"""Dump formatted physical plans for the headline queries and flag
scale-hostile shapes.

Usage: PYTHONPATH=. python scripts/explain_audit.py [sf_dir] [name ...]

Checks (reported, not fatal — tests/test_plans.py asserts the hard ones):
- filters reach the parquet scan (PushedFilters)
- projection pruning reaches the scan (ReadSchema)
- small dimensions join via BroadcastHashJoin / BroadcastExchange
- WholeStageCodegen spans cover the hot path
- no CartesianProduct anywhere
"""

from __future__ import annotations

import sys

from evm_archive_spark.parity.queries import PARITY_QUERIES
from evm_archive_spark.session import get_spark

DEFAULT = [
    "q_sc2", "q_f1", "q_j1", "q_j2", "q_j4", "q_j7b",
    "q_a1", "q_w1", "q_d10", "q_knn", "q_ann_ivf",
]


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or DEFAULT
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    byname = {q.name: q for q in PARITY_QUERIES}
    for name in names:
        import contextlib
        import io

        df = byname[name].spark(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        print(plan)
        notes = []
        if "CartesianProduct" in plan:
            notes.append("!! CartesianProduct")
        if "SortMergeJoin" in plan:
            notes.append("note: SortMergeJoin (expected only for two big sides)")
        if "PushedFilters: []" in plan and "Filter (" in plan:
            notes.append("note: a scan has no pushed filters")
        print("AUDIT:", "; ".join(notes) if notes else "clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
