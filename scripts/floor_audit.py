"""Floor audit (VERDICT r12 #8): diff a bench run against the recorded
per-query floors in BENCH_REF.json and print every entry over a
threshold, so the no-regression invariant is one command to check.

Usage (from the repo root):

    python scripts/floor_audit.py BENCH_local_rN.json [--ref BENCH_REF.json]
        [--threshold 1.5] [--update-floors]

- Entries missing from the floors file are listed as NEW (a new lane's
  first run becomes its floor with --update-floors).
- --update-floors rewrites the ref file with min(floor, run) per entry
  (and adds new entries), preserving the comment/sf/sentinel fields —
  the same min'ing rule every round has applied by hand.
- Exit code 1 if any entry exceeds the threshold (so CI-style use is
  possible); 0 otherwise.

The floors are quiet-box BEST-EVER minima, so transient box load makes
individual entries exceed 1.0x routinely; the graded question is
whether anything exceeds the threshold (default 1.5x) — that is the
bar VERDICT r11/r12 audited by hand.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    args = sys.argv[1:]
    ref_path, threshold, update = "BENCH_REF.json", 1.5, False
    run_path = None
    it = iter(args)
    for a in it:
        if a == "--ref":
            ref_path = next(it)
        elif a == "--threshold":
            threshold = float(next(it))
        elif a == "--update-floors":
            update = True
        else:
            run_path = a
    if run_path is None:
        print(__doc__)
        return 2

    with open(run_path) as f:
        run = json.load(f)
    with open(ref_path) as f:
        ref = json.load(f)
    run_q = run.get("queries", run)
    floors = ref.get("queries", ref)

    over: list[tuple[str, float, float, float]] = []
    new: list[str] = []
    total_run = total_floor = 0.0
    for name, sec in sorted(run_q.items()):
        fl = floors.get(name)
        if fl is None:
            new.append(name)
            continue
        total_run += sec
        total_floor += fl
        ratio = sec / fl if fl else float("inf")
        if ratio > threshold:
            over.append((name, sec, fl, ratio))

    over.sort(key=lambda t: -t[3])
    for name, sec, fl, ratio in over:
        print(f"OVER  {name}: {sec:.3f}s vs floor {fl:.3f}s "
              f"= {ratio:.2f}x")
    for name in new:
        print(f"NEW   {name}: {run_q[name]:.3f}s (no floor recorded)")
    if total_floor:
        print(f"TOTAL {total_run:.1f}s vs floors {total_floor:.1f}s "
              f"= {total_run / total_floor:.2f}x "
              f"({len(over)} entr{'y' if len(over) == 1 else 'ies'} "
              f"over {threshold}x, {len(new)} new)")

    if update:
        floors = dict(floors)   # flat ref file: floors IS ref — a
        # self-assignment below would make the dict circular and
        # truncate the file mid-dump (review r13); copy first
        for name, sec in run_q.items():
            fl = floors.get(name)
            floors[name] = round(min(fl, sec) if fl is not None
                                 else sec, 4)
        ref["queries"] = floors
        with open(ref_path, "w") as f:
            json.dump(ref, f, indent=1)
        print(f"floors updated -> {ref_path}")
    return 1 if over else 0


if __name__ == "__main__":
    sys.exit(main())
