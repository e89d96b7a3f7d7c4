#!/usr/bin/env python3
"""Regenerate BENCH_BUDGETS.json from a committed bench record.

Usage: python3 tools/make_budgets.py <bench_record> [out_path]

Budget = max(0.5 s, 2x the record's per-query time), rounded up to two
decimals. The record should be a min-of-N graft.Bench output (either a
bench_records/BENCH_FULL-*.json snapshot or a driver BENCH_r*.json
wrapper) measured on an otherwise idle machine, so the budget encodes
"twice the honest warm time" — the same ratio bench_guard's prev/new
diff uses, but as an ABSOLUTE per-query ceiling that doesn't drift when
the comparison baseline itself was noisy.

Rerun after adding queries or after an intentional plan change shifts a
query's honest time, and commit the result alongside the bench record.
"""
import json, math, os, sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_guard import load_queries  # same record parsing as the guard

FLOOR_SEC = 0.5
RATIO = 2.0


def main():
    record = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "BENCH_BUDGETS.json")
    qs = load_queries(record)
    budgets = {q: max(FLOOR_SEC, math.ceil(t * RATIO * 100) / 100)
               for q, t in sorted(qs.items())}
    with open(out, "w") as f:
        json.dump(budgets, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(budgets)} budgets to {out} "
          f"(total ceiling {sum(budgets.values()):.1f}s)")


if __name__ == "__main__":
    main()
