#!/usr/bin/env python3
"""Bench regression guard: diff this round's per-query bench times against
the previous round's and fail loudly before the numbers reach the gate.

Usage: python3 tools/bench_guard.py <prev_bench> <new_bench>

Each argument is either a raw graft.Bench output line
({"metric":"total",...,"queries":{...}}) in a file, or a driver-written
BENCH_r*.json wrapper whose "tail" embeds that line.

Fails (exit 1) when any query shared by both rounds regressed more than
2x, the shared-query total regressed more than 1.25x, or the NEW record
carries a non-empty "errors" list (graft.Bench names every query that
threw — a thrown query must never ship as a green-looking time). Queries only in
one round are reported but never fail the guard (new operators are
expected to add time). Absolute floor of 0.5s per query so scheduling
jitter on sub-second queries doesn't trip the ratio.

Lesson from round 5: a 12.5x single-query regression (67.9s of a 121.4s
bench) reached the judge because nothing compared BENCH_r05 to _r04
per-query before the end-of-round commit. Run this before committing.
"""
import json, re, sys

PER_QUERY_MAX = 2.0
TOTAL_MAX = 1.25
ABS_FLOOR_SEC = 0.5


def load_errors(path):
    """Union of the "errors" arrays across every metric line in the file.
    Older records (pre-round-8) have no errors field -> empty set."""
    text = open(path).read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "errors" in doc:
            return set(doc["errors"])
        if isinstance(doc, dict) and "tail" in doc:
            text = doc["tail"]
        if isinstance(doc, dict) and "queries" in doc:
            return set()
    except json.JSONDecodeError:
        pass
    errs = set()
    for m in re.findall(r'"errors":\[(.*?)\]', text):
        errs.update(re.findall(r'"([^"]+)"', m))
    return errs


def load_queries(path):
    text = open(path).read()
    # Accept the driver wrapper ({"tail": "...{\"metric\"...}..."}) or raw
    # graft.Bench output. A file may hold SEVERAL metric lines (run Bench
    # with SPARK_GRAFT_BENCH_RUNS=2): take the per-query MIN across runs —
    # this machine shows transient external-load spikes of 5-10x on single
    # sub-second queries, and the min keeps real plan regressions (which
    # reproduce in every run) while dropping scheduling noise.
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "queries" in doc:
            return doc["queries"]
        if isinstance(doc, dict) and "tail" in doc:
            text = doc["tail"]
    except json.JSONDecodeError:
        pass
    # Round-11+ Bench prints a compact last line whose "full" field names
    # the file (BENCH_FULL.json) carrying the complete per-query map.
    # That file is MUTABLE — each Bench run overwrites it — so a pointer
    # inside an OLD round record may now name a NEWER run's data
    # (round-11 advice: following it blindly made the guard compare the
    # new run to itself and pass unconditionally). Follow the pointer
    # only when the pointed file provably matches the compact summary it
    # came from: same run_id when both carry one, else same n_queries AND
    # total (±0.05s). On mismatch, fall through to scraping the tail.
    m = re.search(r'\{[^{}]*"full":"([^"]+)"[^{}]*\}', text)
    if m:
        import os
        if os.path.exists(m.group(1)):
            try:
                summary = json.loads(m.group(0))
                full_doc = json.loads(open(m.group(1)).read())
                sid, fid = summary.get("run_id"), full_doc.get("run_id")
                if sid is not None and fid is not None:
                    ok = sid == fid
                else:
                    ok = (summary.get("n_queries") == len(full_doc["queries"])
                          and abs(summary.get("value", -1)
                                  - sum(full_doc["queries"].values())) < 0.05)
                if ok:
                    return full_doc["queries"]
                print(f"bench_guard: {path} points at {m.group(1)} but the "
                      "summary does not match its contents (stale pointer "
                      "to an overwritten file); ignoring pointer")
            except (json.JSONDecodeError, KeyError):
                print(f"bench_guard: unreadable full record {m.group(1)}; "
                      "ignoring pointer")
    lines = re.findall(r'\{"metric":.*?"queries":\{.*?\}.*?\}', text)
    if not lines:
        # Last resort for pre-round-11 driver wrappers whose 2000-char
        # tail cut the metric line's HEAD off: scrape bare "name":sec
        # pairs from the fragment (query names all contain '_'; min per
        # name across whatever runs are visible). Partial by nature —
        # the guard then compares the shared subset only.
        pairs = re.findall(r'"([a-z0-9_]+)":([0-9]+\.[0-9]+)', text)
        pairs = [(k, float(v)) for k, v in pairs if "_" in k and k != "n_queries"]
        if not pairs:
            sys.exit(f"bench_guard: no bench metric line found in {path}")
        merged = {}
        for k, v in pairs:
            merged[k] = min(merged.get(k, v), v)
        print(f"bench_guard: {path} tail truncated; scraped "
              f"{len(merged)} per-query timings from the fragment")
        return merged
    runs = [json.loads(l)["queries"] for l in lines]
    merged = {}
    for run in runs:
        for q, t in run.items():
            merged[q] = min(merged.get(q, t), t)
    return merged


def load_budgets():
    """Per-query warm budget table (BENCH_BUDGETS.json at the repo root,
    regenerated by tools/make_budgets.py as 2x the committed min, floor
    0.5 s). With 130+ queries a single 1.25x-of-total gate dilutes — one
    noisy query hides inside the total — so every query is ALSO checked
    against its own absolute budget. Queries without a budget entry
    (added since the last regeneration) are reported but never fail."""
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "BENCH_BUDGETS.json")
    if not os.path.exists(path):
        return {}
    return json.load(open(path))


def main():
    prev_path, new_path = sys.argv[1], sys.argv[2]
    prev, new = load_queries(prev_path), load_queries(new_path)
    budgets = load_budgets()
    shared = sorted(set(prev) & set(new))
    only_new = sorted(set(new) - set(prev))
    only_prev = sorted(set(prev) - set(new))
    failures = []
    new_errors = load_errors(new_path)
    if new_errors:
        failures.append("errored queries in new record: " + ", ".join(sorted(new_errors)))
    for q in shared:
        p, n = prev[q], new[q]
        if p <= 0 or n <= 0:
            failures.append(f"{q}: errored (prev={p:.2f}s new={n:.2f}s)")
            continue
        if n > p * PER_QUERY_MAX and n - p > ABS_FLOOR_SEC:
            failures.append(f"{q}: {p:.2f}s -> {n:.2f}s ({n / p:.1f}x)")
    pt = sum(prev[q] for q in shared)
    nt = sum(new[q] for q in shared)
    print(f"shared queries: {len(shared)}  total {pt:.1f}s -> {nt:.1f}s "
          f"({nt / pt:.2f}x)" if shared else "no shared queries")
    if only_new:
        print(f"new this round (+{sum(new[q] for q in only_new):.1f}s): "
              + ", ".join(only_new))
    if only_prev:
        print("dropped this round: " + ", ".join(only_prev))
    for q in sorted(shared, key=lambda q: new[q] - prev[q], reverse=True)[:5]:
        print(f"  top delta {q}: {prev[q]:.2f}s -> {new[q]:.2f}s")
    if shared and nt > pt * TOTAL_MAX:
        failures.append(f"TOTAL: {pt:.1f}s -> {nt:.1f}s ({nt / pt:.2f}x > {TOTAL_MAX}x)")
    if budgets:
        unbudgeted = sorted(q for q in new if q not in budgets)
        if unbudgeted:
            print(f"no budget yet (run tools/make_budgets.py after committing): "
                  + ", ".join(unbudgeted))
        for q in sorted(new):
            if q in budgets and new[q] > budgets[q]:
                failures.append(
                    f"{q}: {new[q]:.2f}s over its budget {budgets[q]:.2f}s")
    else:
        print("bench_guard: no BENCH_BUDGETS.json found; per-query budget "
              "check skipped")
    if failures:
        print("\nBENCH REGRESSION GUARD FAILED:")
        for f in failures:
            print(f"  {f}")
        sys.exit(1)
    print("bench guard: OK")


if __name__ == "__main__":
    main()
