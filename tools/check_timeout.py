#!/usr/bin/env python3
"""check.py with a per-query wall-clock budget, for headroom passes at
scale factors where the documented-quadratic exactness oracles (the
Σdf² pair baselines) stop being feasible in DuckDB. Each oracle runs in
a worker process killed at the budget; the report marks it TIMEOUT
instead of hanging the whole gate.

Usage: python3 tools/check_timeout.py <sfDir> <verifyOutDir> [seconds]
                [--allow-timeout=name1,name2]

Exit is nonzero when any oracle FAILs, when ZERO oracles verified OK (a
pass where everything times out or hangs must not read as green), or
when a TIMEOUT hits a query NOT named in the --allow-timeout allowlist
(an unexpected timeout usually means a regressed plan, not a documented
quadratic oracle).
"""
import json, sys, glob, os, multiprocessing as mp
import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def run_one(sf_dir, out_dir, name, sql, q):
    try:
        con = duckdb.connect()
        for t in ["region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings"]:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            q.put(("FAIL", "no spark output")); return
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        want = canon(con.sql(sql).df())
        if list(got.columns) != list(want.columns):
            q.put(("FAIL", f"columns {list(got.columns)} vs {list(want.columns)}")); return
        if len(got) != len(want):
            q.put(("FAIL", f"rows {len(got)} vs {len(want)}")); return
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        except AssertionError as e:
            q.put(("FAIL", "values differ: " + str(e).split("\n")[0])); return
        q.put(("OK", f"{len(got)} rows"))
    except Exception as e:
        q.put(("FAIL", f"oracle error: {e}"))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    allow = set()
    for a in sys.argv[1:]:
        if a.startswith("--allow-timeout="):
            allow |= {n for n in a.split("=", 1)[1].split(",") if n}
    sf_dir, out_dir = args[0], args[1]
    budget = int(args[2]) if len(args) > 2 else 180
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    counts = {"OK": 0, "FAIL": 0, "TIMEOUT": 0}
    unexpected_timeouts = []
    for name, sql in sorted(oracle.items()):
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(sf_dir, out_dir, name, sql, q))
        p.start(); p.join(budget)
        if p.is_alive():
            p.terminate(); p.join()
            print(f"TIMEOUT {name} (>{budget}s oracle)"); counts["TIMEOUT"] += 1
            if name not in allow:
                unexpected_timeouts.append(name)
        else:
            status, msg = q.get() if not q.empty() else ("FAIL", "worker died")
            print(f"{status}   {name} ({msg})"); counts[status] += 1
    print(f"== {counts['OK']} ok, {counts['FAIL']} bad, {counts['TIMEOUT']} timeout ==")
    if unexpected_timeouts:
        print("UNEXPECTED TIMEOUTS (not in --allow-timeout): "
              + ", ".join(unexpected_timeouts))
    if counts["OK"] == 0:
        print("ZERO queries verified OK — the pass proves nothing; failing.")
    sys.exit(1 if counts["FAIL"] or counts["OK"] == 0 or unexpected_timeouts else 0)


if __name__ == "__main__":
    main()
