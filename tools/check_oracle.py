#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare row-set hash against the Spark
result parquet (columns sorted by name, rows sorted, values stringified)."""
import sys, json, glob, duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def canon(rel):
    df = rel.df()
    df = df[sorted(df.columns)]
    rows = sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False))
    return len(rows), hash(tuple(rows)), rows

fails = 0
for name, sql in sorted(oracles.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        o_n, o_h, o_rows = canon(con.sql(sql))
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    s_n, s_h, s_rows = canon(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
    if o_n != s_n:
        print(f"FAIL {name}: rows spark={s_n} oracle={o_n}"); fails += 1
    elif o_h != s_h:
        diff = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
        print(f"FAIL {name}: hash mismatch, first diffs {diff}"); fails += 1
    else:
        print(f"OK   {name}: {s_n} rows")
sys.exit(1 if fails else 0)
