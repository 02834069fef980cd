#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf tables, load the Verify parquet output, sort
columns by name + rows by value, and diff. Usage:
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)

def frame(con, sql):
    df = con.execute(sql).fetchdf()
    cols = sorted(df.columns)
    rows = sorted(tuple(canon(v) for v in row) for row in df[cols].itertuples(index=False, name=None))
    return cols, rows, {c: str(df[c].dtype) for c in cols}

def main(sf, out):
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            ocols, orows, odt = frame(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); continue
        try:
            scols, srows, sdt = frame(con, f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}"); continue
        if ocols != scols:
            print(f"FAIL {name}: columns oracle={ocols} spark={scols}"); continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rowcount oracle={len(orows)} spark={len(srows)}"); continue
        if orows != srows:
            bad = next(i for i, (a, b) in enumerate(zip(orows, srows)) if a != b)
            print(f"FAIL {name}: first diff at sorted-row {bad}:\n  oracle={orows[bad]}\n  spark ={srows[bad]}")
            continue
        note = "" if odt == sdt else f"  (dtype diff: {odt} vs {sdt})"
        print(f"OK   {name}: {len(orows)} rows{note}")
        n_ok += 1
    print(f"== {n_ok}/{len(oracle)} ok ==")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
