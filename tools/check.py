#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB (→ pandas via fetchdf, so DECIMAL becomes float64 exactly like
the driver), load the Verify parquet output via PYARROW (so decimals
surface as decimal.Decimal, again like the driver — reading the Spark
side through DuckDB used to collapse both sides to float64 and masked
trailing-zero mismatches), sort columns by name + rows by stringified
value, and diff. Usage:
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import functools, glob, json, sys
print = functools.partial(print, flush=True)  # line-buffered even when redirected
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    # Mirror the driver: hash the printed value. No float prettifying —
    # a last-bit double diff SHOULD fail here if it fails there.
    return str(v)

def rows_of(df):
    cols = sorted(df.columns)
    rows = sorted(tuple(canon(v) for v in row)
                  for row in df[cols].itertuples(index=False, name=None))
    return cols, rows, {c: str(df[c].dtype) for c in cols}

def oracle_frame(con, sql):
    return rows_of(con.execute(sql).fetchdf())

def spark_frame(path):
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        raise RuntimeError(f"no parquet under {path}")
    return rows_of(pq.read_table(files).to_pandas())

def main(sf, out, only=None):
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    if only:  # comma-separated substrings, same contract as Verify/Bench
        subs = only.split(",")
        oracle = {k: v for k, v in oracle.items() if any(s in k for s in subs)}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            ocols, orows, odt = oracle_frame(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); continue
        try:
            scols, srows, sdt = spark_frame(f"{out}/{name}")
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
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
