#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify (Spark) at a
given SF, then execute each oracle SQL in DuckDB over the same parquet
tables and compare row sets (columns sorted by name, rows sorted, values
stringified). Usage: python3 scripts/check.py [sfdir] [outdir]
Run `sbt "runMain graft.Verify <sfdir> <outdir>"` first.
"""
import sys, os, json, glob

import duckdb
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = os.path.join(sfdir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

with open(os.path.join(outdir, "oracle_sql.json")) as f:
    oracles = json.load(f)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(f"{v:.6g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


fails = 0
for name in sorted(oracles):
    res_dir = os.path.join(outdir, name)
    files = glob.glob(os.path.join(res_dir, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark result written")
        fails += 1
        continue
    t = pq.read_table(files[0])
    spark_cols = t.column_names
    spark_rows = [tuple(d[c] for c in spark_cols) for d in t.to_pylist()]
    try:
        cur = con.execute(oracles[name])
        duck_cols = [d[0] for d in cur.description]
        duck_rows = cur.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    if sorted(spark_cols) != sorted(duck_cols):
        print(f"FAIL {name}: columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        fails += 1
        continue
    s, d = canon(spark_cols, spark_rows), canon(duck_cols, duck_rows)
    if s != d:
        print(f"FAIL {name}: {len(s)} spark rows vs {len(d)} duck rows")
        for i, (a, b) in enumerate(zip(s, d)):
            if a != b:
                print(f"  first diff at row {i}:\n    spark={a}\n    duck ={b}")
                break
        fails += 1
    else:
        print(f"OK   {name} ({len(s)} rows)")

print(f"\n{len(oracles) - fails}/{len(oracles)} queries match")
sys.exit(1 if fails else 0)
