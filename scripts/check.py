#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify (Spark) at a
given SF, then execute each oracle SQL in DuckDB over the same parquet
tables and compare row sets (columns sorted by name, rows sorted, values
stringified). Both sides go through pandas like the driver does — this
catches dtype coercions the raw fetchall() path hides (e.g. DuckDB
sum(INTEGER) -> HUGEINT -> pandas float64 -> "6.0" vs Spark "6").
Usage: python3 scripts/check.py [sfdir] [outdir]
Run `sbt "runMain graft.Verify <sfdir> <outdir>"` first.
"""
import sys, os, json, glob

import duckdb
import pandas as pd
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


def canon(df, sig6=False):
    """Column-name-sorted, row-sorted tuple-of-str canonical form."""
    cols = sorted(df.columns)
    # DuckDB DATE -> pandas datetime64 prints a midnight time component
    # Spark's DateType doesn't; the driver's gate normalizes this (q03
    # passed round 1), so mirror it — but ONLY for datetime64 columns: a
    # literal string that happens to end in " 00:00:00" must stay a
    # genuine difference.
    dt_cols = {c for c in cols
               if pd.api.types.is_datetime64_any_dtype(df[c])}
    out = []
    for _, r in df[cols].iterrows():
        vals = []
        for c, v in zip(cols, r):
            if sig6 and isinstance(v, float):
                vals.append(f"{v:.6g}")
            else:
                s = str(v)
                if c in dt_cols and s.endswith(" 00:00:00"):
                    s = s[: -len(" 00:00:00")]
                vals.append(s)
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
    sdf = pq.read_table(files[0]).to_pandas()
    try:
        ddf = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    if sorted(sdf.columns) != sorted(ddf.columns):
        print(f"FAIL {name}: columns spark={sorted(sdf.columns)} "
              f"duck={sorted(ddf.columns)}")
        fails += 1
        continue
    try:
        s, d = canon(sdf), canon(ddf)
    except Exception as e:
        print(f"FAIL {name}: canon error (unsortable/unhashable col?): {e}")
        fails += 1
        continue
    if s != d:
        loose = canon(sdf, sig6=True) == canon(ddf, sig6=True)
        kind = "representation-only (6g matches)" if loose else "VALUE"
        print(f"FAIL {name}: {len(s)} spark rows vs {len(d)} duck rows [{kind}]")
        for i, (a, b) in enumerate(zip(s, d)):
            if a != b:
                print(f"  first diff at row {i}:\n    spark={a}\n    duck ={b}")
                break
        fails += 1
    else:
        print(f"OK   {name} ({len(s)} rows)")

print(f"\n{len(oracles) - fails}/{len(oracles)} queries match")
sys.exit(1 if fails else 0)
