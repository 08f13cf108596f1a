#!/usr/bin/env python3
"""Time the DuckDB oracle on the SAME parquet dirs ScaleCheck used
(1x = sf0.1, 4x/16x = /tmp/graft_scale/xK) and report the engine/oracle
wall-clock ratio per query per scale. Consumes the SCALEJSON lines
ScaleCheck prints.

Usage:
  sbt "runMain graft.ScaleCheck 16" | tee /tmp/scalecheck.out
  python3 scripts/scale_duel.py /tmp/scalecheck.out
"""
import json
import os
import re
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_oracles(path):
    with open(path) as f:
        return json.load(f)


def time_duckdb(con, sql, runs=2, budget=240.0):
    """Warm best-of-N with a wall budget: an all-pairs/recursive oracle
    replica that blows past `budget` seconds is interrupted and recorded
    as a DNF (inf) — at 64x several replicas are quadratic by
    construction and would otherwise hang the duel."""
    import threading
    best = float("inf")
    for _ in range(runs):
        timer = threading.Timer(budget, con.interrupt)
        timer.start()
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
        except Exception:
            timer.cancel()
            return float("inf")  # interrupted (or errored): DNF
        timer.cancel()
        best = min(best, time.time() - t0)
    return best


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scalecheck.out"
    oracle_path = (sys.argv[2] if len(sys.argv) > 2
                   else "/tmp/graft_verify/oracle_sql.json")
    oracles = load_oracles(oracle_path)

    rows = []
    for line in open(out_path):
        m = re.search(r"SCALEJSON (\{.*\})", line)
        if m:
            rows.append(json.loads(m.group(1)))
    if not rows:
        sys.exit("no SCALEJSON lines found — run graft.ScaleCheck first")

    header = None
    table = {}
    for rec in rows:
        k, d = rec["k"], rec["dir"]
        con = duckdb.connect()
        con.execute(f"SET threads TO 32")
        for t in TABLES:
            # Spark writes multi-file parquet DIRECTORIES; testdata ships
            # single files — glob accordingly
            path = f"{d}/{t}.parquet"
            if os.path.isdir(path):
                path = f"{path}/*.parquet"
            # synthesized events carry BIGINT nanos (Spark nanosAsLong
            # round-trip); normalize to TIMESTAMP for the oracle SQL
            if t == "events":
                typ = con.execute(
                    f"SELECT typeof(ts) FROM read_parquet('{path}') LIMIT 1"
                ).fetchone()[0]
                if typ == "BIGINT":
                    con.execute(
                        f"CREATE VIEW {t} AS SELECT event_id, "
                        f"make_timestamp((ts // 1000)::BIGINT) AS ts, "
                        f"user_id, event_type, value, props "
                        f"FROM read_parquet('{path}')")
                    continue
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        for q, spark_sec in rec["times"].items():
            sql = oracles.get(q)
            if not sql:
                continue
            duck_sec = time_duckdb(con, sql)
            table.setdefault(q, {})[k] = (spark_sec, duck_sec)
        con.close()
        header = header or sorted(rec["times"])

    ks = sorted({k for v in table.values() for k in v})
    print("| query | " + " | ".join(
        f"{k}x spark / duck / ratio" for k in ks) + " |")
    print("|---|" + "---|" * len(ks))
    for q in header:
        if q not in table:  # shape without an oracle: nothing to compare
            continue
        cells = []
        for k in ks:
            if k not in table[q]:
                cells.append("-")
                continue
            s, dsec = table[q][k]
            if dsec == float("inf"):
                cells.append(f"{s:.2f} / DNF(>240s) / -")
            else:
                cells.append(f"{s:.2f} / {dsec:.2f} / {s / dsec:.1f}x")
        print(f"| {q} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
