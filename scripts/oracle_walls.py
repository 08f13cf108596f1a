#!/usr/bin/env python3
"""Time every DuckDB oracle query from oracle_sql.json against a
testdata SF dir, each in its own subprocess with a hard timeout —
DuckDB's own t05/t13 replicas are all-pairs O(n^2) Jaccard and do not
terminate in reasonable time at sf0.1 (observed 35+ min), which is
itself a data point: the oracle is not uniformly the fast side.

Usage: python3 scripts/oracle_walls.py [sf_dir] [oracle_json] [timeout_s]
Prints one line per query: name, best-of-2 seconds or TIMEOUT.
"""
import json
import multiprocessing as mp
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_one(sf_dir, sql, q):
    import duckdb
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet/**')"
            if is_dir(f"{sf_dir}/{t}.parquet")
            else f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        con.execute(sql).fetchall()
        best = min(best, time.time() - t0)
    q.put(best)


def is_dir(p):
    import os
    return os.path.isdir(p)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    oracle_path = (sys.argv[2] if len(sys.argv) > 2
                   else "/tmp/graft_verify/oracle_sql.json")
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    oracles = json.load(open(oracle_path))
    total = 0.0
    timeouts = []
    for name in sorted(oracles):
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(sf_dir, oracles[name], q))
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate()
            p.join()
            print(f"{name:28s} TIMEOUT(>{timeout:.0f}s)")
            timeouts.append(name)
        else:
            sec = q.get()
            total += sec
            print(f"{name:28s} {sec:8.3f}")
    print(f"TOTAL (completed) {total:.2f}s; timeouts: {timeouts or 'none'}")


if __name__ == "__main__":
    main()
