#!/usr/bin/env python3
"""DuckDB half of the paired benchmark.

graft.Bench invokes this with a JSON spec file ({"sf": dir, "runs": n,
"queries": {name: sql}}) after its Spark pass, so BOTH engines are
measured in the SAME session/window and the Spark-vs-baseline ratio in
BENCH JSON is self-contained (VERDICT r5 #4) instead of resting on
numbers quoted from a different VM window.

Output: one "name<TAB>min_seconds" line per query on stdout.
DuckDB (a driver-side tool) is imported here only for measurement —
the engine itself never depends on it; Bench degrades gracefully when
this script can't run.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    spec = json.load(open(sys.argv[1]))
    sf = spec["sf"]
    runs = int(spec.get("runs", 5))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    for name, sql in spec["queries"].items():
        con.execute(sql).fetchall()  # warm (IO cache, plan cache)
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        sys.stdout.write(f"{name}\t{best}\n")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
