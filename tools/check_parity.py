#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs graft.Verify at a given SF dir (unless --no-run and the out dir
already exists), then executes each oracle_sql.json query in DuckDB over
the same parquet tables and compares: schema (column names), row count,
and canonically-ordered values.

Usage: tools/check_parity.py [sfdir] [outdir] [--no-run] [only_query ...]
"""
import json, math, os, re, subprocess, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return (0, "")
    if isinstance(v, float):
        if math.isnan(v):
            return (1, "nan")
        # repr keeps full double precision; exact-match policy
        return (1, repr(v))
    if isinstance(v, bytes):
        return (2, v.hex())
    if isinstance(v, list):
        return (3, tuple(canon(x) for x in v))
    return (4, str(v))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    no_run = "--no-run" in sys.argv
    sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    outdir = args[1] if len(args) > 1 else "/tmp/verify_out"
    only = set(args[2:])

    if not no_run:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
            capture_output=True, text=True, cwd="/root/repo")
        sys.stdout.write("\n".join(
            l for l in r.stdout.splitlines()
            if "[error]" in l or "failed" in l.lower()) + "\n")
        if r.returncode != 0:
            print(r.stdout[-3000:]); print(r.stderr[-2000:])
            sys.exit(1)

    con = duckdb.connect()
    # resource guards for beyond-fixture dirs (the r18 sweep lesson:
    # DuckDB's default ~80%-of-RAM limit + an implicit temp dir lets a
    # wedge-scale join eat the box). GRAFT_DUCK_MEM like '60GB';
    # GRAFT_DUCK_TMP a DISK path - never /dev/shm.
    # validate before interpolating into the single-quoted SET: a value
    # carrying a quote would break the statement (and for the temp dir,
    # only after os.makedirs already created partial state)
    mem = os.environ.get("GRAFT_DUCK_MEM")
    if mem:
        if not re.fullmatch(r"[0-9]+(\.[0-9]+)?\s*(K|M|G|T)i?B", mem):
            sys.exit(f"GRAFT_DUCK_MEM must look like '60GB', got: {mem!r}")
        con.sql(f"SET memory_limit='{mem}'")
    tmp = os.environ.get("GRAFT_DUCK_TMP")
    if tmp:
        if "'" in tmp or any(ord(c) < 0x20 for c in tmp):
            sys.exit(f"GRAFT_DUCK_TMP contains a quote/control char: {tmp!r}")
        os.makedirs(tmp, exist_ok=True)
        con.sql(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

    oracle = json.loads(Path(f"{outdir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want = con.sql(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {str(e)[:200]}")
            n_fail += 1
            continue
        # driver sorts columns by name
        wi = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(want_cols)}")
            n_fail += 1
            continue
        if len(want_rows) != len(got_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(want_rows)}")
            n_fail += 1
            continue
        wr = sorted(tuple(canon(r[i]) for i in wi) for r in want_rows)
        gr = sorted(tuple(canon(r[i]) for i in gi) for r in got_rows)
        if wr != gr:
            bad = next(i for i, (a, b) in enumerate(zip(wr, gr)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted row {bad}:")
            print(f"  oracle: {wr[bad]}")
            print(f"  spark : {gr[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got_rows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
