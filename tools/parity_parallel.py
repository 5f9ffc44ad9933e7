#!/usr/bin/env python3
"""Parallel front end for check_parity.py --no-run: shard the oracle
query list across N worker processes (DuckDB is single-threaded per
query here; a 10x-scale sweep has multi-minute oracles that serialize
badly). Each worker runs check_parity.py --no-run on its shard; this
driver merges the PASS/FAIL lines and prints a tally.

Usage: tools/parity_parallel.py <sfdir> <outdir> [nproc] [--exclude n1,n2]

--exclude skips named queries (e.g. impute_fixpoint at 10x, whose
DuckDB mirror exhausts this box's memory+temp — its disposition is the
Spark-SQL frontend replay, see COVERAGE.md).
"""
import json, subprocess, sys
from pathlib import Path

def main():
    argv = sys.argv[1:]
    args, excl = [], set()
    i = 0
    while i < len(argv):
        if argv[i] == "--exclude" and i + 1 < len(argv):
            excl = set(argv[i + 1].split(","))
            i += 2
        else:
            args.append(argv[i])
            i += 1
    sfdir, outdir = args[0], args[1]
    nproc = int(args[2]) if len(args) > 2 else 8
    names = sorted(n for n in json.loads(
        Path(f"{outdir}/oracle_sql.json").read_text()).keys() if n not in excl)
    if excl:
        print(f"excluded: {sorted(excl)}")
    shards = [names[i::nproc] for i in range(nproc)]
    procs = [
        subprocess.Popen(
            [sys.executable, "tools/check_parity.py", sfdir, outdir,
             "--no-run", *shard],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo")
        for shard in shards if shard]
    n_pass = n_fail = 0
    fails = []
    for p in procs:
        out, _ = p.communicate()
        for line in out.splitlines():
            if line.startswith("PASS"):
                n_pass += 1
            elif line.startswith("FAIL"):
                n_fail += 1
                fails.append(line)
            elif line.startswith(("==", "WARNING")):
                pass
            elif line.strip():
                print(line)
    for f in fails:
        print(f)
    print(f"== {n_pass} pass, {n_fail} fail")

if __name__ == "__main__":
    main()
