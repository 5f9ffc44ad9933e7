#!/usr/bin/env python3
"""Arrow-level type parity: for each oracle query, compare the DuckDB
result's arrow schema against the Spark parquet output's arrow schema.

The driver's canonizer distinguishes types the value-level compare in
check_parity.py coerces away (r1 lesson: DuckDB SUM -> HUGEINT
(decimal128(38,0)) vs Spark int64 hash-mismatches even when every value
is equal). Run AFTER check_parity.py against the same outdir.

Usage: tools/check_types.py [sfdir] [outdir] [only_query ...]
"""
import json, sys
from pathlib import Path

import duckdb
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Pairs the driver's canon treats as equivalent (observed r1: parquet
# timestamp units and integer WIDTHS canonize identically — int32 rnk vs
# DuckDB's int64 row_number hash-matched — but decimal128 vs int64 does
# NOT: the three r1 hash-fails were all uncast HUGEINT sums).
def norm(t):
    import pyarrow as pa
    # lists compare by normalized ELEMENT type (field name and
    # nullability are arrow metadata the canon never sees; int widths
    # inside a list canonize to equal python ints exactly like at the
    # top level)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm(t.value_type)}>"
    s = str(t)
    if s.startswith("timestamp"):
        return "timestamp"
    if s in ("large_string", "string"):
        return "string"
    if s in ("int8", "int16", "int32", "int64", "uint8", "uint16",
             "uint32", "uint64"):
        return "int"
    return s


def main():
    args = sys.argv[1:]
    sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    outdir = args[1] if len(args) > 1 else "/tmp/verify_out"
    only = set(args[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

    oracle = json.loads(Path(f"{outdir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want = con.sql(sql).fetch_arrow_table().schema
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            got = ds.dataset(f"{outdir}/{name}").schema
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {str(e)[:200]}")
            n_fail += 1
            continue
        bad = []
        for f in want:
            g = got.field(f.name) if f.name in got.names else None
            if g is None:
                bad.append(f"{f.name}: missing on spark side")
            elif norm(f.type) != norm(g.type):
                bad.append(f"{f.name}: oracle {f.type} vs spark {g.type}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            n_fail += 1
        else:
            n_pass += 1
    print(f"== types: {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
