#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run Verify's
parquet dumps against the DuckDB oracle SQL (oracle_sql.json) on the
same fixture tables, compare column names (sorted), dtype-compatible
values, and row order. Dev tool only — not part of the library."""
import json
import sys

import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(
            f"SELECT * FROM '{OUT}/{name}/*.parquet'").fetch_df()
    except Exception as e:
        print(f"FAIL {name}: spark result missing: {e}")
        fail += 1
        continue
    try:
        exp = con.execute(sql).fetch_df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fail += 1
        continue
    g = got[sorted(got.columns)]
    x = exp[sorted(exp.columns)]
    if list(g.columns) != list(x.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(x.columns)}")
        fail += 1
        continue
    if len(g) != len(x):
        print(f"FAIL {name}: rows {len(g)} vs {len(x)}")
        fail += 1
        continue
    bad = []
    for c in g.columns:
        gv, xv = list(g[c]), list(x[c])
        for i, (a, b) in enumerate(zip(gv, xv)):
            pa = a is None or (isinstance(a, float) and a != a)
            pb = b is None or (isinstance(b, float) and b != b)
            if pa or pb:
                if pa != pb:
                    bad.append((c, i, a, b))
            elif isinstance(a, float) or isinstance(b, float):
                if float(a) != float(b):
                    bad.append((c, i, a, b))
            elif str(a) != str(b):
                bad.append((c, i, a, b))
        if bad:
            break
    if bad:
        c, i, a, b = bad[0]
        print(f"FAIL {name}: first diff col={c} row={i}: spark={a!r} oracle={b!r}"
              f" ({len(bad)} diffs in col)")
        fail += 1
    else:
        print(f"OK   {name}: {len(g)} rows x {len(g.columns)} cols")

# rows-only queries (no oracle): report row counts
import glob
import os
for p in sorted(glob.glob(f"{OUT}/*")):
    n = os.path.basename(p)
    if os.path.isdir(p) and n not in oracle:
        cnt = con.execute(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
        print(f"INFO {n}: rows-only, {cnt} rows")

print(f"\n{'ALL GREEN' if fail == 0 else f'{fail} FAILURES'}")
sys.exit(1 if fail else 0)
