#!/usr/bin/env python3
"""Compare two graft.Verify output dirs query-by-query (cross-parallelism
determinism check). Rows are sorted by all columns; values must match
exactly after the same canonicalization check_oracle.py uses."""
import sys, os, glob
import duckdb
import pandas as pd

a_dir, b_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
def qdirs(d):
    return {x for x in os.listdir(d) if os.path.isdir(os.path.join(d, x))}
# union of both sides: a query present in only one run (e.g. the other
# crashed partway) must count as a failure, not vanish from the report
names = sorted(qdirs(a_dir) | qdirs(b_dir))
n_pass = n_fail = 0
for name in names:
    pa = glob.glob(f"{a_dir}/{name}/*.parquet")
    pb = glob.glob(f"{b_dir}/{name}/*.parquet")
    if not pa or not pb:
        side = a_dir if not pa else b_dir
        print(f"MISS {name}: no parquet under {side}"); n_fail += 1; continue
    da = con.execute(f"SELECT * FROM read_parquet({pa!r})").df()
    db = con.execute(f"SELECT * FROM read_parquet({pb!r})").df()
    if sorted(da.columns) != sorted(db.columns):
        print(f"FAIL {name}: columns {sorted(da.columns)} vs {sorted(db.columns)}")
        n_fail += 1; continue
    cols = sorted(da.columns)
    da = da[cols].sort_values(cols, ignore_index=True)
    db = db[cols].sort_values(cols, ignore_index=True)
    if len(da) != len(db):
        print(f"FAIL {name}: rows {len(da)} vs {len(db)}"); n_fail += 1; continue
    try:
        pd.testing.assert_frame_equal(da, db, check_exact=True)
        n_pass += 1
    except AssertionError as e:
        print(f"FAIL {name}: {str(e).splitlines()[0]}"); n_fail += 1
print(f"== {n_pass} identical / {n_fail} differ / {len(names)} total")
