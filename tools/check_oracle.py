#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [names]

Optional third arg: comma-separated query-name filter (mirrors Verify's
subset arg) — only those oracles run. Essential at sf1, where a few
committed oracles (q27/q65/q102's pair/closure chains) are spill-
infeasible in DuckDB and must be checked by their scaled checkers
(check_cc_scaled.py / check_minhash_scaled.py) instead.

Reads every <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the
sfDir tables, and compares: column names (sorted), row counts, and values
(columns sorted by name, exact match after canonicalization).

Dev-only tool for fast iteration; the real gate is driver-side.
"""
import sys, json, glob, os
import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    out = []
    for col in df.columns:
        s = df[col]
        if str(s.dtype).startswith("datetime"):
            s = s.astype("datetime64[us]")
        out.append(s)
    return pd.concat(out, axis=1)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    # Spill-safe defaults (round 9): DuckDB's default temp dir is
    # CWD-relative `.tmp/` — an unbounded sf1 spill there filled the
    # repo disk and killed an unrelated test run. Cap memory and pin the
    # spill to /tmp; override via DUCK_MEM / DUCK_THREADS.
    con.execute("SET temp_directory='/tmp/duck_spill'")
    con.execute(f"SET memory_limit='{os.environ.get('DUCK_MEM', '24GB')}'")
    con.execute(f"SET threads={os.environ.get('DUCK_THREADS', '8')}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only is not None:
        missing = only - set(oracle)
        assert not missing, f"unknown query names: {sorted(missing)}"
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").df()
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        if not a.reset_index(drop=True).equals(b.reset_index(drop=True)):
            neq = (a.reset_index(drop=True) != b.reset_index(drop=True))
            bad_cols = [c for c in a.columns if neq[c].any()]
            # Show dtype + first mismatching row per bad column.
            detail = []
            for c in bad_cols[:4]:
                i = neq[c].idxmax()
                detail.append(f"{c}[{a[c].dtype} vs {b[c].dtype}] row{i}: "
                              f"{a[c].iloc[i]!r} != {b[c].iloc[i]!r}")
            print(f"FAIL {name}: values differ in {bad_cols} :: " + " | ".join(detail))
            n_fail += 1
            continue
        print(f"PASS {name} ({len(a)} rows, {len(a.columns)} cols)")
        n_pass += 1
    outs = {os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)}
    for name in sorted(outs - set(oracle)):
        print(f"NOTE {name}: spark output without oracle (rows-only check driver-side)")
    print(f"== {n_pass} pass / {n_fail} fail / {len(oracle)} total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
