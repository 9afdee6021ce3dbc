#!/usr/bin/env python3
"""Byte-exact oracle comparison — the signed-zero/NaN-payload-sensitive
sibling of check_oracle.py. numpy == treats -0.0 == 0.0, so the normal
checker can pass while a byte-level hash compare (the conservative model
of the driver's gate) diverges. This tool sorts both sides by all
columns and compares float columns via tobytes().

Usage: python3 tools/bytes_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import numpy as np
import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            continue  # un-dumped query (targeted run); not a failure here
        try:
            s = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
            d = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        cols = sorted(s.columns)
        if sorted(d.columns) != cols or len(s) != len(d):
            print(f"FAIL {name}: shape/columns differ "
                  f"(run check_oracle.py first)")
            n_fail += 1
            continue
        s = s[cols].sort_values(cols, ignore_index=True)
        d = d[cols].sort_values(cols, ignore_index=True)
        bad = []
        for c in cols:
            a, b = s[c], d[c]
            if str(a.dtype).startswith("datetime"):
                a = a.astype("datetime64[us]")
                b = b.astype("datetime64[us]")
            if a.dtype == np.float64 and b.dtype == np.float64:
                if a.to_numpy().tobytes() != b.to_numpy().tobytes():
                    av, bv = a.to_numpy(), b.to_numpy()
                    nz = int((np.signbit(av) != np.signbit(bv)).sum())
                    bad.append(f"{c} (signbit diffs: {nz})")
            elif not a.equals(b):
                bad.append(f"{c} (values)")
        if bad:
            print(f"FAIL {name}: byte-divergent columns: {bad}")
            n_fail += 1
        else:
            n_pass += 1
    print(f"== {n_pass} byte-identical / {n_fail} divergent")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
