#!/usr/bin/env python3
"""sf1-scale oracle for q161 (degree assortativity of the similarity
graph) — the check_cc_scaled.py mold: the committed SQL oracle embeds
the jpairs chain and re-materializes it per query (~12 min + tens of GB
of DuckDB state at sf1), so this checker reuses the COMMITTED q65
oracle text verbatim up to `jpairs` (shingles, df cap, shared counts,
jaccard threshold — the pair semantics cannot drift) and computes the
assortativity tail in EXACT PYTHON INTEGERS (arbitrary precision, no
overflow, no engine rounding): symmetrize, per-node degree, Newman's
Pearson-over-edges sums, and the final division as the IEEE double of
two exactly-representable integers — bit-identical to both engines'
string-routed casts when the sums agree.

Usage: python3 tools/check_assort_scaled.py <sfDir> <verifyOutDir>
Compares <verifyOutDir>/q161_degree_assortativity; exits 1 on mismatch.
"""
import sys, glob, json
from collections import Counter
import duckdb


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET threads=8")
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    q65_sql = oracle["q65_dedup_clusters"]
    cut = q65_sql.index("und AS (")
    pair_sql = q65_sql[:cut].rstrip().rstrip(",") + \
        "\nSELECT da, db FROM jpairs"
    print("[assort] materializing jpairs via the committed oracle CTEs ...")
    pairs = con.execute(pair_sql).fetchall()
    print(f"[assort] {len(pairs)} pairs")

    deg = Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    m = 2 * len(pairs)
    sx = sxx = sxy = 0
    for a, b in pairs:
        da, db = deg[a], deg[b]
        sx += da + db            # each undirected pair = 2 directed edges
        sxx += da * da + db * db
        sxy += 2 * da * db       # src-deg * dst-deg, both directions
    num = m * sxy - sx * sx
    den = m * sxx - sx * sx
    # den == 0 <=> no pairs, or a degree-regular graph (every node the
    # same degree): Newman's r is undefined. Spark's non-ANSI division
    # yields NULL there, so the defined degenerate comparison is
    # assortativity IS NULL rather than an uncaught ZeroDivisionError
    # (ADVICE r11).
    assort = float(num) / float(den) if den != 0 else None
    expect = (m, sx, sxx, sxy, assort)

    files = sorted(glob.glob(f"{out_dir}/q161_degree_assortativity/*.parquet"))
    if not files:
        print("FAIL q161_degree_assortativity: no spark output")
        sys.exit(1)
    got = con.execute(f"SELECT m, sum_deg, sum_deg_sq, sum_xy, "
                      f"assortativity FROM read_parquet({files!r})").fetchall()
    if len(got) != 1:
        print(f"FAIL q161_degree_assortativity: {len(got)} rows, expected 1")
        sys.exit(1)
    g = tuple(got[0])
    if g == expect:
        print(f"PASS q161_degree_assortativity (1 row; m={m}, "
              f"assortativity={assort!r})")
        sys.exit(0)
    print(f"FAIL q161_degree_assortativity:\n  spark  = {g}\n"
          f"  python = {expect}")
    sys.exit(1)


if __name__ == "__main__":
    main()
