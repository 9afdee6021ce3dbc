#!/usr/bin/env python3
"""sf1-scale oracle for the connected-components queries (q65, q102).

The committed DuckDB oracles express connected components as a recursive
transitive-closure CTE — correct and fine at the sf0.01 gate, but the
closure materializes |component|^2-ish state and at sf1's adversarial
clusters it spilled >200 GB and died (round-9 measurement). This checker
keeps the ORACLE'S OWN SQL for everything relational — it reuses the
committed q65 oracle text verbatim up to `jpairs` (shingles, df cap,
shared counts, jaccard threshold) — and replaces only the closure with a
30-line union-find over the materialized pair list (bounded: |pairs|,
not |component|^2). The split/straddle tail of q102 then runs as SQL
against the union-find labels registered as a DuckDB table, again
matching the committed oracle text's semantics term for term.

Usage: python3 tools/check_cc_scaled.py <sfDir> <verifyOutDir>
Compares <verifyOutDir>/{q65_dedup_clusters,q102_cluster_safe_split}
parquet dumps; exits 1 on any mismatch.
"""
import sys, glob, json, os
import duckdb

def union_find_min_labels(pairs):
    """label every node with the MIN doc_id of its component."""
    parent = {}
    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        if rb < ra:  # root = smaller id, so root IS the min label
            ra, rb = rb, ra
        parent[rb] = ra
    nodes = set()
    for a, b in pairs:
        nodes.add(a); nodes.add(b)
        parent.setdefault(a, a); parent.setdefault(b, b)
        union(a, b)
    return {n: find(n) for n in nodes}

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET threads=8")
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # the committed oracle text, cut at the closure: everything up to
    # `und AS (` is reused verbatim so the pair semantics CANNOT drift
    q65_sql = oracle["q65_dedup_clusters"]
    cut = q65_sql.index("und AS (")
    pair_sql = q65_sql[:cut].rstrip().rstrip(",") + \
        "\nSELECT da, db FROM jpairs"
    print("[cc] materializing jpairs via the committed oracle CTEs ...")
    pairs = con.execute(pair_sql).fetchall()
    print(f"[cc] {len(pairs)} pairs")
    labels = union_find_min_labels(pairs)
    con.execute("CREATE TABLE lab (doc_id BIGINT, label BIGINT)")
    if labels:
        con.executemany("INSERT INTO lab VALUES (?, ?)",
                        list(labels.items()))
    fails = 0

    def compare(name, expect_df):
        nonlocal fails
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); fails += 1; return
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        a = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
        b = expect_df.reindex(sorted(expect_df.columns), axis=1) \
            .reset_index(drop=True)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            fails += 1
        elif len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            fails += 1
        elif not a.equals(b):
            neq = (a != b)
            bad = [c for c in a.columns if neq[c].any()]
            print(f"FAIL {name}: values differ in {bad}")
            fails += 1
        else:
            print(f"PASS {name} ({len(a)} rows, {len(a.columns)} cols)")

    compare("q65_dedup_clusters", con.execute(
        "SELECT doc_id, label AS cluster_id FROM lab ORDER BY doc_id").df())

    # q102 tail: the committed oracle's g/pc/st SQL with `lab` now a real
    # table instead of the closure CTE (text kept semantically identical)
    q102_tail = """
    WITH g AS (
     SELECT d.doc_id, COALESCE(l.label, d.doc_id) AS cluster_id,
      CASE WHEN CAST('0x' || substr(md5('csplit:' ||
            CAST(COALESCE(l.label, d.doc_id) AS VARCHAR)), 1, 12)
            AS BIGINT) % 100 < 80 THEN 'train'
           WHEN CAST('0x' || substr(md5('csplit:' ||
            CAST(COALESCE(l.label, d.doc_id) AS VARCHAR)), 1, 12)
            AS BIGINT) % 100 < 90 THEN 'val'
           ELSE 'test' END AS split,
      CASE WHEN CAST('0x' || substr(md5('split:' ||
            CAST(d.doc_id AS VARCHAR)), 1, 12)
            AS BIGINT) % 100 < 80 THEN 'train'
           WHEN CAST('0x' || substr(md5('split:' ||
            CAST(d.doc_id AS VARCHAR)), 1, 12)
            AS BIGINT) % 100 < 90 THEN 'val'
           ELSE 'test' END AS doc_split
     FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id),
    pc AS (
     SELECT cluster_id, COUNT(DISTINCT split) AS ns_safe,
      COUNT(DISTINCT doc_split) AS ns_doc
     FROM g GROUP BY cluster_id),
    st AS (
     SELECT
      CAST(SUM(CASE WHEN ns_safe > 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS straddle_cluster_safe,
      CAST(SUM(CASE WHEN ns_doc > 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS straddle_doc_hash
     FROM pc)
    SELECT split, COUNT(*) AS n_docs,
     COUNT(DISTINCT cluster_id) AS n_clusters,
     straddle_cluster_safe, straddle_doc_hash
    FROM g, st
    GROUP BY split, straddle_cluster_safe, straddle_doc_hash
    ORDER BY split"""
    compare("q102_cluster_safe_split", con.execute(q102_tail).df())

    # q181 tail (round 14): canonical-representative selection. The
    # committed oracle is the q65 closure + the q31 quality chain + a
    # ranked argmax; everything EXCEPT the closure is sf1-feasible, so
    # reuse the committed text verbatim from its quality chain onward
    # (`qbase AS (`) with `labels` now backed by the union-find table —
    # the same text-surgery discipline as the q65 pair cut above.
    if "q181_dedup_canonical" in oracle and \
            glob.glob(f"{out_dir}/q181_dedup_canonical/*.parquet"):
        q181_sql = oracle["q181_dedup_canonical"]
        qcut = q181_sql.index("qbase AS (")
        q181_tail = ("WITH labels AS "
                     "(SELECT doc_id, label AS cluster_id FROM lab),\n"
                     + q181_sql[qcut:])
        compare("q181_dedup_canonical", con.execute(q181_tail).df())
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
