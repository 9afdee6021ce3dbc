#!/usr/bin/env python3
"""sf1-scale oracle for q148_triangle_count.

The committed DuckDB oracle enumerates triangles as a naive three-way
self-join of the similarity edge list — deliberately so (an orientation
bug in the engine cannot be mirrored by a formulation with no degrees in
it), and fine at the sf0.01/sf0.1 gates. At sf1 the unoriented wedge
explosion spills past this host's disk (measured round 10: DuckDB dies
on temp storage), exactly the blowup the engine's degree-ordered
orientation exists to avoid.

This checker follows check_cc_scaled.py's recipe: reuse the COMMITTED
oracle text verbatim up to the edge list (shingles, df cap, jaccard
threshold — the pair semantics cannot drift), then replace only the
triangle join with a THIRD independent formulation — python adjacency
sets, each triangle found once as (u < v < w) via sorted set
intersection. No degrees, no orientation, no SQL join order: a bug in
either engine formulation would have to be reinvented here to pass.

Usage: python3 tools/check_triangles_scaled.py <sfDir> <verifyOutDir>
Compares <verifyOutDir>/q148_triangle_count parquet; exits 1 on mismatch.
"""
import glob
import json
import sys
from collections import defaultdict

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
    q148_sql = oracle["q148_triangle_count"]
    # cut the committed text at the triangle join; keep the edge CTEs
    cut = q148_sql.index("tri AS (")
    edge_sql = q148_sql[:cut].rstrip().rstrip(",") + "\nSELECT u, v FROM e"
    print("[tri] materializing the edge list via the committed oracle CTEs ...")
    edges = con.execute(edge_sql).fetchall()
    print(f"[tri] {len(edges)} edges")

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    ntri = defaultdict(int)
    for u, v in edges:  # u < v by jpairs construction
        for w in adj[u] & adj[v]:
            if w > v:  # each triangle once, at its sorted corner order
                ntri[u] += 1
                ntri[v] += 1
                ntri[w] += 1
    want = sorted(ntri.items())
    print(f"[tri] {sum(n for _, n in want) // 3} triangles, "
          f"{len(want)} participating nodes")

    files = sorted(glob.glob(f"{out_dir}/q148_triangle_count/*.parquet"))
    if not files:
        print("FAIL q148_triangle_count: no spark output")
        sys.exit(1)
    got = con.execute(
        f"SELECT doc_id, n_tri FROM read_parquet({files!r}) "
        f"ORDER BY doc_id").fetchall()
    got = [(int(a), int(b)) for a, b in got]
    if got != want:
        extra = set(got) - set(want)
        missing = set(want) - set(got)
        print(f"FAIL q148_triangle_count: {len(got)} vs {len(want)} rows; "
              f"{len(extra)} unexpected, {len(missing)} missing "
              f"(samples: {sorted(extra)[:3]} / {sorted(missing)[:3]})")
        sys.exit(1)
    print(f"PASS q148_triangle_count ({len(got)} rows, 2 cols)")

    # q167_clustering_coeff rides the same adjacency: deg from the edge
    # list, n_tri from the census above, cc = (2*n_tri)/(deg*(deg-1)) as
    # one float division of exactly-representable integers — identical
    # to both engines' string-route-then-divide boundary.
    cc_files = sorted(glob.glob(f"{out_dir}/q167_clustering_coeff/*.parquet"))
    if cc_files:
        want_cc = sorted(
            (u, len(nb), ntri.get(u, 0),
             (2.0 * ntri.get(u, 0)) / (len(nb) * (len(nb) - 1)))
            for u, nb in adj.items() if len(nb) >= 2)
        got_cc = con.execute(
            f"SELECT doc_id, deg, n_tri, cc FROM read_parquet({cc_files!r}) "
            f"ORDER BY doc_id").fetchall()
        got_cc = [(int(a), int(b), int(c), float(d)) for a, b, c, d in got_cc]
        if got_cc != want_cc:
            extra = set(got_cc) - set(want_cc)
            missing = set(want_cc) - set(got_cc)
            print(f"FAIL q167_clustering_coeff: {len(got_cc)} vs "
                  f"{len(want_cc)} rows; {len(extra)} unexpected, "
                  f"{len(missing)} missing (samples: {sorted(extra)[:2]} / "
                  f"{sorted(missing)[:2]})")
            sys.exit(1)
        print(f"PASS q167_clustering_coeff ({len(got_cc)} rows, 4 cols)")
    else:
        print("[tri] no q167_clustering_coeff output present — skipped")

    # q172_bfs_layers rides the same adjacency: textbook queue BFS from
    # the seed set (node % 10 == 0) — no frontier frames, no SQL
    # recursion, a third independent formulation.
    bfs_files = sorted(glob.glob(f"{out_dir}/q172_bfs_layers/*.parquet"))
    if bfs_files:
        from collections import deque
        dist = {u: 0 for u in adj if u % 10 == 0}
        dq = deque(sorted(dist))
        while dq:
            u = dq.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    dq.append(w)
        want_bfs = sorted(dist.items())
        got_bfs = con.execute(
            f"SELECT doc_id, dist FROM read_parquet({bfs_files!r}) "
            f"ORDER BY doc_id").fetchall()
        got_bfs = [(int(a), int(b)) for a, b in got_bfs]
        if got_bfs != want_bfs:
            extra = set(got_bfs) - set(want_bfs)
            missing = set(want_bfs) - set(got_bfs)
            print(f"FAIL q172_bfs_layers: {len(got_bfs)} vs "
                  f"{len(want_bfs)} rows; {len(extra)} unexpected, "
                  f"{len(missing)} missing (samples: {sorted(extra)[:3]} / "
                  f"{sorted(missing)[:3]})")
            sys.exit(1)
        print(f"PASS q172_bfs_layers ({len(got_bfs)} rows, 2 cols)")
    else:
        print("[tri] no q172_bfs_layers output present — skipped")


if __name__ == "__main__":
    main()
