#!/usr/bin/env python3
"""Assemble CORRECTNESS_SF1.json from a round's sf1 checker logs
(VERDICT r9 #1 — make the sf1 evidence durable in the repo, not /tmp).

Inputs (all produced by the sf1 campaign, see SCALE.md "sf1
correctness"):
  <log_dir>/oracle.log   : check_oracle.py on the SQL-feasible subset
  <log_dir>/cc.log       : check_cc_scaled.py (q65/q102 union-find path)
  <log_dir>/minhash.log  : check_minhash_scaled.py (q27 python path)

Usage: python3 tools/assemble_sf1_artifact.py <log_dir> [round]
Writes CORRECTNESS_SF1.json; exits 1 if anything failed or no log
parsed (an empty artifact must never look like a green one).
"""
import json
import re
import sys

SOURCES = [
    ("oracle.log", "check_oracle (DuckDB SQL)"),
    ("cc.log", "check_cc_scaled (DuckDB CTEs + python union-find)"),
    ("minhash.log", "check_minhash_scaled (independent python "
                    "MinHash-LSH reimplementation)"),
    ("triangles.log", "check_triangles_scaled (python adjacency-set "
                      "census over the committed oracle's edge CTEs)"),
]

# Committed oracles that CANNOT run at sf1 and why; their scaled
# checkers above carry the verification instead.
EXEMPT = {
    "q65_dedup_clusters": "recursive closure CTE spills >200 GB",
    "q102_cluster_safe_split": "recursive closure CTE spills >200 GB",
    "q27_minhash_near_dup": "shingle-pair join chain spills past disk",
    "q148_triangle_count": "naive (deliberately unoriented) wedge join "
                           "spills past disk",
}


def parse(path, source):
    out = {}
    try:
        for line in open(path):
            m = re.match(r"(PASS|FAIL) (q\w+)[:\s]?(.*)", line.strip())
            if m:
                st, name, rest = m.groups()
                out[name] = {"status": st, "source": source,
                             "note": rest.strip(" ()")}
    except FileNotFoundError:
        pass
    return out


def main():
    log_dir = sys.argv[1]
    rnd = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    res = {}
    for fname, source in SOURCES:
        res.update(parse(f"{log_dir}/{fname}", source))
    for q, why in EXEMPT.items():
        if q in res and "check_oracle" not in res[q]["source"]:
            res[q]["note"] += f" [committed SQL oracle infeasible at sf1: {why}]"
    doc = {
        "round": rnd,
        "sf_dir": "/root/repo/scaledata/sf1",
        "description": (
            "DuckDB-oracle correctness at sf1 (10x adversarially skewed "
            "data, tools/gen_scale.py) for the profile-top + round-9/10 "
            "queries. q65/q102 verified via check_cc_scaled.py (committed "
            "oracle CTEs up to jpairs + union-find closure), q27 via "
            "check_minhash_scaled.py (independent python MinHash-LSH "
            "reimplementation) - their committed SQL oracles spill past "
            "this host's disk at sf1. Round 9 ran this set first and "
            "caught two real scale-dependent bugs (q104 decimal-rounding "
            "tie-break drift -> integer-quanta rewrite; 1-ulp "
            "decimal-to-double divergence past 53 bits -> string-cast "
            "output boundary, Exact.scala)."),
        "results": dict(sorted(res.items())),
        "n_pass": sum(1 for v in res.values() if v["status"] == "PASS"),
        "n_fail": sum(1 for v in res.values() if v["status"] == "FAIL"),
    }
    json.dump(doc, open("CORRECTNESS_SF1.json", "w"), indent=1)
    print(json.dumps({k: doc[k] for k in ("round", "n_pass", "n_fail")}))
    sys.exit(1 if (doc["n_fail"] or not res) else 0)


if __name__ == "__main__":
    main()
