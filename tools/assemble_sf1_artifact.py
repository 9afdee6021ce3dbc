#!/usr/bin/env python3
"""Assemble CORRECTNESS_SF1.json from the round-9 sf1 oracle runs.

Three result sources (VERDICT r8 #1 — the oracle had never run above
sf0.1):
  - /tmp/oracle_sf1.log   : check_oracle.py on the 10 profile-top queries
                            (old q104 form — its FAIL line is the round's
                            finding, superseded by the integer rerun)
  - /tmp/oracle_sf1b.log  : check_oracle.py on the integer-quanta q104
  - /tmp/cc_sf1.log       : check_cc_scaled.py (q65/q102 union-find path)

Emits one JSON object per query: {status, source, note}.
"""
import json, re, sys

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

res = {}
res.update(parse("/tmp/oracle_sf1.log", "check_oracle (DuckDB SQL)"))
res.update(parse("/tmp/cc_sf1.log",
                 "check_cc_scaled (DuckDB CTEs + union-find)"))
# integer-quanta q104 rerun supersedes the old-form FAIL
new_q104 = parse("/tmp/oracle_sf1b.log", "check_oracle (DuckDB SQL)")
if "q104_pagerank" in new_q104:
    old = res.get("q104_pagerank", {})
    new_q104["q104_pagerank"]["note"] = (
        "integer-quanta form (r9 fix); r8 round(double,12) form FAILED "
        "here first: " + old.get("note", ""))
    res["q104_pagerank"] = new_q104["q104_pagerank"]

doc = {
    "round": 9,
    "sf_dir": "/root/repo/scaledata/sf1",
    "description": ("DuckDB-oracle correctness spot-check at sf1 (10x "
                    "adversarially skewed data, ~52k-node similarity "
                    "graph) for the 10 profile-top queries - VERDICT r8 "
                    "#1. q65/q102 use the committed oracle CTEs up to "
                    "jpairs with the recursive closure replaced by "
                    "union-find (the closure spills >200 GB in DuckDB "
                    "at this scale)."),
    "results": dict(sorted(res.items())),
    "n_pass": sum(1 for v in res.values() if v["status"] == "PASS"),
    "n_fail": sum(1 for v in res.values() if v["status"] == "FAIL"),
}
json.dump(doc, open("CORRECTNESS_SF1.json", "w"), indent=1)
print(json.dumps(doc, indent=1))
