#!/usr/bin/env python3
"""Round-16 automated plan audit (OPTIMIZATION_r16.md "plan-swept" rows).

Usage:
  sbt -batch "runMain graft.Explain /root/testdata/sf0.01" > explain_all.log
  python3 tools/plan_audit.py explain_all.log [bench_full.json]

Parses every `========== qNNN ==========` section of a graft.Explain
dump and reports, per query:

  - operator counts at tree level (FileScan / ExistingRDD / Exchange /
    SortMergeJoin / BroadcastNestedLoopJoin / CartesianProduct /
    Window / Generate)
  - red flags: any CartesianProduct, BNLJ counts (eyeball against the
    documented 1-row broadcast-rejoin pattern), exchange-count >= 10,
    parquet-scan count >= 6
  - duplicate identical scans: the same (file, ReadSchema) pair
    appearing >= 2 times in one plan — the multi-consumer
    recompute signature that round 16's checkpoint fixes target

The second (optional) arg is a bench artifact whose `queries_min`
annotates each row with its sf0.1 cost so the output sorts by spend.
"""
import json
import re
import sys
from collections import Counter


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    txt = open(sys.argv[1]).read()
    cost = {}
    if len(sys.argv) > 2:
        cost = json.load(open(sys.argv[2])).get("queries_min", {})
    secs = re.split(r"========== (q\S+) ==========", txt)
    rows = []
    for i in range(1, len(secs), 2):
        q, body = secs[i], secs[i + 1]
        tree = [l for l in body.split("\n")
                if re.match(r"^(\[info\] )?\s+[:+| ]*[+:]-", l)]

        def c(pat: str) -> int:
            return sum(1 for l in tree if re.search(pat, l))

        n = {
            "scan": c("Scan parquet"),
            "rdd": c("Scan ExistingRDD"),
            "exch": c(r"\bExchange"),
            "smj": c("SortMergeJoin"),
            "bnlj": c("BroadcastNestedLoopJoin"),
            "cart": c("CartesianProduct"),
            "win": c(r"\bWindow\b"),
            "gen": c("Generate"),
        }
        flags = []
        if n["cart"]:
            flags.append("CARTESIAN")
        if n["bnlj"]:
            flags.append(f"BNLJ x{n['bnlj']}")
        if n["exch"] >= 10:
            flags.append(f"exch {n['exch']}")
        if n["scan"] >= 6:
            flags.append(f"scans {n['scan']}")
        scans = re.findall(
            r"Location: InMemoryFileIndex \[file:(\S+?)\]"
            r"[\s\S]{0,400}?ReadSchema: (\S+)", body)
        dups = {f"{loc.rsplit('/', 1)[-1]}:{rs[:48]}": k
                for (loc, rs), k in Counter(scans).items() if k >= 2}
        if dups:
            flags.append("dup-scans " + str(dups))
        rows.append((cost.get(q, 0.0), q, n, flags))
    rows.sort(reverse=True)
    n_flagged = sum(1 for r in rows if r[3])
    print(f"{len(rows)} queries parsed, {n_flagged} flagged")
    for sec, q, n, flags in rows:
        if flags:
            print(f"{sec:7.2f} {q:36s} {'; '.join(flags)}")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # `| head` closed the pipe — not an error
        sys.exit(0)
