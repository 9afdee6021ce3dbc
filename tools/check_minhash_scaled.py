#!/usr/bin/env python3
"""sf1-scale oracle for q27_minhash_near_dup (VERDICT r9 #3).

The committed q27 DuckDB oracle replays the whole MinHash chain in SQL;
at sf1 its shingle-pair joins spill past this host's disk (round-9
measurement: >200 GB, infeasible — same class of limit as the q65/q102
recursive closure, which got check_cc_scaled.py). This checker is the
q27 analogue: an INDEPENDENT reimplementation of the exact pipeline
semantics in partitioned Python (numpy for the hash family, dicts for
the band buckets — memory ∝ distinct shingles + capped candidate pairs,
never |docs|^2), compared row-for-row against the Spark parquet dump.

Replicated semantics, term for term with TextOps.scala:
  - 3-gram word shingles over split(text, ' '), DISTINCT per doc
    (shingles(); docs under 3 tokens yield none)
  - mhBase = first 8 md5 hex chars of the shingle (mhBase())
  - 16 minhashes min((a_j*hb + b_j) mod P), P = 4294967311,
    a_j = (1103515245*(j+1)+12345) mod 1073741789 + 1,
    b_j = (134775813*(j+1)+1) mod P                     (mhA/mhB/MH_P)
  - band buckets (j, mh); buckets with 2..20 docs emit all pairs,
    larger buckets are DROPPED (the skew cap — order-free, so the
    collect_list nondeterminism cannot matter)
  - per-doc top-8 candidates by (band collisions desc, partner asc)
  - exact shingle-Jaccard verify; round(j, 6) via Java
    BigDecimal.valueOf semantics (shortest double repr, HALF_UP)
  - best match per doc = max (jaccard, -partner)

Usage: python3 tools/check_minhash_scaled.py <sfDir> <verifyOutDir>
Compares <verifyOutDir>/q27_minhash_near_dup; exits 1 on mismatch.
"""
import glob
import hashlib
import sys
from decimal import Decimal, ROUND_HALF_UP

import duckdb
import numpy as np

MH_P = 4294967311
MH_A = np.array([(1103515245 * (j + 1) + 12345) % 1073741789 + 1
                 for j in range(16)], dtype=np.int64)
MH_B = np.array([(134775813 * (j + 1) + 1) % MH_P
                 for j in range(16)], dtype=np.int64)


def spark_round6(x):
    """Spark Round(double, 6): BigDecimal.valueOf(x) == shortest decimal
    repr (Python repr matches), setScale(6, HALF_UP), toDouble."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    print(f"[mh] {len(rows)} docs", flush=True)

    # shingle -> hb cache (md5 cost paid once per DISTINCT shingle string)
    hb_cache = {}
    doc_sh = {}   # doc_id -> set of shingle ids (interned ints)
    sh_ids = {}   # shingle string -> dense id
    hb_list = []
    for doc_id, text in rows:
        toks = text.split(" ")
        if len(toks) < 3:
            doc_sh[doc_id] = frozenset()
            continue
        ss = set(" ".join(toks[i:i + 3]) for i in range(len(toks) - 2))
        ids = set()
        for sh in ss:
            i = sh_ids.get(sh)
            if i is None:
                i = len(hb_list)
                sh_ids[sh] = i
                hb_list.append(
                    int(hashlib.md5(sh.encode()).hexdigest()[:8], 16))
            ids.add(i)
        doc_sh[doc_id] = frozenset(ids)
    hb = np.array(hb_list, dtype=np.int64)
    print(f"[mh] {len(hb_list)} distinct shingles", flush=True)

    # 16-slot signatures + band buckets
    buckets = {}
    nsh = {}
    for doc_id, ids in doc_sh.items():
        nsh[doc_id] = len(ids)
        if not ids:
            continue
        h = hb[np.fromiter(ids, dtype=np.int64, count=len(ids))]
        sig = ((MH_A[:, None] * h[None, :] + MH_B[:, None]) % MH_P).min(axis=1)
        for j in range(16):
            buckets.setdefault((j, int(sig[j])), []).append(doc_id)

    # capped buckets -> pair collision counts
    bo = {}
    for ds in buckets.values():
        if not 2 <= len(ds) <= 20:
            continue
        ds = sorted(ds)
        for i in range(len(ds)):
            for k in range(i + 1, len(ds)):
                p = (ds[i], ds[k])
                bo[p] = bo.get(p, 0) + 1
    print(f"[mh] {len(bo)} candidate pairs pre-cap", flush=True)

    # per-doc top-8 by (bo desc, partner asc), both orientations
    per_doc = {}
    for (a, b), n in bo.items():
        per_doc.setdefault(a, []).append((-n, b))
        per_doc.setdefault(b, []).append((-n, a))
    pairs = set()
    for d, cand in per_doc.items():
        for _, other in sorted(cand)[:8]:
            pairs.add((min(d, other), max(d, other)))
    print(f"[mh] {len(pairs)} pairs post top-8", flush=True)

    # exact-Jaccard verify + best match per doc
    best = {}
    for a, b in pairs:
        shared = len(doc_sh[a] & doc_sh[b])
        j = spark_round6(shared / (nsh[a] + nsh[b] - shared))
        for d, o in ((a, b), (b, a)):
            cur = best.get(d)
            if cur is None or (j, -o) > (cur[1], -cur[0]):
                best[d] = (o, j)
    expect = sorted((d, o, j) for d, (o, j) in best.items())

    files = sorted(glob.glob(f"{out_dir}/q27_minhash_near_dup/*.parquet"))
    if not files:
        print("FAIL q27_minhash_near_dup: no spark output")
        sys.exit(1)
    got = con.execute(
        f"SELECT doc_id, best_match, jaccard FROM read_parquet({files!r}) "
        "ORDER BY doc_id").fetchall()
    got = [(int(a), int(b), float(c)) for a, b, c in got]

    if got == expect:
        print(f"PASS q27_minhash_near_dup ({len(got)} rows, independent "
              "python reimplementation)")
        sys.exit(0)
    print(f"FAIL q27_minhash_near_dup: rows spark={len(got)} "
          f"python={len(expect)}")
    gs, es = dict((r[0], r) for r in got), dict((r[0], r) for r in expect)
    shown = 0
    for d in sorted(set(gs) | set(es)):
        if gs.get(d) != es.get(d) and shown < 5:
            print(f"  doc {d}: spark={gs.get(d)} python={es.get(d)}")
            shown += 1
    sys.exit(1)


if __name__ == "__main__":
    main()
