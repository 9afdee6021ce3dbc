#!/usr/bin/env python3
"""Render the SCALE.md growth table from the paired sweep artifacts.

Reads artifacts/bench_only_sf0.1.json and artifacts/bench_only_sf1.json
(same 18 queries, same host, queries_min statistic) and replaces the
<!-- SCALE_TABLE --> marker region in SCALE.md with a markdown table of
per-query growth ratios at 10x data. Dev-only tool.
"""
import json
import re

NOTES = {
    "q01_pricing_summary": "10x lineitem scan+agg",
    "q02_star_revenue": "dims broadcast; fact-side linear",
    "q27_minhash_near_dup": "band buckets + 20-doc cap",
    "q28_simhash": "banded fingerprints, pruned buckets",
    "q29_jaccard_pairs": "~100x true pairs (10 replicas/doc); df-cap held",
    "q35_ann_blocked": "UNCAPPED foil: hot 3k-vector cell, |cell|² — see #3",
    "q37_ann_lsh": "BUCKET_CAP=50 absorbs the dense cluster",
    "q38_sessionize": "hot user (18% of stream) absorbed",
    "q40_hll_users": "sketch: size-independent state",
    "q62_session_window": "hot user absorbed",
    "q65_dedup_clusters": "6 contraction rounds (5-6 at sf0.1)",
    "q69_ann_ivf": "multi-probe IVF, capped cells",
    "q88_chunk_dedup": "chunk-keyed shuffle",
    "q98_cms_heavy_hitters": "sketch: size-independent state",
    "q102_cluster_safe_split": "after the Components nodes fix — see #2",
    "q120_bm25_retrieval": "10x queries x 10x corpus by definition — see #5",
    "q129_semdedup": "cluster-scoped; never all-pairs",
    "q131_rrf_fusion": "same Qx N workload as q120 — see #5",
}


def main():
    a = json.load(open("artifacts/bench_only_sf0.1.json"))["queries_min"]
    b = json.load(open("artifacts/bench_only_sf1.json"))["queries_min"]
    rows = []
    for q in sorted(a, key=lambda q: b[q] / a[q]):
        r = b[q] / a[q]
        flag = "OK" if r <= 15 else "see notes"
        rows.append(f"| {q} | {a[q]:.2f} | {b[q]:.2f} | {r:.1f}x | "
                    f"{NOTES.get(q, '')} |")
    table = "\n".join(
        ["| query | sf0.1 (s) | sf1 = 10x (s) | growth | note |",
         "|---|---|---|---|---|"] + rows)
    md = open("SCALE.md").read()
    md = re.sub(r"<!-- SCALE_TABLE -->.*?(?=\n## )",
                "<!-- SCALE_TABLE -->\n" + table + "\n\n", md,
                count=1, flags=re.S)
    open("SCALE.md", "w").write(md)
    print(table)


if __name__ == "__main__":
    main()
