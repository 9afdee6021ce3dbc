#!/bin/bash
# Targeted bench adjudication runner (VERDICT r14 next-round #1): N fresh
# JVMs over a comma-separated query set, one JSON line per JVM. Each JVM
# is itself Bench's min-of->=3-samples protocol; the adjudication statistic
# is the min across JVMs (the r14 q61/q62/q148 precedent in BASELINE.md).
# Usage: tools/bench_targeted.sh <queries-csv> <n-jvms> <out-prefix> [sfdir]
set -e
cd /root/repo
QUERIES="$1"; N="${2:-3}"; PREFIX="$3"; SFDIR="${4:-/root/testdata/sf0.1}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for i in $(seq 1 "$N"); do
  echo "=== JVM $i/$N loadavg=$(cut -d' ' -f1 /proc/loadavg) ===" >&2
  SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  SPARK_GRAFT_BENCH_TAG="$(basename "$PREFIX" | sed -E 's/^bench_only_sf[0-9.]+_//')_jvm${i}" \
  SPARK_GRAFT_REPO=/root/repo \
  SPARK_GRAFT_CPUS=32 java $OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
    >/dev/null 2>&1
done
python3 - "$PREFIX" "$N" <<'EOF'
import json, sys
prefix, n = sys.argv[1], int(sys.argv[2])
runs = [json.load(open(f"{prefix}_jvm{i}.json")) for i in range(1, n + 1)]
names = sorted(runs[0]["queries_min"])
out = {
    "protocol": f"min over {n} fresh JVMs, each Bench min-of->=3 samples",
    "sf": runs[0].get("sf"),
    "queries_min": {q: min(r["queries_min"][q] for r in runs) for q in names},
    "per_jvm_min": {q: [r["queries_min"][q] for r in runs] for q in names},
    "load": {q: [r["load"][q] for r in runs] for q in names},
}
with open(f"{prefix}.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out["queries_min"], indent=1))
EOF
