#!/bin/bash
# Opt-in SCALE SOAK: run the most expensive gates across every
# driver-provided scale factor and fit per-gate scaling exponents —
# the 2x bench bar at one SF can hide nonlinearity that only shows up
# as s/gate curving upward with data size. A gate whose fitted exponent
# exceeds 1.3 (superlinear beyond sort/shuffle log factors) deserves a
# plan audit before any 10x data growth.
#
# Usage: scripts/soak.sh [N]      (default: top 10 gates by baseline time)
# Writes a markdown table to stdout; paste it into PROGRESS.md.
# NOT part of the per-round gate loop — run in a quiet window (check
# /proc/loadavg first; ambient load inflates small-SF legs the most).
set -euo pipefail
cd "$(dirname "$0")/.."
N=${1:-10}
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=$(sed -n 's/.*OPENS="\(.*\)"/\1/p' scripts/verify_local.sh | head -1)

# top-N gates by their recorded clean times
GATES=$(python3 - "$N" <<'EOF'
import json, sys
base = json.load(open("scripts/bench_baseline.json"))
top = sorted(base.items(), key=lambda kv: -kv[1])[: int(sys.argv[1])]
print(",".join(k for k, _ in top))
EOF
)
echo "soak gates: $GATES" >&2

declare -A TOTALS
for SF in sf0.001 sf0.01 sf0.1; do
  echo "== $SF ==" >&2
  LINE=$(SPARK_GRAFT_SF_DIR=/root/testdata/$SF SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_ONLY="$GATES" \
    java $OPENS -Xmx8g -cp "$CP" graft.Bench 2>/dev/null | head -1)
  TOTALS[$SF]=$LINE
done

python3 - "$GATES" <<EOF
import json, math, sys
gates = sys.argv[1].split(",")
runs = {
  "0.001": json.loads('''${TOTALS[sf0.001]}'''),
  "0.01":  json.loads('''${TOTALS[sf0.01]}'''),
  "0.1":   json.loads('''${TOTALS[sf0.1]}'''),
}
print("| gate | s@0.001 | s@0.01 | s@0.1 | exp(0.01->0.1) | exp(fit) | flag |")
print("|---|---|---|---|---|---|---|")
for g in sorted(gates):
    ts = [runs[sf]["queries"].get(g) for sf in ("0.001", "0.01", "0.1")]
    if any(t is None or t <= 0 for t in ts):
        print(f"| {g} | - | - | - | - | - | missing |")
        continue
    # one-decade exponent (the honest number: sf0.001 legs are mostly
    # fixed cost and drag the fit toward 0)
    e1 = math.log10(ts[2] / ts[1])
    # least-squares slope over all three points, for reference
    xs = [math.log10(s) for s in (0.001, 0.01, 0.1)]
    ys = [math.log10(t) for t in ts]
    mx, my = sum(xs) / 3, sum(ys) / 3
    efit = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum((x - mx) ** 2 for x in xs)
    flag = "SUPERLINEAR" if e1 > 1.3 else ""
    print(f"| {g} | {ts[0]:.2f} | {ts[1]:.2f} | {ts[2]:.2f} | {e1:.2f} | {efit:.2f} | {flag} |")
EOF
