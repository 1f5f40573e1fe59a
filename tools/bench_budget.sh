#!/usr/bin/env bash
# Budget gate for the driver's one-hour bench window (VERDICT r7 #7):
# run the FULL Bench exactly as the driver does (warmup + 3 timed
# iterations + online + stress) under the same 3600 s hard timeout, then
# fail unless it finished with >=20% margin (SPARK_GRAFT_BUDGET_SEC,
# default 2700 s), reached the "final" phase, failed nothing, and
# skipped no stress rows. Run this after adding queries or stress rows —
# budget regressions must be caught here, not by the driver's kill
# (round 7's bench died at the wall clock with rc=124 and no artifact).
#
# Usage: tools/bench_budget.sh   (from anywhere; logs to /tmp/bench_budget.log)
set -euo pipefail
cd "$(dirname "$0")/.."
BUDGET="${SPARK_GRAFT_BUDGET_SEC:-2700}"
start=$(date +%s)
rc=0
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
SPARK_GRAFT_BUDGET_SEC="$BUDGET" \
timeout 3600 sbt -batch "runMain graft.Bench" \
  > /tmp/bench_budget.log 2>&1 || rc=$?
end=$(date +%s); wall=$((end - start))
echo "bench rc=$rc wall=${wall}s budget=${BUDGET}s (log: /tmp/bench_budget.log)"
if [ "$rc" -ne 0 ]; then
  echo "FAIL: bench exited $rc"
  tail -5 /tmp/bench_budget.log
  exit 1
fi
python3 - "$wall" "$BUDGET" <<'EOF'
import json, sys
wall, budget = int(sys.argv[1]), int(sys.argv[2])
d = json.load(open("BENCH_DETAIL.json"))
skipped = d.get("stress", {}).get("skipped", [])
errors = d.get("errors", {})
print(f"phase={d.get('phase')} bench_elapsed={d.get('elapsed_sec')}s "
      f"phase_sec={d.get('phase_sec')} n_iters={d.get('n_iters')} "
      f"skipped_stress={len(skipped)} errors={len(errors)}")
problems = []
if wall > budget:
    problems.append(f"wall {wall}s exceeds budget {budget}s")
if d.get("phase") != "final":
    problems.append(f"did not reach final phase (got {d.get('phase')})")
if skipped:
    problems.append(f"{len(skipped)} stress rows skipped: {skipped[:5]}")
if errors:
    problems.append(f"{len(errors)} query errors: {list(errors)[:5]}")
if d.get("n_iters", 0) < 2:
    problems.append(f"main pass degraded to {d.get('n_iters')} iterations")
elif d.get("n_iters", 0) < 3:
    # min-of-2 is an accepted degradation on a slow box phase (the host's
    # effective CPU speed swings >1.6x — see SCALE.md round-8 bisect);
    # warn but don't fail: all phases still completed within budget
    print(f"WARN: main pass ran {d.get('n_iters')} iterations (slow box)")
for p in problems:
    print("FAIL:", p)
sys.exit(1 if problems else 0)
EOF
echo "PASS: full bench fits ${BUDGET}s with all phases complete"
