#!/usr/bin/env bash
# Forced-contention A/B for the Bench storm gate (r16 verdict #1's
# done-criterion): run a quick-query Bench twice — once clean, once with a
# 32-thread busy-loop injected mid-run — and report both value_quiet
# readings. The gate passes if the stormy run's value_quiet lands within
# 1.2x of the clean run's (bracketing probes catch the storm, the guard
# buys extra passes, and the minima clamp bounds anything that slips).
#
# Usage: tools/storm_ab.sh [sf-dir]   (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
QS="q1_pricing,q3_shipping,analytics_binned,analytics_corr,text_stats,wm_content_id,dedup_exact_groups,profile_columns,q_events_cube,tail_slice"

run_bench() { # $1 = perquery path
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_ONLY="$QS" \
    SPARK_GRAFT_BENCH_PERQUERY="$1" sbt -batch "runMain graft.Bench" 2>&1 \
    | grep -o '{"queries".*}' | tail -1
}

echo "== clean run =="
CLEAN_JSON=$(run_bench /tmp/storm_ab_clean.json)
echo "$CLEAN_JSON" | python3 -c 'import json,sys; d=json.load(sys.stdin); print("value_quiet", d["value_quiet"], "policy", d["quiet_policy"], "verdicts", d["calib_verdicts"])'

echo "== stormy run (32-thread load at +22s for 15s) =="
(sleep 22; for i in $(seq 32); do (timeout 15 bash -c 'while :; do :; done') & done; wait) >/dev/null 2>&1 &
LOAD=$!
STORM_JSON=$(run_bench /tmp/storm_ab_storm.json)
wait "$LOAD" 2>/dev/null || true
echo "$STORM_JSON" | python3 -c 'import json,sys; d=json.load(sys.stdin); print("value_quiet", d["value_quiet"], "policy", d["quiet_policy"], "verdicts", d["calib_verdicts"])'

python3 - "$CLEAN_JSON" "$STORM_JSON" <<'PY'
import json, sys
c, s = json.loads(sys.argv[1]), json.loads(sys.argv[2])
ratio = s["value_quiet"] / c["value_quiet"]
print(f"clean value_quiet={c['value_quiet']:.3f}  storm value_quiet={s['value_quiet']:.3f}  ratio={ratio:.2f}")
ok = ratio <= 1.2
print("GATE", "PASS" if ok else "FAIL", "(storm-run quiet stat must stay within 1.2x of clean)")
sys.exit(0 if ok else 1)
PY
