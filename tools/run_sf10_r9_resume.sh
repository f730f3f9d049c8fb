#!/bin/bash
# Resume of tools/run_sf10_r9.sh after the disk-full abort: the first
# attempt completed newops/assembly/textstages (parts in
# /tmp/sf10_parts_r9) and died inside the closures family when the
# pipeline_curate_corpus oracle's 3x re-evaluation spilled past the
# disk (fixed in selfcheck.py by materializing big_oracle once).
# Re-runs ONLY closures + the semdedup part, then merges ALL parts.
set -u
cd /root/repo
SF=${SF10_DIR:-/tmp/spark_graft_sf10}
OUT=/tmp/sf10_parts_r9
mkdir -p "$OUT"
rm -rf /tmp/duck_spill
export SELFCHECK_DUCK_MEM=${SELFCHECK_DUCK_MEM:-64GB}
export SELFCHECK_DUCK_THREADS=${SELFCHECK_DUCK_THREADS:-8}
export SPARK_GRAFT_BUCKETED_FIXTURES=1

echo "=== family closures ($(date +%T)) ==="
SELFCHECK_JSON="$OUT/closures.json" \
SELFCHECK_BIGRESULT="pipeline_curate_corpus" \
SELFCHECK_NOTE="sf10 round-9 family closures (resume after disk-full; oracle now single-evaluated)" \
  python tools/selfcheck.py "$SF" "dedup_neardup_components,pipeline_curate_corpus"
echo "=== family closures done rc=$? ($(date +%T)) ==="
rm -rf /tmp/duck_spill

python tools/sf10_semdedup_components.py "$SF" "$OUT/semdedup.json"
echo "=== semdedup done rc=$? ($(date +%T)) ==="

python tools/merge_selfchecks.py /root/repo/SELFCHECK_SF10.json \
  /root/repo/SELFCHECK_SF10.json "$OUT"/*.json
echo "=== r9 sf10 gate complete ($(date +%T)) ==="
