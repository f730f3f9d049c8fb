#!/bin/bash
# Round-9 SELFCHECK_SF10 extension: at-scale (100x replica) verdicts for
# the registry entries promoted/added after the round-8 gate ran —
# family-per-process (same isolation rationale as run_sf10_gate.sh),
# merged INTO the existing SELFCHECK_SF10.json.
#
# BIGRESULT rows (result is corpus-sized at sf10) use the spill-safe
# DuckDB EXCEPT-ALL compare: text stages + assembly ops return one row
# per document (~500k x full text), cdc returns ~15 M merged orders,
# sessionize ~8 M sessions.
set -u
cd /root/repo
SF=${SF10_DIR:-/tmp/spark_graft_sf10}
OUT=/tmp/sf10_parts_r9
mkdir -p "$OUT"
export SELFCHECK_DUCK_MEM=${SELFCHECK_DUCK_MEM:-48GB}
export SELFCHECK_DUCK_THREADS=${SELFCHECK_DUCK_THREADS:-16}
export SPARK_GRAFT_BUCKETED_FIXTURES=1

run_family () {
  name=$1; prefixes=$2; big=${3:-}; optional=${4:-}
  echo "=== family $name ($(date +%T)) ==="
  SELFCHECK_JSON="$OUT/$name.json" \
  SELFCHECK_BIGRESULT="$big" \
  SELFCHECK_ORACLE_OPTIONAL="$optional" \
  SELFCHECK_NOTE="sf10 round-9 family $name" \
    python tools/selfcheck.py "$SF" "$prefixes"
  echo "=== family $name done rc=$? ($(date +%T)) ==="
}

run_family newops "search_bm25_topk,cdc_changelog_merge,sessionize_events" \
  "cdc_changelog_merge,sessionize_events"
run_family assembly "sampling_deterministic_split,sampling_stratified_sample,sampling_pack_token_batches" \
  "sampling_deterministic_split,sampling_stratified_sample,sampling_pack_token_batches"
run_family textstages "text_normalize,text_pii_redact" \
  "text_normalize,text_pii_redact"
run_family closures "dedup_neardup_components,pipeline_curate_corpus" \
  "pipeline_curate_corpus"
python tools/sf10_semdedup_components.py "$SF" "$OUT/semdedup.json"

python tools/merge_selfchecks.py /root/repo/SELFCHECK_SF10.json \
  /root/repo/SELFCHECK_SF10.json "$OUT"/*.json
echo "=== r9 sf10 gate complete ($(date +%T)) ==="
