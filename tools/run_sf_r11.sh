#!/bin/bash
# Round-11 SELFCHECK extension at the 10x and 100x replicas:
# - at-scale verdicts for the five operators registered this round
#   (search_bm25_disk_topk, similarity_ann_ivf_disk_topk,
#   dedup_incremental_disk, sampling_nucleus_topp,
#   sampling_decontaminated_mix)
# - REGENERATION of the tpch_q3/q5/q10/q18 rows: the serving layout
#   changed to the bucketed orderkey tables this round (bench/sf10
#   mode), so the at-scale hash verdicts must cover the layout that
#   is actually benched, not the raw-parquet plan the r10 rows ran.
# Family-per-process, merged INTO the existing SELFCHECK_SF{1,10}.json.
set -u
cd /root/repo
export SELFCHECK_DUCK_MEM=${SELFCHECK_DUCK_MEM:-48GB}
export SELFCHECK_DUCK_THREADS=${SELFCHECK_DUCK_THREADS:-16}
export SPARK_GRAFT_BUCKETED_FIXTURES=1

run_family () {
  sf=$1; out=$2; name=$3; prefixes=$4; big=${5:-}; optional=${6:-}
  echo "=== family $name @ $sf ($(date +%T)) ==="
  SELFCHECK_JSON="$out/$name.json" \
  SELFCHECK_BIGRESULT="$big" \
  SELFCHECK_ORACLE_OPTIONAL="$optional" \
  SELFCHECK_NOTE="round-11 family $name" \
    python tools/selfcheck.py "$sf" "$prefixes"
  echo "=== family $name done rc=$? ($(date +%T)) ==="
}

for tier in sf1 sf10; do
  if [ "$tier" = sf1 ]; then SF=/tmp/spark_graft_sf1; else SF=/tmp/spark_graft_sf10; fi
  OUT=/tmp/${tier}_parts_r11
  mkdir -p "$OUT"
  run_family "$SF" "$OUT" retrieval \
    "search_bm25_disk_topk,similarity_ann_ivf_disk_topk"
  run_family "$SF" "$OUT" dedup "dedup_incremental_disk"
  run_family "$SF" "$OUT" curation \
    "sampling_nucleus_topp,sampling_decontaminated_mix"
  run_family "$SF" "$OUT" tpch "tpch_"
  if [ "$tier" = sf1 ]; then
    python tools/merge_selfchecks.py /root/repo/SELFCHECK_SF1.json \
      /root/repo/SELFCHECK_SF1.json "$OUT"/*.json
  else
    python tools/merge_selfchecks.py /root/repo/SELFCHECK_SF10.json \
      /root/repo/SELFCHECK_SF10.json "$OUT"/*.json
  fi
done
echo "=== r11 scale gates complete ($(date +%T)) ==="
