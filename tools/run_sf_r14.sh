#!/bin/bash
# Round-14 SELFCHECK extension at the 10x and 100x replicas: at-scale
# verdicts for the rows registered this round (the video keyframe
# family and the TPC-H revenue-MV serving paths). Family-per-process,
# merged INTO the existing SELFCHECK_SF{1,10}.json.
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
  SELFCHECK_NOTE="round-14 family $name" \
    python tools/selfcheck.py "$sf" "$prefixes"
  echo "=== family $name done rc=$? ($(date +%T)) ==="
}

TIERS=${1:-"sf1 sf10"}
for tier in $TIERS; do
  if [ "$tier" = sf1 ]; then SF=/tmp/spark_graft_sf1; else SF=/tmp/spark_graft_sf10; fi
  OUT=/tmp/${tier}_parts_r14
  mkdir -p "$OUT"
  run_family "$SF" "$OUT" video_fp "video_keyframe_fingerprints" "video_keyframe_fingerprints"
  run_family "$SF" "$OUT" video_dedup "dedup_video_keyframe" "dedup_video_keyframe"
  run_family "$SF" "$OUT" tpch_preagg "tpch_q3_preagg,tpch_q10_preagg"
  if [ "$tier" = sf1 ]; then
    python tools/merge_selfchecks.py /root/repo/SELFCHECK_SF1.json \
      /root/repo/SELFCHECK_SF1.json "$OUT"/*.json
  else
    python tools/merge_selfchecks.py /root/repo/SELFCHECK_SF10.json \
      /root/repo/SELFCHECK_SF10.json "$OUT"/*.json
  fi
done
echo "=== r14 scale gates complete ($(date +%T)) ==="
