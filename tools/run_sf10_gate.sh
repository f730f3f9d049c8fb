#!/bin/bash
# SELFCHECK_SF10 gate driver: family-per-process over the 100x replica.
#
# Each family runs in its OWN python process (a DuckDB OOM-abort in one
# family's oracle must not take down the others — documented in
# tools/merge_selfchecks.py), writing /tmp/sf10_parts/<family>.json;
# the parts are merged into SELFCHECK_SF10.json at the end.
#
# BIGRESULT: queries whose sf10 result is >= ~2 M rows — compared via
# the spill-safe DuckDB EXCEPT-ALL path instead of driver toPandas.
# ORACLE_OPTIONAL: dedup_ngram_jaccard — its DuckDB twin's list builds
# are non-spillable and exceed any memory cap at this scale (measured
# in round 7); the Spark side still runs and its row count is recorded
# with the oracle's error reason (explicit weaker verdict, no silent
# pass).
set -u
cd /root/repo
SF=${SF10_DIR:-/tmp/spark_graft_sf10}
OUT=/tmp/sf10_parts
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
  SELFCHECK_NOTE="sf10 family $name" \
    python tools/selfcheck.py "$SF" "$prefixes"
  echo "=== family $name done rc=$? ($(date +%T)) ==="
}

run_family docs "text_,multimodal_,udtf_,dedup_" \
  "dedup_simhash_neardup,multimodal_frame_sample" \
  "dedup_ngram_jaccard"
run_family similarity "similarity_"
run_family events "events_,windows_,window_,asof_,interval_,pivot_,json_,array_,scalar_,datetime_" \
  "windows_showcase,window_running_total,events_windows_showcase,asof_join_events_orders"
run_family relational "pricing_,top_,semi_,rollup_,cube_,grouping_,set_,aggregate_,approx_,string_,correlated_,cross_,pandas_,tpch_"
run_family zonal "raster_,multi_,mapshed_"

python tools/merge_selfchecks.py /root/repo/SELFCHECK_SF10.json "$OUT"/*.json
echo "=== gate complete ($(date +%T)) ==="
