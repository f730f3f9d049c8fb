#!/bin/bash
# Remaining sf10 retry shards (the first retry pass was interrupted
# mid-dedup_simhash by a driver restart): simhash, the zonal mask_all
# consumers whose DuckDB oracles exhausted spill disk, and the asof
# bigresult that hit a transient task failure.
set -u
cd /root/repo
SF=${SF10_DIR:-/tmp/spark_graft_sf10}
OUT=/tmp/sf10_parts
mkdir -p "$OUT"
export SPARK_GRAFT_BUCKETED_FIXTURES=1

run_one () {
  name=$1; prefixes=$2; big=${3:-}; optional=${4:-}; mem=${5:-80GB}; threads=${6:-8}
  echo "=== retry $name ($(date +%T)) ==="
  SELFCHECK_JSON="$OUT/$name.json" \
  SELFCHECK_BIGRESULT="$big" \
  SELFCHECK_ORACLE_OPTIONAL="$optional" \
  SELFCHECK_DUCK_MEM="$mem" \
  SELFCHECK_DUCK_THREADS="$threads" \
  SELFCHECK_NOTE="sf10 family $name" \
    python tools/selfcheck.py "$SF" "$prefixes"
  echo "=== retry $name done rc=$? ($(date +%T)) ==="
}

run_one dedup_simhash "dedup_s" "dedup_simhash_neardup" "" 90GB 4
run_one zonal_retry "raster_grouped_count_many,multi_,mapshed_" "" "" 80GB 4
run_one asof_retry "asof_" "asof_join_events_orders" "" 80GB 8
echo "=== retries2 complete ($(date +%T)) ==="
