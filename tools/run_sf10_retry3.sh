#!/bin/bash
# Final sf10 retry shards (round 8): the four rows still red in the
# merged artifact. The first-pass failures were environmental — the
# zonal DuckDB oracles ran out of SPILL DISK with 20 GB of stale
# duckdb_temp_* from the aborted docs family still occupying /tmp, and
# the asof bigresult lost a Spark task under the same disk pressure.
# /tmp is cleared before this runs (75 GB free); DuckDB gets fewer
# threads (smaller simultaneous operator state) and a dedicated spill
# dir that is wiped between shards.
set -u
cd /root/repo
SF=${SF10_DIR:-/tmp/spark_graft_sf10}
OUT=/tmp/sf10_parts
mkdir -p "$OUT"
export SPARK_GRAFT_BUCKETED_FIXTURES=1

run_one () {
  name=$1; prefixes=$2; big=${3:-}; optional=${4:-}; mem=${5:-80GB}; threads=${6:-8}
  echo "=== retry $name ($(date +%T)) ==="
  rm -rf /tmp/duck_spill
  SELFCHECK_JSON="$OUT/$name.json" \
  SELFCHECK_BIGRESULT="$big" \
  SELFCHECK_ORACLE_OPTIONAL="$optional" \
  SELFCHECK_DUCK_MEM="$mem" \
  SELFCHECK_DUCK_THREADS="$threads" \
  SELFCHECK_NOTE="sf10 family $name" \
    python tools/selfcheck.py "$SF" "$prefixes"
  echo "=== retry $name done rc=$? ($(date +%T)) ==="
}

run_one asof_retry "asof_" "asof_join_events_orders" "" 80GB 8
run_one zonal_retry "raster_grouped_count_many,multi_operation,mapshed_" "" "" 80GB 4
echo "=== retries3 complete ($(date +%T)) ==="
