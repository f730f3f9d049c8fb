#!/bin/bash
# Retry shards for the sf10 gate families that OOM'd in the first pass
# (the docs family died rc=134 after two DuckDB out-of-memory aborts).
# Finer process isolation: text and each dedup variant get their OWN
# process, and the dedup oracles get a higher DuckDB cap with fewer
# threads (per-thread operator state is what fragmented the 48 GB cap).
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

run_one text "text_,multimodal_,udtf_" "multimodal_frame_sample" "" 80GB 8
run_one dedup_en "dedup_e,dedup_n" "" "dedup_ngram_jaccard" 80GB 8
run_one dedup_minhash "dedup_m" "" "" 90GB 4
run_one dedup_simhash "dedup_s" "dedup_simhash_neardup" "" 90GB 4

# zonal mask_all consumers: their DuckDB oracles exhausted spill disk in
# the first pass (35-branch mask_all union over the 60 M-pixel grid);
# fewer DuckDB threads shrink simultaneous operator state and a higher
# cap keeps more of the aggregation in memory.
run_one zonal_retry "raster_grouped_count_many,multi_,mapshed_" "" "" 80GB 4
run_one asof_retry "asof_" "asof_join_events_orders" "" 80GB 8
echo "=== retries complete ($(date +%T)) ==="
