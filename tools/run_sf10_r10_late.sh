#!/bin/bash
# Round-10 LATE-round at-scale shards (the commands actually run, kept
# for reproducibility like run_sf10_r10.sh):
# - SF1 + SF10 rows for the seven late additions
#   (curation_domain_rate_cap, dedup_bloom_probe, cdc_scd2_history,
#   skew_join_salted, stream_sessionize, stream_stateful_counts,
#   source_python_ledger/_stream, maintenance_compact)
# - dedup_bloom_probe was RE-RUN after the 2^17->2^23 resize (the
#   first sf10 run measured 97% filter fill — saturation; BASELINE.md)
# Replicas are rebuilt on demand: tools/crossover.py build_replica()
# (sf1~) and build_replica(DST10, COPIES10) (sf10).
set -u
cd /root/repo
SF1=${SF1_DIR:-/tmp/spark_graft_sf1}
SF10=${SF10_DIR:-/tmp/spark_graft_sf10}
OUT1=/tmp/sf1_parts_r10b; OUT10=/tmp/sf10_parts_r10b
mkdir -p "$OUT1" "$OUT10"
export SELFCHECK_DUCK_MEM=${SELFCHECK_DUCK_MEM:-48GB}
export SELFCHECK_DUCK_THREADS=${SELFCHECK_DUCK_THREADS:-16}

python - <<'EOF'
import sys; sys.path.insert(0,'/root/repo'); sys.path.insert(0,'/root/repo/tools')
from crossover import build_replica, DST10, COPIES10
build_replica(); build_replica(DST10, COPIES10)
EOF

QS="curation_domain_rate_cap,dedup_bloom_probe,cdc_scd2_history,skew_join_salted,stream_sessionize,stream_stateful_counts,source_python_ledger,source_python_stream,maintenance_compact,cdc_incremental_rollup"
SELFCHECK_JSON="$OUT1/late_r10.json" \
  SELFCHECK_NOTE="sf1 round-10 late shard" \
  python tools/selfcheck.py "$SF1" "$QS"
SPARK_GRAFT_BUCKETED_FIXTURES=1 \
  SELFCHECK_JSON="$OUT10/late_r10.json" \
  SELFCHECK_BIGRESULT="cdc_scd2_history,maintenance_compact" \
  SELFCHECK_NOTE="sf10 round-10 late shard" \
  python tools/selfcheck.py "$SF10" "$QS"

python tools/merge_selfchecks.py /root/repo/SELFCHECK_SF1.json \
  /root/repo/SELFCHECK_SF1.json "$OUT1"/*.json
python tools/merge_selfchecks.py /root/repo/SELFCHECK_SF10.json \
  /root/repo/SELFCHECK_SF10.json "$OUT10"/*.json
echo "=== r10 late shards complete ==="
