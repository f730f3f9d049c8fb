#!/bin/bash
# Round-10 SELFCHECK_SF10 extension:
# - at-scale verdicts for the three ops registered this round
#   (stream_cdc_merge_bucketed, search_hybrid_rrf_ivf_topk,
#   similarity_cosine_topk_pandas)
# - REGENERATION of the CDC rows: the r9 rows were computed under the
#   +500M surrogate-insert scheme, which collides with real orderkeys
#   at the 100x replica (max key ~9.9e9) — the r9 ADVICE finding. The
#   negated-key scheme changes the merged row count at this scale, so
#   the recorded verdicts are stale until re-run.
# Family-per-process, merged INTO the existing SELFCHECK_SF10.json.
set -u
cd /root/repo
SF=${SF10_DIR:-/tmp/spark_graft_sf10}
OUT=/tmp/sf10_parts_r10
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
  SELFCHECK_NOTE="sf10 round-10 family $name" \
    python tools/selfcheck.py "$SF" "$prefixes"
  echo "=== family $name done rc=$? ($(date +%T)) ==="
}

# merged CDC tables are ~14-15M rows -> EXCEPT-ALL big-result compare
run_family cdc "cdc_changelog_merge,stream_cdc_merge,stream_cdc_merge_bucketed" \
  "cdc_changelog_merge,stream_cdc_merge,stream_cdc_merge_bucketed"
run_family retrieval "search_hybrid_rrf_ivf_topk,similarity_cosine_topk_pandas"

python tools/merge_selfchecks.py /root/repo/SELFCHECK_SF10.json \
  /root/repo/SELFCHECK_SF10.json "$OUT"/*.json
echo "=== r10 sf10 gate complete ($(date +%T)) ==="
