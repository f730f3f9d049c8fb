#!/bin/bash
# Final round-9 sf10 shards: the two closure-family rows that died on
# spill disk at 64GB/8-threads. r8 established the working recipe for
# the MinHash-pipeline oracles at the 100x replica (run_sf10_retry.sh:
# dedup_minhash_lsh passed at 90GB/4 threads in a dedicated process) —
# more RAM, fewer threads, one heavyweight oracle per process, spill
# dir wiped between shards. Neither row needs the bigresult path: both
# results are narrow (25.6k pair rows / ~430k (doc_id,n_words,split)
# rows), and pipeline_curate_corpus' oracle now single-evaluates its
# gate pipeline (survivors AS MATERIALIZED). Plus the sf10 row for the
# round's new search_hybrid_rrf_topk (cheap, default budget).
set -u
cd /root/repo
SF=${SF10_DIR:-/tmp/spark_graft_sf10}
OUT=/tmp/sf10_parts_r9
mkdir -p "$OUT"
export SPARK_GRAFT_BUCKETED_FIXTURES=1

run_one () {
  name=$1; prefix=$2; mem=$3; threads=$4
  rm -rf /tmp/duck_spill
  echo "=== shard $name ($(date +%T)) ==="
  SELFCHECK_JSON="$OUT/zz_${name}.json" \
  SELFCHECK_DUCK_MEM="$mem" \
  SELFCHECK_DUCK_THREADS="$threads" \
  SELFCHECK_NOTE="sf10 round-9 retry shard $name (dedicated process, ${mem}/${threads}t — the r8 minhash-oracle recipe)" \
    python tools/selfcheck.py "$SF" "$prefix"
  echo "=== shard $name done rc=$? ($(date +%T)) ==="
  rm -rf /tmp/duck_spill
}

run_one neardup_components "dedup_neardup_components" 90GB 4
run_one curate_corpus "pipeline_curate_corpus" 90GB 4
run_one hybrid_rrf "search_hybrid_rrf_topk" 64GB 8

python tools/merge_selfchecks.py /root/repo/SELFCHECK_SF10.json \
  /root/repo/SELFCHECK_SF10.json "$OUT"/zz_*.json
echo "=== r9 sf10 retry complete ($(date +%T)) ==="
