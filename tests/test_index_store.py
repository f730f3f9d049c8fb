"""Durable on-disk index store (r10 verdict #2): the retrieval/dedup
ingest-time indexes are written once as (bucketed / partitioned)
parquet and served — bit-identically — by ANY session, including a
fresh process that never built them. Probes must prune: the bm25
postings probe bucket-prunes to the query terms' buckets, the IVF
probe dynamic-partition-prunes to the probed cells' directories.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

import pytest

from tests.conftest import SF_DIR

STORE = "/tmp/spark_graft_index_store"


def _success_mtimes() -> dict[str, float]:
    return {
        d: os.path.getmtime(os.path.join(d, "_SUCCESS"))
        for d in glob.glob(f"{STORE}/sgi_*")
        if os.path.isfile(os.path.join(d, "_SUCCESS"))
    }


def test_bm25_disk_matches_fresh_and_bucket_prunes(spark, tables):
    from mmw_geoprocessing_spark.operators import search
    from mmw_geoprocessing_spark.sources.tables import load_table

    fresh = search.bm25_topk(spark, load_table(spark, SF_DIR, "documents"))
    disk = search.bm25_disk_topk(spark, SF_DIR)
    plan = disk._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, "postings scan is not bucket-pruned:\n" + plan[:1500]
    assert int(m.group(1)) < int(m.group(2)), m.group(0)
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(disk.collect(), key=key) == sorted(fresh.collect(), key=key)


def test_ivf_disk_matches_and_dynamic_partition_prunes(spark, tables):
    from mmw_geoprocessing_spark.operators import similarity as sim
    from mmw_geoprocessing_spark.sources.tables import load_table

    ref = sim.ann_ivf_topk(load_table(spark, SF_DIR, "embeddings"))
    disk = sim.ann_ivf_disk_topk(spark, SF_DIR)
    plan = disk._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan, (
        "IVF list scan is not DPP-pruned:\n" + plan[:1500]
    )
    key = lambda r: (r["q_id"], r["rank"])
    assert sorted(disk.collect(), key=key) == sorted(ref.collect(), key=key)


def test_incremental_dedup_disk_matches_session_plan(spark, tables):
    from mmw_geoprocessing_spark.operators import dedup
    from mmw_geoprocessing_spark.sources.tables import load_table

    ref = dedup.incremental_batch_dedup(load_table(spark, SF_DIR, "documents"))
    disk = dedup.incremental_batch_dedup_disk(spark, SF_DIR)
    key = lambda r: r["doc_id"]
    assert sorted(disk.collect(), key=key) == sorted(ref.collect(), key=key)


def test_bm25_append_is_exactly_once_and_matches_full(spark, tables):
    """The incremental-ingest face: the drop's postings append lands
    EXACTLY ONCE (marker commit — a re-run must not duplicate rows),
    probes keep bucket-pruning across base + appended files, and the
    served ranking equals the full-corpus fresh plan."""
    import re

    from mmw_geoprocessing_spark.operators import search
    from mmw_geoprocessing_spark.sources.tables import load_table

    full = search.bm25_topk(spark, load_table(spark, SF_DIR, "documents"))
    inc = search.bm25_index_append_topk(spark, SF_DIR)
    rows1 = inc.collect()
    rows2 = search.bm25_index_append_topk(spark, SF_DIR).collect()
    plan = inc._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) < int(m.group(2))
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(rows1, key=key) == sorted(full.collect(), key=key)
    assert sorted(rows1, key=key) == sorted(rows2, key=key)
    # the commit marker exists and the second call changed nothing
    markers = glob.glob(f"{STORE}/sgi_bm25_postings_inc_*.append_drop1")
    assert markers


def test_fingerprint_tracks_source_identity(tmp_path):
    from mmw_geoprocessing_spark.sources.index_store import corpus_fingerprint

    a = corpus_fingerprint(SF_DIR, "documents")
    assert a == corpus_fingerprint(SF_DIR, "documents")  # stable
    assert a != corpus_fingerprint("/root/testdata/sf0.01", "documents")
    # touching the source changes the fingerprint
    src = tmp_path / "documents.parquet"
    src.write_bytes(b"x")
    b1 = corpus_fingerprint(str(tmp_path), "documents")
    src.write_bytes(b"xy")
    assert corpus_fingerprint(str(tmp_path), "documents") != b1


_FRESH_PROC = r"""
import json, sys
sys.path.insert(0, "/root/repo")
from mmw_geoprocessing_spark.session import get_spark
from mmw_geoprocessing_spark.operators import search

spark = get_spark(app_name="fresh_serve", master="local[2]", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
rows = search.bm25_disk_topk(spark, %r).collect()
out = sorted((r["query_id"], r["doc_id"], r["rank"], r["score_scaled"]) for r in rows)
print("RESULT:" + json.dumps(out))
spark.stop()
"""


@pytest.mark.slow
def test_fresh_process_serves_from_disk_without_rebuild(spark, tables):
    """The restart story, end-to-end: a brand-new PROCESS (no session
    cache, no catalog) serves bm25 from the on-disk postings and
    returns rows identical to this session's — and the on-disk index
    is NOT rewritten (every _SUCCESS mtime is unchanged)."""
    from mmw_geoprocessing_spark.operators import search

    mine = sorted(
        (r["query_id"], r["doc_id"], r["rank"], r["score_scaled"])
        for r in search.bm25_disk_topk(spark, SF_DIR).collect()
    )
    before = _success_mtimes()
    assert before, "in-session call should have built the indexes"
    proc = subprocess.run(
        [sys.executable, "-c", _FRESH_PROC % SF_DIR],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT:")]
    assert line, proc.stdout[-2000:]
    theirs = [tuple(x) for x in json.loads(line[0][len("RESULT:"):])]
    assert theirs == mine
    after = _success_mtimes()
    assert all(after.get(d) == t for d, t in before.items()), (
        "fresh process rebuilt an index it should have re-attached"
    )


def test_stream_ingest_exactly_once_under_checkpoint_loss(spark, tables):
    """Structured Streaming delivers at-least-once to foreachBatch; the
    chunk-id marker commit must make the sink exactly-once. Drain,
    DESTROY the checkpoint (the worst replay: every chunk
    re-delivered), re-drain — zero appends may happen — and the served
    ranking must equal the fresh full-corpus plan throughout."""
    import os
    import shutil
    import tempfile

    from mmw_geoprocessing_spark.operators import search
    from mmw_geoprocessing_spark.sources.tables import load_table
    from mmw_geoprocessing_spark.streaming import index_ingest as ii

    key = lambda r: (r["query_id"], r["rank"])
    full = sorted(
        search.bm25_topk(spark, load_table(spark, SF_DIR, "documents")).collect(),
        key=key,
    )
    rows = sorted(ii.stream_index_serve(spark, SF_DIR).collect(), key=key)
    assert rows == full
    replay = ii.replay_docs_dir(spark, SF_DIR)
    ckpt = os.path.join(tempfile.gettempdir(), os.path.basename(replay) + "_ckpt")
    shutil.rmtree(ckpt)
    log: list[str] = []
    ii.stream_index_ingest(spark, SF_DIR, appended_log=log)
    assert log == [], f"checkpoint-loss replay re-appended chunks: {log}"
    rows3 = sorted(ii.stream_index_serve(spark, SF_DIR).collect(), key=key)
    assert rows3 == full
