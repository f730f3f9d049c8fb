"""Streaming CDC upsert (streaming/cdc.py): foreachBatch incremental
latest-wins compaction over a chunked changelog replay, gated against
the batch merge's closed-form oracle."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.streaming import cdc as scdc


def test_stream_cdc_merge_matches_batch_oracle(spark, tables, duck):
    out = scdc.stream_cdc_merge_batch(spark, os.environ.get(
        "SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001"
    )).toPandas()
    want = duck.execute(scdc.stream_cdc_merge_batch_sql()).df()
    cols = sorted(out.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_stream_cdc_merges_across_micro_batches(spark):
    """The drain must produce MULTIPLE state snapshots (one per
    micro-batch — maxFilesPerTrigger=1 over >=2 chunks), and the final
    state must show cross-batch latest-wins: a seq-2 update from a
    later batch overriding seq-1 from an earlier one, a delete killing
    a key updated in an earlier batch, and retained tombstones inside
    the state (dropped only at read)."""
    sf = "/root/testdata/sf0.001"
    replay = scdc.replay_changelog_dir(spark, sf)
    state_root = tempfile.mkdtemp(prefix="cdc_state_test_")
    ckpt = tempfile.mkdtemp(prefix="cdc_ckpt_test_")
    scdc.stream_cdc_merge(spark, replay, state_root, ckpt)
    snaps = sorted(d for d in os.listdir(state_root) if d.startswith("state_"))
    assert len(snaps) >= 2, snaps
    final = scdc._latest_state_df(spark, state_root)
    # tombstones are IN the state...
    assert final.filter(F.col("op") == "D").count() > 0
    rows = {r["o_orderkey"]: r for r in final.collect()}
    # ...and latest-wins held across batches
    base_keys = [k for k in rows if k > 0]  # exclude negated insert surrogates
    seq2_keys = [k for k in base_keys if k % 21 == 3 and k % 13 != 4]
    assert seq2_keys and all(rows[k]["seq"] == 2 for k in seq2_keys)
    deleted = [k for k in base_keys if k % 13 == 4]
    assert deleted and all(rows[k]["op"] == "D" for k in deleted)


def test_stream_cdc_checkpoint_resume_is_idempotent(spark):
    """Re-running the drain with the SAME checkpoint after completion
    must be a no-op (offsets committed), leaving the state unchanged."""
    sf = "/root/testdata/sf0.001"
    replay = scdc.replay_changelog_dir(spark, sf)
    state_root = tempfile.mkdtemp(prefix="cdc_state_resume_")
    ckpt = tempfile.mkdtemp(prefix="cdc_ckpt_resume_")
    scdc.stream_cdc_merge(spark, replay, state_root, ckpt)
    snaps1 = sorted(os.listdir(state_root))
    n1 = scdc._latest_state_df(spark, state_root).count()
    scdc.stream_cdc_merge(spark, replay, state_root, ckpt)  # resume: nothing new
    snaps2 = sorted(os.listdir(state_root))
    assert snaps1 == snaps2
    assert scdc._latest_state_df(spark, state_root).count() == n1


def test_crashed_epoch_replay_merges_against_prior_snapshot(spark):
    """Crash-safety (r9 ADVICE): a replayed epoch N must merge against
    the max snapshot with epoch < N, never its own partially-written
    state_N (which mode('overwrite') deletes while the lazy read of the
    same path is in flight). Simulate the crash by running epochs 0 and
    1, then re-invoking _merge_into_state for epoch 1 — the rebuilt
    state_1 must equal the first attempt's, not a state_1-based merge."""
    sf = "/root/testdata/sf0.001"
    replay = scdc.replay_changelog_dir(spark, sf)
    state_root = tempfile.mkdtemp(prefix="cdc_state_crash_")
    chunks = sorted(
        d for d in os.listdir(replay) if os.path.isdir(os.path.join(replay, d))
    )
    assert len(chunks) >= 2
    b0 = spark.read.parquet(os.path.join(replay, chunks[0]))
    b1 = spark.read.parquet(os.path.join(replay, chunks[1]))
    scdc._merge_into_state(state_root, b0, 0)
    scdc._merge_into_state(state_root, b1, 1)
    first = {
        (r["o_orderkey"], r["seq"], r["op"])
        for r in spark.read.parquet(
            os.path.join(state_root, "state_000000001")
        ).collect()
    }
    # replay of epoch 1 (at-least-once redelivery after a crash)
    scdc._merge_into_state(state_root, b1, 1)
    second = {
        (r["o_orderkey"], r["seq"], r["op"])
        for r in spark.read.parquet(
            os.path.join(state_root, "state_000000001")
        ).collect()
    }
    assert first == second
    # and the base it merged against was state_0, not state_1:
    base = scdc._latest_state_df(spark, state_root, before_epoch=1)
    assert base.count() == b0.count()


def test_bucketed_state_rewrites_only_touched_buckets(spark):
    """Deployment-shape claim (r9 verdict #4): the bucketed-state
    variant must rewrite ONLY the key buckets each micro-batch touches.
    With N_BUCKETS=7, the seq-1 chunk's keys are all ≡ 3 (mod 7), so
    its batch must rewrite exactly 1 of 7 buckets — and the drained
    result must still equal the batch changelog merge row-for-row."""
    from mmw_geoprocessing_spark.operators.cdc import changelog_merge_orders
    from mmw_geoprocessing_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    replay = scdc.replay_changelog_dir(spark, sf)
    state_root = tempfile.mkdtemp(prefix="cdc_bstate_test_")
    ckpt = tempfile.mkdtemp(prefix="cdc_bckpt_test_")
    rewritten: list[int] = []
    scdc.stream_cdc_merge_bucketed(
        spark, replay, state_root, ckpt, n_buckets=7, rewritten_log=rewritten
    )
    # one batch per FILE (maxFilesPerTrigger=1; chunks may span several
    # part files). The seq-1 chunk's files (keys ≡ 3 mod 7) must each
    # rewrite exactly 1 bucket, and the total rewrite volume must be
    # strictly below full-state-per-batch.
    assert len(rewritten) >= 3, rewritten
    assert min(rewritten) == 1, rewritten
    assert max(rewritten) <= 7, rewritten
    assert sum(rewritten) < len(rewritten) * 7, rewritten
    # final state == batch merge (same closed-form oracle), tombstones out
    got = (
        scdc._bucketed_state_df(spark, state_root)
        .filter(F.col("op") != "D")
        .select("o_orderkey", "seq", "o_totalprice")
    )
    want = changelog_merge_orders(load_table(spark, sf, "orders")).select(
        "o_orderkey", F.col("version").alias("seq"), "o_totalprice"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
