"""Video keyframe dedup (r13 verdict #7): container round-trip pinned
byte-exact, per-frame dHash pinned against a hand replica, injected
structure recovered, 10x-replica linearity pinned BEFORE registration
(r13 verdict #10), hot-bucket cap pinned, oracle parity at fixture."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.operators import video_dedup as vd
from tests.conftest import SF_DIR


def _docs(spark, n=64):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


def test_container_round_trips_the_closed_form_pixels(spark):
    """attach_video -> unpack -> decode_png == the _vpx closed form:
    container + codec are lossless, which is what lets the DuckDB
    oracle replay pixels arithmetically."""
    from mmw_geoprocessing_spark.functions import png_codec

    rows = vd.attach_video(_docs(spark, 16)).collect()
    assert len(rows) == 16
    for r in rows:
        d = r["doc_id"]
        frames = vd._unpack_container(bytes(r["payload"]))
        assert len(frames) == vd.VKF_N_FRAMES
        g, v = d // vd.GROUP_SIZE, d % 4
        for f, frame in enumerate(frames):
            w, h, mode, lines = png_codec.decode_png(frame)
            assert (mode, h, w) == ("L", vd.IMG_H, vd.IMG_W)
            px = np.frombuffer(b"".join(lines), dtype=np.uint8).reshape(h, w)
            want = np.array(
                [
                    [vd._vpx(g, v, f, y, x) for x in range(w)]
                    for y in range(h)
                ]
            )
            assert (px == want).all(), f"doc {d} frame {f}: drifted"


def test_keyframe_hash_matches_hand_replica(spark):
    """Chunk packing per frame: bit b = (y*8+x), chunk b//16, weight
    2^(b%16) — the exact packing the SQL twin emits."""
    fp = {
        (r["doc_id"], r["frame_idx"]): r
        for r in vd.video_keyframe_fingerprints(_docs(spark, 8)).collect()
    }
    for d in range(8):
        g, v = d // vd.GROUP_SIZE, d % 4
        for f in range(vd.VKF_N_FRAMES):
            px = np.array(
                [
                    [vd._vpx(g, v, f, y, x) for x in range(vd.IMG_W)]
                    for y in range(vd.IMG_H)
                ]
            )
            bits = (px[:, :-1] > px[:, 1:]).ravel()
            row = fp[(d, f)]
            for c in range(4):
                want = int(sum(1 << i for i in range(16) if bits[c * 16 + i]))
                assert row[f"d{c}"] == want, (d, f, c)
            assert row["dhash_hex"] == "%04x%04x%04x%04x" % tuple(
                row[f"d{c}"] for c in range(4)
            )


def test_injected_structure_recovered(spark):
    """Within each 8-doc group: same-variant clips are exact dups
    (n_shared = N), variant 1 shares exactly N-1 keyframes with
    variant 0 (one REPLACED frame); variants 2/3 are unrelated."""
    pairs = {
        (r["a_id"], r["b_id"]): r["n_shared"]
        for r in vd.dedup_video_keyframe(_docs(spark, 64)).collect()
    }
    n = vd.VKF_N_FRAMES
    for g in range(8):
        base = g * vd.GROUP_SIZE
        for v in range(4):
            assert pairs.get((base + v, base + v + 4)) == n, (
                f"exact dup missed: {(base + v, base + v + 4)}"
            )
        for a in (base, base + 4):
            for b in (base + 1, base + 5):
                key = (min(a, b), max(a, b))
                assert pairs.get(key) == n - 1, (
                    f"one-frame edit missed: {key} -> {pairs.get(key)}"
                )
        # the re-synth variants never reach the threshold vs base
        for other in (base + 2, base + 3):
            assert (base, other) not in pairs
    # exactly the designed pairs, nothing else (64-bit keys don't
    # accidentally collide at this scale)
    assert len(pairs) == 8 * 8


def test_pair_count_and_buckets_stay_linear_at_10x(spark):
    """r13 verdict #10 — the scale histogram test that must exist (and
    ran green) BEFORE the family registers: at a 10x-replica-sized
    corpus, pairs stay ~8 per group and the worst (frame_idx, dhash)
    bucket stays at the design bound (4 clips: v0/v4/v1/v5 sharing a
    base frame), i.e. candidate generation is linear, not quadratic."""
    n = 16_384
    docs = _docs(spark, n)
    groups = n // vd.GROUP_SIZE
    pairs = vd.dedup_video_keyframe(docs).count()
    assert pairs <= 10 * groups, f"{pairs} pairs for {groups} groups"
    assert pairs >= 8 * groups * 0.95
    fp = vd.video_keyframe_fingerprints(docs)
    worst = (
        fp.groupBy("frame_idx", "d0", "d1", "d2", "d3")
        .agg(F.count(F.lit(1)).alias("p"))
        .agg(F.max("p").alias("m"))
        .collect()[0]["m"]
    )
    assert worst <= 8, f"hot bucket: {worst} clips share one keyframe hash"
    assert vd.video_bucket_truncation_stats(docs).count() == 0
    vd.clear_video_fp_cache()


def test_hot_bucket_cap_bounds_constant_cohort(spark, monkeypatch):
    """A black-frame cohort (every clip sharing one keyframe hash)
    must expand C(cap, 2) pairs, not C(n, 2) — deterministic doc_id
    prefix, the oracle's ROW_NUMBER."""
    monkeypatch.setattr(vd, "VKF_BUCKET_CAP", 4)
    n = 40
    rows = [(i, f, 0, 0, 0, 0) for i in range(n) for f in range(vd.VKF_N_FRAMES)]
    fp = spark.createDataFrame(
        rows, "doc_id long, frame_idx int, d0 int, d1 int, d2 int, d3 int"
    )
    got = sorted(
        (r["a_id"], r["b_id"], r["n_shared"])
        for r in vd._shared_frame_pairs(fp).collect()
    )
    want = sorted(
        (a, b, vd.VKF_N_FRAMES) for a in range(4) for b in range(a + 1, 4)
    )
    assert got == want, got


def test_plan_has_one_shuffle_and_no_cartesian(spark):
    df = vd.dedup_video_keyframe(_docs(spark, 64))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_keyframes_reject_bad_container(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"MP4\x00garbage"))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="container magic"):
        vd.video_keyframes(df).collect()


def test_matches_oracle_at_fixture(spark, tables, duck):
    """Spark pipeline (real container + codec) vs the DuckDB
    closed-form replay, value-exact at sf0.001 — fingerprints AND
    verified pairs."""
    vd.clear_video_fp_cache()
    docs = tables["documents"]
    got_fp = sorted(
        (r["doc_id"], r["frame_idx"], r["dhash_hex"], r["d0"], r["d1"],
         r["d2"], r["d3"])
        for r in vd.video_keyframe_fingerprints(docs).collect()
    )
    want_fp = sorted(
        map(tuple, duck.execute(vd.video_keyframe_fingerprints_sql()).fetchall())
    )
    assert got_fp == want_fp
    got_pairs = sorted(
        (r["a_id"], r["b_id"], r["n_shared"])
        for r in vd.dedup_video_keyframe(docs).collect()
    )
    want_pairs = sorted(
        map(tuple, duck.execute(vd.dedup_video_keyframe_sql()).fetchall())
    )
    assert got_pairs == want_pairs
    assert got_pairs, "fixture corpus must produce verified pairs"
    vd.clear_video_fp_cache()
