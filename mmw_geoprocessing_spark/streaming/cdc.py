"""Streaming CDC upsert: maintain a latest-wins merged table from a
changelog STREAM via ``foreachBatch`` incremental compaction — the
production shape for "Kafka changelog → queryable lake table" on plain
parquet (what Delta/Iceberg MERGE does, expressed with the engine's own
restartable-streaming primitives; reference has no streaming surface at
all, so this extends the §2.3 streaming family, not reference parity).

Each micro-batch is merged into a persistent state snapshot with the
SAME latest-wins rule as the batch operator (`operators/cdc.py`): per
key the highest-sequence row wins, ROW_NUMBER tie-break on (seq desc,
op). Delete rows are kept in the state as TOMBSTONES while the stream
runs — a 'D' must keep suppressing lower-seq rows that may arrive in a
LATER batch (at-least-once sources reorder) — and are dropped only in
the final read. Because (key, seq) pairs are unique with a total order,
the merge is associative and commutative across any batching of the
changelog, so the drained result is deterministic regardless of file
order or batch boundaries — which is what gives this stateful streaming
operator a closed-form SQL oracle (the batch merge's own twin).

State snapshots are written to ``state_<epoch>`` directories (never
overwriting the snapshot being read — parquet cannot be rebuilt in
place), with the max-epoch directory as the current state. Crash
safety: a replayed epoch N merges against the max snapshot with epoch
< N — never against its own (possibly partial) ``state_N``, which it
instead rewrites from scratch — so at-least-once redelivery of a batch
is idempotent.

100 TB shape: each micro-batch merge shuffles (current state ∪ batch)
on the key — at deployment scale the state table is BUCKETED by key so
only the (small) batch side shuffles, and the nightly full compaction
is the batch `changelog_merge`. The per-batch window state is the
handful of versions of each key present in that batch.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.operators.cdc import PAYLOAD, synth_changelog

_COLS = ["o_orderkey", "seq", "op", *PAYLOAD]


def replay_changelog_dir(spark, sf_dir: str) -> str:
    """Deterministic chunked changelog replay derived from the orders
    table: chunk a = base snapshot as seq-0 inserts, chunk b = the
    seq-1 updates, chunk c = seq-2 updates + deletes + inserts. With
    ``maxFilesPerTrigger=1`` each chunk arrives in its own micro-batch,
    so cross-batch latest-wins (a later batch's seq-2 overriding an
    earlier batch's seq-1; a delete killing a key updated two batches
    ago) is actually exercised. Built once per (sf_dir, source mtime)
    with an atomic rename, like ``windows.replay_events_dir``."""
    from mmw_geoprocessing_spark.sources.tables import load_table

    src_file = os.path.join(sf_dir, "orders.parquet")
    try:
        st = os.stat(src_file)
        ident = f"{st.st_size}_{int(st.st_mtime)}"
    except OSError:
        ident = "nostat"
    tag = sf_dir.strip("/").replace("/", "_")
    # v4: changelog logic version (v2 = negated-key inserts; v3 = the
    # one-pass inline synthesis; v4 = seq-1 chunk split back into
    # per-op write jobs — the inline synthesis mixed U and I entries in
    # every part file, which made EVERY micro-batch of the bucketed
    # state merge touch every bucket and broke its
    # rewrite-only-touched-buckets property) — bump whenever
    # synth_changelog or the chunk layout changes so stale cached
    # replays are never reused
    final = os.path.join(tempfile.gettempdir(), f"stream_cdc_v4_{tag}_{ident}")
    if os.path.isdir(final):
        return final
    work = tempfile.mkdtemp(prefix="stream_cdc_build_")
    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders.withColumn("seq", F.lit(0).cast("bigint"))
        .withColumn("op", F.lit("I"))
        .select(_COLS)
    )
    ch = synth_changelog(orders)
    base.write.mode("overwrite").parquet(os.path.join(work, "a_base"))
    # seq-1 entries land as per-op write jobs (U files carry only
    # keys ≡ 3 mod 7, I files only the negated-key inserts): the
    # bucketed state merge's "rewrite only touched buckets" behaviour
    # is exercised by pure-U micro-batches, which the one-pass inline
    # synthesis would otherwise mix away (test_streaming_cdc.py)
    seq1 = ch.filter(F.col("seq") == 1).select(_COLS)
    seq1.filter(F.col("op") == "U").write.mode("overwrite").parquet(
        os.path.join(work, "b_seq1")
    )
    seq1.filter(F.col("op") != "U").write.mode("append").parquet(
        os.path.join(work, "b_seq1")
    )
    ch.filter(F.col("seq") >= 2).select(_COLS).write.mode("overwrite").parquet(
        os.path.join(work, "c_rest")
    )
    try:
        os.rename(work, final)
    except OSError:
        # Either another builder won the race (final exists) or the
        # rename failed for an unrelated reason (e.g. EXDEV when TMPDIR
        # spans devices) — only discard our work when final is real.
        if os.path.isdir(final):
            import shutil

            shutil.rmtree(work, ignore_errors=True)
        else:
            return work
    return final


def _merge_into_state(state_root: str, batch_df: DataFrame, epoch_id: int) -> None:
    """foreachBatch body: state_{epoch} = latest-wins(state_prev ∪ batch),
    tombstones retained.

    The merge base is the max snapshot with epoch STRICTLY BELOW this
    one: on checkpoint replay of a crashed epoch N the max overall
    snapshot is the partially-written ``state_N`` itself, and merging
    against it while ``mode("overwrite")`` deletes it would read a
    partial (or vanishing) input. Excluding epoch >= N makes replay
    rebuild ``state_N`` from the same durable base as the first attempt
    — genuinely idempotent."""
    spark = batch_df.sparkSession
    cur = _latest_state_df(spark, state_root, before_epoch=epoch_id)
    allr = batch_df.select(_COLS) if cur is None else cur.unionByName(
        batch_df.select(_COLS)
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.col("seq").desc(), F.col("op").asc())
    win = (
        allr.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    win.write.mode("overwrite").parquet(
        os.path.join(state_root, f"state_{epoch_id:09d}")
    )
    # prune superseded snapshots NOW, not just post-drain: each epoch's
    # snapshot is cumulative, so a long drain would otherwise hold
    # n_batches full copies on disk simultaneously (the sf10 gate run
    # filled the device at ~50 epochs x full-table). Epoch N-1 is KEPT:
    # the checkpoint commits N only after this function returns, so a
    # crash between here and the commit replays N — whose merge base is
    # the max epoch < N. Pruning only epochs < N-1 keeps that base
    # alive in every crash window; steady-state disk = 2 snapshots.
    import shutil

    for e in _state_epochs(state_root):
        if e < epoch_id - 1:
            shutil.rmtree(
                os.path.join(state_root, f"state_{e:09d}"), ignore_errors=True
            )


def _state_epochs(state_root: str) -> list[int]:
    if not os.path.isdir(state_root):
        return []
    return sorted(
        int(d[len("state_"):])
        for d in os.listdir(state_root)
        if d.startswith("state_") and d[len("state_"):].isdigit()
    )


def _latest_state_df(
    spark, state_root: str, before_epoch: int | None = None
) -> DataFrame | None:
    epochs = _state_epochs(state_root)
    if before_epoch is not None:
        epochs = [e for e in epochs if e < before_epoch]
    if not epochs:
        return None
    return spark.read.parquet(os.path.join(state_root, f"state_{epochs[-1]:09d}"))


def stream_cdc_merge(spark, replay_dir: str, state_root: str, checkpoint: str):
    """Run the streaming upsert over ``replay_dir`` with availableNow +
    durable checkpoint, merging each micro-batch into ``state_root``.
    Returns the terminated query handle."""
    schema = spark.read.parquet(os.path.join(replay_dir, "a_base")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay_dir + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, eid: _merge_into_state(state_root, df, eid)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(1800):
        try:
            q.stop()
        finally:
            raise TimeoutError("stream_cdc_merge drain exceeded 1800s")
    return q


def _prune_old_snapshots(state_root: str) -> None:
    """Keep only the max-epoch snapshot: each drained epoch's snapshot
    is cumulative, so the superseded ones are pure disk pressure
    (~n_batches × full-state copies per run otherwise)."""
    import shutil

    epochs = _state_epochs(state_root)
    for e in epochs[:-1]:
        shutil.rmtree(
            os.path.join(state_root, f"state_{e:09d}"), ignore_errors=True
        )


def stream_cdc_merge_batch(spark, sf_dir: str) -> DataFrame:
    """Registry entry: drain the streaming upsert over the chunked
    changelog replay, then read the final state minus tombstones —
    identical contract to the batch ``changelog_merge_orders``, so the
    same closed-form oracle gates the stateful streaming plan.

    The state root and checkpoint are KEYED by (sf_dir, source mtime)
    and reused across invocations — a repeat drain finds the durable
    checkpoint fully caught up, processes zero batches, and reads the
    existing snapshot (this is also what exercises the restartability
    claim). Superseded epoch snapshots are pruned after each drain so
    the steady-state footprint is ONE merged table per sf_dir, not
    n_runs x n_batches copies."""
    replay = replay_changelog_dir(spark, sf_dir)
    # replay dir name already encodes (sf_dir, size, mtime)
    ident = os.path.basename(replay)
    state_root = os.path.join(tempfile.gettempdir(), f"{ident}_state")
    ckpt = os.path.join(tempfile.gettempdir(), f"{ident}_ckpt")
    stream_cdc_merge(spark, replay, state_root, ckpt)
    _prune_old_snapshots(state_root)
    final = _latest_state_df(spark, state_root)
    return final.filter(F.col("op") != "D").select(
        "o_orderkey",
        *PAYLOAD,
        F.col("seq").alias("version"),
        F.col("op").alias("src_op"),
    )


def stream_cdc_merge_batch_sql() -> str:
    from mmw_geoprocessing_spark.operators.cdc import changelog_merge_orders_sql

    return changelog_merge_orders_sql()


# ---------------------------------------------------------------------------
# Bucketed-state variant: the deployment shape the flat-snapshot
# docstring promises. State is hash-partitioned into N_BUCKETS key
# buckets (bucket = pmod(o_orderkey, N)); each micro-batch merges and
# rewrites ONLY the buckets its keys touch, so per-batch I/O is
# O(touched buckets × bucket size), not O(full state). At 100 TB with
# 2^14 buckets a typical changelog batch touches a few hundred buckets
# — the rewrite is ~1-2% of state instead of 100%.
#
# Layout: state_root/state_<epoch>/bucket=<b>/... (parquet
# partitionBy). The current state of bucket b is its max-epoch
# directory that CONTAINS b; untouched buckets simply stay owned by an
# older epoch. Crash replay of epoch N ignores epoch >= N when
# resolving bucket owners, same rule as the flat variant.
# ---------------------------------------------------------------------------

N_BUCKETS = 7


def _bucket_owners(state_root: str, before_epoch: int | None = None) -> dict[int, str]:
    """bucket id -> path of the max-epoch snapshot that contains it."""
    owners: dict[int, str] = {}
    for e in _state_epochs(state_root):
        if before_epoch is not None and e >= before_epoch:
            break
        snap = os.path.join(state_root, f"state_{e:09d}")
        for d in os.listdir(snap):
            if d.startswith("bucket="):
                owners[int(d.split("=", 1)[1])] = os.path.join(snap, d)
    return owners


def _merge_into_state_bucketed(
    state_root: str,
    batch_df: DataFrame,
    epoch_id: int,
    n_buckets: int = N_BUCKETS,
    rewritten_log: list[int] | None = None,
) -> None:
    """foreachBatch body, bucketed: latest-wins merge per TOUCHED bucket
    only. ``rewritten_log`` (if given) records the number of buckets
    rewritten by this batch — the observability hook the pytest uses to
    assert rewritten < total."""
    spark = batch_df.sparkSession
    batch = batch_df.select(_COLS).withColumn(
        "bucket", F.pmod(F.col("o_orderkey"), F.lit(n_buckets)).cast("int")
    )
    touched = sorted(
        r["bucket"] for r in batch.select("bucket").distinct().collect()
    )
    if rewritten_log is not None:
        rewritten_log.append(len(touched))
    if not touched:
        return
    owners = _bucket_owners(state_root, before_epoch=epoch_id)
    base_paths = [owners[b] for b in touched if b in owners]
    allr = batch
    if base_paths:
        # read the owning bucket=<b> leaf dirs directly (mixed-epoch
        # parents break partition discovery); bucket is re-derived from
        # the key, so the partition column is not needed
        base = spark.read.parquet(*base_paths)
        base = base.select(_COLS).withColumn(
            "bucket", F.pmod(F.col("o_orderkey"), F.lit(n_buckets)).cast("int")
        )
        allr = base.unionByName(batch)
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("seq").desc(), F.col("op").asc()
    )
    merged = (
        allr.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    merged.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(state_root, f"state_{epoch_id:09d}")
    )
    # per-bucket analogue of the flat variant's in-drain pruning: a
    # touched bucket's copies older than its newest pre-N owner are
    # superseded twice over and can never serve as a replay base (the
    # replay of N resolves owners among epochs < N, which finds the
    # kept newest copy). Keeps disk ∝ 2x state, not n_batches x state.
    import shutil

    for b in touched:
        owner_epochs = sorted(
            e
            for e in _state_epochs(state_root)
            if e < epoch_id
            and os.path.isdir(
                os.path.join(state_root, f"state_{e:09d}", f"bucket={b}")
            )
        )
        for e in owner_epochs[:-1]:
            shutil.rmtree(
                os.path.join(state_root, f"state_{e:09d}", f"bucket={b}"),
                ignore_errors=True,
            )


def _bucketed_state_df(spark, state_root: str) -> DataFrame | None:
    owners = _bucket_owners(state_root)
    if not owners:
        return None
    df = spark.read.parquet(*owners.values())
    return df.select(_COLS)


def stream_cdc_merge_bucketed(
    spark,
    replay_dir: str,
    state_root: str,
    checkpoint: str,
    n_buckets: int = N_BUCKETS,
    rewritten_log: list[int] | None = None,
):
    """Drain the bucketed-state streaming upsert (availableNow +
    durable checkpoint)."""
    schema = spark.read.parquet(os.path.join(replay_dir, "a_base")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay_dir + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, eid: _merge_into_state_bucketed(
                state_root, df, eid, n_buckets, rewritten_log
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(1800):
        try:
            q.stop()
        finally:
            raise TimeoutError("stream_cdc_merge_bucketed drain exceeded 1800s")
    return q


def stream_cdc_merge_bucketed_batch(spark, sf_dir: str) -> DataFrame:
    """Registry entry: bucketed-state drain, same contract and oracle as
    ``stream_cdc_merge_batch`` — identical final table, different state
    maintenance cost (per-batch I/O ∝ touched buckets)."""
    replay = replay_changelog_dir(spark, sf_dir)
    ident = os.path.basename(replay)
    state_root = os.path.join(tempfile.gettempdir(), f"{ident}_bstate")
    ckpt = os.path.join(tempfile.gettempdir(), f"{ident}_bckpt")
    stream_cdc_merge_bucketed(spark, replay, state_root, ckpt)
    final = _bucketed_state_df(spark, state_root)
    return final.filter(F.col("op") != "D").select(
        "o_orderkey",
        *PAYLOAD,
        F.col("seq").alias("version"),
        F.col("op").alias("src_op"),
    )


def stream_cdc_merge_bucketed_batch_sql() -> str:
    return stream_cdc_merge_batch_sql()
