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
place), with the max-epoch directory as the current state; a replayed
epoch after a crash simply rewrites its own directory (idempotent).

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
    final = os.path.join(tempfile.gettempdir(), f"stream_cdc_{tag}_{ident}")
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
    ch.filter(F.col("seq") == 1).select(_COLS).write.mode("overwrite").parquet(
        os.path.join(work, "b_seq1")
    )
    ch.filter(F.col("seq") >= 2).select(_COLS).write.mode("overwrite").parquet(
        os.path.join(work, "c_rest")
    )
    try:
        os.rename(work, final)
    except OSError:
        import shutil

        shutil.rmtree(work, ignore_errors=True)
    return final


def _merge_into_state(state_root: str, batch_df: DataFrame, epoch_id: int) -> None:
    """foreachBatch body: state_{epoch} = latest-wins(state_max ∪ batch),
    tombstones retained."""
    spark = batch_df.sparkSession
    cur = _latest_state_df(spark, state_root)
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


def _latest_state_df(spark, state_root: str) -> DataFrame | None:
    if not os.path.isdir(state_root):
        return None
    snaps = sorted(d for d in os.listdir(state_root) if d.startswith("state_"))
    if not snaps:
        return None
    return spark.read.parquet(os.path.join(state_root, snaps[-1]))


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


def stream_cdc_merge_batch(spark, sf_dir: str) -> DataFrame:
    """Registry entry: drain the streaming upsert over the chunked
    changelog replay, then read the final state minus tombstones —
    identical contract to the batch ``changelog_merge_orders``, so the
    same closed-form oracle gates the stateful streaming plan."""
    replay = replay_changelog_dir(spark, sf_dir)
    state_root = tempfile.mkdtemp(prefix="stream_cdc_state_")
    ckpt = tempfile.mkdtemp(prefix="stream_cdc_ckpt_")
    stream_cdc_merge(spark, replay, state_root, ckpt)
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
