"""Advanced streaming: stream-stream join, streaming dedup, foreachBatch
sink, and the skew-salting utility."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from mmw_geoprocessing_spark.functions.skew import salted_count
from mmw_geoprocessing_spark.streaming import windows as sw


def _chunks(spark, tables, n=3):
    out = tempfile.mkdtemp(prefix="adv_stream_")
    ev = tables["events"]
    for i in range(n):
        ev.filter(F.col("event_id") % n == i).coalesce(1).write.mode("append").parquet(out)
    return out


def test_stream_stream_join(spark, tables):
    """Windowed stream-stream inner join: purchases joined to the same
    user's clicks within the preceding 10 minutes."""
    src = _chunks(spark, tables)
    purchases = (
        sw.stream_events(spark, src)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "30 minutes")
        .select(F.col("user_id").alias("pu"), F.col("ts").alias("pts"), F.col("event_id").alias("pid"))
    )
    clicks = (
        sw.stream_events(spark, src)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "30 minutes")
        .select(F.col("user_id").alias("cu"), F.col("ts").alias("cts"), F.col("event_id").alias("cid"))
    )
    joined = purchases.join(
        clicks,
        (F.col("pu") == F.col("cu"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 10 MINUTES")),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT count(*) c FROM ss_join").collect()[0].c

    ev = tables["events"]
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"), F.col("event_id").alias("cid")
    )
    want = p.join(
        c,
        (F.col("pu") == F.col("cu"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 10 MINUTES")),
    ).count()
    assert got == want and got > 0


def test_streaming_dedup_with_watermark(spark, tables):
    """dropDuplicates on a stream: duplicated chunks collapse to the
    original distinct id set."""
    out = tempfile.mkdtemp(prefix="dedup_stream_")
    ev = tables["events"].limit(300)
    ev.coalesce(1).write.mode("append").parquet(out)
    ev.coalesce(1).write.mode("append").parquet(out)  # exact duplicate chunk
    stream = sw.stream_events(spark, out).withWatermark("ts", "1 hour")
    q = (
        stream.dropDuplicates(["event_id"])
        .groupBy()
        .count()
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_stream").collect()[0]["count"]
    assert got == 300


def test_foreach_batch_sink(spark, tables):
    """foreachBatch: arbitrary batch-sink logic (here: parquet append
    with batch id column) — the escape hatch for custom sinks."""
    src = _chunks(spark, tables)
    dst = tempfile.mkdtemp(prefix="fb_sink_")

    def write_batch(df, epoch_id: int) -> None:
        df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(dst)

    q = (
        sw.stream_events(spark, src)
        .writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = spark.read.parquet(dst)
    assert back.count() == tables["events"].count()
    assert "epoch" in back.columns


def test_salted_count_equals_direct(spark, tables):
    direct = {
        r["event_type"]: r["count"]
        for r in tables["events"].groupBy("event_type").count().collect()
    }
    salted = {
        r["event_type"]: r["cnt"]
        for r in salted_count(tables["events"], "event_type").collect()
    }
    assert salted == direct


def _input_rows(q) -> int:
    return sum(int(p["numInputRows"]) for p in (q.recentProgress or []))


def test_checkpoint_recovery_stateful(spark, tables):
    """Restarting an aggregation from its checkpoint restores state and
    reads only the NEW source files: phase-2 totals cover all events
    while the restarted query's input rows cover only chunk 2."""
    src = tempfile.mkdtemp(prefix="ckpt_src_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_meta_")
    ev = tables["events"]
    chunk1 = ev.filter(F.col("event_id") % 2 == 0)
    chunk2 = ev.filter(F.col("event_id") % 2 == 1)
    chunk1.coalesce(1).write.mode("append").parquet(src)

    counts = lambda: (  # noqa: E731 - rebuild the same plan per phase
        sw.stream_events(spark, src)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q1 = sw.run_availablenow(
        counts(), ckpt, query_name="ckpt_phase1", output_mode="complete"
    )
    got1 = {
        r.event_type: r.cnt for r in spark.sql("SELECT * FROM ckpt_phase1").collect()
    }
    want1 = {r.event_type: r.cnt for r in chunk1.groupBy("event_type").count().withColumnRenamed("count", "cnt").collect()}
    assert got1 == want1
    n1 = _input_rows(q1)
    assert n1 == chunk1.count()

    # new data arrives; SAME checkpoint, fresh memory table
    chunk2.coalesce(1).write.mode("append").parquet(src)
    q2 = sw.run_availablenow(
        counts(), ckpt, query_name="ckpt_phase2", output_mode="complete"
    )
    got2 = {
        r.event_type: r.cnt for r in spark.sql("SELECT * FROM ckpt_phase2").collect()
    }
    want2 = {r.event_type: r.cnt for r in ev.groupBy("event_type").count().withColumnRenamed("count", "cnt").collect()}
    assert got2 == want2  # state restored: totals include chunk 1
    assert _input_rows(q2) == chunk2.count()  # offsets restored: chunk 1 not re-read


def test_checkpoint_recovery_exactly_once_file_sink(spark, tables):
    """The parquet sink's commit log keeps output duplicate-free across a
    restart: two availableNow runs against a growing source yield each
    matching event exactly once."""
    src = tempfile.mkdtemp(prefix="eo_src_")
    ckpt = tempfile.mkdtemp(prefix="eo_meta_")
    out = tempfile.mkdtemp(prefix="eo_out_")
    ev = tables["events"]
    chunk1 = ev.filter(F.col("event_id") % 2 == 0)
    chunk2 = ev.filter(F.col("event_id") % 2 == 1)

    proj = lambda: (  # noqa: E731
        sw.stream_events(spark, src)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )
    chunk1.coalesce(1).write.mode("append").parquet(src)
    sw.run_availablenow(proj(), ckpt, sink_path=out)
    chunk2.coalesce(1).write.mode("append").parquet(src)
    sw.run_availablenow(proj(), ckpt, sink_path=out)

    got = spark.read.parquet(out)
    want = ev.filter(F.col("event_type") == "purchase").count()
    assert got.count() == want
    assert got.select("event_id").distinct().count() == want  # no duplicates


DOCS_STREAM_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def test_curate_stream_matches_batch_semantics(spark, tables):
    """Ingest-time curation: gates stream as-is, exact dedup via
    dropDuplicatesWithinWatermark, near-dup prune via a stream-static
    anti join, checkpointed exactly-once delivery across a restart.

    Arrival order inside a micro-batch is arbitrary, so digest-level
    expectations are computed order-independently: a digest none of
    whose gated docs are near-dup-dropped MUST land in the sink; one
    whose gated docs are ALL dropped MUST NOT; mixed digests depend on
    which arrival survived and are not asserted."""
    import tempfile as tf

    from pyspark.sql import functions as SF

    from mmw_geoprocessing_spark.operators import pipelines as pl

    docs = tables["documents"]
    src = tf.mkdtemp(prefix="cur_src_")
    ckpt = tf.mkdtemp(prefix="cur_ckpt_")
    out = tf.mkdtemp(prefix="cur_out_")
    chunk1 = docs.filter(SF.col("doc_id") % 2 == 0)
    chunk2 = docs.filter(SF.col("doc_id") % 2 == 1)

    # the static ingest-time index, built with the SAME drop rule as
    # the batch plan (last-representative: only pairs whose d1 survived
    # the gate drop their d2)
    drop_tbl = pl.neardup_drop_ids(docs)
    dropped = {r.doc_id for r in drop_tbl.collect()}

    def run():
        stream = spark.readStream.schema(DOCS_STREAM_SCHEMA).parquet(src)
        return sw.run_availablenow(
            pl.curate_stream(stream, drop_tbl), ckpt, sink_path=out
        )

    chunk1.coalesce(1).write.mode("append").parquet(src)
    run()
    chunk2.coalesce(1).write.mode("append").parquet(src)
    q2 = run()
    assert sum(int(p["numInputRows"]) for p in (q2.recentProgress or [])) == chunk2.count()

    sink = spark.read.parquet(out).toPandas()
    # exactly-once + streaming dedup: unique ids AND unique digests
    assert sink["doc_id"].is_unique
    assert sink["text_md5"].is_unique

    gated = (
        pl._featurize_gate(docs, "en", 8, 0.2)
        .select("doc_id", SF.md5("text").alias("text_md5"), "n_words")
        .toPandas()
    )
    # every sink row is a gated doc, not near-dup-dropped
    merged = sink.merge(gated, on=["doc_id", "text_md5", "n_words"], how="left", indicator=True)
    assert (merged["_merge"] == "both").all()
    assert not (sink["doc_id"].isin(dropped)).any()

    by_digest = gated.groupby("text_md5")["doc_id"].agg(list)
    sink_digests = set(sink["text_md5"])
    for digest, ids in by_digest.items():
        if not any(i in dropped for i in ids):
            assert digest in sink_digests  # clean digest must survive
        elif all(i in dropped for i in ids):
            assert digest not in sink_digests  # doomed digest must not


def test_registered_interval_join_equals_batch_twin(spark, tables, duck):
    """Round 10: the registered stream-stream attribution join drained
    over the time-ordered exactly-once replay must equal the batch
    interval self-join row-for-row — INCLUDING cross-chunk matches (a
    view in the early chunk attributed to a purchase in the late chunk),
    which is what proves the join state survived the micro-batch
    boundary rather than the batches being coincidentally self-contained."""
    import os

    import pandas as pd

    sf = "/root/testdata/sf0.001"
    got = sw.stream_interval_join_batch(spark, sf).toPandas()
    want = duck.execute(sw.stream_interval_join_batch_sql()).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_interval_join_state_survives_micro_batch_boundary(spark):
    """Deterministic cross-chunk proof: a view delivered in micro-batch
    1 must match a purchase delivered in micro-batch 2 (within the join
    window) — i.e. the left row was HELD IN JOIN STATE across the batch
    boundary, not matched within one batch. Synthetic 2-file source so
    the straddling pair is guaranteed."""
    import os
    import tempfile
    import time as _time

    base = "2024-03-01 "
    rows1 = [
        (1, base + "10:00:00", 7, "view", 1.0, "{}"),
        (2, base + "10:05:00", 7, "purchase", 2.0, "{}"),  # same-batch match
        (3, base + "11:00:00", 8, "view", 1.0, "{}"),      # match arrives in b2
    ]
    rows2 = [
        (4, base + "11:30:00", 8, "purchase", 3.0, "{}"),  # cross-batch match
        (5, base + "23:00:00", 9, "purchase", 4.0, "{}"),  # no view: no row
    ]
    src = tempfile.mkdtemp(prefix="ivjoin_micro_")

    def write(rows, name):
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
        ).withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.parquet(os.path.join(src, name))

    write(rows1, "a_early")
    _time.sleep(1.1)
    write(rows2, "b_late")

    views = sw.stream_events(spark, src + "/*").filter(F.col("event_type") == "view")
    purchases = sw.stream_events(spark, src + "/*").filter(
        F.col("event_type") == "purchase"
    )
    joined = sw.stream_interval_join(views, purchases).select(
        F.col("l.event_id").alias("view_id"),
        F.col("r.event_id").alias("purchase_id"),
    )
    out = sw._drain_to_batch(spark, joined)
    pairs = {(r["view_id"], r["purchase_id"]) for r in out.collect()}
    assert pairs == {(1, 2), (3, 4)}, pairs


def test_stream_static_enrich_flush_sentinel_semantics(spark, tables, duck):
    """The flush sentinel must (a) never appear in the output — its join
    key matches no dimension row — and (b) actually be needed: the LAST
    real event's window is within the watermark of the corpus max, so
    without the heartbeat append mode would still hold it in state at
    drain end. Oracle equality proves (b) held."""
    import pandas as pd

    sf = "/root/testdata/sf0.001"
    got = sw.stream_static_enrich_batch(spark, sf).toPandas()
    assert "__flush__" not in set(got["event_type"])
    # the final real window IS in the result (flushed by the sentinel)
    last_win = (
        tables["events"]
        .agg(F.max(F.unix_timestamp("ts")).cast("bigint"))
        .collect()[0][0]
        // 86400
        * 86400
    )
    assert last_win in set(got["win_start"])
    want = duck.execute(sw.stream_static_enrich_batch_sql()).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
