"""Structured Streaming: file-source micro-batches with availableNow
must converge to the batch plan's answer; stateful operator carries
per-group state across batches."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from mmw_geoprocessing_spark.streaming import windows as sw


def _chunked_events_dir(spark, tables, n_chunks: int = 3) -> str:
    """Split events into n parquet chunk files (out-of-order arrival)."""
    out = tempfile.mkdtemp(prefix="events_stream_")
    ev = tables["events"].withColumn("chunk", F.col("event_id") % n_chunks)
    for i in range(n_chunks):
        ev.filter(F.col("chunk") == i).drop("chunk").coalesce(1).write.mode(
            "append"
        ).parquet(out)
    return out


def test_stream_tumbling_equals_batch(spark, tables):
    src = _chunked_events_dir(spark, tables)
    stream = sw.stream_events(spark, src)
    q = (
        sw.stream_tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName("tumbling_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.win_start, r.event_type): (r.cnt, r.sum_value)
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    want = {
        (r.win_start, r.event_type): (r.cnt, r.sum_value)
        for r in sw.tumbling_counts(tables["events"]).collect()
    }
    assert got == want


def test_stream_session_windows_run(spark, tables):
    src = _chunked_events_dir(spark, tables)
    q = (
        sw.stream_session_windows(sw.stream_events(spark, src))
        .writeStream.format("memory")
        .queryName("session_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM session_out")
    batch = sw.session_windows(tables["events"])
    # streaming session windows must merge to the same session count
    assert got.count() == batch.count()


def test_stateful_running_counts(spark, tables):
    src = _chunked_events_dir(spark, tables)
    q = (
        sw.stream_running_user_counts(sw.stream_events(spark, src))
        .writeStream.format("memory")
        .queryName("stateful_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last update per user equals the total event count per user
    final = (
        spark.sql(
            "SELECT user_id, max(n_events) AS n FROM stateful_out GROUP BY user_id"
        )
        .collect()
    )
    want = {
        r.user_id: r.n
        for r in tables["events"].groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    got = {r.user_id: r.n for r in final}
    assert got == want


def test_watermark_drops_late_data(spark, tables):
    """Late (beyond-watermark) rows must not create new old windows once
    the watermark has advanced past them."""
    out = tempfile.mkdtemp(prefix="late_stream_")
    ev = tables["events"]
    recent = ev.orderBy(F.col("ts").desc()).limit(100)
    late = ev.orderBy(F.col("ts").asc()).limit(50)
    recent.coalesce(1).write.mode("append").parquet(out)

    stream = sw.stream_events(spark, out)
    q = (
        sw.stream_tumbling_counts(stream, watermark="1 minutes")
        .writeStream.format("memory")
        .queryName("late_out")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        time.sleep(8)  # first micro-batch advances the watermark to max(ts)-1m
        late.coalesce(1).write.mode("append").parquet(out)
        time.sleep(8)
    finally:
        q.stop()
    emitted = spark.sql("SELECT DISTINCT win_start FROM late_out").collect()
    late_windows = {
        r.win_start for r in sw.tumbling_counts(late).select("win_start").distinct().collect()
    }
    recent_windows = {
        r.win_start for r in sw.tumbling_counts(recent).select("win_start").distinct().collect()
    }
    emitted_set = {r.win_start for r in emitted}
    # windows that exist only in the late chunk must have been dropped
    only_late = late_windows - recent_windows
    assert not (emitted_set & only_late)
    assert os.path.isdir(out)


def _dup_events_dir(spark, tables) -> str:
    """Two chunks where chunk 2 re-delivers HALF of chunk 1's events
    (at-least-once replay) plus its own new events."""
    out = tempfile.mkdtemp(prefix="events_dup_stream_")
    ev = tables["events"]
    first = ev.filter(F.col("event_id") % 2 == 0)
    first.coalesce(1).write.mode("append").parquet(out)
    replay = first.filter(F.col("event_id") % 4 == 0)  # re-delivered
    rest = ev.filter(F.col("event_id") % 2 == 1)
    replay.unionByName(rest).coalesce(1).write.mode("append").parquet(out)
    return out


def test_stream_exact_dedup_drops_redeliveries(spark, tables):
    """dropDuplicatesWithinWatermark keeps the first arrival per key:
    the drained sink holds every distinct event exactly once despite
    the replayed chunk."""
    src = _dup_events_dir(spark, tables)
    ckpt = tempfile.mkdtemp(prefix="dedup_ckpt_")
    sw.run_availablenow(
        sw.stream_exact_dedup(sw.stream_events(spark, src)),
        ckpt,
        query_name="dedup_out",
    )
    got = spark.sql("SELECT event_id FROM dedup_out").collect()
    ids = [r.event_id for r in got]
    assert len(ids) == len(set(ids)), "sink contains duplicate event_ids"
    assert set(ids) == {r.event_id for r in tables["events"].collect()}


def test_stream_content_dedup_catches_new_surrogate_ids(spark, tables):
    """Content dedup keys on the md5 of the content columns, so a
    byte-identical payload re-sent under a NEW event_id is dropped."""
    src = tempfile.mkdtemp(prefix="events_content_stream_")
    ev = tables["events"].limit(50)
    ev.coalesce(1).write.mode("append").parquet(src)
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    resent = ev.withColumn("event_id", F.col("event_id") + max_id + 1)
    resent.coalesce(1).write.mode("append").parquet(src)
    ckpt = tempfile.mkdtemp(prefix="content_ckpt_")
    sw.run_availablenow(
        sw.stream_content_dedup(sw.stream_events(spark, src)),
        ckpt,
        query_name="content_dedup_out",
    )
    got = spark.sql("SELECT content_key FROM content_dedup_out").collect()
    keys = [r.content_key for r in got]
    assert len(keys) == len(set(keys))
    assert len(keys) == 50  # every resent copy dropped


def test_stream_content_dedup_null_fields_do_not_alias(spark):
    """A NULL field must not alias a neighbor's value: (value=NULL,
    props='x') and (value='x'... i.e. distinct payloads that concat_ws
    would collapse to the same digest) must BOTH survive. Regression
    for the null-skipping behavior of concat_ws."""
    import datetime

    src = tempfile.mkdtemp(prefix="events_null_stream_")
    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, ts, 10, None, None, "x"),   # event_type NULL, props 'x'
        (2, ts, 10, "x", None, None),   # event_type 'x', props NULL
        (3, ts, 10, None, 7.0, None),   # value 7.0 only
        (4, ts, 10, "7.0", None, None), # event_type literally '7.0'
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).coalesce(1).write.mode("append").parquet(src)
    ckpt = tempfile.mkdtemp(prefix="null_ckpt_")
    sw.run_availablenow(
        sw.stream_content_dedup(sw.stream_events(spark, src)),
        ckpt,
        query_name="null_dedup_out",
    )
    got = spark.sql("SELECT event_id, content_key FROM null_dedup_out").collect()
    assert len(got) == 4, (
        f"distinct payloads collided: kept only {sorted(r.event_id for r in got)}"
    )
    assert len({r.content_key for r in got}) == 4
