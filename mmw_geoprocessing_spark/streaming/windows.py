"""Structured Streaming surface: tumbling / sliding / session windows,
watermark-based late-data handling, and a custom stateful operator.

The reference is purely synchronous request/response (WebServer.scala:
64-111) — streaming is a capability extension (SURVEY.md §2.3 row
"Streaming"). Every window shape is defined once and runs both as a
batch DataFrame plan (for the DuckDB oracle) and as a streaming plan
over ``readStream`` (tested with the availableNow trigger, which drains
a source and stops — deterministic end state).

Event-time semantics: window starts are epoch-aligned, so results are
independent of partitioning and arrival order; the batch and streaming
plans produce identical rows once the stream drains. Aggregated values
use the same BIGINT-cents determinism rules as the relational surface
(``value`` is 2-decimal, so ROUND(value*100) is an exact integer).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def _sum_value():
    """Exact order-independent sum of the 2-decimal ``value`` column:
    BIGINT cents (primitive long adds, no boxed decimal accumulator)."""
    return (
        F.sum(F.round(F.col("value") * F.lit(100.0)).cast("bigint")).cast("double")
        / F.lit(100.0)
    )


SUM_VALUE_SQL = "CAST(SUM(CAST(ROUND((value) * 100.0) AS BIGINT)) AS DOUBLE) / 100.0"


def _epoch(col):
    return F.unix_timestamp(col).cast("bigint")


def tumbling_counts(events: DataFrame, width: str = "5 minutes") -> DataFrame:
    """Tumbling event-time windows per event type.

    Output: ``(win_start BIGINT epoch, event_type, cnt, sum_value)``.
    """
    w = F.window(F.col("ts"), width)
    return (
        events.groupBy(w.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            _sum_value().alias("sum_value"),
        )
        .select(_epoch(F.col("w.start")).alias("win_start"), "event_type", "cnt", "sum_value")
    )


def tumbling_counts_sql(width_min: int = 5) -> str:
    return f"""
    SELECT CAST(epoch(time_bucket(INTERVAL {width_min} MINUTE, CAST(ts AS TIMESTAMP))) AS BIGINT) AS win_start,
           event_type, COUNT(*) AS cnt,
           {SUM_VALUE_SQL} AS sum_value
    FROM events GROUP BY 1, 2
    """


def sliding_counts(events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes") -> DataFrame:
    """Sliding windows (width 10, slide 5): each event lands in 2 windows.

    Output: ``(win_start BIGINT epoch, cnt, sum_value)``.
    """
    w = F.window(F.col("ts"), width, slide)
    return (
        events.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            _sum_value().alias("sum_value"),
        )
        .select(_epoch(F.col("w.start")).alias("win_start"), "cnt", "sum_value")
    )


def sliding_counts_sql(width_min: int = 10, slide_min: int = 5) -> str:
    # an event at ts belongs to slide-aligned starts {bucket(ts), bucket(ts)-slide}
    # that satisfy start <= ts < start + width
    return f"""
    WITH starts AS (
      SELECT epoch(time_bucket(INTERVAL {slide_min} MINUTE, CAST(ts AS TIMESTAMP)))
               - (i * {slide_min * 60}) AS win_start,
             value
      FROM events, UNNEST(generate_series(0, {width_min // slide_min - 1})) AS t(i)
      WHERE epoch(time_bucket(INTERVAL {slide_min} MINUTE, CAST(ts AS TIMESTAMP)))
              - (i * {slide_min * 60}) + {width_min * 60} > epoch(CAST(ts AS TIMESTAMP))
    )
    SELECT CAST(win_start AS BIGINT) AS win_start, COUNT(*) AS cnt,
           {SUM_VALUE_SQL} AS sum_value
    FROM starts GROUP BY 1
    """


def session_windows(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session windows per user: events within ``gap`` of each other merge.

    Output: ``(user_id, session_start BIGINT epoch, n_events, last_ts
    BIGINT epoch)``.
    """
    w = F.session_window(F.col("ts"), gap)
    return (
        events.groupBy(F.col("user_id"), w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("last_ts"))
        .select(
            "user_id",
            _epoch(F.col("w.start")).alias("session_start"),
            "n_events",
            _epoch(F.col("last_ts")).alias("last_ts"),
        )
    )


def session_windows_sql(gap_min: int = 10) -> str:
    # classic gaps-and-islands; session start must truncate to whole epoch
    # seconds to match Spark's unix_timestamp(start) (micros truncation).
    # >= (not >): Spark's session end is exclusive (last_ts + gap), so an
    # event exactly gap after its predecessor starts a NEW session.
    return f"""
    WITH ordered AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  >= INTERVAL {gap_min} MINUTE THEN 1
                  WHEN LAG(CAST(ts AS TIMESTAMP)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                  ELSE 0 END AS is_new
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id,
           CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
           COUNT(*) AS n_events,
           CAST(floor(epoch(MAX(ts))) AS BIGINT) AS last_ts
    FROM numbered GROUP BY user_id, session_id
    """


def windows_showcase(events: DataFrame) -> DataFrame:
    """All three event-time window shapes in one result (tumbling /
    sliding / session), aligned to a common schema so the driver's
    correctness gate covers the whole family in one row:
    ``(win_kind, grp, win_start BIGINT epoch, n BIGINT, sum_value)``.

    Plan shape (the round-5 fix; the naive form ran 3 independent
    scan+shuffle pipelines — 6 exchanges — and was 4.7x DuckDB at sf1~):
    - tumbling + sliding are flattened into ONE aggregate: each event
      explodes to its 3 (win_kind, grp, win_start) memberships — the
      tumbling bucket and, since width = 2 x slide, the two sliding
      windows that contain it (bucket, bucket - slide; both always
      contain ts, matching F.window's slide-aligned start generation) —
      then one partial+final hash agg produces both families. The
      partials collapse map-side on the scan partitions, so this
      branch's exchange carries only pre-aggregated window rows.
    - the session branch is the only shuffle of raw rows (the per-user
      gap merge genuinely needs them), projected to 3 columns.
    Net: 2 exchanges (1 raw + 1 tiny) instead of 6, and the raw bytes
    crossing the wire drop to one projected copy — the part that
    matters at 100 TB.
    """
    slide_s, tumble_s = 300, 300  # sliding 10 min/5 min; tumbling 5 min
    ev = events.select(
        "ts",
        "user_id",
        "event_type",
        F.round(F.col("value") * F.lit(100.0)).cast("bigint").alias("cents"),
    )

    epoch = F.unix_timestamp(F.col("ts")).cast("bigint")
    bucket = (F.floor(epoch / tumble_s) * tumble_s).cast("bigint")
    entries = F.array(
        F.struct(
            F.lit("tumbling").alias("win_kind"),
            F.col("event_type").alias("grp"),
            bucket.alias("win_start"),
        ),
        F.struct(
            F.lit("sliding").alias("win_kind"),
            F.lit("all").alias("grp"),
            bucket.alias("win_start"),
        ),
        F.struct(
            F.lit("sliding").alias("win_kind"),
            F.lit("all").alias("grp"),
            (bucket - slide_s).alias("win_start"),
        ),
    )
    cents_sum = (F.sum("cents").cast("double") / F.lit(100.0)).alias("sum_value")
    flat = (
        ev.select(F.explode(entries).alias("e"), "cents")
        .groupBy("e.win_kind", "e.grp", "e.win_start")
        .agg(F.count(F.lit(1)).alias("n"), cents_sum)
    )
    # Sessionization as gaps-and-islands over one per-user sort (lag ->
    # boundary flag -> running sum -> group), all inside WindowExec on
    # the SAME exchange+sort — measured faster than the session_window
    # operator's MergingSessions path at both sf0.1 and sf1~, and
    # identical semantics: a gap of exactly the threshold starts a NEW
    # session (session_window's end is exclusive). Comparison runs in
    # integer MICROseconds (unix_micros), exact for parquet timestamps;
    # double-epoch arithmetic can misorder pairs within ~0.5 us of the
    # threshold.
    from pyspark.sql import Window

    wu = Window.partitionBy("user_id").orderBy("ts")
    us = F.unix_micros(F.col("ts"))
    gap = (us - F.lag(us).over(wu) >= 600_000_000).cast("int")
    session = (
        ev.withColumn("sid", F.sum(F.coalesce(gap, F.lit(1))).over(wu))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s"), F.count(F.lit(1)).alias("n"), cents_sum)
        .select(
            F.lit("session").alias("win_kind"),
            F.col("user_id").cast("string").alias("grp"),
            _epoch(F.col("s")).alias("win_start"),
            "n",
            "sum_value",
        )
    )
    return flat.unionAll(session)


def windows_showcase_sql() -> str:
    session = f"""
    WITH ordered AS (
      SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  >= INTERVAL 10 MINUTE THEN 1
                  WHEN LAG(CAST(ts AS TIMESTAMP)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                  ELSE 0 END AS is_new
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT 'session' AS win_kind, CAST(user_id AS VARCHAR) AS grp,
           CAST(floor(epoch(MIN(ts))) AS BIGINT) AS win_start,
           COUNT(*) AS n,
           {SUM_VALUE_SQL} AS sum_value
    FROM numbered GROUP BY user_id, session_id
    """
    tumbling = f"""
    SELECT 'tumbling' AS win_kind, event_type AS grp, win_start, cnt AS n, sum_value
    FROM ({tumbling_counts_sql()})
    """
    sliding = f"""
    SELECT 'sliding' AS win_kind, 'all' AS grp, win_start, cnt AS n, sum_value
    FROM ({sliding_counts_sql()})
    """
    return f"{tumbling} UNION ALL {sliding} UNION ALL ({session})"


# ---------------------------------------------------------------------------
# True streaming plans (readStream); exercised by tests with availableNow.
# ---------------------------------------------------------------------------

EVENTS_STREAM_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(spark, source_dir: str) -> DataFrame:
    """File-source stream over parquet event chunks (micro-batched)."""
    return spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(source_dir)


def stream_tumbling_counts(
    stream: DataFrame, width: str = "5 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming tumbling aggregate with a watermark: state for windows
    older than the watermark is evicted; later-than-watermark events are
    dropped — the standard bounded-state construction."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), width).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            _sum_value().alias("sum_value"),
        )
        .select(_epoch(F.col("w.start")).alias("win_start"), "event_type", "cnt", "sum_value")
    )


def stream_session_windows(stream: DataFrame, gap: str = "10 minutes", watermark: str = "30 minutes") -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window(F.col("ts"), gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", _epoch(F.col("w.start")).alias("session_start"), "n_events")
    )


def stream_running_user_counts(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-user event count carried in explicit group state (the shape a
    bespoke sketch/accumulator would take)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdf_iter, state):
        count = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            count += len(pdf)
        state.update((count,))
        import pandas as pd

        yield pd.DataFrame({"user_id": [key[0]], "n_events": [count]})

    return (
        stream.selectExpr("user_id", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long",
            stateStructType="n_events long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_availablenow(
    df: DataFrame,
    checkpoint: str,
    *,
    sink_path: str | None = None,
    query_name: str | None = None,
    output_mode: str = "append",
    timeout_s: int = 180,
):
    """Drain a streaming DataFrame with the availableNow trigger and a
    durable checkpoint, then return the (terminated) query handle.

    This is the engine's restartable-job primitive: the checkpoint
    directory carries source offsets (which input files each committed
    micro-batch consumed), sink commit log (for the parquet sink:
    exactly-once file visibility — readers see only committed files),
    and the state store (aggregation / session / applyInPandasWithState
    state). Re-calling with the SAME checkpoint after new source data
    arrives resumes from the recorded offsets: old files are not
    re-read, state is restored, and the sink stays duplicate-free even
    if a previous run crashed mid-batch. The reference has no restart
    story (a killed request is simply re-submitted and recomputes from
    scratch, WebServer.scala:64-111); at 100 TB a re-run from zero is
    the difference between minutes and a day, so checkpointed resume is
    a first-class surface here.
    """
    w = df.writeStream.option("checkpointLocation", checkpoint).trigger(availableNow=True)
    if sink_path is not None:
        q = w.format("parquet").outputMode(output_mode).start(sink_path)
    else:
        q = w.format("memory").queryName(query_name).outputMode(output_mode).start()
    # awaitTermination(timeout) returns False when the query is STILL
    # RUNNING at the deadline — returning that handle would hand the
    # caller a partially drained sink. Stop it (the checkpoint keeps
    # the committed prefix exactly-once; the next run resumes) and
    # raise so the timeout is an error, not silent truncation.
    if not q.awaitTermination(timeout_s):
        try:
            q.stop()
        finally:
            raise TimeoutError(
                f"availableNow drain exceeded {timeout_s}s (checkpoint "
                f"{checkpoint!r} retains the committed prefix; re-run resumes)"
            )
    return q


def replay_events_dir(spark, sf_dir: str, *, resend_surrogates: bool) -> str:
    """Deterministic at-least-once replay source derived from the sf
    directory's events table: chunk 1 = even event_ids; chunk 2
    re-delivers a quarter of chunk 1 byte-identically plus the odd ids,
    and (with ``resend_surrogates``) re-sends 1/8 of chunk 1
    content-identically under fresh surrogate event_ids — the case only
    content dedup catches.

    Built once per (sf_dir, variant) under /tmp with an atomic rename
    (a crashed half-build can never be mistaken for a finished one), so
    registry calls reuse the same files. Because every original event
    appears EXACTLY once among the chunks (duplicates are extra
    copies), the deduped stream has a closed-form batch twin over the
    ORIGINAL events table — which is what lets the driver gate these
    streaming operators with a full SQL oracle."""
    import tempfile

    from mmw_geoprocessing_spark.sources.tables import load_table

    variant = "resend" if resend_surrogates else "redeliver"
    # key the cached dir by the source file's identity (size + mtime),
    # not just its path: a regenerated events.parquet at the same path
    # must invalidate the cached replay
    src_file = os.path.join(sf_dir, "events.parquet")
    try:
        st = os.stat(src_file)
        ident = f"{st.st_size}_{int(st.st_mtime)}"
    except OSError:
        ident = "nostat"
    tag = sf_dir.strip("/").replace("/", "_")
    final = os.path.join(
        tempfile.gettempdir(), f"stream_replay_{variant}_{tag}_{ident}"
    )
    if os.path.isdir(final):
        return final
    work = tempfile.mkdtemp(prefix=f"stream_replay_build_{variant}_")
    ev = load_table(spark, sf_dir, "events")
    first = ev.filter(F.col("event_id") % 2 == 0)
    first.write.mode("append").parquet(work)
    replay = first.filter(F.col("event_id") % 4 == 0)  # re-delivered
    chunk2 = replay.unionByName(ev.filter(F.col("event_id") % 2 == 1))
    if resend_surrogates:
        max_id = ev.agg(F.max("event_id")).collect()[0][0]
        resent = first.filter(F.col("event_id") % 8 == 0).withColumn(
            "event_id", F.col("event_id") + max_id + 1
        )
        chunk2 = chunk2.unionByName(resent)
    chunk2.write.mode("append").parquet(work)
    try:
        os.rename(work, final)
    except OSError:
        # either another session won the race (final exists, complete —
        # rename is the commit point) or the rename failed for an
        # unrelated reason (EXDEV across devices): only discard our
        # work when the winner is real
        if os.path.isdir(final):
            import shutil

            shutil.rmtree(work, ignore_errors=True)
        else:
            return work
    return final


def stream_exact_dedup(
    stream: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact deduplication: emit the FIRST arrival of each key
    and drop re-deliveries — the ingest-side dedup an at-least-once
    source (log replay, retried producer) needs before anything
    downstream counts rows.

    Built on ``dropDuplicatesWithinWatermark``: per-key state is kept
    only until the watermark passes the first arrival's event time, so
    state is BOUNDED by (keys per watermark window), not by corpus
    history — the property that keeps this runnable forever at ingest
    rates where an unbounded seen-set would grow without limit. A
    duplicate arriving later than the watermark window is NOT caught
    here (state for its key is gone); the batch operators
    (``operators/dedup.py``) are the corpus-wide net behind it — the
    standard two-tier dedup deployment.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def stream_content_dedup(
    stream: DataFrame,
    content_cols: tuple[str, ...] = ("user_id", "event_type", "value", "props"),
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming CONTENT dedup: same bounded-state construction keyed by
    an md5 of the content columns (the exact-dedup digest the batch
    ``dedup_exact`` uses), so byte-identical payloads re-sent under new
    surrogate ids are still dropped. Adds a ``content_key`` column.

    NULL encoding: each column is coalesced to an explicit sentinel
    before joining — ``concat_ws`` alone SKIPS nulls, so
    ``(NULL, 'x')`` and ``('x', NULL)`` would both digest as ``'x'``
    and the later distinct payload would be wrongly dropped. The
    sentinel (0x00-prefixed) cannot collide with a cast value that is
    itself the empty string."""
    digest = F.md5(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
                for c in content_cols
            ],
        )
    )
    return (
        stream.withColumn("content_key", digest)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_key"])
    )


# ---------------------------------------------------------------------------
# Driver-gatable batch twins for the streaming dedup operators: drain
# the REAL streaming plan (availableNow + durable checkpoint + parquet
# sink) over a deterministic at-least-once replay source, return the
# drained sink as a batch DataFrame. Because every original event
# appears exactly once among the replay chunks, the survivor set has a
# CLOSED-FORM oracle over the original events table — a full SQL twin
# for an operator whose execution is stateful streaming.
# ---------------------------------------------------------------------------

_CONTENT_COLS = ("user_id", "event_type", "value", "props")


def _drain_to_batch(spark, op_df: "DataFrame", key: str | None = None) -> "DataFrame":
    """Drain ``op_df`` to a parquet sink and read it back.

    With ``key`` set, the checkpoint and sink are KEYED and reused
    across invocations (the streaming/cdc.py discipline): a repeat
    drain finds the durable checkpoint caught up, appends nothing, and
    re-reads the committed sink — instead of leaking a fresh
    events-table-sized sink per registry call."""
    import tempfile

    if key is None:
        ckpt = tempfile.mkdtemp(prefix="stream_dedup_reg_ckpt_")
        sink = tempfile.mkdtemp(prefix="stream_dedup_reg_sink_") + "/out"
    else:
        base = os.path.join(tempfile.gettempdir(), f"stream_drain_{key}")
        ckpt, sink = base + "_ckpt", base + "_sink/out"
    run_availablenow(op_df, ckpt, sink_path=sink, timeout_s=1800)
    return spark.read.parquet(sink)


def stream_exact_dedup_batch(spark, sf_dir: str) -> "DataFrame":
    """Registry entry: exact ingest dedup drained over the re-delivery
    replay (chunk 2 re-sends a quarter of chunk 1 byte-identically).
    Survivors = every original event exactly once."""
    src = replay_events_dir(spark, sf_dir, resend_surrogates=False)
    out = _drain_to_batch(
        spark,
        stream_exact_dedup(stream_events(spark, src)),
        key=f"exact_{os.path.basename(src)}",
    )
    return out.select("event_id", "ts", "user_id", "event_type", "value", "props")


def stream_exact_dedup_batch_sql() -> str:
    return """
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
           value, props
    FROM events
    """


def stream_content_dedup_batch(spark, sf_dir: str) -> "DataFrame":
    """Registry entry: content ingest dedup drained over the surrogate
    re-send replay (content-identical payloads under fresh event_ids —
    the case only content dedup catches). Survivors compared on the
    content columns (the surviving surrogate id is which-arrival-
    dependent; the content payload is not)."""
    src = replay_events_dir(spark, sf_dir, resend_surrogates=True)
    out = _drain_to_batch(
        spark,
        stream_content_dedup(stream_events(spark, src)),
        key=f"content_{os.path.basename(src)}",
    )
    return out.select(*_CONTENT_COLS)


def stream_content_dedup_batch_sql() -> str:
    return f"""
    SELECT DISTINCT {", ".join(_CONTENT_COLS)} FROM events
    """


# ---------------------------------------------------------------------------
# Stream-stream interval join (round 10): the attribution shape — each
# 'view' joined to the same user's 'purchase' events within a bounded
# event-time window. This is THE stateful two-input streaming operator
# (Spark keeps both sides' unmatched rows in state, evicting exactly
# the rows the time bound proves unmatchable), and the relational
# surface's interval_join_events run as a true readStream plan.
# ---------------------------------------------------------------------------

# 4 h attribution window: substantive result sizes on the month-long
# fixture event span (10 min gave 4 rows at sf0.01; 4 h gives 125)
JOIN_WINDOW_MIN = 240


def replay_events_time_chunks(spark, sf_dir: str) -> str:
    """TIME-ORDERED exactly-once replay: two single-file chunks split at
    the (approximate) median event time, arriving oldest-first. Unlike
    the at-least-once dedup replays, this source delivers every event
    exactly once AND in chunk-level time order — the construction that
    makes a watermarked stream-stream join's drained output equal the
    batch join bit-for-bit: event time only moves forward across
    micro-batches, so no row is ever late (nothing is dropped), and
    state eviction removes only rows the join bound proves unmatchable.
    Single-file chunks pin the batch order (the file source processes
    oldest-mtime first)."""
    import tempfile

    from mmw_geoprocessing_spark.sources.tables import load_table

    src_file = os.path.join(sf_dir, "events.parquet")
    try:
        st = os.stat(src_file)
        ident = f"{st.st_size}_{int(st.st_mtime)}"
    except OSError:
        ident = "nostat"
    tag = sf_dir.strip("/").replace("/", "_")
    final = os.path.join(
        tempfile.gettempdir(), f"stream_replay_timechunks_{tag}_{ident}"
    )
    if os.path.isdir(final):
        return final
    work = tempfile.mkdtemp(prefix="stream_replay_timechunks_build_")
    ev = load_table(spark, sf_dir, "events")
    # any deterministic split point works (the oracle reads the
    # ORIGINAL table); the median halves the state high-water mark
    split = ev.agg(
        F.expr("percentile_approx(ts, 0.5)").alias("m")
    ).collect()[0]["m"]
    import time as _time

    ev.filter(F.col("ts") <= F.lit(split)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(work, "a_early"))
    _time.sleep(1.1)  # distinct mtimes: the file source orders by mtime
    ev.filter(F.col("ts") > F.lit(split)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(work, "b_late"))
    try:
        os.rename(work, final)
    except OSError:
        if os.path.isdir(final):
            import shutil

            shutil.rmtree(work, ignore_errors=True)
        else:
            return work
    return final


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    window_min: int = JOIN_WINDOW_MIN,
    watermark: str = "480 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: per user, each left event
    joined to right events with ``r.ts in [l.ts, l.ts + window_min]``.

    State bound: the left side retains rows until the right watermark
    passes ``l.ts + window_min`` (they can no longer match); the right
    side until the left watermark passes ``r.ts``. Both sides'
    unmatched-state is therefore ∝ (events per watermark window), not
    history — the property that keeps a 100 TB/day join runnable.
    """
    l = left.withWatermark("ts", watermark).alias("l")
    r = right.withWatermark("ts", watermark).alias("r")
    return l.join(
        r,
        F.expr(
            "l.user_id = r.user_id AND r.ts >= l.ts "
            f"AND r.ts <= l.ts + INTERVAL {window_min} MINUTES"
        ),
        "inner",
    )


def stream_interval_join_batch(spark, sf_dir: str) -> "DataFrame":
    """Registry entry: view→purchase attribution joined as a TRUE
    stream-stream plan (both inputs readStream over the time-ordered
    exactly-once replay), drained via availableNow + durable
    checkpoint. The time-ordered construction (see
    ``replay_events_time_chunks``) gives the drained sink a closed-form
    batch twin: the plain interval self-join over the original events
    table."""
    src = replay_events_time_chunks(spark, sf_dir)
    views = stream_events(spark, src + "/*").filter(F.col("event_type") == "view")
    purchases = stream_events(spark, src + "/*").filter(
        F.col("event_type") == "purchase"
    )
    joined = stream_interval_join(views, purchases).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("view_id"),
        F.col("r.event_id").alias("purchase_id"),
        _epoch(F.col("l.ts")).alias("view_ts_s"),
        _epoch(F.col("r.ts")).alias("purchase_ts_s"),
    )
    out = _drain_to_batch(
        spark, joined, key=f"ivjoin_{os.path.basename(src)}"
    )
    return out.select("user_id", "view_id", "purchase_id", "view_ts_s", "purchase_ts_s")


def stream_interval_join_batch_sql(window_min: int = JOIN_WINDOW_MIN) -> str:
    return f"""
    SELECT l.user_id,
           l.event_id AS view_id,
           r.event_id AS purchase_id,
           CAST(floor(epoch(CAST(l.ts AS TIMESTAMP))) AS BIGINT) AS view_ts_s,
           CAST(floor(epoch(CAST(r.ts AS TIMESTAMP))) AS BIGINT) AS purchase_ts_s
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND l.event_type = 'view' AND r.event_type = 'purchase'
     AND CAST(r.ts AS TIMESTAMP) >= CAST(l.ts AS TIMESTAMP)
     AND CAST(r.ts AS TIMESTAMP)
         <= CAST(l.ts AS TIMESTAMP) + INTERVAL {window_min} MINUTE
    """


# ---------------------------------------------------------------------------
# Stream-static enrichment + windowed aggregation (round 10): the
# streaming-dashboard shape — a fact stream joined to a broadcast
# static dimension, aggregated into event-time windows, emitted
# APPEND-mode to a parquet sink. Completes the streaming join family:
# stream-stream (interval join above) + stream-static (here).
# ---------------------------------------------------------------------------


def replay_events_flush_dir(spark, sf_dir: str) -> str:
    """The time-chunked exactly-once replay plus a third single-file
    chunk holding ONE flush sentinel: an event 2 days past the corpus
    max whose join key (user_id = -1) matches no dimension row. The
    sentinel is the WATERMARK HEARTBEAT / punctuation pattern: it flows
    through the withWatermark operator (advancing event time past every
    real window, so append mode emits them all before the drain ends)
    and is then dropped by the inner dimension join — so it never
    appears in the output. Without it, windows newer than
    (max ts - watermark) would still sit in state when availableNow
    stops, and the drained sink would not equal the batch twin."""
    import tempfile

    from mmw_geoprocessing_spark.sources.tables import load_table

    src_file = os.path.join(sf_dir, "events.parquet")
    try:
        st = os.stat(src_file)
        ident = f"{st.st_size}_{int(st.st_mtime)}"
    except OSError:
        ident = "nostat"
    tag = sf_dir.strip("/").replace("/", "_")
    final = os.path.join(
        tempfile.gettempdir(), f"stream_replay_flush_{tag}_{ident}"
    )
    if os.path.isdir(final):
        return final
    work = tempfile.mkdtemp(prefix="stream_replay_flush_build_")
    ev = load_table(spark, sf_dir, "events")
    split = ev.agg(
        F.expr("percentile_approx(ts, 0.5)").alias("m")
    ).collect()[0]["m"]
    import time as _time

    ev.filter(F.col("ts") <= F.lit(split)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(work, "a_early"))
    _time.sleep(1.1)
    ev.filter(F.col("ts") > F.lit(split)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(work, "b_late"))
    _time.sleep(1.1)
    sentinel = (
        ev.agg(F.max("ts").alias("mx"))
        .select(
            F.lit(-1).cast("long").alias("event_id"),
            (F.col("mx") + F.expr("INTERVAL 2 DAYS")).alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("__flush__").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    sentinel.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(work, "c_flush")
    )
    try:
        os.rename(work, final)
    except OSError:
        if os.path.isdir(final):
            import shutil

            shutil.rmtree(work, ignore_errors=True)
        else:
            return work
    return final


def stream_static_enrich_agg(
    stream: DataFrame,
    dim: DataFrame,
    width: str = "1 day",
    watermark: str = "480 minutes",
) -> DataFrame:
    """Watermarked stream enriched by a STATIC dimension (broadcast per
    micro-batch — no state for the join; only the windowed aggregate
    keeps state, bounded by windows per watermark span), aggregated to
    per-(window, segment, type) counts and exact BIGINT-cents sums."""
    enriched = stream.withWatermark("ts", watermark).join(
        F.broadcast(dim), stream["user_id"] == dim["c_custkey"]
    )
    return (
        enriched.groupBy(
            F.window(F.col("ts"), width).alias("w"),
            F.col("c_mktsegment"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"), _sum_value().alias("sum_value"))
        .select(
            _epoch(F.col("w.start")).alias("win_start"),
            "c_mktsegment",
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def stream_static_enrich_batch(spark, sf_dir: str) -> "DataFrame":
    """Registry entry: daily per-market-segment event rollup as a TRUE
    append-mode streaming plan — stream-static broadcast join +
    watermarked tumbling aggregate over the flush-sentinel replay,
    drained via availableNow. The sentinel advances the watermark past
    every real window (emitting them) and is dropped by the join, so
    the drained sink equals the batch join+rollup bit-for-bit."""
    from mmw_geoprocessing_spark.sources.tables import load_table

    src = replay_events_flush_dir(spark, sf_dir)
    stream = stream_events(spark, src + "/*")
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    out = _drain_to_batch(
        spark,
        stream_static_enrich_agg(stream, dim),
        key=f"enrich_{os.path.basename(src)}",
    )
    return out.select("win_start", "c_mktsegment", "event_type", "cnt", "sum_value")


def stream_static_enrich_batch_sql() -> str:
    return f"""
    SELECT CAST(floor(epoch(time_bucket(INTERVAL 1 DAY,
               CAST(ts AS TIMESTAMP)))) AS BIGINT) AS win_start,
           c_mktsegment, event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           {SUM_VALUE_SQL} AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2, 3
    """


# ---------------------------------------------------------------------------
# Streaming sessionization (round 10, late): session_window as a TRUE
# stateful streaming plan — the streaming twin of the batch
# sessionize/session_windows family. Session state merges across
# micro-batches (a session spanning the replay's chunk boundary is
# stitched by the state store); append mode emits a session only when
# the watermark proves it closed (last event + gap passed).
# ---------------------------------------------------------------------------


def stream_sessionize(
    stream: DataFrame, gap: str = "10 minutes", watermark: str = "480 minutes"
) -> DataFrame:
    """Watermarked streaming session windows per user. State is one
    open session per (user, gap-run) — bounded by active users per
    watermark span, not history."""
    w = F.session_window(F.col("ts"), gap)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("last_ts"))
        .select(
            "user_id",
            _epoch(F.col("w.start")).alias("session_start"),
            "n_events",
            _epoch(F.col("last_ts")).alias("last_ts"),
        )
    )


def stream_sessionize_batch(spark, sf_dir: str) -> "DataFrame":
    """Registry entry: sessionization drained over the flush-sentinel
    replay (time-ordered exactly-once chunks + a user=-1 heartbeat
    2 days past the corpus max). The sentinel advances the watermark
    past every real session's close, so append mode emits them all
    before availableNow stops; its own single-event session is the one
    sink row filtered back out (user_id = -1 — documented, not
    silent). Drained sink == the batch gaps-and-islands twin."""
    src = replay_events_flush_dir(spark, sf_dir)
    out = _drain_to_batch(
        spark,
        stream_sessionize(stream_events(spark, src + "/*")),
        key=f"sessionize_{os.path.basename(src)}",
    )
    return out.filter(F.col("user_id") >= 0).select(
        "user_id", "session_start", "n_events", "last_ts"
    )


def stream_sessionize_batch_sql(gap_min: int = 10) -> str:
    return session_windows_sql(gap_min)


def stream_stateful_counts_batch(spark, sf_dir: str) -> "DataFrame":
    """Registry entry: the applyInPandasWithState custom stateful
    operator (running per-user event counts in explicit group state),
    drained over the time-ordered exactly-once replay in UPDATE mode to
    a memory sink (update emits one row per touched user per
    micro-batch; the parquet sink is append-only). The final value per
    user — counts are monotone, so max() — is the closed-form oracle:
    total events per user. This is the registry's custom-stateful-
    operator face: bespoke state (a sketch, an accumulator) that
    session_window/agg can't express, held in explicit per-group state
    with bounded size (one bigint per user)."""
    src = replay_events_time_chunks(spark, sf_dir)
    name = "stateful_counts_" + os.path.basename(src).replace(".", "_")
    if name not in [t.name for t in spark.catalog.listTables()]:
        q = (
            stream_running_user_counts(stream_events(spark, src + "/*"))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1800)
    return spark.sql(
        f"SELECT user_id, max(n_events) AS n_events FROM {name} GROUP BY user_id"
    )


def stream_stateful_counts_batch_sql() -> str:
    return """
    SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
    """
