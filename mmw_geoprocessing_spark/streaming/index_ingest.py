"""Streaming ingest into the durable search index — exactly-once.

The end-to-end shape a crawl pipeline runs at 100 TB: document drops
arrive as a STREAM; each micro-batch's postings are appended into the
term-bucketed on-disk index (``sources/index_store.py``) and a 1-row
corpus-totals ledger entry is recorded; queries serve from the index
at any point. The hard property is EXACTLY-ONCE under crash replay:
Structured Streaming guarantees at-least-once delivery to
``foreachBatch`` (a batch whose commit raced a crash is REPLAYED from
the checkpoint), so a naive append duplicates postings. The standard
recipe — make the sink idempotent by a deterministic batch identity —
is implemented here with the index store's marker commit: the append
tag is the source FILE identity (not the epoch id, which resets when
a checkpoint is rebuilt, and not the logical chunk id, which drops
data when a chunk spans files), so a replayed or re-drained file hits
its marker and becomes a no-op. The totals ledger gets the dual
treatment: duplicate 1-row entries are collapsed at read time by
source tag (dedup-at-read, the other half of the idempotent-sink
recipe). tests/test_index_store.py drains, DESTROYS the checkpoint,
re-drains, and proves zero duplication.

Reference parity note: the reference ingests layers once into its S3
catalog and serves requests from it (Utils.scala:22-23); this is the
same ingest-vs-serve split with the ingest side streamed.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_CHUNKS = 4

_POSTINGS_SCHEMA = "doc_id bigint, term string, tf bigint, dl int"

#: spec tokens shared between each face's replay cache AND its durable
#: index identity (r13 ADVICE): the chunk contents depend on the
#: constants these tokens name, so changing them must invalidate BOTH
#: the replay directory and the index the drained drops landed in —
#: renaming only one side re-appends fresh-named drops onto an index
#: built from the old spec's files (duplicate rows, stale serving).
_IVF_STREAM_SPEC = "all"


def _lsh_stream_spec() -> str:
    from mmw_geoprocessing_spark.operators.dedup import (
        INCREMENTAL_BATCH_MOD,
        INCREMENTAL_BATCH_REM,
    )

    return f"refm{INCREMENTAL_BATCH_MOD}r{INCREMENTAL_BATCH_REM}"


def _face_ckpt(ident: str, index_name: str, spec: str, fp: str) -> str:
    """Checkpoint dir keyed by BOTH the replay identity and the target
    index identity (name + spec + corpus fingerprint). A checkpoint
    that outlives its index is poison: availableNow finds the source
    caught up, re-delivers nothing, the markers never fire, and the
    face serves an EMPTY index (the r14 IVF-face regression when the
    spec token moved the index name but not the checkpoint). Tying the
    checkpoint to the index identity makes any index-identity change
    drain from scratch — the markers make the re-delivery exactly-once."""
    return os.path.join(
        tempfile.gettempdir(), f"{ident}_{index_name}_{spec}_{fp}_ckpt"
    )


def replay_docs_dir(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic chunked document-drop replay: the corpus split
    into ``N_CHUNKS`` drops by ``doc_id % N_CHUNKS`` (each with its
    ``chunk_id`` stamped in the data — the batch identity that makes
    the sink idempotent). Built once per (sf_dir, source mtime) with
    an atomic rename, like ``cdc.replay_changelog_dir``."""
    from mmw_geoprocessing_spark.sources.tables import load_table

    src_file = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(src_file)
        ident = f"{st.st_size}_{int(st.st_mtime)}"
    except OSError as e:
        # r13 ADVICE (same hazard as _chunked_replay_dir): a shared
        # 'nostat' fallback name would collide distinct corpora
        raise FileNotFoundError(
            f"replay_docs_dir: source {src_file} is not statable"
        ) from e
    tag = sf_dir.strip("/").replace("/", "_")
    final = os.path.join(
        tempfile.gettempdir(), f"stream_docs_v2_{tag}_{ident}_c{N_CHUNKS}"
    )
    if os.path.isdir(final):
        return final
    work = tempfile.mkdtemp(prefix="stream_docs_build_")
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "chunk_id", (F.col("doc_id") % N_CHUNKS).cast("int")
    )
    for i in range(N_CHUNKS):
        # One file per chunk: each drop arrives as one deterministic
        # micro-batch. (Correctness no longer rests on this — the
        # idempotence key is the FILE identity after the 100x-replica
        # defect where chunk-id keying dropped every file of a
        # multi-file chunk after its first — but a one-file drop keeps
        # the replay's batch boundaries deterministic.)
        docs.filter(F.col("chunk_id") == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(work, f"chunk_{i}"))
    try:
        os.rename(work, final)
    except OSError:
        if os.path.isdir(final):
            import shutil

            shutil.rmtree(work, ignore_errors=True)
        else:
            raise
    return final


def _chunk_postings(batch: DataFrame) -> DataFrame:
    toks = batch.select(
        F.col("doc_id"), F.split(F.lower(F.col("text")), " ").alias("w")
    )
    return (
        toks.select("doc_id", F.size("w").alias("dl"), F.explode("w").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )


def _ingest_batch(
    spark: SparkSession,
    fingerprint: str,
    totals_dir: str,
    batch: DataFrame,
    appended_log: list[str] | None = None,
) -> None:
    """foreachBatch body: for each source FILE present in the batch
    (one, with maxFilesPerTrigger=1), marker-gated postings append +
    a totals ledger row. The idempotence key is the file identity —
    stable across epochs, checkpoint rebuilds, AND multi-file drops
    (the v1 key was the chunk id, which silently dropped every file
    of a chunk after its first — the 100x-replica defect; file keying
    removes the one-file-per-chunk invariant from the correctness
    path entirely, though the replay still ships one file per drop
    for determinism). Safe under any replay: the marker makes the
    append a no-op, the ledger dedups at read.

    Ordering (ADVICE r11): the ledger row is written BEFORE the marker
    commit, not after — ledger-then-marker means a crash between the
    two replays BOTH (the duplicate ledger row collapses at read on
    src_tag), while the old marker-then-ledger order permanently lost
    the ledger row (replay saw the marker, skipped the ledger, and
    n_docs/t_tokens silently undercounted every BM25 score)."""
    import hashlib

    from mmw_geoprocessing_spark.sources.index_store import (
        append_applied,
        append_once,
    )

    # Two passes over the micro-batch (one distinct-file collect, then a
    # filter per file). Bounded and correct under maxFilesPerTrigger=1
    # (one file per batch -> two scans of one drop); if the trigger is
    # ever widened, fold this into one pass that groups by
    # input_file_name() before appending (r11 verdict note).
    files = sorted(
        r["f"]
        for r in batch.select(F.input_file_name().alias("f")).distinct().collect()
    )
    for fname in files:
        tag = "f" + hashlib.md5(fname.encode()).hexdigest()[:12]
        if append_applied("bm25_postings_stream_v2", fingerprint, tag, "term"):
            continue  # fully committed drop: its ledger row preceded it
        rows = batch.filter(F.input_file_name() == fname)
        (
            rows.select(F.split(F.lower(F.col("text")), " ").alias("w"))
            .agg(
                F.lit(tag).alias("src_tag"),
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.size("w")).alias("t_tokens"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(totals_dir)
        )
        did = append_once(
            spark,
            "bm25_postings_stream_v2",
            fingerprint,
            tag,
            lambda r=rows: _chunk_postings(r),
            bucket_col="term",
        )
        if did and appended_log is not None:
            appended_log.append(tag)


def stream_index_ingest(
    spark: SparkSession, sf_dir: str, appended_log: list[str] | None = None
) -> str:
    """Drain the chunked document stream into the durable index
    (availableNow + durable checkpoint, keyed per corpus identity).
    Returns the corpus fingerprint the index is stored under. A
    repeat drain finds the checkpoint caught up (zero batches); a
    REBUILT checkpoint re-delivers every chunk and the markers
    discard all of them."""
    from mmw_geoprocessing_spark.sources.index_store import (
        corpus_fingerprint,
        get_or_build_index,
    )

    fp = corpus_fingerprint(sf_dir, "documents")
    replay = replay_docs_dir(spark, sf_dir)
    ident = os.path.basename(replay)
    totals_dir = os.path.join(tempfile.gettempdir(), f"{ident}_totals")
    ckpt = _face_ckpt(ident, "bm25_postings_stream_v2", "v1", fp)

    # the index starts EMPTY — every posting arrives by stream
    get_or_build_index(
        spark,
        "bm25_postings_stream_v2",
        fp,
        lambda: spark.createDataFrame([], _POSTINGS_SCHEMA),
        bucket_col="term",
    )

    schema = spark.read.parquet(os.path.join(replay, "chunk_0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, eid: _ingest_batch(spark, fp, totals_dir, df, appended_log)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(1800):
        try:
            q.stop()
        finally:
            raise TimeoutError("stream_index_ingest drain exceeded 1800s")
    return fp


def stream_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry ``stream_index_append``: drain the document
    stream into the durable index, then serve the registered BM25
    query set from it. Totals come from the deduped ledger (replays
    collapse by chunk id); df from the probe's own pruned buckets.
    The streamed index holds exactly the full corpus -> ``bm25_topk``'s
    DuckDB oracle hash-gates the whole pipeline end-to-end."""
    from mmw_geoprocessing_spark.operators.search import (
        QUERIES,
        TOP_K,
        _bm25_score_topk,
        _query_terms_df,
    )
    from mmw_geoprocessing_spark.sources.index_store import get_or_build_index

    fp = stream_index_ingest(spark, sf_dir)
    replay = replay_docs_dir(spark, sf_dir)
    totals_dir = os.path.join(
        tempfile.gettempdir(), f"{os.path.basename(replay)}_totals"
    )
    postings = get_or_build_index(
        spark,
        "bm25_postings_stream_v2",
        fp,
        lambda: (_ for _ in ()).throw(AssertionError("built by the drain")),
        bucket_col="term",
    )
    # dedup-at-read: a replayed chunk may have written its ledger row
    # twice; identical rows collapse on chunk_id before the sum
    totals = (
        spark.read.parquet(totals_dir)
        .dropDuplicates(["src_tag"])
        .agg(F.sum("n_docs").alias("n_docs"), F.sum("t_tokens").alias("t_tokens"))
    )
    qterms = _query_terms_df(spark)
    all_terms = sorted({t for _, terms in QUERIES for t in terms})
    tf = postings.filter(F.col("term").isin(all_terms))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return _bm25_score_topk(qterms, tf, df_, totals, TOP_K)


def stream_index_serve_sql() -> str:
    from mmw_geoprocessing_spark.operators.search import bm25_topk_sql

    return bm25_topk_sql()


# ---------------------------------------------------------------------------
# r12 verdict #2: the streaming exactly-once ingest face for the OTHER
# two durable index families. stream_index_ingest above covers BM25
# postings; a crawl pipeline streams embeddings into the IVF inverted
# file and admitted documents into the minhash reference indexes with
# the SAME recipe — file-identity idempotence tags, the index store's
# journaled marker commit, availableNow drains over a durable
# checkpoint. The batch appends these faces build on are
# similarity.ann_ivf_append_topk and dedup.incremental_batch_dedup_append.
# ---------------------------------------------------------------------------


def _chunked_replay_dir(
    spark: SparkSession, sf_dir: str, variant: str, df: DataFrame, key: str,
    spec: str = "",
) -> str:
    """Deterministic chunked drop replay (``replay_docs_dir``'s shape,
    generalized): ``df`` split into ``N_CHUNKS`` one-file drops by
    ``key % N_CHUNKS``, built once per (sf_dir, source size+mtime,
    spec) with an atomic rename.

    r13 ADVICE: the chunk CONTENTS also depend on the df the caller
    passes (e.g. the minhash face's reference-slice filter constants),
    so every caller folds a ``spec`` token naming those constants into
    the cache key — changing them can no longer silently serve a stale
    replay from the shared tempdir. A missing source file raises
    instead of colliding every corpus onto one 'nostat' directory."""
    src_file = os.path.join(sf_dir, f"{variant.split('_')[0]}.parquet")
    try:
        st = os.stat(src_file)
        ident = f"{st.st_size}_{int(st.st_mtime)}"
    except OSError as e:
        raise FileNotFoundError(
            f"_chunked_replay_dir: source {src_file} is not statable — the "
            "replay cache is keyed on its identity, so a shared fallback "
            "name would collide distinct corpora"
        ) from e
    tag = sf_dir.strip("/").replace("/", "_")
    spec_tok = f"_{spec}" if spec else ""
    final = os.path.join(
        tempfile.gettempdir(),
        f"stream_{variant}_{tag}_{ident}{spec_tok}_c{N_CHUNKS}",
    )
    if os.path.isdir(final):
        return final
    work = tempfile.mkdtemp(prefix=f"stream_{variant}_build_")
    chunked = df.withColumn("chunk_id", (F.col(key) % N_CHUNKS).cast("int"))
    for i in range(N_CHUNKS):
        chunked.filter(F.col("chunk_id") == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(work, f"chunk_{i}"))
    try:
        os.rename(work, final)
    except OSError:
        if os.path.isdir(final):
            import shutil

            shutil.rmtree(work, ignore_errors=True)
        else:
            raise
    return final


def _drain_files(
    spark: SparkSession, replay: str, ckpt: str, body, timeout_s: int = 1800
) -> None:
    """availableNow drain of the chunked replay, one source file per
    micro-batch, through ``body(batch_df, epoch_id)``."""
    schema = spark.read.parquet(os.path.join(replay, "chunk_0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        try:
            q.stop()
        finally:
            raise TimeoutError(f"stream drain exceeded {timeout_s}s")


def _batch_file_tags(batch: DataFrame) -> list[tuple[str, str]]:
    """(source file, idempotence tag) pairs present in the micro-batch
    — the tag is the FILE identity (stable across epochs, checkpoint
    rebuilds, and multi-file drops; see stream_index_ingest's module
    note on why epoch ids and chunk ids both fail)."""
    import hashlib

    files = sorted(
        r["f"]
        for r in batch.select(F.input_file_name().alias("f")).distinct().collect()
    )
    return [("f" + hashlib.md5(f.encode()).hexdigest()[:12], f) for f in files]


def stream_ivf_ingest(
    spark: SparkSession, sf_dir: str, appended_log: list[str] | None = None
) -> str:
    """Drain the chunked EMBEDDING-drop stream into the durable
    cell-partitioned IVF inverted file — exactly-once. Day zero: the
    inverted file is created EMPTY and the coarse quantizer is frozen
    (the first ``N_CELLS`` corpus vectors — the same frozen-quantizer
    contract as the batch-append face, similarity.ann_ivf_append_topk:
    re-clustering would move every stored vector). Each micro-batch's
    vectors are assigned against the frozen quantizer and appended via
    the journaled marker commit, one extra file per touched ``cell=…``
    directory, unseen cells becoming new directories. A rebuilt
    checkpoint re-delivers every drop; the markers discard all of
    them."""
    from mmw_geoprocessing_spark.operators.similarity import (
        _as_double,
        _cell_assign,
        _centroids,
        _norm,
    )
    from mmw_geoprocessing_spark.sources.index_store import (
        append_once,
        corpus_fingerprint,
        get_or_build_index,
    )
    from mmw_geoprocessing_spark.sources.tables import load_table

    fp = corpus_fingerprint(sf_dir, "embeddings")
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _centroids(emb)  # frozen at index creation

    def _assign(rows: DataFrame) -> DataFrame:
        return (
            rows.select("vec_id", _as_double(F.col("embedding")).alias("v"))
            .withColumn("cell", _cell_assign("v", cents))
            .withColumn("nv", _norm(F.col("v")))
        )

    # day-zero bootstrap: schema from the assigner over zero rows.
    # spec_version ties the INDEX identity to the same spec token as
    # the replay cache (r13 ADVICE): a changed drop spec must start a
    # fresh index generation, not re-append new-named drops onto one
    # built from the old spec's files.
    get_or_build_index(
        spark, "ivf_lists_stream", fp, lambda: _assign(emb.limit(0)),
        partition_col="cell", spec_version=_IVF_STREAM_SPEC,
    )
    replay = _chunked_replay_dir(
        spark, sf_dir, "embeddings_ivf", emb, "vec_id", spec=_IVF_STREAM_SPEC
    )
    ident = os.path.basename(replay)

    def _body(batch: DataFrame, _eid: int) -> None:
        for tag, fname in _batch_file_tags(batch):
            rows = batch.filter(F.input_file_name() == fname)
            did = append_once(
                spark, "ivf_lists_stream", fp, tag,
                lambda r=rows: _assign(r), partition_col="cell",
                spec_version=_IVF_STREAM_SPEC,
            )
            if did and appended_log is not None:
                appended_log.append(tag)

    _drain_files(
        spark, replay,
        _face_ckpt(ident, "ivf_lists_stream", _IVF_STREAM_SPEC, fp), _body,
    )
    return fp


def stream_ivf_serve(
    spark: SparkSession, sf_dir: str, n_queries: int = 20, k: int = 5,
    nprobe: int | None = None,
) -> DataFrame:
    """Registry entry ``stream_ivf_index_append``: drain the embedding
    stream into the durable IVF index, then serve the registered ANN
    query set from it with the shared Dynamic-Partition-Pruned probe.
    The streamed index holds exactly the full corpus under the frozen
    quantizer -> ``ann_ivf_topk``'s DuckDB oracle hash-gates the whole
    pipeline end-to-end."""
    from mmw_geoprocessing_spark.operators.similarity import (
        NPROBE,
        probe_ivf_index,
    )
    from mmw_geoprocessing_spark.sources.index_store import get_or_build_index

    fp = stream_ivf_ingest(spark, sf_dir)
    idx = get_or_build_index(
        spark, "ivf_lists_stream", fp,
        lambda: (_ for _ in ()).throw(AssertionError("built by the drain")),
        partition_col="cell", spec_version=_IVF_STREAM_SPEC,
    ).select("vec_id", "v", "nv", "cell")
    return probe_ivf_index(
        spark, sf_dir, idx, n_queries, k, NPROBE if nprobe is None else nprobe
    )


def stream_ivf_serve_sql() -> str:
    from mmw_geoprocessing_spark.operators.similarity import ann_ivf_topk_sql

    return ann_ivf_topk_sql()


def stream_minhash_ingest(
    spark: SparkSession, sf_dir: str, appended_log: list[str] | None = None
) -> str:
    """Drain the chunked ADMITTED-DOCUMENT stream into BOTH durable
    minhash reference indexes — the bkey-bucketed band index and the
    doc_id-bucketed shingle-array index — exactly-once per index. Each
    drop makes TWO journaled marker commits under one file-identity
    tag; a crash between them replays safely (the committed index
    no-ops on its marker, the other finishes), which the crash-window
    test pins. Day zero: both indexes are created EMPTY, like the BM25
    stream's bucketed table."""
    from mmw_geoprocessing_spark.operators.dedup import (
        INCREMENTAL_BATCH_MOD,
        INCREMENTAL_BATCH_REM,
        _band_rows,
        _doc_shingles,
    )
    from mmw_geoprocessing_spark.sources.index_store import (
        append_once,
        corpus_fingerprint,
        get_or_build_index,
    )
    from mmw_geoprocessing_spark.sources.tables import load_table

    fp = corpus_fingerprint(sf_dir, "documents")
    docs = load_table(spark, sf_dir, "documents")
    is_batch = (F.col("doc_id") % INCREMENTAL_BATCH_MOD) == INCREMENTAL_BATCH_REM
    ref = docs.filter(~is_batch)

    def _bands(rows: DataFrame) -> DataFrame:
        return _band_rows(_doc_shingles(rows))

    def _arrays(rows: DataFrame) -> DataFrame:
        return (
            _doc_shingles(rows)
            .groupBy("doc_id")
            .agg(
                F.sort_array(F.collect_list("s")).alias("ss"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    spec = _lsh_stream_spec()
    get_or_build_index(
        spark, "lsh_ref_bands_stream", fp, lambda: _bands(ref.limit(0)),
        bucket_col="bkey", spec_version=spec,
    )
    get_or_build_index(
        spark, "lsh_ref_arrays_stream", fp, lambda: _arrays(ref.limit(0)),
        bucket_col="doc_id", spec_version=spec,
    )
    # the ref slice depends on the incremental-batch constants — fold
    # them into the replay cache key AND the index identity (r13 ADVICE)
    replay = _chunked_replay_dir(
        spark, sf_dir, "documents_lsh", ref, "doc_id", spec=spec
    )
    ident = os.path.basename(replay)

    def _body(batch: DataFrame, _eid: int) -> None:
        for tag, fname in _batch_file_tags(batch):
            rows = batch.filter(F.input_file_name() == fname)
            did = append_once(
                spark, "lsh_ref_bands_stream", fp, tag,
                lambda r=rows: _bands(r), bucket_col="bkey", spec_version=spec,
            )
            append_once(
                spark, "lsh_ref_arrays_stream", fp, tag,
                lambda r=rows: _arrays(r), bucket_col="doc_id",
                spec_version=spec,
            )
            if did and appended_log is not None:
                appended_log.append(tag)

    _drain_files(
        spark, replay, _face_ckpt(ident, "lsh_ref_stream", spec, fp), _body
    )
    return fp


def stream_minhash_serve(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    """Registry entry ``stream_minhash_index_append``: drain the
    admitted-document stream into the durable reference indexes, then
    probe them with today's incoming batch through the shared probe.
    The streamed indexes hold exactly the full reference corpus ->
    ``incremental_batch_dedup``'s DuckDB oracle hash-gates the whole
    pipeline end-to-end."""
    from mmw_geoprocessing_spark.operators.dedup import (
        INCREMENTAL_BATCH_MOD,
        INCREMENTAL_BATCH_REM,
        probe_ref_indexes,
    )
    from mmw_geoprocessing_spark.sources.index_store import get_or_build_index
    from mmw_geoprocessing_spark.sources.tables import load_table

    fp = stream_minhash_ingest(spark, sf_dir)

    def _absent() -> DataFrame:
        raise AssertionError("built by the drain")

    spec = _lsh_stream_spec()
    ref_bands = get_or_build_index(
        spark, "lsh_ref_bands_stream", fp, _absent, bucket_col="bkey",
        spec_version=spec,
    )
    ref_arrays = get_or_build_index(
        spark, "lsh_ref_arrays_stream", fp, _absent, bucket_col="doc_id",
        spec_version=spec,
    )
    documents = load_table(spark, sf_dir, "documents")
    is_batch = (F.col("doc_id") % INCREMENTAL_BATCH_MOD) == INCREMENTAL_BATCH_REM
    return probe_ref_indexes(documents, is_batch, ref_bands, ref_arrays, threshold)


def stream_minhash_serve_sql(threshold: float = 0.5) -> str:
    from mmw_geoprocessing_spark.operators.dedup import incremental_batch_dedup_sql

    return incremental_batch_dedup_sql(threshold=threshold)


def stream_phash_ingest(
    spark: SparkSession, sf_dir: str, appended_log: list[str] | None = None
) -> str:
    """Round 13 (late): the streaming face for the FOURTH durable
    index family — perceptual-image fingerprint bands. Image drops are
    drained availableNow into the bkey-bucketed band index with the
    same recipe as the other three faces: file-identity idempotence
    tags, journaled marker commits, durable checkpoint. Each
    micro-batch fingerprints ONLY its own documents (synthesize → PNG
    encode → decode → dHash, Arrow-batched) and appends the band rows
    exactly-once. Day zero starts from an EMPTY bucketed index."""
    from mmw_geoprocessing_spark.operators import image_dedup as imd
    from mmw_geoprocessing_spark.sources.index_store import (
        append_once,
        corpus_fingerprint,
        get_or_build_index,
    )
    from mmw_geoprocessing_spark.sources.tables import load_table

    fp = corpus_fingerprint(sf_dir, "documents")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    spec = "tex4s"

    def _bands(rows: DataFrame) -> DataFrame:
        return imd._fp_bands(imd.image_phash(imd.attach_image(rows)))

    get_or_build_index(
        spark, "img_phash_bands_stream", fp, lambda: _bands(docs.limit(0)),
        bucket_col="bkey", spec_version=spec,
    )
    replay = _chunked_replay_dir(
        spark, sf_dir, "documents_phash", docs, "doc_id", spec=spec
    )
    ident = os.path.basename(replay)

    def _body(batch: DataFrame, _eid: int) -> None:
        for tag, fname in _batch_file_tags(batch):
            rows = batch.filter(F.input_file_name() == fname)
            did = append_once(
                spark, "img_phash_bands_stream", fp, tag,
                lambda r=rows: _bands(r), bucket_col="bkey",
                spec_version=spec,
            )
            if did and appended_log is not None:
                appended_log.append(tag)

    _drain_files(
        spark, replay,
        _face_ckpt(ident, "img_phash_bands_stream", spec, fp), _body,
    )
    return fp


def stream_phash_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry row ``stream_phash_index_append``: drain the image
    stream into the durable band index, then serve the banded near-dup
    from it — candidates from the streamed index joined per chunk,
    verified by exact Hamming (the fingerprint IS in the band row).
    The streamed index holds exactly the full corpus -> the
    ``dedup_image_phash`` oracle hash-gates the pipeline end-to-end."""
    from mmw_geoprocessing_spark.operators import image_dedup as imd
    from mmw_geoprocessing_spark.sources.index_store import get_or_build_index

    from pyspark.sql import Window

    fp = stream_phash_ingest(spark, sf_dir)
    bands = get_or_build_index(
        spark, "img_phash_bands_stream", fp,
        lambda: (_ for _ in ()).throw(AssertionError("built by the drain")),
        bucket_col="bkey", spec_version="tex4s",
    )
    # the same hot-band cap as the batch matcher (r13 verdict #2) —
    # bkey = ci * 2^16 + cv, so capping per bkey IS capping per (ci, cv)
    cap_w = Window.partitionBy("bkey").orderBy("doc_id")
    bands = (
        bands.withColumn("rn", F.row_number().over(cap_w))
        .filter(F.col("rn") <= imd.IMG_BAND_CAP)
        .drop("rn")
    )
    a = bands.select(
        F.col("doc_id").alias("a_id"),
        *[F.col(f"d{i}").alias(f"x{i}") for i in range(4)],
        "bkey",
    )
    b = bands.select(
        F.col("doc_id").alias("b_id"),
        *[F.col(f"d{i}").alias(f"y{i}") for i in range(4)],
        "bkey",
    )
    ham = sum(
        F.bit_count(F.col(f"x{i}").bitwiseXOR(F.col(f"y{i}"))) for i in range(4)
    )
    return (
        a.join(b, "bkey")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= imd.HAMMING_T)
        .dropDuplicates(["a_id", "b_id"])
    )


def stream_phash_serve_sql() -> str:
    from mmw_geoprocessing_spark.operators.image_dedup import (
        dedup_image_phash_sql,
    )

    return dedup_image_phash_sql()
