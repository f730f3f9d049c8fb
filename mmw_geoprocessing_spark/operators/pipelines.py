"""End-to-end training-corpus curation: the composition a large-scale
LLM data pipeline runs over raw documents — featurize, gate on language
and quality, exact-dedup, prune near-duplicates, assign deterministic
splits. The reference has no analogue (its pipeline is zonal-only); this
is part of the SURVEY-demanded LLM-pipeline capability extension built
from the operators in text_analysis / dedup / sampling.

One declarative plan end-to-end — Catalyst sees the whole composition,
so the document scan is shared, filters collapse into the featurization
projection, and nothing materializes between stages. Shuffle budget at
100 TB (the design contract):

1. featurize + gate: ZERO shuffles — one projection over the scan; the
   language/quality gates are plain filters Catalyst pushes against it.
2. exact dedup: one hash-partition on ``md5(text)`` (the window that
   picks each digest group's minimum doc_id). Digest keys are uniform
   by construction — no skew, no salting needed.
3. near-dup prune: the MinHash-LSH pair table (banded bucket joins —
   never all-pairs; see dedup.minhash_lsh_neardup) anti-joined on
   doc_id. The dropped-id side is |near-dup pairs| rows — orders of
   magnitude smaller than the corpus, so AQE plans it broadcast.
4. split: ZERO shuffles — membership is a pure hash of the key
   (sampling.deterministic_split).

Near-dup semantics: pairs are detected over the FULL corpus (matching
the registered ``dedup_minhash_lsh`` query — so the ingest-time LSH
index is shared, not rebuilt per gate configuration), but a doc is only
dropped for a pair whose lower-id side SURVIVED the gate + exact dedup:
dropping d2 is justified by d1 standing in for the content, so a pair
whose d1 was itself gated away (wrong language, low quality, exact-dup
loser) must not delete the content's last representative. The greedy
keep-lowest rule then drops every doc that near-duplicates any lower-id
surviving doc. Transitive clusters keep only their minimum member iff
every member pairs with it directly; full connected components is an
iterative algorithm (not a single SQL-expressible pass) and is out of
scope for the oracle-checked path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.operators import dedup as dd
from mmw_geoprocessing_spark.operators import sampling as sp
from mmw_geoprocessing_spark.operators import text_analysis as ta


def _featurize_gate(
    documents: DataFrame,
    lang: str,
    min_words: int,
    min_distinct_ratio: float,
) -> DataFrame:
    """One-scan featurization + language/quality gate — a pure
    projection+filter, so the same plan fragment works unchanged over a
    batch table or a stream. Output: the gated docs with
    ``(doc_id, text, n_words, distinct_ratio, lang_guess)``."""
    wl = ta._wordlist(F.col("text"))
    _scores, guess = ta.lang_scores_and_guess(wl)
    n_words = F.size(wl)
    distinct_ratio = F.size(F.array_distinct(wl)) / n_words
    feats = documents.select(
        "doc_id",
        "text",
        n_words.alias("n_words"),
        distinct_ratio.alias("distinct_ratio"),
        guess.alias("lang_guess"),
    )
    return feats.filter(
        (F.col("lang_guess") == lang)
        & (F.col("n_words") >= min_words)
        & (F.col("distinct_ratio") >= min_distinct_ratio)
    )


def _gate_survivors(
    documents: DataFrame, lang: str, min_words: int, min_distinct_ratio: float
) -> DataFrame:
    """Gate + exact-dedup survivors ``(doc_id, n_words)``: the canonical
    representative (min doc_id) of each content digest within the gated
    set."""
    gated = _featurize_gate(documents, lang, min_words, min_distinct_ratio)
    digest_w = Window.partitionBy(F.md5(F.col("text")))
    return (
        gated.withColumn("_canon", F.min("doc_id").over(digest_w))
        .filter(F.col("doc_id") == F.col("_canon"))
        .select("doc_id", "n_words")
    )


def neardup_drop_ids(
    documents: DataFrame,
    *,
    lang: str = "en",
    min_words: int = 8,
    min_distinct_ratio: float = 0.2,
    neardup_threshold: float = 0.5,
    survivors: DataFrame | None = None,
) -> DataFrame:
    """The near-dup DROP set ``(doc_id)`` under the last-representative
    rule: d2 of every verified pair whose lower-id d1 survived the gate
    + exact dedup. This is the single source of truth for BOTH the
    batch plan (``curate_corpus``) and the ingest-time index the
    streaming path anti-joins against (``curate_stream``) — building
    the stream's index any other way would re-introduce the dropped-
    last-representative bug ADVICE r6 flagged. Pass ``survivors`` to
    share an already-built gate plan fragment."""
    if survivors is None:
        survivors = _gate_survivors(documents, lang, min_words, min_distinct_ratio)
    return (
        dd.minhash_lsh_neardup(documents, threshold=neardup_threshold)
        .join(survivors.select(F.col("doc_id").alias("d1")), "d1", "left_semi")
        .select(F.col("d2").alias("doc_id"))
        .distinct()
    )


def curate_corpus(
    documents: DataFrame,
    *,
    lang: str = "en",
    min_words: int = 8,
    min_distinct_ratio: float = 0.2,
    neardup_threshold: float = 0.5,
) -> DataFrame:
    """Curate ``documents`` into a training corpus.

    Output: ``(doc_id BIGINT, n_words INT, split STRING)`` — the
    surviving docs with their token counts and train/val/test labels.
    """
    survivors = _gate_survivors(documents, lang, min_words, min_distinct_ratio)
    # drop d2 only when its pair's d1 survived gate + exact dedup (the
    # module-doc "last representative" rule); the anti join's build side
    # is the drop id set — small next to the corpus, AQE broadcasts
    dropped = neardup_drop_ids(
        documents,
        neardup_threshold=neardup_threshold,
        survivors=survivors,
    )
    curated = survivors.join(dropped, "doc_id", "left_anti")
    return sp.deterministic_split(curated).select("doc_id", "n_words", "split")


def curate_corpus_sql(
    *,
    lang: str = "en",
    min_words: int = 8,
    min_distinct_ratio: float = 0.2,
    neardup_threshold: float = 0.5,
) -> str:
    score_sel = ", ".join(
        f"{e} AS score_{lg}" for lg, e in ta.lang_score_exprs_sql().items()
    )
    return f"""
    WITH feats AS (
      SELECT doc_id, text, string_split(text, ' ') AS l FROM documents
    ), scored AS (
      SELECT doc_id, text,
             CAST(len(l) AS INT) AS n_words,
             len(list_distinct(l)) / len(l) AS distinct_ratio,
             {score_sel}
      FROM feats
    ), gated AS (
      SELECT doc_id, text, n_words FROM scored
      WHERE ({ta.lang_guess_case_sql()}) = '{lang}'
        AND n_words >= {min_words}
        AND distinct_ratio >= {min_distinct_ratio}
    ), survivors AS MATERIALIZED (
      -- MATERIALIZED: survivors is referenced twice (the dropped-set's
      -- IN subquery and the final FROM). As a plain CTE DuckDB INLINES
      -- it into both, re-evaluating the full text-carrying gate
      -- pipeline (string_split + per-doc lists over every document) —
      -- at the 100x replica that second evaluation pushed the oracle
      -- past 64 GB RAM + 67 GB of spill disk. Materialized it is one
      -- evaluation yielding a narrow (doc_id, n_words) table. Same
      -- hazard class as the recursive-closure twins (SCALE.md).
      SELECT doc_id, n_words FROM (
        SELECT doc_id, n_words,
               MIN(doc_id) OVER (PARTITION BY md5(text)) AS canon
        FROM gated
      ) WHERE doc_id = canon
    ), dropped AS (
      SELECT DISTINCT p.d2 AS doc_id
      FROM ({dd.minhash_lsh_neardup_sql(neardup_threshold)}) p
      WHERE p.d1 IN (SELECT doc_id FROM survivors)
    )
    SELECT s.doc_id, s.n_words, {sp.split_case_sql(key_col="s.doc_id")} AS split
    FROM survivors s ANTI JOIN dropped d USING (doc_id)
    """


def curate_stream(
    stream_docs: DataFrame,
    neardup_dropped: DataFrame,
    *,
    lang: str = "en",
    min_words: int = 8,
    min_distinct_ratio: float = 0.2,
    dedup_watermark: str = "10 minutes",
) -> DataFrame:
    """The curation pipeline at INGEST time: the same gates running over
    a document stream, so new corpus drops are curated as they land
    instead of re-batching the world.

    Stage mapping from the batch plan:
    - featurize + gate: identical plan fragment (_featurize_gate) —
      stateless, so it streams as-is.
    - exact dedup: ``dropDuplicatesWithinWatermark`` on the content
      digest over an ingest-time watermark — state is bounded by the
      watermark horizon (the batch min-doc_id canonicalization needs a
      global view a stream cannot have; first-arrival-wins is the
      streaming contract, and the batch/stream equivalence test
      compares digest SETS for exactly this reason).
    - near-dup prune: stream-static LEFT ANTI join against the
      ingest-time near-dup index (the id table
      ``neardup_drop_ids(batch_docs)`` materialized at the last index
      build — the SAME drop-rule helper the batch plan uses, so the
      last-representative semantics hold on both paths). A stream
      cannot LSH-join against itself; at deployment the index
      refreshes on the ingest cadence.
    - split: pure hash of the key — stateless.

    Output stream: ``(doc_id, text_md5, n_words, split)``; run it with
    ``streaming.windows.run_availablenow`` for checkpointed exactly-once
    delivery into the corpus sink.
    """
    gated = _featurize_gate(stream_docs, lang, min_words, min_distinct_ratio)
    deduped = (
        gated.withColumn("text_md5", F.md5(F.col("text")))
        .withColumn("ingest_ts", F.current_timestamp())
        .withWatermark("ingest_ts", dedup_watermark)
        .dropDuplicatesWithinWatermark(["text_md5"])
    )
    # accept either the drop-id table (neardup_drop_ids output) or a
    # raw verified-pair table (legacy callers): both reduce to doc_id
    drop_ids = (
        neardup_dropped.select(F.col("d2").alias("doc_id"))
        if "d2" in neardup_dropped.columns
        else neardup_dropped.select("doc_id")
    ).distinct()
    pruned = deduped.join(drop_ids, "doc_id", "left_anti")
    return sp.deterministic_split(pruned).select(
        "doc_id", "text_md5", "n_words", "split"
    )
