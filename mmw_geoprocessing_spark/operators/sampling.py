"""Dataset assembly operators for training-data pipelines: deterministic
splits, stratified sampling, and token-budget batch packing.

All three are hash-driven and shuffle-minimal — the properties that
matter at 100 TB:

- ``deterministic_split``: split membership is a pure function of the
  key (md5 bucket), so it is stable across runs, machines, and
  partitionings, needs NO shuffle (a projection), and any subset of the
  data can be split independently — the standard train/val/test recipe
  for corpora too large to shuffle globally.
- ``stratified_sample``: per-stratum deterministic hash-threshold
  sampling; unlike ``df.sampleBy`` (seeded RNG per partition, layout-
  dependent) the kept set is a function of (stratum, key) only.
- ``pack_token_batches``: assign documents to token-budget batches.
  Exact sequential packing is inherently serial, so the scalable shape
  packs WITHIN hash buckets: one window per bucket (parallel across
  buckets), batch = floor(running_tokens / budget) — deterministic,
  one shuffle on the bucket key, and each batch's overshoot is bounded
  by one document.

Every operator has a DuckDB SQL twin (used by tests/test_sampling.py)
built on the shared md5-hash recipe (functions/text.py h28).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.functions.text import H28_SQL, h28

H28_MAX = 1 << 28


def deterministic_split(
    documents: DataFrame,
    weights: dict[str, int] | None = None,
    key_col: str = "doc_id",
) -> DataFrame:
    """Assign each row a split label from hash(key) % 100.

    ``weights``: label -> percent (must sum to 100); default
    90/5/5 train/val/test.
    Output: input columns + ``split STRING``.
    """
    weights = weights or {"train": 90, "val": 5, "test": 5}
    if sum(weights.values()) != 100:
        raise ValueError(f"split weights must sum to 100: {weights}")
    bucket = h28(F.col(key_col).cast("string")) % 100
    expr = None
    lo = 0
    for label, pct in weights.items():
        cond = (bucket >= F.lit(lo)) & (bucket < F.lit(lo + pct))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        lo += pct
    return documents.withColumn("split", expr)


def split_case_sql(weights: dict[str, int] | None = None, key_col: str = "doc_id") -> str:
    """The DuckDB CASE expression assigning the split label for a key —
    reusable inside larger pipeline SQL (curate_corpus_sql)."""
    weights = weights or {"train": 90, "val": 5, "test": 5}
    h = H28_SQL.format(x=f"CAST({key_col} AS VARCHAR)")
    cases, lo = [], 0
    for label, pct in weights.items():
        cases.append(f"WHEN ({h}) % 100 >= {lo} AND ({h}) % 100 < {lo + pct} THEN '{label}'")
        lo += pct
    return f"CASE {' '.join(cases)} END"


def deterministic_split_sql(
    weights: dict[str, int] | None = None, key_col: str = "doc_id"
) -> str:
    return f"SELECT *, {split_case_sql(weights, key_col)} AS split FROM documents"


def stratified_sample(
    documents: DataFrame,
    strata_col: str,
    fraction: float,
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep ~``fraction`` of the rows of EACH stratum, deterministically:
    a row survives iff hash(stratum || '|' || key) < fraction * 2^28.
    Output: the surviving rows (all input columns).
    """
    salt = F.concat_ws("|", F.col(strata_col).cast("string"), F.col(key_col).cast("string"))
    return documents.filter(h28(salt) < F.lit(int(fraction * H28_MAX)))


def stratified_sample_sql(
    strata_col: str, fraction: float, key_col: str = "doc_id"
) -> str:
    h = H28_SQL.format(
        x=f"CAST({strata_col} AS VARCHAR) || '|' || CAST({key_col} AS VARCHAR)"
    )
    return f"SELECT * FROM documents WHERE ({h}) < {int(fraction * H28_MAX)}"


def pack_token_batches(
    documents: DataFrame,
    budget: int = 512,
    n_buckets: int = 32,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget batch packing: whitespace-token counts, documents
    hashed into ``n_buckets`` packing streams, running token totals
    (ordered by key for determinism) cut into batches of ~``budget``
    tokens. Output: ``(doc_id, bucket, batch_id, n_tokens)``.
    """
    toks = F.size(F.split(F.col(text_col), " +"))
    bucket = (h28(F.col(key_col).cast("string")) % n_buckets).cast("int")
    w = (
        Window.partitionBy("bucket")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        documents.select(key_col, bucket.alias("bucket"), toks.alias("n_tokens"))
        .withColumn(
            "batch_id",
            F.floor((F.sum("n_tokens").over(w) - 1) / budget).cast("bigint"),
        )
        .select(key_col, "bucket", "batch_id", "n_tokens")
    )


def pack_token_batches_sql(
    budget: int = 512, n_buckets: int = 32, key_col: str = "doc_id", text_col: str = "text"
) -> str:
    h = H28_SQL.format(x=f"CAST({key_col} AS VARCHAR)")
    return f"""
    WITH base AS (
      SELECT {key_col},
             CAST(({h}) % {n_buckets} AS INT) AS bucket,
             CAST(len(regexp_split_to_array({text_col}, ' +')) AS INT) AS n_tokens
      FROM documents
    )
    SELECT {key_col}, bucket,
           CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY {key_col}
                        ROWS UNBOUNDED PRECEDING) - 1) / {budget}) AS BIGINT) AS batch_id,
           n_tokens
    FROM base
    """


def _budget_case(budgets: dict[str, int], default_budget: int, col: str) -> str:
    whens = " ".join(
        f"WHEN {col} = '{s}' THEN {b}" for s, b in sorted(budgets.items())
    )
    return f"CASE {whens} ELSE {default_budget} END" if whens else str(default_budget)


def corpus_mix(
    documents: DataFrame,
    budgets: dict[str, int] | None = None,
    default_budget: int = 700,
    n_buckets: int = 32,
    key_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    tokens_col=None,
) -> DataFrame:
    """Per-source token budgeting — the corpus "mixing" step of a
    training-data pipeline (fix the contribution of each source to the
    final corpus, e.g. 60% web / 30% books / 10% code): each source's
    documents are taken in a deterministic hash order until that
    source's cumulative whitespace-token count reaches its budget; the
    rest are cut.

    A per-source ordered cumulative sum is the inherently sequential
    part, and a single window per source is the 100 TB trap: one
    source IS most of a real corpus, so PARTITION BY source puts ~all
    rows in one task. This plan decomposes it (the same two-phase
    prefix sum the zonal pixel ranks use): documents hash into
    ``n_buckets`` sub-streams per source, the running sum is windowed
    per (source, bucket) — bounded partitions, parallel across buckets
    — and bucket-level totals (sources x buckets rows, tiny) are
    prefix-summed per source and broadcast back as offsets. The global
    take-order is therefore (bucket, order-hash, key) within source —
    deterministic and replayed exactly by the single-window oracle.

    Output: the KEPT rows as ``(doc_id, source, n_tokens,
    cum_tokens)`` where cum_tokens is the source's exact running total
    including this document (<= budget).
    """
    budgets = budgets or {}
    # tokens_col: the document-weight column, default whitespace tokens;
    # operators/tokenize.py passes its subword-count fold here so
    # budgets can be denominated in model tokens (corpus_mix_bpe)
    weight = (
        tokens_col
        if tokens_col is not None
        else F.size(F.split(F.col(text_col), " +"))
    )
    base = documents.select(
        F.col(key_col),
        F.col(source_col).alias("source"),
        weight.cast("bigint").alias("n_tokens"),
        (h28(F.col(key_col).cast("string")) % n_buckets).cast("int").alias("bucket"),
        h28(
            F.concat_ws(
                "|", F.col(source_col).cast("string"), F.col(key_col).cast("string")
            )
        ).alias("ord"),
    )
    # Explicit join-key null filters (no-op on results: the inner join
    # on (source, bucket) below drops null-keyed rows either way).
    # Placed HERE so both join branches inherit them at the same plan
    # position: the join's own inferred isnotnull(bucket) cannot push
    # through the offsets window (bucket is an ORDER column of w_off,
    # not a partition key), which left the two exchange subtrees
    # differing by one scan filter and defeated ReusedExchange.
    base = base.filter(F.col("source").isNotNull() & F.col("bucket").isNotNull())
    w_local = (
        Window.partitionBy("source", "bucket")
        .orderBy("ord", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("local_cum", F.sum("n_tokens").over(w_local))
    w_off = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # Bucket totals DERIVED FROM THE WINDOW OUTPUT (optimization r15,
    # guide §2.4): n_tokens is non-negative (a token count), so the
    # running sum is non-decreasing and MAX(local_cum) per
    # (source, bucket) IS the bucket total the old plan recomputed with
    # its own groupBy over a second scan of the corpus — which also
    # re-evaluated the weight column (for corpus_mix_bpe, the
    # subword-encode fold over every document — the most expensive
    # expression in the family) a second time. Both consumers now share
    # one identical Exchange→Sort→Window subtree, which the planner
    # collapses via ReusedExchange: ONE scan, ONE weight evaluation,
    # ONE wide shuffle; the offsets branch re-runs only the sort+window
    # over the reused shuffle output before aggregating to
    # (sources × buckets) rows.
    offsets = (
        local.groupBy("source", "bucket")
        .agg(F.max("local_cum").alias("btot"))
        .withColumn("offset", F.coalesce(F.sum("btot").over(w_off), F.lit(0)))
        .select("source", "bucket", "offset")
    )
    budget = F.expr(_budget_case(budgets, default_budget, "source"))
    return (
        local.join(F.broadcast(offsets), ["source", "bucket"])
        .withColumn("cum_tokens", (F.col("offset") + F.col("local_cum")).cast("bigint"))
        .filter(F.col("cum_tokens") <= budget)
        .select(key_col, "source", "n_tokens", "cum_tokens")
    )


def corpus_mix_sql(
    budgets: dict[str, int] | None = None,
    default_budget: int = 700,
    n_buckets: int = 32,
    key_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> str:
    """DuckDB twin: ONE window per source over the same deterministic
    take-order (bucket, order-hash, key) — semantically identical to
    the decomposed two-phase Spark plan."""
    budgets = budgets or {}
    hb = H28_SQL.format(x=f"CAST({key_col} AS VARCHAR)")
    ho = H28_SQL.format(
        x=f"CAST({source_col} AS VARCHAR) || '|' || CAST({key_col} AS VARCHAR)"
    )
    return f"""
    WITH base AS (
      SELECT {key_col},
             {source_col} AS source,
             CAST(len(regexp_split_to_array({text_col}, ' +')) AS BIGINT) AS n_tokens,
             CAST(({hb}) % {n_buckets} AS INT) AS bucket,
             ({ho}) AS ord
      FROM documents
    ),
    cum AS (
      SELECT {key_col}, source, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source
                    ORDER BY bucket, ord, {key_col}
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM base
    )
    SELECT {key_col}, source, n_tokens, cum_tokens
    FROM cum
    WHERE cum_tokens <= ({_budget_case(budgets, default_budget, 'source')})
    """


def epoch_shuffle(
    documents: DataFrame,
    epoch: int = 0,
    n_buckets: int = 64,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic epoch-seeded global shuffle order for training:
    every row gets a dense position ``pos`` in a pseudo-random
    permutation that is a pure function of (epoch, key) — re-runnable
    on any cluster, any partitioning, and computable for epoch N+1
    while epoch N is still being consumed.

    The scalable construction (no single-partition global sort):
    1. shuffle key = h28('ep<epoch>|' || key); bucket = skey % n_buckets;
    2. bucket row-counts -> cumulative offsets (an ``n_buckets``-row
       frame: the only ordered window runs over that CONSTANT-size
       frame, then broadcasts — the pack_token_batches discipline);
    3. within-bucket rank (window partitioned BY bucket, parallel
       across buckets) + broadcast offset = global position.

    Global order is (bucket, skey, key); a training loader reads
    bucket files in order — ``bucket`` is the file-level granularity a
    100 TB epoch is actually laid out in.

    Output: ``(key_col, bucket INT, pos BIGINT)`` with pos in
    [0, n) dense.
    """
    skey = h28(F.concat(F.lit(f"ep{epoch}|"), F.col(key_col).cast("string")))
    base = documents.select(
        key_col,
        skey.alias("skey"),
        (skey % n_buckets).cast("int").alias("bucket"),
    )
    counts = base.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "bucket",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).cast("bigint").alias("off"),
    )
    w_in = Window.partitionBy("bucket").orderBy("skey", key_col)
    return (
        base.join(F.broadcast(offsets), "bucket")
        .select(
            key_col,
            "bucket",
            (F.row_number().over(w_in) - 1 + F.col("off")).cast("bigint").alias("pos"),
        )
    )


def epoch_shuffle_sql(
    epoch: int = 0, n_buckets: int = 64, key_col: str = "doc_id"
) -> str:
    """DuckDB twin: one global ROW_NUMBER over (bucket, skey, key) —
    the order the two-phase Spark plan reproduces without a global
    sort."""
    h = H28_SQL.format(x=f"'ep{epoch}|' || CAST({key_col} AS VARCHAR)")
    return f"""
    WITH base AS (
      SELECT {key_col}, ({h}) AS skey,
             CAST(({h}) % {n_buckets} AS INT) AS bucket
      FROM documents
    )
    SELECT {key_col}, bucket,
           CAST(ROW_NUMBER() OVER (ORDER BY bucket, skey, {key_col}) - 1 AS BIGINT) AS pos
    FROM base
    """


# ---------------------------------------------------------------------------
# Round 11: grouped top-p ("nucleus") selection and the
# decontamination-aware corpus mix (r10 verdict #8 stretch).
# ---------------------------------------------------------------------------

def nucleus_topp_sample(
    documents: DataFrame,
    p_pct: int = 60,
    band_width: int = 16,
    key_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Grouped top-p ("nucleus") selection: within each group, rank
    documents by weight (exact whitespace token count — the stand-in
    for a quality/probability score, same stub policy as
    ``classifier_score``) and keep the SMALLEST top-ranked prefix
    whose cumulative weight reaches ``p_pct`` percent of the group
    total — the nucleus-sampling support-set rule (Holtzman et al.
    2020) applied to corpus curation: keep each source's densest
    documents until p of its mass is covered, cut the tail.

    A row is kept iff the cumulative weight STRICTLY BEFORE it is
    < p/100 x group_total — so the row that crosses the threshold is
    included (the standard nucleus rule) and the comparison
    ``100 * prev_cum < p_pct * total`` is all-BIGINT, hash-exact
    cross-engine.

    100 TB shape: "order by weight desc within group then prefix-sum"
    is the corpus_mix single-window trap (one group IS most of a real
    corpus). Same cure, adapted to a VALUE order instead of a hash
    order: documents band into ``weight DIV band_width`` descending
    weight bands, the running sum windows per (group, band) — bounded
    partitions, parallel across bands — and band totals (a tiny
    groups x bands frame) prefix-sum per group and broadcast back as
    offsets. Take-order (band desc, weight desc, key) is total and
    deterministic, replayed exactly by the one-window oracle.

    Output: kept rows ``(doc_id, source, weight, cum_weight)``.
    """
    base = documents.select(
        F.col(key_col),
        F.col(group_col).alias("source"),
        F.size(F.split(F.col(text_col), " +")).cast("bigint").alias("weight"),
    ).withColumn("band", (F.col("weight") / band_width).cast("bigint"))
    w_local = (
        Window.partitionBy("source", "band")
        .orderBy(F.col("weight").desc(), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("local_cum", F.sum("weight").over(w_local))
    w_off = (
        Window.partitionBy("source")
        .orderBy(F.col("band").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    band_tot = (
        base.groupBy("source", "band")
        .agg(F.sum("weight").alias("btot"))
        .withColumn("offset", F.coalesce(F.sum("btot").over(w_off), F.lit(0)))
    )
    totals = base.groupBy("source").agg(F.sum("weight").alias("gtot"))
    return (
        local.join(F.broadcast(band_tot.select("source", "band", "offset")),
                   ["source", "band"])
        .join(F.broadcast(totals), "source")
        .withColumn("cum_weight", (F.col("offset") + F.col("local_cum")).cast("bigint"))
        .filter(
            F.lit(100) * (F.col("cum_weight") - F.col("weight"))
            < F.lit(int(p_pct)) * F.col("gtot")
        )
        .select(key_col, "source", "weight", "cum_weight")
    )


def nucleus_topp_sample_sql(
    p_pct: int = 60,
    band_width: int = 16,
    key_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    table: str = "documents",
) -> str:
    """DuckDB twin: ONE window per group over the identical total
    order (band desc, weight desc, key)."""
    return f"""
    WITH base AS (
      SELECT {key_col},
             {group_col} AS source,
             CAST(len(regexp_split_to_array({text_col}, ' +')) AS BIGINT) AS weight
      FROM {table}
    ),
    cum AS (
      SELECT {key_col}, source, weight,
             CAST(SUM(weight) OVER (PARTITION BY source
                    ORDER BY weight // {band_width} DESC, weight DESC, {key_col}
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_weight,
             SUM(weight) OVER (PARTITION BY source) AS gtot
      FROM base
    )
    SELECT {key_col}, source, weight, cum_weight
    FROM cum
    WHERE 100 * (cum_weight - weight) < {int(p_pct)} * gtot
    """


#: rolling-hash modulus: keys stay < 2^40, so acc*31 + x < 2^45 —
#: exact in BIGINT in both engines (DuckDB errors on real overflow)
GRAM_MOD = 1 << 40


def _word_hashes(text_col):
    """Per-word h28 list. MUST be materialized as its own projection
    column before ``_gram_fold`` references it: higher-order-function
    lambdas get no common-subexpression elimination, so inlining this
    expression into the per-gram fold re-evaluates EVERY word's md5
    for EVERY gram — O(len²) md5s per document (measured: the inlined
    form ran >15 min at the 100x replica; the materialized column
    ~seconds)."""
    return F.transform(
        F.split(text_col, " "),
        lambda w: F.conv(F.substring(F.md5(w), 1, 7), 16, 10).cast("bigint"),
    )


def _gram_fold(wh_col, n: int):
    """Array of rolling-hash keys over a PRE-MATERIALIZED word-hash
    column: each n-window folds left-to-right as
    ``acc*31 + wh (mod 2^40)`` — integer math only, no per-gram
    string allocation. Short docs yield an empty array (the
    ``sequence(1, 0) == [1, 0]`` guard of ``_ngram_strings``)."""
    k = F.size(wh_col) - F.lit(n - 1)
    fold = lambda i: F.aggregate(  # noqa: E731
        F.slice(wh_col, i, n),
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * 31 + x) % GRAM_MOD,
    )
    return F.when(k >= 1, F.transform(F.sequence(F.lit(1), k), fold)).otherwise(
        F.array().cast("array<bigint>")
    )


def _gram_hashes_sql(wh: str, n: int) -> str:
    """DuckDB twin of ``_gram_hashes`` over a PRE-HASHED word-hash
    list column ``wh`` (hash the words in an earlier CTE — inlining
    the word-hash transform here would re-evaluate it per gram,
    O(len²) md5s per document)."""
    span = n - 1
    return (
        f"list_transform(range(1, greatest(len({wh}) - {span}, 0) + 1), "
        f"i -> list_reduce(list_prepend(CAST(0 AS BIGINT), {wh}[i:i+{span}]), "
        f"(acc, v) -> (acc * 31 + v) % {GRAM_MOD}))"
    )


def decontaminated_mix(
    documents: DataFrame,
    bench_mod: int = 101,
    bench_rem: int = 7,
    ngram_n: int = 13,
    budgets: dict[str, int] | None = None,
    default_budget: int = 700,
    n_buckets: int = 32,
) -> DataFrame:
    """The decontamination-aware corpus mix — the two curation stages a
    real pretraining pipeline runs as ONE pass over the corpus drop:

    1. DECONTAMINATE: drop every training document sharing any
       verbatim word ``ngram_n``-gram with the held-out benchmark set
       (the deterministic ``doc_id % bench_mod = bench_rem`` slice —
       the GPT-3 App. C rule, reusing ``contamination_check``'s
       broadcast n-gram probe), and drop the benchmark rows themselves
       (eval data must never enter the training mix).
    2. MIX: apply the per-source token budgets (``corpus_mix``'s
       decomposed two-phase prefix sum) over the SURVIVORS only, so a
       source's budget is filled with clean documents instead of being
       consumed by rows a later decontamination pass would delete —
       the ordering bug this fused operator exists to prevent.

    Same scale shape as its parts: one broadcast of the benchmark
    n-gram set, one corpus scan, the bounded per-(source, bucket)
    windows — nothing new shuffles. Output: ``corpus_mix`` columns
    over the decontaminated survivor set.
    """
    is_bench = (F.col("doc_id") % bench_mod) == bench_rem
    # Two measured optimizations over the naive contamination wiring
    # (40 s -> ~13 s at the 100x replica):
    # - the mix needs only the PREDICATE "shares any n-gram with the
    #   benchmark", not per-doc hit COUNTS — a semi-join to the dirty
    #   id set + an anti-join, no count aggregation over every
    #   (doc, gram) row;
    # - grams are matched as ROLLING HASHES, not materialized strings
    #   (hash-based n-gram decontamination is what production
    #   pipelines run): hash each word once (md5-derived h28, the
    #   repo's cross-engine recipe), then fold each 13-word window to
    #   one BIGINT inside codegen — no 13x-corpus string allocation.
    #   Both engines compute the IDENTICAL key function, so the (rare,
    #   deterministic) hash-collision false-dirties are mirrored and
    #   the survivor sets stay hash-equal.
    hashed = documents.select(
        "doc_id", _word_hashes(F.col("text")).alias("wh")
    ).select("doc_id", F.explode(_gram_fold(F.col("wh"), ngram_n)).alias("ng"))
    bench_grams = hashed.filter(is_bench).select("ng").distinct()
    dirty = (
        hashed.filter(~is_bench)
        .join(F.broadcast(bench_grams), "ng", "semi")
        .select("doc_id")
        .distinct()
    )
    survivors = documents.filter(~is_bench).join(dirty, "doc_id", "anti")
    return corpus_mix(
        survivors,
        budgets=budgets,
        default_budget=default_budget,
        n_buckets=n_buckets,
    )


def decontaminated_mix_disk(
    spark,
    sf_dir: str,
    bench_mod: int = 101,
    bench_rem: int = 7,
    ngram_n: int = 13,
    budgets: dict[str, int] | None = None,
    default_budget: int = 700,
    n_buckets: int = 32,
) -> DataFrame:
    """``decontaminated_mix`` served from INGEST-TIME decontamination
    artifacts (r11 verdict #4: the row entered at 5.16×, was optimized
    to 2.42×, and the remaining cost is the per-run corpus-wide 13-gram
    scan — which a real pipeline runs ONCE per (corpus, benchmark),
    not per mix). Two artifacts go through the durable index store,
    fingerprinted on the corpus like every other index:

    - ``decontam_bench_grams``: the benchmark slice's distinct rolling
      13-gram hashes — the set a crawl pipeline probes every NEW drop
      against at its ingest;
    - ``decontam_dirty_ids``: the accumulated contaminated doc_id set
      for the standing corpus (the result of that probe).

    The per-run mix is then SURVIVOR-side only: one anti-join of the
    corpus against the small dirty-id table (AQE broadcasts it — the
    set's size is the contamination rate, not the corpus) and the
    bounded per-(source, bucket) prefix-sum windows of ``corpus_mix``.
    No gram is hashed at serve time. Results are identical to the
    fused single-pass plan, so the same DuckDB oracle hash-gates it;
    the exact leg stays registered as ``sampling_decontaminated_mix``
    (the bm25_topk / bm25_disk_topk convention)."""
    from mmw_geoprocessing_spark.sources.index_store import (
        corpus_fingerprint,
        get_or_build_index,
    )
    from mmw_geoprocessing_spark.sources.tables import load_table

    fp = corpus_fingerprint(sf_dir, "documents")
    is_bench = (F.col("doc_id") % bench_mod) == bench_rem

    def _hashed() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return docs.select(
            "doc_id", _word_hashes(F.col("text")).alias("wh")
        ).select("doc_id", F.explode(_gram_fold(F.col("wh"), ngram_n)).alias("ng"))

    def _bench_grams() -> DataFrame:
        return _hashed().filter(is_bench).select("ng").distinct()

    bench_grams = get_or_build_index(
        spark, f"decontam_bench_grams_n{ngram_n}", fp, _bench_grams
    )

    def _dirty() -> DataFrame:
        return (
            _hashed()
            .filter(~is_bench)
            .join(F.broadcast(bench_grams), "ng", "semi")
            .select("doc_id")
            .distinct()
        )

    dirty = get_or_build_index(spark, f"decontam_dirty_ids_n{ngram_n}", fp, _dirty)
    docs = load_table(spark, sf_dir, "documents")
    survivors = docs.filter(~is_bench).join(dirty, "doc_id", "anti")
    return corpus_mix(
        survivors,
        budgets=budgets,
        default_budget=default_budget,
        n_buckets=n_buckets,
    )


def decontaminated_mix_disk_sql(
    bench_mod: int = 101,
    bench_rem: int = 7,
    ngram_n: int = 13,
    budgets: dict[str, int] | None = None,
    default_budget: int = 700,
    n_buckets: int = 32,
) -> str:
    """Identical results -> the same oracle as the fused plan."""
    return decontaminated_mix_sql(
        bench_mod=bench_mod,
        bench_rem=bench_rem,
        ngram_n=ngram_n,
        budgets=budgets,
        default_budget=default_budget,
        n_buckets=n_buckets,
    )


def decontaminated_mix_sql(
    bench_mod: int = 101,
    bench_rem: int = 7,
    ngram_n: int = 13,
    budgets: dict[str, int] | None = None,
    default_budget: int = 700,
    n_buckets: int = 32,
) -> str:
    """DuckDB twin: contamination CTE -> survivor set -> the one-window
    corpus_mix over it."""
    budgets = budgets or {}
    grams = _gram_hashes_sql("wh", ngram_n)
    whash = H28_SQL.format(x="w")
    hb = H28_SQL.format(x="CAST(doc_id AS VARCHAR)")
    ho = H28_SQL.format(x="CAST(source AS VARCHAR) || '|' || CAST(doc_id AS VARCHAR)")
    return f"""
    WITH dw AS (
        SELECT doc_id,
               list_transform(string_split(text, ' '), w -> {whash}) AS wh
        FROM documents
    ),
    bg AS MATERIALIZED (
        SELECT DISTINCT unnest({grams}) AS ng
        FROM dw WHERE doc_id % {bench_mod} = {bench_rem}
    ),
    hits AS (
        SELECT DISTINCT dg.doc_id
        FROM (SELECT doc_id, unnest({grams}) AS ng FROM dw
              WHERE doc_id % {bench_mod} <> {bench_rem}) dg
        JOIN bg ON dg.ng = bg.ng
    ),
    survivors AS (
        SELECT d.* FROM documents d
        WHERE d.doc_id % {bench_mod} <> {bench_rem}
          AND d.doc_id NOT IN (SELECT doc_id FROM hits)
    ),
    base AS (
      SELECT doc_id,
             source,
             CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT) AS n_tokens,
             CAST(({hb}) % {n_buckets} AS INT) AS bucket,
             ({ho}) AS ord
      FROM survivors
    ),
    cum AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source
                    ORDER BY bucket, ord, doc_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM base
    )
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM cum
    WHERE cum_tokens <= ({_budget_case(budgets, default_budget, 'source')})
    """
