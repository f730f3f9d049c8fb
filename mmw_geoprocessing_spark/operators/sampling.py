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
    base = documents.select(
        F.col(key_col),
        F.col(source_col).alias("source"),
        F.size(F.split(F.col(text_col), " +")).cast("bigint").alias("n_tokens"),
        (h28(F.col(key_col).cast("string")) % n_buckets).cast("int").alias("bucket"),
        h28(
            F.concat_ws(
                "|", F.col(source_col).cast("string"), F.col(key_col).cast("string")
            )
        ).alias("ord"),
    )
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
    offsets = (
        base.groupBy("source", "bucket")
        .agg(F.sum("n_tokens").alias("btot"))
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
