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
