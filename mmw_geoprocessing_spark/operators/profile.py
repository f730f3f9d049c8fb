"""One-pass table profiling: per-column completeness / cardinality /
length statistics — the first query any data-quality pipeline runs
against a new 100 TB drop, and the input to the curation gates
(operators/text_analysis.py quality scores, pipelines.curate_corpus).

The reference has no profiling surface (its inputs are fixed-schema
rasters, SURVEY.md §1.2); this extends the engine the same way the
text-analysis family does.

Shape: ONE aggregate pass over the table computing, for every profiled
column, ``count / null-count / exact distinct / sum / min / max of the
string-rendered length`` — then a 1-row explode into the per-column
result rows. Exact multi-column DISTINCT in a single pass uses Spark's
Expand (each input row fans out once per column, each fan-out
partially aggregated map-side before the shuffle): one scan, M×
map-side rows, no per-column jobs. At 100 TB the exact-distinct
expand is the dominant cost, so ``exact=False`` swaps in
``approx_count_distinct`` (HyperLogLog++, relativeSD 0.01) — a plain
single aggregate with NO expand; the registry/oracle face runs exact
because the driver gate hash-compares values, and an HLL estimate is
engine-specific by construction.

Length is measured on the string rendering (``CAST(col AS STRING)``)
so one schema covers numeric and text columns; BIGINT renderings are
digit-identical across Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def table_profile(
    df: DataFrame, cols: tuple[str, ...] = PROFILE_COLS, exact: bool = True
) -> DataFrame:
    """Profile ``cols`` in one aggregate pass.

    Output: one row per column —
    ``(col STRING, n BIGINT, n_null BIGINT, n_distinct BIGINT,
       sum_len BIGINT, min_len BIGINT, max_len BIGINT)``.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        ln = F.length(F.col(c).cast("string"))
        distinct = (
            F.countDistinct(F.col(c))
            if exact
            else F.approx_count_distinct(F.col(c), 0.01)
        )
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            distinct.alias(f"_nd_{c}"),
            F.coalesce(F.sum(ln), F.lit(0)).cast("bigint").alias(f"_sl_{c}"),
            F.coalesce(F.min(ln), F.lit(0)).cast("bigint").alias(f"_mn_{c}"),
            F.coalesce(F.max(ln), F.lit(0)).cast("bigint").alias(f"_mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col("_n").cast("bigint").alias("n"),
                (F.col("_n") - F.col(f"_nn_{c}")).cast("bigint").alias("n_null"),
                F.col(f"_nd_{c}").cast("bigint").alias("n_distinct"),
                F.col(f"_sl_{c}").alias("sum_len"),
                F.col(f"_mn_{c}").alias("min_len"),
                F.col(f"_mx_{c}").alias("max_len"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


def table_profile_sql(
    table: str = "documents", cols: tuple[str, ...] = PROFILE_COLS
) -> str:
    """DuckDB twin: a UNION ALL of per-column aggregates (DuckDB plans
    its own shared-scan grouping; the contract is the RESULT, not the
    pass count)."""
    parts = []
    for c in cols:
        ln = f"length(CAST({c} AS VARCHAR))"
        parts.append(
            f"""
    SELECT '{c}' AS col,
           COUNT(*) AS n,
           COUNT(*) - COUNT({c}) AS n_null,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(COALESCE(SUM({ln}), 0) AS BIGINT) AS sum_len,
           CAST(COALESCE(MIN({ln}), 0) AS BIGINT) AS min_len,
           CAST(COALESCE(MAX({ln}), 0) AS BIGINT) AS max_len
    FROM {table}
    """
        )
    return " UNION ALL ".join(parts)
