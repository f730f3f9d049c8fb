"""Declarative data-quality expectations — the Delta Live Tables /
Great Expectations surface: named boolean constraints evaluated in
ONE scan, with three enforcement policies.

At 100 TB the cardinal rule is that quality checking must not add
passes over the data: a constraint suite is a set of boolean columns,
so the annotate step is a pure projection (zero shuffles, inside
whole-stage codegen) and the summary is one partial+final aggregate of
conditional counts. Quarantine ("drop" policy) is a filter on the
same annotated frame — Spark executes annotate+filter in the same
codegen stage as the scan.

Policies (per DLT):
- ``warn``  — keep everything, annotate ``_violations`` per row;
- ``drop``  — split into (clean, quarantine) frames;
- ``fail``  — raise if any violation (the summary agg is the only
  action; a deployment runs it as the gate before publishing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def annotate(df: DataFrame, expectations: dict[str, Column]) -> DataFrame:
    """Add ``_violations: array<string>`` listing the failed
    expectation names per row (empty array = clean). NULL check
    results count as violations (SQL three-valued logic must not let
    a NULL sneak past a gate)."""
    viols = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
                for name, cond in expectations.items()
            ]
        )
    )
    return df.withColumn("_violations", viols)


def split(df: DataFrame, expectations: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """The ``drop`` policy: (clean rows without the marker column,
    quarantined rows with their ``_violations``)."""
    ann = annotate(df, expectations)
    clean = ann.filter(F.size("_violations") == 0).drop("_violations")
    quarantine = ann.filter(F.size("_violations") > 0)
    return clean, quarantine


def summary(df: DataFrame, expectations: dict[str, Column]) -> DataFrame:
    """Per-expectation violation counts in one aggregate:
    ``(expectation, n_violations, n_rows)`` — the publish gate's
    input, and the registered query's output."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, cond in expectations.items():
        aggs.append(
            F.sum(
                F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)
            ).cast("bigint").alias(name)
        )
    row = df.agg(*aggs)
    # unpivot to one row per expectation (stack is a projection)
    names = list(expectations)
    stack_expr = ", ".join(f"'{n}', {n}" for n in names)
    return row.selectExpr(
        "n_rows",
        f"stack({len(names)}, {stack_expr}) AS (expectation, n_violations)",
    ).select("expectation", "n_violations", "n_rows")


def enforce(df: DataFrame, expectations: dict[str, Column]) -> DataFrame:
    """The ``fail`` policy: raise on any violation, else return df."""
    bad = (
        summary(df, expectations)
        .filter(F.col("n_violations") > 0)
        .collect()
    )
    if bad:
        detail = ", ".join(f"{r['expectation']}={r['n_violations']}" for r in bad)
        raise ValueError(f"expectations failed: {detail}")
    return df


# ------------------------------------------------------------------
# Registered suite over orders. Mixed by design: three pass, one
# fails on a real slice (prices above 400k exist in every fixture),
# so both the zero and non-zero count paths are hash-gated.
# ------------------------------------------------------------------

_PRIORITIES = "'1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'"


def orders_expectations() -> dict[str, Column]:
    return {
        "price_positive": F.col("o_totalprice") > 0,
        "price_under_400k": F.col("o_totalprice") < 400_000.0,
        "priority_known": F.col("o_orderpriority").isin(
            [p.strip("'") for p in _PRIORITIES.split(",")]
        ),
        "status_known": F.col("o_orderstatus").isin(["P", "O", "F"]),
        "date_present": F.col("o_orderdate").isNotNull(),
    }


def quality_expectations_orders(orders: DataFrame) -> DataFrame:
    """Registry entry ``quality_expectations``."""
    return summary(orders, orders_expectations())


def quality_expectations_orders_sql(table: str = "orders") -> str:
    checks = {
        "price_positive": "o_totalprice > 0",
        "price_under_400k": "o_totalprice < 400000.0",
        "priority_known": f"o_orderpriority IN ({_PRIORITIES})",
        "status_known": "o_orderstatus IN ('P','O','F')",
        "date_present": "o_orderdate IS NOT NULL",
    }
    arms = "\nUNION ALL\n".join(
        f"SELECT '{n}' AS expectation, "
        f"CAST(SUM(CASE WHEN NOT COALESCE({c}, FALSE) THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_violations, CAST(COUNT(*) AS BIGINT) AS n_rows FROM {table}"
        for n, c in checks.items()
    )
    return arms
