"""One-pass table profiler: oracle parity, null handling, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from mmw_geoprocessing_spark.operators import profile as P


def test_profile_matches_duckdb(spark, tables, duck):
    got = {tuple(r) for r in P.table_profile(tables["documents"]).collect()}
    want = {tuple(r) for r in duck.execute(P.table_profile_sql()).fetchall()}
    assert got == want
    assert len(got) == len(P.PROFILE_COLS)


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "bb")],
        "k long, s string",
    )
    rows = {r["col"]: r for r in P.table_profile(df, cols=("k", "s")).collect()}
    assert rows["k"]["n"] == 4 and rows["k"]["n_null"] == 1
    assert rows["k"]["n_distinct"] == 3
    assert rows["s"]["n_null"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["s"]["sum_len"] == 1 + 1 + 2
    assert rows["s"]["min_len"] == 1 and rows["s"]["max_len"] == 2


def test_profile_all_null_column_is_zeroed(spark):
    df = spark.createDataFrame([(1,), (2,)], "k long").withColumn(
        "z", F.lit(None).cast("string")
    )
    row = {r["col"]: r for r in P.table_profile(df, cols=("z",)).collect()}["z"]
    assert row["n_null"] == 2 and row["n_distinct"] == 0
    assert row["sum_len"] == 0 and row["min_len"] == 0 and row["max_len"] == 0


def test_profile_single_pass_plan(spark, tables):
    """Exact mode: ONE scan of the table (Expand-based multi-distinct),
    not a job per column; approx mode: no Expand at all."""
    exact_plan = P.table_profile(tables["documents"])._jdf.queryExecution().executedPlan().toString()
    assert exact_plan.count("Scan parquet") <= 1
    assert "Expand" in exact_plan
    approx_plan = P.table_profile(tables["documents"], exact=False)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in approx_plan
    assert approx_plan.count("Scan parquet") <= 1
