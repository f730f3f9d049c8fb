"""Salted skew join (operators/skew.py) and streaming sessionization
(streaming/windows.py stream_sessionize): oracle hash-match plus the
plan/semantics properties each exists to demonstrate."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.operators import skew as sk
from mmw_geoprocessing_spark.streaming import windows as sw


def _match(spark_df, duck, sql, sort_cols):
    a = spark_df.toPandas()
    b = duck.execute(sql).df()
    cols = sorted(b.columns)
    a = a[cols].sort_values(sort_cols).reset_index(drop=True)
    b = b[cols].sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_skew_join_salted_matches_plain_join_oracle(spark, tables, duck):
    out = sk.skew_join_salted(tables["orders"], tables["customer"])
    _match(out, duck, sk.skew_join_salted_sql(), ["c_mktsegment"])


def test_skew_join_plan_is_salted_shuffle(spark, tables):
    """The demonstration: fact side exchanges on (key, salt) — the hot
    key spreads over N_SALTS reducers — and no broadcast collapses it."""
    out = sk.skew_join_salted(tables["orders"], tables["customer"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    import re

    fact_ex = [
        l for l in plan.splitlines() if "hashpartitioning(cust_k" in l
    ]
    assert fact_ex and all("salt" in l for l in fact_ex)


def test_skew_join_hot_key_spreads_over_salts(spark, tables):
    """Every salt bucket of the hot key is non-empty (uniform h28 over
    o_orderkey), so the hot key's rows really do land on N_SALTS
    reducers."""
    fact = sk._skewed_fact(tables["orders"]).withColumn(
        "salt",
        (sk.h28(F.col("o_orderkey").cast("string")) % sk.N_SALTS).cast("int"),
    )
    hot = fact.filter(F.col("cust_k") == sk.HOT_KEY)
    per_salt = hot.groupBy("salt").count().collect()
    assert len(per_salt) == sk.N_SALTS
    counts = [r["count"] for r in per_salt]
    assert min(counts) > 0 and max(counts) < 3 * min(counts)


def test_stream_sessionize_matches_batch_oracle(spark, tables, duck):
    out = sw.stream_sessionize_batch(spark, "/root/testdata/sf0.001")
    _match(out, duck, sw.stream_sessionize_batch_sql(), ["user_id", "session_start"])


def test_stream_sessionize_no_sentinel_leak(spark):
    out = sw.stream_sessionize_batch(spark, "/root/testdata/sf0.001")
    assert out.filter(F.col("user_id") < 0).count() == 0


def test_stream_stateful_counts_matches_oracle(spark, tables, duck):
    out = sw.stream_stateful_counts_batch(spark, "/root/testdata/sf0.001")
    _match(out, duck, sw.stream_stateful_counts_batch_sql(), ["user_id"])


def test_python_datasource_ledger_matches_oracle(spark, duck):
    from mmw_geoprocessing_spark.sources import pysource as ps

    out = ps.ledger_account_rollup(spark)
    _match(out, duck, ps.ledger_account_rollup_sql(), ["account", "kind"])


def test_python_datasource_plans_parallel_partitions(spark):
    from mmw_geoprocessing_spark.sources import pysource as ps

    ps.register(spark)
    df = (
        spark.read.format(ps.SOURCE_NAME)
        .option("n_rows", "1000")
        .option("n_parts", "5")
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 1000


def test_python_datasource_stream_matches_oracle(spark, duck):
    from mmw_geoprocessing_spark.sources import pysource as ps

    out = ps.ledger_stream_rollup(spark)
    _match(out, duck, ps.ledger_stream_rollup_sql(), ["account", "kind"])
