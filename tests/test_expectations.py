"""Data-quality expectations (operators/expectations.py): oracle
match, policy semantics (warn/drop/fail), NULL three-valued-logic
handling, and the one-scan plan shape."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.operators import expectations as ex


def _match(spark_df, duck, sql):
    a = spark_df.toPandas()
    b = duck.execute(sql).df()
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_summary_matches_oracle(spark, tables, duck):
    _match(
        ex.quality_expectations_orders(tables["orders"]), duck,
        ex.quality_expectations_orders_sql(),
    )


def test_summary_has_mixed_outcomes(spark, tables):
    out = {
        r["expectation"]: r["n_violations"]
        for r in ex.quality_expectations_orders(tables["orders"]).collect()
    }
    assert out["price_positive"] == 0
    assert out["price_under_400k"] > 0  # real violations in every fixture


def test_drop_policy_partitions_exactly(spark, tables):
    exp = ex.orders_expectations()
    clean, quarantine = ex.split(tables["orders"], exp)
    n = tables["orders"].count()
    nc, nq = clean.count(), quarantine.count()
    assert nc + nq == n and nq > 0
    # quarantined rows name their failed expectation
    viols = quarantine.select(F.explode("_violations").alias("v")).distinct()
    assert {r["v"] for r in viols.collect()} == {"price_under_400k"}
    # clean frame carries no marker column
    assert "_violations" not in clean.columns


def test_fail_policy_raises_with_detail(spark, tables):
    with pytest.raises(ValueError, match="price_under_400k="):
        ex.enforce(tables["orders"], ex.orders_expectations())
    ok = {"price_positive": F.col("o_totalprice") > 0}
    assert ex.enforce(tables["orders"], ok) is tables["orders"]


def test_null_check_results_are_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -1.0)], "id bigint, v double"
    )
    exp = {"v_positive": F.col("v") > 0}
    out = {r["expectation"]: r["n_violations"]
           for r in ex.summary(df, exp).collect()}
    assert out["v_positive"] == 2  # NULL must not sneak past the gate
    clean, quar = ex.split(df, exp)
    assert clean.count() == 1
    assert sorted(r["id"] for r in quar.collect()) == [2, 3]


def test_annotate_is_zero_shuffle(spark, tables):
    ann = ex.annotate(tables["orders"], ex.orders_expectations())
    plan = ann._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ----------------------------------------------- cogrouped-map as-of
# (here rather than a new module: both are round-10-final surface
# additions sharing the session fixtures)

from mmw_geoprocessing_spark.operators import relational as rel


def test_asof_cogroup_equals_window_twin(spark, tables):
    a = rel.asof_join_cogroup(tables["events"], tables["orders"])
    b = rel.asof_join_events_orders(tables["events"], tables["orders"])
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_asof_cogroup_tie_breaks_to_largest_orderkey(spark):
    ev = spark.createDataFrame(
        [(7, "2024-01-02 00:00:00", 100)],
        "user_id long, ts string, event_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    od = spark.createDataFrame(
        [
            (7, "2024-01-02 00:00:00", 5),   # exact-instant tie ...
            (7, "2024-01-02 00:00:00", 9),   # ... largest key must win
            (7, "2024-01-01 00:00:00", 3),
            (7, "2024-01-03 00:00:00", 11),  # future order: ignored
        ],
        "o_custkey long, o_orderdate string, o_orderkey long",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz"))
    got = rel.asof_join_cogroup(ev, od).collect()
    assert len(got) == 1 and got[0]["o_orderkey"] == 9
    # user with events but no orders: empty, not an error
    od_other = od.withColumn("o_custkey", F.lit(8).cast("long"))
    assert rel.asof_join_cogroup(ev, od_other).count() == 0


def test_expectations_gate_a_stream(spark, tables, tmp_path):
    """The DLT shape proper: expectations enforced INSIDE a streaming
    drain — foreachBatch splits each micro-batch into clean and
    quarantine sinks; the union must equal the source exactly and the
    gate must be airtight on both sides."""
    src = str(tmp_path / "src")
    tables["orders"].repartition(4).write.parquet(src)
    stream = spark.readStream.schema(tables["orders"].schema).parquet(src)
    exp = ex.orders_expectations()
    clean_dir, quar_dir = str(tmp_path / "clean"), str(tmp_path / "quar")

    def sink(batch, _epoch):
        c, q = ex.split(batch, exp)
        c.write.mode("append").parquet(clean_dir)
        q.drop("_violations").write.mode("append").parquet(quar_dir)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    clean = spark.read.parquet(clean_dir)
    quar = spark.read.parquet(quar_dir)
    assert clean.count() + quar.count() == tables["orders"].count()
    assert clean.where(F.col("o_totalprice") >= 400_000).count() == 0
    assert quar.where(F.col("o_totalprice") < 400_000).count() == 0
    both = clean.unionByName(quar)
    assert both.exceptAll(tables["orders"]).count() == 0
    assert tables["orders"].exceptAll(both).count() == 0
