"""Bucketed-layout contract (SCALE.md): pixel tables stored bucketed +
sorted on the pixel key join WITHOUT a shuffle — the exchange-free layer
join the 100 TB design relies on. Demonstrated, not just documented:
the bucketed full-outer join plan must contain ZERO Exchange operators.

Two planner facts this pins (found by measurement):
- buckets must be on ALL FOUR pixel-key columns: Spark v1 bucketing
  only lines up with a join whose keys equal the bucket keys;
- ``spark.sql.sources.bucketing.autoBucketedScan.enabled`` must be off
  for this shape — the auto rule mis-classifies the bucketed scan as
  unnecessary and re-shuffles.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.sources import fixtures as fx

BUCKET_PATH = "/tmp/spark_graft_bucketed"
KEY = ["key_col", "key_row", "cell_col", "cell_row"]


@pytest.fixture(scope="module")
def bucketed_tables(spark, tables):
    """Write nlcd + soil pixel tables bucketed by the full pixel key
    (external tables under /tmp, so no warehouse config is needed)."""
    shutil.rmtree(BUCKET_PATH, ignore_errors=True)
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    names = []
    for rid in ("nlcd", "soil"):
        name = f"bkt_{rid}"
        (
            fx.raster_df(spark, rid)
            .write.bucketBy(8, *KEY)
            .sortBy(*KEY)
            .option("path", f"{BUCKET_PATH}/{name}")
            .mode("overwrite")
            .saveAsTable(name)
        )
        names.append(name)
    yield names
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
    shutil.rmtree(BUCKET_PATH, ignore_errors=True)


def test_bucketed_layer_join_has_no_exchange(spark, bucketed_tables):
    """Joining two co-bucketed pixel tables on the pixel key must plan
    with ZERO Exchange operators — the exchange-free layer join."""
    a, b = (spark.table(n) for n in bucketed_tables)
    joined = a.join(b, on=KEY, how="full")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert plan.count("Bucketed: true") == 2
    # sanity: the join actually runs and preserves the key-union contract
    n_a, n_b, n_j = a.count(), b.count(), joined.count()
    assert n_j >= max(n_a, n_b)


def test_unbucketed_join_needs_exchange_control(spark, tables):
    """Control: the same join over non-bucketed (checkpointed) fixtures
    DOES shuffle — proving the bucketed layout is what removes it."""
    a = fx.raster_df(spark, "nlcd")
    b = fx.raster_df(spark, "soil")
    joined = a.join(b, on=KEY, how="full")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan


def test_bucketed_mode_flip_restores_auto_bucketed_scan_conf(spark, tables, monkeypatch):
    """Entering bucketed-fixture mode flips autoBucketedScan off for the
    session; clear_fixture_cache() must restore the pre-mode value, so a
    long-lived session that toggles modes is left exactly as found."""
    conf_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    spark.conf.set(conf_key, "true")
    fx.clear_fixture_cache()  # fresh mode state
    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_FIXTURES", "1")
    try:
        fx.raster_df(spark, "nlcd")  # enters bucketed mode -> conf off
        assert spark.conf.get(conf_key) == "false"
        fx.clear_fixture_cache()  # exits mode -> conf restored
        assert spark.conf.get(conf_key) == "true"
    finally:
        monkeypatch.delenv("SPARK_GRAFT_BUCKETED_FIXTURES", raising=False)
        fx.clear_fixture_cache()
        spark.conf.unset(conf_key)


def test_bucketed_aggregation_avoids_exchange_on_bucket_keys(spark, bucketed_tables):
    """Aggregation grouped by the full bucket key also plans without a
    shuffle (map-side-complete aggregation over co-located buckets)."""
    a = spark.table(bucketed_tables[0])
    agg = a.groupBy(*KEY).agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert agg.count() > 0


def test_bucketed_fixture_reattaches_from_disk(spark, tables, monkeypatch):
    """A bucketed fixture written by a previous PROCESS (simulated by
    dropping the catalog entry, which keeps the external files) is
    re-attached via CLUSTERED BY DDL instead of re-derived, and the
    re-attached table still joins Exchange-free with identical rows."""
    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_FIXTURES", "1")
    fx.clear_fixture_cache()
    try:
        before = fx.raster_df(spark, "nlcd")
        tbl = [t.name for t in spark.catalog.listTables() if t.name.endswith("_r_nlcd")]
        assert tbl, "bucketed table registered"
        want = before.count()
        spark.sql(f"DROP TABLE {tbl[0]}")  # external: files survive
        fx.clear_fixture_cache()
        import os.path

        import mmw_geoprocessing_spark.sources.fixtures as fxmod

        assert os.path.exists(f"{fxmod._BUCKET_DIR}/{tbl[0]}/_SUCCESS")
        monkeypatch.setenv("SPARK_GRAFT_BUCKETED_FIXTURES", "1")
        after = fx.raster_df(spark, "nlcd")
        assert after.count() == want
        joined = after.join(fx.raster_df(spark, "soil"), on=KEY, how="full")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
    finally:
        monkeypatch.delenv("SPARK_GRAFT_BUCKETED_FIXTURES", raising=False)
        fx.clear_fixture_cache()


# ------------------------------------------------ TPC-H bucketed joins
# (round 10 final: the BASELINE.md TPC-H table's recorded follow-up,
# exercised — bucketing orders/lineitem on orderkey removes the join
# exchanges that are the q3/q10/q18 scan+shuffle floor at sf10)


def test_bucketed_orderkey_join_is_exchange_free(spark, tables):
    import pyspark.sql.functions as F

    from mmw_geoprocessing_spark.operators.relational import _sum_money

    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # DROP only clears the catalog entry; a stale managed-table dir
    # from an earlier session still blocks saveAsTable
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    (
        tables["orders"].write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    )
    (
        tables["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").mode("overwrite").saveAsTable("b_lineitem")
    )
    bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # the q3/q10 fact-fact core: orderkey join + grouped money agg.
    # Disable broadcast so the plan must rely on bucket co-location
    # (at sf10 neither side is broadcastable — that is the scenario
    # this layout exists for).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            bo.filter(F.col("o_orderdate") < F.lit("1997-01-01"))
            .join(bl, "o_orderkey")
            .groupBy("o_orderkey", "o_orderpriority")
            .agg(_sum_money(rev, 10000).alias("revenue"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketed co-location: the fact-fact join AND the
        # groupBy(o_orderkey, ...) ride the bucket partitioning —
        # zero shuffle exchanges, buckets read as join partitions
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
        joined = joined.localCheckpoint()  # materialize under the conf
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # identical results to the plain-parquet plan
    plain = (
        tables["orders"].filter(F.col("o_orderdate") < F.lit("1997-01-01"))
        .join(
            tables["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"),
            "o_orderkey",
        )
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(_sum_money(rev, 10000).alias("revenue"))
    )
    assert joined.exceptAll(plain).count() == 0
    assert plain.exceptAll(joined).count() == 0
