"""Source/sink coverage (SURVEY.md §2.3 scans/sinks rows): parquet,
json, csv write -> read roundtrips preserving values, and partitioned
writes whose partition column prunes at scan."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def _check_roundtrip(spark, df, fmt, path, **read_kwargs):
    getattr(df.write.mode("overwrite"), fmt)(path)
    back = getattr(spark.read, fmt)(path, **read_kwargs)
    assert back.count() == df.count()
    return back


def test_parquet_roundtrip(spark, tables):
    df = tables["nation"]
    back = _check_roundtrip(spark, df, "parquet", tempfile.mkdtemp(prefix="snk_"))
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in df.collect()
    )


def test_json_roundtrip(spark, tables):
    df = tables["region"]
    back = _check_roundtrip(spark, df, "json", tempfile.mkdtemp(prefix="snk_"))
    assert {r.r_name for r in back.collect()} == {r.r_name for r in df.collect()}


def test_csv_roundtrip_with_header(spark, tables):
    df = tables["supplier"].select("s_suppkey", "s_name", "s_acctbal")
    path = tempfile.mkdtemp(prefix="snk_")
    df.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.option("header", True).option("inferSchema", True).csv(path)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)


def test_partitioned_write_prunes_at_scan(spark, tables):
    """partitionBy write -> partition filter must prune, not scan-all:
    the binding contract for bbox-pruned pixel tables at 100 TB."""
    path = tempfile.mkdtemp(prefix="snk_")
    tables["orders"].withColumn("yr", F.year("o_orderdate")).write.mode(
        "overwrite"
    ).partitionBy("yr").parquet(path)
    back = spark.read.parquet(path)
    one_year = back.filter(F.col("yr") == 1995)
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "yr" in plan.split("PartitionFilters")[1][:120]
    assert one_year.count() > 0


def test_orc_roundtrip(spark, tables):
    """ORC source/sink parity (the other columnar format Spark ships)."""
    import tempfile

    df = tables["nation"]
    path = tempfile.mkdtemp(prefix="snk_orc_")
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_bucketed_sink_roundtrip(spark, tables):
    """Bucketed table sink: written spec is honored on read-back
    (companion to tests/test_bucketing.py's plan assertions)."""
    import shutil

    path = "/tmp/snk_bucketed_orders"
    shutil.rmtree(path, ignore_errors=True)
    (
        tables["orders"].limit(1000)
        .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
        .option("path", path).mode("overwrite").saveAsTable("snk_orders_bkt")
    )
    try:
        back = spark.table("snk_orders_bkt")
        assert back.count() == 1000
        # bucket metadata visible to the catalog
        desc = spark.sql("DESCRIBE EXTENDED snk_orders_bkt").collect()
        text = "\n".join(f"{r[0]} {r[1]}" for r in desc)
        assert "o_custkey" in text and "4" in text
    finally:
        spark.sql("DROP TABLE IF EXISTS snk_orders_bkt")
        shutil.rmtree(path, ignore_errors=True)
