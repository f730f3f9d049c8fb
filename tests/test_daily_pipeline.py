"""Day-in-the-life integration: the maintenance subsystems composed
the way a daily 100 TB ingest would run them — append a batch,
extend the zone-map index incrementally, serve pruned reads across
old+new files, refresh the materialized rollup by delta algebra
(IVM) instead of rescanning, compact the fragmented append, vacuum
the superseded files — with table-equality asserted after every step.

Each piece is oracle- or pytest-pinned on its own
(tests/test_zonemap.py, tests/test_maintenance.py, operators/cdc.py);
this file pins that they COMPOSE: the manifest produced by one step
is the input of the next, and no step may change the table's
logical contents except the append itself.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.operators import cdc
from mmw_geoprocessing_spark.sources import maintenance as mt
from mmw_geoprocessing_spark.sources import zonemap as zm

KEY_OFFSET = 10_000_000


def _rollup(df):
    return (
        df.groupBy("o_orderdate")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "revenue_cents"
            ),
        )
        .filter(F.col("n_orders") > 0)
    )


def _same(a, b):
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


@pytest.fixture(scope="module")
def day0(spark, tables, tmp_path_factory):
    """Base table: orders key-clustered into 16 files + persisted index."""
    root = tmp_path_factory.mktemp("daily")
    frag = str(root / "frag")
    base_dir = str(root / "base")
    tables["orders"].repartition(8).write.parquet(frag)
    _, nbytes = mt.parquet_dir_stats(spark, frag)
    mt.compact_parquet_dir(
        spark, frag, base_dir,
        target_bytes=max(1, nbytes // 16 + 1),
        sort_cols=["o_orderkey"],
    )
    idx = zm.build_zonemap(base_dir, spark, ["o_orderkey"])
    return {"root": root, "base_dir": base_dir, "idx": idx}


@pytest.fixture(scope="module")
def day1(spark, tables, day0):
    """Append batch: 1/5 of orders re-keyed into a disjoint keyspace,
    written fragmented (the streaming-sink shape), index EXTENDED —
    not rebuilt."""
    batch = (
        tables["orders"]
        .filter(F.col("o_orderkey") % 5 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(KEY_OFFSET))
    )
    append_dir = str(day0["root"] / "append")
    batch.repartition(4).write.parquet(append_dir)
    idx = zm.extend_zonemap(day0["idx"], append_dir, spark, ["o_orderkey"])
    return {"append_dir": append_dir, "idx": idx, "batch": batch}


def test_day1_pruned_reads_span_old_and_new(spark, tables, day0, day1):
    n_base, _ = mt.parquet_dir_stats(spark, day0["base_dir"])
    n_app, _ = mt.parquet_dir_stats(spark, day1["append_dir"])

    # a query fully inside the NEW keyspace must not open base files
    box = {"o_orderkey": (KEY_OFFSET, KEY_OFFSET + 10**9)}
    got, stats = zm.zonemap_pruned_read(
        spark, day1["idx"], box, schema_src=day1["append_dir"]
    )
    assert stats["files_total"] == n_base + n_app
    assert stats["files_read"] <= n_app
    _same(got, day1["batch"])

    # a straddling range is exact across both generations
    box2 = {"o_orderkey": (500, KEY_OFFSET + 500)}
    got2, _ = zm.zonemap_pruned_read(
        spark, day1["idx"], box2, schema_src=day1["append_dir"]
    )
    full = spark.read.parquet(day0["base_dir"], day1["append_dir"]).where(
        F.col("o_orderkey").between(500, KEY_OFFSET + 500)
    )
    _same(got2, full)


def test_day1_ivm_refresh_equals_recompute(spark, day0, day1):
    """The nightly rollup refresh: the append batch as 'I' changelog
    rows through the delta algebra — indistinguishable from a full
    recompute over base ∪ batch."""
    base = spark.read.parquet(day0["base_dir"])
    changelog = (
        day1["batch"]
        .withColumn("seq", F.lit(1).cast("bigint"))
        .withColumn("op", F.lit("I"))
    )
    maintained = cdc.incremental_rollup(base, changelog)
    recomputed = _rollup(base.unionByName(day1["batch"]))
    _same(maintained, recomputed)


def test_day2_compact_and_vacuum_preserve_table(spark, day0, day1):
    """Nightly compaction of the fragmented append + vacuum of the
    superseded files; the logical table never changes."""
    before = spark.read.parquet(day0["base_dir"], day1["append_dir"])
    n_before = before.count()

    compacted_dir = str(day0["root"] / "append_compacted")
    _, nbytes = mt.parquet_dir_stats(spark, day1["append_dir"])
    stats = mt.compact_parquet_dir(
        spark, day1["append_dir"], compacted_dir,
        target_bytes=nbytes + 1,  # -> 1 file
        sort_cols=["o_orderkey"],
    )
    assert stats["dst_files"] < stats["src_files"]

    manifest = mt.list_parquet_files(spark, day0["base_dir"]) + \
        mt.list_parquet_files(spark, compacted_dir)
    after = spark.read.parquet(*manifest)
    assert after.count() == n_before
    _same(after, spark.read.parquet(day0["base_dir"], compacted_dir))

    # vacuum the superseded fragmented files; the manifest still reads
    gc = mt.vacuum(
        spark, [day1["append_dir"], compacted_dir, day0["base_dir"]], manifest
    )
    assert gc["removed"] == stats["src_files"]
    assert spark.read.parquet(*manifest).count() == n_before

    # the index for the new layout: dropped append rows, one new file
    idx2 = zm.extend_zonemap(
        zm.build_zonemap(day0["base_dir"], spark, ["o_orderkey"]),
        compacted_dir, spark, ["o_orderkey"],
    )
    box = {"o_orderkey": (KEY_OFFSET, KEY_OFFSET + 10**9)}
    got, s = zm.zonemap_pruned_read(spark, idx2, box, schema_src=compacted_dir)
    assert s["files_read"] <= stats["dst_files"]
    _same(got, day1["batch"])
