"""Small-file compaction: file counts, content preservation, clustering."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mmw_geoprocessing_spark.sources import maintenance as mt


@pytest.fixture()
def fragmented(spark, tables, tmp_path):
    """documents written as 64 tiny files — the streaming-sink shape."""
    src = str(tmp_path / "frag")
    tables["documents"].repartition(64).write.parquet(src)
    return src


def test_compaction_reduces_files_preserves_rows(spark, tables, fragmented, tmp_path):
    dst = str(tmp_path / "compact")
    n_src, src_bytes = mt.parquet_dir_stats(spark, fragmented)
    assert n_src == 64
    stats = mt.compact_parquet_dir(
        spark, fragmented, dst, target_bytes=max(1, src_bytes // 2 + 1)
    )
    assert stats["dst_files"] < stats["src_files"]
    assert stats["dst_files"] <= 2
    before = spark.read.parquet(fragmented)
    after = spark.read.parquet(dst)
    assert before.exceptAll(after).count() == 0
    assert after.exceptAll(before).count() == 0


def test_compaction_target_sizing(spark, fragmented, tmp_path):
    """ceil(bytes/target) output files, balanced by round-robin."""
    _, src_bytes = mt.parquet_dir_stats(spark, fragmented)
    target = src_bytes // 4 + 1
    stats = mt.compact_parquet_dir(spark, fragmented, str(tmp_path / "c4"), target)
    import math

    assert stats["dst_files"] == math.ceil(src_bytes / target)


def test_compaction_sorted_clusters_minmax(spark, fragmented, tmp_path):
    """sort_cols clustering: doc_id ranges of output files are disjoint,
    so a doc_id predicate prunes to one file via min/max stats."""
    dst = str(tmp_path / "sorted")
    mt.compact_parquet_dir(
        spark, fragmented, dst, target_bytes=1, sort_cols=["doc_id"]
    )  # target 1 byte -> one file per source byte-chunk; range-partitioned
    per_file = (
        spark.read.parquet(dst)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(per_file) > 1
    for a, b in zip(per_file, per_file[1:]):
        assert a["hi"] < b["lo"]  # disjoint ranges = prunable row groups
