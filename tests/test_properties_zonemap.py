"""Property tests (hypothesis) for the layout services: the Morton
expression against a pure-Python reference on random points, and
zone-map pruning soundness on random UNclustered layouts — random
values, random boxes, degenerate single-value columns, negative ints,
empty results — inputs the fixture-based suite never generates."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.sources import maintenance as mt
from mmw_geoprocessing_spark.sources import zonemap as zm


def _morton_ref(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=10, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=64,
    )
)
def test_zvalue16_property(spark, pts):
    df = spark.createDataFrame(pts, "x int, y int").withColumn(
        "z", mt._zvalue16(F.col("x"), F.col("y"))
    )
    for r in df.collect():
        assert r["z"] == _morton_ref(r["x"], r["y"])


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=200
    ),
    lo=st.integers(min_value=-1200, max_value=1200),
    width=st.integers(min_value=0, max_value=800),
    n_files=st.integers(min_value=1, max_value=5),
    data=st.data(),
)
def test_pruned_read_soundness_on_random_layouts(
    spark, tmp_path_factory, vals, lo, width, n_files, data
):
    """For ANY file layout and ANY box: pruned read ≡ full filter, and
    files_read never exceeds files_total. No clustering assumed — zone
    maps must stay CORRECT on hostile layouts (they only stop being
    USEFUL)."""
    # hypothesis replays examples in-process; overwrite keeps the write
    # idempotent regardless of how mktemp numbering interacts with that
    d = str(tmp_path_factory.mktemp("prop") / "t")
    rows = [(i, v) for i, v in enumerate(vals)]
    (
        spark.createDataFrame(rows, "id int, v int")
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(d)
    )
    idx = zm.build_zonemap(d, spark, ["v"])
    hi = lo + width
    pruned, stats = zm.zonemap_pruned_read(
        spark, idx, {"v": (lo, hi)}, schema_src=d
    )
    full = spark.read.parquet(d).where(F.col("v").between(lo, hi))
    assert pruned.exceptAll(full).count() == 0
    assert full.exceptAll(pruned).count() == 0
    assert 0 <= stats["files_read"] <= stats["files_total"]
    # completeness: one index row per NON-EMPTY data file (empty part
    # files produce no input_file_name group — the documented caveat
    # this very test discovered; they can never contribute rows, so
    # pruning soundness above is unaffected)
    n_files_actual, _ = mt.parquet_dir_stats(spark, d)
    assert stats["files_total"] <= n_files_actual
    n_nonempty = (
        spark.read.parquet(d)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert stats["files_total"] == n_nonempty
