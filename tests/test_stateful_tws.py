"""transformWithStateInPandas profile operator: closed-form twin parity
everywhere; the streaming drain only where the protobuf runtime exists
(see streaming/stateful.py docstring for the probed sandbox boundary)."""

from __future__ import annotations

import pytest

from mmw_geoprocessing_spark.streaming import stateful as st


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def test_batch_twin_matches_duckdb(spark, tables, duck):
    got = {tuple(r) for r in st.user_profiles_batch_twin(tables["events"]).collect()}
    want = {tuple(r) for r in duck.execute(st.user_profiles_batch_twin_sql()).fetchall()}
    assert got == want
    assert len(got) > 0


def test_twin_is_batch_split_invariant(spark, tables):
    """The commutative-fold property the TWS state update relies on:
    folding any partition split of the input gives the same profiles —
    here checked by unioning two disjoint halves pre-aggregated paths
    vs the whole table."""
    ev = tables["events"]
    whole = {tuple(r) for r in st.user_profiles_batch_twin(ev).collect()}
    re = {tuple(r) for r in st.user_profiles_batch_twin(ev.repartition(13)).collect()}
    assert whole == re


@pytest.mark.skipif(_has_protobuf(), reason="protobuf present: boundary not active")
def test_missing_protobuf_raises_typed_error(spark, tables):
    with pytest.raises(EnvironmentError, match="google.protobuf"):
        st.stream_user_profiles_tws(tables["events"])


@pytest.mark.skipif(not _has_protobuf(), reason="needs google.protobuf")
def test_tws_drain_equals_twin(spark, tables, tmp_path):
    """Where the runtime exists: drain the real TWS plan with the
    RocksDB provider and compare final emissions to the twin."""
    from pyspark.sql import functions as F

    from mmw_geoprocessing_spark.streaming.windows import run_availablenow

    src = str(tmp_path / "src")
    tables["events"].coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(tables["events"].schema).parquet(src)
    out = st.stream_user_profiles_tws(stream)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        run_availablenow(
            out, str(tmp_path / "ckpt"), sink_path=str(tmp_path / "sink")
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    sunk = spark.read.parquet(str(tmp_path / "sink"))
    from pyspark.sql import Window

    final = (
        sunk.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
            ),
        )
        .filter("rn = 1")
        .drop("rn")
    )
    got = {tuple(r) for r in final.collect()}
    want = {tuple(r) for r in st.user_profiles_batch_twin(tables["events"]).collect()}
    assert got == want
