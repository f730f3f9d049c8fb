"""Dataset-assembly operators (operators/sampling.py): deterministic
split / stratified sample / token-batch packing, each hash-checked
against its DuckDB twin and property-checked."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.operators import sampling as sp


def _match(spark_df, duck, sql, sort_cols):
    a = spark_df.toPandas()[sort_cols].sort_values(sort_cols).reset_index(drop=True)
    b = duck.execute(sql).df()[sort_cols].sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_deterministic_split_matches_oracle_and_proportions(spark, tables, duck):
    out = sp.deterministic_split(tables["documents"])
    _match(out, duck, sp.deterministic_split_sql(), ["doc_id", "split"])
    n = out.count()
    frac = {
        r["split"]: r["cnt"] / n
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert set(frac) == {"train", "val", "test"}
    assert 0.8 < frac["train"] < 1.0 and frac["val"] < 0.2 and frac["test"] < 0.2


def test_split_is_stable_under_repartition(spark, tables):
    """Membership is a pure key function — reshuffling must not move any
    row between splits (the property sampleBy does NOT have)."""
    base = sp.deterministic_split(tables["documents"]).select("doc_id", "split")
    shuffled = sp.deterministic_split(tables["documents"].repartition(13)).select(
        "doc_id", "split"
    )
    assert base.exceptAll(shuffled).count() == 0


def test_stratified_sample_matches_oracle(spark, tables, duck):
    out = sp.stratified_sample(tables["documents"], strata_col="lang", fraction=0.5)
    cols = ["doc_id"]
    if "lang" not in dict(tables["documents"].dtypes):
        out = sp.stratified_sample(tables["documents"], strata_col="doc_id", fraction=0.5)
        _match(out, duck, sp.stratified_sample_sql("doc_id", 0.5), cols)
    else:
        _match(out, duck, sp.stratified_sample_sql("lang", 0.5), cols)


def test_pack_token_batches_matches_oracle_and_budget(spark, tables, duck):
    out = sp.pack_token_batches(tables["documents"], budget=256, n_buckets=8)
    _match(
        out, duck, sp.pack_token_batches_sql(budget=256, n_buckets=8),
        ["doc_id", "bucket", "batch_id", "n_tokens"],
    )
    # budget property: every batch's token total overshoots by < one doc
    totals = (
        out.groupBy("bucket", "batch_id")
        .agg(F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx"))
        .collect()
    )
    assert totals
    for r in totals:
        assert r["tot"] < 256 + r["mx"]
