"""Crawl-curation operators (operators/curation.py): per-domain rate
capping and Bloom-filter membership probing, plus the SCD2 history
builder (operators/cdc.py) — each hash-checked against its DuckDB twin
and property-checked."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.operators import cdc
from mmw_geoprocessing_spark.operators import curation as cu


def _match(spark_df, duck, sql, sort_cols):
    a = spark_df.toPandas()
    b = duck.execute(sql).df()
    cols = sorted(b.columns)
    a = a[cols].sort_values(sort_cols).reset_index(drop=True)
    b = b[cols].sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_domain_rate_cap_matches_oracle(spark, tables, duck):
    out = cu.domain_rate_cap(tables["documents"])
    _match(out, duck, cu.domain_rate_cap_sql(), ["source", "domain_rank"])


def test_domain_rate_cap_bounds_every_domain(spark, tables):
    out = cu.domain_rate_cap(tables["documents"], cap=7)
    per = out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    assert per and all(r["n"] <= 7 for r in per)
    # survivors are each domain's longest docs: rank 1 has the max n_chars
    top = {r["source"]: r["n_chars"] for r in out.filter("domain_rank = 1").collect()}
    mx = {
        r["source"]: r["mx"]
        for r in tables["documents"]
        .groupBy("source")
        .agg(F.max("n_chars").alias("mx"))
        .collect()
    }
    assert top == mx


def test_domain_rate_cap_uses_window_group_limit(spark, tables):
    """rank-then-filter must be rewritten to WindowGroupLimit: partial
    per-partition top-k BEFORE the exchange (the scale property)."""
    plan = cu.domain_rate_cap(tables["documents"])._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_bloom_probe_matches_oracle(spark, tables, duck):
    out = cu.bloom_probe_dedup(tables["documents"])
    _match(out, duck, cu.bloom_probe_dedup_sql(), ["doc_id"])


def test_bloom_probe_no_false_negatives(spark, tables):
    """Bloom filters never miss a true member: every reference-slice doc
    (whose digest is IN the filter) must be maybe_present, and any doc
    whose text equals a reference doc's text must be too."""
    out = cu.bloom_probe_dedup(tables["documents"])
    ref_ids = out.join(
        tables["documents"].filter(F.col("doc_id") % cu.REF_MOD < cu.REF_KEEP),
        "doc_id",
        "inner",
    )
    assert ref_ids.filter(~F.col("maybe_present")).count() == 0


def test_bloom_probe_false_positive_rate_bounded(spark, tables):
    """Non-members may false-positive, but at the registered m/k and
    test-scale fill factor the rate must be far under 1%."""
    docs = tables["documents"]
    out = cu.bloom_probe_dedup(docs)
    ref_digests = (
        docs.filter(F.col("doc_id") % cu.REF_MOD < cu.REF_KEEP)
        .select(F.md5("text").alias("d"))
        .distinct()
    )
    nonmembers = (
        docs.filter(F.col("doc_id") % cu.REF_MOD >= cu.REF_KEEP)
        .select("doc_id", F.md5("text").alias("d"))
        .join(ref_digests, "d", "left_anti")
    )
    fp = out.join(nonmembers, "doc_id", "inner").filter("maybe_present").count()
    n = nonmembers.count()
    assert n > 0 and fp / n < 0.01


def test_bloom_word_table_is_broadcastable(spark, tables):
    """The filter is fixed-size: at most m/60 words regardless of
    reference-corpus cardinality, and the probe side is a pure
    projection over the broadcast 1-row map — no shuffle exchange
    between the scan and the result."""
    bloom = cu.bloom_build(tables["documents"])
    assert bloom.count() <= cu.BLOOM_M_BITS // cu.BLOOM_WORD
    plan = cu.bloom_probe_dedup(tables["documents"])._jdf.queryExecution().executedPlan().toString()
    # k broadcast HASH joins (O(1) lookups), no nested-loop, and no
    # shuffle on the probe side (the only exchanges build the word
    # table itself, inside the broadcast)
    assert plan.count("BroadcastHashJoin") == cu.BLOOM_K
    assert "BroadcastNestedLoopJoin" not in plan
    probe_side = plan.split("BroadcastHashJoin")[0]
    assert "Exchange hashpartitioning" not in probe_side


def test_scd2_history_matches_oracle(spark, tables, duck):
    out = cdc.scd2_history_orders(tables["orders"])
    _match(out, duck, cdc.scd2_history_orders_sql(), ["o_orderkey", "version"])


def test_scd2_ranges_are_consistent(spark, tables):
    """Per key: exactly one current version unless the key was deleted;
    closed ranges end at the seq that superseded them; the current
    version agrees with the type-1 merge."""
    hist = cdc.scd2_history_orders(tables["orders"])
    # no open range may precede a closed one: valid_to is monotone per key
    bad = hist.filter(
        (F.col("valid_to").isNotNull()) & (F.col("valid_to") <= F.col("version"))
    )
    assert bad.count() == 0
    current = hist.filter("is_current").select("o_orderkey", "o_totalprice", "version")
    merged = cdc.changelog_merge_orders(tables["orders"]).select(
        "o_orderkey", "o_totalprice", F.col("version")
    )
    assert current.exceptAll(merged).count() == 0
    assert merged.exceptAll(current).count() == 0


def test_incremental_rollup_matches_full_recompute(spark, tables, duck):
    out = cdc.incremental_rollup_orders(tables["orders"])
    _match(out, duck, cdc.incremental_rollup_orders_sql(), ["o_orderdate"])


def test_incremental_rollup_delta_cost_is_changelog_bounded(spark, tables):
    """The IVM plan must NOT rescan the base per group: the delta side
    joins changelog->base on the key (bounded by |changelog|), and the
    view update is a union + re-agg — no second full aggregation of the
    base beyond the one base_rollup pass."""
    out = cdc.incremental_rollup_orders(tables["orders"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one scan computes base_rollup, one feeds the old-value join; a
    # cartesian or per-group rescan would show up as nested-loop
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
