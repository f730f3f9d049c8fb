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


def test_corpus_mix_matches_oracle(spark, tables, duck):
    """The decomposed two-phase prefix-sum plan and the single-window
    DuckDB oracle produce identical kept sets and cumulative totals."""
    budgets = {"src0": 200, "src1": 1_000_000_000}
    out = sp.corpus_mix(tables["documents"], budgets=budgets)
    _match(
        out, duck, sp.corpus_mix_sql(budgets=budgets),
        ["doc_id", "source", "n_tokens", "cum_tokens"],
    )


def test_corpus_mix_budget_semantics(spark, tables):
    """Per-source invariants: every source's kept total respects its
    budget; the take-order is a PREFIX (no doc kept after the first cut
    doc in the deterministic order); an unlimited budget keeps all."""
    budgets = {"src0": 200, "src1": 1_000_000_000}
    out = sp.corpus_mix(tables["documents"], budgets=budgets).toPandas()
    docs = tables["documents"].toPandas()
    per_src_totals = out.groupby("source")["n_tokens"].sum()
    assert per_src_totals.get("src0", 0) <= 200
    for src, tot in per_src_totals.items():
        cap = budgets.get(src, 700)
        assert tot <= cap
        # cum_tokens of the kept set is exactly its own running total:
        # max cum == sum of kept n_tokens (prefix property)
        kept = out[out["source"] == src]
        assert kept["cum_tokens"].max() == kept["n_tokens"].sum()
    # src1 is effectively unlimited: every src1 doc survives
    n_src1 = (docs["source"] == "src1").sum()
    assert (out["source"] == "src1").sum() == n_src1


def test_corpus_mix_stable_under_repartition(spark, tables):
    """The kept set is a pure function of (source, key, budgets) — not
    of physical layout."""
    budgets = {"src0": 200}
    a = {
        r["doc_id"]
        for r in sp.corpus_mix(tables["documents"], budgets=budgets).collect()
    }
    b = {
        r["doc_id"]
        for r in sp.corpus_mix(
            tables["documents"].repartition(13), budgets=budgets
        ).collect()
    }
    assert a == b


class TestEpochShuffle:
    def test_matches_duckdb(self, spark, tables, duck):
        got = {tuple(r) for r in sp.epoch_shuffle(tables["documents"], epoch=1).collect()}
        want = {tuple(r) for r in duck.execute(sp.epoch_shuffle_sql(epoch=1)).fetchall()}
        assert got == want

    def test_positions_dense_and_epoch_dependent(self, spark, tables):
        a = sp.epoch_shuffle(tables["documents"], epoch=0).collect()
        poss = sorted(r["pos"] for r in a)
        assert poss == list(range(len(a)))
        b = {(r["doc_id"], r["pos"]) for r in sp.epoch_shuffle(tables["documents"], epoch=1).collect()}
        assert {(r["doc_id"], r["pos"]) for r in a} != b  # epoch reshuffles

    def test_partitioning_invariant(self, spark, tables):
        base = {(r["doc_id"], r["pos"]) for r in sp.epoch_shuffle(tables["documents"], epoch=2).collect()}
        re = {(r["doc_id"], r["pos"]) for r in sp.epoch_shuffle(tables["documents"].repartition(13), epoch=2).collect()}
        assert base == re

    def test_no_global_single_partition_sort(self, spark, tables):
        """The only ordered-unpartitioned window must run over the
        n_buckets-row counts frame, never over the corpus: the corpus-
        side window is partitioned by bucket."""
        plan = sp.epoch_shuffle(tables["documents"])._jdf.queryExecution().executedPlan().toString()
        import re as _re
        corpus_windows = [
            ln for ln in plan.splitlines()
            if "Window" in ln and "partitionBy" not in ln and "skey" in ln
        ]
        # the within-bucket rank window partitions by bucket
        assert "row_number()" in plan
        for ln in corpus_windows:
            assert "bucket" in ln, ln


class TestNucleusTopP:
    def test_nucleus_rule_per_group(self, spark, tables):
        """Kept set per group = the minimal weight-desc prefix covering
        p% of the group's mass: the last kept row crosses the
        threshold, and dropping it falls below."""
        p = 60
        kept = sp.nucleus_topp_sample(tables["documents"], p_pct=p).collect()
        all_rows = (
            tables["documents"]
            .selectExpr(
                "doc_id", "source",
                "CAST(size(split(text, ' +')) AS BIGINT) AS weight",
            )
            .collect()
        )
        from collections import defaultdict

        totals = defaultdict(int)
        for r in all_rows:
            totals[r["source"]] += r["weight"]
        by_group = defaultdict(list)
        for r in kept:
            by_group[r["source"]].append(r)
        assert set(by_group) == set(totals)
        for g, rows in by_group.items():
            rows.sort(key=lambda r: r["cum_weight"])
            covered = rows[-1]["cum_weight"]
            assert 100 * covered >= p * totals[g]  # reaches p% ...
            assert 100 * (covered - rows[-1]["weight"]) < p * totals[g]  # minimally
            # kept rows are a PREFIX of the total take-order
            # (band desc, weight desc, key): every kept row sorts
            # strictly before every cut row
            kept_ids = {r["doc_id"] for r in rows}
            weights = {r["doc_id"]: r["weight"] for r in all_rows if r["source"] == g}
            order = lambda i: (-(weights[i] // 16), -weights[i], i)
            cut = [i for i in weights if i not in kept_ids]
            if cut:
                assert max(order(i) for i in kept_ids) < min(order(i) for i in cut)

    def test_stable_under_repartition(self, spark, tables):
        a = {tuple(r) for r in sp.nucleus_topp_sample(tables["documents"]).collect()}
        b = {
            tuple(r)
            for r in sp.nucleus_topp_sample(
                tables["documents"].repartition(13)
            ).collect()
        }
        assert a == b


class TestDecontaminatedMix:
    def test_no_benchmark_or_contaminated_rows(self, spark, tables):
        from mmw_geoprocessing_spark.operators.text_analysis import (
            contamination_check,
        )

        docs = tables["documents"]
        out = sp.decontaminated_mix(docs).collect()
        ids = {r["doc_id"] for r in out}
        assert ids, "mix should keep something"
        assert all(i % 101 != 7 for i in ids), "benchmark rows leaked into the mix"
        bench = docs.filter("doc_id % 101 = 7")
        dirty = {
            r["doc_id"]
            for r in contamination_check(docs, bench, n=13)
            .filter("hit_ngrams > 0")
            .collect()
        }
        assert not (ids & dirty), "contaminated rows leaked into the mix"

    def test_budgets_enforced(self, spark, tables):
        out = sp.decontaminated_mix(
            tables["documents"], budgets={"src0": 200}, default_budget=700
        ).collect()
        for r in out:
            cap = 200 if r["source"] == "src0" else 700
            assert r["cum_tokens"] <= cap


class TestDecontaminatedMixDisk:
    def test_matches_fused_plan_and_serves_without_gram_scan(self, spark, tables):
        """The disk twin (r11 verdict #4): bench grams + the dirty-id
        set are ingest-time index-store artifacts; the served mix must
        equal the fused single-pass plan row-for-row, and the serve
        plan must contain NO gram explode (the corpus-wide 13-gram scan
        happens at ingest, never per mix)."""
        from tests.conftest import SF_DIR

        fused = sorted(
            tuple(r) for r in sp.decontaminated_mix(tables["documents"]).collect()
        )
        served_df = sp.decontaminated_mix_disk(spark, SF_DIR)
        served = sorted(tuple(r) for r in served_df.collect())
        assert served == fused
        plan = served_df._jdf.queryExecution().executedPlan().toString()
        assert "explode" not in plan.lower(), (
            "serve plan still explodes grams:\n" + plan[:1500]
        )
        # second call re-attaches the artifacts instead of rebuilding
        from mmw_geoprocessing_spark.sources.index_store import (
            clear_index_store_cache,
        )

        clear_index_store_cache()
        again = sorted(
            tuple(r) for r in sp.decontaminated_mix_disk(spark, SF_DIR).collect()
        )
        assert again == fused
