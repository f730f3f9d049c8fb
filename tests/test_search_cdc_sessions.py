"""Round-9 operators: BM25 corpus search (operators/search.py), CDC
changelog merge (operators/cdc.py), and batch sessionization
(operators/relational_ext.sessionize_events). Each hash-checked against
its DuckDB twin plus semantic property tests."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.operators import cdc
from mmw_geoprocessing_spark.operators import relational_ext as rex
from mmw_geoprocessing_spark.operators import search as se


def _match(spark_df, duck, sql):
    a = spark_df.toPandas()
    b = duck.execute(sql).df()
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# --------------------------------------------------------------------- BM25


def test_bm25_matches_oracle(spark, tables, duck):
    _match(se.bm25_topk(spark, tables["documents"]), duck, se.bm25_topk_sql())


def test_bm25_topk_shape_and_order(spark, tables):
    out = se.bm25_topk(spark, tables["documents"]).toPandas()
    for qid, grp in out.groupby("query_id"):
        # ranks are 1..n contiguous, scores non-increasing
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1))
        by_rank = grp.sort_values("rank")
        assert (by_rank["score_scaled"].diff().dropna() <= 0).all()
        assert len(grp) <= se.TOP_K


def test_bm25_rare_term_outranks_common(spark, tables):
    """A doc matching the corpus's one rare term ('dup', df~5%) must
    outrank docs matching only the common term in q_dup_key."""
    out = se.bm25_topk(spark, tables["documents"]).toPandas()
    q = out[out.query_id == "q_dup_key"].sort_values("rank")
    if len(q) == 0:
        return  # sf without 'dup' occurrences
    docs = tables["documents"].toPandas().set_index("doc_id")["text"]
    top_doc = docs[q.iloc[0]["doc_id"]]
    assert "dup" in top_doc.lower().split()


# ------------------------------------------------------------- hybrid RRF


def test_hybrid_rrf_matches_oracle(spark, tables, duck):
    _match(
        se.hybrid_rrf_topk(spark, tables["documents"], tables["embeddings"]),
        duck,
        se.hybrid_rrf_topk_sql(),
    )


def test_hybrid_rrf_fusion_semantics(spark, tables):
    """rrf_score must equal the fixed-order recomputation from the leg
    ranks, every output doc must come from at least one leg, and ranks
    are 1..n contiguous per query."""
    out = (
        se.hybrid_rrf_topk(spark, tables["documents"], tables["embeddings"])
        .toPandas()
    )
    assert ((out["bm25_rank"] > 0) | (out["cos_rank"] > 0)).all()
    for _, r in out.iterrows():
        expect = (1.0 / (se.RRF_K + r.bm25_rank) if r.bm25_rank > 0 else 0.0) + (
            1.0 / (se.RRF_K + r.cos_rank) if r.cos_rank > 0 else 0.0
        )
        assert r.rrf_score == expect
    for _, grp in out.groupby("query_id"):
        assert sorted(grp["rrf_rank"]) == list(range(1, len(grp) + 1))
        by_rank = grp.sort_values("rrf_rank")
        assert (by_rank["rrf_score"].diff().dropna() <= 0).all()
        assert len(grp) <= se.TOP_K


def test_hybrid_rrf_both_legs_beat_single_leg(spark, tables):
    """A doc present in BOTH candidate lists at equal ranks must score
    strictly above a doc holding the same rank in only one leg — the
    defining property of rank fusion."""
    out = (
        se.hybrid_rrf_topk(spark, tables["documents"], tables["embeddings"])
        .toPandas()
    )
    both = out[(out.bm25_rank > 0) & (out.cos_rank > 0)]
    solo = out[(out.bm25_rank == 0) | (out.cos_rank == 0)]
    for _, b in both.iterrows():
        worst_leg = max(b.bm25_rank, b.cos_rank)
        dominated = solo[
            (solo.bm25_rank.clip(lower=1) >= worst_leg)
            & (solo.cos_rank.clip(lower=1) >= worst_leg)
        ]
        assert (b.rrf_score > dominated.rrf_score).all()


def test_bm25_indexed_matches_fresh_and_serves_from_index(spark, tables, duck):
    """round 10: the ingest-time-index serving shape must return the
    IDENTICAL result set as the fresh plan (same oracle), and its warm
    plan must read the persisted postings (InMemoryTableScan), not
    re-scan the corpus."""
    import pandas as pd

    fresh = se.bm25_topk(spark, tables["documents"]).toPandas()
    warm = se.bm25_indexed_topk(spark, tables["documents"])
    got = warm.toPandas()
    cols = sorted(fresh.columns)
    a = fresh[cols].sort_values(cols).reset_index(drop=True)
    b = got[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    _match(warm, duck, se.bm25_indexed_topk_sql())
    plan = warm._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan


def test_hybrid_rrf_ivf_matches_oracle(spark, tables, duck):
    _match(
        se.hybrid_rrf_ivf_topk(spark, tables["documents"], tables["embeddings"]),
        duck,
        se.hybrid_rrf_ivf_topk_sql(),
    )


def test_hybrid_rrf_ivf_recall_vs_exact_leg(spark, tables):
    """Recall pin for the scale twin (r9 verdict #3): the IVF-probed
    dense leg must recover >= 0.8 of the exact brute-force hybrid's
    top-k per query on the isotropic fixture corpus (ann_ivf's own
    measured recall at nprobe=8 is 0.93; the fused lists differ only
    where the dense legs do, so fused overlap tracks dense recall)."""
    exact = se.hybrid_rrf_topk(spark, tables["documents"], tables["embeddings"])
    ivf = se.hybrid_rrf_ivf_topk(spark, tables["documents"], tables["embeddings"])
    e = {(r["query_id"], r["doc_id"]) for r in exact.collect()}
    v = {(r["query_id"], r["doc_id"]) for r in ivf.collect()}
    assert e and v
    recall = len(e & v) / len(e)
    assert recall >= 0.8, recall


def test_hybrid_rrf_ivf_no_corpus_crossjoin(spark, tables):
    """The whole point of the twin: the dense leg's full-corpus product
    is gone. Both variants keep ONE nested-loop join — the BM25 leg's
    1-row corpus-totals broadcast (the accepted pattern) — so the exact
    variant shows 2 (totals + corpus crossJoin) and the IVF variant
    must show exactly 1, with the dense leg a broadcast HASH join on
    the probed cell id."""
    exact = se.hybrid_rrf_topk(spark, tables["documents"], tables["embeddings"])
    ivf = se.hybrid_rrf_ivf_topk(spark, tables["documents"], tables["embeddings"])
    p_exact = exact._jdf.queryExecution().executedPlan().toString()
    p_ivf = ivf._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p_ivf
    assert p_exact.count("BroadcastNestedLoopJoin") == 2, p_exact
    assert p_ivf.count("BroadcastNestedLoopJoin") == 1, p_ivf


# ---------------------------------------------------------------------- CDC


def test_cdc_merge_matches_oracle(spark, tables, duck):
    _match(
        cdc.changelog_merge_orders(tables["orders"]),
        duck,
        cdc.changelog_merge_orders_sql(),
    )


def test_cdc_merge_semantics(spark, tables):
    orders = tables["orders"]
    merged = cdc.changelog_merge_orders(orders).toPandas().set_index("o_orderkey")
    base = orders.toPandas().set_index("o_orderkey")

    deleted = [k for k in base.index if k % 13 == 4]
    assert deleted and not any(k in merged.index for k in deleted)

    # latest-wins: %21==3 keys got seq-2 update (+200) over seq-1 (+100)
    u2 = [k for k in base.index if k % 21 == 3 and k % 13 != 4]
    for k in u2[:20]:
        assert merged.loc[k, "o_totalprice"] == base.loc[k, "o_totalprice"] + 200.0
        assert merged.loc[k, "version"] == 2

    u1 = [k for k in base.index if k % 7 == 3 and k % 21 != 3 and k % 13 != 4]
    for k in u1[:20]:
        assert merged.loc[k, "o_totalprice"] == base.loc[k, "o_totalprice"] + 100.0

    ins = [-k for k in base.index if k % 17 == 5]
    assert ins and all(k in merged.index for k in ins)
    untouched = [
        k for k in base.index if k % 7 != 3 and k % 13 != 4
    ]
    for k in untouched[:20]:
        assert merged.loc[k, "version"] == 0
        assert merged.loc[k, "o_totalprice"] == base.loc[k, "o_totalprice"]


def test_cdc_merge_one_row_per_key(spark, tables):
    merged = cdc.changelog_merge_orders(tables["orders"])
    assert merged.groupBy("o_orderkey").count().filter("count > 1").count() == 0


def test_cdc_fused_forms_match_generic(spark, tables):
    """The registered entries' row-local (zero-join) forms must be bag-
    equal to the generic shuffle/join operators fed the synthesized
    changelog — the algebraic identity the r14 fusion rests on."""
    orders = tables["orders"]
    ch = cdc.synth_changelog(orders)
    pairs = [
        (cdc.changelog_merge_orders(orders), cdc.changelog_merge(orders, ch)),
        (cdc.scd2_history_orders(orders), cdc.scd2_history(orders, ch)),
        (
            cdc.incremental_rollup_orders(orders),
            cdc.incremental_rollup(orders, ch),
        ),
        (
            cdc.merge_into_orders(orders),
            cdc.merge_into(orders, cdc._merge_source(orders)),
        ),
    ]
    for fused, generic in pairs:
        assert fused.columns == generic.columns
        assert fused.exceptAll(generic).count() == 0
        assert generic.exceptAll(fused).count() == 0


def test_cdc_fused_forms_are_zero_exchange(spark, tables):
    """The fused registered entries must plan as ONE scan with no
    Exchange/Join below the (rollup's) final aggregate."""
    orders = tables["orders"]
    for df, n_exchanges in [
        (cdc.changelog_merge_orders(orders), 0),
        (cdc.scd2_history_orders(orders), 0),
        (cdc.merge_into_orders(orders), 0),
        (cdc.incremental_rollup_orders(orders), 1),  # final agg only
    ]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= n_exchanges, plan
        assert "Join" not in plan, plan
        assert "Window" not in plan, plan


# -------------------------------------------------------------- sessionize


def test_sessionize_matches_oracle(spark, tables, duck):
    _match(
        rex.sessionize_events(tables["events"]),
        duck,
        rex.sessionize_events_sql(),
    )


def test_sessionize_gap_semantics(spark, tables):
    """Every session's internal gaps are <= gap_s and consecutive
    sessions of a user are separated by > gap_s."""
    gap_s = 600
    sessions = (
        rex.sessionize_events(tables["events"], gap_s=gap_s)
        .toPandas()
        .sort_values(["user_id", "session_id"])
    )
    # event counts conserved
    assert sessions["n_events"].sum() == tables["events"].count()
    for _, grp in sessions.groupby("user_id"):
        starts = grp["session_start"].tolist()
        ends = grp["session_end"].tolist()
        for i in range(1, len(starts)):
            assert (starts[i] - ends[i - 1]).total_seconds() > gap_s


def test_sessionize_single_shuffle(spark, tables):
    """HashPartitioning(user_id) from the window must satisfy the
    final per-(user, session) aggregation — exactly one exchange."""
    plan = rex.sessionize_events(tables["events"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


# --------------------------------------------------------------- MERGE INTO


def test_merge_into_matches_oracle(spark, tables, duck):
    _match(cdc.merge_into_orders(tables["orders"]), duck, cdc.merge_into_orders_sql())


def test_merge_into_clause_semantics(spark, tables):
    orders = tables["orders"]
    out = cdc.merge_into_orders(orders).toPandas().set_index("o_orderkey")
    src = orders.toPandas().set_index("o_orderkey")
    upd = [k for k in src.index if k % 11 == 5]
    dele = [k for k in src.index if k % 17 == 2 and not k % 11 == 5]
    untouched = [k for k in src.index if k not in set(upd) | set(dele)]
    assert set(out.loc[upd, "o_orderpriority"]) == {"MERGED"}
    assert (abs(out.loc[upd, "o_totalprice"] - (src.loc[upd, "o_totalprice"] + 50.0)) < 1e-9).all()
    assert not set(dele) & set(out.index)
    ins = [k for k in src.index if k % 23 == 1]
    assert {-(k + 1_000_000_001) for k in ins} <= set(out.index)
    assert (out.loc[untouched, "o_totalprice"] == src.loc[untouched, "o_totalprice"]).all()


def test_merge_into_edge_clauses(spark):
    """Hand-built frames: unmatched 'U'/'D' are no-ops; matched 'I'
    updates (upsert convention, documented in the operator)."""
    t = spark.createDataFrame(
        [(1, 10, "O", 1.0, None, "P1"), (2, 20, "O", 2.0, None, "P2")],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    )
    s = spark.createDataFrame(
        [
            (9, "U", 99, "X", 9.0, None, "NOPE"),   # unmatched update: no-op
            (8, "D", 88, "X", 8.0, None, "NOPE"),   # unmatched delete: no-op
            (2, "I", 22, "X", 22.0, None, "UPSERT"),  # matched insert: update
        ],
        "o_orderkey bigint, op string, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    )
    got = {r["o_orderkey"]: r.asDict() for r in cdc.merge_into(t, s).collect()}
    assert set(got) == {1, 2}
    assert got[1]["o_orderpriority"] == "P1"
    assert got[2]["o_orderpriority"] == "UPSERT"
    assert got[2]["o_custkey"] == 22
