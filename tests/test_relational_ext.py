"""Extension-surface semantics + physical-plan evidence."""

from __future__ import annotations

from pyspark.sql import functions as F

from mmw_geoprocessing_spark.operators import relational_ext as rex


def test_approx_distinct_error_bound(spark, tables):
    """HLL++ at rsd=0.02 must stay within 5% of exact — the query itself
    emits the bound check as a boolean (the driver-gate contract)."""
    rows = rex.approx_distinct(tables["orders"], tables["lineitem"]).collect()
    assert rows
    for r in rows:
        assert r["approx_within_5pct"] is True, r
        assert r["exact_parts"] > 0


def test_filter_pushdown_reaches_parquet_scan(spark, tables):
    """Predicate pushdown evidence: a filtered scan must carry
    PushedFilters in the parquet scan node, and column pruning must
    narrow ReadSchema to the selected columns."""
    df = tables["orders"].filter(F.col("o_custkey") == 42).select("o_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_custkey" in plan.split("PushedFilters")[1][:200]
    schema_part = plan.split("ReadSchema")[1][:200]
    assert "o_orderkey" in schema_part and "o_totalprice" not in schema_part


def test_broadcast_join_used_for_dims(spark, tables):
    """Star joins must broadcast the dimension side, not shuffle it."""
    from mmw_geoprocessing_spark.operators.relational import revenue_by_region

    t = tables
    df = revenue_by_region(t["lineitem"], t["orders"], t["customer"], t["nation"], t["region"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_topk_plans_take_ordered(spark, tables):
    """orderBy().limit(k) must plan TakeOrderedAndProject (heap-based
    top-k), not a global sort."""
    from mmw_geoprocessing_spark.operators.relational import top_customers_by_revenue

    t = tables
    df = top_customers_by_revenue(t["lineitem"], t["orders"], t["customer"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_pandas_udf_bucket_range(spark, tables):
    rows = rex.pandas_udf_showcase(tables["orders"]).collect()
    assert rows and all(0 <= r["bucket"] <= 50 for r in rows)


def test_correlated_subquery_decorrelates(spark, tables):
    """The correlated scalar subquery must decorrelate into a join —
    no per-row subquery execution in the physical plan."""
    df = rex.correlated_subquery(spark, tables["customer"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Subquery" not in plan  # decorrelated to aggregate + join
    assert df.count() > 0


def test_grouped_zscore_applyinpandas(spark, tables):
    """Grouped-map applyInPandas surface: z-scores are mean-0/std-1 per
    group and match a window-function reference within float tolerance."""
    from pyspark.sql import Window

    out = rex.grouped_zscore(tables["orders"])
    stats = (
        out.groupBy("o_orderpriority")
        .agg(
            F.avg("zscore").alias("mu"),
            F.stddev_pop("zscore").alias("sd"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert stats
    for r in stats:
        assert abs(r["mu"]) < 1e-9 and abs(r["sd"] - 1.0) < 1e-9 and r["n"] > 1

    # spot-check against a JVM-side window reference
    w = Window.partitionBy("o_orderpriority")
    ref = tables["orders"].select(
        "o_orderkey",
        ((F.col("o_totalprice") - F.avg("o_totalprice").over(w))
         / F.stddev_pop("o_totalprice").over(w)).alias("ref_z"),
    )
    joined = out.join(ref, "o_orderkey")
    max_diff = joined.agg(F.max(F.abs(F.col("zscore") - F.col("ref_z")))).collect()[0][0]
    assert max_diff < 1e-6


def test_retention_cohorts_matches_oracle(spark, tables, duck):
    import pandas as pd

    out = (
        rex.retention_cohorts(tables["orders"])
        .toPandas()
        .sort_values(["cohort_month", "month_offset"])
        .reset_index(drop=True)
    )
    want = (
        duck.execute(rex.retention_cohorts_sql())
        .df()
        .sort_values(["cohort_month", "month_offset"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_retention_cohorts_semantics(spark, tables):
    """Offset-0 retention is exactly 1.0 (every cohort member is active
    in their first month by definition), n_active never exceeds
    n_cohort, offsets are non-negative, and cohort sizes sum to the
    number of distinct customers."""
    out = rex.retention_cohorts(tables["orders"]).toPandas()
    zero = out[out.month_offset == 0]
    assert set(zero.cohort_month) == set(out.cohort_month)
    assert (zero.n_active == zero.n_cohort).all()
    assert (zero.retention == 1.0).all()
    assert (out.n_active <= out.n_cohort).all()
    assert (out.month_offset >= 0).all()
    n_cust = tables["orders"].select("o_custkey").distinct().count()
    assert zero.n_cohort.sum() == n_cust


def test_funnel_conversion_matches_oracle(spark, tables, duck):
    import pandas as pd

    out = rex.funnel_conversion(tables["events"]).toPandas().sort_values("step").reset_index(drop=True)
    want = duck.execute(rex.funnel_conversion_sql()).df().sort_values("step").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    # monotone shrinkage and step-1 conversion exactly 1.0
    assert (out.n_users.diff().dropna() <= 0).all()
    assert out.iloc[0].conversion == 1.0


def test_funnel_strict_after_semantics(spark):
    """A user whose step-2 event precedes (or ties) their first step-1
    event must NOT advance; a properly ordered user advances through
    all steps."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1: view -> click -> purchase, strictly increasing
        (1, t0, 1, "view", 0.0, ""),
        (2, t0 + s, 1, "click", 0.0, ""),
        (3, t0 + 2 * s, 1, "purchase", 0.0, ""),
        # user 2: click BEFORE view -> stalls at step 1
        (4, t0, 2, "click", 0.0, ""),
        (5, t0 + s, 2, "view", 0.0, ""),
        # user 3: click ties the first view timestamp -> stalls (strict >)
        (6, t0, 3, "view", 0.0, ""),
        (7, t0, 3, "click", 0.0, ""),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {r["step"]: r["n_users"] for r in rex.funnel_conversion(ev).collect()}
    assert out[1] == 3 and out[2] == 1 and out[3] == 1


def test_basket_pair_affinities_matches_oracle(spark, tables, duck):
    import pandas as pd

    out = (
        rex.basket_pair_affinities(tables["lineitem"])
        .toPandas()
        .sort_values(["p1", "p2"])
        .reset_index(drop=True)
    )
    want = (
        duck.execute(rex.basket_pair_affinities_sql())
        .df()
        .sort_values(["p1", "p2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    assert (out.p1 < out.p2).all()
    assert (out.pair_orders >= 3).all()
    # pair support can never exceed either item's own order count
    assert (out.pair_orders <= out.orders1).all()
    assert (out.pair_orders <= out.orders2).all()


def test_basket_pair_lift_semantics(spark):
    """Planted baskets: a pair always bought together has lift
    n_orders / orders1 (here > 1); items never co-bought are absent."""
    rows = []
    # orders 1-4: parts (10, 20) always together; order 5-6: part 30 alone
    for ok in (1, 2, 3, 4):
        rows += [(ok, 10), (ok, 20)]
    rows += [(5, 30), (6, 30)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = rex.basket_pair_affinities(li, min_support=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["p1"], r["p2"], r["pair_orders"]) == (10, 20, 4)
    # lift = 6 total orders * 4 pair / (4 * 4) = 1.5
    assert r["lift"] == 1.5
