"""BIGINT-cents overflow guard (relational.py module docstring).

Pins the three-part contract:
1. the guard's plan-statistics decision flips exactly at the documented
   bound (no action executed to decide);
2. both accumulator paths produce the identical double on safe data;
3. at the boundary the BIGINT path fails (ANSI overflow — loud, not a
   silent wrap) while the guarded DECIMAL(38,0) path returns the exact
   sum.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mmw_geoprocessing_spark.operators import relational as rel


def _flip_rows(scale: int) -> float:
    g = rel._MONEY_GUARD
    return rel._BIGINT_MAX / g["safety"] / (g["row_bound"] * scale)


def test_guard_decision_is_stats_based_and_flips_at_bound(spark):
    """spark.range reports 8 bytes/row in plan stats -> est_rows = 2x
    rows; the decision must flip between just-under and just-over the
    documented threshold, without running a job."""
    rows_at_flip = _flip_rows(1000000) / 2  # est_rows = 2x range rows
    small = spark.range(int(rows_at_flip * 0.9))
    big = spark.range(int(rows_at_flip * 1.1))
    assert not rel.money_sum_overflow_possible(small, 1000000)
    assert rel.money_sum_overflow_possible(big, 1000000)
    # scale participates in the bound: the same source can be safe at
    # scale 100 and unsafe at scale 10^6
    assert not rel.money_sum_overflow_possible(big, 100)


def test_fixture_tables_stay_on_bigint_fast_path(spark, tables):
    """The benched sf regime must keep the primitive-long accumulator."""
    assert not rel.money_sum_overflow_possible(tables["lineitem"], 1000000)


def test_both_paths_identical_on_safe_data(spark, tables):
    """Forcing the DECIMAL path (via a huge-stats source) must produce
    the bit-identical double: same per-row integers, wider accumulator."""
    li = tables["lineitem"]
    huge = spark.range(10**15)  # stats-only overflow trigger
    fast = li.agg(rel._sum_money(F.col("l_extendedprice"), 100).alias("s")).first()["s"]
    wide = li.agg(
        rel._sum_money(F.col("l_extendedprice"), 100, source=huge).alias("s")
    ).first()["s"]
    assert fast == wide


def test_boundary_overflow_bigint_raises_decimal_exact(spark):
    """Two rows whose cents sum to 9.6e18 (> 2^63-1): the unguarded
    BIGINT accumulator overflows loudly under ANSI; the guarded path
    returns the exact value."""
    df = spark.createDataFrame([(4.8e16,), (4.8e16,)], "v double")
    unguarded = df.agg(rel._sum_money(F.col("v"), 100).alias("s"))
    try:
        unguarded.collect()
        raised = False
    except Exception as e:
        raised = "ARITHMETIC_OVERFLOW" in str(e) or "overflow" in str(e).lower()
    assert raised, "expected loud ANSI overflow on the unguarded BIGINT path"
    guarded = df.agg(
        rel._sum_money(F.col("v"), 100, source=spark.range(10**15)).alias("s")
    ).first()["s"]
    assert guarded == 9.6e16


def test_top_customers_upper_level_widens(spark, tables):
    """The two-level pre-aggregation widens its upper accumulator under
    the same guard: result parity between modes on fixture data."""
    li, orders, cust = tables["lineitem"], tables["orders"], tables["customer"]
    base = rel.top_customers_by_revenue(li, orders, cust).collect()
    g = rel._MONEY_GUARD
    prev = g["row_bound"]
    g["row_bound"] = 1e18  # force wide upper level
    try:
        wide = rel.top_customers_by_revenue(li, orders, cust).collect()
    finally:
        g["row_bound"] = prev
    assert [r.asDict() for r in base] == [r.asDict() for r in wide]
