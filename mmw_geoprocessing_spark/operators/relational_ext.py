"""Relational surface extensions — the remaining SURVEY.md §2.3 rows:
advanced window frames and rank families, exact percentiles, ordered
string aggregation, min_by/max_by, FILTER-clause conditional aggregates,
correlated scalar subqueries (Catalyst decorrelation), cross join, and
the user-extensible UDF surface (Arrow-vectorized pandas UDF with an
arithmetic contract an oracle can replay).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def window_rank_family(orders: DataFrame) -> DataFrame:
    """rank/dense_rank/ntile/percent_rank/cume_dist in one pass.
    percent_rank/cume_dist are exact integer ratios -> cross-engine safe.
    """
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


def window_rank_family_sql() -> str:
    return """
    SELECT o_orderpriority, o_orderkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS prank,
           CUME_DIST() OVER w AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """


def window_range_frame(orders: DataFrame) -> DataFrame:
    """RANGE frame: per customer, count of their orders within the
    trailing 30-day value range of the current order date (epoch-day
    ordering so RANGE arithmetic is integer)."""
    day = F.datediff(F.col("o_orderdate"), F.lit("1990-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("orders_trailing_30d"),
    )


def window_range_frame_sql() -> str:
    return """
    SELECT o_custkey, o_orderkey,
           COUNT(*) OVER (PARTITION BY o_custkey
                          ORDER BY DATE_DIFF('day', DATE '1990-01-01', o_orderdate)
                          RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS orders_trailing_30d
    FROM orders
    """


def window_first_last(orders: DataFrame) -> DataFrame:
    """first_value/last_value over an explicit full-partition frame."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    )


def window_first_last_sql() -> str:
    return """
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER w AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """


def windows_showcase(orders: DataFrame) -> DataFrame:
    """The full advanced-window surface in ONE pass over orders: the rank
    family, a trailing RANGE frame, and first/last over an explicit
    full-partition frame — three distinct window specs, one shuffle set.
    (Single-query consolidation of window_rank_family / window_range_frame
    / window_first_last so the driver's correctness gate covers all of
    them in one row.)"""
    ranked = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    day = F.datediff(F.col("o_orderdate"), F.lit("1990-01-01"))
    trailing = Window.partitionBy("o_custkey").orderBy(day).rangeBetween(-30, Window.currentRow)
    full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.rank().over(ranked).alias("rnk"),
        F.dense_rank().over(ranked).alias("drnk"),
        F.ntile(4).over(ranked).alias("quartile"),
        F.percent_rank().over(ranked).alias("prank"),
        F.cume_dist().over(ranked).alias("cdist"),
        F.count(F.lit(1)).over(trailing).alias("orders_trailing_30d"),
        F.first("o_orderkey").over(full).alias("first_order"),
        F.last("o_orderkey").over(full).alias("last_order"),
    )


def windows_showcase_sql() -> str:
    return """
    SELECT o_orderpriority, o_orderkey,
           RANK() OVER wr AS rnk,
           DENSE_RANK() OVER wr AS drnk,
           NTILE(4) OVER wr AS quartile,
           PERCENT_RANK() OVER wr AS prank,
           CUME_DIST() OVER wr AS cdist,
           COUNT(*) OVER (PARTITION BY o_custkey
                          ORDER BY DATE_DIFF('day', DATE '1990-01-01', o_orderdate)
                          RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS orders_trailing_30d,
           FIRST_VALUE(o_orderkey) OVER wf AS first_order,
           LAST_VALUE(o_orderkey) OVER wf AS last_order
    FROM orders
    WINDOW wr AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
           wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """


def aggregate_variants(orders: DataFrame) -> DataFrame:
    """One grouped aggregate exercising the whole advanced-aggregate
    surface: exact DISTINCT, interpolated percentiles, argmin/argmax
    (decimal-packed ordering key — DuckDB's arg_max can't order by a
    struct, so the unique key is price_cents * 10^12 + orderkey in
    DECIMAL(35,0)/HUGEINT: exact up to orderkey < 10^12, i.e. TPC-H
    sf ~160k, vs the old BIGINT packing that overflowed at sf 1.7), and
    FILTER-clause conditional aggregation. (Single-query consolidation
    of distinct_counts / exact_percentiles / min_by_max_by /
    conditional_aggregates for the driver gate.)"""
    argkey = F.expr(
        "CAST(ROUND(o_totalprice * 100) AS DECIMAL(20,0))"
        " * CAST(1000000000000 AS DECIMAL(13,0))"
        " + CAST(o_orderkey AS DECIMAL(20,0))"
    )
    hi = F.col("o_totalprice") > 150000
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("distinct_customers"),
        F.count(F.lit(1)).alias("n_rows"),
        F.percentile(F.col("o_totalprice"), F.lit(0.5)).alias("p50"),
        F.percentile(F.col("o_totalprice"), F.lit(0.9)).alias("p90"),
        F.percentile(F.col("o_totalprice"), F.lit(0.99)).alias("p99"),
        F.max_by("o_orderkey", argkey).alias("biggest_order"),
        F.min_by("o_orderkey", argkey).alias("smallest_order"),
        F.count(F.when(hi, 1)).alias("hi_value_rows"),
        (
            F.sum(F.when(hi, F.round(F.col("o_totalprice") * F.lit(100.0)).cast("bigint")))
            .cast("double") / F.lit(100.0)
        ).alias("hi_value_total"),
    )


def aggregate_variants_sql() -> str:
    return """
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS distinct_customers,
           COUNT(*) AS n_rows,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90,
           quantile_cont(o_totalprice, 0.99) AS p99,
           arg_max(o_orderkey, CAST(ROUND(o_totalprice * 100) AS HUGEINT) * 1000000000000 + o_orderkey) AS biggest_order,
           arg_min(o_orderkey, CAST(ROUND(o_totalprice * 100) AS HUGEINT) * 1000000000000 + o_orderkey) AS smallest_order,
           COUNT(*) FILTER (WHERE o_totalprice > 150000) AS hi_value_rows,
           CAST(SUM(CAST(ROUND((o_totalprice) * 100.0) AS BIGINT))
                FILTER (WHERE o_totalprice > 150000) AS DOUBLE) / 100.0 AS hi_value_total
    FROM orders GROUP BY o_orderpriority
    """


def exact_percentiles(orders: DataFrame) -> DataFrame:
    """Exact (interpolated) percentiles — Spark ``percentile`` and DuckDB
    ``quantile_cont`` share the (n-1)*p linear-interpolation definition."""
    return orders.groupBy("o_orderpriority").agg(
        F.percentile(F.col("o_totalprice"), F.lit(0.5)).alias("p50"),
        F.percentile(F.col("o_totalprice"), F.lit(0.9)).alias("p90"),
        F.percentile(F.col("o_totalprice"), F.lit(0.99)).alias("p99"),
    )


def exact_percentiles_sql() -> str:
    return """
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90,
           quantile_cont(o_totalprice, 0.99) AS p99
    FROM orders GROUP BY o_orderpriority
    """


def approx_distinct(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """HyperLogLog++ approximate distinct. Engine-specific sketch values
    can't hash-match a DuckDB oracle, so the driver-checkable contract is
    the *relative error bound*: the query emits the exact count plus a
    boolean asserting the sketch landed within 5% of it — the oracle
    emits the exact count and a literal TRUE. A drifting sketch flips
    the boolean and fails the hash."""
    joined = lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("_approx"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "o_orderstatus",
            "exact_parts",
            (
                F.abs(F.col("_approx") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            ).alias("approx_within_5pct"),
        )
    )


def approx_distinct_sql() -> str:
    return """
    SELECT o_orderstatus,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_within_5pct
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """


def string_agg_ordered(customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Ordered string aggregation: lexicographically sorted customer list
    per nation (collect_list -> array_sort -> array_join ==
    string_agg(... ORDER BY ...))."""
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(F.col("c_custkey") < 100)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("members"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


def string_agg_ordered_sql() -> str:
    return """
    SELECT n_name, string_agg(c_name, ',' ORDER BY c_name) AS members,
           COUNT(*) AS n_members
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey < 100
    GROUP BY n_name
    """


def min_by_max_by(orders: DataFrame) -> DataFrame:
    """Argmin/argmax aggregation (min_by/max_by). Duplicate prices would
    make the argmax engine-dependent, so the ordering key is the unique
    composite price_cents * 10^12 + orderkey packed in DECIMAL(35,0)
    (HUGEINT on the DuckDB side — struct ordering isn't supported by
    DuckDB's arg_max). Exact while orderkey < 10^12 (TPC-H sf ~160k);
    the old BIGINT packing overflowed at sf 1.7."""
    key = F.expr(
        "CAST(ROUND(o_totalprice * 100) AS DECIMAL(20,0))"
        " * CAST(1000000000000 AS DECIMAL(13,0))"
        " + CAST(o_orderkey AS DECIMAL(20,0))"
    )
    return orders.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", key).alias("biggest_order"),
        F.min_by("o_orderkey", key).alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
    )


def min_by_max_by_sql() -> str:
    return """
    SELECT o_orderpriority,
           arg_max(o_orderkey, CAST(ROUND(o_totalprice * 100) AS HUGEINT) * 1000000000000 + o_orderkey) AS biggest_order,
           arg_min(o_orderkey, CAST(ROUND(o_totalprice * 100) AS HUGEINT) * 1000000000000 + o_orderkey) AS smallest_order,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderpriority
    """


def conditional_aggregates(lineitem: DataFrame) -> DataFrame:
    """FILTER-clause style conditional aggregation via sum(when(...))."""
    disc = F.col("l_discount")
    return lineitem.groupBy("l_returnflag").agg(
        F.count(F.when(disc > 0.05, 1)).alias("hi_discount_rows"),
        F.count(F.when(disc <= 0.05, 1)).alias("lo_discount_rows"),
        (
            F.sum(F.when(disc > 0.05, F.round(F.col("l_quantity") * F.lit(100.0)).cast("bigint")))
            .cast("double") / F.lit(100.0)
        ).alias("hi_discount_qty"),
    )


def conditional_aggregates_sql() -> str:
    return """
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS hi_discount_rows,
           COUNT(*) FILTER (WHERE l_discount <= 0.05) AS lo_discount_rows,
           CAST(SUM(CAST(ROUND((l_quantity) * 100.0) AS BIGINT)) FILTER (WHERE l_discount > 0.05) AS DOUBLE) / 100.0 AS hi_discount_qty
    FROM lineitem GROUP BY l_returnflag
    """


def correlated_subquery(spark, customer: DataFrame) -> DataFrame:
    """Correlated scalar subquery: customers above their nation's average
    balance. Catalyst decorrelates this into a join + aggregate."""
    customer.createOrReplaceTempView("_cs_customer")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM _cs_customer o
        WHERE c_acctbal > (SELECT AVG(i.c_acctbal) FROM _cs_customer i
                           WHERE i.c_nationkey = o.c_nationkey)
        """
    )


def correlated_subquery_sql() -> str:
    return """
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer o
    WHERE c_acctbal > (SELECT AVG(i.c_acctbal) FROM customer i
                       WHERE i.c_nationkey = o.c_nationkey)
    """


def cross_join_dims(region: DataFrame, nation: DataFrame) -> DataFrame:
    """Explicit cartesian product of two dimensions."""
    return (
        region.crossJoin(nation.select("n_name"))
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("combos"))
    )


def cross_join_dims_sql() -> str:
    return """
    SELECT r_name, COUNT(*) AS combos
    FROM region CROSS JOIN (SELECT n_name FROM nation)
    GROUP BY r_name
    """


def _price_bucket_udf():
    """Arrow-vectorized scalar UDF: deterministic bucketing arithmetic
    (the user-extensible function surface; reference has none —
    WebServer.scala:78-93 is a fixed dispatch table). Built lazily:
    pandas_udf registration needs an active SparkSession."""

    @pandas_udf("double")
    def _price_bucket(price: pd.Series) -> pd.Series:
        return (price / 10000.0).clip(upper=50).round(0)

    return _price_bucket


def pandas_udf_showcase(orders: DataFrame) -> DataFrame:
    """A pandas UDF in a grouped pipeline: bucket prices, aggregate.
    The UDF body is pure arithmetic, so DuckDB replays it exactly."""
    return (
        orders.withColumn("bucket", _price_bucket_udf()(F.col("o_totalprice")))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum(F.round(F.col("o_totalprice") * F.lit(100.0)).cast("bigint"))
                .cast("double") / F.lit(100.0)
            ).alias("total"),
        )
    )


def pandas_udf_showcase_sql() -> str:
    # pandas .round() is banker's rounding (round-half-even); DuckDB ROUND
    # on doubles is also round-half-even via its double rounding — but to
    # be tie-safe the bucket boundary values (x.5) are avoided by the
    # 1e-4-precision prices divided by 1e4 landing exactly on .5 only for
    # exact multiples of 5000, which ROUND_HALF_EVEN handles identically
    # in numpy and DuckDB's roundeven.
    return """
    SELECT LEAST(round_even(o_totalprice / 10000.0, 0), 50) AS bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND((o_totalprice) * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS total
    FROM orders GROUP BY 1
    """


def grouped_zscore(orders: DataFrame) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-priority z-scores of order
    totals — the remaining UDF-surface shape (scalar pandas_udf, UDTF,
    mapInPandas, applyInPandasWithState are covered elsewhere). Each
    group arrives as one pandas DataFrame; stats are computed with
    numpy inside the Arrow batch. Deterministic contract is pinned in
    pytest against a Spark-side reference (population std), not the
    DuckDB oracle — float mean/std are summation-order-dependent.
    Output: ``(o_orderkey, o_orderpriority, zscore)``.
    """
    import pandas as pd

    def z(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["o_totalprice"]
        std = x.std(ddof=0)
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_orderpriority": pdf["o_orderpriority"],
                "zscore": (x - x.mean()) / (std if std else 1.0),
            }
        )

    return (
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .groupBy("o_orderpriority")
        .applyInPandas(z, "o_orderkey long, o_orderpriority string, zscore double")
    )


def regexp_functions_showcase(part: DataFrame) -> DataFrame:
    """Regexp scalar family: capture-group extraction, global replace,
    and pattern predicates — all JVM-side."""
    return part.filter(F.col("p_partkey") < 100).select(
        "p_partkey",
        F.regexp_extract(F.col("p_name"), r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace(F.col("p_name"), r"[aeiou]", "_").alias("devoweled"),
        F.col("p_type").rlike("ECONOMY|PROMO").cast("int").alias("is_econ_promo"),
        F.regexp_count(F.col("p_name"), F.lit(r"\w+")).alias("word_count"),
    )


def regexp_functions_showcase_sql() -> str:
    return r"""
    SELECT p_partkey,
           regexp_extract(p_name, '^(\w+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           CAST(regexp_matches(p_type, 'ECONOMY|PROMO') AS INT) AS is_econ_promo,
           CAST(len(regexp_extract_all(p_name, '\w+')) AS INT) AS word_count
    FROM part WHERE p_partkey < 100
    """


def sessionize_events(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Gap-based batch sessionization: split each user's event stream
    into sessions wherever consecutive events are more than ``gap_s``
    apart, then aggregate one row per session.

    The batch twin of the streaming session windows
    (streaming/windows.py): same gap semantics, runs over the full
    history. Output: ``(user_id, session_id, session_start,
    session_end, n_events, n_event_types, duration_s)``.

    Determinism: the per-user order is (ts, event_id) — a total order —
    and every output is exact (counts, min/max timestamps, integer
    microsecond arithmetic), so the result value-hashes cross-engine.

    100 TB shape: ONE shuffle on user_id serves both the lag/cumsum
    window and the final per-(user, session) aggregation —
    HashPartitioning(user_id) satisfies the clustering the groupBy
    needs (session ids nest within users), so Catalyst inserts no
    second exchange. Per-user state is a single pass; no skew beyond
    the per-user event count itself (a power user is one partition's
    sequential scan, not a hot join key).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(us).over(w)
    new_sess = (
        prev_us.isNull() | ((us - prev_us) > F.lit(gap_s * 1_000_000))
    ).cast("bigint")
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tagged = events.withColumn("session_id", F.sum(new_sess).over(cum))
    return tagged.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.expr(
            "(unix_micros(max(ts)) - unix_micros(min(ts))) DIV 1000000"
        ).alias("duration_s"),
    )


def sessionize_events_sql(gap_s: int = 1800) -> str:
    """DuckDB twin: identical (ts, event_id) order, gap flag, running
    sum session id, per-session aggregate."""
    return f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                            > {gap_s} * 1000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
        SELECT *, CAST(SUM(new_sess) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types,
           (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS duration_s
    FROM tagged GROUP BY user_id, session_id
    """


def retention_cohorts(orders: DataFrame) -> DataFrame:
    """Cohort retention analysis — the standard product-analytics
    rollup: customers grouped by FIRST-order month (their cohort), and
    for each (cohort, months-since-cohort) offset the count of distinct
    cohort customers still active, plus the retention fraction.

    Output: ``(cohort_month, month_offset, n_cohort, n_active,
    retention)`` — exact integers plus one division (offset 0 rows
    read retention 1.0 by construction).

    100 TB shape: one scan reduced immediately to DISTINCT (customer,
    month); the cohort month rides a ``min() over (partition by
    customer)`` window on that reduced table — NO corpus-sized
    first-order join exists — and the per-(cohort, offset) aggregate is
    |cohorts·offsets| ≈ thousands of rows. Cohort sizes need no
    separate aggregation either: they ARE the offset-0 counts (every
    cohort member is active in their first month by definition), so the
    denominator comes from a broadcast self-join of the tiny rollup
    with its own offset-0 slice. 3 exchanges total, all on shrinking
    data. Month arithmetic is integer (y*12+m), immune to
    calendar/timezone float traps on both engines.
    """
    from pyspark.sql import Window

    midx = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).cast("bigint")
    per = orders.select(
        "o_custkey", midx.alias("midx")
    ).distinct()
    cohort = F.min("midx").over(Window.partitionBy("o_custkey"))
    active = (
        per.withColumn("cohort_idx", cohort)
        .groupBy("cohort_idx", (F.col("midx") - F.col("cohort_idx")).alias("month_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))  # (cust, midx) distinct already
    )
    sizes = active.filter(F.col("month_offset") == 0).select(
        "cohort_idx", F.col("n_active").alias("n_cohort")
    )
    return (
        active.join(F.broadcast(sizes), "cohort_idx")
        .select(
            F.concat_ws(
                "-",
                (F.col("cohort_idx") / 12).cast("bigint").cast("string"),
                F.lpad((F.col("cohort_idx") % 12 + 1).cast("string"), 2, "0"),
            ).alias("cohort_month"),
            "month_offset",
            "n_cohort",
            "n_active",
            (F.col("n_active") / F.col("n_cohort").cast("double")).alias("retention"),
        )
    )


def retention_cohorts_sql(table: str = "orders") -> str:
    """DuckDB twin: identical integer month index, min-cohort,
    offset aggregation, one division."""
    return f"""
    WITH per AS (
        SELECT DISTINCT o_custkey,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS midx
        FROM {table}
    ),
    first_m AS (
        SELECT o_custkey, MIN(midx) AS cohort_idx FROM per GROUP BY 1
    ),
    sizes AS (
        SELECT cohort_idx, CAST(COUNT(*) AS BIGINT) AS n_cohort
        FROM first_m GROUP BY 1
    ),
    active AS (
        SELECT cohort_idx, midx - cohort_idx AS month_offset,
               CAST(COUNT(*) AS BIGINT) AS n_active
        FROM per JOIN first_m USING (o_custkey)
        GROUP BY 1, 2
    )
    SELECT CAST(cohort_idx // 12 AS VARCHAR) || '-' ||
               lpad(CAST(cohort_idx % 12 + 1 AS VARCHAR), 2, '0') AS cohort_month,
           month_offset, n_cohort, n_active,
           n_active / CAST(n_cohort AS DOUBLE) AS retention
    FROM active JOIN sizes USING (cohort_idx)
    """


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_conversion(
    events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """Ordered funnel analysis: how many users performed step 1, then
    step 2 STRICTLY AFTER their first step-1 event, then step 3 after
    that, ... (the other canonical event-analytics rollup next to
    sessionization).

    Semantics: a user advances to step i+1 iff they have a step-(i+1)
    event with ``ts > `` their EARLIEST qualifying step-i time (the
    standard first-touch funnel; ties at identical timestamps do not
    advance). Output: ``(step, step_name, n_users, conversion)`` — one
    row per step, conversion relative to step 1, exact counts + one
    division.

    100 TB shape: each step is one pushed-down ``event_type`` filter
    over the events scan (never the full table in memory), a per-user
    min-aggregate, and a user-keyed join against the previous step's
    (user, t) frame — which only SHRINKS down the funnel, so every join
    after step 1 has a small build side (AQE broadcasts it). The chain
    reuses HashPartitioning(user_id) across steps; final counts are
    1-row aggregates unioned driver-free.
    """
    prev: DataFrame | None = None
    rows = []
    for i, st in enumerate(steps):
        f = events.filter(F.col("event_type") == st)
        if prev is not None:
            f = f.join(prev, "user_id").filter(F.col("ts") > F.col("t"))
        cur = f.groupBy("user_id").agg(F.min("ts").alias("t"))
        rows.append(
            cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).cast("bigint").alias("step"),
                F.lit(st).alias("step_name"),
                "n_users",
            )
        )
        prev = cur
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    first = rows[0].select(F.col("n_users").alias("n_first"))
    return out.crossJoin(F.broadcast(first)).select(
        "step",
        "step_name",
        "n_users",
        (
            F.col("n_users") / F.greatest(F.col("n_first"), F.lit(1)).cast("double")
        ).alias("conversion"),
    )


def funnel_conversion_sql(
    steps: tuple[str, ...] = FUNNEL_STEPS, table: str = "events"
) -> str:
    """DuckDB twin: chained first-touch CTEs with the identical strict
    inequality and one division."""
    ctes = []
    for i, st in enumerate(steps):
        if i == 0:
            ctes.append(
                f"s1 AS (SELECT user_id, MIN(ts) AS t FROM {table} "
                f"WHERE event_type = '{st}' GROUP BY 1)"
            )
        else:
            ctes.append(
                f"s{i + 1} AS (SELECT e.user_id, MIN(e.ts) AS t FROM {table} e "
                f"JOIN s{i} USING (user_id) "
                f"WHERE e.event_type = '{st}' AND e.ts > s{i}.t GROUP BY 1)"
            )
    counts = " UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS step, '{st}' AS step_name, "
        f"CAST(COUNT(*) AS BIGINT) AS n_users FROM s{i + 1}"
        for i, st in enumerate(steps)
    )
    return f"""
    WITH {', '.join(ctes)},
    counts AS ({counts})
    SELECT step, step_name, n_users,
           n_users / CAST(greatest(
               (SELECT n_users FROM counts WHERE step = 1), 1) AS DOUBLE)
               AS conversion
    FROM counts
    """


def basket_pair_affinities(
    lineitem: DataFrame, min_support: int = 3
) -> DataFrame:
    """Market-basket co-occurrence mining: for every part pair bought
    together in at least ``min_support`` orders, the pair's support and
    lift (the association-rules staple).

    Output: ``(p1, p2, pair_orders, orders1, orders2, lift)`` with
    ``p1 < p2``; lift = |orders| · pair / (orders1 · orders2), one
    division of exact BIGINTs.

    100 TB shape: the classic self-join formulation shuffles the whole
    (order, part) table TWICE and joins it against itself; here the
    pair table is generated MAP-SIDE from per-order item arrays — one
    shuffle builds the sorted basket array per order (baskets are
    bounded: items-per-order is small and independent of corpus scale,
    so the i<j combination expansion is O(basket²) per row, not a
    join), then one partial+final hash agg on the pair key. Per-item
    order counts are a small broadcast; the 1-row order total rides a
    broadcast crossJoin (the corpus-totals pattern).
    """
    per = lineitem.select("l_orderkey", "l_partkey").distinct()
    baskets = per.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("items")
    )
    # i<j combinations, map-side: slice the tail of the sorted array
    # for each position (transform exposes the element index)
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("items"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("items"),
                            i + F.lit(2),
                            F.greatest(F.size("items") - i - 1, F.lit(0)),
                        ),
                        lambda y: F.struct(x.alias("p1"), y.alias("p2")),
                    ),
                )
            )
        ).alias("pr")
    ).select(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
    pair_counts = (
        pairs.groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("pair_orders"))
        .filter(F.col("pair_orders") >= min_support)
    )
    item_counts = per.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_ord")
    )
    totals = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    a = item_counts.select(F.col("l_partkey").alias("p1"), F.col("n_ord").alias("orders1"))
    b = item_counts.select(F.col("l_partkey").alias("p2"), F.col("n_ord").alias("orders2"))
    return (
        pair_counts.join(F.broadcast(a), "p1")
        .join(F.broadcast(b), "p2")
        .crossJoin(F.broadcast(totals))
        .select(
            "p1",
            "p2",
            "pair_orders",
            "orders1",
            "orders2",
            (
                (F.col("pair_orders") * F.col("n_orders"))
                / (F.col("orders1") * F.col("orders2")).cast("double")
            ).alias("lift"),
        )
    )


def basket_pair_affinities_sql(
    min_support: int = 3, table: str = "lineitem"
) -> str:
    """DuckDB twin: identical pair semantics via the i<j self-join over
    the distinct (order, part) table (the small-scale-friendly
    formulation; the Spark side's array expansion produces the same
    bag), identical integer lift."""
    return f"""
    WITH per AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM {table}
    ),
    pair_counts AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2,
               CAST(COUNT(*) AS BIGINT) AS pair_orders
        FROM per a JOIN per b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {min_support}
    ),
    item_counts AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_ord FROM per GROUP BY 1
    ),
    totals AS (
        SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM per
    )
    SELECT p1, p2, pair_orders, a.n_ord AS orders1, b.n_ord AS orders2,
           (pair_orders * n_orders) / CAST(a.n_ord * b.n_ord AS DOUBLE) AS lift
    FROM pair_counts
    JOIN item_counts a ON p1 = a.l_partkey
    JOIN item_counts b ON p2 = b.l_partkey
    CROSS JOIN totals
    """
