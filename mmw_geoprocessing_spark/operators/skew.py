"""Skew-mitigated join: salting a hot key across reducers.

The classic 100 TB failure mode: one join key holds a third of the
fact table, so a plain hash join sends a third of the data to ONE
reducer task (stragglers, spill, OOM). The two production answers are
AQE's skew-join split (enabled session-wide here; it splits oversized
SHUFFLE PARTITIONS after the map stage) and explicit SALTING, which
this operator demonstrates end-to-end with a result that is provably
identical to the plain join:

- fact side: ``salt = h28(row key) % S`` — the hot key's rows spread
  uniformly over S sub-keys;
- dim side: each row replicated S times (a ``S x |dim|`` explode — the
  price, which is why salting suits small-ish dims and hot FACTS);
- join on ``(key, salt)``: every fact row still meets exactly one
  replica of its dim row, so the join result — and any aggregate over
  it — is bit-identical to the unsalted join, while the hot key's rows
  now land on S reducers instead of one.

Skew is SYNTHESIZED deterministically (o_orderkey % 3 = 0 -> custkey 1
becomes ~33% of the fact side — the fixture's uniform TPC-H keys have
no natural skew), so both engines derive the identical skewed input
and the DuckDB twin replays the plain-join semantics.

The join is hinted SHUFFLE_HASH on the dim side: at fixture scale
Catalyst would broadcast the dim (collapsing the demonstration —
broadcast joins don't shuffle the fact side at all and are the FIRST
answer to skew when the dim fits); the hint forces the
shuffle-partitioned plan whose salted exchange tests/test_curation.py
asserts. Money is aggregated as exact BIGINT cents (the money-guard
discipline), so the grouped sums value-hash cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.functions.text import H28_SQL, h28

N_SALTS = 8
HOT_MOD = 3  # o_orderkey % 3 == 0 -> remapped to the hot key
HOT_KEY = 1


def _skewed_fact(orders: DataFrame) -> DataFrame:
    """Deterministically skew the fact side: a third of all orders
    remap to customer ``HOT_KEY``."""
    return orders.select(
        F.when(F.col("o_orderkey") % HOT_MOD == 0, F.lit(HOT_KEY).cast("bigint"))
        .otherwise(F.col("o_custkey"))
        .alias("cust_k"),
        "o_orderkey",
        "o_totalprice",
    )


def skew_join_salted(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Per-segment order rollup through the SALTED join. Output:
    ``(c_mktsegment, n_orders, sum_price_cents)`` — identical to the
    plain-join rollup (the oracle), computed via the skew-proof plan.
    """
    fact = _skewed_fact(orders).withColumn(
        "salt", (h28(F.col("o_orderkey").cast("string")) % N_SALTS).cast("int")
    )
    dim = (
        customer.select("c_custkey", "c_mktsegment")
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALTS)])))
        .hint("SHUFFLE_HASH")
    )
    joined = fact.join(
        dim,
        (fact["cust_k"] == dim["c_custkey"]) & (fact["salt"] == dim["salt"]),
        "inner",
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "sum_price_cents"
            ),
        )
    )


def skew_join_salted_sql() -> str:
    """DuckDB twin: the PLAIN join over the same synthesized skew —
    salting must be invisible in the result."""
    return f"""
    WITH fact AS (
        SELECT CASE WHEN o_orderkey % {HOT_MOD} = 0
                    THEN CAST({HOT_KEY} AS BIGINT) ELSE o_custkey END AS cust_k,
               o_totalprice
        FROM orders
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_price_cents
    FROM fact JOIN customer ON cust_k = c_custkey
    GROUP BY c_mktsegment
    """
