"""Fixed-point PageRank: oracle parity, exact determinism, semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from mmw_geoprocessing_spark.operators import graph as G


def _spark_result(spark, tables):
    return {
        (r["node_id"], r["rank_micro"])
        for r in G.pagerank_trade_graph(tables["orders"], tables["lineitem"]).collect()
    }


def test_pagerank_matches_duckdb_oracle(spark, tables, duck):
    got = _spark_result(spark, tables)
    want = {tuple(r) for r in duck.execute(G.pagerank_trade_graph_sql()).fetchall()}
    assert got == want
    assert len(got) > 0


def test_pagerank_partitioning_invariant(spark, tables):
    """Bigint micro-unit arithmetic is commutative: any repartitioning
    produces the identical rank table (the float version would not)."""
    base = _spark_result(spark, tables)
    edges = G.trade_edges(tables["orders"], tables["lineitem"]).repartition(17)
    skewed = {
        (r["node_id"], r["rank_micro"])
        for r in G.pagerank_fixed_point(edges).collect()
    }
    assert base == skewed


def test_pagerank_degree_monotone(spark, tables):
    """A supplier trading with many customers must outrank one trading
    with few: in-flow is a sum over in-edges of positive contributions."""
    ranks = G.pagerank_trade_graph(tables["orders"], tables["lineitem"])
    deg = (
        G.trade_edges(tables["orders"], tables["lineitem"])
        .groupBy("dst")
        .count()
        .withColumnRenamed("dst", "node_id")
    )
    suppliers = (
        ranks.join(deg, "node_id")
        .filter(F.col("node_id") % 2 == 1)
        .orderBy(F.col("count").desc())
        .collect()
    )
    hi, lo = suppliers[0], suppliers[-1]
    assert hi["count"] > lo["count"]
    assert hi["rank_micro"] > lo["rank_micro"]


def test_pagerank_directed_teleport_floor(spark):
    """Directed chain a→b→c: the source node has no in-edges and must
    sit exactly at the teleport floor; no node is dropped."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 3)], "src long, dst long"
    )
    out = {r["node_id"]: r["rank_micro"] for r in G.pagerank_fixed_point(edges, 2).collect()}
    assert out[1] == G.TELEPORT_MICRO
    assert set(out) == {1, 2, 3}
    assert out[3] > out[2] > out[1]


def test_pagerank_plan_no_cartesian(spark, tables):
    plan = G.pagerank_trade_graph(
        tables["orders"], tables["lineitem"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
