"""Iterative graph analytics: fixed-point PageRank over the
customer↔supplier trade graph.

The reference has no graph surface (its only "iteration" is the
per-request operator loop, Geoprocessing.scala:21-89); this module is
part of the capability extension the LLM-pipeline families need —
link-style importance scoring is the standard quality prior for web
corpora (crawl frontier ordering, document weighting), and the repo's
connected-components closure (operators/dedup.py:connected_components)
already covers the other half of the iterative-algorithm family.

Why FIXED-POINT (bigint micro-units) instead of float ranks: the
driver's correctness gate hash-compares values, and float PageRank is
order-dependent (a parallel sum of contributions associates
differently per partitioning). With ranks held in integer micro-units
and per-edge contributions computed by integer division
``(rank * 85) div (100 * out_degree)``, every operation is exact and
commutative, so Spark and the DuckDB oracle agree bit-for-bit at any
partitioning, any engine, any scale — the same determinism discipline
as the BIGINT-cents money rules (streaming/windows.py:_sum_value).

Scale shape (100 TB): each iteration is one equi-join of the edge list
with the |nodes|-row rank table plus one hash aggregate on dst — both
shuffle on node id, both AQE-splittable on hot nodes (a web graph's
in-degree is Zipfian; the dst-sum is a partial+final hash agg, so hot
destinations combine map-side). The edge list and degree table are
computed once and lineage-truncated (localCheckpoint) so K iterations
cost K joins, not a 2^K logical plan (the connected_components
lesson, dedup.py:714-717). No driver-side graph, no all-pairs.

Dangling-mass note: the trade graph is symmetrized (every edge is
paired with its reverse), so every node has out-degree ≥ 1 and the
dangling-node redistribution term of textbook PageRank is identically
zero here; a directed deployment adds the standard uniform
redistribution of dangling rank, which is one extra 1-row broadcast
aggregate per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# rank unit: 1.0 == 1_000_000 micro-units; damping 0.85 as the exact
# rational 85/100; teleport term 0.15 * 1e6 = 150_000
R0_MICRO = 1_000_000
TELEPORT_MICRO = 150_000


def trade_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Symmetric customer↔supplier edge list from the order flow.

    Node ids are disjoint by parity: customer c → node 2c, supplier s →
    node 2s+1. One distinct (custkey, suppkey) pair per trading
    relationship (unweighted); each pair contributes both directions.
    """
    pairs = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return pairs.unionAll(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def pagerank_fixed_point(edges: DataFrame, n_iters: int = 3) -> DataFrame:
    """``n_iters`` rounds of damped PageRank in exact bigint micro-units.

    rank⁰(v) = 1e6;
    rankᵏ(v) = 150_000 + Σ_{(u,v)∈E} (rankᵏ⁻¹(u) * 85) div (100 · deg(u))

    Output: ``(node_id BIGINT, rank_micro BIGINT)`` for every node.
    """
    edges = edges.localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # symmetric graph ⇒ every node appears as a src
    ranks = deg.select(
        F.col("src").alias("node_id"), F.lit(R0_MICRO).cast("bigint").alias("rank_micro")
    ).localCheckpoint()
    contrib_edges = edges.join(deg, "src").localCheckpoint()
    for _ in range(n_iters):
        contribs = (
            contrib_edges.join(
                ranks.select(F.col("node_id").alias("src"), "rank_micro"), "src"
            )
            .select(
                "dst",
                F.expr("(rank_micro * 85) div (100 * deg)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        # every node has in-edges (symmetric), but keep the left join +
        # coalesce so a directed edge list degrades to the teleport
        # floor instead of dropping nodes
        ranks = (
            ranks.select("node_id")
            .join(contribs.withColumnRenamed("dst", "node_id"), "node_id", "left")
            .select(
                "node_id",
                (F.lit(TELEPORT_MICRO) + F.coalesce("in_sum", F.lit(0)))
                .cast("bigint")
                .alias("rank_micro"),
            )
            .localCheckpoint()
        )
    return ranks


def pagerank_trade_graph(orders: DataFrame, lineitem: DataFrame, n_iters: int = 3) -> DataFrame:
    """Registry face: PageRank over the trade graph, full node set."""
    return pagerank_fixed_point(trade_edges(orders, lineitem), n_iters).select(
        "node_id", "rank_micro"
    )


def pagerank_trade_graph_sql(n_iters: int = 3) -> str:
    """DuckDB twin: the same fixed-point iterations unrolled as CTEs
    (n_iters is small and static; a recursive CTE would re-derive the
    edge list per round — the AS MATERIALIZED lesson, dedup.py:788).
    """
    if n_iters < 1:
        raise ValueError("n_iters must be >= 1")
    cte = [
        """
    pairs AS MATERIALIZED (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS MATERIALIZED (
      SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs
    ),
    deg AS MATERIALIZED (
      SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
    ),
    r0 AS (SELECT src AS node_id, CAST(1000000 AS BIGINT) AS rank_micro FROM deg)
    """
    ]
    for k in range(1, n_iters + 1):
        cte.append(
            f"""
    r{k} AS (
      SELECT d.src AS node_id,
             CAST(150000 + COALESCE(s.in_sum, 0) AS BIGINT) AS rank_micro
      FROM deg d
      LEFT JOIN (
        SELECT e.dst, SUM((r.rank_micro * 85) // (100 * d2.deg)) AS in_sum
        FROM edges e
        JOIN r{k - 1} r ON e.src = r.node_id
        JOIN deg d2 ON d2.src = e.src
        GROUP BY e.dst
      ) s ON s.dst = d.src
    )
    """
        )
    return (
        "WITH "
        + ",".join(cte)
        + f" SELECT node_id, rank_micro FROM r{n_iters}"
    )
