"""Distributed k-means over the embedding column — the clustering stage
a training-data pipeline uses for diversity sampling, data mixing, and
corpus cartography (cluster-proportional sampling needs cluster ids).

The reference has no clustering (zonal-only engine); this extends the
LLM-pipeline family. Iterative algorithms are the one shape a single
SQL statement cannot express, so (like streaming) the check is a test
oracle — a numpy replica of the identical algorithm — rather than a
DuckDB twin.

Spark-first shape, per Lloyd iteration:
- assignment: centroids are a driver-side list (k x DIM floats, a few
  KB) compiled into an argmax-over-struct-array expression — map-side
  only, ZERO shuffle, no UDF. Since |v|^2 is constant per row, argmin
  squared distance reduces to argmax(2 v.c - |c|^2): one fold per
  centroid, no per-centroid |v|^2 term in the expression tree.
- update: ``groupBy(cluster)`` with one ``avg(v[i])`` aggregate per
  dimension — partial aggregation map-side, ONE shuffle of k x DIM
  partial sums per executor, independent of corpus size.
So ``iters`` iterations cost ``iters`` scans + ``iters`` tiny shuffles
at 100 TB; nothing driver-side ever holds more than k x DIM floats.
The input is persisted across iterations (the standard iterative-plan
contract; without it each iteration would re-read the source).

Determinism: init is the first k vectors by vec_id (replayable);
assignment tiebreak goes to the smaller cluster id. Centroid means are
floating-point sums whose order depends on partitioning, so centroids
are reproducible to ~1e-9 (tests assert against the numpy replica with
that tolerance), not bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.operators.similarity import DIM, _as_double


# Above this many centroid coefficients the compiled-literal expression
# stops being the right plan: the SQL string and codegen method sizes
# grow with k x DIM (Janino falls back to interpreted past ~64 KB), and
# driver-side plan build becomes the bottleneck. The broadcast-join
# strategy takes over there.
_EXPR_STRATEGY_MAX_COEFFS = 16384


def _cluster_scores(vec_sql: str, cents: list[list[float]]):
    """Array of (2 v.c - |c|^2, -cid) structs; array_max implements
    argmin squared distance with ties toward the smaller cluster id.
    ONE parsed expression — element-wise py4j literal construction costs
    ~0.3 ms per coefficient of driver time (the similarity._cell_scores
    lesson); literals round-trip via repr+D so results are bit-equal."""
    entries = []
    for cid, c in enumerate(cents):
        arr = "array(" + ", ".join(f"{x!r}D" for x in c) + ")"
        dot = (
            f"aggregate(zip_with({vec_sql}, {arr}, (x, y) -> x * y), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        csq = 0.0
        for x in c:
            csq += x * x
        entries.append(
            f"named_struct('s', 2.0D * ({dot}) - {csq!r}D, 'nid', {-cid})"
        )
    return F.expr("array(" + ", ".join(entries) + ")")


def _vsq(vec_col):
    return F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x)


def _assign_expr(base: DataFrame, cents: list[list[float]]) -> DataFrame:
    best = F.array_max(_cluster_scores("v", cents))
    return base.select(
        "vec_id",
        (-best["nid"]).cast("int").alias("cluster"),
        (_vsq(F.col("v")) - best["s"]).alias("sq_dist"),
    )


def _assign_join(base: DataFrame, cents: list[list[float]]) -> DataFrame:
    """Large-k strategy: centroids as a broadcast DataFrame, score every
    (vector, centroid) pair via a BroadcastNestedLoopJoin (k rows on the
    build side — a few MB even at k=4096), then per-vector argmax with
    ``max(struct(s, -cluster))``. The fold is the same zip_with
    aggregate over the same doubles, so scores — and therefore
    assignments — are bit-identical to the expression strategy
    (asserted by tests). One shuffle on vec_id with map-side partial
    max: k x N intermediate rows never materialize beyond the combiner.
    """
    spark = base.sparkSession
    rows = [(cid, c, sum(x * x for x in c)) for cid, c in enumerate(cents)]
    cdf = spark.createDataFrame(rows, "cluster int, c array<double>, csq double")
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("c"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = base.crossJoin(F.broadcast(cdf)).select(
        "vec_id",
        "v",
        "cluster",
        (F.lit(2.0) * dot - F.col("csq")).alias("s"),
    )
    best = F.max(F.struct(F.col("s"), (-F.col("cluster")).alias("nc"))).alias("b")
    return (
        scored.groupBy("vec_id")
        .agg(best, F.first(_vsq(F.col("v"))).alias("vsq"))
        .select(
            "vec_id",
            (-F.col("b.nc")).cast("int").alias("cluster"),
            (F.col("vsq") - F.col("b.s")).alias("sq_dist"),
        )
    )


def assign_clusters(
    embeddings: DataFrame, cents: list[list[float]], strategy: str = "auto"
) -> DataFrame:
    """Assign every vector to its nearest centroid (squared Euclidean).
    Output: ``(vec_id, cluster INT, sq_dist DOUBLE)``.

    ``strategy``: ``"expr"`` (compiled-literal, map-side only — small k),
    ``"join"`` (broadcast centroids + argmax aggregate — large k), or
    ``"auto"`` (pick by k x DIM).
    """
    base = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    if strategy == "auto":
        n_coeffs = len(cents) * (len(cents[0]) if cents else 0)
        strategy = "expr" if n_coeffs <= _EXPR_STRATEGY_MAX_COEFFS else "join"
    if strategy == "expr":
        return _assign_expr(base, cents)
    if strategy == "join":
        return _assign_join(base, cents)
    raise ValueError(f"unknown strategy {strategy!r}")


def kmeans_fit(
    embeddings: DataFrame, k: int = 8, iters: int = 5
) -> tuple[list[list[float]], list[float]]:
    """Lloyd's algorithm with deterministic init (first ``k`` vectors by
    vec_id). Returns ``(centroids, inertia_history)`` where inertia is
    the post-assignment sum of squared distances per iteration
    (non-increasing — asserted by tests).
    """
    init = (
        embeddings.filter(F.col("vec_id") < k)
        .select("vec_id", "embedding")
        .collect()
    )
    cents = [
        [float(x) for x in r["embedding"]]
        for r in sorted(init, key=lambda r: r["vec_id"])
    ]
    if len(cents) != k:
        raise ValueError(f"need vec_ids 0..{k - 1} for init, found {len(cents)}")

    base = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    base = base.persist()
    try:
        inertia: list[float] = []
        for _ in range(iters):
            best = F.array_max(_cluster_scores("v", cents))
            assigned = base.select(
                "v",
                (-best["nid"]).cast("int").alias("cluster"),
                (_vsq(F.col("v")) - best["s"]).alias("sq_dist"),
            )
            stats = (
                assigned.groupBy("cluster")
                .agg(
                    F.sum("sq_dist").alias("sse"),
                    *[F.avg(F.col("v")[i]).alias(f"m{i}") for i in range(DIM)],
                )
                .collect()
            )
            inertia.append(sum(r["sse"] for r in stats))
            by_cluster = {r["cluster"]: [r[f"m{i}"] for i in range(DIM)] for r in stats}
            # an emptied cluster keeps its previous centroid (standard
            # Lloyd convention; deterministic)
            cents = [by_cluster.get(cid, cents[cid]) for cid in range(k)]
        return cents, inertia
    finally:
        base.unpersist()


def cluster_proportional_sample(
    embeddings: DataFrame, cents: list[list[float]], fraction: float
) -> DataFrame:
    """Diversity sampling: keep ~``fraction`` of EACH cluster using the
    deterministic hash-threshold rule (the stratified_sample recipe over
    the cluster id) — the downstream consumer k-means exists for.
    Output: ``(vec_id, cluster)``.
    """
    from mmw_geoprocessing_spark.functions.text import h28

    h28_max = 1 << 28
    assigned = assign_clusters(embeddings, cents)
    salt = F.concat_ws("|", F.col("cluster").cast("string"), F.col("vec_id").cast("string"))
    return assigned.filter(h28(salt) < F.lit(int(fraction * h28_max))).select(
        "vec_id", "cluster"
    )
