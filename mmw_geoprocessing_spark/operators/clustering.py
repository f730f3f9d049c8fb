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


def _cluster_scores(vec_col, cents: list[list[float]]):
    """Array of (2 v.c - |c|^2, -cid) structs; array_max implements
    argmin squared distance with ties toward the smaller cluster id."""
    entries = []
    for cid, c in enumerate(cents):
        dot = F.aggregate(
            F.zip_with(vec_col, F.array(*[F.lit(x) for x in c]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        csq = 0.0
        for x in c:
            csq += x * x
        entries.append(
            F.struct((F.lit(2.0) * dot - F.lit(csq)).alias("s"), F.lit(-cid).alias("nid"))
        )
    return F.array(*entries)


def _vsq(vec_col):
    return F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x)


def assign_clusters(embeddings: DataFrame, cents: list[list[float]]) -> DataFrame:
    """Assign every vector to its nearest centroid (squared Euclidean).
    Output: ``(vec_id, cluster INT, sq_dist DOUBLE)`` — map-side only.
    """
    v = _as_double(F.col("embedding"))
    best = F.array_max(_cluster_scores(v, cents))
    return embeddings.select(
        "vec_id",
        (-best["nid"]).cast("int").alias("cluster"),
        (_vsq(v) - best["s"]).alias("sq_dist"),
    )


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
            best = F.array_max(_cluster_scores(F.col("v"), cents))
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
