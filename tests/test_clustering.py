"""Distributed k-means (operators/clustering.py): numpy-replica oracle,
Lloyd invariants, and partitioning stability."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.operators import clustering as cl

K, ITERS = 8, 4


def _np_kmeans(X: np.ndarray, ids: np.ndarray, k: int, iters: int):
    """The literal same algorithm in numpy: init = first k by vec_id,
    argmin squared distance with ties to the smaller cluster id,
    mean update, empty cluster keeps its centroid."""
    order = np.argsort(ids)
    X, ids = X[order], ids[order]
    cents = X[ids < k][np.argsort(ids[ids < k])].astype(np.float64).copy()
    inertia = []
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin takes the first (smallest id) on ties
        inertia.append(float(d2[np.arange(len(X)), assign].sum()))
        for cid in range(k):
            if (assign == cid).any():
                cents[cid] = X[assign == cid].mean(axis=0)
    # the comparison assignment is w.r.t. the FINAL centroids
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return cents, inertia, d2.argmin(axis=1)


def _load(tables):
    rows = tables["embeddings"].select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([[float(x) for x in r["embedding"]] for r in rows], dtype=np.float64)
    return X, ids


def test_kmeans_matches_numpy_replica(spark, tables):
    X, ids = _load(tables)
    want_cents, want_inertia, want_assign = _np_kmeans(X, ids, K, ITERS)
    cents, inertia = cl.kmeans_fit(tables["embeddings"], k=K, iters=ITERS)
    np.testing.assert_allclose(np.array(cents), want_cents, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.array(inertia), np.array(want_inertia), rtol=1e-9)

    got = {
        r.vec_id: r.cluster
        for r in cl.assign_clusters(tables["embeddings"], cents).collect()
    }
    order = np.argsort(ids)
    Xs, idss = X[order], ids[order]
    want_map = dict(zip(idss.tolist(), want_assign.tolist()))
    # Spark evaluates the expanded form 2 v.c - |c|^2 while numpy does
    # sum((v-c)^2); they differ by ~1e-12, which can flip argmin for
    # points equidistant to two centroids. A differing assignment is
    # acceptable ONLY when it is such a numerical tie.
    d2 = ((Xs[:, None, :] - np.array(cents)[None, :, :]) ** 2).sum(axis=2)
    n_flips = 0
    for i, vid in enumerate(idss.tolist()):
        g, w = got[vid], want_map[vid]
        if g != w:
            n_flips += 1
            assert np.isclose(d2[i, g], d2[i, w], rtol=1e-9), (
                f"vec {vid}: non-tie flip {d2[i, g]} vs {d2[i, w]}"
            )
    assert n_flips < 0.05 * len(idss)  # flips are rare boundary cases


def test_kmeans_inertia_non_increasing(spark, tables):
    _, inertia = cl.kmeans_fit(tables["embeddings"], k=K, iters=ITERS)
    assert all(b <= a * (1 + 1e-12) for a, b in zip(inertia, inertia[1:]))


def test_assignment_stable_under_repartition(spark, tables):
    cents, _ = cl.kmeans_fit(tables["embeddings"], k=K, iters=2)
    a = cl.assign_clusters(tables["embeddings"], cents).select("vec_id", "cluster")
    b = cl.assign_clusters(tables["embeddings"].repartition(13), cents).select(
        "vec_id", "cluster"
    )
    assert a.exceptAll(b).count() == 0


def test_assignment_is_map_side_only(spark, tables):
    """The assignment plan must contain no shuffle and no Python UDF —
    the property that makes it free at 100 TB."""
    cents, _ = cl.kmeans_fit(tables["embeddings"], k=K, iters=1)
    df = cl.assign_clusters(tables["embeddings"], cents)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_cluster_proportional_sample(spark, tables):
    cents, _ = cl.kmeans_fit(tables["embeddings"], k=K, iters=2)
    full = cl.assign_clusters(tables["embeddings"], cents)
    kept = cl.cluster_proportional_sample(tables["embeddings"], cents, 0.5)
    n_full, n_kept = full.count(), kept.count()
    assert 0.35 < n_kept / n_full < 0.65
    # the kept set is a subset with matching cluster ids
    joined = kept.join(full.select("vec_id", F.col("cluster").alias("c2")), "vec_id")
    assert joined.filter(F.col("cluster") != F.col("c2")).count() == 0
    assert joined.count() == n_kept


def test_join_strategy_matches_expr_bitwise(spark, tables):
    """The broadcast-join assignment (large-k strategy) computes the
    same fold over the same doubles — assignments and distances must be
    BIT-identical to the compiled-literal strategy."""
    cents, _ = cl.kmeans_fit(tables["embeddings"], k=K, iters=2)
    a = cl.assign_clusters(tables["embeddings"], cents, strategy="expr").toPandas()
    b = cl.assign_clusters(tables["embeddings"], cents, strategy="join").toPandas()
    a = a.sort_values("vec_id").reset_index(drop=True)
    b = b.sort_values("vec_id").reset_index(drop=True)
    assert (a["cluster"] == b["cluster"]).all()
    assert (a["sq_dist"] == b["sq_dist"]).all()  # bitwise, no tolerance

    plan = (
        cl.assign_clusters(tables["embeddings"], cents, strategy="join")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "partial" in plan.lower()  # map-side combiner before the shuffle
