"""Fixed-point k-means (operators/clustering.py): numpy replay of the
exact spec, deterministic seeding, empty-cluster carry, tie direction,
guards, and partition invariance."""

import math

import numpy as np
import pytest

from dataquality_spark.operators.clustering import (KMEANS_QUANT,
                                                    kmeans_clusters)


def _scalar_kmeans(vecs, k, iters):
    """Slow reference of the documented spec over (id, list[float]).
    The engine column is array<float>, so the reference round-trips
    through float32 before the float64 widen — same bits as Spark."""
    q = {i: np.floor(np.array(v, dtype=np.float32).astype(np.float64)
                     * KMEANS_QUANT).astype(np.int64) for i, v in vecs}
    seed_ids = sorted(q)[:k]
    C = [q[i].copy() for i in seed_ids]

    def assign():
        out = {}
        for i, qv in q.items():
            ds = [int(((qv - c) ** 2).sum()) for c in C]
            j = min(range(len(C)), key=lambda j: (ds[j], j))
            out[i] = (j, ds[j])
        return out

    for _ in range(iters):
        a = assign()
        members: dict[int, list] = {}
        for i, (j, _) in a.items():
            members.setdefault(j, []).append(q[i])
        for j in range(len(C)):
            if j in members:
                s = np.stack(members[j]).sum(axis=0)
                C[j] = np.array([math.floor(int(x) / len(members[j]))
                                 for x in s], dtype=np.int64)
    return assign()


def _run(spark, vecs, k=3, iters=2, dim=4):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id: long, embedding: array<float>")
    pins: list = []
    out = kmeans_clusters(spark, df, k=k, iters=iters, dim=dim,
                          cleanup=pins)
    rows = {r["vec_id"]: (r["cluster"], r["dist"]) for r in out.collect()}
    for p in pins:
        p.unpersist()
    return rows


def test_matches_scalar_reference(spark):
    rng = np.random.default_rng(5)
    vecs = [(i, (rng.uniform(-1, 1, 4) + [0, 0, 3, -3][i % 4]).tolist())
            for i in range(40)]
    got = _run(spark, vecs)
    assert got == _scalar_kmeans(vecs, k=3, iters=2)


def test_tie_goes_to_smaller_cluster(spark):
    # two identical seed points → identical centroids; every vector ties
    # and must land in cluster 0
    vecs = [(0, [1.0, 0, 0, 0]), (1, [1.0, 0, 0, 0]), (2, [1.0, 0, 0, 0])]
    got = _run(spark, vecs, k=2)
    assert {c for c, _ in got.values()} == {0}


def test_empty_cluster_carries_centroid(spark):
    # seeds: p0, p0-dup, far p2. Cluster 1 empties in round 1 (ties go to
    # 0) and must CARRY its centroid, not error or zero out — and because
    # the carried centroid stays exactly at the origin while cluster 0's
    # mean drifts toward p3, the origin points flow BACK to cluster 1 in
    # round 2. The scalar replay pins that whole trajectory.
    vecs = [(0, [0.0] * 4), (1, [0.0] * 4), (2, [9.0] * 4),
            (3, [0.1] * 4), (4, [8.9] * 4)]
    got = _run(spark, vecs, k=3)
    assert got == _scalar_kmeans(vecs, k=3, iters=2)
    assert got[0][0] == 1 and got[1][0] == 1      # reclaimed by the carry
    assert got[0][1] == 0                         # exactly on the centroid
    assert got[3][0] == 0 and got[2][0] == 2 and got[4][0] == 2


def test_fewer_vectors_than_k(spark):
    vecs = [(0, [0.0] * 4), (1, [5.0] * 4)]
    got = _run(spark, vecs, k=8)
    assert got == {0: (0, 0), 1: (1, 0)}


def test_corrupt_vectors_dropped(spark):
    rows = [(0, [0.0, 0.0, 0.0, 0.0]), (1, None), (2, [1.0, 2.0]),
            (3, [1.0, None, 0.0, 0.0]), (4, [2.0, 2.0, 2.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    pins: list = []
    out = kmeans_clusters(spark, df, k=2, iters=1, dim=4, cleanup=pins)
    got = {r["vec_id"] for r in out.collect()}
    for p in pins:
        p.unpersist()
    assert got == {0, 4}


def test_empty_input_schema(spark):
    df = spark.createDataFrame([], "vec_id: long, embedding: array<float>")
    out = kmeans_clusters(spark, df, k=2, dim=4)
    assert out.columns == ["vec_id", "cluster", "dist"]
    assert out.count() == 0


def test_envelope_guard_trips(spark):
    # |q| ~ 1e16 puts the centroid-sum exactness past 2^53
    vecs = [(i, [1e10, 0, 0, 0]) for i in range(3)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id: long, embedding: array<float>")
    with pytest.raises(ValueError, match="envelope"):
        kmeans_clusters(spark, df, k=2, dim=4)


def test_partition_invariance(spark):
    rng = np.random.default_rng(11)
    vecs = [(i, rng.uniform(-1, 1, 4).tolist()) for i in range(60)]
    a = _run(spark, vecs)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id: long, embedding: array<float>").repartition(17)
    pins: list = []
    out = kmeans_clusters(spark, df, k=3, iters=2, dim=4, cleanup=pins)
    b = {r["vec_id"]: (r["cluster"], r["dist"]) for r in out.collect()}
    for p in pins:
        p.unpersist()
    assert a == b
