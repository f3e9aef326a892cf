"""Semantic tests for the k-means operator: recovery of a planted
clustering, determinism, and the inertia/population outputs."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row

from birli_spark.operators import clustering

DIM = 4


def _emb(vid, vec, label=0):
    return Row(vec_id=vid, embedding=[float(x) for x in vec], label=label)


def _two_blobs():
    """12 vectors in two well-separated blobs; vec_id 0 and 1 (the k=2
    deterministic seeds) land one in each blob so Lloyd's must converge
    to the planted partition."""
    rng = np.random.RandomState(7)
    a = rng.normal(0.0, 0.05, (6, DIM)) + np.array([1.0, 0, 0, 0])
    b = rng.normal(0.0, 0.05, (6, DIM)) + np.array([-1.0, 0, 0, 0])
    rows = []
    for i in range(6):
        rows.append(_emb(2 * i, a[i]))        # even ids: blob a (incl. 0)
        rows.append(_emb(2 * i + 1, b[i]))    # odd ids: blob b (incl. 1)
    return rows


def test_kmeans_recovers_planted_blobs(spark):
    df = spark.createDataFrame(_two_blobs())
    out = clustering.kmeans(df, k=2, iters=3).collect()
    assert len(out) == 2 * DIM
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster, {})[r.dim] = r
    assert set(by_cluster) == {0, 1}
    # population 6/6 and the planted ±1 first component
    for cid, dims in by_cluster.items():
        assert dims[0].n_vectors == 6
        want = 1.0 if cid == 0 else -1.0
        assert abs(dims[0].centroid - want) < 0.1
        assert all(abs(dims[d].centroid) < 0.1 for d in range(1, DIM))
        # tight blobs -> tiny inertia, consistent across the row group
        assert 0 < dims[0].inertia < 1.0
        assert all(dims[d].inertia == dims[0].inertia for d in range(DIM))


def test_kmeans_deterministic(spark):
    df = spark.createDataFrame(_two_blobs()).repartition(7)
    a = sorted(map(tuple, clustering.kmeans(df, k=2, iters=2).collect()))
    b = sorted(map(tuple, clustering.kmeans(df, k=2, iters=2).collect()))
    assert a == b


def test_kmeans_singleton_cluster_survives(spark):
    # one far outlier seeded as its own centroid keeps a singleton cell
    rows = [_emb(0, [0.0] * DIM), _emb(1, [10.0] * DIM),
            _emb(2, [0.1] * DIM), _emb(3, [0.2] * DIM)]
    out = clustering.kmeans(spark.createDataFrame(rows), k=2, iters=2).collect()
    pops = {r.cluster: r.n_vectors for r in out}
    assert pops == {0: 3, 1: 1}


def test_semantic_dedup_drops_within_cluster_dups(spark):
    # blob members are near-identical (cos > 0.95) -> exactly one
    # survivor per cluster; earliest vec_id wins
    df = spark.createDataFrame(_two_blobs()).repartition(5)
    out = clustering.semantic_dedup(df, k=2, iters=2, tau=0.95).collect()
    assert len(out) == 12
    kept = sorted(r.vec_id for r in out if r.keep)
    assert kept == [0, 1]
    by_id = {r.vec_id: r for r in out}
    # dropped rows count their earlier same-cluster neighbors
    assert by_id[10].n_dups == 5 and by_id[11].n_dups == 5
    assert all(by_id[v].n_dups == 0 for v in kept)


def test_semantic_dedup_keeps_cross_cluster_twins(spark):
    # identical vectors in DIFFERENT clusters are both kept: SemDeDup
    # only compares within a cell (the scale bargain under test)
    rows = [_emb(0, [1.0, 0, 0, 0]), _emb(1, [-1.0, 0, 0, 0]),
            _emb(2, [1.0, 0, 0, 0]), _emb(3, [-1.0, 0, 0, 0])]
    out = clustering.semantic_dedup(
        spark.createDataFrame(rows), k=2, iters=1, tau=0.99).collect()
    kept = sorted(r.vec_id for r in out if r.keep)
    assert kept == [0, 1]
    rows2 = [_emb(0, [1.0, 0, 0, 0]), _emb(1, [-1.0, 0, 0, 0])]
    out2 = clustering.semantic_dedup(
        spark.createDataFrame(rows2), k=2, iters=1, tau=0.99).collect()
    assert all(r.keep for r in out2)
