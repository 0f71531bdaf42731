"""Distributed spherical k-means (stages/clustering.py)."""

import numpy as np

from import_ray.stages.clustering import (
    kmeans,
    kmeans_fit,
    kmeans_planted_purity,
    planted_group_vectors,
)


def test_planted_groups_recovered(ray_session):
    df = kmeans_planted_purity(n=200, groups=5)
    assert len(df) == 5
    assert df["pure"].all()


def test_centroids_converge_to_anchors(ray_session):
    """Each planted one-hot anchor direction ends up with a centroid at
    cosine ≥ 0.99 after the distributed Lloyd iterations."""
    groups, dim = 5, 16
    ds = planted_group_vectors(n=200, groups=groups, dim=dim)
    centroids = kmeans_fit(ds, k=groups, iters=4, train_sample=200)
    anchors = np.zeros((groups, dim))
    anchors[np.arange(groups), (np.arange(groups) * 3) % dim] = 1.0
    sims = (anchors / np.linalg.norm(anchors, axis=1, keepdims=True)) @ centroids.T
    assert (sims.max(axis=1) >= 0.99).all()
    # bijective: each anchor's best centroid is distinct
    assert len(set(sims.argmax(axis=1))) == groups


def test_kmeans_real_embeddings(ray_session, sf_small):
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_small}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = kmeans(ds, k=8, iters=3).to_pandas()
    assert len(out) == 500
    assert out["cluster_id"].between(0, 7).all()
    assert out["vec_id"].is_unique
