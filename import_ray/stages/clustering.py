"""Distributed k-means over an embedding column.

The reference has no clustering; this is a training-data-pipeline
operator (embedding-space corpus bucketing — the same shape that feeds
IVF ANN centroids in ``stages/similarity.py`` and semantic-dedup /
topic-balancing stages).

Ray-Data-native Lloyd's iterations:

- **init**: deterministic multiplicative-hash sample of the dataset
  (``similarity._hash_sample``) + a driver-side Lloyd pass on the tiny
  sample — same recipe IVF already uses.
- **iterate**: per-batch partial sufficient statistics (k rows of
  per-cluster count + dim-wise sums, computed with one matmul + two
  ``np.add.at`` scatters) → native ``groupby("cluster_id").sum(...)``
  (hash shuffle of ≤ batches×k tiny rows, map-side partials) →
  driver recomputes the k×d centroid matrix (k×d is broadcast-small
  by construction).
- **assign**: one more map_batches argmax pass → (vec_id, cluster_id).

The full dataset is materialized once before the loop (iterative
re-reads would re-parse parquet every pass; the object store spills at
scale). Cosine geometry: vectors and centroids are L2-normalized, so
argmax dot-product assignment == spherical k-means.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from import_ray.stages.similarity import _emb_matrix, _hash_sample, _kmeans, _normalize


def _partial_stats_fn(centroids: np.ndarray):
    k, d = centroids.shape
    cols = [f"s{j}" for j in range(d)]

    def partials(batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch))
        assign = np.argmax(emb @ centroids.T, axis=1)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        sums = np.zeros((k, d), np.float64)
        np.add.at(sums, assign, emb)
        out = {"cluster_id": pa.array(np.arange(k, dtype=np.int64))}
        out["n"] = pa.array(counts)
        for j, c in enumerate(cols):
            out[c] = pa.array(sums[:, j])
        return pa.table(out)

    return partials, cols


def kmeans_fit(
    embeddings_ds,
    k: int = 8,
    iters: int = 5,
    train_sample: int = 2048,
    seed: int = 17,
) -> np.ndarray:
    """Distributed spherical k-means fit → (k, d) centroid matrix."""
    from import_ray.core.context import ensure_hash_shuffle, npartitions

    ensure_hash_shuffle(embeddings_ds)
    ds = embeddings_ds.materialize()
    init = _hash_sample(ds, train_sample)
    centroids = _kmeans(init, k, iters=3, seed=seed)
    k = len(centroids)  # sample may be smaller than requested k
    # cluster stats are DENSE fixed-k rows (k per block). When
    # blocks × k is driver-small, reduce the partials on the driver
    # with one np.add.at scatter instead of a keyed shuffle — spinning
    # a hash-shuffle aggregator pool costs ~2 s PER ITERATION at
    # sf0.1, pure fixed overhead for a k×(d+2) result. Past the cap
    # (huge corpora × large k) fall back to the groupby path, whose
    # cost is then amortized by real data volume.
    driver_reduce = ds.num_blocks() * k <= 2_000_000
    for _ in range(iters):
        fn, cols = _partial_stats_fn(centroids)
        partials = ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
        if driver_reduce:
            stats = partials.to_pandas()
            cid = stats["cluster_id"].to_numpy()
            counts = np.zeros(k, np.int64)
            np.add.at(counts, cid, stats["n"].to_numpy())
            sums = np.zeros((k, len(cols)), np.float64)
            np.add.at(sums, cid, stats[cols].to_numpy())
        else:
            n_agg = min(npartitions(), max(2, k // 1024))
            stats = (
                partials.groupby("cluster_id", num_partitions=n_agg)
                .sum(["n"] + cols)
                .to_pandas()
            )
            cid = stats["cluster_id"].to_numpy()
            counts = np.zeros(k, np.int64)
            counts[cid] = stats["sum(n)"].to_numpy()
            sums = np.zeros((k, len(cols)), np.float64)
            sums[cid] = stats[[f"sum({c})" for c in cols]].to_numpy()
        nonzero = counts > 0
        new = centroids.copy()
        new[nonzero] = sums[nonzero] / counts[nonzero, None]
        centroids = _normalize(new)
    return centroids


def kmeans_assign(embeddings_ds, centroids: np.ndarray):
    """(vec_id, cluster_id, sim) assignment Dataset."""

    def assign(batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch))
        scores = emb @ centroids.T
        a = np.argmax(scores, axis=1)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "cluster_id": pa.array(a.astype(np.int64)),
                "sim": pa.array(scores[np.arange(len(a)), a]),
            }
        )

    return embeddings_ds.map_batches(assign, batch_format="pyarrow")


def kmeans(embeddings_ds, k: int = 8, iters: int = 5, train_sample: int = 2048):
    centroids = kmeans_fit(embeddings_ds, k=k, iters=iters, train_sample=train_sample)
    return kmeans_assign(embeddings_ds, centroids)


# --- planted fixture ---------------------------------------------------------


def planted_group_vectors(n: int = 200, groups: int = 5, dim: int = 16):
    """Deterministic well-separated vectors: group g = one-hot(g·3) plus
    tiny id-dependent noise; recoverable by k-means with k=groups."""
    import ray.data

    ids = np.arange(n, dtype=np.int64)
    g = ids % groups
    vecs = np.zeros((n, dim), np.float64)
    vecs[np.arange(n), (g * 3) % dim] = 1.0
    noise_phase = (ids[:, None] * 31 + np.arange(dim)[None, :] * 7) % 97
    vecs += 0.01 * (noise_phase / 97.0)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )
    return ray.data.from_arrow(tbl)


def kmeans_planted_purity(n: int = 200, groups: int = 5):
    """(group_id, pure) — pure means the planted group maps to exactly
    one cluster AND owns it exclusively (bijective group↔cluster)."""
    import pandas as pd

    ds = planted_group_vectors(n=n, groups=groups)
    out = kmeans(ds, k=groups, iters=4, train_sample=n).to_pandas()
    out["group_id"] = out["vec_id"] % groups
    per_group = out.groupby("group_id")["cluster_id"].nunique()
    per_cluster = out.groupby("cluster_id")["group_id"].nunique()
    cluster_of = out.groupby("group_id")["cluster_id"].first()
    pure = (per_group == 1) & (per_cluster.reindex(cluster_of.to_numpy()).to_numpy() == 1)
    return pd.DataFrame(
        {"group_id": per_group.index.astype(np.int64), "pure": pure.to_numpy()}
    )
