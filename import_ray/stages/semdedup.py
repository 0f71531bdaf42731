"""SemDeDup: semantic deduplication in embedding space.

Public algorithm (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540): k-means
cluster the embeddings, then within each cluster drop every example
whose cosine similarity to an *earlier-ordered* cluster member exceeds a
threshold, ordering members so that low-similarity-to-centroid examples
are kept preferentially (the paper's best-performing keep rule).

The reference engine has exact dedup only (`stages/dedup.py` cites
pipeline/.../McfResolver); this is the embedding-space analog of the
MinHash-LSH near-dup stage and shares its shape:

- **bucket**: distributed spherical k-means (`stages/clustering.py`)
  fits a k×d centroid matrix (broadcast-small); one `map_batches` pass
  assigns every vector to its nearest centroid.
- **exchange**: ONE keyed hash-shuffle on `cluster_id` carrying the
  vectors (full row width — unavoidable: within-cluster cosine needs
  the vectors, exactly as in the paper's per-cluster pass).
- **within-cluster dedup** (one block per partition after the keyed
  repartition): order members by (similarity-to-centroid ASC, vec_id
  ASC — deterministic tie-break), then drop member i iff
  ``max_{j earlier} cos(i, j) >= threshold``. Computed as one m×m
  float32 matmul + a masked column max for small clusters, or a tiled
  (m × tile) loop for big ones — no Python pair loops either way.

Partitioning assumption (documented, as required for custom operators):
each k-means cluster fits in one worker block. At scale, ``k`` must be
sized ~N/5k members (the paper uses 50k clusters for 100M+ examples);
the tiled kernel keeps peak memory at ``m × tile × 4`` bytes so even a
skewed mega-cluster degrades to extra compute, not OOM.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from import_ray.stages.clustering import kmeans_fit
from import_ray.stages.similarity import _emb_matrix, _normalize


def _semdedup_cluster(emb: np.ndarray, sims: np.ndarray, vec_ids: np.ndarray,
                      threshold: float, tile: int) -> np.ndarray:
    """Keep mask for ONE cluster. ``emb`` rows must be L2-normalized.

    Order = (sim-to-centroid ASC, vec_id ASC); member i is dropped iff
    some earlier member has cosine >= threshold with it. The decision
    rule compares against ALL earlier members (the paper's rule), not
    only kept ones, so columns are independent → tileable."""
    m = len(vec_ids)
    if m <= 1:
        return np.ones(m, bool)
    order = np.lexsort((vec_ids, sims))
    e = emb[order].astype(np.float32, copy=False)
    maxsim = np.empty(m, np.float32)
    maxsim[0] = -np.inf
    row_idx = np.arange(m, dtype=np.int64)[:, None]
    for a in range(0, m, tile):
        b = min(a + tile, m)
        st = e @ e[a:b].T  # (m, b-a)
        st[row_idx >= np.arange(a, b, dtype=np.int64)[None, :]] = -np.inf
        maxsim[a:b] = st.max(axis=0)
    keep_ordered = maxsim < threshold
    keep = np.empty(m, bool)
    keep[order] = keep_ordered
    return keep


def semdedup(
    embeddings_ds,
    k: int = 8,
    threshold: float = 0.95,
    iters: int = 4,
    train_sample: int = 2048,
    tile: int = 2048,
    num_partitions: int | None = None,
):
    """(vec_id, cluster_id, kept) Dataset — ``kept`` False for members
    semantically duplicated by an earlier-ordered cluster member."""
    from import_ray.core.context import ensure_hash_shuffle, npartitions

    ensure_hash_shuffle(embeddings_ds)
    ds = embeddings_ds.materialize()  # read once: kmeans iterates over it too
    centroids = kmeans_fit(ds, k=k, iters=iters, train_sample=train_sample)

    def assign_and_carry(batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch))
        scores = emb @ centroids.T
        a = np.argmax(scores, axis=1)
        # recompute the winning similarity with a per-row reduction:
        # BLAS matmul results are bitwise batch-shape-dependent, which
        # would break the (sim, vec_id) tie-break for identical vectors
        # landing in different batches
        sim = np.einsum("ij,ij->i", emb, centroids[a])
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "cluster_id": pa.array(a.astype(np.int64)),
                "sim": pa.array(sim.astype(np.float64)),
                "embedding": batch["embedding"],
            }
        )

    n = num_partitions or npartitions()
    assigned = ds.map_batches(assign_and_carry, batch_format="pyarrow").repartition(
        n, keys=["cluster_id"]
    )

    def dedup_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                    "kept": pa.array([], pa.bool_()),
                }
            )
        cids = batch["cluster_id"].to_numpy(zero_copy_only=False)
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = batch["sim"].to_numpy(zero_copy_only=False)
        emb = _normalize(_emb_matrix(batch))
        kept = np.ones(len(vids), bool)
        # segment the block by cluster (all rows of a cluster are in
        # this block by the keyed repartition)
        order = np.argsort(cids, kind="stable")
        sorted_cids = cids[order]
        starts = np.flatnonzero(
            np.r_[True, sorted_cids[1:] != sorted_cids[:-1]]
        )
        ends = np.r_[starts[1:], len(sorted_cids)]
        for s, t in zip(starts, ends):
            idx = order[s:t]
            kept[idx] = _semdedup_cluster(
                emb[idx], sims[idx], vids[idx], threshold, tile
            )
        return pa.table(
            {
                "vec_id": pa.array(vids),
                "cluster_id": pa.array(cids),
                "kept": pa.array(kept),
            }
        )

    return assigned.map_batches(dedup_block, batch_format="pyarrow", batch_size=None)


def semdedup_kept(embeddings_ds, **kwargs):
    """Just the surviving vec_ids (one int64 column)."""
    import pyarrow.compute as pc

    flags = semdedup(embeddings_ds, **kwargs)

    def only_kept(b: pa.Table) -> pa.Table:
        return b.filter(pc.field("kept")).select(["vec_id"])

    return flags.map_batches(only_kept, batch_format="pyarrow")
