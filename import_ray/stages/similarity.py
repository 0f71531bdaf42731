"""Similarity search over embedding columns.

Brute-force cosine top-k: the scale path is per-batch partial top-k
against a **broadcast** query matrix (numpy matmul in float64), then a
tiny ``groupby(query_id)`` merge of the partials — the full score
matrix never materializes and nothing big shuffles. An LSH-bucketed
variant (random hyperplanes) provides the approximate path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class PartialTopK:
    """Per-batch top-k scores against the broadcast query matrix."""

    def __init__(self, queries: dict[int, np.ndarray], k: int):
        self.qids = np.array(sorted(queries), dtype=np.int64)
        self.qm = _normalize(
            np.stack([queries[q] for q in sorted(queries)]).astype(np.float64)
        )
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        emb = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        emb = _normalize(emb)
        scores = self.qm @ emb.T  # (n_queries, n_batch)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            row = scores[qi]
            mask = vec_ids != qid
            ids = vec_ids[mask]
            vals = row[mask]
            if len(ids) > self.k:
                part = np.argpartition(-vals, self.k)[: self.k]
                ids, vals = ids[part], vals[part]
            out_q.extend([qid] * len(ids))
            out_v.extend(ids.tolist())
            out_s.extend(vals.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def _final_topk_factory(k: int):
    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["score", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["query_id", "neighbor_id", "rank"]]

    return final_topk


def knn_cosine(embeddings_ds, n_queries: int, k: int, query_vectors: dict | None = None):
    """Exact brute-force cosine top-k. Query vectors default to the
    embeddings with vec_id < n_queries (read driver-side, broadcast)."""
    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(embeddings_ds)
    if query_vectors is None:
        q = embeddings_ds.filter(lambda r: r["vec_id"] < n_queries).take_all()
        query_vectors = {r["vec_id"]: np.asarray(r["embedding"]) for r in q}
    partial = PartialTopK(query_vectors, k)
    partials = embeddings_ds.map_batches(partial, batch_format="pyarrow")
    from import_ray.core.context import npartitions

    return partials.groupby("query_id", num_partitions=npartitions()).map_groups(
        _final_topk_factory(k), batch_format="pandas"
    )


def _kmeans(data: np.ndarray, k: int, iters: int = 10, seed: int = 17) -> np.ndarray:
    """Small deterministic Lloyd's k-means on normalized vectors
    (driver-side, on a sample) → centroid matrix."""
    rng = np.random.default_rng(seed)
    data = _normalize(data.astype(np.float64))
    centroids = data[rng.choice(len(data), size=min(k, len(data)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(data @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = data[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


class IVFPartialTopK:
    """Per-batch ANN top-k: vectors are assigned to their nearest
    centroid; each query only scores vectors in its ``n_probe`` nearest
    clusters. Centroids + query matrix are broadcast once per actor."""

    def __init__(self, queries: dict[int, np.ndarray], k: int, centroids: np.ndarray, n_probe: int):
        self.qids = np.array(sorted(queries), dtype=np.int64)
        self.qm = _normalize(
            np.stack([queries[q] for q in sorted(queries)]).astype(np.float64)
        )
        self.k = k
        self.centroids = centroids
        # per query: set of probed cluster ids
        sims = self.qm @ centroids.T
        order = np.argsort(-sims, axis=1)[:, :n_probe]
        self.probe = [set(row.tolist()) for row in order]

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        emb = _normalize(
            np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        )
        assign = np.argmax(emb @ self.centroids.T, axis=1)
        scores = self.qm @ emb.T
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            probe = self.probe[qi]
            mask = np.array([a in probe for a in assign]) & (vec_ids != qid)
            ids = vec_ids[mask]
            vals = scores[qi][mask]
            if len(ids) > self.k:
                part = np.argpartition(-vals, self.k)[: self.k]
                ids, vals = ids[part], vals[part]
            out_q.extend([qid] * len(ids))
            out_v.extend(ids.tolist())
            out_s.extend(vals.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def ivf_knn(
    embeddings_ds,
    query_vectors: dict,
    k: int,
    n_clusters: int = 16,
    n_probe: int = 4,
    train_sample: int = 2048,
):
    """Approximate top-k: IVF (inverted-file) probing — each query scores
    only vectors in its nearest ``n_probe`` of ``n_clusters`` partitions.

    The scale path: per-batch work drops by ~n_probe/n_clusters, and the
    centroid model is a driver-trained broadcast (at real scale train on
    ``ds.random_sample``). Exact recall tradeoff is tested against the
    brute-force baseline."""
    from import_ray.core.context import ensure_hash_shuffle, npartitions

    ensure_hash_shuffle(embeddings_ds)
    sample = embeddings_ds.limit(train_sample).take_all()
    train = np.stack([np.asarray(r["embedding"]) for r in sample])
    centroids = _kmeans(train, n_clusters)
    partial = IVFPartialTopK(query_vectors, k, centroids, n_probe)
    partials = embeddings_ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("query_id", num_partitions=npartitions()).map_groups(
        _final_topk_factory(k), batch_format="pandas"
    )


KNN_SQL_TEMPLATE = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {n_queries}
), t AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS tv FROM embeddings
), scored AS (
  SELECT q.query_id, t.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(qv, tv) DESC, t.vec_id
         ) AS rank
  FROM q CROSS JOIN t
  WHERE q.query_id <> t.vec_id
)
SELECT query_id, neighbor_id, rank FROM scored WHERE rank <= {k}
"""
