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
