"""Similarity search: brute-force exactness + IVF recall."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def embeddings(ray_session, sf_med):
    import pyarrow.parquet as pq
    import ray.data

    t = pq.read_table(f"{sf_med}/embeddings.parquet")
    ds = ray.data.read_parquet(f"{sf_med}/embeddings.parquet")
    queries = {
        r["vec_id"]: np.asarray(r["embedding"])
        for r in t.to_pylist()
        if r["vec_id"] < 5
    }
    return ds, queries


def test_brute_force_topk_exact(embeddings):
    """Partial-top-k merge must equal a single full matmul."""
    import pyarrow.parquet as pq

    from import_ray.stages.similarity import _normalize, knn_cosine

    ds, queries = embeddings
    got = knn_cosine(ds, 5, 10, query_vectors=queries).take_all()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))

    t = pq.read_table("/root/testdata/sf0.01/embeddings.parquet").to_pylist()
    ids = np.array([r["vec_id"] for r in t])
    m = _normalize(np.stack([np.asarray(r["embedding"]) for r in t]).astype(np.float64))
    for qid, qv in queries.items():
        scores = m @ (_normalize(qv[None, :].astype(np.float64))[0])
        mask = ids != qid
        order = np.lexsort((ids[mask], -scores[mask]))
        want = list(ids[mask][order][:10])
        gotq = [nid for _, nid in sorted(by_q[qid])]
        assert gotq == want


def test_ivf_recall(embeddings):
    from import_ray.stages.similarity import ivf_knn, knn_cosine

    ds, queries = embeddings
    exact = knn_cosine(ds, 5, 10, query_vectors=queries).take_all()
    approx = ivf_knn(ds, queries, 10, n_clusters=8, n_probe=5).take_all()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert np.mean(recalls) >= 0.75, recalls
