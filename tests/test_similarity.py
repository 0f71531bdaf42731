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


def test_knn_approx_flag_routes_to_ivf(embeddings):
    """knn_cosine(approx=True) routes to the IVF path. The sf0.01
    embeddings are near-random (IVF's worst case), so the bound here is
    loose; the ≥0.9 recall contract is asserted on clusterED data in
    test_ivf_recall_clustered."""
    from import_ray.stages.similarity import knn_cosine

    ds, queries = embeddings
    exact = knn_cosine(ds, 5, 10, query_vectors=queries).take_all()
    approx = knn_cosine(
        ds, 5, 10, query_vectors=queries, approx=True, n_clusters=8, n_probe=6
    ).take_all()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert np.mean(recalls) >= 0.7, recalls


def test_ivf_recall_clustered(ray_session):
    """On clusterable data (IVF's design point) the approx path must
    reach recall ≥0.9 vs brute force while probing a fraction of cells."""
    import ray.data

    from import_ray.stages.similarity import knn_cosine

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((8, 16)) * 4
    rows, queries = [], {}
    vid = 0
    for c in range(8):
        for _ in range(60):
            v = centers[c] + 0.3 * rng.standard_normal(16)
            rows.append({"vec_id": vid, "embedding": v.tolist()})
            vid += 1
    for q in range(5):
        queries[10_000 + q] = centers[q] + 0.3 * rng.standard_normal(16)
    ds = ray.data.from_items(rows)

    exact = knn_cosine(ds, 0, 10, query_vectors=queries).take_all()
    approx = knn_cosine(
        ds, 0, 10, query_vectors=queries, approx=True, n_clusters=8, n_probe=3
    ).take_all()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert np.mean(recalls) >= 0.9, recalls


def test_embedding_neardup_lsh_recall_vs_exact(ray_session):
    """Hyperplane-bucketed near-dup must recover every pair the exact
    all-pairs kernel finds at the 0.95 threshold (planted near-copies)."""
    import ray.data

    from import_ray.stages.similarity import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_exact,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((80, 32))
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(80)]
    # plant 10 near-copies: tiny perturbation → cosine ≈ 0.999
    for i in range(10):
        v = base[i] + 0.02 * rng.standard_normal(32)
        rows.append({"vec_id": 100 + i, "embedding": v.tolist()})
    ds = ray.data.from_items(rows)

    exact = {
        (r["vec_lo"], r["vec_hi"])
        for r in embedding_neardup_pairs_exact(ds, threshold=0.95).take_all()
    }
    lsh_rows = embedding_neardup_pairs(ds, threshold=0.95).take_all()
    lsh = {(r["vec_lo"], r["vec_hi"]) for r in lsh_rows}
    assert exact, "fixture must plant at least one qualifying pair"
    assert exact <= lsh or len(exact & lsh) / len(exact) >= 0.99, (
        exact - lsh,
        len(exact),
    )
    # cosine values agree with the exact kernel (same rounding)
    exact_scores = {
        (r["vec_lo"], r["vec_hi"]): r["cosine"]
        for r in embedding_neardup_pairs_exact(ds, threshold=0.95).take_all()
    }
    for r in lsh_rows:
        key = (r["vec_lo"], r["vec_hi"])
        if key in exact_scores:
            assert abs(r["cosine"] - exact_scores[key]) < 1e-9


def test_int8_knn_recall(embeddings):
    """Quantized top-k must recall ≥0.9 of the exact neighbor sets."""
    from import_ray.stages.similarity import knn_cosine, knn_cosine_int8

    ds, queries = embeddings
    exact = knn_cosine(ds, 5, 10, query_vectors=queries).take_all()
    quant = knn_cosine_int8(ds, 5, 10).take_all()
    exact_sets, quant_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in quant:
        quant_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & quant_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert np.mean(recalls) >= 0.9, recalls


def test_random_projection_deterministic_and_distance_preserving(embeddings):
    from import_ray.stages.similarity import _emb_matrix, random_projection

    ds, _ = embeddings
    import pyarrow as pa

    out1 = random_projection(ds, out_dim=16, seed=7).sort("vec_id").take_all()
    out2 = random_projection(ds, out_dim=16, seed=7).sort("vec_id").take_all()
    assert [r["vec_id"] for r in out1] == [r["vec_id"] for r in out2]
    m1 = np.stack([np.asarray(r["embedding"]) for r in out1])
    m2 = np.stack([np.asarray(r["embedding"]) for r in out2])
    assert m1.shape[1] == 16
    np.testing.assert_array_equal(m1, m2)

    # JL sanity: pairwise distances are preserved within a bounded mean
    # relative error (the synthetic vectors are near-isotropic, so
    # distances concentrate and correlation would be a meaningless
    # metric; relative error is the actual JL guarantee)
    t = ds.sort("vec_id").take_all()
    hi = np.stack([np.asarray(r["embedding"]) for r in t]).astype(np.float64)
    idx = np.arange(0, len(hi), 7)
    dh = np.linalg.norm(hi[idx][:, None, :] - hi[idx][None, :, :], axis=2).ravel()
    dl = np.linalg.norm(
        m1[idx][:, None, :].astype(np.float64) - m1[idx][None, :, :], axis=2
    ).ravel()
    mask = dh > 0
    rel = np.abs(dl[mask] - dh[mask]) / dh[mask]
    assert rel.mean() < 0.2, rel.mean()


def test_pq_exact_on_quantized_corpus(ray_session):
    """When every subspace has ≤ n_codes distinct subvectors, PQ
    reconstruction is lossless → pq_knn must equal brute force EXACTLY
    (ranks included)."""
    import ray.data

    from import_ray.stages.similarity import knn_cosine, pq_knn

    rng = np.random.default_rng(3)
    # 4 subspaces × 8 UNIT prototypes each; every concatenation then has
    # norm 2, so the L2-normalized subvectors stay within 8 distinct
    # values per subspace and PQ reconstruction is lossless
    protos = rng.standard_normal((4, 8, 8))
    protos /= np.linalg.norm(protos, axis=2, keepdims=True)
    rows = []
    picks = rng.integers(0, 8, size=(120, 4))
    for i in range(120):
        v = np.concatenate([protos[s, picks[i, s]] for s in range(4)])
        rows.append({"vec_id": i, "embedding": v.tolist()})
    ds = ray.data.from_items(rows)

    exact = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in knn_cosine(ds, 5, 10).take_all()
    )
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in pq_knn(ds, 5, 10, m=4, n_codes=8, train_sample=120).take_all()
    )
    # neighbor SETS must match exactly; rank order may differ only
    # within exact cosine ties (prototype reuse creates duplicates)
    exact_sets, got_sets = {}, {}
    for q, _, n in exact:
        exact_sets.setdefault(q, set()).add(n)
    for q, _, n in got:
        got_sets.setdefault(q, set()).add(n)
    assert got_sets == exact_sets


def test_pq_recall_clustered(ray_session):
    """On clustered data PQ ADC must reach recall ≥0.9 vs brute force
    while reading only m bytes per corpus vector."""
    import ray.data

    from import_ray.stages.similarity import knn_cosine, pq_knn

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((8, 32)) * 4
    rows = []
    vid = 0
    for c in range(8):
        for _ in range(60):
            v = centers[c] + 0.25 * rng.standard_normal(32)
            rows.append({"vec_id": vid, "embedding": v.tolist()})
            vid += 1
    ds = ray.data.from_items(rows)

    exact = knn_cosine(ds, 5, 10).take_all()
    approx = pq_knn(
        ds, 5, 10, m=8, n_codes=32, train_sample=480, rerank_factor=8
    ).take_all()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert np.mean(recalls) >= 0.9, recalls


def test_pq_encode_schema_and_determinism(embeddings):
    """Codes are fixed_size_binary(m), one row per vector, deterministic."""
    import pyarrow as pa

    from import_ray.stages.similarity import pq_encode, train_pq

    ds, _ = embeddings
    books = train_pq(ds, m=4, n_codes=16, train_sample=256)
    assert books.shape[0] == 4 and books.shape[1] <= 16
    out1 = pq_encode(ds, books).sort("vec_id").take_all()
    out2 = pq_encode(ds, books).sort("vec_id").take_all()
    assert len(out1) == ds.count()
    assert all(isinstance(r["code"], bytes) and len(r["code"]) == 4 for r in out1)
    assert [r["code"] for r in out1] == [r["code"] for r in out2]


def test_ivfpq_recall_clustered(ray_session):
    """IVFADC (coarse cells + residual PQ + exact re-rank) must reach
    recall ≥0.9 vs brute force on clustered data while scanning only
    2+m bytes per corpus vector and probing half the cells."""
    import ray.data

    from import_ray.stages.similarity import ivfpq_knn, knn_cosine

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((8, 32)) * 4
    rows = []
    vid = 0
    for c in range(8):
        for _ in range(60):
            v = centers[c] + 0.25 * rng.standard_normal(32)
            rows.append({"vec_id": vid, "embedding": v.tolist()})
            vid += 1
    ds = ray.data.from_items(rows)

    exact = knn_cosine(ds, 5, 10).take_all()
    approx = ivfpq_knn(
        ds, 5, 10, n_clusters=8, n_probe=4, m=8, n_codes=32,
        train_sample=480, rerank_factor=8,
    ).take_all()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert np.mean(recalls) >= 0.9, recalls


def test_ivfpq_encode_schema(ray_session):
    """One (cell, m-byte code) row per vector; cells within range;
    deterministic re-encode."""
    import pyarrow as pa
    import ray.data

    from import_ray.stages.similarity import ivfpq_encode, train_ivfpq

    rng = np.random.default_rng(4)
    rows = [
        {"vec_id": i, "embedding": rng.standard_normal(32).tolist()}
        for i in range(200)
    ]
    ds = ray.data.from_items(rows)
    centroids, codebooks = train_ivfpq(ds, n_clusters=8, m=4, n_codes=16,
                                       train_sample=200)
    t1 = ivfpq_encode(ds, centroids, codebooks).to_pandas().sort_values("vec_id")
    t2 = ivfpq_encode(ds, centroids, codebooks).to_pandas().sort_values("vec_id")
    assert len(t1) == 200
    assert t1["cell"].between(0, 7).all()
    assert (t1["cell"].to_numpy() == t2["cell"].to_numpy()).all()
    assert list(t1["code"]) == list(t2["code"])
