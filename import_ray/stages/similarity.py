"""Similarity search over embedding columns.

Brute-force cosine top-k: the scale path is per-batch partial top-k
against a **broadcast** query matrix (numpy matmul in float64), then a
tiny ``groupby(query_id)`` merge of the partials — the full score
matrix never materializes and nothing big shuffles. An IVF variant
(driver-trained broadcast centroids, per-query cluster probing)
provides the approximate path.

Kernels are fully vectorized: embeddings come out of Arrow as one
zero-copy ``list_flatten`` reshape, per-query top-k is a single
``np.argpartition`` along axis 1, and IVF probe membership is a
(query × cluster) boolean matrix fancy-indexed by the batch's cluster
assignments — no per-row or per-query Python loops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from import_ray.stages.neardup import (  # noqa: F401 (worker kernels)
    _blob_flat_u64,
    _dedup_pair_arrays,
    dedup_pairs_exchange,
    join_pairs_with_blobs,
)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    """(n, dim) float64 matrix from a list<float> column — one flat
    zero-copy flatten + reshape, no per-row stacking."""
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    return flat.reshape(n, -1).astype(np.float64)


def _emit_topk(qids, vec_ids, scores, k) -> pa.Table:
    """Per-batch top-k along axis 1 of a (Q, B) score matrix; -inf
    entries (masked) are dropped from the output."""
    B = scores.shape[1]
    kk = min(k, B)
    if kk == 0:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
    idx = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
    vals = np.take_along_axis(scores, idx, axis=1).reshape(-1)
    rows = np.repeat(qids, kk)
    cols = vec_ids[idx.reshape(-1)]
    keep = vals > -np.inf
    return pa.table(
        {
            "query_id": pa.array(rows[keep], pa.int64()),
            "neighbor_id": pa.array(cols[keep], pa.int64()),
            "score": pa.array(vals[keep], pa.float64()),
        }
    )


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
        emb = _normalize(_emb_matrix(batch))
        scores = self.qm @ emb.T  # (n_queries, n_batch)
        scores[vec_ids[None, :] == self.qids[:, None]] = -np.inf
        return _emit_topk(self.qids, vec_ids, scores, self.k)


def _final_topk_factory(k: int):
    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["score", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["query_id", "neighbor_id", "rank"]]

    return final_topk


def knn_cosine(
    embeddings_ds,
    n_queries: int,
    k: int,
    query_vectors: dict | None = None,
    approx: bool = False,
    n_clusters: int = 16,
    n_probe: int = 4,
):
    """Cosine top-k. Exact brute-force by default; ``approx=True``
    routes to the IVF path (per-batch work ÷ ~n_probe/n_clusters — the
    scale default for corpus-sized k-NN). Recall depends on how
    clusterable the corpus is: ≥0.9 on clustered data at n_probe=3/8
    (test_ivf_recall_clustered); near-random vectors need a higher
    probe fraction. Query vectors default to the embeddings with
    vec_id < n_queries (expression filter, broadcast)."""
    from import_ray.core.context import ensure_hash_shuffle, npartitions

    ensure_hash_shuffle(embeddings_ds)
    if query_vectors is None:
        q = embeddings_ds.filter(expr=f"vec_id < {int(n_queries)}").take_all()
        query_vectors = {r["vec_id"]: np.asarray(r["embedding"]) for r in q}
    if approx:
        return ivf_knn(
            embeddings_ds, query_vectors, k, n_clusters=n_clusters, n_probe=n_probe
        )
    partial = PartialTopK(query_vectors, k)
    from import_ray.core.context import join_safe

    # join_safe: the map_groups sorted shuffle breaks on schema-less
    # empty blocks; partials are tiny (Q×k rows per input batch)
    partials = join_safe(embeddings_ds.map_batches(partial, batch_format="pyarrow"))
    return partials.groupby("query_id", num_partitions=npartitions()).map_groups(
        _final_topk_factory(k), batch_format="pandas"
    )


def _kmeans(data: np.ndarray, k: int, iters: int = 10, seed: int = 17) -> np.ndarray:
    """Small deterministic Lloyd's k-means on normalized vectors
    (driver-side, on a sample) → centroid matrix.

    Init is k-center greedy (farthest-point): deterministic and
    spread-guaranteeing — uniform choice can draw two seeds from one
    tight cluster and none from another, which Lloyd cannot repair."""
    data = _normalize(data.astype(np.float64))
    k = min(k, len(data))
    seeds = [0]
    nearest = data @ data[0]
    for _ in range(k - 1):
        idx = int(np.argmin(nearest))
        seeds.append(idx)
        nearest = np.maximum(nearest, data @ data[idx])
    centroids = data[seeds]
    for _ in range(iters):
        assign = np.argmax(data @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = data[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def _hash_sample(embeddings_ds, train_sample: int):
    """Deterministic pseudo-random training sample: multiplicative hash
    of vec_id < rate threshold, rate sized from the (cheap, parquet
    metadata) dataset count — unbiased across the id space, unlike
    ``ds.limit`` which takes the first rows/blocks only."""
    total = embeddings_ds.count()
    rate = min(1.0, 4.0 * train_sample / max(1, total))
    thresh = np.uint64(min(int(rate * (1 << 64)), (1 << 64) - 1))

    def pick(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ids * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(31)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        return b.filter(pa.array(h <= thresh))

    rows = embeddings_ds.map_batches(pick, batch_format="pyarrow").limit(
        train_sample
    ).take_all()
    return np.stack([np.asarray(r["embedding"]) for r in rows])


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
        # (n_queries, n_clusters) probe-membership matrix
        sims = self.qm @ centroids.T
        order = np.argsort(-sims, axis=1)[:, :n_probe]
        self.probe_matrix = np.zeros((len(self.qids), len(centroids)), bool)
        np.put_along_axis(self.probe_matrix, order, True, axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        emb = _normalize(_emb_matrix(batch))
        assign = np.argmax(emb @ self.centroids.T, axis=1)
        scores = self.qm @ emb.T
        # probe mask for the whole batch: fancy-index the membership
        # matrix by cluster assignment — (Q, B) in one shot
        allowed = self.probe_matrix[:, assign]
        allowed &= vec_ids[None, :] != self.qids[:, None]
        scores[~allowed] = -np.inf
        return _emit_topk(self.qids, vec_ids, scores, self.k)


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
    centroid model is a driver-trained broadcast over a deterministic
    hash sample of the id space (not first-rows). Exact recall tradeoff
    is tested against the brute-force baseline."""
    from import_ray.core.context import ensure_hash_shuffle, npartitions

    ensure_hash_shuffle(embeddings_ds)
    train = _hash_sample(embeddings_ds, train_sample)
    centroids = _kmeans(train, n_clusters)
    partial = IVFPartialTopK(query_vectors, k, centroids, n_probe)
    from import_ray.core.context import join_safe

    partials = join_safe(embeddings_ds.map_batches(partial, batch_format="pyarrow"))
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


class EmbeddingNearDup:
    """All-pairs cosine near-duplicate pairs — EXACT baseline: each
    batch matmuls against the full normalized matrix broadcast through
    the object store (one copy per node). Emits (vec_lo, vec_hi,
    cosine) for vec_lo < vec_hi with cosine ≥ threshold, cosine rounded
    for cross-engine comparability.

    Scale note: broadcast-all-vectors is the exact, oracle-checkable
    baseline; at corpus scale swap in the IVF / LSH-bucketed path
    (``ivf_knn`` / random-hyperplane bucketing) — same output contract,
    approximate recall.
    """

    def __init__(self, matrix_ref, ids_ref, threshold: float, round_to: int = 6):
        self._matrix_ref = matrix_ref
        self._ids_ref = ids_ref
        self._mat = None
        self._ids = None
        self.threshold = threshold
        self.round_to = round_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._mat is None:
            self._mat = ray.get(self._matrix_ref)
            self._ids = ray.get(self._ids_ref)
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        emb = _normalize(_emb_matrix(batch))
        sims = emb @ self._mat.T  # (B, N)
        mask = (sims >= self.threshold) & (vec_ids[:, None] < self._ids[None, :])
        bi, ni = np.nonzero(mask)
        return pa.table(
            {
                "vec_lo": pa.array(vec_ids[bi], pa.int64()),
                "vec_hi": pa.array(self._ids[ni], pa.int64()),
                "cosine": pa.array(
                    np.round(sims[bi, ni], self.round_to), pa.float64()
                ),
            }
        )


def embedding_neardup_pairs_exact(embeddings_ds, threshold: float = 0.95):
    """Exact all-pairs baseline (verifier/oracle only — materializes the
    full matrix on the driver; NOT the scale path)."""
    import ray

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(embeddings_ds)
    rows = embeddings_ds.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = _normalize(
        np.stack([np.asarray(rows[i]["embedding"]) for i in order]).astype(np.float64)
    )
    kernel = EmbeddingNearDup(ray.put(mat), ray.put(ids), threshold)
    return embeddings_ds.map_batches(kernel, batch_format="pyarrow")


class HyperplaneBands:
    """map_batches kernel: embedding rows → (vec_id, band_hash) LSH band
    rows via random-hyperplane (sign-random-projection) hashing.

    ``n_bits`` fixed hyperplanes (seeded standard normals, built lazily
    from the first batch's dimension) split into ``bands`` bands of
    ``n_bits // bands`` sign bits; each band's bits pack into one int64
    key. For cosine θ a bit agrees w.p. 1 − arccos(θ)/π, so with the
    default r=16, b=16 a 0.95-cosine pair collides in ≥1 band w.p.
    ≈0.96 (0.98-cosine: ≈0.999); EXACT vector copies share every band
    deterministically (recall 1.0 on duplicates). r=16 gives 65,536
    buckets per band — r=8's 256 buckets force unrelated vectors
    together at ~N/256 per bucket, an O(N²/256) candidate explosion
    (measured 143k candidate pairs from 2k random vectors)."""

    def __init__(self, n_bits: int = 256, bands: int = 16, seed: int = 23):
        assert n_bits % bands == 0
        self.n_bits = n_bits
        self.bands = bands
        self.r = n_bits // bands
        self.seed = seed
        self._H = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch))
        if self._H is None:
            rng = np.random.default_rng(self.seed)
            self._H = rng.standard_normal((self.n_bits, emb.shape[1]))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        bits = (emb @ self._H.T) > 0  # (n, n_bits)
        weights = (1 << np.arange(self.r, dtype=np.int64))[None, None, :]
        packed = (bits.reshape(n, self.bands, self.r) * weights).sum(axis=2)
        keys = packed | (np.arange(self.bands, dtype=np.int64)[None, :] << self.r)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, self.bands), pa.int64()),
                "band_hash": pa.array(keys.reshape(-1), pa.int64()),
            }
        )


MAX_EMB_BUCKET_MEMBERS = 512


def _emb_bucket_pairs(batch: pa.Table) -> pa.Table:
    """Per-block candidate pairs from hyperplane buckets (no verify —
    exact cosine happens after the blob join). Skew-capped + logged."""
    df = pd.DataFrame(
        {
            "vec_id": batch["vec_id"].to_numpy(zero_copy_only=False),
            "key": batch["band_hash"].to_numpy(zero_copy_only=False),
        }
    )
    lo_parts, hi_parts = [], []
    capped = 0
    for _, grp in df.groupby("key", sort=False):
        m = len(grp)
        if m < 2:
            continue
        if m > MAX_EMB_BUCKET_MEMBERS:
            capped += 1
            grp = grp.nsmallest(MAX_EMB_BUCKET_MEMBERS, "vec_id")
            m = MAX_EMB_BUCKET_MEMBERS
        ids = np.sort(grp["vec_id"].to_numpy())
        ii, jj = np.triu_indices(m, 1)
        lo_parts.append(ids[ii])
        hi_parts.append(ids[jj])
    if capped:
        import logging

        logging.getLogger(__name__).warning(
            "embedding LSH: %d bucket(s) truncated to %d members",
            capped,
            MAX_EMB_BUCKET_MEMBERS,
        )
    if lo_parts:
        lo, hi = _dedup_pair_arrays(
            np.concatenate(lo_parts).astype(np.int64),
            np.concatenate(hi_parts).astype(np.int64),
        )
    else:
        lo = hi = np.zeros(0, np.int64)
    return pa.table(
        {"vec_lo": pa.array(lo, pa.int64()), "vec_hi": pa.array(hi, pa.int64())}
    )


def _emb_blobs(batch: pa.Table) -> pa.Table:
    """(vec_id, eb) — NORMALIZED float64 vector packed as one binary
    blob per row (robust join payload; zero-copy buffer build)."""
    ids = batch["vec_id"]
    emb = _normalize(_emb_matrix(batch))
    n, d = emb.shape
    offs = (np.arange(n + 1, dtype=np.int32) * (d * 8)).astype(np.int32)
    arr = pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(np.ascontiguousarray(emb).tobytes())],
    )
    return pa.table({"vec_id": ids, "eb": arr})


def embedding_neardup_pairs(
    embeddings_ds,
    threshold: float = 0.95,
    n_bits: int = 256,
    bands: int = 16,
    round_to: int = 6,
):
    """Embedding-cosine near-dup pairs — the scale path: random-
    hyperplane LSH bucketing (band rows hash-shuffle on int64 keys) →
    per-bucket candidate pairs → exact cosine verify via two hash joins
    against normalized-vector blobs. No full-matrix driver broadcast;
    exchange volume ∝ band rows + candidate pairs, never O(N²).

    Exact copies share every band deterministically (recall 1.0 on
    duplicates); a 0.98-cosine pair collides in ≥1 band w.p. ≈0.999
    with the default r=16 × b=16 geometry (see ``HyperplaneBands``).
    ``embedding_neardup_pairs_exact`` is the brute-force verifier for
    recall tests."""
    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    ensure_hash_shuffle(embeddings_ds)
    nparts = data_nparts(embeddings_ds)
    ds = embeddings_ds.select_columns(["vec_id", "embedding"])
    rows = ds.map_batches(
        HyperplaneBands(n_bits=n_bits, bands=bands), batch_format="pyarrow"
    )
    rows = rows.repartition(nparts, keys=["band_hash"])
    cand = rows.map_batches(_emb_bucket_pairs, batch_format="pyarrow")
    # same pair can surface from multiple bands → global pair dedup via
    # one keyed shuffle (HashAggregate's per-group Python finalization
    # measured 5-8x slower at equal partitioning)
    cand = dedup_pairs_exchange(cand, "vec_lo", "vec_hi", nparts)
    blobs = ds.map_batches(_emb_blobs, batch_format="pyarrow")
    joined = join_pairs_with_blobs(
        cand, blobs, "vec_lo", "vec_hi", "eb", id_col="vec_id", nparts=nparts
    )

    def verify(b: pa.Table) -> pa.Table:
        c_lo, f_lo = _blob_flat_u64(b["eb_lo"])
        c_hi, f_hi = _blob_flat_u64(b["eb_hi"])
        n = len(c_lo)
        if n == 0 or c_lo.sum() == 0:
            return pa.table(
                {
                    "vec_lo": pa.array([], pa.int64()),
                    "vec_hi": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        d = int(c_lo[0])
        m_lo = f_lo.view(np.float64).reshape(n, d)
        m_hi = f_hi.view(np.float64).reshape(n, d)
        cos = np.einsum("ij,ij->i", m_lo, m_hi)
        ok = cos >= threshold
        return pa.table(
            {
                "vec_lo": pc.cast(b["vec_lo"], pa.int64()).filter(pa.array(ok)),
                "vec_hi": pc.cast(b["vec_hi"], pa.int64()).filter(pa.array(ok)),
                "cosine": pa.array(np.round(cos[ok], round_to), pa.float64()),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow")


# --- random projection (JL dimensionality reduction) --------------------------


def random_projection(embeddings_ds, out_dim: int = 16, seed: int = 7):
    """Deterministic Gaussian random projection (Johnson–Lindenstrauss):
    embedding (d) → (out_dim), scaled by 1/sqrt(out_dim) so expected
    pairwise distances are preserved. The projection matrix is a
    (d × out_dim) constant derived from ``seed`` — regenerated inside
    each task from the seed (cheaper to rebuild than to ship), so the
    stage is embarrassingly parallel with zero broadcast state."""

    def kernel(batch: pa.Table) -> pa.Table:
        emb = _emb_matrix(batch)
        d = emb.shape[1]
        rng = np.random.default_rng(seed)
        proj = rng.standard_normal((d, out_dim)) / np.sqrt(out_dim)
        low = (emb @ proj).astype(np.float32)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "embedding": pa.array(list(low), pa.list_(pa.float32())),
            }
        )

    return embeddings_ds.map_batches(kernel, batch_format="pyarrow")


# --- int8-quantized cosine top-k ----------------------------------------------


class PartialTopKInt8:
    """Per-batch top-k like PartialTopK, but the corpus side is
    symmetric-int8 quantized: each L2-normalized vector becomes
    round(127·x) int8 codes, and scores are int32 dot products rescaled
    by 1/127² — 4× less memory traffic per batch and int8 GEMM-shaped
    compute (the at-scale memory/bandwidth path; recall is tested
    against the exact kernel)."""

    def __init__(self, queries: dict[int, np.ndarray], k: int):
        self.qids = np.array(sorted(queries), dtype=np.int64)
        qm = _normalize(np.stack([queries[q] for q in sorted(queries)]).astype(np.float64))
        self.qq = np.clip(np.rint(qm * 127.0), -127, 127).astype(np.int8)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        emb = _normalize(_emb_matrix(batch))
        codes = np.clip(np.rint(emb * 127.0), -127, 127).astype(np.int8)
        # int8 × int8 → int32 accumulate, then one float rescale
        scores = (
            self.qq.astype(np.int32) @ codes.astype(np.int32).T
        ).astype(np.float64) / (127.0 * 127.0)
        scores[vec_ids[None, :] == self.qids[:, None]] = -np.inf
        return _emit_topk(self.qids, vec_ids, scores, self.k)


def knn_cosine_int8(embeddings_ds, n_queries: int, k: int):
    """Quantized variant of ``knn_cosine``: same pipeline shape
    (broadcast queries → per-batch partial top-k → tiny grouped merge),
    int8 corpus codes. Approximate — ranks can differ from exact where
    cosine gaps are < ~1e-2; recall@k vs exact is pytest-gated."""
    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions

    ensure_hash_shuffle(embeddings_ds)
    q = embeddings_ds.filter(expr=f"vec_id < {int(n_queries)}").take_all()
    query_vectors = {r["vec_id"]: np.asarray(r["embedding"]) for r in q}
    partial = PartialTopKInt8(query_vectors, k)
    partials = join_safe(embeddings_ds.map_batches(partial, batch_format="pyarrow"))
    return partials.groupby("query_id", num_partitions=npartitions()).map_groups(
        _final_topk_factory(k), batch_format="pandas"
    )


# --- product quantization (PQ) ANN ---------------------------------------------


def _kmeans_l2(data: np.ndarray, k: int, iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd's k-means under plain L2 (PQ subspace
    codebooks operate on UN-normalized subvectors, unlike the spherical
    ``_kmeans``). Farthest-point init; empty clusters keep their
    centroid (harmless duplicates when k exceeds the distinct-point
    count — assignment argmin picks the first match)."""
    data = data.astype(np.float64)
    k = min(k, len(data))
    seeds = [0]
    d2 = ((data - data[0]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        idx = int(np.argmax(d2))
        seeds.append(idx)
        d2 = np.minimum(d2, ((data - data[idx]) ** 2).sum(axis=1))
    cents = data[seeds].copy()
    for _ in range(iters):
        dist = (cents**2).sum(axis=1)[None, :] - 2.0 * (data @ cents.T)
        assign = np.argmin(dist, axis=1)
        for c in range(len(cents)):
            members = data[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def train_pq(
    embeddings_ds, m: int = 4, n_codes: int = 16, train_sample: int = 2048
) -> np.ndarray:
    """Train PQ codebooks (Jégou et al. 2011, 'Product Quantization for
    Nearest Neighbor Search'): split the L2-NORMALIZED vector into ``m``
    subspaces and k-means each independently on a deterministic hash
    sample of the id space. Returns a (m, n_codes, d/m) float64 array —
    a few KB, broadcast-sized regardless of corpus scale."""
    train = _normalize(_hash_sample(embeddings_ds, train_sample).astype(np.float64))
    d = train.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return np.stack(
        [
            _kmeans_l2(train[:, i * dsub : (i + 1) * dsub], n_codes)
            for i in range(m)
        ]
    )


def pq_encode(embeddings_ds, codebooks: np.ndarray):
    """Encode each embedding as ``m`` uint8 codes (nearest subspace
    centroid under L2) — d×4 bytes → m bytes per vector (32× at
    d=32, m=4). Returns Dataset (vec_id, code: fixed_size_binary(m));
    downstream ANN search reads ONLY this codes table, so the
    full-precision embeddings never leave storage after the one encode
    pass. Codebooks ship in the task closure (KB-sized)."""
    m, n_codes, dsub = codebooks.shape
    # per-subspace ||c||² for the argmin-L2-as-argmax trick
    c_sq = (codebooks**2).sum(axis=2)  # (m, n_codes)

    def kernel(batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch))
        n = len(emb)
        codes = np.empty((n, m), dtype=np.uint8)
        for i in range(m):
            sub = emb[:, i * dsub : (i + 1) * dsub]
            dist = c_sq[i][None, :] - 2.0 * (sub @ codebooks[i].T)
            codes[:, i] = np.argmin(dist, axis=1)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "code": pa.FixedSizeBinaryArray.from_buffers(
                    pa.binary(m), n, [None, pa.py_buffer(codes.tobytes())]
                ),
            }
        )

    return embeddings_ds.map_batches(kernel, batch_format="pyarrow")


class PQPartialTopK:
    """Per-batch ADC (asymmetric distance computation) top-k over PQ
    CODES: the per-actor ``__init__`` precomputes the (Q, m, n_codes)
    lookup table LUT[q,i,c] = q_subᵢ · codebookᵢ[c]; per batch the
    score matrix is m uint8-indexed gathers + adds — no float matmul
    against the corpus and only m bytes read per corpus vector."""

    def __init__(self, queries: dict[int, np.ndarray], k: int, codebooks: np.ndarray):
        self.qids = np.array(sorted(queries), dtype=np.int64)
        qm = _normalize(
            np.stack([queries[q] for q in sorted(queries)]).astype(np.float64)
        )
        m, n_codes, dsub = codebooks.shape
        self.m = m
        self.lut = np.empty((len(self.qids), m, n_codes))
        for i in range(m):
            self.lut[:, i, :] = qm[:, i * dsub : (i + 1) * dsub] @ codebooks[i].T
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        col = batch["code"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes = np.frombuffer(col.buffers()[1], dtype=np.uint8).reshape(-1, self.m)
        codes = codes[col.offset : col.offset + len(col)]
        scores = self.lut[:, 0, :][:, codes[:, 0]]
        for i in range(1, self.m):
            scores = scores + self.lut[:, i, :][:, codes[:, i]]
        scores[vec_ids[None, :] == self.qids[:, None]] = -np.inf
        return _emit_topk(self.qids, vec_ids, scores, self.k)


def pq_knn(
    embeddings_ds,
    n_queries: int,
    k: int,
    m: int = 4,
    n_codes: int = 16,
    train_sample: int = 2048,
    codebooks: np.ndarray | None = None,
    rerank_factor: int = 0,
):
    """Approximate cosine top-k via product quantization: train
    broadcast codebooks on a hash sample, one encode pass (vectors →
    m-byte codes), then the standard partial-top-k/tiny-merge pipeline
    running entirely over the CODES dataset — per-batch memory traffic
    drops ×(4d/m) vs the exact kernel and the corpus floats are read
    exactly once.

    ``rerank_factor=r`` adds the standard two-stage refinement: ADC
    selects ``r·k`` candidates per query (reading only codes), then ONE
    hash join ships the Q·r·k candidate rows to the embeddings table
    for exact rescoring — full-precision vectors are touched for the
    candidate set only, never scanned. Recall vs brute force is
    pytest-gated on clustered data; exact-parity holds when every
    subspace has ≤ n_codes distinct subvectors
    (test_pq_exact_on_quantized_corpus)."""
    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions

    ensure_hash_shuffle(embeddings_ds)
    q = embeddings_ds.filter(expr=f"vec_id < {int(n_queries)}").take_all()
    query_vectors = {r["vec_id"]: np.asarray(r["embedding"]) for r in q}
    if codebooks is None:
        codebooks = train_pq(embeddings_ds, m=m, n_codes=n_codes, train_sample=train_sample)
    codes = pq_encode(embeddings_ds, codebooks)
    n = npartitions()
    adc_k = k * rerank_factor if rerank_factor else k
    partial = PQPartialTopK(query_vectors, adc_k, codebooks)
    partials = join_safe(codes.map_batches(partial, batch_format="pyarrow"))
    adc_top = partials.groupby("query_id", num_partitions=n).map_groups(
        _final_topk_factory(adc_k), batch_format="pandas"
    )
    if not rerank_factor:
        return adc_top

    return _exact_rerank(adc_top, embeddings_ds, query_vectors, k, n)


def _exact_rerank(adc_top, embeddings_ds, query_vectors: dict, k: int, n: int):
    """Second-stage refinement shared by pq_knn / ivfpq_knn: ONE hash
    join ships the candidate (query_id, neighbor_id) rows to the
    embeddings table for exact cosine rescoring — full-precision
    vectors are touched for the candidate set only, never scanned."""
    from import_ray.core.context import join_safe

    qids_sorted = np.array(sorted(query_vectors), dtype=np.int64)
    qm = _normalize(
        np.stack([query_vectors[q] for q in sorted(query_vectors)]).astype(np.float64)
    )

    def rescore(batch: pa.Table) -> pa.Table:
        eb = batch["eb"]
        if isinstance(eb, pa.ChunkedArray):
            eb = eb.combine_chunks()
        d = qm.shape[1]
        # offset-aware decode (joined arrays may be slices): gather each
        # row's d*8 bytes by its offsets entry, then view as float64
        offs = np.frombuffer(eb.buffers()[1], dtype=np.int32)
        starts = offs[eb.offset : eb.offset + len(eb)]
        data = np.frombuffer(eb.buffers()[2], dtype=np.uint8)
        byt = data[starts[:, None] + np.arange(d * 8)]
        emb = np.ascontiguousarray(byt).view(np.float64).reshape(len(eb), d)
        qi = np.searchsorted(
            qids_sorted, batch["query_id"].to_numpy(zero_copy_only=False)
        )
        scores = np.einsum("ij,ij->i", qm[qi], emb)
        return pa.table(
            {
                "query_id": batch["query_id"],
                "neighbor_id": batch["neighbor_id"],
                "score": pa.array(scores, pa.float64()),
            }
        )

    # Arrow hash joins reject list<float> payload columns — ship the
    # already-normalized vector as a binary blob (the _emb_blobs shape)
    blobs = embeddings_ds.map_batches(_emb_blobs, batch_format="pyarrow")
    rescored = (
        join_safe(adc_top)
        .join(
            blobs,
            join_type="inner",
            num_partitions=n,
            on=("neighbor_id",),
            right_on=("vec_id",),
        )
        .map_batches(rescore, batch_format="pyarrow")
    )
    return join_safe(rescored).groupby("query_id", num_partitions=n).map_groups(
        _final_topk_factory(k), batch_format="pandas"
    )


# --- IVF-PQ: coarse inverted file + residual product quantization ------------


def train_ivfpq(
    embeddings_ds,
    n_clusters: int = 16,
    m: int = 4,
    n_codes: int = 16,
    train_sample: int = 2048,
):
    """Train the IVF-PQ model (Jégou et al. 2011 §IV: IVFADC): a
    spherical coarse quantizer (the IVF centroids) plus PQ codebooks
    over the RESIDUALS x − c(x), pooled across cells. Residual
    encoding is what makes the composition beat plain PQ: residual
    magnitudes are a fraction of the vectors', so the same n_codes
    spend their precision on a much smaller subspace. Both artifacts
    are KB-sized broadcasts regardless of corpus scale."""
    train = _normalize(_hash_sample(embeddings_ds, train_sample).astype(np.float64))
    centroids = _kmeans(train, n_clusters)
    assign = np.argmax(train @ centroids.T, axis=1)
    resid = train - centroids[assign]
    d = resid.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    codebooks = np.stack(
        [_kmeans_l2(resid[:, i * dsub : (i + 1) * dsub], n_codes) for i in range(m)]
    )
    return centroids, codebooks


def ivfpq_encode(embeddings_ds, centroids: np.ndarray, codebooks: np.ndarray):
    """One encode pass: vector → (cell: uint16, m residual codes).
    Downstream search reads ONLY this table (2 + m bytes per vector);
    the full-precision embeddings never leave storage again except for
    the candidate-set re-rank join."""
    m, n_codes, dsub = codebooks.shape
    c_sq = (codebooks**2).sum(axis=2)

    def kernel(batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch))
        n = len(emb)
        assign = (
            np.argmax(emb @ centroids.T, axis=1) if n else np.zeros(0, np.int64)
        )
        resid = emb - centroids[assign] if n else emb
        codes = np.empty((n, m), dtype=np.uint8)
        for i in range(m):
            sub = resid[:, i * dsub : (i + 1) * dsub]
            dist = c_sq[i][None, :] - 2.0 * (sub @ codebooks[i].T)
            codes[:, i] = np.argmin(dist, axis=1)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "cell": pa.array(assign.astype(np.int32), pa.int32()),
                "code": pa.FixedSizeBinaryArray.from_buffers(
                    pa.binary(m), n, [None, pa.py_buffer(codes.tobytes())]
                ),
            }
        )

    return embeddings_ds.map_batches(kernel, batch_format="pyarrow")


class IVFPQPartialTopK:
    """Per-batch IVFADC top-k over the codes table: score(q, x) ≈
    q·c(x) + Σᵢ LUTᵢ[codeᵢ(x)] — one (Q, n_clusters) coarse term
    gathered by cell id plus m uint8-indexed gathers, restricted to
    each query's n_probe nearest cells. No float matmul against the
    corpus; 2 + m bytes read per corpus vector."""

    def __init__(self, queries: dict, k: int, centroids, codebooks, n_probe: int):
        self.qids = np.array(sorted(queries), dtype=np.int64)
        qm = _normalize(
            np.stack([queries[q] for q in sorted(queries)]).astype(np.float64)
        )
        m, n_codes, dsub = codebooks.shape
        self.m = m
        self.q_cent = qm @ centroids.T  # (Q, C): the coarse term
        order = np.argsort(-self.q_cent, axis=1)[:, :n_probe]
        self.probe_matrix = np.zeros((len(self.qids), len(centroids)), bool)
        np.put_along_axis(self.probe_matrix, order, True, axis=1)
        self.lut = np.empty((len(self.qids), m, n_codes))
        for i in range(m):
            self.lut[:, i, :] = qm[:, i * dsub : (i + 1) * dsub] @ codebooks[i].T
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        col = batch["code"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes = np.frombuffer(col.buffers()[1], dtype=np.uint8).reshape(-1, self.m)
        codes = codes[col.offset : col.offset + len(col)]
        scores = self.q_cent[:, cells].copy()
        for i in range(self.m):
            scores += self.lut[:, i, :][:, codes[:, i]]
        allowed = self.probe_matrix[:, cells]
        allowed &= vec_ids[None, :] != self.qids[:, None]
        scores[~allowed] = -np.inf
        return _emit_topk(self.qids, vec_ids, scores, self.k)


def ivfpq_knn(
    embeddings_ds,
    n_queries: int,
    k: int,
    n_clusters: int = 16,
    n_probe: int = 4,
    m: int = 4,
    n_codes: int = 16,
    train_sample: int = 2048,
    rerank_factor: int = 4,
):
    """Approximate cosine top-k via IVF + residual PQ (IVFADC) with
    exact re-ranking — the standard billion-scale ANN shape:

    1. train (driver, hash sample): coarse centroids + residual
       codebooks — KB-sized broadcasts;
    2. ONE encode pass: vector → (cell, m bytes); the codes table is
       the only thing search scans (2+m bytes/vector vs 4d);
    3. per-batch ADC restricted to each query's ``n_probe`` cells —
       work drops ×(n_probe/n_clusters) ON TOP of the PQ byte savings;
    4. partial top-(r·k) per block → tiny per-query merge → ONE hash
       join re-ranks the r·k candidates against the full-precision
       vectors (``rerank_factor=0`` skips the re-rank).

    Recall vs brute force is pytest-gated on clustered data; the
    planted-copy query (`ivfpq_knn_planted`) makes the path
    hash-checkable end-to-end."""
    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions

    ensure_hash_shuffle(embeddings_ds)
    q = embeddings_ds.filter(expr=f"vec_id < {int(n_queries)}").take_all()
    query_vectors = {r["vec_id"]: np.asarray(r["embedding"]) for r in q}
    centroids, codebooks = train_ivfpq(
        embeddings_ds, n_clusters=n_clusters, m=m, n_codes=n_codes,
        train_sample=train_sample,
    )
    codes = ivfpq_encode(embeddings_ds, centroids, codebooks)
    n = npartitions()
    adc_k = k * rerank_factor if rerank_factor else k
    partial = IVFPQPartialTopK(query_vectors, adc_k, centroids, codebooks, n_probe)
    partials = join_safe(codes.map_batches(partial, batch_format="pyarrow"))
    adc_top = partials.groupby("query_id", num_partitions=n).map_groups(
        _final_topk_factory(adc_k), batch_format="pandas"
    )
    if not rerank_factor:
        return adc_top
    return _exact_rerank(adc_top, embeddings_ds, query_vectors, k, n)
