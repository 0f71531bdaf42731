"""DSIR: Data Selection via Importance Resampling.

Public algorithm (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling", arXiv:2302.03169): featurize documents as
hashed n-gram (unigram + bigram) counts over ``B`` buckets, fit bag-of-
hashed-ngrams unigram models on a small TARGET corpus (p) and the big
RAW corpus (q), weight every raw document by its log-likelihood ratio
``log p(doc) - log q(doc) = Σ_b c_b (log p_b - log q_b)``, and select
the documents with the highest (optionally Gumbel-perturbed) weights.

Not in the reference engine — a training-data-pipeline operator, like
the near-dup/quality stages it sits beside.

Ray-Data shape:

- **fit** (each corpus): per-block ``np.bincount`` into a dense (B,)
  vector, summed pairwise up an ``AggregateFnV2`` tree (the Bloom
  OR-reduce topology) — only fixed-size 80 KB vectors move, no keyed
  shuffle; B defaults to 10k, broadcast-small by construction, same
  contract as a k×d centroid matrix.
- **weight**: the (B,) log-ratio vector ships inside the map closure;
  each batch computes per-doc weights with two segmented
  ``np.add.reduceat`` sums (unigrams + bigrams) — no Python loops.
- **select**: per-batch local top-k partials (≤ k rows leave each
  batch) → one tiny global ``sort().limit(k)`` merge. Deterministic:
  ties break on doc_id; the Gumbel option derives its noise from a
  seeded multiplicative hash of doc_id, so resampling is reproducible.

Tokenization/hashing reuses the near-dup machinery
(`neardup._split_flat`, `neardup._shingle_hashes_flat`) so DSIR buckets
are consistent with the MinHash shingle space.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from import_ray.stages.neardup import _shingle_hashes_flat, _split_flat


def _flat_buckets(batch: pa.Table, buckets: int):
    """(uni_counts, uni_buckets, bi_counts, bi_buckets) for a batch —
    per-doc segment lengths plus flat bucket ids, doc-grouped."""
    counts, h = _split_flat(batch)
    b = np.uint64(buckets)
    uni = (h % b).astype(np.int64)
    bi_counts, bi_h = _shingle_hashes_flat(counts, h, n=2)
    bi = (bi_h % b).astype(np.int64)
    return counts, uni, bi_counts, bi


def fit_bucket_counts(docs_ds, buckets: int = 10_000) -> np.ndarray:
    """(B,) int64 global hashed-ngram bucket counts for a corpus.

    Dense tree-reduce, no keyed shuffle: each block bincounts into one
    (B,) vector and vectors sum pairwise up the aggregate tree — the
    same topology as the Bloom OR-reduce. Only fixed-size B-vectors
    ever move (80 KB at the default B), so the fit costs one streaming
    pass at any corpus size."""
    from ray.data.aggregate import AggregateFnV2

    class CountAgg(AggregateFnV2):
        def __init__(self):
            super().__init__(
                "bucket_counts",
                lambda: np.zeros(buckets, np.int64),
                on=None,
                ignore_nulls=True,
            )

        def aggregate_block(self, block):
            tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
            if tbl.num_rows == 0:
                return np.zeros(buckets, np.int64)
            _, uni, _, bi = _flat_buckets(tbl, buckets)
            c = np.bincount(uni, minlength=buckets)
            c += np.bincount(bi, minlength=buckets)
            return c.astype(np.int64)

        def combine(self, a, b):
            return a + b

    return docs_ds.aggregate(CountAgg())["bucket_counts"]


def log_ratio(
    target_counts: np.ndarray, raw_counts: np.ndarray, smoothing: float = 1.0
) -> np.ndarray:
    """(B,) ``log p_b - log q_b`` with additive smoothing.

    ``smoothing`` adds ``B`` virtual tokens per unit to each corpus —
    at web scale (corpus tokens ≫ B) the default 1.0 is negligible, but
    for a SMALL calibration corpus use ``smoothing ≪ tokens/B`` or the
    smoothing mass swamps the fitted distribution."""
    b = len(target_counts)
    p = (target_counts + smoothing) / (target_counts.sum() + smoothing * b)
    q = (raw_counts + smoothing) / (raw_counts.sum() + smoothing * b)
    return np.log(p) - np.log(q)


def dsir_weights(raw_ds, ratio: np.ndarray, id_col: str = "doc_id"):
    """(doc_id, logweight) Dataset — per-doc hashed-ngram log-likelihood
    ratio under the fitted target/raw models."""
    buckets = len(ratio)

    def weigh(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "logweight": pa.array([], pa.float64())}
            )
        uc, uni, bc, bi = _flat_buckets(batch, buckets)
        uoff = np.zeros(len(uc), np.int64)
        np.cumsum(uc[:-1], out=uoff[1:])
        boff = np.zeros(len(bc), np.int64)
        np.cumsum(bc[:-1], out=boff[1:])
        w = np.add.reduceat(ratio[uni], uoff) + np.add.reduceat(ratio[bi], boff)
        return pa.table(
            {id_col: batch[id_col], "logweight": pa.array(w.astype(np.float64))}
        )

    return raw_ds.map_batches(weigh, batch_format="pyarrow")


def _gumbel01(ids: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic per-doc Gumbel(0,1) noise via multiplicative hash."""
    h = (ids.astype(np.uint64) + np.uint64(seed)) * np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(31)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(29)
    u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    u = np.clip(u, 1e-12, 1 - 1e-12)
    return -np.log(-np.log(u))


def dsir_select(
    raw_ds,
    target_ds,
    k: int,
    buckets: int = 10_000,
    smoothing: float = 1.0,
    id_col: str = "doc_id",
    gumbel_seed: int | None = None,
):
    """Top-``k`` raw docs by DSIR importance weight → (doc_id,
    logweight) Dataset. ``gumbel_seed`` enables the paper's Gumbel
    top-k resampling (deterministic given the seed)."""
    ratio = log_ratio(
        fit_bucket_counts(target_ds, buckets),
        fit_bucket_counts(raw_ds, buckets),
        smoothing,
    )
    weights = dsir_weights(raw_ds, ratio, id_col=id_col)

    def keyed(batch: pa.Table) -> pa.Table:
        w = batch["logweight"].to_numpy(zero_copy_only=False)
        if gumbel_seed is not None:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            w = w + _gumbel01(ids, gumbel_seed)
        df = pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(zero_copy_only=False),
                "logweight": batch["logweight"].to_numpy(zero_copy_only=False),
                "neg_key": -w,
            }
        ).nsmallest(k, ["neg_key", id_col])
        return pa.Table.from_pandas(df, preserve_index=False)

    partials = weights.map_batches(keyed, batch_format="pyarrow")
    return (
        partials.sort(["neg_key", id_col])
        .limit(k)
        .drop_columns(["neg_key"])
    )
