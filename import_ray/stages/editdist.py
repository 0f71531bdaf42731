"""Edit-distance similarity self-join over short strings.

The reference's only near-string machinery is fuzzy name→dcid matching
(`simple/util/ngram_matcher.py:41-197`, an in-memory n-gram index); a
distance-bounded similarity JOIN is that operation's set-at-scale
generalization — find every pair of records whose names are within
Levenshtein distance k (entity-linking candidates, catalog near-dupes).

Shape (the established near-dup pipeline shape in this repo):

1. **Candidate generation** — a q-gram inverted index: per-string
   distinct byte-level q-grams hashed to int64, ONE gram-keyed exchange,
   all-pairs within each gram bucket (vectorized triu expansion grouped
   by distinct bucket size). LOSSLESS: strings with ed ≤ k share at
   least one q-gram whenever min(len) ≥ (k+1)·q (k edits destroy ≤ k·q
   of the ≥ len−q+1 grams). Strings shorter than (k+1)·q + k all land
   in one synthetic bucket (all-pairs among them — bounded for
   name-like data): the extra +k covers short×long pairs whose shorter
   side is below the gram guarantee.
2. **Pair dedup** — one keyed exchange (`dedup_pairs_exchange`).
3. **Text attach** — two hash joins (`join_pairs_with_blobs`): name
   bytes move only for ids that appear in a candidate pair.
4. **Exact verify** — batched Levenshtein DP, fully vectorized across
   pairs: per DP row the insertion scan collapses to a prefix-min via
   the (cur − j) transform, so the whole batch costs O(max_len) numpy
   ops, no per-pair loop.

Distances are byte-level (ASCII == character-level); multi-byte UTF-8
would count bytes, documented deviation.

Skew note: a hub q-gram (an extremely common bigram at corpus scale)
makes its bucket quadratic. ``max_bucket`` caps it and the cap is
LOGGED (losslessness then holds only for pairs sharing a non-hub gram
— the standard positional-prefix refinement is the upgrade path).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

_SHORT_BUCKET = np.int64(-(1 << 62) + 17)


def _string_offsets(col) -> tuple[np.ndarray, np.ndarray]:
    """(byte buffer, absolute offsets) of a string column, zero-copy."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_large_string(arr.type):
        odt = np.int64
    else:
        odt = np.int32
    buf = np.frombuffer(arr.buffers()[2], np.uint8)
    off = np.frombuffer(arr.buffers()[1], odt)[arr.offset : arr.offset + len(arr) + 1]
    return buf, off.astype(np.int64)


def _qgram_rows(ids: np.ndarray, col, q: int, min_len: int, max_dist: int):
    """Distinct (gram_hash, id) rows; short strings map to the one
    synthetic short bucket.

    Bucket membership extends to len < min_len + max_dist: the gram
    guarantee needs BOTH sides ≥ min_len, so a short (< min_len) string
    may pair with a partner up to max_dist longer — that partner must
    be reachable in the short bucket too. Longer partners are
    impossible (length difference alone exceeds max_dist)."""
    buf, off = _string_offsets(col)
    lens = np.diff(off)
    is_short = lens < min_len + max_dist
    counts = np.where(lens < min_len, 0, lens - q + 1)
    total = int(counts.sum())
    # absolute byte position of each gram start
    cum = np.concatenate([[0], np.cumsum(counts)])
    within = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], counts)
    starts = np.repeat(off[:-1], counts) + within
    g = np.zeros(total, np.int64)
    for j in range(q):
        g = g * np.int64(1099511628211) + buf[starts + j]
    gid = np.repeat(ids, counts)
    # distinct per doc (duplicate grams inside one string inflate buckets)
    if total:
        order = np.lexsort((g, gid))
        g, gid = g[order], gid[order]
        keep = np.ones(total, bool)
        keep[1:] = (gid[1:] != gid[:-1]) | (g[1:] != g[:-1])
        g, gid = g[keep], gid[keep]
    short_ids = ids[is_short]
    return (
        np.concatenate([g, np.full(len(short_ids), _SHORT_BUCKET)]),
        np.concatenate([gid, short_ids]),
    )


def _bucket_all_pairs(g: np.ndarray, ids: np.ndarray, max_bucket: int):
    """All (lo<hi) id pairs within each gram bucket — triu expansion
    vectorized per distinct bucket size. Returns (lo, hi, n_capped)."""
    if len(g) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64), 0
    order = np.lexsort((ids, g))
    g, ids = g[order], ids[order]
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    bounds = np.r_[starts, len(g)]
    sizes = np.diff(bounds)
    capped = int((sizes > max_bucket).sum())
    use = (sizes >= 2) & (sizes <= max_bucket)
    lo_parts, hi_parts = [], []
    for s in np.unique(sizes[use]):
        offs = bounds[:-1][use & (sizes == s)]
        ii, jj = np.triu_indices(int(s), 1)
        a = ids[(offs[:, None] + ii[None, :]).ravel()]
        b = ids[(offs[:, None] + jj[None, :]).ravel()]
        lo_parts.append(np.minimum(a, b))
        hi_parts.append(np.maximum(a, b))
    if not lo_parts:
        return np.empty(0, np.int64), np.empty(0, np.int64), capped
    return np.concatenate(lo_parts), np.concatenate(hi_parts), capped


def _byte_matrix(col) -> tuple[np.ndarray, np.ndarray]:
    """(lens, padded uint8 matrix) for a string column — vectorized
    scatter from the Arrow byte buffer, no per-row loop."""
    buf, off = _string_offsets(col)
    lens = np.diff(off)
    n = len(lens)
    width = int(lens.max()) if n else 0
    mat = np.zeros((n, width), np.uint8)
    total = int(lens.sum())
    cum = np.concatenate([[0], np.cumsum(lens)])
    within = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], lens)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    mat[rows, within] = buf[np.repeat(off[:-1], lens) + within]
    return lens.astype(np.int64), mat


def levenshtein_batch(a_col, b_col) -> np.ndarray:
    """Exact Levenshtein distance for aligned pairs of strings, DP
    vectorized across the pair axis; the within-row insertion
    dependency collapses to a prefix-min of (cur − j)."""
    la, A = _byte_matrix(a_col)
    lb, B = _byte_matrix(b_col)
    n = len(la)
    res = np.zeros(n, np.int64)
    res[la == 0] = lb[la == 0]
    maxa = A.shape[1]
    maxb = B.shape[1]
    jr = np.arange(maxb + 1, dtype=np.int64)
    prev = np.tile(jr, (n, 1))
    for i in range(1, maxa + 1):
        cost = (A[:, i - 1 : i] != B).astype(np.int64)
        cur = np.empty_like(prev)
        cur[:, 0] = i
        cur[:, 1:] = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        cur = np.minimum.accumulate(cur - jr, axis=1) + jr
        done = la == i
        if done.any():
            res[done] = cur[done, lb[done]]
        prev = cur
    return res


def edit_distance_pairs(
    names_ds,
    max_dist: int = 2,
    q: int = 2,
    id_col: str = "id",
    text_col: str = "name",
    max_bucket: int = 100_000,
):
    """Distance-bounded string similarity self-join: Dataset
    (id_lo, id_hi, dist) for every pair with Levenshtein ≤ max_dist.
    See module docstring for the four-stage shape and the losslessness
    condition."""
    from import_ray.core.context import data_nparts, ensure_hash_shuffle
    from import_ray.stages.neardup import (
        dedup_pairs_exchange,
        join_pairs_with_blobs,
    )

    nparts = data_nparts(names_ds)
    min_len = (max_dist + 1) * q

    def gram_rows(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        g, gid = _qgram_rows(ids, batch[text_col], q, min_len, max_dist)
        return pa.table({"gram": pa.array(g), "id": pa.array(gid)})

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        g = batch["gram"].to_numpy(zero_copy_only=False)
        ids = batch["id"].to_numpy(zero_copy_only=False)
        lo, hi, capped = _bucket_all_pairs(g, ids, max_bucket)
        if capped:
            logger.warning(
                "edit_distance_pairs: %d hub q-gram buckets over "
                "max_bucket=%d were dropped; losslessness holds only "
                "for pairs sharing a non-hub gram",
                capped,
                max_bucket,
            )
        return pa.table({"id_lo": pa.array(lo), "id_hi": pa.array(hi)})

    grams = names_ds.map_batches(gram_rows, batch_format="pyarrow")
    ensure_hash_shuffle(grams)
    raw_pairs = grams.repartition(nparts, keys=["gram"]).map_batches(
        bucket_pairs, batch_format="pyarrow", batch_size=None
    )
    pairs = dedup_pairs_exchange(raw_pairs, "id_lo", "id_hi", nparts)

    # an aggressively-capped run can drop EVERY candidate: the resulting
    # all-empty (schema-less) dataset cannot feed a join — return the
    # canonical empty result instead (join_safe materializes, so the
    # count is metadata-only)
    import ray.data

    from import_ray.core.context import join_safe

    pairs = join_safe(pairs)
    if pairs.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "id_lo": pa.array([], pa.int64()),
                    "id_hi": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        )

    blobs = names_ds.map_batches(
        lambda b: pa.table(
            {"doc_id": pc.cast(b[id_col], pa.int64()), "nm": b[text_col]}
        ),
        batch_format="pyarrow",
    )
    joined = join_pairs_with_blobs(
        pairs, blobs, "id_lo", "id_hi", "nm", id_col="doc_id", nparts=nparts
    )

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "id_lo": pa.array([], pa.int64()),
                    "id_hi": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        dist = levenshtein_batch(b["nm_lo"], b["nm_hi"])
        ok = dist <= max_dist
        mask = pa.array(ok)
        return pa.table(
            {
                "id_lo": pc.cast(b["id_lo"], pa.int64()).filter(mask),
                "id_hi": pc.cast(b["id_hi"], pa.int64()).filter(mask),
                "dist": pa.array(dist[ok], pa.int64()),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow")
