"""Distributed entity resolution: cluster entity records whose names
are variants of the same real-world entity (record linkage / KG node
dedup).

The reference resolves entities only through exact external ids
(util/.../ExternalIdResolver.java) and exact-dcid node merging
(pipeline GraphReader combineGraphNodes); cross-variant NAME resolution
has no single reference operator — semantics here follow the standard
record-linkage shape (blocking → pairwise verify → transitive cluster),
implemented Ray-Data-first on the machinery this repo already has for
near-dup detection (``stages/neardup.py``).

Pipeline (all exchanges hash-keyed; nothing corpus-sized ever reaches
the driver):

  map_batches(normalize)              # lowercase/strip punct, Arrow kernels
    → flat (block_key, entity) rows   # one per DISTINCT name token
    │                                 # + one whole-token-set key
    → repartition(keys=[block_key])   # hash shuffle, int64 keys
    → per-block candidate pairs       # vectorized triu per group;
    │                                 # hot blocks (stopword-like
    │                                 # tokens) capped + LOGGED —
    │                                 # recall comes from the entity's
    │                                 # rarer tokens
    → dedup_pairs_exchange            # one keyed shuffle
    → pairs ⋈ token-set blobs         # two hash joins (neardup blob
    │                                 # machinery, shingle_n=1)
    → vectorized exact set Jaccard    # keep ≥ threshold
    → label_clusters                  # hybrid union-find / distributed
                                      # min-label propagation

Partitioning assumption: a block's members co-locate via the
``block_key`` hash shuffle, and the per-block kernel runs whole-block
(``batch_size=None``) — exact because the hash-shuffle aggregator
finalizes each partition as a single block.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from import_ray.core.context import data_nparts as _data_nparts
from import_ray.stages.neardup import (
    ShingleBlobs,
    _blob_flat_u64,
    _dedup_pair_arrays,
    _pairwise_jaccard,
    dedup_pairs_exchange,
    join_pairs_with_blobs,
    label_clusters,
)

logger = logging.getLogger(__name__)

# blocks larger than this emit no pairs (hot tokens shared by most of
# the corpus — "inc", "the"; a true match is still found through the
# pair's OTHER, rarer shared tokens). Counted and logged.
MAX_BLOCK_MEMBERS = 64

_WHOLE_SET_SALT = np.uint64(0x9E3779B97F4A7C15)


def normalize_names(batch: pa.Table, id_col: str, name_col: str) -> pa.Table:
    """(id, name) → (entity_id int64, text) with the name lowercased,
    punctuation → spaces, whitespace collapsed/trimmed. The output
    column is named ``text`` so the neardup token/blob kernels apply
    unchanged."""
    norm = pc.utf8_lower(batch[name_col])
    norm = pc.replace_substring_regex(norm, pattern=r"[^a-z0-9]+", replacement=" ")
    norm = pc.utf8_trim_whitespace(norm)
    return pa.table(
        {
            "entity_id": pc.cast(batch[id_col], pa.int64()),
            "text": pc.cast(norm, pa.string()),
        }
    )


def _token_block_rows(batch: pa.Table, max_block: int = MAX_BLOCK_MEMBERS) -> pa.Table:
    """Normalized rows → flat (block_key, entity_id): one row per
    DISTINCT name token plus one whole-sorted-token-set key (catches
    exact-normalized matches even when every individual token block is
    hot). All segmented numpy — no per-entity loop.

    Hot-key prefilter: a token repeating ≥ ``max_block`` times within
    ONE batch is certain to exceed the block cap globally, so its rows
    are dropped BEFORE the shuffle — otherwise every corpus-hot token
    ("inc", "the") funnels its entire block to a single partition just
    to be skipped there (the classic skew hot-spot at scale). Tokens
    hot globally but not per-batch still reach the capped per-block
    skip downstream; the whole-set key is never prefiltered."""
    n = len(batch)
    if n == 0:
        return pa.table(
            {
                "block_key": pa.array([], pa.int64()),
                "entity_id": pa.array([], pa.int64()),
            }
        )
    blobs = ShingleBlobs(shingle_n=1)(
        pa.table({"doc_id": batch["entity_id"], "text": batch["text"]})
    )
    counts, flat = _blob_flat_u64(blobs["sh"])  # sorted-unique per entity
    ids = batch["entity_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ent_of = np.repeat(ids, counts)
    # whole-set key: order-independent polynomial over the sorted-unique
    # token hashes (segmented cumsum-free: multiply-fold via reduceat)
    seg = np.zeros(n, np.int64)
    np.cumsum(counts[:-1], out=seg[1:])
    with np.errstate(over="ignore"):
        mixed = flat * _WHOLE_SET_SALT + np.uint64(1)
        whole = np.add.reduceat(mixed, seg) if len(flat) else np.zeros(n, np.uint64)
        whole = whole * _WHOLE_SET_SALT  # decorrelate from single-token keys
    if len(flat):
        uniq, inv, cnt = np.unique(flat, return_inverse=True, return_counts=True)
        keep = (cnt < max_block)[inv]
        flat, ent_of = flat[keep], ent_of[keep]
    keys = np.concatenate([flat, whole]).view(np.int64)
    ents = np.concatenate([ent_of, ids])
    return pa.table(
        {
            "block_key": pa.array(keys, pa.int64()),
            "entity_id": pa.array(ents, pa.int64()),
        }
    )


def _block_candidate_pairs(batch: pa.Table, max_block: int) -> pa.Table:
    """Whole-block kernel after the block_key shuffle: per block, emit
    all (lo, hi) entity pairs (vectorized triu per group); blocks with
    more than ``max_block`` members are skipped and logged."""
    if batch.num_rows == 0:
        return pa.table(
            {"doc_lo": pa.array([], pa.int64()), "doc_hi": pa.array([], pa.int64())}
        )
    key = batch["block_key"].to_numpy(zero_copy_only=False)
    ent = batch["entity_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ent, key))
    key, ent = key[order], ent[order]
    # drop duplicate (key, entity) rows (same token twice never happens
    # post-ShingleBlobs, but whole-set keys can collide across batches)
    keep = np.ones(len(key), bool)
    keep[1:] = (key[1:] != key[:-1]) | (ent[1:] != ent[:-1])
    key, ent = key[keep], ent[keep]
    starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    sizes = np.diff(np.r_[starts, len(key)])
    usable = (sizes >= 2) & (sizes <= max_block)
    skipped = int((sizes > max_block).sum())
    if skipped:
        logger.warning(
            "entity_resolution: %d block(s) over MAX_BLOCK_MEMBERS=%d skipped "
            "(hot tokens; matches recalled via rarer shared tokens)",
            skipped,
            max_block,
        )
    # vectorized per-size batches: all blocks of the same size emit
    # their triu pairs in ONE fancy-index + broadcast (≤ max_block
    # distinct sizes per partition — no per-block Python loop)
    lo_parts, hi_parts = [], []
    u_starts, u_sizes = starts[usable], sizes[usable]
    for m in np.unique(u_sizes):
        g_starts = u_starts[u_sizes == m]
        ids = ent[g_starts[:, None] + np.arange(m)[None, :]]  # (G, m)
        ii, jj = np.triu_indices(int(m), 1)
        lo_parts.append(ids[:, ii].ravel())
        hi_parts.append(ids[:, jj].ravel())
    if not lo_parts:
        return pa.table(
            {"doc_lo": pa.array([], pa.int64()), "doc_hi": pa.array([], pa.int64())}
        )
    lo = np.concatenate(lo_parts)
    hi = np.concatenate(hi_parts)
    swap = lo > hi
    lo[swap], hi[swap] = hi[swap], lo[swap].copy()
    lo, hi = _dedup_pair_arrays(lo, hi)
    return pa.table(
        {"doc_lo": pa.array(lo, pa.int64()), "doc_hi": pa.array(hi, pa.int64())}
    )


def entity_match_pairs(
    ds,
    id_col: str = "entity_id",
    name_col: str = "name",
    threshold: float = 0.6,
    max_block: int = MAX_BLOCK_MEMBERS,
):
    """Verified match pairs (ent_lo, ent_hi, jaccard ≥ threshold) —
    token-set Jaccard over normalized names, Dataset-native end to
    end."""
    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    nparts = _data_nparts(ds)
    norm = ds.map_batches(
        lambda b: normalize_names(b, id_col, name_col), batch_format="pyarrow"
    )
    blocks = norm.map_batches(
        lambda b: _token_block_rows(b, max_block), batch_format="pyarrow"
    )
    pairs = blocks.repartition(nparts, keys=["block_key"]).map_batches(
        lambda b: _block_candidate_pairs(b, max_block),
        batch_format="pyarrow",
        batch_size=None,
    )
    pairs = dedup_pairs_exchange(pairs, "doc_lo", "doc_hi", nparts)
    blobs = norm.map_batches(
        lambda b: ShingleBlobs(shingle_n=1)(
            pa.table({"doc_id": b["entity_id"], "text": b["text"]})
        ),
        batch_format="pyarrow",
    )
    joined = join_pairs_with_blobs(pairs, blobs, "doc_lo", "doc_hi", "sh", nparts=nparts)

    def verify(b: pa.Table) -> pa.Table:
        c_lo, f_lo = _blob_flat_u64(b["sh_lo"])
        c_hi, f_hi = _blob_flat_u64(b["sh_hi"])
        jac = _pairwise_jaccard(c_lo, f_lo, c_hi, f_hi)
        ok = jac >= threshold
        return pa.table(
            {
                "ent_lo": pc.cast(b["doc_lo"], pa.int64()).filter(pa.array(ok)),
                "ent_hi": pc.cast(b["doc_hi"], pa.int64()).filter(pa.array(ok)),
                "jaccard": pa.array(np.round(jac[ok], 6), pa.float64()),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow")


def resolve_entities(
    ds,
    id_col: str = "entity_id",
    name_col: str = "name",
    threshold: float = 0.6,
    max_block: int = MAX_BLOCK_MEMBERS,
    max_driver_pairs: int | None = None,
):
    """(entity_id, canonical_id) Dataset: canonical_id = min entity_id
    of the transitively-matched cluster; unmatched entities map to
    themselves."""
    from import_ray.stages.neardup import MAX_DRIVER_PAIRS

    pairs = (
        entity_match_pairs(ds, id_col, name_col, threshold, max_block)
        .map_batches(
            lambda b: pa.table({"doc_lo": b["ent_lo"], "doc_hi": b["ent_hi"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    ids = ds.map_batches(
        lambda b: pa.table({"entity_id": pc.cast(b[id_col], pa.int64())}),
        batch_format="pyarrow",
    )
    return label_clusters(
        ids,
        pairs,
        id_col="entity_id",
        label_col="canonical_id",
        max_driver_pairs=(
            MAX_DRIVER_PAIRS if max_driver_pairs is None else max_driver_pairs
        ),
    )
