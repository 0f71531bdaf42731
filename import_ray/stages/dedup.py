"""Deduplication stages.

- ``exact_dedup_triples``: the reference's triple-tuple dedup
  (simple/stats/nodes.py:480-490; TypedValue set-dedup
  McfUtil.java:114-137; Beam Distinct GraphReader.java:157-177) as a
  hash-partitioned distinct:

    1. per-batch local distinct (the Beam bundle-cache trick,
       GraphReader.java:201-238) so the shuffle moves only
       already-unique rows;
    2. a vectorized 128-bit content hash (two independent 64-bit
       hashes → int64 cols ``h1``/``h2``) so partitioning keys are
       fixed-width ints, never the wide ``object_value`` strings;
    3. ``repartition(keys=["h1"])`` (hash shuffle) + per-block
       ``drop_duplicates`` — all copies of a tuple land in one block.

  128 bits keeps the collision expectation ≪1 even at 10^12 triples
  (n²/2^129).

Document-level dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard)
runs over the ``documents`` table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from import_ray.core.context import npartitions

# duplicated-key winner tables at or below this many rows are sorted
# once on the driver and broadcast to a TASK-pool filter (no actor
# spin-up); larger tables use the actor-pool path whose driver cost
# is O(block refs) only
WINNER_TASK_BUDGET = 4_000_000

TRIPLE_KEY = ["subject_id", "predicate", "object_id", "object_value"]
_HASH_KEY_2 = "9e3779b97f4a7c15"  # second, independent 16-byte hash key


def _hash_and_local_distinct(batch: pa.Table) -> pa.Table:
    """Append h1/h2 content hashes and drop in-batch duplicates.

    One hash pass per key column; h1/h2 are two independent 64-bit
    linear combinations of the per-column hashes (any column-hash
    difference flips both except with ~2^-128 probability).
    """
    col_hashes = []
    for c in TRIPLE_KEY:
        col = batch[c].to_pandas().fillna("\x00").to_numpy(dtype=object)
        col_hashes.append(pd.util.hash_array(col))
    h1 = np.zeros(len(batch), np.uint64)
    h2 = np.zeros(len(batch), np.uint64)
    a1 = (np.uint64(1099511628211), np.uint64(0x100000001B3), np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F))
    a2 = (np.uint64(0x2545F4914F6CDD1D), np.uint64(0xFF51AFD7ED558CCD), np.uint64(0xC4CEB9FE1A85EC53), np.uint64(0x165667B19E3779F9))
    for i, ch in enumerate(col_hashes):
        h1 += a1[i] * ch
        h2 += a2[i] * ch
    t = batch.append_column("h1", pa.array(h1.view(np.int64))).append_column(
        "h2", pa.array(h2.view(np.int64))
    )
    return _local_distinct(t)


def _local_distinct(batch: pa.Table) -> pa.Table:
    """Distinct on (h1, h2) via numpy lexsort + run-boundary mask +
    Arrow take — no pandas round trip, no per-group aggregation.
    Survivor choice is deterministic (min provenance-hash within a
    group), independent of row/partition order."""
    n = len(batch)
    if n == 0:
        return batch
    batch = batch.combine_chunks()
    h1 = batch["h1"].to_numpy(zero_copy_only=False)
    h2 = batch["h2"].to_numpy(zero_copy_only=False)
    ph = pd.util.hash_array(
        batch["provenance"].to_pandas().fillna("").to_numpy(dtype=object)
    )
    order = np.lexsort((ph, h2, h1))
    h1s = h1[order]
    h2s = h2[order]
    keep = np.empty(n, bool)
    keep[0] = True
    keep[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
    idx = np.sort(order[keep])
    return batch.take(pa.array(idx))


def exact_dedup_triples(ds, num_partitions: int | None = None, strategy: str = "shuffle"):
    """Global exact dedup of triple rows (keeps the min-provenance-hash
    copy per tuple).

    ``strategy="shuffle"`` (default): per-batch local distinct (the Beam
    bundle-cache trick, GraphReader.java:201-238) then hash-repartition
    on the 64-bit content hash and a numpy run-mask distinct per block.
    Fastest locally (rows move once through the object store).

    ``strategy="broadcast"``: never shuffles full rows —

    Duplicate ratios in triple extraction are low (repeated entity/
    place triples), so instead of an all-to-all exchange of wide rows:

      1. per-batch local distinct + 128-bit content hash + per-row tag;
         materialize (blocks stay put in the object store);
      2. shuffle ONLY (h1, h2, prov-rank, tag) — 32 bytes/row — and find
         keys seen more than once; per duplicated key pick the winner =
         min (prov_hash, tag);
      3. broadcast the (small) {key → winner_tag} map; filter blocks in
         place: keep non-duplicated keys and winner rows.

    The surviving row's CONTENT is deterministic (all copies are equal
    except provenance, and min prov-hash wins); which physical copy
    emits it is irrelevant. Exchange volume drops from full rows to 32
    bytes per row — the difference between shuffling ~100 TB and
    shuffling ~3 TB at the target scale. Falls back safely: if the
    duplicate-key map is huge the broadcast still works, just costs
    memory proportional to distinct duplicated keys (not duplicate
    rows).
    """
    import ray

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    n = num_partitions or npartitions()
    if strategy not in ("shuffle", "broadcast"):
        raise ValueError(f"unknown dedup strategy: {strategy!r} (use 'shuffle' or 'broadcast')")
    if strategy == "shuffle":
        out = ds.map_batches(_hash_and_local_distinct, batch_format="pyarrow")
        out = out.repartition(n, keys=["h1"])
        out = out.map_batches(_local_distinct, batch_format="pyarrow")
        return out.drop_columns(["h1", "h2"])
    hashed = ds.map_batches(_hash_tag_local_distinct, batch_format="pyarrow").materialize()
    return broadcast_dedup_hashed(hashed, n)


def _sorted_winner_arrays(tabs):
    """Concat winner blocks → lexsorted parallel lookup arrays +
    longest equal-h1 run bound (typically 1: an h1 run >1 needs a
    64-bit hash collision)."""
    t = pa.concat_tables(tabs).combine_chunks()
    d1 = t["h1"].to_numpy(zero_copy_only=False)
    d2 = t["h2"].to_numpy(zero_copy_only=False)
    dw = t["winner_tag"].to_numpy(zero_copy_only=False)
    o = np.lexsort((d2, d1))
    d1, d2, dw = d1[o], d2[o], dw[o]
    if len(d1) > 1:
        runs = np.diff(
            np.flatnonzero(np.concatenate([[True], d1[1:] != d1[:-1], [True]]))
        )
        max_run = int(runs.max())
    else:
        max_run = 1
    return d1, d2, dw, max_run


def _filter_with_winners(
    batch: pa.Table, d1, d2, dw, max_run: int
) -> pa.Table:
    """Vectorized dedup filter against sorted winner arrays: two passes
    (searchsorted + run-bounded h2 probe); drops the key columns."""
    cols_to_drop = ["h1", "h2", "ph", "tag"]
    if len(d1) == 0 or len(batch) == 0:
        return batch.drop_columns(cols_to_drop)
    h1 = batch["h1"].to_numpy(zero_copy_only=False)
    h2 = batch["h2"].to_numpy(zero_copy_only=False)
    tag = batch["tag"].to_numpy(zero_copy_only=False)
    pos = np.searchsorted(d1, h1)
    keep = np.ones(len(batch), bool)
    # k-th probe within each h1 run, vectorized over rows; the loop
    # runs max_run (≈1) times, not once per row
    for k in range(max_run):
        p = pos + k
        valid = p < len(d1)
        pc_ = np.where(valid, p, 0)
        hit = valid & (d1[pc_] == h1) & (d2[pc_] == h2)
        keep[hit & (tag != dw[pc_])] = False
    return batch.filter(pa.array(keep)).drop_columns(cols_to_drop)


def _winner_filter_task(batch: pa.Table, ref=None) -> pa.Table:
    """Task-pool dedup filter for SMALL winner tables: the sorted
    arrays live in the object store once (``ray.put`` on the driver);
    each task fetches them node-locally (zero-copy numpy views) — no
    actor-pool spin-up, no per-actor sort."""
    import ray

    d1, d2, dw, max_run = ray.get(ref)
    return _filter_with_winners(batch, d1, d2, dw, max_run)


class _DupWinnerFilter:
    """Actor-pool dedup filter: fetch the duplicated-key winner blocks
    from the object store once per actor (node-local after the first
    fetch), lexsort into parallel lookup arrays, then filter batches
    with two vectorized passes (searchsorted + run-bounded h2 probe)."""

    def __init__(self, refs):
        import ray

        tabs = [t for t in ray.get(list(refs)) if t.num_rows]
        if tabs:
            self.d1, self.d2, self.dw, self.max_run = _sorted_winner_arrays(tabs)
        else:
            self.d1 = self.d2 = self.dw = np.array([], np.int64)
            self.max_run = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _filter_with_winners(batch, self.d1, self.d2, self.dw, self.max_run)


def _hash_tag_local_distinct(batch: pa.Table) -> pa.Table:
    """Local distinct + content hashes + per-row tag (unique among copies
    of the same key: mixes a block-content hash with the row position)."""
    t = _hash_and_local_distinct(batch)
    n = len(t)
    h1 = t["h1"].to_numpy(zero_copy_only=False).view(np.uint64)
    ph = pd.util.hash_array(
        t["provenance"].to_pandas().fillna("").to_numpy(dtype=object)
    )
    with np.errstate(over="ignore"):  # intentional mod-2^64 wrap
        block_h = np.uint64(np.bitwise_xor.reduce(h1) * np.uint64(0x9E3779B97F4A7C15)) if n else np.uint64(0)
        pos = np.arange(n, dtype=np.uint64)
        tag = (block_h + pos * np.uint64(0xC2B2AE3D27D4EB4F) + h1) & np.uint64(0xFFFFFFFFFFFFFFFF)
    t = t.append_column("ph", pa.array(ph.view(np.int64)))
    return t.append_column("tag", pa.array(tag.view(np.int64)))


def _find_dup_winners(batch: pa.Table) -> pa.Table:
    """Per shuffle partition: keys appearing >1 times → winner tag
    (min (prov-hash, tag))."""
    n = len(batch)
    if n == 0:
        return pa.table(
            {
                "h1": pa.array([], pa.int64()),
                "h2": pa.array([], pa.int64()),
                "winner_tag": pa.array([], pa.int64()),
            }
        )
    batch = batch.combine_chunks()
    h1 = batch["h1"].to_numpy(zero_copy_only=False)
    h2 = batch["h2"].to_numpy(zero_copy_only=False)
    ph = batch["ph"].to_numpy(zero_copy_only=False).view(np.uint64)
    tag = batch["tag"].to_numpy(zero_copy_only=False).view(np.uint64)
    order = np.lexsort((tag, ph, h2, h1))
    h1s, h2s = h1[order], h2[order]
    new_run = np.empty(n, bool)
    new_run[0] = True
    new_run[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
    run_ids = np.cumsum(new_run) - 1
    run_sizes = np.bincount(run_ids)
    dup_runs = np.flatnonzero(run_sizes > 1)
    if len(dup_runs) == 0:
        return pa.table(
            {
                "h1": pa.array([], pa.int64()),
                "h2": pa.array([], pa.int64()),
                "winner_tag": pa.array([], pa.int64()),
            }
        )
    run_starts = np.flatnonzero(new_run)
    first_idx = order[run_starts[dup_runs]]
    return pa.table(
        {
            "h1": pa.array(h1[first_idx]),
            "h2": pa.array(h2[first_idx]),
            "winner_tag": pa.array(tag[first_idx].view(np.int64)),
        }
    )


# --- fused single-scan KG pipeline kernels -----------------------------------
#
# These carry conversation-partial pseudo-rows (stages/extract.py
# PARTIAL_PREDICATE) through the SAME keyed exchange as the triple
# dedup, so the whole transcripts→triples pipeline is one input scan
# and one shuffle.


# module-level (not lazy-in-kernel) imports: worker-side kernels are
# cloudpickled by value with their global refs; a lazy `import
# import_ray...` inside the kernel breaks when the driver cwd is not
# the repo (tests/test_offrepo_cwd.py)
from import_ray.stages.extract import (  # noqa: E402
    PARTIAL_PREDICATE,
    merge_conversation_partials_block,
    partials_from_pseudo_rows,
)


def _fused_partial_mask(batch: pa.Table) -> np.ndarray:
    import pyarrow.compute as pc

    return pc.equal(batch["predicate"], PARTIAL_PREDICATE).to_numpy(
        zero_copy_only=False
    )


def _hash_partial_rows(par: pa.Table) -> pa.Table:
    """h1 = hash(conv_id) (co-locates all partials of a conversation in
    the keyed exchange); h2 = payload+block content nonce so no two
    partial rows ever share (h1, h2) — partials must never be merged by
    a distinct pass (same 64-bit hash-collision stance as the triple
    dedup's 128-bit keys)."""
    h1 = pd.util.hash_array(par["subject_id"].to_pandas().to_numpy(dtype=object))
    pay = pd.util.hash_array(par["object_value"].to_pandas().to_numpy(dtype=object))
    with np.errstate(over="ignore"):  # intentional mod-2^64 wrap
        block_h = (
            np.uint64(np.bitwise_xor.reduce(pay) * np.uint64(0x9E3779B97F4A7C15))
            if len(pay)
            else np.uint64(0)
        )
        pos = np.arange(len(par), dtype=np.uint64)
        h2 = pay * np.uint64(0xC2B2AE3D27D4EB4F) + block_h + pos
    return par.append_column("h1", pa.array(h1.view(np.int64))).append_column(
        "h2", pa.array(h2.view(np.int64))
    )


def hash_fused_rows(batch: pa.Table) -> pa.Table:
    """Per-batch hash + local distinct for fused extraction output:
    triple rows get 128-bit content hashes and the in-batch distinct;
    conv-partial pseudo-rows bypass the distinct and get conv-keyed h1."""
    mask = _fused_partial_mask(batch)
    if not mask.any():
        return _hash_and_local_distinct(batch)
    arrow_mask = pa.array(mask)
    tri = _hash_and_local_distinct(batch.filter(pa.compute.invert(arrow_mask)))
    par = _hash_partial_rows(batch.filter(arrow_mask))
    return pa.concat_tables([tri, par])


def merge_fused_block(batch: pa.Table) -> pa.Table:
    """Per shuffle-partition kernel: split partial pseudo-rows out, merge
    them into conversation triples (all partials of a conv share h1, so
    they are complete within this block), and run the distinct over the
    triple rows. Must run whole-block (``batch_size=None``)."""
    mask = _fused_partial_mask(batch)
    drop = ["h1", "h2"]
    if not mask.any():
        return _local_distinct(batch).drop_columns(drop)
    arrow_mask = pa.array(mask)
    tri = _local_distinct(batch.filter(pa.compute.invert(arrow_mask))).drop_columns(drop)
    par = batch.filter(arrow_mask).drop_columns(drop)
    conv = merge_conversation_partials_block(partials_from_pseudo_rows(par))
    return pa.concat_tables([tri, conv])


def _hash_tag_fused(batch: pa.Table) -> pa.Table:
    """Broadcast-strategy variant: triples get (h1,h2,ph,tag) + local
    distinct; partials get conv-keyed h1, nonce h2/tag (unique, so the
    dup-winner election never elects or filters them), ph = 0."""
    mask = _fused_partial_mask(batch)
    if not mask.any():
        return _hash_tag_local_distinct(batch)
    arrow_mask = pa.array(mask)
    tri = _hash_tag_local_distinct(batch.filter(pa.compute.invert(arrow_mask)))
    par = _hash_partial_rows(batch.filter(arrow_mask))
    n = len(par)
    par = par.append_column("ph", pa.array(np.zeros(n, np.int64)))
    par = par.append_column("tag", par["h2"])
    return pa.concat_tables([tri, par])


def _drop_fused_partials(batch: pa.Table) -> pa.Table:
    mask = _fused_partial_mask(batch)
    if not mask.any():
        return batch
    return batch.filter(pa.compute.invert(pa.array(mask)))


def _keep_fused_partials(batch: pa.Table) -> pa.Table:
    return batch.filter(pa.array(_fused_partial_mask(batch)))


def _dup_h1_block(batch: pa.Table) -> pa.Table:
    """Per shuffle partition (keyed on h1): the h1 values appearing
    more than once — the candidate key set for the full-width winner
    exchange. Runs whole-block (``batch_size=None``)."""
    if len(batch) == 0:
        return pa.table({"h1": pa.array([], pa.int64())})
    h1 = np.sort(
        batch.combine_chunks()["h1"].to_numpy(zero_copy_only=False)
    )
    dup_mask = np.zeros(len(h1), bool)
    dup_mask[:-1] = h1[:-1] == h1[1:]
    dups = np.unique(h1[dup_mask])
    return pa.table({"h1": pa.array(dups)})


# Bloom sizing for the dup-h1 prefilter: 2^23 bits = 1 MB per partial,
# <1 % false-positive rate up to ~800 k duplicated keys. False
# positives only add singleton rows to the round-2 exchange (the
# winner election on full (h1, h2) keys is exact); past that the FP
# rate degrades toward shipping everything — exactly the regime where
# the prefilter stops paying anyway.
_DUP_BLOOM_BITS = 1 << 23
_DUP_BLOOM_K = 4


def broadcast_dedup_hashed(hashed, num_partitions: int, h1_prefilter: bool = False):
    """The broadcast-strategy dedup core over an already-materialized
    dataset carrying (h1, h2, ph, tag): shuffle only the key rows,
    elect per-duplicated-key winners, filter blocks in place via an
    object-store-block actor pool. See ``exact_dedup_triples``.

    ``h1_prefilter=True`` makes the winner exchange two-round: round 1
    ships ONLY the 8-byte h1 column through a keyed exchange to find
    duplicated h1 values, folds them into a fixed-size Bloom filter
    (distributed OR-reduce — dup keys never hit the driver), and round
    2 ships the full 32-byte key rows only for Bloom-candidate rows.
    At low duplicate ratios this cuts winner-exchange bytes ~3.5× —
    8 B/row + 32 B/candidate vs 32 B/row — at the cost of one extra
    pass over the blocks and one extra (narrow) exchange; a corpus
    with no cross-block duplicates short-circuits round 2 entirely.

    Default OFF: the prefilter trades a full extra block pass for
    exchange BYTES, which pays only when shuffle bytes are the
    bottleneck (multi-node, network-bound object transfers). Measured
    single-node at 16 M triples / 32 CPUs: prefilter 15.2 s vs direct
    12.5 s — the object store moves 32 B rows at memory speed, so the
    byte saving cannot win locally. Enable it on real clusters where
    cross-node winner-exchange traffic dominates. Both paths are
    byte-equal (pytest-gated)."""
    import ray

    from import_ray.core.context import cluster_cpus
    from import_ray.stages.bloom import _bit_positions, _test_bits, build_bloom

    n = num_partitions
    # full-width keys exchange: a //2 cap here left half the cores idle
    # during the winner-finding phase at the 4N cluster size and showed
    # up directly as lost scaling efficiency
    width = min(n, max(8, cluster_cpus()))

    if h1_prefilter:
        dup_h1 = (
            hashed.map_batches(
                lambda b: b.select(["h1"]), batch_format="pyarrow"
            )
            .repartition(width, keys=["h1"])
            .map_batches(_dup_h1_block, batch_format="pyarrow", batch_size=None)
        )
        words = build_bloom(dup_h1, "h1", m_bits=_DUP_BLOOM_BITS, k=_DUP_BLOOM_K)
        if words is None or not words.any():
            # no cross-block duplicated h1 anywhere: every row is
            # already globally unique — skip the winner exchange
            return hashed.map_batches(
                lambda b: b.drop_columns(["h1", "h2", "ph", "tag"]),
                batch_format="pyarrow",
            )
        bloom_ref = ray.put(words)

        def probe_candidates(b: pa.Table) -> pa.Table:
            keys_b = b.select(["h1", "h2", "ph", "tag"])
            if len(keys_b) == 0:
                return keys_b
            w = ray.get(bloom_ref)
            h1v = keys_b["h1"].to_numpy(zero_copy_only=False)
            mask = _test_bits(
                w, _bit_positions(h1v, _DUP_BLOOM_BITS, _DUP_BLOOM_K)
            )
            return keys_b.filter(pa.array(mask))

        keys = hashed.map_batches(probe_candidates, batch_format="pyarrow")
    else:
        keys = hashed.map_batches(
            lambda b: b.select(["h1", "h2", "ph", "tag"]), batch_format="pyarrow"
        )
    keys = keys.repartition(width, keys=["h1"])
    # winners stay IN THE OBJECT STORE as blocks: the driver only
    # collects block refs (metadata). The filter stage is an actor pool
    # whose __init__ fetches the blocks node-locally and lexsorts ONCE
    # per actor — at corpus scale the duplicated-key table grows with
    # data, and a driver-side take_all + sort + re-broadcast is a serial
    # Amdahl term that caps scaling efficiency (measured: ~7 s of the
    # per-run fixed cost at 32 M triples came from exactly this).
    winners = keys.map_batches(_find_dup_winners, batch_format="pyarrow").materialize()
    refs = []
    wrows = 0
    for bundle in winners.iter_internal_ref_bundles():
        for block_ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(block_ref)
                wrows += meta.num_rows

    if not refs:
        return hashed.map_batches(
            lambda b: b.drop_columns(["h1", "h2", "ph", "tag"]),
            batch_format="pyarrow",
        )

    if wrows <= WINNER_TASK_BUDGET:
        # small winner table (the common case after per-block local
        # distinct: only CROSS-block duplicates reach here): sort ONCE
        # on the driver (bounded by the budget, not the corpus),
        # ray.put the arrays, and filter with a plain TASK pool —
        # actor-pool spin-up was a measured ~1.5-2 s fixed cost per
        # execution and every actor repeated the same lexsort
        import ray

        tabs = [t for t in ray.get(refs) if t.num_rows]
        ref = ray.put(_sorted_winner_arrays(tabs))
        return hashed.map_batches(
            _winner_filter_task,
            fn_kwargs={"ref": ref},
            batch_format="pyarrow",
        )

    return hashed.map_batches(
        _DupWinnerFilter,
        fn_constructor_args=(refs,),
        batch_format="pyarrow",
        concurrency=(1, max(2, cluster_cpus())),
    )


def add_text_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    """Vectorized 64-bit content hash column for exact document dedup."""
    s = batch[col].to_pandas()
    h = pd.util.hash_array(s.to_numpy(dtype=object)).astype(np.int64)
    return batch.append_column("text_hash", pa.array(h, pa.int64()))


def exact_dedup_documents(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Exact document dedup: hash-partition on content hash, keep the
    first (min id) doc per identical text."""
    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    from ray.data.aggregate import Min

    ds = ds.map_batches(lambda b: add_text_hash(b, text_col), batch_format="pyarrow")
    ds = ds.select_columns([id_col, "text_hash"])
    return ds.groupby("text_hash", num_partitions=npartitions()).aggregate(
        Min(id_col, alias_name=id_col)
    )


# --- segment-level dedup (CCNet-style paragraph dedup over token windows) ----


def _segment_hashes(batch: pa.Table, seg_tokens: int):
    """(doc_id, seg_idx, h1, h2) per fixed token window — no segment
    strings are materialized: each segment's identity is a 128-bit
    order-dependent polynomial hash over its token hashes, built with
    flat numpy ops (split → flatten → reduceat). Only these 32-byte
    key rows ever enter the dedup exchange."""
    import pyarrow.compute as pc

    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lists = pc.split_pattern(text, pattern=" ")
    n_tok = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    if len(ids) == 0 or n_tok.sum() == 0:
        empty = pa.array([], pa.int64())
        return pa.table({"doc_id": empty, "seg_idx": empty, "h1": empty, "h2": empty})
    flat = pc.list_flatten(lists).to_pandas()
    th1 = pd.util.hash_array(flat.to_numpy(dtype=object)).astype(np.uint64)
    # independent second hash: splitmix-style remix of the first
    th2 = (th1 ^ np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xC2B2AE3D27D4EB4F)

    # flat index → (doc, token position); segment = pos // seg_tokens
    doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), n_tok)
    offs = np.cumsum(n_tok) - n_tok
    pos = np.arange(int(n_tok.sum()), dtype=np.int64) - offs[doc_of]
    seg = pos // seg_tokens
    pos_in_seg = pos % seg_tokens

    pow1 = np.empty(seg_tokens, np.uint64)
    pow2 = np.empty(seg_tokens, np.uint64)
    pow1[0] = pow2[0] = 1
    for k in range(1, seg_tokens):
        pow1[k] = pow1[k - 1] * np.uint64(31)
        pow2[k] = pow2[k - 1] * np.uint64(1000003)
    terms1 = th1 * pow1[pos_in_seg]
    terms2 = th2 * pow2[pos_in_seg]

    # segment starts in the flat array: positions where pos_in_seg == 0
    starts = np.nonzero(pos_in_seg == 0)[0]
    h1 = np.add.reduceat(terms1, starts).astype(np.int64)
    h2 = np.add.reduceat(terms2, starts).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids[doc_of[starts]]),
            "seg_idx": pa.array(seg[starts]),
            "h1": pa.array(h1),
            "h2": pa.array(h2),
        }
    )


def segment_dedup_documents(docs_ds, seg_tokens: int = 4):
    """Corpus-level segment dedup (the CCNet paragraph-dedup shape over
    fixed ``seg_tokens``-token windows, since the synthetic docs have no
    paragraph breaks): every duplicated segment keeps only its FIRST
    occurrence (min (doc_id, seg_idx)) across the whole corpus, and each
    document is reassembled from its surviving segments. Docs that lose
    every segment disappear (SQL ``string_agg`` group parity).

    Scale plan: the winner election shuffles 32-byte hash keys only
    (never text); the per-doc kept-segment lists (small ints) come back
    to the docs via ONE distributed hash join on doc_id, so document
    text crosses the wire exactly once.
    """
    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    ensure_hash_shuffle(docs_ds)
    n = data_nparts(docs_ds)

    segs = docs_ds.map_batches(
        lambda b: _segment_hashes(b, seg_tokens), batch_format="pyarrow"
    )

    def block_winners(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            ["h1", "h2", "doc_id", "seg_idx"], kind="mergesort"
        ).drop_duplicates(["h1", "h2"], keep="first")
        return pa.Table.from_pandas(
            df[["doc_id", "seg_idx"]], preserve_index=False
        ).replace_schema_metadata(None)

    winners = segs.repartition(n, keys=["h1"]).map_batches(
        block_winners, batch_format="pyarrow", batch_size=None
    )

    def kept_lists(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = (
            df.sort_values(["doc_id", "seg_idx"], kind="mergesort")
            .groupby("doc_id", sort=False)["seg_idx"]
            .agg(lambda s: ",".join(map(str, s)))
            .reset_index(name="kept")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(
            None
        )

    kept = winners.repartition(n, keys=["doc_id"]).map_batches(
        kept_lists, batch_format="pyarrow", batch_size=None
    )

    from import_ray.core.context import join_safe

    # keyed-repartition partitions with zero rows emit schema-less
    # blocks that break acero on the join's right side (join_safe doc)
    j = docs_ds.select_columns(["doc_id", "text"]).join(
        join_safe(kept),
        join_type="inner",
        num_partitions=n,
        on=("doc_id",),
        right_on=("doc_id",),
    )

    def reassemble(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lists = pc.split_pattern(text, pattern=" ")
        n_tok = (
            pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lists).to_pandas().to_numpy(dtype=object)
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), n_tok)
        offs = np.cumsum(n_tok) - n_tok
        pos = np.arange(int(n_tok.sum()), dtype=np.int64) - offs[doc_of]
        seg = pos // seg_tokens
        # token keep mask: (local doc index, seg) present in its kept list
        kept_sets = [
            frozenset(int(x) for x in s.split(",")) if s else frozenset()
            for s in batch["kept"].to_pylist()
        ]
        max_seg = int(seg.max()) + 1 if len(seg) else 1
        keep_flat = np.zeros(len(ids) * max_seg, dtype=bool)
        for d, ks in enumerate(kept_sets):
            for s in ks:
                if s < max_seg:
                    keep_flat[d * max_seg + s] = True
        mask = keep_flat[doc_of * max_seg + seg]
        df = pd.DataFrame({"doc_id": ids[doc_of[mask]], "tok": flat[mask]})
        out = (
            df.groupby("doc_id", sort=False)["tok"]
            .agg(" ".join)
            .reset_index(name="text")
        )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    return j.map_batches(reassemble, batch_format="pyarrow")


SEGMENT_DEDUP_SQL_TEMPLATE = """
WITH toks AS (
  SELECT doc_id,
         UNNEST(string_split(text,' ')) AS tok,
         UNNEST(range(len(string_split(text,' ')))) AS i
  FROM documents
), segs AS (
  SELECT doc_id, i // {seg_tokens} AS seg_idx,
         string_agg(tok, ' ' ORDER BY i) AS seg
  FROM toks GROUP BY doc_id, i // {seg_tokens}
), ranked AS (
  SELECT doc_id, seg_idx, seg,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
  FROM segs
)
SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text
FROM ranked WHERE rn = 1
GROUP BY doc_id
"""


# --- incremental corpus dedup (new shard vs already-ingested corpus) ---------


def incremental_dedup_documents(
    new_ds,
    existing_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    m_bits: int = 1 << 23,
    k: int = 4,
):
    """Exact dedup of a NEW shard against an already-ingested corpus:
    keep each new doc whose text never appears in the existing corpus,
    collapsing within-shard duplicates to the min id. The incremental
    analog of ``exact_dedup_documents`` — how a continuously-ingesting
    100 TB pipeline admits a day's shard without re-deduping history.

    Exchange budget: both sides reduce to 64-bit content hashes (16
    B/row; bodies never move). Every NEW row must co-locate by hash
    anyway (within-shard dup collapse), so the Bloom filter points the
    OTHER way: a distributed OR-reduce (`stages/bloom.py`) over the
    NEW shard's hashes, broadcast once, prefilters the EXISTING side —
    history rows that can't match any new hash (no false negatives)
    never leave their scan task. The whole operator is ONE aggregate
    (the ~1 MB bitmap) + ONE keyed exchange of |new| + (dup∩ + fp·|old|)
    hash rows; history is scanned but never shuffled.
    """
    import ray

    from import_ray.core.context import ensure_hash_shuffle, npartitions
    from import_ray.stages.bloom import _bit_positions, _test_bits, build_bloom

    ensure_hash_shuffle(new_ds)
    ensure_hash_shuffle(existing_ds)

    def _new_rows(b: pa.Table) -> pa.Table:
        # fresh metadata-free tables throughout: pandas schema metadata
        # on parquet batches defeats schema dedup in the exchange
        t = add_text_hash(b, text_col)
        return pa.table(
            {
                id_col: t[id_col],
                "text_hash": t["text_hash"],
                "is_new": pa.array(np.ones(len(t), bool)),
            }
        )

    # hashes only (17 B/row): pinned so the bloom build and the
    # exchange don't re-run the text hashing pass
    hash_new = new_ds.map_batches(_new_rows, batch_format="pyarrow").materialize()
    words = build_bloom(hash_new, "text_hash", m_bits=m_bits, k=k)
    ref = ray.put(words)

    def _relevant_old(b: pa.Table) -> pa.Table:
        w = ray.get(ref)
        t = add_text_hash(b, text_col)
        keys = t["text_hash"].to_numpy(zero_copy_only=False)
        if len(keys):
            t = t.filter(pa.array(_test_bits(w, _bit_positions(keys, m_bits, k))))
        n = len(t)
        return pa.table(
            {
                id_col: pa.array(np.zeros(n, np.int64)),
                "text_hash": t["text_hash"],
                "is_new": pa.array(np.zeros(n, bool)),
            }
        )

    both = hash_new.union(
        existing_ds.map_batches(_relevant_old, batch_format="pyarrow")
    )

    def anti_block(b: pa.Table) -> pa.Table:
        is_new = b["is_new"].to_numpy(zero_copy_only=False)
        hashes = b["text_hash"].to_numpy(zero_copy_only=False)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        keep = is_new & ~np.isin(hashes, hashes[~is_new])
        # min id per surviving within-shard dup group, one lexsort
        h, i = hashes[keep], ids[keep]
        if len(h) == 0:
            return pa.table({id_col: pa.array([], pa.int64())})
        order = np.lexsort((i, h))
        h, i = h[order], i[order]
        first = np.r_[True, h[1:] != h[:-1]]
        return pa.table({id_col: pa.array(i[first], pa.int64())})

    return both.repartition(npartitions(), keys=["text_hash"]).map_batches(
        anti_block, batch_format="pyarrow", batch_size=None
    )
