"""Near-duplicate detection over documents: MinHash-LSH, SimHash,
n-gram Jaccard.

These are training-data-pipeline operators (no equivalent in the
reference, which only has exact dedup + ngram name matching —
SURVEY.md §2.9). All follow the scalable LSH shape:

  map_batches(signatures)                 # vectorized numpy per batch
    → flat band rows (band_id, band_hash, doc_id)
    → repartition(keys=[band_hash])       # hash shuffle, int64 keys
    → per-block candidate pairs (capped per bucket, logged when capped)
    → signature-based similarity verify (no second data pass)
    → connected components via DISTRIBUTED iterative min-label
      propagation (groupby rounds; no O(N) driver structure)

Vectorization: token hashing, shingling, minhash permutations, band
hashing and simhash bit-voting are all flat numpy array ops over the
whole batch (segment boundaries via ``np.minimum.reduceat`` /
``np.add.reduceat``) — no per-document Python loops. Arithmetic is
uint64 wraparound (multiply-add universal hashing with odd multipliers)
instead of object-dtype Mersenne math.

Determinism: hash seeds are fixed; candidate pair order is normalized
(lo,hi); min-label propagation converges to min-doc_id cluster labels
independent of partitioning.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

MAX_PAIRS_PER_BUCKET = 1000  # skew guard; buckets larger than this are sampled
MAX_BUCKET_MEMBERS = 200  # simhash skew guard (see simhash_pairs)
# pair sets at or below this size are labeled with a driver union-find
# over the PAIRS (not the corpus — LSH pairs << docs) and broadcast as
# a lookup map; larger sets use distributed min-label propagation
MAX_DRIVER_PAIRS = 2_000_000
# pointer-jumping label tables at or below this many rows broadcast as
# sorted arrays (two int64 cols → 64 MB at the cap) and the jump runs
# as a zero-exchange searchsorted lookup; larger tables pay the
# labels⋈labels hash join instead (propagate_min_labels.jump)
JUMP_BROADCAST_BUDGET = 4_000_000


from import_ray.core.arrowutil import from_pandas_clean
from import_ray.core.context import data_nparts as _data_nparts

# odd multipliers for wraparound polynomial combines (splitmix64 constants)
_POLY_B = np.uint64(0x9E3779B97F4A7C15)
_MIX_C = np.uint64(0xBF58476D1CE4E5B9)

# 256-entry popcount lookup table (vectorized hamming distance)
_POP8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def _split_flat(batch: pa.Table):
    """Split ``text`` on single spaces → (counts, flat token hashes).

    counts[i] ≥ 1 for every doc (splitting "" yields [""]). Token
    hashing goes through a dictionary encode so only UNIQUE tokens are
    hashed (Zipf text repeats heavily), then fancy-indexes back.
    """
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lists = pc.split_pattern(text, pattern=" ")
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lists)
    if len(flat) == 0:
        return counts, np.zeros(0, np.uint64)
    d = flat.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False)
    uniq = np.asarray(d.dictionary.to_pylist(), dtype=object)
    return counts, pd.util.hash_array(uniq).astype(np.uint64)[codes]


def _shingle_hashes_flat(counts: np.ndarray, h: np.ndarray, n: int = 3):
    """Rolling-polynomial word-``n``-gram shingle hashes for a whole
    batch at once.

    Docs with ≥n tokens contribute ``c - n + 1`` windows; shorter docs
    contribute one shingle (polynomial over all their tokens). Returns
    (shingle_counts_per_doc, flat_shingles) with shingles grouped in
    doc order — ready for ``np.minimum.reduceat`` segmentation.
    """
    ndocs = len(counts)
    starts = np.zeros(ndocs, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    sh_counts = np.maximum(counts - n + 1, 1)
    offsets = np.zeros(ndocs, np.int64)
    np.cumsum(sh_counts[:-1], out=offsets[1:])
    out = np.zeros(int(sh_counts.sum()), np.uint64)

    total = len(h)
    if total >= n:
        # full windows over the flat array; windows crossing a doc
        # boundary are dropped by the doc-equality mask
        w = h[: total - n + 1].copy()
        for k in range(1, n):
            w = w * _POLY_B + h[k : total - n + 1 + k]
        doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
        valid = doc_of[: total - n + 1] == doc_of[n - 1 :]
        starts_rep = np.repeat(starts, counts)
        out_idx = offsets[doc_of[: total - n + 1]] + (
            np.arange(total - n + 1, dtype=np.int64) - starts_rep[: total - n + 1]
        )
        out[out_idx[valid]] = w[valid]

    short = counts < n
    if short.any():
        s_starts = starts[short]
        s_counts = counts[short]
        s_off = offsets[short]
        acc = h[s_starts].copy()
        for k in range(1, n - 1):
            more = s_counts > k
            acc[more] = acc[more] * _POLY_B + h[s_starts[more] + k]
        out[s_off] = acc
    return sh_counts, out


class MinHashSignatures:
    """map_batches kernel: doc rows → (doc_id, band_id, band_hash,
    signature) rows — one fully-vectorized pass per batch.

    Memory: ``num_perm × total_shingles × 8 B`` for the permutation
    matrix — size ``batch_size`` so that stays ≲ tens of MB (the
    pipeline below passes ``batch_size=512``).
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_n: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = (rng.integers(1, 1 << 62, num_perm, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
        self.b = rng.integers(0, 1 << 63, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_n = shingle_n
        self.band_salt = rng.integers(1, 1 << 62, bands, dtype=np.uint64) | np.uint64(1)

    def signatures(self, batch: pa.Table) -> np.ndarray:
        """(num_perm, n_docs) uint64 minhash matrix for the batch."""
        counts, h = _split_flat(batch)
        sh_counts, sh = _shingle_hashes_flat(counts, h, self.shingle_n)
        seg = np.zeros(len(counts), np.int64)
        np.cumsum(sh_counts[:-1], out=seg[1:])
        # one permutation at a time: peak temp is O(S), not O(k·S) — the
        # (k, S) product matrix is ~0.5 GB at batch_size=512 on long docs
        # and trashes cache; the per-row loop stays L2-resident
        out = np.empty((self.num_perm, len(counts)), np.uint64)
        tmp = np.empty(len(sh), np.uint64)
        for k in range(self.num_perm):
            np.multiply(self.a[k], sh, out=tmp)
            np.add(tmp, self.b[k], out=tmp)
            out[k] = np.minimum.reduceat(tmp, seg)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        sig = self.signatures(batch)  # (num_perm, n)
        # band hash: polynomial combine of the band's rows + band salt,
        # finalized with a xor-shift mix (deterministic across processes)
        bh = np.empty((self.bands, n), np.uint64)
        for b in range(self.bands):
            acc = np.full(n, self.band_salt[b], np.uint64)
            for r in range(self.rows_per_band):
                acc = acc * _POLY_B + sig[b * self.rows_per_band + r]
            acc ^= acc >> np.uint64(31)
            acc *= _MIX_C
            acc ^= acc >> np.uint64(29)
            bh[b] = acc
        width = 8 * self.num_perm
        sig_tiled = np.tile(np.ascontiguousarray(sig.T), (self.bands, 1))
        sig_col = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(width), n * self.bands, [None, pa.py_buffer(sig_tiled.tobytes())]
        )
        band_ids = np.repeat(np.arange(self.bands, dtype=np.int32), n)
        return pa.table(
            {
                "doc_id": pa.array(np.tile(ids, self.bands), pa.int64()),
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(
                    (bh.reshape(-1) & np.uint64(0x7FFFFFFFFFFFFFFF)).view(np.int64),
                    pa.int64(),
                ),
                "signature": sig_col,
            }
        )


def _sig_matrix(col, num_perm: int) -> np.ndarray:
    """(n, num_perm) uint64 view of a FixedSizeBinary signature column —
    a direct slice of the Arrow data buffer, no per-row Python bytes."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, num_perm), np.uint64)
    flat = np.frombuffer(col.buffers()[1], np.uint64)
    off = col.offset * num_perm
    return flat[off : off + n * num_perm].reshape(n, num_perm)


def _dedup_pair_arrays(lo: np.ndarray, hi: np.ndarray, *extras: np.ndarray):
    """Drop duplicate (lo, hi) rows — lexsort + adjacent-run mask
    (works for arbitrary int64 ids; no Python set)."""
    if len(lo) == 0:
        return (lo, hi, *extras)
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    keep = np.ones(len(lo), bool)
    keep[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
    return (lo[keep], hi[keep], *(e[order][keep] for e in extras))


def dedup_pairs_exchange(pairs_ds, lo_col: str, hi_col: str, nparts: int):
    """Globally drop duplicate (lo, hi) rows with ONE keyed shuffle +
    a per-block lexsort dedup — all extra columns keep the first
    survivor's value (callers only pass extras that are pure functions
    of the pair, so any survivor is correct).

    This replaces ``groupby(...).aggregate(...)`` for pair dedup: ray
    2.49's HashAggregate runs Python-level per-group finalization
    (measured 5-8x the wall of a plain keyed shuffle on 150k pairs),
    while hash-partitioning on ``lo_col`` + a vectorized per-block pass
    is exact because the hash-shuffle aggregator finalizes each
    partition as a SINGLE block (hash_shuffle.py Concat.finalize) and
    ``map_batches(batch_size=None)`` never splits a block across
    batches — every copy of a pair shares lo, hence partition, hence
    batch."""

    def block_dedup(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        lo = b[lo_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b[hi_col].to_numpy(zero_copy_only=False).astype(np.int64)
        extras = [
            b[c].to_numpy(zero_copy_only=False)
            for c in b.schema.names
            if c not in (lo_col, hi_col)
        ]
        names = [c for c in b.schema.names if c not in (lo_col, hi_col)]
        lo, hi, *extras = _dedup_pair_arrays(lo, hi, *extras)
        cols = {lo_col: pa.array(lo, pa.int64()), hi_col: pa.array(hi, pa.int64())}
        for name, e in zip(names, extras):
            cols[name] = pa.array(e)
        return pa.table(cols)

    return pairs_ds.repartition(nparts, keys=[lo_col]).map_batches(
        block_dedup, batch_size=None, batch_format="pyarrow"
    )


def _bucket_pairs(batch: pa.Table, threshold: float, num_perm: int) -> pa.Table:
    """Per-block: group by (band_id, band_hash); emit verified pairs.

    Bucket grouping is a pandas hash groupby; within each bucket the
    pair similarity check is a vectorized signature-matrix comparison.
    Pair output is accumulated as numpy arrays and deduped with one
    lexsort — no per-pair Python appends. Buckets larger than the skew
    cap are truncated and LOGGED.
    """
    df = pd.DataFrame(
        {
            "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
            "key": batch["band_id"].to_numpy(zero_copy_only=False).astype(np.int64) << 48
            ^ batch["band_hash"].to_numpy(zero_copy_only=False),
            "row": np.arange(len(batch)),
        }
    )
    sigs_flat = _sig_matrix(batch["signature"], num_perm)
    lo_parts, hi_parts, sim_parts = [], [], []
    capped = 0
    for _, grp in df.groupby("key", sort=False):
        m = len(grp)
        if m < 2:
            continue
        grp = grp.sort_values("doc_id", kind="mergesort")
        if m * (m - 1) // 2 > MAX_PAIRS_PER_BUCKET:
            # cap MEMBERS (not pairs) so the triu allocation stays bounded
            capped += 1
            m = int((2 * MAX_PAIRS_PER_BUCKET) ** 0.5) + 1
            grp = grp.iloc[:m]
        ids = grp["doc_id"].to_numpy()
        rows = grp["row"].to_numpy()
        ii, jj = np.triu_indices(m, 1)
        est = (sigs_flat[rows[ii]] == sigs_flat[rows[jj]]).mean(axis=1)
        ok = est >= threshold
        lo_parts.append(ids[ii[ok]])
        hi_parts.append(ids[jj[ok]])
        sim_parts.append(est[ok])
    if capped:
        logger.warning(
            "minhash LSH: %d bucket(s) exceeded MAX_PAIRS_PER_BUCKET=%d; pairs sampled",
            capped,
            MAX_PAIRS_PER_BUCKET,
        )
    if lo_parts:
        # est_jaccard is a pure function of the pair's signatures, so
        # duplicate (lo, hi) rows always carry the same value — any
        # survivor is correct
        lo, hi, sim = _dedup_pair_arrays(
            np.concatenate(lo_parts).astype(np.int64),
            np.concatenate(hi_parts).astype(np.int64),
            np.concatenate(sim_parts),
        )
    else:
        lo = hi = np.zeros(0, np.int64)
        sim = np.zeros(0, np.float64)
    return pa.table(
        {
            "doc_lo": pa.array(lo, pa.int64()),
            "doc_hi": pa.array(hi, pa.int64()),
            "est_jaccard": pa.array(sim.astype(np.float64), pa.float64()),
        }
    )


def _lsh_raw_pairs(docs_ds, threshold: float, num_perm: int, bands: int):
    """Un-deduplicated candidate pairs (one shuffle); returns
    (pairs_ds, nparts). The same pair can appear once per colliding
    band — callers either groupby-dedup or union-find (which dedups
    naturally)."""
    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(docs_ds)
    nparts = _data_nparts(docs_ds)
    sig = MinHashSignatures(num_perm=num_perm, bands=bands)
    band_rows = docs_ds.map_batches(sig, batch_format="pyarrow", batch_size=512)
    band_rows = band_rows.repartition(nparts, keys=["band_hash"])
    pairs = band_rows.map_batches(
        lambda b: _bucket_pairs(b, threshold, num_perm), batch_format="pyarrow"
    )
    return pairs, nparts


def minhash_lsh_pairs(docs_ds, threshold: float = 0.7, num_perm: int = 64, bands: int = 16):
    """Dataset of near-duplicate candidate pairs with estimated Jaccard."""
    pairs, nparts = _lsh_raw_pairs(docs_ds, threshold, num_perm, bands)
    # same pair can surface from multiple bands with IDENTICAL
    # est_jaccard (pure function of the two signatures) → exact dedup
    # on the pair via one keyed shuffle
    return dedup_pairs_exchange(pairs, "doc_lo", "doc_hi", nparts)


def propagate_min_labels(pairs_ds, max_rounds: int = 25, shortcut: bool = True):
    """Distributed connected components over a pair Dataset via
    iterative min-label propagation (groupby rounds) with pointer
    doubling.

    Only nodes that appear in at least one pair carry a label row —
    singletons never enter the shuffle and default to self downstream.
    Each round: label(v) ← min(label(v), min label(u) over neighbors u),
    computed as edges⋈labels + groupby-min. From round
    ``_SHORTCUT_AFTER`` on (``shortcut=True``) each round also runs one
    pointer-jumping pass label(v) ← label(label(v)) — a single
    labels⋈labels join on the (node-bounded, not edge-bounded) label
    table that doubles the remaining reach, so rounds grow with
    log(diameter) instead of diameter (Shiloach-Vishkin shortcutting).
    Shallow graphs (LSH clusters, typical sameAs graphs) converge
    before the shortcut engages and never pay the extra join's fixed
    exchange cost; deep chains get the log behavior. Labels only ever
    decrease and every label is a node id inside the same component,
    so the fixpoint — the component minimum — is IDENTICAL with or
    without shortcutting (pytest-gated byte-equal); convergence is
    detected by the label-sum invariant (strictly decreasing until
    fixpoint). The labels dataset is bounded by the number of
    non-singleton docs, NOT the corpus; per-round exchanges are sized
    to the EDGE table, not the cluster, so small graphs don't pay
    full-width aggregator-pool spin-up every round.

    Returns a Dataset (node:int64, label:int64).
    """
    from ray.data.aggregate import Min

    from import_ray.core.context import npartitions

    def label_checksum(labels_ds) -> int:
        """EXACT Σ label over int64 hash labels at any scale: per-block
        numpy split-sums (low 32 bits unsigned + arithmetic high 32) as
        decimal strings, folded driver-side in Python ints. Avoids
        Ray's Sum aggregator overflowing int64 on hash-valued labels
        (which silently falls back to pickled-object blocks)."""
        def part(b: pa.Table) -> pa.Table:
            arr = b["label"].to_numpy(zero_copy_only=False)
            lo = int((arr & np.int64(0xFFFFFFFF)).sum(dtype=np.int64))
            hi = int((arr >> np.int64(32)).sum(dtype=np.int64))
            return pa.table(
                {"lo": pa.array([str(lo)]), "hi": pa.array([str(hi)])}
            )

        parts = labels_ds.map_batches(part, batch_format="pyarrow").to_pandas()
        return sum(int(v) for v in parts["lo"]) + (
            sum(int(v) for v in parts["hi"]) << 32
        )

    def both_dirs(b: pa.Table) -> pa.Table:
        lo = b["doc_lo"].to_numpy(zero_copy_only=False)
        hi = b["doc_hi"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([lo, hi]), pa.int64()),
                "nbr": pa.array(np.concatenate([hi, lo]), pa.int64()),
            }
        )

    from import_ray.core.context import join_safe

    # pairs_ds is aggregate-derived → re-block before joins (join_safe)
    edges = (
        join_safe(pairs_ds.map_batches(both_dirs, batch_format="pyarrow"))
        .materialize()
    )
    n_edges = edges.count()
    # per-round exchange width sized to the DATA: every round pays
    # aggregator-pool spin-up ∝ partitions, and label/edge rows are
    # 16 B — full cluster width on a small graph is pure fixed cost
    nparts = min(npartitions(), max(2, int(n_edges // 1_000_000) + 1))
    if n_edges == 0:
        import ray.data

        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())})
        )

    # round 0: label(v) = min(v, min neighbor)
    labels = join_safe(
        edges.groupby("node", num_partitions=nparts)
        .aggregate(Min("nbr", alias_name="label"))
        .map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "label": pc.min_element_wise(b["node"], b["label"]),
                }
            ),
            batch_format="pyarrow",
        )
    ).materialize()
    prev_sum = label_checksum(labels)

    def jump(lab, n_rows):
        """label(v) ← label(label(v)). Every label IS a node with a
        label row (it entered via some edge endpoint).

        Under ``JUMP_BROADCAST_BUDGET`` label rows (``lab`` is
        materialized, so the count is metadata), the label table
        broadcasts once (``ray.put`` of two sorted int64 arrays) and
        the jump is a ZERO-EXCHANGE vectorized searchsorted lookup per
        block — this removes one of the three per-round keyed
        exchanges for every graph whose non-singleton node set fits
        the budget (the common case: label rows ≪ edge rows). Past the
        budget it falls back to the labels⋈labels hash join on the
        8-byte label key (left_outer + coalesce defensively). Both
        paths are byte-equal (pytest-gated)."""
        if n_rows <= JUMP_BROADCAST_BUDGET:
            import ray

            df = lab.to_pandas()
            nodes = df["node"].to_numpy(np.int64)
            labs = df["label"].to_numpy(np.int64)
            o = np.argsort(nodes, kind="mergesort")
            ref = ray.put((nodes[o], labs[o]))

            def lookup(b: pa.Table) -> pa.Table:
                ns, ls = ray.get(ref)
                lv = b["label"].to_numpy(zero_copy_only=False)
                if not len(lv) or not len(ns):
                    return b
                pos = np.minimum(np.searchsorted(ns, lv), len(ns) - 1)
                hit = ns[pos] == lv
                return pa.table(
                    {
                        "node": b["node"],
                        "label": pa.array(
                            np.where(hit, ls[pos], lv), pa.int64()
                        ),
                    }
                )

            return lab.map_batches(lookup, batch_format="pyarrow")
        out = join_safe(
            lab.join(
                lab,
                join_type="left_outer",
                num_partitions=nparts,
                on=("label",),
                right_on=("node",),
                right_suffix="_r",
            )
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "label": pc.coalesce(b["label_r"], b["label"]),
                }
            ),
            batch_format="pyarrow",
        )
        return join_safe(out)

    _SHORTCUT_AFTER = 3  # shallow graphs converge before paying the jump join
    for _round in range(max_rounds):
        nbr_labels = edges.join(
            labels,
            join_type="inner",
            num_partitions=nparts,
            on=("nbr",),
            right_on=("node",),
            right_suffix="_r",
        ).select_columns(["node", "label"])
        labels = join_safe(
            labels.union(nbr_labels)
            .groupby("node", num_partitions=nparts)
            .aggregate(Min("label", alias_name="label"))
        )
        if shortcut and _round >= _SHORTCUT_AFTER:
            labels = labels.materialize()
            labels = jump(labels, labels.count())
        labels = labels.materialize()
        cur_sum = label_checksum(labels)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        logger.warning(
            "propagate_min_labels: no fixpoint after %d rounds (very deep cluster?)",
            max_rounds,
        )
    return labels


def _union_find_labels(pair_rows) -> dict[int, int]:
    """Union-find over candidate PAIRS only → min-id label per
    non-singleton node. Memory ∝ pairs (LSH output), NOT corpus."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    for r in pair_rows:
        ra, rb = find(r["doc_lo"]), find(r["doc_hi"])
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


def label_clusters(
    ids_ds,
    pairs_ds,
    id_col: str = "doc_id",
    label_col: str = "cluster_id",
    max_driver_pairs: int = MAX_DRIVER_PAIRS,
):
    """Hybrid connected-component labeling shared by every pair-based
    clustering operator (minhash near-dup, entity resolution):
    ``ids_ds`` (one row per entity, int64 ``id_col``) × a MATERIALIZED
    pair Dataset (doc_lo, doc_hi) → (``id_col``, ``label_col``) with
    the label = min id of the component; ids in no pair label
    themselves. Both paths bounded by the PAIR set (never an O(corpus)
    driver structure):

    - pairs ≤ ``max_driver_pairs`` (the common case — candidates
      ≪ corpus): driver union-find over the pairs, labels BROADCAST
      through the object store, one vectorized fill pass over the
      corpus — no extra shuffle.
    - larger pair sets: distributed groupby min-label propagation +
      left-outer join back onto the corpus.
    """
    import ray

    from import_ray.core.context import npartitions

    if pairs_ds.count() <= max_driver_pairs:
        labels_ref = ray.put(_union_find_labels(pairs_ds.take_all()))

        class Fill:
            def __init__(self, ref):
                self._ref = ref
                self._labels = None

            def __call__(self, b: pa.Table) -> pa.Table:
                if self._labels is None:
                    self._labels = ray.get(self._ref)
                ids = pd.Series(b[id_col].to_numpy(zero_copy_only=False))
                lab = ids.map(self._labels).fillna(ids).astype(np.int64)
                return pa.table(
                    {
                        id_col: pa.array(ids.to_numpy(), pa.int64()),
                        label_col: pa.array(lab.to_numpy(), pa.int64()),
                    }
                )

        return ids_ds.map_batches(Fill(labels_ref), batch_format="pyarrow")

    labels = propagate_min_labels(pairs_ds)
    out = ids_ds.join(
        labels,
        join_type="left_outer",
        num_partitions=npartitions(),
        on=(id_col,),
        right_on=("node",),
    )

    def finish(b: pa.Table) -> pa.Table:
        lab = b["label"]
        return pa.table(
            {
                id_col: b[id_col],
                label_col: pc.coalesce(lab, pc.cast(b[id_col], pa.int64())),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def minhash_dedup(docs_ds, threshold: float = 0.7, max_driver_pairs: int = MAX_DRIVER_PAIRS):
    """(doc_id, cluster_id) Dataset — cluster_id = min doc_id of the
    near-dup cluster; singleton docs map to themselves. LSH candidate
    pairs → hybrid labeling (``label_clusters``)."""
    pairs, _ = _lsh_raw_pairs(docs_ds, threshold, num_perm=64, bands=16)
    return label_clusters(
        docs_ds.select_columns(["doc_id"]),
        pairs.materialize(),
        max_driver_pairs=max_driver_pairs,
    )


class SimHashKernel:
    """64-bit SimHash per doc — flat token hashing + segmented bit
    voting (``np.add.reduceat``), no per-doc Python loop."""

    def __init__(self, seed: int = 11):
        self.seed = seed
        self.bits = np.arange(64, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts, h = _split_flat(batch)
        ndocs = len(counts)
        seg = np.zeros(ndocs, np.int64)
        np.cumsum(counts[:-1], out=seg[1:])
        # (T, 64) bit matrix for every token in the batch, then per-doc
        # column sums via segmented reduce (int32: docs are < 2^31 tokens)
        bit_matrix = ((h[:, None] >> self.bits[None, :]) & np.uint64(1)).astype(np.int32)
        sums = np.add.reduceat(bit_matrix, seg, axis=0)  # (ndocs, 64)
        votes = sums * 2 - counts[:, None]
        out = ((votes > 0).astype(np.uint64) << self.bits[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(out.view(np.int64), pa.int64()),
            }
        )


def simhash_pairs(docs_ds, max_hamming: int = 3):
    """Near-dup pairs by SimHash: bucket by 4×16-bit bands (any pair
    within hamming ≤3 of a 64-bit hash shares at least one exact band),
    verify hamming distance within buckets."""
    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(docs_ds)
    nparts = _data_nparts(docs_ds)
    sigs = docs_ds.map_batches(SimHashKernel(), batch_format="pyarrow", batch_size=512)

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        hs = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(ids)
        bands = np.arange(4, dtype=np.uint64)
        keys = ((hs[None, :] >> (bands[:, None] * np.uint64(16))) & np.uint64(0xFFFF)).astype(
            np.int64
        )
        keys |= (bands[:, None].astype(np.int64)) << 16
        return pa.table(
            {
                "doc_id": pa.array(np.tile(ids, 4), pa.int64()),
                "band_id": pa.array(np.repeat(np.arange(4, dtype=np.int32), n)),
                "band_hash": pa.array(keys.reshape(-1), pa.int64()),
                "simhash": pa.array(np.tile(hs.view(np.int64), 4), pa.int64()),
            }
        )

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
                "key": batch["band_hash"].to_numpy(zero_copy_only=False),
                "sh": batch["simhash"].to_numpy(zero_copy_only=False),
            }
        )
        lo_parts, hi_parts, dist_parts = [], [], []
        capped = 0
        for _, grp in df.groupby("key", sort=False):
            m = len(grp)
            if m < 2:
                continue
            if m > MAX_BUCKET_MEMBERS:
                capped += 1
                grp = grp.nsmallest(MAX_BUCKET_MEMBERS, "doc_id")
                m = MAX_BUCKET_MEMBERS
            grp = grp.sort_values("doc_id", kind="mergesort")
            ids = grp["doc_id"].to_numpy()
            sh = grp["sh"].to_numpy().view(np.uint64)
            ii, jj = np.triu_indices(m, 1)
            x = sh[ii] ^ sh[jj]
            # popcount: byte view + 256-entry LUT (one fancy-index + sum)
            d = _POP8[x.view(np.uint8).reshape(-1, 8)].sum(axis=1, dtype=np.int64)
            ok = d <= max_hamming
            lo_parts.append(ids[ii[ok]])
            hi_parts.append(ids[jj[ok]])
            dist_parts.append(d[ok])
        if capped:
            logger.warning(
                "simhash LSH: %d bucket(s) truncated to MAX_BUCKET_MEMBERS=%d "
                "(pairs beyond the cap dropped)",
                capped,
                MAX_BUCKET_MEMBERS,
            )
        if lo_parts:
            # hamming is a pure function of the pair → duplicates agree
            lo, hi, dist = _dedup_pair_arrays(
                np.concatenate(lo_parts).astype(np.int64),
                np.concatenate(hi_parts).astype(np.int64),
                np.concatenate(dist_parts),
            )
        else:
            lo = hi = dist = np.zeros(0, np.int64)
        return pa.table(
            {
                "doc_lo": pa.array(lo, pa.int64()),
                "doc_hi": pa.array(hi, pa.int64()),
                "hamming": pa.array(dist.astype(np.int64), pa.int64()),
            }
        )

    rows = sigs.map_batches(band_rows, batch_format="pyarrow")
    rows = rows.repartition(nparts, keys=["band_hash"])
    pairs = rows.map_batches(bucket_pairs, batch_format="pyarrow")
    # hamming is a pure function of the pair's simhashes → duplicates
    # across bands agree; keyed-shuffle dedup, any survivor correct
    return dedup_pairs_exchange(pairs, "doc_lo", "doc_hi", nparts)


class ShingleBlobs:
    """map_batches kernel: doc rows → (doc_id, sh) where ``sh`` is the
    doc's SORTED-UNIQUE uint64 shingle set packed as one binary blob.

    Segmented per-batch: one lexsort over (doc, shingle) + adjacent-run
    dedup, then a single zero-copy Arrow binary array built from the
    cumulative-offset buffer — no per-doc Python work beyond the
    offsets math."""

    def __init__(self, shingle_n: int = 3):
        self.shingle_n = shingle_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ndocs = len(batch)
        if ndocs == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "sh": pa.array([], pa.binary())}
            )
        counts, h = _split_flat(batch)
        sh_counts, sh = _shingle_hashes_flat(counts, h, self.shingle_n)
        doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), sh_counts)
        order = np.lexsort((sh, doc_of))
        sh_s, doc_s = sh[order], doc_of[order]
        keep = np.ones(len(sh_s), bool)
        keep[1:] = (doc_s[1:] != doc_s[:-1]) | (sh_s[1:] != sh_s[:-1])
        sh_u, doc_u = sh_s[keep], doc_s[keep]
        u_counts = np.bincount(doc_u, minlength=ndocs)
        offs = np.zeros(ndocs + 1, np.int32)
        np.cumsum(u_counts * 8, out=offs[1:])
        arr = pa.Array.from_buffers(
            pa.binary(),
            ndocs,
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(sh_u.tobytes())],
        )
        return pa.table({"doc_id": batch["doc_id"], "sh": arr})


def _blob_flat_u64(col) -> tuple[np.ndarray, np.ndarray]:
    """Binary column of uint64 blobs → (counts_per_row, flat values) —
    direct slices of the Arrow offsets/data buffers."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    if pa.types.is_large_binary(col.type):
        col = col.cast(pa.binary())
    offs = np.frombuffer(col.buffers()[1], np.int32)[col.offset : col.offset + n + 1]
    data = np.frombuffer(col.buffers()[2], np.uint8)
    flat = data[offs[0] : offs[-1]]
    counts = np.diff(offs).astype(np.int64) // 8
    return counts, np.ascontiguousarray(flat).view(np.uint64)


def _pairwise_jaccard(counts_lo, flat_lo, counts_hi, flat_hi) -> np.ndarray:
    """Exact per-pair set Jaccard over packed sorted-unique shingle
    blobs: concat both sides keyed by pair index, one lexsort, count
    adjacent duplicates (each |A∩B| element appears exactly twice)."""
    n = len(counts_lo)
    if n == 0:
        return np.zeros(0, np.float64)
    pidx = np.concatenate(
        [
            np.repeat(np.arange(n, dtype=np.int64), counts_lo),
            np.repeat(np.arange(n, dtype=np.int64), counts_hi),
        ]
    )
    vals = np.concatenate([flat_lo, flat_hi])
    order = np.lexsort((vals, pidx))
    pidx, vals = pidx[order], vals[order]
    dup = (pidx[1:] == pidx[:-1]) & (vals[1:] == vals[:-1])
    inter = np.bincount(pidx[1:][dup], minlength=n)
    union = counts_lo + counts_hi - inter
    union = np.maximum(union, 1)
    return inter / union


def join_pairs_with_blobs(
    pairs_ds,
    blobs_ds,
    lo_col: str,
    hi_col: str,
    blob_col: str,
    id_col: str = "doc_id",
    nparts: int | None = None,
):
    """Attach a per-id binary payload to both sides of a pair Dataset:
    two distributed hash joins (pairs ⋈ blobs on lo, then on hi).
    Nothing corpus-sized ever reaches the driver; payload bytes move
    only for ids that appear in a pair. Pass ``nparts`` sized to the
    DATA — every shuffle stage spins up that many aggregator actors,
    which dominates wall time on small inputs."""
    from import_ray.core.context import join_safe, npartitions

    def side(suffix):
        return blobs_ds.map_batches(
            lambda b, s=suffix: pa.table(
                {f"_jid{s}": b[id_col], f"{blob_col}{s}": b[blob_col]}
            ),
            batch_format="pyarrow",
        )

    nparts = nparts or npartitions()
    j = join_safe(pairs_ds).join(
        join_safe(side("_lo")),
        join_type="inner",
        num_partitions=nparts,
        on=(lo_col,),
        right_on=("_jid_lo",),
    )
    j = join_safe(j).join(
        join_safe(side("_hi")),
        join_type="inner",
        num_partitions=nparts,
        on=(hi_col,),
        right_on=("_jid_hi",),
    )
    return j


def ngram_jaccard_pairs(docs_ds, threshold: float = 0.5, shingle_n: int = 3):
    """EXACT token-n-gram Jaccard for LSH candidates, fully
    Dataset-native: MinHash-LSH candidate pairs ⋈ per-doc shingle-set
    blobs (two hash joins), then a vectorized per-batch exact set
    Jaccard. Returns a Dataset (doc_lo, doc_hi, jaccard); nothing
    corpus- or candidate-sized is materialized on the driver."""
    nparts = _data_nparts(docs_ds)
    pairs = minhash_lsh_pairs(docs_ds, threshold=0.3).select_columns(
        ["doc_lo", "doc_hi"]
    )
    blobs = docs_ds.map_batches(
        ShingleBlobs(shingle_n), batch_format="pyarrow", batch_size=512
    )
    joined = join_pairs_with_blobs(
        pairs, blobs, "doc_lo", "doc_hi", "sh", nparts=nparts
    )

    def verify(b: pa.Table) -> pa.Table:
        c_lo, f_lo = _blob_flat_u64(b["sh_lo"])
        c_hi, f_hi = _blob_flat_u64(b["sh_hi"])
        jac = _pairwise_jaccard(c_lo, f_lo, c_hi, f_hi)
        ok = jac >= threshold
        return pa.table(
            {
                "doc_lo": pc.cast(b["doc_lo"], pa.int64()).filter(pa.array(ok)),
                "doc_hi": pc.cast(b["doc_hi"], pa.int64()).filter(pa.array(ok)),
                "jaccard": pa.array(np.round(jac[ok], 6), pa.float64()),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow")


def minhash_dedup_keep_best(docs_ds, threshold: float = 0.7):
    """Quality-aware canonical selection: one kept doc per near-dup
    cluster — the highest-quality member, not the min id.

    Shape: minhash_dedup labels (pair-bounded) ⋈ per-doc quality
    signals (one corpus-keyed hash join on int64 doc_id) → per-cluster
    argmax by (distinct_ratio_micro DESC, n_chars DESC, doc_id ASC)
    via block-local argmax partials + one cluster-keyed exchange.
    Shuffled rows after the partials are one per (cluster × block).

    Returns Dataset (doc_id, cluster_id, distinct_ratio_micro,
    n_chars) of KEPT docs.
    """
    from import_ray.core.context import join_safe, npartitions
    from import_ray.stages.text import quality_score

    n = npartitions()
    labels = minhash_dedup(docs_ds, threshold=threshold)
    quality = docs_ds.map_batches(quality_score, batch_format="pyarrow").select_columns(
        ["doc_id", "distinct_ratio_micro", "n_chars"]
    )
    joined = join_safe(
        labels.join(quality, join_type="inner", num_partitions=n, on=("doc_id",))
    )

    def block_argmax(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            ["cluster_id", "distinct_ratio_micro", "n_chars", "doc_id"],
            ascending=[True, False, False, True],
            kind="mergesort",
        ).drop_duplicates("cluster_id", keep="first")
        return from_pandas_clean(df, preserve_index=False)

    return (
        joined.map_batches(block_argmax, batch_format="pyarrow")
        .repartition(n, keys=["cluster_id"])
        .map_batches(block_argmax, batch_format="pyarrow", batch_size=None)
        .select_columns(["doc_id", "cluster_id", "distinct_ratio_micro", "n_chars"])
    )
