"""KG-embedding negative sampling: corrupted triples for KGE training.

A knowledge graph built by this engine (pipelines/kg.build_triples)
feeds embedding trainers (TransE-family), which need *filtered*
negatives — corrupted statements (subject, predicate, object') that
are NOT themselves true triples (Bordes et al. 2013, "Translating
Embeddings", NeurIPS — the standard "filtered setting"). The reference
emits the positive graph only (pipeline MCF → triples, differ /
optimized exports); this stage is the training-data continuation of
that output.

Two modes, one shared filter:

- ``kge_negatives_exhaustive(triples, vocab)`` — every (s, p, e) for
  e in a BOUNDED candidate vocabulary that is not a true statement.
  SQL-equivalent: distinct(s,p) CROSS JOIN vocab ... NOT EXISTS.
  The vocab is an explicit list broadcast to every task (type-filtered
  candidate sets in KGE practice are small: entities of the range
  type); the cross product is generated block-locally from
  block-DISTINCT (s,p) pairs, so duplicate candidates from different
  blocks collapse in the keyed exchange.
- ``kge_negatives_sampled(triples, vocab, k)`` — k deterministic
  pseudo-random corruptions per positive (splitmix64 of a 64-bit
  triple fingerprint ⊕ slot ⊕ seed, mod |vocab|), the per-positive
  shape trainers consume. Deterministic: independent of block
  boundaries, stable across runs/parallelism.

Filtering is ONE keyed exchange: both candidates and truth reduce to
a 128-bit (s, p, object') fingerprint (two independent 64-bit hashes,
~17 B/row on the truth side — object bodies never move); candidates
co-locate with any matching truth row by the first hash and are
dropped by a vectorized lexsort-run scan (no float-view tricks: a
bit-pattern that happens to decode as NaN must still compare equal).
No driver-side truth set, no per-row loops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from import_ray.core.context import data_nparts, ensure_hash_shuffle

_HK2 = "kge2negsample2ha"


def _fingerprints(s, p, o) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes of the joined (s, p, o) strings —
    a 128-bit key, so the exchange never ships the strings for the
    truth side and collisions are negligible at any corpus size."""
    joined = pc.binary_join_element_wise(
        pc.fill_null(pc.cast(s, pa.large_string()), ""),
        pc.fill_null(pc.cast(p, pa.large_string()), ""),
        pc.fill_null(pc.cast(o, pa.large_string()), ""),
        pa.scalar("\x1f", pa.large_string()),
    )
    arr = joined.to_pandas().to_numpy(dtype=object)
    k1 = pd.util.hash_array(arr).view(np.int64)
    k2 = pd.util.hash_array(arr, hash_key=_HK2).view(np.int64)
    return k1, k2


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Public-domain splitmix64 finalizer, vectorized (Steele et al.,
    "Fast Splittable Pseudorandom Number Generators", OOPSLA'14)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _filter_true(cands_ds, triples_ds, out_schema: pa.Schema, dedup: bool):
    """Drop candidate rows whose (subject, predicate, neg_object) is a
    true statement. One keyed exchange on the candidate fingerprint;
    truth ships 16 B/row + a flag. ``dedup`` additionally collapses
    identical candidates (the exhaustive mode's cross-block dups)."""
    n = data_nparts(triples_ds)
    ensure_hash_shuffle(cands_ds)
    out_cols = list(out_schema.names)

    def truth_keys(b: pa.Table) -> pa.Table:
        k1, k2 = _fingerprints(b["subject_id"], b["predicate"], b["object_id"])
        cols = {c: pa.nulls(len(b), out_schema.field(c).type) for c in out_cols}
        cols["k1"] = pa.array(k1)
        cols["k2"] = pa.array(k2)
        cols["is_cand"] = pa.array(np.zeros(len(b), bool))
        return pa.table(cols)

    both = cands_ds.union(
        triples_ds.map_batches(truth_keys, batch_format="pyarrow")
    )

    def anti_block(b: pa.Table) -> pa.Table:
        if len(b) == 0 or b.num_columns == 0:
            return out_schema.empty_table()
        is_cand = b["is_cand"].to_numpy(zero_copy_only=False)
        k1 = b["k1"].to_numpy(zero_copy_only=False)
        k2 = b["k2"].to_numpy(zero_copy_only=False)
        # group equal 128-bit keys via one stable lexsort; a candidate
        # survives iff its run holds no truth row
        order = np.lexsort((np.arange(len(b)), k2, k1))
        K1, K2, C = k1[order], k2[order], is_cand[order]
        new_run = np.r_[True, (K1[1:] != K1[:-1]) | (K2[1:] != K2[:-1])]
        run_id = np.cumsum(new_run) - 1
        nruns = run_id[-1] + 1 if len(run_id) else 0
        has_truth = np.bincount(run_id, weights=~C, minlength=nruns) > 0
        keep = C & ~has_truth[run_id]
        if dedup:
            # first surviving candidate per run (runs are identical
            # (s,p,neg) rows; collisions negligible at 128 bits)
            first_in_run = np.zeros(len(keep), bool)
            kept_runs, first_pos = np.unique(
                np.where(keep, run_id, -1), return_index=True
            )
            first_in_run[first_pos[kept_runs >= 0]] = True
            keep = keep & first_in_run
        idx = order[np.flatnonzero(keep)]
        idx.sort()
        return b.select(out_cols).take(pa.array(idx, pa.int64()))

    return both.repartition(n, keys=["k1"]).map_batches(
        anti_block, batch_format="pyarrow", batch_size=None
    )


def _vocab_array(vocab) -> np.ndarray:
    v = np.asarray(sorted(set(map(str, vocab))), dtype=object)
    if len(v) == 0:
        raise ValueError("kge negative sampling needs a non-empty vocab")
    return v


def kge_negatives_exhaustive(triples_ds, vocab):
    """All filtered negatives over a bounded candidate vocabulary:
    distinct (subject, predicate) of the store × vocab, minus true
    statements. Returns a Dataset of (subject_id, predicate,
    neg_object), globally distinct."""
    voc = _vocab_array(vocab)
    schema = pa.schema(
        [
            ("subject_id", pa.large_string()),
            ("predicate", pa.large_string()),
            ("neg_object", pa.large_string()),
        ]
    )

    def cands(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["object_id"]))  # entity links only
        df = b.select(["subject_id", "predicate"]).to_pandas().drop_duplicates()
        s = np.repeat(df["subject_id"].to_numpy(dtype=object), len(voc))
        p = np.repeat(df["predicate"].to_numpy(dtype=object), len(voc))
        e = np.tile(voc, len(df))
        t = pa.table(
            {
                "subject_id": pa.array(s, pa.large_string()),
                "predicate": pa.array(p, pa.large_string()),
                "neg_object": pa.array(e, pa.large_string()),
            }
        )
        k1, k2 = _fingerprints(t["subject_id"], t["predicate"], t["neg_object"])
        return (
            t.append_column("k1", pa.array(k1))
            .append_column("k2", pa.array(k2))
            .append_column("is_cand", pa.array(np.ones(len(t), bool)))
        )

    cand_ds = triples_ds.map_batches(cands, batch_format="pyarrow")
    return _filter_true(cand_ds, triples_ds, schema, dedup=True)


def kge_negatives_sampled(triples_ds, vocab, k: int = 2, seed: int = 0):
    """k deterministic corruptions per positive triple, filtered
    against the full store. Slot j of positive t draws vocab index
    splitmix64(fingerprint(t) ⊕ mix(j) ⊕ seed) mod |vocab| — block-
    and run-independent. Corruptions equal to their OWN positive's
    object are dropped up front; corruptions matching any other true
    statement drop in the filter exchange, so some positives yield
    fewer than k negatives (standard filtered-sampling behavior).
    Returns (subject_id, predicate, object_id, slot, neg_object)."""
    voc = _vocab_array(vocab)
    nv = np.uint64(len(voc))
    k = int(k)
    schema = pa.schema(
        [
            ("subject_id", pa.large_string()),
            ("predicate", pa.large_string()),
            ("object_id", pa.large_string()),
            ("slot", pa.int64()),
            ("neg_object", pa.large_string()),
        ]
    )

    def cands(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["object_id"]))  # entity links only
        f1, _ = _fingerprints(b["subject_id"], b["predicate"], b["object_id"])
        n = len(b)
        base = np.repeat(f1.view(np.uint64), k)
        slots = np.tile(np.arange(k, dtype=np.uint64), n)
        idx = (
            _splitmix64(
                base
                ^ ((slots + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15))
                ^ np.uint64(seed)
            )
            % nv
        ).astype(np.int64)
        neg = voc[idx]
        s = b["subject_id"].to_pandas().to_numpy(dtype=object).repeat(k)
        p = b["predicate"].to_pandas().to_numpy(dtype=object).repeat(k)
        o = b["object_id"].to_pandas().to_numpy(dtype=object).repeat(k)
        keep = neg != o  # self-corruptions can't be negatives
        t = pa.table(
            {
                "subject_id": pa.array(s[keep], pa.large_string()),
                "predicate": pa.array(p[keep], pa.large_string()),
                "object_id": pa.array(o[keep], pa.large_string()),
                "slot": pa.array(slots[keep].astype(np.int64), pa.int64()),
                "neg_object": pa.array(neg[keep], pa.large_string()),
            }
        )
        k1, k2 = _fingerprints(t["subject_id"], t["predicate"], t["neg_object"])
        return (
            t.append_column("k1", pa.array(k1))
            .append_column("k2", pa.array(k2))
            .append_column("is_cand", pa.array(np.ones(len(t), bool)))
        )

    cand_ds = triples_ds.map_batches(cands, batch_format="pyarrow")
    return _filter_true(cand_ds, triples_ds, schema, dedup=False)
