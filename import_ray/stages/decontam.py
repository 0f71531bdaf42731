"""Benchmark decontamination: flag corpus documents that overlap a
held-out evaluation set (train/test contamination control — a standard
LLM training-data stage; no analog in the reference).

Semantics: a doc is contaminated when ≥ ``frac_threshold`` of its
word-``n``-gram shingles appear in the benchmark's shingle set
(containment, not symmetric Jaccard — a long doc quoting a whole
benchmark item should flag even though its own text is much longer
than the quote; per-doc fraction uses the DOC's shingle count).

Scale shape: the benchmark side is SMALL by definition (eval sets are
thousands of items) — its distinct shingle hashes are collected to the
driver and broadcast once via ``ray.put``; the corpus side streams
through a sorted-array ``searchsorted`` membership probe per batch
(shared vectorized shingle machinery from ``stages.neardup``). Nothing
corpus-sized ever leaves the workers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from import_ray.stages.neardup import _shingle_hashes_flat, _split_flat


def benchmark_shingle_set(bench_ds, n: int = 8) -> np.ndarray:
    """Sorted distinct shingle hashes of the (small) benchmark set.
    Driver memory is bounded by benchmark size — documented contract."""

    def shingles(batch: pa.Table) -> pa.Table:
        counts, h = _split_flat(batch)
        if len(counts) == 0:
            return pa.table({"sh": pa.array([], pa.uint64())})
        _, sh = _shingle_hashes_flat(counts, h, n)
        return pa.table({"sh": pa.array(np.unique(sh), pa.uint64())})

    parts = bench_ds.map_batches(shingles, batch_format="pyarrow").to_pandas()
    return np.unique(parts["sh"].to_numpy().astype(np.uint64))


def decontaminate(corpus_ds, bench_shingles: np.ndarray, n: int = 8, frac_threshold: float = 0.99):
    """(doc_id, n_shingles, n_hits, contaminated) per corpus doc."""
    import ray

    ref = ray.put(np.sort(bench_shingles.astype(np.uint64)))

    def probe(batch: pa.Table) -> pa.Table:
        bench = ray.get(ref)
        counts, h = _split_flat(batch)
        ndocs = len(counts)
        if ndocs == 0:
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_shingles": pa.array([], pa.int64()),
                    "n_hits": pa.array([], pa.int64()),
                    "contaminated": pa.array([], pa.bool_()),
                }
            )
        sh_counts, sh = _shingle_hashes_flat(counts, h, n)
        idx = np.searchsorted(bench, sh)
        idx[idx >= len(bench)] = max(len(bench) - 1, 0)
        found = (
            bench[idx] == sh if len(bench) else np.zeros(len(sh), bool)
        )
        seg = np.zeros(ndocs, np.int64)
        np.cumsum(sh_counts[:-1], out=seg[1:])
        hits = np.add.reduceat(found.astype(np.int64), seg)
        frac_ok = hits >= np.ceil(frac_threshold * sh_counts).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_shingles": pa.array(sh_counts.astype(np.int64)),
                "n_hits": pa.array(hits),
                "contaminated": pa.array(frac_ok),
            }
        )

    return corpus_ds.map_batches(probe, batch_format="pyarrow")
