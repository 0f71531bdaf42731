"""Full-text retrieval over the documents table: BM25 and exact
boolean/tf top-k.

The engine already builds the physical artifacts (inverted_index_docs,
doc-frequency stats); these operators are the QUERY side — score a
broadcast term list against the whole corpus in one streaming pass.

- ``bm25_topk``: Okapi BM25 (Robertson & Spärck Jones; the standard
  probabilistic ranking). Two streaming passes: a tiny stats aggregate
  (per-term document frequency, N, avgdl — T+2 numbers per block reach
  the driver), then one scoring pass with the idf table folded into the
  task closure; per-block partial top-k means only k×blocks candidate
  rows ever leave the scoring stage. Scores are float64 → the driver
  twin is rows-only; parity vs a DuckDB-computed BM25 is pinned in
  tests with np.allclose.
- ``tf_boolean_topk``: the integer-exact twin — rank by (#distinct
  query terms matched DESC, total tf DESC, doc_id ASC). Total order,
  no floats, hash-checkable against plain SQL.

Both tokenize by single-space split — the repo-wide DuckDB
``string_split(text, ' ')`` parity convention (stages/text.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from import_ray.core.context import configure_data_context


def _term_tf(batch_text: pa.Array, terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(tf, dl): tf[i, j] = count of terms[j] in row i; dl[i] = token
    count of row i. One split + dictionary-encode; no per-row loops."""
    lists = pc.split_pattern(batch_text, pattern=" ")
    dl = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    n, t = len(dl), len(terms)
    tf = np.zeros((n, t), np.int64)
    if n == 0 or dl.sum() == 0:
        return tf, dl
    flat = pc.list_flatten(lists)
    parents = (
        pc.list_parent_indices(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # map each query term to its batch-local dictionary code (-1 = absent)
    term_codes = pc.index_in(
        pa.array(terms, pa.string()), value_set=enc.dictionary
    ).to_numpy(zero_copy_only=False)
    present = ~np.isnan(term_codes.astype(np.float64))
    slots = np.flatnonzero(present)
    tcodes = term_codes[present].astype(np.int64)
    if not len(tcodes):
        return tf, dl
    order = np.argsort(tcodes)
    tcodes_sorted, slots_sorted = tcodes[order], slots[order]
    hit = np.isin(codes, tcodes_sorted)
    hpos = np.flatnonzero(hit)
    slot_of = slots_sorted[np.searchsorted(tcodes_sorted, codes[hpos])]
    np.add.at(tf, (parents[hpos], slot_of), 1)
    return tf, dl


def _corpus_stats(docs_path, terms: list[str]):
    """(df per term, n_docs, total_len): per-block partials, driver
    fold — T+2 numbers per block."""
    import ray.data

    t = len(terms)

    def partial(batch: pa.Table) -> pa.Table:
        tf, dl = _term_tf(batch["text"].combine_chunks(), terms)
        return pa.table(
            {
                "df": pa.array([(tf > 0).sum(axis=0).astype(np.int64)]),
                "n_docs": pa.array([len(dl)], pa.int64()),
                "total_len": pa.array([int(dl.sum())], pa.int64()),
            }
        )

    parts = (
        ray.data.read_parquet(docs_path, columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    df = np.sum(np.stack(parts["df"].to_numpy()), axis=0) if len(parts) else np.zeros(t)
    return (
        df.astype(np.int64),
        int(parts["n_docs"].sum()),
        int(parts["total_len"].sum()),
    )


def bm25_topk(
    docs_path: str | list[str],
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Top-k documents by Okapi BM25 against ``terms``. Returns
    (doc_id, score, n_hits, total_tf) ordered by (score DESC, doc_id
    ASC); idf uses the standard ln((N - df + 0.5)/(df + 0.5) + 1)."""
    import ray.data

    configure_data_context()
    terms = list(dict.fromkeys(terms))
    df, n_docs, total_len = _corpus_stats(docs_path, terms)
    if n_docs == 0:
        raise ValueError("empty corpus")
    avgdl = total_len / n_docs
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def score_block(batch: pa.Table) -> pa.Table:
        tf, dl = _term_tf(batch["text"].combine_chunks(), terms)
        denom = tf + (k1 * (1.0 - b + b * (dl / avgdl)))[:, None]
        with np.errstate(invalid="ignore", divide="ignore"):
            s = ((tf * (k1 + 1.0)) / denom) @ idf
        n_hits = (tf > 0).sum(axis=1).astype(np.int64)
        keep = np.flatnonzero(n_hits > 0)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        s, n_hits, ttf = s[keep], n_hits[keep], tf[keep].sum(axis=1).astype(np.int64)
        # block-local partial top-k: (score DESC, doc_id ASC)
        order = np.lexsort((ids, -s))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "score": pa.array(s[order], pa.float64()),
                "n_hits": pa.array(n_hits[order], pa.int64()),
                "total_tf": pa.array(ttf[order], pa.int64()),
            }
        )

    def final_topk(batch: pa.Table) -> pa.Table:
        if len(batch) == 0 or batch.num_columns == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                    "n_hits": pa.array([], pa.int64()),
                    "total_tf": pa.array([], pa.int64()),
                }
            )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        s = batch["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:k]
        return batch.take(pa.array(order, pa.int64()))

    return (
        ray.data.read_parquet(docs_path, columns=["doc_id", "text"])
        .map_batches(score_block, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final_topk, batch_format="pyarrow", batch_size=None)
    )


def tf_boolean_topk(docs_path: str | list[str], terms: list[str], k: int = 20):
    """Integer-exact retrieval twin: top-k by (#distinct matched terms
    DESC, total tf DESC, doc_id ASC). Same machinery, no floats."""
    import ray.data

    configure_data_context()
    terms = list(dict.fromkeys(terms))

    def score_block(batch: pa.Table) -> pa.Table:
        tf, _ = _term_tf(batch["text"].combine_chunks(), terms)
        n_hits = (tf > 0).sum(axis=1).astype(np.int64)
        keep = np.flatnonzero(n_hits > 0)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        n_hits, ttf = n_hits[keep], tf[keep].sum(axis=1).astype(np.int64)
        order = np.lexsort((ids, -ttf, -n_hits))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "n_hits": pa.array(n_hits[order], pa.int64()),
                "total_tf": pa.array(ttf[order], pa.int64()),
            }
        )

    def final_topk(batch: pa.Table) -> pa.Table:
        if len(batch) == 0 or batch.num_columns == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_hits": pa.array([], pa.int64()),
                    "total_tf": pa.array([], pa.int64()),
                }
            )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n_hits = batch["n_hits"].to_numpy(zero_copy_only=False)
        ttf = batch["total_tf"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -ttf, -n_hits))[:k]
        return batch.take(pa.array(order, pa.int64()))

    return (
        ray.data.read_parquet(docs_path, columns=["doc_id", "text"])
        .map_batches(score_block, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final_topk, batch_format="pyarrow", batch_size=None)
    )
