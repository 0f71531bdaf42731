"""Context-window chunking and sequence packing for training data.

Two operators every LLM training-data pipeline needs downstream of
cleaning (no analog in the reference — transcript/document payloads
there are row-scoped):

- ``chunk_docs``: split each document into fixed token windows with a
  stride (overlap = window - stride), emitting one row per chunk.
  Pure per-batch reshape (np.repeat over per-doc chunk counts — no
  Python loops), embarrassingly parallel, SQL-expressible → oracle.
- ``pack_sequences``: greedily pack documents into fixed-capacity
  context windows (first-fit over a length-sorted block). Packing is
  BLOCK-LOCAL by design: global optimal packing would serialize the
  corpus; per-block greedy is the standard at-scale approximation
  (each block's waste is bounded by the tail of its own length
  distribution). Invariants (capacity respected, token totals
  preserved, every doc packed exactly once) are tested; the packing
  itself is not SQL-expressible → rows-only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from import_ray.stages.text import _text_col, _token_counts


def chunk_docs(ds, window: int = 64, stride: int = 48):
    """(doc_id, chunk_idx, chunk_tokens) per token window. The last
    chunk of a doc may be short; docs shorter than ``window`` yield one
    chunk. stride < window gives overlapping windows."""
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")

    def kernel(batch: pa.Table) -> pa.Table:
        n_tok, _ = _token_counts(_text_col(batch))
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        # chunks c: start = c*stride, c in [0, n_chunks); last window
        # starts at the largest multiple of stride < n (so every token
        # is covered and no window starts at/after the end)
        n_chunks = np.where(
            n_tok <= window, 1, 1 + ((n_tok - window + stride - 1) // stride)
        ).astype(np.int64)
        doc_rep = np.repeat(np.arange(len(ids)), n_chunks)
        starts = np.arange(int(n_chunks.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(n_chunks) - n_chunks, n_chunks
        )
        chunk_tokens = np.minimum(window, n_tok[doc_rep] - starts * stride)
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_rep]),
                "chunk_idx": pa.array(starts),
                "chunk_tokens": pa.array(chunk_tokens.astype(np.int64)),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


CHUNK_DOCS_SQL_TEMPLATE = """
WITH n AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
), c AS (
  SELECT doc_id, n_tok,
         CASE WHEN n_tok <= {window} THEN 1
              ELSE 1 + CAST(CEIL((n_tok - {window}) / {stride}.0) AS BIGINT)
         END AS n_chunks
  FROM n
)
SELECT doc_id,
       CAST(gs AS BIGINT) AS chunk_idx,
       CAST(LEAST({window}, n_tok - gs * {stride}) AS BIGINT) AS chunk_tokens
FROM c, LATERAL unnest(generate_series(0, n_chunks - 1)) AS t(gs)
"""


def pack_sequences(ds, capacity: int = 256):
    """Greedy first-fit-decreasing packing of docs into context windows
    of ``capacity`` tokens, block-local. Docs longer than ``capacity``
    get a singleton pack (they would be chunked first in a real flow).

    Output: (pack_key, n_docs, pack_tokens) — pack_key is unique across
    blocks (salted with the block's min doc_id × 1e6; assumes < 1e6
    bins per block, which target_max_block_size bounds in practice)."""

    def kernel(batch: pa.Table) -> pa.Table:
        n_tok, _ = _token_counts(_text_col(batch))
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        order = np.argsort(-n_tok, kind="stable")
        # first-fit-decreasing; the doc loop is irreducible (each
        # placement depends on all prior ones) but the inner bin scan
        # is a single numpy mask per doc
        remaining = np.empty(n, np.int64)
        n_docs = np.zeros(n, np.int64)
        sums = np.zeros(n, np.int64)
        nbins = 0
        for i in order:
            t = int(n_tok[i])
            ok = np.nonzero(remaining[:nbins] >= t)[0]
            if ok.size:
                b = int(ok[0])
            else:
                b = nbins
                nbins += 1
                remaining[b] = max(capacity, t)
            remaining[b] -= t
            n_docs[b] += 1
            sums[b] += t
        salt = int(ids.min()) * 1_000_000 if n else 0
        return pa.table(
            {
                "pack_key": pa.array(salt + np.arange(nbins, dtype=np.int64)),
                "n_docs": pa.array(n_docs[:nbins]),
                "pack_tokens": pa.array(sums[:nbins]),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")
