"""T5-style span corruption: documents → (inputs, targets) denoising
pairs (Raffel et al. 2020, "Exploring the Limits of Transfer Learning"
— the span-corruption objective). Deterministic: span g of doc d is
corrupted iff splitmix64(hash64(doc seed) ⊕ g ⊕ seed) falls under the
corruption rate, so reruns and different block boundaries produce the
byte-identical corpus (the repo-wide sampler convention).

Spans are fixed ``span_len``-token windows (grid-aligned — the
simplification keeps the whole kernel vectorizable: corruption is ONE
hash over (doc, grid cell), no sequential span-drawing state). Inputs
replace each corrupted span with its ``<extra_id_k>`` sentinel;
targets are sentinel-prefixed span contents — exactly invertible.

Pure map stage: no exchange at all; per block everything is the flat
token gather + LargeList join shape shared with sft_pairs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from import_ray.core.context import configure_data_context


def _mix(x: np.ndarray) -> np.ndarray:
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def corrupt_spans_block(
    batch: pa.Table,
    rate: float = 0.15,
    span_len: int = 3,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """One block of (doc_id, inputs, targets) span-corruption pairs."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lists = pc.split_pattern(text, pattern=" ")
    n_tok = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "inputs": pa.array([], pa.large_string()),
            "targets": pa.array([], pa.large_string()),
        }
    )
    if len(ids) == 0 or n_tok.sum() == 0:
        return empty
    flat = pc.list_flatten(lists)
    parents = (
        pc.list_parent_indices(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    offs = np.concatenate(([0], np.cumsum(n_tok)))
    pos = np.arange(len(parents)) - offs[parents]
    grid = pos // span_len
    doc_seed = _mix(ids.astype(np.uint64) ^ np.uint64(seed))[parents]
    draw = _mix(doc_seed ^ grid.astype(np.uint64))
    corrupt = (draw % np.uint64(1_000_000)) < np.uint64(int(rate * 1_000_000))
    span_start = corrupt & (pos % span_len == 0)
    # sentinel index k per span start, resetting per doc
    cs = np.cumsum(span_start)
    k = cs - 1 - (np.concatenate(([0], cs))[offs])[parents]
    toks = flat.to_pandas().to_numpy(dtype=object)
    start_idx = np.flatnonzero(span_start)
    sentinels = np.asarray(
        [f"<extra_id_{v}>" for v in k[start_idx]], object
    )  # loop bounded by span COUNT (~rate/span_len of tokens), not tokens

    # inputs: uncorrupted tokens, sentinel at each span start
    in_toks = toks.copy()
    in_toks[start_idx] = sentinels
    in_keep = ~corrupt | span_start
    in_toks = in_toks[in_keep]
    in_parents = parents[in_keep]
    # targets: sentinel-prefixed corrupted tokens
    tg_toks = toks.copy()
    tg_toks[start_idx] = sentinels + " " + toks[start_idx]
    tg_keep = corrupt
    tg_toks = tg_toks[tg_keep]
    tg_parents = parents[tg_keep]

    def join_rows(vals: np.ndarray, par: np.ndarray) -> pa.Array:
        counts = np.bincount(par, minlength=len(ids))
        offsets = pa.array(
            np.concatenate(([0], np.cumsum(counts))).astype(np.int64), pa.int64()
        )
        # vals are already grouped by parent (parents nondecreasing)
        arr = pa.array(vals.astype(object), pa.large_string())
        return pc.binary_join(
            pa.LargeListArray.from_arrays(offsets, arr),
            pa.scalar(" ", pa.large_string()),
        )

    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "inputs": join_rows(in_toks, in_parents),
            "targets": join_rows(tg_toks, tg_parents),
        }
    )


def span_corruption_pairs(
    docs_path: str | list[str],
    rate: float = 0.15,
    span_len: int = 3,
    seed: int = 0,
):
    """Dataset of (doc_id, inputs, targets) over a documents parquet
    path."""
    import ray.data

    configure_data_context()
    return ray.data.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        lambda b: corrupt_spans_block(b, rate=rate, span_len=span_len, seed=seed),
        batch_format="pyarrow",
    )
