"""SFT example materialization: transcripts → (prompt, response) pairs.

The last mile of a conversation-training pipeline: every agent turn
becomes one training example whose prompt is the chronological join of
the preceding ``context_turns`` turns (role-prefixed), clipped at the
conversation start. The context window bounds per-example prompt size,
so mega-conversations cost O(n·M) not O(n²) — the same skew bound the
extraction stage's mega-conversation guard documents.

Shape: ONE conv-keyed exchange; per block everything is vectorized —
the variable-length windows become one flat gather (np.repeat segment
construction) + a zero-copy LargeListArray + a single
pyarrow.compute.binary_join. No Python loop touches rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from import_ray.core.context import (
    configure_data_context,
    data_nparts,
    ensure_hash_shuffle,
)


def sft_pairs(
    transcripts_path: str | list[str],
    context_turns: int = 4,
    response_role: str = "agent",
    sep: str = "\n",
):
    """Dataset of (conv_id, turn_idx, prompt, response) — one row per
    ``response_role`` turn with at least one preceding turn. The prompt
    is ``role: text`` lines of the ≤``context_turns`` turns immediately
    before it, in exact turn_idx order."""
    import ray.data

    configure_data_context()
    ds = ray.data.read_parquet(
        transcripts_path, columns=["conv_id", "turn_idx", "role", "text"]
    ).map_batches(lambda b: b.replace_schema_metadata(None), batch_format="pyarrow")
    n = data_nparts(ds)
    m = int(context_turns)

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(["conv_id", "turn_idx"], kind="mergesort")
        empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int64()),
                "prompt": pa.array([], pa.large_string()),
                "response": pa.array([], pa.large_string()),
            }
        )
        if not len(df):
            return empty
        conv = df["conv_id"].to_numpy(dtype=object)
        role = df["role"].to_numpy(dtype=object)
        same = np.empty(len(df), dtype=bool)
        same[0] = False
        same[1:] = conv[1:] == conv[:-1]
        run_starts = np.flatnonzero(~same)
        counts = np.diff(np.append(run_starts, len(df)))
        # position of each row within its conversation run
        pos = np.arange(len(df)) - np.repeat(run_starts, counts)
        is_resp = (role == response_role) & (pos > 0)
        ridx = np.flatnonzero(is_resp)
        if not len(ridx):
            return empty
        # window length per response: up to m preceding turns, clipped
        # at the conversation start
        l = np.minimum(pos[ridx], m).astype(np.int64)
        win_start = ridx - l
        # flat gather indices: for each response, win_start..ridx-1
        offsets = np.concatenate(([0], np.cumsum(l))).astype(np.int64)
        intra = np.arange(offsets[-1], dtype=np.int64) - np.repeat(offsets[:-1], l)
        flat = np.repeat(win_start, l) + intra
        # role-prefixed turn lines, built once for the whole block
        lines = pc.binary_join_element_wise(
            pc.cast(pa.array(role), pa.large_string()),
            pc.cast(
                pa.array(df["text"].to_numpy(dtype=object), from_pandas=True),
                pa.large_string(),
            ),
            pa.scalar(": ", pa.large_string()),
        )
        vals = lines.take(pa.array(flat, pa.int64()))
        runs = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), vals)
        prompt = pc.binary_join(runs, pa.scalar(sep, pa.large_string()))
        return pa.table(
            {
                "conv_id": pa.array(conv[ridx], pa.string()),
                "turn_idx": pa.array(
                    df["turn_idx"].to_numpy()[ridx].astype(np.int64), pa.int64()
                ),
                "prompt": prompt,
                "response": pc.cast(
                    pa.array(
                        df["text"].to_numpy(dtype=object)[ridx], from_pandas=True
                    ),
                    pa.large_string(),
                ),
            }
        )

    ensure_hash_shuffle(ds)
    return ds.repartition(n, keys=["conv_id"]).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )
