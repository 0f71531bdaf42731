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


def preference_pairs(
    transcripts_path: str | list[str],
    k_turns: int = 1,
    response_role: str = "agent",
    sep: str = "\n",
):
    """DPO/RLHF preference-pair extraction: conversations that share
    the same ``k_turns``-turn prompt prefix form a candidate group;
    within each group the highest-scoring response is ``chosen`` and
    the lowest-scoring is ``rejected`` (score = response length in
    characters; ties broken by conv_id — ascending for chosen,
    descending for rejected — so the pair is total-order deterministic
    and SQL-reproducible). Groups with fewer than 2 candidates drop.

    Returns (prompt, chosen, rejected, chosen_score, rejected_score,
    n_candidates).

    Two keyed exchanges: conv_id (assemble prompt + first
    ``response_role`` response per conversation — same vectorized
    gather as ``sft_pairs``), then an 8-byte prompt hash (co-locate
    each candidate group; the block kernel is ONE lexsort — first row
    of a group is chosen, last is rejected). A viral prompt shared by
    millions of conversations lands in one partition — the same
    co-location contract as conv_prefix_groups; the kernel stays
    vectorized, so hot groups cost memory, not Python loops.
    """
    import pandas as pd
    import ray.data

    configure_data_context()
    ds = ray.data.read_parquet(
        transcripts_path, columns=["conv_id", "turn_idx", "role", "text"]
    ).map_batches(lambda b: b.replace_schema_metadata(None), batch_format="pyarrow")
    n = data_nparts(ds)
    k = int(k_turns)

    def candidates(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(["conv_id", "turn_idx"], kind="mergesort")
        empty = pa.table(
            {
                "ph": pa.array([], pa.int64()),
                "prompt": pa.array([], pa.large_string()),
                "conv_id": pa.array([], pa.string()),
                "response": pa.array([], pa.large_string()),
                "score": pa.array([], pa.int64()),
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
        run_id = np.repeat(np.arange(len(run_starts)), counts)
        pos = np.arange(len(df)) - np.repeat(run_starts, counts)
        # first response_role turn at/after the prefix, per conversation
        m = (pos >= k) & (role == response_role)
        midx = np.flatnonzero(m)
        if not len(midx):
            return empty
        _, first = np.unique(run_id[midx], return_index=True)
        ridx = midx[first]  # one response row per responding conv
        # responding convs necessarily have >= k prefix turns
        starts = run_starts[run_id[ridx]]
        flat = (np.repeat(starts, k) + np.tile(np.arange(k), len(ridx))).astype(
            np.int64
        )
        lines = pc.binary_join_element_wise(
            pc.cast(pa.array(role), pa.large_string()),
            pc.cast(
                pa.array(df["text"].to_numpy(dtype=object), from_pandas=True),
                pa.large_string(),
            ),
            pa.scalar(": ", pa.large_string()),
        )
        vals = lines.take(pa.array(flat, pa.int64()))
        offsets = pa.array(np.arange(len(ridx) + 1, dtype=np.int64) * k, pa.int64())
        prompt = pc.binary_join(
            pa.LargeListArray.from_arrays(offsets, vals),
            pa.scalar(sep, pa.large_string()),
        )
        response = pc.cast(
            pa.array(df["text"].to_numpy(dtype=object)[ridx], from_pandas=True),
            pa.large_string(),
        )
        ph = pd.util.hash_array(
            np.asarray(prompt.to_pandas().to_numpy(dtype=object))
        ).view(np.int64)
        return pa.table(
            {
                "ph": pa.array(ph, pa.int64()),
                "prompt": prompt,
                "conv_id": pa.array(conv[ridx], pa.string()),
                "response": response,
                "score": pc.cast(pc.utf8_length(response), pa.int64()),
            }
        )

    def pick_pair(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "prompt": pa.array([], pa.large_string()),
                "chosen": pa.array([], pa.large_string()),
                "rejected": pa.array([], pa.large_string()),
                "chosen_score": pa.array([], pa.int64()),
                "rejected_score": pa.array([], pa.int64()),
                "n_candidates": pa.array([], pa.int64()),
            }
        )
        if len(batch) == 0 or batch.num_columns == 0:
            return empty
        prompt = batch["prompt"].to_pandas().to_numpy(dtype=object)
        conv = batch["conv_id"].to_pandas().to_numpy(dtype=object)
        score = batch["score"].to_numpy(zero_copy_only=False)
        # one sort: (prompt, score DESC, conv ASC); within each prompt
        # run the FIRST row is chosen and the LAST is rejected (the
        # reverse order is exactly score ASC, conv DESC)
        order = np.lexsort((conv, -score, prompt))
        P = prompt[order]
        new = np.r_[True, P[1:] != P[:-1]]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(P)))
        keep = counts >= 2
        hi = order[starts[keep]]
        lo = order[(starts + counts - 1)[keep]]
        resp = batch["response"].to_pandas().to_numpy(dtype=object)
        return pa.table(
            {
                "prompt": pa.array(prompt[hi], pa.large_string()),
                "chosen": pa.array(resp[hi], pa.large_string()),
                "rejected": pa.array(resp[lo], pa.large_string()),
                "chosen_score": pa.array(score[hi].astype(np.int64), pa.int64()),
                "rejected_score": pa.array(score[lo].astype(np.int64), pa.int64()),
                "n_candidates": pa.array(counts[keep].astype(np.int64), pa.int64()),
            }
        )

    ensure_hash_shuffle(ds)
    cands = ds.repartition(n, keys=["conv_id"]).map_batches(
        candidates, batch_format="pyarrow", batch_size=None
    )
    return cands.repartition(n, keys=["ph"]).map_batches(
        pick_pair, batch_format="pyarrow", batch_size=None
    )
