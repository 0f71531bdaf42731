"""Transcript-quality operators for training-data curation:
turn-level echo detection and cross-conversation boilerplate mining.

Two corpus pathologies every conversation-training pipeline filters:
an agent that parrots the user's turn back (echo — near-zero learning
signal) and template responses repeated verbatim across thousands of
conversations (boilerplate — a dedup-resistant form of duplication,
since the surrounding conversation differs). Both are expressed as
single-exchange Ray Data flows with fully-vectorized per-block
kernels (pandas explode/merge set algebra — no Python row loops).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from import_ray.core.arrowutil import from_pandas_clean
from import_ray.core.context import (
    configure_data_context,
    data_nparts,
    ensure_hash_shuffle,
)


def _read_turns(transcripts_path, columns):
    import ray.data

    configure_data_context()
    return ray.data.read_parquet(transcripts_path, columns=columns).map_batches(
        lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
    )


def turn_echo_rate(
    transcripts_path: str | list[str],
    user_role: str = "user",
    agent_role: str = "agent",
):
    """Per-conversation echo rate: for every agent turn immediately
    preceded (in turn_idx order) by a user turn, the fraction of the
    agent turn's DISTINCT whitespace tokens that already appear in that
    user turn; averaged over the conversation's (user, agent) pairs.

    Returns (conv_id, n_pairs, echo_rate:double). Conversations with
    no adjacent (user, agent) pair are omitted.

    Shape: ONE conv-keyed exchange; per block: mergesort, adjacent-pair
    mask, token explode + distinct + indicator merge (set intersection
    as a vectorized join), segment means.
    """
    ds = _read_turns(transcripts_path, ["conv_id", "turn_idx", "role", "text"])
    n = data_nparts(ds)

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(["conv_id", "turn_idx"], kind="mergesort")
        empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n_pairs": pa.array([], pa.int64()),
                "echo_rate": pa.array([], pa.float64()),
            }
        )
        if not len(df):
            return empty
        conv = df["conv_id"].to_numpy(dtype=object)
        role = df["role"].to_numpy(dtype=object)
        same = np.empty(len(df), dtype=bool)
        same[0] = False
        same[1:] = conv[1:] == conv[:-1]
        is_pair = same & (role == agent_role)
        is_pair[is_pair] &= (
            np.concatenate(([None], role[:-1]))[is_pair] == user_role
        )
        if not is_pair.any():
            return empty
        pid = np.flatnonzero(is_pair)
        pairs = pd.DataFrame(
            {
                "pair": np.arange(len(pid)),
                "conv_id": conv[pid],
                "agent_text": df["text"].to_numpy(dtype=object)[pid],
                "user_text": df["text"].to_numpy(dtype=object)[pid - 1],
            }
        )
        a = (
            pairs[["pair", "agent_text"]]
            .assign(tok=pairs["agent_text"].str.split())
            .explode("tok")[["pair", "tok"]]
            .dropna()
            .drop_duplicates()
        )
        u = (
            pairs[["pair", "user_text"]]
            .assign(tok=pairs["user_text"].str.split())
            .explode("tok")[["pair", "tok"]]
            .dropna()
            .drop_duplicates()
        )
        m = a.merge(u, on=["pair", "tok"], how="left", indicator=True)
        m["hit"] = (m["_merge"] == "both").astype(np.int64)
        per_pair = m.groupby("pair", sort=True)["hit"].agg(n_tok="size", n_hit="sum")
        # empty agent turns (no tokens) count as echo 0
        rate = np.zeros(len(pid))
        rate[per_pair.index.to_numpy()] = (
            per_pair["n_hit"] / per_pair["n_tok"]
        ).to_numpy()
        out = (
            pd.DataFrame({"conv_id": pairs["conv_id"], "rate": rate})
            .groupby("conv_id", sort=False)["rate"]
            .agg(n_pairs="size", echo_rate="mean")
            .reset_index()
        )
        out["n_pairs"] = out["n_pairs"].astype("int64")
        return from_pandas_clean(out, preserve_index=False)

    ensure_hash_shuffle(ds)
    return ds.repartition(n, keys=["conv_id"]).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


def boilerplate_turns(
    transcripts_path: str | list[str],
    min_convs: int = 10,
    role: str = "agent",
):
    """Template-response mining: texts of ``role`` turns that appear
    verbatim in at least ``min_convs`` DISTINCT conversations. Returns
    (text, n_convs) for each boilerplate string.

    Rows-not-bytes: the counting exchange ships only (128-bit content
    hash, conv-hash) pairs, in-batch-distinct first. Texts rejoin at
    the end via a BROADCAST of the flagged hash set (boilerplate sets
    are schema-scale by construction — each needs ≥min_convs repeats)
    with a deterministic min-exemplar fold.
    """
    import ray

    ds = _read_turns(transcripts_path, ["conv_id", "role", "text"])
    n = data_nparts(ds)

    def key_pairs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["role"] == role]
        txt = df["text"].to_numpy(dtype=object)
        cid = df["conv_id"].to_numpy(dtype=object)
        h1 = pd.util.hash_array(txt, hash_key="0123456789123456").view(np.int64)
        h2 = pd.util.hash_array(txt, hash_key="6543210987654321").view(np.int64)
        ch = pd.util.hash_array(cid).view(np.int64)
        out = pd.DataFrame({"h1": h1, "h2": h2, "conv_h": ch}).drop_duplicates()
        return from_pandas_clean(out, preserve_index=False)

    pairs = ds.map_batches(key_pairs, batch_format="pyarrow")
    ensure_hash_shuffle(pairs)

    def count_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        g = (
            df.groupby(["h1", "h2"], sort=False)["conv_h"]
            .nunique()
            .reset_index(name="n_convs")
        )
        g = g[g["n_convs"] >= min_convs]
        g["n_convs"] = g["n_convs"].astype("int64")
        return from_pandas_clean(g, preserve_index=False)

    flagged = (
        pairs.repartition(n, keys=["h1"])
        .map_batches(count_block, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    if not len(flagged):
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "text": pa.array([], pa.large_string()),
                    "n_convs": pa.array([], pa.int64()),
                }
            )
        )
    counts = {
        (int(a), int(b)): int(c)
        for a, b, c in zip(flagged["h1"], flagged["h2"], flagged["n_convs"])
    }
    ref = ray.put(counts)

    def attach(batch: pa.Table) -> pa.Table:
        lut = ray.get(ref)
        df = batch.to_pandas()
        df = df[df["role"] == role][["text"]].drop_duplicates()
        txt = df["text"].to_numpy(dtype=object)
        h1 = pd.util.hash_array(txt, hash_key="0123456789123456").view(np.int64)
        h2 = pd.util.hash_array(txt, hash_key="6543210987654321").view(np.int64)
        keep = [
            (t, lut[(int(a), int(b))])
            for t, a, b in zip(txt, h1, h2)
            if (int(a), int(b)) in lut
        ]
        return pa.table(
            {
                "text": pa.array([t for t, _ in keep], pa.large_string()),
                "n_convs": pa.array([c for _, c in keep], pa.int64()),
            }
        )

    # distinct exemplars across blocks (a boilerplate text appears in
    # many blocks): tiny final distinct — the flagged set is small
    out = ds.map_batches(attach, batch_format="pyarrow")
    ensure_hash_shuffle(out)
    nparts = max(2, min(8, n))

    def final_distinct(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return from_pandas_clean(df, preserve_index=False)

    return out.repartition(nparts, keys=["text"]).map_batches(
        final_distinct, batch_format="pyarrow", batch_size=None
    )
