"""Flagship pipeline: Parquet transcripts → canonical (s, p, o) triples.

Dataflow (SURVEY.md §7.1, north-star shape) — fused single scan:

    read_parquet(transcripts)                       # column-pruned, ONE scan
      └─ map_batches(FusedTranscriptExtractor)      # per-turn + mention triples,
         │                                          # SVObs content-hash dcids,
         │                                          # + conv-partial pseudo-rows
         │                                          # (skew guard for mega-convs)
         └─ hash + in-batch distinct → ONE keyed exchange on h1
            └─ per-block: distinct triples + merge conv partials
               └─ write_parquet(partition_cols=[part_key]) + lineage manifest

No stage materializes the full dataset (the broadcast dedup strategy
pins hashed blocks in the object store by design — only 32-byte keys
shuffle); the only all-to-all exchange is the fused distinct/conv
exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from import_ray.stages.dedup import exact_dedup_triples
from import_ray.stages.extract import (
    ConversationPartials,
    TranscriptTripleExtractor,
    merge_conversation_partials_block,
)

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def build_triples(
    transcripts_path: str | list[str],
    provenance: str = "transcripts",
    batch_size: int = 4096,
    dedup: bool = True,
    conv_aggregates: bool = True,
    dedup_strategy: str = "shuffle",
    conv_filter=None,
):
    """Lazy Dataset of canonical triples from a transcripts parquet path."""
    import ray.data

    import os

    from import_ray.core.context import configure_data_context, npartitions_for_bytes

    configure_data_context()
    paths = (
        [transcripts_path] if isinstance(transcripts_path, str) else list(transcripts_path)
    )
    def _size(path):
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path)
                for f in fs
            )
        return os.path.getsize(path) if os.path.exists(path) else 0

    input_bytes = sum(_size(p) for p in paths)
    n_parts = npartitions_for_bytes(input_bytes)
    ds = ray.data.read_parquet(transcripts_path, columns=TRANSCRIPT_COLS)
    if conv_filter is not None:
        # snapshot selection (e.g. the previous-version subset for a
        # triple diff) — a per-batch Arrow filter, applied at the read
        ds = ds.map_batches(conv_filter, batch_format="pyarrow")

    if conv_aggregates and dedup:
        # fused single-scan path (the default): one pass over the input
        # emits turn/mention triples AND conversation-partial pseudo-rows,
        # and ONE keyed exchange serves both the dedup distinct and the
        # conv-partial co-location — vs the two-branch plan's two input
        # scans and two shuffles (a lazy Dataset re-executes its read per
        # consumer; at 100 TB the extra scan is the dominant cost).
        from import_ray.stages.dedup import (
            _drop_fused_partials,
            _hash_tag_fused,
            _keep_fused_partials,
            broadcast_dedup_hashed,
            hash_fused_rows,
            merge_fused_block,
        )
        from import_ray.stages.extract import (
            FusedTranscriptExtractor,
            partials_from_pseudo_rows,
        )

        fused = ds.map_batches(
            FusedTranscriptExtractor(provenance=provenance),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        if dedup_strategy == "shuffle":
            hashed = fused.map_batches(hash_fused_rows, batch_format="pyarrow")
            return hashed.repartition(n_parts, keys=["h1"]).map_batches(
                merge_fused_block, batch_format="pyarrow", batch_size=None
            )
        if dedup_strategy == "broadcast":
            # the broadcast strategy materializes the hashed rows anyway
            # (blocks stay put; only 32-byte keys shuffle), so both the
            # triple branch and the conv branch re-consume object-store
            # blocks — still a single input scan
            from concurrent.futures import ThreadPoolExecutor

            from import_ray.core.context import cluster_cpus

            hashed = fused.map_batches(
                _hash_tag_fused, batch_format="pyarrow"
            ).materialize()
            # conv partials are ~rows ∝ convs×blocks, far smaller than
            # the triple stream — a full-width exchange here paid
            # aggregator-pool spin-up ∝ n_parts for no extra throughput
            conv_parts = min(n_parts, max(8, cluster_cpus()))
            conv = (
                hashed.map_batches(_keep_fused_partials, batch_format="pyarrow")
                .repartition(conv_parts, keys=["h1"])
                .map_batches(
                    lambda b: merge_conversation_partials_block(
                        partials_from_pseudo_rows(b)
                    ),
                    batch_format="pyarrow",
                    batch_size=None,
                )
            )
            tri_hashed = hashed.map_batches(
                _drop_fused_partials, batch_format="pyarrow"
            )
            # the conv branch is independent of the winner election, so
            # it executes on a second driver thread WHILE the keys
            # exchange runs — the two executions share the cluster and
            # the barrier time overlaps instead of serializing
            with ThreadPoolExecutor(1) as pool:
                conv_fut = pool.submit(conv.materialize)
                tri = broadcast_dedup_hashed(tri_hashed, n_parts)
                conv_mat = conv_fut.result()
            return tri.union(conv_mat)
        raise ValueError(
            f"unknown dedup strategy: {dedup_strategy!r} (use 'shuffle' or 'broadcast')"
        )

    # legacy two-branch plan — test/debug shapes only (dedup=False keeps
    # raw extraction output inspectable; conv_aggregates=False is a pure
    # map pipeline and already a single scan)
    turn_triples = ds.map_batches(
        TranscriptTripleExtractor(provenance=provenance),
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    if conv_aggregates:
        partials = ds.map_batches(
            ConversationPartials(), batch_format="pyarrow", batch_size=batch_size
        )
        conv_triples = partials.repartition(n_parts, keys=["conv_id"]).map_batches(
            merge_conversation_partials_block, batch_format="pyarrow", batch_size=None
        )
        all_triples = turn_triples.union(conv_triples)
    else:
        all_triples = turn_triples

    if dedup:
        all_triples = exact_dedup_triples(
            all_triples, num_partitions=n_parts, strategy=dedup_strategy
        )
    return all_triples


def _normalize_triples(batch: pa.Table) -> pa.Table:
    cols = {}
    for name, typ in (
        ("subject_id", pa.string()),
        ("predicate", pa.string()),
        ("object_id", pa.string()),
        ("object_value", pa.large_string()),
        ("provenance", pa.string()),
    ):
        cols[name] = batch[name].cast(typ) if name in batch.column_names else pa.nulls(
            len(batch), typ
        )
    return pa.table(cols)


def add_part_key(batch: pa.Table, n_buckets: int = 64) -> pa.Table:
    """Partition key = hash(subject_id) % n_buckets, for resumable,
    co-located output (FIXTURES.md §F5; SURVEY.md §4 resume row)."""
    import pandas as pd

    s = batch["subject_id"].to_pandas()
    h = pd.util.hash_array(s.to_numpy(dtype=object)) % n_buckets
    return batch.append_column("part_key", pa.array(h.astype(np.int32), pa.int32()))


def write_triples(ds, out_dir: str, n_buckets: int = 64):
    ds = ds.map_batches(lambda b: add_part_key(b, n_buckets), batch_format="pyarrow")
    ds.write_parquet(out_dir, partition_cols=["part_key"])


def restore_turn_order(transcripts_ds):
    """Stable (conv_id, turn_idx) ordering — the per-turn text-equality
    invariant's ordering contract (BASELINE input_hint)."""
    return transcripts_ds.sort(["conv_id", "turn_idx"])


def run_kg_job(
    input_path: str,
    out_dir: str,
    shard_size: int = 8,
    n_buckets: int = 64,
    dedup_strategy: str = "shuffle",
) -> dict:
    """End-to-end resumable KG job: transcript shards → canonical triples
    in ``<out_dir>/shard=*/part_key=*/`` with per-shard lineage
    manifests; a rerun skips completed shards (north rule: checkpoint
    resume + per-partition lineage).

    ``input_path`` is a file or a directory of parquet shards; each
    lineage shard groups ``shard_size`` input files.
    """
    import glob
    import os

    from import_ray.state.lineage import run_resumable

    if os.path.isdir(input_path):
        files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    else:
        files = [input_path]

    def build(shard_files):
        ds = build_triples(shard_files, dedup_strategy=dedup_strategy)
        return ds.map_batches(
            lambda b: add_part_key(b, n_buckets), batch_format="pyarrow"
        )

    return run_resumable(
        files,
        out_dir,
        build,
        shard_size=shard_size,
        write_kwargs={"partition_cols": ["part_key"]},
    )


def _drop_mod_convs(mod: int = 10, residue: int = 0):
    """Deterministic snapshot filter: drop conversations whose conv_id
    hashes to ``residue`` mod ``mod`` (the 'previous version' subset)."""
    import pandas as pd

    def f(batch: pa.Table) -> pa.Table:
        cids = batch["conv_id"].to_pandas().to_numpy(dtype=object)
        h = pd.util.hash_array(cids) % mod
        return batch.filter(pa.array(h != residue))

    return f


def kg_triple_diff(
    transcripts_path: str | list[str],
    mod: int = 10,
    prev_filter=None,
    conv_aggregates: bool = True,
):
    """Incremental KG update delta (the reference differ's shape,
    pipeline/differ/DifferUtils.java:97-139, over our triples): build
    canonical triples for the CURRENT snapshot and for a PREVIOUS
    snapshot (deterministically missing 1/``mod`` of conversations, or
    a caller-supplied ``prev_filter``), then a distributed keyed diff.
    The key is the full canonical 4-tuple, so rows are ADDED/DELETED
    only — exactly the incremental ingest delta a 100 TB refresh would
    ship. The diff VALUE is a constant presence marker: the differ's
    getOnly(default="") convention would otherwise classify a triple
    with an empty object_value (typeOf/partOf/mention rows) as absent
    and drop its addition/deletion from the delta entirely. Both
    builds stream; the diff is one keyed exchange on a 4-tuple string
    key."""
    from import_ray.stages.diff import diff_datasets

    def to_kv(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        def s(col):
            return pc.fill_null(pc.cast(batch[col], pa.string()), "")

        key = pc.binary_join_element_wise(
            s("subject_id"), s("predicate"), s("object_id"), s("object_value"), "|"
        )
        return pa.table(
            {
                "key": key,
                "value": pa.array(np.full(len(batch), "x", object), pa.large_string()),
            }
        )

    prev_f = prev_filter if prev_filter is not None else _drop_mod_convs(mod)
    cur = build_triples(
        transcripts_path, conv_aggregates=conv_aggregates
    ).map_batches(to_kv, batch_format="pyarrow")
    prev = build_triples(
        transcripts_path, conv_filter=prev_f, conv_aggregates=conv_aggregates
    ).map_batches(to_kv, batch_format="pyarrow")
    return diff_datasets(cur, prev)


def turn_latency_stats(transcripts_path: str | list[str]):
    """Per-role response-latency stats over raw transcripts: for every
    turn after the first in its conversation, latency = ts − previous
    turn's ts (by turn_idx order), attributed to the RESPONDING turn's
    role. Returns one row per role: n_turns, sum_latency_ms,
    max_latency_ms (exact integers — SQL LAG-window comparable).

    Shape: conv-keyed repartition (the one exchange; rows are
    conv hash + role + int64 ts), in-block per-conversation lexsort +
    diff, per-block partial (role → n/sum/max) rows, driver merge of
    #roles × #blocks partials.
    """
    import pandas as pd
    import ray.data

    from import_ray.core.context import configure_data_context, npartitions

    configure_data_context()
    ds = ray.data.read_parquet(
        transcripts_path, columns=["conv_id", "turn_idx", "role", "ts"]
    ).map_batches(lambda b: b.replace_schema_metadata(None), batch_format="pyarrow")
    n = npartitions()

    def partials(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        ts_ms = df["ts"].astype("int64").to_numpy() // 1_000  # us → ms
        conv = df["conv_id"].to_numpy(dtype=object)
        same = np.empty(len(df), dtype=bool)
        if len(df):
            same[0] = False
            same[1:] = conv[1:] == conv[:-1]
        lat = np.zeros(len(df), dtype=np.int64)
        if len(df):
            lat[1:] = ts_ms[1:] - ts_ms[:-1]
        g = pd.DataFrame({"role": df["role"].to_numpy()[same], "lat": lat[same]})
        out = g.groupby("role", sort=False)["lat"].agg(
            n_turns="size", sum_latency_ms="sum", max_latency_ms="max"
        ).reset_index()
        for c in ("n_turns", "sum_latency_ms", "max_latency_ms"):
            out[c] = out[c].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    parts = (
        ds.repartition(n, keys=["conv_id"])
        .map_batches(partials, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    out = (
        parts.groupby("role", sort=True)
        .agg(
            n_turns=("n_turns", "sum"),
            sum_latency_ms=("sum_latency_ms", "sum"),
            max_latency_ms=("max_latency_ms", "max"),
        )
        .reset_index()
    )
    return out


def conv_kg_stats(transcripts_path: str | list[str]):
    """Per-conversation KG yield metrics: how many triples, entity
    links, and DISTINCT linked entities each conversation contributed
    — the graph-materialize metrics surface at conversation grain
    (triple provenance is recoverable from the ``conv/<id>`` subject
    scheme, so no extra provenance column rides through the pipeline).

    FUSED single consumption of the triples pipeline: one map emits two
    partial-row kinds per batch — per-conv scalar partials
    (object_id = null; n_triples, n_entity_links) and in-batch-distinct
    (conv, object_id) link pairs (counts 0) — sharing one schema, so a
    single conv-keyed exchange co-locates everything and the per-block
    merge computes all three metrics. The previous two-branch + join
    plan executed the whole extraction/dedup pipeline twice.

    Returns Dataset (conv_id, n_triples, n_entity_links,
    n_distinct_entities).
    """
    import pandas as pd

    from import_ray.core.arrowutil import from_pandas_clean
    from import_ray.core.context import data_nparts

    triples = build_triples(transcripts_path)
    n = data_nparts(triples)

    def partials(batch: pa.Table) -> pa.Table:
        subj = batch["subject_id"].to_pandas().astype(str)
        conv = subj.str.extract(r"^conv/([^/]+)", expand=False)
        # NB: keep nulls as nulls — astype(str) would turn a null
        # object_id into the literal 'None' and count value triples
        # as entity links.
        obj = batch["object_id"].to_pandas()
        df = pd.DataFrame({"conv_id": conv, "object_id": obj}).dropna(
            subset=["conv_id"]
        )
        is_link = df["object_id"].notna() & (df["object_id"] != "")
        scal = (
            df.assign(is_link=is_link.astype("int64"))
            .groupby("conv_id", sort=False)["is_link"]
            .agg(n_triples="size", n_entity_links="sum")
            .reset_index()
        )
        scal["object_id"] = None
        pairs = df[is_link].drop_duplicates()
        pairs = pairs.assign(n_triples=0, n_entity_links=0)
        out = pd.concat([scal, pairs], ignore_index=True)[
            ["conv_id", "object_id", "n_triples", "n_entity_links"]
        ]
        for c in ("n_triples", "n_entity_links"):
            out[c] = out[c].astype("int64")
        return from_pandas_clean(out, preserve_index=False)

    def merge_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        is_pair = df["object_id"].notna()
        g = (
            df[~is_pair]
            .groupby("conv_id", sort=False)[["n_triples", "n_entity_links"]]
            .sum()
        )
        nd = (
            df[is_pair][["conv_id", "object_id"]]
            .drop_duplicates()
            .groupby("conv_id", sort=False)
            .size()
            .rename("n_distinct_entities")
        )
        out = g.join(nd, how="left").reset_index()
        out["n_distinct_entities"] = (
            out["n_distinct_entities"].fillna(0).astype("int64")
        )
        for c in ("n_triples", "n_entity_links"):
            out[c] = out[c].astype("int64")
        return from_pandas_clean(out, preserve_index=False)

    return (
        triples.map_batches(partials, batch_format="pyarrow")
        .repartition(n, keys=["conv_id"])
        .map_batches(merge_block, batch_format="pyarrow", batch_size=None)
    )


def kg_snapshot_asof(
    transcripts_path: str | list[str], cutoff: str = "2025-01-01T12:00:00"
):
    """Temporal KG snapshot (time travel): canonical triples built only
    from turns with ``ts <= cutoff``. The timestamp filter is a per-batch
    Arrow predicate applied at the read, so the as-of rebuild streams
    exactly like a current build — no snapshot copies; pair with
    ``kg_triple_diff``'s keyed diff for an as-of delta. Conversation
    aggregates are recomputed over the truncated turn set, matching
    what an ingest running at `cutoff` would have emitted."""
    import numpy as np
    import pyarrow.compute as pc

    cut = pa.scalar(np.datetime64(cutoff, "us"))

    def upto(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less_equal(batch["ts"], cut))

    return build_triples(transcripts_path, conv_filter=upto)


def reconstruct_conversations(transcripts_path: str | list[str], sep: str = "\n"):
    """Ordered conversation reconstruction: one row per conversation with
    its turns' texts joined in EXACT ``turn_idx`` order — the
    per-turn-text-equality-under-stable-ordering invariant (BASELINE
    input_hint) made into an operator. The training-corpus shape: a
    conversation becomes one document.

    Shape: ONE conv-keyed exchange co-locates each conversation's turns
    (a conversation must fit a block — the same mega-conversation bound
    the extractor's skew guard documents), then per block: mergesort on
    (conv_id, turn_idx), run-length segmentation, and a single
    ``pyarrow.compute.binary_join`` over a zero-copy ListArray view.
    Output is conversation-grain and stays a Dataset.

    Returns (conv_id, n_turns, full_text:large_string).
    """
    import ray.data

    from import_ray.core.context import configure_data_context, data_nparts

    configure_data_context()
    ds = ray.data.read_parquet(
        transcripts_path, columns=["conv_id", "turn_idx", "text"]
    ).map_batches(lambda b: b.replace_schema_metadata(None), batch_format="pyarrow")
    n = data_nparts(ds)

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["conv_id", "turn_idx"], kind="mergesort"
        )
        if not len(df):
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "n_turns": pa.array([], pa.int64()),
                    "full_text": pa.array([], pa.large_string()),
                }
            )
        conv = df["conv_id"].to_numpy(dtype=object)
        starts = np.flatnonzero(
            np.concatenate(([True], conv[1:] != conv[:-1]))
        )
        counts = np.diff(np.append(starts, len(df)))
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
        vals = pa.array(df["text"].to_numpy(dtype=object), pa.large_string())
        runs = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), vals)
        return pa.table(
            {
                "conv_id": pa.array(conv[starts], pa.string()),
                "n_turns": pa.array(counts.astype(np.int64), pa.int64()),
                "full_text": pc.binary_join(runs, pa.scalar(sep, pa.large_string())),
            }
        )

    return ds.repartition(n, keys=["conv_id"]).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


def conv_prefix_groups(
    transcripts_path: str | list[str], k_turns: int = 1, min_convs: int = 2
):
    """Template-conversation detection: group conversations whose first
    ``k_turns`` ordered (role, text) turns are byte-identical (shared
    system prompt / scripted opening) and report groups with at least
    ``min_convs`` members. Returns (conv_id=min of group, n_dups=group
    size) — the prefix-restricted variant of ``conv_dedup_exact``,
    sharing its rows-not-bytes two-exchange shape."""
    return conv_dedup_exact(
        transcripts_path, first_k_turns=k_turns, min_group=min_convs
    )


def conv_dedup_exact(
    transcripts_path: str | list[str],
    first_k_turns: int | None = None,
    min_group: int = 1,
):
    """Conversation-level exact dedup: conversations whose FULL ordered
    (role, text) turn sequence is byte-identical collapse to one winner
    (min conv_id) — node canonicalization at conversation grain, the
    corpus-level twin of the triple dedup. With ``first_k_turns`` set,
    only the first k turns form the content key (prefix grouping); with
    ``min_group`` > 1, only groups of at least that size survive.

    Shape: reconstruct per-conv canonical strings (conv-keyed exchange,
    vectorized join of ``role␟text`` turn units), hash each to a
    128-bit content key (two independent seeded hashes — only 16 B/row
    + the conv_id ever reaches the second exchange), then a
    (h1, h2)-keyed min fold picks winners. Bodies never shuffle twice.

    Returns (conv_id, n_dups): one row per surviving conversation with
    its duplicate-group size.
    """
    import pandas as pd
    import ray.data

    from import_ray.core.context import (
        configure_data_context,
        data_nparts,
        ensure_hash_shuffle,
    )

    configure_data_context()
    ds = ray.data.read_parquet(
        transcripts_path, columns=["conv_id", "turn_idx", "role", "text"]
    ).map_batches(lambda b: b.replace_schema_metadata(None), batch_format="pyarrow")
    n = data_nparts(ds)

    def content_keys(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["conv_id", "turn_idx"], kind="mergesort"
        )
        if first_k_turns is not None:
            df = df[df["turn_idx"] < first_k_turns]
        if not len(df):
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "h1": pa.array([], pa.uint64()),
                    "h2": pa.array([], pa.uint64()),
                }
            )
        conv = df["conv_id"].to_numpy(dtype=object)
        starts = np.flatnonzero(
            np.concatenate(([True], conv[1:] != conv[:-1]))
        )
        counts = np.diff(np.append(starts, len(df)))
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
        unit = pc.binary_join_element_wise(
            pc.cast(pa.array(df["role"].to_numpy(dtype=object)), pa.large_string()),
            pc.cast(pa.array(df["text"].to_numpy(dtype=object)), pa.large_string()),
            pa.scalar("\x1f", pa.large_string()),
        )
        runs = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), unit)
        body = pc.binary_join(runs, pa.scalar("\x1e", pa.large_string()))
        arr = body.to_pandas().to_numpy(dtype=object)
        # int64 views: Ray's hash-shuffle block conversion rejects uint64
        h1 = pd.util.hash_array(arr, hash_key="0123456789123456").view(np.int64)
        h2 = pd.util.hash_array(arr, hash_key="6543210987654321").view(np.int64)
        return pa.table(
            {
                "conv_id": pa.array(conv[starts], pa.string()),
                "h1": pa.array(h1, pa.int64()),
                "h2": pa.array(h2, pa.int64()),
            }
        )

    def winner_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = (
            df.groupby(["h1", "h2"], sort=False)["conv_id"]
            .agg(conv_id="min", n_dups="size")
            .reset_index(drop=True)
        )
        if min_group > 1:
            g = g[g["n_dups"] >= min_group]
        g["n_dups"] = g["n_dups"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    if first_k_turns is not None:
        # prune BEFORE the exchange: non-prefix turn bodies never shuffle
        k = int(first_k_turns)
        ds = ds.map_batches(
            lambda b: b.filter(pc.less(b["turn_idx"], k)),
            batch_format="pyarrow",
        )
    ensure_hash_shuffle(ds)
    keys = ds.repartition(n, keys=["conv_id"]).map_batches(
        content_keys, batch_format="pyarrow", batch_size=None
    )
    # second exchange ships only (16 B keys + conv_id); the block-local
    # pandas fold replaces a groupby().aggregate() aggregator pool
    return keys.repartition(n, keys=["h1"]).map_batches(
        winner_block, batch_format="pyarrow", batch_size=None
    )


def conv_sessions(transcripts_path: str | list[str], gap_minutes: int = 90):
    """Conversation sessionization: split each conversation's turn
    sequence (exact turn_idx order) wherever the inter-turn time gap
    exceeds ``gap_minutes`` — the transcripts-surface twin of
    ``relational.sessionize_events``, at conversation grain. A
    long-running agent conversation that idles overnight becomes
    multiple training sessions.

    Shape: ONE conv-keyed exchange (conv hash + int64 ts + turn idx;
    text never ships), per-block mergesort + vectorized diff, run-length
    segment count. Returns (conv_id, n_turns, n_sessions,
    max_gap_minutes) as a Dataset.
    """
    import ray.data

    from import_ray.core.context import (
        configure_data_context,
        data_nparts,
        ensure_hash_shuffle,
    )

    configure_data_context()
    ds = ray.data.read_parquet(
        transcripts_path, columns=["conv_id", "turn_idx", "ts"]
    ).map_batches(lambda b: b.replace_schema_metadata(None), batch_format="pyarrow")
    n = data_nparts(ds)
    gap_us = int(gap_minutes) * 60_000_000

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(["conv_id", "turn_idx"], kind="mergesort")
        empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n_turns": pa.array([], pa.int64()),
                "n_sessions": pa.array([], pa.int64()),
                "max_gap_minutes": pa.array([], pa.int64()),
            }
        )
        if not len(df):
            return empty
        conv = df["conv_id"].to_numpy(dtype=object)
        ts = df["ts"].astype("int64").to_numpy()  # microseconds
        same = np.empty(len(df), dtype=bool)
        same[0] = False
        same[1:] = conv[1:] == conv[:-1]
        gap = np.zeros(len(df), dtype=np.int64)
        gap[1:] = ts[1:] - ts[:-1]
        gap[~same] = 0
        starts = np.flatnonzero(~same)
        counts = np.diff(np.append(starts, len(df)))
        split = (gap > gap_us).astype(np.int64)
        cum = np.concatenate(([0], np.cumsum(split)))
        n_sessions = 1 + (cum[np.append(starts[1:], len(df))] - cum[starts])
        gmax = np.maximum.reduceat(gap, starts)
        return pa.table(
            {
                "conv_id": pa.array(conv[starts], pa.string()),
                "n_turns": pa.array(counts.astype(np.int64), pa.int64()),
                "n_sessions": pa.array(n_sessions.astype(np.int64), pa.int64()),
                "max_gap_minutes": pa.array(gmax // 60_000_000, pa.int64()),
            }
        )

    ensure_hash_shuffle(ds)
    return ds.repartition(n, keys=["conv_id"]).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


def conv_structure_check(transcripts_path: str | list[str]):
    """Dialogue-structure validation — the McfChecker-style lint pass
    (util/.../McfChecker.java check counters) applied to raw transcript
    structure instead of MCF nodes: per conversation, is the turn_idx
    sequence exactly 0..n-1 (no gaps, no duplicates) and do roles
    strictly alternate between consecutive turns?

    Returns (conv_id, n_turns, idx_ok, alternation_ok) — the corpus
    gate a training pipeline runs before trusting turn ordering.
    Shape: ONE conv-keyed exchange; per-block mergesort + vectorized
    run-segmented checks.
    """
    import ray.data

    from import_ray.core.context import (
        configure_data_context,
        data_nparts,
        ensure_hash_shuffle,
    )

    configure_data_context()
    ds = ray.data.read_parquet(
        transcripts_path, columns=["conv_id", "turn_idx", "role"]
    ).map_batches(lambda b: b.replace_schema_metadata(None), batch_format="pyarrow")
    n = data_nparts(ds)

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(["conv_id", "turn_idx"], kind="mergesort")
        empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n_turns": pa.array([], pa.int64()),
                "idx_ok": pa.array([], pa.bool_()),
                "alternation_ok": pa.array([], pa.bool_()),
            }
        )
        if not len(df):
            return empty
        conv = df["conv_id"].to_numpy(dtype=object)
        idx = df["turn_idx"].to_numpy().astype(np.int64)
        role = df["role"].to_numpy(dtype=object)
        same = np.empty(len(df), dtype=bool)
        same[0] = False
        same[1:] = conv[1:] == conv[:-1]
        starts = np.flatnonzero(~same)
        counts = np.diff(np.append(starts, len(df)))
        # idx_ok: within each run the sorted idx must be start-relative
        # 0,1,2,... — i.e. idx - (position within run) == 0 everywhere
        pos = np.arange(len(df)) - np.repeat(starts, counts)
        idx_bad = idx != pos
        # alternation: consecutive turns in a conv must change role
        alt_bad = same & (role == np.concatenate(([None], role[:-1])))
        # per-run "any bad" via segment sums
        def seg_any(bad):
            c = np.concatenate(([0], np.cumsum(bad.astype(np.int64))))
            ends = np.append(starts[1:], len(df))
            return (c[ends] - c[starts]) > 0

        return pa.table(
            {
                "conv_id": pa.array(conv[starts], pa.string()),
                "n_turns": pa.array(counts.astype(np.int64), pa.int64()),
                "idx_ok": pa.array(~seg_any(idx_bad), pa.bool_()),
                "alternation_ok": pa.array(~seg_any(alt_bad), pa.bool_()),
            }
        )

    ensure_hash_shuffle(ds)
    return ds.repartition(n, keys=["conv_id"]).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


def tool_transitions(transcripts_path: str | list[str]):
    """Agent tool-call chain mining: first-order transition counts over
    each conversation's SEQUENCE of tool invocations in exact turn_idx
    order (turns with no tool are skipped, so "search → calculator"
    counts even with chat turns between them) — the Markov fit over
    agent behavior, the transcripts-surface twin of
    ``relational.event_transitions``.

    Shape: ONE conv-keyed exchange (rows are conv hash + tool + turn
    idx; text never ships), per-block mergesort + vectorized shift,
    per-block (prev_tool, next_tool) partial counts, driver sum of the
    tiny #tools² matrix. Returns pandas (prev_tool, next_tool, n).
    """
    import pandas as pd
    import ray.data

    from import_ray.core.arrowutil import from_pandas_clean
    from import_ray.core.context import (
        configure_data_context,
        data_nparts,
        ensure_hash_shuffle,
    )

    configure_data_context()
    ds = ray.data.read_parquet(
        transcripts_path, columns=["conv_id", "turn_idx", "tool"]
    ).map_batches(lambda b: b.replace_schema_metadata(None), batch_format="pyarrow")
    n = data_nparts(ds)

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["tool"].notna() & (df["tool"] != "")]
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        empty = pa.table(
            {
                "prev_tool": pa.array([], pa.string()),
                "next_tool": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if not len(df):
            return empty
        conv = df["conv_id"].to_numpy(dtype=object)
        tool = df["tool"].to_numpy(dtype=object)
        same = np.empty(len(df), dtype=bool)
        same[0] = False
        same[1:] = conv[1:] == conv[:-1]
        if not same.any():
            return empty
        g = (
            pd.DataFrame(
                {
                    "prev_tool": np.concatenate(([None], tool[:-1]))[same],
                    "next_tool": tool[same],
                }
            )
            .groupby(["prev_tool", "next_tool"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype("int64")
        return from_pandas_clean(g, preserve_index=False)

    ensure_hash_shuffle(ds)
    parts = (
        ds.repartition(n, keys=["conv_id"])
        .map_batches(per_block, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    out = (
        parts.groupby(["prev_tool", "next_tool"], sort=True)["n"].sum().reset_index()
    )
    out["n"] = out["n"].astype("int64")
    return out
