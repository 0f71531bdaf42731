"""Graph analysis over canonical KG triples.

The reference materializes graphs as Node/Edge rows (SURVEY §2:
``graphToEdges/graphToNodes``, pipeline/ ingestion); these operators
add the analysis a KG-construction run needs to validate its output at
scale:

- ``predicate_counts``: triples per predicate (one small keyed
  aggregate — #groups = #predicates, tiny).
- ``out_degree_topk``: the highest-fanout subjects (per-block partial
  counts + one keyed exchange + block-local partial top-k, so only
  k × #blocks rows reach the driver merge).
- ``entity_components``: connected components of the entity-reference
  graph (subject —ref→ object), via the tested distributed min-label
  propagation from the near-dup engine (``neardup.propagate_min_labels``
  — groupby-min rounds bounded by component diameter). String dcids
  enter the exchange as 64-bit hashes (16 B/edge); at 10^10 nodes the
  birthday collision expectation is ~3e-3 — document-level dedup keys
  use 128 bits, component labels tolerate 64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _hash_ids(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    s = col.to_pandas().to_numpy(dtype=object)
    return pd.util.hash_array(s).astype(np.int64)


def predicate_counts(triples_ds):
    """(predicate, n_triples) — one keyed aggregate over #predicate groups."""
    from ray.data.aggregate import Count

    from import_ray.core.context import join_safe, npartitions

    out = (
        triples_ds.select_columns(["predicate"])
        .groupby("predicate", num_partitions=npartitions())
        .aggregate(Count(alias_name="n_triples"))
    )
    return join_safe(out)


def out_degree_topk(triples_ds, k: int = 20):
    """Top-k subjects by out-degree (triple fanout). Partial per-block
    counts → keyed exchange → block-local top-k partials → driver merge
    of k × #blocks rows."""
    from import_ray.core.context import ensure_hash_shuffle, npartitions

    ensure_hash_shuffle(triples_ds)
    n = npartitions()

    def partial_counts(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"subject_id": batch["subject_id"].to_pandas()})
        g = df.groupby("subject_id", sort=False).size().reset_index(name="out_degree")
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def block_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("subject_id", sort=False)["out_degree"].sum().reset_index()
        g = g.sort_values(
            ["out_degree", "subject_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    partials = (
        triples_ds.select_columns(["subject_id"])
        .map_batches(partial_counts, batch_format="pyarrow")
        .repartition(n, keys=["subject_id"])
        .map_batches(block_topk, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    return (
        partials.sort_values(
            ["out_degree", "subject_id"], ascending=[False, True], kind="mergesort"
        )
        .head(k)
        .reset_index(drop=True)
    )


def entity_edges(triples_ds, max_object_degree: int | None = None):
    """Entity-reference edges as 64-bit node hashes: (doc_lo, doc_hi)
    rows for every triple with a non-empty object_id ≠ subject_id
    (column names match the near-dup pair schema so the label
    propagation engine applies unchanged).

    ``max_object_degree`` drops super-hub objects (in-degree above the
    cap) before propagation — the standard pre-step for components over
    power-law KG graphs: hubs weld everything into one giant component
    and its diameter drives the propagation round count. The degree
    filter is one partial-count + keyed exchange + semi-join, all on
    8-byte hash keys."""

    def to_edges(batch: pa.Table) -> pa.Table:
        obj = batch["object_id"]
        if isinstance(obj, pa.ChunkedArray):
            obj = obj.combine_chunks()
        keep = pc.and_(
            obj.is_valid(),
            pc.and_(
                pc.not_equal(pc.fill_null(obj, ""), ""),
                pc.not_equal(pc.fill_null(obj, ""), batch["subject_id"]),
            ),
        )
        batch = batch.filter(keep)
        return pa.table(
            {
                "doc_lo": pa.array(_hash_ids(batch["subject_id"])),
                "doc_hi": pa.array(_hash_ids(batch["object_id"])),
            }
        )

    edges = triples_ds.select_columns(["subject_id", "object_id"]).map_batches(
        to_edges, batch_format="pyarrow"
    )
    if max_object_degree is None:
        return edges

    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions

    ensure_hash_shuffle(edges)
    n = npartitions()

    def partial_deg(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"doc_hi": batch["doc_hi"].to_numpy(zero_copy_only=False)})
        g = df.groupby("doc_hi", sort=False).size().reset_index(name="deg")
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def block_keep(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("doc_hi", sort=False)["deg"].sum().reset_index()
        g = g[g["deg"] <= max_object_degree]
        return pa.Table.from_pandas(
            g[["doc_hi"]], preserve_index=False
        ).replace_schema_metadata(None)

    edges = join_safe(edges).materialize()
    keep = (
        edges.map_batches(partial_deg, batch_format="pyarrow")
        .repartition(n, keys=["doc_hi"])
        .map_batches(block_keep, batch_format="pyarrow", batch_size=None)
    )
    return edges.join(
        join_safe(keep),
        join_type="left_semi",
        num_partitions=n,
        on=("doc_hi",),
        right_on=("doc_hi",),
    )


def _driver_component_labels(lo: np.ndarray, hi: np.ndarray) -> pa.Table:
    """Array union-find (union-by-min + path halving) over bounded
    pair arrays → (node, label) with label = component min — the same
    fixpoint as distributed min-label propagation (pytest-gated
    byte-equal)."""
    nodes, idx = np.unique(np.concatenate([lo, hi]), return_inverse=True)
    parent = np.arange(len(nodes), dtype=np.int64)
    li, hi_i = idx[: len(lo)], idx[len(lo) :]

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(li.tolist(), hi_i.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            # nodes[] is sorted ascending, so smaller index = smaller id
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.array([find(i) for i in range(len(nodes))], np.int64)
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "label": pa.array(nodes[roots], pa.int64()),
        }
    )


def connected_components(
    edges_ds,
    max_rounds: int = 25,
    contract: bool = True,
    max_driver_pairs: int | None = None,
):
    """(node, label) over an edge Dataset with doc_lo/doc_hi int64
    columns — one block-local contraction pass (see
    ``contract_edges_block``; labels are byte-identical with or without
    it, pytest-gated), then hybrid labeling mirroring
    ``neardup.label_clusters``: edge sets at or below
    ``max_driver_pairs`` (default ``neardup.MAX_DRIVER_PAIRS``; the
    contraction pass has already collapsed every block-local chain, so
    this is the post-contraction CROSS-block edge count, ≪ raw edges)
    run an array union-find on the driver — a distributed propagation
    round costs 2-3 keyed exchanges of fixed spin-up each, which on a
    bounded edge set is pure overhead. Larger edge sets use distributed
    min-label propagation with pointer doubling (see neardup). Both
    paths converge to label = component min (pytest-gated byte-equal)."""
    from import_ray.stages.neardup import MAX_DRIVER_PAIRS, propagate_min_labels

    if max_driver_pairs is None:
        max_driver_pairs = MAX_DRIVER_PAIRS
    if contract:
        edges_ds = contract_edges_block(edges_ds)
    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= max_driver_pairs:
        df = edges_ds.select_columns(["doc_lo", "doc_hi"]).to_pandas()
        import ray.data

        return ray.data.from_arrow(
            _driver_component_labels(
                df["doc_lo"].to_numpy(np.int64), df["doc_hi"].to_numpy(np.int64)
            )
        )
    return propagate_min_labels(edges_ds, max_rounds=max_rounds)


def component_sizes(edges_ds, max_rounds: int = 25):
    """(label, size) per connected component — the KG canonicalization
    cluster histogram. Singleton nodes never enter the propagation (they
    have no edges), so sizes cover linked entities only."""
    from ray.data.aggregate import Count

    from import_ray.core.context import join_safe, npartitions

    labels = connected_components(edges_ds, max_rounds=max_rounds)
    return join_safe(
        labels.groupby("label", num_partitions=npartitions()).aggregate(
            Count(alias_name="size")
        )
    )


def pagerank(edges_ds, iterations: int = 10, damping: float = 0.85):
    """Distributed PageRank over an edge Dataset (doc_lo=src,
    doc_hi=dst, int64 node hashes — the ``entity_edges`` schema).

    The hub-score pass a KG-construction run uses to rank entities for
    canonicalization priority / spot-check sampling (the reference's
    graph tooling stops at node/edge materialization —
    pipeline/src/.../GraphUtils.java builds edges; ranking is an engine
    addition).

    Scale shape: per-edge weight 1/out_degree(src) is computed ONCE
    (one keyed count + one hash join) and the weighted edge set is
    materialized; each iteration is then one edges⋈ranks hash join on
    the 8-byte src key, one grouped sum over dst, and one left join
    back onto the node set — message volume ∝ edges, every exchanged
    column int64/float64, nothing driver-side but two scalars.
    Dangling-node mass is exact and costs no extra exchange: with
    Σ rank = 1, the uniformly-redistributed mass is
    1 − Σ(per-dst contribution sums), a scalar aggregate over the sums
    Dataset already in hand.

    Parallel edges contribute multiply (multigraph semantics);
    ``exact_dedup_triples`` upstream makes the entity graph simple.

    Returns a Dataset (node:int64, rank:float64); Σ rank = 1 over the
    non-isolated node set every iteration.
    """
    from ray.data.aggregate import Count, Sum

    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions

    ensure_hash_shuffle(edges_ds)
    n = npartitions()

    edges = join_safe(edges_ds).materialize()
    if edges.count() == 0:
        import ray.data

        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())})
        )

    def nodes_of(b: pa.Table) -> pa.Table:
        lo = b["doc_lo"].to_numpy(zero_copy_only=False)
        hi = b["doc_hi"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"node": pa.array(np.unique(np.concatenate([lo, hi])), pa.int64())}
        )

    nodes = (
        join_safe(
            edges.map_batches(nodes_of, batch_format="pyarrow")
            .groupby("node", num_partitions=n)
            .aggregate(Count(alias_name="_c"))
        )
        .select_columns(["node"])
        .materialize()
    )
    num_nodes = nodes.count()

    deg = join_safe(
        edges.groupby("doc_lo", num_partitions=n).aggregate(Count(alias_name="deg"))
    )
    w_edges = (
        edges.join(
            deg,
            join_type="inner",
            num_partitions=n,
            on=("doc_lo",),
            right_on=("doc_lo",),
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "src": b["doc_lo"],
                    "dst": b["doc_hi"],
                    "w": pc.divide(
                        pa.scalar(1.0), pc.cast(b["deg"], pa.float64())
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    init = 1.0 / num_nodes
    ranks = nodes.map_batches(
        lambda b, v=init: pa.table(
            {"node": b["node"], "rank": pa.array(np.full(len(b), v), pa.float64())}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iterations):
        msgs = w_edges.join(
            ranks,
            join_type="inner",
            num_partitions=n,
            on=("src",),
            right_on=("node",),
        ).map_batches(
            lambda b: pa.table(
                {"node": b["dst"], "c": pc.multiply(b["w"], b["rank"])}
            ),
            batch_format="pyarrow",
        )
        sums = join_safe(
            msgs.groupby("node", num_partitions=n).aggregate(Sum("c", alias_name="c"))
        ).materialize()
        row = sums.aggregate(Sum("c", alias_name="s"))
        contributed = float(row["s"] or 0.0)
        # Σ rank = 1 ⇒ dangling mass = 1 − mass that flowed along edges
        dangling = max(0.0, 1.0 - contributed)
        base = (1.0 - damping) / num_nodes + damping * dangling / num_nodes

        ranks = (
            nodes.join(
                sums,
                join_type="left_outer",
                num_partitions=n,
                on=("node",),
                right_on=("node",),
            )
            .map_batches(
                lambda b, base=base: pa.table(
                    {
                        "node": b["node"],
                        "rank": pc.add(
                            pa.scalar(base),
                            pc.multiply(
                                pa.scalar(damping),
                                pc.fill_null(pc.cast(b["c"], pa.float64()), 0.0),
                            ),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
    return ranks


def contract_edges_block(edges_ds, num_partitions: int | None = None):
    """Connectivity-preserving local contraction: hash-partition edges
    by doc_lo, run union-find INSIDE each block, and emit each block's
    spanning forest as (node → block-local root) edges. Connectivity is
    unchanged (a spanning forest of a subset of edges connects exactly
    what that subset connects) while duplicate and intra-cluster
    redundant edges collapse, so the global min-label propagation
    downstream starts with fewer edges and a shallower diameter —
    typically 2-3× fewer propagation rounds on power-law graphs.
    Block memory is ∝ distinct nodes per block, not the graph."""
    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions

    ensure_hash_shuffle(edges_ds)
    n = num_partitions or npartitions()

    def contract(batch: pa.Table) -> pa.Table:
        lo = batch["doc_lo"].to_numpy(zero_copy_only=False)
        hi = batch["doc_hi"].to_numpy(zero_copy_only=False)
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(lo.tolist(), hi.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                m, M = (ra, rb) if ra < rb else (rb, ra)
                parent[M] = m
        nodes = list(parent)
        roots = [find(x) for x in nodes]
        return pa.table(
            {
                "doc_lo": pa.array(nodes, pa.int64()),
                "doc_hi": pa.array(roots, pa.int64()),
            }
        )

    return join_safe(
        edges_ds.repartition(n, keys=["doc_lo"]).map_batches(
            contract, batch_format="pyarrow", batch_size=None
        )
    )


def triangle_count(edges_ds):
    """Distributed triangle counting via degree-ordered wedge closing.

    Edges are canonicalized undirected (self-loops dropped, endpoints
    sorted, dedup via one keyed exchange), then ORIENTED from the
    lower-(degree, id) endpoint to the higher — the standard trick that
    bounds every node's out-degree by O(sqrt(m)), so the wedge
    (two-path) generation that follows is O(m^1.5) total instead of
    O(sum deg^2) on power-law graphs. Wedges are emitted per source
    group after a src-keyed repartition and closed with one hash join
    against the oriented edge set. All exchanged columns are int64.

    Returns the triangle count (int).
    """
    from ray.data.aggregate import Count, Sum

    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions

    ensure_hash_shuffle(edges_ds)
    n = npartitions()

    def canon(b: pa.Table) -> pa.Table:
        lo = b["doc_lo"].to_numpy(zero_copy_only=False)
        hi = b["doc_hi"].to_numpy(zero_copy_only=False)
        keep = lo != hi
        lo, hi = lo[keep], hi[keep]
        a = np.minimum(lo, hi)
        c = np.maximum(lo, hi)
        # block-local distinct before the exchange
        key = np.stack([a, c], axis=1)
        uniq = np.unique(key, axis=0)
        return pa.table(
            {"a": pa.array(uniq[:, 0], pa.int64()), "b": pa.array(uniq[:, 1], pa.int64())}
        )

    edges = join_safe(
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"], num_partitions=n)
        .aggregate(Count(alias_name="_c"))
    ).select_columns(["a", "b"]).materialize()
    if edges.count() == 0:
        return 0

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.array(
                    np.concatenate(
                        [
                            b["a"].to_numpy(zero_copy_only=False),
                            b["b"].to_numpy(zero_copy_only=False),
                        ]
                    ),
                    pa.int64(),
                )
            }
        )

    deg = join_safe(
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node", num_partitions=n)
        .aggregate(Count(alias_name="deg"))
    ).materialize()

    # orient: src = endpoint with smaller (deg, id); dst = the other
    with_da = edges.join(
        deg, join_type="inner", num_partitions=n, on=("a",), right_on=("node",)
    ).map_batches(
        lambda b: pa.table(
            {"a": b["a"], "b": b["b"], "deg_a": b["deg"]}
        ),
        batch_format="pyarrow",
    )
    oriented = (
        with_da.join(
            deg, join_type="inner", num_partitions=n, on=("b",), right_on=("node",)
        )
        .map_batches(
            lambda b: _orient(b),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def wedges(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "src": b["src"].to_numpy(zero_copy_only=False),
                "dst": b["dst"].to_numpy(zero_copy_only=False),
                "ddeg": b["ddeg"].to_numpy(zero_copy_only=False),
            }
        )
        # per source: all ordered out-neighbor pairs — v before w in the
        # SAME (deg, id) order the orientation used, so the closing edge
        # is exactly the oriented v→w; out-degree is O(sqrt(m))
        outs_v = []
        outs_w = []
        for _, grp in df.groupby("src", sort=False):
            g = grp.sort_values(["ddeg", "dst"], kind="mergesort")
            d = g["dst"].to_numpy()
            k = len(d)
            if k < 2:
                continue
            iu, ju = np.triu_indices(k, 1)
            outs_v.append(d[iu])
            outs_w.append(d[ju])
        if not outs_v:
            return pa.table(
                {"wv": pa.array([], pa.int64()), "ww": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "wv": pa.array(np.concatenate(outs_v), pa.int64()),
                "ww": pa.array(np.concatenate(outs_w), pa.int64()),
            }
        )

    wedge_ds = join_safe(
        oriented.repartition(n, keys=["src"])
        .map_batches(wedges, batch_format="pyarrow", batch_size=None)
    ).materialize()
    # Ray's hash-shuffle join drops the schema of a 0-block side and
    # acero then can't resolve the key FieldRefs — short-circuit
    if wedge_ds.count() == 0:
        return 0
    closed = wedge_ds.join(
        oriented.select_columns(["src", "dst"]),
        join_type="inner",
        num_partitions=n,
        on=("wv", "ww"),
        right_on=("src", "dst"),
    )
    return closed.count()


def _orient(b: pa.Table) -> pa.Table:
    """Direct each undirected edge from the endpoint with the smaller
    (degree, id) key toward the larger; carry the dst key for the
    deterministic wedge ordering."""
    a = b["a"].to_numpy(zero_copy_only=False)
    bb = b["b"].to_numpy(zero_copy_only=False)
    da = b["deg_a"].to_numpy(zero_copy_only=False)
    db = b["deg"].to_numpy(zero_copy_only=False)
    a_first = (da < db) | ((da == db) & (a < bb))
    src = np.where(a_first, a, bb)
    dst = np.where(a_first, bb, a)
    ddeg = np.where(a_first, db, da)  # dst's degree: ordering key with dst id
    return pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "ddeg": pa.array(ddeg, pa.int64()),
        }
    )


CO_MENTION_PREDICATES = ("mentions", "mentionsPlace", "mentionsLocation")


def co_mention_edges(
    triples_ds,
    predicates: tuple[str, ...] = CO_MENTION_PREDICATES,
    max_entities_per_group: int = 64,
):
    """Entity co-mention edges: two entities are linked when mention
    triples place them in the same conversation (subject
    ``conv/<id>/t<k>`` → group ``conv/<id>``).

    The clique expansion is the classic blow-up risk (a conversation
    mentioning k entities yields k(k−1)/2 edges), so groups are capped
    at ``max_entities_per_group`` lexicographically-first entities and
    the cap is logged — the same skew guard as the LSH bucket cap.
    Exchange shape: distinct (conv-hash, entity-hash) int64 pairs
    (block-local distinct first), one keyed repartition, vectorized
    in-block pair emission.
    """
    import logging

    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions

    log = logging.getLogger(__name__)
    ensure_hash_shuffle(triples_ds)
    n = npartitions()
    pred_set = list(predicates)

    def mention_rows(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["predicate"], value_set=pa.array(pred_set))
        batch = batch.filter(keep)
        subj = batch["subject_id"].to_pandas().astype(str)
        conv = subj.str.rsplit("/", n=1).str[0]
        ent = batch["object_id"].to_pandas().astype(str)
        df = pd.DataFrame(
            {
                "conv": pd.util.hash_array(conv.to_numpy(dtype=object)).astype(np.int64),
                "ent": pd.util.hash_array(ent.to_numpy(dtype=object)).astype(np.int64),
            }
        ).drop_duplicates()
        return from_pandas_clean(df)

    def pairs(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "conv": batch["conv"].to_numpy(zero_copy_only=False),
                "ent": batch["ent"].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        lo_parts, hi_parts = [], []
        capped = 0
        for _, grp in df.groupby("conv", sort=False):
            ents = np.unique(grp["ent"].to_numpy())
            if len(ents) > max_entities_per_group:
                capped += 1
                ents = ents[:max_entities_per_group]
            k = len(ents)
            if k < 2:
                continue
            iu, ju = np.triu_indices(k, 1)
            lo_parts.append(ents[iu])
            hi_parts.append(ents[ju])
        if capped:
            log.warning(
                "co_mention_edges: %d group(s) over max_entities_per_group=%d; truncated",
                capped,
                max_entities_per_group,
            )
        if not lo_parts:
            return pa.table(
                {"doc_lo": pa.array([], pa.int64()), "doc_hi": pa.array([], pa.int64())}
            )
        lo = np.concatenate(lo_parts)
        hi = np.concatenate(hi_parts)
        key = np.stack([lo, hi], axis=1)
        uniq = np.unique(key, axis=0)
        return pa.table(
            {
                "doc_lo": pa.array(uniq[:, 0], pa.int64()),
                "doc_hi": pa.array(uniq[:, 1], pa.int64()),
            }
        )

    return join_safe(
        triples_ds.select_columns(["subject_id", "predicate", "object_id"])
        .map_batches(mention_rows, batch_format="pyarrow")
        .repartition(n, keys=["conv"])
        .map_batches(pairs, batch_format="pyarrow", batch_size=None)
    )


def from_pandas_clean(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def co_mention_pmi(
    triples_ds,
    predicates: tuple[str, ...] = CO_MENTION_PREDICATES,
    min_pairs: int = 2,
    top_k: int = 50,
    max_entities_per_group: int = 64,
):
    """Entity-association strength: pointwise mutual information over
    conversation co-mentions — PMI(a,b) = log(N·c(a,b) / (c(a)·c(b)))
    with c(·) counting CONVERSATIONS (distinct pairs per conversation,
    the same dedup as ``co_mention_edges``).

    Exchange shape: pair counts ride the co-mention pair pipeline
    (int64 hash pairs); marginals are one small keyed count; the two
    marginal lookups are hash joins on 8-byte keys; the final top-k is
    block-local partial top-k + a tiny driver merge. ``min_pairs``
    suppresses the unstable PMI of singleton pairs.

    Returns a pandas DataFrame (ent_lo, ent_hi, n_pair, n_lo, n_hi,
    pmi) of the top_k pairs by (pmi, ent_lo, ent_hi).
    """
    from ray.data.aggregate import Count

    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions

    ensure_hash_shuffle(triples_ds)
    n = npartitions()

    # distinct (conv, entity) rows — same kernel as co_mention_edges
    pred_set = list(predicates)

    def mention_rows(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["predicate"], value_set=pa.array(pred_set))
        batch = batch.filter(keep)
        subj = batch["subject_id"].to_pandas().astype(str)
        conv = subj.str.rsplit("/", n=1).str[0]
        ent = batch["object_id"].to_pandas().astype(str)
        df = pd.DataFrame(
            {
                "conv": pd.util.hash_array(conv.to_numpy(dtype=object)).astype(np.int64),
                "ent": pd.util.hash_array(ent.to_numpy(dtype=object)).astype(np.int64),
            }
        ).drop_duplicates()
        return from_pandas_clean(df)

    mentions = join_safe(
        triples_ds.select_columns(["subject_id", "predicate", "object_id"])
        .map_batches(mention_rows, batch_format="pyarrow")
        .groupby(["conv", "ent"], num_partitions=n)
        .aggregate(Count(alias_name="_c"))
    ).select_columns(["conv", "ent"]).materialize()

    total_convs = (
        join_safe(
            mentions.select_columns(["conv"])
            .groupby("conv", num_partitions=n)
            .aggregate(Count(alias_name="_c"))
        ).count()
    )

    marginals = join_safe(
        mentions.groupby("ent", num_partitions=n).aggregate(Count(alias_name="n_ent"))
    ).materialize()

    def pairs(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "conv": batch["conv"].to_numpy(zero_copy_only=False),
                "ent": batch["ent"].to_numpy(zero_copy_only=False),
            }
        )
        lo_parts, hi_parts = [], []
        for _, grp in df.groupby("conv", sort=False):
            ents = np.unique(grp["ent"].to_numpy())[:max_entities_per_group]
            k = len(ents)
            if k < 2:
                continue
            iu, ju = np.triu_indices(k, 1)
            lo_parts.append(ents[iu])
            hi_parts.append(ents[ju])
        if not lo_parts:
            return pa.table(
                {"ent_lo": pa.array([], pa.int64()), "ent_hi": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "ent_lo": pa.array(np.concatenate(lo_parts), pa.int64()),
                "ent_hi": pa.array(np.concatenate(hi_parts), pa.int64()),
            }
        )

    # the filter must sit INSIDE the join_safe re-block: a filter that
    # empties a block emits it schema-less, and acero rejects
    # schema-less blocks on a join side ("No match ... for key field")
    pair_counts = join_safe(
        mentions.repartition(n, keys=["conv"])
        .map_batches(pairs, batch_format="pyarrow", batch_size=None)
        .groupby(["ent_lo", "ent_hi"], num_partitions=n)
        .aggregate(Count(alias_name="n_pair"))
        .filter(expr=f"n_pair >= {int(min_pairs)}")
    )

    # join output partitions can be empty schema-less blocks; re-block
    # before the next keyed op (join_safe) — same guard as everywhere
    with_lo = join_safe(
        pair_counts.join(
            marginals, join_type="inner", num_partitions=n, on=("ent_lo",), right_on=("ent",)
        ).map_batches(
            lambda b: pa.table(
                {
                    "ent_lo": b["ent_lo"],
                    "ent_hi": b["ent_hi"],
                    "n_pair": b["n_pair"],
                    "n_lo": b["n_ent"],
                }
            ),
            batch_format="pyarrow",
        )
    )
    joined = with_lo.join(
        marginals, join_type="inner", num_partitions=n, on=("ent_hi",), right_on=("ent",)
    )

    def score_topk(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "ent_lo": batch["ent_lo"].to_numpy(zero_copy_only=False),
                "ent_hi": batch["ent_hi"].to_numpy(zero_copy_only=False),
                "n_pair": batch["n_pair"].to_numpy(zero_copy_only=False),
                "n_lo": batch["n_lo"].to_numpy(zero_copy_only=False),
                "n_hi": batch["n_ent"].to_numpy(zero_copy_only=False),
            }
        )
        df["pmi"] = np.log(
            (total_convs * df["n_pair"].to_numpy(dtype=np.float64))
            / (df["n_lo"].to_numpy(dtype=np.float64) * df["n_hi"].to_numpy())
        )
        df = df.sort_values(
            ["pmi", "ent_lo", "ent_hi"], ascending=[False, True, True], kind="mergesort"
        ).head(top_k)
        return from_pandas_clean(df)

    partials = joined.map_batches(
        score_topk, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    return (
        partials.sort_values(
            ["pmi", "ent_lo", "ent_hi"], ascending=[False, True, True], kind="mergesort"
        )
        .head(top_k)
        .reset_index(drop=True)
    )


def k_core(edges_ds, k: int = 2, max_rounds: int = 30):
    """Nodes of the k-core: iteratively peel nodes with degree < k
    until fixpoint (the standard distributed peeling loop — round
    count bounded by the peeling depth, degrees recomputed per round).

    Per round: one keyed degree count + two semi-joins that keep only
    edges whose BOTH endpoints survive — all on 8-byte hash keys.
    Convergence when the edge count stops changing.

    Returns a Dataset (node:int64) of surviving nodes (empty when the
    k-core is empty).
    """
    from ray.data.aggregate import Count

    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions

    ensure_hash_shuffle(edges_ds)
    n = npartitions()

    def canon(b: pa.Table) -> pa.Table:
        lo = b["doc_lo"].to_numpy(zero_copy_only=False)
        hi = b["doc_hi"].to_numpy(zero_copy_only=False)
        keep = lo != hi
        lo, hi = lo[keep], hi[keep]
        a = np.minimum(lo, hi)
        c = np.maximum(lo, hi)
        uniq = np.unique(np.stack([a, c], axis=1), axis=0)
        return pa.table(
            {"a": pa.array(uniq[:, 0], pa.int64()), "b": pa.array(uniq[:, 1], pa.int64())}
        )

    edges = join_safe(
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"], num_partitions=n)
        .aggregate(Count(alias_name="_c"))
    ).select_columns(["a", "b"]).materialize()

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.array(
                    np.concatenate(
                        [
                            b["a"].to_numpy(zero_copy_only=False),
                            b["b"].to_numpy(zero_copy_only=False),
                        ]
                    ),
                    pa.int64(),
                )
            }
        )

    prev_edges = edges.count()
    survivors = None
    for _ in range(max_rounds):
        if prev_edges == 0:
            import ray.data

            return ray.data.from_arrow(pa.table({"node": pa.array([], pa.int64())}))
        deg = join_safe(
            edges.map_batches(endpoints, batch_format="pyarrow")
            .groupby("node", num_partitions=n)
            .aggregate(Count(alias_name="deg"))
        )
        survivors = join_safe(
            deg.filter(expr=f"deg >= {int(k)}").select_columns(["node"])
        )
        if survivors.count() == 0:
            import ray.data

            return ray.data.from_arrow(pa.table({"node": pa.array([], pa.int64())}))
        # join_safe after EACH semi-join: a hash-shuffle join partition
        # with zero rows emits a schema-less block that poisons the next
        # keyed exchange (left OR right side, depending on key hashing)
        edges = join_safe(
            join_safe(
                edges.join(
                    survivors,
                    join_type="left_semi",
                    num_partitions=n,
                    on=("a",),
                    right_on=("node",),
                )
            ).join(
                survivors, join_type="left_semi", num_partitions=n, on=("b",), right_on=("node",)
            )
        )
        cur = edges.count()
        if cur == prev_edges:
            break
        prev_edges = cur
    return survivors


def adamic_adar_topk(edges_ds, top_k: int = 50, max_wedges_per_node: int = 10_000):
    """Link prediction: top-k NON-adjacent node pairs by Adamic–Adar
    score AA(v,w) = Σ over common neighbors u of 1/ln(deg(u)).

    Shape: degrees (one keyed count) join onto edges; wedges (v,w)
    through each u are emitted per u-group after a keyed repartition,
    each carrying 1/ln(deg(u)); per-pair scores are one grouped sum;
    existing edges are removed with one anti join; the top-k is
    block-local partial top-k + tiny driver merge. Hub wedge fanout is
    capped per node (logged) — the same skew guard as the co-mention
    clique cap.

    Returns a pandas DataFrame (node_lo, node_hi, aa_score).
    """
    import logging

    from ray.data.aggregate import Count, Sum

    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions

    log = logging.getLogger(__name__)
    ensure_hash_shuffle(edges_ds)
    n = npartitions()

    def canon(b: pa.Table) -> pa.Table:
        lo = b["doc_lo"].to_numpy(zero_copy_only=False)
        hi = b["doc_hi"].to_numpy(zero_copy_only=False)
        keep = lo != hi
        lo, hi = lo[keep], hi[keep]
        a = np.minimum(lo, hi)
        c = np.maximum(lo, hi)
        uniq = np.unique(np.stack([a, c], axis=1), axis=0)
        return pa.table(
            {"a": pa.array(uniq[:, 0], pa.int64()), "b": pa.array(uniq[:, 1], pa.int64())}
        )

    edges = join_safe(
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"], num_partitions=n)
        .aggregate(Count(alias_name="_c"))
    ).select_columns(["a", "b"]).materialize()
    if edges.count() == 0:
        return pd.DataFrame({"node_lo": [], "node_hi": [], "aa_score": []})

    # adjacency as (u, nbr) both directions; deg(u) from the same rows
    def both_dirs(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        c = b["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, c]), pa.int64()),
                "nbr": pa.array(np.concatenate([c, a]), pa.int64()),
            }
        )

    adj = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()

    def wedges(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "u": b["u"].to_numpy(zero_copy_only=False),
                "nbr": b["nbr"].to_numpy(zero_copy_only=False),
            }
        )
        lo_parts, hi_parts, w_parts = [], [], []
        capped = 0
        for _, grp in df.groupby("u", sort=False):
            nbrs = np.unique(grp["nbr"].to_numpy())
            m = len(nbrs)
            if m < 2:
                continue
            if m * (m - 1) // 2 > max_wedges_per_node:
                capped += 1
                m = int((2 * max_wedges_per_node) ** 0.5) + 1
                nbrs = nbrs[:m]
            iu, ju = np.triu_indices(m, 1)
            lo_parts.append(nbrs[iu])
            hi_parts.append(nbrs[ju])
            w_parts.append(np.full(len(iu), 1.0 / np.log(len(np.unique(grp["nbr"])))))
        if capped:
            log.warning(
                "adamic_adar: %d hub node(s) over max_wedges_per_node=%d; wedges sampled",
                capped,
                max_wedges_per_node,
            )
        if not lo_parts:
            return pa.table(
                {
                    "node_lo": pa.array([], pa.int64()),
                    "node_hi": pa.array([], pa.int64()),
                    "w": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "node_lo": pa.array(np.concatenate(lo_parts), pa.int64()),
                "node_hi": pa.array(np.concatenate(hi_parts), pa.int64()),
                "w": pa.array(np.concatenate(w_parts), pa.float64()),
            }
        )

    scores = join_safe(
        adj.repartition(n, keys=["u"])
        .map_batches(wedges, batch_format="pyarrow", batch_size=None)
        .groupby(["node_lo", "node_hi"], num_partitions=n)
        .aggregate(Sum("w", alias_name="aa_score"))
    )
    if scores.count() == 0:
        return pd.DataFrame({"node_lo": [], "node_hi": [], "aa_score": []})

    non_edges = scores.join(
        edges,
        join_type="left_anti",
        num_partitions=n,
        on=("node_lo", "node_hi"),
        right_on=("a", "b"),
    )

    def block_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            ["aa_score", "node_lo", "node_hi"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(top_k)
        return from_pandas_clean(df)

    partials = non_edges.map_batches(
        block_topk, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    return (
        partials.sort_values(
            ["aa_score", "node_lo", "node_hi"],
            ascending=[False, True, True],
            kind="mergesort",
        )
        .head(top_k)
        .reset_index(drop=True)
    )


def _bfs_visited(edges, seeds: np.ndarray, max_hops: int, n: int):
    """Multi-source BFS core shared by k_hop_reach / harmonic
    centrality: DIRECTED (u, v) edge Dataset + seed array → visited
    Dataset (seed, node, hop) with hop = the exact BFS distance.
    Per hop: frontier ⋈ edges hash join on 8-byte keys + ONE
    (seed, node) keyed min-hop fold; no driver-side adjacency."""
    import ray.data
    from ray.data.aggregate import Min

    from import_ray.core.context import join_safe

    visited = ray.data.from_arrow(
        pa.table(
            {
                "seed": pa.array(seeds, pa.int64()),
                "node": pa.array(seeds, pa.int64()),
                "hop": pa.array(np.zeros(len(seeds), np.int64), pa.int64()),
            }
        )
    )
    frontier = visited
    for hop in range(1, int(max_hops) + 1):
        nxt = join_safe(
            frontier.select_columns(["seed", "node"]).join(
                edges,
                join_type="inner",
                num_partitions=n,
                on=("node",),
                right_on=("u",),
            )
        )

        def as_candidate(b: pa.Table, _h=hop) -> pa.Table:
            return pa.table(
                {
                    "seed": b["seed"],
                    "node": b["v"],
                    "hop": pa.array(
                        np.full(b.num_rows, _h, dtype=np.int64), pa.int64()
                    ),
                }
            )

        candidates = nxt.map_batches(as_candidate, batch_format="pyarrow")
        visited = join_safe(
            visited.union(candidates)
            .groupby(["seed", "node"], num_partitions=n)
            .aggregate(Min("hop", alias_name="hop"))
        ).materialize()
        frontier = join_safe(visited.filter(expr=f"hop == {hop}"))
        if frontier.count() == 0:
            break
    return visited


def k_hop_reach(edges_ds, n_seeds: int = 16, max_hops: int = 3, seeds=None):
    """Multi-source k-hop reachability (distributed BFS frontier
    expansion) over an undirected edge set with ``doc_lo``/``doc_hi``
    int64 endpoints: cumulative reachable-node counts per (seed, hop).

    Per hop: frontier ⋈ directed-edge table on the frontier node (hash
    join on 8-byte keys) emits candidate (seed, neighbor) pairs; ONE
    (seed, node) keyed min-hop aggregate folds them into the visited
    set; the next frontier is the rows first reached this hop. Frontier
    and visited stay Datasets throughout — no driver-side adjacency.
    The per-(seed,hop) count table is ≤ n_seeds×(max_hops+1) rows, so
    the final cumulative sum is a driver-side scan of a tiny frame.

    Seeds default to the ``n_seeds`` smallest node ids (deterministic:
    per-block partial mins + driver merge of ≤ n_seeds×#blocks rows).
    """
    import ray.data
    from ray.data.aggregate import Count, Min

    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions

    ensure_hash_shuffle(edges_ds)
    n = npartitions()

    def directed(b: pa.Table) -> pa.Table:
        lo = b["doc_lo"].to_numpy(zero_copy_only=False)
        hi = b["doc_hi"].to_numpy(zero_copy_only=False)
        keep = lo != hi
        lo, hi = lo[keep], hi[keep]
        return pa.table(
            {
                "u": pa.array(np.concatenate([lo, hi]), pa.int64()),
                "v": pa.array(np.concatenate([hi, lo]), pa.int64()),
            }
        )

    edges = edges_ds.map_batches(directed, batch_format="pyarrow").materialize()
    # per-round exchange width sized to the DATA (edges is materialized
    # → count is metadata): every BFS round pays aggregator-pool
    # spin-up ∝ partitions, and full cluster width on a small graph is
    # pure fixed cost (same sizing as propagate_min_labels)
    n = min(n, max(2, int(edges.count() // 1_000_000) + 1))

    if seeds is None:
        def block_min(b: pa.Table) -> pa.Table:
            u = np.unique(b["u"].to_numpy(zero_copy_only=False))
            return pa.table({"u": pa.array(u[: int(n_seeds)], pa.int64())})

        partials = edges.map_batches(block_min, batch_format="pyarrow").to_pandas()
        seeds = np.sort(partials["u"].unique())[: int(n_seeds)]
    seeds = np.asarray(sorted(int(s) for s in seeds), dtype=np.int64)
    visited = _bfs_visited(edges, seeds, int(max_hops), n)

    per_hop = (
        visited.groupby(["seed", "hop"], num_partitions=max(2, n // 4))
        .aggregate(Count(alias_name="n_new"))
        .to_pandas()
    )
    out = []
    for seed, g in per_hop.groupby("seed", sort=True):
        g = g.sort_values("hop")
        full = pd.DataFrame({"hop": range(int(max_hops) + 1)})
        full = full.merge(g[["hop", "n_new"]], on="hop", how="left").fillna(0)
        full["seed"] = seed
        full["n_reached"] = full["n_new"].cumsum().astype(np.int64)
        out.append(full[["seed", "hop", "n_reached"]])
    res = pd.concat(out, ignore_index=True)
    res["seed"] = res["seed"].astype(np.int64)
    res["hop"] = res["hop"].astype(np.int64)
    return res


def harmonic_centrality(
    edges_ds, n_seeds: int = 16, max_hops: int = 6, seeds=None
):
    """Harmonic centrality H(v) = Σ_{u≠v} 1/d(u,v) over an undirected
    edge set (``doc_lo``/``doc_hi`` int64 endpoints), estimated from
    ``n_seeds`` BFS sources (Eppstein–Wang sampling): on an undirected
    graph d(s,v) = d(v,s), so k sources give every node k distance
    samples and Ĥ(v) = (n−1)·mean_{s∈S∖{v}} 1/d(s,v). Passing
    ``seeds`` = all nodes makes the estimate EXACT (the planted oracle
    uses this; the scale factor reduces to 1).

    Scale shape: the BFS core is the shared ``_bfs_visited`` (per hop:
    one 8-byte hash join + one keyed min fold; frontier Datasets, no
    driver adjacency); the centrality fold is ONE (node)-keyed sum of
    1/hop partials, bounded by seeds × nodes rows; unreachable
    (s, v) pairs contribute 0 (the harmonic convention). Distance is
    truncated at ``max_hops`` (contributions beyond add ≤ 1/max_hops
    each — size max_hops to the graph's diameter for exactness).

    Returns pandas (node:int64, harmonic:float64) sorted by node.
    """
    from ray.data.aggregate import Sum

    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions

    ensure_hash_shuffle(edges_ds)
    n = npartitions()

    def directed(b: pa.Table) -> pa.Table:
        lo = b["doc_lo"].to_numpy(zero_copy_only=False)
        hi = b["doc_hi"].to_numpy(zero_copy_only=False)
        keep = lo != hi
        lo, hi = lo[keep], hi[keep]
        return pa.table(
            {
                "u": pa.array(np.concatenate([lo, hi]), pa.int64()),
                "v": pa.array(np.concatenate([hi, lo]), pa.int64()),
            }
        )

    edges = edges_ds.map_batches(directed, batch_format="pyarrow").materialize()
    # exchange width sized to the edge table (see k_hop_reach): per-
    # round fixed costs dominate small graphs at full cluster width
    n = min(n, max(2, int(edges.count() // 1_000_000) + 1))

    # distinct node count: per-block unique partials → one 8-byte keyed
    # exchange → per-partition distinct count (tiny fold rows)
    def uniq_nodes(b: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.array(np.unique(b["u"].to_numpy(zero_copy_only=False)))}
        )

    def count_block(b: pa.Table) -> pa.Table:
        u = np.unique(b["node"].to_numpy(zero_copy_only=False))
        return pa.table({"n": pa.array([len(u)], pa.int64())})

    node_parts = (
        join_safe(edges.map_batches(uniq_nodes, batch_format="pyarrow"))
        .repartition(max(2, n // 4), keys=["node"])
        .map_batches(count_block, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    n_nodes = int(node_parts["n"].sum())

    if seeds is None:
        # deterministic hash-spread sample of the node id space (the
        # smallest-ids default of k_hop_reach would bias the sample)
        def seed_partial(b: pa.Table) -> pa.Table:
            u = np.unique(b["u"].to_numpy(zero_copy_only=False))
            h = u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            order = np.argsort(h)[: int(n_seeds)]
            return pa.table({"u": pa.array(u[order], pa.int64()),
                             "h": pa.array(h[order].view(np.int64), pa.int64())})

        sp = edges.map_batches(seed_partial, batch_format="pyarrow").to_pandas()
        sp = sp.drop_duplicates("u").sort_values("h").head(int(n_seeds))
        seeds = sp["u"].to_numpy(np.int64)
    seeds = np.asarray(sorted(int(s) for s in seeds), dtype=np.int64)
    k = len(seeds)

    visited = _bfs_visited(edges, seeds, int(max_hops), n)

    def inv_partial(b: pa.Table) -> pa.Table:
        hop = b["hop"].to_numpy(zero_copy_only=False)
        pos = hop > 0
        return pa.table(
            {
                "node": b["node"].filter(pa.array(pos)),
                "inv": pa.array(1.0 / hop[pos], pa.float64()),
            }
        )

    sums = (
        join_safe(visited.map_batches(inv_partial, batch_format="pyarrow"))
        .groupby("node", num_partitions=max(2, n // 4))
        .aggregate(Sum("inv", alias_name="inv_sum"))
        .to_pandas()
    )
    in_seed = np.isin(sums["node"].to_numpy(np.int64), seeds)
    denom = np.where(in_seed, max(1, k - 1), k).astype(np.float64)
    scale = (n_nodes - 1) / denom
    out = pd.DataFrame(
        {
            "node": sums["node"].astype(np.int64),
            "harmonic": sums["inv_sum"].to_numpy(np.float64) * scale / 1.0,
        }
    )
    return out.sort_values("node", kind="mergesort").reset_index(drop=True)


def label_propagation(edges_ds, max_rounds: int = 10):
    """Community detection by synchronous label propagation over an
    undirected edge set (``doc_lo``/``doc_hi`` int64 endpoints): each
    round every node adopts its neighbors' most frequent label
    (ties → smallest label), computed distributed:

    one labels ⋈ edges hash join ships (node, neighbor_label) pairs →
    ONE (node, label) keyed count → a node-keyed repartition with a
    block-local argmax scan. Labels start as the node ids, updates are
    fully synchronous, so the result is deterministic for a fixed round
    count. Stops early when no label changes (count compare per round).

    Returns a Dataset (node:int64, label:int64).
    """
    from ray.data.aggregate import Count

    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions

    ensure_hash_shuffle(edges_ds)
    n = npartitions()

    def directed(b: pa.Table) -> pa.Table:
        lo = b["doc_lo"].to_numpy(zero_copy_only=False)
        hi = b["doc_hi"].to_numpy(zero_copy_only=False)
        keep = lo != hi
        lo, hi = lo[keep], hi[keep]
        return pa.table(
            {
                "u": pa.array(np.concatenate([lo, hi]), pa.int64()),
                "v": pa.array(np.concatenate([hi, lo]), pa.int64()),
            }
        )

    edges = edges_ds.map_batches(directed, batch_format="pyarrow").materialize()

    def init_labels(b: pa.Table) -> pa.Table:
        u = np.unique(b["u"].to_numpy(zero_copy_only=False))
        return pa.table(
            {"node": pa.array(u, pa.int64()), "label": pa.array(u, pa.int64())}
        )

    from ray.data.aggregate import Min as _Min

    labels = join_safe(
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node", num_partitions=n)
        .aggregate(_Min("label", alias_name="label"))
    ).materialize()

    def block_argmax(batch: pa.Table) -> pa.Table:
        df = batch.select(["v", "label", "cnt"]).to_pandas()
        df = df.sort_values(
            ["v", "cnt", "label"], ascending=[True, False, True], kind="mergesort"
        ).drop_duplicates("v", keep="first")
        return from_pandas_clean(
            df.rename(columns={"v": "node"})[["node", "label"]]
        )

    for _ in range(int(max_rounds)):
        neigh = join_safe(
            labels.join(
                edges,
                join_type="inner",
                num_partitions=n,
                on=("node",),
                right_on=("u",),
            )
        )
        counted = join_safe(
            neigh.groupby(["v", "label"], num_partitions=n).aggregate(
                Count(alias_name="cnt")
            )
        )
        new_labels = (
            counted.repartition(n, keys=["v"])
            .map_batches(block_argmax, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
        # convergence: count of (node,label) pairs present in BOTH maps
        same = join_safe(
            new_labels.join(
                labels,
                join_type="left_semi",
                num_partitions=n,
                on=("node", "label"),
                right_on=("node", "label"),
            )
        )
        changed = new_labels.count() - same.count()
        labels = join_safe(new_labels)
        if changed == 0:
            break
    return labels


# --- transitive ancestor closure (semi-naive recursive-CTE plan) -------------


def ancestor_closure(edges_ds, max_depth: int = 32):
    """Distributed transitive closure over directed ``(child, parent)``
    int64 edges: one ``(node, ancestor, depth)`` row per ancestor
    reachable by following parent pointers, with MIN path depth on
    DAGs (the SQL ``WITH RECURSIVE`` ancestor query, evaluated
    semi-naively).

    Per round: the newest delta ⋈ edges on ``ancestor == child`` (hash
    join, 8-byte keys) extends every frontier path by one edge; ONE
    ``(node, ancestor)`` keyed min fold dedups against everything seen,
    and the next delta is the rows first discovered this round — so
    each round shuffles only path endpoints (24 B/row), never
    re-expands known pairs, and terminates after diameter rounds (or
    ``max_depth``, the cycle guard). Closure size — not input size —
    bounds the exchange, exactly like the recursive-CTE worktable.
    """
    from ray.data.aggregate import Min

    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions

    ensure_hash_shuffle(edges_ds)
    n = npartitions()

    def base(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pc.cast(b["child"], pa.int64()),
                "ancestor": pc.cast(b["parent"], pa.int64()),
                "depth": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
            }
        )

    # join_safe (not a bare materialize): edges is the RIGHT side of the
    # per-round hash join, and a schema-less empty block there makes
    # acero fail with "No match ... FieldRef.Name" (flaky: depends on
    # upstream block splitting)
    edges = join_safe(
        edges_ds.map_batches(
            lambda b: pa.table(
                {
                    "child": pc.cast(b["child"], pa.int64()),
                    "parent": pc.cast(b["parent"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    closure = edges.map_batches(base, batch_format="pyarrow").materialize()
    delta = closure
    for depth in range(2, int(max_depth) + 1):
        ext = join_safe(
            delta.select_columns(["node", "ancestor"]).join(
                edges,
                join_type="inner",
                num_partitions=n,
                on=("ancestor",),
                right_on=("child",),
            )
        )

        def step(b: pa.Table, _d=depth) -> pa.Table:
            return pa.table(
                {
                    "node": b["node"],
                    "ancestor": b["parent"],
                    "depth": pa.array(np.full(b.num_rows, _d, np.int64), pa.int64()),
                }
            )

        candidates = ext.map_batches(step, batch_format="pyarrow")
        closure = join_safe(
            closure.union(candidates)
            .groupby(["node", "ancestor"], num_partitions=n)
            .aggregate(Min("depth", alias_name="depth"))
        ).materialize()
        delta = join_safe(closure.filter(expr=f"depth == {depth}"))
        if delta.count() == 0:
            break
    return closure


def weighted_sssp(edges_ds, roots, max_rounds: int = 32):
    """Distributed single/multi-source shortest paths over directed
    ``(src, dst, w)`` int64 edges with POSITIVE integer weights:
    min total weight from every node to its nearest root, following
    edges forward (the ``WITH RECURSIVE`` min-distance query, evaluated
    as semi-naive Bellman-Ford).

    ``roots`` is a small broadcastable collection of root node ids
    (shipped in the kernel closure; at larger root sets switch the base
    case to a semi-join). Per round: only the IMPROVED frontier ⋈ edges
    (hash join on 8-byte keys) extends paths, then ONE node-keyed min
    fold. Improvement tracking rides inside the fold: distances are
    packed as ``dist * K + round`` (K > max_rounds), so the min also
    selects the earliest round among equal distances and the new delta
    is exactly the rows whose packed round == this round — no
    before/after join. Terminates after graph-depth rounds on DAGs (or
    ``max_rounds``, the negative-free cycle guard — cycles only revisit
    with larger dist, so folds converge).

    Returns (node, dist). Roots themselves are not emitted (their
    distance is 0 by definition).
    """
    from ray.data.aggregate import Min

    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions

    ensure_hash_shuffle(edges_ds)
    n = npartitions()
    K = int(max_rounds) + 2
    root_arr = np.unique(np.asarray(list(roots), dtype=np.int64))

    # join_safe: same right-side schema-less-empty-block hazard as
    # ancestor_closure above
    edges = join_safe(
        edges_ds.map_batches(
            lambda b: pa.table(
                {
                    "src": pc.cast(b["src"], pa.int64()),
                    "dst": pc.cast(b["dst"], pa.int64()),
                    "w": pc.cast(b["w"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def base(b: pa.Table) -> pa.Table:
        dst = b["dst"].to_numpy(zero_copy_only=False)
        hit = np.isin(dst, root_arr)
        w = b["w"].to_numpy(zero_copy_only=False)[hit]
        return pa.table(
            {
                "node": pa.array(b["src"].to_numpy(zero_copy_only=False)[hit]),
                "packed": pa.array(w * K + 1, pa.int64()),
            }
        )

    dist = join_safe(
        edges.map_batches(base, batch_format="pyarrow")
        .groupby("node", num_partitions=n)
        .aggregate(Min("packed", alias_name="packed"))
    ).materialize()
    delta = dist
    for rnd in range(2, int(max_rounds) + 1):
        ext = join_safe(
            delta.join(
                edges,
                join_type="inner",
                num_partitions=n,
                on=("node",),
                right_on=("dst",),
            )
        )

        def step(b: pa.Table, _r=rnd) -> pa.Table:
            d = b["packed"].to_numpy(zero_copy_only=False) // K
            w = b["w"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": b["src"],
                    "packed": pa.array((d + w) * K + _r, pa.int64()),
                }
            )

        candidates = ext.map_batches(step, batch_format="pyarrow")
        dist = join_safe(
            dist.union(candidates)
            .groupby("node", num_partitions=n)
            .aggregate(Min("packed", alias_name="packed"))
        ).materialize()
        def improved(b: pa.Table, _r=rnd) -> pa.Table:
            packed = b["packed"].to_numpy(zero_copy_only=False)
            return b.filter(pa.array(packed % K == _r))

        delta = join_safe(dist.map_batches(improved, batch_format="pyarrow"))
        if delta.count() == 0:
            break

    def unpack(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": b["node"],
                "dist": pa.array(
                    b["packed"].to_numpy(zero_copy_only=False) // K, pa.int64()
                ),
            }
        )

    return dist.map_batches(unpack, batch_format="pyarrow")


def hits(edges_ds, iterations: int = 10):
    """Distributed HITS (hubs & authorities) over a directed edge
    Dataset (doc_lo=src, doc_hi=dst, int64 node hashes — the
    ``entity_edges`` schema).

    Complements :func:`pagerank`: authorities surface canonical-entity
    candidates (heavily referenced nodes), hubs surface aggregator
    nodes (conversations / index entities that reference many others)
    — both useful for canonicalization priority and spot-check
    sampling in a KG-construction run.

    Scale shape per iteration (identical to the PageRank loop): one
    edges⋈scores hash join on the 8-byte endpoint key + one grouped
    sum for each of the two half-steps; L2 normalization is a scalar
    sum-of-squares aggregate over the node-grain sums (driver sees two
    floats per half-step, nothing else). Parallel edges contribute
    multiply (multigraph semantics), matching the dense parity test.

    Returns a Dataset (node:int64, hub:float64, authority:float64),
    each score vector L2-normalized over the full endpoint-node set.
    """
    from ray.data.aggregate import Count, Sum

    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions

    ensure_hash_shuffle(edges_ds)
    n = npartitions()

    edges = join_safe(edges_ds).materialize()
    if edges.count() == 0:
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "hub": pa.array([], pa.float64()),
                    "authority": pa.array([], pa.float64()),
                }
            )
        )

    def nodes_of(b: pa.Table) -> pa.Table:
        lo = b["doc_lo"].to_numpy(zero_copy_only=False)
        hi = b["doc_hi"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"node": pa.array(np.unique(np.concatenate([lo, hi])), pa.int64())}
        )

    nodes = (
        join_safe(
            edges.map_batches(nodes_of, batch_format="pyarrow")
            .groupby("node", num_partitions=n)
            .aggregate(Count(alias_name="_c"))
        )
        .select_columns(["node"])
        .materialize()
    )

    def _half_step(scores, key_on, group_to):
        """One HITS half-step: propagate ``scores`` across edges from
        ``key_on`` (src|dst) to ``group_to``, L2-normalize, fill 0 for
        nodes with no incident edge on that side."""
        import math

        msgs = edges.join(
            scores,
            join_type="inner",
            num_partitions=n,
            on=(key_on,),
            right_on=("node",),
        ).map_batches(
            lambda b: pa.table({"node": b[group_to], "s": b["score"]}),
            batch_format="pyarrow",
        )
        sums = join_safe(
            msgs.groupby("node", num_partitions=n).aggregate(Sum("s", alias_name="s"))
        ).materialize()
        sq = sums.map_batches(
            lambda b: pa.table(
                {"q": pc.multiply(b["s"], b["s"])}
            ),
            batch_format="pyarrow",
        ).aggregate(Sum("q", alias_name="q"))
        norm = math.sqrt(float(sq["q"] or 0.0))
        inv = 1.0 / norm if norm > 0 else 0.0
        return (
            nodes.join(
                sums,
                join_type="left_outer",
                num_partitions=n,
                on=("node",),
                right_on=("node",),
            )
            .map_batches(
                lambda b, inv=inv: pa.table(
                    {
                        "node": b["node"],
                        "score": pc.multiply(
                            pa.scalar(inv),
                            pc.fill_null(pc.cast(b["s"], pa.float64()), 0.0),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )

    hub = nodes.map_batches(
        lambda b: pa.table(
            {"node": b["node"], "score": pa.array(np.ones(len(b)), pa.float64())}
        ),
        batch_format="pyarrow",
    ).materialize()
    auth = hub
    for _ in range(iterations):
        auth = _half_step(hub, "doc_lo", "doc_hi")
        hub = _half_step(auth, "doc_hi", "doc_lo")

    out = hub.map_batches(
        lambda b: pa.table({"node": b["node"], "hub": b["score"]}),
        batch_format="pyarrow",
    ).join(
        auth.map_batches(
            lambda b: pa.table({"node": b["node"], "authority": b["score"]}),
            batch_format="pyarrow",
        ),
        join_type="inner",
        num_partitions=n,
        on=("node",),
        right_on=("node",),
    )
    return join_safe(out)


def predicate_type_profile(triples_ds, type_predicate: str = "typeOf"):
    """KG schema induction: the (predicate, subject type, object type)
    distribution over entity-link triples — the domain/range profile a
    schema registry would derive from the materialized graph (the
    reference checks per-node domain placement in ``McfChecker``
    Class/Property checks, util/.../McfChecker.java:605-679; at corpus
    scale the aggregate profile IS the induced ontology).

    ONE input scan emits both row kinds into a shared narrow schema —
    type rows (node → its ``typeOf`` value) and fact rows (subject,
    predicate, object for non-type entity links) — then two keyed
    exchanges attach the subject type and the object type (per-block
    pandas merges; multi-typed nodes multiply, exactly like the SQL
    join), and schema-scale per-block partial counts fold on the
    driver. Untyped endpoints profile as 'unknown' (left joins).

    Returns pandas (predicate, subject_type, object_type, n_triples).
    """
    from import_ray.core.arrowutil import from_pandas_clean
    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    n = data_nparts(triples_ds)

    def tagged_rows(batch: pa.Table) -> pa.Table:
        obj = pc.fill_null(batch["object_id"], "")
        is_type = pc.and_(
            pc.equal(batch["predicate"], type_predicate), pc.not_equal(obj, "")
        )
        t = batch.filter(is_type)
        is_fact = pc.and_(
            pc.not_equal(batch["predicate"], type_predicate), pc.not_equal(obj, "")
        )
        f = batch.filter(is_fact)
        nulls_t = pa.nulls(t.num_rows, pa.string())
        nulls_f = pa.nulls(f.num_rows, pa.string())
        return pa.table(
            {
                "k": pa.concat_arrays(
                    [c.combine_chunks() for c in (t["subject_id"], f["subject_id"])]
                ),
                "node_type": pa.concat_arrays(
                    [t["object_id"].combine_chunks(), nulls_f]
                ),
                "predicate": pa.concat_arrays(
                    [nulls_t, f["predicate"].combine_chunks()]
                ),
                "f_object": pa.concat_arrays([nulls_t, f["object_id"].combine_chunks()]),
            }
        )

    def attach_subject_type(batch: pa.Table) -> pa.Table:
        """Per-block merge: fact rows gain subject_type; type rows are
        re-emitted keyed by their node for the object-side exchange."""
        df = batch.to_pandas()
        is_type = df["node_type"].notna()
        types = df.loc[is_type, ["k", "node_type"]]
        facts = df.loc[~is_type, ["k", "predicate", "f_object"]]
        enriched = facts.merge(
            types.rename(columns={"node_type": "subject_type"}), on="k", how="left"
        )
        out = pd.concat(
            [
                pd.DataFrame(
                    {
                        "k": enriched["f_object"],
                        "node_type": None,
                        "predicate": enriched["predicate"],
                        "subject_type": enriched["subject_type"],
                    }
                ),
                pd.DataFrame(
                    {
                        "k": types["k"],
                        "node_type": types["node_type"],
                        "predicate": None,
                        "subject_type": None,
                    }
                ),
            ],
            ignore_index=True,
        )
        for c in out.columns:
            out[c] = out[c].astype(object).where(out[c].notna(), None)
        return from_pandas_clean(out, preserve_index=False)

    def attach_object_type(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        is_type = df["node_type"].notna()
        types = df.loc[is_type, ["k", "node_type"]]
        facts = df.loc[~is_type, ["k", "predicate", "subject_type"]]
        enriched = facts.merge(
            types.rename(columns={"node_type": "object_type"}), on="k", how="left"
        )
        enriched["subject_type"] = enriched["subject_type"].fillna("unknown")
        enriched["object_type"] = enriched["object_type"].fillna("unknown")
        g = (
            enriched.groupby(
                ["predicate", "subject_type", "object_type"], sort=False
            )
            .size()
            .reset_index(name="n_triples")
        )
        g["n_triples"] = g["n_triples"].astype("int64")
        return from_pandas_clean(g, preserve_index=False)

    tagged = triples_ds.map_batches(tagged_rows, batch_format="pyarrow")
    ensure_hash_shuffle(tagged)
    partials = (
        tagged.repartition(n, keys=["k"])
        .map_batches(attach_subject_type, batch_format="pyarrow", batch_size=None)
        .repartition(n, keys=["k"])
        .map_batches(attach_object_type, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    out = (
        partials.groupby(["predicate", "subject_type", "object_type"], sort=True)[
            "n_triples"
        ]
        .sum()
        .reset_index()
    )
    out["n_triples"] = out["n_triples"].astype("int64")
    return out


def two_hop_pattern(triples_ds, left_predicate: str, right_predicate: str):
    """Basic-graph-pattern self-join: count subjects linking each
    (left object, right object) pair via the two predicates —
    ``?s left_predicate ?x . ?s right_predicate ?y`` → (x, y, n). The
    SPARQL-BGP building block over the materialized triple store (the
    reference queries its triples tables exactly this way through SQL;
    simple/stats/db.py tables are the analog surface).

    ONE input scan tags both pattern sides into a shared narrow schema;
    a subject-keyed exchange co-locates the self-join (per-block pandas
    merge), then a pair-keyed exchange folds block-local counts. Output
    stays a Dataset (pair cardinality is data-scale, not schema-scale).
    """
    from import_ray.core.arrowutil import from_pandas_clean
    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    n = data_nparts(triples_ds)

    def tagged(batch: pa.Table) -> pa.Table:
        obj = pc.fill_null(batch["object_id"], "")
        linked = pc.not_equal(obj, "")
        out = []
        for side, pred in ((0, left_predicate), (1, right_predicate)):
            t = batch.filter(
                pc.and_(pc.equal(batch["predicate"], pred), linked)
            )
            out.append(
                pa.table(
                    {
                        "k": t["subject_id"].combine_chunks(),
                        "side": pa.array(
                            np.full(t.num_rows, side, np.int8), pa.int8()
                        ),
                        "obj": t["object_id"].combine_chunks(),
                    }
                )
            )
        return pa.concat_tables(out)

    def block_join(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        left = df[df["side"] == 0][["k", "obj"]].rename(columns={"obj": "left_object"})
        right = df[df["side"] == 1][["k", "obj"]].rename(
            columns={"obj": "right_object"}
        )
        m = left.merge(right, on="k")
        g = (
            m.groupby(["left_object", "right_object"], sort=False)
            .size()
            .reset_index(name="n_pairs")
        )
        g["n_pairs"] = g["n_pairs"].astype("int64")
        return from_pandas_clean(g, preserve_index=False)

    def block_sum(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = (
            df.groupby(["left_object", "right_object"], sort=False)["n_pairs"]
            .sum()
            .reset_index()
        )
        g["n_pairs"] = g["n_pairs"].astype("int64")
        return from_pandas_clean(g, preserve_index=False)

    rows = triples_ds.map_batches(tagged, batch_format="pyarrow")
    ensure_hash_shuffle(rows)
    return (
        rows.repartition(n, keys=["k"])
        .map_batches(block_join, batch_format="pyarrow", batch_size=None)
        .repartition(n, keys=["left_object", "right_object"])
        .map_batches(block_sum, batch_format="pyarrow", batch_size=None)
    )


def shape_violations(triples_ds, shapes, type_predicate: str = "typeOf"):
    """SHACL-style cardinality shape validation over the materialized
    graph: for each shape {type, predicate, min_count, max_count},
    count the subjects of that type whose triple count for the
    predicate falls below min_count (missing) or above max_count
    (excess). The aggregate form of the reference's per-node required-
    property checks (``McfChecker.check`` required-prop errors,
    util/.../McfChecker.java:282-340) — at corpus scale the counts ARE
    the validation report.

    ONE input scan emits type rows and per-block (subject, predicate)
    count partials into a shared schema; ONE subject-keyed exchange
    co-locates them; per-block evaluation emits shape-scale partials
    folded on the driver. max_count=None means unbounded.

    Returns pandas (target_type, predicate, n_missing, n_excess)
    sorted by (target_type, predicate).
    """
    from import_ray.core.arrowutil import from_pandas_clean
    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    shapes = [dict(s) for s in shapes]
    preds = sorted({s["predicate"] for s in shapes})
    types = sorted({s["type"] for s in shapes})
    n = data_nparts(triples_ds)

    def tagged(batch: pa.Table) -> pa.Table:
        is_type = pc.and_(
            pc.equal(batch["predicate"], type_predicate),
            pc.is_in(pc.fill_null(batch["object_id"], ""), value_set=pa.array(types)),
        )
        t = batch.filter(is_type)
        f = batch.filter(pc.is_in(batch["predicate"], value_set=pa.array(preds)))
        fdf = pd.DataFrame(
            {
                "k": f["subject_id"].to_pandas(),
                "predicate": f["predicate"].to_pandas(),
            }
        )
        cnt = (
            fdf.groupby(["k", "predicate"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        out = pd.concat(
            [
                pd.DataFrame(
                    {
                        "k": t["subject_id"].to_pandas(),
                        "node_type": t["object_id"].to_pandas(),
                        "predicate": None,
                        "cnt": 0,
                    }
                ),
                cnt.assign(node_type=None)[["k", "node_type", "predicate", "cnt"]],
            ],
            ignore_index=True,
        )
        out["cnt"] = out["cnt"].astype("int64")
        return from_pandas_clean(out, preserve_index=False)

    def evaluate(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        is_type = df["node_type"].notna()
        tdf = df.loc[is_type, ["k", "node_type"]]
        counts = (
            df.loc[~is_type, ["k", "predicate", "cnt"]]
            .groupby(["k", "predicate"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        rows = []
        for s in shapes:
            subj = tdf.loc[tdf["node_type"] == s["type"], ["k"]]
            c = subj.merge(
                counts[counts["predicate"] == s["predicate"]], on="k", how="left"
            )
            got = c["cnt"].fillna(0)
            n_missing = int((got < s.get("min_count", 0)).sum())
            mx = s.get("max_count")
            n_excess = int((got > mx).sum()) if mx is not None else 0
            rows.append((s["type"], s["predicate"], n_missing, n_excess))
        out = pd.DataFrame(
            rows, columns=["target_type", "predicate", "n_missing", "n_excess"]
        )
        for c in ("n_missing", "n_excess"):
            out[c] = out[c].astype("int64")
        return from_pandas_clean(out, preserve_index=False)

    tagged_ds = triples_ds.map_batches(tagged, batch_format="pyarrow")
    ensure_hash_shuffle(tagged_ds)
    partials = (
        tagged_ds.repartition(n, keys=["k"])
        .map_batches(evaluate, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    out = (
        partials.groupby(["target_type", "predicate"], sort=True)[
            ["n_missing", "n_excess"]
        ]
        .sum()
        .reset_index()
    )
    for c in ("n_missing", "n_excess"):
        out[c] = out[c].astype("int64")
    return out


def _walk_mix(x: np.ndarray) -> np.ndarray:
    """Public-domain splitmix64 finalizer, vectorized — the walk's
    per-(walk, step) neighbor draw."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def random_walks(
    edges_ds,
    walk_length: int = 4,
    walks_per_node: int = 1,
    seed: int = 0,
):
    """DeepWalk-style corpus generation (Perozzi et al., KDD'14) over
    directed string edges ``(src, dst)``: ``walks_per_node``
    fixed-length uniform random walks from every source node, emitted
    as ``(walk_key, step, node)`` rows — the skip-gram training corpus
    for graph embeddings over a KG this engine built.

    The draw is DETERMINISTIC and block-independent: step t of walk w
    picks sorted-neighbor index ``splitmix64(hash64(walk_key) ⊕ mix(t)
    ⊕ seed) mod degree``, so reruns and different parallelism produce
    byte-identical corpora (the property every other sampler in this
    repo pins). Walks stop early at sink nodes.

    Scale shape: ONE keyed exchange builds the ranked adjacency
    (src, dst, rank, deg); each of the L rounds is two hash joins on
    the CONSTANT-size frontier (walks × 1 row) — degree lookup first,
    so picking a neighbor never fans out frontier rows by degree. The
    frontier is materialized per round (semi-naive, like
    ``ancestor_closure``); adjacency is materialized once and
    re-consumed from the object store.
    """
    from import_ray.core.context import (
        data_nparts,
        ensure_hash_shuffle,
        join_safe,
    )

    ensure_hash_shuffle(edges_ds)
    n = data_nparts(edges_ds)
    r = int(walks_per_node)
    length = int(walk_length)

    def edge_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(b["src"], pa.large_string()),
                "dst": pc.cast(b["dst"], pa.large_string()),
            }
        )

    def rank_block(b: pa.Table) -> pa.Table:
        if len(b) == 0 or b.num_columns == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.large_string()),
                    "dst": pa.array([], pa.large_string()),
                    "rank": pa.array([], pa.int64()),
                    "deg": pa.array([], pa.int64()),
                }
            )
        df = (
            b.to_pandas()
            .drop_duplicates()
            .sort_values(["src", "dst"], kind="mergesort")
            .reset_index(drop=True)
        )
        src = df["src"].to_numpy(dtype=object)
        new = np.r_[True, src[1:] != src[:-1]]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(df)))
        rank = np.arange(len(df)) - np.repeat(starts, counts)
        return pa.table(
            {
                "src": pa.array(src, pa.large_string()),
                "dst": pa.array(df["dst"].to_numpy(dtype=object), pa.large_string()),
                "rank": pa.array(rank.astype(np.int64), pa.int64()),
                "deg": pa.array(np.repeat(counts, counts).astype(np.int64), pa.int64()),
            }
        )

    adj = join_safe(
        edges_ds.map_batches(edge_rows, batch_format="pyarrow")
        .repartition(n, keys=["src"])
        .map_batches(rank_block, batch_format="pyarrow", batch_size=None)
    ).materialize()
    deg = adj.filter(expr="rank == 0").select_columns(["src", "deg"]).materialize()

    def start_rows(b: pa.Table) -> pa.Table:
        starts = b["src"].to_pandas().to_numpy(dtype=object)
        # one walk key per (start, walk index)
        s = np.repeat(starts, r)
        w = np.tile(np.arange(r), len(starts)).astype(str)
        k = np.char.add(np.char.add(s.astype(str), "#"), w).astype(object)
        return pa.table(
            {
                "walk_key": pa.array(k, pa.large_string()),
                "node": pa.array(s, pa.large_string()),
            }
        )

    frontier = deg.map_batches(start_rows, batch_format="pyarrow").materialize()

    def out_rows(step):
        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "walk_key": pc.cast(b["walk_key"], pa.large_string()),
                    "step": pa.array(np.full(len(b), step, np.int64), pa.int64()),
                    "node": pc.cast(b["node"], pa.large_string()),
                }
            )

        return f

    corpus = frontier.map_batches(out_rows(0), batch_format="pyarrow")
    for t in range(1, length + 1):
        with_deg = join_safe(
            frontier.join(
                deg,
                join_type="inner",
                num_partitions=n,
                on=("node",),
                right_on=("src",),
            )
        )

        def pick(b: pa.Table, _t=t) -> pa.Table:
            keys = b["walk_key"].to_pandas().to_numpy(dtype=object)
            h = pd.util.hash_array(keys).view(np.uint64)
            d = b["deg"].to_numpy(zero_copy_only=False).astype(np.uint64)
            step_mix = np.uint64((_t * 0xC2B2AE3D27D4EB4F) & 0xFFFFFFFFFFFFFFFF)
            idx = _walk_mix(h ^ step_mix ^ np.uint64(seed)) % np.maximum(
                d, np.uint64(1)
            )
            return pa.table(
                {
                    "walk_key": pc.cast(b["walk_key"], pa.large_string()),
                    "node": pc.cast(b["node"], pa.large_string()),
                    "pick": pa.array(idx.astype(np.int64), pa.int64()),
                }
            )

        picked = with_deg.map_batches(pick, batch_format="pyarrow").materialize()
        if picked.count() == 0:
            # every surviving walk sits on a sink — nothing to extend
            break
        chosen = join_safe(
            picked.join(
                adj,
                join_type="inner",
                num_partitions=n,
                on=("node", "pick"),
                right_on=("src", "rank"),
            )
        )
        frontier = chosen.map_batches(
            lambda b: pa.table(
                {
                    "walk_key": pc.cast(b["walk_key"], pa.large_string()),
                    "node": pc.cast(b["dst"], pa.large_string()),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        corpus = corpus.union(frontier.map_batches(out_rows(t), batch_format="pyarrow"))
        if frontier.count() == 0:
            break
    return corpus


def _label_checksum(labels_ds, col: str = "label") -> int:
    """Exact Σ over int64 labels at any scale (split 32-bit sums folded
    driver-side as Python ints — same trick as neardup's propagation)."""

    def part(b: pa.Table) -> pa.Table:
        arr = b[col].to_numpy(zero_copy_only=False)
        lo = int((arr & np.int64(0xFFFFFFFF)).sum(dtype=np.int64))
        hi = int((arr >> np.int64(32)).sum(dtype=np.int64))
        return pa.table({"lo": pa.array([str(lo)]), "hi": pa.array([str(hi)])})

    parts = labels_ds.map_batches(part, batch_format="pyarrow").to_pandas()
    return sum(int(v) for v in parts["lo"]) + (sum(int(v) for v in parts["hi"]) << 32)


def _directed_min_prop(edges, nodes, max_rounds: int):
    """labels(v) = min id over {v} ∪ ancestors(v) along ``edges``
    (src → dst), by semi-naive min-label rounds to the checksum
    fixpoint. ``edges`` and ``nodes`` must be materialized Datasets."""
    from ray.data.aggregate import Min

    from import_ray.core.context import join_safe, npartitions

    n = npartitions()
    labels = nodes.map_batches(
        lambda b: pa.table({"node": b["node"], "label": b["node"]}),
        batch_format="pyarrow",
    ).materialize()
    prev = _label_checksum(labels)
    for _ in range(max_rounds):
        cand = (
            edges.join(
                labels,
                join_type="inner",
                num_partitions=n,
                on=("src",),
                right_on=("node",),
                right_suffix="_r",
            )
            .select_columns(["dst", "label"])
            .map_batches(
                lambda b: pa.table({"node": b["dst"], "label": b["label"]}),
                batch_format="pyarrow",
            )
        )
        labels = join_safe(
            labels.union(cand)
            .groupby("node", num_partitions=n)
            .aggregate(Min("label", alias_name="label"))
        ).materialize()
        cur = _label_checksum(labels)
        if cur == prev:
            break
        prev = cur
    return labels


def strongly_connected_components(
    edges_ds, max_outer: int = 25, max_prop_rounds: int = 40, max_trim_rounds: int = 8
):
    """Distributed strongly connected components over directed int64
    ``(src, dst)`` edges: one ``(node, scc_id)`` row per edge endpoint,
    ``scc_id`` = the minimum node id of its SCC.

    Algorithm (the label-intersection variant of distributed FW-BW /
    coloring SCC — Fleischer-Hendrickson-Pinar 2000 divide-and-conquer,
    Orzan 2004 coloring): per outer round, (1) TRIM — nodes missing an
    in- or out-edge in the alive subgraph are singleton SCCs and peel
    off (bounded rounds; trimming is a shortcut, never needed for
    correctness); (2) compute F(v) = min over {v}∪ancestors and B(v) =
    min over {v}∪descendants by directed min-label propagation; F and B
    are constant on each SCC, and every SCC with F == B (always
    including the SCC of the globally minimal alive node) FINALIZES
    exactly — mutual reachability through the shared minimum — so each
    round peels ≥1 SCC. All steps are hash joins + grouped mins on
    8-byte keys; raises if ``max_outer`` rounds don't drain the graph
    (no silent caps).
    """
    import ray.data
    from ray.data.aggregate import Min

    from import_ray.core.context import join_safe, npartitions

    n = npartitions()

    def canon(b: pa.Table) -> pa.Table:
        s = pc.cast(b["src"], pa.int64())
        d = pc.cast(b["dst"], pa.int64())
        keep = pc.invert(pc.equal(s, d))
        t = pa.table({"src": s, "dst": d}).filter(pc.fill_null(keep, False))
        return t

    def distinct_col(ds, col):
        return join_safe(
            ds.map_batches(
                lambda b, _c=col: pa.table(
                    {"node": pa.array(np.unique(b[_c].to_numpy(zero_copy_only=False)), pa.int64())}
                ),
                batch_format="pyarrow",
            )
            .groupby("node", num_partitions=n)
            .aggregate(Min("node", alias_name="_m"))
        ).select_columns(["node"])

    def self_scc(nodes_ds):
        return nodes_ds.map_batches(
            lambda b: pa.table({"node": b["node"], "scc_id": b["node"]}),
            batch_format="pyarrow",
        ).materialize()

    edges = join_safe(edges_ds.map_batches(canon, batch_format="pyarrow")).materialize()
    # self-loop-only nodes are their own SCCs but never enter `edges`;
    # emit them up front (minus any that also carry real edges — the
    # final union dedups nothing, so subtract via the alive set below)
    alive = (
        distinct_col(edges, "src").union(distinct_col(edges, "dst"))
        .groupby("node", num_partitions=n)
        .aggregate(Min("node", alias_name="_m"))
        .select_columns(["node"])
    )
    alive = join_safe(alive).materialize()

    def loop_nodes(b: pa.Table) -> pa.Table:
        s = pc.cast(b["src"], pa.int64())
        d = pc.cast(b["dst"], pa.int64())
        t = pa.table({"node": s}).filter(
            pc.fill_null(pc.equal(s, d), False)
        )
        return t

    def keep_null(col):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_null(b[col])).select(["node"])

        return f

    loops_only = join_safe(
        edges_ds.map_batches(loop_nodes, batch_format="pyarrow")
    )
    finalized = []
    if loops_only.count():
        loop_distinct = join_safe(
            loops_only.groupby("node", num_partitions=n).aggregate(
                Min("node", alias_name="_m")
            )
        ).select_columns(["node"])
        only = join_safe(
            loop_distinct.join(
                alive.map_batches(
                    lambda b: pa.table({"node": b["node"], "is_alive": pa.array(np.ones(len(b), bool))}),
                    batch_format="pyarrow",
                ),
                join_type="left_outer",
                num_partitions=n,
                on=("node",),
                right_suffix="_r",
            )
        ).map_batches(keep_null("is_alive"), batch_format="pyarrow")
        if only.count():
            finalized.append(self_scc(only))

    for _ in range(max_outer):
        if alive.count() == 0:
            break
        if edges.count() == 0:
            finalized.append(self_scc(alive))
            alive = None
            break
        # ---- trim: peel nodes without both an in- and an out-edge ----
        for _t in range(max_trim_rounds):
            srcs = distinct_col(edges, "src").materialize()
            dsts = distinct_col(edges, "dst").materialize()
            both = join_safe(
                srcs.join(dsts, join_type="inner", num_partitions=n, on=("node",), right_suffix="_r")
            ).select_columns(["node"]).materialize()
            n_alive, n_both = alive.count(), both.count()
            if n_both == n_alive:
                break
            trimmed = join_safe(
                alive.join(
                    both.map_batches(
                        lambda b: pa.table({"node": b["node"], "is_core": pa.array(np.ones(len(b), bool))}),
                        batch_format="pyarrow",
                    ),
                    join_type="left_outer",
                    num_partitions=n,
                    on=("node",),
                    right_suffix="_r",
                )
            ).map_batches(keep_null("is_core"), batch_format="pyarrow")
            finalized.append(self_scc(trimmed))
            alive = both
            # restrict edges to alive endpoints (two semi-joins)
            mark = join_safe(
                alive.map_batches(
                    lambda b: pa.table({"node": b["node"], "ok": pa.array(np.ones(len(b), bool))}),
                    batch_format="pyarrow",
                )
            )
            edges = join_safe(
                join_safe(
                    edges.join(mark, join_type="inner", num_partitions=n, on=("src",), right_on=("node",), right_suffix="_a")
                )
                .select_columns(["src", "dst"])
                .join(mark, join_type="inner", num_partitions=n, on=("dst",), right_on=("node",), right_suffix="_b")
            ).select_columns(["src", "dst"]).materialize()
            if edges.count() == 0:
                break
        if alive.count() == 0:
            alive = None
            break
        if edges.count() == 0:
            finalized.append(self_scc(alive))
            alive = None
            break
        # ---- F/B labels and finalize F == B ----
        fwd = _directed_min_prop(edges, alive, max_prop_rounds)
        rev_edges = edges.map_batches(
            lambda b: pa.table({"src": b["dst"], "dst": b["src"]}), batch_format="pyarrow"
        ).materialize()
        bwd = _directed_min_prop(rev_edges, alive, max_prop_rounds)
        fb = join_safe(
            fwd.join(bwd, join_type="inner", num_partitions=n, on=("node",), right_suffix="_b")
        ).materialize()
        def split_eq(want_eq: bool):
            def f(b: pa.Table) -> pa.Table:
                eq = pc.equal(b["label"], b["label_b"])
                if not want_eq:
                    eq = pc.invert(eq)
                t = b.filter(pc.fill_null(eq, False))
                if want_eq:
                    return pa.table({"node": t["node"], "scc_id": t["label"]})
                return t.select(["node"])

            return f

        done = join_safe(fb.map_batches(split_eq(True), batch_format="pyarrow"))
        if done.count() == 0:
            raise RuntimeError("SCC peel made no progress (should be impossible)")
        finalized.append(done)
        alive = join_safe(fb.map_batches(split_eq(False), batch_format="pyarrow"))
        if alive.count() == 0:
            alive = None
            break
        mark = join_safe(
            alive.map_batches(
                lambda b: pa.table({"node": b["node"], "ok": pa.array(np.ones(len(b), bool))}),
                batch_format="pyarrow",
            )
        )
        edges = join_safe(
            join_safe(
                edges.join(mark, join_type="inner", num_partitions=n, on=("src",), right_on=("node",), right_suffix="_a")
            )
            .select_columns(["src", "dst"])
            .join(mark, join_type="inner", num_partitions=n, on=("dst",), right_on=("node",), right_suffix="_b")
        ).select_columns(["src", "dst"]).materialize()
    else:
        raise RuntimeError(
            f"strongly_connected_components: graph not drained after {max_outer} rounds"
        )

    if not finalized:
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "scc_id": pa.array([], pa.int64())}
            )
        )
    out = finalized[0]
    for d in finalized[1:]:
        out = out.union(d)
    return out


def dag_levels(edges_ds, max_rounds: int = 64):
    """Longest-path level of every node in a DAG of int64 ``(src,
    dst)`` edges: level(v) = length of the longest directed path ending
    at v (the scheduling depth / critical-path coordinate a KG
    build-plan or dependency graph needs). Semi-naive max propagation —
    per round ONE edges⋈levels hash join + grouped max on 8-byte keys;
    rounds = DAG depth; raises on ``max_rounds`` without convergence
    (a cycle — levels would grow forever; no silent caps).
    """
    from ray.data.aggregate import Max

    from import_ray.core.context import join_safe, npartitions

    n = npartitions()

    def canon(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(b["src"], pa.int64()),
                "dst": pc.cast(b["dst"], pa.int64()),
            }
        )

    edges = join_safe(edges_ds.map_batches(canon, batch_format="pyarrow")).materialize()

    def node_rows(b: pa.Table) -> pa.Table:
        vals = np.unique(
            np.concatenate(
                [
                    b["src"].to_numpy(zero_copy_only=False),
                    b["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table(
            {
                "node": pa.array(vals, pa.int64()),
                "level": pa.array(np.zeros(len(vals), np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Max as _Max

    levels = join_safe(
        edges.map_batches(node_rows, batch_format="pyarrow")
        .groupby("node", num_partitions=n)
        .aggregate(_Max("level", alias_name="level"))
    ).materialize()
    prev = _label_checksum(levels, col="level")
    for _ in range(max_rounds):
        cand = (
            edges.join(
                levels,
                join_type="inner",
                num_partitions=n,
                on=("src",),
                right_on=("node",),
                right_suffix="_r",
            )
            .select_columns(["dst", "level"])
            .map_batches(
                lambda b: pa.table(
                    {
                        "node": b["dst"],
                        "level": pc.add(b["level"], pa.scalar(1, pa.int64())),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        levels = join_safe(
            levels.union(cand)
            .groupby("node", num_partitions=n)
            .aggregate(_Max("level", alias_name="level"))
        ).materialize()
        cur = _label_checksum(levels, col="level")
        if cur == prev:
            return levels
        prev = cur
    raise RuntimeError(
        f"dag_levels: no convergence after {max_rounds} rounds (cycle in input?)"
    )
