"""KG reasoning stages: RDFS subclass type inference and owl:sameAs
canonicalization.

The reference walks ``subClassOf`` parents during schema checks
(util/src/main/java/org/datacommons/util/McfChecker.java checks parent
Class/Property existence; simple/stats/stat_var_hierarchy_generator.py
builds specializationOf chains) but never materializes the inferred
type set or merges identity clusters.  These are the two standard
KG-construction post-passes:

* **rdfs9**: ``(x typeOf c) ∧ (c subClassOf+ d) ⇒ (x typeOf d)`` —
  materialize every inferred type so downstream type filters are a
  single equality predicate instead of a recursive walk.
* **owl:sameAs canonicalization**: connected components over the
  sameAs graph pick one representative (min id) per identity cluster
  and every fact is rewritten onto the representative, collapsing
  duplicate facts asserted about aliased ids.

Scale shape: the class hierarchy is schema-scale (thousands of
classes, never billions), so its transitive closure is computed
distributed (``ancestor_closure`` — semi-naive, shuffles only 24 B/row
path endpoints) but *applied* via a driver-free broadcast CSR table
(one ``ray.put``, read node-locally by every map task).  The instance
side — the typeOf facts — streams through ``map_batches`` and is never
materialized on the driver.  The sameAs rewrite is two distributed
hash joins on 8-byte keys (identity clusters at corpus scale are NOT
schema-scale — alias maps grow with the corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _distinct_pairs(ds, cols: list[str]):
    """Global distinct over small fixed-width key columns: per-batch
    local distinct (Beam bundle-cache trick) → ONE keyed exchange →
    block-local distinct.  Only the named columns travel."""
    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    ensure_hash_shuffle(ds)

    def local(b: pa.Table) -> pa.Table:
        df = b.select(cols).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )

    out = ensure_hash_shuffle(ds.map_batches(local, batch_format="pyarrow"))
    out = out.repartition(data_nparts(out), keys=cols)
    return out.map_batches(local, batch_format="pyarrow", batch_size=None)


def subclass_closure(subclass_ds, max_depth: int = 32, driver_budget: int = 100_000):
    """Strict transitive closure of ``(child, parent)`` int64 subclass
    edges — ``(node, ancestor, depth)`` with MIN path depth.

    An ontology is schema-scale by definition, so up to
    ``driver_budget`` edges the closure is computed driver-side (BFS
    over a pandas adjacency, exact same output contract) — the
    semi-naive distributed plan (graph.ancestor_closure) pays ~one
    keyed exchange PER DEPTH LEVEL in fixed costs, which dwarfs the
    work on a few thousand schema edges. Past the budget it falls
    back to the distributed plan; both paths are byte-equal
    (pytest-gated)."""
    from import_ray.stages.graph import ancestor_closure

    # materialize once: count() + to_pandas() below would otherwise
    # execute the upstream pipeline twice per invocation
    subclass_ds = subclass_ds.materialize()
    if subclass_ds.count() > driver_budget:
        return ancestor_closure(subclass_ds, max_depth=max_depth)

    import ray.data

    df = subclass_ds.to_pandas()
    child = df["child"].to_numpy(np.int64)
    parent = df["parent"].to_numpy(np.int64)
    adj: dict[int, list[int]] = {}
    for c, p in zip(child.tolist(), parent.tolist()):
        adj.setdefault(c, []).append(p)
    depth_of: dict[tuple[int, int], int] = {}
    frontier = {(c, p) for c, p in zip(child.tolist(), parent.tolist())}
    for d in range(1, int(max_depth) + 1):
        nxt = set()
        for node, anc in frontier:
            key = (node, anc)
            if key in depth_of:
                continue
            depth_of[key] = d
            for p in adj.get(anc, ()):
                if (node, p) not in depth_of:
                    nxt.add((node, p))
        if not nxt:
            break
        frontier = nxt
    if depth_of:
        items = sorted(depth_of.items())
        nodes = np.fromiter((k[0] for k, _ in items), np.int64, len(items))
        ancs = np.fromiter((k[1] for k, _ in items), np.int64, len(items))
        ds = np.fromiter((v for _, v in items), np.int64, len(items))
    else:
        nodes = ancs = ds = np.zeros(0, np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "ancestor": pa.array(ancs, pa.int64()),
                "depth": pa.array(ds, pa.int64()),
            }
        )
    )


class _ClosureExpand:
    """Actor-pool stage: broadcast CSR closure table fetched once per
    actor (node-local object-store read), per-batch vectorized
    expansion of (entity, cls) rows to every strict ancestor class."""

    def __init__(self, refs):
        import ray

        nodes_ref, offsets_ref, flat_ref = refs
        self.nodes = ray.get(nodes_ref)
        self.offsets = ray.get(offsets_ref)
        self.flat = ray.get(flat_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ent = batch["entity"].to_numpy(zero_copy_only=False).astype(np.int64)
        cls = batch["cls"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(self.nodes) == 0:
            out_ent, out_cls = ent, cls
        else:
            idx = np.clip(np.searchsorted(self.nodes, cls), 0, len(self.nodes) - 1)
            hit = self.nodes[idx] == cls
            lo = np.where(hit, self.offsets[idx], 0)
            hi = np.where(hit, self.offsets[idx + 1], 0)
            counts = hi - lo
            rep_ent = np.repeat(ent, counts)
            # gather flat[lo_i : hi_i] for every row, fully vectorized
            starts = np.repeat(lo, counts)
            within = np.arange(counts.sum(), dtype=np.int64) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            rep_cls = self.flat[starts + within]
            out_ent = np.concatenate([ent, rep_ent])
            out_cls = np.concatenate([cls, rep_cls])
        # in-batch distinct before the keyed exchange
        order = np.lexsort((out_cls, out_ent))
        se, sc = out_ent[order], out_cls[order]
        keep = np.ones(len(se), bool)
        keep[1:] = (se[1:] != se[:-1]) | (sc[1:] != sc[:-1])
        return pa.table(
            {
                "entity": pa.array(se[keep], pa.int64()),
                "cls": pa.array(sc[keep], pa.int64()),
            }
        )


def infer_types(
    typeof_ds,
    subclass_ds,
    max_depth: int = 32,
    strategy: str = "broadcast",
    closure_broadcast_budget: int = 2_000_000,
):
    """Materialized RDFS type inference (rdfs9): distinct
    ``(entity, cls)`` rows covering the asserted type and every strict
    ``subClassOf`` ancestor.

    ``typeof_ds``: (entity int64, cls int64) asserted types.
    ``subclass_ds``: (child int64, parent int64) schema edges.

    ``strategy="broadcast"`` (default — the hierarchy is schema-scale):
    the closure is collapsed to a CSR table, ``ray.put`` ONCE, fetched
    node-locally per actor, and applied as a vectorized per-batch
    expansion; the fact stream never leaves ``map_batches``.
    ``strategy="join"``: distributed hash join facts⋈closure on the
    8-byte class key — the fallback when the ontology itself is huge.
    ``strategy="broadcast"`` auto-degrades to ``"join"`` when the
    closure exceeds ``closure_broadcast_budget`` rows (mirroring
    sameas_canonicalize's label_broadcast_budget gate) so a huge
    ontology can never drive a driver-side to_pandas OOM.
    Both paths end in the same keyed-exchange distinct and are
    byte-identical (pytest-gated)."""
    import ray

    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions

    ensure_hash_shuffle(typeof_ds)
    closure = subclass_closure(subclass_ds, max_depth=max_depth).materialize()
    if strategy == "broadcast" and closure.count() > closure_broadcast_budget:
        strategy = "join"
    if strategy == "broadcast":
        cl = closure.select_columns(["node", "ancestor"]).to_pandas()
        cl = cl.sort_values(["node", "ancestor"]).reset_index(drop=True)
        nodes, starts = np.unique(cl["node"].to_numpy(np.int64), return_index=True)
        offsets = np.empty(len(nodes) + 1, np.int64)
        offsets[:-1] = starts
        offsets[-1] = len(cl)
        flat = cl["ancestor"].to_numpy(np.int64)
        refs = (ray.put(nodes), ray.put(offsets), ray.put(flat))
        expanded = typeof_ds.map_batches(
            _ClosureExpand,
            fn_constructor_args=(refs,),
            batch_format="pyarrow",
            concurrency=(1, npartitions()),
            batch_size=65536,
        )
    elif strategy == "join":
        n = npartitions()
        inferred = join_safe(
            typeof_ds.join(
                join_safe(closure.select_columns(["node", "ancestor"])),
                join_type="inner",
                num_partitions=n,
                on=("cls",),
                right_on=("node",),
            )
        ).map_batches(
            lambda b: pa.table({"entity": b["entity"], "cls": b["ancestor"]}),
            batch_format="pyarrow",
        )
        expanded = typeof_ds.select_columns(["entity", "cls"]).union(inferred)
    else:  # pragma: no cover - guarded by callers
        raise ValueError(f"unknown strategy {strategy!r}")
    return _distinct_pairs(expanded, ["entity", "cls"])


class _CanonRewrite:
    """Actor-pool stage: sorted (node → label) map fetched node-locally
    once per actor; per batch one searchsorted gather rewrites subject
    AND object — replaces two distributed left joins when the label map
    fits the broadcast budget."""

    def __init__(self, refs):
        import ray

        keys_ref, vals_ref = refs
        self.keys = ray.get(keys_ref)
        self.vals = ray.get(vals_ref)

    def _canon(self, x: np.ndarray) -> np.ndarray:
        if len(self.keys) == 0:
            return x
        idx = np.clip(np.searchsorted(self.keys, x), 0, len(self.keys) - 1)
        hit = self.keys[idx] == x
        return np.where(hit, self.vals[idx], x)

    def __call__(self, b: pa.Table) -> pa.Table:
        s = b["subject"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = b["object"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "subject": pa.array(self._canon(s), pa.int64()),
                "predicate": b["predicate"],
                "object": pa.array(self._canon(o), pa.int64()),
            }
        )


def sameas_canonicalize(
    facts_ds, sameas_ds, max_rounds: int = 25, label_broadcast_budget: int = 2_000_000
):
    """owl:sameAs canonicalization: connected components over the
    sameAs graph (min-label propagation, ``graph.connected_components``)
    then every fact's subject AND object are rewritten to the cluster
    representative (the minimum node id); the merged fact set is the
    global distinct of the rewrite.

    ``facts_ds``: (subject int64, predicate string, object int64).
    ``sameas_ds``: (doc_lo int64, doc_hi int64) identity edges.

    Scale shape: the label map grows with the corpus (NOT schema-scale
    in general), so past ``label_broadcast_budget`` rows the rewrite is
    two distributed LEFT hash joins on 8-byte keys — subjects, then
    objects — with unaliased ids kept as-is; under the budget the map
    broadcasts ONCE (``ray.put``, node-local fetch per actor) and one
    actor-pool map rewrites both columns with zero exchanges. Both
    paths are byte-equal (pytest-gated); the final keyed distinct is
    shared."""
    import ray

    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions
    from import_ray.stages.graph import connected_components

    ensure_hash_shuffle(facts_ds)
    ensure_hash_shuffle(sameas_ds)
    n = npartitions()
    labels = join_safe(connected_components(sameas_ds, max_rounds=max_rounds)).materialize()

    def rewrite(col_out: str):
        def fn(b: pa.Table) -> pa.Table:
            canon = pc.coalesce(b["label"], b[col_out])
            cols = {c: b[c] for c in b.column_names if c not in ("label",)}
            cols[col_out] = pc.cast(canon, pa.int64())
            return pa.table(cols)

        return fn

    facts = facts_ds.map_batches(
        lambda b: pa.table(
            {
                "subject": pc.cast(b["subject"], pa.int64()),
                "predicate": b["predicate"],
                "object": pc.cast(b["object"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    if labels.count() <= label_broadcast_budget:
        lab = labels.to_pandas()
        order = np.argsort(lab["node"].to_numpy(np.int64))
        keys = lab["node"].to_numpy(np.int64)[order]
        vals = lab["label"].to_numpy(np.int64)[order]
        refs = (ray.put(keys), ray.put(vals))
        out = facts.map_batches(
            _CanonRewrite,
            fn_constructor_args=(refs,),
            batch_format="pyarrow",
            concurrency=(1, n),
        )
        return _distinct_pairs(out, ["subject", "predicate", "object"])
    out = join_safe(
        facts.join(
            labels,
            join_type="left_outer",
            num_partitions=n,
            on=("subject",),
            right_on=("node",),
        )
    ).map_batches(rewrite("subject"), batch_format="pyarrow")
    out = out.map_batches(
        lambda b: b.select(["subject", "predicate", "object"]), batch_format="pyarrow"
    )
    out = join_safe(
        out.join(
            labels,
            join_type="left_outer",
            num_partitions=n,
            on=("object",),
            right_on=("node",),
        )
    ).map_batches(rewrite("object"), batch_format="pyarrow")
    out = out.map_batches(
        lambda b: b.select(["subject", "predicate", "object"]), batch_format="pyarrow"
    )
    return _distinct_pairs(out, ["subject", "predicate", "object"])
