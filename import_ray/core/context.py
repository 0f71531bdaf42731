"""Engine-wide Ray Data execution configuration.

The engine standardizes on HASH_SHUFFLE for keyed exchanges (groupby /
repartition-by-key / join): hash shuffle streams rows to per-partition
aggregator actors instead of a global sort — the right topology for
groupby-dedup and partial-aggregate merges at 100 TB, and measurably
faster than the default sort shuffle on string keys.

IMPORTANT: with hash shuffle, every keyed op must pass an explicit
``num_partitions`` — the default parallelism spawns more aggregator
actors than a small cluster has CPUs and the job stalls. Use
``npartitions()`` everywhere.
"""

from __future__ import annotations


def configure_data_context() -> None:
    """Idempotent engine defaults for the current DataContext."""
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE


def ensure_hash_shuffle(ds):
    """Datasets snapshot the DataContext at creation; a dataset created
    before ``configure_data_context()`` ran would still sort-shuffle.
    Fix up its captured context in place and return it."""
    from ray.data.context import ShuffleStrategy

    try:
        ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        ds.context.enable_progress_bars = False
    except AttributeError:
        pass
    return ds


def data_nparts(ds) -> int:
    """Shuffle/join partition count sized to the dataset when its size
    is cheaply known (raw reads and materialized inputs expose metadata
    size without executing); falls back to the cluster-sized default.
    Fewer partitions = fewer shuffle aggregator actors — on small
    inputs actor-pool spin-up otherwise dominates wall time, while at
    scale the cap stays 2×CPUs (npartitions_for_bytes)."""
    _BASE = ("Read", "InputData", "FromItems", "FromArrow", "FromPandas")
    try:
        dag = ds._logical_plan.dag
        # walk single-input map lineage down to the base op — row-wise
        # maps/filters/projections roughly preserve data scale, so the
        # base read's metadata size is the right partition-count signal
        # even for derived datasets (planted fixtures, key projections)
        _MAPLIKE = ("MapBatches", "MapRows", "Filter", "Project", "FlatMap", "Limit")
        hops = 0
        while type(dag).__name__ not in _BASE and hops < 16:
            deps = getattr(dag, "input_dependencies", [])
            if len(deps) != 1 or type(dag).__name__ not in _MAPLIKE:
                break
            dag = deps[0]
            hops += 1
        if type(dag).__name__ in _BASE:
            try:
                sz = dag.infer_metadata().size_bytes
            except Exception:
                sz = ds.size_bytes() if hops == 0 else None
            if sz:
                return npartitions_for_bytes(sz)
    except Exception:
        pass
    return npartitions()


def join_safe(ds, n: int | None = None):
    """Drop schema-less empty blocks from an AGGREGATE/map_groups-derived
    dataset before it feeds another keyed op (join / groupby / keyed
    repartition).

    Hash-shuffle partitions with zero rows emit EMPTY blocks with no
    schema; map UDFs are skipped on them, so they flow through
    projections/maps and poison the next keyed exchange — pyarrow
    raises ``No match for FieldRef.Name(...)`` whenever a downstream
    partition sees only such blocks (flaky: depends on key hashing).

    Fix: materialize (aggregates are all-to-all barriers already — the
    aggregator actors hold full partitions regardless) and rebuild the
    dataset from the NON-EMPTY block refs (zero-copy). Falls back to a
    plain repartition if the internal ref-bundle API is unavailable.
    """
    try:
        import ray.data

        mat = ds.materialize()
        refs = []
        for bundle in mat.iter_internal_ref_bundles():
            for block_ref, meta in zip(bundle.block_refs, bundle.metadata):
                if meta.num_rows:
                    refs.append(block_ref)
        if not refs:
            import pyarrow as pa

            schema = mat.schema()
            arrow_schema = getattr(schema, "base_schema", None)
            if arrow_schema is None:
                return mat
            return ray.data.from_arrow(arrow_schema.empty_table())
        return ray.data.from_arrow_refs(refs)
    except Exception:
        return ds.repartition(n or npartitions())


def cluster_cpus() -> int:
    import ray

    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", 8))
    return 8


def npartitions_for_bytes(input_bytes: int, bytes_per_partition: int = 2 << 20) -> int:
    """Data-sized shuffle partition count: ~one partition per 2 MB of
    compressed input (≈50-70 MB of in-flight triple rows), capped at
    2×cluster CPUs so aggregator actors never oversubscribe the node.

    Sizing by DATA (not CPUs) keeps the partition count — and thus the
    per-partition actor overhead — identical across cluster sizes, so
    extra CPUs go to map-stage parallelism instead of extra shuffle
    actors (measured: partitions ∝ CPUs gave 0.2 scaling efficiency;
    data-sized partitions restore linear map scaling)."""
    configure_data_context()
    n = max(1, input_bytes // bytes_per_partition)
    return int(max(4, min(n, 2 * cluster_cpus(), 512)))


def npartitions(scale: float = 1.0, lo: int = 4, hi: int = 64) -> int:
    """Shuffle partition count sized to the cluster: ~1×CPUs by default.

    On a real multi-node cluster ``hi`` should rise with node count —
    partitions bound both aggregator-actor parallelism and the size of
    each output block. Also ensures the engine DataContext defaults
    (hash shuffle) are applied — every keyed op calls this.
    """
    configure_data_context()
    n = int(cluster_cpus() * scale)
    return max(lo, min(hi, n))


# Driver-side collects of SCHEMA-scale datasets (Custom-DC-sized node
# sets, statvar schemas, NL sentence candidates) are bounded by this
# row budget. The contract used to be implicit ("schema-scale by
# contract" comments); the budget makes it explicit and LOUD — a
# million-SV input fails with a clear message instead of silently
# OOMing the driver (mirrors reasoning.py's closure_broadcast_budget
# gate, which degrades to a distributed join instead).
SCHEMA_SCALE_BUDGET = 2_000_000


def take_all_bounded(ds, what: str, budget: int | None = None):
    """``ds.take_all()`` with an explicit schema-scale row budget.

    Executes ONCE with early termination (``limit(budget+1)``) and
    raises ``RuntimeError`` naming the collect site when the dataset
    exceeds the budget — use only for datasets that are schema-scale
    by design; corpus-scale data must stay distributed."""
    if budget is None:
        budget = SCHEMA_SCALE_BUDGET
    rows = ds.limit(budget + 1).take_all()
    if len(rows) > budget:
        raise RuntimeError(
            f"{what}: driver-side collect exceeds the schema-scale row "
            f"budget ({budget:,} rows). This input is not schema-scale; "
            f"the pipeline must use a distributed path for it."
        )
    return rows
