"""StatVar dcid-collision detection — the reference's StatVarState
bimaps (util/src/main/java/org/datacommons/util/StatVarState.java:
27-28,137-188) re-expressed as dataset-level two-sided groupbys
(SURVEY §2.5: the shared mutable bimap becomes two grouped-uniqueness
checks — exactly how global mutable state maps onto dataflow):

- same curated dcid ↔ multiple generated (content) dcids →
  ``Sanity_SameDcidForDifferentStatVars``;
- same generated dcid ↔ multiple curated dcids →
  ``Sanity_DifferentDcidsForSameStatVar``.
"""

from __future__ import annotations

from import_ray.core import vocab
from import_ray.core.model import Graph, get_prop_val, node_types
from import_ray.functions.dcid import for_stat_var
from import_ray.state.counters import LEVEL_ERROR, CounterSet


def statvar_id_pairs(graph: Graph) -> list[tuple[str, str]]:
    """(curated_dcid, generated_dcid) per StatVar node with both ids."""
    pairs = []
    for node_id, node in graph.items():
        if vocab.STAT_VAR_TYPE not in node_types(node):
            continue
        curated = get_prop_val(node, vocab.DCID)
        if not curated:
            continue
        vals = {p: tvs[0][0] for p, tvs in node.items() if tvs}
        generated, _ = for_stat_var(vals)
        if generated:
            pairs.append((curated, generated))
    return pairs


def check_statvar_collisions(pairs, counters: CounterSet | None = None) -> CounterSet:
    """Driver/group-side two-sided uniqueness over (curated, generated)
    pairs. For the distributed path, feed this the output of
    ``groupby(curated)`` and ``groupby(generated)`` merges — counts are
    per extra distinct partner (deterministic, unlike the reference's
    first-seen order)."""
    counters = counters if counters is not None else CounterSet()
    by_curated: dict[str, set] = {}
    by_generated: dict[str, set] = {}
    for curated, generated in pairs:
        by_curated.setdefault(curated, set()).add(generated)
        by_generated.setdefault(generated, set()).add(curated)
    for curated, gens in by_curated.items():
        if len(gens) > 1:
            counters.add(
                LEVEL_ERROR,
                "Sanity_SameDcidForDifferentStatVars",
                f"Found same curated ID for different StatVars :: "
                f"curatedDcid: '{curated}'",
                n=len(gens) - 1,
            )
    for generated, cures in by_generated.items():
        if len(cures) > 1:
            counters.add(
                LEVEL_ERROR,
                "Sanity_DifferentDcidsForSameStatVar",
                f"Found different curated IDs for same StatVar :: "
                f"dcids: {sorted(cures)}",
                n=len(cures) - 1,
            )
    return counters


def check_statvar_collisions_ds(pairs_ds) -> CounterSet:
    """Distributed: hash-partition by each side, count distinct partners
    per key, reduce the (tiny) >1 groups to counters."""
    from ray.data.aggregate import Count

    from import_ray.core.context import ensure_hash_shuffle, npartitions

    import pyarrow as pa
    import pyarrow.compute as pc

    ensure_hash_shuffle(pairs_ds)
    counters = CounterSet()
    n = npartitions()
    distinct_pairs = (
        pairs_ds.groupby(["curated", "generated"], num_partitions=n)
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
        .materialize()
    )
    from ray.data.aggregate import Sum

    from import_ray.state.counters import MAX_MESSAGES_PER_COUNTER

    for key, counter in (
        ("curated", "Sanity_SameDcidForDifferentStatVars"),
        ("generated", "Sanity_DifferentDcidsForSameStatVar"),
    ):
        grouped = distinct_pairs.groupby(key, num_partitions=n).aggregate(
            Count(alias_name="n_partners")
        )
        bad = grouped.map_batches(
            lambda b: b.filter(pc.greater(b["n_partners"], 1)),
            batch_format="pyarrow",
        ).materialize()
        # driver rows are bounded by the exemplar cap, never by the
        # number of colliding StatVars (adversarial input: EVERY SV
        # collides → the old take_all() was O(N) on the driver); the
        # remainder is folded in as a count-only aggregate
        ex_rows = bad.limit(MAX_MESSAGES_PER_COUNTER).take_all()
        for r in ex_rows:
            counters.add(LEVEL_ERROR, counter, f"key: '{r[key]}'", n=r["n_partners"] - 1)
        n_bad = bad.count()
        if n_bad > len(ex_rows):
            total = bad.aggregate(Sum("n_partners", alias_name="s"))["s"] or 0
            ex_sum = sum(r["n_partners"] for r in ex_rows)
            remainder = (int(total) - n_bad) - (ex_sum - len(ex_rows))
            if remainder > 0:
                counters.add(LEVEL_ERROR, counter, "", n=remainder)
    return counters
