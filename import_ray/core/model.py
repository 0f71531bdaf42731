"""Core data model: typed values, node bags, Arrow schemas.

The reference models everything as an ``McfGraph`` proto — a map of
node-id → (property → list of TypedValue) (util/src/main/proto/
Mcf.proto:22-59). Our engine uses:

- in Python kernels (inside ``map_batches``): ``Node`` =
  ``dict[prop, list[(value, ValueType)]]`` — a transient, per-batch
  representation; never materialized across stages.
- between stages / at rest: **exploded Arrow rows** — the triple table
  (``TRIPLE_SCHEMA``) or the node-property table (``NODE_PV_SCHEMA``)
  — so wide operations (groupby/dedup/sort) run on flat columns.
"""

from __future__ import annotations

import enum
from typing import Iterable

import pyarrow as pa

from import_ray.core import vocab


class ValueType(enum.IntEnum):
    """Mirrors Mcf.proto ValueType (util/src/main/proto/Mcf.proto:71-96)."""

    UNKNOWN = 0
    TEXT = 1
    NUMBER = 2
    RESOLVED_REF = 3
    UNRESOLVED_REF = 4
    COMPLEX_VALUE = 5
    TABLE_ENTITY = 6
    TABLE_COLUMN = 7


# A node is a property bag: prop -> list of (value, ValueType).
Node = dict  # dict[str, list[tuple[str, int]]]
# A graph is node_id -> Node.
Graph = dict  # dict[str, Node]


# Triple output table (FIXTURES.md §F5; simple/stats/data.py:68-77,
# simple/stats/db.py:88-95). Exactly one of object_id / object_value is
# non-null per row.
TRIPLE_SCHEMA = pa.schema(
    [
        pa.field("subject_id", pa.string()),
        pa.field("predicate", pa.string()),
        pa.field("object_id", pa.string()),
        pa.field("object_value", pa.large_string()),
        pa.field("provenance", pa.string()),
    ]
)

# Node-property interchange rows (exploded McfGraph).
NODE_PV_SCHEMA = pa.schema(
    [
        pa.field("node_id", pa.string()),
        pa.field("prop", pa.string()),
        pa.field("value", pa.large_string()),
        pa.field("value_type", pa.int8()),
    ]
)

# Transcripts input (BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.large_string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# Observations output (FIXTURES.md §F6; simple/stats/db.py:100-113).
OBSERVATION_SCHEMA = pa.schema(
    [
        pa.field("entity", pa.string()),
        pa.field("variable", pa.string()),
        pa.field("date", pa.string()),
        pa.field("value", pa.string()),
        pa.field("provenance", pa.string()),
        pa.field("unit", pa.string()),
        pa.field("scaling_factor", pa.string()),
        pa.field("measurement_method", pa.string()),
        pa.field("observation_period", pa.string()),
        pa.field("properties", pa.string()),
    ]
)


def strip_namespace(val: str) -> str:
    """Remove dcid:/dcs:/schema: prefix (McfUtil.java:164-171)."""
    if val.startswith(vocab.NAMESPACE_PREFIXES):
        return val[val.index(vocab.REFERENCE_DELIMITER) + 1 :]
    return val


def get_prop_val(node: Node, prop: str) -> str:
    """First value for prop, namespace-stripped; "" if absent (McfUtil.getPropVal)."""
    tvs = node.get(prop)
    if tvs:
        return strip_namespace(tvs[0][0])
    return ""


def get_prop_vals(node: Node, prop: str) -> list[str]:
    return [strip_namespace(v) for v, _ in node.get(prop, [])]


def node_types(node: Node) -> list[str]:
    return get_prop_vals(node, vocab.TYPE_OF)


def merge_nodes(dst: Node, src: Node) -> None:
    """Union PVs with TypedValue set-dedup, preserving first-seen order
    (McfUtil.mergeGraphs, McfUtil.java:108-162)."""
    for prop, tvs in src.items():
        if prop not in dst:
            dst[prop] = list(tvs)
        else:
            seen = set(dst[prop])
            for tv in tvs:
                if tv not in seen:
                    dst[prop].append(tv)
                    seen.add(tv)


def merge_graphs(graphs: Iterable[Graph]) -> Graph:
    out: Graph = {}
    for g in graphs:
        for node_id, node in g.items():
            if node_id not in out:
                out[node_id] = {p: list(tvs) for p, tvs in node.items()}
            else:
                merge_nodes(out[node_id], node)
    return out
