"""Graph materialization: node property-bags → (s, p, o) triple rows.

Three reference-equivalent flavors:

- ``graph_to_triples``: the Python Triple emitter shape
  (simple/stats/data.py:68-77 — exactly one of object_id/object_value
  per row; subject = node dcid, namespace-stripped).
- ``mcf_to_triples``: the simple importer's 4-tuple generator
  (simple/kg_util/mcf_parser.py:169-240): ``[subject, property,
  object, 'ID'|'VALUE']`` including the auto-emitted dcid triple for
  ``dcid:``-named nodes.
- ``object_value_key``: the Beam Edge object key for literal values —
  ``first-16-chars + ":" + base64(sha256(value))``
  (PipelineUtils.generateObjectValueKey java:450-455, Encode.java:15-22).

Ray op: ``explode_nodes`` is a per-batch kernel over node-PV rows
(genmcf output) → TRIPLE_SCHEMA rows.
"""

from __future__ import annotations

import base64
import hashlib

import pyarrow as pa

from import_ray.core import vocab
from import_ray.core.model import Graph, ValueType, strip_namespace
from import_ray.pipelines.genmcf import nodes_rows_to_graph
from import_ray.sources.mcf import parse_mcf_string


def object_value_key(value: str) -> str:
    v = value.strip()
    if not v:
        return ":"
    h = base64.b64encode(hashlib.sha256(v.encode("utf-8")).digest()).decode("ascii")
    return v[:16] + ":" + h


_REF_TYPES = (ValueType.RESOLVED_REF, ValueType.UNRESOLVED_REF)


def graph_to_triples(
    graph: Graph, provenance: str = "", skip_props: tuple = ("keyString",)
) -> list[tuple]:
    """Graph → [(subject_id, predicate, object_id, object_value, provenance)].

    Subject = the node's dcid when present, else its (namespace-stripped)
    node id; the ``dcid`` property itself is not re-emitted.
    """
    rows = []
    for node_id, node in graph.items():
        dcid_tvs = node.get(vocab.DCID)
        subject = strip_namespace(dcid_tvs[0][0] if dcid_tvs else node_id)
        for prop, tvs in node.items():
            if prop == vocab.DCID or prop in skip_props:
                continue
            for value, vtype in tvs:
                if vtype in _REF_TYPES:
                    rows.append((subject, prop, strip_namespace(value), None, provenance))
                else:
                    rows.append((subject, prop, None, value, provenance))
    return rows


def triples_to_table(rows: list[tuple]) -> pa.Table:
    return pa.table(
        {
            "subject_id": pa.array([r[0] for r in rows], pa.string()),
            "predicate": pa.array([r[1] for r in rows], pa.string()),
            "object_id": pa.array([r[2] for r in rows], pa.string()),
            "object_value": pa.array([r[3] for r in rows], pa.large_string()),
            "provenance": pa.array([r[4] for r in rows], pa.string()),
        }
    )


def explode_nodes(batch: pa.Table, provenance: str = "") -> pa.Table:
    """map_batches kernel: node-PV rows (genmcf output) → triple rows.
    Failed nodes are excluded."""
    graph = nodes_rows_to_graph(batch, include_failed=False)
    return triples_to_table(graph_to_triples(graph, provenance))


def mcf_to_triples(mcf_text: str) -> list[list]:
    """MCF text → 4-tuples ``[subject, property, object, 'ID'|'VALUE']``
    (mcf_parser.mcf_to_triples semantics, including auto-dcid for
    global-ref node names)."""
    res = parse_mcf_string(mcf_text)
    out = []
    for node_id, node in res.graph.items():
        # the parser already synthesizes the dcid PV for dcid:-named
        # nodes (mcf_parser.py:211-214 auto-dcid semantics)
        for prop, tvs in node.items():
            for value, vtype in tvs:
                if vtype in _REF_TYPES:
                    out.append([node_id, prop, strip_namespace(value), "ID"])
                else:
                    out.append([node_id, prop, value, "VALUE"])
    return out


def compress_value(value: str) -> bytes:
    """Gzip string compression for oversized literal values (geoJson
    etc.) — PipelineUtils.compressString semantics (java:463-474)."""
    import gzip

    return gzip.compress(value.encode("utf-8"))


def decompress_value(data: bytes) -> str:
    import gzip

    return gzip.decompress(data).decode("utf-8")
