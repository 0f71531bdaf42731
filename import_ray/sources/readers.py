"""Distributed file readers: MCF / JSON-LD files → node-PV row Datasets.

The Beam port splits MCF text into ``Node:`` blocks and parses per
block (pipeline/util/.../PipelineUtils.java:150-171); here each FILE is
the parallel unit (schema/instance MCF files are many and small —
per-file ``flat_map`` tasks), emitting the same node-PV rows the
genmcf pipeline uses (scope = file, so scope-local resolution
composes).
"""

from __future__ import annotations

import pyarrow as pa

from import_ray.core.model import Graph, ValueType
from import_ray.sources.jsonld import parse_jsonld
from import_ray.sources.mcf import parse_mcf_string


def _graph_to_pv_rows(graph: Graph, scope: str) -> pa.Table:
    out = {"scope": [], "node_id": [], "prop": [], "value": [], "value_type": []}
    for node_id, node in graph.items():
        for prop, tvs in node.items():
            for value, vtype in tvs:
                out["scope"].append(scope)
                out["node_id"].append(node_id)
                out["prop"].append(prop)
                out["value"].append(value)
                out["value_type"].append(int(vtype))
    return pa.table(
        {
            "scope": pa.array(out["scope"], pa.string()),
            "node_id": pa.array(out["node_id"], pa.string()),
            "prop": pa.array(out["prop"], pa.string()),
            "value": pa.array(out["value"], pa.large_string()),
            "value_type": pa.array(out["value_type"], pa.int8()),
        }
    )


def read_mcf(paths: list[str] | str):
    """Dataset of node-PV rows from MCF files (one task per file)."""
    import ray.data

    from import_ray.core.context import configure_data_context

    configure_data_context()
    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse(row: dict) -> list[dict]:
        text = row["bytes"].decode("utf-8")
        graph = parse_mcf_string(text, file_name=row["path"]).graph
        return _graph_to_pv_rows(graph, scope=row["path"]).to_pylist()

    return files.flat_map(parse)


def read_jsonld(paths: list[str] | str):
    """Dataset of node-PV rows from JSON-LD files (one task per file)."""
    import ray.data

    from import_ray.core.context import configure_data_context

    configure_data_context()
    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse(row: dict) -> list[dict]:
        graph = parse_jsonld(row["bytes"].decode("utf-8"))
        return _graph_to_pv_rows(graph, scope=row["path"]).to_pylist()

    return files.flat_map(parse)


def write_jsonld(nodes_ds, out_dir: str):
    """JSON-LD shard writer (jsonld_stream_db.py analog): node-PV rows →
    one JSON-LD doc per node, written as sharded JSON files per block."""
    import json

    from import_ray.pipelines.genmcf import nodes_rows_to_graph

    def to_docs(batch: pa.Table) -> pa.Table:
        graph = nodes_rows_to_graph(batch)
        docs = []
        for node_id, node in graph.items():
            doc = {"@id": node_id}
            for prop, tvs in node.items():
                vals = []
                for value, vtype in tvs:
                    if vtype in (ValueType.RESOLVED_REF, ValueType.UNRESOLVED_REF):
                        vals.append({"@id": value})
                    else:
                        vals.append({"@value": value})
                if prop == "typeOf":
                    doc["@type"] = [v.get("@id", v.get("@value")) for v in vals]
                else:
                    doc[prop] = vals
            docs.append(json.dumps(doc, sort_keys=True))
        return pa.table({"jsonld": pa.array(docs, pa.large_string())})

    nodes_ds.map_batches(to_docs, batch_format="pyarrow").write_json(out_dir)
