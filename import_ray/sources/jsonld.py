"""JSON-LD → node graph.

Reimplements the reference's JsonLdParser semantics
(util/src/main/java/org/datacommons/util/parser/jsonld/JsonLdParser.java:18-208):

- ``@id`` (required) → node id + auto ``dcid`` PV, with
  ``https://datacommons.org/browser/`` and ``https://schema.org/``
  prefixes stripped (java:24-38);
- keys cleaned to their last ``/``/``#`` segment (java:39-57);
- ``@type`` → ``typeOf`` RESOLVED_REF;
- value items: ``{"@value": v}`` → TEXT, ``{"@id": ref}`` →
  RESOLVED_REF (UNRESOLVED_REF for ``l:``), scalars → TEXT.

Deviation (documented): the reference runs full W3C JSON-LD 1.1
expansion first (jsonld-java); no such library exists here, so this
parser accepts documents already in expanded form, plus the common
compacted shapes (top-level list, single node map, or ``@graph``).
"""

from __future__ import annotations

import json

from import_ray.core.model import Graph, Node, ValueType

_DCID_PREFIX = "https://datacommons.org/browser/"
_SCHEMA_PREFIX = "https://schema.org/"


def _strip_prefix(value: str) -> str:
    if value.startswith(_DCID_PREFIX):
        return value[len(_DCID_PREFIX) :]
    if value.startswith(_SCHEMA_PREFIX):
        return value[len(_SCHEMA_PREFIX) :]
    return value


def _clean_key(key: str) -> str:
    while key.endswith("/") or key.endswith("#"):
        if len(key) <= 1:
            return ""
        key = key[:-1]
    if "/" in key:
        key = key.rsplit("/", 1)[1]
    if "#" in key:
        key = key.rsplit("#", 1)[1]
    return key


def _add(node: Node, prop: str, value: str, vtype: int) -> None:
    node.setdefault(prop, []).append((value, vtype))


def _process_value_item(node: Node, prop: str, item) -> None:
    if isinstance(item, dict):
        if "@value" in item:
            _add(node, prop, str(item["@value"]), ValueType.TEXT)
        elif "@id" in item:
            ref = _strip_prefix(str(item["@id"]))
            vtype = (
                ValueType.UNRESOLVED_REF if ref.startswith("l:") else ValueType.RESOLVED_REF
            )
            _add(node, prop, ref, vtype)
            for k, v in item.items():
                if k == "@id":
                    continue
                ck = _clean_key(k)
                if ck == "observationProperties":
                    for inner in v if isinstance(v, list) else [v]:
                        _process_value_item(node, ck, inner)
        # unsupported object → ignored (java:186-188)
    elif item is not None:
        _add(node, prop, str(item), ValueType.TEXT)


def _parse_node(node_map: dict, graph: Graph) -> None:
    node_id = node_map.get("@id")
    if node_id is None:
        return
    node_id = _strip_prefix(str(node_id))
    node: Node = {}
    _add(node, "dcid", node_id, ValueType.TEXT)
    for key, value in node_map.items():
        ck = _clean_key(key) if key not in ("@id", "@type") else key
        if not ck or ck == "@id":
            continue
        if ck == "@type":
            for t in value if isinstance(value, list) else [value]:
                if t is not None:
                    _add(node, "typeOf", _strip_prefix(str(t)), ValueType.RESOLVED_REF)
            continue
        for item in value if isinstance(value, list) else [value]:
            _process_value_item(node, ck, item)
    graph[node_id] = node


def _expand_with_context(obj, context: dict):
    """Minimal JSON-LD context expansion — the common subset of W3C
    expansion the reference gets from jsonld-java: term → IRI mappings,
    term definitions ``{"@id": iri, "@type": "@id"}`` (string values of
    ref-typed terms become ``{"@id": ...}``), ``@vocab``, and prefix
    compaction (``schema:name``). Not a full 1.1 processor (documented
    deviation: no @reverse/@container/@language/nested contexts)."""
    vocab = context.get("@vocab", "")
    prefixes = {
        k: v
        for k, v in context.items()
        if isinstance(v, str) and not k.startswith("@") and v.endswith(("/", "#"))
    }

    def expand_iri(term: str) -> str:
        if term.startswith("@"):
            return term
        if term in context:
            d = context[term]
            if isinstance(d, str):
                return d
            if isinstance(d, dict) and "@id" in d:
                return str(d["@id"])
        if ":" in term:
            prefix, rest = term.split(":", 1)
            if prefix in prefixes:
                return prefixes[prefix] + rest
        if vocab:
            return vocab + term
        return term

    def is_ref_term(term: str) -> bool:
        d = context.get(term)
        return isinstance(d, dict) and d.get("@type") == "@id"

    def expand_node(node: dict) -> dict:
        out = {}
        for k, v in node.items():
            if k == "@context":
                continue
            nk = expand_iri(k) if not k.startswith("@") else k
            if k == "@type":
                items = v if isinstance(v, list) else [v]
                v = [expand_iri(str(t)) if t is not None else t for t in items]
            elif is_ref_term(k):
                items = v if isinstance(v, list) else [v]
                v = [
                    {"@id": expand_iri(it)}
                    if isinstance(it, str)
                    else (
                        {**it, "@id": expand_iri(str(it["@id"]))}
                        if isinstance(it, dict) and "@id" in it
                        else it
                    )
                    for it in items
                ]
            out[nk] = v
        return out

    if isinstance(obj, list):
        return [expand_node(n) if isinstance(n, dict) else n for n in obj]
    if isinstance(obj, dict):
        return expand_node(obj)
    return obj


def parse_jsonld(text_or_obj) -> Graph:
    obj = json.loads(text_or_obj) if isinstance(text_or_obj, str) else text_or_obj
    context = {}
    if isinstance(obj, dict):
        ctx = obj.get("@context")
        if isinstance(ctx, dict):
            context = ctx
        if "@graph" in obj:
            obj = obj["@graph"]
    if context:
        obj = _expand_with_context(obj, context)
    graph: Graph = {}
    if isinstance(obj, list):
        for entry in obj:
            if isinstance(entry, dict):
                _parse_node(entry, graph)
    elif isinstance(obj, dict):
        _parse_node(obj, graph)
    return graph
