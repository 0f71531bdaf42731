"""Node mutation stage — the reference's McfMutator semantics
(util/src/main/java/org/datacommons/util/McfMutator.java:35-163):

1. Legacy-Observation stat values: strip " ", ",", "%" so they convert
   to doubles (prepForDoubleConversion, java:161-163); error if the
   value is not NUMBER/TEXT.
2. COMPLEX_VALUE → synthesize the Quantity/QuantityRange/GeoCoordinates
   node and replace the value with a RESOLVED_REF to its dcid.
3. StatVar: synthesize ``constraintProperties`` (sorted non-well-known
   props), ``definition`` (``md=..,mq=..,st=..,mp=..,pt=..`` + sorted
   constraints, McfUtil.generateSVDefinition java:229-271), and a
   generated ``name`` when absent.

Runs as a stateless per-node kernel inside ``map_batches``; emits extra
synthesized nodes (complex values) alongside the input node.
"""

from __future__ import annotations

from import_ray.core import vocab
from import_ray.core.model import (
    Graph,
    Node,
    ValueType,
    get_prop_val,
    node_types,
)
from import_ray.functions.complex_values import parse_complex_value
from import_ray.sources.mcf import ParseIssue
from import_ray.stages.statvar_name import generate_statvar_name


def _prep_for_double_conversion(v: str) -> str:
    return v.replace(" ", "").replace(",", "").replace("%", "")


def mutate_node(
    node_id: str,
    node: Node,
    issues: list[ParseIssue] | None = None,
) -> Graph:
    """Mutate one node in place; returns synthesized complex-value nodes."""
    extra: Graph = {}
    types = node_types(node)
    if not types:
        if issues is not None:
            issues.append(
                ParseIssue(
                    "Mutator_MissingTypeOf",
                    f"Missing typeOf value for node :: node: '{node_id}'",
                    node_id,
                )
            )
        return extra
    is_legacy_obs = any(vocab.is_legacy_observation(t) for t in types)
    is_stat_var = vocab.STAT_VAR_TYPE in types

    for prop in list(node):
        tvs = node[prop]
        new_tvs: list[tuple[str, int]] = []
        for value, vtype in tvs:
            if is_legacy_obs and vocab.is_stat_value_property(prop):
                if vtype not in (ValueType.NUMBER, ValueType.TEXT):
                    if issues is not None:
                        issues.append(
                            ParseIssue(
                                "Mutator_InvalidObsValue",
                                f"Unexpected type for Observation value :: "
                                f"property: '{prop}', node: '{node_id}'",
                                node_id,
                            )
                        )
                    return extra
                value = _prep_for_double_conversion(value)
            if vtype == ValueType.COMPLEX_VALUE:
                res = parse_complex_value(node_id, node, prop, value)
                if res.empty_token and issues is not None:
                    issues.append(
                        ParseIssue(
                            f"StrSplit_EmptyToken_{prop}", "Empty value found", node_id
                        )
                    )
                if res.error_counter:
                    if issues is not None:
                        issues.append(
                            ParseIssue(res.error_counter, res.error_counter, node_id)
                        )
                else:
                    value = res.dcid
                    vtype = ValueType.RESOLVED_REF
                    extra[res.dcid] = res.node
            new_tvs.append((value, vtype))
        node[prop] = new_tvs

    if is_stat_var:
        constraint_props = sorted(
            p for p in node if p not in vocab.NON_CONSTRAINT_STAT_VAR_PROPERTIES
        )
        if constraint_props:
            node[vocab.CONSTRAINT_PROPS] = [
                (p, ValueType.RESOLVED_REF) for p in constraint_props
            ]
        if vocab.DEFINITION not in node:
            node[vocab.DEFINITION] = [
                (generate_sv_definition(node, constraint_props), ValueType.TEXT)
            ]
        if vocab.NAME not in node:
            name = generate_statvar_name(node)
            if name:
                node[vocab.NAME] = [(name, ValueType.TEXT)]
    return extra


def generate_sv_definition(node: Node, constraint_props: list[str]) -> str:
    """McfUtil.generateSVDefinition (McfUtil.java:229-271)."""
    parts: list[str] = []
    md = get_prop_val(node, vocab.MEASUREMENT_DENOMINATOR)
    if md:
        parts.append(f"md={md}")
    mq = get_prop_val(node, vocab.MEASUREMENT_QUALIFIER)
    if mq:
        parts.append(f"mq={mq}")
    st = get_prop_val(node, vocab.STAT_TYPE)
    if st and st != vocab.MEASURED_VALUE:
        parts.append(f"st={st}")
    mp = get_prop_val(node, vocab.MEASURED_PROP)
    if mp:
        parts.append(f"mp={mp}")
    pt = get_prop_val(node, vocab.POPULATION_TYPE)
    if pt:
        parts.append(f"pt={pt}")
    for p in sorted(constraint_props):
        v = get_prop_val(node, p)
        if v:
            parts.append(f"{p}={v}")
    return ",".join(parts)


def mutate_graph(graph: Graph, issues: list[ParseIssue] | None = None) -> None:
    """Mutate all nodes; synthesized nodes are added to the graph."""
    for node_id in list(graph):
        extra = mutate_node(node_id, graph[node_id], issues)
        for k, v in extra.items():
            graph[k] = v
