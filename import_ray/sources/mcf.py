"""MCF text parsing and serialization.

Reimplements the reference's streaming MCF grammar
(util/src/main/java/org/datacommons/util/parser/mcf/McfParser.java:86-314)
and serializer (util/.../McfUtil.java:26-66,183-191):

- ``Node: <id>`` opens a scope; ``prop: v1, v2`` lines add typed values
  (comma split respecting double quotes, escapes preserved then
  ``\\"``→``"``).
- Typed-value classification (McfParser.parseTypedValue,
  java:336-437): quoted→TEXT; ``[..]``→COMPLEX_VALUE;
  dcid:/dcs:/schema:→RESOLVED_REF (prefix stripped); ``l:``→
  UNRESOLVED_REF; ref-property heuristic; number/bool→NUMBER; else TEXT.
- A node named with a global ref (``dcid:xyz``) auto-gets a ``dcid`` PV
  (parseNodeName, java:252-270) and later ``dcid:`` prop lines clear it
  (parseValues, java:285-287).

Ray integration: ``read_mcf`` turns MCF files into a Dataset of
node-property rows by splitting text into ``Node:`` blocks inside
``flat_map`` over file shards — parsing is per-block and embarrassingly
parallel (the reference's Beam port does the same:
pipeline/util/.../PipelineUtils.java:150-171).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from import_ray.core import vocab
from import_ray.core.model import Graph, Node, ValueType, merge_nodes
from import_ray.functions.strings import (
    SplitError,
    is_bool,
    is_number,
    split_and_strip_with_quote_escape,
    strip_enclosing_quote_pair,
)


@dataclass
class ParseIssue:
    counter: str
    message: str
    node_id: str = ""
    line_num: int = 0
    # LogCb level (LEVEL_ERROR for MCF parse; CSV cell parsing downgrades
    # split issues to LEVEL_WARNING — TmcfCsvParser.java:246)
    level: str = "LEVEL_ERROR"
    # counter increment (CSV_MalformedDCIDPVFailures adds pvs.size())
    n: int = 1


@dataclass
class ParseResult:
    graph: Graph = field(default_factory=dict)
    issues: list[ParseIssue] = field(default_factory=list)
    # node_id -> (file, first line number)
    locations: dict = field(default_factory=dict)


def parse_schema_term(value: str) -> tuple[str, str, str] | None:
    """TMCF term → (kind, table, name); kind ∈ {entity, column, constant}.

    McfParser.parseSchemaTerm (java:455-478).
    """
    is_entity = value.startswith(vocab.ENTITY_PREFIX)
    is_column = value.startswith(vocab.COLUMN_PREFIX)
    if not (is_entity or is_column):
        return ("constant", "", value)
    stripped = value[len(vocab.ENTITY_PREFIX) :]
    delim = stripped.find(vocab.TABLE_DELIMITER)
    if delim == -1:
        return None
    return (
        "entity" if is_entity else "column",
        stripped[:delim],
        stripped[delim + len(vocab.TABLE_DELIMITER) :],
    )


def parse_typed_value(
    prop: str,
    val: str,
    is_resolved: bool = False,
    is_template: bool = False,
) -> tuple[str, int] | ParseIssue:
    """Classify one scalar value (McfParser.parseTypedValue, java:336-437)."""
    if is_template:
        if prop == "C":
            return ParseIssue(
                "TMCF_UnsupportedColumnNameInProperty",
                "TMCF properties cannot refer to CSV columns yet",
            )
        term = parse_schema_term(val)
        if term is None:
            return ParseIssue("TMCF_MalformedSchemaTerm", "missing '->' delimiter")
        kind = term[0]
        if kind == "entity":
            return (val, ValueType.TABLE_ENTITY)
        if kind == "column":
            return (val, ValueType.TABLE_COLUMN)
        # constant → fall through

    expect_ref = vocab.is_reference_property(prop)

    if val.startswith('"'):
        val = strip_enclosing_quote_pair(val)
        if not expect_ref:
            return (val, ValueType.TEXT)

    if val.startswith("["):
        if not val.endswith("]"):
            return ParseIssue(
                "MCF_MalformedComplexValue",
                "Found malformed Complex value without a closing ] bracket",
            )
        return (val, ValueType.COMPLEX_VALUE)

    colon = val.find(vocab.REFERENCE_DELIMITER)
    if colon != -1:
        if vocab.is_global_reference(val):
            return (val[colon + 1 :], ValueType.RESOLVED_REF)
        if vocab.is_internal_reference(val):
            if is_resolved:
                return ParseIssue(
                    "MCF_LocalReferenceInResolvedFile",
                    "Found an internal 'l:' reference in resolved entity value",
                )
            return (val, ValueType.UNRESOLVED_REF)

    if expect_ref:
        return (val, ValueType.RESOLVED_REF)

    if is_number(val) or is_bool(val):
        return (val, ValueType.NUMBER)

    return (val, ValueType.TEXT)


def parse_mcf_string(
    mcf: str,
    file_name: str = "<memory>",
    is_resolved: bool = False,
    is_template: bool = False,
) -> ParseResult:
    """Parse instance- or template-MCF text into a Graph (node merge +
    PV dedup). Template mode (TMCF): node names must be ``E:`` terms and
    values classify as TABLE_ENTITY/TABLE_COLUMN/constant."""
    res = ParseResult()
    cur_entity = ""
    cur_entity_line_idx = 0
    for line_num, raw in enumerate(mcf.splitlines(), start=1):
        line = raw.strip()
        if not line or line.startswith("//") or line.startswith("#"):
            continue
        prefix_len = 0
        if line.startswith("http:"):
            prefix_len = 5
        elif line.startswith("https:"):
            prefix_len = 6
        colon = line[prefix_len:].find(vocab.REFERENCE_DELIMITER)
        if colon < 1:
            res.issues.append(
                ParseIssue(
                    "MCF_MalformedColonLessLine",
                    f"Malformed line without a colon delimiter :: line: '{line}'",
                    cur_entity,
                    line_num,
                )
            )
            continue
        lhs = line[:colon].strip()
        rhs = line[colon + 1 :].strip()
        if lhs == vocab.NODE:
            if "," in rhs:
                res.issues.append(
                    ParseIssue(
                        "MCF_MalformedNodeName",
                        "Node value with a comma; must be a unary value",
                        rhs,
                        line_num,
                    )
                )
                continue
            if rhs.startswith('"'):
                res.issues.append(
                    ParseIssue(
                        "MCF_MalformedNodeName",
                        "Node value with quotes; must be non-quoted",
                        rhs,
                        line_num,
                    )
                )
                continue
            if is_template:
                term = parse_schema_term(rhs)
                if term is None or term[0] != "entity":
                    res.issues.append(
                        ParseIssue(
                            "TMCF_MalformedEntity",
                            f"Found malformed entity name that is not an entity "
                            f"prefix (E:) :: name: '{rhs}'",
                            rhs,
                            line_num,
                        )
                    )
                    continue
            cur_entity = rhs
            cur_entity_line_idx = 0
            node = res.graph.setdefault(cur_entity, {})
            res.locations.setdefault(cur_entity, (file_name, line_num))
            # parseNodeName: a global-ref node name implies its dcid
            if not is_template and vocab.is_global_reference(rhs):
                dcid_val = rhs[rhs.index(vocab.REFERENCE_DELIMITER) + 1 :]
                node.setdefault(vocab.DCID, [(dcid_val, ValueType.TEXT)])
            continue
        if not cur_entity:
            res.issues.append(
                ParseIssue(
                    "MCF_UnexpectedProperty",
                    f"Property without a preceding 'Node' line :: line: '{line}'",
                    "",
                    line_num,
                )
            )
            continue
        _parse_values(res, cur_entity, lhs, rhs, is_resolved, line_num, is_template)
        cur_entity_line_idx += 1
    if cur_entity and cur_entity_line_idx == 0:
        res.issues.append(
            ParseIssue(
                "MCF_MalformedNode",
                f"Found a 'Node' without properties :: node: '{cur_entity}'",
                cur_entity,
            )
        )
    return res


def _parse_values(
    res: ParseResult,
    cur_entity: str,
    prop: str,
    values: str,
    is_resolved: bool,
    line_num: int,
    is_template: bool = False,
) -> None:
    """McfParser.parseValues (java:276-314)."""
    if not prop or not values:
        return
    node = res.graph.setdefault(cur_entity, {})
    existing = node.get(prop, [])
    if prop == vocab.DCID and vocab.is_global_reference(cur_entity):
        existing = []
    try:
        fields = split_and_strip_with_quote_escape(
            values,
            delimiter=vocab.VALUE_SEPARATOR,
            include_empty=False,
            strip_enclosing_quotes=False,
            strip_escapes_before_quotes=True,
        )
    except SplitError as e:
        res.issues.append(
            ParseIssue(f"{e.counter}_{prop}", str(e), cur_entity, line_num)
        )
        return
    if not fields:
        res.issues.append(
            ParseIssue(
                f"StrSplit_EmptyToken_{prop}", "Empty value found", cur_entity, line_num
            )
        )
    new_tvs = list(existing)
    seen = set(new_tvs)
    for f in fields:
        tv = parse_typed_value(prop, f, is_resolved=is_resolved, is_template=is_template)
        if isinstance(tv, ParseIssue):
            tv.node_id = cur_entity
            tv.line_num = line_num
            res.issues.append(tv)
            continue
        # mergeGraphs-equivalent PV set-dedup happens at node granularity
        if tv not in seen:
            new_tvs.append(tv)
            seen.add(tv)
    if new_tvs:
        node[prop] = new_tvs


def _render_value(value: str, value_type: int) -> str:
    """McfUtil.getValue (java:183-191)."""
    if value_type == ValueType.TEXT:
        return f'"{value}"'
    if value_type == ValueType.RESOLVED_REF:
        return vocab.DCID_PREFIX + value
    return value


def serialize_node(node_id: str, node: Node, sort: bool = True) -> str:
    """Render one node as an MCF block (McfUtil.serializeMcfGraph, java:26-59)."""
    out = [f"Node: {node_id}\n"]
    lines = []
    for prop, tvs in node.items():
        vals = [_render_value(v, t) for v, t in tvs]
        vals = [v for v in vals if v]
        if sort:
            vals.sort()
        if vals:
            lines.append(f"{prop}: {', '.join(vals)}\n")
    if sort:
        lines.sort()
    out.extend(lines)
    return "".join(out)


def serialize_graph(graph: Graph, sort: bool = True) -> str:
    keys = sorted(graph) if sort else list(graph)
    return "\n".join(serialize_node(k, graph[k], sort) for k in keys) + (
        "\n" if keys else ""
    )


def parse_mcf_file(path: str, is_resolved: bool = False) -> ParseResult:
    with open(path) as f:
        return parse_mcf_string(f.read(), file_name=path, is_resolved=is_resolved)
