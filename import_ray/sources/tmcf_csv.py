"""TMCF template application over tabular (CSV/Arrow) rows.

Reimplements the reference's TmcfCsvParser semantics
(util/src/main/java/org/datacommons/util/parser/mcf/TmcfCsvParser.java:55-374):

- per-row deterministic node ids ``<Table>/<E-name>/<rowId>``; rowId is
  the CSV line number (the reference's TEST_mode behavior,
  java:41,137 — we use deterministic ids ALWAYS so output is
  reproducible);
- a dcid pre-pass per row builds ``entityToDcid`` used when another
  entity references ``E:Table->E1`` (java:155-191);
- ``C:Table->col`` terms substitute the row's cell, with multi-value
  cell splitting on the CSV delimiter respecting quotes (java:293-347);
- ``E:`` references become RESOLVED_REF (when the target maps a dcid)
  or UNRESOLVED_REF ``l:<node>`` (java:251-291);
- constants pass through.

Ray integration: the (small) template is parsed once and broadcast in
the kernel closure; rows stream through ``map_batches`` carrying a
``__row_num`` column (CSV line number) so node ids are deterministic
regardless of block boundaries.
"""

from __future__ import annotations

import pyarrow as pa

from import_ray.core import vocab
from import_ray.core.model import Graph, Node, ValueType
from import_ray.functions.strings import split_and_strip_with_quote_escape
from import_ray.sources.mcf import (
    ParseIssue,
    ParseResult,
    parse_mcf_string,
    parse_schema_term,
    parse_typed_value,
)

LEVEL_WARNING = "LEVEL_WARNING"
LEVEL_INFO = "LEVEL_INFO"


def parse_tmcf(text: str, file_name: str = "<tmcf>") -> ParseResult:
    return parse_mcf_string(text, file_name=file_name, is_template=True)


def apply_template_row(
    template: Graph,
    row: dict[str, str],
    row_id: str,
    issues: list[ParseIssue] | None = None,
    delimiter: str = ",",
) -> Graph:
    """One CSV row → instance nodes (TmcfCsvParser.RowProcessor.process)."""
    entity_to_dcid: dict[str, tuple[str, int] | None] = {}

    def to_node_name(entity_id: str) -> str | None:
        if entity_id in entity_to_dcid:
            tv = entity_to_dcid[entity_id]
            return vocab.DCID_PREFIX + (tv[0] if tv else "")
        term = parse_schema_term(entity_id)
        if term is None or term[0] != "entity":
            if issues is not None:
                issues.append(
                    ParseIssue("CSV_UnexpectedNonEntity", entity_id, entity_id)
                )
            return None
        return f"{term[1]}/{term[2]}/{row_id}"

    def parse_values(
        template_entity: str, prop: str, tvs: list[tuple[str, int]]
    ) -> list[tuple[str, int]]:
        out: list[tuple[str, int]] = []
        for value, vtype in tvs:
            if vtype == ValueType.TABLE_ENTITY:
                if prop == vocab.DCID:
                    if issues is not None:
                        issues.append(
                            ParseIssue("TMCF_TmcfEntityAsDcid", value, template_entity)
                        )
                    continue
                ref_node = to_node_name(value)
                if ref_node is None:
                    continue
                if ref_node.startswith(vocab.DCID_PREFIX):
                    tv = entity_to_dcid.get(value)
                    if not tv or not tv[0]:
                        if issues is not None:
                            issues.append(
                                ParseIssue(
                                    "CSV_EmptyDcidReferences",
                                    f"In dcid:{{entity}} reference, found "
                                    f"{{entity}} to be empty :: property: "
                                    f"'{prop}', node: '{template_entity}'",
                                    template_entity,
                                    level=LEVEL_WARNING,
                                )
                            )
                        continue
                    out.append((tv[0], ValueType.RESOLVED_REF))
                else:
                    out.append(
                        (vocab.INTERNAL_REF_PREFIX + ref_node, ValueType.UNRESOLVED_REF)
                    )
            elif vtype == ValueType.TABLE_COLUMN:
                term = parse_schema_term(value)
                if term is None or term[0] != "column":
                    if issues is not None:
                        issues.append(
                            ParseIssue("TMCF_UnexpectedNonColumn", value, template_entity)
                        )
                    continue
                column = term[2]
                if column not in row:
                    if issues is not None:
                        issues.append(
                            ParseIssue("CSV_TmcfMissingColumn", column, template_entity)
                        )
                    continue
                cell = row[column]
                try:
                    # cell split issues log at WARNING with the prop as the
                    # counter suffix (TmcfCsvParser.java:246,335-341)
                    cell_values = split_and_strip_with_quote_escape(
                        "" if cell is None else str(cell),
                        delimiter=delimiter,
                        strip_enclosing_quotes=False,
                        strip_escapes_before_quotes=True,
                    )
                except Exception as e:
                    if issues is not None:
                        counter = getattr(e, "counter", "StrSplit_BadQuotesInToken")
                        issues.append(
                            ParseIssue(
                                f"{counter}_{prop}",
                                str(e),
                                template_entity,
                                level=LEVEL_WARNING,
                            )
                        )
                    continue
                if not cell_values and issues is not None:
                    issues.append(
                        ParseIssue(
                            f"StrSplit_EmptyToken_{prop}",
                            "Empty value found",
                            template_entity,
                            level=LEVEL_WARNING,
                        )
                    )
                for v in cell_values:
                    tv = parse_typed_value(prop, v, is_resolved=False)
                    if not isinstance(tv, ParseIssue):
                        out.append(tv)
                    elif issues is not None:
                        issues.append(tv)
            else:
                out.append((value, vtype))
        return out

    # dcid pre-pass (java:160-191)
    for entity_id, tnode in template.items():
        if vocab.DCID not in tnode:
            continue
        entity_to_dcid[entity_id] = None
        vals = parse_values(entity_id, vocab.DCID, tnode[vocab.DCID])
        if not vals:
            continue
        tv = vals[0]
        if tv[1] in (ValueType.TEXT, ValueType.RESOLVED_REF):
            entity_to_dcid[entity_id] = tv
        elif issues is not None:
            issues.append(
                ParseIssue(
                    "CSV_MalformedDCIDFailures",
                    f"Malformed CSV value for dcid property; must be a text "
                    f"or reference :: value: '{tv[0]}', node: '{entity_id}'",
                    entity_id,
                    level=LEVEL_WARNING,
                )
            )
            # dropped-PV count rides as an INFO counter
            # (TmcfCsvParser.java:189: incrementInfoCounterBy by pvs.size())
            issues.append(
                ParseIssue(
                    "CSV_MalformedDCIDPVFailures",
                    "",
                    entity_id,
                    level=LEVEL_INFO,
                    n=len(tnode),
                )
            )

    out_graph: Graph = {}
    for entity_id, tnode in template.items():
        node_name = to_node_name(entity_id)
        if node_name is None or node_name == vocab.DCID_PREFIX:
            continue
        new_node: Node = {}
        for prop, tvs in tnode.items():
            if prop == vocab.FUNCTIONAL_DEPS:
                continue
            vals = parse_values(entity_id, prop, tvs)
            if vals:
                new_node[prop] = vals
        if new_node:
            out_graph[node_name] = new_node
    return out_graph


def read_csv_with_row_numbers(csv_path: str, counters=None) -> pa.Table:
    """Driver-side CSV read with a ``__row_num`` column: 1-based data-row
    index, matching the reference's TEST-mode rowId (the RowProcessor
    captures currentLineNumber BEFORE the increment —
    TmcfCsvParser.java:117-123,137)."""
    import pyarrow.csv as pacsv

    # Rows with the wrong column count are skipped, mirroring the
    # reference's CSV_InconsistentRows handling (TmcfCsvParser.java:148-153).
    # Single-threaded read so skipped physical row numbers are reported and
    # surviving rows keep their original (deterministic) row ids.
    skipped: list[int] = []

    def on_invalid(row):
        if row.number is not None:
            skipped.append(row.number - 1)  # physical number incl. header
        return "skip"

    t = pacsv.read_csv(
        csv_path,
        convert_options=pacsv.ConvertOptions(column_types={}),
        read_options=pacsv.ReadOptions(use_threads=False),
        parse_options=pacsv.ParseOptions(invalid_row_handler=on_invalid),
    )
    # force all columns to string (the template substitutes raw cells)
    cols = {}
    for name in t.column_names:
        col = t[name]
        if not pa.types.is_string(col.type):
            col = col.cast(pa.string())
        cols[name.strip()] = col
    t = pa.table(cols)
    if skipped and counters is not None:
        counters.add(
            "LEVEL_ERROR",
            "CSV_InconsistentRows",
            f"Found rows with fewer/more columns than the header :: "
            f"rows: {skipped}",
            n=len(skipped),
        )
    total = t.num_rows + len(skipped)
    skip_set = set(skipped)
    nums = [i for i in range(1, total + 1) if i not in skip_set]
    row_nums = pa.array(nums[: t.num_rows], pa.int64())
    return t.append_column("__row_num", row_nums)


class TemplateApplier:
    """map_batches kernel: tabular rows + broadcast template → node-PV rows
    (exploded NODE_PV_SCHEMA plus scope column for scope-local resolution)."""

    COUNTER_SENTINEL = "__counters__"

    def __init__(self, tmcf_text: str, scope_prefix: str = ""):
        res = parse_tmcf(tmcf_text)
        self.template = res.graph
        self.scope_prefix = scope_prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        rows = batch.to_pylist()
        out = {"scope": [], "node_id": [], "prop": [], "value": [], "value_type": []}
        issues: list[ParseIssue] = []
        for row in rows:
            row_id = str(row.pop("__row_num"))
            graph = apply_template_row(self.template, row, row_id, issues=issues)
            scope = self.scope_prefix + row_id
            for node_id, node in graph.items():
                for prop, tvs in node.items():
                    for value, vtype in tvs:
                        out["scope"].append(scope)
                        out["node_id"].append(node_id)
                        out["prop"].append(prop)
                        out["value"].append(value)
                        out["value_type"].append(vtype)
        if issues:
            # CSV-side counters ride as sentinel rows (same convention as
            # ResolveScopes, which passes them through to the reduce)
            agg: dict[tuple[str, str], int] = {}
            for i in issues:
                key = (i.level, i.counter)
                agg[key] = agg.get(key, 0) + i.n
            for (level, counter), n in agg.items():
                out["scope"].append("")
                out["node_id"].append(self.COUNTER_SENTINEL)
                out["prop"].append(json.dumps([level, counter]))
                out["value"].append(str(n))
                out["value_type"].append(0)
        return pa.table(
            {
                "scope": pa.array(out["scope"], pa.string()),
                "node_id": pa.array(out["node_id"], pa.string()),
                "prop": pa.array(out["prop"], pa.string()),
                "value": pa.array(out["value"], pa.large_string()),
                "value_type": pa.array(out["value_type"], pa.int8()),
            }
        )
