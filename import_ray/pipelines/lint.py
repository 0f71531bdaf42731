"""dc-import ``lint`` equivalent: sanity + local-resolution counters
over MCF / TMCF / CSV inputs, no output graph.

Mirrors the reference tool's lint mode (Processor.java:59-150):

- instance MCF files: parse (parse counters) → McfMutator →
  McfChecker per node → StatVarState collision checks → one local-ref
  resolution pass over the merged graph (resolution counters);
- TMCF+CSV pairs: TMCF sanity pre-check (McfChecker.checkTemplate),
  then the full distributed table flow (TemplateApplier → mutate →
  check → resolve), whose CSV/check/resolution counters ride the
  sentinel-row channel;
- TMCF without CSV: parse + checkTemplate with no column set
  (Processor.processNodes(TEMPLATE_MCF)).

OFFLINE DEVIATION (documented): the reference's lint calls the DC API
for existence checks; this engine runs offline, so ``Existence_*`` /
``API_*`` counters and the ``Num*Successes`` INFO counters (whose
values depend on existence results failing nodes) are not
reference-comparable. Golden tests compare every other counter exactly
(tests/test_lint_golden.py vs LintTest.java:1-87 cases).
"""

from __future__ import annotations

import os

from import_ray.core.model import merge_graphs
from import_ray.sources.mcf import parse_mcf_file
from import_ray.stages.check import NodeChecker, check_template
from import_ray.stages.mutate import mutate_graph
from import_ray.stages.resolve import resolve_graph
from import_ray.stages.statvar_state import check_statvar_collisions, statvar_id_pairs
from import_ray.state.counters import LEVEL_ERROR, LEVEL_INFO, CounterSet

NETWORK_COUNTER_PREFIXES = ("Existence_", "API_", "Num")


def lint_files(
    paths: list[str],
    known_dcids: set[str] | None = None,
    report_path: str | None = None,
) -> CounterSet:
    """Lint the given input files; returns the merged CounterSet and
    optionally writes the reference-shaped report.json."""
    counters = CounterSet()
    mcfs = sorted(p for p in paths if p.endswith(".mcf"))
    tmcfs = sorted(p for p in paths if p.endswith(".tmcf"))
    csvs = sorted(p for p in paths if p.endswith(".csv"))

    # --- instance MCF files -------------------------------------------------
    graphs = []
    sv_pairs = []
    num_node_successes = 0
    for path in mcfs:
        fname = os.path.basename(path)
        res = parse_mcf_file(path)
        for i in res.issues:
            counters.add(i.level, i.counter, i.message, fname, i.line_num, n=i.n)
        mut_issues: list = []
        mutate_graph(res.graph, mut_issues)
        for i in mut_issues:
            counters.add(
                getattr(i, "level", LEVEL_ERROR), i.counter, str(i), fname
            )
        checker = NodeChecker(counters, known_dcids=known_dcids, file=fname)
        for node_id, node in res.graph.items():
            if checker.check_node(node_id, node):
                num_node_successes += 1
        sv_pairs.extend(statvar_id_pairs(res.graph))
        graphs.append(res.graph)
    if sv_pairs:
        check_statvar_collisions(sv_pairs, counters)
    if graphs:
        res = resolve_graph(merge_graphs(graphs))
        for issue in res.issues:
            counters.add(LEVEL_ERROR, issue.counter, str(issue))
        # stat checks over the (post-mutate) SVObs nodes
        # (Processor.checkStats, Processor.java:117,535-540)
        import pyarrow as pa
        import ray.data

        from import_ray.stages.observations import svobs_rows_to_observations
        from import_ray.stages.statcheck import stat_check

        rows = {"node_id": [], "prop": [], "value": [], "value_type": []}
        for g in graphs:
            for node_id, node in g.items():
                for prop, tvs in node.items():
                    for value, vtype in tvs:
                        rows["node_id"].append(node_id)
                        rows["prop"].append(prop)
                        rows["value"].append(value)
                        rows["value_type"].append(int(vtype))
        if rows["node_id"]:
            tbl = pa.table(
                {
                    "node_id": pa.array(rows["node_id"], pa.string()),
                    "prop": pa.array(rows["prop"], pa.string()),
                    "value": pa.array(rows["value"], pa.large_string()),
                    "value_type": pa.array(rows["value_type"], pa.int8()),
                }
            )
            obs = svobs_rows_to_observations(tbl)
            if len(obs):
                counters.merge(stat_check(ray.data.from_arrow(obs)))
    if mcfs:
        counters.add(LEVEL_INFO, "NumNodeSuccesses", n=num_node_successes)

    # --- TMCF (+ CSV) -------------------------------------------------------
    if tmcfs and csvs:
        from import_ray.pipelines.genmcf import genmcf_table_ds, split_counters, tmcf_pre_check

        for tmcf in tmcfs:
            for csv in csvs:
                if tmcf_pre_check(tmcf, csv, counters):
                    ds = genmcf_table_ds(tmcf, csv, counters=counters)
                    _, table_counters = split_counters(ds.take_all())
                    counters.merge(table_counters)
    elif tmcfs:
        # TMCF without CSV: the reference streams the template node by
        # node (processNodes(TEMPLATE_MCF) → parseNextNode), so mutation
        # and template checks see SINGLE-NODE graphs — E: references to
        # sibling nodes count as missing entity defs.
        from import_ray.sources.tmcf_csv import parse_tmcf

        for tmcf in tmcfs:
            fname = os.path.basename(tmcf)
            with open(tmcf) as f:
                res = parse_tmcf(f.read(), file_name=fname)
            for i in res.issues:
                counters.add(i.level, i.counter, i.message, fname, i.line_num, n=i.n)
            for node_id, node in res.graph.items():
                single = {node_id: node}
                mut_issues: list = []
                mutate_graph(single, mut_issues)
                for i in mut_issues:
                    counters.add(
                        getattr(i, "level", LEVEL_ERROR), i.counter, str(i), fname
                    )
                check_template(single, None, counters, file=fname)

    if report_path:
        counters.write_report(report_path)
    return counters
