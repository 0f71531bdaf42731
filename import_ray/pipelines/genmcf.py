"""dc-import ``genmcf`` equivalent: TMCF+CSV / MCF → resolved nodes.

Mirrors the reference tool's flow (tool/.../Processor.java:59-405):

- table path (processTables, java:263-405): per CSV row → template
  instantiation (TmcfCsvParser) → McfMutator → scope-local resolution
  (resolveCommon runs the McfResolver on the per-row graph) → success /
  failed node sets.
- instance path (processLoadedGraph + resolveNodes, java:187-261,
  421-448): merged instance-MCF graph → mutate → one resolver pass.

Ray dataflow (scales to arbitrarily many rows):

    read rows (+__row_num) → map_batches(TemplateApplier)      # node-PV rows + scope
      → repartition(keys=[scope]) → map_batches(ResolveScopes)  # mutate+fixpoint per row scope
      → node-PV rows (resolved | failed)

Local-ref scopes never cross a row (TMCF semantics), so the fixpoint is
embarrassingly parallel after the scope partition.
"""

from __future__ import annotations

import os

import pyarrow as pa

from import_ray.core.model import Graph, merge_graphs
from import_ray.sources.mcf import parse_mcf_file
from import_ray.sources.tmcf_csv import TemplateApplier, read_csv_with_row_numbers
from import_ray.stages.check import NodeChecker
from import_ray.stages.mutate import mutate_graph
from import_ray.stages.resolve import make_external_id_resolver, resolve_graph
from import_ray.state.counters import LEVEL_ERROR, CounterSet


def _rows_to_graphs(batch: pa.Table) -> dict[str, Graph]:
    """Group node-PV rows by scope and rebuild Graph dicts."""
    scopes: dict[str, Graph] = {}
    for scope, node_id, prop, value, vtype in zip(
        batch["scope"].to_pylist(),
        batch["node_id"].to_pylist(),
        batch["prop"].to_pylist(),
        batch["value"].to_pylist(),
        batch["value_type"].to_pylist(),
    ):
        scopes.setdefault(scope, {}).setdefault(node_id, {}).setdefault(prop, []).append(
            (value, int(vtype))
        )
    return scopes


def _graphs_to_rows(scoped: dict[str, tuple[Graph, Graph]]) -> pa.Table:
    out = {
        "scope": [],
        "node_id": [],
        "prop": [],
        "value": [],
        "value_type": [],
        "failed": [],
    }
    for scope, (resolved, failed) in scoped.items():
        for is_failed, graph in ((False, resolved), (True, failed)):
            for node_id, node in graph.items():
                for prop, tvs in node.items():
                    for value, vtype in tvs:
                        out["scope"].append(scope)
                        out["node_id"].append(node_id)
                        out["prop"].append(prop)
                        out["value"].append(value)
                        out["value_type"].append(vtype)
                        out["failed"].append(is_failed)
    return pa.table(
        {
            "scope": pa.array(out["scope"], pa.string()),
            "node_id": pa.array(out["node_id"], pa.string()),
            "prop": pa.array(out["prop"], pa.large_string()),
            "value": pa.array(out["value"], pa.large_string()),
            "value_type": pa.array(out["value_type"], pa.int8()),
            "failed": pa.array(out["failed"], pa.bool_()),
        }
    )


class ResolveScopes:
    """map_batches kernel: mutate + check + fixpoint-resolve each scope's
    graph (the reference's processTables order: McfMutator → McfChecker
    → resolveCommon, Processor.java:263-405). Nodes failing sanity
    checks are routed to the failed output before resolution.

    The external-id map is broadcast once per actor via the constructor.
    Counters (check + resolution issues) are emitted as sentinel rows
    (node_id=``__counters__``) for a downstream reduce.
    """

    COUNTER_SENTINEL = "__counters__"

    def __init__(
        self,
        external_id_map: dict | None = None,
        coordinates_map: dict | None = None,
        name_map: dict | None = None,
        run_checks: bool = True,
        allow_nan_svobs: bool = True,
        known_dcids: set | None = None,
    ):
        self.id_resolver = make_external_id_resolver(
            external_id_map, coordinates_map, name_map
        )
        self.run_checks = run_checks
        self.allow_nan_svobs = allow_nan_svobs
        self.known_dcids = known_dcids

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        import pyarrow.compute as pc

        counters = CounterSet()
        # upstream (TemplateApplier) counter sentinel rows pass through
        # into this stage's own counter output
        sent_mask = pc.equal(batch["node_id"], self.COUNTER_SENTINEL)
        for r in batch.filter(sent_mask).to_pylist():
            level, counter = json.loads(r["prop"])
            counters.add(level, counter, n=int(r["value"]))
        batch = batch.filter(pc.invert(sent_mask))
        scopes = _rows_to_graphs(batch)
        out: dict[str, tuple[Graph, Graph]] = {}
        mut_issues: list = []
        for scope, graph in scopes.items():
            # check BEFORE mutate: the reference sanity-checks each node
            # inside TmcfCsvParser (java:224-229) and drops failures from
            # the row graph, so failed nodes are never mutated (their
            # complex values don't expand/validate). We additionally
            # route them to the failed output.
            check_failed: Graph = {}
            if self.run_checks:
                checker = NodeChecker(
                    counters,
                    allow_nan_svobs=self.allow_nan_svobs,
                    known_dcids=self.known_dcids,
                )
                for node_id in list(graph):
                    if not checker.check_node(node_id, graph[node_id]):
                        check_failed[node_id] = graph.pop(node_id)
            mutate_graph(graph, mut_issues)
            res = resolve_graph(graph, id_resolver=self.id_resolver)
            for issue in res.issues:
                counters.add(LEVEL_ERROR, issue.counter, str(issue))
            failed = dict(res.failed)
            failed.update(check_failed)
            out[scope] = (res.resolved, failed)
        for i in mut_issues:
            counters.add(getattr(i, "level", LEVEL_ERROR), i.counter, str(i))
        result = _graphs_to_rows(out)
        if counters.counts:
            crows = [
                {
                    "scope": "",
                    "node_id": self.COUNTER_SENTINEL,
                    "prop": json.dumps([level, counter]),
                    "value": str(n),
                    "value_type": 0,
                    "failed": False,
                }
                for (level, counter), n in counters.counts.items()
            ]
            result = pa.concat_tables(
                [result, pa.Table.from_pylist(crows, schema=result.schema)]
            )
        return result


def genmcf_table_ds(
    tmcf_path: str,
    csv_path: str,
    external_id_map: dict | None = None,
    coordinates_map: dict | None = None,
    name_map: dict | None = None,
    batch_size: int = 2048,
    run_checks: bool = True,
    allow_nan_svobs: bool = True,
    known_dcids: set | None = None,
    counters: CounterSet | None = None,
):
    """Ray Dataset of resolved/failed node-PV rows for a TMCF+CSV pair.
    ``counters`` (optional, driver-side) receives read-time counters
    (CSV_InconsistentRows for skipped malformed rows)."""
    import ray.data

    from import_ray.core.context import configure_data_context, npartitions

    configure_data_context()
    with open(tmcf_path) as f:
        tmcf_text = f.read()
    table = read_csv_with_row_numbers(csv_path, counters=counters)
    ds = ray.data.from_arrow(table)
    ds = ds.map_batches(
        TemplateApplier(tmcf_text), batch_format="pyarrow", batch_size=batch_size
    )
    # rows of one scope always come from one input row → they are already
    # in one block; the repartition keeps correctness if an upstream ever
    # splits them (cheap: rows are small)
    ds = ds.repartition(npartitions(), keys=["scope"])
    return ds.map_batches(
        ResolveScopes(
            external_id_map,
            coordinates_map,
            name_map,
            run_checks=run_checks,
            allow_nan_svobs=allow_nan_svobs,
            known_dcids=known_dcids,
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def split_counters(rows: list[dict]):
    """Split take_all() rows into (node rows, CounterSet)."""
    import json

    cs = CounterSet()
    node_rows = []
    for r in rows:
        if r["node_id"] == ResolveScopes.COUNTER_SENTINEL:
            level, counter = json.loads(r["prop"])
            cs.add(level, counter, n=int(r["value"]))
        else:
            node_rows.append(r)
    return node_rows, cs


def tmcf_pre_check(tmcf_path: str, csv_path: str, counters: CounterSet) -> bool:
    """TMCF sanity pre-pass (TmcfCsvParser.init semantics, java:85-110):
    parse the template (parse issues → LEVEL_ERROR counters), run
    McfChecker.checkTemplate against the CSV header columns; on failure
    log the fatal ``CSV_TmcfCheckFailure`` and the caller must skip row
    processing. Driver-side: the template is tiny by construction."""
    import csv
    import os

    from import_ray.sources.tmcf_csv import parse_tmcf
    from import_ray.stages.check import check_template

    tmcf_name = os.path.basename(tmcf_path)
    with open(tmcf_path) as f:
        res = parse_tmcf(f.read(), file_name=tmcf_name)
    for issue in res.issues:
        counters.add(LEVEL_ERROR, issue.counter, issue.message, tmcf_name)
    with open(csv_path, newline="") as f:
        header = next(csv.reader(f), [])
    ok = check_template(
        res.graph, {h.strip() for h in header}, counters, file=tmcf_name
    )
    if not ok:
        from import_ray.state.counters import LEVEL_FATAL

        counters.add(
            LEVEL_FATAL,
            "CSV_TmcfCheckFailure",
            f"Found fatal sanity error in TMCF; check Sanity_ counter "
            f"messages :: TMCF-file: {tmcf_name}",
            tmcf_name,
        )
    return ok


def genmcf_run(
    tmcf_path: str,
    csv_path: str,
    out_dir: str,
    report_path: str | None = None,
    run_stat_checks: bool = True,
    pre_check: bool = True,
    **kwargs,
):
    """Streaming genmcf entry point (LogWrapper.persistLog +
    Processor.checkStats semantics, Processor.java:535-540) — the
    at-scale flow:

    - resolved/failed node-PV rows stream straight to partitioned
      parquet under ``out_dir`` (one file per block — resumable output);
    - the counter reduce materializes ONLY the tiny sentinel rows;
    - stat checks consume a column-pruned re-read of the written nodes,
      regrouped by node_id, as an observations Dataset.

    Node rows are never collected on the driver. Returns
    (nodes Dataset over ``out_dir``, CounterSet).

    Resume: with ``resume=True`` (default), a ``_manifest.json`` under
    ``out_dir`` records the input fingerprints (path/size/mtime) and the
    final counters; a rerun with unchanged inputs skips all compute and
    reuses the written parquet — checkpoint-based resume at the output
    granularity.
    """
    import json

    import pyarrow.compute as pc
    import ray.data

    from import_ray.core.context import npartitions

    resume = kwargs.pop("resume", True)
    manifest_path = out_dir.rstrip("/") + ".manifest.json"

    def fingerprint() -> dict:
        return {
            "inputs": [
                {
                    "path": p,
                    "size": os.path.getsize(p),
                    "mtime": os.path.getmtime(p),
                }
                for p in (tmcf_path, csv_path)
            ],
            "run_stat_checks": run_stat_checks,
            # every behavior-affecting option: a rerun with different
            # options must MISS the cache, not return stale output
            "pre_check": pre_check,
            "options": {
                k: sorted(map(repr, v)) if isinstance(v, (set, frozenset)) else repr(v)
                for k, v in sorted(kwargs.items())
            },
        }

    if resume and os.path.exists(manifest_path):
        try:
            with open(manifest_path) as f:
                manifest = json.load(f)
            if manifest.get("fingerprint") == fingerprint():
                counters = CounterSet()
                for level, counter, n in manifest["counters"]:
                    counters.add(level, counter, n=n)
                if report_path:
                    counters.write_report(report_path)
                return ray.data.read_parquet(out_dir), counters
        except (json.JSONDecodeError, KeyError, OSError):
            pass  # stale/corrupt manifest → recompute

    if pre_check:
        counters = CounterSet()
        if not tmcf_pre_check(tmcf_path, csv_path, counters):
            if report_path:
                counters.write_report(report_path)
            empty = ray.data.from_arrow(
                pa.table(
                    {
                        "scope": pa.array([], pa.string()),
                        "node_id": pa.array([], pa.string()),
                        "prop": pa.array([], pa.large_string()),
                        "value": pa.array([], pa.large_string()),
                        "value_type": pa.array([], pa.int8()),
                        "failed": pa.array([], pa.bool_()),
                    }
                )
            )
            return empty, counters

    if os.path.isdir(out_dir):
        # a stale/partial previous run must not mix blocks with this one
        import shutil

        shutil.rmtree(out_dir)
    ds = genmcf_table_ds(tmcf_path, csv_path, **kwargs)
    ds.write_parquet(out_dir)
    nodes = ray.data.read_parquet(out_dir)
    sent = ResolveScopes.COUNTER_SENTINEL

    from import_ray.core.context import take_all_bounded

    crows = take_all_bounded(
        nodes.map_batches(
            lambda b: b.filter(pc.equal(b["node_id"], sent)).select(
                ["prop", "value"]
            ),
            batch_format="pyarrow",
        ),
        "genmcf: counter rows",
    )
    counters = CounterSet()
    for r in crows:
        level, counter = json.loads(r["prop"])
        counters.add(level, counter, n=int(r["value"]))

    if run_stat_checks:
        from import_ray.stages.observations import svobs_rows_to_observations
        from import_ray.stages.statcheck import stat_check

        resolved = nodes.map_batches(
            lambda b: b.filter(
                pc.and_(pc.invert(b["failed"]), pc.not_equal(b["node_id"], sent))
            ),
            batch_format="pyarrow",
        )
        obs = resolved.repartition(npartitions(), keys=["node_id"]).map_batches(
            svobs_rows_to_observations, batch_format="pyarrow", batch_size=None
        )
        counters.merge(stat_check(obs))
    if resume:
        with open(manifest_path + ".tmp", "w") as f:
            json.dump(
                {
                    "fingerprint": fingerprint(),
                    "counters": [
                        [level, counter, n]
                        for (level, counter), n in sorted(counters.counts.items())
                    ],
                },
                f,
            )
        os.replace(manifest_path + ".tmp", manifest_path)
    if report_path:
        counters.write_report(report_path)
    return ray.data.read_parquet(out_dir), counters


def genmcf_run_many(
    tmcf_path: str,
    csv_paths: list[str],
    out_dir: str,
    report_path: str | None = None,
    run_stat_checks: bool = True,
    pre_check: bool = True,
    **kwargs,
):
    """Multi-CSV genmcf with PER-FILE shard resume.

    The reference tool's lifecycle is per input file
    (Processor.java:263-405 — one TMCF applied to each CSV in turn), so
    a CSV file is the natural shard boundary. Each shard builds into
    ``<out_dir>/_tmp-<id>`` and is atomically renamed to
    ``<out_dir>/shard=<id>/``; ``manifest.jsonl`` records the input +
    options fingerprint AND the shard's counters, so a rerun skips
    finished shards without recomputing their counter contributions.

    Returns (nodes Dataset over all shards, merged CounterSet, summary
    dict with shards/skipped/built).
    """
    import shutil
    import time

    import ray.data

    from import_ray.state.counters import LEVEL_FATAL
    from import_ray.state.lineage import (
        append_manifest,
        input_fingerprint,
        load_manifest,
    )

    os.makedirs(out_dir, exist_ok=True)
    manifest = load_manifest(out_dir)
    opts_fp = repr(
        (
            run_stat_checks,
            pre_check,
            sorted(
                (k, sorted(map(repr, v)) if isinstance(v, (set, frozenset)) else repr(v))
                for k, v in kwargs.items()
            ),
        )
    )
    total = CounterSet()
    summary = {"shards": len(csv_paths), "skipped": 0, "built": 0}
    shard_dirs: list[str] = []
    for idx, csv_path in enumerate(sorted(csv_paths)):
        shard_id = f"{idx:05d}"
        fp = input_fingerprint([tmcf_path, csv_path]) + ":" + opts_fp
        final_dir = os.path.join(out_dir, f"shard={shard_id}")
        prev = manifest.get(shard_id)
        if prev and prev.get("fingerprint") == fp and os.path.isdir(final_dir):
            for level, counter, n in prev.get("counters", []):
                total.add(level, counter, n=n)
            summary["skipped"] += 1
            shard_dirs.append(final_dir)
            continue
        tmp_dir = os.path.join(out_dir, f"_tmp-{shard_id}")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(final_dir, ignore_errors=True)
        t0 = time.time()
        nodes, counters = genmcf_run(
            tmcf_path,
            csv_path,
            tmp_dir,
            run_stat_checks=run_stat_checks,
            pre_check=pre_check,
            resume=False,
            **kwargs,
        )
        total.merge(counters)
        if counters.level_counters(LEVEL_FATAL):
            # reference semantics: abort the whole run on FATAL
            shutil.rmtree(tmp_dir, ignore_errors=True)
            break
        os.rename(tmp_dir, final_dir)
        shard_dirs.append(final_dir)
        append_manifest(
            out_dir,
            {
                "shard_id": shard_id,
                "inputs": [tmcf_path, csv_path],
                "fingerprint": fp,
                "counters": [
                    [level, counter, n]
                    for (level, counter), n in sorted(counters.counts.items())
                ],
                "wall_sec": round(time.time() - t0, 3),
                "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            },
        )
        summary["built"] += 1
    if report_path:
        total.write_report(report_path)
    if not shard_dirs:
        empty = ray.data.from_arrow(
            pa.table(
                {
                    "scope": pa.array([], pa.string()),
                    "node_id": pa.array([], pa.string()),
                    "prop": pa.array([], pa.large_string()),
                    "value": pa.array([], pa.large_string()),
                    "value_type": pa.array([], pa.int8()),
                    "failed": pa.array([], pa.bool_()),
                }
            )
        )
        return empty, total, summary
    # read_parquet doesn't expand directories inside a path LIST
    import glob as _glob

    files: list[str] = []
    for d in shard_dirs:
        files.extend(sorted(_glob.glob(os.path.join(d, "*.parquet"))))
    return ray.data.read_parquet(files), total, summary


def genmcf_report(
    tmcf_path: str,
    csv_path: str,
    report_path: str | None = None,
    run_stat_checks: bool = True,
    **kwargs,
):
    """Golden/test helper for SMALL fixtures: runs the streaming
    ``genmcf_run`` into a scratch dir and collects the node rows as a
    list. The at-scale surface is ``genmcf_run`` (no driver collect)."""
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="genmcf_nodes_", dir="/tmp")
    nodes, counters = genmcf_run(
        tmcf_path,
        csv_path,
        out_dir,
        report_path=report_path,
        run_stat_checks=run_stat_checks,
        **kwargs,
    )
    from import_ray.core.context import take_all_bounded

    node_rows = [
        r
        for r in take_all_bounded(nodes, "genmcf: resolved node rows")
        if r["node_id"] != ResolveScopes.COUNTER_SENTINEL
    ]
    return node_rows, counters


def genmcf_instance(
    mcf_paths: list[str],
    external_id_map: dict | None = None,
    coordinates_map: dict | None = None,
    name_map: dict | None = None,
) -> tuple[Graph, Graph, list]:
    """Instance-MCF path (driver-side; instance files are small schema
    inputs in the reference tool). Returns (resolved, failed, issues)."""
    graphs = []
    issues: list = []
    for p in mcf_paths:
        r = parse_mcf_file(p)
        issues.extend(r.issues)
        graphs.append(r.graph)
    merged = merge_graphs(graphs)
    mutate_graph(merged, issues)
    res = resolve_graph(
        merged,
        id_resolver=make_external_id_resolver(
            external_id_map, coordinates_map, name_map
        ),
    )
    issues.extend(res.issues)
    return res.resolved, res.failed, issues


def nodes_rows_to_graph(batch_or_table: pa.Table, include_failed: bool = False) -> Graph:
    """Collect node-PV rows back into a Graph (test/golden helper)."""
    g: Graph = {}
    failed_col = (
        batch_or_table["failed"].to_pylist()
        if "failed" in batch_or_table.column_names
        else [False] * len(batch_or_table)
    )
    for node_id, prop, value, vtype, failed in zip(
        batch_or_table["node_id"].to_pylist(),
        batch_or_table["prop"].to_pylist(),
        batch_or_table["value"].to_pylist(),
        batch_or_table["value_type"].to_pylist(),
        failed_col,
    ):
        if node_id == ResolveScopes.COUNTER_SENTINEL:
            continue
        if failed and not include_failed:
            continue
        g.setdefault(node_id, {}).setdefault(prop, []).append((value, int(vtype)))
    return g
