"""Simple Stats Importer run orchestration — the reference's
``simple/stats/runner.py`` lifecycle (config load → per-file imports →
MCF schema import → SVG hierarchy → NL artifacts → reports), DB-free:
parquet directories stand in for the triples/observations tables
(SURVEY §3.2; DB/CloudSQL out of scope).

Flow (all Ray Data until the schema-scale artifacts):

1. ``config.json`` (argument or ``<input_dir>/config.json``);
2. CSV input files → :func:`run_config_import_ray` (streaming
   observations + triples Datasets, header pre-pass, broadcast
   resolver, S2 entity types);
3. ``*.mcf`` schema files → triples via the MCF parser
   (mcf_importer semantics);
4. observations/triples → partitioned parquet under ``output_dir``;
5. SVG hierarchy (optional; ``vertical_specs.json`` honored) →
   ``svg_triples`` parquet (stat_var_hierarchy_generator semantics);
6. NL artifacts: SV+Topic sentences, Topic/StatVarPeerGroup topic
   cache (nl.py semantics) under ``<output_dir>/nl``;
7. ``process/report.json`` counters.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa

from import_ray.core.context import take_all_bounded
from import_ray.pipelines.config_import import run_config_import_ray
from import_ray.stages import nl as nl_stage
from import_ray.stages.explode import mcf_to_triples
from import_ray.stages.svg_hierarchy import generate_svg_hierarchy, load_vertical_specs
from import_ray.state.counters import LEVEL_INFO, CounterSet

_TRIPLE_COLS = ["subject_id", "predicate", "object_id", "object_value"]


def _mcf_triples_table(input_dir: str) -> pa.Table:
    rows = []
    for fname in sorted(os.listdir(input_dir)):
        if not fname.endswith(".mcf"):
            continue
        with open(os.path.join(input_dir, fname)) as f:
            for s, p, o, t in mcf_to_triples(f.read()):
                if p == "dcid":
                    continue
                from import_ray.core.model import strip_namespace

                rows.append(
                    {
                        "subject_id": strip_namespace(s),
                        "predicate": p,
                        "object_id": o if t == "ID" else "",
                        "object_value": o if t == "VALUE" else "",
                    }
                )
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {c: pa.array([], pa.string()) for c in _TRIPLE_COLS}
    )


def _subject_types(triples: list[dict]) -> dict[str, set]:
    types: dict[str, set] = {}
    for t in triples:
        if t["predicate"] == "typeOf" and t.get("object_id"):
            types.setdefault(t["subject_id"], set()).add(t["object_id"])
    return types


def run_simple_import(
    input_dir: str,
    output_dir: str,
    config: dict | None = None,
    resolver_map: dict | None = None,
    entity_type_map: dict | None = None,
    generate_svg: bool = True,
    generate_nl: bool = True,
    mode: str = "customdc",
    write_db: bool = False,
) -> dict:
    """Run the full Simple-importer lifecycle; returns artifact paths +
    the run CounterSet.

    Modes (runner.py:79-83,367-400 RunMode):
    - ``customdc`` (default): full import; with ``write_db=True`` also
      emits the Custom-DC sqlite artifact (triples/observations/
      StatVarGroups cache/imports tables) at
      ``<output_dir>/datacommons.db``.
    - ``schemaupdate``: SKIP all data imports; only create/upgrade the
      sqlite tables in place (runner.py:382-383 "Skipping imports
      because run mode is schema update") and write the report. A
      missing config defaults to empty (runner.py:504-506).
    - ``maindc``: run imports, skip the SVG hierarchy (not supported
      for main DC, runner.py:833-835), and write the Main-DC layout —
      per-input observation CSVs + ``observations.tmcf`` +
      ``schema.mcf`` (db.py:273-345 MainDcDb) — instead of sqlite.
    - ``dcpbridge``: run imports and export triples as sharded JSON-LD
      docs (runner.py:1144-1156 ``_run_imports_and_export_jsonld`` /
      ``jsonld_stream_db.py``) under ``<output_dir>/jsonld``.
    """
    import ray.data

    if mode not in ("customdc", "schemaupdate", "maindc", "dcpbridge"):
        raise ValueError(f"unsupported mode: {mode!r}")

    if config is None:
        cfg_path = os.path.join(input_dir, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                config = json.load(f)
        elif mode == "schemaupdate":
            config = {}  # schemaupdate tolerates a missing config
        else:
            with open(cfg_path) as f:  # raise the FileNotFoundError
                config = json.load(f)

    counters = CounterSet()

    if mode == "schemaupdate":
        from import_ray.sources.db_sink import SqliteSink

        os.makedirs(output_dir, exist_ok=True)
        artifacts: dict = {}
        db_path = os.path.join(output_dir, "datacommons.db")
        # create missing tables / add missing columns, keep data
        sink = SqliteSink(db_path, clear=False)
        sink.commit_and_close()
        artifacts["db"] = db_path
        process_dir = os.path.join(output_dir, "process")
        os.makedirs(process_dir, exist_ok=True)
        counters.add(LEVEL_INFO, "SchemaUpdateOnly", n=1)
        counters.write_report(os.path.join(process_dir, "report.json"))
        artifacts["report"] = os.path.join(process_dir, "report.json")
        artifacts["counters"] = counters
        return artifacts

    if mode == "maindc":
        generate_svg = False
    out = run_config_import_ray(
        input_dir, config, resolver_map=resolver_map, entity_type_map=entity_type_map
    )

    obs_dir = os.path.join(output_dir, "observations")
    triples_dir = os.path.join(output_dir, "triples")
    out["observations"].write_parquet(obs_dir)

    schema_tbl = _mcf_triples_table(input_dir)
    triples_ds = out["triples"].select_columns(_TRIPLE_COLS)
    if len(schema_tbl):
        import pyarrow.compute as pc

        # MCF schema wins over schema-less StatVar synthesis: drop the
        # synthesized defaults for any subject the schema defines
        # (simple/stats/data.py:125-138 — synthesis applies only to
        # variables WITHOUT schema nodes)
        schema_subjects = pa.array(
            sorted(set(schema_tbl["subject_id"].to_pylist()))
        )
        synth_preds = pa.array(
            ["typeOf", "populationType", "measuredProperty", "statType", "name"]
        )

        def drop_shadowed(b: pa.Table) -> pa.Table:
            mask = pc.and_(
                pc.is_in(b["subject_id"], value_set=schema_subjects),
                pc.is_in(b["predicate"], value_set=synth_preds),
            )
            return b.filter(pc.invert(mask))

        triples_ds = triples_ds.map_batches(
            drop_shadowed, batch_format="pyarrow"
        ).union(ray.data.from_arrow(schema_tbl))
    triples_ds = triples_ds.materialize()
    triples_ds.write_parquet(triples_dir)

    artifacts = {
        "observations": obs_dir,
        "triples": triples_dir,
        "counters": counters,
    }
    counters.add(LEVEL_INFO, "NumObservations", n=out["observations"].count())
    counters.add(LEVEL_INFO, "NumTriples", n=triples_ds.count())

    # --- SVG hierarchy (runner.py:_generate_svg_hierarchy) ---------------
    if generate_svg:
        import numpy as np
        import pyarrow.compute as pc

        specs = []
        # specialFiles: config `verticalSpecsFile` names the specs file,
        # falling back to vertical_specs.json (runner.py:848-855)
        specs_name = config.get("verticalSpecsFile", "vertical_specs.json")
        specs_path = os.path.join(input_dir, specs_name)
        if os.path.exists(specs_path):
            with open(specs_path) as f:
                specs = load_vertical_specs(f.read())

        # schema names for SVG naming (runner.py:857-861 get_schema_names):
        # dcids referenced by SV property values + vertical specs → their
        # name triples, collected via a distributed filter
        sv_subjects = {
            r["subject_id"]
            for r in take_all_bounded(
                triples_ds.map_batches(
                    lambda b: b.filter(
                        pc.and_(
                            pc.equal(b["predicate"], "typeOf"),
                            pc.equal(b["object_id"], "StatisticalVariable"),
                        )
                    ).select(["subject_id"]),
                    batch_format="pyarrow",
                ),
                "simple_runner: StatisticalVariable subjects",
            )
        }
        sv_arr = np.array(sorted(sv_subjects), dtype=object)

        def sv_ref_dcids(b: pa.Table) -> pa.Table:
            keep = np.isin(b["subject_id"].to_numpy(zero_copy_only=False), sv_arr)
            return b.filter(pa.array(keep)).select(["predicate", "object_id"])

        candidates: set[str] = set()
        for r in take_all_bounded(
            triples_ds.map_batches(sv_ref_dcids, batch_format="pyarrow"),
            "simple_runner: SV-referenced dcids",
        ):
            if r["predicate"]:
                candidates.add(r["predicate"])
            if r["object_id"]:
                candidates.add(r["object_id"])
        for spec in specs:
            candidates.add(spec["population_type"])
            candidates |= set(spec["verticals"]) | set(spec["measured_properties"])
        cand_arr = np.array(sorted(candidates), dtype=object)

        def name_triples(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b["predicate"], "name"))
            keep = np.isin(t["subject_id"].to_numpy(zero_copy_only=False), cand_arr)
            return t.filter(pa.array(keep)).select(["subject_id", "object_value"])

        dcid2name = {
            r["subject_id"]: r["object_value"]
            for r in take_all_bounded(
                triples_ds.map_batches(name_triples, batch_format="pyarrow"),
                "simple_runner: schema name triples",
            )
            if r["object_value"]
        }

        svg_dir = os.path.join(output_dir, "svg_triples")
        svg = generate_svg_hierarchy(
            triples_ds, vertical_specs=specs, dcid2name=dcid2name
        )
        svg.write_parquet(svg_dir)
        artifacts["svg_triples"] = svg_dir

    # --- NL artifacts (runner.py:_generate_nl_artifacts) -----------------
    if generate_nl:
        import numpy as np
        import pyarrow.compute as pc

        nl_dir = os.path.join(output_dir, "nl")
        # distributed pre-filter: only triples of SV/Topic/SVPG subjects
        # ever reach the driver (schema-scale), however large the
        # entity/event triple set is
        nl_types = pa.array(["StatisticalVariable", "Topic", "StatVarPeerGroup"])

        def typed_subjects(b: pa.Table) -> pa.Table:
            return b.filter(
                pc.and_(
                    pc.equal(b["predicate"], "typeOf"),
                    pc.is_in(b["object_id"], value_set=nl_types),
                )
            ).select(["subject_id"])

        subj = {
            r["subject_id"]
            for r in take_all_bounded(
                triples_ds.map_batches(typed_subjects, batch_format="pyarrow"),
                "simple_runner: NL-typed subjects",
            )
        }
        subj_arr = np.array(sorted(subj), dtype=object)

        def only_nl_subjects(b: pa.Table) -> pa.Table:
            keep = np.isin(
                b["subject_id"].to_numpy(zero_copy_only=False), subj_arr
            )
            return b.filter(pa.array(keep))

        triple_rows = take_all_bounded(
            triples_ds.map_batches(only_nl_subjects, batch_format="pyarrow"),
            "simple_runner: NL subject triples",
        )
        types = _subject_types(triple_rows)

        def of_types(allowed: set) -> list[dict]:
            return [
                t for t in triple_rows if types.get(t["subject_id"], set()) & allowed
            ]

        nl_stage.generate_nl_sentences(
            of_types({"StatisticalVariable", "Topic"}), nl_dir
        )
        topic_triples = of_types({"Topic", "StatVarPeerGroup"})
        if any("Topic" in types.get(t["subject_id"], set()) for t in topic_triples):
            nl_stage.generate_topic_cache(topic_triples, nl_dir)
        artifacts["nl"] = nl_dir

    # --- output layout: Main-DC files / JSON-LD / Custom-DC sqlite --------
    if mode == "dcpbridge":
        from import_ray.sources.db_sink import write_triples_jsonld

        artifacts["jsonld"] = write_triples_jsonld(
            triples_ds, os.path.join(output_dir, "jsonld")
        )
    elif mode == "maindc":
        import pyarrow.compute as pc

        from import_ray.sources.db_sink import write_main_dc_output

        obs_by_file: dict = {}
        order_files = out.get("order_files", {})
        obs_order = out.get("observations_with_order")
        if obs_order is not None:
            for order, fname in sorted(order_files.items()):
                sub = obs_order.filter(expr=f"file_order == {int(order)}")
                if sub.count():
                    obs_by_file[fname] = sub.select_columns(
                        ["entity", "variable", "date", "value"]
                    ).to_pandas()
        maindc_dir = os.path.join(output_dir, "maindc")
        paths = write_main_dc_output(maindc_dir, triples_ds, obs_by_file)
        artifacts["maindc"] = paths
    elif write_db:
        from import_ray.sources.db_sink import (
            STAT_VAR_GROUPS_CACHE_KEY,
            generate_svg_cache_value,
            write_sqlite_db,
        )

        db_path = os.path.join(output_dir, "datacommons.db")
        all_triples = triples_ds
        if generate_svg and "svg_triples" in artifacts:
            all_triples = all_triples.union(
                ray.data.read_parquet(artifacts["svg_triples"]).select_columns(
                    _TRIPLE_COLS
                )
            )
        # SVG cache (svg_cache.py:34-44): SVG + SV triples → proto blob
        import pyarrow.compute as pc

        def typed_rows(type_name: str) -> list[dict]:
            subj = {
                r["subject_id"]
                for r in take_all_bounded(
                    all_triples.map_batches(
                        lambda b, t=type_name: b.filter(
                            pc.and_(
                                pc.equal(b["predicate"], "typeOf"),
                                pc.equal(b["object_id"], t),
                            )
                        ).select(["subject_id"]),
                        batch_format="pyarrow",
                    ),
                    f"simple_runner: {type_name} subjects",
                )
            }
            if not subj:
                return []
            import numpy as np

            arr = np.array(sorted(subj), dtype=object)

            def keep(b):
                m = np.isin(b["subject_id"].to_numpy(zero_copy_only=False), arr)
                return b.filter(pa.array(m))

            return take_all_bounded(
                all_triples.map_batches(keep, batch_format="pyarrow"),
                f"simple_runner: {type_name} triples",
            )

        cache_val = generate_svg_cache_value(
            typed_rows("StatVarGroup"), typed_rows("StatisticalVariable")
        )
        counts = write_sqlite_db(
            db_path,
            triples_ds=all_triples,
            observations_ds=out["observations"],
            key_values={STAT_VAR_GROUPS_CACHE_KEY: cache_val},
        )
        counters.add(LEVEL_INFO, "NumDbTriples", n=counts["triples"])
        counters.add(LEVEL_INFO, "NumDbObservations", n=counts["observations"])
        artifacts["db"] = db_path

    process_dir = os.path.join(output_dir, "process")
    os.makedirs(process_dir, exist_ok=True)
    counters.write_report(os.path.join(process_dir, "report.json"))
    artifacts["report"] = os.path.join(process_dir, "report.json")
    return artifacts
