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
) -> dict:
    """Run the full Simple-importer lifecycle; returns artifact paths +
    the run CounterSet."""
    import ray.data

    if config is None:
        with open(os.path.join(input_dir, "config.json")) as f:
            config = json.load(f)

    counters = CounterSet()
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
            for r in triples_ds.map_batches(
                lambda b: b.filter(
                    pc.and_(
                        pc.equal(b["predicate"], "typeOf"),
                        pc.equal(b["object_id"], "StatisticalVariable"),
                    )
                ).select(["subject_id"]),
                batch_format="pyarrow",
            ).take_all()
        }
        sv_arr = np.array(sorted(sv_subjects), dtype=object)

        def sv_ref_dcids(b: pa.Table) -> pa.Table:
            keep = np.isin(b["subject_id"].to_numpy(zero_copy_only=False), sv_arr)
            return b.filter(pa.array(keep)).select(["predicate", "object_id"])

        candidates: set[str] = set()
        for r in triples_ds.map_batches(sv_ref_dcids, batch_format="pyarrow").take_all():
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
            for r in triples_ds.map_batches(name_triples, batch_format="pyarrow").take_all()
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
            for r in triples_ds.map_batches(
                typed_subjects, batch_format="pyarrow"
            ).take_all()
        }
        subj_arr = np.array(sorted(subj), dtype=object)

        def only_nl_subjects(b: pa.Table) -> pa.Table:
            keep = np.isin(
                b["subject_id"].to_numpy(zero_copy_only=False), subj_arr
            )
            return b.filter(pa.array(keep))

        triple_rows = triples_ds.map_batches(
            only_nl_subjects, batch_format="pyarrow"
        ).take_all()
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

    process_dir = os.path.join(output_dir, "process")
    os.makedirs(process_dir, exist_ok=True)
    counters.write_report(os.path.join(process_dir, "report.json"))
    artifacts["report"] = os.path.join(process_dir, "report.json")
    return artifacts
