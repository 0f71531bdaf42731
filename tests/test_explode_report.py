"""Triple explosion, mcf_to_triples, and genmcf report counters."""

from __future__ import annotations

import os

REF = "/root/reference/tool/src/test/resources/org/datacommons/tool/genmcf"


def test_graph_to_triples():
    from import_ray.sources.mcf import parse_mcf_string
    from import_ray.stages.explode import graph_to_triples

    mcf = (
        "Node: dcid:Count_Person\n"
        "typeOf: dcs:StatisticalVariable\n"
        "populationType: dcs:Person\n"
        'name: "Count of Person"\n'
    )
    g = parse_mcf_string(mcf).graph
    rows = graph_to_triples(g, provenance="p1")
    got = {(r[0], r[1], r[2], r[3]) for r in rows}
    assert ("Count_Person", "typeOf", "StatisticalVariable", None) in got
    assert ("Count_Person", "populationType", "Person", None) in got
    assert ("Count_Person", "name", None, "Count of Person") in got
    # dcid prop itself not re-emitted
    assert not any(r[1] == "dcid" for r in rows)


def test_mcf_to_triples_4tuples():
    from import_ray.stages.explode import mcf_to_triples

    mcf = (
        "Node: dcid:geoId/06\n"
        "typeOf: dcs:State\n"
        'name: "California"\n'
    )
    triples = mcf_to_triples(mcf)
    assert ["dcid:geoId/06", "dcid", "geoId/06", "VALUE"] in triples
    assert ["dcid:geoId/06", "typeOf", "State", "ID"] in triples
    assert ["dcid:geoId/06", "name", "California", "VALUE"] in triples


def test_object_value_key():
    from import_ray.stages.explode import object_value_key

    k = object_value_key("  some long literal value here  ")
    prefix, h = k.split(":", 1)
    assert prefix == "some long litera"  # first 16 chars of trimmed value
    import base64

    assert len(base64.b64decode(h)) == 32  # sha256


def test_explode_genmcf_output(ray_session):
    from import_ray.pipelines.genmcf import genmcf_table_ds
    from import_ray.stages.explode import explode_nodes

    base = os.path.join(REF, "statchecks")
    ds = genmcf_table_ds(
        os.path.join(base, "input", "covid.tmcf"),
        os.path.join(base, "input", "covid.csv"),
        external_id_map={},
    )
    triples = ds.map_batches(explode_nodes, batch_format="pyarrow")
    rows = triples.take_all()
    assert rows
    subjects = {r["subject_id"] for r in rows}
    assert any(s.startswith("dc/o/") for s in subjects)
    # exactly one of object_id/object_value per row
    assert all((r["object_id"] is None) != (r["object_value"] is None) for r in rows)


def test_genmcf_report_counters(ray_session, tmp_path):
    import json

    from import_ray.pipelines.genmcf import genmcf_report

    base = os.path.join(REF, "manyinconsistent")
    report_path = str(tmp_path / "report.json")
    node_rows, counters = genmcf_report(
        os.path.join(base, "input", "acre.tmcf"),
        os.path.join(base, "input", "acre.csv"),
        report_path=report_path,
        external_id_map={},
    )
    assert node_rows
    rep = json.load(open(report_path))
    assert "levelSummary" in rep


def test_genmcf_run_resume(ray_session, tmp_path):
    """genmcf_run manifest resume: second run with unchanged inputs
    reuses the written parquet without recomputing."""
    import json

    from import_ray.pipelines.genmcf import genmcf_run

    base = os.path.join(REF, "statchecks")
    out_dir = str(tmp_path / "nodes")
    nodes1, counters1 = genmcf_run(
        os.path.join(base, "input", "covid.tmcf"),
        os.path.join(base, "input", "covid.csv"),
        out_dir,
        external_id_map={},
    )
    n1 = nodes1.count()
    manifest = out_dir + ".manifest.json"
    assert os.path.exists(manifest)
    mtimes = {
        f: os.path.getmtime(os.path.join(out_dir, f)) for f in os.listdir(out_dir)
    }

    nodes2, counters2 = genmcf_run(
        os.path.join(base, "input", "covid.tmcf"),
        os.path.join(base, "input", "covid.csv"),
        out_dir,
        external_id_map={},
    )
    assert nodes2.count() == n1
    assert dict(counters2.counts) == dict(counters1.counts)
    # outputs untouched on resume
    assert mtimes == {
        f: os.path.getmtime(os.path.join(out_dir, f)) for f in os.listdir(out_dir)
    }
