"""Simple-importer run orchestration: lifecycle integration over the
reference's runner sv_nl_sentences input (config + variablePerRow CSV +
schema MCF)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

CASE = "/root/reference/simple/tests/stats/test_data/runner/input/sv_nl_sentences"


def test_run_simple_import_lifecycle(ray_session, tmp_path):
    from import_ray.pipelines.simple_runner import run_simple_import

    out_dir = str(tmp_path / "out")
    artifacts = run_simple_import(CASE, out_dir)

    # observations parquet (4 rows from the variablePerRow CSV)
    import pyarrow.dataset as pads

    obs = pads.dataset(artifacts["observations"]).to_table().to_pandas()
    assert len(obs) == 4
    assert set(obs["entity"]) == {"country/IND", "country/CHN"}
    assert set(obs["variable"]) == {"var1", "var2"}

    # triples include schema MCF nodes + synthesized StatVar triples
    triples = pads.dataset(artifacts["triples"]).to_table().to_pandas()
    assert (
        (triples["subject_id"] == "var1")
        & (triples["predicate"] == "name")
        & (triples["object_value"] == "Variable1 Name")
    ).any()
    assert (
        (triples["subject_id"] == "topic1") & (triples["predicate"] == "typeOf")
    ).any()

    # NL sentences follow nl.py semantics: searchDescription wins over name
    sent = pd.read_csv(os.path.join(artifacts["nl"], "sentences.csv"))
    by_dcid = dict(zip(sent["dcid"], sent["sentence"]))
    assert by_dcid["var1"] == "Variable1 Name"
    assert (
        by_dcid["var2"]
        == "Variable2 Search Description1;Variable2 Search Description2"
    )
    assert by_dcid["topic1"] == "Topic1 Name"

    # topic cache matches the reference runner golden (topics only)
    got_cache = json.load(
        open(os.path.join(artifacts["nl"], "custom_dc_topic_cache.json"))
    )
    want_cache = json.load(
        open(
            "/root/reference/simple/tests/stats/test_data/runner/expected/"
            "sv_nl_sentences/nl/custom_dc_topic_cache.json"
        )
    )
    assert got_cache == want_cache

    # SVG hierarchy triples exist for the SVs (schema-less: poptype Thing)
    svg = pads.dataset(artifacts["svg_triples"]).to_table().to_pandas()
    assert (
        (svg["predicate"] == "memberOf") & (svg["subject_id"] == "var1")
    ).any()

    # process report written
    rep = json.load(open(artifacts["report"]))
    assert "levelSummary" in rep


def test_svg_uses_schema_names(ray_session, tmp_path):
    """SVG names resolve through schema name triples
    (runner.py:857-861 get_schema_names semantics)."""
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "obs.csv").write_text(
        "entity,variable,date,value\ncountry/IND,sv1,2020,5\n"
    )
    (tmp_path / "in" / "schema.mcf").write_text(
        "Node: dcid:sv1\n"
        "typeOf: dcs:StatisticalVariable\n"
        "populationType: dcs:Person\n"
        "gender: dcs:Female\n\n"
        "Node: dcid:Female\n"
        'typeOf: dcs:Class\nname: "Woman"\n'
    )
    from import_ray.pipelines.simple_runner import run_simple_import

    artifacts = run_simple_import(
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        config={
            "inputFiles": {
                "obs.csv": {"importType": "observations", "format": "variablePerRow"}
            }
        },
    )
    import pyarrow.dataset as pads

    svg = pads.dataset(artifacts["svg_triples"]).to_table().to_pandas()
    names = dict(
        zip(
            svg[svg["predicate"] == "name"]["subject_id"],
            svg[svg["predicate"] == "name"]["object_value"],
        )
    )
    # the Female value renders with its schema name "Woman"
    assert names["c/g/Person_Gender-Female"] == "Person With Gender = Woman"


def test_write_db_sqlite_artifact(ray_session, tmp_path):
    """write_db=True emits the Custom-DC sqlite: triples/observations
    row counts match the parquet artifacts; StatVarGroups cache and an
    imports row are present (db.py:88-147, svg_cache.py:34-44)."""
    import sqlite3

    import pyarrow.dataset as pads

    from import_ray.pipelines.simple_runner import run_simple_import

    out_dir = str(tmp_path / "out")
    artifacts = run_simple_import(CASE, out_dir, write_db=True)
    conn = sqlite3.connect(artifacts["db"])

    n_obs_pq = len(pads.dataset(artifacts["observations"]).to_table())
    n_tr_pq = len(pads.dataset(artifacts["triples"]).to_table())
    n_svg_pq = len(pads.dataset(artifacts["svg_triples"]).to_table())
    assert conn.execute("select count(*) from observations").fetchone()[0] == n_obs_pq
    assert (
        conn.execute("select count(*) from triples").fetchone()[0]
        == n_tr_pq + n_svg_pq
    )

    # sample row equality vs parquet
    obs = pads.dataset(artifacts["observations"]).to_table().to_pandas()
    row = obs.sort_values(["entity", "variable", "date"]).iloc[0]
    got = conn.execute(
        "select entity, variable, date, value from observations "
        "order by entity, variable, date limit 1"
    ).fetchone()
    assert got == (row["entity"], row["variable"], row["date"], row["value"])

    # key_value_store: StatVarGroups cache decodes to our proto bytes
    (kv,) = conn.execute(
        "select value from key_value_store where lookup_key = 'StatVarGroups'"
    ).fetchone()
    import base64
    import gzip as _gzip

    raw = _gzip.decompress(base64.b64decode(kv))
    assert raw  # non-empty proto payload

    (status,) = conn.execute("select status from imports").fetchone()
    assert status == "SUCCESS"
    conn.close()


def test_svg_cache_proto_decodes_with_reference_schema(ray_session):
    """Hand-encoded StatVarGroups bytes must parse under the reference's
    published proto schema (cache_data.proto) with the same content."""
    import sys

    sys.path.insert(0, "/root/reference/simple")
    try:
        from proto.cache_data_pb2 import StatVarGroups
    except Exception:
        import pytest as _pytest

        _pytest.skip("reference pb2/protobuf unavailable")
    finally:
        sys.path.remove("/root/reference/simple")

    from import_ray.sources.db_sink import (
        build_svg_cache_nodes,
        encode_stat_var_groups,
    )

    svg_triples = [
        {"subject_id": "c/g/Root", "predicate": "name",
         "object_id": "", "object_value": "Custom Variables"},
        {"subject_id": "c/g/1", "predicate": "name",
         "object_id": "", "object_value": "Group One"},
        {"subject_id": "c/g/1", "predicate": "specializationOf",
         "object_id": "c/g/Root", "object_value": ""},
    ]
    sv_triples = [
        {"subject_id": "sv1", "predicate": "name",
         "object_id": "", "object_value": "SV One"},
        {"subject_id": "sv1", "predicate": "description",
         "object_id": "", "object_value": "first var"},
        {"subject_id": "sv1", "predicate": "memberOf",
         "object_id": "c/g/1", "object_value": ""},
    ]
    data = encode_stat_var_groups(build_svg_cache_nodes(svg_triples, sv_triples))
    msg = StatVarGroups()
    msg.ParseFromString(data)
    assert set(msg.stat_var_groups.keys()) == {"c/g/Root", "c/g/1"}
    root = msg.stat_var_groups["c/g/Root"]
    assert root.absolute_name == "Custom Variables"
    assert [c.id for c in root.child_stat_var_groups] == ["c/g/1"]
    g1 = msg.stat_var_groups["c/g/1"]
    assert g1.absolute_name == "Group One"
    (sv,) = g1.child_stat_vars
    assert sv.id == "sv1"
    assert sv.display_name == "SV One"
    assert list(sv.search_names) == ["SV One", "first var"]


def test_schemaupdate_mode_skips_imports(ray_session, tmp_path):
    """schemaupdate creates/updates the sqlite tables without running
    any data imports (runner.py:382-383)."""
    import sqlite3

    from import_ray.pipelines.simple_runner import run_simple_import

    out_dir = str(tmp_path / "out")
    artifacts = run_simple_import(
        str(tmp_path), out_dir, mode="schemaupdate"  # no config.json needed
    )
    assert "observations" not in artifacts
    conn = sqlite3.connect(artifacts["db"])
    tables = {
        r[0]
        for r in conn.execute(
            "select name from sqlite_master where type='table'"
        ).fetchall()
    }
    assert {"triples", "observations", "key_value_store", "imports"} <= tables
    assert conn.execute("select count(*) from triples").fetchone()[0] == 0
    conn.close()


def test_maindc_mode_output_layout(ray_session, tmp_path):
    """maindc writes per-input observation CSVs + observations.tmcf +
    schema.mcf restricted to SV/SVG nodes (db.py:273-345 MainDcDb)."""
    from import_ray.pipelines.simple_runner import run_simple_import

    out_dir = str(tmp_path / "out")
    artifacts = run_simple_import(CASE, out_dir, mode="maindc")
    paths = artifacts["maindc"]

    with open(paths["observations_tmcf"]) as f:
        tmcf = f.read()
    assert "typeOf: dcs:StatVarObservation" in tmcf
    assert "value: C:Table->value" in tmcf

    with open(paths["schema_mcf"]) as f:
        mcf = f.read()
    assert "Node: dcid:var1" in mcf
    assert "typeOf: StatisticalVariable" in mcf
    # non-SV/SVG nodes (topics) excluded from schema.mcf
    assert "Node: dcid:topic1" not in mcf
    # includedIn is blocklisted from MCF output
    assert "includedIn" not in mcf

    assert paths["observation_csvs"], "per-file CSVs written"
    df = pd.read_csv(paths["observation_csvs"][0])
    assert list(df.columns) == ["entity", "variable", "date", "value"]
    assert len(df) == 4
    # no SVG hierarchy for maindc
    assert "svg_triples" not in artifacts


def test_dcpbridge_mode_jsonld_export(ray_session, tmp_path):
    """dcpbridge exports one JSON-LD doc per subject as sharded JSON
    (runner.py:1144-1156 semantics)."""
    import glob

    from import_ray.pipelines.simple_runner import run_simple_import

    out_dir = str(tmp_path / "out")
    artifacts = run_simple_import(CASE, out_dir, mode="dcpbridge")
    files = glob.glob(os.path.join(artifacts["jsonld"], "*.json"))
    assert files
    docs = []
    for p in files:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line:
                    docs.append(json.loads(line)["jsonld"])
    parsed = [json.loads(d) for d in docs]
    by_id = {d["@id"]: d for d in parsed}
    assert "var1" in by_id
    assert "StatisticalVariable" in by_id["var1"]["@type"]
    # ref-valued predicates carry @id, text-valued carry @value
    assert {"@value": "Variable1 Name"} in by_id["var1"]["name"]


def test_blue_green_transfer_and_rollback(tmp_path):
    """transfer_db: full copy with count validation; a validation
    failure rolls back leaving the serving DB's previous content
    intact (the blue-green guarantee)."""
    import sqlite3

    from import_ray.sources.db_sink import (
        _INIT_STATEMENTS,
        get_blue_green_config_from_env,
        transfer_db,
    )

    build = str(tmp_path / "build.db")
    serving = str(tmp_path / "serving.db")
    conn = sqlite3.connect(build)
    for stmt in _INIT_STATEMENTS:
        conn.execute(stmt)
    conn.executemany(
        "insert into triples values(?, ?, ?, ?)",
        [("s1", "typeOf", "City", ""), ("s2", "name", "", "Austin")],
    )
    conn.executemany(
        "insert into observations values(?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
        [("geoId/06", "Count_Person", "2020", "39", "p", "", "", "", "", "")],
    )
    conn.execute("insert into key_value_store values(?, ?)", ("k", "v"))
    conn.commit()
    conn.close()

    counts = transfer_db(build, serving, expected_obs=1, expected_triples=2,
                         expected_kv=1)
    assert counts == {"observations": 1, "triples": 2, "key_value_store": 1}
    sv = sqlite3.connect(serving)
    assert sv.execute("select count(*) from triples").fetchone()[0] == 2
    # indexes recreated after commit
    names = {r[0] for r in sv.execute(
        "select name from sqlite_master where type='index'")}
    assert "triples_subject_id" in names and "observations_variable" in names
    sv.close()

    # failed validation: serving keeps its previous (good) content
    import pytest

    with pytest.raises(RuntimeError, match="Triple count mismatch"):
        transfer_db(build, serving, expected_triples=99)
    sv = sqlite3.connect(serving)
    assert sv.execute("select count(*) from triples").fetchone()[0] == 2
    assert sv.execute("select count(*) from key_value_store").fetchone()[0] == 1
    # the rollback must also restore the indexes: the index drops in
    # BulkImportContext.__enter__ run inside the explicit BEGIN, so a
    # failed transfer leaves the serving DB fully intact, indexes
    # included (ADVICE r4: without BEGIN the drops autocommitted).
    names = {r[0] for r in sv.execute(
        "select name from sqlite_master where type='index'")}
    assert "triples_subject_id" in names and "observations_variable" in names
    sv.close()

    # env config gate (db.py:1050-1070)
    import os

    assert get_blue_green_config_from_env() == {"enabled": False}
    os.environ["ENABLE_BLUE_GREEN_IMPORT"] = "true"
    try:
        cfg = get_blue_green_config_from_env()
        assert cfg["enabled"] and cfg["local_sqlite_path"]
    finally:
        del os.environ["ENABLE_BLUE_GREEN_IMPORT"]
