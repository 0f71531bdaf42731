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
