"""Config-driven import surface (simple importer semantics)."""

from __future__ import annotations

import pytest


@pytest.fixture()
def input_dir(tmp_path):
    (tmp_path / "countries.csv").write_text(
        "place,year,Count_Person,Median_Income\n"
        "India,2020,1380,2000\n"
        "India,2021,1393,2100\n"
        "USA,2020,331,65000\n"
        "USA,2021,NaN,67000\n"
    )
    (tmp_path / "variable_per_row.csv").write_text(
        "entity,variable,date,value\n"
        "country/IND,Count_Farm,2020,9000\n"
        "country/USA,Count_Farm,2020,2000\n"
    )
    (tmp_path / "floods.csv").write_text(
        "place,date,severity\n"
        "country/IND,2020-05-03,high\n"
        "country/IND,2020-05-20,low\n"
        "country/USA,2020-06-01,high\n"
    )
    (tmp_path / "authors.csv").write_text(
        "author_id,author_name,author_country\n"
        "a1,Alice,India\n"
        "a2,Bob,USA\n"
    )
    return str(tmp_path)


CONFIG = {
    "inputFiles": {
        "countries.csv": {
            "importType": "observations",
            "format": "variablePerColumn",
            "entityType": "Country",
            "provenance": "Prov1",
            "columnMappings": {
                "dcid:observationAbout": "place",
                "dcid:observationDate": "year",
            },
        },
        "variable_per_row.csv": {
            "importType": "observations",
            "format": "variablePerRow",
            "provenance": "Prov1",
        },
        "floods.csv": {
            "importType": "events",
            "eventType": "FloodEvent",
            "provenance": "Prov2",
            "aggregation": {"period": "month"},
        },
        "authors.csv": {
            "importType": "entities",
            "rowEntityType": "Author",
            "idColumn": "author_id",
            "columnsToResolve": ["author_country"],
            "provenance": "Prov2",
        },
    }
}

RESOLVER = {"India": "country/IND", "USA": "country/USA"}


def test_config_import(input_dir):
    from import_ray.pipelines.config_import import run_config_import

    out = run_config_import(input_dir, CONFIG, resolver_map=RESOLVER)
    obs = out["observations"]
    triples = out["triples"]

    # melt + resolve + invalid-value drop: 8 wide cells minus 1 NaN = 7
    wide = obs[obs["provenance"] == "Prov1"]
    assert len(wide[wide["variable"].isin(["Count_Person", "Median_Income"])]) == 7
    assert set(wide["entity"]) == {"country/IND", "country/USA"}
    row = wide[(wide["entity"] == "country/IND") & (wide["variable"] == "Count_Person") & (wide["date"] == "2020")]
    assert row["value"].iloc[0] == "1380"

    # variablePerRow
    assert len(wide[wide["variable"] == "Count_Farm"]) == 2

    # events: monthly counts
    ev = obs[obs["variable"] == "Count_FloodEvent"].set_index(["entity", "date"])
    assert ev.loc[("country/IND", "2020-05"), "value"] == "2"
    assert ev.loc[("country/USA", "2020-06"), "value"] == "1"

    # event triples with generated ids
    t = triples
    assert ((t["subject_id"] == "FloodEvent_0") & (t["predicate"] == "typeOf")).any()
    sev = t[(t["subject_id"] == "FloodEvent_0") & (t["predicate"] == "severity")]
    assert sev["object_value"].iloc[0] == "high"

    # entity rows + resolved ref column
    a1 = t[t["subject_id"] == "a1"]
    assert (a1[a1["predicate"] == "typeOf"]["object_id"] == "Author").all()
    assert (a1[a1["predicate"] == "author_country"]["object_id"] == "country/IND").all()

    # schema-less StatVar synthesis (data.py:125-138)
    sv = t[t["subject_id"] == "Count_Person"]
    got = dict(zip(sv["predicate"], sv["object_id"].fillna(sv["object_value"])))
    assert got["populationType"] == "Thing"
    assert got["measuredProperty"] == "Count_Person"
    assert got["statType"] == "measuredValue"

    # entity typeOf triples
    assert (
        (t["subject_id"] == "country/IND") & (t["predicate"] == "typeOf") & (t["object_id"] == "Country")
    ).any()


def test_unknown_import_type(input_dir):
    from import_ray.pipelines.config_import import run_config_import

    with pytest.raises(ValueError, match="unknown importType"):
        run_config_import(
            input_dir, {"inputFiles": {"countries.csv": {"importType": "bogus"}}}
        )


def test_s2cell_entity_resolution(tmp_path, ray_session):
    """entityType S2CellLevelN resolves lat#lng entities via the local
    S2 resolver (resolvers.py semantics)."""
    (tmp_path / "cells.csv").write_text(
        "place,year,Count_Event\n38.7#-119.4,2020,7\n"
    )
    from import_ray.pipelines.config_import import run_config_import

    out = run_config_import(
        str(tmp_path),
        {
            "inputFiles": {
                "cells.csv": {
                    "importType": "observations",
                    "format": "variablePerColumn",
                    "entityType": "S2CellLevel10",
                    "columnMappings": {
                        "dcid:observationAbout": "place",
                        "dcid:observationDate": "year",
                    },
                }
            }
        },
    )
    obs = out["observations"]
    assert set(obs["entity"]) == {"s2CellId/0x80982b0000000000"}
    t = out["triples"]
    assert (
        (t["subject_id"] == "s2CellId/0x80982b0000000000")
        & (t["predicate"] == "typeOf")
        & (t["object_id"] == "S2CellLevel10")
    ).any()


def test_variables_block_and_subdirs(tmp_path, ray_session):
    """config 'variables' overrides StatVar synthesis (name, description,
    searchDescriptions, custom properties — data.py:113-168), and
    includeInputSubdirs walks nested input dirs."""
    sub = tmp_path / "nested"
    sub.mkdir()
    (sub / "data.csv").write_text(
        "entity,variable,date,value\ncountry/IND,Count_Farm,2020,9000\n"
    )
    from import_ray.pipelines.config_import import run_config_import

    out = run_config_import(
        str(tmp_path),
        {
            "includeInputSubdirs": True,
            "inputFiles": {
                "data.csv": {
                    "importType": "observations",
                    "format": "variablePerRow",
                    "provenance": "P1",
                }
            },
            "variables": {
                "Count_Farm": {
                    "name": "Count of Farms",
                    "description": "Total farms",
                    "searchDescriptions": ["how many farms"],
                    "properties": {"populationType": "Farm"},
                }
            },
        },
    )
    assert len(out["observations"]) == 1  # found via subdir walk
    t = out["triples"]
    sv = t[t["subject_id"] == "Count_Farm"]
    got = {}
    for r in sv.itertuples():
        got.setdefault(r.predicate, []).append(r.object_id or r.object_value)
    assert got["name"] == ["Count of Farms"]
    assert got["description"] == ["Total farms"]
    assert got["searchDescription"] == ["how many farms"]
    assert got["populationType"] == ["Farm"]  # overridden
    assert got["measuredProperty"] == ["Count_Farm"]  # default kept


def test_sources_and_provenances(tmp_path, ray_session):
    """config 'sources' block emits Source/Provenance nodes with
    sequential c/s/N / c/p/N ids after the defaults, and StatVars get
    includedIn triples (nodes.py:39-143, data.py:150-258)."""
    (tmp_path / "data.csv").write_text(
        "entity,variable,date,value\ncountry/IND,Count_Farm,2020,9000\n"
    )
    from import_ray.pipelines.config_import import run_config_import

    out = run_config_import(
        str(tmp_path),
        {
            "inputFiles": {
                "data.csv": {
                    "importType": "observations",
                    "format": "variablePerRow",
                    "provenance": "Provenance1",
                }
            },
            "sources": {
                "Source1": {
                    "url": "http://source1.com",
                    "provenances": {"Provenance1": "http://source1.com/p1"},
                }
            },
        },
    )
    t = out["triples"]

    def preds(subject):
        sub = t[t["subject_id"] == subject]
        return {
            (r.predicate, r.object_id or r.object_value) for r in sub.itertuples()
        }

    assert ("typeOf", "Source") in preds("c/s/1")
    assert ("url", "http://source1.com") in preds("c/s/1")
    assert ("domain", "source1.com") in preds("c/s/1")
    assert ("typeOf", "Provenance") in preds("c/p/1")
    assert ("source", "c/s/1") in preds("c/p/1")
    assert ("typeOf", "Source") in preds("c/s/default")
    sv = preds("Count_Farm")
    assert ("includedIn", "c/p/1") in sv and ("includedIn", "c/s/1") in sv


def test_computed_variables_events(tmp_path, ray_session):
    """events importType with computedVariables: one count series per
    computed variable with its per-variable aggregation period
    (events_importer.py:139-171)."""
    (tmp_path / "floods.csv").write_text(
        "place,date\n"
        "country/IND,2020-05-03\n"
        "country/IND,2020-05-20\n"
        "country/IND,2021-06-01\n"
    )
    from import_ray.pipelines.config_import import run_config_import

    out = run_config_import(
        str(tmp_path),
        {
            "inputFiles": {
                "floods.csv": {
                    "importType": "events",
                    "eventType": "FloodEvent",
                    "computedVariables": ["Count_FloodEvent_Yearly", "Count_FloodEvent_Monthly"],
                }
            },
            "variables": {
                "Count_FloodEvent_Monthly": {"aggregation": {"period": "month"}}
                # Count_FloodEvent_Yearly: default period = year
            },
        },
    )
    obs = out["observations"]
    yearly = obs[obs["variable"] == "Count_FloodEvent_Yearly"].set_index("date")
    assert yearly.loc["2020", "value"] == "2" and yearly.loc["2021", "value"] == "1"
    monthly = obs[obs["variable"] == "Count_FloodEvent_Monthly"].set_index("date")
    assert monthly.loc["2020-05", "value"] == "2"


def test_schema_registry_property_nodes(tmp_path, ray_session):
    """Property/EventType nodes emitted; weird column names normalize
    (spaces→underscores) or get generated c/prop/N ids (nodes.py:244-332)."""
    (tmp_path / "ev.csv").write_text(
        "place,date,wind speed,p@ct!\n"
        "country/IND,2020-05-03,12,a\n"
    )
    from import_ray.pipelines.config_import import run_config_import

    out = run_config_import(
        str(tmp_path),
        {
            "inputFiles": {
                "ev.csv": {"importType": "events", "eventType": "Flood Event"}
            }
        },
    )
    t = out["triples"]

    def preds(subject):
        sub = t[t["subject_id"] == subject]
        return {(r.predicate, r.object_id or r.object_value) for r in sub.itertuples()}

    # event type name normalizes to Flood_Event; Class node emitted
    et = preds("Flood_Event")
    assert ("typeOf", "Class") in et and ("subClassOf", "Event") in et
    assert ("name", "Flood Event") in et
    # property nodes: normalized + generated
    assert ("typeOf", "Property") in preds("wind_speed")
    assert ("name", "wind speed") in preds("wind_speed")
    assert ("typeOf", "Property") in preds("c/prop/1")
    assert ("name", "p@ct!") in preds("c/prop/1")
    # event rows use the ids
    ev0 = preds("Flood_Event_0")
    assert ("typeOf", "Flood_Event") in ev0
    assert ("wind_speed", "12") in ev0
    assert ("c/prop/1", "a") in ev0


def test_variable_group_paths(tmp_path, ray_session):
    """variables.<name>.group paths build chained StatVarGroup nodes
    (custom/g/group_N, top parent dc/g/Root) and the SV gets memberOf
    (nodes.py:341-360)."""
    (tmp_path / "data.csv").write_text(
        "entity,variable,date,value\ncountry/IND,Count_Farm,2020,9000\n"
    )
    from import_ray.pipelines.config_import import run_config_import

    out = run_config_import(
        str(tmp_path),
        {
            "inputFiles": {
                "data.csv": {
                    "importType": "observations",
                    "format": "variablePerRow",
                }
            },
            "variables": {"Count_Farm": {"group": "Agriculture/Farms"}},
        },
    )
    t = out["triples"]

    def preds(subject):
        sub = t[t["subject_id"] == subject]
        return {(r.predicate, r.object_id or r.object_value) for r in sub.itertuples()}

    g1 = preds("custom/g/group_1")
    assert ("typeOf", "StatVarGroup") in g1
    assert ("name", "Agriculture") in g1
    assert ("specializationOf", "dc/g/Root") in g1
    g2 = preds("custom/g/group_2")
    assert ("name", "Farms") in g2
    assert ("specializationOf", "custom/g/group_1") in g2
    assert ("memberOf", "custom/g/group_2") in preds("Count_Farm")


def test_subdir_qualified_patterns(tmp_path, ray_session):
    """With includeInputSubdirs, directory-qualified config keys like
    'sub/*.csv' must match on the relative path, and same-named files
    in different subdirs bind to their own patterns."""
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    (a / "data.csv").write_text(
        "entity,variable,date,value\ncountry/IND,VarA,2020,1\n"
    )
    (b / "data.csv").write_text(
        "entity,variable,date,value\ncountry/USA,VarB,2020,2\n"
    )
    from import_ray.pipelines.config_import import run_config_import

    out = run_config_import(
        str(tmp_path),
        {
            "includeInputSubdirs": True,
            "inputFiles": {
                "a/*.csv": {
                    "importType": "observations",
                    "format": "variablePerRow",
                    "provenance": "ProvA",
                },
                "b/*.csv": {
                    "importType": "observations",
                    "format": "variablePerRow",
                    "provenance": "ProvB",
                },
            },
        },
    )
    obs = out["observations"].sort_values("variable").reset_index(drop=True)
    assert list(obs["provenance"]) == ["ProvA", "ProvB"]
