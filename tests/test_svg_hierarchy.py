"""SVG hierarchy generation: golden parity against the reference's
stat_var_hierarchy_generator expected triples
(simple/tests/stats/test_data/stat_var_hierarchy_generator)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

DATA = "/root/reference/simple/tests/stats/test_data/stat_var_hierarchy_generator"

CASES = [
    "basic",
    "three_unrelated_svs",
    "two_related_svs",
    "svs_with_mprops",
    "verticals",
    "schema_names",
]


def _read_triples_csv(path: str) -> pd.DataFrame:
    df = pd.read_csv(path, dtype=str, keep_default_na=False)
    for c in ("subject_id", "predicate", "object_id", "object_value"):
        if c not in df.columns:
            df[c] = ""
    return df[["subject_id", "predicate", "object_id", "object_value"]]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.fillna("")
        .sort_values(list(df.columns), kind="mergesort")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("case", CASES)
def test_svg_hierarchy_golden(ray_session, case):
    import ray.data

    from import_ray.stages.svg_hierarchy import (
        generate_svg_hierarchy,
        load_vertical_specs,
    )

    if not os.path.exists(f"{DATA}/input/{case}.csv"):
        pytest.skip(f"no fixture {case}")
    inp = _read_triples_csv(f"{DATA}/input/{case}.csv")

    specs = []
    specs_path = f"{DATA}/input/{case}.vertical_specs.json"
    if os.path.exists(specs_path):
        with open(specs_path) as f:
            specs = load_vertical_specs(f.read())
    names = {}
    names_path = f"{DATA}/input/{case}.schema_names.json"
    if os.path.exists(names_path):
        with open(names_path) as f:
            names = json.load(f)

    ds = ray.data.from_arrow(
        __import__("pyarrow").Table.from_pandas(inp, preserve_index=False)
    )
    got = _canon(generate_svg_hierarchy(ds, specs, names).to_pandas())
    want = _canon(_read_triples_csv(f"{DATA}/expected/{case}_triples.csv"))
    assert got.values.tolist() == want.values.tolist(), (
        f"{case}: {len(got)} got vs {len(want)} want\n"
        f"got-only:\n{pd.concat([got, want, want]).drop_duplicates(keep=False)}"
    )


def test_svg_hierarchy_main_mcf(ray_session):
    """main.mcf case: MCF → 4-tuples via our parser → hierarchy."""
    import pyarrow as pa
    import ray.data

    from import_ray.core.model import strip_namespace
    from import_ray.stages.explode import mcf_to_triples
    from import_ray.stages.svg_hierarchy import generate_svg_hierarchy

    with open(f"{DATA}/input/main.mcf") as f:
        rows = mcf_to_triples(f.read())
    df = pd.DataFrame(
        [
            {
                "subject_id": strip_namespace(s),
                "predicate": p,
                "object_id": o if t == "ID" else "",
                "object_value": o if t == "VALUE" else "",
            }
            for s, p, o, t in rows
        ]
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = _canon(generate_svg_hierarchy(ds).to_pandas())
    want = _canon(_read_triples_csv(f"{DATA}/expected/main_triples.csv"))
    assert got.values.tolist() == want.values.tolist()


def test_overlapping_vertical_specs_dedup(ray_session):
    """Two specs repeating the same (population type, vertical) pair
    must emit ONE specializationOf triple, not two."""
    import pyarrow as pa
    import ray.data

    from import_ray.stages.svg_hierarchy import generate_svg_hierarchy

    df = pd.DataFrame(
        [
            {"subject_id": "sv1", "predicate": "typeOf",
             "object_id": "StatisticalVariable", "object_value": ""},
            {"subject_id": "sv1", "predicate": "populationType",
             "object_id": "Person", "object_value": ""},
            {"subject_id": "sv1", "predicate": "measuredProperty",
             "object_id": "count", "object_value": ""},
        ]
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    specs = [
        {"population_type": "Person", "measured_properties": {"count"},
         "verticals": ["Demographics"]},
        {"population_type": "Person", "measured_properties": {"count"},
         "verticals": ["Demographics"]},
    ]
    got = generate_svg_hierarchy(ds, vertical_specs=specs).to_pandas()
    spec_rows = got[
        (got["predicate"] == "specializationOf")
        & (got["object_id"].str.contains("Demographics"))
    ]
    # one per SVG pointing at the vertical — no duplicates
    assert not spec_rows.duplicated(["subject_id", "object_id"]).any()
    assert len(spec_rows) == len(spec_rows.drop_duplicates())
