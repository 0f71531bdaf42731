"""Differ parity against the reference's golden diff CSVs
(pipeline/differ/src/test/resources/{obs-diff.csv,schema-diff.csv})."""

from __future__ import annotations

import os

import pytest

REF = "/root/reference/pipeline/differ/src/test/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures unavailable"
)


def load_golden(name: str) -> set[tuple]:
    out = set()
    with open(os.path.join(REF, name)) as f:
        for line in f:
            line = line.strip()
            if line:
                out.add(tuple(line.split(",")))
    return out


def build_rows(version: str):
    from import_ray.sources.mcf import parse_mcf_file
    from import_ray.stages.diff import graph_to_diff_rows

    obs_all, schema_all = [], []
    for fname in ("observation.mcf", "schema.mcf"):
        g = parse_mcf_file(os.path.join(REF, version, fname)).graph
        obs, schema = graph_to_diff_rows(g)
        obs_all.extend(obs)
        schema_all.extend(schema)
    return obs_all, schema_all


def test_obs_diff_matches_golden():
    from import_ray.stages.diff import diff_rows

    cur_obs, _ = build_rows("current")
    prev_obs, _ = build_rows("previous")
    got = {tuple(r) for r in diff_rows(cur_obs, prev_obs)}
    want = load_golden("obs-diff.csv")
    assert got == want, f"missing={want - got}; extra={got - want}"


def test_schema_diff_matches_golden():
    from import_ray.stages.diff import diff_rows

    _, cur_schema = build_rows("current")
    _, prev_schema = build_rows("previous")
    got = {tuple(r) for r in diff_rows(cur_schema, prev_schema)}
    want = load_golden("schema-diff.csv")
    assert got == want, f"missing={list(want - got)[:3]}; extra={list(got - want)[:3]}"


def test_distributed_diff_matches_driver(ray_session):
    import pyarrow as pa
    import ray.data

    from import_ray.stages.diff import diff_datasets, diff_rows

    cur_obs, _ = build_rows("current")
    prev_obs, _ = build_rows("previous")

    def to_ds(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "key": pa.array([r[0] for r in rows], pa.string()),
                    "value": pa.array([r[1] for r in rows], pa.large_string()),
                }
            )
        )

    out = diff_datasets(to_ds(cur_obs), to_ds(prev_obs)).take_all()
    got = {(r["key"], r["value_current"], r["value_previous"], r["diff"]) for r in out}
    want = {tuple(r) for r in diff_rows(cur_obs, prev_obs)}
    assert got == want


def test_kg_triple_diff_is_pure_addition(ray_session):
    """Diffing the full snapshot against a conversation-subset snapshot
    must yield only ADDED triples (the subset's triples are a strict
    subset after canonical dedup), and a nonempty delta."""
    from import_ray.pipelines.kg import kg_triple_diff
    from import_ray.sources.transcripts import ensure_transcripts

    path = ensure_transcripts("/root/testdata/sf0.001")
    rows = kg_triple_diff(path, mod=10).take_all()
    assert rows, "expected a nonempty delta"
    assert {r["diff"] for r in rows} == {"ADDED"}
    assert all(r["value_previous"] == "" for r in rows)
