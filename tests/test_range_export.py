"""Range-partitioned sorted export: global order, manifest, lookups."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pytest


def _triples_table(n=5000, seed=5):
    rng = np.random.default_rng(seed)
    subj = np.array([f"conv/{rng.integers(0, 400):05d}" for _ in range(n)])
    pred = rng.choice(["typeOf", "text", "role", "mentions"], size=n)
    obj = np.array([f"dcid/{i % 97}" for i in range(n)])
    val = np.array([f"v{i}" for i in range(n)])
    return pa.table(
        {
            "subject_id": pa.array(subj.astype(str)),
            "predicate": pa.array(pred.astype(str)),
            "object_id": pa.array(obj.astype(str)),
            "object_value": pa.array(val.tolist(), pa.large_string()),
        }
    )


@pytest.fixture(scope="module")
def exported(ray_session, tmp_path_factory):
    import ray.data

    from import_ray.sources.range_export import write_sorted_triples

    tbl = _triples_table()
    out = str(tmp_path_factory.mktemp("range_export") / "triples")
    ds = ray.data.from_arrow(tbl).repartition(8)
    manifest = write_sorted_triples(ds, out, n_buckets=8)
    return tbl, out, manifest


def test_manifest_covers_all_rows_disjoint_ordered(exported):
    tbl, out, manifest = exported
    buckets = {int(k): v for k, v in manifest["buckets"].items()}
    assert sum(v["rows"] for v in buckets.values()) == tbl.num_rows
    ordered = [buckets[k] for k in sorted(buckets)]
    for a, b in zip(ordered, ordered[1:]):
        assert a["max_key"] < b["min_key"]  # disjoint AND globally ordered


def test_bucket_files_sorted_and_content_complete(exported):
    tbl, out, manifest = exported
    got = []
    for name in sorted(os.listdir(out)):
        if not name.startswith("bucket="):
            continue
        t = pads.dataset(os.path.join(out, name), format="parquet").to_table()
        keys = t["subject_id"].to_numpy(zero_copy_only=False).astype(str)
        assert np.all(keys[:-1] <= keys[1:])  # sorted within bucket
        got.append(t.select(["subject_id", "predicate", "object_id", "object_value"]))
    got_tbl = pa.concat_tables(got)
    assert got_tbl.num_rows == tbl.num_rows
    import pandas as pd

    a = got_tbl.to_pandas().sort_values(list(got_tbl.column_names)).reset_index(drop=True)
    b = tbl.to_pandas().sort_values(list(tbl.column_names)).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_point_lookup_matches_filter(exported):
    from import_ray.sources.range_export import read_subject

    tbl, out, manifest = exported
    subjects = tbl["subject_id"].to_numpy(zero_copy_only=False).astype(str)
    for s in [subjects[0], subjects[len(subjects) // 2], subjects[-1]]:
        got = read_subject(out, s)
        expect = tbl.filter(pa.compute.equal(tbl["subject_id"], s))
        assert got.num_rows == expect.num_rows
        assert set(got["object_value"].to_pylist()) == set(
            expect["object_value"].to_pylist()
        )


def test_manifest_json_roundtrip(exported):
    tbl, out, manifest = exported
    with open(os.path.join(out, "range_manifest.json")) as f:
        loaded = json.load(f)
    assert loaded["key"] == "subject_id"
    assert loaded["boundaries"] == manifest["boundaries"]
    assert len(loaded["boundaries"]) + 1 >= len(loaded["buckets"])
