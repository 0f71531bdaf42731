"""TFRecord optimized-graph I/O: framing vectors, proto roundtrip, and
series equality with group_series output on the statchecks fixture
(PipelineUtils.java:121-141,250-306 semantics)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

REF = "/root/reference/tool/src/test/resources/org/datacommons/tool/genmcf"


def test_crc32c_vectors():
    from import_ray.sources.tfrecord import crc32c

    # public CRC-32C check values
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_tfrecord_framing_roundtrip():
    from import_ray.sources.tfrecord import read_tfrecords, write_tfrecords

    recs = [b"hello", b"", b"x" * 1000]
    for compress in (False, True):
        blob = write_tfrecords(recs, compress=compress)
        assert read_tfrecords(blob) == recs


def test_series_proto_roundtrip():
    from import_ray.sources.tfrecord import decode_series, encode_series

    key = {
        "entity": "geoId/06",
        "variable": "Count_Person",
        "measurement_method": "CensusACS5yrSurvey",
        "observation_period": "",
        "scaling_factor": "",
        "unit": "USDollar",
    }
    dates = ["2019", "2020", "2021"]
    values = ["1380", "1.5", "NotANumber"]
    data = encode_series(key, dates, values, dcids=["dc/o/1", "dc/o/2", "dc/o/3"])
    row = decode_series(data)
    assert {k: row[k] for k in key} == key
    assert row["dates"] == dates
    assert row["values"] == values
    assert row["dcids"] == ["dc/o/1", "dc/o/2", "dc/o/3"]


def test_optimized_graph_roundtrip_statchecks(ray_session, tmp_path):
    """genmcf statchecks fixture → group_series → TFRecord write →
    read back → series equality."""
    import ray.data

    from import_ray.pipelines.genmcf import genmcf_table_ds
    from import_ray.sources.tfrecord import read_optimized_graph, write_optimized_graph
    from import_ray.stages.observations import group_series, svobs_rows_to_observations

    base = os.path.join(REF, "statchecks")
    ds = genmcf_table_ds(
        os.path.join(base, "input", "covid.tmcf"),
        os.path.join(base, "input", "covid.csv"),
        external_id_map={},
    )
    obs = ds.map_batches(svobs_rows_to_observations, batch_format="pyarrow", batch_size=None)
    series = group_series(obs)

    out_dir = str(tmp_path / "optgraph")
    manifest = write_optimized_graph(series, out_dir).to_pandas()
    assert manifest["n_records"].sum() > 0
    assert all(p.endswith(".tfrecord.gz") for p in manifest["path"])

    back = read_optimized_graph(out_dir).to_pandas()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # per-series observations sorted by date for order-insensitivity
        def sort_pair(row):
            pairs = sorted(zip(row["dates"], row["values"]))
            return pd.Series(
                {"obs": tuple((d, float(v)) for d, v in pairs)}
            )

        df["obs"] = df.apply(sort_pair, axis=1)
        keys = ["entity", "variable", "measurement_method", "observation_period",
                "scaling_factor", "unit"]
        return (
            df[keys + ["obs"]]
            .sort_values(keys, kind="mergesort")
            .reset_index(drop=True)
        )

    want = canon(series.to_pandas())
    got = canon(back)
    pd.testing.assert_frame_equal(got, want)


def test_series_proto_roundtrip_nonfinite():
    """'NaN'/'Infinity' tokens float()-parse but must stay in the text
    field so the writer's own shards decode without crashing."""
    from import_ray.sources.tfrecord import decode_series, encode_series

    key = {
        "entity": "geoId/06",
        "variable": "Count_Person",
        "measurement_method": "",
        "observation_period": "",
        "scaling_factor": "",
        "unit": "",
    }
    values = ["NaN", "Infinity", "-Infinity", "2.5"]
    data = encode_series(key, ["2019", "2020", "2021", "2022"], values)
    row = decode_series(data)
    assert row["values"] == values
