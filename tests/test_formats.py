"""ORC / Arrow-IPC / JSONL sources and sinks (sources/formats.py):
roundtrips preserve values, sinks are idempotent (content-hash file
names), and read_table_auto dispatches by extension."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture()
def small_table():
    n = 500
    rng = np.random.default_rng(5)
    return pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "name": pa.array([f"row{i}" for i in range(n)], pa.string()),
            "value": pa.array(rng.normal(0, 10, n), pa.float64()),
        }
    )


def _canon(ds):
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    return df[sorted(df.columns)]


@pytest.mark.parametrize("fmt", ["orc", "feather", "jsonl"])
def test_roundtrip(ray_session, tmp_path, fmt, small_table):
    import pandas as pd
    import ray.data

    from import_ray.sources import formats as F

    ds = ray.data.from_arrow(small_table).repartition(4)
    write = {"orc": F.write_orc, "feather": F.write_feather, "jsonl": F.write_jsonl}[fmt]
    read = {"orc": F.read_orc, "feather": F.read_feather, "jsonl": F.read_jsonl}[fmt]
    out = str(tmp_path / fmt)
    paths = write(ds, out)
    assert len(paths) >= 1 and all(os.path.exists(p) for p in paths)
    got = _canon(read(paths))
    want = _canon(ray.data.from_arrow(small_table))
    pd.testing.assert_frame_equal(got, want, check_dtype=(fmt != "jsonl"))


@pytest.mark.parametrize("fmt", ["orc", "feather", "jsonl"])
def test_sink_idempotent(ray_session, tmp_path, fmt, small_table):
    """Re-writing the same blocks produces the same file names (resume
    overwrites instead of accumulating)."""
    import ray.data

    from import_ray.sources import formats as F

    ds = ray.data.from_arrow(small_table).repartition(2)
    write = {"orc": F.write_orc, "feather": F.write_feather, "jsonl": F.write_jsonl}[fmt]
    out = str(tmp_path / fmt)
    first = write(ds, out)
    second = write(ray.data.from_arrow(small_table).repartition(2), out)
    assert set(first) == set(second)
    assert sorted(os.listdir(out)) == sorted(os.path.basename(p) for p in first)


def test_read_table_auto_dispatch(ray_session, tmp_path, small_table):
    import pyarrow.parquet as pq

    from import_ray.sources.formats import read_table_auto

    p = str(tmp_path / "t.parquet")
    pq.write_table(small_table, p)
    assert read_table_auto(p).count() == 500

    import ray.data

    from import_ray.sources import formats as F

    d = str(tmp_path / "orcdir")
    F.write_orc(ray.data.from_arrow(small_table).repartition(3), d)
    assert read_table_auto(d).count() == 500

    with pytest.raises(ValueError, match="unrecognized"):
        read_table_auto(str(tmp_path / "t.xyz"))


def test_jsonl_timestamp_roundtrip(ray_session, tmp_path):
    """Timestamps survive the JSONL roundtrip as timestamps (ISO string
    inference by the Arrow JSON reader) — the property the
    events_daily_from_jsonl oracle depends on."""
    import ray.data

    from import_ray.sources import formats as F

    ts = pa.array(
        np.array(["2025-01-01T00:00:00", "2025-06-15T12:34:56"], "datetime64[us]"),
        pa.timestamp("us"),
    )
    t = pa.table({"id": pa.array([1, 2], pa.int64()), "ts": ts})
    out = str(tmp_path / "jl")
    paths = F.write_jsonl(ray.data.from_arrow(t), out)
    got = F.read_jsonl(paths).to_pandas().sort_values("id")
    assert str(got["ts"].dtype).startswith("datetime64"), got.dtypes
    assert got["ts"].iloc[1].isoformat().startswith("2025-06-15T12:34:56")
