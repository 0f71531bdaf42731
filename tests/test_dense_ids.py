"""Dense string ids: lexical rank parity, cross-block dedup, prefix
handling; consistent pseudonymization."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_dense_ids_lexical(ray_session):
    import ray.data

    from import_ray.stages.ids import dense_string_ids

    vals = ["beta", "alpha", "a", "beta", "gamma", "ab", "alpha", "z", "b"]
    ds = ray.data.from_arrow(
        pa.table({"value": pa.array(vals, pa.string())})
    ).repartition(4)
    got = dense_string_ids(ds).to_pandas().sort_values("id").reset_index(drop=True)
    want = sorted(set(vals))
    assert got["value"].tolist() == want
    assert got["id"].tolist() == list(range(len(want)))


def test_dense_ids_single_prefix_skew(ray_session):
    import ray.data

    from import_ray.stages.ids import dense_string_ids

    # every value shares prefix 'xx' — all land in one partition but
    # ranks stay exact
    vals = [f"xx{i:03d}" for i in range(50)]
    rng = np.random.default_rng(0)
    shuffled = list(rng.permutation(np.asarray(vals, object)))
    ds = ray.data.from_arrow(
        pa.table({"value": pa.array(shuffled, pa.string())})
    ).repartition(5)
    got = dense_string_ids(ds).to_pandas().sort_values("id")
    assert got["value"].tolist() == vals


def test_pseudonymize_consistent(ray_session, tmp_path):
    from import_ray.stages.ids import pseudonymize_mentions

    texts = [
        "met isoCode:DE-BY today",
        "again isoCode:DE-BY and geoId:06",
        "only geoId:06",
        "nothing here",
    ]
    n = len(texts)
    t = pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(n)], pa.string()),
            "turn_idx": pa.array(np.zeros(n, np.int32), pa.int32()),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array([""] * n, pa.string()),
            "ts": pa.array(
                np.full(n, np.datetime64("2025-01-01", "us")), pa.timestamp("us")
            ),
        }
    )
    path = str(tmp_path / "tx.parquet")
    pq.write_table(t, path)
    got = pseudonymize_mentions(path).to_pandas().sort_values("conv_id")
    # dcids: geoId/06 < iso/DE-BY lexically -> ids 0, 1
    assert got["text"].tolist() == [
        "met ENT1 today",
        "again ENT1 and ENT0",
        "only ENT0",
        "nothing here",
    ]
