"""DAG longest-path levels: hand-checked diamond, cycle detection."""

from __future__ import annotations

import pyarrow as pa
import pytest


def test_dag_levels_diamond(ray_session):
    import ray.data

    from import_ray.stages.graph import dag_levels

    # 1 -> 2 -> 4, 1 -> 3 -> 4 -> 5 ; plus long chain 1->2->4->5
    edges = pa.table(
        {
            "src": pa.array([1, 1, 2, 3, 4], pa.int64()),
            "dst": pa.array([2, 3, 4, 4, 5], pa.int64()),
        }
    )
    got = dag_levels(ray.data.from_arrow(edges)).to_pandas()
    assert dict(zip(got["node"], got["level"])) == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}


def test_dag_levels_cycle_raises(ray_session):
    import ray.data

    from import_ray.stages.graph import dag_levels

    edges = pa.table(
        {"src": pa.array([1, 2], pa.int64()), "dst": pa.array([2, 1], pa.int64())}
    )
    with pytest.raises(RuntimeError, match="cycle"):
        dag_levels(ray.data.from_arrow(edges), max_rounds=5)
