"""Interval coalescing: overlap, touching, containment, per-key
independence."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ts(day: int):
    return np.datetime64("2025-01-01", "us") + np.timedelta64(day, "D").astype(
        "timedelta64[us]"
    )


def test_coalesce_intervals(ray_session):
    import ray.data

    from import_ray.pipelines.relational import coalesce_intervals

    rows = [
        # key 1: [0,2] overlaps [1,3]; [3,4] touches (closed) -> one island
        (1, 0, 2), (1, 1, 3), (1, 3, 4),
        # key 1: gap, then [6,7] contains [6,6] -> second island
        (1, 6, 7), (1, 6, 6),
        # key 2: disjoint singletons
        (2, 0, 1), (2, 5, 5),
    ]
    t = pa.table(
        {
            "key": pa.array([r[0] for r in rows], pa.int64()),
            "start": pa.array([_ts(r[1]) for r in rows], pa.timestamp("us")),
            "end": pa.array([_ts(r[2]) for r in rows], pa.timestamp("us")),
        }
    )
    got = (
        coalesce_intervals(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .sort_values(["key", "start"])
        .reset_index(drop=True)
    )
    want = [
        (1, _ts(0), _ts(4), 3),
        (1, _ts(6), _ts(7), 2),
        (2, _ts(0), _ts(1), 1),
        (2, _ts(5), _ts(5), 1),
    ]
    assert [
        (r.key, np.datetime64(r.start, "us"), np.datetime64(r.end, "us"), r.n_merged)
        for r in got.itertuples(index=False)
    ] == want
