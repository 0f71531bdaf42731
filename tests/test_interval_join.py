"""Interval overlap join: exact pair semantics vs a brute-force cross,
anchor-cell dedup across grid boundaries, key isolation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ts(day: float):
    return np.datetime64("2025-01-01", "us") + np.timedelta64(
        int(day * 86_400_000_000), "us"
    )


def _iv_table(rows):
    return pa.table(
        {
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "key": pa.array([r[1] for r in rows], pa.int64()),
            "start": pa.array([_ts(r[2]) for r in rows], pa.timestamp("us")),
            "end": pa.array([_ts(r[3]) for r in rows], pa.timestamp("us")),
        }
    )


def _brute(left, right):
    out = set()
    for lid, lk, ls, le in left:
        for rid, rk, rs, re_ in right:
            if lk == rk and ls <= re_ and rs <= le:
                out.add((lk, lid, rid))
    return out


def test_interval_join_matches_brute_force(ray_session):
    import ray.data

    from import_ray.pipelines.relational import interval_overlap_join

    rng = np.random.default_rng(3)
    left = [
        (i, int(rng.integers(0, 3)), float(s), float(s + rng.uniform(0, 40)))
        for i, s in enumerate(rng.uniform(0, 100, 60))
    ]
    right = [
        (i, int(rng.integers(0, 3)), float(s), float(s + rng.uniform(0, 25)))
        for i, s in enumerate(rng.uniform(0, 100, 60))
    ]
    got = interval_overlap_join(
        ray.data.from_arrow(_iv_table(left)).repartition(4),
        ray.data.from_arrow(_iv_table(right)).repartition(3),
        bucket_days=7,
    ).to_pandas()
    got_pairs = set(zip(got["key"], got["l_id"], got["r_id"]))
    assert got_pairs == _brute(left, right)
    # exactly-once emission (anchor dedup): no duplicate pairs
    assert len(got) == len(got_pairs)
    # overlap bounds are the true intersection
    lmap = {(r[1], r[0]): r for r in left}
    rmap = {(r[1], r[0]): r for r in right}
    for rec in got.itertuples(index=False):
        _, _, ls, le = lmap[(rec.key, rec.l_id)]
        _, _, rs, re_ = rmap[(rec.key, rec.r_id)]
        assert np.datetime64(rec.overlap_start, "us") == max(_ts(ls), _ts(rs))
        assert np.datetime64(rec.overlap_end, "us") == min(_ts(le), _ts(re_))
