"""DeepWalk corpus generation: exact parity with a pure-Python walker,
determinism across block boundaries, sink handling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _ref_walks(adj: dict, walk_length: int, walks_per_node: int, seed: int):
    """Pure-Python reference: same splitmix64 draw, exact integer
    arithmetic (no numpy scalar promotion)."""
    from import_ray.stages.graph import _walk_mix

    rows = []
    for start in sorted(adj):
        for w in range(walks_per_node):
            key = f"{start}#{w}"
            h = int(pd.util.hash_array(np.array([key], dtype=object))[0])
            rows.append((key, 0, start))
            cur = start
            for t in range(1, walk_length + 1):
                neigh = adj.get(cur)
                if not neigh:
                    break
                mix = (t * 0xC2B2AE3D27D4EB4F) & 0xFFFFFFFFFFFFFFFF
                v = int(
                    _walk_mix(np.array([h ^ mix ^ seed], dtype=np.uint64))[0]
                )
                cur = sorted(neigh)[v % len(neigh)]
                rows.append((key, t, cur))
    return (
        pd.DataFrame(rows, columns=["walk_key", "step", "node"])
        .sort_values(["walk_key", "step"])
        .reset_index(drop=True)
    )


EDGES = pa.table(
    {
        "src": pa.array(["a", "a", "a", "b", "d", "d", "e"]),
        "dst": pa.array(["b", "c", "d", "c", "a", "e", "a"]),
    }
)
ADJ = {"a": ["b", "c", "d"], "b": ["c"], "d": ["a", "e"], "e": ["a"]}


def test_walks_match_reference(ray_session):
    import ray.data

    from import_ray.stages.graph import random_walks

    got = (
        random_walks(
            ray.data.from_arrow(EDGES), walk_length=5, walks_per_node=3, seed=11
        )
        .to_pandas()
        .sort_values(["walk_key", "step"])
        .reset_index(drop=True)
    )
    want = _ref_walks(ADJ, walk_length=5, walks_per_node=3, seed=11)
    assert got.equals(want)


def test_walks_block_independent(ray_session):
    import ray.data

    from import_ray.stages.graph import random_walks

    # duplicated edges split across blocks: adjacency dedups, draws
    # depend only on (walk_key, step, seed) — identical corpus
    big = pa.concat_tables([EDGES] * 5)
    a = (
        random_walks(ray.data.from_arrow(EDGES), walk_length=4, seed=3)
        .to_pandas()
        .sort_values(["walk_key", "step"])
        .reset_index(drop=True)
    )
    b = (
        random_walks(
            ray.data.from_arrow(big).repartition(7), walk_length=4, seed=3
        )
        .to_pandas()
        .sort_values(["walk_key", "step"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_walks_stop_at_sinks(ray_session):
    import ray.data

    from import_ray.stages.graph import random_walks

    # chain x -> y -> z: the walk from x has exactly 3 rows, from y 2
    chain = pa.table({"src": pa.array(["x", "y"]), "dst": pa.array(["y", "z"])})
    got = random_walks(
        ray.data.from_arrow(chain), walk_length=9, walks_per_node=1
    ).to_pandas()
    sizes = got.groupby("walk_key").size().to_dict()
    assert sizes == {"x#0": 3, "y#0": 2}
    x_walk = got[got.walk_key == "x#0"].sort_values("step")["node"].tolist()
    assert x_walk == ["x", "y", "z"]
