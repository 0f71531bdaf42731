"""Transitive ancestor closure (graph.ancestor_closure)."""

import numpy as np
import pyarrow as pa

from import_ray.stages.graph import ancestor_closure


def _edges_ds(pairs, blocks=1):
    import ray.data

    tbl = pa.table(
        {
            "child": pa.array([p[0] for p in pairs], pa.int64()),
            "parent": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    return ds.repartition(blocks) if blocks > 1 else ds


def _driver_closure(pairs):
    """Reference BFS closure with min depth."""
    from collections import defaultdict

    parents = defaultdict(list)
    for c, p in pairs:
        parents[c].append(p)
    out = {}
    for start in {c for c, _ in pairs}:
        frontier, depth, seen = [start], 0, {}
        while frontier:
            depth += 1
            nxt = []
            for node in frontier:
                for p in parents.get(node, ()):
                    if p not in seen:
                        seen[p] = depth
                        nxt.append(p)
            frontier = nxt
        for anc, d in seen.items():
            out[(start, anc)] = d
    return out


def _as_dict(df):
    return {
        (int(r.node), int(r.ancestor)): int(r.depth) for r in df.itertuples()
    }


def test_chain_multi_round(ray_session):
    """A depth-6 chain forces 6 semi-naive rounds."""
    pairs = [(i, i + 1) for i in range(6)]
    got = _as_dict(ancestor_closure(_edges_ds(pairs, blocks=2)).to_pandas())
    assert got == _driver_closure(pairs)


def test_dag_multi_path_min_depth(ray_session):
    """Diamond: 0→1→3, 0→2→3, 0→3 — (0,3) must keep depth 1."""
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (0, 3), (3, 4)]
    got = _as_dict(ancestor_closure(_edges_ds(pairs, blocks=2)).to_pandas())
    ref = _driver_closure(pairs)
    assert got == ref
    assert got[(0, 3)] == 1
    assert got[(0, 4)] == 2


def test_random_forest_parity(ray_session):
    rng = np.random.RandomState(5)
    pairs = [(i, int(rng.randint(0, i))) for i in range(1, 300)]
    got = _as_dict(ancestor_closure(_edges_ds(pairs, blocks=4)).to_pandas())
    assert got == _driver_closure(pairs)


def test_cycle_guard_terminates(ray_session):
    pairs = [(0, 1), (1, 2), (2, 0)]
    out = ancestor_closure(_edges_ds(pairs), max_depth=6).to_pandas()
    # every node reaches every node (incl. itself) in a 3-cycle
    assert len(out) == 9
