"""Strongly connected components: Tarjan parity on seeded random
digraphs, trim paths, self-loops, and 2-cycles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _tarjan(edges):
    """Iterative Tarjan; returns {node: min-node-of-scc}."""
    adj = {}
    nodes = set()
    for s, d in edges:
        nodes.add(s)
        nodes.add(d)
        if s != d:
            adj.setdefault(s, []).append(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    result = {}
    counter = [0]

    def strongconnect(v0):
        work = [(v0, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            neigh = adj.get(v, [])
            for i in range(pi, len(neigh)):
                w = neigh[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    result[w] = m
            work.pop()
            if work:
                pv, _ = work[-1]
                low[pv] = min(low[pv], low[v])

    for v in sorted(nodes):
        if v not in index:
            strongconnect(v)
    return result


def _run(ray, edge_list):
    import ray.data

    from import_ray.stages.graph import strongly_connected_components

    t = pa.table(
        {
            "src": pa.array([e[0] for e in edge_list], pa.int64()),
            "dst": pa.array([e[1] for e in edge_list], pa.int64()),
        }
    )
    got = strongly_connected_components(ray.data.from_arrow(t)).to_pandas()
    return dict(zip(got["node"], got["scc_id"]))


def test_scc_mixed_graph(ray_session):
    edges = [
        (1, 2), (2, 3), (3, 1),        # 3-cycle
        (4, 5), (5, 4), (3, 4),        # 2-cycle fed from the 3-cycle
        (6, 7), (7, 6),                # isolated 2-cycle
        (8, 8),                        # pure self-loop
        (9, 10), (10, 11),             # chain (all singletons, trims)
    ]
    assert _run(ray_session, edges) == _tarjan(edges)


def test_scc_random_digraphs(ray_session):
    rng = np.random.default_rng(7)
    for _ in range(2):
        n = 12
        m = 26
        edges = list(
            zip(rng.integers(0, n, m).tolist(), rng.integers(0, n, m).tolist())
        )
        got = _run(ray_session, edges)
        want = _tarjan(edges)
        # pure self-loop-only nodes appear in both; compare full maps
        assert got == want


def test_scc_nested_cycles(ray_session):
    # two cycles sharing a node form ONE scc
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3)]
    got = _run(ray_session, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}
