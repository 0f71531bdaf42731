"""RDFS type inference + owl:sameAs canonicalization — brute-force
reference parity on synthetic graphs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _types_df(ds) -> pd.DataFrame:
    return (
        ds.to_pandas().sort_values(["entity", "cls"]).reset_index(drop=True)
    )


def _brute_infer(typeof, subclass, n_classes=64):
    # adjacency closure by repeated squaring over a dict
    parents = {}
    for c, p in subclass:
        parents.setdefault(c, set()).add(p)
    anc = {}

    def walk(c):
        if c in anc:
            return anc[c]
        seen = set()
        stack = list(parents.get(c, ()))
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            stack.extend(parents.get(x, ()))
        anc[c] = seen
        return seen

    rows = set()
    for e, c in typeof:
        rows.add((e, c))
        for a in walk(c):
            rows.add((e, a))
    return pd.DataFrame(sorted(rows), columns=["entity", "cls"])


def test_infer_types_matches_bruteforce(ray_session):
    import ray.data

    from import_ray.stages.reasoning import infer_types

    rng = np.random.RandomState(7)
    # random DAG on 30 classes: edges i -> j only for i < j
    subclass = []
    for i in range(30):
        for j in rng.choice(np.arange(i + 1, 31), size=min(2, 30 - i), replace=False):
            subclass.append((i, int(j)))
    typeof = [(100 + k, int(rng.randint(0, 30))) for k in range(200)]

    ds_t = ray.data.from_pandas(pd.DataFrame(typeof, columns=["entity", "cls"]))
    ds_s = ray.data.from_pandas(pd.DataFrame(subclass, columns=["child", "parent"]))
    got = _types_df(infer_types(ds_t, ds_s))
    want = _brute_infer(typeof, subclass)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_infer_types_strategies_identical(ray_session):
    import ray.data

    from import_ray.stages.reasoning import infer_types

    subclass = [(0, 1), (1, 2), (2, 3), (4, 2)]
    typeof = [(10, 0), (11, 4), (12, 3), (13, 0)]
    ds_t = ray.data.from_pandas(pd.DataFrame(typeof, columns=["entity", "cls"]))
    ds_s = ray.data.from_pandas(pd.DataFrame(subclass, columns=["child", "parent"]))
    a = _types_df(infer_types(ds_t, ds_s, strategy="broadcast"))
    b = _types_df(infer_types(ds_t, ds_s, strategy="join"))
    pd.testing.assert_frame_equal(a, b)


def test_sameas_canonicalize(ray_session):
    import ray.data

    from import_ray.stages.reasoning import sameas_canonicalize

    # identity clusters: {1,2,3}, {10,11}, singleton 20
    edges = pd.DataFrame({"doc_lo": [1, 2, 10], "doc_hi": [2, 3, 11]})
    facts = pd.DataFrame(
        {
            "subject": [1, 2, 3, 10, 20, 11],
            "predicate": ["p", "p", "p", "q", "q", "r"],
            "object": [10, 11, 10, 20, 2, 3],
        }
    )
    out = sameas_canonicalize(
        ray.data.from_pandas(facts), ray.data.from_pandas(edges)
    ).to_pandas()
    out = out.sort_values(["subject", "predicate", "object"]).reset_index(drop=True)
    # canonical ids: 1,2,3 -> 1; 10,11 -> 10; others unchanged.
    # rewritten: (1,p,10)x3 dedup, (10,q,20), (20,q,1), (11,r,3)->(10,r,1)
    want = pd.DataFrame(
        {
            "subject": [1, 10, 10, 20],
            "predicate": ["p", "q", "r", "q"],
            "object": [10, 20, 1, 1],
        }
    ).sort_values(["subject", "predicate", "object"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out.astype({"subject": "int64", "object": "int64"}), want.astype({"subject": "int64", "object": "int64"}))


def test_subclass_closure_driver_vs_distributed(ray_session):
    import ray.data

    from import_ray.stages.reasoning import subclass_closure

    # diamond + chain + cycle guard exercise
    edges = pd.DataFrame(
        {"child": [0, 0, 1, 2, 3, 5, 6], "parent": [1, 2, 3, 3, 4, 6, 5]}
    )

    def canon(ds):
        return (
            ds.to_pandas()
            .sort_values(["node", "ancestor"])
            .reset_index(drop=True)
            .astype("int64")
        )

    a = canon(subclass_closure(ray.data.from_pandas(edges), max_depth=8))
    b = canon(
        subclass_closure(ray.data.from_pandas(edges), max_depth=8, driver_budget=0)
    )
    pd.testing.assert_frame_equal(a, b)


def test_sameas_broadcast_vs_join_identical(ray_session):
    import ray.data

    from import_ray.stages.reasoning import sameas_canonicalize

    edges = pd.DataFrame({"doc_lo": [1, 2, 10, 50], "doc_hi": [2, 3, 11, 51]})
    facts = pd.DataFrame(
        {
            "subject": [1, 2, 3, 10, 20, 11, 50, 51],
            "predicate": list("ppqqrrss"),
            "object": [10, 11, 10, 20, 2, 3, 51, 1],
        }
    )

    def canon(ds):
        return (
            ds.to_pandas()
            .sort_values(["subject", "predicate", "object"])
            .reset_index(drop=True)
            .astype({"subject": "int64", "object": "int64"})
        )

    a = canon(
        sameas_canonicalize(ray.data.from_pandas(facts), ray.data.from_pandas(edges))
    )
    b = canon(
        sameas_canonicalize(
            ray.data.from_pandas(facts),
            ray.data.from_pandas(edges),
            label_broadcast_budget=0,
        )
    )
    pd.testing.assert_frame_equal(a, b[a.columns])
