"""Entity resolution: blocking → verify → cluster over name variants."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _entities():
    """Three true entities, each with name variants; two decoys that
    share only hot tokens with everything else."""
    rows = [
        # cluster A: acme corporation
        (1, "Acme Corporation"),
        (2, "ACME corporation!!"),          # case/punct variant (Jaccard 1.0)
        (3, "corporation Acme Inc"),        # reorder + extra token (2/3)
        # cluster B: globex
        (10, "Globex Heavy Industries"),
        (11, "globex heavy-industries ltd"),  # 3/4
        # cluster C: singleton
        (20, "Initech"),
        # decoys sharing only the hot token "inc"/"ltd" with others
        (30, "Umbrella Inc"),
        (31, "Wayne Ltd"),
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "entity_id": pa.array([r[0] for r in rows], pa.int64()),
                "name": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


EXPECTED = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 30: 30, 31: 31}


def _labels(ds) -> dict:
    df = ds.to_pandas()
    return dict(zip(df["entity_id"].astype(int), df["canonical_id"].astype(int)))


def test_resolve_entities_clusters_variants(ray_session):
    from import_ray.stages.entity_resolution import resolve_entities

    got = _labels(resolve_entities(_entities(), threshold=0.6))
    assert got == EXPECTED


def test_resolve_entities_distributed_labeling_identical(ray_session):
    """max_driver_pairs=0 forces the distributed min-label branch; the
    labels must be byte-equal to the driver union-find path."""
    from import_ray.stages.entity_resolution import resolve_entities

    driver = _labels(resolve_entities(_entities(), threshold=0.6))
    dist = _labels(resolve_entities(_entities(), threshold=0.6, max_driver_pairs=0))
    assert driver == dist == EXPECTED


def test_match_pairs_scores(ray_session):
    """Verified pairs carry the exact token-set Jaccard."""
    from import_ray.stages.entity_resolution import entity_match_pairs

    df = entity_match_pairs(_entities(), threshold=0.6).to_pandas()
    pairs = {
        (int(r.ent_lo), int(r.ent_hi)): float(r.jaccard) for r in df.itertuples()
    }
    assert pairs[(1, 2)] == 1.0
    # the stage rounds jaccard to 6 decimals
    assert abs(pairs[(1, 3)] - 2 / 3) < 1e-6
    assert abs(pairs[(2, 3)] - 2 / 3) < 1e-6
    assert abs(pairs[(10, 11)] - 0.75) < 1e-6
    # decoys never pair with anything
    assert not any(30 in p or 31 in p for p in pairs)


def test_hot_block_does_not_explode(ray_session):
    """500 entities all sharing one hot token but pairwise-dissimilar:
    the hot block is skipped (capped) and nothing merges; two planted
    variants sharing a RARE token still resolve."""
    from import_ray.stages.entity_resolution import resolve_entities

    n = 500
    names = [f"inc filler{i} unique{i}" for i in range(n)]
    names[7] = "inc zephyr alpha"
    ids = list(range(n)) + [9000]
    names.append("zephyr alpha inc extra")  # 3/4 with entity 7
    ds = ray.data.from_arrow(
        pa.table(
            {
                "entity_id": pa.array(ids, pa.int64()),
                "name": pa.array(names, pa.string()),
            }
        )
    )
    df = resolve_entities(ds, threshold=0.6).to_pandas()
    lab = dict(zip(df["entity_id"].astype(int), df["canonical_id"].astype(int)))
    assert lab[9000] == 7 and lab[7] == 7
    others = {k: v for k, v in lab.items() if k not in (7, 9000)}
    assert all(k == v for k, v in others.items())


def test_normalization_kernel():
    from import_ray.stages.entity_resolution import normalize_names

    t = pa.table(
        {
            "entity_id": pa.array([1], pa.int64()),
            "name": pa.array(["  A.C.M.E.—Corp,  Ltd  "], pa.string()),
        }
    )
    out = normalize_names(t, "entity_id", "name")
    assert out["text"].to_pylist() == ["a c m e corp ltd"]
