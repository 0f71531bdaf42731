"""KGE negative sampling: exhaustive filtered negatives, deterministic
sampled corruptions, and block-boundary independence."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _truth_table() -> pa.Table:
    # s0-p0 -> {e0, e1}; s1-p0 -> {e2}; one literal row (null object_id)
    return pa.table(
        {
            "subject_id": pa.array(["s0", "s0", "s1", "s0"]),
            "predicate": pa.array(["p0", "p0", "p0", "p1"]),
            "object_id": pa.array(["e0", "e1", "e2", None]),
        }
    )


VOCAB = ["e0", "e1", "e2", "e3"]


def test_exhaustive_filtered_negatives(ray_session):
    import ray.data

    from import_ray.stages.kge import kge_negatives_exhaustive

    ds = ray.data.from_arrow(_truth_table())
    got = (
        kge_negatives_exhaustive(ds, VOCAB)
        .to_pandas()
        .sort_values(["subject_id", "predicate", "neg_object"])
        .reset_index(drop=True)
    )
    want = [
        ("s0", "p0", "e2"),
        ("s0", "p0", "e3"),
        ("s1", "p0", "e0"),
        ("s1", "p0", "e1"),
        ("s1", "p0", "e3"),
    ]
    assert list(map(tuple, got.itertuples(index=False))) == want


def test_exhaustive_dedups_cross_block_candidates(ray_session):
    import ray.data

    from import_ray.stages.kge import kge_negatives_exhaustive

    # same truth split across many blocks: identical (s,p) pairs in
    # different blocks must not yield duplicate negatives
    big = pa.concat_tables([_truth_table()] * 8)
    ds = ray.data.from_arrow(big).repartition(6)
    got = kge_negatives_exhaustive(ds, VOCAB).to_pandas()
    assert len(got) == 5
    assert not got.duplicated().any()


def test_sampled_filtered_and_deterministic(ray_session):
    import ray.data

    from import_ray.stages.kge import kge_negatives_sampled

    truth = {
        ("s0", "p0", "e0"),
        ("s0", "p0", "e1"),
        ("s1", "p0", "e2"),
    }
    ds = ray.data.from_arrow(_truth_table())
    got = kge_negatives_sampled(ds, VOCAB, k=3, seed=1).to_pandas()
    # every emitted corruption is NOT a true statement and NOT the
    # positive's own object; slots stay within range
    for r in got.itertuples(index=False):
        assert (r.subject_id, r.predicate, r.neg_object) not in truth
        assert r.neg_object != r.object_id
        assert 0 <= r.slot < 3
    # ≤ k per positive
    per_pos = got.groupby(["subject_id", "predicate", "object_id"]).size()
    assert (per_pos <= 3).all()

    # block-boundary independence: same rows split across blocks give
    # the identical multiset of corruptions
    ds2 = ray.data.from_arrow(_truth_table()).repartition(4)
    got2 = kge_negatives_sampled(ds2, VOCAB, k=3, seed=1).to_pandas()
    key = ["subject_id", "predicate", "object_id", "slot", "neg_object"]
    a = got.sort_values(key).reset_index(drop=True)
    b = got2.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_sampled_seed_changes_draws(ray_session):
    import ray.data

    from import_ray.stages.kge import kge_negatives_sampled

    ds = ray.data.from_arrow(_truth_table())
    a = kge_negatives_sampled(ds, VOCAB, k=3, seed=1).to_pandas()
    b = kge_negatives_sampled(ds, VOCAB, k=3, seed=2).to_pandas()
    key = ["subject_id", "predicate", "object_id", "slot", "neg_object"]
    assert not a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )


def test_empty_vocab_raises(ray_session):
    import ray.data

    from import_ray.stages.kge import kge_negatives_exhaustive

    with pytest.raises(ValueError):
        kge_negatives_exhaustive(ray.data.from_arrow(_truth_table()), [])
