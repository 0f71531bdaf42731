"""DSIR importance-resampling data selection (stages/dsir.py)."""

import numpy as np
import pyarrow as pa

from import_ray.stages.dsir import (
    _flat_buckets,
    dsir_select,
    dsir_weights,
    fit_bucket_counts,
    log_ratio,
)

RAW = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "how vexingly quick daft zebras jump",
    "sphinx of black quartz judge my vow",
    "the five boxing wizards jump quickly",
    "jackdaws love my big sphinx of quartz",
]
TARGET = [
    "zebras jump quickly over quartz",
    "quick zebras love quartz",
]


def _docs_ds(texts, start_id=0, blocks=1):
    import ray.data

    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(start_id, start_id + len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    return ds.repartition(blocks) if blocks > 1 else ds


def _reference_counts(texts, buckets):
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    _, uni, _, bi = _flat_buckets(tbl, buckets)
    return np.bincount(uni, minlength=buckets) + np.bincount(bi, minlength=buckets)


def test_fit_and_weights_match_driver_reference(ray_session):
    """Distributed sparse-partial fit + segmented-reduceat weights equal
    a direct single-table numpy computation."""
    buckets = 512
    raw = _docs_ds(RAW, blocks=3)
    target = _docs_ds(TARGET, start_id=100, blocks=2)
    cr = fit_bucket_counts(raw, buckets)
    ct = fit_bucket_counts(target, buckets)
    assert (cr == _reference_counts(RAW, buckets)).all()
    assert (ct == _reference_counts(TARGET, buckets)).all()

    r = log_ratio(ct, cr)
    got = (
        dsir_weights(raw, r).to_pandas().sort_values("doc_id")["logweight"].to_numpy()
    )
    exp = []
    for t in RAW:
        tbl = pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array([t])})
        _, uni, _, bi = _flat_buckets(tbl, len(r))
        exp.append(r[uni].sum() + r[bi].sum())
    np.testing.assert_allclose(got, np.array(exp), rtol=1e-12)


def test_planted_target_docs_selected(ray_session):
    """Uniform-length raw docs; every 7th carries the target's
    distinctive tokens → top-k selection is exactly the planted set."""
    base = "the quick brown fox jumps over the lazy dog"
    raw_texts = [
        base + (" zebraq wombatx zebraq wombatx" if i % 7 == 0 else "")
        for i in range(70)
    ]
    raw = _docs_ds(raw_texts, blocks=4)
    target = _docs_ds(["zebraq wombatx zebraq wombatx"] * 3, start_id=500)
    out = dsir_select(raw, target, k=10, buckets=512, smoothing=1e-3).to_pandas()
    assert sorted(out["doc_id"]) == [i for i in range(70) if i % 7 == 0]


def test_gumbel_resampling_deterministic(ray_session):
    raw = _docs_ds(RAW)
    target = _docs_ds(TARGET, start_id=100)
    a = dsir_select(raw, target, k=3, gumbel_seed=11).to_pandas()
    b = dsir_select(raw, target, k=3, gumbel_seed=11).to_pandas()
    assert a.equals(b)
    assert len(a) == 3
