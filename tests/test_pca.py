"""Distributed PCA: exact parity with single-node numpy PCA.

The distributed fit is moment-based (per-block n/Σx/XᵀX partials), so
on identical float64 input it must reproduce numpy's covariance
eigendecomposition to float tolerance, with the sign convention
applied to both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _synth(n=400, d=16, seed=11):
    rng = np.random.default_rng(seed)
    # anisotropic low-rank-ish cloud: known dominant directions
    scales = np.linspace(5.0, 0.1, d)
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
    x = rng.normal(size=(n, d)) * scales @ basis.T + rng.normal(size=d)
    return x.astype(np.float64)


def _ds_from_matrix(x):
    import ray.data

    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(x.reshape(-1).astype(np.float32), pa.float32()), x.shape[1]
            ),
        }
    )
    return ray.data.from_arrow(tbl).repartition(5)


def _numpy_pca(x, k):
    from import_ray.stages.pca import _fix_signs

    xf = x.astype(np.float32).astype(np.float64)  # match list<float> storage
    mean = xf.mean(axis=0)
    cov = np.cov(xf, rowvar=False)
    evals, evecs = np.linalg.eigh((cov + cov.T) / 2)
    order = np.argsort(evals)[::-1]
    return mean, _fix_signs(evecs[:, order].T[:k]), evals[order][:k]


@pytest.mark.usefixtures("ray_session")
def test_pca_fit_matches_numpy():
    from import_ray.stages.pca import pca_fit

    x = _synth()
    model = pca_fit(_ds_from_matrix(x), k=6)
    mean, comps, evals = _numpy_pca(x, 6)
    np.testing.assert_allclose(model["mean"], mean, atol=1e-9)
    np.testing.assert_allclose(model["explained_variance"], evals, rtol=1e-8)
    np.testing.assert_allclose(np.abs(model["components"]), np.abs(comps), atol=1e-7)
    np.testing.assert_allclose(model["components"], comps, atol=1e-7)
    assert model["n"] == len(x)
    ratios = model["explained_variance_ratio"]
    assert np.all(np.diff(ratios) <= 1e-12) and ratios.sum() <= 1.0 + 1e-9


@pytest.mark.usefixtures("ray_session")
def test_pca_transform_matches_numpy_projection():
    from import_ray.stages.pca import pca_fit, pca_transform

    x = _synth(n=300, d=12, seed=3)
    ds = _ds_from_matrix(x)
    model = pca_fit(ds, k=4)
    out = pca_transform(ds, model).to_pandas().sort_values("vec_id")
    z = np.vstack(out["pca"].to_numpy())
    xf = x.astype(np.float32).astype(np.float64)
    expect = (xf - model["mean"]) @ model["components"].T
    np.testing.assert_allclose(z, expect, atol=1e-9)
    # projection decorrelates: off-diagonal covariance ≈ 0
    c = np.cov(z, rowvar=False)
    off = c - np.diag(np.diag(c))
    assert np.abs(off).max() < 1e-6 * np.abs(np.diag(c)).max()
