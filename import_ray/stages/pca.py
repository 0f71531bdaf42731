"""Distributed PCA over an embedding column.

The classical scale path for compressing / whitening embedding columns
before ANN or clustering (complements stages/similarity.py's random
projection and int8 quantization): fit from **moment partials** — each
block contributes one row (n, Σx, XᵀX) so the data never leaves its
block — then a narrow tree reduce, a driver-side d×d eigh (d ≤ a few
hundred for embedding columns; the d×d covariance is independent of
row count), and a broadcast projection map.

Scale shape:
  fit:      map_batches(partials)           # 1 row/block, 8·(d²+d+1) B
            → repartition(≤32) + block sum  # narrow exchange, ≤32 rows
            → driver sum + eigh             # d×d, row-count independent
  transform: map_batches(project)           # components broadcast in the
                                            # closure (k·d·8 B, tiny)

Determinism: eigh on identical float64 covariance is deterministic;
component sign is fixed so each component's max-|coordinate| is
positive (ties → lowest index), making outputs reproducible across
runs and comparable to a single-node numpy PCA in tests.

No reference analog (the reference has no embedding ops); public
algorithm (Pearson 1901 / standard moment-based PCA).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from import_ray.stages.similarity import _emb_matrix

_F8 = np.dtype("<f8")


def _fit_partials(batch: pa.Table) -> pa.Table:
    x = _emb_matrix(batch)
    n = x.shape[0]
    s = x.sum(axis=0)
    xtx = x.T @ x
    return pa.table(
        {
            "n": pa.array([np.int64(n)], pa.int64()),
            "sum": pa.array([s.astype(_F8).tobytes()], pa.large_binary()),
            "xtx": pa.array([xtx.astype(_F8).tobytes()], pa.large_binary()),
        }
    )


def _sum_partials(batch: pa.Table) -> pa.Table:
    if not len(batch):
        return pa.table(
            {
                "n": pa.array([], pa.int64()),
                "sum": pa.array([], pa.large_binary()),
                "xtx": pa.array([], pa.large_binary()),
            }
        )
    n = int(batch["n"].to_numpy(zero_copy_only=False).sum())
    s = None
    xtx = None
    for sb, xb in zip(
        batch["sum"].to_pylist(), batch["xtx"].to_pylist()
    ):
        sv = np.frombuffer(sb, dtype=_F8)
        xv = np.frombuffer(xb, dtype=_F8)
        s = sv.copy() if s is None else s + sv
        xtx = xv.copy() if xtx is None else xtx + xv
    return pa.table(
        {
            "n": pa.array([np.int64(n)], pa.int64()),
            "sum": pa.array([s.tobytes()], pa.large_binary()),
            "xtx": pa.array([xtx.tobytes()], pa.large_binary()),
        }
    )


def _fix_signs(components: np.ndarray) -> np.ndarray:
    """Flip each component so its max-|coordinate| entry is positive
    (ties broken by lowest index) — removes eigh's sign ambiguity."""
    out = components.copy()
    for i in range(out.shape[0]):
        j = int(np.argmax(np.abs(out[i])))
        if out[i, j] < 0:
            out[i] = -out[i]
    return out


def pca_fit(embeddings_ds, k: int = 8, fanin: int = 32) -> dict:
    """Fit PCA from moment partials. Returns a small dict model:
    ``mean`` (d,), ``components`` (k, d) rows = principal axes,
    ``explained_variance`` (k,), ``explained_variance_ratio`` (k,),
    ``n`` — everything driver-side is O(d²), never O(rows)."""
    parts = embeddings_ds.map_batches(_fit_partials, batch_format="pyarrow")
    reduced = parts.repartition(fanin).map_batches(
        _sum_partials, batch_format="pyarrow", batch_size=None
    )
    df = reduced.to_pandas()
    n = int(df["n"].sum())
    s = None
    xtx = None
    for sb, xb in zip(df["sum"], df["xtx"]):
        sv = np.frombuffer(sb, dtype=_F8)
        xv = np.frombuffer(xb, dtype=_F8)
        s = sv.copy() if s is None else s + sv
        xtx = xv.copy() if xtx is None else xtx + xv
    d = s.shape[0]
    mean = s / n
    cov = (xtx.reshape(d, d) - n * np.outer(mean, mean)) / max(n - 1, 1)
    cov = (cov + cov.T) / 2.0  # enforce exact symmetry for eigh
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals = np.maximum(evals[order], 0.0)
    components = _fix_signs(evecs[:, order].T[:k])
    total = float(evals.sum())
    return {
        "mean": mean,
        "components": components,
        "explained_variance": evals[:k],
        "explained_variance_ratio": evals[:k] / total if total > 0 else evals[:k],
        "n": n,
    }


def pca_transform(embeddings_ds, model: dict, id_col: str = "vec_id"):
    """Project the embedding column onto the fitted components →
    Dataset (id_col, pca: list<double> of k). The (k·d) component
    matrix rides in the closure (tiny); the map is one GEMM per batch."""
    mean = model["mean"]
    comp_t = model["components"].T  # (d, k)
    k = comp_t.shape[1]

    def project(batch: pa.Table) -> pa.Table:
        x = _emb_matrix(batch)
        z = (x - mean) @ comp_t
        ids = batch[id_col]
        return pa.table(
            {
                id_col: ids,
                "pca": pa.FixedSizeListArray.from_arrays(
                    pa.array(z.reshape(-1), pa.float64()), k
                ),
            }
        )

    return embeddings_ds.map_batches(project, batch_format="pyarrow")


def pca_embeddings(embeddings_ds, k: int = 8):
    """Fit + transform in one call (the queries() surface)."""
    return pca_transform(embeddings_ds, pca_fit(embeddings_ds, k=k))
