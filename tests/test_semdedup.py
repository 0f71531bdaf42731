"""SemDeDup semantic dedup (stages/semdedup.py)."""

import numpy as np
import pyarrow as pa

from import_ray.stages.clustering import planted_group_vectors
from import_ray.stages.semdedup import _semdedup_cluster, semdedup, semdedup_kept


def _random_vectors_ds(n=60, dim=16, seed=3):
    import ray.data

    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )
    return ray.data.from_arrow(tbl), vecs


def test_planted_groups_collapse_to_one_each(ray_session):
    """5 tight planted groups (within-group cosine ≈ 0.9999, cross-group
    ≈ 0) → exactly one survivor per group at threshold 0.9."""
    ds = planted_group_vectors(n=100, groups=5)
    out = semdedup(ds, k=5, threshold=0.9, train_sample=100).to_pandas()
    assert len(out) == 100
    kept = out[out["kept"]]
    assert len(kept) == 5
    assert sorted(kept["vec_id"] % 5) == [0, 1, 2, 3, 4]


def test_exact_copies_dropped_originals_kept(ray_session):
    """Distinct random vectors + exact copies (vec_id + 1000): every
    original survives, every copy is dropped (tie on centroid-sim broken
    by vec_id, so the smaller id wins)."""
    import ray.data

    ds, vecs = _random_vectors_ds(n=60)
    base = pa.table(
        {
            "vec_id": pa.array(np.arange(60, dtype=np.int64)),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )
    copies = pa.table(
        {
            "vec_id": pa.array(np.arange(0, 60, 4, dtype=np.int64) + 1000),
            "embedding": pa.array(list(vecs[::4]), pa.list_(pa.float32())),
        }
    )
    both = ray.data.from_arrow(pa.concat_tables([base, copies]))
    kept = sorted(
        semdedup_kept(both, k=4, threshold=0.99, train_sample=200).to_pandas()[
            "vec_id"
        ]
    )
    assert kept == list(range(60))


def test_tiled_kernel_matches_single_matmul():
    rng = np.random.RandomState(7)
    emb = rng.randn(37, 8)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    sims = rng.rand(37)
    ids = np.arange(37, dtype=np.int64)
    full = _semdedup_cluster(emb, sims, ids, threshold=0.5, tile=4096)
    tiled = _semdedup_cluster(emb, sims, ids, threshold=0.5, tile=3)
    assert (full == tiled).all()


def test_real_embeddings_with_copies(ray_session, sf_small):
    """sf0.001 embeddings (natural max pair cosine ≈ 0.51) + exact
    copies of every 10th vector: survivors == the original table."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_small}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def plant(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        sub = b.filter(pa.array(ids % 10 == 0))
        copies = pa.table(
            {
                "vec_id": pa.array(
                    sub["vec_id"].to_numpy(zero_copy_only=False) + 1_000_000
                ),
                "embedding": sub["embedding"],
            }
        )
        return pa.concat_tables([b, copies.cast(b.schema)])

    planted = ds.map_batches(plant, batch_format="pyarrow")
    kept = sorted(semdedup_kept(planted, k=8, threshold=0.95).to_pandas()["vec_id"])
    orig = sorted(ds.to_pandas()["vec_id"])
    assert kept == orig
