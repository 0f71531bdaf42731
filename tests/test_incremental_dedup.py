"""Incremental corpus dedup (dedup.incremental_dedup_documents)."""

import numpy as np
import pyarrow as pa

from import_ray.stages.dedup import incremental_dedup_documents


def _ds(rows, blocks=1):
    import ray.data

    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_new_dups_of_existing_dropped(ray_session):
    existing = _ds([(1, "alpha"), (2, "beta"), (3, "gamma")], blocks=2)
    new = _ds(
        [
            (10, "alpha"),   # dup of existing → dropped
            (11, "delta"),   # novel → kept
            (12, "beta"),    # dup of existing → dropped
            (13, "epsilon"), # novel → kept
            (14, "delta"),   # within-shard dup → collapses to 11
        ],
        blocks=3,
    )
    kept = sorted(
        incremental_dedup_documents(new, existing).to_pandas()["doc_id"]
    )
    assert kept == [11, 13]


def test_tiny_bloom_false_positives_still_exact(ray_session):
    """An absurdly small Bloom (64 bits) false-positives heavily; the
    exact anti join must still produce the exact answer."""
    existing = _ds([(i, f"old-{i}") for i in range(50)], blocks=2)
    new = _ds(
        [(100 + i, f"new-{i}") for i in range(50)]
        + [(200 + i, f"old-{i}") for i in range(10)],
        blocks=3,
    )
    kept = sorted(
        incremental_dedup_documents(new, existing, m_bits=64, k=2).to_pandas()[
            "doc_id"
        ]
    )
    assert kept == [100 + i for i in range(50)]


def test_parity_with_duckdb(ray_session, sf_small):
    import duckdb
    import ray.data

    docs = f"{sf_small}/documents.parquet"
    def _split(want_zero):
        def f(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            mask = (ids % 3 == 0) if want_zero else (ids % 3 != 0)
            return b.filter(pa.array(mask))

        return f

    base = ray.data.read_parquet(docs, columns=["doc_id", "text"])
    existing = base.map_batches(_split(False), batch_format="pyarrow")
    new = base.map_batches(_split(True), batch_format="pyarrow")
    kept = sorted(
        incremental_dedup_documents(new, existing).to_pandas()["doc_id"]
    )
    exp = duckdb.sql(
        f"""
        WITH existing AS (SELECT * FROM '{docs}' WHERE doc_id % 3 <> 0),
             new AS (SELECT * FROM '{docs}' WHERE doc_id % 3 = 0)
        SELECT MIN(doc_id) AS doc_id FROM new
        WHERE text NOT IN (SELECT text FROM existing) GROUP BY text ORDER BY 1
        """
    ).df()["doc_id"].tolist()
    assert kept == exp
