"""Deterministic shuffle-shard export (sampling.shuffle_shards)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from import_ray.stages.sampling import shuffle_shards, write_shuffled_shards


def _ds(n=200, blocks=3):
    import ray.data

    tbl = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
    return ray.data.from_arrow(tbl).repartition(blocks)


def test_permutation_complete_and_deterministic(ray_session):
    a = shuffle_shards(_ds(), n_shards=4, seed=3).to_pandas()
    b = shuffle_shards(_ds(), n_shards=4, seed=3).to_pandas()
    assert sorted(a["doc_id"]) == list(range(200))
    # within each shard, pos is 0..len-1 exactly once
    for s, g in a.groupby("shard_id"):
        assert sorted(g["pos"]) == list(range(len(g)))
    key = ["doc_id", "shard_id", "pos"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )
    c = shuffle_shards(_ds(), n_shards=4, seed=4).to_pandas()
    merged = a.merge(c, on="doc_id", suffixes=("_a", "_c"))
    assert (
        (merged["shard_id_a"] != merged["shard_id_c"])
        | (merged["pos_a"] != merged["pos_c"])
    ).any()


def test_matches_sql_rank(ray_session):
    import duckdb

    got = (
        shuffle_shards(_ds(), n_shards=8, seed=7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        """
        SELECT doc_id,
               CAST(((doc_id + 7) * 2654435761) % 4294967296 % 8 AS BIGINT) AS shard_id,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY ((doc_id + 7) * 2654435761) % 4294967296 % 8
                 ORDER BY ((doc_id + 7) * 2654435761) % 4294967296, doc_id) - 1
                 AS BIGINT) AS pos
        FROM range(200) t(doc_id) ORDER BY doc_id
        """
    ).df()
    assert got[["doc_id", "shard_id", "pos"]].equals(
        exp[["doc_id", "shard_id", "pos"]].astype(np.int64)
    )


def test_writer_layout_and_rerun_identical(ray_session, tmp_out):
    n_written = write_shuffled_shards(_ds(), tmp_out, n_shards=4, seed=3)
    assert n_written == 200
    seen = []
    for d in sorted(os.listdir(tmp_out)):
        t = pq.read_table(os.path.join(tmp_out, d, "part.parquet"))
        assert t["pos"].to_pylist() == list(range(t.num_rows))
        seen += t["doc_id"].to_pylist()
    assert sorted(seen) == list(range(200))
    before = {
        d: open(os.path.join(tmp_out, d, "part.parquet"), "rb").read()
        for d in os.listdir(tmp_out)
    }
    write_shuffled_shards(_ds(), tmp_out, n_shards=4, seed=3)
    after = {
        d: open(os.path.join(tmp_out, d, "part.parquet"), "rb").read()
        for d in os.listdir(tmp_out)
    }
    assert before == after
