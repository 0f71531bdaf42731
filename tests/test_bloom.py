"""Bloom-filter pre-filtered semi-join (stages/bloom.py)."""

import numpy as np
import pyarrow as pa

from import_ray.stages.bloom import (
    _bit_positions,
    _set_bits,
    _test_bits,
    bloom_fp_rate,
    bloom_semi_join,
    build_bloom,
)


def test_bitmap_membership_no_false_negatives():
    m, k = 1 << 16, 4
    keys = np.arange(0, 5000, 7, dtype=np.int64)
    words = np.zeros(m >> 6, np.uint64)
    _set_bits(words, _bit_positions(keys, m, k))
    assert _test_bits(words, _bit_positions(keys, m, k)).all()
    # false-positive rate on disjoint probes near the theoretical bound
    probes = np.arange(100_000, 140_000, dtype=np.int64)
    fp = _test_bits(words, _bit_positions(probes, m, k)).mean()
    assert fp < 4 * bloom_fp_rate(len(keys), m, k) + 0.01


def test_build_bloom_distributed_matches_local(ray_session):
    import ray.data

    keys = np.arange(1000, dtype=np.int64) * 13
    ds = ray.data.from_arrow(pa.table({"key": pa.array(keys)})).repartition(4)
    words = build_bloom(ds, "key", m_bits=1 << 16, k=4)
    local = np.zeros((1 << 16) >> 6, np.uint64)
    _set_bits(local, _bit_positions(keys, 1 << 16, 4))
    assert np.array_equal(words, local)


def test_bloom_semi_join_exact(ray_session, sf_small):
    """Bloom pre-filter + exact join == plain IN-subquery semi-join."""
    import duckdb
    import ray.data

    from import_ray.pipelines.relational import _read

    cust = (
        _read(sf_small, "customer", ["c_custkey", "c_mktsegment"])
        .filter(expr="c_mktsegment == 'BUILDING'")
        .select_columns(["c_custkey"])
        .rename_columns({"c_custkey": "o_custkey"})
    )
    orders = _read(sf_small, "orders", ["o_orderkey", "o_custkey"])
    out = (
        bloom_semi_join(orders, cust, on="o_custkey", num_partitions=4)
        .to_pandas()
        .sort_values(["o_orderkey"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = con.execute(
        f"""SELECT o_orderkey, o_custkey
            FROM read_parquet('{sf_small}/orders.parquet')
            WHERE o_custkey IN (
              SELECT c_custkey FROM read_parquet('{sf_small}/customer.parquet')
              WHERE c_mktsegment = 'BUILDING')
            ORDER BY o_orderkey"""
    ).df()
    con.close()
    assert out.equals(exp)
