"""Bloom-filter pre-filtered semi-join — the classic 100 TB shuffle
reducer.

A fact ⋈ dim semi-join normally shuffles every fact key. When the
filtered dim side is too big to broadcast as an exact set but its KEY
SPACE fits a fixed-size bitmap, a Bloom filter cuts the fact-side
exchange to (selectivity + false-positive rate) of the rows:

1. build: distributed OR-reduce of per-block bitmaps over the dim keys
   (``AggregateFnV2``: each block sets k bits per key into a local
   m-bit bitmap; combine = bitwise OR — the only thing that ever moves
   is the fixed-size bitmap, ~1 MB).
2. probe: broadcast the bitmap once (``ray.put``), filter fact batches
   with a vectorized k-probe AND mask.
3. exact: a normal hash semi-join on the (now small) survivor set
   removes Bloom false positives — the result is EXACT, the Bloom
   stage only reduces exchange volume.

Double hashing (Kirsch-Mitzenmacher): bit_i = h1 + i*h2 mod m, with h1
and h2 two independent multiplicative-xorshift mixes of the int64 key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)


def _mix(x: np.ndarray, c: np.uint64) -> np.ndarray:
    h = x * c
    h ^= h >> np.uint64(31)
    h *= _C2
    h ^= h >> np.uint64(29)
    return h


def _bit_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit indices via double hashing."""
    x = keys.astype(np.uint64)
    h1 = _mix(x, _C1)
    h2 = _mix(x, _C2) | np.uint64(1)  # odd → full-period stride
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
        np.int64
    )


def _set_bits(words: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(
        words, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
    )


def _test_bits(words: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """(n,) bool — all k bits set."""
    bits = (words[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=1)


def build_bloom(ds, on: str, m_bits: int = 1 << 23, k: int = 4) -> np.ndarray:
    """Distributed Bloom build over ``ds[on]`` (int keys) → uint64 word
    array (m_bits/8 bytes; default 1 MB)."""
    from ray.data.aggregate import AggregateFnV2

    class BloomAgg(AggregateFnV2):
        def __init__(self):
            super().__init__(
                "bloom",
                lambda: np.zeros(m_bits >> 6, np.uint64),
                on=None,
                ignore_nulls=True,
            )

        def aggregate_block(self, block):
            tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
            keys = tbl[on].to_numpy(zero_copy_only=False).astype(np.int64)
            words = np.zeros(m_bits >> 6, np.uint64)
            if len(keys):
                _set_bits(words, _bit_positions(keys, m_bits, k))
            return words

        def combine(self, a, b):
            return np.bitwise_or(a, b)

    return ds.aggregate(BloomAgg())["bloom"]


def bloom_semi_join(big_ds, small_ds, on: str, num_partitions: int, m_bits: int = 1 << 23, k: int = 4):
    """EXACT semi-join of ``big_ds`` against ``small_ds`` keys with a
    Bloom pre-filter on the big side. Returns (filtered_big ⋉ small).
    """
    import ray

    words = build_bloom(small_ds, on, m_bits=m_bits, k=k)
    ref = ray.put(words)  # broadcast once; node-local fetch per task

    def probe(batch: pa.Table) -> pa.Table:
        w = ray.get(ref)
        keys = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(keys):
            return batch
        return batch.filter(pa.array(_test_bits(w, _bit_positions(keys, m_bits, k))))

    from import_ray.core.context import join_safe

    survivors = big_ds.map_batches(probe, batch_format="pyarrow")
    # small_ds is caller-provided and may be aggregate-derived —
    # schema-less empty blocks on a join's right side break acero
    return survivors.join(
        join_safe(small_ds),
        join_type="left_semi",
        num_partitions=num_partitions,
        on=(on,),
    )


def bloom_fp_rate(n_keys: int, m_bits: int = 1 << 23, k: int = 4) -> float:
    """Theoretical false-positive rate (for sizing/logging)."""
    import math

    return (1.0 - math.exp(-k * n_keys / m_bits)) ** k
