"""Edit-distance similarity join: kernel parity, losslessness, caps."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ref_lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            t = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = t
    return dp[n]


def test_levenshtein_batch_fuzz():
    """Vectorized DP equals the classic row DP on random strings,
    including empty strings and heavy length skew."""
    from import_ray.stages.editdist import levenshtein_batch

    rng = random.Random(17)
    A, B = [], []
    for _ in range(800):
        A.append("".join(rng.choices("abcd", k=rng.randint(0, 15))))
        B.append("".join(rng.choices("abcd", k=rng.randint(0, 15))))
    got = levenshtein_batch(pa.array(A), pa.array(B))
    want = np.array([_ref_lev(a, b) for a, b in zip(A, B)])
    assert (got == want).all()


def test_edit_distance_pairs_lossless_bruteforce(ray_session):
    """End-to-end join equals the full quadratic brute force on a
    random corpus with a small alphabet (many accidental near-pairs)
    and strings BELOW the q-gram losslessness length (the synthetic
    short bucket must catch them)."""
    import ray.data

    from import_ray.stages.editdist import edit_distance_pairs

    rng = random.Random(5)
    names = ["".join(rng.choices("ab", k=rng.randint(2, 10))) for _ in range(120)]
    tbl = pa.table(
        {"id": pa.array(range(120), pa.int64()), "name": pa.array(names)}
    )
    got = (
        edit_distance_pairs(ray.data.from_arrow(tbl), max_dist=2, q=2)
        .to_pandas()
        .sort_values(["id_lo", "id_hi"])
        .reset_index(drop=True)
    )
    rows = []
    for i in range(120):
        for j in range(i + 1, 120):
            d = _ref_lev(names[i], names[j])
            if d <= 2:
                rows.append((i, j, d))
    want = pd.DataFrame(rows, columns=["id_lo", "id_hi", "dist"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(want) > 50  # the plant actually exercises the join


def test_edit_distance_hub_cap(ray_session):
    """max_bucket drops hub-gram buckets: with every string sharing one
    hub bigram, a tiny cap must strictly shrink the result."""
    import ray.data

    from import_ray.stages.editdist import edit_distance_pairs

    # all strings share the 'zz' hub gram; pairs differ via suffix
    names = ["zz" + format(i, "06d") for i in range(40)]
    tbl = pa.table({"id": pa.array(range(40), pa.int64()), "name": pa.array(names)})
    full = edit_distance_pairs(
        ray.data.from_arrow(tbl), max_dist=2, q=2
    ).count()
    capped = edit_distance_pairs(
        ray.data.from_arrow(tbl), max_dist=2, q=2, max_bucket=2
    ).count()
    assert full > 0
    assert capped < full
