"""bigram_next_topk: brute-force parity on synthetic docs."""

from __future__ import annotations

import pandas as pd


def _brute(texts, k, min_count):
    from collections import Counter

    c = Counter()
    for t in texts:
        toks = t.split(" ")
        for a, b in zip(toks[:-1], toks[1:]):
            c[(a, b)] += 1
    rows = []
    by_w1 = {}
    for (a, b), n in c.items():
        if n >= min_count:
            by_w1.setdefault(a, []).append((b, n))
    for a, nexts in by_w1.items():
        nexts.sort(key=lambda bn: (-bn[1], bn[0]))
        for r, (b, n) in enumerate(nexts[:k], 1):
            rows.append((a, b, n, r))
    return (
        pd.DataFrame(rows, columns=["w1", "w2", "n", "rnk"])
        .sort_values(["w1", "rnk"])
        .reset_index(drop=True)
    )


def test_bigram_next_topk_bruteforce(ray_session):
    import ray.data

    from import_ray.stages.text import bigram_next_topk

    texts = (
        ["the cat sat on the mat"] * 7
        + ["the cat ran to the mat"] * 5
        + ["a dog sat on a log"] * 6
        + ["the dog sat"] * 4
        + ["", "single", "two words"]
    )
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts}))
    got = (
        bigram_next_topk(ds, k=2, min_count=4)
        .to_pandas()
        .sort_values(["w1", "rnk"])
        .reset_index(drop=True)
    )
    want = _brute(texts, k=2, min_count=4)
    pd.testing.assert_frame_equal(
        got.astype({"n": "int64", "rnk": "int64"}), want.astype({"n": "int64", "rnk": "int64"})
    )


def test_bigram_next_topk_batch_invariance(ray_session):
    import ray.data

    from import_ray.stages.text import bigram_next_topk

    texts = [f"w{i % 7} w{(i + 1) % 7} w{(i + 2) % 7}" for i in range(200)]
    df = pd.DataFrame({"text": texts})
    a = (
        bigram_next_topk(ray.data.from_pandas(df), k=3, min_count=5)
        .to_pandas()
        .sort_values(["w1", "rnk"])
        .reset_index(drop=True)
    )
    b = (
        bigram_next_topk(
            ray.data.from_pandas([df.iloc[:37], df.iloc[37:120], df.iloc[120:]]),
            k=3,
            min_count=5,
        )
        .to_pandas()
        .sort_values(["w1", "rnk"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
