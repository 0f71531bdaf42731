"""HyperLogLog sketch: estimate accuracy vs exact distinct counts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_hll_distinct_accuracy(ray_session):
    import ray.data

    from import_ray.stages.sketch import hll_distinct

    rng = np.random.default_rng(7)
    frames = []
    truth = {"a": 100, "b": 5_000, "c": 40_000}
    for g, n in truth.items():
        keys = rng.choice(n * 10, size=n, replace=False) + hash(g) % 1000
        # repeat each key up to 3x — dedup is the sketch's job
        rep = np.repeat(keys, rng.integers(1, 4, size=n))
        frames.append(pd.DataFrame({"g": g, "k": rep}))
    df = pd.concat(frames, ignore_index=True).sample(frac=1.0, random_state=3)

    ds = ray.data.from_pandas(df).map_batches(lambda b: b, batch_format="pyarrow")
    out = hll_distinct(ds, "g", "k", p=12).to_pandas()
    est = dict(zip(out["g"], out["n_distinct"]))
    assert set(est) == set(truth)
    for g, n in truth.items():
        rel_err = abs(est[g] - n) / n
        # 1.04/sqrt(2^12) ≈ 1.6% std error; allow 4 sigma
        assert rel_err < 0.065, (g, est[g], n)


def test_hll_query_matches_exact_within_tolerance(ray_session, sf_small):
    import __ray_entry__ as entry

    def _df(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    approx = _df(entry.queries()["hll_distinct_users"](sf_small))
    exact = _df(entry.queries()["distinct_users_by_type"](sf_small))
    merged = approx.merge(exact, on="event_type")
    assert len(merged) == len(exact)
    rel = (merged["n_distinct"] - merged["n_users"]).abs() / merged["n_users"]
    assert (rel < 0.065).all(), merged


def test_cms_top_tokens_matches_exact(ray_session, sf_small):
    """CMS heavy hitters: same top-20 token SET as exact (the planted
    corpus vocabulary is far below the 4×16384 sketch capacity, so
    collisions cannot reorder the heavy head), and every estimate is an
    upper bound within 1% of the true count."""
    import __ray_entry__ as entry

    exact = entry.queries()["top_tokens_docs"](sf_small)
    approx = entry.queries()["cms_top_tokens_docs"](sf_small)
    assert set(approx["token"]) == set(exact["token"])
    merged = exact.merge(approx, on="token")
    assert (merged["est_cnt"] >= merged["cnt"]).all()
    assert ((merged["est_cnt"] - merged["cnt"]) / merged["cnt"] < 0.01).all()


def test_profile_orders_approx_within_hll_error(ray_session, sf_small):
    """HLL-backed profiler distincts within 5% of the exact profiler
    (p=12 → ~1.6% typical); all other columns identical."""
    from import_ray.pipelines.relational import profile_orders

    exact = profile_orders(sf_small).set_index("col_name")
    approx = profile_orders(sf_small, approx=True).set_index("col_name")
    assert list(exact.index) == list(approx.index)
    for c in ("n_rows", "n_nulls", "min_v", "max_v"):
        assert (exact[c] == approx[c]).all()
    rel = (approx["n_distinct"] - exact["n_distinct"]).abs() / exact["n_distinct"]
    assert (rel <= 0.05).all(), rel.to_dict()


def test_cms_heavy_hitters_exact(ray_session):
    """CMS candidate pass + exact verify == plain groupby/HAVING."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from import_ray.stages.sketch import cms_heavy_hitters

    rng = np.random.default_rng(6)
    # 2000 light keys (1-3 occurrences) + 5 heavy keys
    keys = [f"u{i}" for i in rng.integers(0, 2000, 4000)]
    keys += ["h1"] * 50 + ["h2"] * 31 + ["h3"] * 30 + ["h4"] * 29 + ["h5"] * 100
    rng.shuffle(keys)
    t = pa.table({"user_id": pa.array(keys, pa.string())})
    got = (
        cms_heavy_hitters(ray.data.from_arrow(t), "user_id", threshold=30)
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    exp = (
        pd.Series(keys).value_counts().rename_axis("key").reset_index(name="n")
    )
    exp = exp[exp["n"] >= 30].sort_values("key").reset_index(drop=True)
    exp["n"] = exp["n"].astype("int64")
    pd.testing.assert_frame_equal(got[["key", "n"]], exp[["key", "n"]])


def test_ddsketch_grouped_quantiles_relative_error(ray_session):
    """DDSketch grouped quantiles: every estimate within the alpha
    relative-error guarantee of the exact nearest-rank quantile,
    including sub-1.0, negative and zero values."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from import_ray.stages.sketch import ddsketch_quantiles

    rng = np.random.default_rng(9)
    rows_g, rows_v = [], []
    data = {
        "a": np.abs(rng.lognormal(3, 2, 20000)),
        "b": rng.uniform(0.001, 0.9, 5000),  # sub-1.0 buckets
        "c": np.concatenate([-np.abs(rng.normal(50, 20, 3000)), [0.0] * 100]),
    }
    for g, v in data.items():
        rows_g += [g] * len(v)
        rows_v += list(v)
    t = pa.table(
        {
            "grp": pa.array(rows_g, pa.string()),
            "val": pa.array(rows_v, pa.float64()),
        }
    )
    alpha = 0.01
    out = ddsketch_quantiles(
        ray.data.from_arrow(t), "grp", "val", quantiles=(0.1, 0.5, 0.9, 0.99),
        alpha=alpha,
    ).take_all()
    assert len(out) == 12
    for r in out:
        v = data[r["grp"]]
        exact = np.sort(v)[max(1, int(np.ceil(r["q"] * len(v)))) - 1]
        if exact == 0.0:
            assert abs(r["value"]) < 1e-9
        else:
            rel = abs(r["value"] - exact) / abs(exact)
            assert rel <= alpha + 1e-9, (r, exact, rel)


def test_cms_heavy_hitters_null_keys(ray_session):
    """ADVICE r4: null keys form their own group (SQL GROUP BY keeps
    the NULL group) and survive both the candidate and exact passes as
    genuine nulls, not the string 'None'."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from import_ray.stages.sketch import cms_heavy_hitters

    rng = np.random.default_rng(11)
    keys = [f"u{i}" for i in rng.integers(0, 500, 1000)]
    keys += [None] * 40 + ["h1"] * 35
    rng.shuffle(keys)
    t = pa.table({"user_id": pa.array(keys, pa.string())})
    got = (
        cms_heavy_hitters(ray.data.from_arrow(t), "user_id", threshold=30)
        .to_pandas()
    )
    null_rows = got[got["key"].isna()]
    assert len(null_rows) == 1 and int(null_rows["n"].iloc[0]) == 40
    assert "None" not in set(got["key"].dropna())
    h1 = got[got["key"] == "h1"]
    assert len(h1) == 1 and int(h1["n"].iloc[0]) == 35


def test_ddsketch_excludes_non_finite(ray_session):
    """ADVICE r4: NaN/±inf values are excluded (SQL NULL semantics)
    instead of silently counting as zeros in the zero bucket."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from import_ray.stages.sketch import ddsketch_quantiles

    vals = [float(v) for v in range(1, 101)]
    dirty = vals + [float("nan")] * 50 + [float("inf"), float("-inf")]
    t = pa.table(
        {
            "grp": pa.array(["g"] * len(dirty), pa.string()),
            "val": pa.array(dirty, pa.float64()),
        }
    )
    out = ddsketch_quantiles(
        ray.data.from_arrow(t), "grp", "val", quantiles=(0.5,), alpha=0.01
    ).take_all()
    assert len(out) == 1
    # median of 1..100 is 50; with NaNs-as-zeros it would be ~24
    exact = 50.0
    assert abs(out[0]["value"] - exact) / exact <= 0.01 + 1e-9
