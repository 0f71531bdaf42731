"""Edge cases for stages/sampling.py and stages/repetition.py beyond
the oracle-compare parity in test_relational_oracle.py: short docs,
batch-size invariance of the keyed exchanges, planted cross-dup."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_table(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_bigram_stats_short_docs_dropped():
    from import_ray.stages.repetition import bigram_repetition_stats

    out = bigram_repetition_stats(
        _docs_table([(1, "solo"), (2, ""), (3, "a b a b a"), (4, "x y")])
    ).to_pandas()
    # single-token docs (incl. "" -> [""]) have zero bigrams -> dropped
    assert sorted(out["doc_id"]) == [3, 4]
    r3 = out[out.doc_id == 3].iloc[0]
    # bigrams of "a b a b a": ab ba ab ba -> 4 total, 2 distinct, top=2
    assert (r3.n_bigrams, r3.n_distinct_bigrams, r3.top_bigram_count) == (4, 2, 2)
    r4 = out[out.doc_id == 4].iloc[0]
    assert (r4.n_bigrams, r4.n_distinct_bigrams, r4.top_bigram_count) == (1, 1, 1)


def test_cross_dup_planted(ray_session):
    import ray.data

    from import_ray.stages.repetition import cross_dup_stats

    # doc 1 and 2 share their full text (all shingles cross-dup);
    # doc 3 is unique; doc 4 shares one 3-gram window with doc 1.
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),
        (3, "one two three four five six"),
        (4, "zz alpha beta gamma yy qq"),
    ]
    ds = ray.data.from_arrow(_docs_table(rows))
    out = (
        cross_dup_stats(ds, n=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_shingles"] == 3 and out.loc[1, "n_cross_dup"] == 3
    assert out.loc[2, "n_cross_dup"] == 3
    assert out.loc[3, "n_cross_dup"] == 0
    assert out.loc[4, "n_shingles"] == 4 and out.loc[4, "n_cross_dup"] == 1


def test_dup_span_planted(ray_session):
    import ray.data

    from import_ray.stages.repetition import dup_span_stats

    # docs 1/2 share a 5-token prefix (3 consecutive dup shingles);
    # doc 3 additionally repeats one of those shingles later, at a
    # non-adjacent position — run must not bridge the gap.
    rows = [
        (1, "alpha beta gamma delta epsilon uu vv ww"),
        (2, "alpha beta gamma delta epsilon xx yy zz"),
        (3, "qq rr alpha beta gamma ss tt alpha beta gamma"),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    out = dup_span_stats(ds, n=3).to_pandas().set_index("doc_id").sort_index()
    # docs 1/2: shingles 1..3 dup ("alpha beta gamma".."gamma delta epsilon")
    assert out.loc[1, "max_dup_run"] == 3 and out.loc[1, "n_dup_pos"] == 3
    assert out.loc[1, "n_pos"] == 6
    # doc 3: "alpha beta gamma" at pos 3 and pos 8 — two runs of 1
    assert out.loc[3, "n_dup_pos"] == 2 and out.loc[3, "max_dup_run"] == 1


def test_cross_dup_batch_size_invariant(ray_session, sf_small):
    """The keyed exchanges must make the result independent of how
    the input is blocked."""
    import ray.data

    from import_ray.pipelines.relational import _read
    from import_ray.stages.repetition import cross_dup_stats

    base = _read(sf_small, "documents", ["doc_id", "text"])
    a = cross_dup_stats(base).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        cross_dup_stats(base.repartition(13))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_stratified_sample_deterministic_and_capped(ray_session, sf_small):
    from import_ray.pipelines.relational import _read
    from import_ray.stages.sampling import stratified_sample

    base = _read(sf_small, "documents", ["doc_id", "source"])
    a = stratified_sample(base, k=5).to_pandas()
    assert (a.groupby("source").size() <= 5).all()
    b = stratified_sample(base.repartition(7), k=5).to_pandas()
    key = lambda df: df.sort_values(["source", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(a), key(b))


def test_mixture_sample_rates(ray_session, sf_small):
    """Observed keep rates track the configured per-source rates."""
    from import_ray.pipelines.relational import _read
    from import_ray.stages.sampling import mixture_sample

    base = _read(sf_small, "documents", ["doc_id", "source"])
    out = mixture_sample(base, rates={"src0": 1.0}, rest=0.0).to_pandas()
    assert set(out["source"]) == {"src0"}
    # rate 1.0 keeps every src0 row
    import pyarrow.parquet as pq

    n_src0 = (
        pq.read_table(f"{sf_small}/documents.parquet", columns=["source"])
        .to_pandas()["source"]
        .eq("src0")
        .sum()
    )
    assert len(out) == n_src0


def test_sampled_percentiles_close_to_exact(ray_session, sf_small):
    """The bottom-k sample quantiles land near the exact quantiles."""
    import duckdb

    from import_ray.pipelines.relational import _read
    from import_ray.stages.sampling import sampled_percentiles

    res = sampled_percentiles(
        _read(sf_small, "orders", ["o_orderkey", "o_totalprice"]), k=1024
    ).iloc[0]
    exact = duckdb.sql(
        "SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50 "
        f"FROM read_parquet('{sf_small}/orders.parquet')"
    ).df()["p50"][0]
    # sample error bound ~ O(1/sqrt(k)) of the distribution span
    assert abs(res["p50_cents"] / 100.0 - exact) / max(exact, 1.0) < 0.15
    assert res["sample_n"] == 1024
