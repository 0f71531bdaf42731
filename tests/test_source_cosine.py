"""source_token_cosine unit tests: exact hand-computed cosines on a
tiny corpus plus DuckDB oracle parity at sf0.001 (the driver runs the
same parity at sf0.01)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture()
def tiny_sourced_docs(ray_session):
    import ray.data

    docs = [
        ("A", "x x y"),
        ("A", "y z"),
        ("B", "x y y"),
        ("C", "q q q"),  # disjoint vocabulary → cosine 0 with A and B
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "source": pa.array([s for s, _ in docs], pa.string()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
    )


def test_source_token_cosine_exact(tiny_sourced_docs):
    from import_ray.stages.text import source_token_cosine

    out = source_token_cosine(tiny_sourced_docs)
    got = {
        (r.src_a, r.src_b): (r.dot, r.cos_x1e9) for r in out.itertuples(index=False)
    }
    # A counts: x=2 y=2 z=1 (|A|² = 9); B counts: x=1 y=2 (|B|² = 5)
    dot_ab = 2 * 1 + 2 * 2  # = 6
    cos_ab = math.floor(6.0 / (math.sqrt(9.0) * math.sqrt(5.0)) * 1e9)
    assert got[("A", "B")] == (dot_ab, cos_ab)
    assert got[("A", "C")] == (0, 0)
    assert got[("B", "C")] == (0, 0)
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}


def test_source_token_cosine_oracle_parity(ray_session, sf_small):
    import ray.data

    from import_ray.stages.text import SOURCE_TOKEN_COSINE_SQL, source_token_cosine

    ds = ray.data.read_parquet(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    got = (
        source_token_cosine(ds)
        .sort_values(["src_a", "src_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = (
        con.execute(SOURCE_TOKEN_COSINE_SQL)
        .df()
        .sort_values(["src_a", "src_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_source_vocab_overlap_exact(tiny_sourced_docs):
    from import_ray.stages.text import source_vocab_overlap

    out = source_vocab_overlap(tiny_sourced_docs)
    got = {
        (r.src_a, r.src_b): (r.n_common, r.n_union, r.jaccard_x1e9)
        for r in out.itertuples(index=False)
    }
    # vocab A={x,y,z}, B={x,y}, C={q}: A∩B={x,y}, A∪B={x,y,z}
    assert got[("A", "B")] == (2, 3, math.floor(2.0 / 3.0 * 1e9))
    # zero-overlap pairs are dropped (mirrors the oracle's inner join)
    assert set(got) == {("A", "B")}


def test_vocab_stats_by_source_exact(tiny_sourced_docs):
    from import_ray.stages.text import vocab_stats_by_source

    out = vocab_stats_by_source(tiny_sourced_docs)
    got = {
        r.source: (r.n_tokens, r.n_distinct, r.n_hapax, r.max_cnt)
        for r in out.itertuples(index=False)
    }
    # A: x×2 y×3? — A docs: "x x y" + "y z" → x=2 y=2 z=1 → 5 tokens,
    # 3 types, 1 hapax (z), max 2
    assert got["A"] == (5, 3, 1, 2)
    assert got["B"] == (3, 2, 1, 2)  # x=1 y=2 → hapax x
    assert got["C"] == (3, 1, 0, 3)  # q=3
    assert list(out["source"]) == ["A", "B", "C"]  # sorted


def test_vocab_oracle_parity_sf_small(ray_session, sf_small):
    import ray.data

    from import_ray.stages.text import (
        SOURCE_VOCAB_OVERLAP_SQL,
        VOCAB_STATS_SQL,
        source_vocab_overlap,
        vocab_stats_by_source,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )

    def ds():
        return ray.data.read_parquet(
            f"{sf_small}/documents.parquet", columns=["doc_id", "text", "source"]
        )

    got = source_vocab_overlap(ds()).sort_values(["src_a", "src_b"]).reset_index(drop=True)
    want = (
        con.execute(SOURCE_VOCAB_OVERLAP_SQL)
        .df()
        .sort_values(["src_a", "src_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    got = vocab_stats_by_source(ds()).reset_index(drop=True)
    want = con.execute(VOCAB_STATS_SQL).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_regr_orders_by_priority_oracle(ray_session, sf_small):
    from import_ray.pipelines.relational import (
        REGR_BY_PRIORITY_SQL,
        regr_orders_by_priority,
    )

    got = regr_orders_by_priority(sf_small).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_small}/orders.parquet')"
    )
    want = con.execute(REGR_BY_PRIORITY_SQL).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_mixture_weights_oracle(ray_session, sf_small):
    import ray.data

    from import_ray.stages.text import MIXTURE_WEIGHTS_SQL, mixture_weights_by_source

    ds = ray.data.read_parquet(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    got = mixture_weights_by_source(ds).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = con.execute(MIXTURE_WEIGHTS_SQL).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # shares sum to ~1e9, sqrt weights dominate shares for small sources
    assert abs(int(got["share_x1e9"].sum()) - 10**9) < len(got)
    assert (got["w_sqrt_x1e9"] >= got["share_x1e9"]).all()


def test_user_skew_profile_oracle(ray_session, sf_small):
    from import_ray.pipelines.relational import USER_SKEW_SQL, user_skew_profile

    got = user_skew_profile(sf_small).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_small}/events.parquet')"
    )
    want = con.execute(USER_SKEW_SQL).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) == 10
