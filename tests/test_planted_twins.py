"""Planted-oracle twins for the approximate-path queries: ivf_knn and
minhash keep-best become hash-checkable against DuckDB via planted
exact copies (self-cell probing / quality-tie argmax guarantees)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest


def _oracle(sf_dir, table, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{sf_dir}/{table}.parquet')"
    )
    return con.execute(sql).df()


def test_ivf_knn_planted_oracle(ray_session, sf_small):
    import __ray_entry__ as e

    got = e.queries()["ivf_knn_planted"](sf_small)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    got = got.sort_values("query_id").reset_index(drop=True)
    want = (
        _oracle(sf_small, "embeddings", e.oracle_sql()["ivf_knn_planted"])
        .sort_values("query_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    assert len(got) == 32


def test_minhash_keep_best_planted_oracle(ray_session, sf_small):
    import __ray_entry__ as e

    got = e.queries()["minhash_keep_best_planted"](sf_small)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = (
        _oracle(sf_small, "documents", e.oracle_sql()["minhash_keep_best_planted"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    # every cluster kept its ORIGINAL (no planted copy survives)
    assert (got["doc_id"] < 1_000_000).all()


def test_pq_knn_planted_oracle(ray_session, sf_small):
    import __ray_entry__ as e

    got = e.queries()["pq_knn_planted"](sf_small)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    got = got.sort_values("query_id").reset_index(drop=True)
    want = (
        _oracle(sf_small, "embeddings", e.oracle_sql()["pq_knn_planted"])
        .sort_values("query_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_pack_docs_conservation_oracle(ray_session, sf_small):
    import __ray_entry__ as e

    got = e.queries()["pack_docs_conservation"](sf_small)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = _oracle(
        sf_small, "documents", e.oracle_sql()["pack_docs_conservation"]
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].reset_index(drop=True),
        want[sorted(want.columns)].reset_index(drop=True),
        check_dtype=False,
    )
    assert int(got["n_violations"].iloc[0]) == 0


@pytest.mark.parametrize(
    "name,table",
    [
        ("knn_int8_planted", "embeddings"),
        ("pca_invariants", "embeddings"),
        ("random_projection_invariants", "embeddings"),
    ],
)
def test_embedding_twin_oracles(ray_session, sf_small, name, table):
    import __ray_entry__ as e

    got = e.queries()[name](sf_small)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    key = got.columns[0]
    got = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
    want = _oracle(sf_small, table, e.oracle_sql()[name])
    want = want.sort_values(key).reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_kg_triples_planted_oracle(ray_session, sf_small):
    """The FLAGSHIP transcripts→triples pipeline, hash-checked: an
    orders-derived transcript fixture through the real distributed
    extraction+dedup must equal the SQL-regenerated triple set."""
    import __ray_entry__ as e

    got = e.queries()["kg_triples_planted"](sf_small)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = _oracle(sf_small, "orders", e.oracle_sql()["kg_triples_planted"])
    ks = ["subject_id", "predicate", "object_id", "object_value"]
    got = got.sort_values(ks).reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values(ks).reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["provenance"] == "transcripts").all()


def test_kg_graph_planted_oracle(ray_session, sf_small):
    """Distributed triangles/components/k-core/PageRank on the planted
    circulant co-mention graph must hit the closed-form values."""
    import duckdb as _d

    import __ray_entry__ as e

    got = e.queries()["kg_graph_planted"](sf_small)
    want = _d.connect().execute(e.oracle_sql()["kg_graph_planted"]).df()
    got = got.sort_values("metric").reset_index(drop=True)
    want = want.sort_values("metric").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize(
    "name",
    [
        "conv_reconstruct_planted",
        "conv_dedup_planted",
        "tool_transitions_planted",
        "turn_latency_planted",
    ],
)
def test_conv_family_planted_oracles(ray_session, sf_small, name):
    import __ray_entry__ as e

    got = e.queries()[name](sf_small)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    key = list(got.columns)[0]
    got = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
    want = _oracle(sf_small, "orders", e.oracle_sql()[name])
    want = want.sort_values(key).reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_kg_snapshot_planted_oracle(ray_session, sf_small):
    """As-of rebuild over the planted fixture == SQL regeneration of
    the cutoff-filtered corpus (incl. conversation aggregates)."""
    import __ray_entry__ as e

    got = e.queries()["kg_snapshot_planted"](sf_small)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = _oracle(sf_small, "orders", e.oracle_sql()["kg_snapshot_planted"])
    ks = ["subject_id", "predicate", "object_id", "object_value"]
    got = got.sort_values(ks).reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values(ks).reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_kg_diff_planted_oracle(ray_session, sf_small):
    """Incremental delta vs an even-orderkey previous snapshot: the
    ADDED set is exactly the even convs' turn triples — including the
    empty-object_value rows the presence-marker fix preserves."""
    import __ray_entry__ as e

    got = e.queries()["kg_diff_planted"](sf_small)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = _oracle(sf_small, "orders", e.oracle_sql()["kg_diff_planted"])
    got = got.sort_values("key").reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values("key").reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["diff"] == "ADDED").all()
