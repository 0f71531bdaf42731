"""Inverted index + token-pair co-occurrence unit tests (cap semantics
beyond the DuckDB oracle parity in test_relational_oracle.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture()
def tiny_docs(ray_session):
    import ray.data

    docs = [
        (0, "a b c"),
        (1, "a b"),
        (2, "a c c"),  # duplicate token within doc → one posting
        (3, "a"),
        (4, "a d"),
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
    )


def test_inverted_index_exact(tiny_docs):
    from import_ray.stages.text import inverted_index

    got = {
        r["token"]: (r["df"], r["postings"])
        for r in inverted_index(tiny_docs, max_postings=20).take_all()
    }
    assert got == {
        "a": (5, "0,1,2,3,4"),
        "b": (2, "0,1"),
        "c": (2, "0,2"),
        "d": (1, "4"),
    }


def test_inverted_index_posting_cap_keeps_df_exact(tiny_docs):
    from import_ray.stages.text import inverted_index

    got = {
        r["token"]: (r["df"], r["postings"])
        for r in inverted_index(tiny_docs, max_postings=2).take_all()
    }
    # df stays exact; postings truncate to the 2 smallest doc ids
    assert got["a"] == (5, "0,1")
    assert got["b"] == (2, "0,1")


def test_token_pairs_exact(tiny_docs):
    from import_ray.stages.text import token_pair_doc_counts

    got = token_pair_doc_counts(tiny_docs, top_k=10)
    rows = {(r.tok_a, r.tok_b): int(r.n_docs) for r in got.itertuples()}
    assert rows == {
        ("a", "b"): 2,
        ("a", "c"): 2,
        ("a", "d"): 1,
        ("b", "c"): 1,
    }
    # deterministic order: count desc, then lexicographic
    assert got.iloc[0][["tok_a", "tok_b"]].tolist() in (["a", "b"],)


def test_token_pairs_cap_guard(ray_session):
    import ray.data

    from import_ray.stages.text import token_pair_doc_counts

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array(["t0 t1 t2 t3 t4"], pa.string()),
            }
        )
    )
    with pytest.raises(Exception, match="max_tokens_per_doc"):
        token_pair_doc_counts(ds, top_k=5, max_tokens_per_doc=3)
