"""Context-window chunking + sequence packing (stages/chunking.py)."""

import numpy as np
import pyarrow as pa
import pytest

from import_ray.stages.chunking import chunk_docs, pack_sequences


def _docs_ds(texts, ids=None):
    import ray.data

    ids = list(range(len(texts))) if ids is None else ids
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )


def test_chunk_docs_shapes(ray_session):
    # doc 0: 5 tokens (< window) → 1 chunk; doc 1: exactly window;
    # doc 2: window + 1 → 2 chunks (second short)
    texts = [
        " ".join(["a"] * 5),
        " ".join(["b"] * 8),
        " ".join(["c"] * 9),
    ]
    out = chunk_docs(_docs_ds(texts), window=8, stride=4).to_pandas()
    by_doc = out.groupby("doc_id")["chunk_tokens"].apply(list).to_dict()
    assert by_doc[0] == [5]
    assert by_doc[1] == [8]
    assert by_doc[2] == [8, 5]  # second window covers tokens 4..8


def test_chunk_docs_token_coverage(ray_session):
    """Non-overlapping chunking (stride == window) partitions exactly:
    sum of chunk tokens == doc tokens."""
    texts = [" ".join(["t"] * n) for n in (1, 7, 8, 9, 25, 64)]
    out = chunk_docs(_docs_ds(texts), window=8, stride=8).to_pandas()
    sums = out.groupby("doc_id")["chunk_tokens"].sum().to_dict()
    assert sums == {0: 1, 1: 7, 2: 8, 3: 9, 4: 25, 5: 64}
    assert (out["chunk_tokens"] > 0).all()


def test_chunk_docs_invalid_params():
    with pytest.raises(ValueError):
        chunk_docs(None, window=4, stride=8)


def test_pack_sequences_invariants(ray_session):
    lengths = [100, 90, 60, 50, 40, 30, 20, 10, 5, 300]
    texts = [" ".join(["w"] * n) for n in lengths]
    out = pack_sequences(_docs_ds(texts), capacity=128).to_pandas()
    # every doc packed exactly once; token totals preserved
    assert out["n_docs"].sum() == len(lengths)
    assert out["pack_tokens"].sum() == sum(lengths)
    # capacity respected except oversize singletons
    over = out[out["pack_tokens"] > 128]
    assert (over["n_docs"] == 1).all()
    assert out["pack_key"].is_unique
    # FFD on these lengths should need at most 4 normal bins + 1 oversize
    assert len(out) <= 5


def test_pack_sequences_real_docs(ray_session, sf_small):
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
    )
    out = pack_sequences(ds, capacity=512).to_pandas()
    assert out["n_docs"].sum() == 500
    assert (out.loc[out["n_docs"] > 1, "pack_tokens"] <= 512).all()
