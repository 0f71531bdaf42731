"""Distributed BPE training parity vs a driver-side reference
implementation (Sennrich-2016 semantics, deterministic tie-break)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

SENNRICH = [
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
]


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data

    from import_ray.core.context import configure_data_context

    configure_data_context()
    return ray.data.from_arrow(
        pa.table({"text": pa.array(SENNRICH, pa.string())})
    ).repartition(3)


def test_word_counts_exact(docs_ds):
    from import_ray.stages.bpe import word_counts

    got = {r["word"]: r["cnt"] for r in word_counts(docs_ds).take_all()}
    assert got == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_bpe_matches_reference(docs_ds):
    from import_ray.stages.bpe import bpe_train, bpe_train_reference

    got = bpe_train(docs_ds, num_merges=10)
    want = bpe_train_reference(SENNRICH, num_merges=10)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )
    # the classic example's first merges: 'es' (9), then 'est' (9)
    assert (got.iloc[0]["left"], got.iloc[0]["right"]) == ("e", "s")
    assert int(got.iloc[0]["pair_count"]) == 9
    assert (got.iloc[1]["left"], got.iloc[1]["right"]) == ("es", "t")


def test_bpe_min_pair_count_stops(docs_ds):
    from import_ray.stages.bpe import bpe_train, bpe_train_reference

    got = bpe_train(docs_ds, num_merges=100, min_pair_count=3)
    want = bpe_train_reference(SENNRICH, num_merges=100, min_pair_count=3)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )
    assert (got["pair_count"] >= 3).all()


def test_bpe_on_real_docs(ray_session, sf_small):
    """Smoke on the documents table: merges are produced, counts are
    non-increasing in no sense required (BPE counts needn't decrease
    monotonically), but all are >= min_pair_count and rules unique."""
    import ray.data

    from import_ray.core.context import configure_data_context
    from import_ray.stages.bpe import bpe_train

    configure_data_context()
    ds = ray.data.read_parquet(f"{sf_small}/documents.parquet", columns=["text"])
    got = bpe_train(ds, num_merges=8)
    assert len(got) == 8
    assert got["rank"].tolist() == list(range(1, 9))
    assert (got["pair_count"] >= 2).all()
    assert not got.duplicated(["left", "right"]).any()


def test_bpe_encoder_matches_sequential_apply(docs_ds):
    """Actor-pool encode (iterative lowest-rank merge) must equal the
    independent reference algorithm (apply rules sequentially in rank
    order), both per Sennrich 2016."""
    import pyarrow as pa
    import ray.data

    from import_ray.stages.bpe import _merge_word, bpe_token_counts, bpe_train

    merges = bpe_train(docs_ds, num_merges=10)
    rules = list(zip(merges["left"], merges["right"]))

    def ref_encode_len(word: str) -> int:
        syms = list(word)
        for l, r in rules:
            syms = _merge_word(syms, l, r)
        return len(syms)

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(SENNRICH))), pa.int64()),
                "text": pa.array(SENNRICH, pa.string()),
            }
        )
    ).repartition(2)
    got = (
        bpe_token_counts(docs, merges, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(SENNRICH):
        words = [w for w in t.split(" ") if w]
        assert int(got.loc[i, "n_words"]) == len(words)
        assert int(got.loc[i, "n_bpe_tokens"]) == sum(ref_encode_len(w) for w in words)
