"""Near-dup operators: planted-duplicate recall + determinism."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def docs_with_dups(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(200)]
    texts = [" ".join(rng.choice(vocab, 40)) for _ in range(60)]
    # plant: 3 exact dup pairs and 3 near-dup pairs (small edits)
    planted_exact = []
    planted_near = []
    for i in range(3):
        texts.append(texts[i])  # exact dup of doc i → doc 60+i
        planted_exact.append((i, 60 + i))
    for i in range(3, 6):
        toks = texts[i].split()
        toks[5] = "CHANGED"
        texts.append(" ".join(toks))  # near dup of doc i → doc 63+i-3
        planted_near.append((i, 60 + i))
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    return ds, planted_exact, planted_near


def test_minhash_finds_planted_dups(docs_with_dups):
    from import_ray.stages.neardup import minhash_dedup

    ds, planted_exact, planted_near = docs_with_dups
    labels = minhash_dedup(ds, threshold=0.7).to_pandas()
    lab = dict(zip(labels["doc_id"], labels["cluster_id"]))
    for a, b in planted_exact + planted_near:
        assert lab[a] == lab[b], f"docs {a},{b} should share a cluster"


def test_simhash_finds_exact_dups(docs_with_dups):
    from import_ray.stages.neardup import simhash_pairs

    ds, planted_exact, _ = docs_with_dups
    pairs = {(r["doc_lo"], r["doc_hi"]) for r in simhash_pairs(ds).take_all()}
    for a, b in planted_exact:
        assert (a, b) in pairs


def test_ngram_jaccard_exact_scores(docs_with_dups):
    from import_ray.stages.neardup import ngram_jaccard_pairs

    ds, planted_exact, planted_near = docs_with_dups
    df = ngram_jaccard_pairs(ds, threshold=0.5)
    scores = {(r.doc_lo, r.doc_hi): r.jaccard for r in df.itertuples()}
    for a, b in planted_exact:
        assert scores.get((a, b)) == 1.0
    for a, b in planted_near:
        assert 0.5 <= scores.get((a, b), 0) < 1.0


def test_minhash_deterministic(docs_with_dups):
    from import_ray.stages.neardup import minhash_dedup

    ds, _, _ = docs_with_dups

    def canon(d):
        return (
            d.to_pandas().sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        )

    l1 = canon(minhash_dedup(ds, threshold=0.7))
    l2 = canon(minhash_dedup(ds, threshold=0.7))
    assert l1.equals(l2)
