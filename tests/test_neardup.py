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
    rows = ngram_jaccard_pairs(ds, threshold=0.5).take_all()
    scores = {(r["doc_lo"], r["doc_hi"]): r["jaccard"] for r in rows}
    for a, b in planted_exact:
        assert scores.get((a, b)) == 1.0
    for a, b in planted_near:
        assert 0.5 <= scores.get((a, b), 0) < 1.0


def test_ngram_jaccard_matches_driver_reference(docs_with_dups):
    """The dataset-native join-verify path must equal a brute-force
    driver computation of exact shingle-set Jaccard on the candidates."""
    import numpy as np

    from import_ray.stages.neardup import minhash_lsh_pairs, ngram_jaccard_pairs

    ds, _, _ = docs_with_dups
    got = {
        (r["doc_lo"], r["doc_hi"]): r["jaccard"]
        for r in ngram_jaccard_pairs(ds, threshold=0.0).take_all()
    }
    texts = {r["doc_id"]: r["text"] for r in ds.take_all()}

    def shingle_set(t, n=3):
        toks = t.split(" ")
        if len(toks) < n:
            return {tuple(toks)}
        return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    for r in minhash_lsh_pairs(ds, threshold=0.3).take_all():
        a, b = r["doc_lo"], r["doc_hi"]
        sa, sb = shingle_set(texts[a]), shingle_set(texts[b])
        want = len(sa & sb) / len(sa | sb)
        assert abs(got[(a, b)] - want) < 1e-6, (a, b, got[(a, b)], want)


def test_distributed_labeling_matches_driver_path(docs_with_dups):
    """minhash_dedup's distributed min-label branch (max_driver_pairs=0)
    must produce byte-identical labels to the driver union-find path."""
    from import_ray.stages.neardup import minhash_dedup

    ds, _, _ = docs_with_dups

    def canon(d):
        return (
            d.to_pandas().sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        )

    driver = canon(minhash_dedup(ds, threshold=0.7))
    dist = canon(minhash_dedup(ds, threshold=0.7, max_driver_pairs=0))
    assert driver.equals(dist)


def test_propagate_min_labels_deep_chain(ray_session):
    """A long chain forces multiple propagation rounds; every node must
    converge to the chain's minimum id."""
    import ray.data

    from import_ray.stages.neardup import propagate_min_labels

    # chain 0-1-2-...-9 (diameter 9 → several groupby rounds)
    pairs = ray.data.from_items(
        [{"doc_lo": i, "doc_hi": i + 1, "est_jaccard": 1.0} for i in range(9)]
    )
    labels = {r["node"]: r["label"] for r in propagate_min_labels(pairs).take_all()}
    assert labels == {i: 0 for i in range(10)}


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


def test_keep_best_selects_highest_quality(docs_with_dups):
    """Keep-best canonical selection: exactly one kept doc per cluster,
    and it is the (distinct_ratio_micro DESC, n_chars DESC, doc_id ASC)
    argmax among that cluster's members."""
    from import_ray.stages.neardup import minhash_dedup, minhash_dedup_keep_best

    ds, _, _ = docs_with_dups
    labels = minhash_dedup(ds, threshold=0.7).to_pandas()
    docs = ds.to_pandas()

    def q(text):
        toks = [t for t in text.split(" ") if t]
        n_tok, n_dis = len(toks), len(set(toks))
        return (n_dis * 1_000_000) // n_tok, len(text)

    docs["distinct_ratio_micro"], docs["n_chars"] = zip(*docs["text"].map(q))
    merged = labels.merge(docs[["doc_id", "distinct_ratio_micro", "n_chars"]], on="doc_id")
    want = (
        merged.sort_values(
            ["cluster_id", "distinct_ratio_micro", "n_chars", "doc_id"],
            ascending=[True, False, False, True],
            kind="mergesort",
        )
        .drop_duplicates("cluster_id", keep="first")["doc_id"]
        .tolist()
    )
    got = minhash_dedup_keep_best(ds, threshold=0.7).to_pandas()
    assert sorted(got["doc_id"]) == sorted(want)
    assert got["cluster_id"].is_unique
    assert len(got) == labels["cluster_id"].nunique()
