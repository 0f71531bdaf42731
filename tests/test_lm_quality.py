"""Bigram-LM perplexity scoring (CCNet-style Stupid Backoff)."""

import math

import numpy as np
import pyarrow as pa
import ray.data


TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog",
    "the cat and the dog sat",
    "on the mat sat a cat",
    "dogs chase cats",
]


def _docs(texts, start=0):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(start, start + len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _ref_model(texts, alpha=0.4):
    """Driver-side reference: token-string counts, Stupid Backoff."""
    uni, bi, total = {}, {}, 0
    for t in texts:
        toks = t.split(" ")
        total += len(toks)
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for w1, w2 in zip(toks, toks[1:]):
            bi[(w1, w2)] = bi.get((w1, w2), 0) + 1
    return uni, bi, total, alpha


def _ref_ppl(text, model):
    uni, bi, total, alpha = model
    floor = math.log(1.0 / (total + len(uni)))
    toks = text.split(" ")
    if len(toks) == 1:
        lp = math.log(uni[toks[0]] / total) if toks[0] in uni else floor
        return math.exp(-lp)
    nll = 0.0
    for w1, w2 in zip(toks, toks[1:]):
        if (w1, w2) in bi:
            lp = math.log(bi[(w1, w2)] / uni[w1])
        elif w2 in uni:
            lp = math.log(alpha) + math.log(uni[w2] / total)
        else:
            lp = math.log(alpha) + floor
        nll -= lp
    return math.exp(nll / (len(toks) - 1))


def test_perplexity_matches_reference(ray_session):
    from import_ray.stages.lm_quality import lm_perplexity

    score_texts = TRAIN + ["the cat sat", "zz qq xx", "mat"]
    got = (
        lm_perplexity(_docs(score_texts), ref_ds=_docs(TRAIN))
        .to_pandas()
        .set_index("doc_id")["ppl"]
        .to_dict()
    )
    model = _ref_model(TRAIN)
    for i, t in enumerate(score_texts):
        want = _ref_ppl(t, model)
        assert abs(got[i] - want) < 1e-4, (t, got[i], want)


def test_garbled_docs_score_higher(ray_session):
    from import_ray.stages.lm_quality import lm_perplexity

    garbled = ["zq" + t.replace(" ", " zq") for t in TRAIN]
    df = lm_perplexity(
        _docs(TRAIN + garbled), ref_ds=_docs(TRAIN)
    ).to_pandas()
    ppl = df.set_index("doc_id")["ppl"]
    n = len(TRAIN)
    for i in range(n):
        assert ppl[n + i] > ppl[i]


def test_min_count_and_cap(ray_session):
    from import_ray.stages.lm_quality import lm_perplexity, train_bigram_lm

    m = train_bigram_lm(_docs(TRAIN), min_count=2)
    assert (m["uni_cnts"] >= 2).all() and (m["bi_cnts"] >= 2).all()
    capped = train_bigram_lm(_docs(TRAIN), max_entries=3)
    assert len(capped["uni_keys"]) == 3 and len(capped["bi_keys"]) == 3
    # cap keeps the HIGHEST counts
    full = train_bigram_lm(_docs(TRAIN))
    assert set(capped["uni_cnts"]) <= set(full["uni_cnts"])
    assert capped["uni_cnts"].min() >= np.sort(full["uni_cnts"])[-3:].min()
    # scoring still runs with a capped model
    out = lm_perplexity(_docs(["the cat"]), model=capped).to_pandas()
    assert len(out) == 1 and out["ppl"].iloc[0] > 0


def test_n_bigrams_column(ray_session):
    from import_ray.stages.lm_quality import lm_perplexity

    df = (
        lm_perplexity(_docs(["a b c d", "solo"]), ref_ds=_docs(TRAIN))
        .to_pandas()
        .set_index("doc_id")
    )
    assert df.loc[0, "n_bigrams"] == 3
    assert df.loc[1, "n_bigrams"] == 1  # single-token doc scores its unigram
