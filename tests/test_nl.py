"""NL artifacts: golden parity with the reference's nl fixtures
(simple/tests/stats/test_data/nl)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

DATA = "/root/reference/simple/tests/stats/test_data/nl"
FAKE = "//fake/path"

CASES = [
    ("sv_triples", False),
    ("topic_triples", True),
    ("sv_and_topic_triples", True),
]


def _read_triples(path: str) -> list[dict]:
    df = pd.read_csv(path, dtype=str, keep_default_na=False)
    return df.to_dict("records")


def _subject_types(triples: list[dict]) -> dict[str, set]:
    types: dict[str, set] = {}
    for t in triples:
        if t["predicate"] == "typeOf":
            types.setdefault(t["subject_id"], set()).add(t["object_id"])
    return types


@pytest.mark.parametrize("case,with_topic_cache", CASES)
def test_nl_golden(tmp_path, case, with_topic_cache):
    from import_ray.stages import nl

    triples = _read_triples(f"{DATA}/input/{case}.csv")
    types = _subject_types(triples)

    def of_types(allowed: set) -> list[dict]:
        return [t for t in triples if types.get(t["subject_id"], set()) & allowed]

    nl_dir = str(tmp_path / "nl")
    # sentences: SV + Topic subjects only (nl_test.py removes SVPG first)
    nl.generate_nl_sentences(
        of_types({"StatisticalVariable", "Topic"}), nl_dir
    )

    got_sentences = open(f"{nl_dir}/sentences.csv").read()
    want_sentences = open(f"{DATA}/expected/{case}/sentences.csv").read()
    assert got_sentences == want_sentences

    got_catalog = (
        open(f"{nl_dir}/embeddings/custom_catalog.yaml")
        .read()
        .replace(nl_dir, FAKE)
    )
    want_catalog = open(f"{DATA}/expected/{case}/custom_catalog.yaml").read()
    assert got_catalog == want_catalog

    if with_topic_cache:
        nl.generate_topic_cache(of_types({"Topic", "StatVarPeerGroup"}), nl_dir)
        got_cache = json.load(open(f"{nl_dir}/custom_dc_topic_cache.json"))
        want_cache = json.load(
            open(f"{DATA}/expected/{case}/custom_dc_topic_cache.json")
        )
        assert got_cache == want_cache


def test_offline_embeddings_artifact(tmp_path):
    """generate_embeddings: populated embeddings.csv with the published
    artifact shape (dcid,sentence,v0..v{d-1}), unit-norm deterministic
    vectors; similar sentences land closer than dissimilar ones."""
    import numpy as np
    import pandas as pd

    from import_ray.stages.nl import HashedNgramEmbedder, generate_embeddings

    df = pd.DataFrame(
        {
            "dcid": ["sv/a", "sv/b", "sv/c"],
            "sentence": [
                "population of the city",
                "city population count",
                "annual rainfall in millimeters",
            ],
        }
    )
    path = generate_embeddings(df, str(tmp_path), dim=64)
    out = pd.read_csv(path)
    assert list(out.columns) == ["dcid", "sentence"] + [f"v{i}" for i in range(64)]
    vecs = out[[f"v{i}" for i in range(64)]].to_numpy()
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, atol=1e-4)
    # determinism
    e = HashedNgramEmbedder(dim=64)
    np.testing.assert_allclose(
        e.embed(df["sentence"].tolist()), e.embed(df["sentence"].tolist())
    )
    # topical similarity: shared-vocabulary pair beats the unrelated pair
    sim_ab = float(vecs[0] @ vecs[1])
    sim_ac = float(vecs[0] @ vecs[2])
    assert sim_ab > sim_ac
