"""NL artifact generation — sentences.csv, custom_catalog.yaml and the
topic cache (simple/stats/nl.py:41-190 semantics).

SV/Topic/StatVarPeerGroup triples are SCHEMA-scale (they describe
variables, not observations), so this mirrors the reference's
driver-side flow over an in-memory triple list; a Dataset input is
accepted and collected (documented — bounded by schema size, not data).
Sentence rule: searchDescription triples win (joined with ';' in triple
order), else the name; subjects with neither are skipped with a
warning. The topic cache emits one node per Topic/StatVarPeerGroup
with typeOf/name/relevantVariableList/memberList (the *List predicates
split on commas).

The catalog constants (index/model names, public model path) mirror
the reference's published custom-DC catalog configuration
(nl_constants.py, itself sourced from the public website repo).
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

SENTENCE_SEPARATOR = ";"
CUSTOM_EMBEDDINGS_INDEX = "user_all_minilm_mem"
CUSTOM_MODEL = "ft-final-v20230717230459-all-MiniLM-L6-v2"
CUSTOM_MODEL_PATH = (
    "gs://datcom-nl-models/ft_final_v20230717230459.all-MiniLM-L6-v2"
)

SENTENCES_FILE = "sentences.csv"
EMBEDDINGS_DIR = "embeddings"
EMBEDDINGS_FILE = "embeddings.csv"
CUSTOM_CATALOG_YAML = "custom_catalog.yaml"
TOPIC_CACHE_JSON_FILE = "custom_dc_topic_cache.json"


def _triples_rows(triples) -> list[dict]:
    if isinstance(triples, list):
        return triples
    if isinstance(triples, pd.DataFrame):
        return triples.to_dict("records")
    from import_ray.core.context import take_all_bounded

    # Dataset input: schema-scale by contract, now ENFORCED by budget
    return take_all_bounded(triples, "nl: sentence-candidate triples")


def generate_nl_sentences(triples, nl_dir: str) -> pd.DataFrame:
    """name/searchDescription triples → ``<nl_dir>/sentences.csv`` +
    ``<nl_dir>/embeddings/custom_catalog.yaml``. The caller pre-filters
    triples to sentence-bearing subject types (SV + Topic), mirroring
    ``nl.generate_nl_sentences``."""
    candidates: dict[str, dict] = {}
    for t in _triples_rows(triples):
        c = candidates.setdefault(
            t["subject_id"], {"name": "", "descriptions": []}
        )
        if t["predicate"] == "searchDescription":
            c["descriptions"].append(t.get("object_value") or "")
        elif t["predicate"] == "name":
            c["name"] = t.get("object_value") or ""

    rows = []
    for dcid, c in candidates.items():
        sentences = c["descriptions"] or ([c["name"]] if c["name"] else [])
        if not sentences:
            logger.warning("No NL sentences generated for DCID: %s", dcid)
            continue
        rows.append({"dcid": dcid, "sentence": SENTENCE_SEPARATOR.join(sentences)})
    df = pd.DataFrame(rows, columns=["dcid", "sentence"])

    os.makedirs(os.path.join(nl_dir, EMBEDDINGS_DIR), exist_ok=True)
    df.to_csv(os.path.join(nl_dir, SENTENCES_FILE), index=False)

    embeddings_path = os.path.join(nl_dir, EMBEDDINGS_DIR, EMBEDDINGS_FILE)
    catalog = {
        "version": "1",
        "indexes": {
            CUSTOM_EMBEDDINGS_INDEX: {
                "store_type": "MEMORY",
                "source_path": nl_dir,
                "embeddings_path": embeddings_path,
                "model": CUSTOM_MODEL,
            },
        },
        "models": {
            CUSTOM_MODEL: {
                "type": "LOCAL",
                "usage": "EMBEDDINGS",
                "gcs_folder": CUSTOM_MODEL_PATH,
                "score_threshold": 0.5,
            }
        },
    }
    with open(os.path.join(nl_dir, EMBEDDINGS_DIR, CUSTOM_CATALOG_YAML), "w") as f:
        f.write(_yaml_dump(catalog))
    return df


def generate_topic_cache(triples, nl_dir: str) -> dict:
    """Topic + StatVarPeerGroup triples →
    ``<nl_dir>/custom_dc_topic_cache.json`` (one node per subject)."""
    nodes: dict[str, dict] = {}
    for t in _triples_rows(triples):
        node = nodes.setdefault(
            t["subject_id"],
            {"types": [], "names": [], "relevant": [], "members": []},
        )
        pred = t["predicate"]
        if pred == "typeOf":
            node["types"].append(t.get("object_id") or "")
        elif pred == "name":
            node["names"].append(t.get("object_value") or "")
        elif pred == "relevantVariable":
            node["relevant"].append(t.get("object_id") or "")
        elif pred == "relevantVariableList":
            node["relevant"].extend(
                s.strip() for s in (t.get("object_value") or "").split(",")
            )
        elif pred == "member":
            node["members"].append(t.get("object_id") or "")
        elif pred == "memberList":
            node["members"].extend(
                s.strip() for s in (t.get("object_value") or "").split(",")
            )

    out_nodes = []
    for dcid, node in nodes.items():
        result: dict = {"dcid": [dcid]}
        if node["types"]:
            result["typeOf"] = node["types"]
        if node["names"]:
            result["name"] = node["names"]
        if node["relevant"]:
            result["relevantVariableList"] = node["relevant"]
        if node["members"]:
            result["memberList"] = node["members"]
        out_nodes.append(result)

    result = {"nodes": out_nodes}
    os.makedirs(nl_dir, exist_ok=True)
    with open(os.path.join(nl_dir, TOPIC_CACHE_JSON_FILE), "w") as f:
        f.write(json.dumps(result, indent=1))
    return result


def _yaml_dump(obj, indent: int = 0) -> str:
    """Minimal YAML emitter (sorted keys, safe_dump-compatible for this
    catalog shape) — no yaml lib dependency."""
    lines = []

    def _scalar(v) -> str:
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            return str(v)
        s = str(v)
        if s.isdigit() or s in ("true", "false", "null", ""):
            return f"'{s}'"
        return s

    def _walk(d: dict, depth: int):
        for k in sorted(d):
            v = d[k]
            pad = "  " * depth
            if isinstance(v, dict):
                lines.append(f"{pad}{k}:")
                _walk(v, depth + 1)
            else:
                lines.append(f"{pad}{k}: {_scalar(v)}")

    _walk(obj, indent)
    return "\n".join(lines) + "\n"


# --- offline embedding generation (stand-in for the NL server's model) -------

EMBED_DIM = 384  # the published custom-DC embedding width


class HashedNgramEmbedder:
    """Deterministic LOCAL sentence embedder: hashed character-3/4-gram
    bag projected onto ``dim`` signed buckets, L2-normalized — the
    fastText-hashing construction, built from public techniques only.

    The reference flow leaves ``embeddings.csv`` to the NL server's
    remote model (simple/stats/nl.py declares the path in the catalog;
    no vectors are computed in-repo). This stage POPULATES the file
    offline with the same artifact shape (``dcid,sentence,v0..v{d-1}``)
    so the end-to-end pipeline runs without network; a deployment with
    the real model swaps the embedder class, nothing else.

    Usable as an actor-pool map_batches kernel: the projection seeds
    are fixed in ``__init__`` (once per actor), per batch the gram
    hashing/bucketing is vectorized numpy.
    """

    def __init__(self, dim: int = EMBED_DIM, seed: int = 1315423911):
        self.dim = int(dim)
        self.seed = np.uint64(seed)

    def _grams(self, s: str) -> np.ndarray:
        b = np.frombuffer(s.lower().encode("utf-8", "ignore"), np.uint8)
        if len(b) < 3:
            b = np.pad(b, (0, 3 - len(b)), constant_values=32)
        out = []
        for n in (3, 4):
            if len(b) < n:
                continue
            w = b[: len(b) - n + 1].astype(np.uint64)
            for k in range(1, n):
                w = w * np.uint64(0x100000001B3) + b[k : len(b) - n + 1 + k]
            out.append(w)
        return np.concatenate(out) if out else np.zeros(0, np.uint64)

    def embed(self, sentences) -> np.ndarray:
        vecs = np.zeros((len(sentences), self.dim), np.float64)
        for i, s in enumerate(sentences):
            g = self._grams(str(s))
            if not len(g):
                continue
            h = (g ^ self.seed) * np.uint64(0x9E3779B97F4A7C15)
            bucket = (h % np.uint64(self.dim)).astype(np.int64)
            sign = np.where((h >> np.uint64(63)).astype(bool), -1.0, 1.0)
            np.add.at(vecs[i], bucket, sign)
            nrm = np.linalg.norm(vecs[i])
            if nrm > 0:
                vecs[i] /= nrm
        return vecs

    def __call__(self, batch):
        import pyarrow as pa

        sents = batch["sentence"].to_pylist()
        vecs = self.embed(sents).astype(np.float32)
        return pa.table(
            {
                "dcid": batch["dcid"],
                "sentence": batch["sentence"],
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        )


def generate_embeddings(
    sentences_df: pd.DataFrame, nl_dir: str, dim: int = EMBED_DIM
) -> str:
    """Populate ``<nl_dir>/embeddings/embeddings.csv`` from the
    sentences table (``dcid,sentence,v0..v{dim-1}`` rows) with the
    offline hashed-ngram embedder. Returns the written path."""
    emb = HashedNgramEmbedder(dim=dim)
    vecs = emb.embed(sentences_df["sentence"].tolist())
    out = pd.DataFrame(
        np.round(vecs, 6), columns=[f"v{i}" for i in range(dim)]
    )
    out.insert(0, "sentence", sentences_df["sentence"].to_numpy())
    out.insert(0, "dcid", sentences_df["dcid"].to_numpy())
    path = os.path.join(nl_dir, EMBEDDINGS_DIR, EMBEDDINGS_FILE)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    out.to_csv(path, index=False)
    return path
