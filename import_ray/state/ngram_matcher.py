"""N-gram fuzzy name matcher + name-resolution actor stage.

Reimplements the reference's NgramMatcher semantics
(simple/util/ngram_matcher.py:41-197): normalized keys (NFKD, lower,
alnum-only), word tokens + character 4-grams, IDF-weighted match score
with begin-of-string boost, min-match-fraction 0.8 threshold
(dc_client.py:41 NGRAM_MIN_MATCH_FRACTION).

Ray usage: the index is built ONCE PER ACTOR from a broadcast
(name → dcid) table — a stateful ``map_batches`` stage (callable class
with ``__init__`` index build), the engine's gazetteer-backed
name→dcid resolver (NameResolver stand-in, util/.../NameResolver.java:20-57).
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa

DEFAULT_CONFIG = {
    "ngram_size": 4,
    "ignore_non_alphanum": True,
    "min_match_fraction": 0.8,
}


class NgramMatcher:
    def __init__(self, config: dict | None = None):
        self._config = dict(DEFAULT_CONFIG)
        if config:
            self._config.update(config)
        self._ngram_size = self._config["ngram_size"]
        self._key_values: list[tuple[str, object]] = []
        self._ngram_dict: dict[str, set[tuple[int, int]]] = {}

    def add_keys_values(self, kvs: dict) -> None:
        for key, value in kvs.items():
            self.add_key_value(key, value)

    def add_key_value(self, key: str, value) -> None:
        self._key_values.append((key, value))
        self._add_key_index(key, len(self._key_values) - 1)

    def lookup(self, key: str, num_results: int | None = None) -> list[tuple]:
        normalized = self._normalize(key)
        ngrams = self._get_ngrams(normalized)
        matches: dict[int, dict] = {}
        for ngram in ngrams:
            hits = self._ngram_dict.get(ngram)
            if not hits:
                continue
            idf = 1.0 / len(hits)
            for key_index, pos in hits:
                m = matches.get(key_index)
                if m is None:
                    matches[key_index] = {"score": idf, "n": 1, "pos": pos}
                else:
                    m["score"] += idf
                    m["n"] += 1
                    m["pos"] = min(m["pos"], pos)
        min_matches = max(1, len(ngrams) * self._config["min_match_fraction"])
        cands = [(ki, m) for ki, m in matches.items() if m["n"] >= min_matches]
        key_len = len(normalized)
        cands.sort(
            key=lambda x: x[1]["score"] + (key_len - x[1]["pos"]) * 10000 + x[1]["n"] * 100,
            reverse=True,
        )
        out = []
        for ki, _m in cands:
            out.append(self._key_values[ki])
            if num_results and len(out) >= num_results:
                break
        return out

    def _get_ngrams(self, key: str) -> list[str]:
        normalized = self._normalize(key)
        ngrams = normalized.split(" ")
        for pos in range(max(len(normalized) - self._ngram_size, 0) + 1):
            g = normalized[pos : pos + self._ngram_size]
            if g not in ngrams:
                ngrams.append(g)
        return ngrams

    def _add_key_index(self, key: str, key_index: int) -> None:
        normalized = self._normalize(key)
        for g in self._get_ngrams(normalized):
            self._ngram_dict.setdefault(g, set()).add((key_index, normalized.find(g)))

    def _normalize(self, key: str) -> str:
        s = unicodedata.normalize("NFKD", key).lower()
        s = " ".join(w for w in s.split(" ") if w)
        if self._config["ignore_non_alphanum"]:
            s = "".join(c for c in s if c.isalnum() or c == " ")
        return s


class NameResolverActor:
    """map_batches actor: fuzzy-resolve a name column to dcids.

    The gazetteer (name → dcid) is passed via constructor kwargs and the
    ngram index builds once per actor (SURVEY §2.5 NgramMatcher row)."""

    def __init__(self, gazetteer: dict[str, str], name_col: str = "name"):
        self.matcher = NgramMatcher()
        self.matcher.add_keys_values(gazetteer)
        self.name_col = name_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = batch[self.name_col].to_pylist()
        dcids = []
        matched = []
        for n in names:
            hits = self.matcher.lookup(n or "", num_results=1)
            if hits:
                dcids.append(hits[0][1])
                matched.append(hits[0][0])
            else:
                dcids.append("")
                matched.append("")
        return batch.append_column(
            "resolved_dcid", pa.array(dcids, pa.string())
        ).append_column("matched_name", pa.array(matched, pa.string()))


def resolve_names(ds, gazetteer: dict[str, str], name_col: str = "name", concurrency: int = 2):
    return ds.map_batches(
        NameResolverActor,
        fn_constructor_kwargs={"gazetteer": gazetteer, "name_col": name_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
