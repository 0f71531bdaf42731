"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline operators (driver brief): token counting,
quality scoring, language-ID heuristic, document fingerprinting. All
vectorized or compiled-regex per batch; stateful pieces (stopword
tables) live in ``__init__`` of the callable class (actor pool).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from import_ray.functions.farmhash import fingerprint64


def token_stats(batch: pa.Table) -> pa.Table:
    """n_tokens = split on single space (DuckDB ``string_split(text,' ')``
    parity); n_distinct_tokens likewise."""
    texts = batch["text"].to_pylist()
    n_tok = np.empty(len(texts), np.int64)
    n_dis = np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        n_tok[i] = len(toks)
        n_dis[i] = len(set(toks))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok),
            "n_distinct_tokens": pa.array(n_dis),
        }
    )


TOKEN_STATS_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens
FROM documents
"""


def quality_score(batch: pa.Table) -> pa.Table:
    """Deterministic quality signals: char count, mean token length
    (chars minus spaces over tokens, in 1e-6 fixed point for
    cross-engine hash parity), repetition ratio."""
    texts = batch["text"].to_pylist()
    n = len(texts)
    n_chars = np.empty(n, np.int64)
    mean_tok_len_micro = np.empty(n, np.int64)
    rep_ratio_micro = np.empty(n, np.int64)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        nt = len(toks)
        nc = len(t)
        n_chars[i] = nc
        total_tok_chars = nc - (nt - 1)
        mean_tok_len_micro[i] = int(round(total_tok_chars * 1e6)) // nt
        rep_ratio_micro[i] = int(round(len(set(toks)) * 1e6)) // nt
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars),
            "mean_tok_len_micro": pa.array(mean_tok_len_micro),
            "distinct_ratio_micro": pa.array(rep_ratio_micro),
        }
    )


QUALITY_SQL = """
SELECT doc_id,
       length(text) AS n_chars,
       CAST(ROUND((length(text) - (len(string_split(text,' ')) - 1)) * 1000000)
            AS BIGINT) // len(string_split(text,' ')) AS mean_tok_len_micro,
       CAST(ROUND(len(list_distinct(string_split(text,' '))) * 1000000)
            AS BIGINT) // len(string_split(text,' ')) AS distinct_ratio_micro
FROM documents
"""


class LangId:
    """Heuristic language ID from stopword hit-rates — stateful stage
    (stopword sets built once per actor). No SQL oracle (rows-only)."""

    STOPWORDS = {
        "en": {"the", "a", "of", "and", "to", "in", "is"},
        "es": {"el", "la", "de", "y", "en", "que", "los"},
        "de": {"der", "die", "das", "und", "ist", "von", "mit"},
        "fr": {"le", "la", "de", "et", "les", "des", "un"},
    }

    def __init__(self):
        self.word_re = re.compile(r"[A-Za-z]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        langs = []
        scores = []
        for t in texts:
            words = [w.lower() for w in self.word_re.findall(t)]
            best_lang, best = "und", 0
            for lang, sw in self.STOPWORDS.items():
                hits = sum(1 for w in words if w in sw)
                if hits > best:
                    best, best_lang = hits, lang
            langs.append(best_lang)
            scores.append(best / max(1, len(words)))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(langs, pa.string()),
                "stopword_hit_rate": pa.array(scores, pa.float64()),
            }
        )


def doc_fingerprint(batch: pa.Table) -> pa.Table:
    """Rolling-hash document fingerprint: min of 8-gram rolling hashes
    (winnowing-style sketch). Deterministic; no SQL oracle."""
    texts = batch["text"].to_pylist()
    fps = np.empty(len(texts), np.uint64)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        if len(toks) < 8:
            fps[i] = fingerprint64(t)
        else:
            m = min(
                fingerprint64(" ".join(toks[j : j + 8])) for j in range(len(toks) - 7)
            )
            fps[i] = m
    return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(fps, pa.uint64())})
