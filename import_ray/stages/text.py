"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline operators (driver brief): token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All kernels are fully vectorized over the WHOLE batch: Arrow split /
flatten / dictionary-encode for tokenization (only unique tokens are
ever hashed or set-tested), numpy segmented reduces
(``np.bincount`` / ``np.minimum.reduceat``) for per-doc rollups — no
per-document Python loops anywhere. At 100 TB the tokenizer IS the
pipeline; these run at C speed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from import_ray.core.arrowutil import from_pandas_clean

from import_ray.stages.neardup import _shingle_hashes_flat, _split_flat


def _text_col(batch: pa.Table) -> pa.Array:
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    return text


def _token_counts(text: pa.Array):
    """(n_tokens, n_distinct_tokens) per row, split on single space —
    DuckDB ``string_split(text,' ')`` / ``list_distinct`` parity."""
    lists = pc.split_pattern(text, pattern=" ")
    n_tok = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(n_tok)
    if n == 0 or n_tok.sum() == 0:
        return n_tok, np.zeros(n, np.int64)
    flat = pc.list_flatten(lists)
    parents = (
        pc.list_parent_indices(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    codes = flat.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # distinct (parent, token) pairs via one flat unique over packed keys
    key = (parents << np.int64(32)) | codes
    uniq_parents = np.unique(key) >> np.int64(32)
    n_dis = np.bincount(uniq_parents, minlength=n).astype(np.int64)
    return n_tok, n_dis


def token_stats(batch: pa.Table) -> pa.Table:
    n_tok, n_dis = _token_counts(_text_col(batch))
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
    text = _text_col(batch)
    n_tok, n_dis = _token_counts(text)
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    total_tok_chars = n_chars - (n_tok - 1)
    mean_tok_len_micro = (total_tok_chars * 1_000_000) // n_tok
    rep_ratio_micro = (n_dis * 1_000_000) // n_tok
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
    (stopword tables built once per actor). No SQL oracle (rows-only).

    Vectorized: lowercase + strip non-letters with one Arrow regex
    replace, dictionary-encode the flat tokens, test ONLY the unique
    tokens against each language's stopword set (np.isin), then roll
    hits up per doc with np.bincount.
    """

    STOPWORDS = {
        "en": {"the", "a", "of", "and", "to", "in", "is"},
        "es": {"el", "la", "de", "y", "en", "que", "los"},
        "de": {"der", "die", "das", "und", "ist", "von", "mit"},
        "fr": {"le", "la", "de", "et", "les", "des", "un"},
    }

    def __init__(self):
        self.langs = list(self.STOPWORDS)
        self.sw_arrays = [
            np.array(sorted(self.STOPWORDS[lang]), dtype=object) for lang in self.langs
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        words = pc.replace_substring_regex(
            pc.utf8_lower(_text_col(batch)), pattern="[^a-z]+", replacement=" "
        )
        lists = pc.split_pattern(words, pattern=" ")
        flat = pc.list_flatten(lists)
        parents = (
            pc.list_parent_indices(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        d = flat.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.asarray(d.dictionary.to_pylist(), dtype=object)
        nonempty = uniq != ""
        n_words = np.bincount(parents, weights=nonempty[codes], minlength=n).astype(
            np.int64
        )
        hits = np.zeros((len(self.langs), n), np.int64)
        for li, sw in enumerate(self.sw_arrays):
            member = np.isin(uniq, sw)
            if member.any():
                hits[li] = np.bincount(
                    parents, weights=member[codes], minlength=n
                ).astype(np.int64)
        best = hits.max(axis=0)
        # argmax returns the FIRST max → ties go to the earlier language,
        # matching the strictly-greater scan order en,es,de,fr
        pred = np.asarray(self.langs, dtype=object)[hits.argmax(axis=0)]
        pred[best == 0] = "und"
        scores = best / np.maximum(1, n_words)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(pred, pa.string()),
                "stopword_hit_rate": pa.array(scores, pa.float64()),
            }
        )


def doc_fingerprint(batch: pa.Table) -> pa.Table:
    """Rolling-hash document fingerprint: min of word-8-gram rolling
    polynomial hashes (winnowing-style sketch); docs shorter than 8
    tokens hash their whole token sequence. Deterministic (fixed
    multiplier, fixed token hash); no SQL oracle.

    One flat vectorized pass: shared shingle machinery from
    ``stages.neardup`` + ``np.minimum.reduceat`` per doc.
    """
    counts, h = _split_flat(batch)
    n = len(counts)
    if n == 0:
        return pa.table(
            {"doc_id": batch["doc_id"], "fingerprint": pa.array([], pa.uint64())}
        )
    sh_counts, sh = _shingle_hashes_flat(counts, h, n=8)
    seg = np.zeros(n, np.int64)
    np.cumsum(sh_counts[:-1], out=seg[1:])
    fps = np.minimum.reduceat(sh, seg)
    return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(fps, pa.uint64())})


# --- heavy hitters: corpus-wide top-k tokens ---------------------------------


def _batch_token_counts(batch: pa.Table) -> pa.Table:
    """Per-batch (token, cnt) partials — the combiner. Same single-space
    split as token_stats (DuckDB string_split parity)."""
    import pandas as pd

    lists = pc.split_pattern(_text_col(batch), pattern=" ")
    flat = pc.list_flatten(lists)
    counts = pd.Series(flat.to_pandas()).value_counts()
    return pa.table(
        {
            "token": pa.array(counts.index.to_numpy(dtype=object), pa.string()),
            "cnt": pa.array(counts.to_numpy().astype(np.int64)),
        }
    )


def top_tokens(ds, k: int = 20):
    """Exact corpus-wide top-k tokens: batch count partials → keyed
    repartition on token (only (token, int64) pairs shuffle, bounded by
    vocabulary × #blocks, not corpus size) → block-local sum + local
    top-k → k × #blocks rows merge driver-side. Ties break on token
    text ascending for cross-engine determinism."""
    import pandas as pd

    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    n = data_nparts(ds)

    def block_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("token", sort=False)["cnt"].sum().reset_index()
        g = g.sort_values(
            ["cnt", "token"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return from_pandas_clean(g, preserve_index=False)

    partials = (
        ds.map_batches(_batch_token_counts, batch_format="pyarrow", batch_size=None)
        .repartition(n, keys=["token"])
        .map_batches(block_topk, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    return (
        partials.sort_values(
            ["cnt", "token"], ascending=[False, True], kind="mergesort"
        )
        .head(k)
        .reset_index(drop=True)
    )


TOP_TOKENS_SQL = """
SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY cnt DESC, token
LIMIT 20
"""


# --- Count-Min sketch heavy hitters (approximate scale path) -----------------

_CMS_DEPTH = 4
_CMS_WIDTH = 1 << 14  # 16384 columns → 512 KB per partial at int64
_CMS_SEEDS = ("cmsseed0aaaaaaaa", "cmsseed1bbbbbbbb", "cmsseed2cccccccc", "cmsseed3dddddddd")


def _cms_rows(tokens: np.ndarray) -> np.ndarray:
    """d hash rows per token (pd.util.hash_array with per-row keys)."""
    import pandas as pd

    return np.stack(
        [
            (pd.util.hash_array(tokens, hash_key=seed) % _CMS_WIDTH).astype(np.int64)
            for seed in _CMS_SEEDS
        ]
    )


def cms_top_tokens(ds, k: int = 20, candidates_per_block: int = 200):
    """Approximate top-k tokens: each batch emits (a) a fixed-size
    Count-Min matrix partial (d×w int64 — merge is elementwise SUM,
    independent of vocabulary size) and (b) its local top-m candidate
    tokens. The driver sums the matrices (d×w×#blocks bytes, data-size
    independent), unions the candidates, reads each candidate's
    upper-bound count from the merged sketch (min over d rows), and
    returns the top k. Overestimates only (CMS guarantee); exact twin:
    ``top_tokens``."""
    import pandas as pd

    def partials(batch: pa.Table) -> pa.Table:
        counts_tbl = _batch_token_counts(batch)
        toks = counts_tbl["token"].to_numpy(zero_copy_only=False)
        cnts = counts_tbl["cnt"].to_numpy(zero_copy_only=False)
        mat = np.zeros((_CMS_DEPTH, _CMS_WIDTH), dtype=np.int64)
        rows = _cms_rows(toks)
        for d in range(_CMS_DEPTH):
            np.add.at(mat[d], rows[d], cnts)
        order = np.lexsort((toks, -cnts))[:candidates_per_block]
        return pa.table(
            {
                "sketch": pa.array([mat.tobytes()], pa.large_binary()),
                "cand_tokens": pa.array([list(toks[order])], pa.list_(pa.string())),
            }
        )

    rows = ds.map_batches(partials, batch_format="pyarrow", batch_size=None).to_pandas()
    mat = np.zeros((_CMS_DEPTH, _CMS_WIDTH), dtype=np.int64)
    cands: set[str] = set()
    for _, r in rows.iterrows():
        mat += np.frombuffer(r["sketch"], dtype=np.int64).reshape(_CMS_DEPTH, _CMS_WIDTH)
        cands.update(r["cand_tokens"])

    cand_arr = np.array(sorted(cands), dtype=object)
    hrows = _cms_rows(cand_arr)
    est = np.min(
        np.stack([mat[d][hrows[d]] for d in range(_CMS_DEPTH)]), axis=0
    )
    df = pd.DataFrame({"token": cand_arr, "est_cnt": est.astype(np.int64)})
    return (
        df.sort_values(["est_cnt", "token"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


# --- tf-idf-shaped document-frequency pipeline -------------------------------


def _distinct_doc_tokens(batch: pa.Table) -> pa.Table:
    """Distinct (doc_id, token) pairs for a batch — the tokenizer's
    flat dictionary-encode + one packed np.unique, no per-doc loops."""
    text = _text_col(batch)
    lists = pc.split_pattern(text, pattern=" ")
    flat = pc.list_flatten(lists)
    if len(flat) == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "tok": pa.array([], pa.string())}
        )
    parents = (
        pc.list_parent_indices(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    d = flat.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    key = np.unique((parents << np.int64(32)) | codes)
    up, uc = key >> np.int64(32), key & np.int64(0xFFFFFFFF)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(ids[up]),
            "tok": pc.take(d.dictionary, pa.array(uc)),
        }
    )


def doc_rarity_stats(ds):
    """Per-doc document-frequency aggregates — the tf-idf join shape:
    distinct (doc, token) pairs → token df (grouped count) → hash join
    df back onto the pairs → per-doc integer rollups. Exact-integer
    outputs keep the DuckDB oracle hash-comparable (float idf sums are
    order-dependent; ``ln(N/df)`` is a trivial per-row map away).

    Shuffle shape at 100 TB: pairs are (int64, token) rows bounded by
    corpus token occurrences AFTER per-doc dedup; df is vocabulary-
    scale; the join + final groupby shuffle key-sized rows only."""
    from ray.data.aggregate import Count, Min, Sum

    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    n = data_nparts(ds)
    pairs = ds.map_batches(_distinct_doc_tokens, batch_format="pyarrow")
    df = pairs.groupby("tok", num_partitions=n).aggregate(
        Count(alias_name="df")
    )
    joined = pairs.join(df, join_type="inner", num_partitions=n, on=("tok",))
    out = joined.groupby("doc_id", num_partitions=n).aggregate(
        Count(alias_name="n_distinct_tokens"),
        Sum("df", alias_name="sum_df"),
        Min("df", alias_name="min_df"),
    )
    return out


DOC_RARITY_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), pairs AS (
  SELECT DISTINCT doc_id, tok FROM toks
), df AS (
  SELECT tok, COUNT(*) AS df FROM pairs GROUP BY tok
)
SELECT p.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
       CAST(SUM(d.df) AS BIGINT) AS sum_df,
       CAST(MIN(d.df) AS BIGINT) AS min_df
FROM pairs p JOIN df d USING (tok)
GROUP BY p.doc_id
"""


# --- OOV-rate scoring against a corpus top-K vocabulary ----------------------


def oov_stats(ds, vocab_k: int = 20):
    """(doc_id, n_tokens, n_oov) — tokens outside the corpus-wide top-K
    vocabulary. The unigram-LM scoring shape at 100 TB: the vocabulary
    is built with the heavy-hitter machinery (token-keyed partial
    counts; only (token, int64) rows shuffle), the tiny top-K table is
    broadcast into the scorer closure, and each batch counts membership
    over its UNIQUE tokens only (dictionary-encode then fancy-index).
    Ties in the vocabulary cut break on (count desc, token asc) —
    deterministic cross-engine."""
    vocab = set(top_tokens(ds, k=vocab_k)["token"])

    def score(batch: pa.Table) -> pa.Table:
        text = _text_col(batch)
        lists = pc.split_pattern(text, pattern=" ")
        n_tok = (
            pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        flat = pc.list_flatten(lists)
        n = len(n_tok)
        if n == 0 or len(flat) == 0:
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_tokens": pa.array(n_tok),
                    "n_oov": pa.array(np.zeros(n, np.int64)),
                }
            )
        d = flat.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq_oov = np.array(
            [tok not in vocab for tok in d.dictionary.to_pylist()], bool
        )
        parents = (
            pc.list_parent_indices(lists)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n_oov = np.bincount(parents, weights=uniq_oov[codes], minlength=n).astype(
            np.int64
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok),
                "n_oov": pa.array(n_oov),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


OOV_STATS_SQL_TEMPLATE = """
WITH vocab AS (
  SELECT token
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
  ORDER BY COUNT(*) DESC, token
  LIMIT {k}
), toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN token IN (SELECT token FROM vocab) THEN 0 ELSE 1 END)
            AS BIGINT) AS n_oov
FROM toks
GROUP BY doc_id
"""


def _doc_token_tf(batch: pa.Table) -> pa.Table:
    """(doc_id, tok, tf) term frequencies — flat dictionary-encode +
    one packed np.unique(return_counts), no per-doc loops."""
    text = _text_col(batch)
    lists = pc.split_pattern(text, pattern=" ")
    flat = pc.list_flatten(lists)
    if len(flat) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "tok": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
            }
        )
    parents = (
        pc.list_parent_indices(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    d = flat.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    key, tf = np.unique((parents << np.int64(32)) | codes, return_counts=True)
    up, uc = key >> np.int64(32), key & np.int64(0xFFFFFFFF)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(ids[up]),
            "tok": pc.take(d.dictionary, pa.array(uc)),
            "tf": pa.array(tf.astype(np.int64), pa.int64()),
        }
    )


def top_terms_per_doc(ds, k: int = 3, scale: int = 1_000_000_000):
    """Each document's k most CHARACTERISTIC terms: integer tf-idf
    analog score = tf·scale // df (exact integers keep the DuckDB
    oracle hash-comparable; swapping in round(tf·ln(N/df)) is a
    per-row map).

    Shape: per-block (doc,tok,tf) partials → token-keyed df count +
    df⋈tf hash join (vocabulary-scale keys) → doc-keyed exchange of
    block-local per-doc top-k partials → final top-k + rank. The raw
    corpus never reshuffles; post-partial rows are k×docs-per-block.
    """
    from ray.data.aggregate import Count

    from import_ray.core.context import data_nparts, ensure_hash_shuffle, join_safe

    ensure_hash_shuffle(ds)
    n = data_nparts(ds)
    tf = ds.map_batches(_doc_token_tf, batch_format="pyarrow")
    df = tf.groupby("tok", num_partitions=n).aggregate(Count(alias_name="df"))
    joined = join_safe(tf.join(df, join_type="inner", num_partitions=n, on=("tok",)))

    def score_and_partial_topk(batch: pa.Table) -> pa.Table:
        pdf = batch.to_pandas()
        pdf["score"] = (
            pdf["tf"].to_numpy().astype(np.int64) * np.int64(scale)
        ) // pdf["df"].to_numpy().astype(np.int64)
        pdf = pdf.sort_values(
            ["doc_id", "score", "tok"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        pdf = pdf.groupby("doc_id", sort=False).head(k)
        return from_pandas_clean(
            pdf[["doc_id", "tok", "score"]], preserve_index=False
        )

    def final_topk(batch: pa.Table) -> pa.Table:
        pdf = batch.to_pandas()
        pdf = pdf.sort_values(
            ["doc_id", "score", "tok"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        pdf = pdf.groupby("doc_id", sort=False).head(k)
        pdf["rnk"] = pdf.groupby("doc_id", sort=False).cumcount() + 1
        pdf["rnk"] = pdf["rnk"].astype("int64")
        pdf["score"] = pdf["score"].astype("int64")
        return from_pandas_clean(pdf, preserve_index=False)

    return (
        joined.map_batches(score_and_partial_topk, batch_format="pyarrow")
        .repartition(n, keys=["doc_id"])
        .map_batches(final_topk, batch_format="pyarrow", batch_size=None)
    )


TOP_TERMS_PER_DOC_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
), df AS (
  SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
), scored AS (
  SELECT tf.doc_id, tf.tok,
         CAST(tf.tf * 1000000000 AS BIGINT) // df.df AS score
  FROM tf JOIN df USING (tok)
)
SELECT doc_id, tok, score, rnk FROM (
  SELECT doc_id, tok, score,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY score DESC, tok
         ) AS rnk
  FROM scored
) t
WHERE rnk <= 3
"""


def _token_doc_pairs(batch: pa.Table):
    """Distinct (token code, doc_id) pairs for a batch, fully
    vectorized: Arrow split/flatten/dictionary-encode + one flat
    ``np.unique`` over packed (parent, code) keys. Returns
    (tokens: np.ndarray[object], doc_ids: np.ndarray[int64])."""
    text = _text_col(batch)
    lists = pc.split_pattern(text, pattern=" ")
    flat = pc.list_flatten(lists)
    if len(flat) == 0:
        return np.array([], dtype=object), np.array([], dtype=np.int64)
    parents = (
        pc.list_parent_indices(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    d = flat.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    key = (parents << np.int64(32)) | codes
    uniq = np.unique(key)
    u_parents = (uniq >> np.int64(32)).astype(np.int64)
    u_codes = (uniq & np.int64(0xFFFFFFFF)).astype(np.int64)
    vocab = d.dictionary.to_numpy(zero_copy_only=False).astype(object)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return vocab[u_codes], doc_ids[u_parents]


def inverted_index(docs_ds, max_postings: int = 20):
    """Distributed inverted index: per token its exact document
    frequency and the first ``max_postings`` doc ids (ascending, CSV
    string).

    Scale shape: per-batch DISTINCT (token, doc_id) pairs fold into ONE
    partial row per (token, block) — partial df count + a capped sorted
    posting prefix — so the token-keyed exchange carries at most
    #tokens × #blocks bounded rows (a stopword never ships its full
    posting list; df stays exact via the summed counts). The final
    merge re-sorts ≤ max_postings × #blocks ids per token block-locally.
    """
    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    ensure_hash_shuffle(docs_ds)
    n = data_nparts(docs_ds)
    cap = int(max_postings)

    def partial(batch: pa.Table) -> pa.Table:
        toks, docs = _token_doc_pairs(batch)
        if len(toks) == 0:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "df_part": pa.array([], pa.int64()),
                    "postings_part": pa.array([], pa.string()),
                }
            )
        order = np.lexsort((docs, toks))
        toks, docs = toks[order], docs[order]
        bounds = np.flatnonzero(
            np.concatenate([[True], toks[1:] != toks[:-1]])
        )
        ends = np.concatenate([bounds[1:], [len(toks)]])
        out_t, out_n, out_p = [], [], []
        for b, e in zip(bounds, ends):
            out_t.append(toks[b])
            out_n.append(int(e - b))
            out_p.append(",".join(str(int(x)) for x in docs[b : min(e, b + cap)]))
        return pa.table(
            {
                "token": pa.array(out_t, pa.string()),
                "df_part": pa.array(out_n, pa.int64()),
                "postings_part": pa.array(out_p, pa.string()),
            }
        )

    def merge(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rows = []
        for token, g in df.groupby("token", sort=True):
            ids: list[int] = []
            for p in g["postings_part"]:
                if p:
                    ids.extend(int(x) for x in p.split(","))
            ids = sorted(set(ids))[:cap]
            rows.append(
                (token, int(g["df_part"].sum()), ",".join(str(x) for x in ids))
            )
        out = pd.DataFrame(rows, columns=["token", "df", "postings"])
        out["df"] = out["df"].astype(np.int64)
        return from_pandas_clean(out, preserve_index=False)

    return (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .repartition(n, keys=["token"])
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )


INVERTED_INDEX_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), td AS (
  SELECT DISTINCT doc_id, token FROM tok
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
       array_to_string(list_slice(list_sort(list(doc_id)), 1, 20), ',') AS postings
FROM td GROUP BY token
"""


def token_pair_doc_counts(docs_ds, top_k: int = 50, max_tokens_per_doc: int = 64):
    """Top-k token pairs by document co-occurrence (exact integer
    counts, (count DESC, tok_a, tok_b) deterministic order).

    Scale shape: per-batch distinct-token pair emission (per-doc token
    sets capped at ``max_tokens_per_doc`` — the skew guard for
    pathological vocabulary-dense docs; the SQL oracle assumes the cap
    is not hit, which holds for this corpus and is asserted per batch) →
    in-batch partial pair counts → ONE pair-keyed exchange → block-local
    exact top-k partials → driver merge of ≤ top_k × #blocks rows."""
    from ray.data.aggregate import Sum

    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    ensure_hash_shuffle(docs_ds)
    n = data_nparts(docs_ds)
    cap = int(max_tokens_per_doc)

    def pair_partials(batch: pa.Table) -> pa.Table:
        toks, docs = _token_doc_pairs(batch)
        empty = pa.table(
            {
                "tok_a": pa.array([], pa.string()),
                "tok_b": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
            }
        )
        if len(toks) == 0:
            return empty
        order = np.lexsort((toks, docs))
        toks, docs = toks[order], docs[order]
        bounds = np.flatnonzero(np.concatenate([[True], docs[1:] != docs[:-1]]))
        ends = np.concatenate([bounds[1:], [len(docs)]])
        a_parts, b_parts = [], []
        for b, e in zip(bounds, ends):
            ts = toks[b : min(e, b + cap)]
            if e - b > cap:  # skew guard; oracle parity requires no hit
                raise ValueError(
                    f"doc exceeds max_tokens_per_doc={cap} distinct tokens"
                )
            if len(ts) < 2:
                continue
            ia, ib = np.triu_indices(len(ts), k=1)
            a_parts.append(ts[ia])
            b_parts.append(ts[ib])
        if not a_parts:
            return empty
        df = pd.DataFrame(
            {"tok_a": np.concatenate(a_parts), "tok_b": np.concatenate(b_parts)}
        )
        g = df.groupby(["tok_a", "tok_b"], sort=False).size().reset_index(name="n_docs")
        return from_pandas_clean(g, preserve_index=False)

    counts = (
        docs_ds.map_batches(pair_partials, batch_format="pyarrow")
        .groupby(["tok_a", "tok_b"], num_partitions=n)
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )

    k = int(top_k)

    def block_topk(batch: pa.Table) -> pa.Table:
        df = batch.select(["tok_a", "tok_b", "n_docs"]).to_pandas()
        df = df.sort_values(
            ["n_docs", "tok_a", "tok_b"], ascending=[False, True, True],
            kind="mergesort",
        ).head(k)
        return from_pandas_clean(df, preserve_index=False)

    partials = counts.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    out = (
        partials.sort_values(
            ["n_docs", "tok_a", "tok_b"], ascending=[False, True, True],
            kind="mergesort",
        )
        .head(k)
        .reset_index(drop=True)
    )
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out


TOKEN_PAIR_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents
)
SELECT a.token AS tok_a, b.token AS tok_b, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.token < b.token
GROUP BY 1, 2
ORDER BY n_docs DESC, tok_a, tok_b
LIMIT 50
"""


_GOPHER_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "for")


def gopher_quality_flags(batch: pa.Table) -> pa.Table:
    """Gopher-style composite quality rules (Rae et al. 2021, adapted
    to flat-token docs; all-integer signals so the SQL oracle matches
    exactly): token-count bounds, mean-token-length bounds, alphabetic
    token fraction, stopword presence, and the AND of all four.

    Pure map_batches — regexes run once per DICTIONARY value (the
    vocabulary), not per token; per-token work is one dictionary
    gather + bincount."""
    text = _text_col(batch)
    n_tok, _ = _token_counts(text)
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    mean_tok_len_micro = np.where(
        n_tok > 0, (n_chars - (n_tok - 1)) * 1_000_000 // np.maximum(n_tok, 1), 0
    )

    lists = pc.split_pattern(text, pattern=" ")
    flat = pc.list_flatten(lists)
    n = len(n_tok)
    if len(flat) == 0:
        alpha = np.zeros(n, np.int64)
        stops = np.zeros(n, np.int64)
    else:
        parents = (
            pc.list_parent_indices(lists)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        d = flat.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = d.dictionary
        is_alpha = pc.match_substring_regex(vocab, "^[a-z]+$").to_numpy(
            zero_copy_only=False
        )
        is_stop = pc.is_in(
            vocab, value_set=pa.array(_GOPHER_STOPWORDS, pa.string())
        ).to_numpy(zero_copy_only=False)
        alpha = np.bincount(
            parents, weights=is_alpha[codes].astype(np.float64), minlength=n
        ).astype(np.int64)
        stops = np.bincount(
            parents, weights=is_stop[codes].astype(np.float64), minlength=n
        ).astype(np.int64)

    ok_len = (n_tok >= 5) & (n_tok <= 100_000)
    ok_tok_len = (mean_tok_len_micro >= 2_000_000) & (mean_tok_len_micro <= 12_000_000)
    # alpha fraction ≥ 0.8 as an exact integer cross-multiply
    ok_alpha = alpha * 10 >= n_tok * 8
    ok_stop = stops >= 1
    keep = ok_len & ok_tok_len & ok_alpha & ok_stop
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok),
            "n_alpha_tokens": pa.array(alpha),
            "n_stopwords": pa.array(stops),
            "ok_len": pa.array(ok_len),
            "ok_tok_len": pa.array(ok_tok_len),
            "ok_alpha": pa.array(ok_alpha),
            "ok_stop": pa.array(ok_stop),
            "keep": pa.array(keep),
        }
    )


GOPHER_QUALITY_SQL = """
WITH sig AS (
  SELECT doc_id,
         len(string_split(text,' ')) AS n_tokens,
         len(list_filter(string_split(text,' '),
             x -> regexp_matches(x, '^[a-z]+$'))) AS n_alpha_tokens,
         len(list_filter(string_split(text,' '),
             x -> x IN ('the','a','and','of','to','in','is','for')))
           AS n_stopwords,
         (length(text) - (len(string_split(text,' ')) - 1)) * 1000000
           // len(string_split(text,' ')) AS mtl_micro
  FROM documents
)
SELECT doc_id, n_tokens, n_alpha_tokens, n_stopwords,
       (n_tokens BETWEEN 5 AND 100000) AS ok_len,
       (mtl_micro BETWEEN 2000000 AND 12000000) AS ok_tok_len,
       (n_alpha_tokens * 10 >= n_tokens * 8) AS ok_alpha,
       (n_stopwords >= 1) AS ok_stop,
       ((n_tokens BETWEEN 5 AND 100000)
        AND (mtl_micro BETWEEN 2000000 AND 12000000)
        AND (n_alpha_tokens * 10 >= n_tokens * 8)
        AND (n_stopwords >= 1)) AS keep
FROM sig
"""


# --- cross-source vocabulary similarity (domain-shift measurement) -------------


def source_token_cosine(docs_ds):
    """Pairwise cosine similarity between the per-``source`` unigram
    COUNT vectors — the standard corpus domain-shift / mixture-overlap
    measurement (which sources share vocabulary mass, which are
    distribution outliers) used to weight mixture sampling.

    Distributed shape: per-batch local (source, token) counts → ONE
    keyed exchange on token co-locates every source's counts for a
    token → per block a (tokens × sources) int64 pivot and ONE
    ``Mᵀ·M`` matmul yields the block's partial Gram matrix (dots AND
    squared norms together) → driver sums #sources² × #blocks tiny
    partials in arbitrary-precision Python ints. Token strings never
    shuffle twice and nothing data-scale reaches the driver.

    Exactness: Gram entries are exact integers; the final cosine is the
    SAME IEEE expression as the SQL oracle (two correctly-rounded
    sqrts, one multiply, one divide), floor-scaled ×1e9. Int64 bound:
    the per-block matmul is safe while every global per-(source, token)
    count stays < ~3·10⁹ (hot-token product < 2⁶³); the driver-side
    combine is unbounded. Returns pandas (src_a, src_b, dot,
    cos_x1e9) for unordered pairs src_a < src_b.
    """
    import math

    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    ensure_hash_shuffle(docs_ds)
    n = data_nparts(docs_ds)

    def gram_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return pa.table(
                {
                    "src_a": pa.array([], pa.string()),
                    "src_b": pa.array([], pa.string()),
                    "dot": pa.array([], pa.int64()),
                }
            )
        m = df.pivot_table(
            index="token", columns="source", values="cnt", aggfunc="sum", fill_value=0
        )
        sources = list(m.columns)
        g = m.to_numpy(dtype=np.int64)
        gram = g.T @ g  # (S, S) partial Gram — dots and squared norms
        ia, ib = np.triu_indices(len(sources))
        return pa.table(
            {
                "src_a": pa.array([sources[i] for i in ia], pa.string()),
                "src_b": pa.array([sources[j] for j in ib], pa.string()),
                "dot": pa.array(gram[ia, ib], pa.int64()),
            }
        )

    parts = (
        docs_ds.map_batches(
            lambda b: _local_source_token_rows(b, distinct=False),
            batch_format="pyarrow",
        )
        .repartition(n, keys=["token"])
        .map_batches(gram_block, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    # driver combine in Python ints (no overflow at any scale)
    gram: dict[tuple[str, str], int] = {}
    for sa, sb, d in zip(parts["src_a"], parts["src_b"], parts["dot"]):
        gram[(sa, sb)] = gram.get((sa, sb), 0) + int(d)
    sources = sorted({s for k in gram for s in k})
    rows = []
    for i, sa in enumerate(sources):
        for sb in sources[i + 1 :]:
            dot = gram.get((sa, sb), 0) + gram.get((sb, sa), 0)
            na, nb = gram.get((sa, sa), 0), gram.get((sb, sb), 0)
            cos = (
                float(dot) / (math.sqrt(float(na)) * math.sqrt(float(nb)))
                if na and nb
                else 0.0
            )
            rows.append(
                {
                    "src_a": sa,
                    "src_b": sb,
                    "dot": dot,
                    "cos_x1e9": math.floor(cos * 1e9),
                }
            )
    out = pd.DataFrame(rows, columns=["src_a", "src_b", "dot", "cos_x1e9"])
    for c in ("dot", "cos_x1e9"):
        out[c] = out[c].astype("int64")
    return out


SOURCE_TOKEN_COSINE_SQL = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
), cnt AS (
  SELECT source, token, CAST(COUNT(*) AS HUGEINT) AS c
  FROM tok GROUP BY source, token
), dots AS (
  SELECT a.source AS src_a, b.source AS src_b, SUM(a.c * b.c) AS dot
  FROM cnt a JOIN cnt b ON a.token = b.token AND a.source < b.source
  GROUP BY a.source, b.source
), sq AS (
  SELECT source, SUM(c * c) AS s FROM cnt GROUP BY source
)
SELECT d.src_a, d.src_b, CAST(d.dot AS BIGINT) AS dot,
       CAST(FLOOR(CAST(d.dot AS DOUBLE)
             / (SQRT(CAST(sa.s AS DOUBLE)) * SQRT(CAST(sb.s AS DOUBLE)))
             * 1e9) AS BIGINT) AS cos_x1e9
FROM dots d
JOIN sq sa ON sa.source = d.src_a
JOIN sq sb ON sb.source = d.src_b
"""


def _local_source_token_rows(batch: pa.Table, distinct: bool) -> pa.Table:
    """Per-batch (source, token[, cnt]) partials shared by the
    cross-source vocabulary family — Arrow split/flatten, pandas
    groupby over the batch only."""
    text = _text_col(batch)
    lists = pc.split_pattern(text, pattern=" ")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    src = batch["source"].take(parents)
    df = pd.DataFrame(
        {
            "source": src.to_pandas().to_numpy(dtype=object),
            "token": flat.to_pandas().to_numpy(dtype=object),
        }
    )
    if distinct:
        g = df.drop_duplicates()
        return from_pandas_clean(g, preserve_index=False)
    g = df.groupby(["source", "token"], sort=False).size().reset_index(name="cnt")
    g["cnt"] = g["cnt"].astype("int64")
    return from_pandas_clean(g, preserve_index=False)


def source_vocab_overlap(docs_ds):
    """Pairwise vocabulary-SET overlap between sources: |A∩B|, |A∪B|
    and floor-scaled Jaccard — the set-level companion to
    :func:`source_token_cosine` (count-weighted). Measures which corpus
    sources share word types regardless of frequency mass.

    Distributed shape identical to the cosine: per-batch DISTINCT
    (source, token) rows → ONE token-keyed exchange (all rows for a
    token land in one block, so a block-local distinct IS the global
    presence set) → per block a 0/1 (tokens × sources) matrix and one
    ``MᵀM`` matmul gives partial co-occurrence counts AND per-source
    vocabulary sizes on the diagonal → driver sums #sources²-sized
    partials in Python ints. Jaccard = exact-int ∩ / exact-int ∪ in a
    single IEEE divide, identical to the SQL oracle's expression.
    Returns pandas (src_a, src_b, n_common, n_union, jaccard_x1e9)
    for unordered pairs src_a < src_b with n_common > 0."""
    import math

    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    ensure_hash_shuffle(docs_ds)
    n = data_nparts(docs_ds)

    def presence_gram(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()  # block-local == global
        if not len(df):
            return pa.table(
                {
                    "src_a": pa.array([], pa.string()),
                    "src_b": pa.array([], pa.string()),
                    "common": pa.array([], pa.int64()),
                }
            )
        df = df.assign(one=np.int64(1))
        m = df.pivot_table(
            index="token", columns="source", values="one", aggfunc="max", fill_value=0
        )
        sources = list(m.columns)
        g = m.to_numpy(dtype=np.int64)
        gram = g.T @ g
        ia, ib = np.triu_indices(len(sources))
        return pa.table(
            {
                "src_a": pa.array([sources[i] for i in ia], pa.string()),
                "src_b": pa.array([sources[j] for j in ib], pa.string()),
                "common": pa.array(gram[ia, ib], pa.int64()),
            }
        )

    parts = (
        docs_ds.map_batches(
            lambda b: _local_source_token_rows(b, distinct=True),
            batch_format="pyarrow",
        )
        .repartition(n, keys=["token"])
        .map_batches(presence_gram, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    gram: dict[tuple[str, str], int] = {}
    for sa, sb, c in zip(parts["src_a"], parts["src_b"], parts["common"]):
        gram[(sa, sb)] = gram.get((sa, sb), 0) + int(c)
    sources = sorted({s for k in gram for s in k})
    rows = []
    for i, sa in enumerate(sources):
        for sb in sources[i + 1 :]:
            common = gram.get((sa, sb), 0) + gram.get((sb, sa), 0)
            if not common:
                continue  # mirrors the oracle's inner join on shared tokens
            union = gram.get((sa, sa), 0) + gram.get((sb, sb), 0) - common
            jac = math.floor(float(common) / float(union) * 1e9)
            rows.append(
                {
                    "src_a": sa,
                    "src_b": sb,
                    "n_common": common,
                    "n_union": union,
                    "jaccard_x1e9": jac,
                }
            )
    out = pd.DataFrame(
        rows, columns=["src_a", "src_b", "n_common", "n_union", "jaccard_x1e9"]
    )
    for c in ("n_common", "n_union", "jaccard_x1e9"):
        out[c] = out[c].astype("int64")
    return out


SOURCE_VOCAB_OVERLAP_SQL = """
WITH tok AS (
  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS token FROM documents
), common AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM tok a JOIN tok b ON a.token = b.token AND a.source < b.source
  GROUP BY a.source, b.source
), sz AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY source
)
SELECT c.src_a, c.src_b, c.n_common,
       sa.n + sb.n - c.n_common AS n_union,
       CAST(FLOOR(CAST(c.n_common AS DOUBLE)
             / CAST(sa.n + sb.n - c.n_common AS DOUBLE) * 1e9) AS BIGINT)
         AS jaccard_x1e9
FROM common c
JOIN sz sa ON sa.source = c.src_a
JOIN sz sb ON sb.source = c.src_b
"""


def vocab_stats_by_source(docs_ds):
    """Per-source vocabulary profile: total token count, distinct
    types, hapax legomena (global count == 1 — the classic OOV-rate /
    crawl-noise signal) and the hottest token's count. All exact
    integers, so the oracle comparison is bit-trivial.

    Distributed shape: per-batch (source, token, cnt) partials → ONE
    token-keyed exchange → per block the block-local groupby IS the
    global (source, token) count (token co-location), so each block
    emits one tiny per-source partial row (Σcnt, #types, #hapax,
    max cnt) → driver folds #sources × #blocks rows. Token strings
    cross the wire once; the driver never sees a token."""
    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    ensure_hash_shuffle(docs_ds)
    n = data_nparts(docs_ds)

    def per_source_partials(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_tokens": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "n_hapax": pa.array([], pa.int64()),
                    "max_cnt": pa.array([], pa.int64()),
                }
            )
        cnt = (
            df.groupby(["source", "token"], sort=False)["cnt"].sum().reset_index()
        )  # block-local == global per (source, token)
        agg = cnt.groupby("source", sort=False)["cnt"].agg(
            n_tokens="sum",
            n_distinct="size",
            n_hapax=lambda c: int((c == 1).sum()),
            max_cnt="max",
        )
        agg = agg.reset_index()
        for c in ("n_tokens", "n_distinct", "n_hapax", "max_cnt"):
            agg[c] = agg[c].astype("int64")
        return from_pandas_clean(agg, preserve_index=False)

    parts = (
        docs_ds.map_batches(
            lambda b: _local_source_token_rows(b, distinct=False),
            batch_format="pyarrow",
        )
        .repartition(n, keys=["token"])
        .map_batches(per_source_partials, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    out = (
        parts.groupby("source", sort=True)
        .agg(
            n_tokens=("n_tokens", "sum"),
            n_distinct=("n_distinct", "sum"),
            n_hapax=("n_hapax", "sum"),
            max_cnt=("max_cnt", "max"),
        )
        .reset_index()
    )
    for c in ("n_tokens", "n_distinct", "n_hapax", "max_cnt"):
        out[c] = out[c].astype("int64")
    return out


VOCAB_STATS_SQL = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
), cnt AS (
  SELECT source, token, COUNT(*) AS c FROM tok GROUP BY source, token
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(MAX(c) AS BIGINT) AS max_cnt
FROM cnt GROUP BY source ORDER BY source
"""


def mixture_weights_by_source(docs_ds):
    """Per-source mixture-sampling weights — the corpus-mixing stage of
    a training-data pipeline (UnifiedQA / multilingual-style α = 0.5
    temperature smoothing of the raw token-mass shares, which upweights
    small sources without letting one giant crawl dominate).

    Pure map + tiny driver fold: each batch emits per-source
    (n_docs, n_tokens) partials computed from Arrow list lengths alone
    — tokens are never materialized, NO shuffle at any scale. Shares
    are exact-int ratios floor-scaled through the identical IEEE
    expression the oracle uses (one divide, one sqrt)."""
    import math

    def partials(batch: pa.Table) -> pa.Table:
        text = _text_col(batch)
        n_tok = pc.list_value_length(pc.split_pattern(text, pattern=" "))
        df = pd.DataFrame(
            {
                "source": batch["source"].to_pandas().to_numpy(dtype=object),
                "n_docs": np.int64(1),
                "n_tokens": n_tok.to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        agg = df.groupby("source", sort=False).sum().reset_index()
        return from_pandas_clean(agg, preserve_index=False)

    parts = docs_ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    sums: dict[str, list[int]] = {}
    for _, r in parts.iterrows():
        s = sums.setdefault(r["source"], [0, 0])
        s[0] += int(r["n_docs"])
        s[1] += int(r["n_tokens"])
    total = sum(v[1] for v in sums.values())
    rows = []
    for src in sorted(sums):
        n_docs, n_tokens = sums[src]
        share = float(n_tokens) / float(total) if total else 0.0
        rows.append(
            {
                "source": src,
                "n_docs": n_docs,
                "n_tokens": n_tokens,
                "share_x1e9": int(math.floor(share * 1e9)),
                "w_sqrt_x1e9": int(math.floor(math.sqrt(share) * 1e9)),
            }
        )
    out = pd.DataFrame(
        rows, columns=["source", "n_docs", "n_tokens", "share_x1e9", "w_sqrt_x1e9"]
    )
    for c in ("n_docs", "n_tokens", "share_x1e9", "w_sqrt_x1e9"):
        out[c] = out[c].astype("int64")
    return out


MIXTURE_WEIGHTS_SQL = """
WITH s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM s)
SELECT source, n_docs, n_tokens,
       CAST(FLOOR(CAST(n_tokens AS DOUBLE) / CAST(t AS DOUBLE) * 1e9) AS BIGINT)
         AS share_x1e9,
       CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE) / CAST(t AS DOUBLE)) * 1e9)
         AS BIGINT) AS w_sqrt_x1e9
FROM s, tot ORDER BY source
"""


REGEX_TOKEN_PATTERNS = {
    "n_alpha_runs": r"[A-Za-z]+",
    "n_digit_runs": r"[0-9]+",
    "n_other": r"[^A-Za-z0-9\s]",
}


def regex_token_counts(batch: pa.Table) -> pa.Table:
    """BPE-style pre-tokenizer counts per document: alphabetic runs,
    digit runs, and non-space symbol chars — the class split GPT-2-ish
    pre-tokenizers apply before byte-pair merges. Fully vectorized via
    ``pc.count_substring_regex`` (RE2 — the SAME engine DuckDB's
    ``regexp_extract_all`` uses, so the oracle parity is exact by
    construction); no Python row loop."""
    text = _text_col(batch)
    cols = {"doc_id": batch["doc_id"]}
    total = None
    for name, pat in REGEX_TOKEN_PATTERNS.items():
        c = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
        cols[name] = c
        total = c if total is None else pc.add(total, c)
    cols["n_retokens"] = total
    return pa.table(cols)


REGEX_TOKEN_COUNTS_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_alpha_runs,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_runs,
       CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_other,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+'))
            + len(regexp_extract_all(text, '[0-9]+'))
            + len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_retokens
FROM documents
"""


def bigram_next_topk(docs_ds, k: int = 3, min_count: int = 5):
    """Next-token table: for every prefix token w1, the top-``k`` next
    tokens w2 by exact ordered-bigram count (count DESC, w2 ASC
    deterministic rank), prefixes below ``min_count`` support dropped —
    the count table an n-gram LM / autocomplete index serves from
    (the hashed-key variant in stages/lm_quality.py scores documents;
    this one materializes the human-readable table).

    Scale shape: per-batch vectorized adjacent-pair extraction (Arrow
    split/flatten, dictionary-encode, one np.unique over packed code
    pairs — no Python loops) emits gram-table-sized partials, NOT
    corpus-sized → ONE (w1, w2)-keyed exchange sums exact counts →
    min-count filter → ONE w1-keyed exchange ranks per prefix
    block-locally. The final table is vocabulary-scale.
    """
    from ray.data.aggregate import Sum

    from import_ray.core.context import data_nparts, ensure_hash_shuffle, join_safe

    ensure_hash_shuffle(docs_ds)
    n = data_nparts(docs_ds)
    kk, mc = int(k), int(min_count)

    def pair_partials(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        text = _text_col(batch)
        lists = pc.split_pattern(text, pattern=" ")
        flat = pc.list_flatten(lists)
        if len(flat) < 2:
            return empty
        parents = (
            pc.list_parent_indices(lists)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        d = flat.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        same_doc = parents[1:] == parents[:-1]
        a = codes[:-1][same_doc]
        b = codes[1:][same_doc]
        if len(a) == 0:
            return empty
        key = (a << np.int64(32)) | b
        uniq, cnt = np.unique(key, return_counts=True)
        vocab = d.dictionary.to_numpy(zero_copy_only=False).astype(object)
        w1 = vocab[(uniq >> np.int64(32)).astype(np.int64)]
        w2 = vocab[(uniq & np.int64(0xFFFFFFFF)).astype(np.int64)]
        return pa.table(
            {
                "w1": pa.array(w1, pa.string()),
                "w2": pa.array(w2, pa.string()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    counts = join_safe(
        docs_ds.map_batches(pair_partials, batch_format="pyarrow")
        .groupby(["w1", "w2"], num_partitions=n)
        .aggregate(Sum("n", alias_name="n"))
    ).filter(expr=f"n >= {mc}")

    def block_rank(batch: pa.Table) -> pa.Table:
        df = batch.select(["w1", "w2", "n"]).to_pandas()
        df = df.sort_values(
            ["w1", "n", "w2"], ascending=[True, False, True], kind="mergesort"
        )
        df["rnk"] = df.groupby("w1", sort=False).cumcount() + 1
        df = df[df["rnk"] <= kk]
        df["rnk"] = df["rnk"].astype("int64")
        return from_pandas_clean(df, preserve_index=False)

    ranked = counts.repartition(n, keys=["w1"]).map_batches(
        block_rank, batch_format="pyarrow", batch_size=None
    )
    return ranked


BIGRAM_NEXT_TOPK_SQL = """
WITH big AS (
  SELECT unnest(list_zip(l[1:length(l)-1], l[2:length(l)])) AS z
  FROM (SELECT string_split(text, ' ') AS l FROM documents)
),
cnt AS (SELECT z[1] AS w1, z[2] AS w2, COUNT(*) AS n FROM big GROUP BY 1, 2),
rk AS (
  SELECT w1, w2, CAST(n AS BIGINT) AS n,
         ROW_NUMBER() OVER (PARTITION BY w1 ORDER BY n DESC, w2) AS rnk
  FROM cnt WHERE n >= 5
)
SELECT w1, w2, n, CAST(rnk AS BIGINT) AS rnk FROM rk WHERE rnk <= 3
"""
