"""Distributed BPE (byte-pair encoding) vocabulary training.

The training-data-pipeline op the tokenizer step needs: learn the
top-K merge rules over a corpus. Public algorithm per Sennrich et al.
2016 ("Neural Machine Translation of Rare Words with Subword Units"):
train on the WORD-FREQUENCY table, apply merges greedily
left-to-right within each word.

Ray-Data shape (scale-honest):

1. The corpus collapses to a DISTINCT-WORD frequency table with one
   keyed exchange (per-block partial counts first — shuffle volume is
   per-block-distinct words, vocabulary-scale, never corpus-scale).
   The raw corpus is read exactly once.
2. Each merge round touches only that word table:
   per-block adjacent-symbol-pair partials (vectorized over the
   flattened list column, weighted by word frequency)
   → one keyed (left,right) grouped sum
   → block-local top-1 partials + tiny driver argmax
     (deterministic tie-break: count DESC, left ASC, right ASC)
   → the winning pair rides into the rewrite kernel as a closure
     (two small strings — no broadcast state needed)
   → segmentations rewritten in place; only rows containing the pair
     are touched (vectorized candidate mask, then a per-affected-word
     loop — bounded by words-containing-the-pair, each a short list).

Round cost: one pass over the vocabulary table + one small exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from import_ray.core.arrowutil import from_pandas_clean


def _word_count_partials(batch: pa.Table) -> pa.Table:
    lists = pc.split_pattern(batch["text"], pattern=" ")
    flat = pc.list_flatten(lists)
    flat = flat.filter(pc.not_equal(flat, ""))
    enc = pc.dictionary_encode(flat)
    codes = np.asarray(enc.combine_chunks().indices if isinstance(enc, pa.ChunkedArray) else enc.indices)
    dictionary = (
        enc.combine_chunks().dictionary if isinstance(enc, pa.ChunkedArray) else enc.dictionary
    )
    cnt = np.bincount(codes, minlength=len(dictionary)).astype(np.int64)
    return pa.table({"word": dictionary, "cnt": pa.array(cnt, pa.int64())})


def word_counts(docs, nparts: int | None = None):
    """documents(text) -> Dataset(word, cnt): exact corpus word
    frequencies; per-block dictionary-encoded partials, one exchange."""
    from ray.data.aggregate import Sum

    from import_ray.core.context import ensure_hash_shuffle, join_safe, npartitions

    ensure_hash_shuffle(docs)
    n = nparts or npartitions()
    return join_safe(
        docs.map_batches(_word_count_partials, batch_format="pyarrow")
        .groupby("word", num_partitions=n)
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def _init_syms(batch: pa.Table) -> pa.Table:
    words = batch["word"].to_pylist()
    syms = pa.array([list(w) for w in words], pa.large_list(pa.string()))
    return pa.table({"word": batch["word"], "cnt": batch["cnt"], "syms": syms})


def _flat_syms(batch: pa.Table):
    """(values, offsets, cnt) of the syms list column, combined."""
    col = batch["syms"]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    values = np.asarray(arr.values.to_pandas(), dtype=object)
    offsets = np.asarray(arr.offsets)
    cnt = batch["cnt"].to_numpy(zero_copy_only=False)
    return values, offsets, cnt


def _pair_partials(batch: pa.Table) -> pa.Table:
    values, offsets, cnt = _flat_syms(batch)
    total = len(values)
    if total == 0:
        return pa.table(
            {
                "left": pa.array([], pa.string()),
                "right": pa.array([], pa.string()),
                "w": pa.array([], pa.int64()),
            }
        )
    lengths = np.diff(offsets)
    # every flat index except each list's LAST element starts a pair
    is_last = np.zeros(total + 1, np.bool_)
    ends = offsets[1:] - 1
    is_last[ends[lengths > 0]] = True
    idx = np.flatnonzero(~is_last[:total])
    # drop indices whose +1 crosses into the next list (len-1 lists
    # already excluded by is_last on their single element)
    w_all = np.repeat(cnt, lengths)
    lefts = values[idx]
    rights = values[idx + 1]
    df = pd.DataFrame({"left": lefts, "right": rights, "w": w_all[idx]})
    g = df.groupby(["left", "right"], sort=False)["w"].sum().reset_index()
    g["w"] = g["w"].astype("int64")
    return from_pandas_clean(g, preserve_index=False)


def _best_pair(words_ds, n: int):
    """Global argmax pair: keyed grouped sum, block top-1 partials,
    tiny driver merge. Returns (left, right, count) or None."""
    from ray.data.aggregate import Sum

    from import_ray.core.context import join_safe

    summed = join_safe(
        words_ds.map_batches(_pair_partials, batch_format="pyarrow")
        .groupby(["left", "right"], num_partitions=n)
        .aggregate(Sum("w", alias_name="w"))
    )

    def block_top1(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if df.empty:
            return from_pandas_clean(df, preserve_index=False)
        df = df.sort_values(
            ["w", "left", "right"], ascending=[False, True, True], kind="mergesort"
        ).head(1)
        return from_pandas_clean(df, preserve_index=False)

    tops = summed.map_batches(
        block_top1, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if tops.empty:
        return None
    tops = tops.sort_values(
        ["w", "left", "right"], ascending=[False, True, True], kind="mergesort"
    )
    r = tops.iloc[0]
    return str(r["left"]), str(r["right"]), int(r["w"])


def _merge_word(syms: list, left: str, right: str) -> list:
    out = []
    i, m = 0, len(syms)
    while i < m:
        if i + 1 < m and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _apply_merge(batch: pa.Table, left: str, right: str) -> pa.Table:
    values, offsets, _ = _flat_syms(batch)
    if len(values) == 0:
        return batch
    hit = np.flatnonzero(values[:-1] == left)
    hit = hit[values[hit + 1] == right]
    # pairs must sit INSIDE one list: the left index's list must also
    # contain index+1
    if len(hit):
        row_of = np.searchsorted(offsets, hit, side="right") - 1
        inside = hit + 1 < offsets[row_of + 1]
        rows = np.unique(row_of[inside])
    else:
        rows = np.empty(0, np.int64)
    if len(rows) == 0:
        return batch
    syms_list = batch["syms"].to_pylist()
    for r in rows:
        syms_list[r] = _merge_word(syms_list[r], left, right)
    return pa.table(
        {
            "word": batch["word"],
            "cnt": batch["cnt"],
            "syms": pa.array(syms_list, pa.large_list(pa.string())),
        }
    )


def bpe_train(docs, num_merges: int = 20, min_pair_count: int = 2) -> pd.DataFrame:
    """Learn `num_merges` BPE merge rules from documents(text).

    Returns a pandas DataFrame (rank, left, right, pair_count) —
    merge-rule-scale (= num_merges rows). Stops early when the best
    remaining pair occurs fewer than `min_pair_count` times.
    """
    from import_ray.core.context import npartitions

    # the word table is VOCABULARY-scale — a handful of shuffle
    # partitions keeps per-round aggregator-pool spin-up off the
    # critical path (20 rounds pay it 20×); corpus-scale work only
    # happens once, inside word_counts' first map pass
    n = min(npartitions(), 8)
    words = (
        word_counts(docs, nparts=n)
        .map_batches(_init_syms, batch_format="pyarrow")
        .materialize()
    )
    merges = []
    for rank in range(num_merges):
        best = _best_pair(words, n)
        if best is None or best[2] < min_pair_count:
            break
        left, right, w = best
        merges.append((rank + 1, left, right, w))
        words = words.map_batches(
            lambda b, L=left, R=right: _apply_merge(b, L, R),
            batch_format="pyarrow",
        ).materialize()
    return pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"])


def bpe_train_reference(texts: list[str], num_merges: int = 20, min_pair_count: int = 2):
    """Driver-side reference BPE (test parity only): same semantics,
    plain dicts."""
    from collections import Counter

    wc = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] += 1
    segs = {w: list(w) for w in wc}
    merges = []
    for rank in range(num_merges):
        pc_ = Counter()
        for w, syms in segs.items():
            for a, b in zip(syms, syms[1:]):
                pc_[(a, b)] += wc[w]
        if not pc_:
            break
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), c = best
        if c < min_pair_count:
            break
        merges.append((rank + 1, l, r, c))
        for w in segs:
            segs[w] = _merge_word(segs[w], l, r)
    return pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"])


class BpeEncoder:
    """Actor-pool BPE encoding stage: apply learned merge rules to the
    corpus and count subword tokens per document.

    State in __init__ (once per actor): the rank table plus a
    word → token-count cache — each actor pays each distinct word's
    merge loop once, every batch after that is a dictionary-code
    lookup. Per batch everything else is vectorized: Arrow split,
    one dictionary_encode, gather + segment-sum via cumsum.
    """

    def __init__(self, merges):
        self._ranks = {(l, r): i for i, (l, r) in enumerate(merges)}
        self._cache: dict[str, int] = {"": 0}

    def _encode_len(self, w: str) -> int:
        hit = self._cache.get(w)
        if hit is not None:
            return hit
        syms = list(w)
        while len(syms) > 1:
            best_rank, best_pair = None, None
            for pair in zip(syms, syms[1:]):
                r = self._ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, pair
            if best_pair is None:
                break
            syms = _merge_word(syms, best_pair[0], best_pair[1])
        self._cache[w] = len(syms)
        return len(syms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern(batch["text"], pattern=" ")
        arr = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
        offsets = np.asarray(arr.offsets)
        enc = arr.values.dictionary_encode()
        codes = np.asarray(enc.indices)
        words = enc.dictionary.to_pylist()
        word_tok = np.fromiter(
            (self._encode_len(w) for w in words), np.int64, count=len(words)
        )
        per_tok = word_tok[codes] if len(codes) else np.empty(0, np.int64)
        is_word = (
            np.asarray(pc.utf8_length(enc.dictionary)) > 0
        )[codes].astype(np.int64) if len(codes) else np.empty(0, np.int64)
        cs_tok = np.concatenate([[0], np.cumsum(per_tok)])
        cs_w = np.concatenate([[0], np.cumsum(is_word)])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(cs_w[offsets[1:]] - cs_w[offsets[:-1]], pa.int64()),
                "n_bpe_tokens": pa.array(
                    cs_tok[offsets[1:]] - cs_tok[offsets[:-1]], pa.int64()
                ),
            }
        )


def bpe_token_counts(docs, merges: pd.DataFrame, concurrency: int = 4):
    """documents(doc_id, text) × learned merges → Dataset
    (doc_id, n_words, n_bpe_tokens). The merge table is rule-scale —
    shipped once per actor via constructor args, not per batch."""
    pairs = [(str(l), str(r)) for l, r in zip(merges["left"], merges["right"])]
    return docs.map_batches(
        BpeEncoder,
        fn_constructor_args=(pairs,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
