"""N-gram repetition quality signals and cross-document duplicated
n-gram detection — training-data-pipeline operators with no analog in
the reference (closest: the distinct-token counters in
``stages/text.py`` mirroring StatChecker-style counting,
`util/.../StatChecker.java:204`).

Two operator families:

- ``bigram_repetition_stats``: per-doc within-document repetition
  signals in the spirit of the Gopher quality rules (fraction of
  duplicate n-grams, weight of the single most frequent n-gram) —
  pure ``map_batches``, embarrassingly parallel, no shuffle. Emits
  exact integer counts so the DuckDB oracle hashes identically.

- ``cross_dup_stats``: for every document, how many of its DISTINCT
  word-n-gram shingles also occur in at least one OTHER document —
  the detection core of substring-level cross-corpus dedup (Lee et
  al., "Deduplicating Training Data Makes Language Models Better":
  duplicated spans are located by matching fixed-length windows
  across documents). Scale shape: stage 1 emits distinct
  (shingle_hash, doc_id) pairs per doc (combiner — duplicates inside
  a doc never leave the map stage); ONE keyed shuffle on the 8-byte
  shingle hash co-locates each shingle's postings so a block-local
  run-length pass marks cross-doc shingles exactly; per-block per-doc
  partial sums (#docs × #blocks tiny rows) then merge with a second
  keyed exchange on doc_id. Document text never moves — only hashes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from import_ray.core.arrowutil import from_pandas_clean
from import_ray.stages.neardup import _shingle_hashes_flat, _split_flat


def _doc_ids(batch: pa.Table) -> np.ndarray:
    return batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)


def bigram_repetition_stats(batch: pa.Table) -> pa.Table:
    """(doc_id, n_bigrams, n_distinct_bigrams, top_bigram_count) per
    doc with ≥ 1 bigram (single-token docs are dropped, matching the
    SQL's empty-unnest semantics).

    Vectorized: one dictionary-encode of the flat tokens, consecutive
    codes packed into one uint64 pair key, a single lexsort over
    (doc, pair), and run-length reductions — no per-row Python.
    """
    ids = _doc_ids(batch)
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lists = pc.split_pattern(text, pattern=" ")
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lists)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_bigrams": pa.array([], pa.int64()),
            "n_distinct_bigrams": pa.array([], pa.int64()),
            "top_bigram_count": pa.array([], pa.int64()),
        }
    )
    if len(flat) == 0:
        return empty
    codes = (
        flat.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.uint64)
    )
    doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    if len(codes) < 2:
        return empty
    same = doc_of[1:] == doc_of[:-1]
    pair = (codes[:-1] << np.uint64(32)) | codes[1:]
    bp, bpair = doc_of[:-1][same], pair[same]
    if len(bp) == 0:
        return empty
    order = np.lexsort((bpair, bp))
    bp, bpair = bp[order], bpair[order]
    newrun = np.empty(len(bp), bool)
    newrun[0] = True
    newrun[1:] = (bp[1:] != bp[:-1]) | (bpair[1:] != bpair[:-1])
    run_starts = np.flatnonzero(newrun)
    run_parents = bp[run_starts]
    run_counts = np.diff(np.append(run_starts, len(bp))).astype(np.int64)
    ndocs = len(counts)
    n_bigrams = np.bincount(bp, minlength=ndocs).astype(np.int64)
    n_distinct = np.bincount(run_parents, minlength=ndocs).astype(np.int64)
    top = np.zeros(ndocs, np.int64)
    doc_first = np.flatnonzero(
        np.append(True, run_parents[1:] != run_parents[:-1])
    )
    if len(run_counts):
        top[run_parents[doc_first]] = np.maximum.reduceat(run_counts, doc_first)
    keep = n_bigrams > 0
    return pa.table(
        {
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_bigrams": pa.array(n_bigrams[keep]),
            "n_distinct_bigrams": pa.array(n_distinct[keep]),
            "top_bigram_count": pa.array(top[keep]),
        }
    )


BIGRAM_REPETITION_SQL = """
WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
 bg AS (SELECT doc_id,
               unnest(list_transform(list_zip(t[:len(t)-1], t[2:]),
                                     x -> x[1] || chr(31) || x[2])) AS b
        FROM toks),
 cnt AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_bigrams,
       CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
       CAST(max(c) AS BIGINT) AS top_bigram_count
FROM cnt GROUP BY doc_id
"""


def _distinct_doc_shingles(batch: pa.Table, n: int) -> pa.Table:
    """(sh, doc_id) rows: each doc's DISTINCT word-n-gram shingle
    hashes. Docs with < n tokens contribute nothing (SQL parity:
    ``list_zip`` of n slices is empty below n tokens)."""
    ids = _doc_ids(batch)
    counts, h = _split_flat(batch)
    out_empty = pa.table(
        {"sh": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
    )
    if len(counts) == 0:
        return out_empty
    sh_counts, sh = _shingle_hashes_flat(counts, h, n)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), sh_counts)
    valid = np.repeat(counts >= n, sh_counts)
    doc_idx, sh = doc_idx[valid], sh[valid]
    if len(sh) == 0:
        return out_empty
    order = np.lexsort((sh, doc_idx))
    di, s = doc_idx[order], sh[order]
    keep = np.empty(len(di), bool)
    keep[0] = True
    keep[1:] = (di[1:] != di[:-1]) | (s[1:] != s[:-1])
    return pa.table(
        {
            "sh": pa.array(s[keep].view(np.int64), pa.int64()),
            "doc_id": pa.array(ids[di[keep]], pa.int64()),
        }
    )


def _postings_block(batch: pa.Table) -> pa.Table:
    """Keyed repartition put every copy of a shingle hash in ONE block,
    so a block-local run-length over the sorted postings is globally
    exact: a shingle is cross-duplicated iff its posting run spans ≥ 2
    rows (pairs are already distinct per doc). Emits per-(block, doc)
    partial sums — tiny rows."""
    if batch.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_shingles": pa.array([], pa.int64()),
                "n_cross_dup": pa.array([], pa.int64()),
            }
        )
    sh = batch["sh"].to_numpy(zero_copy_only=False)
    doc = batch["doc_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(sh, kind="stable")
    sh, doc = sh[order], doc[order]
    newrun = np.empty(len(sh), bool)
    newrun[0] = True
    newrun[1:] = sh[1:] != sh[:-1]
    run_id = np.cumsum(newrun) - 1
    run_sizes = np.bincount(run_id)
    dup_row = run_sizes[run_id] >= 2
    uniq_docs, codes = np.unique(doc, return_inverse=True)
    n_sh = np.bincount(codes).astype(np.int64)
    n_dup = np.bincount(codes, weights=dup_row).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(uniq_docs, pa.int64()),
            "n_shingles": pa.array(n_sh),
            "n_cross_dup": pa.array(n_dup),
        }
    )


def _sum_by_doc(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    g = df.groupby("doc_id", sort=False, as_index=False)[
        ["n_shingles", "n_cross_dup"]
    ].sum()
    return from_pandas_clean(g, preserve_index=False)


def cross_dup_stats(docs_ds, n: int = 3):
    """(doc_id, n_shingles, n_cross_dup): per doc, its distinct
    word-``n``-gram shingle count and how many of those shingles occur
    in ≥ 2 distinct documents corpus-wide. Two keyed exchanges over
    16-byte rows; text never shuffles."""
    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    ensure_hash_shuffle(docs_ds)
    nparts = data_nparts(docs_ds)
    pairs = docs_ds.map_batches(
        lambda b: _distinct_doc_shingles(b, n), batch_format="pyarrow"
    )
    partials = pairs.repartition(nparts, keys=["sh"]).map_batches(
        _postings_block, batch_size=None, batch_format="pyarrow"
    )
    return partials.repartition(nparts, keys=["doc_id"]).map_batches(
        _sum_by_doc, batch_size=None, batch_format="pyarrow"
    )


def _pos_doc_shingles(batch: pa.Table, n: int) -> pa.Table:
    """(sh, doc_id, pos) rows — EVERY shingle position (1-based, SQL
    ``generate_subscripts`` parity), not per-doc distinct: span
    localization needs the positions of repeated occurrences too."""
    ids = _doc_ids(batch)
    counts, h = _split_flat(batch)
    empty = pa.table(
        {
            "sh": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
        }
    )
    if len(counts) == 0:
        return empty
    sh_counts, sh = _shingle_hashes_flat(counts, h, n)
    offsets = np.zeros(len(counts), np.int64)
    np.cumsum(sh_counts[:-1], out=offsets[1:])
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), sh_counts)
    pos = np.arange(len(sh), dtype=np.int64) - np.repeat(offsets, sh_counts) + 1
    valid = np.repeat(counts >= n, sh_counts)
    if not valid.any():
        return empty
    return pa.table(
        {
            "sh": pa.array(sh[valid].view(np.int64), pa.int64()),
            "doc_id": pa.array(ids[doc_idx[valid]], pa.int64()),
            "pos": pa.array(pos[valid], pa.int64()),
        }
    )


def _flag_dup_positions(batch: pa.Table) -> pa.Table:
    """Per shingle-keyed block (= globally complete postings): mark a
    position duplicated iff its shingle occurs in ≥ 2 distinct docs.
    One lexsort; distinct-doc counts per shingle via run boundaries."""
    if batch.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "dup": pa.array([], pa.int8()),
            }
        )
    sh = batch["sh"].to_numpy(zero_copy_only=False)
    doc = batch["doc_id"].to_numpy(zero_copy_only=False)
    pos = batch["pos"].to_numpy(zero_copy_only=False)
    order = np.lexsort((doc, sh))
    sh_s, doc_s = sh[order], doc[order]
    new_sh = np.empty(len(sh_s), bool)
    new_sh[0] = True
    new_sh[1:] = sh_s[1:] != sh_s[:-1]
    new_doc = new_sh.copy()
    new_doc[1:] |= doc_s[1:] != doc_s[:-1]
    run_id = np.cumsum(new_sh) - 1
    ndocs = np.bincount(run_id[new_doc])
    dup_sorted = (ndocs[run_id] >= 2).astype(np.int8)
    dup = np.empty(len(sh), np.int8)
    dup[order] = dup_sorted
    return pa.table(
        {
            "doc_id": pa.array(doc, pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "dup": pa.array(dup, pa.int8()),
        }
    )


def _doc_span_stats(batch: pa.Table) -> pa.Table:
    """Doc-keyed block: per doc, total positions, duplicated positions,
    and the longest consecutive duplicated run (gaps-and-islands,
    vectorized over the whole block)."""
    if batch.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_pos": pa.array([], pa.int64()),
                "n_dup_pos": pa.array([], pa.int64()),
                "max_dup_run": pa.array([], pa.int64()),
            }
        )
    doc = batch["doc_id"].to_numpy(zero_copy_only=False)
    pos = batch["pos"].to_numpy(zero_copy_only=False)
    dup = batch["dup"].to_numpy(zero_copy_only=False).astype(bool)
    uniq_docs, codes = np.unique(doc, return_inverse=True)
    n_pos = np.bincount(codes).astype(np.int64)
    n_dup = np.bincount(codes, weights=dup).astype(np.int64)
    max_run = np.zeros(len(uniq_docs), np.int64)
    if dup.any():
        dc, dp = codes[dup], pos[dup]
        order = np.lexsort((dp, dc))
        dc, dp = dc[order], dp[order]
        newrun = np.empty(len(dc), bool)
        newrun[0] = True
        newrun[1:] = (dc[1:] != dc[:-1]) | (dp[1:] != dp[:-1] + 1)
        run_starts = np.flatnonzero(newrun)
        run_parents = dc[run_starts]
        run_lens = np.diff(np.append(run_starts, len(dc))).astype(np.int64)
        doc_first = np.flatnonzero(
            np.append(True, run_parents[1:] != run_parents[:-1])
        )
        max_run[run_parents[doc_first]] = np.maximum.reduceat(run_lens, doc_first)
    return pa.table(
        {
            "doc_id": pa.array(uniq_docs, pa.int64()),
            "n_pos": pa.array(n_pos),
            "n_dup_pos": pa.array(n_dup),
            "max_dup_run": pa.array(max_run),
        }
    )


def dup_span_stats(docs_ds, n: int = 3):
    """(doc_id, n_pos, n_dup_pos, max_dup_run): per doc, how many
    shingle positions are cross-document duplicates and the longest
    consecutive duplicated span (in shingles; + n - 1 gives tokens) —
    the span-localization core of substring-level dedup (Lee et al.).

    Scale shape: unlike ``cross_dup_stats`` this must move
    POSITION-level rows (localization needs them co-located twice:
    once by shingle to decide duplication, once by doc to find runs)
    — two keyed exchanges of ~17 B rows, O(total tokens) — still
    hashes only; document text never shuffles."""
    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    ensure_hash_shuffle(docs_ds)
    nparts = data_nparts(docs_ds)
    pos_rows = docs_ds.map_batches(
        lambda b: _pos_doc_shingles(b, n), batch_format="pyarrow"
    )
    flagged = pos_rows.repartition(nparts, keys=["sh"]).map_batches(
        _flag_dup_positions, batch_size=None, batch_format="pyarrow"
    )
    return flagged.repartition(nparts, keys=["doc_id"]).map_batches(
        _doc_span_stats, batch_size=None, batch_format="pyarrow"
    )


DUP_SPAN_SQL = """
WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
 grams AS (SELECT doc_id,
                  list_transform(list_zip(t[:len(t)-2], t[2:len(t)-1], t[3:]),
                                 x -> x[1] || chr(31) || x[2] || chr(31) || x[3]) AS g
           FROM toks),
 sh AS (SELECT doc_id, unnest(g) AS s, generate_subscripts(g, 1) AS pos FROM grams),
 dupset AS (SELECT s FROM (SELECT s, doc_id FROM sh GROUP BY s, doc_id)
            GROUP BY s HAVING count(*) >= 2),
 dup AS (SELECT doc_id, pos FROM sh WHERE s IN (SELECT s FROM dupset)),
 isl AS (SELECT doc_id, pos,
                pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         FROM dup),
 runs AS (SELECT doc_id, count(*) AS runlen FROM isl GROUP BY doc_id, grp),
 tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pos FROM sh GROUP BY doc_id),
 dupcnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_pos FROM dup GROUP BY doc_id),
 mx AS (SELECT doc_id, CAST(max(runlen) AS BIGINT) AS max_dup_run FROM runs GROUP BY doc_id)
SELECT tot.doc_id, n_pos,
       COALESCE(n_dup_pos, 0) AS n_dup_pos,
       COALESCE(max_dup_run, 0) AS max_dup_run
FROM tot LEFT JOIN dupcnt USING (doc_id) LEFT JOIN mx USING (doc_id)
"""


CROSS_DUP_SQL = """
WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
 sh AS (SELECT doc_id,
               unnest(list_distinct(list_transform(
                 list_zip(t[:len(t)-2], t[2:len(t)-1], t[3:]),
                 x -> x[1] || chr(31) || x[2] || chr(31) || x[3]))) AS s
        FROM toks),
 dup AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= 2)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(*) FILTER (WHERE s IN (SELECT s FROM dup)) AS BIGINT)
         AS n_cross_dup
FROM sh GROUP BY doc_id
"""
