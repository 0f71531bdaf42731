"""N-gram language-model quality scoring (CCNet-style perplexity
filtering).

Training-data-pipeline operator with no reference equivalent (the
reference's quality checks are schema/value lints — SURVEY.md §2.4);
semantics follow the published CCNet recipe (Wenzek et al. 2020:
score each document by LM perplexity; filter/partition on the score)
with Stupid Backoff smoothing (Brants et al. 2007 — the standard
web-scale choice because it needs only raw counts, no discounting
pass over the count-of-count table).

Shape (two phases, both corpus-scale-safe):

  TRAIN  ref_docs → map_batches(count partials)      # per-batch np.unique
           → ONE keyed exchange on the gram key      # count-table-sized,
           → per-block sum → min-count filter        # NOT corpus-sized
           → count-desc top-``max_entries`` cap      # bounds the model
           → driver numpy arrays + ray.put broadcast # ≤ max_entries rows

  SCORE  docs → map_batches(PerplexityScorer, actor pool)
           # model fetched node-locally ONCE per actor in __init__;
           # per batch: flat token hashing, in-doc adjacent bigram
           # keys, np.searchsorted into the sorted model arrays,
           # np.add.reduceat per-doc aggregation — no per-doc loop

The model is the ONLY driver-materialized object and is bounded by
``max_entries`` (an LM must be broadcast to score anywhere); the
count exchange is bounded by the distinct-gram table, not the corpus.

Scoring: per in-doc bigram (w1, w2),
  logp = log(c(w1 w2) / c(w1))          if the bigram is in the model
       = log(alpha) + log(c(w2) / N)    else if w2 is in the model
       = log(alpha) + floor_logp        else        (OOV floor 1/(N+V))
perplexity = exp(-mean logp). Single-token docs score their unigram.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from import_ray.core.context import data_nparts as _data_nparts
from import_ray.stages.neardup import _split_flat

logger = logging.getLogger(__name__)

_BIGRAM_B = np.uint64(0x9E3779B97F4A7C15)
DEFAULT_ALPHA = 0.4


def _bigram_keys(counts: np.ndarray, h: np.ndarray) -> np.ndarray:
    """In-doc adjacent-token bigram keys over the flat token-hash
    array: poly-combine h[i]*B + h[i+1], masking doc boundaries."""
    total = len(h)
    if total < 2:
        return np.zeros(0, np.uint64)
    ndocs = len(counts)
    doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
    with np.errstate(over="ignore"):
        w = h[:-1] * _BIGRAM_B + h[1:]
    return w[doc_of[:-1] == doc_of[1:]]


def _count_partials(batch: pa.Table) -> pa.Table:
    """Per-batch (gram_key, cnt, is_bigram) partial counts + one
    token-total row (is_bigram == 2) for the corpus N."""
    counts, h = _split_flat(batch)
    bi = _bigram_keys(counts, h)
    uk, uc = np.unique(h, return_counts=True)
    bk, bc = np.unique(bi, return_counts=True)
    keys = np.concatenate([uk, bk, np.zeros(1, np.uint64)]).view(np.int64)
    cnts = np.concatenate([uc, bc, np.asarray([len(h)])]).astype(np.int64)
    kind = np.concatenate(
        [
            np.zeros(len(uk), np.int64),
            np.ones(len(bk), np.int64),
            np.full(1, 2, np.int64),
        ]
    )
    return pa.table(
        {
            "gram_key": pa.array(keys, pa.int64()),
            "cnt": pa.array(cnts, pa.int64()),
            "is_bigram": pa.array(kind, pa.int64()),
        }
    )


def _block_sum(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    g = (
        df.groupby(["gram_key", "is_bigram"], sort=False)["cnt"]
        .sum()
        .reset_index()
    )
    return pa.table(
        {
            "gram_key": pa.array(g["gram_key"].to_numpy(np.int64), pa.int64()),
            "cnt": pa.array(g["cnt"].to_numpy(np.int64), pa.int64()),
            "is_bigram": pa.array(g["is_bigram"].to_numpy(np.int64), pa.int64()),
        }
    )


def train_bigram_lm(
    ref_ds,
    min_count: int = 1,
    max_entries: int = 2_000_000,
    alpha: float = DEFAULT_ALPHA,
) -> dict:
    """Distributed bigram-count training → broadcastable model dict of
    sorted numpy arrays. ``max_entries`` caps EACH of the unigram and
    bigram tables (count-desc, key tie-break — deterministic); when the
    cap binds it is logged (rarest grams dropped ≈ extra backoff)."""
    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ref_ds)
    nparts = _data_nparts(ref_ds)
    counts = (
        ref_ds.map_batches(_count_partials, batch_format="pyarrow")
        .repartition(nparts, keys=["gram_key"])
        .map_batches(_block_sum, batch_format="pyarrow", batch_size=None)
    )
    if min_count > 1:
        counts = counts.filter(expr=f"cnt >= {min_count} or is_bigram == 2")
    counts = counts.materialize()

    def _top(kind: int):
        """Top ``max_entries`` grams of one kind by (count desc, key):
        the sort+limit runs DISTRIBUTED over the vocab-bounded count
        table; only ≤ max_entries rows reach the driver."""
        df = (
            counts.filter(expr=f"is_bigram == {kind}")
            .sort(["cnt", "gram_key"], descending=[True, False])
            .limit(max_entries + 1)
            .to_pandas()
        )
        if len(df) > max_entries:
            logger.warning(
                "train_bigram_lm: max_entries=%d binds for kind=%d; "
                "rarest grams dropped (scored via backoff)",
                max_entries,
                kind,
            )
            df = df.iloc[:max_entries]
        return (
            df["gram_key"].to_numpy(np.int64).view(np.uint64).copy(),
            df["cnt"].to_numpy(np.int64).copy(),
        )

    uni_keys, uni_cnts = _top(0)
    bi_keys, bi_cnts = _top(1)
    total_n = max(
        int(counts.filter(expr="is_bigram == 2").to_pandas()["cnt"].sum()), 1
    )

    vocab = len(uni_keys)
    uni_order = np.argsort(uni_keys)
    uni_keys, uni_cnts = uni_keys[uni_order], uni_cnts[uni_order]
    uni_logp = np.log(uni_cnts / total_n)

    # bigram logp = log(c(w1 w2) / c(w1)): vectorized lookup of each
    # bigram's FIRST-token count needs the first token, which the
    # combined key does not expose — so bigram conditionals are stored
    # against the recomputed key at SCORE time instead: store raw
    # counts here and divide after looking up c(w1) per scored bigram.
    bi_order = np.argsort(bi_keys)
    return {
        "uni_keys": uni_keys,
        "uni_logp": uni_logp,
        "uni_cnts": uni_cnts,
        "bi_keys": bi_keys[bi_order],
        "bi_cnts": bi_cnts[bi_order].astype(np.float64),
        "alpha_log": float(np.log(alpha)),
        "floor_logp": float(np.log(1.0 / (total_n + max(vocab, 1)))),
        "total_n": total_n,
    }


class PerplexityScorer:
    """map_batches actor kernel: fetches the broadcast model once per
    actor; per batch computes each doc's Stupid-Backoff bigram
    perplexity fully vectorized."""

    def __init__(self, model_ref):
        import ray

        m = ray.get(model_ref) if not isinstance(model_ref, dict) else model_ref
        self.uni_keys = m["uni_keys"]
        self.uni_logp = m["uni_logp"]
        self.uni_cnts = m["uni_cnts"]
        self.bi_keys = m["bi_keys"]
        self.bi_cnts = m["bi_cnts"]
        self.alpha_log = m["alpha_log"]
        self.floor_logp = m["floor_logp"]

    def _uni_lookup(self, h: np.ndarray, what: np.ndarray) -> np.ndarray:
        """Per-token lookup of ``what`` (logp or counts); miss → nan."""
        idx = np.searchsorted(self.uni_keys, h)
        idx = np.minimum(idx, len(self.uni_keys) - 1) if len(self.uni_keys) else idx
        out = np.full(len(h), np.nan)
        if len(self.uni_keys):
            hit = self.uni_keys[idx] == h
            out[hit] = what[idx[hit]]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts, h = _split_flat(batch)
        ndocs = len(counts)
        doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), counts)

        # per-token unigram logp (the backoff target) and c(w1)
        uni_logp_tok = self._uni_lookup(h, self.uni_logp)
        uni_cnt_tok = self._uni_lookup(h, self.uni_cnts.astype(np.float64))

        total = len(h)
        if total >= 2:
            with np.errstate(over="ignore"):
                w = h[:-1] * _BIGRAM_B + h[1:]
            in_doc = doc_of[:-1] == doc_of[1:]
            bi = w[in_doc]
            # bigram count lookup
            bidx = np.searchsorted(self.bi_keys, bi)
            bi_cnt = np.full(len(bi), np.nan)
            if len(self.bi_keys):
                bidx = np.minimum(bidx, len(self.bi_keys) - 1)
                bhit = self.bi_keys[bidx] == bi
                bi_cnt[bhit] = self.bi_cnts[bidx[bhit]]
            c_w1 = uni_cnt_tok[:-1][in_doc]
            logp2 = uni_logp_tok[1:][in_doc]  # backoff unigram of w2
            with np.errstate(divide="ignore", invalid="ignore"):
                lp = np.log(bi_cnt / c_w1)
            backoff = self.alpha_log + np.where(
                np.isnan(logp2), self.floor_logp, logp2
            )
            lp = np.where(np.isnan(lp), backoff, lp)
            bdoc = doc_of[:-1][in_doc]
            nll_sum = np.bincount(bdoc, weights=-lp, minlength=ndocs)
            n_events = np.bincount(bdoc, minlength=ndocs).astype(np.float64)
        else:
            nll_sum = np.zeros(ndocs)
            n_events = np.zeros(ndocs)

        # single-token docs: score the lone unigram (floor when OOV)
        single = n_events == 0
        if single.any():
            seg = np.zeros(ndocs, np.int64)
            np.cumsum(counts[:-1], out=seg[1:])
            first_lp = uni_logp_tok[seg]
            first_lp = np.where(np.isnan(first_lp), self.floor_logp, first_lp)
            nll_sum[single] = -first_lp[single]
            n_events[single] = 1.0

        ppl = np.exp(nll_sum / n_events)
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "ppl": pa.array(np.round(ppl, 6), pa.float64()),
                "n_bigrams": pa.array(n_events.astype(np.int64), pa.int64()),
            }
        )


def lm_perplexity(docs_ds, ref_ds=None, model: dict | None = None, **train_kw):
    """(doc_id, ppl, n_bigrams) for every doc, scored by a bigram LM
    trained on ``ref_ds`` (or a prebuilt ``model``). The model ships
    ONCE via the object store; scoring is an actor-pool stage."""
    import ray

    from import_ray.core.context import cluster_cpus

    if model is None:
        model = train_bigram_lm(ref_ds if ref_ds is not None else docs_ds, **train_kw)
    model_ref = ray.put(model)
    return docs_ds.map_batches(
        PerplexityScorer,
        fn_constructor_args=(model_ref,),
        batch_format="pyarrow",
        concurrency=(1, max(2, cluster_cpus())),
    )
