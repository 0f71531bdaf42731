"""Deterministic corpus sampling: stratified per-source caps, weighted
source mixing, and sampled quantiles — training-data-pipeline
operators the reference lacks (closest analog: the deterministic
sample-place selection in ``util/.../StatChecker.java:79`` — min-key
selection per bucket, which is exactly the shape used here).

All three operators share the auditable multiplicative-hash key from
``stages/scrub.py`` (``(id * 2654435761) mod 2^32``), so every sample
is reproducible across runs and cluster sizes AND SQL-expressible —
the DuckDB oracles check values exactly, not just row counts.

Scale shapes:
- ``stratified_sample``: per-batch local bottom-k per group (the
  combiner — at most k × #groups rows leave each batch), one keyed
  exchange on the group column, block-local final bottom-k. Bodies
  of non-sampled rows never shuffle.
- ``mixture_sample``: pure filter at the read — no shuffle, no RNG
  state; per-source keep rates express training-mix weights.
- ``sampled_percentiles``: per-batch bottom-k partials → tiny global
  merge (k rows survive) → exact PERCENTILE_DISC over the sample.
  This is the classic mergeable bottom-k sketch: a deterministic
  uniform sample with ±O(1/sqrt(k)) quantile error, and because the
  sample membership is a pure hash predicate the oracle reproduces
  it exactly in SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from import_ray.core.arrowutil import from_pandas_clean

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(0xFFFFFFFF)


def _hash_key(ids: np.ndarray) -> np.ndarray:
    return ((ids.astype(np.uint64) * _KNUTH) & _MOD32).astype(np.int64)


# --- stratified per-group cap -------------------------------------------------


def stratified_sample(ds, group_col: str = "source", id_col: str = "doc_id", k: int = 5):
    """Keep the ``k`` rows with the smallest hash key per group —
    a deterministic per-source frequency cap (domain capping in
    web-corpus terms). Returns (group, id, sample_key)."""
    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    nparts = data_nparts(ds)

    def local_bottomk(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                group_col: batch[group_col].to_pandas(),
                id_col: batch[id_col].to_numpy(zero_copy_only=False),
            }
        )
        df["sample_key"] = _hash_key(df[id_col].to_numpy())
        df = df.sort_values(
            [group_col, "sample_key", id_col], kind="mergesort"
        )
        out = df.groupby(group_col, sort=False).head(k)
        return from_pandas_clean(out, preserve_index=False)

    def final_bottomk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            [group_col, "sample_key", id_col], kind="mergesort"
        )
        return from_pandas_clean(
            df.groupby(group_col, sort=False).head(k), preserve_index=False
        )

    return (
        ds.map_batches(local_bottomk, batch_format="pyarrow")
        .repartition(nparts, keys=[group_col])
        .map_batches(final_bottomk, batch_size=None, batch_format="pyarrow")
    )


STRATIFIED_SAMPLE_SQL = """
SELECT source, doc_id, sample_key FROM (
  SELECT source, doc_id,
         CAST((doc_id * 2654435761) % 4294967296 AS BIGINT) AS sample_key,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
  FROM documents) WHERE rn <= 5
"""


# --- weighted source mixture --------------------------------------------------

# default mix: keep all of src0, half of src1, a quarter of src2,
# 10% of everything else (rates as u32 thresholds)
DEFAULT_MIX = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
DEFAULT_MIX_REST = 0.1


def _thr(rate: float) -> np.uint64:
    return np.uint64(min(int(rate * 4294967296.0), 4294967296 - 1) if rate < 1.0 else 4294967295)


def mixture_sample(ds, rates: dict[str, float] | None = None, rest: float = DEFAULT_MIX_REST):
    """Per-source deterministic Bernoulli keep — the data-mixing stage
    of a training pipeline (source weights → keep rates). Pure filter;
    emits (doc_id, source, sample_key)."""
    rates = dict(DEFAULT_MIX if rates is None else rates)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        src = batch["source"].to_pandas()
        h = (ids.astype(np.uint64) * _KNUTH) & _MOD32
        thr = src.map(lambda s: _thr(rates.get(s, rest))).to_numpy(np.uint64)
        mask = h < thr
        return pa.table(
            {
                "doc_id": pa.array(ids[mask], pa.int64()),
                "source": pa.array(src[mask].to_numpy(dtype=object), pa.string()),
                "sample_key": pa.array(h[mask].astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(keep, batch_format="pyarrow")


MIXTURE_SAMPLE_SQL = """
SELECT doc_id, source,
       CAST((doc_id * 2654435761) % 4294967296 AS BIGINT) AS sample_key
FROM documents
WHERE (doc_id * 2654435761) % 4294967296 <
      CASE source WHEN 'src0' THEN 4294967295
                  WHEN 'src1' THEN 2147483648
                  WHEN 'src2' THEN 1073741824
                  ELSE 429496729 END
"""


# --- sampled percentiles (bottom-k sketch) ------------------------------------

_QS = (0.25, 0.5, 0.75, 0.9)


def sampled_percentiles(ds, k: int = 2048):
    """PERCENTILE_DISC(q) of ``o_totalprice`` over the deterministic
    bottom-``k``-by-hash sample of orders. Per-batch bottom-k partials
    (≤ k rows leave each batch) merge through one tiny sort+limit; the
    final quantile pick touches exactly k rows."""

    def local_bottomk(batch: pa.Table) -> pa.Table:
        keys = _hash_key(batch["o_orderkey"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame(
            {
                "sample_key": keys,
                "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False),
                "o_totalprice": batch["o_totalprice"].to_numpy(zero_copy_only=False),
            }
        ).nsmallest(k, ["sample_key", "o_orderkey"])
        return from_pandas_clean(df, preserve_index=False)

    partials = ds.map_batches(local_bottomk, batch_format="pyarrow")
    # global bottom-k over the (tiny) partials: ≤ k × #blocks rows
    sample = (
        partials.sort(["sample_key", "o_orderkey"]).limit(k).to_pandas()
    )
    v = np.sort(sample["o_totalprice"].to_numpy())
    n = len(v)
    row = {}
    for q in _QS:
        # DuckDB PERCENTILE_DISC: element at 1-indexed ceil(q*n)
        idx = max(int(np.ceil(q * n)) - 1, 0)
        cents = v[idx] * 100.0
        row[f"p{int(q*100)}_cents"] = int(
            np.floor(cents + 0.5) if cents >= 0 else np.ceil(cents - 0.5)
        )
    row["sample_n"] = n
    return pd.DataFrame([row])


SAMPLED_PERCENTILES_SQL = """
WITH sample AS (
  SELECT o_totalprice FROM (
    SELECT o_totalprice,
           ROW_NUMBER() OVER (
             ORDER BY (o_orderkey * 2654435761) % 4294967296, o_orderkey) AS rn
    FROM orders) WHERE rn <= 2048)
SELECT
  CAST(ROUND(percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) * 100) AS BIGINT) AS p25_cents,
  CAST(ROUND(percentile_disc(0.5)  WITHIN GROUP (ORDER BY o_totalprice) * 100) AS BIGINT) AS p50_cents,
  CAST(ROUND(percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) * 100) AS BIGINT) AS p75_cents,
  CAST(ROUND(percentile_disc(0.9)  WITHIN GROUP (ORDER BY o_totalprice) * 100) AS BIGINT) AS p90_cents,
  CAST(count(*) AS BIGINT) AS sample_n
FROM sample
"""


# --- weighted sampling without replacement (Efraimidis–Spirakis A-Res) -------


def weighted_sample(
    ds,
    id_col: str,
    weight_cents_col: str,
    k: int = 100,
):
    """Deterministic weighted sampling without replacement: keep the
    ``k`` rows with the smallest A-Res key ``-ln(u)/w`` (Efraimidis &
    Spirakis 2006), where ``u = (hash(id)+0.5)/2^32`` uses the same
    auditable multiplicative hash as the other samplers — so the sample
    is reproducible across runs/cluster sizes and SQL-expressible.

    Scale shape: per-batch bottom-k partials (≤ k rows leave each
    batch) → one tiny global merge of k × #blocks rows. Weights are
    integer cents; the ordering key is a double, with the id as an
    exact tie-break (a boundary flip would need two keys within 1 ulp).
    """
    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)

    def ares_key(ids: np.ndarray, w: np.ndarray) -> np.ndarray:
        h = _hash_key(ids).astype(np.float64)
        u = (h + 0.5) / 4294967296.0
        return -np.log(u) / w.astype(np.float64)

    def local_bottomk(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        w = batch[weight_cents_col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                id_col: ids,
                "weight_cents": w.astype(np.int64),
                "ares_key": ares_key(ids, w),
            }
        )
        df = df.sort_values(["ares_key", id_col], kind="mergesort").head(k)
        return from_pandas_clean(df, preserve_index=False)

    partials = ds.map_batches(local_bottomk, batch_format="pyarrow").to_pandas()
    out = (
        partials.sort_values(["ares_key", id_col], kind="mergesort")
        .head(k)
        .drop(columns=["ares_key"])
        .reset_index(drop=True)
    )
    out["weight_cents"] = out["weight_cents"].astype(np.int64)
    return out


WEIGHTED_SAMPLE_ORDERS_SQL = """
WITH keyed AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice*100) AS BIGINT) AS weight_cents,
         CAST((o_orderkey * 2654435761) % 4294967296 AS BIGINT) AS h
  FROM orders
)
SELECT o_orderkey, weight_cents
FROM keyed
ORDER BY -ln((h + 0.5) / 4294967296.0) / weight_cents, o_orderkey
LIMIT 100
"""


# --- deterministic training-data shuffle → balanced shards -------------------


def shuffle_shards(ds, id_col: str = "doc_id", n_shards: int = 8, seed: int = 7):
    """Deterministic global shuffle for training-data export: every row
    gets the auditable seeded hash key ``((id + seed) * 2654435761)
    mod 2^32``; ``shard_id = key % n_shards`` and ``pos`` is the row's
    rank within its shard under (key, id) — i.e. a reproducible random
    permutation materialized as balanced shards. ONE keyed exchange
    co-locates each shard; within-shard order is a block-local lexsort.
    Same seed → byte-identical shards on re-run (the resumable-writer
    contract). Returns (id, shard_id, pos).

    Partitioning assumption: a shard fits a worker block — size
    ``n_shards`` to the corpus (≈ corpus_bytes / 256 MB; thousands of
    shards at 100 TB), never a handful of giant shards."""
    from import_ray.core.context import ensure_hash_shuffle, npartitions

    ensure_hash_shuffle(ds)

    def key_shard(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        key = ((ids.astype(np.uint64) + np.uint64(seed)) * _KNUTH) & _MOD32
        return pa.table(
            {
                id_col: pa.array(ids.astype(np.int64)),
                "shard_id": pa.array((key % np.uint64(n_shards)).astype(np.int64)),
                "shuffle_key": pa.array(key.astype(np.int64)),
            }
        )

    keyed = ds.map_batches(key_shard, batch_format="pyarrow")

    def rank_block(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sh = batch["shard_id"].to_numpy(zero_copy_only=False)
        key = batch["shuffle_key"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "shard_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((ids, key, sh))
        sh_s, ids_s = sh[order], ids[order]
        new_shard = np.r_[True, sh_s[1:] != sh_s[:-1]]
        starts = np.flatnonzero(new_shard)
        pos = np.arange(len(sh_s), dtype=np.int64)
        pos -= np.repeat(starts, np.diff(np.r_[starts, len(sh_s)]))
        return pa.table(
            {
                id_col: pa.array(ids_s),
                "shard_id": pa.array(sh_s),
                "pos": pa.array(pos),
            }
        )

    n = min(npartitions(), max(2, n_shards))
    return keyed.repartition(n, keys=["shard_id"]).map_batches(
        rank_block, batch_format="pyarrow", batch_size=None
    )


def write_shuffled_shards(
    ds, out_dir: str, id_col: str = "doc_id", n_shards: int = 8, seed: int = 7
):
    """Materialize ``shuffle_shards`` as one parquet directory per
    shard (``shard=K/``) — the resumable training-export layout: a
    failed export reruns only the missing shard dirs, and a re-run
    with the same seed reproduces identical content."""
    import os

    import pyarrow.parquet as pq

    assigned = shuffle_shards(ds, id_col=id_col, n_shards=n_shards, seed=seed)

    def write_block(batch: pa.Table) -> pa.Table:
        sh = batch["shard_id"].to_numpy(zero_copy_only=False)
        for s in np.unique(sh):
            sub = batch.filter(pa.array(sh == s))
            d = os.path.join(out_dir, f"shard={int(s)}")
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, "part.parquet.tmp")
            pq.write_table(sub.sort_by("pos"), tmp)
            os.replace(tmp, os.path.join(d, "part.parquet"))
        return pa.table({"written": pa.array([len(batch)], pa.int64())})

    total = (
        assigned.map_batches(write_block, batch_format="pyarrow", batch_size=None)
        .sum("written")
    )
    return int(total or 0)
