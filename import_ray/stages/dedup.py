"""Deduplication stages.

- ``exact_dedup_triples``: the reference's triple-tuple dedup
  (simple/stats/nodes.py:480-490; TypedValue set-dedup
  McfUtil.java:114-137; Beam Distinct GraphReader.java:157-177) as a
  hash-partitioned distinct:

    1. per-batch local distinct (the Beam bundle-cache trick,
       GraphReader.java:201-238) so the shuffle moves only
       already-unique rows;
    2. a vectorized 128-bit content hash (two independent 64-bit
       hashes → int64 cols ``h1``/``h2``) so partitioning keys are
       fixed-width ints, never the wide ``object_value`` strings;
    3. ``repartition(keys=["h1"])`` (hash shuffle) + per-block
       ``drop_duplicates`` — all copies of a tuple land in one block.

  128 bits keeps the collision expectation ≪1 even at 10^12 triples
  (n²/2^129).

Document-level dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard)
runs over the ``documents`` table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from import_ray.core.context import npartitions

TRIPLE_KEY = ["subject_id", "predicate", "object_id", "object_value"]
_HASH_KEY_2 = "9e3779b97f4a7c15"  # second, independent 16-byte hash key


def _hash_and_local_distinct(batch: pa.Table) -> pa.Table:
    """Append h1/h2 content hashes and drop in-batch duplicates."""
    h1 = np.zeros(len(batch), np.uint64)
    h2 = np.zeros(len(batch), np.uint64)
    for c in TRIPLE_KEY:
        col = batch[c].to_pandas().fillna("\x00").to_numpy(dtype=object)
        h1 = h1 * np.uint64(1099511628211) + pd.util.hash_array(col)
        h2 = h2 * np.uint64(0x9E3779B9) + pd.util.hash_array(col, hash_key=_HASH_KEY_2)
    t = batch.append_column("h1", pa.array(h1.view(np.int64))).append_column(
        "h2", pa.array(h2.view(np.int64))
    )
    return _local_distinct(t)


def _local_distinct(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    df = df.sort_values("provenance", kind="mergesort").drop_duplicates(
        ["h1", "h2"], keep="first"
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def exact_dedup_triples(ds, num_partitions: int | None = None):
    """Global exact dedup of triple rows (keeps min-provenance copy)."""
    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    n = num_partitions or npartitions()
    ds = ds.map_batches(_hash_and_local_distinct, batch_format="pyarrow")
    ds = ds.repartition(n, keys=["h1"])
    ds = ds.map_batches(_local_distinct, batch_format="pyarrow")
    return ds.drop_columns(["h1", "h2"])


def add_text_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    """Vectorized 64-bit content hash column for exact document dedup."""
    s = batch[col].to_pandas()
    h = pd.util.hash_array(s.to_numpy(dtype=object)).astype(np.int64)
    return batch.append_column("text_hash", pa.array(h, pa.int64()))


def exact_dedup_documents(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Exact document dedup: hash-partition on content hash, keep the
    first (min id) doc per identical text."""
    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    from ray.data.aggregate import Min

    ds = ds.map_batches(lambda b: add_text_hash(b, text_col), batch_format="pyarrow")
    ds = ds.select_columns([id_col, "text_hash"])
    return ds.groupby("text_hash", num_partitions=npartitions()).aggregate(
        Min(id_col, alias_name=id_col)
    )
