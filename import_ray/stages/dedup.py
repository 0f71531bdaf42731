"""Deduplication stages.

- ``exact_dedup_triples``: the reference's triple-tuple dedup
  (simple/stats/nodes.py:480-490; TypedValue set-dedup
  McfUtil.java:114-137; Beam Distinct GraphReader.java:157-177) as a
  hash-partitioned groupby. Scale notes: a per-batch local dedup runs
  first (the Beam bundle-cache trick, GraphReader.java:201-238) so the
  all-to-all shuffle only moves already-unique rows, and the global
  distinct is a vectorized ``groupby().min()`` — no per-group Python.

Document-level dedup operators (exact / minhash-LSH / simhash) live
here too; they run over the ``documents`` table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TRIPLE_KEY = ["subject_id", "predicate", "object_id", "object_value"]


def _local_distinct(batch: pa.Table) -> pa.Table:
    """Per-batch pre-dedup before the shuffle (combiner)."""
    return batch.group_by(TRIPLE_KEY).aggregate([("provenance", "min")]).rename_columns(
        TRIPLE_KEY + ["provenance"]
    )


def exact_dedup_triples(ds):
    """Global exact dedup of triple rows; keeps min(provenance) per tuple."""
    from ray.data.aggregate import Min

    ds = ds.map_batches(_local_distinct, batch_format="pyarrow")
    out = ds.groupby(TRIPLE_KEY).aggregate(Min("provenance", alias_name="provenance"))
    return out


def add_text_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    """Vectorized 64-bit content hash column for exact document dedup."""
    import pandas as pd

    s = batch[col].to_pandas()
    h = pd.util.hash_array(s.to_numpy(dtype=object)).astype(np.int64)
    return batch.append_column("text_hash", pa.array(h, pa.int64()))


def exact_dedup_documents(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Exact document dedup: hash-partition on content hash, keep the
    first (min id) doc per identical text. Returns (id, text_hash) of
    survivors."""
    from ray.data.aggregate import Min

    ds = ds.map_batches(lambda b: add_text_hash(b, text_col), batch_format="pyarrow")
    ds = ds.select_columns([id_col, "text_hash"])
    return ds.groupby("text_hash").aggregate(Min(id_col, alias_name=id_col))
