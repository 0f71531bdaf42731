"""Composite corpus-cleaning pipeline: the end-to-end training-data
flow a 100 TB text corpus goes through, composed from the engine's
existing stages — all streaming, no full materialization:

    read documents
      → token/quality stats + threshold filter   (map_batches kernel)
      → exact dedup (128-bit content-hash keys, keyed-shuffle block
        min — only 24 B/row ever shuffles; bodies stay put)
      → [optional] MinHash-LSH near-dup removal (stages/neardup.py),
        keeping each cluster's min-doc_id representative
      → surviving (doc_id, n_tokens)

``corpus_clean_exact`` (filter + exact dedup) is SQL-expressible and
oracle-checked; ``corpus_clean`` adds the near-dup stage (rows-only —
MinHash is not SQL-expressible; the stage itself has planted oracles
and byte-equal dual-path tests in tests/test_neardup.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from import_ray.stages.text import _text_col, _token_counts

from import_ray.core.arrowutil import from_pandas_clean

_PLANT_OFFSET = 1_000_000


def _read_docs(sf_dir: str):
    import ray.data

    from import_ray.core.context import configure_data_context

    configure_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(
        lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
    )


def _plant_copies(batch: pa.Table) -> pa.Table:
    """Deterministic exact copies of every 10th doc (id + 1e6) so the
    dedup stage has work; the oracle plants identically in SQL."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    sub = batch.filter(pa.array(ids % 10 == 0))
    copies = pa.table(
        {
            "doc_id": pa.array(
                sub["doc_id"].to_numpy(zero_copy_only=False) + _PLANT_OFFSET
            ),
            "text": sub["text"],
        }
    )
    # combine_chunks: downstream Arrow kernels (dictionary_encode in
    # _token_counts) need contiguous arrays
    return pa.concat_tables([batch, copies.cast(batch.schema)]).combine_chunks()


def _stats_filter(
    batch: pa.Table, min_tokens: int, max_tokens: int, min_distinct_ratio_micro: int
) -> pa.Table:
    n_tok, n_dis = _token_counts(_text_col(batch))
    dr = (n_dis * 1_000_000) // np.maximum(n_tok, 1)
    keep = (n_tok >= min_tokens) & (n_tok <= max_tokens) & (dr >= min_distinct_ratio_micro)
    out = batch.filter(pa.array(keep))
    return out.append_column("n_tokens", pa.array(n_tok[keep]))


def _content_keys(batch: pa.Table) -> pa.Table:
    texts = np.asarray(batch["text"].to_pylist(), dtype=object)
    h1 = pd.util.hash_array(texts).astype(np.int64)
    h2 = pd.util.hash_array(texts, hash_key="fedcba0987654321").astype(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "h1": pa.array(h1),
            "h2": pa.array(h2),
        }
    )


def _exact_keep_ids(filtered_ds, n: int):
    """Min doc_id per 128-bit content hash via keyed-shuffle block min —
    the exact-dedup exchange moves (doc_id, h1, h2) = 24 B/row."""
    from import_ray.core.context import ensure_hash_shuffle

    def block_min(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        keep = df.groupby(["h1", "h2"], sort=False)["doc_id"].min().reset_index()
        return from_pandas_clean(keep[["doc_id"]], preserve_index=False)

    keys = filtered_ds.map_batches(_content_keys, batch_format="pyarrow")
    ensure_hash_shuffle(keys)
    return keys.repartition(n, keys=["h1", "h2"]).map_batches(
        block_min, batch_format="pyarrow", batch_size=None
    )


def corpus_clean_exact(
    sf_dir: str,
    min_tokens: int = 20,
    max_tokens: int = 2000,
    min_distinct_ratio_micro: int = 300_000,
):
    """Filter + exact-dedup stages of the cleaning flow (oracle-checked)."""
    from import_ray.core.context import data_nparts

    docs = _read_docs(sf_dir).map_batches(_plant_copies, batch_format="pyarrow")
    n = data_nparts(docs)
    filtered = docs.map_batches(
        lambda b: _stats_filter(b, min_tokens, max_tokens, min_distinct_ratio_micro),
        batch_format="pyarrow",
    )
    keep = _exact_keep_ids(filtered, n)
    return filtered.select_columns(["doc_id", "n_tokens"]).join(
        keep,
        join_type="left_semi",
        num_partitions=n,
        on=("doc_id",),
    )


CORPUS_CLEAN_SQL = """
WITH planted AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
), stats AS (
  SELECT doc_id, text,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) * 1000000
           // len(string_split(text, ' ')) AS dr
  FROM planted
), filtered AS (
  SELECT * FROM stats WHERE n_tokens BETWEEN 20 AND 2000 AND dr >= 300000
), keep AS (
  SELECT MIN(doc_id) AS doc_id FROM filtered GROUP BY text
)
SELECT f.doc_id, CAST(f.n_tokens AS BIGINT) AS n_tokens
FROM filtered f JOIN keep k USING (doc_id)
"""


def corpus_clean(
    sf_dir: str,
    min_tokens: int = 20,
    max_tokens: int = 2000,
    min_distinct_ratio_micro: int = 300_000,
    neardup_threshold: float = 0.7,
):
    """Full cleaning flow: filter → exact dedup → MinHash near-dup
    removal (cluster representative = min doc_id)."""
    import pyarrow.compute as pc

    from import_ray.core.context import data_nparts
    from import_ray.stages.neardup import minhash_dedup

    docs = _read_docs(sf_dir).map_batches(_plant_copies, batch_format="pyarrow")
    n = data_nparts(docs)
    filtered = docs.map_batches(
        lambda b: _stats_filter(b, min_tokens, max_tokens, min_distinct_ratio_micro),
        batch_format="pyarrow",
    )
    keep = _exact_keep_ids(filtered, n)
    exact_unique = filtered.join(
        keep, join_type="left_semi", num_partitions=n, on=("doc_id",)
    )

    labels = minhash_dedup(exact_unique, threshold=neardup_threshold)
    reps = labels.map_batches(
        lambda b: b.filter(pc.equal(b["doc_id"], b["cluster_id"])).select(["doc_id"]),
        batch_format="pyarrow",
    )
    return exact_unique.select_columns(["doc_id", "n_tokens"]).join(
        reps, join_type="left_semi", num_partitions=n, on=("doc_id",)
    )
