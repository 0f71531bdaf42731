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


def _read_doc_files(files):
    import ray.data

    from import_ray.core.context import configure_data_context

    configure_data_context()
    ds = ray.data.read_parquet(list(files), columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
    )


def run_corpus_job(
    input_path: str,
    out_dir: str,
    min_tokens: int = 20,
    max_tokens: int = 2000,
    min_distinct_ratio_micro: int = 300_000,
    neardup: bool = False,
    neardup_threshold: float = 0.7,
    shard_size: int = 4,
    n_buckets: int = 16,
) -> dict:
    """Resumable end-to-end corpus cleaning with stage-level checkpoints.

    Global dedup cannot be resumed shard-by-shard (duplicates cross
    shard boundaries), so the job splits at semantic boundaries:

    1. ``stats/shard=*``  — per-input-shard, embarrassingly parallel and
       resumable (``run_resumable``): tokenize + quality filter + 128-bit
       content keys → (doc_id, h1, h2, n_tokens). This is the expensive
       stage (reads every byte of text); a rerun skips finished shards.
    2. ``keep/``  — GLOBAL: min-doc_id per content hash over the key
       rows (28 B/row — bodies never move), optionally followed by
       MinHash near-dup cluster representatives. Checkpointed against a
       fingerprint of the stage-1 manifest + parameters
       (``run_stage``): any shard rebuild forces a keep rebuild.
    3. ``clean/part_key=*`` — GLOBAL: stats ⋈ keep semi-join →
       surviving (doc_id, n_tokens), hash-bucketed parquet.

    Returns a per-stage summary. Output layout is auditable lineage:
    which input files fed which stats shard (manifest.jsonl), and which
    stage fingerprints produced keep/clean (_stage.json).
    """
    import glob as _glob
    import os

    import pyarrow.compute as pc
    import ray.data

    from import_ray.core.context import (
        data_nparts,
        ensure_hash_shuffle,
    )
    from import_ray.state.lineage import (
        manifest_fingerprint,
        run_resumable,
        run_stage,
        _count_parquet_rows,
    )

    if os.path.isdir(input_path):
        files = sorted(_glob.glob(os.path.join(input_path, "*.parquet")))
    else:
        files = [input_path]

    stats_dir = os.path.join(out_dir, "stats")
    keep_dir = os.path.join(out_dir, "keep")
    clean_dir = os.path.join(out_dir, "clean")

    def build_stats(shard_files):
        def kernel(batch: pa.Table) -> pa.Table:
            out = _stats_filter(
                batch, min_tokens, max_tokens, min_distinct_ratio_micro
            )
            keys = _content_keys(out)
            return keys.append_column("n_tokens", out["n_tokens"])

        return _read_doc_files(shard_files).map_batches(
            kernel, batch_format="pyarrow"
        )

    stats_summary = run_resumable(
        files,
        stats_dir,
        build_stats,
        shard_size=shard_size,
        extra_fingerprint=(
            f"{min_tokens}:{max_tokens}:{min_distinct_ratio_micro}"
        ),
    )

    def stats_ds():
        shards = sorted(
            _glob.glob(
                os.path.join(stats_dir, "shard=*", "**", "*.parquet"),
                recursive=True,
            )
        )
        ds = ray.data.read_parquet(shards)
        return ensure_hash_shuffle(ds)

    params_fp = (
        f"{min_tokens}:{max_tokens}:{min_distinct_ratio_micro}:"
        f"{neardup}:{neardup_threshold}"
    )
    keep_fp = manifest_fingerprint(stats_dir) + ":" + params_fp

    def build_keep(tmp_dir):
        keys = stats_ds()
        n = data_nparts(keys)

        def block_min(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            keep = df.groupby(["h1", "h2"], sort=False)["doc_id"].min()
            return from_pandas_clean(
                keep.reset_index()[["doc_id"]], preserve_index=False
            )

        exact = keys.repartition(n, keys=["h1", "h2"]).map_batches(
            block_min, batch_format="pyarrow", batch_size=None
        )
        if neardup:
            # near-dup needs text: re-read only the exact-unique docs
            docs = _read_doc_files(files).join(
                exact, join_type="left_semi", num_partitions=n, on=("doc_id",)
            )
            from import_ray.stages.neardup import minhash_dedup

            labels = minhash_dedup(docs, threshold=neardup_threshold)
            exact = labels.map_batches(
                lambda b: b.filter(
                    pc.equal(b["doc_id"], b["cluster_id"])
                ).select(["doc_id"]),
                batch_format="pyarrow",
            )
        exact.write_parquet(tmp_dir)
        return _count_parquet_rows(tmp_dir)

    keep_summary = run_stage(keep_dir, keep_fp, build_keep)

    def build_clean(tmp_dir):
        keys = stats_ds()
        n = data_nparts(keys)
        keep_files = sorted(
            _glob.glob(os.path.join(keep_dir, "**", "*.parquet"), recursive=True)
        )
        keep = ensure_hash_shuffle(ray.data.read_parquet(keep_files))
        out = keys.select_columns(["doc_id", "n_tokens"]).join(
            keep, join_type="left_semi", num_partitions=n, on=("doc_id",)
        )

        def bucket(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            pk = (ids % n_buckets).astype(np.int32)
            return batch.append_column("part_key", pa.array(pk, pa.int32()))

        out.map_batches(bucket, batch_format="pyarrow").write_parquet(
            tmp_dir, partition_cols=["part_key"]
        )
        return _count_parquet_rows(tmp_dir)

    clean_summary = run_stage(clean_dir, keep_fp + f":{n_buckets}", build_clean)

    return {
        "stats": stats_summary,
        "keep": keep_summary,
        "clean": clean_summary,
        "rows_clean": clean_summary["rows"],
    }


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
