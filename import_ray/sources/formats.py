"""Columnar / row file-format sources and sinks beyond Parquet.

A user of the reference feeds it CSV/TSV, MCF, TMCF and JSON; real
lakehouse estates also carry ORC, Arrow IPC (Feather) and JSONL. Ray
Data ships parquet/csv/json readers natively; this module adds the
rest, Ray-Data-first:

- ``read_orc`` / ``read_feather``: one read TASK per file via
  ``read_binary_files`` → a decode ``map_batches`` (pyarrow.orc /
  pyarrow.ipc do the column decode). Parallelism is per-file — the
  right grain for the many-file layouts these formats ship in; a
  single giant ORC file is decoded by one task (documented, like
  Ray's own single-file CSV behavior), so keep files shard-sized.
- ``read_jsonl``: Ray's native ``read_json`` (newline-delimited).
- ``write_orc`` / ``write_feather`` / ``write_jsonl``: one file per
  block via ``map_batches``, named by the block's CONTENT HASH — a
  re-run of the same data overwrites the same file names, so the sink
  is idempotent/resumable like the parquet writers (never one giant
  file).

Decode kernels run on workers; the driver never holds file bytes.
"""

from __future__ import annotations

import io
import os

import numpy as np
import pyarrow as pa


def _decode_file_batch(batch: pa.Table, fmt: str) -> pa.Table:
    """Decode whole format files carried as binary rows into one table."""
    import pyarrow.feather as feather
    import pyarrow.orc as orc

    tables = []
    for buf in batch["bytes"].to_pylist():
        bio = io.BytesIO(buf)
        if fmt == "orc":
            tables.append(orc.ORCFile(bio).read())
        else:
            tables.append(feather.read_table(bio))
    if not tables:
        return pa.table({})
    out = pa.concat_tables(tables, promote_options="default")
    # embedded pandas metadata defeats Ray's schema-dedup hash
    return out.replace_schema_metadata(None)


def read_orc(paths):
    """ORC files → Dataset (one decode task per file)."""
    import ray.data

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(
        lambda b: _decode_file_batch(b, "orc"), batch_format="pyarrow"
    )


def read_feather(paths):
    """Arrow IPC / Feather files → Dataset (one decode task per file)."""
    import ray.data

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(
        lambda b: _decode_file_batch(b, "feather"), batch_format="pyarrow"
    )


def read_jsonl(paths):
    """Newline-delimited JSON → Dataset (Ray-native reader)."""
    import ray.data

    return ray.data.read_json(paths)


def _content_name(batch: pa.Table) -> str:
    """Deterministic file stem from the block's content (idempotent
    re-runs overwrite the same names instead of accumulating files)."""
    import hashlib

    h = hashlib.sha256()
    for col in batch.columns:
        for chunk in col.chunks if isinstance(col, pa.ChunkedArray) else [col]:
            for buf in chunk.buffers():
                if buf is not None:
                    h.update(buf)
    return h.hexdigest()[:20]


def _write_blocks(ds, out_dir: str, ext: str, write_one) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"path": pa.array([], pa.large_string())})
        path = os.path.join(out_dir, f"part-{_content_name(batch)}.{ext}")
        write_one(batch, path)
        return pa.table({"path": pa.array([path], pa.large_string())})

    out = ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)
    return sorted(r["path"] for r in out.take_all())


def write_orc(ds, out_dir: str) -> list[str]:
    """Dataset → one ORC file per block (content-hash names)."""

    def one(batch: pa.Table, path: str):
        import pyarrow.orc as orc

        orc.write_table(batch.replace_schema_metadata(None), path)

    return _write_blocks(ds, out_dir, "orc", one)


def write_feather(ds, out_dir: str) -> list[str]:
    """Dataset → one Arrow IPC (Feather v2) file per block."""

    def one(batch: pa.Table, path: str):
        import pyarrow.feather as feather

        feather.write_feather(batch.replace_schema_metadata(None), path)

    return _write_blocks(ds, out_dir, "feather", one)


def write_jsonl(ds, out_dir: str) -> list[str]:
    """Dataset → one JSONL file per block (UTF-8, one object per row)."""

    def one(batch: pa.Table, path: str):
        import json

        with open(path, "w", encoding="utf-8") as f:
            for row in batch.to_pylist():
                f.write(json.dumps(row, default=str) + "\n")

    return _write_blocks(ds, out_dir, "jsonl", one)


_EXT_READERS = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "jsonl",
    ".jsonl": "jsonl",
    ".ndjson": "jsonl",
    ".orc": "orc",
    ".feather": "feather",
    ".arrow": "feather",
    ".ipc": "feather",
}


def read_table_auto(path):
    """Extension-sniffing table reader over any supported format.

    Accepts a file or a directory of same-format files (the first
    recognized extension wins for a directory)."""
    import glob as _glob

    import ray.data

    probe = path
    if os.path.isdir(path):
        files = sorted(
            f
            for f in _glob.glob(os.path.join(path, "*"))
            if os.path.splitext(f)[1].lower() in _EXT_READERS
        )
        if not files:
            raise ValueError(f"no recognized table files under {path!r}")
        probe = files[0]
    fmt = _EXT_READERS.get(os.path.splitext(probe)[1].lower())
    if fmt is None:
        raise ValueError(f"unrecognized table extension: {probe!r}")
    if fmt == "parquet":
        return ray.data.read_parquet(path)
    if fmt == "csv":
        return ray.data.read_csv(path)
    if fmt == "jsonl":
        return read_jsonl(path)
    if fmt == "orc":
        return read_orc(path)
    return read_feather(path)
