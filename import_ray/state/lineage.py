"""Per-partition lineage manifests + checkpoint-based resume.

The reference has no checkpointing (SURVEY.md §4 — blue/green rebuild
instead); the north rule requires it. Design:

- A job is split into **input shards** (groups of input files). Each
  shard runs as its own bounded Dataset pipeline and writes to
  ``<out_dir>/shard=<id>/`` ATOMICALLY (write to ``_tmp-<id>``, fsync,
  rename).
- ``manifest.jsonl`` in the output dir records one line per completed
  shard: shard id, input files, an input fingerprint (path, size,
  mtime), row count, wall seconds, finish timestamp.
- On rerun, shards whose manifest entry matches the current input
  fingerprint are SKIPPED; changed/missing shards are (re)built.

At 100 TB this bounds lost work on failure to one shard, keeps the
output partitioned for downstream readers, and makes lineage auditable
(which inputs produced which partition, with counts).
"""

from __future__ import annotations

import json
import os
import shutil
import time


def input_fingerprint(paths: list[str]) -> str:
    parts = []
    for p in sorted(paths):
        st = os.stat(p)
        parts.append(f"{p}:{st.st_size}:{int(st.st_mtime)}")
    from import_ray.functions.farmhash import fingerprint64

    return format(fingerprint64("|".join(parts)), "016x")


def load_manifest(out_dir: str) -> dict[str, dict]:
    path = os.path.join(out_dir, "manifest.jsonl")
    entries: dict[str, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    e = json.loads(line)
                    entries[e["shard_id"]] = e
    return entries


def append_manifest(out_dir: str, entry: dict) -> None:
    path = os.path.join(out_dir, "manifest.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(entry, sort_keys=True) + "\n")
        f.flush()
        os.fsync(f.fileno())


def shard_inputs(files: list[str], shard_size: int) -> list[list[str]]:
    files = sorted(files)
    return [files[i : i + shard_size] for i in range(0, len(files), shard_size)]


def run_resumable(
    input_files: list[str],
    out_dir: str,
    build_fn,
    shard_size: int = 4,
    write_kwargs: dict | None = None,
    extra_fingerprint: str = "",
) -> dict:
    """Run ``build_fn(files) -> Dataset`` per input shard, resumably.

    ``extra_fingerprint`` must encode every behavior-affecting option of
    ``build_fn`` — a rerun with changed options rebuilds rather than
    silently reusing stale shards.

    Returns a summary: shards total/skipped/built, rows built.
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest = load_manifest(out_dir)
    shards = shard_inputs(input_files, shard_size)
    summary = {"shards": len(shards), "skipped": 0, "built": 0, "rows_built": 0}
    for idx, files in enumerate(shards):
        shard_id = f"{idx:05d}"
        fp = input_fingerprint(files)
        if extra_fingerprint:
            fp = fp + ":" + extra_fingerprint
        final_dir = os.path.join(out_dir, f"shard={shard_id}")
        prev = manifest.get(shard_id)
        if prev and prev.get("fingerprint") == fp and os.path.isdir(final_dir):
            summary["skipped"] += 1
            continue
        tmp_dir = os.path.join(out_dir, f"_tmp-{shard_id}")
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)
        if os.path.isdir(final_dir):
            shutil.rmtree(final_dir)
        t0 = time.time()
        ds = build_fn(files)
        ds.write_parquet(tmp_dir, **(write_kwargs or {}))
        n_rows = _count_parquet_rows(tmp_dir)
        os.rename(tmp_dir, final_dir)
        append_manifest(
            out_dir,
            {
                "shard_id": shard_id,
                "inputs": sorted(files),
                "fingerprint": fp,
                "rows": n_rows,
                "wall_sec": round(time.time() - t0, 3),
                "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            },
        )
        summary["built"] += 1
        summary["rows_built"] += n_rows
    return summary


def manifest_fingerprint(out_dir: str) -> str:
    """Fingerprint of a completed shard manifest — the upstream-lineage
    key for a GLOBAL stage: any shard rebuild (new inputs, changed
    fingerprint, different row count) changes it, forcing downstream
    global stages to rebuild."""
    entries = load_manifest(out_dir)
    parts = [
        f"{sid}:{e.get('fingerprint')}:{e.get('rows')}"
        for sid, e in sorted(entries.items())
    ]
    from import_ray.functions.farmhash import fingerprint64

    return format(fingerprint64("|".join(parts)), "016x")


def run_stage(stage_dir: str, fingerprint: str, build_fn) -> dict:
    """Checkpoint a GLOBAL (non-shardable) stage: if ``stage_dir`` was
    completed under the same upstream ``fingerprint``, skip; else build
    into a tmp dir via ``build_fn(tmp_dir) -> rows`` and atomically
    rename. Complements ``run_resumable`` for stages whose semantics
    are corpus-wide (global dedup keep-sets, final joins) and therefore
    cannot be resumed shard-by-shard.
    """
    marker = os.path.join(stage_dir, "_stage.json")
    if os.path.isdir(stage_dir) and os.path.exists(marker):
        try:
            with open(marker) as f:
                prev = json.load(f)
            if prev.get("fingerprint") == fingerprint:
                return {"built": 0, "skipped": 1, "rows": prev.get("rows", 0)}
        except (json.JSONDecodeError, OSError):
            pass
    tmp_dir = stage_dir.rstrip("/") + "._tmp"
    for d in (tmp_dir, stage_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)
    os.makedirs(tmp_dir)
    t0 = time.time()
    rows = build_fn(tmp_dir)
    with open(os.path.join(tmp_dir, "_stage.json"), "w") as f:
        json.dump(
            {
                "fingerprint": fingerprint,
                "rows": rows,
                "wall_sec": round(time.time() - t0, 3),
                "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            },
            f,
            sort_keys=True,
        )
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp_dir, stage_dir)
    return {"built": 1, "skipped": 0, "rows": rows}


def _count_parquet_rows(d: str) -> int:
    import pyarrow.parquet as pq

    total = 0
    for root, _, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, f)).num_rows
    return total
