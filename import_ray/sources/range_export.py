"""Range-partitioned, globally-sorted parquet export for serving.

The graph-materialize end state: triples laid out so a server can
answer "all triples of subject S" with ONE manifest lookup + one
bucket file scan (or a row-group binary search) — the Ray-native
analog of the reference's ordered writes into keyed stores
(pipeline/ingestion GraphIngestionPipeline.java:258-316 writes
Node/Edge mutations into Spanner's ordered keyspace; simple/stats/db.py
relies on SQL indexes). No copying of either: here the ordering is the
FILE LAYOUT, the index is a JSON manifest of per-bucket key ranges.

Scale shape:
  1. boundary sampling: per-block deterministic key sample (pure map,
     ~1k keys/block cap) → driver quantile cut into n_buckets-1
     boundaries (sample-sized, row-count independent);
  2. bucket tag: per-batch ``np.searchsorted`` against the broadcast
     boundary array (tiny closure);
  3. ONE keyed exchange on bucket id; per-block lexsort by
     (subject_id, predicate, object_id, object_value);
  4. ``write_parquet(partition_cols=["bucket"])`` → ``bucket=K/`` dirs;
  5. ``range_manifest.json``: per-bucket [min_key, max_key], row count
     — buckets are disjoint, contiguous, globally ordered.

Sampling gives ±ε balanced buckets, not perfect ones; a hot subject
never splits across buckets (searchsorted is deterministic), which is
exactly the per-subject locality serving needs.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa


def _sample_keys(batch: pa.Table, key: str, cap: int = 1024) -> pa.Table:
    keys = batch[key].to_numpy(zero_copy_only=False).astype(object)
    if len(keys) > cap:
        # deterministic stride sample — order-insensitive enough for
        # quantile boundaries, no RNG (resume/replay stable)
        idx = np.linspace(0, len(keys) - 1, cap).astype(np.int64)
        keys = keys[idx]
    return pa.table({key: pa.array(keys.astype(str))})


def compute_boundaries(ds, key: str = "subject_id", n_buckets: int = 16) -> np.ndarray:
    """(n_buckets-1) sorted upper-exclusive boundary keys from a
    per-block sample (driver holds only the sample)."""
    samp = ds.map_batches(
        lambda b: _sample_keys(b, key), batch_format="pyarrow"
    ).to_pandas()
    keys = np.sort(samp[key].to_numpy(dtype=object))
    if len(keys) == 0 or n_buckets <= 1:
        return np.array([], dtype=object)
    qs = (np.arange(1, n_buckets) * len(keys)) // n_buckets
    return np.unique(keys[qs])


def write_sorted_triples(
    ds,
    out_dir: str,
    key: str = "subject_id",
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
):
    """Export ``ds`` as globally-ordered ``bucket=K/`` parquet dirs +
    ``range_manifest.json``. Returns the manifest dict."""
    boundaries = compute_boundaries(ds, key=key, n_buckets=n_buckets)
    cols = sort_cols or [key, "predicate", "object_id", "object_value"]

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[key].to_numpy(zero_copy_only=False).astype(str)
        b = np.searchsorted(boundaries, keys, side="right").astype(np.int32)
        return batch.append_column("bucket", pa.array(b, pa.int32()))

    def sort_block(batch: pa.Table) -> pa.Table:
        present = [c for c in cols if c in batch.column_names]
        return batch.sort_by([(c, "ascending") for c in present])

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    tagged = ds.map_batches(tag, batch_format="pyarrow")
    ordered = tagged.repartition(
        max(int(len(boundaries)) + 1, 1), keys=["bucket"]
    ).map_batches(sort_block, batch_format="pyarrow", batch_size=None)
    ordered.write_parquet(out_dir, partition_cols=["bucket"])

    # manifest from the written files (ground truth, not the plan)
    import pyarrow.dataset as pads

    buckets = {}
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("bucket="):
            continue
        bid = int(name.split("=", 1)[1])
        d = pads.dataset(os.path.join(out_dir, name), format="parquet")
        t = d.to_table(columns=[key])
        ks = np.sort(t[key].to_numpy(zero_copy_only=False).astype(str))
        buckets[bid] = {
            "min_key": str(ks[0]) if len(ks) else None,
            "max_key": str(ks[-1]) if len(ks) else None,
            "rows": int(len(ks)),
        }
    manifest = {
        "key": key,
        "n_buckets": int(len(boundaries)) + 1,
        "boundaries": [str(b) for b in boundaries],
        "buckets": buckets,
    }
    with open(os.path.join(out_dir, "range_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def lookup_bucket(manifest: dict, key_value: str) -> int:
    """Which bucket dir holds ``key_value`` — one searchsorted over the
    manifest's boundary list (what a server does per request)."""
    boundaries = np.array(manifest["boundaries"], dtype=object)
    return int(np.searchsorted(boundaries, key_value, side="right"))


def read_subject(out_dir: str, subject: str) -> pa.Table:
    """Point lookup: manifest → one bucket dir → predicate filter scan."""
    import pyarrow.dataset as pads

    with open(os.path.join(out_dir, "range_manifest.json")) as f:
        manifest = json.load(f)
    bid = lookup_bucket(manifest, subject)
    path = os.path.join(out_dir, f"bucket={bid}")
    if not os.path.isdir(path):
        return None
    d = pads.dataset(path, format="parquet")
    import pyarrow.compute as pc

    return d.to_table(filter=pc.equal(pc.field(manifest["key"]), subject))
