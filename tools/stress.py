"""sf1-scale stress recording (BASELINE.md round-4 section).

Runs the flagship + MinHash near-dup + SemDeDup at ~10-400× the sf0.1
bench inputs on 32 CPUs and records wall seconds, peak driver+cluster
RSS, and object-store spill bytes — evidence the pipelines hold when
working sets approach/exceed memory.

Inputs are synthesized deterministically:
- transcripts: `ensure_transcripts(n_convs=...)` (the bench generator).
- documents: N deterministic token-shuffled copies of the sf0.1
  documents table (per-(copy, doc) seeded shuffles, so cross-copy
  shingle overlap is destroyed and near-dup structure stays
  corpus-local instead of exploding into N-cliques).

Usage: python tools/stress.py [--convs 1920000] [--doc-copies 200]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import resource
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRESS_DOCS_DIR = "/tmp/raydc_stress/documents"


def ensure_stress_documents(copies: int) -> str:
    out_dir = f"{STRESS_DOCS_DIR}_{copies}x"
    if os.path.isdir(out_dir) and glob.glob(os.path.join(out_dir, "*.parquet")):
        return out_dir
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir + ".tmp", exist_ok=True)
    base = pq.read_table("/root/testdata/sf0.1/documents.parquet")
    texts = base["text"].to_pylist()
    ids = base["doc_id"].to_numpy(zero_copy_only=False)
    n_shards = 32
    per_shard = max(1, copies // n_shards + (1 if copies % n_shards else 0))
    shard = 0
    copy_idx = 0
    while copy_idx < copies:
        tables = []
        for k in range(copy_idx, min(copy_idx + per_shard, copies)):
            if k == 0:
                t2 = texts
            else:
                t2 = []
                for j, t in enumerate(texts):
                    rng = np.random.default_rng((k << 20) ^ j)
                    toks = t.split(" ")
                    rng.shuffle(toks)
                    t2.append(" ".join(toks))
            tables.append(
                pa.table(
                    {
                        "doc_id": pa.array(ids + k * 10_000_000, pa.int64()),
                        "text": pa.array(t2, pa.large_string()),
                    }
                )
            )
        pq.write_table(
            pa.concat_tables(tables),
            os.path.join(out_dir + ".tmp", f"part-{shard:05d}.parquet"),
            row_group_size=25_000,
        )
        copy_idx += per_shard
        shard += 1
    os.rename(out_dir + ".tmp", out_dir)
    return out_dir


def ensure_stress_embeddings(copies: int) -> str:
    """N deterministic copies of the sf0.1 embeddings with per-copy
    seeded gaussian perturbation + renormalization (keeps cluster
    geometry, avoids exact duplicates across copies)."""
    out_dir = f"/tmp/raydc_stress/embeddings_{copies}x"
    if os.path.isdir(out_dir) and glob.glob(os.path.join(out_dir, "*.parquet")):
        return out_dir
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir + ".tmp", exist_ok=True)
    base = pq.read_table("/root/testdata/sf0.1/embeddings.parquet")
    ids = base["vec_id"].to_numpy(zero_copy_only=False)
    mat = np.stack([np.asarray(v, np.float32) for v in base["embedding"].to_pylist()])
    n_shards = 32
    per_shard = max(1, copies // n_shards + (1 if copies % n_shards else 0))
    shard = 0
    copy_idx = 0
    dim = mat.shape[1]
    while copy_idx < copies:
        tables = []
        for k in range(copy_idx, min(copy_idx + per_shard, copies)):
            rng = np.random.default_rng(1000 + k)
            m2 = mat + (0.0 if k == 0 else rng.normal(0, 0.05, mat.shape))
            m2 = m2 / np.maximum(np.linalg.norm(m2, axis=1, keepdims=True), 1e-9)
            tables.append(
                pa.table(
                    {
                        "vec_id": pa.array(ids + k * 10_000_000, pa.int64()),
                        "embedding": pa.array(
                            [r.astype(np.float32).tolist() for r in m2],
                            pa.list_(pa.float32()),
                        ),
                    }
                )
            )
        pq.write_table(
            pa.concat_tables(tables),
            os.path.join(out_dir + ".tmp", f"part-{shard:05d}.parquet"),
            row_group_size=25_000,
        )
        copy_idx += per_shard
        shard += 1
    os.rename(out_dir + ".tmp", out_dir)
    return out_dir


def ensure_skewed_transcripts(n_convs: int) -> tuple[str, list]:
    """(uniform_input, skewed_input): the same transcript corpus, plus
    ONE planted mega-conversation holding ~1 % of all turns in the
    skewed copy — real conversation-size skew (the generator's routine
    mega-convs are ~25× the mean; this one is ~20,000×). The skewed
    input exercises the conv-partial pseudo-row path: the mega conv's
    turn rows spread over many read shards, each batch emits one
    bounded partial, and only partials (not raw turns) meet at the
    keyed exchange — wall time must stay within ~1.5× of uniform."""
    from import_ray.sources.transcripts import ensure_transcripts

    uniform = ensure_transcripts("/root/testdata/sf0.1", n_convs=n_convs)
    mega_dir = f"/tmp/raydc_stress/megaconv_{n_convs}"
    if not (os.path.isdir(mega_dir) and glob.glob(os.path.join(mega_dir, "*.parquet"))):
        import numpy as np
        import pyarrow as pa
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        total = pads.dataset(uniform).count_rows()
        mega_turns = max(1000, int(total * 0.0101))
        words = np.array(
            (
                "the quick brown fox jumps over lazy dog data graph node "
                "edge value count place year observation metric state city"
            ).split(),
            dtype=object,
        )
        os.makedirs(mega_dir + ".tmp", exist_ok=True)
        rng = np.random.default_rng(777)
        base_ts = np.datetime64("2025-06-01T00:00:00", "us")
        per_shard = 250_000
        shard = 0
        for start in range(0, mega_turns, per_shard):
            n = min(per_shard, mega_turns - start)
            idx = np.arange(start, start + n, dtype=np.int32)
            toks = words[rng.integers(0, len(words), (n, 12))]
            texts = np.array([" ".join(row) for row in toks], dtype=object)
            roles = np.where(idx % 2 == 0, "user", "assistant").astype(object)
            t = pa.table(
                {
                    "conv_id": pa.array(np.full(n, "megaconv00000001", object)),
                    "turn_idx": pa.array(idx, pa.int32()),
                    "role": pa.array(roles, pa.string()),
                    "text": pa.array(texts, pa.large_string()),
                    "tool": pa.array(np.full(n, "", object), pa.string()),
                    "ts": pa.array(
                        base_ts + (idx.astype("timedelta64[s]") * 30).astype(
                            "timedelta64[us]"
                        ),
                        pa.timestamp("us"),
                    ),
                }
            )
            pq.write_table(
                t,
                os.path.join(mega_dir + ".tmp", f"part-{shard:05d}.parquet"),
                row_group_size=25_000,
            )
            shard += 1
        os.rename(mega_dir + ".tmp", mega_dir)

    def files(p: str) -> list:
        # ray.data.read_parquet treats LIST entries as files, not dirs
        return (
            sorted(glob.glob(os.path.join(p, "*.parquet")))
            if os.path.isdir(p)
            else [p]
        )

    return uniform, files(uniform) + files(mega_dir)


def spill_bytes() -> int:
    total = 0
    for d in glob.glob("/tmp/ray/**/session_*/logs/raylet.out", recursive=True):
        try:
            with open(d, "rb") as f:
                for line in f:
                    if b"Spilled " in line:
                        # "Spilled 1234 MiB, ..."
                        try:
                            mb = int(line.split(b"Spilled ")[1].split(b" MiB")[0])
                            total = max(total, mb)
                        except (ValueError, IndexError):
                            pass
        except OSError:
            pass
    return total


def peak_rss_gb() -> float:
    return round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024 / 1024, 2
    )


def cluster_rss_gb() -> float:
    out = subprocess.run(
        ["ps", "-eo", "rss,comm"], capture_output=True, text=True
    ).stdout
    total = 0
    for line in out.splitlines()[1:]:
        parts = line.split(None, 1)
        if len(parts) == 2 and ("ray" in parts[1] or "python" in parts[1]):
            total += int(parts[0])
    return round(total / 1024 / 1024, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=1_920_000)
    ap.add_argument("--doc-copies", type=int, default=200)
    ap.add_argument(
        "--skip", default="", help="comma list: flagship,minhash,semdedup,skew"
    )
    ap.add_argument("--skew-convs", type=int, default=240_000)
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=32,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    results = {}

    if "flagship" not in skip:
        from import_ray.pipelines.kg import build_triples
        from import_ray.sources.transcripts import ensure_transcripts

        tx = ensure_transcripts("/root/testdata/sf0.1", n_convs=args.convs)
        t0 = time.time()
        n = build_triples(tx, dedup_strategy="broadcast").count()
        results["flagship"] = {
            "convs": args.convs,
            "triples": n,
            "wall_sec": round(time.time() - t0, 1),
            "triples_per_sec": round(n / (time.time() - t0)),
            "cluster_rss_gb": cluster_rss_gb(),
            "spill_mb": spill_bytes(),
        }
        print(json.dumps({"flagship": results["flagship"]}), flush=True)

    if "skew" not in skip:
        from import_ray.pipelines.kg import build_triples

        from import_ray.sources.transcripts import ensure_transcripts

        uniform, skewed = ensure_skewed_transcripts(args.skew_convs)
        # warm pass at small scale (worker + aggregator-pool spin-up),
        # then uniform vs skewed back-to-back under the same conditions
        build_triples(
            ensure_transcripts("/root/testdata/sf0.001"),
            dedup_strategy="broadcast",
        ).count()
        t0 = time.time()
        n_u = build_triples(uniform, dedup_strategy="broadcast").count()
        wall_u = time.time() - t0
        t0 = time.time()
        n_s = build_triples(skewed, dedup_strategy="broadcast").count()
        wall_s = time.time() - t0
        results["skew"] = {
            "convs": args.skew_convs,
            "uniform_triples": n_u,
            "uniform_wall_sec": round(wall_u, 1),
            "skewed_triples": n_s,
            "skewed_wall_sec": round(wall_s, 1),
            "mega_turn_share": 0.01,
            "wall_ratio": round(wall_s / wall_u, 3),
            "cluster_rss_gb": cluster_rss_gb(),
            "spill_mb": spill_bytes(),
        }
        print(json.dumps({"skew": results["skew"]}), flush=True)

    docs_dir = ensure_stress_documents(args.doc_copies)

    if "minhash" not in skip:
        from import_ray.stages.neardup import minhash_dedup

        ds = ray.data.read_parquet(docs_dir)
        t0 = time.time()
        kept = minhash_dedup(ds).count()
        results["minhash"] = {
            "docs": args.doc_copies * 5000,
            "kept": kept,
            "wall_sec": round(time.time() - t0, 1),
            "cluster_rss_gb": cluster_rss_gb(),
            "spill_mb": spill_bytes(),
        }
        print(json.dumps({"minhash": results["minhash"]}), flush=True)

    if "semdedup" not in skip:
        from import_ray.stages.semdedup import semdedup

        emb_dir = ensure_stress_embeddings(args.doc_copies)
        ds = ray.data.read_parquet(emb_dir)
        t0 = time.time()
        # k scales with N (documented contract)
        out = semdedup(ds, k=max(64, args.doc_copies)).count()
        results["semdedup"] = {
            "vecs": args.doc_copies * 2000,
            "rows": out,
            "wall_sec": round(time.time() - t0, 1),
            "cluster_rss_gb": cluster_rss_gb(),
            "spill_mb": spill_bytes(),
        }
        print(json.dumps({"semdedup": results["semdedup"]}), flush=True)

    results["peak_driver_rss_gb"] = peak_rss_gb()
    print(json.dumps({"stress": results}, sort_keys=True), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
