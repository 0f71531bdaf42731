"""Resumable graph-analysis and similarity jobs over engine outputs.

Extends the per-family lineage coverage (``state/lineage.py``) from the
kg/corpus/genmcf jobs to the graph and similarity entrypoints: each
global stage (edge extraction, components, pagerank; near-dup pairs,
clusters) checkpoints via ``run_stage`` — a rerun under the same input
fingerprint skips completed stages, and every stage directory is
independently consumable parquet.

Stage DAGs::

  graph-job:       triples ──> edges ──> components
                                  └────> pagerank        (--pagerank)
  similarity-job:  embeddings ──> pairs ──> clusters

Fingerprints chain: each downstream stage's fingerprint folds in its
upstream stage's fingerprint plus its own options, so changing an
option (or any input file) rebuilds exactly the affected suffix of the
DAG.
"""

from __future__ import annotations

import glob
import os

import numpy as np  # noqa: F401 - vectorized kernels in stage closures
import pyarrow as pa
import pyarrow.parquet as pq


def _parquet_rows(d: str) -> int:
    return sum(
        pq.read_metadata(p).num_rows
        for p in glob.glob(os.path.join(d, "*.parquet"))
    )


def _input_files(input_path: str) -> list[str]:
    if os.path.isdir(input_path):
        files = sorted(glob.glob(os.path.join(input_path, "**", "*.parquet"),
                                 recursive=True))
    else:
        files = [input_path]
    if not files:
        raise FileNotFoundError(f"no parquet inputs under {input_path!r}")
    return files


def run_graph_job(
    input_path: str,
    out_dir: str,
    max_object_degree: int | None = None,
    pagerank: bool = False,
    pagerank_iterations: int = 10,
    max_rounds: int = 25,
) -> dict:
    """Triples parquet → entity edges → connected components
    (+ optional PageRank), stage-checkpointed under ``out_dir``."""
    import ray.data

    from import_ray.core.context import configure_data_context
    from import_ray.functions.farmhash import fingerprint64
    from import_ray.stages.graph import connected_components, entity_edges
    from import_ray.state.lineage import input_fingerprint, run_stage

    configure_data_context()
    files = _input_files(input_path)
    fp_in = input_fingerprint(files)
    os.makedirs(out_dir, exist_ok=True)

    edges_dir = os.path.join(out_dir, "edges")
    fp_edges = format(
        fingerprint64(f"{fp_in}|deg={max_object_degree}"), "016x"
    )

    def build_edges(tmp_dir: str) -> int:
        ds = ray.data.read_parquet(files, columns=["subject_id", "object_id"])
        edges = entity_edges(ds, max_object_degree=max_object_degree)
        edges.write_parquet(tmp_dir)
        return _parquet_rows(tmp_dir)

    s_edges = run_stage(edges_dir, fp_edges, build_edges)

    comp_dir = os.path.join(out_dir, "components")
    fp_comp = format(fingerprint64(f"{fp_edges}|rounds={max_rounds}"), "016x")

    def build_components(tmp_dir: str) -> int:
        edges = ray.data.read_parquet(edges_dir)
        labels = connected_components(edges, max_rounds=max_rounds)
        labels.write_parquet(tmp_dir)
        return _parquet_rows(tmp_dir)

    s_comp = run_stage(comp_dir, fp_comp, build_components)

    summary = {
        "edges": s_edges,
        "components": s_comp,
        "fingerprint": fp_in,
        "out_dir": out_dir,
    }
    if pagerank:
        from import_ray.stages.graph import pagerank as pagerank_stage

        pr_dir = os.path.join(out_dir, "pagerank")
        fp_pr = format(
            fingerprint64(f"{fp_edges}|iters={pagerank_iterations}"), "016x"
        )

        def build_pagerank(tmp_dir: str) -> int:
            edges = ray.data.read_parquet(edges_dir)
            ranks = pagerank_stage(edges, iterations=pagerank_iterations)
            ranks.write_parquet(tmp_dir)
            return _parquet_rows(tmp_dir)

        summary["pagerank"] = run_stage(pr_dir, fp_pr, build_pagerank)
    return summary


def run_similarity_job(
    input_path: str,
    out_dir: str,
    threshold: float = 0.95,
    bands: int = 16,
) -> dict:
    """Embeddings parquet (vec_id, embedding) → LSH near-dup pairs →
    cluster labels, stage-checkpointed under ``out_dir``."""
    import ray.data

    from import_ray.core.context import configure_data_context
    from import_ray.functions.farmhash import fingerprint64
    from import_ray.stages.neardup import label_clusters
    from import_ray.stages.similarity import embedding_neardup_pairs
    from import_ray.state.lineage import input_fingerprint, run_stage

    configure_data_context()
    files = _input_files(input_path)
    fp_in = input_fingerprint(files)
    os.makedirs(out_dir, exist_ok=True)

    pairs_dir = os.path.join(out_dir, "pairs")
    fp_pairs = format(
        fingerprint64(f"{fp_in}|t={threshold}|b={bands}"), "016x"
    )

    def build_pairs(tmp_dir: str) -> int:
        ds = ray.data.read_parquet(files, columns=["vec_id", "embedding"])
        pairs = embedding_neardup_pairs(ds, threshold=threshold, bands=bands)
        pairs.write_parquet(tmp_dir)
        return _parquet_rows(tmp_dir)

    s_pairs = run_stage(pairs_dir, fp_pairs, build_pairs)

    clusters_dir = os.path.join(out_dir, "clusters")
    fp_clusters = format(fingerprint64(f"{fp_pairs}|clusters"), "016x")

    def build_clusters(tmp_dir: str) -> int:
        import pyarrow.compute as pc

        ids = ray.data.read_parquet(files, columns=["vec_id"]).map_batches(
            lambda b: pa.table({"vec_id": pc.cast(b["vec_id"], pa.int64())}),
            batch_format="pyarrow",
        )
        pair_files = glob.glob(os.path.join(pairs_dir, "*.parquet"))
        if pair_files and _parquet_rows(pairs_dir):
            pairs = (
                ray.data.read_parquet(pair_files)
                .map_batches(
                    lambda b: pa.table(
                        {
                            "doc_lo": pc.cast(b["vec_lo"], pa.int64()),
                            "doc_hi": pc.cast(b["vec_hi"], pa.int64()),
                        }
                    ),
                    batch_format="pyarrow",
                )
                .materialize()
            )
        else:  # no near-dups found: every id labels itself
            pairs = ray.data.from_arrow(
                pa.table(
                    {
                        "doc_lo": pa.array([], pa.int64()),
                        "doc_hi": pa.array([], pa.int64()),
                    }
                )
            )
        labels = label_clusters(ids, pairs, id_col="vec_id")
        labels.write_parquet(tmp_dir)
        return _parquet_rows(tmp_dir)

    s_clusters = run_stage(clusters_dir, fp_clusters, build_clusters)
    return {
        "pairs": s_pairs,
        "clusters": s_clusters,
        "fingerprint": fp_in,
        "out_dir": out_dir,
    }
