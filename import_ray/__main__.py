"""``python -m import_ray`` — the dc-import-style CLI surface
(tool/.../Main.java:29-168 lint/genmcf verbs + the Simple importer's
``python3 -m stats.main`` run, SURVEY §2.12), on Ray Data.

Subcommands:
  lint FILE...            sanity + local-resolution counters → report.json
  genmcf TMCF CSV         resolved node rows → partitioned parquet + report
  simple-import INPUT_DIR config.json-driven import → observations/triples
                          parquet + SVG hierarchy + NL artifacts + report;
                          --mode customdc|schemaupdate|maindc, --write-db
                          for the Custom-DC sqlite artifact

Owns the Ray session (guarded init, shutdown on exit) — library code
never calls ray.init().
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray():
    import ray

    if not ray.is_initialized():
        # under `ray job submit` the runtime sets RAY_ADDRESS and init
        # attaches to the cluster; standalone runs default to local mode
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    return ray


def cmd_lint(args) -> int:
    from import_ray.pipelines.lint import lint_files

    os.makedirs(args.output_dir, exist_ok=True)
    report = os.path.join(args.output_dir, "report.json")
    counters = lint_files(sorted(args.files), report_path=report)
    print(f"lint: wrote {report}")
    for (level, counter), n in sorted(counters.counts.items()):
        print(f"  {level} {counter} {n}")
    return 1 if counters.level_counters("LEVEL_FATAL") else 0


def cmd_genmcf(args) -> int:
    from import_ray.pipelines.genmcf import genmcf_run

    os.makedirs(args.output_dir, exist_ok=True)
    nodes_dir = os.path.join(args.output_dir, "nodes")
    report = os.path.join(args.output_dir, "report.json")
    nodes, counters = genmcf_run(
        args.tmcf, args.csv, nodes_dir, report_path=report
    )
    print(f"genmcf: {nodes.count()} node rows → {nodes_dir}; report → {report}")
    return 1 if counters.level_counters("LEVEL_FATAL") else 0


def cmd_simple_import(args) -> int:
    from import_ray.pipelines.simple_runner import run_simple_import

    config = None
    if args.config:
        with open(args.config) as f:
            config = json.load(f)
    artifacts = run_simple_import(
        args.input_dir,
        args.output_dir,
        config=config,
        mode=args.mode,
        write_db=args.write_db,
    )
    for name, value in artifacts.items():
        if isinstance(value, str):
            print(f"{name}: {value}")
    return 0


def cmd_kg_job(args) -> int:
    """The north-star flagship as a submittable job: transcripts →
    canonical triples in ``<out>/shard=*/part_key=*/`` with per-shard
    lineage manifests; a rerun resumes (skips finished shards). On a
    cluster: ``ray job submit --working-dir . -- python -m import_ray
    kg-job --input ... --output-dir ...`` (the entrypoint attaches via
    RAY_ADDRESS; nothing else changes)."""
    from import_ray.pipelines.kg import run_kg_job

    summary = run_kg_job(
        args.input,
        args.output_dir,
        shard_size=args.shard_size,
        n_buckets=args.n_buckets,
    )
    print(json.dumps(summary, sort_keys=True))
    return 0


def cmd_corpus_job(args) -> int:
    """Resumable corpus cleaning (filter → exact dedup → optional
    MinHash near-dup) with stage-level checkpoints; same ``ray job
    submit`` shape as kg-job."""
    from import_ray.pipelines.corpus import run_corpus_job

    summary = run_corpus_job(
        args.input,
        args.output_dir,
        neardup=args.neardup,
        shard_size=args.shard_size,
        n_buckets=args.n_buckets,
    )
    print(json.dumps(summary, sort_keys=True))
    return 0


def cmd_graph_job(args) -> int:
    """Graph analysis over canonical triples with per-stage lineage
    checkpoints (edges → components → optional pagerank)."""
    from import_ray.pipelines.graph_job import run_graph_job

    summary = run_graph_job(
        args.input,
        args.output_dir,
        max_object_degree=args.max_object_degree,
        pagerank=args.pagerank,
        pagerank_iterations=args.pagerank_iterations,
    )
    print(json.dumps(summary, sort_keys=True))
    return 0


def cmd_similarity_job(args) -> int:
    """Embedding near-dup pairs + cluster labels with per-stage lineage
    checkpoints."""
    from import_ray.pipelines.graph_job import run_similarity_job

    summary = run_similarity_job(
        args.input,
        args.output_dir,
        threshold=args.threshold,
        bands=args.bands,
    )
    print(json.dumps(summary, sort_keys=True))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="import_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    lint = sub.add_parser("lint", help="sanity-check MCF/TMCF/CSV inputs")
    lint.add_argument("files", nargs="+")
    lint.add_argument("--output-dir", default="/tmp/import_ray_lint")
    lint.set_defaults(fn=cmd_lint)

    gen = sub.add_parser("genmcf", help="TMCF+CSV → resolved node parquet")
    gen.add_argument("tmcf")
    gen.add_argument("csv")
    gen.add_argument("--output-dir", default="/tmp/import_ray_genmcf")
    gen.set_defaults(fn=cmd_genmcf)

    simp = sub.add_parser(
        "simple-import", help="config.json-driven import (Simple importer)"
    )
    simp.add_argument("input_dir")
    simp.add_argument("--output-dir", default="/tmp/import_ray_simple")
    simp.add_argument("--config", default=None)
    simp.add_argument(
        "--mode",
        default="customdc",
        choices=["customdc", "schemaupdate", "maindc", "dcpbridge"],
        help="runner mode (RunMode, runner.py:79-83)",
    )
    simp.add_argument(
        "--write-db",
        action="store_true",
        help="also emit the Custom-DC sqlite artifact (datacommons.db)",
    )
    simp.set_defaults(fn=cmd_simple_import)

    kg = sub.add_parser(
        "kg-job",
        help="transcripts → canonical triples, resumable (ray job submit entrypoint)",
    )
    kg.add_argument("--input", required=True, help="transcripts parquet file or dir")
    kg.add_argument("--output-dir", default="/tmp/import_ray_kg")
    kg.add_argument("--shard-size", type=int, default=8)
    kg.add_argument("--n-buckets", type=int, default=64)
    kg.set_defaults(fn=cmd_kg_job)

    corp = sub.add_parser(
        "corpus-job",
        help="documents → cleaned corpus, resumable stage checkpoints",
    )
    corp.add_argument("--input", required=True, help="documents parquet file or dir")
    corp.add_argument("--output-dir", default="/tmp/import_ray_corpus")
    corp.add_argument("--neardup", action="store_true")
    corp.add_argument("--shard-size", type=int, default=4)
    corp.add_argument("--n-buckets", type=int, default=16)
    corp.set_defaults(fn=cmd_corpus_job)

    gj = sub.add_parser(
        "graph-job",
        help="triples → entity edges/components/pagerank, stage-checkpointed",
    )
    gj.add_argument("--input", required=True, help="triples parquet file or dir")
    gj.add_argument("--output-dir", default="/tmp/import_ray_graph")
    gj.add_argument("--max-object-degree", type=int, default=None)
    gj.add_argument("--pagerank", action="store_true")
    gj.add_argument("--pagerank-iterations", type=int, default=10)
    gj.set_defaults(fn=cmd_graph_job)

    sj = sub.add_parser(
        "similarity-job",
        help="embeddings → near-dup pairs + clusters, stage-checkpointed",
    )
    sj.add_argument("--input", required=True, help="embeddings parquet file or dir")
    sj.add_argument("--output-dir", default="/tmp/import_ray_similarity")
    sj.add_argument("--threshold", type=float, default=0.95)
    sj.add_argument("--bands", type=int, default=16)
    sj.set_defaults(fn=cmd_similarity_job)

    args = p.parse_args(argv)
    ray = _init_ray()
    try:
        return args.fn(args)
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
