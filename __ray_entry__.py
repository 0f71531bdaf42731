"""Driver contract for the graft builder (Ray Data target).

``entry()``: flagship transcripts→triples KG pipeline on sf0.001-scale
deterministic synthetic transcripts (BASELINE input_hint shape).
``queries()``/``oracle_sql()``: one entry per implemented operator
family (SURVEY.md §2), checked against DuckDB at sf0.01.

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() here or in the library.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Ray workers import this package by module path; if the driver's cwd is
# not the repo, ship the package by value instead.
def _ensure_worker_importable() -> None:
    try:
        import import_ray

        if os.getcwd() != _REPO:
            from ray import cloudpickle

            cloudpickle.register_pickle_by_value(import_ray)
    except Exception:
        pass


_ensure_worker_importable()



def _read_table(sf_dir: str, table: str, columns=None):
    """Column-pruned parquet read with pandas schema metadata stripped
    (dict-valued metadata defeats Ray's schema-dedup hash on every
    shuffle bundle; metadata-only map, zero-copy)."""
    import ray.data

    from import_ray.core.context import configure_data_context

    configure_data_context()
    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)
    return ds.map_batches(
        lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
    )


def entry() -> Any:
    """Flagship pipeline: deterministic transcripts (derived scale sf0.001)
    → canonical (subject, predicate, object) triples."""
    from import_ray.pipelines.kg import build_triples
    from import_ray.sources.transcripts import ensure_transcripts

    path = ensure_transcripts("/root/testdata/sf0.001")
    return build_triples(path)


def _kg_transcript_triples(sf_dir: str):
    from import_ray.pipelines.kg import build_triples
    from import_ray.sources.transcripts import ensure_transcripts

    return build_triples(ensure_transcripts(sf_dir))


def _kg_predicate_counts(sf_dir: str):
    """Triple fanout per predicate over the flagship KG output."""
    from import_ray.pipelines.kg import build_triples
    from import_ray.sources.transcripts import ensure_transcripts
    from import_ray.stages.graph import predicate_counts

    return predicate_counts(build_triples(ensure_transcripts(sf_dir)))


def _kg_entity_components(sf_dir: str):
    """Connected components of the KG entity-reference graph
    (distributed min-label propagation); returns component sizes."""
    from import_ray.pipelines.kg import build_triples
    from import_ray.sources.transcripts import ensure_transcripts
    from import_ray.stages.graph import component_sizes, entity_edges

    triples = build_triples(ensure_transcripts(sf_dir))
    # hub objects (power-law in-degree) would weld one giant component
    # and inflate propagation rounds — capped per graph.entity_edges
    return component_sizes(entity_edges(triples, max_object_degree=50))


def _kg_pagerank(sf_dir: str):
    """Entity hub scores: distributed PageRank over the KG
    entity-reference graph (per-iteration edges⋈ranks hash join +
    grouped sum, exact dangling redistribution). Returns the top 20
    entities by rank."""
    from import_ray.pipelines.kg import build_triples
    from import_ray.sources.transcripts import ensure_transcripts
    from import_ray.stages.graph import entity_edges, pagerank

    triples = build_triples(ensure_transcripts(sf_dir))
    ranks = pagerank(entity_edges(triples), iterations=5)
    return ranks.sort("rank", descending=True).limit(20)


def _kg_hits(sf_dir: str):
    """Entity hubs & authorities: distributed HITS over the KG
    entity-reference graph (per half-step: edges⋈scores hash join +
    grouped sum + scalar L2 normalization). Returns the top 20
    entities by authority. Parity vs a dense same-semantics iteration
    is pinned in tests/test_graph.py."""
    from import_ray.pipelines.kg import build_triples
    from import_ray.sources.transcripts import ensure_transcripts
    from import_ray.stages.graph import entity_edges, hits

    triples = build_triples(ensure_transcripts(sf_dir))
    scores = hits(entity_edges(triples), iterations=5)
    return scores.sort("authority", descending=True).limit(20)


def _kg_triangles(sf_dir: str):
    """Triangle count over the entity CO-MENTION graph (entities
    sharing a conversation), via degree-oriented wedge closing —
    clique expansion capped per conversation (skew guard, logged)."""
    import pyarrow as pa

    from import_ray.pipelines.kg import build_triples
    from import_ray.sources.transcripts import ensure_transcripts
    from import_ray.stages.graph import co_mention_edges, triangle_count

    triples = build_triples(ensure_transcripts(sf_dir))
    n = triangle_count(co_mention_edges(triples))
    return pa.table({"triangles": pa.array([n], pa.int64())})


def _kg_co_mention_pmi(sf_dir: str):
    """Top entity associations by PMI over conversation co-mentions
    (pair counts + marginal hash joins + block-local partial top-k)."""
    from import_ray.pipelines.kg import build_triples
    from import_ray.sources.transcripts import ensure_transcripts
    from import_ray.stages.graph import co_mention_pmi

    triples = build_triples(ensure_transcripts(sf_dir))
    return co_mention_pmi(triples, min_pairs=2, top_k=50)


def _bpe_merges_docs(sf_dir: str):
    """BPE vocabulary training over the documents corpus: 20 merge
    rules learned on the distinct-word frequency table (per-round
    keyed pair-count exchange + tiny driver argmax; Sennrich-2016
    semantics, deterministic tie-break). Rows-only (iterative)."""
    import ray.data

    from import_ray.core.context import configure_data_context
    from import_ray.stages.bpe import bpe_train

    configure_data_context()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return bpe_train(ds, num_merges=20)


def _bpe_token_counts_docs(sf_dir: str):
    """Apply learned BPE merges to the corpus: per-doc word and
    subword-token counts via a stateful actor pool (rank table +
    word→len cache in __init__, vectorized dictionary-encode batches)."""
    import ray.data

    from import_ray.core.context import configure_data_context
    from import_ray.stages.bpe import bpe_token_counts, bpe_train

    configure_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    merges = bpe_train(ds, num_merges=10)
    return bpe_token_counts(ds, merges).sort("doc_id")


def _minhash_keep_best_docs(sf_dir: str):
    """Quality-aware near-dup canonical selection: one kept doc per
    MinHash-LSH cluster, the (distinct-ratio, length, id) argmax."""
    import ray.data

    from import_ray.core.context import configure_data_context
    from import_ray.stages.neardup import minhash_dedup_keep_best

    configure_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return minhash_dedup_keep_best(ds, threshold=0.7).sort("doc_id")


def _minhash_keep_best_planted(sf_dir: str):
    """Oracle-checkable keep-best fixture. The raw corpus contains
    NATURAL near-dups at 0.7 (LSH structure the oracle can't express),
    so each doc's text is rewritten to a deterministic id-derived form
    (one unique token × 30 — pairwise Jaccard 0) that DuckDB can
    regenerate, then an EXACT copy of every 20th doc is planted at
    doc_id + 1e6. Copies tie their originals on every quality signal,
    so the (distinct_ratio, n_chars, doc_id) argmax keeps the ORIGINAL
    of each {orig, copy} cluster and every other doc as a singleton:
    kept set == originals with cluster_id = doc_id, exactly what the
    oracle states. The full distributed LSH→label→join→argmax path
    still runs."""
    import pyarrow as pa
    import ray.data

    from import_ray.stages.neardup import minhash_dedup_keep_best

    ds = _read_table(sf_dir, "documents", ["doc_id"])

    def plant(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        texts = pa.array(
            [("w" + str(i) + " ") * 30 for i in ids], pa.string()
        )
        texts = pa.compute.utf8_rtrim(texts, characters=" ")
        base = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
        sub = base.filter(pa.array(ids % 20 == 0))
        copies = pa.table(
            {
                "doc_id": pa.array(
                    sub["doc_id"].to_numpy(zero_copy_only=False) + _PLANT_OFFSET
                ),
                "text": sub["text"],
            }
        )
        return pa.concat_tables([base, copies.cast(base.schema)])

    return minhash_dedup_keep_best(
        ds.map_batches(plant, batch_format="pyarrow"), threshold=0.7
    ).sort("doc_id")


def _kg_k_core(sf_dir: str):
    """Dense-subgraph extraction: the 2-core of the entity co-mention
    graph (iterative distributed peeling — keyed degree count + two
    semi-joins per round, 8-byte keys only)."""
    from import_ray.pipelines.kg import build_triples
    from import_ray.sources.transcripts import ensure_transcripts
    from import_ray.stages.graph import co_mention_edges, k_core

    triples = build_triples(ensure_transcripts(sf_dir))
    return k_core(co_mention_edges(triples), k=2).sort("node")


def _kg_k_hop_reach(sf_dir: str):
    """Multi-source k-hop reachability over the entity co-mention graph
    (distributed BFS frontier expansion: per-hop hash join + keyed
    min-hop fold; no driver-side adjacency)."""
    from import_ray.pipelines.kg import build_triples
    from import_ray.sources.transcripts import ensure_transcripts
    from import_ray.stages.graph import co_mention_edges, k_hop_reach

    triples = build_triples(ensure_transcripts(sf_dir))
    return k_hop_reach(co_mention_edges(triples), n_seeds=8, max_hops=3)


def _kg_snapshot_asof(sf_dir: str):
    """Time-travel KG snapshot: triples as of a cutoff timestamp
    (streaming Arrow ts-predicate at the read; conversation aggregates
    recomputed over the truncated turn set)."""
    from import_ray.pipelines.kg import kg_snapshot_asof
    from import_ray.sources.transcripts import ensure_transcripts

    return kg_snapshot_asof(ensure_transcripts(sf_dir))


def _kg_ancestors(sf_dir: str):
    """Distributed transitive ancestor closure (semi-naive recursive-
    CTE plan: per-round delta ⋈ edges hash join + (node, ancestor)
    keyed min fold) over a deterministic decimal hierarchy: child
    p_partkey → parent p_partkey // 10."""
    import pyarrow as pa

    from import_ray.stages.graph import ancestor_closure

    parts = _read_table(sf_dir, "part", ["p_partkey"])

    def edges(b: pa.Table) -> pa.Table:
        import numpy as np

        p = b["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = p[p >= 10]
        return pa.table(
            {"child": pa.array(p), "parent": pa.array(p // 10)}
        )

    return ancestor_closure(parts.map_batches(edges, batch_format="pyarrow"))


KG_ANCESTORS_SQL = """
WITH RECURSIVE edges AS (
  SELECT p_partkey AS child, p_partkey // 10 AS parent
  FROM part WHERE p_partkey >= 10
), anc AS (
  SELECT child AS node, parent AS ancestor, CAST(1 AS BIGINT) AS depth
  FROM edges
  UNION ALL
  SELECT a.node, e.parent, a.depth + 1
  FROM anc a JOIN edges e ON a.ancestor = e.child
)
SELECT node, ancestor, depth FROM anc
"""


def _sssp_parts(sf_dir: str):
    """Weighted multi-source shortest paths (semi-naive distributed
    Bellman-Ford: improved-frontier ⋈ edges per round + node-keyed
    packed-min fold) over a deterministic weighted DAG derived from
    ``part``: p → p//10 (w = p%7+1) and p → p//13 (w = p%5+3); roots
    are nodes < 10."""
    import pyarrow as pa

    from import_ray.stages.graph import weighted_sssp

    parts = _read_table(sf_dir, "part", ["p_partkey"])

    def edges(b: pa.Table) -> pa.Table:
        import numpy as np

        p = b["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = p[p >= 10]
        c = p[p >= 13]
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, c])),
                "dst": pa.array(np.concatenate([a // 10, c // 13])),
                "w": pa.array(np.concatenate([a % 7 + 1, c % 5 + 3])),
            }
        )

    return weighted_sssp(
        parts.map_batches(edges, batch_format="pyarrow"), roots=range(10)
    ).sort("node")


SSSP_PARTS_SQL = """
WITH RECURSIVE e AS (
  SELECT p_partkey AS src, p_partkey // 10 AS dst, p_partkey % 7 + 1 AS w
  FROM part WHERE p_partkey >= 10
  UNION ALL
  SELECT p_partkey, p_partkey // 13, p_partkey % 5 + 3
  FROM part WHERE p_partkey >= 13
), d AS (
  SELECT src AS node, CAST(w AS BIGINT) AS dist FROM e WHERE dst < 10
  UNION ALL
  SELECT e.src, d.dist + e.w FROM d JOIN e ON e.dst = d.node
)
SELECT node, MIN(dist) AS dist FROM d GROUP BY node ORDER BY node
"""


def _conv_reconstruct(sf_dir: str):
    """Ordered conversation reconstruction: per-conv full text joined in
    exact turn_idx order (the per-turn text-equality invariant as an
    operator) — conv-keyed exchange + one vectorized binary_join per
    block."""
    from import_ray.pipelines.kg import reconstruct_conversations
    from import_ray.sources.transcripts import ensure_transcripts

    return reconstruct_conversations(ensure_transcripts(sf_dir))


def _tool_transitions(sf_dir: str):
    """Agent tool-call chain mining: (prev_tool, next_tool) transition
    counts over each conversation's ordered tool-invocation sequence
    (chat turns skipped) — conv-keyed exchange + per-block vectorized
    shift, #tools² driver sum."""
    from import_ray.pipelines.kg import tool_transitions
    from import_ray.sources.transcripts import ensure_transcripts

    return tool_transitions(ensure_transcripts(sf_dir))


def _conv_dedup_exact(sf_dir: str):
    """Conversation-level exact dedup: byte-identical ordered
    (role, text) sequences collapse to the min conv_id (128-bit content
    keys; bodies shuffle once)."""
    from import_ray.pipelines.kg import conv_dedup_exact
    from import_ray.sources.transcripts import ensure_transcripts

    return conv_dedup_exact(ensure_transcripts(sf_dir))


def _kg_communities(sf_dir: str):
    """Community detection over the entity co-mention graph: synchronous
    distributed label propagation (per-round labels⋈edges hash join +
    (node,label) keyed count + block-local argmax; deterministic
    min-label tie-break)."""
    from import_ray.pipelines.kg import build_triples
    from import_ray.sources.transcripts import ensure_transcripts
    from import_ray.stages.graph import co_mention_edges, label_propagation

    triples = build_triples(ensure_transcripts(sf_dir))
    return label_propagation(co_mention_edges(triples), max_rounds=6).sort("node")


def _kg_adamic_adar(sf_dir: str):
    """Link prediction: top non-adjacent entity pairs by Adamic-Adar
    score over the co-mention graph (keyed wedge emission + grouped
    sum + anti join against existing edges, hub fanout capped)."""
    from import_ray.pipelines.kg import build_triples
    from import_ray.sources.transcripts import ensure_transcripts
    from import_ray.stages.graph import adamic_adar_topk, co_mention_edges

    triples = build_triples(ensure_transcripts(sf_dir))
    return adamic_adar_topk(co_mention_edges(triples), top_k=50)


def _kg_conv_stats(sf_dir: str):
    """Per-conversation KG yield: triples, entity links, distinct
    linked entities (conv-keyed partial exchanges over canonical
    triples; provenance via the conv/<id> subject scheme)."""
    from import_ray.pipelines.kg import conv_kg_stats
    from import_ray.sources.transcripts import ensure_transcripts

    return conv_kg_stats(ensure_transcripts(sf_dir)).sort("conv_id")


def _kg_turn_latency(sf_dir: str):
    """Per-role response-latency stats over raw transcripts (conv-keyed
    exchange + in-block LAG diff; exact integer ms sums)."""
    from import_ray.pipelines.kg import turn_latency_stats
    from import_ray.sources.transcripts import ensure_transcripts

    return turn_latency_stats(ensure_transcripts(sf_dir))


def _kg_triple_diff(sf_dir: str):
    """Incremental KG delta: current snapshot vs a deterministic
    conversation-subset snapshot, distributed keyed diff (the reference
    differ's ADDED/DELETED/MODIFIED shape over canonical triples)."""
    from import_ray.pipelines.kg import kg_triple_diff
    from import_ray.sources.transcripts import ensure_transcripts

    return kg_triple_diff(ensure_transcripts(sf_dir), mod=10)


def _dedup_exact_docs(sf_dir: str):
    """Exact doc dedup: group by a 128-bit CONTENT HASH (two independent
    keyed 64-bit hashes) instead of the raw text — the shuffle moves
    16 B/row keys, not document bodies (the 100 TB exchange shape;
    collision odds ≈ 2^-128 per pair)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Min

    from import_ray.core.context import configure_data_context, data_nparts

    configure_data_context()
    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    nparts = data_nparts(ds)

    def content_keys(b: pa.Table) -> pa.Table:
        texts = np.asarray(b["text"].to_pylist(), dtype=object)
        h1 = pd.util.hash_array(texts).astype(np.int64)
        h2 = pd.util.hash_array(texts, hash_key="1234567890abcdef").astype(np.int64)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "h1": pa.array(h1),
                "h2": pa.array(h2),
            }
        )

    out = ds.map_batches(content_keys, batch_format="pyarrow").groupby(
        ["h1", "h2"], num_partitions=nparts
    ).aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups"))
    return out.select_columns(["doc_id", "n_dups"])


def _badword_filter_docs(sf_dir: str):
    """C4-style token-blocklist filter: drop docs containing any
    blocklisted token. Embarrassingly parallel (no exchange)."""
    from import_ray.stages.scrub import badword_filter

    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(badword_filter, batch_format="pyarrow")


def _segment_dedup_docs(sf_dir: str):
    """CCNet-style segment dedup: drop every repeated 4-token window
    corpus-wide (keep the first occurrence), reassemble documents from
    their surviving segments. Winner election shuffles 32-byte hash
    keys only; document text crosses the wire once (the doc_id join)."""
    from import_ray.stages.dedup import segment_dedup_documents

    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return segment_dedup_documents(ds, seg_tokens=4)


def _span_corruption_docs(sf_dir: str):
    """T5 span-corruption denoising pairs over documents (rows-only:
    string surgery isn't SQL-expressible; exact invertibility +
    pure-Python parity pinned in tests/test_span_corruption.py)."""
    from import_ray.stages.span_corruption import span_corruption_pairs

    return span_corruption_pairs(f"{sf_dir}/documents.parquet")


def _regex_token_counts(sf_dir: str):
    """Hash-checkable BPE-style pre-tokenizer counts (RE2 both sides:
    pc.count_substring_regex vs DuckDB regexp_extract_all)."""
    from import_ray.stages.text import regex_token_counts

    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(regex_token_counts, batch_format="pyarrow")


def _token_stats(sf_dir: str):
    import ray.data

    from import_ray.stages.text import token_stats

    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(token_stats, batch_format="pyarrow")


def _source_token_cosine(sf_dir: str):
    """Pairwise cosine similarity between per-source unigram count
    vectors (corpus domain-shift / mixture-overlap measurement). One
    token-keyed exchange of per-block (source, token) partial counts;
    per block one (tokens x sources) matmul emits a tiny partial Gram
    matrix; only #sources^2-sized partials reach the driver."""
    from import_ray.stages.text import source_token_cosine

    ds = _read_table(sf_dir, "documents", ["doc_id", "text", "source"])
    return source_token_cosine(ds)


def _source_vocab_overlap(sf_dir: str):
    """Pairwise vocabulary-set Jaccard between sources (type-level
    domain overlap). Same one-exchange Gram shape as the cosine; only
    #sources^2 partials reach the driver."""
    from import_ray.stages.text import source_vocab_overlap

    ds = _read_table(sf_dir, "documents", ["doc_id", "text", "source"])
    return source_vocab_overlap(ds)


def _vocab_stats_by_source(sf_dir: str):
    """Per-source vocabulary profile (tokens, types, hapax count, top
    count) — exact integers via token-keyed exchange + per-block
    per-source partials."""
    from import_ray.stages.text import vocab_stats_by_source

    ds = _read_table(sf_dir, "documents", ["doc_id", "text", "source"])
    return vocab_stats_by_source(ds)


def _mixture_weights_by_source(sf_dir: str):
    """Per-source mixture-sampling weights (alpha=0.5 temperature
    smoothing of token-mass shares) — pure map partials, no shuffle."""
    from import_ray.stages.text import mixture_weights_by_source

    ds = _read_table(sf_dir, "documents", ["doc_id", "text", "source"])
    return mixture_weights_by_source(ds)


def _inverted_index_docs(sf_dir: str):
    """Inverted index over the corpus: per token exact document
    frequency + capped ascending posting prefix (one bounded token-keyed
    exchange of per-block partials; stopword rows never ship full
    posting lists)."""
    from import_ray.stages.text import inverted_index

    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return inverted_index(ds, max_postings=20)


def _token_pairs_docs(sf_dir: str):
    """Top-50 token pairs by document co-occurrence (distinct-set pair
    emission with in-batch partial counts, one pair-keyed exchange,
    block-local exact top-k partials)."""
    from import_ray.stages.text import token_pair_doc_counts

    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return token_pair_doc_counts(ds, top_k=50)


def _quality(sf_dir: str):
    import ray.data

    from import_ray.stages.text import quality_score

    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(quality_score, batch_format="pyarrow")


def _lang_id(sf_dir: str):
    import ray.data

    from import_ray.stages.text import LangId

    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=2)


_KNN_QUERIES = 5
_KNN_K = 10


def _knn(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from import_ray.stages.similarity import knn_cosine

    # predicate pushdown: only the query rows' row groups are read —
    # the driver never materializes the embeddings table
    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", _KNN_QUERIES)],
    ).to_pylist()
    queries = {r["vec_id"]: np.asarray(r["embedding"]) for r in qt}
    ds = _read_table(sf_dir, "embeddings")
    return knn_cosine(ds, _KNN_QUERIES, _KNN_K, query_vectors=queries)


def _minhash_dedup_docs(sf_dir: str):
    import ray.data

    from import_ray.stages.neardup import minhash_dedup

    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return minhash_dedup(ds, threshold=0.7)


_PLANT_OFFSET = 1_000_000


def _minhash_planted_clusters(sf_dir: str):
    """Oracle-checkable near-dup fixture: plant a near-duplicate copy
    (first token dropped, doc_id + 1e6) of every 20th document, run the
    fully-distributed minhash dedup over originals+copies, and report
    per copy whether it landed in its source's cluster (always TRUE —
    the oracle states exactly that)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from import_ray.core.context import npartitions
    from import_ray.stages.neardup import minhash_dedup

    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])

    def plant(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        sub = b.filter(pa.array(ids % 20 == 0))
        rest = pc.replace_substring_regex(
            sub["text"], pattern=r"^\S+ ?", replacement="", max_replacements=1
        )
        copies = pa.table(
            {
                "doc_id": pa.array(
                    sub["doc_id"].to_numpy(zero_copy_only=False) + _PLANT_OFFSET
                ),
                "text": rest,
            }
        )
        return pa.concat_tables([b, copies.cast(b.schema)])

    labels = minhash_dedup(ds.map_batches(plant, batch_format="pyarrow"), threshold=0.7)
    copies = labels.filter(expr=f"doc_id >= {_PLANT_OFFSET}")
    sources = labels.filter(expr=f"doc_id < {_PLANT_OFFSET}").map_batches(
        lambda b: pa.table({"src_id": b["doc_id"], "src_cluster": b["cluster_id"]}),
        batch_format="pyarrow",
    )

    def with_src(b: pa.Table) -> pa.Table:
        return b.append_column(
            "src_id", pc.subtract(b["doc_id"], pa.scalar(_PLANT_OFFSET, pa.int64()))
        )

    from import_ray.core.context import join_safe

    # filters can emit schema-less empty blocks that poison the join's
    # key resolution (flaky by key hashing); join_safe drops them
    joined = join_safe(copies.map_batches(with_src, batch_format="pyarrow")).join(
        join_safe(sources),
        join_type="inner",
        num_partitions=npartitions(),
        on=("src_id",),
    )
    return joined.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "same_cluster": pc.equal(b["cluster_id"], b["src_cluster"]),
            }
        ),
        batch_format="pyarrow",
    )


_ER_V1 = 10_000_000
_ER_V2 = 20_000_000


def _entity_resolution_planted(sf_dir: str):
    """Oracle-checkable entity resolution: every 10th customer gets two
    planted name variants — v1 case/punctuation ("CUSTOMER # <key>",
    identical token set), v2 reorder + extra token ("<key> customer
    inc", Jaccard 2/3) — and the blocking→verify→cluster pipeline
    (stages/entity_resolution.py) must canonicalize each variant to its
    source customer while every other customer stays a singleton (the
    oracle states exactly that)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from import_ray.stages.entity_resolution import resolve_entities

    ds = _read_table(sf_dir, "customer", ["c_custkey", "c_name"])

    def plant(b: pa.Table) -> pa.Table:
        import numpy as np

        keys = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        name = pc.cast(b["c_name"], pa.string())
        base = pa.table(
            {"entity_id": pa.array(keys, pa.int64()), "name": name}
        )
        m = keys % 10 == 0
        arrow_m = pa.array(m)
        sub_name = name.filter(arrow_m)
        skeys = keys[m]
        v1 = pa.table(
            {
                "entity_id": pa.array(skeys + _ER_V1, pa.int64()),
                "name": pc.utf8_upper(
                    pc.replace_substring(sub_name, "#", " # ")
                ),
            }
        )
        num = pc.replace_substring_regex(
            sub_name, pattern=r"^Customer#", replacement=""
        )
        v2 = pa.table(
            {
                "entity_id": pa.array(skeys + _ER_V2, pa.int64()),
                "name": pc.binary_join_element_wise(num, "customer inc", " "),
            }
        )
        return pa.concat_tables(
            [base, v1.cast(base.schema), v2.cast(base.schema)]
        )

    planted = ds.map_batches(plant, batch_format="pyarrow")
    return resolve_entities(planted, threshold=0.6)


def _lm_perplexity_docs(sf_dir: str):
    """CCNet-style LM quality scores: distributed bigram-count training
    over the corpus, broadcast bounded model, vectorized Stupid-Backoff
    perplexity per doc (stages/lm_quality.py)."""
    from import_ray.stages.lm_quality import lm_perplexity

    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return lm_perplexity(ds)


def _lm_perplexity_planted(sf_dir: str):
    """Oracle-checkable LM-scoring fixture: every 20th doc gets a
    garbled copy (every token OOV-prefixed — provably unseen grams, so
    it scores at the backoff floor) while the model trains on the
    ORIGINALS only; each copy must score strictly higher perplexity
    than its source (the oracle states exactly that; strictness holds
    because any seen bigram's logp = -log c(w1) exceeds the floor)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from import_ray.core.context import npartitions
    from import_ray.stages.lm_quality import lm_perplexity, train_bigram_lm

    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])

    def plant(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        sub = b.filter(pa.array(ids % 20 == 0))
        garbled = pc.binary_join_element_wise(
            pa.scalar("zq"),
            pc.replace_substring(pc.cast(sub["text"], pa.string()), " ", " zq"),
            pa.scalar(""),
        )
        copies = pa.table(
            {
                "doc_id": pa.array(
                    sub["doc_id"].to_numpy(zero_copy_only=False) + _PLANT_OFFSET
                ),
                "text": garbled,
            }
        )
        return pa.concat_tables([b, copies.cast(b.schema)])

    model = train_bigram_lm(ds)
    scored = lm_perplexity(ds.map_batches(plant, batch_format="pyarrow"), model=model)
    copies = scored.filter(expr=f"doc_id >= {_PLANT_OFFSET}").map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "src_id": pc.subtract(
                    b["doc_id"], pa.scalar(_PLANT_OFFSET, pa.int64())
                ),
                "copy_ppl": b["ppl"],
            }
        ),
        batch_format="pyarrow",
    )
    sources = scored.filter(expr=f"doc_id < {_PLANT_OFFSET}").map_batches(
        lambda b: pa.table({"src_id": b["doc_id"], "src_ppl": b["ppl"]}),
        batch_format="pyarrow",
    )
    from import_ray.core.context import join_safe

    joined = join_safe(copies).join(
        join_safe(sources), join_type="inner", num_partitions=npartitions(), on=("src_id",)
    )
    return joined.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "higher_ppl": pc.greater(b["copy_ppl"], b["src_ppl"]),
            }
        ),
        batch_format="pyarrow",
    )


def _plant_exact_copies(sf_dir: str, offset: int):
    """documents + an EXACT copy (doc_id + offset) of every 20th doc."""
    import pyarrow as pa
    import ray.data

    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])

    def plant(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        sub = b.filter(pa.array(ids % 20 == 0))
        copies = pa.table(
            {
                "doc_id": pa.array(
                    sub["doc_id"].to_numpy(zero_copy_only=False) + offset
                ),
                "text": sub["text"],
            }
        )
        return pa.concat_tables([b, copies.cast(b.schema)])

    return ds.map_batches(plant, batch_format="pyarrow")


_PLANT2 = 2_000_000


def _simhash_planted_pairs(sf_dir: str):
    """Oracle-checkable SimHash fixture: exact copies share their
    source's simhash, so every (src, src+offset) pair must surface with
    hamming 0."""
    import pyarrow as pa

    from import_ray.stages.neardup import simhash_pairs

    pairs = simhash_pairs(_plant_exact_copies(sf_dir, _PLANT2))

    def planted_only(b: pa.Table) -> pa.Table:
        import numpy as np

        lo = b["doc_lo"].to_numpy(zero_copy_only=False)
        hi = b["doc_hi"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array((hi - lo == _PLANT2) & (lo % 20 == 0)))

    return pairs.map_batches(planted_only, batch_format="pyarrow")


def _ngram_planted_pairs(sf_dir: str):
    """Exact n-gram Jaccard on planted exact copies: score must be
    exactly 1.0 for every (src, src+offset) pair."""
    import pyarrow as pa

    from import_ray.stages.neardup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(_plant_exact_copies(sf_dir, _PLANT2), threshold=0.5)

    def planted_only(b: pa.Table) -> pa.Table:
        import numpy as np

        lo = b["doc_lo"].to_numpy(zero_copy_only=False)
        hi = b["doc_hi"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array((hi - lo == _PLANT2) & (lo % 20 == 0)))

    return pairs.map_batches(planted_only, batch_format="pyarrow")


def _simhash_pairs_docs(sf_dir: str):
    import ray.data

    from import_ray.stages.neardup import simhash_pairs

    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return simhash_pairs(ds)


def _ngram_jaccard_docs(sf_dir: str):
    import ray.data

    from import_ray.stages.neardup import ngram_jaccard_pairs

    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_pairs(ds, threshold=0.5)


def _lang_id_planted(sf_dir: str):
    """Deterministic language-ID fixture: four stopword-saturated docs
    (one per supported language) plus a no-stopword doc must classify
    to exactly their language / 'und'."""
    import ray.data

    from import_ray.stages.text import LangId

    docs = [
        {"doc_id": 0, "text": "the cat and the dog in a house is of note"},
        {"doc_id": 1, "text": "el gato y la casa de los perros en que vive"},
        {"doc_id": 2, "text": "der hund und die katze ist von dem haus mit"},
        {"doc_id": 3, "text": "le chat et les chiens des maisons un jour"},
        {"doc_id": 4, "text": "zzz qqq xxx www"},
    ]
    ds = ray.data.from_items(docs)
    return ds.map_batches(LangId(), batch_format="pyarrow").select_columns(
        ["doc_id", "pred_lang"]
    )


LANG_ID_PLANTED_SQL = """
SELECT * FROM (VALUES (0, 'en'), (1, 'es'), (2, 'de'), (3, 'fr'), (4, 'und'))
  AS t(doc_id, pred_lang)
"""


def _fingerprint_planted(sf_dir: str):
    """Fingerprint invariance fixture: exact copies must share their
    source's rolling-hash fingerprint."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from import_ray.core.context import npartitions
    from import_ray.stages.text import doc_fingerprint

    fps = _plant_exact_copies(sf_dir, _PLANT2).map_batches(
        doc_fingerprint, batch_format="pyarrow"
    )
    copies = fps.filter(expr=f"doc_id >= {_PLANT2}").map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "src_id": pc.subtract(b["doc_id"], pa.scalar(_PLANT2, pa.int64())),
                "fp_copy": b["fingerprint"],
            }
        ),
        batch_format="pyarrow",
    )
    sources = fps.filter(expr=f"doc_id < {_PLANT2}").map_batches(
        lambda b: pa.table({"src_id": b["doc_id"], "fp_src": b["fingerprint"]}),
        batch_format="pyarrow",
    )
    from import_ray.core.context import join_safe

    joined = join_safe(copies).join(
        join_safe(sources), join_type="inner", num_partitions=npartitions(), on=("src_id",)
    )
    return joined.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "same_fp": pc.equal(b["fp_copy"], b["fp_src"]),
            }
        ),
        batch_format="pyarrow",
    )


def _doc_fingerprints(sf_dir: str):
    import ray.data

    from import_ray.stages.text import doc_fingerprint

    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(doc_fingerprint, batch_format="pyarrow")


def _multimodal_features(sf_dir: str):
    import ray.data

    from import_ray.stages.multimodal import extract_media_features, synthesize_media

    ds = ray.data.from_arrow(synthesize_media(n=96))
    return extract_media_features(ds).select_columns(
        ["media_id", "media_type", "payload_bytes"]
    )


def _media_phash_pairs(sf_dir: str):
    """Perceptual-hash near-duplicate media pairs (rows-only: binary
    payloads aren't SQL-expressible; banded-search-vs-brute-force
    parity and planted-copy recall pinned in test_multimodal.py)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from import_ray.stages.multimodal import phash_neardup_pairs, synthesize_media

    base = synthesize_media(n=512, seed=7)
    payloads = base["payload"].to_pylist()
    ids = list(range(512))
    for i in range(0, 64, 2):  # 32 planted near-copies (3 bytes flipped)
        p = bytearray(payloads[i])
        p[0] = p[len(p) // 2] = p[-1] = 255
        payloads.append(bytes(p))
        ids.append(10_000 + i)
    n = len(ids)
    media = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array([8] * n, pa.int32()),
            "height": pa.array([8] * n, pa.int32()),
            "duration_ms": pa.array([0] * n, pa.int32()),
        }
    )
    return phash_neardup_pairs(ray.data.from_arrow(media), max_hamming=7, bands=8)


def _media_bmp_features(sf_dir: str):
    """REAL-codec media features (rows-only: binary payloads aren't
    SQL-expressible): pure-numpy BMP/WAV decode (stages/codecs.py) →
    luma-grid / band-energy features; decode correctness is pinned by
    roundtrip + planted-pixel tests in test_codecs.py."""
    import pyarrow as pa
    import ray.data

    from import_ray.stages.multimodal import (
        extract_media_features,
        synthesize_real_media,
    )

    tbl = synthesize_real_media(n=96, seed=9)
    images = tbl.filter(pa.compute.equal(tbl["media_type"], pa.scalar("image")))
    return extract_media_features(
        ray.data.from_arrow(images), decoder="bmp"
    ).select_columns(["media_id", "media_type", "payload_bytes"])


def _harmonic_star_planted(sf_dir: str):
    """Exact harmonic centrality on a planted star graph over the
    nation table's 25 ids (center = nation 0): all-seeds mode makes
    the sampled estimator exact, so the closed form H(center) = 24,
    H(leaf) = 1 + 23/2 is SQL-expressible (stages/graph.py
    harmonic_centrality)."""
    import pyarrow as pa
    import ray.data

    from import_ray.stages.graph import harmonic_centrality

    nk = _read_table(sf_dir, "nation", ["n_nationkey"]).to_pandas()
    ids = sorted(int(x) for x in nk["n_nationkey"])
    center, leaves = ids[0], ids[1:]
    edges = pa.table(
        {
            "doc_lo": pa.array([center] * len(leaves), pa.int64()),
            "doc_hi": pa.array(leaves, pa.int64()),
        }
    )
    return harmonic_centrality(
        ray.data.from_arrow(edges), seeds=ids, max_hops=4
    )


HARMONIC_STAR_SQL = """
WITH m AS (SELECT COUNT(*) - 1 AS leaves FROM nation)
SELECT n_nationkey AS node,
       CASE WHEN n_nationkey = (SELECT MIN(n_nationkey) FROM nation)
            THEN CAST((SELECT leaves FROM m) AS DOUBLE)
            ELSE 1.0 + ((SELECT leaves FROM m) - 1) / 2.0 END AS harmonic
FROM nation
ORDER BY node
"""


_ORDERS_PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]


def _expectations_orders(sf_dir: str):
    """Declarative table-quality contract over orders: key uniqueness,
    null checks, range/regex/set constraints — one exact result row
    per expectation (stages/expectations.py), SQL-oracle checked."""
    from import_ray.stages.expectations import check_expectations

    ds = _read_table(sf_dir, "orders")
    cust = _read_table(sf_dir, "customer", ["c_custkey"])
    return check_expectations(
        ds,
        [
            {"type": "not_null", "col": "o_custkey"},
            {"type": "unique", "col": "o_orderkey"},
            {"type": "range", "col": "o_totalprice", "min": 0.0},
            {"type": "in_set", "col": "o_orderpriority", "values": _ORDERS_PRIORITIES},
            {"type": "regex", "col": "o_orderstatus", "pattern": "[OFP]"},
            {"type": "ref", "col": "o_custkey", "ref_ds": cust, "ref_col": "c_custkey"},
        ],
    )


EXPECTATIONS_ORDERS_SQL = """
WITH t AS (SELECT COUNT(*) AS n FROM orders)
SELECT expectation, col, violations,
       (SELECT n FROM t) AS n_rows,
       violations = 0 AS passed
FROM (
  SELECT 'not_null' AS expectation, 'o_custkey' AS col,
         COUNT(*) FILTER (WHERE o_custkey IS NULL) AS violations
  FROM orders
  UNION ALL
  SELECT 'unique', 'o_orderkey',
         COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey)
  FROM orders
  UNION ALL
  SELECT 'range', 'o_totalprice',
         COUNT(*) FILTER (WHERE o_totalprice IS NOT NULL
                          AND NOT o_totalprice >= 0.0)
  FROM orders
  UNION ALL
  SELECT 'in_set', 'o_orderpriority',
         COUNT(*) FILTER (WHERE o_orderpriority IS NULL
           OR o_orderpriority NOT IN
             ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'))
  FROM orders
  UNION ALL
  SELECT 'ref', 'o_custkey',
         COUNT(*) FILTER (WHERE o_custkey IS NOT NULL
           AND o_custkey NOT IN (SELECT c_custkey FROM customer))
  FROM orders
  UNION ALL
  SELECT 'regex', 'o_orderstatus',
         COUNT(*) FILTER (WHERE o_orderstatus IS NOT NULL
           AND NOT regexp_full_match(o_orderstatus, '[OFP]'))
  FROM orders
)
ORDER BY expectation, col
"""


def _format_copy(sf_dir: str, table: str, fmt: str, columns=None) -> str:
    """Cached /tmp copy of a testdata table in another file format —
    input fixture for the ORC/JSONL/Feather reader oracle checks (the
    DuckDB oracle reads the original parquet view; values identical)."""
    import ray.data

    from import_ray.sources import formats as F

    out_dir = f"/tmp/raydc_formats/{os.path.basename(os.path.normpath(sf_dir))}_{table}_{fmt}"
    if not (os.path.isdir(out_dir) and os.listdir(out_dir)):
        ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)
        writer = {"orc": F.write_orc, "jsonl": F.write_jsonl, "feather": F.write_feather}[fmt]
        tmp = out_dir + ".tmp"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        writer(ds, tmp)
        os.rename(tmp, out_dir)
    return out_dir


def _q6_from_orc(sf_dir: str):
    """TPC-H Q6 computed from an ORC copy of lineitem via the ORC
    reader (sources/formats.py) — the SAME q6 operator, the oracle
    reads the original parquet view; a hash match certifies the ORC
    decode end-to-end."""
    from import_ray.pipelines import relational as R
    from import_ray.sources import formats as F

    cols = ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"]
    orc_dir = _format_copy(sf_dir, "lineitem", "orc", columns=cols)
    ds = F.read_orc(sorted(
        os.path.join(orc_dir, f) for f in os.listdir(orc_dir)
    )).map_batches(lambda b: b.select(cols), batch_format="pyarrow")
    return R.q6_discount_revenue(sf_dir, ds=ds)


def _events_daily_from_jsonl(sf_dir: str):
    """events_daily_counts from a JSONL copy of events via the JSONL
    reader — certifies the JSONL roundtrip (timestamps inferred from
    ISO strings) against the parquet-reading oracle."""
    from import_ray.pipelines import relational as R
    from import_ray.sources import formats as F

    import pyarrow as pa

    cols = ["event_type", "ts", "value"]
    jl_dir = _format_copy(sf_dir, "events", "jsonl", columns=cols)

    def restore_types(b: pa.Table) -> pa.Table:
        # Arrow's JSON reader leaves microsecond-precision timestamps
        # as strings (its inference stops at whole seconds); the cast
        # restores the parquet schema exactly
        b = b.select(cols).replace_schema_metadata(None)
        return b.set_column(
            b.schema.get_field_index("ts"),
            "ts",
            b["ts"].cast(pa.timestamp("us")),
        )

    ds = F.read_jsonl(sorted(
        os.path.join(jl_dir, f) for f in os.listdir(jl_dir)
    )).map_batches(restore_types, batch_format="pyarrow")
    return R.events_daily_counts(sf_dir, ds=ds)


def _media_jpeg_features(sf_dir: str):
    """REAL-codec media features over baseline-DCT JPEG payloads
    (pure-numpy encoder+decoder, stages/jpeg.py; rows-only: binary
    payloads aren't SQL-expressible). Decode correctness pinned by
    roundtrip/orientation/planted-recall tests in test_codecs.py."""
    import pyarrow as pa
    import ray.data

    from import_ray.stages.multimodal import (
        extract_media_features,
        synthesize_real_media,
    )

    tbl = synthesize_real_media(n=96, seed=9, image_format="jpeg")
    images = tbl.filter(pa.compute.equal(tbl["media_type"], pa.scalar("image")))
    return extract_media_features(
        ray.data.from_arrow(images), decoder="jpeg"
    ).select_columns(["media_id", "media_type", "payload_bytes"])


def _media_jpeg_phash_pairs(sf_dir: str):
    """Perceptual-hash near-dup pairs over REAL decoded JPEG pixels:
    planted few-pixel perturbations survive the lossy roundtrip at
    small aHash Hamming (recall pinned in test_codecs.py)."""
    import pyarrow as pa
    import ray.data

    from import_ray.stages.multimodal import (
        phash_neardup_pairs,
        synthesize_real_media,
    )

    tbl = synthesize_real_media(n=192, seed=9, image_format="jpeg")
    images = tbl.filter(pa.compute.equal(tbl["media_type"], pa.scalar("image")))
    return phash_neardup_pairs(
        ray.data.from_arrow(images), max_hamming=7, bands=8, decoder="jpeg"
    )


def _media_bmp_phash_pairs(sf_dir: str):
    """Perceptual-hash near-dup pairs over REAL decoded BMP pixels
    (decoder='bmp'): planted few-pixel perturbations land at small
    Hamming; recall pinned in test_codecs.py (rows-only check)."""
    import pyarrow as pa
    import ray.data

    from import_ray.stages.multimodal import (
        phash_neardup_pairs,
        synthesize_real_media,
    )

    tbl = synthesize_real_media(n=192, seed=9)
    images = tbl.filter(pa.compute.equal(tbl["media_type"], pa.scalar("image")))
    return phash_neardup_pairs(
        ray.data.from_arrow(images), max_hamming=7, bands=8, decoder="bmp"
    )


def _knn_int8(sf_dir: str):
    """int8-quantized cosine top-k (4× smaller corpus-side memory
    traffic; recall vs exact pytest-gated in test_similarity.py)."""
    from import_ray.stages.similarity import knn_cosine_int8

    ds = _read_table(sf_dir, "embeddings")
    return knn_cosine_int8(ds, _KNN_QUERIES, 10)


def _random_projection(sf_dir: str):
    """Johnson–Lindenstrauss Gaussian projection 64→16 dims (seeded,
    deterministic; distance-preservation pytest-gated)."""
    from import_ray.stages.similarity import random_projection

    ds = _read_table(sf_dir, "embeddings")
    return random_projection(ds, out_dim=16, seed=7)


def _pca_embeddings(sf_dir: str):
    """Distributed PCA 64→8 dims: moment-partial fit (1 row/block,
    row-count-independent driver state) + broadcast projection;
    numpy-parity pytest-gated (sign-fixed components)."""
    from import_ray.stages.pca import pca_embeddings

    ds = _read_table(sf_dir, "embeddings")
    return pca_embeddings(ds, k=8)


def _kg_sorted_export(sf_dir: str):
    """Range-partitioned globally-sorted triple export for serving:
    sampled boundaries → bucket tag → ONE keyed exchange → per-block
    sort → bucket=K/ parquet + key-range manifest. Returns the manifest
    as rows (bucket, min_key, max_key, rows)."""
    import shutil
    import tempfile

    import pandas as pd

    from import_ray.pipelines.kg import build_triples
    from import_ray.sources.range_export import write_sorted_triples
    from import_ray.sources.transcripts import ensure_transcripts

    path = ensure_transcripts(sf_dir)
    out = tempfile.mkdtemp(prefix="kg_sorted_export_")
    try:
        manifest = write_sorted_triples(
            build_triples(path), out, n_buckets=8
        )
        rows = [
            {
                "bucket": int(k),
                "min_key": v["min_key"],
                "max_key": v["max_key"],
                "rows": int(v["rows"]),
            }
            for k, v in manifest["buckets"].items()
        ]
        return pd.DataFrame(sorted(rows, key=lambda r: r["bucket"]))
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _ivf_knn(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from import_ray.stages.similarity import ivf_knn

    # predicate pushdown: only the query rows' row groups are read —
    # the driver never materializes the embeddings table
    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", _KNN_QUERIES)],
    ).to_pylist()
    queries = {r["vec_id"]: np.asarray(r["embedding"]) for r in qt}
    ds = _read_table(sf_dir, "embeddings")
    return ivf_knn(ds, queries, _KNN_K, n_clusters=8, n_probe=5)


def _pq_knn(sf_dir: str):
    """Product-quantization ANN (Jégou 2011): hash-sample-trained
    broadcast codebooks, one encode pass (vector → m bytes), ADC
    candidate search over codes only, exact re-rank of the Q·r·k
    candidate rows via one blob hash join. Recall + lossless-parity
    pytest-gated in test_similarity.py."""
    from import_ray.stages.similarity import pq_knn

    ds = _read_table(sf_dir, "embeddings")
    return pq_knn(ds, _KNN_QUERIES, _KNN_K, m=8, n_codes=32, rerank_factor=8)


def _ivf_knn_planted(sf_dir: str):
    """IVF ANN with planted EXACT copies as ground truth: every query
    vector (vec_id < 32) gets an identical copy planted at
    vec_id + 1e6; the copy shares the query's nearest-centroid cell, so
    IVF probes it FIRST even at n_probe=2 — top-1 must be the copy at
    cosine exactly 1.0 (no natural pair reaches it). Turns the
    approximate path into a hash-checkable oracle query."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from import_ray.stages.similarity import ivf_knn

    n_q = 32
    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_q)],
    ).to_pylist()
    queries = {r["vec_id"]: np.asarray(r["embedding"]) for r in qt}
    ds = _read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def plant(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        sub = b.filter(pa.array(ids < n_q))
        copies = pa.table(
            {
                "vec_id": pa.array(
                    sub["vec_id"].to_numpy(zero_copy_only=False) + _PLANT_OFFSET
                ),
                "embedding": sub["embedding"],
            }
        )
        return pa.concat_tables([b, copies.cast(b.schema)])

    return ivf_knn(
        ds.map_batches(plant, batch_format="pyarrow"),
        queries,
        k=1,
        n_clusters=8,
        n_probe=2,
    )


def _pq_knn_planted(sf_dir: str):
    """PQ ANN with planted EXACT copies as ground truth (k=1,
    rerank_factor=8): the copy encodes to the query's own nearest
    codewords, so its ADC score is the maximum achievable — it is
    always in the candidate set — and the exact re-rank scores it at
    cosine exactly 1.0, strictly above every natural vector. Queries
    are the originals (vec_id < 32), self-matches masked, so rank 1
    must be vec_id + 1e6."""
    import pyarrow as pa

    from import_ray.stages.similarity import pq_knn

    n_q = 32
    ds = _read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def plant(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        sub = b.filter(pa.array(ids < n_q))
        copies = pa.table(
            {
                "vec_id": pa.array(
                    sub["vec_id"].to_numpy(zero_copy_only=False) + _PLANT_OFFSET
                ),
                "embedding": sub["embedding"],
            }
        )
        return pa.concat_tables([b, copies.cast(b.schema)])

    return pq_knn(
        ds.map_batches(plant, batch_format="pyarrow"),
        n_q,
        k=1,
        m=8,
        n_codes=32,
        rerank_factor=8,
    )


def _ivfpq_knn_planted(sf_dir: str):
    """IVF-PQ (IVFADC) ANN with planted EXACT copies as ground truth
    (k=1, rerank_factor=8): the copy lands in the query's own coarse
    cell (probed first) and encodes to the query's own residual
    codewords (maximal ADC score → always in the candidate set); the
    exact re-rank scores it at cosine exactly 1.0, strictly above
    every natural vector — rank 1 must be vec_id + 1e6."""
    import pyarrow as pa

    from import_ray.stages.similarity import ivfpq_knn

    n_q = 32
    ds = _read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def plant(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        sub = b.filter(pa.array(ids < n_q))
        copies = pa.table(
            {
                "vec_id": pa.array(
                    sub["vec_id"].to_numpy(zero_copy_only=False) + _PLANT_OFFSET
                ),
                "embedding": sub["embedding"],
            }
        )
        return pa.concat_tables([b, copies.cast(b.schema)])

    return ivfpq_knn(
        ds.map_batches(plant, batch_format="pyarrow"),
        n_q,
        k=1,
        n_clusters=8,
        n_probe=2,
        m=8,
        n_codes=32,
        rerank_factor=8,
    )


def _knn_int8_planted(sf_dir: str):
    """int8-quantized kNN with planted exact copies: the copy's int8
    codes equal the query's own quantization, so its dequantized cosine
    sits within quantization error of 1.0 while every natural vector is
    ≤ ~0.51 — rank 1 must be vec_id + 1e6 regardless of int8 rounding."""
    import pyarrow as pa

    from import_ray.stages.similarity import knn_cosine_int8

    n_q = 32
    ds = _read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def plant(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        sub = b.filter(pa.array(ids < n_q))
        copies = pa.table(
            {
                "vec_id": pa.array(
                    sub["vec_id"].to_numpy(zero_copy_only=False) + _PLANT_OFFSET
                ),
                "embedding": sub["embedding"],
            }
        )
        return pa.concat_tables([b, copies.cast(b.schema)])

    return knn_cosine_int8(ds.map_batches(plant, batch_format="pyarrow"), n_q, k=1)


def _pca_invariants(sf_dir: str):
    """Hash-checkable PCA contract: the distributed moment-partial fit
    must produce an orthonormal component basis, non-increasing
    per-component variances, and one k-dim row per input vector. The
    checks run Ray/driver-side on schema-scale state (a k×d basis);
    the oracle states the per-vector verdict."""
    import numpy as np
    import pandas as pd

    from import_ray.stages.pca import pca_embeddings, pca_fit

    k = 8
    ds = _read_table(sf_dir, "embeddings")
    model = pca_fit(ds, k=k)
    comps = model["components"]
    variances = model["explained_variance"]
    ortho = bool(np.allclose(comps @ comps.T, np.eye(k), atol=1e-8))
    mono = bool(np.all(np.diff(variances) <= 1e-12))
    proj = pca_embeddings(_read_table(sf_dir, "embeddings"), k=k)

    def verdict(b):
        import pyarrow as pa

        dims_ok = [len(v) == k for v in b["pca"].to_pylist()]
        ok = [bool(d and ortho and mono) for d in dims_ok]
        return pa.table({"vec_id": b["vec_id"], "ok": pa.array(ok, pa.bool_())})

    return proj.map_batches(verdict, batch_format="pyarrow").sort("vec_id")


def _random_projection_invariants(sf_dir: str):
    """Hash-checkable JL contract: the seeded Gaussian projection must
    emit one out_dim row per vector and preserve the pairwise distances
    of a fixed 32-vector probe set within the JL distortion bound for
    k=16 (checked exactly once, driver-side, on the probe sample)."""
    import numpy as np
    import pyarrow.parquet as pq

    from import_ray.stages.similarity import random_projection

    out_dim, n_probe = 16, 32
    probe = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_probe)],
    )
    x = np.stack([np.asarray(v) for v in probe["embedding"].to_pylist()]).astype(
        np.float64
    )
    proj = random_projection(_read_table(sf_dir, "embeddings"), out_dim=out_dim, seed=7)
    pro = proj.filter(expr=f"vec_id < {n_probe}").take_all()
    pm = {r["vec_id"]: np.asarray(r["embedding"]) for r in pro}
    y = np.stack([pm[i] for i in sorted(pm)])
    dx = np.linalg.norm(x[:, None] - x[None, :], axis=2)
    dy = np.linalg.norm(y[:, None] - y[None, :], axis=2)
    iu = np.triu_indices(len(x), 1)
    ratio = dy[iu] / np.maximum(dx[iu], 1e-12)
    # JL multiplicative distortion for k=16 (loose bound; the seeded
    # matrix is deterministic so this is a fixed property, not a gamble)
    bound_ok = bool((ratio > 0.35).all() and (ratio < 1.9).all())

    def verdict(b):
        import pyarrow as pa

        dims_ok = [len(v) == out_dim for v in b["embedding"].to_pylist()]
        ok = [bool(d and bound_ok) for d in dims_ok]
        return pa.table({"vec_id": b["vec_id"], "ok": pa.array(ok, pa.bool_())})

    return proj.map_batches(verdict, batch_format="pyarrow").sort("vec_id")


def _kg_planted_fixture(sf_dir: str) -> str:
    """Transcript corpus derived deterministically from the ``orders``
    view (one 2-turn conversation per order; turn 0 mentions a place
    ``isoCode:R<orderkey mod 7>``, turn 1 is a tool turn) — every
    emitted triple is SQL-regenerable from orders. Shared by
    kg_triples_planted (full extraction parity) and
    kg_snapshot_planted (as-of rebuild parity)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    keys = orders["o_orderkey"].to_numpy(zero_copy_only=False)
    ts = orders["o_orderdate"].to_numpy(zero_copy_only=False)
    conv = np.char.add("o", keys.astype(str)).astype(object)
    r = (keys % 7).astype(str)
    t0 = np.char.add(
        "please check region isoCode:R", r.astype(object).astype(str)
    ).astype(object)
    n = len(keys)
    tx = pa.table(
        {
            "conv_id": pa.array(np.repeat(conv, 2), pa.string()),
            "turn_idx": pa.array(np.tile([0, 1], n).astype(np.int32), pa.int32()),
            "role": pa.array(np.tile(["user", "agent"], n), pa.string()),
            "text": pa.array(
                np.column_stack([t0, np.full(n, "done", object)]).ravel(), pa.string()
            ),
            "tool": pa.array(np.tile(["", "lookup"], n), pa.string()),
            "ts": pa.array(np.repeat(ts, 2), pa.timestamp("us")),
        }
    )
    base = f"/tmp/graft_kg_planted_{os.path.basename(os.path.normpath(sf_dir))}"
    os.makedirs(base, exist_ok=True)
    path = f"{base}/transcripts.parquet"
    tmp = path + ".tmp"
    pq.write_table(tx, tmp, row_group_size=25_000)
    os.replace(tmp, path)
    return path


def _kg_triples_planted(sf_dir: str):
    """Hash-checkable fixture for the FLAGSHIP transcripts→triples
    extraction (see _kg_planted_fixture): the real distributed
    extraction + exact triple dedup over the orders-derived corpus,
    compared against a full SQL regeneration."""
    from import_ray.pipelines.kg import build_triples

    return build_triples(_kg_planted_fixture(sf_dir), conv_aggregates=False)


def _kg_ntriples_roundtrip(sf_dir: str):
    """Hash-checkable N-Quads interchange: the flagship extraction over
    the planted fixture, SERIALIZED to W3C N-Quads lines and PARSED
    back (sources/ntriples.py) — the roundtrip must reproduce the SQL
    regeneration byte-exactly, which pins the escape/IRI-encoding
    bijection end-to-end on real pipeline output."""
    from import_ray.pipelines.kg import build_triples
    from import_ray.sources.ntriples import parse_lines, serialize_triples

    triples = build_triples(_kg_planted_fixture(sf_dir), conv_aggregates=False)
    return parse_lines(serialize_triples(triples))


def _kg_upsert_delta(sf_dir: str, mod: int = 5):
    """SQL-regenerable delta over the planted fixture: every conv whose
    orderkey % mod == 0 gets a REVISED turn-0 text (replace) and a new
    revisedBy statement (insert)."""
    import ray.data

    def emit(batch):
        import numpy as np
        import pyarrow as pa

        keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        keys = keys[keys % mod == 0]
        subj = np.char.add(
            np.char.add("conv/o", keys.astype(str)), "/t0"
        ).astype(object)
        n = len(keys)
        return pa.table(
            {
                "subject_id": pa.array(np.repeat(subj, 2), pa.string()),
                "predicate": pa.array(np.tile(["text", "revisedBy"], n), pa.string()),
                "object_id": pa.array([None] * (2 * n), pa.string()),
                "object_value": pa.array(
                    np.tile(["REVISED", "editor"], n).astype(object), pa.large_string()
                ),
                "provenance": pa.array(np.full(2 * n, "delta", object), pa.string()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    ).map_batches(emit, batch_format="pyarrow")


def _kg_upsert_planted(sf_dir: str):
    """Hash-checkable triple-store upsert: the flagship extraction as
    the BASE store, a SQL-regenerable delta (text replaces + revisedBy
    inserts on orderkey%5==0 convs) applied with statement-level
    (subject, predicate) replace semantics
    (stages/triplestore.upsert_triples)."""
    from import_ray.pipelines.kg import build_triples
    from import_ray.stages.triplestore import upsert_triples

    base = build_triples(_kg_planted_fixture(sf_dir), conv_aggregates=False)
    return upsert_triples(base, _kg_upsert_delta(sf_dir))


def _kg_conflicts_planted(sf_dir: str):
    """Hash-checkable functional-predicate conflict detection: plant a
    second distinct 'role' object on orderkey%4==0 turn-0 subjects and
    assert exactly those (subject, role) pairs flag with n_objects=2
    (stages/triplestore.functional_conflicts)."""
    import ray.data

    from import_ray.pipelines.kg import build_triples
    from import_ray.stages.triplestore import functional_conflicts

    def extra(batch):
        import numpy as np
        import pyarrow as pa

        keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        keys = keys[keys % 4 == 0]
        subj = np.char.add(
            np.char.add("conv/o", keys.astype(str)), "/t0"
        ).astype(object)
        n = len(keys)
        return pa.table(
            {
                "subject_id": pa.array(subj, pa.string()),
                "predicate": pa.array(np.full(n, "role", object), pa.string()),
                "object_id": pa.array([None] * n, pa.string()),
                "object_value": pa.array(
                    np.full(n, "moderator", object), pa.large_string()
                ),
                "provenance": pa.array(np.full(n, "extra", object), pa.string()),
            }
        )

    base = build_triples(_kg_planted_fixture(sf_dir), conv_aggregates=False)
    planted = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    ).map_batches(extra, batch_format="pyarrow")
    return functional_conflicts(
        base.union(planted), ["role", "text", "turnNumber", "typeOf"]
    )


def _conv_sessions_fixture(sf_dir: str) -> str:
    """Transcript fixture for sessionization: one 5-turn conversation
    per order, inter-turn spacing (orderkey mod 4) HOURS — so the
    90-minute session gap splits exactly the mod∈{2,3} conversations.
    Every ts is SQL-regenerable from orders."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    keys = orders["o_orderkey"].to_numpy(zero_copy_only=False)
    base = orders["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
    conv = np.char.add("o", keys.astype(str)).astype(object)
    n, t = len(keys), 5
    step_h = (keys % 4).astype(np.int64)
    i = np.tile(np.arange(t, dtype=np.int64), n)
    ts = np.repeat(base, t) + (i * np.repeat(step_h, t)) * np.timedelta64(3600, "s")
    tx = pa.table(
        {
            "conv_id": pa.array(np.repeat(conv, t), pa.string()),
            "turn_idx": pa.array(i.astype(np.int32), pa.int32()),
            "role": pa.array(
                np.tile(["user", "agent", "user", "agent", "user"], n), pa.string()
            ),
            "text": pa.array(np.full(n * t, "x", object), pa.string()),
            "tool": pa.array(np.full(n * t, "", object), pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    base_dir = f"/tmp/graft_sessions_{os.path.basename(os.path.normpath(sf_dir))}"
    os.makedirs(base_dir, exist_ok=True)
    path = f"{base_dir}/transcripts.parquet"
    tmp = path + ".tmp"
    pq.write_table(tx, tmp, row_group_size=25_000)
    os.replace(tmp, path)
    return path


def _conv_sessions_planted(sf_dir: str):
    """Hash-checkable sessionization: gap-split session counts over the
    hour-spaced fixture must match the SQL LAG-window regeneration."""
    from import_ray.pipelines.kg import conv_sessions

    return conv_sessions(_conv_sessions_fixture(sf_dir), gap_minutes=90)


CONV_SESSIONS_PLANTED_SQL = """
WITH o AS (
  SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS conv_id,
         o_orderkey % 4 AS m, CAST(o_orderdate AS TIMESTAMP) AS d
  FROM orders
), turns AS (
  SELECT conv_id, r.i AS i, d + (r.i * m) * INTERVAL 1 HOUR AS ts
  FROM o, range(5) r(i)
), gaps AS (
  SELECT conv_id,
         date_diff('minute', LAG(ts) OVER (PARTITION BY conv_id ORDER BY i), ts)
           AS gm
  FROM turns
)
SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(1 + SUM(CASE WHEN gm > 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       CAST(COALESCE(MAX(gm), 0) AS BIGINT) AS max_gap_minutes
FROM gaps GROUP BY conv_id
"""


def _conv_structure_fixture(sf_dir: str) -> str:
    """Transcript fixture with PLANTED structure faults: 4-turn
    conversations; orderkey%6==0 duplicates a turn_idx (3→2),
    orderkey%6==3 breaks role alternation (turn 2 user→agent)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    keys = orders["o_orderkey"].to_numpy(zero_copy_only=False)
    base = orders["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
    conv = np.char.add("o", keys.astype(str)).astype(object)
    n, t = len(keys), 4
    i = np.tile(np.arange(t, dtype=np.int64), n)
    idx = i.copy()
    dup = np.repeat(keys % 6 == 0, t) & (i == 3)
    idx[dup] = 2
    role = np.tile(["user", "agent", "user", "agent"], n).astype(object)
    brk = np.repeat(keys % 6 == 3, t) & (i == 2)
    role[brk] = "agent"
    tx = pa.table(
        {
            "conv_id": pa.array(np.repeat(conv, t), pa.string()),
            "turn_idx": pa.array(idx.astype(np.int32), pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(np.full(n * t, "x", object), pa.string()),
            "tool": pa.array(np.full(n * t, "", object), pa.string()),
            "ts": pa.array(np.repeat(base, t), pa.timestamp("us")),
        }
    )
    base_dir = f"/tmp/graft_structure_{os.path.basename(os.path.normpath(sf_dir))}"
    os.makedirs(base_dir, exist_ok=True)
    path = f"{base_dir}/transcripts.parquet"
    tmp = path + ".tmp"
    pq.write_table(tx, tmp, row_group_size=25_000)
    os.replace(tmp, path)
    return path


def _conv_structure_planted(sf_dir: str):
    """Hash-checkable dialogue-structure lint: exactly the planted
    turn-index faults (orderkey%6==0) and alternation faults
    (orderkey%6==3) must flag."""
    from import_ray.pipelines.kg import conv_structure_check

    return conv_structure_check(_conv_structure_fixture(sf_dir))


CONV_STRUCTURE_PLANTED_SQL = """
SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS conv_id,
       CAST(4 AS BIGINT) AS n_turns,
       o_orderkey % 6 <> 0 AS idx_ok,
       o_orderkey % 6 <> 3 AS alternation_ok
FROM orders
"""


def _conv_sessions_bulk(sf_dir: str):
    """Sessionization over the real synthesized transcript corpus
    (rows-only: corpus ts patterns aren't SQL-visible)."""
    from import_ray.pipelines.kg import conv_sessions
    from import_ray.sources.transcripts import ensure_transcripts

    return conv_sessions(ensure_transcripts(sf_dir), gap_minutes=90)


def _conv_structure_bulk(sf_dir: str):
    """Structure lint over the real synthesized transcript corpus
    (rows-only)."""
    from import_ray.pipelines.kg import conv_structure_check
    from import_ray.sources.transcripts import ensure_transcripts

    return conv_structure_check(ensure_transcripts(sf_dir))


def _prefix_fixture(sf_dir: str) -> str:
    """Transcript fixture for prefix grouping: turn 0 is one of four
    shared system prompts (orderkey mod 4); later turns are per-conv
    unique."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    keys = orders["o_orderkey"].to_numpy(zero_copy_only=False)
    ts = orders["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
    conv = np.char.add("o", keys.astype(str)).astype(object)
    n, t = len(keys), 3
    t0 = np.char.add("sys v", (keys % 4).astype(str)).astype(object)
    t1 = np.char.add("u", keys.astype(str)).astype(object)
    t2 = np.char.add("r", keys.astype(str)).astype(object)
    tx = pa.table(
        {
            "conv_id": pa.array(np.repeat(conv, t), pa.string()),
            "turn_idx": pa.array(
                np.tile(np.arange(t, dtype=np.int32), n), pa.int32()
            ),
            "role": pa.array(np.tile(["system", "user", "agent"], n), pa.string()),
            "text": pa.array(
                np.column_stack([t0, t1, t2]).ravel().astype(object), pa.string()
            ),
            "tool": pa.array(np.full(n * t, "", object), pa.string()),
            "ts": pa.array(np.repeat(ts, t), pa.timestamp("us")),
        }
    )
    base_dir = f"/tmp/graft_prefix_{os.path.basename(os.path.normpath(sf_dir))}"
    os.makedirs(base_dir, exist_ok=True)
    path = f"{base_dir}/transcripts.parquet"
    tmp = path + ".tmp"
    pq.write_table(tx, tmp, row_group_size=25_000)
    os.replace(tmp, path)
    return path


def _conv_prefix_planted(sf_dir: str):
    """Hash-checkable prefix grouping: conversations sharing a first
    turn collapse into exactly the four planted system-prompt groups
    (pipelines/kg.conv_prefix_groups)."""
    from import_ray.pipelines.kg import conv_prefix_groups

    return conv_prefix_groups(_prefix_fixture(sf_dir), k_turns=1, min_convs=2)


CONV_PREFIX_PLANTED_SQL = """
SELECT MIN('o' || CAST(o_orderkey AS VARCHAR)) AS conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM orders GROUP BY o_orderkey % 4
"""


def _sft_pairs_planted(sf_dir: str):
    """Hash-checkable SFT pair extraction: over the 3-turn prefix
    fixture, each conversation yields exactly one (prompt, response)
    pair whose prompt is the role-prefixed join of the two preceding
    turns (stages/sft.sft_pairs)."""
    from import_ray.stages.sft import sft_pairs

    return sft_pairs(_prefix_fixture(sf_dir), context_turns=2)


SFT_PAIRS_PLANTED_SQL = """
SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS conv_id,
       CAST(2 AS BIGINT) AS turn_idx,
       'system: sys v' || CAST(o_orderkey % 4 AS VARCHAR) || chr(10) ||
         'user: u' || CAST(o_orderkey AS VARCHAR) AS prompt,
       'r' || CAST(o_orderkey AS VARCHAR) AS response
FROM orders
"""


def _sft_pairs_bulk(sf_dir: str):
    """SFT pair extraction over the real synthesized corpus (rows-only;
    the corpus's responding role is 'assistant')."""
    from import_ray.sources.transcripts import ensure_transcripts
    from import_ray.stages.sft import sft_pairs

    return sft_pairs(ensure_transcripts(sf_dir), response_role="assistant")


def _kge_triple_fixture(sf_dir: str):
    """SQL-regenerable triple store for KGE negative sampling: subject
    's'||(k%5), predicate 'p'||((k//5)%3), object 'e'||((k//15) %
    (2+k%5)) — the per-subject object modulus varies, so different
    (s,p) pairs have DIFFERENT true-object sets and the filtered
    negatives genuinely exercise the NOT EXISTS."""
    import ray.data

    def emit(batch):
        import numpy as np
        import pyarrow as pa

        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.char.add("s", (k % 5).astype(str)).astype(object)
        p = np.char.add("p", ((k // 5) % 3).astype(str)).astype(object)
        o = np.char.add("e", ((k // 15) % (2 + k % 5)).astype(str)).astype(object)
        return pa.table(
            {
                "subject_id": pa.array(s, pa.string()),
                "predicate": pa.array(p, pa.string()),
                "object_id": pa.array(o, pa.string()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    ).map_batches(emit, batch_format="pyarrow")


_KGE_VOCAB = [f"e{i}" for i in range(9)]


def _kge_negatives_planted(sf_dir: str):
    """Hash-checkable filtered KGE negatives, exhaustive mode: distinct
    (s,p) × a fixed 9-entity vocab minus true statements
    (stages/kge.kge_negatives_exhaustive) vs a SQL CROSS JOIN + NOT
    EXISTS regeneration."""
    from import_ray.stages.kge import kge_negatives_exhaustive

    return kge_negatives_exhaustive(_kge_triple_fixture(sf_dir), _KGE_VOCAB)


KGE_NEGATIVES_PLANTED_SQL = """
WITH T AS (
  SELECT DISTINCT 's' || CAST(o_orderkey % 5 AS VARCHAR) AS s,
                  'p' || CAST((o_orderkey // 5) % 3 AS VARCHAR) AS p,
                  'e' || CAST((o_orderkey // 15) % (2 + o_orderkey % 5) AS VARCHAR) AS o
  FROM orders
),
SP AS (SELECT DISTINCT s, p FROM T),
V AS (SELECT * FROM (VALUES ('e0'),('e1'),('e2'),('e3'),('e4'),('e5'),('e6'),('e7'),('e8')) AS vv(e))
SELECT SP.s AS subject_id, SP.p AS predicate, V.e AS neg_object
FROM SP CROSS JOIN V
WHERE NOT EXISTS (
  SELECT 1 FROM T WHERE T.s = SP.s AND T.p = SP.p AND T.o = V.e
)
"""


def _kge_negatives_sampled_bulk(sf_dir: str):
    """Sampled filtered KGE negatives over the same planted store
    (rows-only: the splitmix64 corruption draw is not SQL-expressible;
    determinism and the filtered property are pinned in
    tests/test_kge.py)."""
    from import_ray.stages.kge import kge_negatives_sampled

    return kge_negatives_sampled(
        _kge_triple_fixture(sf_dir), _KGE_VOCAB, k=3, seed=7
    )


def _preference_pairs_planted(sf_dir: str):
    """Hash-checkable DPO preference-pair extraction: over the shared
    system-prompt fixture, each of the four prompt groups yields one
    (chosen, rejected) pair by response length with deterministic
    conv_id tie-breaks (stages/sft.preference_pairs) — vs a SQL
    ROW_NUMBER window regeneration."""
    from import_ray.stages.sft import preference_pairs

    return preference_pairs(_prefix_fixture(sf_dir), k_turns=1)


PREFERENCE_PAIRS_PLANTED_SQL = """
WITH C AS (
  SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS conv_id,
         'system: sys v' || CAST(o_orderkey % 4 AS VARCHAR) AS prompt,
         'r' || CAST(o_orderkey AS VARCHAR) AS response
  FROM orders
),
R AS (
  SELECT *, LENGTH(response) AS score,
         ROW_NUMBER() OVER (PARTITION BY prompt
                            ORDER BY LENGTH(response) DESC, conv_id ASC) AS rn_hi,
         ROW_NUMBER() OVER (PARTITION BY prompt
                            ORDER BY LENGTH(response) ASC, conv_id DESC) AS rn_lo,
         COUNT(*) OVER (PARTITION BY prompt) AS n_candidates
  FROM C
)
SELECT hi.prompt AS prompt, hi.response AS chosen, lo.response AS rejected,
       CAST(hi.score AS BIGINT) AS chosen_score,
       CAST(lo.score AS BIGINT) AS rejected_score,
       CAST(hi.n_candidates AS BIGINT) AS n_candidates
FROM R hi JOIN R lo ON hi.prompt = lo.prompt
WHERE hi.rn_hi = 1 AND lo.rn_lo = 1 AND hi.n_candidates >= 2
"""


def _kg_scc_planted(sf_dir: str):
    """Hash-checkable strongly connected components: the permutation
    graph i → (i+8) mod 40 decomposes into eight 5-cycles, each an SCC
    labeled by its minimum node (stages/graph.
    strongly_connected_components) vs a recursive-CTE regeneration
    (min node reachable within the cycle)."""
    import ray.data

    from import_ray.stages.graph import strongly_connected_components

    def emit(batch):
        import numpy as np
        import pyarrow as pa

        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = k % 40
        return pa.table(
            {
                "src": pa.array(i, pa.int64()),
                "dst": pa.array((i + 8) % 40, pa.int64()),
            }
        )

    edges = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    ).map_batches(emit, batch_format="pyarrow")
    return strongly_connected_components(edges)


KG_SCC_PLANTED_SQL = """
WITH RECURSIVE E AS (
  SELECT DISTINCT o_orderkey % 40 AS src, (o_orderkey % 40 + 8) % 40 AS dst
  FROM orders
),
walk(start, cur, d) AS (
  SELECT src, src, 0 FROM (SELECT DISTINCT src FROM E)
  UNION ALL
  SELECT w.start, e.dst, w.d + 1 FROM walk w JOIN E e ON e.src = w.cur
  WHERE w.d < 6
)
SELECT CAST(start AS BIGINT) AS node, CAST(MIN(cur) AS BIGINT) AS scc_id
FROM walk GROUP BY start
"""


def _dag_levels_planted(sf_dir: str):
    """Hash-checkable DAG longest-path levels over the two-stride DAG
    i → i+5, i → i+7 on nodes 0..39 (stages/graph.dag_levels) vs a
    recursive-CTE max-depth regeneration."""
    import ray.data

    from import_ray.stages.graph import dag_levels

    def emit(batch):
        import numpy as np
        import pyarrow as pa

        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = k % 40
        src = np.concatenate([i[i + 5 < 40], i[i + 7 < 40]])
        dst = np.concatenate([i[i + 5 < 40] + 5, i[i + 7 < 40] + 7])
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    edges = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    ).map_batches(emit, batch_format="pyarrow")
    return dag_levels(edges)


DAG_LEVELS_PLANTED_SQL = """
WITH RECURSIVE E AS (
  SELECT DISTINCT o_orderkey % 40 AS src, o_orderkey % 40 + 5 AS dst
  FROM orders WHERE o_orderkey % 40 + 5 < 40
  UNION
  SELECT DISTINCT o_orderkey % 40 AS src, o_orderkey % 40 + 7 AS dst
  FROM orders WHERE o_orderkey % 40 + 7 < 40
),
N AS (SELECT DISTINCT src AS node FROM E UNION SELECT DISTINCT dst FROM E),
p(node, d) AS (
  SELECT node, 0 FROM N
  UNION ALL
  SELECT e.dst, p.d + 1 FROM p JOIN E e ON e.src = p.node WHERE p.d < 16
)
SELECT CAST(node AS BIGINT) AS node, CAST(MAX(d) AS BIGINT) AS level
FROM p GROUP BY node
"""


def _alias_fixture(sf_dir: str) -> str:
    """Transcript fixture for alias mining: each conv's single turn
    mentions 'see geoId:<k%7> (Place<k%5>)' — all 35 (entity, alias)
    combos appear with SQL-regenerable counts."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    keys = orders["o_orderkey"].to_numpy(zero_copy_only=False)
    ts = orders["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
    conv = np.char.add("o", keys.astype(str)).astype(object)
    text = np.char.add(
        np.char.add("see geoId:", (keys % 7).astype(str)),
        np.char.add(" (Place", np.char.add((keys % 5).astype(str), ")")),
    ).astype(object)
    n = len(keys)
    tx = pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(np.zeros(n, np.int32), pa.int32()),
            "role": pa.array(np.full(n, "user", object), pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(np.full(n, "", object), pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    base_dir = f"/tmp/graft_alias_{os.path.basename(os.path.normpath(sf_dir))}"
    os.makedirs(base_dir, exist_ok=True)
    path = f"{base_dir}/transcripts.parquet"
    tmp = path + ".tmp"
    pq.write_table(tx, tmp, row_group_size=25_000)
    os.replace(tmp, path)
    return path


def _alias_table_planted(sf_dir: str):
    """Hash-checkable entity alias-table mining: grouped (entity,
    surface form) mention counts over the planted fixture
    (stages/alias.alias_table) vs direct SQL regeneration."""
    from import_ray.stages.alias import alias_table

    return alias_table(_alias_fixture(sf_dir))


ALIAS_TABLE_PLANTED_SQL = """
SELECT 'geoId/' || CAST(o_orderkey % 7 AS VARCHAR) AS entity_id,
       'Place' || CAST(o_orderkey % 5 AS VARCHAR) AS alias,
       CAST(COUNT(*) AS BIGINT) AS n_mentions
FROM orders
GROUP BY 1, 2
"""


def _alias_table_bulk(sf_dir: str):
    """Alias table over the REAL synthesized corpus (rows-only): the
    gazetteer surface forms embedded in transcript texts surface as
    (dcid, name, count) rows."""
    from import_ray.sources.transcripts import ensure_transcripts
    from import_ray.stages.alias import alias_table

    return alias_table(ensure_transcripts(sf_dir))


_RETRIEVAL_TERMS = ["hash", "join", "spark", "window"]


def _tf_boolean_topk(sf_dir: str):
    """Hash-checkable boolean/tf retrieval: top-50 documents by
    (#distinct query terms matched, total tf, doc_id) — the
    integer-exact twin of BM25 (stages/retrieval.tf_boolean_topk)."""
    from import_ray.stages.retrieval import tf_boolean_topk

    return tf_boolean_topk(
        f"{sf_dir}/documents.parquet", _RETRIEVAL_TERMS, k=50
    )


TF_BOOLEAN_TOPK_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
hits AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM tok
  WHERE tok IN ('hash', 'join', 'spark', 'window')
  GROUP BY doc_id, tok
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_hits, SUM(tf) AS total_tf
  FROM hits GROUP BY doc_id
)
SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits,
       CAST(total_tf AS BIGINT) AS total_tf
FROM agg
ORDER BY n_hits DESC, total_tf DESC, doc_id ASC
LIMIT 50
"""


def _bm25_topk_docs(sf_dir: str):
    """Okapi BM25 top-20 over the documents table (rows-only: float64
    scores; DuckDB-formula parity pinned in tests/test_retrieval.py)."""
    from import_ray.stages.retrieval import bm25_topk

    return bm25_topk(f"{sf_dir}/documents.parquet", _RETRIEVAL_TERMS, k=20)


def _dense_ids_planted(sf_dir: str):
    """Hash-checkable dense-id assignment (the zipWithIndex primitive):
    97 multi-digit string values get their global LEXICAL dense rank
    with no global sort (stages/ids.dense_string_ids, prefix-histogram
    offsets) vs a SQL DENSE_RANK window."""
    import ray.data

    from import_ray.stages.ids import dense_string_ids

    def emit(batch):
        import numpy as np
        import pyarrow as pa

        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "value": pa.array(
                    np.char.add("v", (k % 97).astype(str)).astype(object),
                    pa.string(),
                )
            }
        )

    vals = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    ).map_batches(emit, batch_format="pyarrow")
    return dense_string_ids(vals)


DENSE_IDS_PLANTED_SQL = """
WITH V AS (
  SELECT DISTINCT 'v' || CAST(o_orderkey % 97 AS VARCHAR) AS value FROM orders
)
SELECT value, CAST(DENSE_RANK() OVER (ORDER BY value) - 1 AS BIGINT) AS id
FROM V
"""


def _pseudonymize_planted(sf_dir: str):
    """Hash-checkable consistent pseudonymization: every geoId mention
    in the alias fixture rewrites to ENT<dense id> — the same entity
    gets the same pseudonym corpus-wide (stages/ids.
    pseudonymize_mentions); the expected text is a pure SQL formula
    because single-digit dcids rank lexically = numerically."""
    from import_ray.stages.ids import pseudonymize_mentions

    return pseudonymize_mentions(_alias_fixture(sf_dir))


PSEUDONYMIZE_PLANTED_SQL = """
SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS conv_id,
       CAST(0 AS BIGINT) AS turn_idx,
       'see ENT' || CAST(o_orderkey % 7 AS VARCHAR) ||
         ' (Place' || CAST(o_orderkey % 5 AS VARCHAR) || ')' AS text
FROM orders
"""


def _kg_predicate_history_planted(sf_dir: str):
    """Hash-checkable temporal statement history (SCD2): per-(subject,
    predicate) value streams collapse into validity intervals
    (stages/triplestore.predicate_history) vs a SQL LAG/LEAD window
    regeneration. Subjects 'e'||(k%30) observe value 'v'||((k//30)%3)
    at ts o_orderdate — real runs, real ties."""
    import ray.data

    from import_ray.stages.triplestore import predicate_history

    def emit(batch):
        import numpy as np
        import pyarrow as pa

        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        )
        return pa.table(
            {
                "subject_id": pa.array(
                    np.char.add("e", (k % 30).astype(str)).astype(object), pa.string()
                ),
                "predicate": pa.array(np.full(len(k), "status", object), pa.string()),
                "object_value": pa.array(
                    np.char.add("v", ((k // 30) % 3).astype(str)).astype(object),
                    pa.string(),
                ),
                "ts": pa.array(ts, pa.timestamp("us")),
            }
        )

    stmts = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(emit, batch_format="pyarrow")
    return predicate_history(stmts)


KG_PREDICATE_HISTORY_PLANTED_SQL = """
WITH T AS (
  SELECT 'e' || CAST(o_orderkey % 30 AS VARCHAR) AS s,
         'status' AS p,
         'v' || CAST((o_orderkey // 30) % 3 AS VARCHAR) AS v,
         o_orderdate AS ts,
         o_orderkey AS okey
  FROM orders
),
-- okey makes the window order TOTAL: duplicate (ts, v) rows would
-- otherwise be permuted independently by the LAG and SUM passes,
-- splitting runs nondeterministically
S AS (SELECT *, LAG(v) OVER (PARTITION BY s, p ORDER BY ts, v, okey) AS pv FROM T),
C AS (SELECT *, CASE WHEN pv IS NULL OR pv <> v THEN 1 ELSE 0 END AS chg FROM S),
G AS (
  SELECT *, SUM(chg) OVER (PARTITION BY s, p ORDER BY ts, v, okey
                           ROWS UNBOUNDED PRECEDING) AS grp
  FROM C
),
R AS (
  SELECT s AS subject_id, p AS predicate, MIN(v) AS value,
         MIN(ts) AS valid_from
  FROM G GROUP BY s, p, grp
)
SELECT subject_id, predicate, value, valid_from,
       LEAD(valid_from) OVER (PARTITION BY subject_id, predicate
                              ORDER BY valid_from, value) AS valid_to
FROM R
"""


def _random_walks_planted(sf_dir: str):
    """Hash-checkable DeepWalk corpus: over a FUNCTIONAL graph (each
    node exactly one out-edge: n_i → n_{(7i+3) mod 40}) the walk is
    deterministic regardless of the RNG draw, so the corpus equals 3
    chained SQL self-joins (stages/graph.random_walks; multi-neighbor
    draws are pinned against a pure-Python walker in
    tests/test_random_walks.py)."""
    import ray.data

    from import_ray.stages.graph import random_walks

    def emit(batch):
        import numpy as np
        import pyarrow as pa

        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = k % 40
        return pa.table(
            {
                "src": pa.array(np.char.add("n", i.astype(str)).astype(object), pa.string()),
                "dst": pa.array(
                    np.char.add("n", ((i * 7 + 3) % 40).astype(str)).astype(object),
                    pa.string(),
                ),
            }
        )

    edges = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    ).map_batches(emit, batch_format="pyarrow")
    return random_walks(edges, walk_length=3, walks_per_node=1, seed=0)


RANDOM_WALKS_PLANTED_SQL = """
WITH E AS (
  SELECT DISTINCT 'n' || CAST(o_orderkey % 40 AS VARCHAR) AS src,
                  'n' || CAST(((o_orderkey % 40) * 7 + 3) % 40 AS VARCHAR) AS dst
  FROM orders
),
S AS (SELECT DISTINCT src FROM E)
SELECT src || '#0' AS walk_key, CAST(0 AS BIGINT) AS step, src AS node FROM S
UNION ALL
SELECT e1.src || '#0', CAST(1 AS BIGINT), e1.dst FROM E e1
UNION ALL
SELECT e1.src || '#0', CAST(2 AS BIGINT), e2.dst
FROM E e1 JOIN E e2 ON e2.src = e1.dst
UNION ALL
SELECT e1.src || '#0', CAST(3 AS BIGINT), e3.dst
FROM E e1 JOIN E e2 ON e2.src = e1.dst JOIN E e3 ON e3.src = e2.dst
"""


def _random_walks_kg(sf_dir: str):
    """DeepWalk corpus over the REAL transcripts KG entity-reference
    graph (rows-only: multi-neighbor draws aren't SQL-expressible;
    determinism pinned in tests). The skip-gram training input for
    graph embeddings over this engine's own output."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from import_ray.pipelines.kg import build_triples
    from import_ray.sources.transcripts import ensure_transcripts
    from import_ray.stages.graph import random_walks

    def to_edges(batch):
        obj = batch["object_id"]
        if isinstance(obj, pa.ChunkedArray):
            obj = obj.combine_chunks()
        keep = pc.and_(
            pc.and_(obj.is_valid(), pc.not_equal(obj, "")),
            pc.not_equal(obj, batch["subject_id"]),
        )
        t = batch.filter(pc.fill_null(keep, False))
        return pa.table(
            {
                "src": pc.cast(t["subject_id"], pa.large_string()),
                "dst": pc.cast(t["object_id"], pa.large_string()),
            }
        )

    triples = build_triples(ensure_transcripts(sf_dir))
    edges = triples.map_batches(to_edges, batch_format="pyarrow")
    return random_walks(edges, walk_length=4, walks_per_node=1, seed=0)


def _alignment_side(sf_dir: str, side: int):
    """Synthetic triple snapshot for predicate alignment: side A carries
    predicates p0..p3 with object sets {obj<j>_0..99} (orderkey mod
    100); side B carries the SAME object sets under renamed predicates
    q0..q3, plus qh — a half-width subset of p0's objects (mod 50) →
    Jaccard exactly 0.5."""
    import ray.data

    def emit(batch):
        import numpy as np
        import pyarrow as pa

        keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        preds, objs = [], []
        base = "p" if side == 0 else "q"
        for j in range(4):
            preds.append(np.full(len(keys), f"{base}{j}", object))
            objs.append(
                np.char.add(f"obj{j}_", (keys % 100).astype(str)).astype(object)
            )
        if side == 1:
            preds.append(np.full(len(keys), "qh", object))
            objs.append(
                np.char.add("obj0_", (keys % 50).astype(str)).astype(object)
            )
        p = np.concatenate(preds)
        o = np.concatenate(objs)
        n = len(p)
        return pa.table(
            {
                "subject_id": pa.array(np.full(n, "s", object), pa.string()),
                "predicate": pa.array(p, pa.string()),
                "object_id": pa.array([None] * n, pa.string()),
                "object_value": pa.array(o, pa.large_string()),
                "provenance": pa.array(np.full(n, "x", object), pa.string()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    ).map_batches(emit, batch_format="pyarrow")


def _kg_alignment_planted(sf_dir: str):
    """Hash-checkable predicate alignment: renamed predicates recover
    their originals at Jaccard 1.0, and the planted half-subset
    predicate matches at exactly 0.5
    (stages/triplestore.predicate_alignment)."""
    from import_ray.stages.triplestore import predicate_alignment

    return predicate_alignment(
        _alignment_side(sf_dir, 0), _alignment_side(sf_dir, 1), min_jaccard=0.5
    )


KG_ALIGNMENT_PLANTED_SQL = """
SELECT 'q' || CAST(r.i AS VARCHAR) AS pred_b,
       'p' || CAST(r.i AS VARCHAR) AS pred_a, 1.0 AS jaccard
FROM range(4) r(i)
UNION ALL SELECT 'qh', 'p0', 0.5
"""


def _tq_fixture(sf_dir: str, kind: str) -> str:
    """Transcript fixtures for the transcript-quality operators.
    kind='echo': agent turn repeats the user turn verbatim for
    orderkey%5==0 convs, disjoint vocab otherwise. kind='boiler':
    agent turn is one fixed template string for orderkey%3==0 convs,
    a per-conv unique string otherwise."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    keys = orders["o_orderkey"].to_numpy(zero_copy_only=False)
    ts = orders["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
    conv = np.char.add("o", keys.astype(str)).astype(object)
    n = len(keys)
    user = np.char.add("alpha beta u", keys.astype(str)).astype(object)
    if kind == "echo":
        uniq = np.char.add(np.char.add("gamma", keys.astype(str)), " delta").astype(
            object
        )
        agent = np.where(keys % 5 == 0, user, uniq)
    else:
        uniq = np.char.add("resp ", keys.astype(str)).astype(object)
        agent = np.where(
            keys % 3 == 0,
            np.full(n, "Thank you for contacting support.", object),
            uniq,
        )
    tx = pa.table(
        {
            "conv_id": pa.array(np.repeat(conv, 2), pa.string()),
            "turn_idx": pa.array(np.tile([0, 1], n).astype(np.int32), pa.int32()),
            "role": pa.array(np.tile(["user", "agent"], n), pa.string()),
            "text": pa.array(
                np.column_stack([user, agent]).ravel().astype(object), pa.string()
            ),
            "tool": pa.array(np.full(2 * n, "", object), pa.string()),
            "ts": pa.array(np.repeat(ts, 2), pa.timestamp("us")),
        }
    )
    base_dir = f"/tmp/graft_tq_{kind}_{os.path.basename(os.path.normpath(sf_dir))}"
    os.makedirs(base_dir, exist_ok=True)
    path = f"{base_dir}/transcripts.parquet"
    tmp = path + ".tmp"
    pq.write_table(tx, tmp, row_group_size=25_000)
    os.replace(tmp, path)
    return path


def _echo_rate_planted(sf_dir: str):
    """Hash-checkable echo detection: exactly the orderkey%5==0
    conversations (agent turn == user turn) score echo_rate 1.0, all
    others 0.0 (stages/transcript_quality.turn_echo_rate)."""
    from import_ray.stages.transcript_quality import turn_echo_rate

    return turn_echo_rate(_tq_fixture(sf_dir, "echo"))


ECHO_RATE_PLANTED_SQL = """
SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS conv_id,
       CAST(1 AS BIGINT) AS n_pairs,
       CASE WHEN o_orderkey % 5 = 0 THEN 1.0 ELSE 0.0 END AS echo_rate
FROM orders
"""


def _boilerplate_planted(sf_dir: str):
    """Hash-checkable boilerplate mining: only the planted template
    string repeats across ≥10 distinct conversations
    (stages/transcript_quality.boilerplate_turns)."""
    from import_ray.stages.transcript_quality import boilerplate_turns

    return boilerplate_turns(_tq_fixture(sf_dir, "boiler"), min_convs=10)


BOILERPLATE_PLANTED_SQL = """
SELECT 'Thank you for contacting support.' AS text,
       CAST(COUNT(*) AS BIGINT) AS n_convs
FROM orders WHERE o_orderkey % 3 = 0
"""


def _echo_rate_bulk(sf_dir: str):
    """Echo rate over the real synthesized corpus (rows-only)."""
    from import_ray.sources.transcripts import ensure_transcripts
    from import_ray.stages.transcript_quality import turn_echo_rate

    return turn_echo_rate(ensure_transcripts(sf_dir))


def _kg_snapshot_planted(sf_dir: str):
    """Time-travel snapshot, hash-checked: the as-of rebuild over the
    planted fixture at a mid-corpus cutoff must equal the SQL
    regeneration restricted to orders at or before the cutoff —
    including the conversation-level aggregates (turnCount, start/end,
    lastTurnNumber), whose 2-turn values the oracle can state. Only the
    ``turnChecksum`` triple is filtered (a 64-bit content hash, not
    SQL-expressible; its semantics are pinned by pytest parity in
    test_kg_pipeline.py)."""
    import pyarrow as pa

    from import_ray.pipelines.kg import kg_snapshot_asof

    snap = kg_snapshot_asof(
        _kg_planted_fixture(sf_dir), cutoff="1995-06-15T00:00:00"
    )

    def drop_checksum(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.not_equal(b["predicate"], "turnChecksum"))

    return snap.map_batches(drop_checksum, batch_format="pyarrow")


KG_TRIPLES_PLANTED_SQL = """
WITH o AS (
  SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS conv,
         'R' || CAST(o_orderkey % 7 AS VARCHAR) AS code,
         -- pyarrow strftime's %S includes fractional seconds for
         -- microsecond-unit timestamps; DuckDB needs explicit .%f
         strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%f') AS st
  FROM orders
), turns AS (
  SELECT conv, code, st, 0 AS i, 'user' AS role,
         'please check region isoCode:' || code AS txt,
         NULL AS tool FROM o
  UNION ALL
  SELECT conv, code, st, 1, 'agent', 'done', 'lookup' FROM o
), subj AS (
  SELECT 'conv/' || conv || '/t' || CAST(i AS VARCHAR) AS s, * FROM turns
)
SELECT s AS subject_id, 'typeOf' AS predicate,
       'ConversationTurn' AS object_id, NULL AS object_value,
       'transcripts' AS provenance FROM subj
UNION ALL SELECT s, 'partOf', 'conv/' || conv, NULL, 'transcripts' FROM subj
UNION ALL SELECT s, 'turnNumber', NULL, CAST(i AS VARCHAR), 'transcripts' FROM subj
UNION ALL SELECT s, 'role', NULL, role, 'transcripts' FROM subj
UNION ALL SELECT s, 'text', NULL, txt, 'transcripts' FROM subj
UNION ALL SELECT s, 'startTime', NULL, st, 'transcripts' FROM subj
UNION ALL SELECT s, 'tool', NULL, tool, 'transcripts' FROM subj WHERE tool IS NOT NULL
UNION ALL SELECT s, 'mentionsPlace', 'iso/' || code, NULL, 'transcripts'
  FROM subj WHERE i = 0
UNION ALL SELECT DISTINCT 'iso/' || code, 'typeOf', 'Place', NULL, 'transcripts'
  FROM o
UNION ALL SELECT DISTINCT 'iso/' || code, 'isoCode', NULL, code, 'transcripts'
  FROM o
"""

KG_UPSERT_PLANTED_SQL = f"""
WITH base AS ({KG_TRIPLES_PLANTED_SQL}),
touched AS (
  SELECT 'conv/o' || CAST(o_orderkey AS VARCHAR) || '/t0' AS s
  FROM orders WHERE o_orderkey % 5 = 0
)
SELECT b.subject_id, b.predicate, b.object_id,
       CASE WHEN b.predicate = 'text' AND t.s IS NOT NULL
            THEN 'REVISED' ELSE b.object_value END AS object_value,
       CASE WHEN b.predicate = 'text' AND t.s IS NOT NULL
            THEN 'delta' ELSE b.provenance END AS provenance
FROM base b LEFT JOIN touched t ON b.subject_id = t.s
UNION ALL
SELECT s, 'revisedBy', NULL, 'editor', 'delta' FROM touched
"""

KG_CONFLICTS_PLANTED_SQL = """
SELECT 'conv/o' || CAST(o_orderkey AS VARCHAR) || '/t0' AS subject_id,
       'role' AS predicate, CAST(2 AS BIGINT) AS n_objects
FROM orders WHERE o_orderkey % 4 = 0
"""


def _kg_graph_planted(sf_dir: str):
    """Closed-form ground truth for the distributed graph stack: a
    transcript fixture whose conversations each mention places
    {R_i, R_i+1, R_i+2} (i = orderkey mod 7) yields the circulant
    co-mention graph C7(1,2) — 7 nodes, 14 edges, 4-regular, exactly
    7 triangles, one component, a full 2-core, and a UNIFORM PageRank
    fixed point (1/7 per node, exact for any regular graph). The real
    pipelines run end-to-end (extraction → dedup → co-mention clique
    expansion → triangles / components / k-core / PageRank over keyed
    exchanges); the oracle states the closed-form values."""
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from import_ray.pipelines.kg import build_triples
    from import_ray.stages.graph import (
        co_mention_edges,
        component_sizes,
        k_core,
        pagerank,
        triangle_count,
    )

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    keys = orders["o_orderkey"].to_numpy(zero_copy_only=False)
    ts = orders["o_orderdate"].to_numpy(zero_copy_only=False)
    a, b, c = keys % 7, (keys + 1) % 7, (keys + 2) % 7
    text = np.array(
        [
            f"see isoCode:R{x} isoCode:R{y} isoCode:R{z}"
            for x, y, z in zip(a, b, c)
        ],
        dtype=object,
    )
    tx = pa.table(
        {
            "conv_id": pa.array(np.char.add("g", keys.astype(str)), pa.string()),
            "turn_idx": pa.array(np.zeros(len(keys), np.int32), pa.int32()),
            "role": pa.array(np.full(len(keys), "user", object), pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(np.full(len(keys), "", object), pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    base = f"/tmp/graft_kg_graph_planted_{os.path.basename(os.path.normpath(sf_dir))}"
    os.makedirs(base, exist_ok=True)
    path = f"{base}/transcripts.parquet"
    tmp = path + ".tmp"
    pq.write_table(tx, tmp, row_group_size=25_000)
    os.replace(tmp, path)

    triples = build_triples(path, conv_aggregates=False)
    raw = co_mention_edges(triples)  # per-block unique; not global

    def edge_distinct(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )

    from import_ray.core.context import data_nparts

    edges = (
        raw.repartition(data_nparts(raw), keys=["doc_lo", "doc_hi"])
        .map_batches(edge_distinct, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    n_edges = edges.count()
    nodes = set()
    for batch in edges.iter_batches(batch_format="pyarrow"):
        nodes.update(batch["doc_lo"].to_pylist())
        nodes.update(batch["doc_hi"].to_pylist())
    tri = triangle_count(edges)
    comps = component_sizes(edges).to_pandas()
    core = k_core(edges, k=2).count()

    def swap(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_lo": batch["doc_hi"], "doc_hi": batch["doc_lo"]})

    sym = edges.union(edges.map_batches(swap, batch_format="pyarrow")).materialize()
    ranks = pagerank(sym, iterations=5).to_pandas()
    import math

    from import_ray.stages.graph import hits, k_hop_reach

    hs = hits(sym, iterations=5).to_pandas()  # regular graph → uniform 1/sqrt(7)
    hub = [int(math.floor(v * 1e6)) for v in hs["hub"]]
    auth = [int(math.floor(v * 1e6)) for v in hs["authority"]]
    # all 7 nodes are seeds (n_seeds > |V|); diameter 2 → per seed the
    # cumulative reach is 1, 5, 7, 7 across hops 0..3
    reach = k_hop_reach(edges, n_seeds=8, max_hops=3)
    reach_tot = reach.groupby("hop", sort=True)["n_reached"].sum()

    rx = [int(math.floor(r * 1e6)) for r in ranks["rank"]]
    rows = [
        ("n_nodes", len(nodes)),
        ("n_edges", n_edges),
        ("triangles", tri),
        ("n_components", len(comps)),
        ("largest_component", int(comps["size"].max())),
        ("core2_nodes", core),
        ("pagerank_min_x1e6", min(rx)),
        ("pagerank_max_x1e6", max(rx)),
        ("hub_min_x1e6", min(hub)),
        ("hub_max_x1e6", max(hub)),
        ("auth_min_x1e6", min(auth)),
        ("auth_max_x1e6", max(auth)),
        ("reach_hop0_total", int(reach_tot.get(0, 0))),
        ("reach_hop1_total", int(reach_tot.get(1, 0))),
        ("reach_hop2_total", int(reach_tot.get(2, 0))),
        ("reach_hop3_total", int(reach_tot.get(3, 0))),
    ]
    out = pd.DataFrame(rows, columns=["metric", "value"])
    out["value"] = out["value"].astype("int64")
    return out


KG_SNAPSHOT_PLANTED_SQL = """
WITH o AS (
  SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS conv,
         'R' || CAST(o_orderkey % 7 AS VARCHAR) AS code,
         -- turn triples: pyarrow strftime prints fractional seconds
         strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%f') AS st,
         -- conversation aggregates: pandas strftime does not
         strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS stc
  FROM orders WHERE o_orderdate <= TIMESTAMP '1995-06-15 00:00:00'
), turns AS (
  SELECT conv, code, st, 0 AS i, 'user' AS role,
         'please check region isoCode:' || code AS txt,
         NULL AS tool FROM o
  UNION ALL
  SELECT conv, code, st, 1, 'agent', 'done', 'lookup' FROM o
), subj AS (
  SELECT 'conv/' || conv || '/t' || CAST(i AS VARCHAR) AS s, * FROM turns
)
SELECT s AS subject_id, 'typeOf' AS predicate,
       'ConversationTurn' AS object_id, NULL AS object_value,
       'transcripts' AS provenance FROM subj
UNION ALL SELECT s, 'partOf', 'conv/' || conv, NULL, 'transcripts' FROM subj
UNION ALL SELECT s, 'turnNumber', NULL, CAST(i AS VARCHAR), 'transcripts' FROM subj
UNION ALL SELECT s, 'role', NULL, role, 'transcripts' FROM subj
UNION ALL SELECT s, 'text', NULL, txt, 'transcripts' FROM subj
UNION ALL SELECT s, 'startTime', NULL, st, 'transcripts' FROM subj
UNION ALL SELECT s, 'tool', NULL, tool, 'transcripts' FROM subj WHERE tool IS NOT NULL
UNION ALL SELECT s, 'mentionsPlace', 'iso/' || code, NULL, 'transcripts'
  FROM subj WHERE i = 0
UNION ALL SELECT DISTINCT 'iso/' || code, 'typeOf', 'Place', NULL, 'transcripts'
  FROM o
UNION ALL SELECT DISTINCT 'iso/' || code, 'isoCode', NULL, code, 'transcripts'
  FROM o
UNION ALL SELECT 'conv/' || conv, 'typeOf', 'Conversation', NULL, 'transcripts' FROM o
UNION ALL SELECT 'conv/' || conv, 'turnCount', NULL, '2', 'transcripts' FROM o
UNION ALL SELECT 'conv/' || conv, 'startTime', NULL, stc, 'transcripts' FROM o
UNION ALL SELECT 'conv/' || conv, 'endTime', NULL, stc, 'transcripts' FROM o
UNION ALL SELECT 'conv/' || conv, 'lastTurnNumber', NULL, '1', 'transcripts' FROM o
"""


KG_GRAPH_PLANTED_SQL = """
SELECT 'n_nodes' AS metric, CAST(7 AS BIGINT) AS value
UNION ALL SELECT 'n_edges', 14
UNION ALL SELECT 'triangles', 7
UNION ALL SELECT 'n_components', 1
UNION ALL SELECT 'largest_component', 7
UNION ALL SELECT 'core2_nodes', 7
UNION ALL SELECT 'pagerank_min_x1e6', 142857
UNION ALL SELECT 'pagerank_max_x1e6', 142857
UNION ALL SELECT 'hub_min_x1e6', 377964
UNION ALL SELECT 'hub_max_x1e6', 377964
UNION ALL SELECT 'auth_min_x1e6', 377964
UNION ALL SELECT 'auth_max_x1e6', 377964
UNION ALL SELECT 'reach_hop0_total', 7
UNION ALL SELECT 'reach_hop1_total', 35
UNION ALL SELECT 'reach_hop2_total', 49
UNION ALL SELECT 'reach_hop3_total', 49
"""


def _planted_conv_fixture(sf_dir: str) -> str:
    """Shared conversation fixture for the conv-family oracles, derived
    deterministically from ``orders``: one 4-turn conversation
    ``p<orderkey>`` per order (roles user/agent/user/agent, tools
    ''/search/''/calc, texts ``t<i> o<k>``, ts = o_orderdate + 60 s per
    turn) plus, for every 10th order, a byte-identical duplicate
    conversation ``q<k>`` (same role/text sequence; 'p' < 'q' so the
    original always wins dedup). Every per-conv quantity is
    SQL-regenerable from orders."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    keys = orders["o_orderkey"].to_numpy(zero_copy_only=False)
    ts0 = orders["o_orderdate"].to_numpy(zero_copy_only=False)

    def conv_rows(prefix: str, ks: np.ndarray, t0: np.ndarray):
        n = len(ks)
        conv = np.char.add(prefix, ks.astype(str)).astype(object)
        texts = np.empty((n, 4), object)
        for i in range(4):
            texts[:, i] = np.char.add(f"t{i} o", ks.astype(str)).astype(object)
        ts = (t0[:, None] + (np.arange(4) * np.timedelta64(60, "s"))).ravel()
        return pa.table(
            {
                "conv_id": pa.array(np.repeat(conv, 4), pa.string()),
                "turn_idx": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
                "role": pa.array(
                    np.tile(["user", "agent", "user", "agent"], n), pa.string()
                ),
                "text": pa.array(texts.ravel(), pa.string()),
                "tool": pa.array(np.tile(["", "search", "", "calc"], n), pa.string()),
                "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
            }
        )

    dup = keys % 10 == 0
    tx = pa.concat_tables(
        [conv_rows("p", keys, ts0), conv_rows("q", keys[dup], ts0[dup])]
    )
    base = f"/tmp/graft_conv_planted_{os.path.basename(os.path.normpath(sf_dir))}"
    os.makedirs(base, exist_ok=True)
    path = f"{base}/transcripts.parquet"
    tmp = path + ".tmp"
    pq.write_table(tx, tmp, row_group_size=25_000)
    os.replace(tmp, path)
    return path


def _kg_diff_planted(sf_dir: str):
    """Incremental-delta oracle: previous snapshot drops conversations
    of EVEN orderkeys (SQL-expressible, unlike the default hash-mod
    subset), so the delta is exactly the even-order convs' turn-level
    triples, all ADDED. Place nodes appear in both snapshots (odd keys
    cover every residue mod 7) and cancel. Runs the real two-build
    keyed-diff pipeline with conversation aggregates off."""
    import pyarrow as pa

    from import_ray.pipelines.kg import kg_triple_diff

    def drop_even(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch["conv_id"].to_pandas().str[1:].astype(np.int64)
        return batch.filter(pa.array((ids % 2 != 0).to_numpy()))

    return kg_triple_diff(
        _kg_planted_fixture(sf_dir),
        prev_filter=drop_even,
        conv_aggregates=False,
    )


KG_DIFF_PLANTED_SQL = """
WITH o AS (
  SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS conv,
         'R' || CAST(o_orderkey % 7 AS VARCHAR) AS code,
         strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%f') AS st
  FROM orders WHERE o_orderkey % 2 = 0
), turns AS (
  SELECT conv, code, st, 0 AS i, 'user' AS role,
         'please check region isoCode:' || code AS txt,
         NULL AS tool FROM o
  UNION ALL
  SELECT conv, code, st, 1, 'agent', 'done', 'lookup' FROM o
), subj AS (
  SELECT 'conv/' || conv || '/t' || CAST(i AS VARCHAR) AS s, * FROM turns
), keys AS (
  SELECT s || '|typeOf|ConversationTurn|' AS key FROM subj
  UNION ALL SELECT s || '|partOf|conv/' || conv || '|' FROM subj
  UNION ALL SELECT s || '|turnNumber||' || CAST(i AS VARCHAR) FROM subj
  UNION ALL SELECT s || '|role||' || role FROM subj
  UNION ALL SELECT s || '|text||' || txt FROM subj
  UNION ALL SELECT s || '|startTime||' || st FROM subj
  UNION ALL SELECT s || '|tool||' || tool FROM subj WHERE tool IS NOT NULL
  UNION ALL SELECT s || '|mentionsPlace|iso/' || code || '|' FROM subj WHERE i = 0
)
SELECT key, 'x' AS value_current, '' AS value_previous, 'ADDED' AS diff FROM keys
"""


def _kg_predicate_counts_planted(sf_dir: str):
    """Predicate fanout over the planted fixture — every count is an
    exact function of COUNT(orders)."""
    from import_ray.pipelines.kg import build_triples
    from import_ray.stages.graph import predicate_counts

    return predicate_counts(
        build_triples(_kg_planted_fixture(sf_dir), conv_aggregates=False)
    ).sort("predicate")


KG_PRED_COUNTS_PLANTED_SQL = """
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM orders)
SELECT 'typeOf' AS predicate, 2*c + 7 AS n_triples FROM n
UNION ALL SELECT 'partOf', 2*c FROM n
UNION ALL SELECT 'turnNumber', 2*c FROM n
UNION ALL SELECT 'role', 2*c FROM n
UNION ALL SELECT 'text', 2*c FROM n
UNION ALL SELECT 'startTime', 2*c FROM n
UNION ALL SELECT 'tool', c FROM n
UNION ALL SELECT 'mentionsPlace', c FROM n
UNION ALL SELECT 'isoCode', CAST(7 AS BIGINT) FROM n
ORDER BY predicate
"""


def _kg_conv_stats_planted(sf_dir: str):
    """Per-conversation KG yield over the planted fixture: every conv
    emits exactly 20 triples (14 turn-level + 6 conversation
    aggregates), 6 entity links, 4 distinct linked entities."""
    from import_ray.pipelines.kg import conv_kg_stats

    return conv_kg_stats(_kg_planted_fixture(sf_dir)).sort("conv_id")


KG_CONV_STATS_PLANTED_SQL = """
SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS conv_id,
       CAST(20 AS BIGINT) AS n_triples,
       CAST(6 AS BIGINT) AS n_entity_links,
       CAST(4 AS BIGINT) AS n_distinct_entities
FROM orders ORDER BY conv_id
"""


def _kg_type_profile_planted(sf_dir: str):
    """Induced ontology (predicate → subject-type × object-type counts)
    over the planted fixture: partOf links every turn (ConversationTurn)
    to its conversation (Conversation), mentionsPlace links turn 0 to a
    Place — both closed-form in COUNT(orders)."""
    from import_ray.pipelines.kg import build_triples
    from import_ray.stages.graph import predicate_type_profile

    return predicate_type_profile(build_triples(_kg_planted_fixture(sf_dir)))


KG_TYPE_PROFILE_PLANTED_SQL = """
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM orders)
SELECT 'mentionsPlace' AS predicate, 'ConversationTurn' AS subject_type,
       'Place' AS object_type, c AS n_triples FROM n
UNION ALL
SELECT 'partOf', 'ConversationTurn', 'Conversation', 2*c FROM n
ORDER BY predicate
"""


def _kg_two_hop_planted(sf_dir: str):
    """SPARQL-BGP 2-hop self-join over the planted fixture: which
    conversations mention which places, via the shared turn subject
    (?t partOf ?conv . ?t mentionsPlace ?place) — exactly one pair per
    order, regenerable by SQL."""
    from import_ray.pipelines.kg import build_triples
    from import_ray.stages.graph import two_hop_pattern

    return two_hop_pattern(
        build_triples(_kg_planted_fixture(sf_dir), conv_aggregates=False),
        "partOf",
        "mentionsPlace",
    )


KG_TWO_HOP_PLANTED_SQL = """
SELECT 'conv/o' || CAST(o_orderkey AS VARCHAR) AS left_object,
       'iso/R' || CAST(o_orderkey % 7 AS VARCHAR) AS right_object,
       CAST(1 AS BIGINT) AS n_pairs
FROM orders
"""


def _kg_shapes_planted(sf_dir: str):
    """Cardinality shape validation over the planted fixture: tool is
    present on exactly one of each conversation's two turns, and
    mentionsPlace on the other — so requiring each on every turn yields
    exactly COUNT(orders) missing subjects; role/turnCount/isoCode
    shapes hold everywhere."""
    from import_ray.pipelines.kg import build_triples
    from import_ray.stages.graph import shape_violations

    shapes = [
        {"type": "ConversationTurn", "predicate": "tool", "min_count": 1, "max_count": 1},
        {"type": "ConversationTurn", "predicate": "mentionsPlace", "min_count": 1, "max_count": 1},
        {"type": "ConversationTurn", "predicate": "role", "min_count": 1, "max_count": 1},
        {"type": "Conversation", "predicate": "turnCount", "min_count": 1, "max_count": 1},
        {"type": "Place", "predicate": "isoCode", "min_count": 1, "max_count": 1},
    ]
    return shape_violations(build_triples(_kg_planted_fixture(sf_dir)), shapes)


KG_SHAPES_PLANTED_SQL = """
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM orders)
SELECT 'Conversation' AS target_type, 'turnCount' AS predicate,
       CAST(0 AS BIGINT) AS n_missing, CAST(0 AS BIGINT) AS n_excess FROM n
UNION ALL SELECT 'ConversationTurn', 'mentionsPlace', c, 0 FROM n
UNION ALL SELECT 'ConversationTurn', 'role', 0, 0 FROM n
UNION ALL SELECT 'ConversationTurn', 'tool', c, 0 FROM n
UNION ALL SELECT 'Place', 'isoCode', 0, 0 FROM n
ORDER BY target_type, predicate
"""


def _editdist_names_fixture(sf_dir: str) -> str:
    """Names table derived from orders: groups of 4 ids share an
    md5-derived 12-hex base (pairwise far apart with overwhelming
    probability), with planted suffix/prefix mutations at distance
    1-3 within each group. Capped at id < 2400 so the oracle's full
    quadratic levenshtein join stays cheap."""
    import hashlib
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    orders = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    keys = orders["o_orderkey"].to_numpy(zero_copy_only=False)
    keys = np.sort(keys[keys < 2400])
    base = np.array(
        [hashlib.md5(str(k // 4).encode()).hexdigest()[:12] for k in keys],
        dtype=object,
    )
    m = keys % 4
    name = base.copy()
    name[m == 1] = base[m == 1] + "x"
    name[m == 2] = base[m == 2] + "xy"
    name[m == 3] = "q" + base[m == 3]
    tbl = pa.table(
        {"id": pa.array(keys, pa.int64()), "name": pa.array(name, pa.string())}
    )
    d = f"/tmp/graft_editdist_{os.path.basename(os.path.normpath(sf_dir))}"
    os.makedirs(d, exist_ok=True)
    path = f"{d}/names.parquet"
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp, row_group_size=25_000)
    os.replace(tmp, path)
    return path


def _editdist_pairs_planted(sf_dir: str):
    """Distance-bounded string similarity self-join (q-gram inverted
    index → pair dedup → blob joins → vectorized Levenshtein verify)
    vs the oracle's full quadratic levenshtein() join on the same
    regenerated names."""
    import ray.data

    from import_ray.stages.editdist import edit_distance_pairs

    ds = ray.data.read_parquet(_editdist_names_fixture(sf_dir))
    return edit_distance_pairs(ds, max_dist=2, q=2)


EDITDIST_PLANTED_SQL = """
WITH names AS (
  SELECT o_orderkey AS id,
         CASE o_orderkey % 4
           WHEN 0 THEN substr(md5(CAST(o_orderkey//4 AS VARCHAR)), 1, 12)
           WHEN 1 THEN substr(md5(CAST(o_orderkey//4 AS VARCHAR)), 1, 12) || 'x'
           WHEN 2 THEN substr(md5(CAST(o_orderkey//4 AS VARCHAR)), 1, 12) || 'xy'
           ELSE 'q' || substr(md5(CAST(o_orderkey//4 AS VARCHAR)), 1, 12)
         END AS name
  FROM orders WHERE o_orderkey < 2400
)
SELECT a.id AS id_lo, b.id AS id_hi,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM names a JOIN names b ON a.id < b.id
WHERE levenshtein(a.name, b.name) <= 2
"""


def _conv_reconstruct_planted(sf_dir: str):
    from import_ray.pipelines.kg import reconstruct_conversations

    return reconstruct_conversations(_planted_conv_fixture(sf_dir)).sort("conv_id")


def _conv_dedup_planted(sf_dir: str):
    from import_ray.pipelines.kg import conv_dedup_exact

    return conv_dedup_exact(_planted_conv_fixture(sf_dir)).sort("conv_id")


def _tool_transitions_planted(sf_dir: str):
    from import_ray.pipelines.kg import tool_transitions

    return tool_transitions(_planted_conv_fixture(sf_dir))


def _turn_latency_planted(sf_dir: str):
    from import_ray.pipelines.kg import turn_latency_stats

    return turn_latency_stats(_planted_conv_fixture(sf_dir))


CONV_RECONSTRUCT_PLANTED_SQL = """
WITH o AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS k, o_orderkey % 10 = 0 AS dup
  FROM orders
), convs AS (
  SELECT 'p' || k AS conv_id, k FROM o
  UNION ALL SELECT 'q' || k, k FROM o WHERE dup
)
SELECT conv_id, CAST(4 AS BIGINT) AS n_turns,
       't0 o' || k || chr(10) || 't1 o' || k || chr(10)
       || 't2 o' || k || chr(10) || 't3 o' || k AS full_text
FROM convs ORDER BY conv_id
"""

CONV_DEDUP_PLANTED_SQL = """
SELECT 'p' || CAST(o_orderkey AS VARCHAR) AS conv_id,
       CAST(CASE WHEN o_orderkey % 10 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_dups
FROM orders ORDER BY conv_id
"""

TOOL_TRANSITIONS_PLANTED_SQL = """
WITH n AS (
  SELECT COUNT(*) + SUM(CASE WHEN o_orderkey % 10 = 0 THEN 1 ELSE 0 END) AS c
  FROM orders
)
SELECT 'search' AS prev_tool, 'calc' AS next_tool, CAST(c AS BIGINT) AS n FROM n
"""

TURN_LATENCY_PLANTED_SQL = """
WITH n AS (
  SELECT COUNT(*) + SUM(CASE WHEN o_orderkey % 10 = 0 THEN 1 ELSE 0 END) AS c
  FROM orders
)
SELECT 'agent' AS role, CAST(2 * c AS BIGINT) AS n_turns,
       CAST(2 * c * 60000 AS BIGINT) AS sum_latency_ms,
       CAST(60000 AS BIGINT) AS max_latency_ms FROM n
UNION ALL
SELECT 'user', CAST(c AS BIGINT), CAST(c * 60000 AS BIGINT), 60000 FROM n
ORDER BY role
"""


def _pack_docs_conservation(sf_dir: str):
    """Conservation invariants of the FFD packer as a hash-checkable
    query: packing must keep every doc exactly once (Σ n_docs = corpus
    count), conserve tokens (Σ pack_tokens = corpus token count) and
    never overfill a shared window (violations = packs over capacity
    with more than one doc; long singleton docs are allowed). The
    oracle states the same totals straight off the documents table
    with zero violations."""
    import pandas as pd

    from import_ray.stages.chunking import pack_sequences

    cap = 512
    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    packs = pack_sequences(ds, capacity=cap).to_pandas()
    viol = int(((packs["pack_tokens"] > cap) & (packs["n_docs"] > 1)).sum())
    out = pd.DataFrame(
        {
            "total_docs": [int(packs["n_docs"].sum())],
            "total_tokens": [int(packs["pack_tokens"].sum())],
            "n_violations": [viol],
        }
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _config_import_obs(sf_dir: str):
    """Multi-file config-driven import (Simple importer semantics) over
    CSVs derived DETERMINISTICALLY from the sf tables: a wide melt file
    from ``part`` + an events file from ``events`` (monthly counts),
    run through the Ray-native config runner; oracle reproduces both
    in SQL."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from import_ray.pipelines.config_import import run_config_import_ray

    workdir = f"/tmp/graft_config_{os.path.basename(os.path.normpath(sf_dir))}"
    os.makedirs(workdir, exist_ok=True)

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size", "p_retailprice"]
    ).to_pandas()
    y = part["p_retailprice"].to_numpy() * 100.0
    cents = np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)).astype(np.int64)
    wide = part.assign(
        entity=part["p_partkey"].astype(str),
        date="2020",
        p_size=part["p_size"].astype(str),
        p_price_cents=cents.astype(str),
    )[["entity", "date", "p_size", "p_price_cents"]]
    wide.to_csv(f"{workdir}/part_wide.csv", index=False)

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).to_pandas()
    ev_csv = ev.assign(
        entity=ev["user_id"].astype(str),
        date=ev["ts"].dt.strftime("%Y-%m-%d"),
        event_id=ev["event_id"].astype(str),
    )[["entity", "date", "event_id"]]
    ev_csv.to_csv(f"{workdir}/user_events.csv", index=False)

    config = {
        "inputFiles": {
            "part_wide.csv": {
                "importType": "observations",
                "format": "variablePerColumn",
                "provenance": "PartProv",
                "columnMappings": {
                    "dcid:observationAbout": "entity",
                    "dcid:observationDate": "date",
                },
            },
            "user_events.csv": {
                "importType": "events",
                "eventType": "UserEvent",
                "idColumn": "event_id",
                "provenance": "EvProv",
                "aggregation": {"period": "month"},
            },
        }
    }
    return run_config_import_ray(workdir, config)["observations"]


CONFIG_IMPORT_SQL = """
SELECT CAST(p_partkey AS VARCHAR) AS entity, 'p_size' AS variable,
       '2020' AS date, CAST(p_size AS VARCHAR) AS value,
       'PartProv' AS provenance
FROM part
UNION ALL
SELECT CAST(p_partkey AS VARCHAR), 'p_price_cents', '2020',
       CAST(CAST(ROUND(p_retailprice*100) AS BIGINT) AS VARCHAR), 'PartProv'
FROM part
UNION ALL
SELECT CAST(user_id AS VARCHAR), 'Count_UserEvent', strftime(ts, '%Y-%m'),
       CAST(COUNT(*) AS VARCHAR), 'EvProv'
FROM events GROUP BY user_id, strftime(ts, '%Y-%m')
"""


def _embedding_neardup(sf_dir: str):
    """Embedding-cosine near-dup with planted EXACT vector copies
    (vec_id + 1e6 for every 20th vector): the only pairs at cosine
    ≥ 0.95 are (src, copy) with cosine exactly 1.0 (max natural pair
    similarity in the synthetic table is ≈0.51)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from import_ray.stages.similarity import embedding_neardup_pairs

    ds = _read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def plant(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        sub = b.filter(pa.array(ids % 20 == 0))
        copies = pa.table(
            {
                "vec_id": pa.array(
                    sub["vec_id"].to_numpy(zero_copy_only=False) + _PLANT_OFFSET
                ),
                "embedding": sub["embedding"],
            }
        )
        return pa.concat_tables([b, copies.cast(b.schema)])

    return embedding_neardup_pairs(
        ds.map_batches(plant, batch_format="pyarrow"), threshold=0.95
    )


def _semdedup_planted(sf_dir: str):
    """SemDeDup (k-means bucket + within-cluster earlier-member cosine,
    arXiv:2303.09540) with planted EXACT vector copies: survivors must
    be exactly the original table — each copy is dropped by its
    earlier-ordered original (tie on centroid-sim broken by vec_id) and
    no natural pair reaches the 0.95 threshold (max ≈ 0.51)."""
    import pyarrow as pa

    from import_ray.stages.semdedup import semdedup_kept

    ds = _read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def plant(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        sub = b.filter(pa.array(ids % 20 == 0))
        copies = pa.table(
            {
                "vec_id": pa.array(
                    sub["vec_id"].to_numpy(zero_copy_only=False) + _PLANT_OFFSET
                ),
                "embedding": sub["embedding"],
            }
        )
        return pa.concat_tables([b, copies.cast(b.schema)])

    return semdedup_kept(
        ds.map_batches(plant, batch_format="pyarrow"), k=8, threshold=0.95
    )


def _incremental_dedup_docs(sf_dir: str):
    """Incremental corpus dedup: admit a new shard (docs with
    doc_id % 3 == 0, PLUS planted copies of existing texts under new
    ids) against the already-ingested corpus (doc_id % 3 != 0). Bloom
    prefilter of existing hashes + one keyed anti exchange; survivors
    = novel texts, min id per within-shard duplicate group."""
    import numpy as np
    import pyarrow as pa

    from import_ray.stages.dedup import incremental_dedup_documents

    docs = _read_table(sf_dir, "documents", ["doc_id", "text"])

    def mk_existing(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 3 != 0))

    def mk_new(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        own = b.filter(pa.array(ids % 3 == 0))
        planted = b.filter(pa.array((ids % 3 != 0) & (ids % 5 == 1)))
        planted = pa.table(
            {
                "doc_id": pa.array(
                    planted["doc_id"].to_numpy(zero_copy_only=False) + _PLANT_OFFSET
                ),
                "text": planted["text"],
            }
        )
        return pa.concat_tables([own, planted.cast(own.schema)])

    existing = docs.map_batches(mk_existing, batch_format="pyarrow")
    new = docs.map_batches(mk_new, batch_format="pyarrow")
    return incremental_dedup_documents(new, existing)


INCREMENTAL_DEDUP_SQL = f"""
WITH existing AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
     new AS (
       SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
       UNION ALL
       SELECT doc_id + {_PLANT_OFFSET}, text FROM documents
       WHERE doc_id % 3 <> 0 AND doc_id % 5 = 1
     )
SELECT MIN(doc_id) AS doc_id FROM new
WHERE text NOT IN (SELECT text FROM existing)
GROUP BY text
"""


def _shuffle_shards_docs(sf_dir: str):
    """Deterministic training-export shuffle: seeded auditable hash →
    balanced shards + within-shard rank (a reproducible global
    permutation; the writer twin materializes shard=K/ parquet dirs)."""
    from import_ray.stages.sampling import shuffle_shards

    return shuffle_shards(
        _read_table(sf_dir, "documents", ["doc_id"]), n_shards=8, seed=7
    )


SHUFFLE_SHARDS_SQL = """
SELECT doc_id,
       CAST(((doc_id + 7) * 2654435761) % 4294967296 % 8 AS BIGINT) AS shard_id,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY ((doc_id + 7) * 2654435761) % 4294967296 % 8
         ORDER BY ((doc_id + 7) * 2654435761) % 4294967296, doc_id) - 1
         AS BIGINT) AS pos
FROM documents
"""


def _dsir_planted(sf_dir: str):
    """DSIR (hashed-ngram importance resampling, arXiv:2302.03169)
    planted oracle: every raw doc carries the same base text; docs with
    doc_id % 7 == 0 additionally carry the target corpus's distinctive
    tokens, so top-k selection (k = planted count) returns exactly the
    planted ids."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from import_ray.stages.dsir import dsir_select

    ids = _read_table(sf_dir, "documents", ["doc_id"])
    base = "the quick brown fox jumps over the lazy dog"
    plant = base + " zebraq wombatx zebraq wombatx"

    def synth(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        texts = [plant if i % 7 == 0 else base for i in d]
        return pa.table({"doc_id": b["doc_id"], "text": pa.array(texts, pa.string())})

    def planted_count(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([int((d % 7 == 0).sum())], pa.int64())})

    raw = ids.map_batches(synth, batch_format="pyarrow")
    k = int(ids.map_batches(planted_count, batch_format="pyarrow").sum("n"))
    target = ray.data.from_items(
        [{"doc_id": 10_000_000 + i, "text": "zebraq wombatx zebraq wombatx"} for i in range(3)]
    )
    out = dsir_select(raw, target, k=k, buckets=512, smoothing=1e-3)
    return out.drop_columns(["logweight"])


def _dsir_select_docs(sf_dir: str):
    """Bulk DSIR selection: target = docs from one source, raw = the
    whole corpus; top-100 by importance weight (rows-only: hashed-ngram
    likelihoods aren't SQL-expressible)."""
    import pyarrow.compute as pc

    from import_ray.stages.dsir import dsir_select

    docs = _read_table(sf_dir, "documents", ["doc_id", "text", "source"])
    raw = docs.drop_columns(["source"])
    target = docs.map_batches(
        lambda b: b.filter(pc.equal(b["source"], "src18")).drop_columns(["source"]),
        batch_format="pyarrow",
    )
    return dsir_select(raw, target, k=100, smoothing=0.01)


def _semdedup_docs(sf_dir: str):
    """Bulk SemDeDup over the real embeddings at an aggressive
    threshold so real drops happen (rows-only: k-means cluster
    assignments aren't SQL-expressible)."""
    from import_ray.stages.semdedup import semdedup

    ds = _read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semdedup(ds, k=8, threshold=0.4)


def _events_series(sf_dir: str):
    """Series grouping (optimized-graph shape) using events as obs rows."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from import_ray.stages.observations import group_series

    ds = _read_table(sf_dir, "events", ["user_id", "event_type", "ts", "value"])

    def to_obs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity": pc.cast(batch["user_id"], pa.string()),
                "variable": batch["event_type"],
                "date": pc.strftime(batch["ts"], format="%Y-%m-%d"),
                "value": pc.cast(batch["value"], pa.string()),
                "measurement_method": pa.array([""] * len(batch), pa.string()),
                "observation_period": pa.array([""] * len(batch), pa.string()),
                "scaling_factor": pa.array([""] * len(batch), pa.string()),
                "unit": pa.array([""] * len(batch), pa.string()),
            }
        )

    obs = ds.map_batches(to_obs, batch_format="pyarrow")
    series = group_series(obs)
    return series.select_columns(["entity", "variable"]).map_batches(
        lambda b: b.append_column("n", pa.array([1] * len(b), pa.int64())),
        batch_format="pyarrow",
    )


def _hll_distinct_users(sf_dir: str):
    """HyperLogLog grouped distinct count (rows-only: approximate by
    design; the exact twin is ``distinct_users_by_type`` and the
    tolerance bound is pytest-asserted in tests/test_sketch.py)."""
    import ray.data

    from import_ray.core.context import configure_data_context
    from import_ray.stages.sketch import hll_distinct

    configure_data_context()
    ds = _read_table(sf_dir, "events", ["event_type", "user_id"])
    return hll_distinct(ds, "event_type", "user_id")


def _cms_heavy_hitter_users(sf_dir: str):
    """EXACT heavy-hitter users (count ≥ 75) via count-min-sketch
    candidate pruning (stages/sketch.cms_heavy_hitters): fixed-size
    sketch partials fold; only candidate (key, block-partial) rows
    ever shuffle — the full key set never enters an exchange."""
    from import_ray.core.context import configure_data_context
    from import_ray.stages.sketch import cms_heavy_hitters

    configure_data_context()
    ds = _read_table(sf_dir, "events", ["user_id"])
    return cms_heavy_hitters(ds, "user_id", threshold=75)


CMS_HEAVY_HITTERS_SQL = """
SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS n
FROM events GROUP BY 1 HAVING COUNT(*) >= 75
"""


def _ddsketch_price_quantiles(sf_dir: str):
    """Grouped price quantiles via the mergeable DDSketch log-bucket
    sketch (rows-only: approximate by design — the ≤1% relative-error
    guarantee is pytest-asserted in tests/test_sketch.py; the exact
    twin is ``price_percentiles_by_flag``)."""
    from import_ray.core.context import configure_data_context
    from import_ray.stages.sketch import ddsketch_quantiles

    configure_data_context()
    ds = _read_table(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
    return ddsketch_quantiles(
        ds, "l_returnflag", "l_extendedprice", quantiles=(0.5, 0.9, 0.99)
    )


def _top_tokens_docs(sf_dir: str):
    """Exact corpus-wide top-20 tokens (heavy hitters)."""
    import ray.data

    from import_ray.core.context import configure_data_context
    from import_ray.stages.text import top_tokens

    configure_data_context()
    ds = _read_table(sf_dir, "documents", ["text"])
    return top_tokens(ds, k=20)


def _cms_top_tokens_docs(sf_dir: str):
    """Count-Min-sketch approximate top-20 tokens (rows-only: CMS
    overestimates by design; tolerance vs the exact twin is asserted in
    tests/test_sketch.py)."""
    import ray.data

    from import_ray.core.context import configure_data_context
    from import_ray.stages.text import cms_top_tokens

    configure_data_context()
    ds = _read_table(sf_dir, "documents", ["text"])
    return cms_top_tokens(ds, k=20)


def _top_terms_per_doc(sf_dir: str):
    """Per-doc top-3 characteristic terms (integer tf-idf analog:
    tf·1e9 // df; tf partials → df join → doc-keyed top-k)."""
    from import_ray.core.context import configure_data_context
    from import_ray.stages.text import top_terms_per_doc

    configure_data_context()
    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return top_terms_per_doc(ds, k=3)


from import_ray.stages.text import TOP_TOKENS_SQL as TOP_TOKENS_ORACLE
from import_ray.pipelines.corpus import CORPUS_CLEAN_SQL as CORPUS_CLEAN_ORACLE
from import_ray.stages.text import DOC_RARITY_SQL as DOC_RARITY_ORACLE
from import_ray.stages.text import TOP_TERMS_PER_DOC_SQL as TOP_TERMS_PER_DOC_ORACLE
from import_ray.stages.chunking import CHUNK_DOCS_SQL_TEMPLATE
from import_ray.stages.text import OOV_STATS_SQL_TEMPLATE

CHUNK_DOCS_ORACLE = CHUNK_DOCS_SQL_TEMPLATE.format(window=64, stride=48)
OOV_STATS_ORACLE = OOV_STATS_SQL_TEMPLATE.format(k=20)
from import_ray.stages.scrub import (
    HASH_SAMPLE_SQL as HASH_SAMPLE_ORACLE,
    PII_REDACT_SQL as PII_REDACT_ORACLE,
)
from import_ray.stages.sampling import WEIGHTED_SAMPLE_ORDERS_SQL
from import_ray.stages.repetition import (
    BIGRAM_REPETITION_SQL as BIGRAM_REPETITION_ORACLE,
    CROSS_DUP_SQL as CROSS_DUP_ORACLE,
    DUP_SPAN_SQL as DUP_SPAN_ORACLE,
)
from import_ray.stages.sampling import (
    MIXTURE_SAMPLE_SQL as MIXTURE_SAMPLE_ORACLE,
    SAMPLED_PERCENTILES_SQL as SAMPLED_PERCENTILES_ORACLE,
    STRATIFIED_SAMPLE_SQL as STRATIFIED_SAMPLE_ORACLE,
)


_CHUNK_WINDOW, _CHUNK_STRIDE = 64, 48


def _chunk_docs(sf_dir: str):
    """Context-window chunking (window 64, stride 48) over documents."""
    import ray.data

    from import_ray.core.context import configure_data_context
    from import_ray.stages.chunking import chunk_docs

    configure_data_context()
    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return chunk_docs(ds, window=_CHUNK_WINDOW, stride=_CHUNK_STRIDE)


def _pack_docs(sf_dir: str):
    """Greedy FFD sequence packing into 512-token windows (rows-only:
    block-local packing is not SQL-expressible; invariants tested in
    tests/test_chunking.py)."""
    import ray.data

    from import_ray.core.context import configure_data_context
    from import_ray.stages.chunking import pack_sequences

    configure_data_context()
    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return pack_sequences(ds, capacity=512)


_DECON_OFFSET = 3_000_000


def _bench_filter(b):
    """docs with doc_id % 25 == 0 (numpy mask; pyarrow lacks modulo)."""
    import numpy as np
    import pyarrow as pa

    ids = b["doc_id"].to_numpy(zero_copy_only=False)
    return b.filter(pa.array(ids % 25 == 0))


def _decontam_planted(sf_dir: str):
    """Benchmark decontamination, planted oracle: benchmark = docs with
    doc_id % 25 == 0; corpus = all docs + exact copies of the benchmark
    (id + offset). Contaminated (containment ≥ 0.99) must be exactly
    the benchmark members and their copies."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from import_ray.core.context import configure_data_context
    from import_ray.stages.decontam import benchmark_shingle_set, decontaminate

    configure_data_context()
    docs = _read_table(sf_dir, "documents", ["doc_id", "text"])
    bench = docs.map_batches(_bench_filter, batch_format="pyarrow")

    def plant(b: pa.Table) -> pa.Table:
        sub = _bench_filter(b)
        copies = pa.table(
            {
                "doc_id": pc.add(sub["doc_id"], _DECON_OFFSET),
                "text": sub["text"],
            }
        )
        return pa.concat_tables([b, copies.cast(b.schema)]).combine_chunks()

    corpus = docs.map_batches(plant, batch_format="pyarrow")
    out = decontaminate(corpus, benchmark_shingle_set(bench), frac_threshold=0.99)
    return out.map_batches(
        lambda b: b.filter(b["contaminated"]), batch_format="pyarrow"
    ).select_columns(["doc_id", "contaminated"])


DECONTAM_PLANTED_ORACLE = f"""
SELECT doc_id, TRUE AS contaminated FROM documents WHERE doc_id % 25 = 0
UNION ALL
SELECT doc_id + {_DECON_OFFSET} AS doc_id, TRUE AS contaminated
FROM documents WHERE doc_id % 25 = 0
"""


def _decontam_docs(sf_dir: str):
    """Bulk decontamination stats at containment 0.5 (rows-only)."""
    import ray.data

    from import_ray.core.context import configure_data_context
    from import_ray.stages.decontam import benchmark_shingle_set, decontaminate

    configure_data_context()
    docs = _read_table(sf_dir, "documents", ["doc_id", "text"])
    bench = docs.map_batches(_bench_filter, batch_format="pyarrow")
    return decontaminate(docs, benchmark_shingle_set(bench), frac_threshold=0.5)


def _bloom_semi_orders(sf_dir: str):
    """Bloom-prefiltered exact semi-join: orders of BUILDING-segment
    customers. The Bloom stage cuts the fact-side exchange to
    selectivity + FP-rate of rows; the trailing hash semi-join makes
    the result exact."""
    from import_ray.pipelines.relational import _read
    from import_ray.stages.bloom import bloom_semi_join

    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .filter(expr="c_mktsegment == 'BUILDING'")
        .select_columns(["c_custkey"])
        .rename_columns({"c_custkey": "o_custkey"})
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    from import_ray.core.context import data_nparts

    return bloom_semi_join(orders, cust, on="o_custkey", num_partitions=data_nparts(orders))


BLOOM_SEMI_ORACLE = """
SELECT o_orderkey, o_custkey FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""

from import_ray.stages.dedup import SEGMENT_DEDUP_SQL_TEMPLATE
from import_ray.stages.scrub import BADWORD_FILTER_SQL as BADWORD_FILTER_ORACLE

SEGMENT_DEDUP_ORACLE = SEGMENT_DEDUP_SQL_TEMPLATE.format(seg_tokens=4)


def _oov_stats_docs(sf_dir: str):
    """Out-of-vocabulary token counts vs the corpus top-20 vocabulary
    (broadcast-vocab unigram scoring shape)."""
    import ray.data

    from import_ray.core.context import configure_data_context
    from import_ray.stages.text import oov_stats

    configure_data_context()
    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return oov_stats(ds, vocab_k=20)


def _doc_rarity_stats(sf_dir: str):
    """tf-idf-shaped df pipeline: distinct doc-token pairs → token
    document frequency → join back → per-doc integer rollups."""
    import ray.data

    from import_ray.core.context import configure_data_context
    from import_ray.stages.text import doc_rarity_stats

    configure_data_context()
    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return doc_rarity_stats(ds)


def _kmeans_embeddings(sf_dir: str):
    """Distributed spherical k-means bucketing of the embeddings table
    (rows-only: iterative, not SQL-expressible; the planted twin
    ``kmeans_planted_purity`` is value-checked)."""
    import ray.data

    from import_ray.core.context import configure_data_context
    from import_ray.stages.clustering import kmeans

    configure_data_context()
    ds = _read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans(ds, k=8, iters=3).select_columns(["vec_id", "cluster_id"])


def _kmeans_planted(sf_dir: str):
    from import_ray.stages.clustering import kmeans_planted_purity

    return kmeans_planted_purity(n=200, groups=5)


KMEANS_PLANTED_ORACLE = (
    "SELECT DISTINCT CAST(vec_id % 5 AS BIGINT) AS group_id, TRUE AS pure "
    "FROM embeddings WHERE vec_id < 200"
)


def _pii_redact_planted(sf_dir: str):
    """Vectorized RE2 PII redaction (emails/phones planted
    deterministically; the oracle plants identically in SQL)."""
    import ray.data

    from import_ray.core.context import configure_data_context
    from import_ray.stages.scrub import pii_redact, plant_pii

    configure_data_context()
    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(plant_pii, batch_format="pyarrow").map_batches(
        pii_redact, batch_format="pyarrow"
    )


def _hash_sample_docs(sf_dir: str):
    """Deterministic multiplicative-hash Bernoulli sample (~20%)."""
    import ray.data

    from import_ray.core.context import configure_data_context
    from import_ray.stages.scrub import hash_sample

    configure_data_context()
    ds = _read_table(sf_dir, "documents", ["doc_id", "n_chars"])
    return ds.map_batches(hash_sample, batch_format="pyarrow")


def _weighted_sample_orders(sf_dir: str):
    """Weighted sampling without replacement (Efraimidis-Spirakis
    A-Res keys over the auditable multiplicative hash): 100 orders
    weighted by total price; per-batch bottom-k partials only."""
    import numpy as np
    import pyarrow as pa

    from import_ray.stages.sampling import weighted_sample

    ds = _read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def cents(batch: pa.Table) -> pa.Table:
        tp = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        y = tp * 100.0
        w = np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)).astype(np.int64)
        return pa.table(
            {"o_orderkey": batch["o_orderkey"], "weight_cents": pa.array(w, pa.int64())}
        )

    keyed = ds.map_batches(cents, batch_format="pyarrow")
    return weighted_sample(keyed, id_col="o_orderkey", weight_cents_col="weight_cents", k=100)


def _gopher_quality_docs(sf_dir: str):
    """Gopher-style composite quality rules (token-count bounds, mean
    token length, alpha fraction, stopword presence; all-integer
    signals, regexes evaluated once per vocabulary value)."""
    from import_ray.stages.text import gopher_quality_flags

    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(gopher_quality_flags, batch_format="pyarrow")


def _bigram_repetition_docs(sf_dir: str):
    """Within-doc bigram repetition signals (Gopher-style quality)."""
    from import_ray.stages.repetition import bigram_repetition_stats

    ds = _read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(bigram_repetition_stats, batch_format="pyarrow")


def _cross_dup_docs(sf_dir: str):
    """Cross-document duplicated word-3-gram counts per doc."""
    from import_ray.stages.repetition import cross_dup_stats

    return cross_dup_stats(_read_table(sf_dir, "documents", ["doc_id", "text"]))


def _dup_span_docs(sf_dir: str):
    """Longest cross-document duplicated 3-gram span per doc."""
    from import_ray.stages.repetition import dup_span_stats

    return dup_span_stats(_read_table(sf_dir, "documents", ["doc_id", "text"]))


def _stratified_sample_docs(sf_dir: str):
    """Deterministic bottom-5-by-hash cap per source (domain capping)."""
    from import_ray.stages.sampling import stratified_sample

    return stratified_sample(_read_table(sf_dir, "documents", ["doc_id", "source"]))


def _mixture_sample_docs(sf_dir: str):
    """Per-source keep-rate mix (training-data source weighting)."""
    from import_ray.stages.sampling import mixture_sample

    return mixture_sample(_read_table(sf_dir, "documents", ["doc_id", "source"]))


def _sampled_percentiles_orders(sf_dir: str):
    """PERCENTILE_DISC over the deterministic bottom-2048 hash sample."""
    from import_ray.stages.sampling import sampled_percentiles

    return sampled_percentiles(
        _read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    )


def _corpus_clean_exact(sf_dir: str):
    """Composite cleaning flow, SQL-checkable stages (filter + exact
    dedup with planted copies)."""
    from import_ray.pipelines.corpus import corpus_clean_exact

    return corpus_clean_exact(sf_dir)


def _corpus_clean(sf_dir: str):
    """Full cleaning flow incl. MinHash near-dup removal (rows-only)."""
    from import_ray.pipelines.corpus import corpus_clean

    return corpus_clean(sf_dir)


def _link_fixture(sf_dir: str) -> str:
    """Transcript fixture for mention linking: text 'see geoId:<b>
    (Place<a>)' with a = k%5 and b = a except every 4th row where
    b = (a+1)%7 — so each alias has a clear majority candidate and a
    minority distractor, both SQL-regenerable."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    keys = orders["o_orderkey"].to_numpy(zero_copy_only=False)
    ts = orders["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
    a = keys % 5
    b = np.where(keys % 4 == 0, (a + 1) % 7, a)
    text = np.char.add(
        np.char.add("see geoId:", b.astype(str)),
        np.char.add(" (Place", np.char.add(a.astype(str), ")")),
    ).astype(object)
    n = len(keys)
    tx = pa.table(
        {
            "conv_id": pa.array(np.char.add("l", keys.astype(str)), pa.string()),
            "turn_idx": pa.array(np.zeros(n, np.int32), pa.int32()),
            "role": pa.array(np.full(n, "user", object), pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(np.full(n, "", object), pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    base_dir = f"/tmp/graft_link_{os.path.basename(os.path.normpath(sf_dir))}"
    os.makedirs(base_dir, exist_ok=True)
    path = f"{base_dir}/transcripts.parquet"
    tmp = path + ".tmp"
    pq.write_table(tx, tmp, row_group_size=25_000)
    os.replace(tmp, path)
    return path


def _link_mentions_planted(sf_dir: str):
    """Hash-checkable dictionary entity linking
    (stages/alias.link_mentions): alias table mined from the fixture,
    per-alias argmax-prior winner, every textual alias occurrence
    linked to it — vs pure modular-arithmetic SQL regeneration."""
    from import_ray.stages.alias import alias_table, link_mentions

    path = _link_fixture(sf_dir)
    return link_mentions(path, alias_table(path))


def _link_mentions_ngram_planted(sf_dir: str):
    """The large-gazetteer hashed token-n-gram linker forced on the
    same planted fixture — single-token non-nested aliases, so its
    word-boundary all-occurrence semantics coincide with the regex
    path and the SAME SQL oracle hash-checks it."""
    from import_ray.stages.alias import alias_table, link_mentions

    path = _link_fixture(sf_dir)
    return link_mentions(path, alias_table(path), matcher="ngram")


LINK_MENTIONS_PLANTED_SQL = """
WITH m AS (
  SELECT o_orderkey % 5 AS a,
         CASE WHEN o_orderkey % 4 = 0 THEN (o_orderkey % 5 + 1) % 7
              ELSE o_orderkey % 5 END AS b
  FROM orders
),
cnt AS (SELECT a, b, COUNT(*) AS n FROM m GROUP BY 1, 2),
win AS (
  SELECT a, b,
         ROW_NUMBER() OVER (
           PARTITION BY a ORDER BY n DESC, 'geoId/' || CAST(b AS VARCHAR)
         ) AS rnk
  FROM cnt
),
tot AS (SELECT a, COUNT(*) AS n_links FROM m GROUP BY a)
SELECT 'Place' || CAST(w.a AS VARCHAR) AS alias,
       'geoId/' || CAST(w.b AS VARCHAR) AS entity_id,
       CAST(t.n_links AS BIGINT) AS n_links
FROM win w JOIN tot t ON t.a = w.a
WHERE w.rnk = 1
"""


def _bigram_next_topk(sf_dir: str):
    """Hash-checkable next-token table (stages/text.bigram_next_topk):
    per prefix token, the top-3 next tokens by exact ordered-bigram
    count (support >= 5), vs DuckDB list_zip + ROW_NUMBER."""
    from import_ray.stages.text import bigram_next_topk

    return bigram_next_topk(_read_table(sf_dir, "documents", ["text"]))


def _rdfs_types_planted(sf_dir: str):
    """Hash-checkable RDFS rdfs9 type materialization
    (stages/reasoning.infer_types): a 12-class subClassOf CHAIN
    (i subClassOf i+1) with every order asserted typeOf class
    o_orderkey % 12 — the inferred type set of entity k is exactly
    classes k%12 .. 11, SQL-regenerable without recursion. The real
    distributed machinery runs end-to-end: semi-naive ancestor
    closure, broadcast CSR expansion, keyed-exchange distinct."""
    import pyarrow as pa
    import ray.data

    from import_ray.stages.reasoning import infer_types

    def to_types(batch):
        import numpy as np
        import pyarrow as pa

        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"entity": pa.array(k, pa.int64()), "cls": pa.array(k % 12, pa.int64())}
        )

    typeof = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    ).map_batches(to_types, batch_format="pyarrow")
    subclass = ray.data.from_arrow(
        pa.table(
            {
                "child": pa.array(list(range(11)), pa.int64()),
                "parent": pa.array(list(range(1, 12)), pa.int64()),
            }
        )
    )
    return infer_types(typeof, subclass)


RDFS_TYPES_PLANTED_SQL = """
SELECT CAST(o_orderkey AS BIGINT) AS entity, CAST(g.j AS BIGINT) AS cls
FROM orders JOIN (SELECT UNNEST(range(0, 12)) AS j) g ON g.j >= o_orderkey % 12
"""


def _sameas_canonical_planted(sf_dir: str):
    """Hash-checkable owl:sameAs canonicalization
    (stages/reasoning.sameas_canonicalize): planted star identity
    clusters — every order node k is sameAs hub -(k%97)-1, so the
    min-label representative of any node is its (negative) hub, and
    the rewritten fact set is pure modular arithmetic in SQL. The
    real distributed machinery runs end-to-end: min-label component
    propagation, two left hash joins, keyed-exchange distinct."""
    import ray.data

    from import_ray.stages.reasoning import sameas_canonicalize  # noqa: F401

    def to_edges(batch):
        import numpy as np
        import pyarrow as pa

        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_lo": pa.array(k, pa.int64()),
                "doc_hi": pa.array(-(k % 97) - 1, pa.int64()),
            }
        )

    def to_facts(batch):
        import numpy as np
        import pyarrow as pa

        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pred = np.char.add("p", (k % 5).astype(str)).astype(object)
        return pa.table(
            {
                "subject": pa.array(k, pa.int64()),
                "predicate": pa.array(pred, pa.string()),
                "object": pa.array(k % 23, pa.int64()),
            }
        )

    base = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    edges = base.map_batches(to_edges, batch_format="pyarrow")
    facts = base.map_batches(to_facts, batch_format="pyarrow")
    return sameas_canonicalize(facts, edges)


SAMEAS_CANONICAL_PLANTED_SQL = """
SELECT DISTINCT
  CAST(-(o_orderkey % 97) - 1 AS BIGINT) AS subject,
  'p' || CAST(o_orderkey % 5 AS VARCHAR) AS predicate,
  CAST(-(o_orderkey % 23) - 1 AS BIGINT) AS object
FROM orders
"""


def queries() -> dict[str, Callable[[str], Any]]:
    from import_ray.pipelines import relational as R

    q = {
        "q1_pricing_summary": R.q1_pricing_summary,
        "q3_top_orders": R.q3_top_orders,
        "q5_region_revenue": R.q5_region_revenue,
        "events_daily_counts": R.events_daily_counts,
        "distinct_mktsegment": R.distinct_mktsegment,
        "filter_project_lineitem": R.filter_project_lineitem,
        "version_diff_orders": R.version_diff_orders,
        "customers_without_orders": R.customers_without_orders,
        "orders_running_total": R.orders_running_total,
        "coalesce_order_intervals": R.coalesce_order_intervals,
        "order_interval_overlaps": R.order_interval_overlaps,
        "purchase_last_signup": R.purchase_last_signup,
        "q6_discount_revenue": R.q6_discount_revenue,
        "q4_order_priority": R.q4_order_priority,
        "q12_priority_by_returnflag": R.q12_priority_by_returnflag,
        "top_orders_per_priority": R.top_orders_per_priority,
        "purchase_click_window": R.purchase_click_window,
        "events_sliding_counts": R.events_sliding_counts,
        "price_percentiles_by_flag": R.price_percentiles_by_flag,
        "distinct_users_by_type": R.distinct_users_by_type,
        "lineitem_rollup": R.lineitem_rollup,
        "repeat_customers_1995_1996": R.repeat_customers_1995_1996,
        "sessionize_events": R.sessionize_events,
        "events_trailing_interval": R.events_trailing_interval,
        "fd_profile_orders": R.fd_profile_orders,
        "pivot_user_event_counts": R.pivot_user_event_counts,
        "customer_order_gaps": R.customer_order_gaps,
        "q13_customer_distribution": R.q13_customer_distribution,
        "q18_large_orders": R.q18_large_orders,
        "q17_small_quantity_revenue": R.q17_small_quantity_revenue,
        "top_supplier_per_nation": R.top_supplier_per_nation,
        "q22_rich_inactive_customers": R.q22_rich_inactive_customers,
        "q14_promo_revenue": R.q14_promo_revenue,
        "q16_part_supplier_counts": R.q16_part_supplier_counts,
        "q7_volume_shipping": R.q7_volume_shipping,
        "q8_market_share": R.q8_market_share,
        "q10_returned_items": R.q10_returned_items,
        "q15_top_supplier": R.q15_top_supplier,
        "q19_disjunctive_revenue": R.q19_disjunctive_revenue,
        "q21_sole_return_suppliers": R.q21_sole_return_suppliers,
        "q2_min_cost_supplier": R.q2_min_cost_supplier,
        "q9_profit_by_nation_year": R.q9_profit_by_nation_year,
        "q11_important_parts": R.q11_important_parts,
        "q20_dominant_part_suppliers": R.q20_dominant_part_suppliers,
        "events_props_stats": R.events_props_stats,
        "ntile_customers": R.ntile_customers_by_balance,
        "first_last_touch": R.first_last_touch,
        "top_event_per_user": R.top_event_per_user,
        "topn_orders_per_customer": R.topn_orders_per_customer,
        "profile_orders": R.profile_orders,
        "profile_orders_approx": lambda sf: R.profile_orders(sf, approx=True),
        "bloom_semi_orders": _bloom_semi_orders,
        "decontam_planted": _decontam_planted,
        "decontam_docs": _decontam_docs,
        "doc_rarity_stats": _doc_rarity_stats,
        "oov_stats_docs": _oov_stats_docs,
        "chunk_docs": _chunk_docs,
        "pack_docs": _pack_docs,
        "kmeans_embeddings": _kmeans_embeddings,
        "kmeans_planted_purity": _kmeans_planted,
        "pii_redact_planted": _pii_redact_planted,
        "hash_sample_docs": _hash_sample_docs,
        "weighted_sample_orders": _weighted_sample_orders,
        "bigram_repetition_docs": _bigram_repetition_docs,
        "cross_dup_docs": _cross_dup_docs,
        "dup_span_docs": _dup_span_docs,
        "stratified_sample_docs": _stratified_sample_docs,
        "mixture_sample_docs": _mixture_sample_docs,
        "sampled_percentiles_orders": _sampled_percentiles_orders,
        "top_tokens_docs": _top_tokens_docs,
        "cms_top_tokens_docs": _cms_top_tokens_docs,
        "top_terms_per_doc": _top_terms_per_doc,
        "corpus_clean_exact": _corpus_clean_exact,
        "corpus_clean": _corpus_clean,
        "hll_distinct_users": _hll_distinct_users,
        "cms_heavy_hitter_users": _cms_heavy_hitter_users,
        "ddsketch_price_quantiles": _ddsketch_price_quantiles,
        "dedup_exact_docs": _dedup_exact_docs,
        "segment_dedup_docs": _segment_dedup_docs,
        "badword_filter_docs": _badword_filter_docs,
        "token_stats_docs": _token_stats,
        "regex_token_counts_docs": _regex_token_counts,
        "span_corruption_docs": _span_corruption_docs,
        "source_token_cosine": _source_token_cosine,
        "source_vocab_overlap": _source_vocab_overlap,
        "vocab_stats_by_source": _vocab_stats_by_source,
        "regr_orders_by_priority": R.regr_orders_by_priority,
        "mixture_weights_by_source": _mixture_weights_by_source,
        "user_skew_profile": R.user_skew_profile,
        "inverted_index_docs": _inverted_index_docs,
        "token_pairs_docs": _token_pairs_docs,
        "gopher_quality_docs": _gopher_quality_docs,
        "quality_docs": _quality,
        "lang_id_docs": _lang_id,
        "knn_cosine": _knn,
        "melt_part": R.melt_part,
        "skyline_orders": R.skyline_orders,
        "cube_lineitem": R.cube_lineitem,
        "minhash_dedup_docs": _minhash_dedup_docs,
        "minhash_planted_clusters": _minhash_planted_clusters,
        "simhash_pairs_docs": _simhash_pairs_docs,
        "simhash_planted_pairs": _simhash_planted_pairs,
        "ngram_planted_pairs": _ngram_planted_pairs,
        "ngram_jaccard_docs": _ngram_jaccard_docs,
        "doc_fingerprints": _doc_fingerprints,
        "lang_id_planted": _lang_id_planted,
        "fingerprint_planted": _fingerprint_planted,
        "multimodal_features": _multimodal_features,
        "ivf_knn": _ivf_knn,
        "ivf_knn_planted": _ivf_knn_planted,
        "pq_knn_planted": _pq_knn_planted,
        "pack_docs_conservation": _pack_docs_conservation,
        "knn_int8_planted": _knn_int8_planted,
        "kg_triples_planted": _kg_triples_planted,
        "kg_graph_planted": _kg_graph_planted,
        "kg_ntriples_roundtrip": _kg_ntriples_roundtrip,
        "kg_upsert_planted": _kg_upsert_planted,
        "kg_conflicts_planted": _kg_conflicts_planted,
        "conv_sessions_planted": _conv_sessions_planted,
        "conv_structure_planted": _conv_structure_planted,
        "echo_rate_planted": _echo_rate_planted,
        "boilerplate_planted": _boilerplate_planted,
        "echo_rate_convs": _echo_rate_bulk,
        "kg_alignment_planted": _kg_alignment_planted,
        "conv_prefix_planted": _conv_prefix_planted,
        "sft_pairs_planted": _sft_pairs_planted,
        "sft_pairs": _sft_pairs_bulk,
        "kge_negatives_planted": _kge_negatives_planted,
        "kge_negatives_sampled": _kge_negatives_sampled_bulk,
        "random_walks_planted": _random_walks_planted,
        "random_walks_kg": _random_walks_kg,
        "preference_pairs_planted": _preference_pairs_planted,
        "kg_predicate_history_planted": _kg_predicate_history_planted,
        "alias_table_planted": _alias_table_planted,
        "alias_table": _alias_table_bulk,
        "tf_boolean_topk_docs": _tf_boolean_topk,
        "bm25_topk_docs": _bm25_topk_docs,
        "kg_scc_planted": _kg_scc_planted,
        "dag_levels_planted": _dag_levels_planted,
        "dense_ids_planted": _dense_ids_planted,
        "pseudonymize_planted": _pseudonymize_planted,
        "conv_sessions": _conv_sessions_bulk,
        "conv_structure": _conv_structure_bulk,
        "kg_snapshot_planted": _kg_snapshot_planted,
        "kg_diff_planted": _kg_diff_planted,
        "kg_predicate_counts_planted": _kg_predicate_counts_planted,
        "kg_conv_stats_planted": _kg_conv_stats_planted,
        "kg_type_profile_planted": _kg_type_profile_planted,
        "kg_two_hop_planted": _kg_two_hop_planted,
        "editdist_pairs_planted": _editdist_pairs_planted,
        "kg_shapes_planted": _kg_shapes_planted,
        "conv_reconstruct_planted": _conv_reconstruct_planted,
        "conv_dedup_planted": _conv_dedup_planted,
        "tool_transitions_planted": _tool_transitions_planted,
        "turn_latency_planted": _turn_latency_planted,
        "pca_invariants": _pca_invariants,
        "random_projection_invariants": _random_projection_invariants,
        "pq_knn": _pq_knn,
        "knn_cosine_int8": _knn_int8,
        "random_projection_embeddings": _random_projection,
        "pca_embeddings": _pca_embeddings,
        "funnel_events": R.funnel_counts,
        "cohort_retention": R.cohort_retention,
        "event_transitions": R.event_transitions,
        "orders_price_histogram": R.orders_price_histogram,
        "corr_price_quantity": R.corr_price_quantity,
        "events_gapfill_daily": R.events_gapfill_daily,
        "events_moving_7d_sum": R.events_moving_7d_sum,
        "user_activity_trend": R.user_activity_trend,
        "embedding_neardup_pairs": _embedding_neardup,
        "semdedup_planted": _semdedup_planted,
        "dsir_planted": _dsir_planted,
        "incremental_dedup_docs": _incremental_dedup_docs,
        "shuffle_shards_docs": _shuffle_shards_docs,
        "dsir_select_docs": _dsir_select_docs,
        "semdedup_docs": _semdedup_docs,
        "events_series_groups": _events_series,
        "config_import_obs": _config_import_obs,
        "kg_transcript_triples": _kg_transcript_triples,
        "kg_sorted_export": _kg_sorted_export,
        "kg_triple_diff": _kg_triple_diff,
        "kg_predicate_counts": _kg_predicate_counts,
        "kg_entity_components": _kg_entity_components,
        "kg_pagerank": _kg_pagerank,
        "kg_hits": _kg_hits,
        "kg_triangles": _kg_triangles,
        "kg_co_mention_pmi": _kg_co_mention_pmi,
        "kg_turn_latency": _kg_turn_latency,
        "kg_conv_stats": _kg_conv_stats,
        "kg_k_core": _kg_k_core,
        "kg_adamic_adar": _kg_adamic_adar,
        "kg_k_hop_reach": _kg_k_hop_reach,
        "kg_snapshot_asof": _kg_snapshot_asof,
        "kg_communities": _kg_communities,
        "kg_ancestors": _kg_ancestors,
        "sssp_parts": _sssp_parts,
        "conv_reconstruct": _conv_reconstruct,
        "conv_dedup_exact": _conv_dedup_exact,
        "tool_transitions": _tool_transitions,
        "user_event_paths": R.user_event_paths,
        "quantity_moments_by_flag": R.quantity_moments_by_flag,
        "order_part_jaccard": R.order_part_jaccard,
        "percent_rank_orders": R.percent_rank_orders,
        "bpe_merges_docs": _bpe_merges_docs,
        "bpe_token_counts_docs": _bpe_token_counts_docs,
        "minhash_keep_best_docs": _minhash_keep_best_docs,
        "minhash_keep_best_planted": _minhash_keep_best_planted,
        "entity_resolution_planted": _entity_resolution_planted,
        "lm_perplexity_docs": _lm_perplexity_docs,
        "lm_perplexity_planted": _lm_perplexity_planted,
        "rdfs_types_planted": _rdfs_types_planted,
        "sameas_canonical_planted": _sameas_canonical_planted,
        "bigram_next_topk_docs": _bigram_next_topk,
        "link_mentions_planted": _link_mentions_planted,
        "link_mentions_ngram_planted": _link_mentions_ngram_planted,
        "media_phash_pairs": _media_phash_pairs,
        "media_bmp_features": _media_bmp_features,
        "media_bmp_phash_pairs": _media_bmp_phash_pairs,
        "media_jpeg_features": _media_jpeg_features,
        "media_jpeg_phash_pairs": _media_jpeg_phash_pairs,
        "q6_from_orc": _q6_from_orc,
        "events_daily_from_jsonl": _events_daily_from_jsonl,
        "ivfpq_knn_planted": _ivfpq_knn_planted,
        "expectations_orders": _expectations_orders,
        "harmonic_star_planted": _harmonic_star_planted,
    }
    # The external driver samples the HEAD of this dict for its oracle
    # comparison, so the first 50 entries interleave every operator
    # family (flagship KG, dedup/near-dup, sketches, media, ANN, text,
    # then a relational core) rather than listing the relational suite
    # first.  Everything else keeps its original relative order.
    head = [
        # flagship KG construction + graph/reasoning
        "kg_triples_planted",
        "kg_graph_planted",
        "kg_upsert_planted",
        "kg_conflicts_planted",
        "kg_snapshot_planted",
        "kg_diff_planted",
        "kg_scc_planted",
        "dag_levels_planted",
        "kg_two_hop_planted",
        "kg_type_profile_planted",
        "kg_predicate_counts_planted",
        "kg_conv_stats_planted",
        "rdfs_types_planted",
        "sameas_canonical_planted",
        "link_mentions_planted",
        "link_mentions_ngram_planted",
        "entity_resolution_planted",
        "kg_alignment_planted",
        # dedup / near-dup
        "dedup_exact_docs",
        "segment_dedup_docs",
        "incremental_dedup_docs",
        "minhash_dedup_docs",
        "minhash_planted_clusters",
        "minhash_keep_best_planted",
        "simhash_planted_pairs",
        "ngram_planted_pairs",
        "cross_dup_docs",
        "conv_dedup_planted",
        "embedding_neardup_pairs",
        "semdedup_planted",
        "decontam_planted",
        "dup_span_docs",
        # sketches
        "cms_heavy_hitter_users",
        "ddsketch_price_quantiles",
        "hll_distinct_users",
        "bloom_semi_orders",
        # media / multimodal
        "media_bmp_features",
        "media_bmp_phash_pairs",
        "media_jpeg_features",
        # ANN / embeddings
        "knn_cosine",
        "ivf_knn_planted",
        "pq_knn_planted",
        "knn_int8_planted",
        "pca_invariants",
        # text analysis
        "lang_id_planted",
        "fingerprint_planted",
        "gopher_quality_docs",
        "lm_perplexity_planted",
        # relational core + round-5 additions (q6_from_orc is TPC-H Q6
        # through the ORC reader — the relational representative AND
        # the format-reader certification; expectations_orders is the
        # table-contract operator — both hard SQL oracles)
        "q6_from_orc",
        "expectations_orders",
    ]
    head_set = set(head)
    return {k: q[k] for k in head} | {
        k: v for k, v in q.items() if k not in head_set
    }


def oracle_sql() -> dict[str, str]:
    from import_ray.pipelines import relational as R
    from import_ray.stages.similarity import KNN_SQL_TEMPLATE
    from import_ray.stages.text import (
        GOPHER_QUALITY_SQL,
        INVERTED_INDEX_SQL,
        MIXTURE_WEIGHTS_SQL,
        QUALITY_SQL,
        SOURCE_TOKEN_COSINE_SQL,
        SOURCE_VOCAB_OVERLAP_SQL,
        TOKEN_PAIR_SQL,
        TOKEN_STATS_SQL,
        BIGRAM_NEXT_TOPK_SQL,
        REGEX_TOKEN_COUNTS_SQL,
        VOCAB_STATS_SQL,
    )

    return {
        "q1_pricing_summary": R.Q1_SQL,
        "q3_top_orders": R.Q3_SQL,
        "q5_region_revenue": R.Q5_SQL,
        "events_daily_counts": R.EVENTS_DAILY_SQL,
        "distinct_mktsegment": R.DISTINCT_SQL,
        "filter_project_lineitem": R.FILTER_PROJECT_SQL,
        "version_diff_orders": R.VERSION_DIFF_SQL,
        "customers_without_orders": R.ANTI_JOIN_SQL,
        "orders_running_total": R.RUNNING_TOTAL_SQL,
        "coalesce_order_intervals": R.COALESCE_INTERVALS_SQL,
        "order_interval_overlaps": R.INTERVAL_OVERLAP_SQL,
        "purchase_last_signup": R.ASOF_JOIN_SQL,
        "q6_discount_revenue": R.Q6_SQL,
        "q4_order_priority": R.Q4_SQL,
        "q12_priority_by_returnflag": R.Q12_SQL,
        "top_orders_per_priority": R.TOPK_PER_GROUP_SQL,
        "purchase_click_window": R.RANGE_JOIN_SQL,
        "events_sliding_counts": R.SLIDING_SQL,
        "price_percentiles_by_flag": R.PERCENTILE_SQL,
        "distinct_users_by_type": R.DISTINCT_USERS_SQL,
        "cms_heavy_hitter_users": CMS_HEAVY_HITTERS_SQL,
        "lineitem_rollup": R.ROLLUP_SQL,
        "repeat_customers_1995_1996": R.INTERSECT_SQL,
        "sessionize_events": R.SESSIONIZE_SQL,
        "events_trailing_interval": R.TRAILING_INTERVAL_SQL,
        "fd_profile_orders": R.FD_PROFILE_SQL,
        "pivot_user_event_counts": R.PIVOT_SQL,
        "customer_order_gaps": R.ORDER_GAPS_SQL,
        "q13_customer_distribution": R.Q13_SQL,
        "q18_large_orders": R.Q18_SQL,
        "q17_small_quantity_revenue": R.Q17_SQL,
        "top_supplier_per_nation": R.TOP_SUPPLIER_SQL,
        "q22_rich_inactive_customers": R.Q22_SQL,
        "q14_promo_revenue": R.Q14_SQL,
        "q16_part_supplier_counts": R.Q16_SQL,
        "q7_volume_shipping": R.Q7_SQL,
        "q8_market_share": R.Q8_SQL,
        "q10_returned_items": R.Q10_SQL,
        "q15_top_supplier": R.Q15_SQL,
        "q19_disjunctive_revenue": R.Q19_SQL,
        "q21_sole_return_suppliers": R.Q21_SQL,
        "q2_min_cost_supplier": R.Q2_SQL,
        "q9_profit_by_nation_year": R.Q9_SQL,
        "q11_important_parts": R.Q11_SQL,
        "q20_dominant_part_suppliers": R.Q20_SQL,
        "events_props_stats": R.EVENTS_PROPS_SQL,
        "ntile_customers": R.NTILE_SQL,
        "first_last_touch": R.FIRST_LAST_TOUCH_SQL,
        "top_event_per_user": R.TOP_EVENT_PER_USER_SQL,
        "topn_orders_per_customer": R.TOPN_ORDERS_SQL,
        "profile_orders": R.PROFILE_ORDERS_SQL,
        "funnel_events": R.FUNNEL_SQL,
        "cohort_retention": R.COHORT_SQL,
        "event_transitions": R.TRANSITIONS_SQL,
        "orders_price_histogram": R.HISTOGRAM_SQL,
        "corr_price_quantity": R.CORR_SQL,
        "events_gapfill_daily": R.GAPFILL_SQL,
        "events_moving_7d_sum": R.MOVING_7D_SQL,
        "user_activity_trend": R.TREND_SQL,
        "kmeans_planted_purity": KMEANS_PLANTED_ORACLE,
        "doc_rarity_stats": DOC_RARITY_ORACLE,
        "oov_stats_docs": OOV_STATS_ORACLE,
        "chunk_docs": CHUNK_DOCS_ORACLE,
        "bloom_semi_orders": BLOOM_SEMI_ORACLE,
        "segment_dedup_docs": SEGMENT_DEDUP_ORACLE,
        "badword_filter_docs": BADWORD_FILTER_ORACLE,
        "decontam_planted": DECONTAM_PLANTED_ORACLE,
        "pii_redact_planted": PII_REDACT_ORACLE,
        "hash_sample_docs": HASH_SAMPLE_ORACLE,
        "weighted_sample_orders": WEIGHTED_SAMPLE_ORDERS_SQL,
        "bigram_repetition_docs": BIGRAM_REPETITION_ORACLE,
        "cross_dup_docs": CROSS_DUP_ORACLE,
        "kg_ancestors": KG_ANCESTORS_SQL,
        "sssp_parts": SSSP_PARTS_SQL,
        "user_event_paths": R.USER_EVENT_PATHS_SQL,
        "quantity_moments_by_flag": R.MOMENTS_SQL,
        "order_part_jaccard": R.ORDER_JACCARD_SQL,
        "percent_rank_orders": R.PERCENT_RANK_SQL,
        "skyline_orders": R.SKYLINE_SQL,
        "cube_lineitem": R.CUBE_SQL,
        "dup_span_docs": DUP_SPAN_ORACLE,
        "stratified_sample_docs": STRATIFIED_SAMPLE_ORACLE,
        "mixture_sample_docs": MIXTURE_SAMPLE_ORACLE,
        "sampled_percentiles_orders": SAMPLED_PERCENTILES_ORACLE,
        "top_tokens_docs": TOP_TOKENS_ORACLE,
        "top_terms_per_doc": TOP_TERMS_PER_DOC_ORACLE,
        "corpus_clean_exact": CORPUS_CLEAN_ORACLE,
        "dedup_exact_docs": (
            "SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups FROM documents GROUP BY text"
        ),
        "token_stats_docs": TOKEN_STATS_SQL,
        "regex_token_counts_docs": REGEX_TOKEN_COUNTS_SQL,
        "bigram_next_topk_docs": BIGRAM_NEXT_TOPK_SQL,
        "source_token_cosine": SOURCE_TOKEN_COSINE_SQL,
        "source_vocab_overlap": SOURCE_VOCAB_OVERLAP_SQL,
        "vocab_stats_by_source": VOCAB_STATS_SQL,
        "regr_orders_by_priority": R.REGR_BY_PRIORITY_SQL,
        "mixture_weights_by_source": MIXTURE_WEIGHTS_SQL,
        "user_skew_profile": R.USER_SKEW_SQL,
        "inverted_index_docs": INVERTED_INDEX_SQL,
        "token_pairs_docs": TOKEN_PAIR_SQL,
        "gopher_quality_docs": GOPHER_QUALITY_SQL,
        "quality_docs": QUALITY_SQL,
        "knn_cosine": KNN_SQL_TEMPLATE.format(n_queries=_KNN_QUERIES, k=_KNN_K),
        "melt_part": R.MELT_PART_SQL,
        "minhash_planted_clusters": (
            f"SELECT doc_id + {_PLANT_OFFSET} AS doc_id, TRUE AS same_cluster "
            "FROM documents WHERE doc_id % 20 = 0"
        ),
        "lm_perplexity_planted": (
            f"SELECT doc_id + {_PLANT_OFFSET} AS doc_id, TRUE AS higher_ppl "
            "FROM documents WHERE doc_id % 20 = 0"
        ),
        "entity_resolution_planted": (
            "SELECT c_custkey AS entity_id, c_custkey AS canonical_id FROM customer "
            f"UNION ALL SELECT c_custkey + {_ER_V1}, c_custkey "
            "FROM customer WHERE c_custkey % 10 = 0 "
            f"UNION ALL SELECT c_custkey + {_ER_V2}, c_custkey "
            "FROM customer WHERE c_custkey % 10 = 0"
        ),
        "simhash_planted_pairs": (
            f"SELECT doc_id AS doc_lo, doc_id + {_PLANT2} AS doc_hi, "
            "CAST(0 AS BIGINT) AS hamming FROM documents WHERE doc_id % 20 = 0"
        ),
        "ngram_planted_pairs": (
            f"SELECT doc_id AS doc_lo, doc_id + {_PLANT2} AS doc_hi, "
            "1.0 AS jaccard FROM documents WHERE doc_id % 20 = 0"
        ),
        "embedding_neardup_pairs": (
            f"SELECT vec_id AS vec_lo, vec_id + {_PLANT_OFFSET} AS vec_hi, "
            "1.0 AS cosine FROM embeddings WHERE vec_id % 20 = 0"
        ),
        "ivf_knn_planted": (
            f"SELECT vec_id AS query_id, vec_id + {_PLANT_OFFSET} AS neighbor_id, "
            "CAST(1 AS BIGINT) AS rank FROM embeddings WHERE vec_id < 32"
        ),
        "ivfpq_knn_planted": (
            f"SELECT vec_id AS query_id, vec_id + {_PLANT_OFFSET} AS neighbor_id, "
            "CAST(1 AS BIGINT) AS rank FROM embeddings WHERE vec_id < 32"
        ),
        "pq_knn_planted": (
            f"SELECT vec_id AS query_id, vec_id + {_PLANT_OFFSET} AS neighbor_id, "
            "CAST(1 AS BIGINT) AS rank FROM embeddings WHERE vec_id < 32"
        ),
        "pack_docs_conservation": (
            "SELECT CAST(COUNT(*) AS BIGINT) AS total_docs, "
            "CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS total_tokens, "
            "CAST(0 AS BIGINT) AS n_violations FROM documents"
        ),
        "knn_int8_planted": (
            f"SELECT vec_id AS query_id, vec_id + {_PLANT_OFFSET} AS neighbor_id, "
            "CAST(1 AS BIGINT) AS rank FROM embeddings WHERE vec_id < 32"
        ),
        "kg_triples_planted": KG_TRIPLES_PLANTED_SQL,
        "kg_ntriples_roundtrip": KG_TRIPLES_PLANTED_SQL,
        "kg_upsert_planted": KG_UPSERT_PLANTED_SQL,
        "kg_conflicts_planted": KG_CONFLICTS_PLANTED_SQL,
        "conv_sessions_planted": CONV_SESSIONS_PLANTED_SQL,
        "conv_structure_planted": CONV_STRUCTURE_PLANTED_SQL,
        "echo_rate_planted": ECHO_RATE_PLANTED_SQL,
        "boilerplate_planted": BOILERPLATE_PLANTED_SQL,
        "kg_alignment_planted": KG_ALIGNMENT_PLANTED_SQL,
        "conv_prefix_planted": CONV_PREFIX_PLANTED_SQL,
        "sft_pairs_planted": SFT_PAIRS_PLANTED_SQL,
        "kge_negatives_planted": KGE_NEGATIVES_PLANTED_SQL,
        "random_walks_planted": RANDOM_WALKS_PLANTED_SQL,
        "preference_pairs_planted": PREFERENCE_PAIRS_PLANTED_SQL,
        "kg_predicate_history_planted": KG_PREDICATE_HISTORY_PLANTED_SQL,
        "alias_table_planted": ALIAS_TABLE_PLANTED_SQL,
        "tf_boolean_topk_docs": TF_BOOLEAN_TOPK_SQL,
        "kg_scc_planted": KG_SCC_PLANTED_SQL,
        "dag_levels_planted": DAG_LEVELS_PLANTED_SQL,
        "dense_ids_planted": DENSE_IDS_PLANTED_SQL,
        "pseudonymize_planted": PSEUDONYMIZE_PLANTED_SQL,
        "kg_graph_planted": KG_GRAPH_PLANTED_SQL,
        "rdfs_types_planted": RDFS_TYPES_PLANTED_SQL,
        "sameas_canonical_planted": SAMEAS_CANONICAL_PLANTED_SQL,
        "link_mentions_planted": LINK_MENTIONS_PLANTED_SQL,
        "link_mentions_ngram_planted": LINK_MENTIONS_PLANTED_SQL,
        "kg_snapshot_planted": KG_SNAPSHOT_PLANTED_SQL,
        "kg_diff_planted": KG_DIFF_PLANTED_SQL,
        "kg_predicate_counts_planted": KG_PRED_COUNTS_PLANTED_SQL,
        "kg_conv_stats_planted": KG_CONV_STATS_PLANTED_SQL,
        "kg_type_profile_planted": KG_TYPE_PROFILE_PLANTED_SQL,
        "kg_two_hop_planted": KG_TWO_HOP_PLANTED_SQL,
        "editdist_pairs_planted": EDITDIST_PLANTED_SQL,
        "kg_shapes_planted": KG_SHAPES_PLANTED_SQL,
        "conv_reconstruct_planted": CONV_RECONSTRUCT_PLANTED_SQL,
        "conv_dedup_planted": CONV_DEDUP_PLANTED_SQL,
        "tool_transitions_planted": TOOL_TRANSITIONS_PLANTED_SQL,
        "turn_latency_planted": TURN_LATENCY_PLANTED_SQL,
        "pca_invariants": "SELECT vec_id, TRUE AS ok FROM embeddings ORDER BY vec_id",
        "random_projection_invariants": (
            "SELECT vec_id, TRUE AS ok FROM embeddings ORDER BY vec_id"
        ),
        "minhash_keep_best_planted": (
            "SELECT doc_id, doc_id AS cluster_id, "
            "CAST(1000000 AS BIGINT) // 30 AS distinct_ratio_micro, "
            "length(rtrim(repeat('w' || CAST(doc_id AS VARCHAR) || ' ', 30)))"
            " AS n_chars FROM documents"
        ),
        "semdedup_planted": "SELECT vec_id FROM embeddings",
        "dsir_planted": "SELECT doc_id FROM documents WHERE doc_id % 7 = 0",
        "incremental_dedup_docs": INCREMENTAL_DEDUP_SQL,
        "shuffle_shards_docs": SHUFFLE_SHARDS_SQL,
        "lang_id_planted": LANG_ID_PLANTED_SQL,
        "fingerprint_planted": (
            f"SELECT doc_id + {_PLANT2} AS doc_id, TRUE AS same_fp "
            "FROM documents WHERE doc_id % 20 = 0"
        ),
        "events_series_groups": (
            "SELECT CAST(user_id AS VARCHAR) AS entity, event_type AS variable, "
            "1 AS n FROM events GROUP BY user_id, event_type"
        ),
        "config_import_obs": CONFIG_IMPORT_SQL,
        # format-reader certifications: same operator over an ORC/JSONL
        # copy of the table; the oracle reads the original parquet view
        "q6_from_orc": R.Q6_SQL,
        "events_daily_from_jsonl": R.EVENTS_DAILY_SQL,
        "expectations_orders": EXPECTATIONS_ORDERS_SQL,
        "harmonic_star_planted": HARMONIC_STAR_SQL,
        # lang_id_docs, minhash/simhash/ngram near-dup, doc_fingerprints,
        # multimodal_features, kg_transcript_triples: not SQL-expressible
        # → rows-only checks
    }
