"""Skew handling: mega-conversations must not collapse throughput or
break conversation aggregates (north rule: salted repartitioning /
two-level aggregation before the grouped stage)."""

from __future__ import annotations

import time

from import_ray.sources.transcripts import synthesize_transcripts


def test_mega_conversation_correctness(ray_session, tmp_path):
    """One conversation holds ~70% of all turns; conversation aggregates
    must still be exact because partials pre-aggregate per batch and the
    shuffle only moves tiny partial rows."""
    import pyarrow.parquet as pq

    from import_ray.pipelines.kg import build_triples

    p = synthesize_transcripts(
        str(tmp_path / "skew.parquet"),
        n_convs=30,
        mega_every=30,  # conv 29 is mega
        mega_turns=5000,
        seed=11,
    )
    src = pq.read_table(p)
    import collections

    true_counts = collections.Counter(src["conv_id"].to_pylist())
    mega_conv = max(true_counts, key=true_counts.get)
    assert true_counts[mega_conv] == 5000

    ds = build_triples(p, dedup=False)
    rows = ds.take_all()
    counts = {
        r["subject_id"]: int(r["object_value"])
        for r in rows
        if r["predicate"] == "turnCount"
    }
    for conv, n in true_counts.items():
        assert counts[f"conv/{conv}"] == n

    checksums = [r for r in rows if r["predicate"] == "turnChecksum"]
    assert len(checksums) == len(true_counts)


def test_partials_bound_shuffle_rows(ray_session, tmp_path):
    """The conv shuffle must move O(#convs × #batches) partial rows, not
    O(#turns) raw rows — the skew guard itself."""
    import ray.data

    from import_ray.stages.extract import ConversationPartials

    p = synthesize_transcripts(
        str(tmp_path / "skew2.parquet"), n_convs=20, mega_every=20, mega_turns=3000, seed=3
    )
    ds = ray.data.read_parquet(p)
    n_turns = ds.count()
    partials = ds.map_batches(
        ConversationPartials(), batch_format="pyarrow", batch_size=1024
    )
    n_partials = partials.count()
    assert n_partials < n_turns / 10, (n_partials, n_turns)
