"""Flagship transcripts→triples pipeline tests (Ray)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from import_ray.sources.transcripts import synthesize_transcripts


@pytest.fixture(scope="module")
def transcripts_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("tx") / "transcripts.parquet"
    return synthesize_transcripts(str(p), n_convs=40, seed=42)


def test_determinism(tmp_path):
    a = synthesize_transcripts(str(tmp_path / "a.parquet"), n_convs=10, seed=7)
    b = synthesize_transcripts(str(tmp_path / "b.parquet"), n_convs=10, seed=7)
    import pyarrow.parquet as pq

    assert pq.read_table(a).equals(pq.read_table(b))


def test_per_turn_text_equality(ray_session, transcripts_path):
    """Triples must carry every turn's text verbatim, recoverable under
    stable (conv_id, turn_idx) ordering — the BASELINE input invariant."""
    import pyarrow.parquet as pq
    import ray.data

    from import_ray.pipelines.kg import build_triples

    src = pq.read_table(transcripts_path)
    ds = build_triples(transcripts_path, conv_aggregates=False, dedup=False)
    t = ds.take_all()
    text_triples = {
        r["subject_id"]: r["object_value"] for r in t if r["predicate"] == "text"
    }
    # every turn appears exactly once with its exact text
    assert len(text_triples) == src.num_rows
    for conv, idx, text in zip(
        src["conv_id"].to_pylist(),
        src["turn_idx"].to_pylist(),
        src["text"].to_pylist(),
    ):
        assert text_triples[f"conv/{conv}/t{idx}"] == text


def test_conversation_aggregates_stable_under_shuffle(ray_session, tmp_path):
    """Conversation checksum/turn-count is identical whether the input
    arrives shuffled or ordered (stable-ordering invariant)."""
    import ray.data

    from import_ray.pipelines.kg import build_triples

    p1 = synthesize_transcripts(str(tmp_path / "s.parquet"), n_convs=12, shuffle=True)
    p2 = synthesize_transcripts(str(tmp_path / "o.parquet"), n_convs=12, shuffle=False)

    def conv_map(path):
        ds = build_triples(path, dedup=False)
        rows = ds.take_all()
        return {
            (r["subject_id"], r["predicate"]): r["object_value"]
            for r in rows
            if r["predicate"] in ("turnChecksum", "turnCount", "startTime", "endTime")
        }

    assert conv_map(p1) == conv_map(p2)


def test_dedup_and_svobs_dcids(ray_session, transcripts_path):
    from import_ray.pipelines.kg import build_triples

    ds = build_triples(transcripts_path)
    t = ds.take_all()
    keys = [
        (r["subject_id"], r["predicate"], r["object_id"], r["object_value"]) for r in t
    ]
    assert len(keys) == len(set(keys)), "exact dedup must leave no duplicate tuples"
    svobs = [r for r in t if r["subject_id"].startswith("dc/o/")]
    assert svobs, "expected content-hash SVObs dcids in the output"
    places = {
        r["subject_id"]
        for r in t
        if r["predicate"] == "typeOf" and r["object_id"] == "Place"
    }
    assert any(s.startswith("iso/") or s.startswith("geoId/") for s in places)


def test_write_partitioned(ray_session, transcripts_path, tmp_path):
    import glob

    from import_ray.pipelines.kg import build_triples, write_triples

    ds = build_triples(transcripts_path, conv_aggregates=False)
    write_triples(ds, str(tmp_path / "out"), n_buckets=4)
    parts = glob.glob(str(tmp_path / "out" / "part_key=*"))
    assert len(parts) >= 2


def test_turn_latency_stats_matches_duckdb(ray_session, transcripts_path):
    """Per-role latency stats must match a DuckDB LAG window over the
    same parquet (floor-to-ms before subtraction, as the kernel does)."""
    import duckdb
    import pandas as pd

    from import_ray.pipelines.kg import turn_latency_stats

    got = turn_latency_stats(transcripts_path).reset_index(drop=True)

    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH lagged AS (
          SELECT role,
                 epoch_us(ts) // 1000 AS ts_ms,
                 LAG(epoch_us(ts) // 1000) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
                 ) AS prev_ms
          FROM read_parquet('{transcripts_path}')
        )
        SELECT role,
               CAST(COUNT(*) AS BIGINT) AS n_turns,
               CAST(SUM(ts_ms - prev_ms) AS BIGINT) AS sum_latency_ms,
               CAST(MAX(ts_ms - prev_ms) AS BIGINT) AS max_latency_ms
        FROM lagged WHERE prev_ms IS NOT NULL
        GROUP BY role ORDER BY role
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_conv_kg_stats_matches_pandas(ray_session, transcripts_path):
    """Per-conversation KG yield must equal a pandas groupby over the
    same canonical triples (conv recovered from the subject scheme)."""
    import pandas as pd

    from import_ray.pipelines.kg import build_triples, conv_kg_stats

    got = (
        conv_kg_stats(transcripts_path)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )

    tri = build_triples(transcripts_path).to_pandas()
    tri["conv_id"] = tri["subject_id"].str.extract(r"^conv/([^/]+)", expand=False)
    tri = tri[tri["conv_id"].notna()]
    links = tri[tri["object_id"].notna() & (tri["object_id"] != "")]
    want = (
        tri.groupby("conv_id")
        .size()
        .rename("n_triples")
        .to_frame()
        .join(links.groupby("conv_id").size().rename("n_entity_links"))
        .join(
            links.drop_duplicates(["conv_id", "object_id"])
            .groupby("conv_id")
            .size()
            .rename("n_distinct_entities")
        )
        .fillna(0)
        .astype("int64")
        .reset_index()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["conv_id", "n_triples", "n_entity_links", "n_distinct_entities"]],
        want,
        check_dtype=False,
    )
    assert (got["n_entity_links"] >= got["n_distinct_entities"]).all()


def test_kg_snapshot_asof_matches_prefiltered_build(ray_session, transcripts_path, tmp_path):
    """Time-travel snapshot parity: triples as-of a cutoff must equal a
    full build over a physically truncated input (same canonical
    4-tuples, including recomputed conversation aggregates)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from import_ray.pipelines.kg import build_triples, kg_snapshot_asof

    src = pq.read_table(transcripts_path)
    # cutoff at the median turn timestamp → a proper subset with some
    # conversations truncated mid-way (aggregates must change)
    ts = src["ts"].to_pandas()
    cutoff = ts.quantile(0.5)
    trunc = src.filter(pc.less_equal(src["ts"], pa.scalar(np.datetime64(cutoff, "us"))))
    assert 0 < trunc.num_rows < src.num_rows
    trunc_path = str(tmp_path / "trunc.parquet")
    pq.write_table(trunc, trunc_path)

    cols = ["subject_id", "predicate", "object_id", "object_value"]

    def canon(ds):
        df = ds.to_pandas()[cols].astype(str)
        return df.sort_values(cols, kind="mergesort").reset_index(drop=True)

    got = canon(kg_snapshot_asof(transcripts_path, cutoff=str(cutoff.isoformat())))
    want = canon(build_triples(trunc_path))
    pd.testing.assert_frame_equal(got, want)


def _count_reads(ds) -> int:
    """Number of read operators in the logical plan — the fused pipeline
    must scan the input exactly once."""
    seen, stack, reads = set(), [ds._logical_plan.dag], 0
    while stack:
        op = stack.pop()
        if id(op) in seen:
            continue
        seen.add(id(op))
        if type(op).__name__.startswith("Read"):
            reads += 1
        stack.extend(getattr(op, "input_dependencies", []))
    return reads


def test_fused_single_scan_matches_legacy_plan(ray_session, transcripts_path):
    """The fused single-scan pipeline (one extractor emitting triples +
    conv-partial pseudo-rows, one keyed exchange) must produce exactly
    the triple set of the legacy two-branch plan, for both dedup
    strategies — and its logical plan must contain exactly ONE read."""
    import pandas as pd
    import ray.data

    from import_ray.core.context import configure_data_context
    from import_ray.pipelines.kg import TRANSCRIPT_COLS, build_triples
    from import_ray.stages.dedup import exact_dedup_triples
    from import_ray.stages.extract import (
        ConversationPartials,
        TranscriptTripleExtractor,
        merge_conversation_partials_block,
    )

    cols = ["subject_id", "predicate", "object_id", "object_value", "provenance"]

    def canon(ds):
        df = ds.to_pandas()
        return (
            df[cols].astype(str).sort_values(cols, kind="mergesort").reset_index(drop=True)
        )

    configure_data_context()
    src = ray.data.read_parquet(transcripts_path, columns=TRANSCRIPT_COLS)
    turn = src.map_batches(TranscriptTripleExtractor(), batch_format="pyarrow")
    conv = (
        src.map_batches(ConversationPartials(), batch_format="pyarrow")
        .repartition(4, keys=["conv_id"])
        .map_batches(
            merge_conversation_partials_block, batch_format="pyarrow", batch_size=None
        )
    )
    want = canon(exact_dedup_triples(turn.union(conv), num_partitions=4))

    for strategy in ("shuffle", "broadcast"):
        fused = build_triples(transcripts_path, dedup_strategy=strategy)
        # shuffle: exactly one ReadParquet in the lazy plan; broadcast:
        # zero (the strategy materializes the hashed rows, consuming the
        # single scan eagerly). Both must be < the legacy plan's two.
        assert _count_reads(fused) <= 1, f"{strategy}: fused plan must read once"
        pd.testing.assert_frame_equal(canon(fused), want)


def test_dedup_strategies_identical(ray_session, transcripts_path):
    """Shuffle dedup (rows move once) and broadcast dedup (only 32-byte
    keys move; actor-pool winner filter) must produce identical triple
    sets — the broadcast path is the 100 TB strategy, the shuffle path
    the local-optimal one."""
    import pandas as pd

    from import_ray.pipelines.kg import build_triples

    cols = ["subject_id", "predicate", "object_id", "object_value", "provenance"]

    def canon(strategy):
        df = build_triples(transcripts_path, dedup_strategy=strategy).to_pandas()
        return (
            df[cols].astype(str).sort_values(cols, kind="mergesort").reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(canon("shuffle"), canon("broadcast"))


def test_broadcast_prefilter_on_off_identical(ray_session, transcripts_path):
    """The two-round Bloom h1 prefilter must not change the broadcast
    dedup result: prefilter on (8B h1 exchange + candidate-only full
    keys) and off (full 32B keys for every row) are byte-equal, and
    both match the shuffle strategy."""
    import pandas as pd
    import ray.data

    from import_ray.stages.dedup import (
        _hash_tag_local_distinct,
        broadcast_dedup_hashed,
        exact_dedup_triples,
    )
    from import_ray.pipelines.kg import build_triples
    from import_ray.stages.extract import TranscriptTripleExtractor

    turn = ray.data.read_parquet(transcripts_path).map_batches(
        TranscriptTripleExtractor(provenance="t"),
        batch_format="pyarrow",
    )
    cols = ["subject_id", "predicate", "object_id", "object_value", "provenance"]

    def canon(ds):
        df = ds.to_pandas()
        return (
            df[cols]
            .astype(str)
            .sort_values(cols, kind="mergesort")
            .reset_index(drop=True)
        )

    hashed = turn.map_batches(
        _hash_tag_local_distinct, batch_format="pyarrow"
    ).materialize()
    on = canon(broadcast_dedup_hashed(hashed, 4, h1_prefilter=True))
    off = canon(broadcast_dedup_hashed(hashed, 4, h1_prefilter=False))
    pd.testing.assert_frame_equal(on, off)
    want = canon(exact_dedup_triples(turn, num_partitions=4, strategy="shuffle"))
    pd.testing.assert_frame_equal(on, want)


def test_broadcast_prefilter_dupfree_short_circuit(ray_session):
    """A corpus with no cross-block duplicates: the empty dup-h1 Bloom
    short-circuits round 2 (no winner exchange) and the output is the
    input minus hash columns."""
    import pyarrow as pa
    import ray.data

    from import_ray.stages.dedup import (
        _hash_tag_local_distinct,
        broadcast_dedup_hashed,
    )

    t = pa.table(
        {
            "subject_id": pa.array([f"s{i}" for i in range(100)]),
            "predicate": pa.array(["p"] * 100),
            "object_id": pa.array([f"o{i}" for i in range(100)]),
            "object_value": pa.array([""] * 100, pa.large_string()),
            "provenance": pa.array(["x"] * 100),
        }
    )
    hashed = (
        ray.data.from_arrow(t)
        .repartition(4)
        .map_batches(_hash_tag_local_distinct, batch_format="pyarrow")
        .materialize()
    )
    out = broadcast_dedup_hashed(hashed, 4, h1_prefilter=True)
    df = out.to_pandas()
    assert len(df) == 100
    assert set(df.columns) == {
        "subject_id",
        "predicate",
        "object_id",
        "object_value",
        "provenance",
    }
