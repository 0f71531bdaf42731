"""Alias-table mining: multi-mention rows, cross-block count folding,
row-boundary safety of the concatenated regex pass."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_alias_table(ray_session, tmp_path):
    from import_ray.stages.alias import alias_table

    texts = [
        # two mentions in one row, one of them repeated
        "see geoId:06 (California) and also geoId:06 (California)",
        "see isoCode:IN-KL (Kerala) today",
        # same entity, different alias
        "visited geoId:06 (Golden State)",
        # parens far from any id: no pair
        "no mention here (just parens)",
        # id with no alias parens
        "bare geoId:48 mention",
    ]
    n = len(texts)
    t = pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(n)], pa.string()),
            "turn_idx": pa.array(np.zeros(n, np.int32), pa.int32()),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array([""] * n, pa.string()),
            "ts": pa.array(
                np.full(n, np.datetime64("2025-01-01", "us")), pa.timestamp("us")
            ),
        }
    )
    path = str(tmp_path / "tx.parquet")
    pq.write_table(t, path)
    got = (
        alias_table(path)
        .to_pandas()
        .sort_values(["entity_id", "alias"])
        .reset_index(drop=True)
    )
    want = [
        ("geoId/06", "California", 2),
        ("geoId/06", "Golden State", 1),
        ("iso/IN-KL", "Kerala", 1),
    ]
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_alias_block_pairs_row_boundary():
    """A paren group can't leak across the row separator."""
    from import_ray.stages.alias import _block_pairs

    ents, aliases = _block_pairs(
        np.array(["tail geoId:06 (open", "close) head"], dtype=object)
    )
    assert len(ents) == 0


def test_link_mentions_prior_disambiguation(ray_session):
    import pandas as pd
    import ray.data

    from import_ray.stages.alias import link_mentions

    alias_df = pd.DataFrame(
        {
            "entity_id": ["geoId/1", "geoId/2", "geoId/3", "geoId/9"],
            "alias": ["Springfield", "Springfield", "Shelbyville", "Spring"],
            "n_mentions": [10, 3, 5, 99],
        }
    )
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "meet me in Springfield today",
        "Springfield and Shelbyville are rivals; Spring is not a town",
        "nothing to link here",
        "Springfield Springfield",  # two occurrences in one row
    ]
    path = "/tmp/graft_test_link/transcripts.parquet"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table({"text": pa.array(texts, pa.string())}), path)

    out = (
        link_mentions(path, ray.data.from_pandas(alias_df))
        .to_pandas()
        .sort_values("alias")
        .reset_index(drop=True)
    )
    # Springfield -> geoId/1 (prior 10 beats 3); 4 occurrences.
    # Shelbyville -> geoId/3, 1 occurrence.
    # Spring matches only the standalone word (longest-first alternation
    # means every 'Springfield' consumes its prefix), 1 occurrence.
    want = pd.DataFrame(
        {
            "alias": ["Shelbyville", "Spring", "Springfield"],
            "entity_id": ["geoId/3", "geoId/9", "geoId/1"],
            "n_links": [1, 1, 4],
        }
    )
    pd.testing.assert_frame_equal(out.astype({"n_links": "int64"}), want)


def test_ngram_linker_byte_equal_10k_gazetteer(ray_session, tmp_path):
    """The hashed n-gram open-vocabulary linker (the Aho-Corasick-shaped
    large-gazetteer path, built once per actor in __init__) produces
    byte-identical links to the alternation-regex path on a 10k-alias
    gazetteer with no nested/substring aliases."""
    import pandas as pd

    from import_ray.stages.alias import link_mentions

    rng = np.random.default_rng(23)
    n_alias = 10_000
    aliases = [f"Ent{i:05d} Name{i % 97}" for i in range(n_alias)]
    # alias table: each alias maps to one entity with some prior
    alias_tbl = pa.table(
        {
            "entity_id": pa.array(
                [f"geoId/{i}" for i in range(n_alias)], pa.large_string()
            ),
            "alias": pa.array(aliases, pa.large_string()),
            "n_mentions": pa.array(
                rng.integers(1, 50, n_alias).astype(np.int64), pa.int64()
            ),
        }
    )
    # corpus: rows mentioning a few random aliases each (inside punctuation)
    rows = []
    for r in range(400):
        picks = rng.integers(0, n_alias, 3)
        rows.append(
            "saw (%s) then %s, finally [%s]!"
            % tuple(aliases[int(p)] for p in picks)
        )
    t = pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(len(rows))], pa.string()),
            "turn_idx": pa.array(np.zeros(len(rows), np.int32), pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array(rows, pa.string()),
            "tool": pa.array([""] * len(rows), pa.string()),
            "ts": pa.array(
                np.full(len(rows), np.datetime64("2025-01-01", "us")),
                pa.timestamp("us"),
            ),
        }
    )
    path = str(tmp_path / "tx.parquet")
    pq.write_table(t, path)
    import ray.data

    ads = ray.data.from_arrow(alias_tbl)

    def norm(ds):
        df = ds.to_pandas().sort_values(["alias", "entity_id"]).reset_index(drop=True)
        return df

    got_ng = norm(link_mentions(path, ads, matcher="ngram"))
    got_re = norm(link_mentions(path, ray.data.from_arrow(alias_tbl), matcher="regex"))
    pd.testing.assert_frame_equal(got_ng, got_re)
    assert len(got_ng) > 0 and got_ng["n_links"].sum() == 1200


def test_probe_sorted_table_g1_collision_run_tail():
    """ADVICE r4: when two distinct aliases collide on the 64-bit g1
    hash, searchsorted lands on the first entry of the run — the probe
    must walk the run tail so the later-sorted alias still matches."""
    from import_ray.stages.alias import _probe_sorted_table

    # three table entries: a g1 run of length 2 (same g1, distinct g2)
    # plus an unrelated singleton.
    g1 = np.array([100, 100, 200], np.uint64)
    g2 = np.array([7, 9, 5], np.uint64)
    max_run = 2

    # queries: first-of-run, tail-of-run, singleton, g1-hit-but-no-g2,
    # full miss, and an invalid (row-spanning) window.
    w1 = np.array([100, 100, 200, 100, 150, 100], np.uint64)
    w2 = np.array([7, 9, 5, 11, 5, 9], np.uint64)
    valid = np.array([True, True, True, True, True, False])
    got = _probe_sorted_table(g1, g2, max_run, w1, w2, valid)
    assert got.tolist() == [0, 1, 2, -1, -1, -1]

    # with max_run=1 (pre-fix behavior) the tail entry is missed —
    # documents exactly what the probe adds.
    got1 = _probe_sorted_table(g1, g2, 1, w1, w2, valid)
    assert got1.tolist() == [0, -1, 2, -1, -1, -1]
