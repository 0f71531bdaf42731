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
