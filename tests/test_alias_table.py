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
