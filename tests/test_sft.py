"""SFT pair extraction: window clipping, multi-response, role gating."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from import_ray.stages.sft import sft_pairs


def _write(tmp_path, rows):
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string()),
            "ts": pa.array(
                np.full(len(rows), np.datetime64("2025-01-01", "us")),
                pa.timestamp("us"),
            ),
        }
    )
    p = str(tmp_path / "tx.parquet")
    pq.write_table(tbl, p)
    return p


def test_sft_pairs_window_and_order(ray_session, tmp_path):
    p = _write(
        tmp_path,
        [
            ("c1", 0, "user", "q1"),
            ("c1", 1, "agent", "a1"),
            ("c1", 2, "user", "q2"),
            ("c1", 3, "agent", "a2"),
            ("c1", 4, "user", "q3"),
            ("c1", 5, "agent", "a3"),
        ],
    )
    got = sorted(sft_pairs(p, context_turns=2).take_all(), key=lambda r: r["turn_idx"])
    assert [(r["turn_idx"], r["response"]) for r in got] == [
        (1, "a1"), (3, "a2"), (5, "a3")
    ]
    # turn 1: only one preceding turn exists (clipped window)
    assert got[0]["prompt"] == "user: q1"
    # turn 3: exactly the 2 preceding turns, chronological
    assert got[1]["prompt"] == "agent: a1\nuser: q2"
    assert got[2]["prompt"] == "agent: a2\nuser: q3"


def test_sft_pairs_role_gating_and_first_turn(ray_session, tmp_path):
    p = _write(
        tmp_path,
        [
            # agent at idx 0 has no context -> no pair
            ("c1", 0, "agent", "hello"),
            ("c1", 1, "user", "hi"),
            # user turns never produce pairs
            ("c2", 0, "user", "a"),
            ("c2", 1, "user", "b"),
        ],
    )
    assert sft_pairs(p, context_turns=4).take_all() == []


def test_sft_pairs_large_window_clips_to_conv_start(ray_session, tmp_path):
    p = _write(
        tmp_path,
        [
            ("c1", 0, "user", "u0"),
            ("c1", 1, "user", "u1"),
            ("c1", 2, "agent", "r"),
            ("c2", 0, "user", "other"),
            ("c2", 1, "agent", "x"),
        ],
    )
    got = {r["conv_id"]: r for r in sft_pairs(p, context_turns=99).take_all()}
    # never leaks turns from a different conversation
    assert got["c1"]["prompt"] == "user: u0\nuser: u1"
    assert got["c2"]["prompt"] == "user: other"
