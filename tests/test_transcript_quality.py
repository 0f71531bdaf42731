"""Echo-rate and boilerplate-mining semantics on hand-built transcripts."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from import_ray.stages.transcript_quality import boilerplate_turns, turn_echo_rate


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


def test_echo_rate_partial_and_pairing(ray_session, tmp_path):
    p = _write(
        tmp_path,
        [
            # c1: agent echoes 2 of its 4 distinct tokens -> 0.5
            ("c1", 0, "user", "alpha beta gamma"),
            ("c1", 1, "agent", "alpha beta new1 new2"),
            # c2: two pairs, rates 1.0 and 0.0 -> mean 0.5
            ("c2", 0, "user", "x y"),
            ("c2", 1, "agent", "x y"),
            ("c2", 2, "user", "p q"),
            ("c2", 3, "agent", "r s"),
            # c3: agent-after-agent is NOT a pair; only t1 counts
            ("c3", 0, "user", "a b"),
            ("c3", 1, "agent", "a b"),
            ("c3", 2, "agent", "a b"),
            # c4: no user->agent adjacency at all -> omitted
            ("c4", 0, "agent", "z"),
            # c5: duplicate agent tokens count once (distinct)
            ("c5", 0, "user", "w"),
            ("c5", 1, "agent", "w w w v"),
        ],
    )
    got = {r["conv_id"]: r for r in turn_echo_rate(p).take_all()}
    assert got["c1"]["n_pairs"] == 1 and got["c1"]["echo_rate"] == 0.5
    assert got["c2"]["n_pairs"] == 2 and got["c2"]["echo_rate"] == 0.5
    assert got["c3"]["n_pairs"] == 1 and got["c3"]["echo_rate"] == 1.0
    assert "c4" not in got
    assert got["c5"]["echo_rate"] == 0.5  # {w,v} distinct, w hits


def test_echo_rate_empty_agent_turn_is_zero(ray_session, tmp_path):
    p = _write(tmp_path, [("c1", 0, "user", "a"), ("c1", 1, "agent", "")])
    (row,) = turn_echo_rate(p).take_all()
    assert row["echo_rate"] == 0.0


def test_boilerplate_distinct_conv_counting(ray_session, tmp_path):
    rows = []
    # template in 3 distinct convs; conv t0 repeats it twice (counts once)
    for c in ("t0", "t1", "t2"):
        rows.append((c, 0, "user", "q"))
        rows.append((c, 1, "agent", "TEMPLATE"))
    rows.append(("t0", 2, "user", "q2"))
    rows.append(("t0", 3, "agent", "TEMPLATE"))
    # near-boilerplate in only 2 convs: below min_convs=3
    for c in ("u0", "u1"):
        rows.append((c, 0, "user", "q"))
        rows.append((c, 1, "agent", "ALMOST"))
    # user-role repeats never count
    for c in ("v0", "v1", "v2"):
        rows.append((c, 0, "user", "SAME USER"))
    p = _write(tmp_path, rows)
    out = boilerplate_turns(p, min_convs=3).take_all()
    assert [(r["text"], r["n_convs"]) for r in out] == [("TEMPLATE", 3)]


def test_boilerplate_none_found_schema(ray_session, tmp_path):
    p = _write(tmp_path, [("c1", 0, "user", "a"), ("c1", 1, "agent", "b")])
    ds = boilerplate_turns(p, min_convs=2)
    assert ds.take_all() == []
