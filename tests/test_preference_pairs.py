"""Preference-pair extraction: grouped chosen/rejected selection,
tie-breaks, prefix clipping, and missing-response handling."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, rows):
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array(["" for _ in rows], pa.string()),
            "ts": pa.array(
                np.full(len(rows), np.datetime64("2025-01-01", "us")),
                pa.timestamp("us"),
            ),
        }
    )
    path = str(tmp_path / "tx.parquet")
    pq.write_table(t, path)
    return path


def test_preference_pairs_basic(ray_session, tmp_path):
    from import_ray.stages.sft import preference_pairs

    rows = [
        # group "system: S1": three candidates, lengths 5/3/1
        ("c1", 0, "system", "S1"), ("c1", 1, "agent", "aaaaa"),
        ("c2", 0, "system", "S1"), ("c2", 1, "agent", "bbb"),
        ("c3", 0, "system", "S1"), ("c3", 1, "agent", "z"),
        # group "system: S2": single candidate -> dropped
        ("c4", 0, "system", "S2"), ("c4", 1, "agent", "solo"),
        # conv with no agent turn after the prefix -> not a candidate
        ("c5", 0, "system", "S1"), ("c5", 1, "user", "question only"),
        # conv shorter than the prefix -> not a candidate
        ("c6", 0, "system", "S3"),
    ]
    path = _write(tmp_path, rows)
    got = preference_pairs(path, k_turns=1).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r.prompt == "system: S1"
    assert r.chosen == "aaaaa" and r.chosen_score == 5
    assert r.rejected == "z" and r.rejected_score == 1
    assert r.n_candidates == 3


def test_preference_pairs_tiebreak_by_conv(ray_session, tmp_path):
    from import_ray.stages.sft import preference_pairs

    # equal-length responses: chosen = min conv_id, rejected = max
    rows = [
        ("a9", 0, "system", "P"), ("a9", 1, "agent", "xx"),
        ("a1", 0, "system", "P"), ("a1", 1, "agent", "yy"),
        ("a5", 0, "system", "P"), ("a5", 1, "agent", "zz"),
    ]
    path = _write(tmp_path, rows)
    got = preference_pairs(path, k_turns=1).to_pandas()
    assert len(got) == 1
    assert got.iloc[0].chosen == "yy"  # a1
    assert got.iloc[0].rejected == "xx"  # a9
    assert got.iloc[0].n_candidates == 3


def test_preference_pairs_multiturn_prompt(ray_session, tmp_path):
    from import_ray.stages.sft import preference_pairs

    # k_turns=2: prompt joins system+user lines; response is the first
    # agent turn at/after position 2 (skipping the tool turn)
    rows = [
        ("m1", 0, "system", "S"), ("m1", 1, "user", "U"),
        ("m1", 2, "tool", "T"), ("m1", 3, "agent", "long answer"),
        ("m2", 0, "system", "S"), ("m2", 1, "user", "U"),
        ("m2", 2, "agent", "hi"),
    ]
    path = _write(tmp_path, rows)
    got = preference_pairs(path, k_turns=2).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r.prompt == "system: S\nuser: U"
    assert r.chosen == "long answer" and r.rejected == "hi"
