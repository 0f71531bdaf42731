"""Conversation-grain operators: ordered reconstruction, conv-level
exact dedup, ordered string aggregation, and weighted SSSP.

The reconstruction test IS the north-star invariant check: per-turn
text equality under stable (conv_id, turn_idx) ordering.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from import_ray.pipelines.kg import conv_dedup_exact, reconstruct_conversations


def test_reconstruct_matches_pandas(ray_session, sf_small):
    from import_ray.sources.transcripts import ensure_transcripts

    path = ensure_transcripts(sf_small)
    got = (
        reconstruct_conversations(path)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )

    raw = pq.read_table(path, columns=["conv_id", "turn_idx", "text"]).to_pandas()
    raw = raw.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    want = (
        raw.groupby("conv_id", sort=True)["text"]
        .agg(n_turns="size", full_text="\n".join)
        .reset_index()
    )
    assert list(got["conv_id"]) == list(want["conv_id"])
    assert list(got["n_turns"]) == [int(x) for x in want["n_turns"]]
    # per-turn text equality under stable ordering, conversation by
    # conversation (full corpus, byte-exact)
    assert list(got["full_text"]) == list(want["full_text"])


def test_reconstruct_order_is_turn_idx_not_input_order(ray_session, tmp_path):
    # rows written deliberately out of turn order
    tbl = pa.table(
        {
            "conv_id": ["c1", "c1", "c1", "c2"],
            "turn_idx": pa.array([2, 0, 1, 0], pa.int32()),
            "text": ["third", "first", "second", "solo"],
        }
    )
    p = str(tmp_path / "t.parquet")
    pq.write_table(tbl, p)
    got = reconstruct_conversations(p).to_pandas().set_index("conv_id")
    assert got.loc["c1", "full_text"] == "first\nsecond\nthird"
    assert got.loc["c2", "full_text"] == "solo"


def _write_transcripts(tmp_path, rows):
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    p = str(tmp_path / "dup.parquet")
    pq.write_table(tbl, p)
    return p


def test_conv_dedup_exact_planted(ray_session, tmp_path):
    # a==c (identical ordered (role, text) sequence), b differs by one
    # byte, d differs only by ROLE of turn 1, e is a reordered copy of a
    # (same multiset, different turn order → distinct)
    rows = [
        ("a", 0, "user", "hello"),
        ("a", 1, "assistant", "world"),
        ("c", 0, "user", "hello"),
        ("c", 1, "assistant", "world"),
        ("b", 0, "user", "hello"),
        ("b", 1, "assistant", "world!"),
        ("d", 0, "user", "hello"),
        ("d", 1, "tool", "world"),
        ("e", 0, "assistant", "world"),
        ("e", 1, "user", "hello"),
    ]
    p = _write_transcripts(tmp_path, rows)
    got = conv_dedup_exact(p).to_pandas().sort_values("conv_id")
    assert list(got["conv_id"]) == ["a", "b", "d", "e"]
    assert got.set_index("conv_id")["n_dups"].to_dict() == {
        "a": 2,
        "b": 1,
        "d": 1,
        "e": 1,
    }


def test_user_event_paths_oracle(ray_session, sf_small):
    import duckdb

    from import_ray.pipelines.relational import USER_EVENT_PATHS_SQL, user_event_paths

    got = (
        user_event_paths(sf_small)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_small}/events.parquet')"
    )
    want = (
        con.execute(USER_EVENT_PATHS_SQL)
        .df()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert list(got["user_id"]) == list(want["user_id"])
    assert list(got["n_events"]) == list(want["n_events"])
    assert list(got["path"]) == list(want["path"])


def _sssp_driver(edges, roots, cap=10**9):
    """Reference Bellman-Ford on the driver."""
    dist = {}
    changed = True
    while changed:
        changed = False
        for s, d, w in edges:
            base = 0 if d in roots else dist.get(d, None)
            if base is None:
                continue
            nd = base + w
            if nd < dist.get(s, cap):
                dist[s] = nd
                changed = True
    return dist


def _sssp_ds(edges):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
                "w": pa.array([e[2] for e in edges], pa.int64()),
            }
        )
    ).repartition(3)


def test_weighted_sssp_prefers_cheap_long_path(ray_session):
    from import_ray.stages.graph import weighted_sssp

    # 20 → root 1 direct costs 10; 20 → 11 → 12 → 1 costs 1+1+1 = 3
    edges = [
        (20, 1, 10),
        (20, 11, 1),
        (11, 12, 1),
        (12, 1, 1),
        (30, 20, 2),  # dist(30) = 2 + 3 = 5
        (40, 99, 7),  # unreachable from any root → absent
    ]
    got = {
        int(r.node): int(r.dist)
        for r in weighted_sssp(_sssp_ds(edges), roots=[1]).to_pandas().itertuples()
    }
    assert got == {20: 3, 11: 2, 12: 1, 30: 5}


def test_weighted_sssp_cycle_and_multi_root(ray_session):
    from import_ray.stages.graph import weighted_sssp

    edges = [
        (10, 11, 1),
        (11, 10, 1),  # cycle between non-roots
        (11, 2, 5),
        (10, 3, 4),
        (12, 10, 1),
    ]
    roots = {2, 3}
    got = {
        int(r.node): int(r.dist)
        for r in weighted_sssp(_sssp_ds(edges), roots=roots, max_rounds=12)
        .to_pandas()
        .itertuples()
    }
    want = _sssp_driver(edges, roots)
    assert got == want == {11: 5, 10: 4, 12: 5}


def test_weighted_sssp_random_graph_matches_driver(ray_session):
    from import_ray.stages.graph import weighted_sssp

    rng = np.random.RandomState(7)
    n = 120
    src = rng.randint(10, n, size=400)
    dst = rng.randint(0, n, size=400)
    w = rng.randint(1, 9, size=400)
    keep = src != dst
    edges = list(
        zip(src[keep].tolist(), dst[keep].tolist(), w[keep].tolist())
    )
    roots = set(range(10))
    got = {
        int(r.node): int(r.dist)
        for r in weighted_sssp(_sssp_ds(edges), roots=roots, max_rounds=64)
        .to_pandas()
        .itertuples()
    }
    assert got == _sssp_driver(edges, roots)


def test_tool_transitions_planted(ray_session, tmp_path):
    from import_ray.pipelines.kg import tool_transitions

    # c1 tool sequence in turn order: search, calculator, search —
    # turn 2 is a chat turn and must be skipped, so the pairs are
    # (search, calculator) and (calculator, search);
    # c2: browser only (no pair); c3 written OUT of turn order — its
    # (search, browser) pair must follow turn_idx, not input order
    tbl = pa.table(
        {
            "conv_id": ["c1", "c1", "c1", "c1", "c2", "c3", "c3"],
            "turn_idx": pa.array([0, 1, 2, 3, 0, 1, 0], pa.int32()),
            "tool": ["search", "calculator", None, "search", "browser",
                     "browser", "search"],
        }
    )
    p = str(tmp_path / "tools.parquet")
    pq.write_table(tbl, p)
    got = tool_transitions(p)
    want = {
        ("search", "calculator"): 1,
        ("calculator", "search"): 1,
        ("search", "browser"): 1,
    }
    assert {
        (r.prev_tool, r.next_tool): int(r.n) for r in got.itertuples()
    } == want


def test_tool_transitions_bulk_matches_pandas(ray_session, sf_small):
    from import_ray.pipelines.kg import tool_transitions
    from import_ray.sources.transcripts import ensure_transcripts

    path = ensure_transcripts(sf_small)
    got = tool_transitions(path)

    df = pq.read_table(path, columns=["conv_id", "turn_idx", "tool"]).to_pandas()
    df = df[df["tool"].notna() & (df["tool"] != "")]
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    prev = df.groupby("conv_id")["tool"].shift(1)
    pairs = pd.DataFrame({"prev_tool": prev, "next_tool": df["tool"]}).dropna()
    want = (
        pairs.groupby(["prev_tool", "next_tool"], sort=True)
        .size()
        .reset_index(name="n")
    )
    assert got.reset_index(drop=True).astype(str).equals(
        want.astype({"n": "int64"}).reset_index(drop=True).astype(str)
    )


def _write_tx(tmp_path, rows):
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array(["x"] * len(rows), pa.string()),
            "tool": pa.array([""] * len(rows), pa.string()),
            "ts": pa.array(
                [np.datetime64("2025-01-01T00:00:00", "us") + np.timedelta64(r[3], "m")
                 for r in rows],
                pa.timestamp("us"),
            ),
        }
    )
    p = str(tmp_path / "tx.parquet")
    pq.write_table(tbl, p)
    return p


def test_conv_sessions_gap_split(ray_session, tmp_path):
    from import_ray.pipelines.kg import conv_sessions

    # c1: gaps 30m, 200m, 10m -> 2 sessions; c2: single turn -> 1
    p = _write_tx(
        tmp_path,
        [
            ("c1", 0, "user", 0),
            ("c1", 1, "agent", 30),
            ("c1", 2, "user", 230),
            ("c1", 3, "agent", 240),
            ("c2", 0, "user", 0),
        ],
    )
    got = {r["conv_id"]: r for r in conv_sessions(p, gap_minutes=90).take_all()}
    assert got["c1"]["n_turns"] == 4
    assert got["c1"]["n_sessions"] == 2
    assert got["c1"]["max_gap_minutes"] == 200
    assert got["c2"] == {
        "conv_id": "c2", "n_turns": 1, "n_sessions": 1, "max_gap_minutes": 0
    }


def test_conv_sessions_gap_exactly_at_threshold_does_not_split(ray_session, tmp_path):
    from import_ray.pipelines.kg import conv_sessions

    p = _write_tx(tmp_path, [("c1", 0, "user", 0), ("c1", 1, "agent", 90)])
    (row,) = conv_sessions(p, gap_minutes=90).take_all()
    assert row["n_sessions"] == 1


def test_conv_structure_check(ray_session, tmp_path):
    from import_ray.pipelines.kg import conv_structure_check

    p = _write_tx(
        tmp_path,
        [
            ("ok", 0, "user", 0), ("ok", 1, "agent", 1), ("ok", 2, "user", 2),
            ("gap", 0, "user", 0), ("gap", 2, "agent", 1),      # idx gap
            ("dup", 0, "user", 0), ("dup", 1, "agent", 1), ("dup", 1, "user", 2),
            ("alt", 0, "user", 0), ("alt", 1, "user", 1),       # role repeat
        ],
    )
    got = {r["conv_id"]: r for r in conv_structure_check(p).take_all()}
    assert got["ok"]["idx_ok"] and got["ok"]["alternation_ok"]
    assert not got["gap"]["idx_ok"]
    assert not got["dup"]["idx_ok"]
    assert got["alt"]["idx_ok"] and not got["alt"]["alternation_ok"]


def test_conv_prefix_groups(ray_session, tmp_path):
    from import_ray.pipelines.kg import conv_prefix_groups

    rows = []
    # a,b share a 2-turn prefix; c shares only turn 0 with them;
    # d is a singleton prefix (filtered by min_convs=2)
    for c in ("a", "b", "c"):
        rows += [(c, 0, "system", 0), (c, 1, "user", 1), (c, 2, "agent", 2)]
    rows += [("d", 0, "user", 0)]
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array(
                [
                    {"a": ["sys", "common follow", "ua"],
                     "b": ["sys", "common follow", "ub"],
                     "c": ["sys", "diff", "uc"], "d": ["solo"]}[r[0]][r[1]]
                    for r in rows
                ],
                pa.string(),
            ),
        }
    )
    p = str(tmp_path / "tx.parquet")
    pq.write_table(tbl, p)

    # k=1: a,b,c share turn-0 prefix -> one group of 3
    out1 = conv_prefix_groups(p, k_turns=1, min_convs=2).take_all()
    assert [(r["conv_id"], r["n_dups"]) for r in out1] == [("a", 3)]
    # k=2: only a,b still match
    out2 = conv_prefix_groups(p, k_turns=2, min_convs=2).take_all()
    assert [(r["conv_id"], r["n_dups"]) for r in out2] == [("a", 2)]
