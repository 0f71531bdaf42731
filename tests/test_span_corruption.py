"""Span corruption: pure-Python parity, exact invertibility, block
independence."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ref_pair(doc_id: int, text: str, rate: float, span_len: int, seed: int):
    from import_ray.stages.span_corruption import _mix

    toks = text.split(" ")
    dseed = int(_mix(np.array([doc_id], np.uint64) ^ np.uint64(seed))[0])
    inputs, targets = [], []
    k = 0
    for i, tok in enumerate(toks):
        g = i // span_len
        draw = int(_mix(np.array([dseed ^ g], np.uint64))[0])
        corrupt = (draw % 1_000_000) < int(rate * 1_000_000)
        if not corrupt:
            inputs.append(tok)
            continue
        if i % span_len == 0:
            inputs.append(f"<extra_id_{k}>")
            targets.append(f"<extra_id_{k}> {tok}")
            k += 1
        else:
            targets.append(tok)
    return " ".join(inputs), " ".join(targets)


def _invert(inputs: str, targets: str) -> str:
    """Reconstruct the original text from a (inputs, targets) pair."""
    spans = {}
    cur = None
    for tok in targets.split(" "):
        if tok.startswith("<extra_id_"):
            cur = tok
            spans[cur] = []
        elif cur is not None:
            spans[cur].append(tok)
    out = []
    for tok in inputs.split(" "):
        if tok.startswith("<extra_id_"):
            out.extend(spans.get(tok, []))
        else:
            out.append(tok)
    return " ".join(out)


def test_span_corruption_matches_reference_and_inverts(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from import_ray.stages.span_corruption import span_corruption_pairs

    rng = np.random.default_rng(5)
    words = np.array(["alpha", "beta", "gamma", "delta", "eps"], object)
    docs = [
        (i, " ".join(rng.choice(words, size=int(rng.integers(5, 40)))))
        for i in range(30)
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
        }
    )
    path = str(tmp_path / "docs.parquet")
    pq.write_table(t, path)
    got = (
        span_corruption_pairs(path, rate=0.4, span_len=3, seed=9)
        .to_pandas()
        .set_index("doc_id")
    )
    assert len(got) == len(docs)
    any_corrupted = False
    for doc_id, text in docs:
        want_in, want_tg = _ref_pair(doc_id, text, 0.4, 3, 9)
        assert got.loc[doc_id, "inputs"] == want_in
        assert got.loc[doc_id, "targets"] == want_tg
        assert _invert(want_in, want_tg) == text
        any_corrupted |= bool(want_tg)
    assert any_corrupted


def test_span_corruption_block_independent(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from import_ray.stages.span_corruption import span_corruption_pairs

    t = pa.table(
        {
            "doc_id": pa.array(list(range(20)), pa.int64()),
            "text": pa.array([f"w{i} x y z a b c d e f" for i in range(20)], pa.string()),
        }
    )
    path = str(tmp_path / "docs.parquet")
    pq.write_table(t, path, row_group_size=3)
    a = (
        span_corruption_pairs(path, rate=0.3, seed=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import ray.data

    from import_ray.stages.span_corruption import corrupt_spans_block

    b = (
        ray.data.read_parquet(path)
        .repartition(7)
        .map_batches(
            lambda x: corrupt_spans_block(x, rate=0.3, seed=2),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
