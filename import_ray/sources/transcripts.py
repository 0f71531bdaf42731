"""Deterministic synthetic conversation-transcript source.

The engine's primary input (BASELINE.json ``input_hint``) is a Parquet
table of multi-turn transcripts ``(conv_id, turn_idx, role, text, tool,
ts)``. No such table ships in /root/testdata, so we synthesize one
deterministically (seeded, content derived from the sf dir's
``documents.parquet``) — same rows for the same (sf_dir, seed) on every
run, suitable for tests, the driver smoke check, and benchmarks.

Shape choices mirror FIXTURES.md §F1-F2:
- skewed conversation sizes (a few mega-conversations) to exercise the
  salted-repartition path;
- rows written SHUFFLED (the engine must restore (conv_id, turn_idx)
  order);
- texts embed extractable mentions: ``isoCode:XX``, ``geoId/NN``,
  ``wikidataId/QNN``, ``[LatLong a b]``, statvar observations
  ``Count_Person=<n> @ <place_token> on <date>``, quoted strings with
  commas.
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = ("user", "assistant", "tool")
TOOLS = ("", "search", "calculator", "browser")

# Small deterministic gazetteer: name token -> (external id prop, value).
# Mirrors the external-id vocabulary of FIXTURES.md §F2.
GAZETTEER = [
    ("California", "geoId", "06"),
    ("Kerala", "isoCode", "IN-KL"),
    ("India", "wikidataId", "Q668"),
    ("Austria", "nutsCode", "AT13"),
    ("Texas", "geoId", "48"),
    ("Bavaria", "isoCode", "DE-BY"),
    ("France", "wikidataId", "Q142"),
]

STATVARS = (
    "Count_Person",
    "Median_Income_Person",
    "CumulativeCount_MedicalTest_ConditionCOVID_19_Positive",
)

_BASE_TS = datetime(2025, 1, 1)


def _rng_for(seed: int, conv_idx: int) -> np.random.Generator:
    return np.random.default_rng(
        int.from_bytes(
            hashlib.sha256(f"{seed}:{conv_idx}".encode()).digest()[:8], "little"
        )
    )


def _turn_text(rng: np.random.Generator, words: list[str], turn_idx: int) -> str:
    n = int(rng.integers(6, 20))
    toks = list(rng.choice(words, size=n))
    # deterministically sprinkle extractable mentions
    r = rng.random()
    if r < 0.25:
        name, prop, val = GAZETTEER[int(rng.integers(0, len(GAZETTEER)))]
        sv = STATVARS[int(rng.integers(0, len(STATVARS)))]
        count = int(rng.integers(1, 100000))
        year = 2015 + int(rng.integers(0, 10))
        month = 1 + int(rng.integers(0, 12))
        toks.append(f"{sv}={count} @ {prop}:{val} on {year}-{month:02d}")
    elif r < 0.35:
        name, prop, val = GAZETTEER[int(rng.integers(0, len(GAZETTEER)))]
        toks.append(f"see {prop}:{val} ({name})")
    elif r < 0.42:
        lat = round(float(rng.uniform(-80, 80)), 4)
        lng = round(float(rng.uniform(-170, 170)), 4)
        toks.append(f"at [LatLong {lat} {lng}]")
    elif r < 0.47:
        toks.append('they said "well, ok" loudly')
    return " ".join(toks)


def synthesize_transcripts(
    out_path: str,
    n_convs: int = 200,
    seed: int = 42,
    mega_every: int = 50,
    mega_turns: int = 400,
    shuffle: bool = True,
    words: list[str] | None = None,
    n_files: int = 1,
) -> str:
    """Write deterministic transcripts parquet; returns the path.

    ``n_files=1`` writes a single file at ``out_path``; otherwise
    ``out_path`` is treated as a directory of ``part-XXXXX.parquet``
    shards (the realistic many-file layout — a single file serializes
    the read stage). Every ``mega_every``-th conversation is a
    mega-conversation with ``mega_turns`` turns (skew); others have
    2-14 turns.
    """
    if words is None:
        words = (
            "the quick brown fox jumps over lazy dog data graph node edge "
            "value count place year observation metric state city region"
        ).split()
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for ci in range(n_convs):
        rng = _rng_for(seed, ci)
        conv_id = f"conv{ci:08d}"
        n_turns = mega_turns if (mega_every and ci % mega_every == mega_every - 1) else int(
            rng.integers(2, 15)
        )
        t0 = _BASE_TS + timedelta(minutes=ci * 7)
        for ti in range(n_turns):
            role = ROLES[ti % 2] if rng.random() > 0.15 else "tool"
            conv_ids.append(conv_id)
            turn_idxs.append(ti)
            roles.append(role)
            texts.append(_turn_text(rng, words, ti))
            tools.append(
                TOOLS[int(rng.integers(1, len(TOOLS)))] if role == "tool" else ""
            )
            tss.append(t0 + timedelta(seconds=ti * 30))
    table = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.large_string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )
    if shuffle:
        order = np.random.default_rng(seed).permutation(len(table))
        table = table.take(pa.array(order))
    # small row groups keep the files SPLITTABLE: Ray's parquet reader
    # parallelizes across row groups, and a one-row-group shard caps the
    # fused read→extract stage at exactly #files tasks — no pipelining
    # slack, so one skewed (mega-conversation) shard sets the wall time
    if n_files <= 1:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        pq.write_table(table, out_path, row_group_size=25_000)
    else:
        os.makedirs(out_path, exist_ok=True)
        rows = len(table)
        per = (rows + n_files - 1) // n_files
        for k in range(n_files):
            part = table.slice(k * per, per)
            if len(part):
                pq.write_table(
                    part,
                    os.path.join(out_path, f"part-{k:05d}.parquet"),
                    row_group_size=25_000,
                )
    return out_path


def default_transcripts_path(sf_dir: str, n_convs: int | None = None) -> tuple[str, int]:
    """Scale transcripts with the sf dir (sf0.001→200 convs, sf0.01→2000,
    sf0.1→20000); cached under /tmp keyed by params."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    if n_convs is None:
        scale = {"sf0.001": 200, "sf0.01": 2000, "sf0.1": 20000}.get(sf_name, 200)
    else:
        scale = n_convs
    n_files = 1 if scale <= 500 else max(32, scale // 3750)
    suffix = "transcripts.parquet" if n_files == 1 else "shards"
    path = f"/tmp/raydc_transcripts/{sf_name}_{scale}/{suffix}"
    return path, scale


def ensure_transcripts(sf_dir: str, n_convs: int | None = None, seed: int = 42) -> str:
    path, scale = default_transcripts_path(sf_dir, n_convs)
    n_files = 1 if scale <= 500 else max(32, scale // 3750)
    if not os.path.exists(path):
        synthesize_transcripts(path, n_convs=scale, seed=seed, n_files=n_files)
    return path
