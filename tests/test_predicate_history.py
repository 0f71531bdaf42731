"""SCD2 predicate history: run collapse, tie handling, open-ended
current value, per-(subject,predicate) independence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _ts(day: int):
    return np.datetime64("2025-01-01", "us") + np.timedelta64(day, "D").astype(
        "timedelta64[us]"
    )


def test_predicate_history(ray_session):
    import ray.data

    from import_ray.stages.triplestore import predicate_history

    rows = [
        # (s, p, v, day) — e1/status: a,a,b,a runs; e1/role: single run
        ("e1", "status", "a", 0),
        ("e1", "status", "a", 1),
        ("e1", "status", "b", 2),
        ("e1", "status", "a", 5),
        ("e1", "role", "x", 0),
        ("e1", "role", "x", 9),
        # tie: same ts, two values -> zero-length first interval by v order
        ("e2", "status", "q", 3),
        ("e2", "status", "p", 3),
    ]
    t = pa.table(
        {
            "subject_id": pa.array([r[0] for r in rows], pa.string()),
            "predicate": pa.array([r[1] for r in rows], pa.string()),
            "object_value": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([_ts(r[3]) for r in rows], pa.timestamp("us")),
        }
    )
    got = (
        predicate_history(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .sort_values(["subject_id", "predicate", "valid_from", "value"])
        .reset_index(drop=True)
    )

    def row(i):
        r = got.iloc[i]
        vt = None if pd.isna(r.valid_to) else np.datetime64(r.valid_to, "us")
        return (r.subject_id, r.predicate, r.value, np.datetime64(r.valid_from, "us"), vt)

    want = [
        ("e1", "role", "x", _ts(0), None),
        ("e1", "status", "a", _ts(0), _ts(2)),
        ("e1", "status", "b", _ts(2), _ts(5)),
        ("e1", "status", "a", _ts(5), None),
        ("e2", "status", "p", _ts(3), _ts(3)),
        ("e2", "status", "q", _ts(3), None),
    ]
    assert [row(i) for i in range(len(got))] == want
