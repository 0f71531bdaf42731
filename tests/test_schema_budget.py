"""Schema-scale driver-collect budgets (VERDICT r4 #4): the implicit
"schema-scale by contract" take_all() sites now fail LOUDLY past an
explicit row budget instead of silently OOMing the driver."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def test_take_all_bounded_under_budget(ray_session):
    import ray.data

    from import_ray.core.context import take_all_bounded

    ds = ray.data.range(100)
    rows = take_all_bounded(ds, "test", budget=100)
    assert len(rows) == 100


def test_take_all_bounded_over_budget_raises(ray_session):
    import ray.data

    from import_ray.core.context import take_all_bounded

    ds = ray.data.range(101)
    with pytest.raises(RuntimeError, match="schema-scale row budget"):
        take_all_bounded(ds, "my-collect-site", budget=100)


def test_nl_collect_guard_fires_on_oversized_schema(ray_session, monkeypatch):
    """An over-budget 'schema' reaching the NL sentence generator must
    abort with the named site, not OOM the driver."""
    import ray.data

    import import_ray.core.context as ctx
    from import_ray.stages import nl as nl_stage

    monkeypatch.setattr(ctx, "SCHEMA_SCALE_BUDGET", 50)
    n = 200
    t = pa.table(
        {
            "subject_id": pa.array([f"sv{i}" for i in range(n)]),
            "predicate": pa.array(["name"] * n),
            "object_id": pa.array([""] * n),
            "object_value": pa.array([f"Name {i}" for i in range(n)], pa.large_string()),
            "provenance": pa.array(["p"] * n),
        }
    )
    with pytest.raises(RuntimeError, match="nl: sentence-candidate triples"):
        nl_stage.generate_nl_sentences(ray.data.from_arrow(t), "/tmp/nl_guard_test")
