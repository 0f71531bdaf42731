"""Declarative table-quality expectations (stages/expectations.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _run(ray_session, table, exps, nparts=3):
    import ray.data

    from import_ray.stages.expectations import check_expectations

    return check_expectations(
        ray.data.from_arrow(table).repartition(nparts), exps
    ).set_index(["expectation", "col"])


def test_all_expectation_types(ray_session):
    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 3, None], pa.int64()),
            "v": pa.array([0.5, -1.0, 2.0, None, 3.0]),
            "s": pa.array(["a", "b", "zz", None, "a"]),
        }
    )
    out = _run(
        ray_session,
        t,
        [
            {"type": "not_null", "col": "id"},
            {"type": "unique", "col": "id"},
            {"type": "range", "col": "v", "min": 0.0, "max": 2.5},
            {"type": "regex", "col": "s", "pattern": "[ab]"},
            {"type": "in_set", "col": "s", "values": ["a", "b"]},
        ],
    )
    assert out.loc[("not_null", "id"), "violations"] == 1
    # duplicated non-null id (3,3) → one extra row; nulls not counted
    assert out.loc[("unique", "id"), "violations"] == 1
    # -1.0 and 3.0 out of [0, 2.5]; the null skips the check
    assert out.loc[("range", "v"), "violations"] == 2
    # "zz" fails the full match; the null skips
    assert out.loc[("regex", "s"), "violations"] == 1
    # "zz" not in set; the null VIOLATES in_set
    assert out.loc[("in_set", "s"), "violations"] == 2
    assert (out["n_rows"] == 5).all()
    assert not out["passed"].any()


def test_unique_across_batches_int_with_nulls(ray_session):
    """The duplicate pair splits across blocks AND the column carries
    nulls elsewhere — guards the arrow-side null drop (pandas would
    hash 3 as int in one batch and 3.0 as float in another)."""
    ids = list(range(1000)) + [500] + [None] * 7
    t = pa.table({"id": pa.array(ids, pa.int64())})
    out = _run(
        ray_session, t, [{"type": "unique", "col": "id"}], nparts=8
    )
    assert out.loc[("unique", "id"), "violations"] == 1


def test_clean_table_passes(ray_session):
    t = pa.table(
        {
            "id": pa.array(range(100), pa.int64()),
            "name": pa.array([f"n{i}" for i in range(100)]),
        }
    )
    out = _run(
        ray_session,
        t,
        [
            {"type": "not_null", "col": "id"},
            {"type": "unique", "col": "id"},
            {"type": "regex", "col": "name", "pattern": "n\\d+"},
        ],
    )
    assert out["passed"].all()
    assert (out["violations"] == 0).all()


def test_unknown_type_raises(ray_session):
    import ray.data

    from import_ray.stages.expectations import check_expectations

    with pytest.raises(ValueError, match="unknown expectation types"):
        check_expectations(
            ray.data.range(5), [{"type": "frobnicate", "col": "id"}]
        )


def test_ref_expectation_counts_missing_rows(ray_session):
    """Foreign-key check: counts left ROWS (not distinct keys) whose
    non-null value is absent from the reference column; nulls skip."""
    import ray.data

    from import_ray.stages.expectations import check_expectations

    left = pa.table(
        {"fk": pa.array([1, 2, 2, 9, 9, 9, None], pa.int64())}
    )
    ref = pa.table({"pk": pa.array([1, 2, 3], pa.int64())})
    out = check_expectations(
        ray.data.from_arrow(left).repartition(3),
        [
            {
                "type": "ref",
                "col": "fk",
                "ref_ds": ray.data.from_arrow(ref).repartition(2),
                "ref_col": "pk",
            }
        ],
    ).set_index(["expectation", "col"])
    # three rows of 9 are missing; the null skips
    assert out.loc[("ref", "fk"), "violations"] == 3
    assert out.loc[("ref", "fk"), "n_rows"] == 7


def test_ref_expectation_clean(ray_session):
    import ray.data

    from import_ray.stages.expectations import check_expectations

    left = pa.table({"fk": pa.array([1, 2, 3, 1], pa.int64())})
    ref = pa.table({"pk": pa.array([1, 2, 3, 4], pa.int64())})
    out = check_expectations(
        ray.data.from_arrow(left),
        [
            {
                "type": "ref",
                "col": "fk",
                "ref_ds": ray.data.from_arrow(ref),
                "ref_col": "pk",
            }
        ],
    )
    assert out["passed"].all()
