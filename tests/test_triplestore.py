"""Triple-store upsert + functional-conflict semantics on hand-built graphs."""

from __future__ import annotations

import pyarrow as pa

from import_ray.stages.triplestore import functional_conflicts, upsert_triples


def _triples(rows):
    return pa.table(
        {
            "subject_id": pa.array([r[0] for r in rows], pa.string()),
            "predicate": pa.array([r[1] for r in rows], pa.string()),
            "object_id": pa.array([r[2] for r in rows], pa.string()),
            "object_value": pa.array([r[3] for r in rows], pa.large_string()),
            "provenance": pa.array([r[4] for r in rows], pa.string()),
        }
    )


BASE = _triples(
    [
        ("a", "text", None, "old", "v1"),
        ("a", "typeOf", "Turn", None, "v1"),
        ("b", "mentions", "x", None, "v1"),
        ("b", "mentions", "y", None, "v1"),  # multi-valued pair
        ("c", "text", None, "keep", "v1"),
    ]
)

DELTA = _triples(
    [
        ("a", "text", None, "new", "v2"),
        ("b", "mentions", "z", None, "v2"),  # replaces BOTH base values
        ("d", "text", None, "insert", "v2"),  # brand-new subject
    ]
)


def _key(r):
    return (r["subject_id"], r["predicate"], str(r["object_id"]), str(r["object_value"]))


def test_upsert_replace_insert_passthrough(ray_session):
    import ray.data

    out = upsert_triples(
        ray.data.from_arrow(BASE), ray.data.from_arrow(DELTA)
    ).take_all()
    got = sorted((_key(r), r["provenance"]) for r in out)
    want = sorted(
        [
            (("a", "text", "None", "new"), "v2"),
            (("a", "typeOf", "Turn", "None"), "v1"),
            (("b", "mentions", "z", "None"), "v2"),
            (("c", "text", "None", "keep"), "v1"),
            (("d", "text", "None", "insert"), "v2"),
        ]
    )
    assert got == want


def test_upsert_empty_delta_is_identity(ray_session):
    import ray.data

    out = upsert_triples(
        ray.data.from_arrow(BASE), ray.data.from_arrow(BASE.slice(0, 0))
    ).take_all()
    assert sorted(map(_key, out)) == sorted(map(_key, BASE.to_pylist()))


def test_functional_conflicts(ray_session):
    import ray.data

    tri = _triples(
        [
            ("a", "role", None, "user", "v1"),
            ("a", "role", None, "user", "v1"),  # exact dup: NOT a conflict
            ("b", "role", None, "user", "v1"),
            ("b", "role", None, "agent", "v1"),  # 2 distinct values
            ("b", "role", None, "tool", "v1"),  # 3rd distinct value
            ("c", "linksTo", "x", None, "v1"),
            ("c", "linksTo", "y", None, "v1"),  # conflict via object_id
            ("d", "mentions", "x", None, "v1"),
            ("d", "mentions", "y", None, "v1"),  # non-functional: ignored
        ]
    )
    out = functional_conflicts(
        ray.data.from_arrow(tri), ["role", "linksTo"]
    ).take_all()
    got = sorted((r["subject_id"], r["predicate"], r["n_objects"]) for r in out)
    assert got == [("b", "role", 3), ("c", "linksTo", 2)]


def test_predicate_alignment(ray_session):
    import ray.data

    from import_ray.stages.triplestore import predicate_alignment

    a = _triples(
        [("s", "name", None, v, "x") for v in ("a", "b", "c", "d")]
        + [("s", "label", None, v, "x") for v in ("a", "b")]
        + [("s", "other", None, v, "x") for v in ("z1", "z2")]
    )
    b = _triples(
        # fullName == name exactly; also overlaps label (jac 2/4=0.5)
        [("s", "fullName", None, v, "x") for v in ("a", "b", "c", "d")]
        # tag overlaps nothing above min_jaccard
        + [("s", "tag", None, v, "x") for v in ("a", "q1", "q2", "q3", "q4")]
    )
    out = predicate_alignment(
        ray.data.from_arrow(a), ray.data.from_arrow(b), min_jaccard=0.5
    )
    got = sorted(zip(out["pred_b"], out["pred_a"], out["jaccard"]))
    # fullName argmax is name (1.0) not label (0.5); tag filtered (1/8)
    assert got == [("fullName", "name", 1.0)]


def test_predicate_alignment_dedups_instance_counts(ray_session):
    import ray.data

    from import_ray.stages.triplestore import predicate_alignment

    # 100 repeats of one value must count as ONE distinct object
    a = _triples([("s", "p", None, "v", "x")] * 100 + [("s", "p", None, "w", "x")])
    b = _triples([("s", "q", None, "v", "x")] * 3 + [("s", "q", None, "w", "x")])
    out = predicate_alignment(
        ray.data.from_arrow(a), ray.data.from_arrow(b), min_jaccard=0.9
    )
    assert list(out["jaccard"]) == [1.0]
