"""N-Quads serializer/parser: escape vectors, lossless roundtrip,
file-shard write/read."""

from __future__ import annotations

import glob

import pyarrow as pa
import pytest

from import_ray.sources.ntriples import (
    nquads_to_triples,
    parse_lines,
    read_nquads,
    serialize_triples,
    triples_to_nquads,
    write_nquads,
)


def _table(rows):
    cols = {
        "subject_id": pa.array([r[0] for r in rows], pa.string()),
        "predicate": pa.array([r[1] for r in rows], pa.string()),
        "object_id": pa.array([r[2] for r in rows], pa.string()),
        "object_value": pa.array([r[3] for r in rows], pa.large_string()),
        "provenance": pa.array([r[4] for r in rows], pa.string()),
    }
    return pa.table(cols)


TRICKY = _table(
    [
        ("conv/a/t0", "text", None, 'say "hi"\nthen\ttab\r\\done', "p1"),
        ("conv/a/t0", "typeOf", "ConversationTurn", None, "p1"),
        ("iso/R3", "isoCode", None, "R3", "p2"),
        ("e néé", "has space", "obj<with>bad|chars", None, "p 3"),
        ("s", "emptyLit", None, "", "p1"),
        ("s", "nullLit", None, None, "p1"),
        ("s", "pct", None, "already %41 encoded", "p1"),
        ("s", "uni", None, "héllo wörld — ünïcode", "p1"),
    ]
)


def test_roundtrip_table_exact():
    lines = triples_to_nquads(TRICKY)
    back = nquads_to_triples(lines)
    assert back.equals(TRICKY)


def test_escape_vectors():
    lines = triples_to_nquads(TRICKY)["line"].to_pylist()
    assert lines[0] == (
        '<dc:conv/a/t0> <dc:text> "say \\"hi\\"\\nthen\\ttab\\r\\\\done" '
        "<dc:prov/p1> ."
    )
    assert lines[1] == (
        "<dc:conv/a/t0> <dc:typeOf> <dc:ConversationTurn> <dc:prov/p1> ."
    )
    # IRI-unsafe chars are percent-encoded, never raw
    assert "<dc:e%20n" in lines[3]
    assert "%3Cwith%3E" in lines[3]
    # null literal keeps its nullness via the typed marker
    assert '""^^<dc:null>' in lines[5]
    assert lines[4].count('""') == 1 and "null" not in lines[4]


def test_bad_line_raises():
    with pytest.raises(ValueError, match="unparseable"):
        nquads_to_triples(pa.table({"line": pa.array(["not a triple"])}))


def test_dataset_roundtrip_and_files(ray_session, tmp_path):
    import ray.data

    ds = ray.data.from_arrow(TRICKY)
    back = parse_lines(serialize_triples(ds)).take_all()
    orig = TRICKY.to_pylist()
    key = lambda r: (r["subject_id"], r["predicate"], str(r["object_id"]))
    assert sorted(back, key=key) == sorted(orig, key=key)

    out = str(tmp_path / "nq")
    manifest = write_nquads(ray.data.from_arrow(TRICKY), out)
    assert manifest["n_lines"].sum() == len(TRICKY)
    files = sorted(glob.glob(out + "/part-*.nq"))
    assert files
    again = read_nquads(files).take_all()
    assert sorted(again, key=key) == sorted(orig, key=key)
    # content-hash shard names → a rewrite is byte-idempotent
    manifest2 = write_nquads(ray.data.from_arrow(TRICKY), out)
    assert sorted(manifest2["path"]) == sorted(glob.glob(out + "/part-*.nq"))
