"""Composite corpus-cleaning pipeline invariants."""

from __future__ import annotations


def test_corpus_clean_removes_planted_copies(ray_session, sf_small):
    import __ray_entry__ as entry

    from import_ray.pipelines.corpus import _PLANT_OFFSET

    exact = entry.queries()["corpus_clean_exact"](sf_small).to_pandas()
    full = entry.queries()["corpus_clean"](sf_small).to_pandas()

    # every planted copy (id >= offset) must have been deduped away in
    # favor of its lower-id original
    assert (exact["doc_id"] < _PLANT_OFFSET).all()
    assert (full["doc_id"] < _PLANT_OFFSET).all()
    # the near-dup stage only ever removes docs
    assert set(full["doc_id"]).issubset(set(exact["doc_id"]))
    assert len(full) > 0
