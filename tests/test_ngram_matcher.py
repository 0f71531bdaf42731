"""NgramMatcher fuzzy lookup + name-resolver actor stage."""

from __future__ import annotations


GAZ = {
    "California": "geoId/06",
    "State of Kerala": "wikidataId/Q1186",
    "Republic of India": "country/IND",
    "United States of America": "country/USA",
}


def test_exact_and_fuzzy_lookup():
    from import_ray.state.ngram_matcher import NgramMatcher

    m = NgramMatcher()
    m.add_keys_values(GAZ)
    assert m.lookup("California", 1)[0][1] == "geoId/06"
    # case/punct-insensitive
    assert m.lookup("california!", 1)[0][1] == "geoId/06"
    # fuzzy: near-complete overlap above 0.8 ngram fraction
    assert m.lookup("Californi", 1)[0][1] == "geoId/06"
    # clearly unrelated → no match
    assert m.lookup("Zzzzqqq") == []


def test_resolver_actor_stage(ray_session):
    import ray.data

    from import_ray.state.ngram_matcher import resolve_names

    ds = ray.data.from_items(
        [
            {"name": "california"},
            {"name": "republic of india"},
            {"name": "unknown place xyz"},
        ]
    )
    rows = resolve_names(ds, GAZ).take_all()
    got = {r["name"]: r["resolved_dcid"] for r in rows}
    assert got["california"] == "geoId/06"
    assert got["republic of india"] == "country/IND"
    assert got["unknown place xyz"] == ""
