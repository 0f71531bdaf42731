"""JSON-LD parsing + distributed MCF/JSON-LD readers."""

from __future__ import annotations

import json


def test_jsonld_parse_semantics():
    from import_ray.core.model import ValueType
    from import_ray.sources.jsonld import parse_jsonld

    doc = [
        {
            "@id": "https://datacommons.org/browser/geoId/06",
            "@type": ["https://schema.org/State"],
            "https://schema.org/name": [{"@value": "California"}],
            "https://datacommons.org/browser/containedInPlace": [
                {"@id": "https://datacommons.org/browser/country/USA"}
            ],
        },
        {"no_id": True},
    ]
    g = parse_jsonld(doc)
    assert list(g) == ["geoId/06"]
    node = g["geoId/06"]
    assert node["dcid"] == [("geoId/06", ValueType.TEXT)]
    assert node["typeOf"] == [("State", ValueType.RESOLVED_REF)]
    assert node["name"] == [("California", ValueType.TEXT)]
    assert node["containedInPlace"] == [("country/USA", ValueType.RESOLVED_REF)]


def test_jsonld_graph_wrapper_and_local_ref():
    from import_ray.core.model import ValueType
    from import_ray.sources.jsonld import parse_jsonld

    doc = {"@graph": [{"@id": "X", "p": {"@id": "l:Other"}}]}
    g = parse_jsonld(json.dumps(doc))
    assert g["X"]["p"] == [("l:Other", ValueType.UNRESOLVED_REF)]


def test_read_mcf_distributed(ray_session, tmp_path):
    from import_ray.sources.readers import read_mcf

    for i in range(3):
        (tmp_path / f"f{i}.mcf").write_text(
            f"Node: dcid:Thing{i}\ntypeOf: dcs:Class\nsubClassOf: dcs:Thing\n"
            f'name: "Thing{i}"\n'
        )
    ds = read_mcf([str(tmp_path / f"f{i}.mcf") for i in range(3)])
    rows = ds.take_all()
    nodes = {r["node_id"] for r in rows}
    assert nodes == {"dcid:Thing0", "dcid:Thing1", "dcid:Thing2"}
    scopes = {r["scope"] for r in rows}
    assert len(scopes) == 3  # one scope per file


def test_read_jsonld_distributed(ray_session, tmp_path):
    from import_ray.sources.readers import read_jsonld

    (tmp_path / "a.jsonld").write_text(
        json.dumps([{"@id": "N1", "@type": "City", "name": {"@value": "X"}}])
    )
    ds = read_jsonld(str(tmp_path / "a.jsonld"))
    rows = ds.take_all()
    assert {(r["node_id"], r["prop"]) for r in rows} == {
        ("N1", "dcid"),
        ("N1", "typeOf"),
        ("N1", "name"),
    }


def test_write_jsonld_roundtrip(ray_session, tmp_path):
    import glob
    import json as _json

    from import_ray.sources.readers import read_mcf, write_jsonld

    (tmp_path / "in.mcf").write_text(
        'Node: dcid:geoId/06\ntypeOf: dcs:State\nname: "California"\n'
    )
    nodes = read_mcf(str(tmp_path / "in.mcf"))
    out = str(tmp_path / "out")
    write_jsonld(nodes, out)
    files = glob.glob(out + "/*.json")
    assert files
    docs = []
    for f in files:
        for line in open(f):
            row = _json.loads(line)
            docs.append(_json.loads(row["jsonld"]))
    (doc,) = docs
    assert doc["@id"] == "dcid:geoId/06"
    assert doc["@type"] == ["State"]
    assert {"@value": "California"} in doc["name"]


def test_gzip_value_roundtrip():
    from import_ray.stages.explode import compress_value, decompress_value

    s = '{"type":"Polygon","coordinates":[[1,2],[3,4]]}' * 100
    z = compress_value(s)
    assert len(z) < len(s)
    assert decompress_value(z) == s


def test_jsonld_context_expansion():
    """Compacted docs with @context (term maps, ref-typed terms,
    prefixes, @vocab) expand before parsing."""
    import json

    from import_ray.sources.jsonld import parse_jsonld

    doc = {
        "@context": {
            "@vocab": "https://schema.org/",
            "dc": "https://datacommons.org/browser/",
            "typeOf": {"@id": "https://schema.org/typeOf", "@type": "@id"},
            "containedInPlace": {
                "@id": "https://schema.org/containedInPlace",
                "@type": "@id",
            },
        },
        "@graph": [
            {
                "@id": "https://datacommons.org/browser/geoId/06",
                "@type": "dc:State",
                "name": {"@value": "California"},
                "containedInPlace": "dc:country/USA",
            }
        ],
    }
    g = parse_jsonld(json.dumps(doc))
    node = g["geoId/06"]
    from import_ray.core.model import ValueType

    assert ("State", ValueType.RESOLVED_REF) in node["typeOf"]
    assert ("California", ValueType.TEXT) in node["name"]
    assert ("country/USA", ValueType.RESOLVED_REF) in node["containedInPlace"]
