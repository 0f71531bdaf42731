"""MCF parse → mutate → serialize golden tests.

Cases transcribed from the reference's unit tests:
- McfMutatorTest.java:24-135 (complex values, legacy obs prep, SVObs
  pass-through, observationProperties as non-constraint)
- StatVarNameGeneratorTest.java:21-115 (formatToken)
- McfParserTest.java semantics (typed-value classification)
"""

from __future__ import annotations

from import_ray.core.model import ValueType
from import_ray.sources.mcf import parse_mcf_string, parse_typed_value, serialize_graph
from import_ray.stages.mutate import mutate_graph
from import_ray.stages.statvar_name import format_token


def roundtrip(mcf: str) -> str:
    res = parse_mcf_string(mcf)
    mutate_graph(res.graph)
    return serialize_graph(res.graph, sort=True)


def test_mutator_complex_values():
    mcf = (
        "Node: dcid:Count_Person_18Years_1000To2000USD\n"
        "typeOf: schema:StatisticalVariable\n"
        "populationType: schema:Person\n"
        "measuredProperty: schema:count\n"
        "statType: dcs:measuredValue\n"
        "age: [dcs:Year 18]\n"
        "income: [dcs:USDollar 1000 2000]\n"
        "bogusProp: [LatLong 37.3884812 -122.0834373]"
    )
    want = (
        "Node: USDollar1000To2000\n"
        'dcid: "USDollar1000To2000"\n'
        "endValue: 2000\n"
        'name: "USDollar 1000 To 2000"\n'
        "startValue: 1000\n"
        "typeOf: dcid:QuantityRange\n"
        "unit: dcid:USDollar\n"
        "\n"
        "Node: Year18\n"
        'dcid: "Year18"\n'
        'name: "Year 18"\n'
        "typeOf: dcid:Quantity\n"
        "unitOfMeasure: dcid:Year\n"
        "value: 18\n"
        "\n"
        "Node: dcid:Count_Person_18Years_1000To2000USD\n"
        "age: dcid:Year18\n"
        "bogusProp: dcid:latLong/3738848_-12208344\n"
        "constraintProperties: dcid:age, dcid:bogusProp, dcid:income\n"
        'dcid: "Count_Person_18Years_1000To2000USD"\n'
        'definition: "mp=count,pt=Person,age=Year18,bogusProp=latLong/3738848_-12208344,income=USDollar1000To2000"\n'
        "income: dcid:USDollar1000To2000\n"
        "measuredProperty: dcid:count\n"
        'name: "Count Of Person: Year 18, Lat Long/3738848 -12208344, US Dollar 1000 To 2000"\n'
        "populationType: dcid:Person\n"
        "statType: dcid:measuredValue\n"
        "typeOf: dcid:StatisticalVariable\n"
        "\n"
        "Node: latLong/3738848_-12208344\n"
        'dcid: "latLong/3738848_-12208344"\n'
        'latitude: "37.3884812"\n'
        'longitude: "-122.0834373"\n'
        'name: "37.38848,-122.08344"\n'
        "typeOf: dcid:GeoCoordinates\n\n"
    )
    assert roundtrip(mcf) == want


def test_mutator_legacy_obs_value_prep():
    mcf = (
        "Node: LegacyObs\n"
        "typeOf: schema:Observation\n"
        "observedNode: dcid:country/USA\n"
        'measuredValue: "1000,0000.0%"\n'
        'observationDate: "2009"\n'
    )
    want = (
        "Node: LegacyObs\n"
        'measuredValue: "10000000.0"\n'
        'observationDate: "2009"\n'
        "observedNode: dcid:country/USA\n"
        "typeOf: dcid:Observation\n"
        "\n"
    )
    assert roundtrip(mcf) == want


def test_mutator_svobs_value_untouched():
    mcf = (
        "Node: SVObs\n"
        "observationAbout: dcid:country/USA\n"
        "observationDate: 2009\n"
        "typeOf: dcid:StatVarObservation\n"
        'value: "10000000.0%"\n'
        "variableMeasured: dcid:Count_Male_18Years_1000To2000USD\n"
        "\n"
    )
    assert roundtrip(mcf) == mcf


def test_mutator_observation_properties_not_constraint():
    mcf = (
        "Node: dcid:FinancialAid\n"
        "typeOf: schema:StatisticalVariable\n"
        "populationType: dcs:FinancialTransaction\n"
        "measuredProperty: dcs:amount\n"
        "observationProperties: dcs:destinationCountry\n"
        "someActualConstraint: dcs:someValue\n"
    )
    want = (
        "Node: dcid:FinancialAid\n"
        "constraintProperties: dcid:someActualConstraint\n"
        'dcid: "FinancialAid"\n'
        'definition: "mp=amount,pt=FinancialTransaction,someActualConstraint=someValue"\n'
        "measuredProperty: dcid:amount\n"
        'name: "Amount Of Financial Transaction: Some Value"\n'
        "observationProperties: dcid:destinationCountry\n"
        "populationType: dcid:FinancialTransaction\n"
        "someActualConstraint: dcid:someValue\n"
        "typeOf: dcid:StatisticalVariable\n"
        "\n"
    )
    assert roundtrip(mcf) == want


def test_format_token():
    # StatVarNameGeneratorTest.java:21-27
    assert format_token("cumulativeCount") == "Cumulative Count"
    assert format_token("COVID_19") == "COVID 19"
    assert format_token("Years18To24") == "Years 18 To 24"
    assert format_token("dcid:Count_Person") == "Count Person"
    assert format_token("") == ""


def test_typed_value_classification():
    assert parse_typed_value("name", '"hello, world"') == (
        "hello, world",
        ValueType.TEXT,
    )
    assert parse_typed_value("age", "[Years 10]") == (
        "[Years 10]",
        ValueType.COMPLEX_VALUE,
    )
    assert parse_typed_value("location", "dcid:geoId/06") == (
        "geoId/06",
        ValueType.RESOLVED_REF,
    )
    assert parse_typed_value("observationAbout", "l:SomeNode") == (
        "l:SomeNode",
        ValueType.UNRESOLVED_REF,
    )
    # ref-prop heuristic: bare value on a reference property → RESOLVED_REF
    assert parse_typed_value("typeOf", "Person") == ("Person", ValueType.RESOLVED_REF)
    assert parse_typed_value("count", "1,234"[0:1]) == ("1", ValueType.NUMBER)
    assert parse_typed_value("x", "4.5e3") == ("4.5e3", ValueType.NUMBER)
    assert parse_typed_value("x", "true") == ("true", ValueType.NUMBER)
    assert parse_typed_value("x", "hello") == ("hello", ValueType.TEXT)
    # url with colon is not a ref
    assert parse_typed_value("x", "http://goo.gl")[1] == ValueType.TEXT


def test_parse_multi_value_and_quotes():
    mcf = 'Node: N1\ntypeOf: dcs:Thing\nname: "a, b", "c"\n'
    res = parse_mcf_string(mcf)
    assert res.graph["N1"]["name"] == [("a, b", ValueType.TEXT), ("c", ValueType.TEXT)]


def test_parse_duplicate_node_merges():
    mcf = (
        "Node: N1\ntypeOf: dcs:Thing\nname: \"x\"\n\n"
        "Node: N1\nname: \"x\", \"y\"\n"
    )
    res = parse_mcf_string(mcf)
    assert res.graph["N1"]["name"] == [("x", ValueType.TEXT), ("y", ValueType.TEXT)]
