"""McfChecker-semantics tests (cases transcribed from the reference's
McfCheckerTest.java)."""

from __future__ import annotations

from import_ray.sources.mcf import parse_mcf_string
from import_ray.stages.check import NodeChecker
from import_ray.state.counters import CounterSet


def run_check(mcf: str) -> tuple[bool, CounterSet]:
    g = parse_mcf_string(mcf).graph
    checker = NodeChecker()
    ok = True
    for node_id, node in g.items():
        ok &= checker.check_node(node_id, node)
    return ok, checker.counters


def failure(mcf: str, counter: str) -> bool:
    ok, cs = run_check(mcf)
    return (not ok) and cs.counter(counter) > 0


def success(mcf: str) -> bool:
    ok, _ = run_check(mcf)
    return ok


def test_missing_typeof():
    assert failure("Node: USState\nname: California\n", "Sanity_MissingOrEmpty_typeOf")


def test_multiple_dcid_values():
    mcf = 'Node: N\ntypeOf: schema:State\ndcid: "a", "b"\n'
    assert failure(mcf, "Sanity_MultipleDcidValues")


def test_very_long_dcid():
    mcf = f'Node: N\ntypeOf: schema:State\ndcid: "{"x" * 300}"\n'
    assert failure(mcf, "Sanity_VeryLongDcid")


def test_invalid_chars_in_dcid():
    mcf = 'Node: N\ntypeOf: schema:State\ndcid: "bad^dcid"\n'
    assert failure(mcf, "Sanity_InvalidChars_dcid")


def test_bio_dcid_exception():
    mcf = 'Node: N\ntypeOf: schema:Protein\ndcid: "bio/ACT1 [special]"\n'
    assert success(mcf)


def test_svobs_required_and_date():
    base = (
        "Node: SVO\ntypeOf: dcs:StatVarObservation\n"
        "variableMeasured: dcid:Count_Person\n"
        "observationAbout: dcid:geoId/06\nvalue: 1\n"
    )
    assert failure(base, "Sanity_MissingOrEmpty_observationDate")
    assert failure(
        base + 'observationDate: "Jan 1, 2020"\n', "Sanity_InvalidObsDate"
    )
    assert success(base + 'observationDate: "2020-01-01"\n')


def test_svobs_nan_value_flag():
    mcf = (
        "Node: SVO\ntypeOf: dcs:StatVarObservation\n"
        "variableMeasured: dcid:Count_Person\n"
        "observationAbout: dcid:geoId/06\n"
        'observationDate: "2020"\nvalue: "NotANumber"\n'
    )
    g = parse_mcf_string(mcf).graph
    c_allow = NodeChecker(allow_nan_svobs=True)
    assert all(c_allow.check_node(k, v) for k, v in g.items())
    c_strict = NodeChecker(allow_nan_svobs=False)
    assert not all(c_strict.check_node(k, v) for k, v in g.items())
    assert c_strict.counters.counter("Sanity_SVObs_Value_NotANumber") == 1


def test_statvar_checks():
    mcf = (
        "Node: SV\ntypeOf: dcs:StatisticalVariable\n"
        "populationType: dcs:person\nmeasuredProperty: dcs:count\n"
        'statType: dcs:measuredValue\ndcid: "SV1"\n'
    )
    assert failure(mcf, "Sanity_NotInitUpper_populationType")
    mcf2 = (
        "Node: SV\ntypeOf: dcs:StatisticalVariable\n"
        "populationType: dcs:Person\nmeasuredProperty: dcs:count\n"
        'statType: dcs:projection\ndcid: "SV1"\n'
    )
    assert failure(mcf2, "Sanity_UnknownStatType")
    mcf3 = (
        "Node: SV\ntypeOf: dcs:StatisticalVariable\n"
        "populationType: dcs:Person\nmeasuredProperty: dcs:count\n"
        "statType: dcs:measuredValue\n"
    )
    assert failure(mcf3, "Sanity_MissingOrEmpty_dcid")


def test_schema_checks():
    mcf = 'Node: P\ntypeOf: schema:Class\ndcid: "place"\nname: "place"\nsubClassOf: dcs:Thing\n'
    assert failure(mcf, "Sanity_NotInitUpper_dcidInClass")
    mcf2 = (
        'Node: P\ntypeOf: schema:Property\ndcid: "age"\nname: "aGe"\n'
        "domainIncludes: dcs:Person\n"
    )
    assert failure(mcf2, "Sanity_DcidNameMismatchInSchema")
    mcf3 = (
        'Node: P\ntypeOf: schema:Property\ndcid: "age"\nname: "age"\n'
        "subClassOf: dcs:Thing\n"
    )
    assert failure(mcf3, "Sanity_UnexpectedPropInProperty")
    mcf4 = 'Node: C\ntypeOf: schema:Class\ndcid: "Place"\nname: "Place"\n'
    assert failure(mcf4, "Sanity_MissingOrEmpty_subClassOf")


def test_ref_prop_non_ref_value():
    # The MCF parser itself coerces bare/quoted ref-prop values to
    # RESOLVED_REF (McfParser.java:365-374), so build the node directly —
    # this guard catches non-parser sources (JSON-LD, programmatic nodes).
    from import_ray.core.model import ValueType

    node = {
        "typeOf": [("State", ValueType.RESOLVED_REF)],
        "location": [("100", ValueType.NUMBER)],
    }
    checker = NodeChecker()
    assert not checker.check_node("N", node)
    assert checker.counters.counter("Sanity_RefPropHasNonRefValue") == 1


def test_existence_semi_join():
    mcf = (
        "Node: SVO\ntypeOf: dcs:StatVarObservation\n"
        "variableMeasured: dcid:Count_Person\n"
        "observationAbout: dcid:geoId/06\n"
        'observationDate: "2020"\nvalue: 1\n'
    )
    g = parse_mcf_string(mcf).graph
    checker = NodeChecker(known_dcids={"StatVarObservation"})
    for k, v in g.items():
        checker.check_node(k, v)
    assert checker.counters.counter("Existence_MissingReference_variableMeasured") == 1
    # observationAbout is not existence-checked for SVObs (java:421-434)
    assert checker.counters.counter("Existence_MissingReference_observationAbout") == 0


def test_dcaggregate_mmethod_existence_normalization():
    """measurementMethod refs strip the dcAggregate/ prefix before the
    existence check (McfChecker.java:557-559)."""
    from import_ray.core.model import ValueType
    from import_ray.stages.check import NodeChecker
    from import_ray.state.counters import CounterSet

    node = {
        "typeOf": [("StatVarObservation", ValueType.RESOLVED_REF)],
        "variableMeasured": [("Count_Person", ValueType.RESOLVED_REF)],
        "observationAbout": [("geoId/06", ValueType.RESOLVED_REF)],
        "observationDate": [("2020", ValueType.TEXT)],
        "value": [("1", ValueType.NUMBER)],
        "measurementMethod": [("dcAggregate/CensusACS5yrSurvey", ValueType.RESOLVED_REF)],
    }
    cs = CounterSet()
    NodeChecker(cs, known_dcids={"CensusACS5yrSurvey", "Count_Person"}).check_node(
        "n1", dict(node)
    )
    assert cs.counter("Existence_MissingReference_measurementMethod") == 0

    cs2 = CounterSet()
    NodeChecker(cs2, known_dcids={"Count_Person"}).check_node("n1", dict(node))
    assert cs2.counter("Existence_MissingReference_measurementMethod") == 1
