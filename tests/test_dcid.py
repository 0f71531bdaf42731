"""DCID / FarmHash bit-compatibility tests.

Golden vectors extracted from the reference's genmcf fixture outputs
(tool/src/test/resources/.../genmcf/*/output/*.mcf — keyString→dcid
pairs) and DcidGeneratorTest.java assertions.
"""

from __future__ import annotations

import json
import os

from import_ray.functions.dcid import (
    for_place,
    for_stat_var,
    for_stat_var_obs,
    long_id,
)
from import_ray.functions.farmhash import K2, fingerprint64

VECTORS = os.path.join(os.path.dirname(__file__), "data_dcid_vectors.json")


def test_golden_keystring_vectors():
    with open(VECTORS) as f:
        groups = json.load(f)
    n = 0
    for vecs in groups.values():
        for key_string, dcid in vecs:
            ns = dcid.rsplit("/", 1)[0] + "/"
            assert ns + long_id(key_string) == dcid
            n += 1
    assert n > 0


def test_reference_unit_test_vectors():
    # DcidGeneratorTest.java:23-24 (legacy population) and :239 (random dcid seed)
    assert long_id("Persondc/b72vdvageYears18OnwardsgenderMale") == "eekggjy2cqvw3"
    assert long_id("NewType22") == "bsxxcsbwvey61"


def test_fingerprint64_empty_is_k2():
    assert fingerprint64(b"") == K2


def test_svobs_dcid_from_fixture():
    # FIXTURES.md F7 / genmcf resolution golden
    pvs = {
        "typeOf": "StatVarObservation",
        "observationAbout": "wikidataId/Q1186",
        "variableMeasured": (
            "CumulativeCount_MedicalTest_ConditionCOVID_19_Positive_Super_Super"
            "_Super_Super_Super_Long_Variable_Name"
        ),
        "observationDate": "2020-01-30",
        "value": "1",
    }
    dcid, ks = for_stat_var_obs(pvs)
    assert dcid == "dc/o/qsplnlg5x13m2"
    assert ks.startswith("observationAbout=wikidataId/Q1186variableMeasured=")


def test_svobs_missing_required_prop():
    pvs = {
        "typeOf": "StatVarObservation",
        "observationAbout": "geoId/06",
        "variableMeasured": "Count_Person",
        "observationDate": "2020",
        # no value
    }
    assert for_stat_var_obs(pvs) == ("", "")


def test_svobs_local_ref_blocks_assignment():
    pvs = {
        "typeOf": "StatVarObservation",
        "observationAbout": "l:SomeNode",
        "variableMeasured": "Count_Person",
        "observationDate": "2020",
        "value": "1",
    }
    assert for_stat_var_obs(pvs) == ("", "")


def test_statvar_key_is_sorted_fixed_plus_constraints():
    pvs = {
        "typeOf": "StatisticalVariable",
        "populationType": "Person",
        "measuredProperty": "count",
        "statType": "measuredValue",
        "age": "Years18Onwards",
        "gender": "Male",
        "name": "ignored (non-constraint)",
        "provenance": "ignored",
    }
    dcid, ks = for_stat_var(pvs)
    assert ks == (
        "age=Years18Onwardsgender=MalemeasuredProperty=count"
        "populationType=PersonstatType=measuredValuetypeOf=StatisticalVariable"
    )
    assert dcid.startswith("dc/") and not dcid.startswith("dc/o/")


def test_place_dcid_ranked_ids():
    # isoCode → iso rewrite; geoId outranks isoCode (DcidGeneratorTest.java:195-225)
    assert for_place({"isoCode": "IN-KL"}) == "iso/IN-KL"
    assert for_place({"nutsCode": "AT13"}) == "nuts/AT13"
    assert for_place({"geoId": "06", "isoCode": "US-CA"}) == "geoId/06"
    assert for_place({"wikidataId": "Q1186"}) == "wikidataId/Q1186"
    assert for_place({"name": "x"}) == ""
