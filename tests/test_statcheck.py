"""StatChecker parity against the reference's statchecks golden report."""

from __future__ import annotations

import json
import os

import pytest

REF = "/root/reference/tool/src/test/resources/org/datacommons/tool/genmcf/statchecks"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures unavailable"
)


def golden_counters() -> dict[str, int]:
    rep = json.load(open(os.path.join(REF, "output", "report.json")))
    out = {}
    for level, d in rep["levelSummary"].items():
        for k, v in d["counters"].items():
            out[k] = int(v)
    return out


def test_statcheck_counters_match_golden(ray_session):
    import pyarrow as pa
    import ray.data

    from import_ray.pipelines.genmcf import genmcf_table_ds
    from import_ray.stages.observations import svobs_rows_to_observations
    from import_ray.stages.statcheck import stat_check

    ds = genmcf_table_ds(
        os.path.join(REF, "input", "covid.tmcf"),
        os.path.join(REF, "input", "covid.csv"),
        external_id_map={},
    )
    obs = ds.map_batches(svobs_rows_to_observations, batch_format="pyarrow")
    counters = stat_check(obs)
    got = {c: n for (_lvl, c), n in counters.counts.items()}
    want = golden_counters()
    for key in (
        "StatsCheck_Inconsistent_Date_Granularity",
        "StatsCheck_Inconsistent_Values",
        "StatsCheck_MaxPercentFluctuationGreaterThan500",
        "StatsCheck_Data_Holes",
        "Sanity_InconsistentSvObsValues",
    ):
        assert got.get(key, 0) == want.get(key, 0), (
            f"{key}: got {got.get(key, 0)}, want {want.get(key, 0)}; all got={got}"
        )


def test_manyinconsistent_counters_match_golden(ray_session):
    from import_ray.pipelines.genmcf import genmcf_table_ds
    from import_ray.stages.observations import svobs_rows_to_observations
    from import_ray.stages.statcheck import stat_check

    base = os.path.join(os.path.dirname(REF), "manyinconsistent")
    rep = json.load(open(os.path.join(base, "output", "report.json")))
    want = int(
        rep["levelSummary"]["LEVEL_ERROR"]["counters"]["Sanity_InconsistentSvObsValues"]
    )
    ds = genmcf_table_ds(
        os.path.join(base, "input", "acre.tmcf"),
        os.path.join(base, "input", "acre.csv"),
        external_id_map={},
    )
    obs = ds.map_batches(svobs_rows_to_observations, batch_format="pyarrow")
    counters = stat_check(obs)
    assert counters.counter("Sanity_InconsistentSvObsValues") == want


def test_series_checks_unit():
    from import_ray.core.model import ValueType
    from import_ray.stages.statcheck import check_series
    from import_ray.state.counters import CounterSet

    N = ValueType.NUMBER
    # hole: monthly series with one missing month
    cs = CounterSet()
    check_series(
        {
            "2020-01": [("1", N)],
            "2020-02": [("2", N)],
            "2020-04": [("3", N)],
        },
        cs,
    )
    assert cs.counter("StatsCheck_Data_Holes") == 1

    # >500% fluctuation
    cs = CounterSet()
    check_series({"2020": [("1", N)], "2021": [("10", N)]}, cs)
    assert cs.counter("StatsCheck_MaxPercentFluctuationGreaterThan500") == 1

    # mixed granularity wins over holes
    cs = CounterSet()
    check_series(
        {"2020": [("1", N)], "2020-05": [("2", N)], "2021": [("3", N)]}, cs
    )
    assert cs.counter("StatsCheck_Inconsistent_Date_Granularity") == 1
    assert cs.counter("StatsCheck_Data_Holes") == 0

    # same-date differing values → inconsistent values, sawtooth blocks fluctuation
    cs = CounterSet()
    check_series({"2020": [("1", N), ("99", N)], "2021": [("1", N)]}, cs)
    assert cs.counter("StatsCheck_Inconsistent_Values") == 1
    assert cs.counter("StatsCheck_MaxPercentFluctuationGreaterThan500") == 0


def test_sample_place_selection_deterministic():
    from import_ray.stages.statcheck import select_sample_places

    places = [f"geoId/{i:02d}" for i in range(20)] + ["wikidataId/Q1", "wikidataId/Q2"]
    s = select_sample_places(places)
    assert sorted(p for p in s if p.startswith("geoId/")) == [
        "geoId/00",
        "geoId/01",
        "geoId/02",
        "geoId/03",
        "geoId/04",
    ]
    assert "wikidataId/Q1" in s and "wikidataId/Q2" in s
