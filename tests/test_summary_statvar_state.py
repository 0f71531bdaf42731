"""SV summaries, summary HTML, StatVar collision checks, run_kg_job."""

from __future__ import annotations

import os


def test_statvar_collisions_driver():
    from import_ray.sources.mcf import parse_mcf_string
    from import_ray.stages.statvar_state import (
        check_statvar_collisions,
        statvar_id_pairs,
    )

    mcf = (
        'Node: A\ntypeOf: dcs:StatisticalVariable\ndcid: "SV_A"\n'
        "populationType: dcs:Person\nmeasuredProperty: dcs:count\n"
        "statType: dcs:measuredValue\n\n"
        # same content, different curated dcid → DifferentDcidsForSameStatVar
        'Node: B\ntypeOf: dcs:StatisticalVariable\ndcid: "SV_B"\n'
        "populationType: dcs:Person\nmeasuredProperty: dcs:count\n"
        "statType: dcs:measuredValue\n\n"
        # same curated dcid as A, different content → SameDcidForDifferentStatVars
        'Node: C\ntypeOf: dcs:StatisticalVariable\ndcid: "SV_A"\n'
        "populationType: dcs:Household\nmeasuredProperty: dcs:count\n"
        "statType: dcs:measuredValue\n"
    )
    pairs = statvar_id_pairs(parse_mcf_string(mcf).graph)
    assert len(pairs) == 3
    cs = check_statvar_collisions(pairs)
    assert cs.counter("Sanity_SameDcidForDifferentStatVars") == 1
    assert cs.counter("Sanity_DifferentDcidsForSameStatVar") == 1


def test_statvar_collisions_distributed(ray_session):
    import pyarrow as pa
    import ray.data

    from import_ray.stages.statvar_state import check_statvar_collisions_ds

    pairs = pa.table(
        {
            "curated": pa.array(["SV_A", "SV_B", "SV_A", "SV_A"], pa.string()),
            "generated": pa.array(["g1", "g1", "g2", "g1"], pa.string()),
        }
    )
    cs = check_statvar_collisions_ds(ray.data.from_arrow(pairs))
    assert cs.counter("Sanity_SameDcidForDifferentStatVars") == 1  # SV_A→{g1,g2}
    assert cs.counter("Sanity_DifferentDcidsForSameStatVar") == 1  # g1→{SV_A,SV_B}


def test_statvar_summaries_and_html(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from import_ray.stages.summary import render_summary_html, statvar_summaries
    from import_ray.state.counters import LEVEL_WARNING, CounterSet

    obs = pa.table(
        {
            "entity": pa.array(["geoId/06", "geoId/48", "geoId/06", "geoId/06"]),
            "variable": pa.array(["Count_Person"] * 3 + ["Median_Income"]),
            "date": pa.array(["2020", "2020", "2021", "2020"]),
            "value": pa.array(["10", "20", "30", "bad"]),
            "measurement_method": pa.array(["m1", "m1", "m2", ""]),
            "unit": pa.array(["", "", "", "USD"]),
            "observation_period": pa.array(["P1Y"] * 4),
        }
    )
    out = {r["variable"]: r for r in statvar_summaries(ray.data.from_arrow(obs)).take_all()}
    cp = out["Count_Person"]
    assert cp["n_obs"] == 3 and cp["min_value"] == 10.0 and cp["max_value"] == 30.0
    assert cp["n_dates"] == 2 and cp["n_places"] == 2
    assert out["Median_Income"]["min_value"] is None or out["Median_Income"]["n_obs"] == 1

    cs = CounterSet()
    cs.add(LEVEL_WARNING, "StatsCheck_Data_Holes", n=3)
    html_text = render_summary_html(cs, list(out.values()), path=str(tmp_path / "s.html"))
    assert "StatsCheck_Data_Holes" in html_text and "Count_Person" in html_text
    assert os.path.exists(tmp_path / "s.html")


def test_run_kg_job_resumable(ray_session, tmp_path):
    import glob

    from import_ray.pipelines.kg import run_kg_job
    from import_ray.sources.transcripts import synthesize_transcripts

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(4):
        synthesize_transcripts(
            str(in_dir / f"p{i}.parquet"), n_convs=5, seed=200 + i, mega_every=0
        )
    out = str(tmp_path / "out")
    s1 = run_kg_job(str(in_dir), out, shard_size=2, n_buckets=4)
    assert s1["built"] == 2 and s1["rows_built"] > 0
    assert glob.glob(os.path.join(out, "shard=*", "part_key=*"))
    s2 = run_kg_job(str(in_dir), out, shard_size=2, n_buckets=4)
    assert s2["built"] == 0 and s2["skipped"] == 2


def test_summary_html_place_series_charts(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from import_ray.stages.summary import (
        place_series_sections,
        render_summary_html,
        svg_timeseries_chart,
    )
    from import_ray.state.counters import CounterSet

    obs = pa.table(
        {
            "entity": pa.array(["geoId/06"] * 3 + ["geoId/48"] * 2),
            "variable": pa.array(["Count_Person"] * 5),
            "date": pa.array(["2019", "2020", "2021", "2020", "2021"]),
            "value": pa.array(["10", "20", "15", "7", "9"]),
            "measurement_method": pa.array(["m1"] * 5),
            "unit": pa.array([""] * 5),
            "observation_period": pa.array([""] * 5),
            "scaling_factor": pa.array([""] * 5),
        }
    )
    sections = place_series_sections(ray.data.from_arrow(obs))
    assert sections and {s["entity"] for s in sections} == {"geoId/06", "geoId/48"}

    text = render_summary_html(
        CounterSet(), [], place_series=sections, path=str(tmp_path / "r.html")
    )
    assert "<svg" in text and "polyline" in text and "geoId/06" in text
    # chart endpoints labeled with first/last date
    assert "2019" in text and "2021" in text

    # degenerate series: all-NaN values produce no chart, no crash
    assert svg_timeseries_chart(["2020"], [float("nan")]) == ""


def test_statvar_collisions_bounded_exemplars(ray_session):
    """>30 colliding keys: counter totals stay exact while driver-side
    exemplar rows are capped at MAX_MESSAGES_PER_COUNTER."""
    import pyarrow as pa
    import ray.data

    from import_ray.stages.statvar_state import check_statvar_collisions_ds
    from import_ray.state.counters import LEVEL_ERROR, MAX_MESSAGES_PER_COUNTER

    n_keys = 80  # every curated SV collides (maps to 2 generated ids)
    curated, generated = [], []
    for i in range(n_keys):
        curated += [f"SV_{i}", f"SV_{i}"]
        generated += [f"g{i}_a", f"g{i}_b"]
    pairs = pa.table(
        {
            "curated": pa.array(curated, pa.string()),
            "generated": pa.array(generated, pa.string()),
        }
    )
    cs = check_statvar_collisions_ds(ray.data.from_arrow(pairs))
    # exact totals: each of the 80 curated keys has 2 partners → n=1 each
    assert cs.counter("Sanity_SameDcidForDifferentStatVars") == n_keys
    assert cs.counter("Sanity_DifferentDcidsForSameStatVar") == 0
    key = (LEVEL_ERROR, "Sanity_SameDcidForDifferentStatVars")
    assert len(cs.exemplars.get(key, [])) <= MAX_MESSAGES_PER_COUNTER
