"""Checkpoint/resume via per-shard lineage manifests."""

from __future__ import annotations

import json
import os

from import_ray.sources.transcripts import synthesize_transcripts
from import_ray.state.lineage import load_manifest, run_resumable


def _make_inputs(tmp_path, n_files=4):
    files = []
    for i in range(n_files):
        p = str(tmp_path / f"in{i}.parquet")
        synthesize_transcripts(p, n_convs=6, seed=100 + i, mega_every=0)
        files.append(p)
    return files


def test_resume_skips_completed_shards(ray_session, tmp_path):
    from import_ray.pipelines.kg import build_triples

    files = _make_inputs(tmp_path)
    out = str(tmp_path / "out")
    calls = []

    def build(fs):
        calls.append(list(fs))
        return build_triples(fs, conv_aggregates=False)

    s1 = run_resumable(files, out, build, shard_size=2)
    assert s1["built"] == 2 and s1["skipped"] == 0
    assert len(load_manifest(out)) == 2
    n_calls = len(calls)

    # rerun: everything skipped, nothing rebuilt
    s2 = run_resumable(files, out, build, shard_size=2)
    assert s2["built"] == 0 and s2["skipped"] == 2
    assert len(calls) == n_calls

    # invalidate one shard (input changed) → only that shard rebuilds
    os.utime(files[0], (1, 1))
    s3 = run_resumable(files, out, build, shard_size=2)
    assert s3["built"] == 1 and s3["skipped"] == 1
    assert len(calls) == n_calls + 1


def test_manifest_records_lineage(ray_session, tmp_path):
    from import_ray.pipelines.kg import build_triples

    files = _make_inputs(tmp_path, n_files=2)
    out = str(tmp_path / "out")
    run_resumable(files, out, lambda fs: build_triples(fs, conv_aggregates=False), shard_size=2)
    m = load_manifest(out)
    (entry,) = m.values()
    assert sorted(entry["inputs"]) == sorted(files)
    assert entry["rows"] > 0
    assert os.path.isdir(os.path.join(out, "shard=00000"))


def test_genmcf_run_many_resumable(ray_session, tmp_path):
    """Per-CSV shard resume for genmcf: rerun skips finished shards and
    reproduces identical merged counters without recompute."""
    tmcf = str(tmp_path / "t.tmcf")
    with open(tmcf, "w") as f:
        f.write(
            "Node: E:T->E1\n"
            "typeOf: dcs:StatVarObservation\n"
            "variableMeasured: dcs:Count_Person\n"
            "observationAbout: C:T->place\n"
            "observationDate: C:T->date\n"
            "value: C:T->count\n"
        )
    csvs = []
    for i in range(3):
        p = str(tmp_path / f"d{i}.csv")
        with open(p, "w") as f:
            f.write("place,date,count\n")
            f.write(f"geoId/0{i},2020,{100 + i}\n")
            f.write(f"geoId/1{i},2021,{200 + i}\n")
        csvs.append(p)
    out = str(tmp_path / "out")

    from import_ray.pipelines.genmcf import genmcf_run_many
    from import_ray.state.lineage import load_manifest

    nodes1, c1, s1 = genmcf_run_many(tmcf, csvs, out, run_stat_checks=False)
    assert s1["built"] == 3 and s1["skipped"] == 0
    n1 = nodes1.count()
    assert n1 > 0
    assert len(load_manifest(out)) == 3

    nodes2, c2, s2 = genmcf_run_many(tmcf, csvs, out, run_stat_checks=False)
    assert s2["built"] == 0 and s2["skipped"] == 3
    assert nodes2.count() == n1
    assert c2.counts == c1.counts

    # touch one csv → only that shard rebuilds
    os.utime(csvs[1], (1, 1))
    _, c3, s3 = genmcf_run_many(tmcf, csvs, out, run_stat_checks=False)
    assert s3["built"] == 1 and s3["skipped"] == 2
    assert c3.counts == c1.counts

    # changed options must MISS the per-shard cache (fingerprint fix)
    _, _, s4 = genmcf_run_many(
        tmcf, csvs, out, run_stat_checks=False, pre_check=False
    )
    assert s4["built"] == 3
