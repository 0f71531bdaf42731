"""Stage-checkpointed graph/similarity jobs: build, resume-skip,
option-change rebuild."""

from __future__ import annotations

import os


def _write_triples(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    # two components: chain e0-e1-e2, pair e8-e9
    subs = ["e0", "e1", "e8", "e3"]
    objs = ["e1", "e2", "e9", ""]
    t = pa.table(
        {
            "subject_id": pa.array(subs, pa.string()),
            "predicate": pa.array(["ref"] * 4, pa.string()),
            "object_id": pa.array(objs, pa.string()),
            "object_value": pa.array([""] * 4, pa.string()),
            "provenance": pa.array(["p"] * 4, pa.string()),
        }
    )
    path = str(tmp_path / "triples.parquet")
    pq.write_table(t, path)
    return path


def test_graph_job_builds_and_resumes(ray_session, tmp_path):
    from import_ray.pipelines.graph_job import run_graph_job

    triples = _write_triples(tmp_path)
    out = str(tmp_path / "graph_out")
    s1 = run_graph_job(triples, out)
    assert s1["edges"]["built"] == 1 and s1["components"]["built"] == 1
    assert s1["edges"]["rows"] == 3  # e3 has empty object → no edge
    assert os.path.exists(os.path.join(out, "edges", "_stage.json"))

    # rerun: both stages skip
    s2 = run_graph_job(triples, out)
    assert s2["edges"]["skipped"] == 1 and s2["components"]["skipped"] == 1
    assert s2["edges"]["rows"] == s1["edges"]["rows"]

    # option change rebuilds the affected suffix (edges + components)
    s3 = run_graph_job(triples, out, max_object_degree=10)
    assert s3["edges"]["built"] == 1 and s3["components"]["built"] == 1

    # pagerank stage is additive and checkpoints independently
    s4 = run_graph_job(triples, out, max_object_degree=10, pagerank=True)
    assert s4["edges"]["skipped"] == 1
    assert s4["pagerank"]["built"] == 1 and s4["pagerank"]["rows"] > 0
    s5 = run_graph_job(triples, out, max_object_degree=10, pagerank=True)
    assert s5["pagerank"]["skipped"] == 1


def test_similarity_job_builds_and_resumes(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from import_ray.pipelines.graph_job import run_similarity_job

    rng = np.random.default_rng(8)
    base = rng.normal(size=(6, 16))
    # vectors 0 and 1 identical (a guaranteed near-dup pair)
    base[1] = base[0]
    emb = pa.table(
        {
            "vec_id": pa.array(range(6), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in base],
                pa.list_(pa.float32()),
            ),
        }
    )
    path = str(tmp_path / "emb.parquet")
    pq.write_table(emb, path)
    out = str(tmp_path / "sim_out")

    s1 = run_similarity_job(path, out, threshold=0.99)
    assert s1["pairs"]["built"] == 1 and s1["clusters"]["built"] == 1
    assert s1["pairs"]["rows"] >= 1  # the planted identical pair
    assert s1["clusters"]["rows"] == 6

    s2 = run_similarity_job(path, out, threshold=0.99)
    assert s2["pairs"]["skipped"] == 1 and s2["clusters"]["skipped"] == 1

    # labels: 0 and 1 share a cluster, everything else labels itself
    import ray.data

    labels = {
        r["vec_id"]: r["cluster_id"]
        for r in ray.data.read_parquet(os.path.join(out, "clusters")).take_all()
    }
    assert labels[0] == labels[1] == 0
    assert all(labels[i] == i for i in range(2, 6))
