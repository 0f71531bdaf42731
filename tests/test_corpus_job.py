"""Resumable corpus-cleaning job: stage-level checkpoints.

Covers the three-stage layout (per-shard stats / global keep / global
clean), duckdb value parity of the final output, full-skip on rerun,
and selective rebuild when one input shard changes (only that stats
shard plus the global stages re-run).
"""

import json
import os
import shutil

import duckdb
import pyarrow.parquet as pq

from import_ray.pipelines.corpus import run_corpus_job

SF = "/root/testdata/sf0.001"


def _split_docs(tmp_path):
    """Two input files from the sf0.001 documents table (250 rows each)."""
    in_dir = tmp_path / "docs_in"
    in_dir.mkdir()
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), in_dir / "part-0.parquet")
    pq.write_table(t.slice(half), in_dir / "part-1.parquet")
    return in_dir


def _expected_clean(in_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH docs AS (
          SELECT doc_id, text FROM parquet_scan('{in_dir}/*.parquet')
        ), stats AS (
          SELECT doc_id, text,
                 len(string_split(text, ' ')) AS n_tokens,
                 len(list_distinct(string_split(text, ' '))) * 1000000
                   // len(string_split(text, ' ')) AS dr
          FROM docs
        ), filtered AS (
          SELECT * FROM stats WHERE n_tokens BETWEEN 20 AND 2000 AND dr >= 300000
        ), keep AS (
          SELECT MIN(doc_id) AS doc_id FROM filtered GROUP BY text
        )
        SELECT f.doc_id, CAST(f.n_tokens AS BIGINT) AS n_tokens
        FROM filtered f JOIN keep k USING (doc_id)
        ORDER BY f.doc_id
        """
    ).fetchall()
    con.close()
    return rows


def _read_clean(out_dir):
    t = pq.read_table(
        os.path.join(out_dir, "clean"), columns=["doc_id", "n_tokens"]
    )
    return sorted(zip(*[c.to_pylist() for c in t.columns]))


def test_corpus_job_matches_oracle_and_resumes(ray_session, tmp_path):
    in_dir = _split_docs(tmp_path)
    out = str(tmp_path / "out")

    s1 = run_corpus_job(str(in_dir), out, shard_size=1)
    assert s1["stats"] == {"shards": 2, "skipped": 0, "built": 2,
                           "rows_built": s1["stats"]["rows_built"]}
    assert s1["keep"]["built"] == 1 and s1["clean"]["built"] == 1
    assert _read_clean(out) == [tuple(r) for r in _expected_clean(in_dir)]

    # identical rerun: everything skips, output untouched
    s2 = run_corpus_job(str(in_dir), out, shard_size=1)
    assert s2["stats"]["skipped"] == 2 and s2["stats"]["built"] == 0
    assert s2["keep"]["skipped"] == 1 and s2["clean"]["skipped"] == 1
    assert _read_clean(out) == [tuple(r) for r in _expected_clean(in_dir)]


def test_corpus_job_partial_rebuild_on_input_change(ray_session, tmp_path):
    in_dir = _split_docs(tmp_path)
    out = str(tmp_path / "out")
    run_corpus_job(str(in_dir), out, shard_size=1)

    # drop half the rows of the second input: its stats shard must
    # rebuild, the first must skip, and the global stages must re-run
    p1 = in_dir / "part-1.parquet"
    t = pq.read_table(p1)
    pq.write_table(t.slice(0, t.num_rows // 2), p1)
    s = run_corpus_job(str(in_dir), out, shard_size=1)
    assert s["stats"]["skipped"] == 1 and s["stats"]["built"] == 1
    assert s["keep"]["built"] == 1 and s["clean"]["built"] == 1
    assert _read_clean(out) == [tuple(r) for r in _expected_clean(in_dir)]

    # changing a parameter re-runs only the global stages
    s = run_corpus_job(str(in_dir), out, shard_size=1, n_buckets=4)
    assert s["stats"]["built"] == 0
    assert s["keep"]["skipped"] == 1 and s["clean"]["built"] == 1

    # changing a FILTER parameter invalidates the stats shards too
    # (option change must never silently reuse stale shard output)
    s = run_corpus_job(str(in_dir), out, shard_size=1, n_buckets=4, min_tokens=25)
    assert s["stats"]["built"] == 2
    assert s["keep"]["built"] == 1 and s["clean"]["built"] == 1

    # manifest records lineage per shard
    manifest = [
        json.loads(line)
        for line in open(os.path.join(out, "stats", "manifest.jsonl"))
        if line.strip()
    ]
    assert {e["shard_id"] for e in manifest} >= {"00000", "00001"}
    marker = json.load(open(os.path.join(out, "keep", "_stage.json")))
    assert marker["rows"] > 0


def test_corpus_job_neardup_smoke(ray_session, tmp_path):
    in_dir = _split_docs(tmp_path)
    out = str(tmp_path / "out_nd")
    s = run_corpus_job(str(in_dir), out, neardup=True, shard_size=2)
    exact_rows = len(_expected_clean(in_dir))
    assert 0 < s["rows_clean"] <= exact_rows
