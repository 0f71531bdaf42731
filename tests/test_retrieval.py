"""BM25 / boolean retrieval: DuckDB-formula parity, tf extraction
correctness, and partial-top-k merge."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"
TERMS = ["hash", "join", "spark", "window"]


def _duckdb_bm25(docs_path: str, terms: list[str], k: int, k1=1.2, b=0.75):
    con = duckdb.connect()
    term_list = ", ".join(f"'{t}'" for t in terms)
    return con.execute(
        f"""
WITH docs AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         string_split(text, ' ') AS toks
  FROM read_parquet('{docs_path}')
),
stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM docs),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM docs),
df AS (
  SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tok
  WHERE tok IN ({term_list}) GROUP BY tok
),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM tok
  WHERE tok IN ({term_list}) GROUP BY doc_id, tok
),
scored AS (
  SELECT tf.doc_id,
         SUM(LN((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * (tf.tf * ({k1} + 1.0))
             / (tf.tf + {k1} * (1.0 - {b} + {b} * docs.dl / stats.avgdl))
            ) AS score
  FROM tf JOIN df USING (tok)
       JOIN docs ON docs.doc_id = tf.doc_id
       CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k}
"""
    ).df()


def test_bm25_matches_duckdb(ray_session):
    from import_ray.stages.retrieval import bm25_topk

    path = f"{SF}/documents.parquet"
    got = bm25_topk(path, TERMS, k=15).to_pandas()
    want = _duckdb_bm25(path, TERMS, k=15)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.allclose(got["score"].to_numpy(), want["score"].to_numpy(), rtol=1e-9)


def test_term_tf_counts():
    from import_ray.stages.retrieval import _term_tf

    text = pa.array(["a b a c", "c c", "x", ""])
    tf, dl = _term_tf(text, ["a", "c", "zz"])
    assert tf.tolist() == [[2, 1, 0], [0, 2, 0], [0, 0, 0], [0, 0, 0]]
    # '' splits to one empty token
    assert dl.tolist() == [4, 2, 1, 1]


def test_boolean_topk_ordering(ray_session):
    from import_ray.stages.retrieval import tf_boolean_topk

    got = tf_boolean_topk(f"{SF}/documents.parquet", TERMS, k=10).to_pandas()
    assert len(got) == 10
    keys = list(
        zip(-got["n_hits"].to_numpy(), -got["total_tf"].to_numpy(), got["doc_id"])
    )
    assert keys == sorted(keys)
