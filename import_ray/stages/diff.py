"""Dataset version diffing — the reference's DifferPipeline semantics
(pipeline/differ/src/main/java/org/datacommons/ingestion/differ/
DifferUtils.java:25-145):

- observation nodes key = 7 props joined ';'
  (variableMeasured;observationAbout;observationDate;observationPeriod;
  measurementMethod;unit;scalingFactor), value = obs value;
- schema nodes key = node id, value = sorted ``prop:value`` pairs
  joined ';' (dcid excluded);
- full outer join on key → ADDED / DELETED / MODIFIED rows
  (``key,current,previous,diff``); unmodified rows dropped.

Ray mapping: tagged union of both versions' rows →
``repartition(keys=[key])`` → per-block compare (CoGroupByKey
equivalent).
"""

from __future__ import annotations

import pyarrow as pa

from import_ray.core.model import Graph, get_prop_val

GROUPBY_PROPERTIES = (
    "variableMeasured",
    "observationAbout",
    "observationDate",
    "observationPeriod",
    "measurementMethod",
    "unit",
    "scalingFactor",
)


def graph_to_diff_rows(graph: Graph) -> tuple[list[tuple[str, str]], list[tuple[str, str]]]:
    """Graph → (observation key/value rows, schema key/value rows)."""
    obs_rows: list[tuple[str, str]] = []
    schema_rows: list[tuple[str, str]] = []
    for node_id, node in graph.items():
        types = [v for v, _ in node.get("typeOf", [])]
        if "StatVarObservation" in types:
            key = ";".join(get_prop_val(node, p) for p in GROUPBY_PROPERTIES)
            obs_rows.append((key, get_prop_val(node, "value")))
        else:
            pairs = [
                f"{p}:{get_prop_val(node, p)}"
                for p in sorted(node)
                if p not in ("dcid", "Node", "keyString")
            ]
            schema_rows.append((node_id, ";".join(pairs)))
    return obs_rows, schema_rows


def diff_rows(
    current: list[tuple[str, str]], previous: list[tuple[str, str]]
) -> list[tuple[str, str, str, str]]:
    """Driver-side diff of key/value rows (CoGroupByKey semantics with
    getOnly(default="") — first value per key wins)."""
    cur = {}
    for k, v in current:
        cur.setdefault(k, v)
    prev = {}
    for k, v in previous:
        prev.setdefault(k, v)
    out = []
    for k in cur.keys() | prev.keys():
        c = cur.get(k, "")
        p = prev.get(k, "")
        if c == p:
            continue
        if not c:
            d = "DELETED"
        elif not p:
            d = "ADDED"
        else:
            d = "MODIFIED"
        out.append((k, c, p, d))
    return out


def _tag_rows(rows: list[tuple[str, str]], tag: str) -> pa.Table:
    return pa.table(
        {
            "key": pa.array([r[0] for r in rows], pa.string()),
            "value": pa.array([r[1] for r in rows], pa.large_string()),
            "tag": pa.array([tag] * len(rows), pa.string()),
        }
    )


def diff_datasets(current_ds, previous_ds, num_partitions: int | None = None):
    """Distributed diff: both sides are Datasets of (key, value) rows;
    returns a Dataset of (key, value_current, value_previous, diff)."""
    from import_ray.core.context import ensure_hash_shuffle, npartitions

    ensure_hash_shuffle(current_ds)
    ensure_hash_shuffle(previous_ds)

    cur = current_ds.map_batches(
        lambda b: b.append_column("tag", pa.array(["current"] * len(b), pa.string())),
        batch_format="pyarrow",
    )
    prev = previous_ds.map_batches(
        lambda b: b.append_column("tag", pa.array(["previous"] * len(b), pa.string())),
        batch_format="pyarrow",
    )
    both = cur.union(prev)
    ensure_hash_shuffle(both)
    n = num_partitions or npartitions()

    def per_block(batch: pa.Table) -> pa.Table:
        cur_map: dict = {}
        prev_map: dict = {}
        for k, v, t in zip(
            batch["key"].to_pylist(),
            batch["value"].to_pylist(),
            batch["tag"].to_pylist(),
        ):
            (cur_map if t == "current" else prev_map).setdefault(k, v)
        rows = diff_rows(list(cur_map.items()), list(prev_map.items()))
        return pa.table(
            {
                "key": pa.array([r[0] for r in rows], pa.string()),
                "value_current": pa.array([r[1] for r in rows], pa.large_string()),
                "value_previous": pa.array([r[2] for r in rows], pa.large_string()),
                "diff": pa.array([r[3] for r in rows], pa.string()),
            }
        )

    return both.repartition(n, keys=["key"]).map_batches(per_block, batch_format="pyarrow")
