"""Observation extraction + series grouping.

SVObs nodes → flat observation rows (FIXTURES.md §F6 schema;
simple/stats/db.py:100-113) and optimized-graph-style series grouping
(McfStatVarObsSeries, Mcf.proto:100-131; Beam GroupByKey
PipelineUtils.java:250-306 with obs sorted by date).
"""

from __future__ import annotations

import pyarrow as pa

from import_ray.core.model import ValueType

_SVOBS_PROPS = {
    "observationAbout": "entity",
    "variableMeasured": "variable",
    "observationDate": "date",
    "value": "value",
    "measurementMethod": "measurement_method",
    "observationPeriod": "observation_period",
    "scalingFactor": "scaling_factor",
    "unit": "unit",
}

OBS_SCHEMA = pa.schema(
    [
        ("entity", pa.string()),
        ("variable", pa.string()),
        ("date", pa.string()),
        ("value", pa.string()),
        ("value_type", pa.int8()),
        ("measurement_method", pa.string()),
        ("observation_period", pa.string()),
        ("scaling_factor", pa.string()),
        ("unit", pa.string()),
    ]
)

SERIES_KEY = [
    "entity",
    "variable",
    "measurement_method",
    "observation_period",
    "scaling_factor",
    "unit",
]


def svobs_rows_to_observations(batch: pa.Table) -> pa.Table:
    """Node-PV rows (genmcf output) → one obs row per SVObs node.

    Works on blocks where each node's rows are contiguous-or-not; groups
    within the batch by node_id (node rows never split across blocks in
    the genmcf flow — each scope's rows are emitted together)."""
    nodes: dict[str, dict] = {}
    node_types: dict[str, bool] = {}
    failed_col = (
        batch["failed"].to_pylist()
        if "failed" in batch.column_names
        else [False] * len(batch)
    )
    for node_id, prop, value, vtype, failed in zip(
        batch["node_id"].to_pylist(),
        batch["prop"].to_pylist(),
        batch["value"].to_pylist(),
        batch["value_type"].to_pylist(),
        failed_col,
    ):
        if failed:
            continue
        if prop == "typeOf" and value == "StatVarObservation":
            node_types[node_id] = True
        d = nodes.setdefault(node_id, {})
        if prop in _SVOBS_PROPS and prop not in d:
            d[prop] = (value, int(vtype))
    out = {name: [] for name in OBS_SCHEMA.names}
    for node_id, props in nodes.items():
        if not node_types.get(node_id):
            continue
        for prop, col in _SVOBS_PROPS.items():
            if col == "value":
                tv = props.get(prop)
                out["value"].append(tv[0] if tv else None)
                out["value_type"].append(tv[1] if tv else ValueType.TEXT)
            elif col in ("entity", "variable", "date"):
                tv = props.get(prop)
                out[col].append(tv[0] if tv else "")
            else:
                tv = props.get(prop)
                out[col].append(tv[0] if tv else "")
    return pa.table({n: pa.array(out[n], OBS_SCHEMA.field(n).type) for n in OBS_SCHEMA.names})


def group_series(obs_ds, num_partitions: int | None = None):
    """Group observations into date-sorted series rows (optimized-graph
    shape): one row per series key with parallel lists of dates/values."""
    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(obs_ds)
    import pandas as pd

    from import_ray.core.context import npartitions

    def to_series_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values("date", kind="mergesort")
        g = df.groupby(SERIES_KEY, sort=False, dropna=False)
        rows = {k: [] for k in SERIES_KEY}
        rows["dates"] = []
        rows["values"] = []
        for key, grp in g:
            for name, val in zip(SERIES_KEY, key):
                rows[name].append(val)
            rows["dates"].append(list(grp["date"]))
            rows["values"].append(list(grp["value"]))
        return pa.table(
            {
                **{k: pa.array(rows[k], pa.string()) for k in SERIES_KEY},
                "dates": pa.array(rows["dates"], pa.list_(pa.string())),
                "values": pa.array(rows["values"], pa.list_(pa.string())),
            }
        )

    n = num_partitions or npartitions()
    return obs_ds.repartition(n, keys=["entity"]).map_batches(
        to_series_block, batch_format="pyarrow"
    )
