"""Per-StatVar summaries + summary report HTML.

StatVarSummary semantics (util/.../StatChecker.extractStatVarInfoFromNode,
StatChecker.java:651-671; rendered by SummaryReportGenerator.java:1-223):
numObservations, min/max numeric value, distinct dates / places /
measurement methods / units / observation periods.

Ray mapping: per-batch partial summaries (counts + min/max + small
distinct sets) → ``groupby(variable)`` merge — a mergeable-sketch
aggregation, never a raw-row shuffle. The HTML render is a minimal
table (no FreeMarker/JFreeChart in env; SVG charts omitted, noted).
"""

from __future__ import annotations

import html
import json

import numpy as np
import pyarrow as pa

MAX_DISTINCT_TRACKED = 100  # bounded collect per key (SURVEY §2.8)


def _partial_summaries(batch: pa.Table) -> pa.Table:
    import pandas as pd

    df = batch.to_pandas()
    vals = pd.to_numeric(df["value"], errors="coerce")
    df = df.assign(_num=vals)
    out = {
        "variable": [],
        "n_obs": [],
        "min_value": [],
        "max_value": [],
        "dates": [],
        "places": [],
        "methods": [],
        "units": [],
        "periods": [],
    }
    for var, g in df.groupby("variable", sort=False):
        out["variable"].append(var)
        out["n_obs"].append(len(g))
        nums = g["_num"].dropna()
        out["min_value"].append(float(nums.min()) if len(nums) else np.nan)
        out["max_value"].append(float(nums.max()) if len(nums) else np.nan)
        for col, key in (
            ("date", "dates"),
            ("entity", "places"),
            ("measurement_method", "methods"),
            ("unit", "units"),
            ("observation_period", "periods"),
        ):
            vals_set = sorted({v for v in g.get(col, []) if v})[:MAX_DISTINCT_TRACKED]
            out[key].append(json.dumps(vals_set))
    return pa.table(
        {
            "variable": pa.array(out["variable"], pa.string()),
            "n_obs": pa.array(out["n_obs"], pa.int64()),
            "min_value": pa.array(out["min_value"], pa.float64()),
            "max_value": pa.array(out["max_value"], pa.float64()),
            "dates": pa.array(out["dates"], pa.string()),
            "places": pa.array(out["places"], pa.string()),
            "methods": pa.array(out["methods"], pa.string()),
            "units": pa.array(out["units"], pa.string()),
            "periods": pa.array(out["periods"], pa.string()),
        }
    )


def _merge_summaries(batch: pa.Table) -> pa.Table:
    import pandas as pd

    df = batch.to_pandas()
    rows = []
    for var, g in df.groupby("variable", sort=False):
        merged_sets = {}
        for key in ("dates", "places", "methods", "units", "periods"):
            s: set = set()
            for blob in g[key]:
                s.update(json.loads(blob))
            merged_sets[key] = sorted(s)[:MAX_DISTINCT_TRACKED]
        rows.append(
            {
                "variable": var,
                "n_obs": int(g["n_obs"].sum()),
                "min_value": float(np.nanmin(g["min_value"])) if g["min_value"].notna().any() else None,
                "max_value": float(np.nanmax(g["max_value"])) if g["max_value"].notna().any() else None,
                "n_dates": len(merged_sets["dates"]),
                "n_places": len(merged_sets["places"]),
                "methods": ",".join(merged_sets["methods"]),
                "units": ",".join(merged_sets["units"]),
                "periods": ",".join(merged_sets["periods"]),
            }
        )
    return pa.Table.from_pylist(rows) if rows else pa.table({"variable": pa.array([], pa.string())})


def statvar_summaries(obs_ds, num_partitions: int | None = None):
    """Dataset of per-StatVar summary rows from observation rows."""
    from import_ray.core.context import ensure_hash_shuffle, npartitions

    ensure_hash_shuffle(obs_ds)
    n = num_partitions or npartitions()
    partials = obs_ds.map_batches(_partial_summaries, batch_format="pyarrow")
    return partials.repartition(n, keys=["variable"]).map_batches(
        _merge_summaries, batch_format="pyarrow"
    )


def render_summary_html(counters, summaries: list[dict], path: str | None = None) -> str:
    """Minimal summary_report.html: counter tables per level + per-SV
    summary table (SummaryReportGenerator shape; SVG charts omitted —
    no chart lib in this environment)."""
    parts = ["<html><head><title>Summary Report</title></head><body>"]
    parts.append("<h1>Summary Report</h1><h2>Counters</h2>")
    by_level: dict = {}
    for (level, counter), count in sorted(counters.counts.items()):
        by_level.setdefault(level, []).append((counter, count))
    for level, rows in sorted(by_level.items()):
        parts.append(f"<h3>{html.escape(level)}</h3><table border='1'>")
        parts.append("<tr><th>counter</th><th>count</th></tr>")
        for counter, count in rows:
            parts.append(
                f"<tr><td>{html.escape(counter)}</td><td>{count}</td></tr>"
            )
        parts.append("</table>")
    parts.append("<h2>StatVar Summaries</h2><table border='1'>")
    cols = ["variable", "n_obs", "min_value", "max_value", "n_dates", "n_places", "methods", "units", "periods"]
    parts.append("<tr>" + "".join(f"<th>{c}</th>" for c in cols) + "</tr>")
    for s in summaries:
        parts.append(
            "<tr>" + "".join(f"<td>{html.escape(str(s.get(c, '')))}</td>" for c in cols) + "</tr>"
        )
    parts.append("</table></body></html>")
    text = "".join(parts)
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text
