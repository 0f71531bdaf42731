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


def svg_timeseries_chart(
    dates: list[str], values: list[float], width: int = 350, height: int = 200
) -> str:
    """Inline SVG time-series chart: black polyline + red point markers
    (the visual semantics of SummaryReportGenerator's JFreeChart SVG,
    SummaryReportGenerator.java:110-160 — hand-rolled polyline instead
    of JFreeChart; documented deviation, no chart lib in env)."""
    pts = [
        (d, float(v))
        for d, v in zip(dates, values)
        if v is not None and not (isinstance(v, float) and np.isnan(v))
    ]
    if not pts:
        return ""
    pts.sort(key=lambda p: p[0])
    xs = np.linspace(30, width - 10, num=len(pts))
    vals = np.array([p[1] for p in pts], dtype=np.float64)
    lo, hi = float(vals.min()), float(vals.max())
    span = (hi - lo) or 1.0
    ys = (height - 20) - (vals - lo) / span * (height - 40)
    poly = " ".join(f"{x:.1f},{y:.1f}" for x, y in zip(xs, ys))
    dots = "".join(
        f'<circle cx="{x:.1f}" cy="{y:.1f}" r="2" fill="red"/>'
        for x, y in zip(xs, ys)
    )
    first, last = html.escape(pts[0][0]), html.escape(pts[-1][0])
    return (
        f'<svg width="{width}" height="{height}" '
        f'xmlns="http://www.w3.org/2000/svg">'
        f'<polyline points="{poly}" fill="none" stroke="black"/>'
        f"{dots}"
        f'<text x="30" y="{height - 4}" font-size="10">{first}</text>'
        f'<text x="{width - 70}" y="{height - 4}" font-size="10">{last}</text>'
        f'<text x="2" y="12" font-size="10">{hi:g}</text>'
        f'<text x="2" y="{height - 24}" font-size="10">{lo:g}</text>'
        "</svg>"
    )


def place_series_sections(obs_ds, sample_places: set[str] | None = None) -> list[dict]:
    """Per-place per-series chart data for the report: date-sorted
    (place, variable, method, unit, period) series restricted to the
    deterministic sample places (PlaceSeriesSummary semantics). Returns
    a SMALL list (≤25 places × their series) — report-scale."""
    import pyarrow.compute as pc

    from import_ray.stages.observations import group_series
    from import_ray.stages.statcheck import select_sample_places

    if sample_places is None:
        places = obs_ds.select_columns(["entity"]).unique("entity") or []
        sample_places = select_sample_places(places)
    sample_arr = pa.array(sorted(sample_places), pa.string())

    def only_samples(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["entity"], value_set=sample_arr))

    series = group_series(obs_ds.map_batches(only_samples, batch_format="pyarrow"))
    return sorted(
        series.take_all(),
        key=lambda r: (r["entity"], r["variable"], r["measurement_method"]),
    )


def render_summary_html(
    counters,
    summaries: list[dict],
    place_series: list[dict] | None = None,
    path: str | None = None,
) -> str:
    """summary_report.html: counter tables per level, per-SV summary
    table, and per-place series sections with inline SVG charts
    (SummaryReportGenerator shape; charts are hand-rolled SVG polylines
    rather than JFreeChart renders)."""
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
    parts.append("</table>")
    if place_series:
        parts.append("<h2>Sample Place Series</h2>")
        cur_place = None
        for s in place_series:
            if s["entity"] != cur_place:
                cur_place = s["entity"]
                parts.append(f"<h3>{html.escape(cur_place)}</h3>")
            label = " | ".join(
                x
                for x in (
                    s["variable"],
                    s.get("measurement_method", ""),
                    s.get("unit", ""),
                    s.get("observation_period", ""),
                )
                if x
            )
            parts.append(f"<h4>{html.escape(label)}</h4>")
            vals = []
            for v in s["values"]:
                try:
                    vals.append(float(v))
                except (TypeError, ValueError):
                    vals.append(float("nan"))
            parts.append(svg_timeseries_chart(list(s["dates"]), vals))
    parts.append("</body></html>")
    text = "".join(parts)
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text
