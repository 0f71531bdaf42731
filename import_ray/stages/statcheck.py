"""Series-level statistics checks — the reference's StatChecker
(util/src/main/java/org/datacommons/util/StatChecker.java:40-703).

Checks per sample-place series (date-sorted):
- value inconsistency within a date (StatsCheck_Inconsistent_Values)
- value-type inconsistency (StatsCheck_MultipleValueTypesInASeries)
- invalid dates / mixed date granularity / data holes (month-unit
  window inference, java:519-592)
- max percent fluctuation >100% / >500% (java:467-513; sawtooth series
  with multi-valued dates are skipped)
- 3-sigma divergence with the reference's streaming weighted
  mean/stddev (java:443-463)

Global SVObs value-consistency (Sanity_InconsistentSvObsValues,
java:596-633): grouped by the 7-prop key; the reference counts
nodes conflicting with the first-seen value (order-dependent) — we
deterministically count ``n_nodes - count(modal value)``, which matches
the reference on its own fixtures (all-distinct → n-1; one outlier → 1).

Ray mapping: obs rows → (pass 1) distinct places → deterministic sample
set (5 smallest dcids per geoId/nuts namespace+length bucket, 25 per
other namespace — replacing the reference's nondeterministic
first-seen order, SURVEY §2.8) → broadcast filter →
``groupby(series_key)`` → per-group check kernel → counter reduce.
"""

from __future__ import annotations

import math
from collections import Counter as PyCounter

import pyarrow as pa

from import_ray.core.model import ValueType
from import_ray.functions.strings import (
    get_valid_iso8601_date,
    is_number,
)
from import_ray.state.counters import (
    LEVEL_ERROR,
    LEVEL_WARNING,
    CounterSet,
)

MAX_PLACES_FOR_TYPE_INFERRED_NS = 5
MAX_PLACES_FOR_TYPELESS_NS = 25
TYPE_INFERRED_PLACE_NAMESPACES = {"geoId", "nuts"}
SMALL_NUMBER = 0.000001

# (observationAbout excluded — it's the partition key); series key per place
SERIES_KEY_PROPS = (
    "variable",
    "measurement_method",
    "observation_period",
    "scaling_factor",
    "unit",
)

OBS_COLUMNS = [
    "entity",
    "variable",
    "date",
    "value",
    "value_type",
    "measurement_method",
    "observation_period",
    "scaling_factor",
    "unit",
]


def sample_places_key(place: str) -> str:
    ns = place.split("/", 1)[0] if "/" in place else ""
    if ns in TYPE_INFERRED_PLACE_NAMESPACES:
        return f"{ns}{len(place)}"
    return ns


def select_sample_places(places) -> set[str]:
    """Deterministic sample-place pick: smallest dcids per bucket."""
    buckets: dict[str, list[str]] = {}
    for p in places:
        if p:
            buckets.setdefault(sample_places_key(p), []).append(p)
    out: set[str] = set()
    for key, ps in buckets.items():
        ns = ps[0].split("/", 1)[0] if "/" in ps[0] else ""
        cap = (
            MAX_PLACES_FOR_TYPE_INFERRED_NS
            if ns in TYPE_INFERRED_PLACE_NAMESPACES
            else MAX_PLACES_FOR_TYPELESS_NS
        )
        out.update(sorted(set(ps))[:cap])
    return out


def _as_float(v: str) -> float | None:
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def check_series(
    time_series: dict[str, list[tuple[str, int]]], counters: CounterSet
) -> None:
    """One (place, series-key) group; ``time_series`` maps date →
    [(value, value_type)] in insertion order; checks run on sorted-date
    order (the reference's TreeMap)."""
    dates = sorted(time_series)
    points = [(d, time_series[d]) for d in dates]

    # --- value inconsistency within a date (java:388-413) ---------------
    for d, vals in points:
        first = None
        initialized = False
        for v, _t in vals:
            if initialized and v != first:
                counters.add(LEVEL_WARNING, "StatsCheck_Inconsistent_Values")
                break
            initialized = True
            first = v
    # --- type inconsistency (java:357-386) ------------------------------
    first_type = None
    for d, vals in points:
        for _v, t in vals:
            if first_type is None:
                first_type = t
            elif t != first_type:
                counters.add(
                    LEVEL_WARNING, "StatsCheck_MultipleValueTypesInASeries"
                )
    # --- dates (java:519-592) -------------------------------------------
    _check_dates(points, counters)
    # --- fluctuation (java:467-513) --------------------------------------
    _check_fluctuation(points, counters)
    # --- 3-sigma (java:415-463) ------------------------------------------
    _check_sigma(points, counters)


def _numeric_value(vals: list[tuple[str, int]]):
    if not vals:
        return None
    v, t = vals[0]
    if t != ValueType.NUMBER:
        return None
    return _as_float(v)


def _check_dates(points, counters: CounterSet) -> None:
    date_times = []
    invalid = 0
    by_len: dict[int, int] = {}
    for d, _vals in points:
        dt = get_valid_iso8601_date(d)
        if dt is None:
            invalid += 1
            counters.add(LEVEL_WARNING, "StatsCheck_Invalid_Date")
            continue
        by_len[len(d)] = by_len.get(len(d), 0) + 1
        date_times.append(dt)
    if len(by_len) > 1:
        counters.add(LEVEL_WARNING, "StatsCheck_Inconsistent_Date_Granularity")
        return
    if invalid:
        return
    window = -1
    prev = None
    for dt in sorted(set(date_times)):
        if prev is not None:
            delta = (dt.year - prev.year) * 12 + (dt.month - prev.month)
            if window >= 0 and window != delta:
                counters.add(LEVEL_WARNING, "StatsCheck_Data_Holes")
                return
            window = delta
        prev = dt


def _check_fluctuation(points, counters: CounterSet) -> None:
    max_delta = 0.0
    base = None
    for d, vals in points:
        if len(vals) > 1:
            return  # sawtooth
        if not vals:
            continue
        v, t = vals[0]
        if t != ValueType.NUMBER:
            continue
        cur = _as_float(v)
        if cur is None:
            continue
        if base is not None:
            delta = cur / SMALL_NUMBER if base == 0 else (cur - base) / abs(base)
            if abs(max_delta) < abs(delta):
                max_delta = delta
        base = cur
    if abs(max_delta) > 5:
        counters.add(LEVEL_WARNING, "StatsCheck_MaxPercentFluctuationGreaterThan500")
    elif abs(max_delta) > 1:
        counters.add(LEVEL_WARNING, "StatsCheck_MaxPercentFluctuationGreaterThan100")


def _check_sigma(points, counters: CounterSet) -> None:
    # streaming weighted mean/stddev (java:443-463)
    values = []
    for d, vals in points:
        if vals and vals[0][1] == ValueType.NUMBER:
            f = _as_float(vals[0][0])
            if f is not None:
                values.append(f)
    if len(points) < 2:
        return
    weights = 0.0
    total = 0.0
    sum_sq_dev = 0.0
    for val in values:
        if weights > 0:
            sum_sq_dev += weights / (weights + 1) * ((total / weights - val) ** 2)
        weights += 1
        total += val
    if weights == 0:
        return
    std = math.sqrt(sum_sq_dev / weights)
    mean = total / weights
    if std == 0:
        return
    for val in values:
        if abs(val - mean) > 3 * std:
            counters.add(LEVEL_WARNING, "StatsCheck_3_Sigma")


def svobs_value_inconsistency(groups: dict, counters: CounterSet) -> None:
    """``groups``: 7-prop key → list of value strings. Deterministic
    count = n - modal-count per conflicted group."""
    for key, values in groups.items():
        floats = [(_as_float(v) if v is not None else None) for v in values]
        distinct = PyCounter(floats)
        if len(distinct) > 1:
            n_modal = max(distinct.values())
            counters.add(
                LEVEL_ERROR,
                "Sanity_InconsistentSvObsValues",
                n=len(floats) - n_modal,
            )


class StatCheckKernel:
    """map_batches kernel over hash-partitioned obs rows: each block holds
    complete (entity, series-key) groups and complete 7-prop dup groups
    (both are sub-keys of the ``entity`` partition key). Emits counter
    rows for a downstream reduce."""

    def __init__(self, sample_places: set[str] | None):
        self.sample_places = sample_places

    def __call__(self, batch: pa.Table) -> pa.Table:
        counters = CounterSet()
        cols = {c: batch[c].to_pylist() for c in batch.column_names}
        n = len(batch)
        series: dict = {}
        dup_groups: dict = {}
        for i in range(n):
            place = cols["entity"][i]
            value = cols["value"][i]
            date = cols["date"][i]
            key7 = (
                place,
                cols["variable"][i],
                cols.get("measurement_method", [""] * n)[i],
                cols.get("observation_period", [""] * n)[i],
                cols.get("scaling_factor", [""] * n)[i],
                cols.get("unit", [""] * n)[i],
            )
            dup_groups.setdefault(key7 + (date,), []).append(value)
            if self.sample_places is None or place in self.sample_places:
                ts = series.setdefault(key7, {})
                ts.setdefault(date, []).append(
                    (value, int(cols.get("value_type", [2] * n)[i]))
                )
        svobs_value_inconsistency(dup_groups, counters)
        for key7, ts in series.items():
            check_series(ts, counters)
        rows = counters.to_rows()
        return pa.Table.from_pylist(
            rows
            or [],
            schema=pa.schema(
                [
                    ("level", pa.string()),
                    ("counter", pa.string()),
                    ("count", pa.int64()),
                    ("exemplars", pa.string()),
                ]
            ),
        )


def stat_check(obs_ds, sample_places: set[str] | None = None) -> CounterSet:
    """Run stat checks over an observations Dataset
    (columns ⊆ OBS_COLUMNS). Two passes: sample-place selection (tiny
    distinct set) then hash-partitioned per-place checks."""
    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(obs_ds)
    from import_ray.core.context import npartitions

    if sample_places is None:
        places = obs_ds.select_columns(["entity"]).unique("entity") or []
        sample_places = select_sample_places(places)
    parts = obs_ds.repartition(npartitions(), keys=["entity"])
    counter_rows = parts.map_batches(
        StatCheckKernel(sample_places), batch_format="pyarrow"
    ).take_all()
    return CounterSet.from_rows(counter_rows)
