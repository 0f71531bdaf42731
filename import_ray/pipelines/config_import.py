"""Config-driven import surface — the Simple Stats Importer semantics
(simple/stats/config.py:1-370, runner.py:89-163 dispatch):

``config["inputFiles"]`` maps file names/patterns to per-file configs:
- ``importType: observations`` with ``format: variablePerColumn``
  (wide CSV → melt, observations_importer.py:130-146) or
  ``variablePerRow`` (variable_per_row_importer.py:47-57);
  ``columnMappings`` renames ``dcid:observationAbout`` /
  ``dcid:observationDate`` / etc. to physical columns;
- ``importType: events`` → per-event triples + aggregated counts by
  (entity, truncated date) (events_importer.py:152-196,336-343);
- ``importType: entities`` → one node per row with ``rowEntityType``
  and ``idColumn`` (entities_importer.py:33-110).

Outputs: observations rows (FIXTURES §F6 subset), triple rows
(FIXTURES §F5), with schema-less StatVar synthesis
(populationType=Thing, measuredProperty=<self>, statType=measuredValue
— simple/stats/data.py:125-138). Entity resolution runs through a
broadcast map (offline stand-in for the DC resolve API).
"""

from __future__ import annotations

import fnmatch
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from import_ray.core.model import strip_namespace

_INVALID_VALUES = {"", "nan", "NaN", "<NA>", "None", "null", "N/A", "-"}


def _truncate_date(dates: pd.Series, period: str) -> pd.Series:
    """events_importer date truncation (events_importer.py:336-343)."""
    if period == "year":
        return dates.str.slice(0, 4)
    if period == "month":
        return dates.str.slice(0, 7)
    return dates  # day


def _resolve_entities(values: pd.Series, resolver_map: dict | None) -> pd.Series:
    vals = values.astype(str).map(strip_namespace)
    if resolver_map:
        return vals.map(lambda v: resolver_map.get(v, v))
    return vals


class ConfigImporter:
    """Runs a config.json-driven import over an input directory."""

    def __init__(self, input_dir: str, config: dict, resolver_map: dict | None = None):
        self.input_dir = input_dir
        self.config = config
        self.resolver_map = resolver_map or {}

    def _file_config(self, fname: str) -> dict | None:
        for pattern, cfg in self.config.get("inputFiles", {}).items():
            if fname == pattern or fnmatch.fnmatch(fname, pattern):
                return cfg
        return None

    def run(self) -> dict:
        """Returns {"observations": DataFrame, "triples": DataFrame}."""
        obs_frames: list[pd.DataFrame] = []
        triple_rows: list[tuple] = []
        statvars: dict[str, str] = {}  # dcid -> provenance
        entity_types: dict[str, tuple[str, str]] = {}

        for fname in sorted(os.listdir(self.input_dir)):
            cfg = self._file_config(fname)
            if cfg is None:
                continue
            path = os.path.join(self.input_dir, fname)
            df = pd.read_csv(path, dtype=str, keep_default_na=False)
            df.columns = [c.strip() for c in df.columns]
            prov = cfg.get("provenance", "")
            itype = cfg.get("importType", "observations")
            if itype == "observations":
                obs = self._import_observations(df, cfg, prov, statvars, entity_types)
                obs_frames.append(obs)
            elif itype == "events":
                obs, rows = self._import_events(df, cfg, prov)
                obs_frames.append(obs)
                triple_rows.extend(rows)
            elif itype == "entities":
                triple_rows.extend(self._import_entities(df, cfg, prov))
            else:
                raise ValueError(f"unknown importType: {itype!r} for {fname}")

        # StatVar triples (schema-less defaults, data.py:125-138)
        for sv, prov in sorted(statvars.items()):
            triple_rows.extend(
                [
                    (sv, "typeOf", "StatisticalVariable", None, prov),
                    (sv, "populationType", "Thing", None, prov),
                    (sv, "measuredProperty", sv, None, prov),
                    (sv, "statType", "measuredValue", None, prov),
                    (sv, "name", None, sv, prov),
                ]
            )
        for ent, (etype, prov) in sorted(entity_types.items()):
            triple_rows.append((ent, "typeOf", etype, None, prov))

        obs_df = (
            pd.concat(obs_frames, ignore_index=True)
            if obs_frames
            else pd.DataFrame(columns=["entity", "variable", "date", "value", "provenance"])
        )
        triples_df = pd.DataFrame(
            triple_rows,
            columns=["subject_id", "predicate", "object_id", "object_value", "provenance"],
        ).drop_duplicates(ignore_index=True)
        return {"observations": obs_df, "triples": triples_df}

    # --- observations -----------------------------------------------------
    def _import_observations(self, df, cfg, prov, statvars, entity_types):
        mappings = {
            strip_namespace(k): v for k, v in cfg.get("columnMappings", {}).items()
        }
        entity_col = mappings.get("observationAbout", df.columns[0])
        date_col = mappings.get("observationDate", df.columns[1])
        ignore = set(cfg.get("ignoreColumns", []))
        fmt = cfg.get("format", "variablePerColumn")
        if fmt == "variablePerRow":
            var_col = mappings.get("variableMeasured", "variable")
            value_col = mappings.get("value", "value")
            out = pd.DataFrame(
                {
                    "entity": _resolve_entities(df[entity_col], self.resolver_map),
                    "variable": df[var_col].map(strip_namespace),
                    "date": df[date_col],
                    "value": df[value_col],
                }
            )
        else:
            sv_cols = [
                c for c in df.columns if c not in (entity_col, date_col) and c not in ignore
            ]
            out = df.melt(
                id_vars=[entity_col, date_col],
                value_vars=sv_cols,
                var_name="variable",
                value_name="value",
            ).rename(columns={entity_col: "entity", date_col: "date"})
            out["entity"] = _resolve_entities(out["entity"], self.resolver_map)
        # drop invalid values (data.py:609-625)
        out = out[~out["value"].isin(_INVALID_VALUES)].reset_index(drop=True)
        out["provenance"] = prov
        etype = cfg.get("entityType", "")
        for sv in out["variable"].unique():
            statvars.setdefault(sv, prov)
        if etype:
            for ent in out["entity"].unique():
                entity_types.setdefault(ent, (etype, prov))
        return out[["entity", "variable", "date", "value", "provenance"]]

    # --- events -----------------------------------------------------------
    def _import_events(self, df, cfg, prov):
        etype = cfg.get("eventType", "Event")
        id_col = cfg.get("idColumn")
        entity_col = df.columns[0]
        date_col = df.columns[1]
        period = (
            cfg.get("aggregation", {}).get("period", "day")
            if isinstance(cfg.get("aggregation"), dict)
            else "day"
        )
        ent = _resolve_entities(df[entity_col], self.resolver_map)
        dates = _truncate_date(df[date_col].astype(str), period)
        counts = (
            pd.DataFrame({"entity": ent, "date": dates})
            .groupby(["entity", "date"], sort=True)
            .size()
            .reset_index(name="value")
        )
        counts["variable"] = f"Count_{etype}"
        counts["value"] = counts["value"].astype(str)
        counts["provenance"] = prov
        rows = []
        for i, r in df.iterrows():
            # generated id <EventType>_<index> when no idColumn
            # (events_importer.py:198-251)
            eid = r[id_col] if id_col else f"{etype}_{i}"
            rows.append((eid, "typeOf", etype, None, prov))
            rows.append((eid, "location", ent.iloc[i], None, prov))
            rows.append((eid, "observationDate", None, str(r[date_col]), prov))
            for c in df.columns:
                if c in (entity_col, date_col, id_col):
                    continue
                v = str(r[c])
                if v not in _INVALID_VALUES:
                    rows.append((eid, c, None, v, prov))
        return counts[["entity", "variable", "date", "value", "provenance"]], rows

    # --- entities ---------------------------------------------------------
    def _import_entities(self, df, cfg, prov):
        etype = cfg.get("rowEntityType", "Entity")
        id_col = cfg.get("idColumn", df.columns[0])
        resolve_cols = set(cfg.get("columnsToResolve", []))
        rows = []
        for i, r in df.iterrows():
            eid = strip_namespace(str(r[id_col]))
            rows.append((eid, "typeOf", etype, None, prov))
            for c in df.columns:
                if c == id_col:
                    continue
                v = str(r[c])
                if v in _INVALID_VALUES:
                    continue
                if c in resolve_cols:
                    rows.append(
                        (eid, c, self.resolver_map.get(v, strip_namespace(v)), None, prov)
                    )
                else:
                    rows.append((eid, c, None, v, prov))
        return rows


def run_config_import(input_dir: str, config: dict, resolver_map: dict | None = None):
    return ConfigImporter(input_dir, config, resolver_map).run()
