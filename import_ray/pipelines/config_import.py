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

This is a RAY DATA pipeline end to end (runner.py:989-1100 dispatch,
re-expressed): one ``ray.data.read_csv`` per matched file (string-typed
via the header pre-pass), importer kernels as vectorized
``map_batches`` stages with the resolver map broadcast once per actor
(``ray.put`` + fetch in ``__init__``), per-file Datasets unioned into
streaming ``observations`` / ``triples`` Datasets. The only all-to-all
exchanges are over DISTINCT variables / entities (schema-scale, not
data-scale) and the final triple dedup. Header validation runs as an
up-front parallel pre-pass (≤32 threads, header row only — mirrors
runner.py:954-987) so a bad file fails before any import starts.

Outputs: observations rows (FIXTURES §F6 subset), triple rows
(FIXTURES §F5), with schema-less StatVar synthesis
(populationType=Thing, measuredProperty=<self>, statType=measuredValue
— simple/stats/data.py:125-138). Entity resolution runs through a
broadcast map (offline stand-in for the DC resolve API); entity typeOf
backfill prefers a known-type map (stand-in for
``dc.get_property_of_entities``, observations_importer.py:171-187) and
falls back to the config ``entityType``.

Scale note: event files WITHOUT an ``idColumn`` need row-index-based
generated ids (``<EventType>_<row>``), which forces a single-block read
of that file; files with an explicit id column — the normal case at
scale — read and map fully in parallel.
"""

from __future__ import annotations

import csv
import fnmatch
import os
import re
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd
import pyarrow as pa
from import_ray.core.arrowutil import from_pandas_clean

from import_ray.core import vocab
from import_ray.core.model import strip_namespace

_INVALID_VALUES = {"", "nan", "NaN", "<NA>", "None", "null", "N/A", "-"}
_STRIP_NS_RE = "^(" + "|".join(re.escape(p) for p in vocab.NAMESPACE_PREFIXES) + ")"

_TRIPLE_COLS = ["subject_id", "predicate", "object_id", "object_value", "provenance"]
_OBS_COLS = ["entity", "variable", "date", "value", "provenance"]
_IMPORT_TYPES = ("observations", "events", "entities")


def _truncate_date(dates: pd.Series, period: str) -> pd.Series:
    """events_importer date truncation (events_importer.py:336-343)."""
    if period == "year":
        return dates.str.slice(0, 4)
    if period == "month":
        return dates.str.slice(0, 7)
    return dates  # day


def _strip_ns_series(s: pd.Series) -> pd.Series:
    return s.astype(str).str.replace(_STRIP_NS_RE, "", regex=True)


def _resolve_series(s: pd.Series, resolver: dict, entity_type: str = "") -> pd.Series:
    """Broadcast-map resolution; ``S2CellLevelN`` entity types resolve
    lat#lng strings through the local S2 resolver first
    (simple/util/resolvers.py:35-66 semantics — offline, deterministic)."""
    vals = _strip_ns_series(s)
    if entity_type and re.match(r"S2CellLevel\d+", entity_type):
        from import_ray.functions.s2cell import resolve_latlngs_to_s2cells

        uniq = vals.unique().tolist()
        s2map = resolve_latlngs_to_s2cells(uniq, entity_type)
        vals = vals.map(s2map).fillna(vals)
    if not resolver:
        return vals
    mapped = vals.map(resolver)
    return mapped.fillna(vals)


def _triple_table(frames: list[pd.DataFrame]) -> pa.Table:
    df = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        columns=_TRIPLE_COLS
    )
    return from_pandas_clean(df[_TRIPLE_COLS].astype(str), preserve_index=False)


def _const_frame(n: int, **cols) -> pd.DataFrame:
    return pd.DataFrame({k: (v if not np.isscalar(v) else [v] * n) for k, v in cols.items()})


# --- schema registry: properties / event types / entity types ----------------
# (nodes.py:244-332; data.py:335-470)

_DCID_PATTERN = re.compile(r"^(?:[A-Za-z0-9_/]+:)?[A-Za-z0-9_/]+$")


def _schema_id(name: str, prefix: str, counters: dict) -> str:
    """Column/type name → dcid: as-is when it matches the dcid pattern,
    spaces/dashes to underscores when that fixes it, else a sequential
    generated id under ``prefix`` (nodes.py:292-332)."""
    if _DCID_PATTERN.fullmatch(name):
        return name
    alt = re.sub(r"[ -]", "_", name)
    if _DCID_PATTERN.fullmatch(alt):
        return alt
    counters[prefix] = counters.get(prefix, 0) + 1
    return f"{prefix}{counters[prefix]}"


def build_schema_registry(
    input_dir: str, files: list[tuple[str, dict]], prov_map: dict
):
    """Driver-side pass over the matched files' HEADERS (metadata only):
    assigns property / event-type / entity-type dcids in deterministic
    file order and emits their schema-node triples
    (Property: typeOf Property + name; EventType: typeOf Class +
    subClassOf Event + name + includedIn; EntityType: typeOf Class +
    name + includedIn — data.py:335-470).

    Returns (prop_ids, etype_ids, entity_type_ids, schema_triple_rows).
    """
    counters: dict = {}
    prop_ids: dict[str, str] = {}
    etype_ids: dict[str, str] = {}
    entity_type_ids: dict[str, str] = {}
    rows: list[tuple] = []

    def prov_ids_for(prov_name: str) -> tuple[str, str]:
        return prov_map.get(prov_name, ("c/p/default", "c/s/default"))

    def add_property(col: str):
        if col in prop_ids:
            return
        pid = _schema_id(col, "c/prop/", counters)
        prop_ids[col] = pid
        rows.append((pid, "typeOf", "Property", "", ""))
        rows.append((pid, "name", "", col, ""))

    for fname, cfg in files:
        itype = cfg.get("importType", "observations")
        prov = cfg.get("provenance", "")
        try:
            header = _read_header(os.path.join(input_dir, fname))
        except OSError:
            continue
        if itype == "events":
            etype = cfg.get("eventType", "Event")
            if etype not in etype_ids:
                eid = _schema_id(etype, "c/e/", counters)
                etype_ids[etype] = eid
                pid, sid = prov_ids_for(prov)
                rows.append((eid, "typeOf", "Class", "", prov))
                rows.append((eid, "subClassOf", "Event", "", prov))
                rows.append((eid, "name", "", etype, prov))
                rows.append((eid, "includedIn", pid, "", prov))
                rows.append((eid, "includedIn", sid, "", prov))
            id_col = cfg.get("idColumn")
            for col in header[2:]:
                if col != id_col:
                    add_property(col)
        elif itype == "entities":
            etype = cfg.get("rowEntityType", "Entity")
            if etype not in entity_type_ids:
                eid = _schema_id(etype, "c/n/", counters)
                entity_type_ids[etype] = eid
                pid, sid = prov_ids_for(prov)
                rows.append((eid, "typeOf", "Class", "", prov))
                rows.append((eid, "name", "", etype, prov))
                rows.append((eid, "includedIn", pid, "", prov))
                rows.append((eid, "includedIn", sid, "", prov))
            id_col = cfg.get("idColumn", header[0] if header else "")
            for col in header:
                if col != id_col:
                    add_property(col)
    return prop_ids, etype_ids, entity_type_ids, rows


# --- manual StatVar groups (nodes.py:341-360; data.py:81-110) ----------------


def build_group_registry(variables_cfg: dict, custom_ns: str = "custom"):
    """config ``variables.<name>.group`` paths ("A/B/C") → chained
    StatVarGroup nodes with sequential ``<ns>/g/group_N`` ids, top
    level parented at the main-DC root ``dc/g/Root``.

    Returns (variable → group id map, group triple rows).
    """
    groups: dict[str, str] = {}
    rows: list[tuple] = []
    var_groups: dict[str, str] = {}
    for var, cfg in variables_cfg.items():
        path = cfg.get("group", "")
        if not path:
            continue
        tokens = path.split("/")
        for i in range(len(tokens)):
            sub = "/".join(tokens[: i + 1])
            if sub in groups:
                continue
            parent_path = "/".join(tokens[:i])
            parent_id = groups.get(parent_path, "dc/g/Root")
            gid = f"{custom_ns}/g/group_{len(groups) + 1}"
            groups[sub] = gid
            rows.append((gid, "typeOf", "StatVarGroup", "", ""))
            rows.append((gid, "name", "", tokens[i], ""))
            rows.append((gid, "specializationOf", parent_id, "", ""))
        var_groups[var] = groups[path]
    return var_groups, rows


# --- sources / provenances (nodes.py:39-56,111-143; data.py:195-258) ---------


def parse_sources(config: dict):
    """config ``sources`` block → (source/provenance node triple rows,
    provenance name → (prov_id, source_id) map). Ids are sequential
    ``c/s/N`` / ``c/p/N`` after the built-in defaults, matching the
    reference's Nodes registry."""
    from urllib.parse import urlparse

    rows: list[tuple] = []
    prov_map: dict[str, tuple[str, str]] = {}

    def source_triples(sid, name, url):
        rows.append((sid, "typeOf", "Source", "", ""))
        rows.append((sid, "name", "", name, ""))
        if url:
            rows.append((sid, "url", "", url, ""))
            domain = urlparse(url).netloc
            if domain:
                rows.append((sid, "domain", "", domain, ""))

    def prov_triples(pid, name, url, sid):
        rows.append((pid, "typeOf", "Provenance", "", ""))
        rows.append((pid, "name", "", name, ""))
        rows.append((pid, "source", sid, "", ""))
        if url:
            rows.append((pid, "url", "", url, ""))

    source_triples("c/s/default", "Custom Data Commons", "")
    prov_triples("c/p/default", "Custom Import", "custom-import", "c/s/default")
    n_sources, n_provs = 1, 1
    for source_name, source_cfg in config.get("sources", {}).items():
        sid = f"c/s/{n_sources}"
        n_sources += 1
        source_triples(sid, source_name, source_cfg.get("url", ""))
        for prov_name, prov_url in source_cfg.get("provenances", {}).items():
            pid = f"c/p/{n_provs}"
            n_provs += 1
            prov_triples(pid, prov_name, prov_url, sid)
            prov_map[prov_name] = (pid, sid)
    return rows, prov_map


# --- config matching / validation -------------------------------------------


def _file_config(config: dict, relpath: str) -> dict | None:
    """Config entry for a file, matched like the reference
    (simple/util/file_match.py): exact relative path first, then glob
    on the relative path, then exact/glob on the basename — so
    directory-qualified keys like ``subdir/*.csv`` work under
    ``includeInputSubdirs`` and same-named files in different subdirs
    can bind to different patterns."""
    base = os.path.basename(relpath)
    entries = config.get("inputFiles", {})
    for candidate in (relpath, base) if relpath != base else (relpath,):
        for pattern, cfg in entries.items():
            if candidate == pattern or fnmatch.fnmatch(candidate, pattern):
                return cfg
    return None


def _matched_files(input_dir: str, config: dict) -> list[tuple[str, dict]]:
    """Matched (relative path, file config) pairs, sorted; honors the
    top-level ``includeInputSubdirs`` flag (config.py:61,224)."""
    names = []
    if config.get("includeInputSubdirs"):
        for root, _, files in os.walk(input_dir):
            rel = os.path.relpath(root, input_dir)
            for f in files:
                names.append(f if rel == "." else os.path.join(rel, f))
    else:
        names = [
            f
            for f in os.listdir(input_dir)
            if os.path.isfile(os.path.join(input_dir, f))
        ]
    out = []
    for fname in sorted(names):
        cfg = _file_config(config, fname)
        if cfg is None:
            continue
        itype = cfg.get("importType", "observations")
        if itype not in _IMPORT_TYPES:
            raise ValueError(f"unknown importType: {itype!r} for {fname}")
        out.append((fname, cfg))
    return out


def _read_header(path: str) -> list[str]:
    with open(path, newline="") as f:
        row = next(csv.reader(f), [])
    return [c.strip() for c in row]


def _expected_columns(cfg: dict, header: list[str]) -> list[str]:
    """Columns this file's config requires to exist in its header."""
    itype = cfg.get("importType", "observations")
    mappings = {strip_namespace(k): v for k, v in cfg.get("columnMappings", {}).items()}
    need: list[str] = []
    if itype == "observations":
        if cfg.get("format", "variablePerColumn") == "variablePerRow":
            need = [
                mappings.get("observationAbout", header[0] if header else "entity"),
                mappings.get("observationDate", header[1] if len(header) > 1 else "date"),
                mappings.get("variableMeasured", "variable"),
                mappings.get("value", "value"),
            ]
        else:
            for key in ("observationAbout", "observationDate"):
                if key in mappings:
                    need.append(mappings[key])
    elif itype in ("events", "entities"):
        if cfg.get("idColumn"):
            need.append(cfg["idColumn"])
    return need


def validate_headers(input_dir: str, config: dict) -> None:
    """Parallel header pre-pass (≤32 threads, header row only) — raises
    one consolidated ValueError before any import work starts
    (runner.py:954-987 `_validate_all_headers`)."""
    files = _matched_files(input_dir, config)
    if not files:
        return

    def check(item: tuple[str, dict]) -> list[str]:
        fname, cfg = item
        try:
            header = _read_header(os.path.join(input_dir, fname))
            missing = [c for c in _expected_columns(cfg, header) if c not in header]
            if missing:
                return [f"File '{fname}': missing expected column(s) {missing}"]
            if len(header) < 2 and cfg.get("importType", "observations") != "entities":
                return [f"File '{fname}': needs at least 2 columns, got {header}"]
            return []
        except Exception as e:  # unreadable / empty file
            return [f"File '{fname}': failed to validate headers: {e}"]

    with ThreadPoolExecutor(max_workers=min(32, len(files))) as pool:
        errors = [e for errs in pool.map(check, files) for e in errs]
    if errors:
        raise ValueError(
            "CSV Header Validation Failed! The following errors were found:\n"
            + "\n".join(errors)
        )


# --- map_batches kernels ------------------------------------------------------


def _fetch(ref_or_val):
    """Resolve a broadcast ObjectRef from the node-local object store
    (zero-copy, shared across tasks on the node)."""
    import ray

    if isinstance(ref_or_val, ray.ObjectRef):
        return ray.get(ref_or_val)
    return ref_or_val or {}


class _BroadcastMixin:
    """Kernels are driver-constructed instances shipped to map_batches
    TASKS; the resolver map travels as an ObjectRef and is fetched
    lazily on first use from the node-local object store (broadcast —
    one copy per node, not per task)."""

    _resolver_cache = None

    @property
    def resolver(self) -> dict:
        if self._resolver_cache is None:
            self._resolver_cache = _fetch(self._resolver_ref)
        return self._resolver_cache


class ObservationsKernel(_BroadcastMixin):
    """Wide→long melt / long projection for one file's batches."""

    def __init__(self, cfg: dict, header: list[str], prov: str, file_order: int, resolver_ref=None):
        self._resolver_ref = resolver_ref
        mappings = {
            strip_namespace(k): v for k, v in cfg.get("columnMappings", {}).items()
        }
        self.entity_col = mappings.get("observationAbout", header[0])
        self.date_col = mappings.get("observationDate", header[1])
        self.fmt = cfg.get("format", "variablePerColumn")
        self.var_col = mappings.get("variableMeasured", "variable")
        self.value_col = mappings.get("value", "value")
        ignore = set(cfg.get("ignoreColumns", []))
        self.sv_cols = [
            c for c in header if c not in (self.entity_col, self.date_col) and c not in ignore
        ]
        self.entity_type = cfg.get("entityType", "")
        self.prov = prov
        self.file_order = file_order

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df.columns = [c.strip() for c in df.columns]
        if self.fmt == "variablePerRow":
            out = pd.DataFrame(
                {
                    "entity": _resolve_series(
                        df[self.entity_col], self.resolver, self.entity_type
                    ),
                    "variable": _strip_ns_series(df[self.var_col]),
                    "date": df[self.date_col].astype(str),
                    "value": df[self.value_col].astype(str),
                }
            )
        else:
            out = df.melt(
                id_vars=[self.entity_col, self.date_col],
                value_vars=self.sv_cols,
                var_name="variable",
                value_name="value",
            ).rename(columns={self.entity_col: "entity", self.date_col: "date"})
            out["entity"] = _resolve_series(
                out["entity"], self.resolver, self.entity_type
            )
            out["date"] = out["date"].astype(str)
            out["value"] = out["value"].astype(str)
        # drop invalid values (data.py:609-625)
        out = out[~out["value"].isin(_INVALID_VALUES)].reset_index(drop=True)
        out["provenance"] = self.prov
        out["file_order"] = np.int64(self.file_order)
        return from_pandas_clean(
            out[_OBS_COLS + ["file_order"]], preserve_index=False
        )


class EventCountsKernel(_BroadcastMixin):
    """Per-batch partial (entity, truncated-date) counts — the global
    groupby downstream only shuffles these tiny partials."""

    def __init__(self, cfg: dict, header: list[str], resolver_ref=None):
        self._resolver_ref = resolver_ref
        self.entity_col = header[0]
        self.date_col = header[1]
        agg = cfg.get("aggregation")
        self.period = agg.get("period", "day") if isinstance(agg, dict) else "day"

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df.columns = [c.strip() for c in df.columns]
        ent = _resolve_series(df[self.entity_col], self.resolver)
        dates = _truncate_date(df[self.date_col].astype(str), self.period)
        counts = (
            pd.DataFrame({"entity": ent, "date": dates})
            .groupby(["entity", "date"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return from_pandas_clean(counts, preserve_index=False)


class EventTriplesKernel(_BroadcastMixin):
    """Vectorized per-event triple emission (events_importer.py:198-251).

    With an ``idColumn`` this runs on arbitrary batches; without one the
    caller reads the file as a single block (batch_size=None) so the
    generated ``<EventType>_<row>`` ids match file row order."""

    def __init__(
        self,
        cfg: dict,
        header: list[str],
        prov: str,
        resolver_ref=None,
        prop_ids: dict | None = None,
        etype_id: str | None = None,
    ):
        self._resolver_ref = resolver_ref
        self.etype = etype_id or cfg.get("eventType", "Event")
        self.id_col = cfg.get("idColumn")
        self.entity_col = header[0]
        self.date_col = header[1]
        self.extra_cols = [
            c for c in header if c not in (self.entity_col, self.date_col, self.id_col)
        ]
        self.prop_ids = prop_ids or {}
        self.prov = prov

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df.columns = [c.strip() for c in df.columns]
        n = len(df)
        if self.id_col:
            eid = df[self.id_col].astype(str)
        else:
            eid = pd.Series(
                np.char.add(f"{self.etype}_", np.arange(n).astype(str)), index=df.index
            )
        ent = _resolve_series(df[self.entity_col], self.resolver)
        frames = [
            _const_frame(
                n, subject_id=eid, predicate="typeOf", object_id=self.etype,
                object_value="", provenance=self.prov,
            ),
            _const_frame(
                n, subject_id=eid, predicate="location", object_id=ent,
                object_value="", provenance=self.prov,
            ),
            _const_frame(
                n, subject_id=eid, predicate="observationDate", object_id="",
                object_value=df[self.date_col].astype(str), provenance=self.prov,
            ),
        ]
        for c in self.extra_cols:
            v = df[c].astype(str)
            keep = ~v.isin(_INVALID_VALUES)
            if keep.any():
                frames.append(
                    _const_frame(
                        int(keep.sum()),
                        subject_id=eid[keep].reset_index(drop=True),
                        predicate=self.prop_ids.get(c, c),
                        object_id="",
                        object_value=v[keep].reset_index(drop=True),
                        provenance=self.prov,
                    )
                )
        return _triple_table(frames)


class EntityTriplesKernel(_BroadcastMixin):
    """Vectorized row-entity triples (entities_importer.py:33-110)."""

    def __init__(
        self,
        cfg: dict,
        header: list[str],
        prov: str,
        resolver_ref=None,
        prop_ids: dict | None = None,
        etype_id: str | None = None,
    ):
        self._resolver_ref = resolver_ref
        self.etype = etype_id or cfg.get("rowEntityType", "Entity")
        self.id_col = cfg.get("idColumn", header[0])
        self.resolve_cols = set(cfg.get("columnsToResolve", []))
        self.other_cols = [c for c in header if c != self.id_col]
        self.prop_ids = prop_ids or {}
        self.prov = prov

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df.columns = [c.strip() for c in df.columns]
        n = len(df)
        eid = _strip_ns_series(df[self.id_col])
        frames = [
            _const_frame(
                n, subject_id=eid, predicate="typeOf", object_id=self.etype,
                object_value="", provenance=self.prov,
            )
        ]
        for c in self.other_cols:
            v = df[c].astype(str)
            keep = ~v.isin(_INVALID_VALUES)
            if not keep.any():
                continue
            sub = eid[keep].reset_index(drop=True)
            pred = self.prop_ids.get(c, c)
            if c in self.resolve_cols:
                frames.append(
                    _const_frame(
                        int(keep.sum()),
                        subject_id=sub,
                        predicate=pred,
                        object_id=_resolve_series(v[keep], self.resolver).reset_index(
                            drop=True
                        ),
                        object_value="",
                        provenance=self.prov,
                    )
                )
            else:
                frames.append(
                    _const_frame(
                        int(keep.sum()),
                        subject_id=sub,
                        predicate=pred,
                        object_id="",
                        object_value=v[keep].reset_index(drop=True),
                        provenance=self.prov,
                    )
                )
        return _triple_table(frames)


# --- the Ray-native runner ----------------------------------------------------


def _read_csv_strings(path: str, header: list[str], single_block: bool = False):
    import pyarrow.csv as pacsv
    import ray.data

    from import_ray.core.context import configure_data_context

    configure_data_context()
    kwargs = {}
    if single_block:
        kwargs["override_num_blocks"] = 1
    return ray.data.read_csv(
        path,
        convert_options=pacsv.ConvertOptions(
            column_types={c: pa.string() for c in header}
        ),
        **kwargs,
    )


def _empty_ds(cols: list[str]):
    import ray.data

    return ray.data.from_arrow(
        pa.table({c: pa.array([], pa.string()) for c in cols})
    )


def run_config_import_ray(
    input_dir: str,
    config: dict,
    resolver_map: dict | None = None,
    entity_type_map: dict | None = None,
) -> dict:
    """Config-driven import as a streaming Ray Data pipeline.

    Returns {"observations": Dataset, "triples": Dataset} (all-string
    columns; absent object_id/object_value are ``""``).
    """
    import ray
    import ray.data
    from ray.data.aggregate import Count, Min, Sum

    from import_ray.core.context import npartitions

    validate_headers(input_dir, config)
    files = _matched_files(input_dir, config)
    resolver_ref = ray.put(resolver_map or {})
    source_rows, prov_map = parse_sources(config)
    prop_ids, etype_ids, entity_type_ids, schema_rows = build_schema_registry(
        input_dir, files, prov_map
    )
    var_groups, group_rows = build_group_registry(config.get("variables", {}))
    source_rows = source_rows + schema_rows + group_rows

    obs_parts = []  # Datasets with file_order col
    triple_parts = []  # Datasets of _TRIPLE_COLS
    order_prov: dict[int, str] = {}
    order_etype: dict[int, str] = {}

    for order, (fname, cfg) in enumerate(files):
        path = os.path.join(input_dir, fname)
        header = _read_header(path)
        prov = cfg.get("provenance", "")
        order_prov[order] = prov
        itype = cfg.get("importType", "observations")
        if itype == "observations":
            ds = _read_csv_strings(path, header)
            obs_parts.append(
                ds.map_batches(
                    ObservationsKernel(
                        cfg=cfg,
                        header=header,
                        prov=prov,
                        file_order=order,
                        resolver_ref=resolver_ref,
                    ),
                    batch_format="pyarrow",
                )
            )
            if cfg.get("entityType"):
                order_etype[order] = cfg["entityType"]
        elif itype == "events":
            single = not cfg.get("idColumn")
            ds = _read_csv_strings(path, header, single_block=single)
            etype = cfg.get("eventType", "Event")
            # computedVariables (events_importer.py:139-171): one COUNT
            # series per computed variable, each with its own
            # ``variables.<name>.aggregation.period`` (default year);
            # legacy fallback: Count_<eventType> with the file-level
            # aggregation period (default day).
            computed = cfg.get("computedVariables") or []
            if computed:
                var_periods = [
                    (
                        name,
                        config.get("variables", {})
                        .get(name, {})
                        .get("aggregation", {})
                        .get("period", "year"),
                    )
                    for name in computed
                ]
            else:
                agg = cfg.get("aggregation")
                period = agg.get("period", "day") if isinstance(agg, dict) else "day"
                var_periods = [(f"Count_{etype}", period)]

            from import_ray.core.context import join_safe

            for var_name, period in var_periods:
                kernel_cfg = dict(cfg, aggregation={"period": period})
                counts = (
                    ds.map_batches(
                        EventCountsKernel(
                            cfg=kernel_cfg, header=header, resolver_ref=resolver_ref
                        ),
                        batch_format="pyarrow",
                    )
                    .groupby(["entity", "date"], num_partitions=npartitions())
                    .aggregate(Sum("n", alias_name="n"))
                )

                def counts_to_obs(
                    b: pa.Table, _var=var_name, _prov=prov, _order=order
                ) -> pa.Table:
                    import pyarrow.compute as pc

                    n = len(b)
                    return pa.table(
                        {
                            "entity": b["entity"],
                            "variable": pa.array([_var] * n, pa.string()),
                            "date": b["date"],
                            "value": pc.cast(b["n"], pa.string()),
                            "provenance": pa.array([_prov] * n, pa.string()),
                            "file_order": pa.array([_order] * n, pa.int64()),
                        }
                    )

                # aggregate-derived → re-block so downstream keyed ops
                # never see schema-less empty partitions
                obs_parts.append(
                    join_safe(counts.map_batches(counts_to_obs, batch_format="pyarrow"))
                )
            triple_parts.append(
                ds.map_batches(
                    EventTriplesKernel(
                        cfg=cfg,
                        header=header,
                        prov=prov,
                        resolver_ref=resolver_ref,
                        prop_ids=prop_ids,
                        etype_id=etype_ids.get(cfg.get("eventType", "Event")),
                    ),
                    batch_format="pyarrow",
                    batch_size=None if single else 1024,
                )
            )
        else:  # entities
            ds = _read_csv_strings(path, header)
            triple_parts.append(
                ds.map_batches(
                    EntityTriplesKernel(
                        cfg=cfg,
                        header=header,
                        prov=prov,
                        resolver_ref=resolver_ref,
                        prop_ids=prop_ids,
                        etype_id=entity_type_ids.get(cfg.get("rowEntityType", "Entity")),
                    ),
                    batch_format="pyarrow",
                )
            )

    if obs_parts:
        obs_all = obs_parts[0]
        for p in obs_parts[1:]:
            obs_all = obs_all.union(p)
        # three consumers (StatVar groupby, entity-typeOf groupby, the
        # returned observations) would each re-execute the read+kernel
        # lineage — pin the blocks once instead
        obs_all = obs_all.materialize()
    else:
        obs_all = _empty_ds(_OBS_COLS).add_column(
            "file_order", lambda df: pd.Series([], dtype=np.int64)
        )

    from import_ray.core.context import join_safe

    # StatVar synthesis over DISTINCT variables (schema-scale groupby):
    # first-file-wins provenance via Min(file_order); the config
    # ``variables`` block overrides name and adds description /
    # searchDescriptions / custom properties (data.py:113-168,
    # config.py:157-169). join_safe: aggregate outputs feed the final
    # triples groupby.
    variables_cfg = config.get("variables", {})
    sv = join_safe(
        obs_all.groupby("variable", num_partitions=npartitions())
        .aggregate(Min("file_order", alias_name="file_order"))
    )

    def sv_triples(b: pa.Table) -> pa.Table:
        frames = []
        variables = b["variable"].to_pandas()
        provs = b["file_order"].to_pandas().map(order_prov).fillna("")
        rows = []
        for var, prov in zip(variables, provs):
            cfg = variables_cfg.get(var, {})
            props = {
                "populationType": "Thing",
                "measuredProperty": var,
                "statType": "measuredValue",
                **cfg.get("properties", {}),
            }
            rows.append((var, "typeOf", "StatisticalVariable", "", prov))
            rows.append((var, "name", "", cfg.get("name", var), prov))
            if cfg.get("description"):
                rows.append((var, "description", "", cfg["description"], prov))
            for sd in cfg.get("searchDescriptions", []) + cfg.get("nlSentences", []):
                rows.append((var, "searchDescription", "", sd, prov))
            for p, v in props.items():
                rows.append((var, p, v, "", prov))
            if var in var_groups:
                rows.append((var, "memberOf", var_groups[var], "", prov))
            # includedIn provenance/source (data.py:150-175)
            pid, sid = prov_map.get(prov, ("c/p/default", "c/s/default"))
            rows.append((var, "includedIn", pid, "", prov))
            rows.append((var, "includedIn", sid, "", prov))
        frames.append(
            pd.DataFrame(
                rows,
                columns=[
                    "subject_id", "predicate", "object_id", "object_value", "provenance",
                ],
            )
        )
        return _triple_table(frames)

    triple_parts.append(sv.map_batches(sv_triples, batch_format="pyarrow"))

    # entity typeOf triples over DISTINCT entities of typed files; the
    # known-type map (dc.get_property_of_entities stand-in) wins over the
    # config entityType fallback (observations_importer.py:171-187)
    if order_etype:
        typed_orders = sorted(order_etype)
        etype_ref = ray.put(entity_type_map or {})

        def typed_only(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.is_in(
                b["file_order"], value_set=pa.array(typed_orders, pa.int64())
            )
            return b.filter(mask).select(["entity", "file_order"])

        ents = join_safe(
            obs_all.map_batches(typed_only, batch_format="pyarrow")
            .groupby("entity", num_partitions=npartitions())
            .aggregate(Min("file_order", alias_name="file_order"))
        )

        class EntityTypeOf(_BroadcastMixin):
            def __init__(self, etype_ref=None):
                self._resolver_ref = etype_ref

            def __call__(self, b: pa.Table) -> pa.Table:
                self.known = self.resolver
                ents = b["entity"].to_pandas()
                orders = b["file_order"].to_pandas()
                etypes = ents.map(self.known).fillna(orders.map(order_etype))
                return _triple_table(
                    [
                        _const_frame(
                            len(ents),
                            subject_id=ents,
                            predicate="typeOf",
                            object_id=etypes,
                            object_value="",
                            provenance=orders.map(order_prov).fillna(""),
                        )
                    ]
                )

        triple_parts.append(
            ents.map_batches(EntityTypeOf(etype_ref=etype_ref), batch_format="pyarrow")
        )

    # source / provenance nodes (always present, like the reference's
    # Nodes registry defaults)
    import ray.data as _rd

    triple_parts.append(
        _rd.from_arrow(
            from_pandas_clean(
                pd.DataFrame(
                    source_rows,
                    columns=_TRIPLE_COLS,
                ).astype(str),
                preserve_index=False,
            )
        )
    )

    if triple_parts:
        triples = triple_parts[0]
        for p in triple_parts[1:]:
            triples = triples.union(p)
        # distributed distinct on the full triple; re-block the aggregate
        # output (join_safe) for downstream keyed consumers
        triples = join_safe(
            triples.groupby(_TRIPLE_COLS, num_partitions=npartitions())
            .aggregate(Count(alias_name="_n"))
            .select_columns(_TRIPLE_COLS)
        )
    else:
        triples = _empty_ds(_TRIPLE_COLS)

    observations = obs_all.select_columns(_OBS_COLS)
    return {
        "observations": observations,
        "triples": triples,
        # extras for runner modes: per-file split (main-DC CSV layout)
        "observations_with_order": obs_all,
        "order_files": {order: fname for order, (fname, _) in enumerate(files)},
    }


def run_config_import(
    input_dir: str,
    config: dict,
    resolver_map: dict | None = None,
    entity_type_map: dict | None = None,
) -> dict:
    """Pandas-facing wrapper over the Ray pipeline (golden-test surface):
    materializes both Datasets; ``""`` object slots become None to match
    the classic triple-tuple convention."""
    out = run_config_import_ray(input_dir, config, resolver_map, entity_type_map)
    obs = out["observations"].to_pandas()
    triples = out["triples"].to_pandas()
    for c in ("object_id", "object_value"):
        triples[c] = triples[c].replace("", None)
    triples = triples.sort_values(_TRIPLE_COLS, kind="mergesort").reset_index(drop=True)
    obs = obs.sort_values(_OBS_COLS, kind="mergesort").reset_index(drop=True)
    return {"observations": obs, "triples": triples}
