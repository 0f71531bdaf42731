"""SQLite sink, StatVarGroups cache encoding, and Main-DC output layout
for the Simple-importer path.

Reference semantics (datacommonsorg/import, Apache-2.0):
- table DDL + insert statements: ``simple/stats/db.py:88-147,346-397``
  (tables ``triples``, ``observations``, ``key_value_store``,
  ``imports``);
- StatVarGroups cache: ``simple/stats/svg_cache.py:34-124`` building
  the proto defined in ``simple/proto/cache_data.proto``, stored
  gzip+base64 under key ``StatVarGroups``;
- Main-DC layout: ``simple/stats/db.py:273-345`` (``MainDcDb`` —
  observations as per-input CSVs + a shared ``observations.tmcf``,
  schema as ``schema.mcf`` restricted to SV/SVG nodes).

Scale note: sqlite is a SINGLE-WRITER, single-file artifact — it is the
Custom-DC serving format, not the processing format. The sink therefore
STREAMS Dataset blocks through the driver connection with chunked
``executemany`` (the reference's 10k-row chunking,
``mcf_importer.py:96-104``); the partitioned parquet written by the
runner remains the at-scale artifact and the input here.

The proto encoder below is hand-rolled over the public wire format
(same varint/tag helpers as ``sources/tfrecord.py``) — no generated
code is imported.
"""

from __future__ import annotations

import base64
import gzip
import io
import json
import os
import sqlite3
import time

from import_ray.sources.tfrecord import _msg_field, _str_field

_INIT_STATEMENTS = [
    """create table if not exists triples (
    subject_id varchar(255),
    predicate varchar(255),
    object_id varchar(255),
    object_value TEXT
);""",
    """create table if not exists observations (
    entity varchar(255),
    variable varchar(255),
    date varchar(255),
    value varchar(255),
    provenance varchar(255),
    unit varchar(255),
    scaling_factor varchar(255),
    measurement_method varchar(255),
    observation_period varchar(255),
    properties TEXT
);""",
    """create table if not exists key_value_store (
    lookup_key varchar(255),
    value longtext
);""",
    """create table if not exists imports (
    imported_at datetime,
    status varchar(16),
    metadata text
);""",
]

# clear data tables, keep import history (db.py:149-155)
_CLEAR_STATEMENTS = [
    "delete from triples",
    "delete from observations",
    "delete from key_value_store",
]

_TRIPLE_COLS = ["subject_id", "predicate", "object_id", "object_value"]
_OBS_COLS = [
    "entity",
    "variable",
    "date",
    "value",
    "provenance",
    "unit",
    "scaling_factor",
    "measurement_method",
    "observation_period",
    "properties",
]

_CHUNK_ROWS = 10_000  # mcf_importer.py:96-104 insert chunking


def _iter_chunks(ds, cols: list[str]):
    """Yield lists of row tuples from a Dataset (or pandas DataFrame),
    filling absent columns with ''. Streams block by block."""
    import pandas as pd

    if isinstance(ds, pd.DataFrame):
        batches = [ds]
    else:
        batches = ds.iter_batches(batch_size=_CHUNK_ROWS, batch_format="pandas")
    for df in batches:
        out = {}
        for c in cols:
            out[c] = df[c].astype(str) if c in df.columns else [""] * len(df)
        yield list(pd.DataFrame(out)[cols].itertuples(index=False, name=None))


class SqliteSink:
    """Streaming writer for the Custom-DC sqlite artifact."""

    def __init__(self, db_path: str, clear: bool = True):
        os.makedirs(os.path.dirname(os.path.abspath(db_path)), exist_ok=True)
        self.conn = sqlite3.connect(db_path)
        for stmt in _INIT_STATEMENTS:
            self.conn.execute(stmt)
        if clear:
            for stmt in _CLEAR_STATEMENTS:
                self.conn.execute(stmt)
        self.num_observations = 0
        self.num_triples = 0
        self.variables: set[str] = set()

    def insert_triples(self, triples_ds) -> int:
        n = 0
        for chunk in _iter_chunks(triples_ds, _TRIPLE_COLS):
            self.conn.executemany(
                "insert into triples values(?, ?, ?, ?)", chunk
            )
            n += len(chunk)
        self.num_triples += n
        return n

    def insert_observations(self, obs_ds) -> int:
        n = 0
        for chunk in _iter_chunks(obs_ds, _OBS_COLS):
            self.conn.executemany(
                "insert into observations values(?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
                chunk,
            )
            self.variables.update(t[1] for t in chunk)
            n += len(chunk)
        self.num_observations += n
        return n

    def insert_key_value(self, key: str, value: str) -> None:
        self.conn.execute("insert into key_value_store values(?, ?)", (key, value))

    def insert_import_info(self, status: str = "SUCCESS") -> None:
        metadata = {"numVars": len(self.variables), "numObs": self.num_observations}
        self.conn.execute(
            "insert into imports values(?, ?, ?)",
            (
                time.strftime("%Y-%m-%d %H:%M:%S"),
                status,
                json.dumps(metadata),
            ),
        )

    def commit_and_close(self) -> None:
        self.conn.commit()
        self.conn.close()


def write_sqlite_db(
    db_path: str,
    triples_ds=None,
    observations_ds=None,
    key_values: dict[str, str] | None = None,
    clear: bool = True,
) -> dict:
    """One-shot sqlite emit; returns row counts per table."""
    sink = SqliteSink(db_path, clear=clear)
    counts = {"triples": 0, "observations": 0, "key_value_store": 0}
    if triples_ds is not None:
        counts["triples"] = sink.insert_triples(triples_ds)
    if observations_ds is not None:
        counts["observations"] = sink.insert_observations(observations_ds)
    for k, v in (key_values or {}).items():
        sink.insert_key_value(k, v)
        counts["key_value_store"] += 1
    sink.insert_import_info()
    sink.commit_and_close()
    return counts


# --- StatVarGroups cache (svg_cache.py + cache_data.proto) -------------------

STAT_VAR_GROUPS_CACHE_KEY = "StatVarGroups"


def _encode_child_svg(svg_id: str, specialized_entity: str) -> bytes:
    return _str_field(1, svg_id) + _str_field(2, specialized_entity)


def _encode_child_sv(sv: dict) -> bytes:
    out = _str_field(1, sv.get("id", ""))
    out += _str_field(2, sv.get("search_name", ""))
    out += _str_field(3, sv.get("display_name", ""))
    for name in sv.get("search_names", []):
        out += _str_field(4, name)
    out += _str_field(5, sv.get("definition", ""))
    return out


def _encode_svg_node(node: dict) -> bytes:
    out = _str_field(1, node.get("absolute_name", ""))
    for sv in node.get("child_stat_vars", []):
        out += _msg_field(2, _encode_child_sv(sv))
    for svg_id, spec in node.get("child_stat_var_groups", []):
        out += _msg_field(3, _encode_child_svg(svg_id, spec))
    return out


def encode_stat_var_groups(svg_nodes: dict[str, dict]) -> bytes:
    """StatVarGroups proto bytes: map<string, StatVarGroupNode> — each
    map entry is a nested message {1: key, 2: value}."""
    out = b""
    for svg_id, node in svg_nodes.items():
        entry = _str_field(1, svg_id) + _msg_field(2, _encode_svg_node(node))
        out += _msg_field(1, entry)
    return out


def gzip_and_base64_encode(data: bytes) -> str:
    buf = io.BytesIO()
    # fixed mtime → deterministic output bytes across runs
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(data)
    return base64.b64encode(buf.getvalue()).decode("utf-8")


def build_svg_cache_nodes(
    svg_triples: list[dict],
    sv_triples: list[dict],
    specialized_names: dict | None = None,
) -> dict[str, dict]:
    """svg_cache.py:_SVGCache semantics over plain triple-row dicts:
    SVG name/specializationOf triples build the node map + ChildSVG
    links; SV name/description/memberOf triples attach ChildSVs."""
    specialized_names = specialized_names or {}
    nodes: dict[str, dict] = {}

    def get_node(svg_id: str) -> dict:
        return nodes.setdefault(
            svg_id,
            {"absolute_name": "", "child_stat_vars": [], "child_stat_var_groups": []},
        )

    for t in svg_triples:
        svg_id = t["subject_id"]
        node = get_node(svg_id)
        pred = t["predicate"]
        if pred == "name" and t.get("object_value"):
            node["absolute_name"] = t["object_value"]
        elif pred == "specializationOf" and t.get("object_id"):
            parent = get_node(t["object_id"])
            spec = specialized_names.get(t["object_id"], {}).get(svg_id, "")
            parent["child_stat_var_groups"].append((svg_id, spec))

    svs: dict[str, dict] = {}
    for t in sv_triples:
        sv_id = t["subject_id"]
        sv = svs.setdefault(sv_id, {"id": sv_id, "search_names": []})
        pred = t["predicate"]
        if pred == "name" and t.get("object_value"):
            sv["display_name"] = t["object_value"]
            sv["search_names"].append(t["object_value"])
        elif pred == "description" and t.get("object_value"):
            sv["search_names"].append(t["object_value"])
        elif pred == "memberOf" and t.get("object_id"):
            parent = nodes.get(t["object_id"])
            if parent is not None:
                parent["child_stat_vars"].append(sv)
    return nodes


def generate_svg_cache_value(
    svg_triples: list[dict],
    sv_triples: list[dict],
    specialized_names: dict | None = None,
) -> str:
    nodes = build_svg_cache_nodes(svg_triples, sv_triples, specialized_names)
    return gzip_and_base64_encode(encode_stat_var_groups(nodes))


def write_triples_jsonld(triples_ds, out_dir: str) -> str:
    """DCP-bridge export (jsonld_stream_db.py semantics): triples →
    one JSON-LD doc per subject, sharded JSON files.

    Distributed: hash-repartition on subject_id so each node's triples
    co-locate, then per-block group → doc. Serialization cost is
    per-node json.dumps either way; the shuffle moves triple rows once."""
    import pyarrow as pa

    from import_ray.core.context import npartitions

    def to_docs(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        docs = []
        for subj, grp in df.groupby("subject_id", sort=True):
            doc: dict = {"@id": subj}
            for pred, oid, oval in zip(
                grp["predicate"], grp["object_id"], grp["object_value"]
            ):
                val = {"@id": oid} if oid else {"@value": oval}
                if pred == "typeOf":
                    doc.setdefault("@type", []).append(oid or oval)
                else:
                    doc.setdefault(pred, []).append(val)
            docs.append(json.dumps(doc, sort_keys=True))
        return pa.table({"jsonld": docs})

    ds = triples_ds.repartition(npartitions(), keys=["subject_id"])
    ds.map_batches(to_docs, batch_format="pyarrow").write_json(out_dir)
    return out_dir


# --- Main-DC output layout (db.py:273-345 MainDcDb) ---------------------------

OBSERVATIONS_TMCF = """Node: E:Table->E0
typeOf: dcs:StatVarObservation
variableMeasured: C:Table->variable
observationDate: C:Table->date
observationAbout: C:Table->entity
value: C:Table->value"""

_MCF_PREDICATE_BLOCKLIST = {"includedIn"}
_MCF_NODE_TYPES_ALLOWLIST = {"StatisticalVariable", "StatVarGroup"}


def write_main_dc_output(
    output_dir: str,
    triples_ds,
    observations_by_file: dict[str, object],
) -> dict:
    """Main-DC layout: per-input observation CSVs (entity, variable,
    date, value), a shared ``observations.tmcf``, and ``schema.mcf``
    holding only SV/SVG nodes (MainDcDb semantics). The triples pass is
    distributed (filter to allowlisted subjects before the driver-side
    render — node sets are schema-scale)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    os.makedirs(output_dir, exist_ok=True)
    paths: dict = {}

    if isinstance(triples_ds, pd.DataFrame):
        rows = triples_ds.to_dict("records")
    else:
        typed = triples_ds.map_batches(
            lambda b: b.filter(pc.equal(b["predicate"], "typeOf")).select(
                ["subject_id", "object_id"]
            ),
            batch_format="pyarrow",
        ).take_all()
        allowed = sorted(
            {
                r["subject_id"]
                for r in typed
                if r["object_id"] in _MCF_NODE_TYPES_ALLOWLIST
            }
        )
        allowed_arr = np.array(allowed, dtype=object)

        def only_allowed(b: pa.Table) -> pa.Table:
            keep = np.isin(
                b["subject_id"].to_numpy(zero_copy_only=False), allowed_arr
            )
            return b.filter(pa.array(keep))

        rows = triples_ds.map_batches(only_allowed, batch_format="pyarrow").take_all()

    nodes: dict[str, dict] = {}
    node_types: dict[str, str] = {}
    for t in rows:
        if t["predicate"] in _MCF_PREDICATE_BLOCKLIST:
            continue
        props = nodes.setdefault(t["subject_id"], {})
        if t["predicate"] == "typeOf":
            node_types[t["subject_id"]] = t.get("object_id") or ""
        if t.get("object_id"):
            props[t["predicate"]] = t["object_id"]
        elif t.get("object_value"):
            props[t["predicate"]] = f'"{t["object_value"]}"'

    parts = []
    for subject, props in nodes.items():
        if node_types.get(subject) not in _MCF_NODE_TYPES_ALLOWLIST:
            continue
        lines = [f"Node: dcid:{subject}" if ":" not in subject else f"Node: {subject}"]
        lines.extend(f"{p}: {v}" for p, v in props.items())
        parts.append("\n".join(lines))
    schema_path = os.path.join(output_dir, "schema.mcf")
    with open(schema_path, "w") as f:
        f.write("\n\n".join(parts))
    paths["schema_mcf"] = schema_path

    tmcf_path = os.path.join(output_dir, "observations.tmcf")
    with open(tmcf_path, "w") as f:
        f.write(OBSERVATIONS_TMCF)
    paths["observations_tmcf"] = tmcf_path

    csv_paths = []
    for rel_path, obs in observations_by_file.items():
        out_path = os.path.join(output_dir, rel_path)
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        df = obs if isinstance(obs, pd.DataFrame) else obs.to_pandas()
        df[["entity", "variable", "date", "value"]].to_csv(out_path, index=False)
        csv_paths.append(out_path)
    paths["observation_csvs"] = csv_paths
    return paths


# --- blue-green transfer (simple/stats/db_transfer.py:26-103,
#     db.py:732-816 BulkImportContext, db.py:200-217 indexes,
#     db.py:1050-1070 blue-green config) --------------------------------------

_TRANSFER_BATCH_SIZE = 1_000_000  # db_transfer.py:23

# (index_name, table, columns) — db.py:202-217
_DB_INDEXES = [
    ("observations_entity_variable", "observations", ["entity", "variable"]),
    ("triples_subject_id", "triples", ["subject_id"]),
    ("triples_subject_id_predicate", "triples", ["subject_id", "predicate"]),
    ("observations_variable", "observations", ["variable"]),
]


class BulkImportContext:
    """Transaction-safe bulk import into a serving DB connection
    (BulkImportContext, db.py:732-816): on enter — begin transaction,
    drop indexes, clear data tables (import history kept); on clean
    exit — commit then recreate indexes; on error — roll back, leaving
    the serving DB untouched (the blue-green guarantee)."""

    def __init__(self, conn: "sqlite3.Connection"):
        self._conn = conn
        self._obs_count = 0
        self._triple_count = 0
        self._kv_count = 0

    def __enter__(self):
        # Explicit BEGIN before any DDL: Python sqlite3's implicit
        # transaction only opens at the first DML, so without this the
        # index drops would autocommit and a failed import would leave
        # the serving DB index-less even after rollback.  SQLite DDL is
        # transactional, so inside BEGIN the drops roll back too.
        if not self._conn.in_transaction:
            self._conn.execute("BEGIN")
        for name, _, _ in _DB_INDEXES:
            self._conn.execute(f"drop index if exists {name}")
        for stmt in _CLEAR_STATEMENTS:
            self._conn.execute(stmt)
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        if exc_type is None:
            self._conn.commit()
            for name, table, cols in _DB_INDEXES:
                self._conn.execute(
                    f"create index if not exists {name} on {table} ({', '.join(cols)})"
                )
            self._conn.commit()
        else:
            self._conn.rollback()
        return False

    def insert_observations(self, rows: list[tuple]) -> int:
        if rows:
            self._conn.executemany(
                "insert into observations values(?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
                rows,
            )
            self._obs_count += len(rows)
        return len(rows)

    def insert_triples(self, rows: list[tuple]) -> int:
        if rows:
            self._conn.executemany("insert into triples values(?, ?, ?, ?)", rows)
            self._triple_count += len(rows)
        return len(rows)

    def insert_kv(self, rows: list[tuple]) -> int:
        if rows:
            self._conn.executemany(
                "insert into key_value_store values(?, ?)", rows
            )
            self._kv_count += len(rows)
        return len(rows)

    def get_counts(self) -> dict:
        return {
            "observations": self._obs_count,
            "triples": self._triple_count,
            "key_value_store": self._kv_count,
        }

    def validate(
        self,
        expected_obs: int | None = None,
        expected_triples: int | None = None,
        expected_kv: int | None = None,
    ) -> bool:
        """Count validation before commit (db.py:796-815)."""
        if expected_obs is not None and self._obs_count != expected_obs:
            raise RuntimeError(
                f"Observation count mismatch: expected {expected_obs:,}, "
                f"got {self._obs_count:,}"
            )
        if expected_triples is not None and self._triple_count != expected_triples:
            raise RuntimeError(
                f"Triple count mismatch: expected {expected_triples:,}, "
                f"got {self._triple_count:,}"
            )
        if expected_kv is not None and self._kv_count != expected_kv:
            raise RuntimeError(
                f"Key-value count mismatch: expected {expected_kv:,}, "
                f"got {self._kv_count:,}"
            )
        return True


def transfer_db(
    build_db_path: str,
    serving_db_path: str,
    expected_obs: int | None = None,
    expected_triples: int | None = None,
    expected_kv: int | None = None,
) -> dict:
    """Blue-green DB transfer (db_transfer.py:26-103): copy a locally
    built sqlite artifact into the SERVING database inside one
    transaction — batched reads, count validation BEFORE commit,
    rollback on any failure so readers never observe a partial import.
    The sandbox serving target is another sqlite file standing in for
    the reference's Cloud SQL engine; the protocol (drop indexes →
    clear → batched insert → validate → commit → recreate indexes) is
    identical."""
    if not os.path.exists(build_db_path):
        raise FileNotFoundError(f"SQLite database not found: {build_db_path}")

    src = sqlite3.connect(build_db_path)
    dst = sqlite3.connect(serving_db_path)
    try:
        for stmt in _INIT_STATEMENTS:
            dst.execute(stmt)
        cur = src.cursor()
        with BulkImportContext(dst) as ctx:
            cur.execute("SELECT * FROM observations")
            while batch := cur.fetchmany(_TRANSFER_BATCH_SIZE):
                ctx.insert_observations(batch)
            cur.execute("SELECT * FROM triples")
            while batch := cur.fetchmany(_TRANSFER_BATCH_SIZE):
                ctx.insert_triples(batch)
            cur.execute("SELECT * FROM key_value_store")
            while batch := cur.fetchmany(_TRANSFER_BATCH_SIZE):
                ctx.insert_kv(batch)
            ctx.validate(expected_obs, expected_triples, expected_kv)
        return ctx.get_counts()
    finally:
        src.close()
        dst.close()


def get_blue_green_config_from_env() -> dict:
    """Blue-green config from env (db.py:1050-1070): disabled unless
    ENABLE_BLUE_GREEN_IMPORT=true; LOCAL_BUILD_SQLITE_PATH names the
    local build artifact."""
    enabled = os.getenv("ENABLE_BLUE_GREEN_IMPORT", "false").lower() == "true"
    if not enabled:
        return {"enabled": False}
    return {
        "enabled": True,
        "local_sqlite_path": os.getenv(
            "LOCAL_BUILD_SQLITE_PATH", "/tmp/datacommons_build.db"
        ),
    }
