"""Transcript → candidate-triple extraction kernels.

The engine-specific "template" mapping a conversation turn onto KG
nodes (SURVEY.md §2.3 "mention/StatVar extraction from transcripts").
Semantics follow the reference's TMCF template application
(util/.../TmcfCsvParser.java:115-374): each turn row instantiates
deterministic local nodes, references are resolved through the ranked
external-id rules (DcidGenerator.forPlace, java:213-229), and
StatVarObservations get content-hash dcids
(DcidGenerator.forStatVarObs, java:181-212) — bit-compatible.

Node-id scheme (deterministic, TEST-mode style — TmcfCsvParser.java:41,137):
- conversation: ``conv/<conv_id>``
- turn:         ``conv/<conv_id>/t<turn_idx>``
- SVObs:        content-hash ``dc/o/...``
- places:       ``iso/..`` / ``geoId/..`` / ``wikidataId/..`` / ``nuts/..``
- coordinates:  ``latLong/<lat_e5>_<lng_e5>``

Per-turn text equality: the turn node carries the verbatim turn text as
``text`` (object_value), so output triples preserve every turn's text.

Implemented as a callable class for ``map_batches`` (actor pool):
regexes compile once per actor in ``__init__``; ``__call__`` is
vectorized Arrow for the per-turn triples and compiled-regex scans for
mention extraction.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from import_ray.functions.complex_values import parse_complex_value
from import_ray.functions.dcid import for_stat_var_obs
from import_ray.functions.farmhash import fingerprint64

# place external-id mention: prop:value (prop from the ranked list)
_PLACE_PROPS = {
    "isoCode": "iso",
    "nutsCode": "nuts",
    "geoId": "geoId",
    "wikidataId": "wikidataId",
}

_SVOBS_RE = re.compile(
    r"([A-Za-z][A-Za-z0-9_]*)=(\d+(?:\.\d+)?) @ "
    r"(isoCode|nutsCode|geoId|wikidataId)[:/]([A-Za-z0-9\-]+) on (\d{4}(?:-\d{2})?(?:-\d{2})?)"
)
_PLACE_RE = re.compile(r"(isoCode|nutsCode|wikidataId):([A-Za-z0-9\-]+)|geoId/([0-9]+)")
_LATLONG_RE = re.compile(r"\[LatLong [^\]]+\]")

_TRIPLE_FIELDS = ("subject_id", "predicate", "object_id", "object_value", "provenance")


def place_dcid(prop: str, value: str) -> str:
    """DcidGenerator.forPlace prefix rules (java:213-229)."""
    return f"{_PLACE_PROPS[prop]}/{value}"


def _triples_table(cols: dict[str, list]) -> pa.Table:
    return pa.table(
        {
            "subject_id": pa.array(cols["subject_id"], pa.string()),
            "predicate": pa.array(cols["predicate"], pa.string()),
            "object_id": pa.array(cols["object_id"], pa.string()),
            "object_value": pa.array(cols["object_value"], pa.large_string()),
            "provenance": pa.array(cols["provenance"], pa.string()),
        }
    )


class TranscriptTripleExtractor:
    """map_batches kernel: transcript rows → triple rows.

    Stateless w.r.t. data (safe as tasks or actors); regexes and the
    optional gazetteer are built once per actor in ``__init__``.
    """

    def __init__(self, provenance: str = "transcripts", gazetteer: dict | None = None):
        self.provenance = provenance
        self.gazetteer = gazetteer or {}
        self.svobs_re = _SVOBS_RE
        self.place_re = _PLACE_RE
        self.latlong_re = _LATLONG_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        prov = self.provenance
        n = len(batch)
        conv_s = batch["conv_id"].to_pandas()
        tidx_s = batch["turn_idx"].to_pandas()
        role_np = batch["role"].to_pandas().to_numpy(dtype=object)
        text_np = batch["text"].to_pandas().to_numpy(dtype=object)
        tool_np = batch["tool"].to_pandas().to_numpy(dtype=object)
        ts_np = (
            pc.strftime(batch["ts"], format="%Y-%m-%dT%H:%M:%S")
            .to_pandas()
            .to_numpy(dtype=object)
        )
        subj_np = ("conv/" + conv_s + "/t" + tidx_s.astype(str)).to_numpy(dtype=object)
        cnode_np = ("conv/" + conv_s).to_numpy(dtype=object)
        tidx_np = tidx_s.astype(str).to_numpy(dtype=object)

        # --- per-turn structural triples: vectorized segments -----------
        segs: list[tuple] = [
            (subj_np, "typeOf", np.full(n, "ConversationTurn", object), None),
            (subj_np, "partOf", cnode_np, None),
            (subj_np, "turnNumber", None, tidx_np),
            (subj_np, "role", None, role_np),
            (subj_np, "text", None, text_np),
            (subj_np, "startTime", None, ts_np),
        ]
        tool_mask = tool_np != ""
        if tool_mask.any():
            segs.append((subj_np[tool_mask], "tool", None, tool_np[tool_mask]))

        # --- mention extraction (loop only over pre-filtered rows) ------
        out = {k: [] for k in _TRIPLE_FIELDS}
        add = self._add
        subj = subj_np
        text = text_np
        for i in range(n):
            s = subj[i]
            t = text[i]
            if "=" in t and " @ " in t:
                for m in self.svobs_re.finditer(t):
                    sv, val, pprop, pval, date = m.groups()
                    about = place_dcid(pprop, pval)
                    dcid, _ = for_stat_var_obs(
                        {
                            "typeOf": "StatVarObservation",
                            "observationAbout": about,
                            "variableMeasured": sv,
                            "observationDate": date,
                            "value": val,
                        }
                    )
                    if not dcid:
                        continue
                    add(out, dcid, "typeOf", "StatVarObservation", None, prov)
                    add(out, dcid, "observationAbout", about, None, prov)
                    add(out, dcid, "variableMeasured", sv, None, prov)
                    add(out, dcid, "observationDate", None, date, prov)
                    add(out, dcid, "value", None, val, prov)
                    add(out, s, "mentions", dcid, None, prov)
                    self._emit_place(out, pprop, pval, about, prov)
            if ":" in t or "geoId/" in t:
                for m in self.place_re.finditer(t):
                    if m.group(3) is not None:
                        pprop, pval = "geoId", m.group(3)
                    else:
                        pprop, pval = m.group(1), m.group(2)
                    pd = place_dcid(pprop, pval)
                    add(out, s, "mentionsPlace", pd, None, prov)
                    self._emit_place(out, pprop, pval, pd, prov)
            if "[LatLong" in t:
                for mv in self.latlong_re.findall(t):
                    res = parse_complex_value("", None, "location", mv, build_node=False)
                    if res.error_counter:
                        continue
                    add(out, res.dcid, "typeOf", "GeoCoordinates", None, prov)
                    add(out, res.dcid, "name", None, res.name, prov)
                    add(out, s, "mentionsLocation", res.dcid, None, prov)

        # --- assemble: vectorized segments + mention rows ----------------
        total_struct = sum(len(seg[0]) for seg in segs)
        parts_subj = [seg[0] for seg in segs]
        parts_pred = [np.full(len(seg[0]), seg[1], object) for seg in segs]
        parts_oid = [
            seg[2] if seg[2] is not None else np.full(len(seg[0]), None, object)
            for seg in segs
        ]
        parts_oval = [
            seg[3] if seg[3] is not None else np.full(len(seg[0]), None, object)
            for seg in segs
        ]
        if out["subject_id"]:
            parts_subj.append(np.array(out["subject_id"], object))
            parts_pred.append(np.array(out["predicate"], object))
            parts_oid.append(np.array(out["object_id"], object))
            parts_oval.append(np.array(out["object_value"], object))
        subj_all = np.concatenate(parts_subj)
        return pa.table(
            {
                "subject_id": pa.array(subj_all, pa.string()),
                "predicate": pa.array(np.concatenate(parts_pred), pa.string()),
                "object_id": pa.array(np.concatenate(parts_oid), pa.string()),
                "object_value": pa.array(
                    np.concatenate(parts_oval), pa.large_string()
                ),
                "provenance": pa.array(
                    np.full(len(subj_all), prov, object), pa.string()
                ),
            }
        )

    @staticmethod
    def _add(out, s, p, oid, oval, prov):
        out["subject_id"].append(s)
        out["predicate"].append(p)
        out["object_id"].append(oid)
        out["object_value"].append(oval)
        out["provenance"].append(prov)

    def _emit_place(self, out, prop, value, dcid, prov):
        self._add(out, dcid, "typeOf", "Place", None, prov)
        self._add(out, dcid, prop, None, value, prov)
        name = self.gazetteer.get(dcid)
        if name:
            self._add(out, dcid, "name", None, name, prov)


class ConversationPartials:
    """Per-batch partial aggregation for conversation-level triples.

    Emits one row per (conv_id, batch): turn count, min/max ts, and an
    order-independent 64-bit checksum sum(fingerprint64(f"{idx}:{text}"))
    mod 2^64. Partials are associative, so the wide ``groupby(conv_id)``
    only shuffles tiny partial rows — this is the skew guard for
    mega-conversations (SURVEY.md §4: two-level aggregation instead of
    shuffling raw turn rows).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.select(["conv_id", "turn_idx", "text", "ts"]).to_pandas()
        # order-independent per-turn hash: vectorized siphash of
        # "<idx>:<text>" (deterministic across processes)
        keyed = (df["turn_idx"].astype(str) + ":" + df["text"]).to_numpy(dtype=object)
        df["h"] = pd.util.hash_array(keyed)
        agg = (
            df.groupby("conv_id", sort=False)
            .agg(
                n_turns=("turn_idx", "size"),
                min_ts=("ts", "min"),
                max_ts=("ts", "max"),
                checksum=("h", "sum"),  # uint64 wraps mod 2^64
                max_turn_idx=("turn_idx", "max"),
            )
            .reset_index()
        )
        return pa.table(
            {
                "conv_id": pa.array(agg["conv_id"], pa.string()),
                "n_turns": pa.array(agg["n_turns"], pa.int64()),
                "min_ts": pa.array(agg["min_ts"], pa.timestamp("us")),
                "max_ts": pa.array(agg["max_ts"], pa.timestamp("us")),
                "checksum": pa.array(agg["checksum"].astype(np.uint64), pa.uint64()),
                "max_turn_idx": pa.array(agg["max_turn_idx"].astype(np.int64), pa.int64()),
            }
        )


# sentinel predicate for conversation-partial pseudo-rows riding the
# triple schema through the fused single-scan pipeline; NUL prefix makes
# it impossible to collide with a real extracted predicate
PARTIAL_PREDICATE = "\x00convPartial"


class FusedTranscriptExtractor:
    """Single-scan extraction: per-turn/mention triples AND conversation
    partial rows in ONE pass over the input.

    A lazy Dataset re-executes its read once per consumer, so the
    two-branch plan (extractor branch + partials branch) scanned the
    input parquet twice — at the 100 TB design point that doubles the
    dominant I/O cost. Here the partials ride IN the triple schema as
    pseudo-rows (``PARTIAL_PREDICATE`` + packed int payload in
    ``object_value``), so one downstream keyed exchange carries both
    the dedup traffic and the conv-partial traffic.
    """

    def __init__(self, provenance: str = "transcripts", gazetteer: dict | None = None):
        self.extract = TranscriptTripleExtractor(provenance, gazetteer)
        self.partials = ConversationPartials()
        self.provenance = provenance

    def __call__(self, batch: pa.Table) -> pa.Table:
        triples = self.extract(batch)
        p = self.partials(batch).to_pandas()
        n = len(p)
        if n == 0:
            return triples
        payload = (
            p["n_turns"].astype(str)
            + "|"
            + p["min_ts"].astype("int64").astype(str)
            + "|"
            + p["max_ts"].astype("int64").astype(str)
            + "|"
            + p["checksum"].astype(str)
            + "|"
            + p["max_turn_idx"].astype(str)
        ).to_numpy(dtype=object)
        pseudo = pa.table(
            {
                "subject_id": pa.array(p["conv_id"].to_numpy(dtype=object), pa.string()),
                "predicate": pa.array(np.full(n, PARTIAL_PREDICATE, object), pa.string()),
                "object_id": pa.array(np.full(n, None, object), pa.string()),
                "object_value": pa.array(payload, pa.large_string()),
                "provenance": pa.array(np.full(n, self.provenance, object), pa.string()),
            }
        )
        return pa.concat_tables([triples, pseudo])


def partials_from_pseudo_rows(batch: pa.Table) -> pa.Table:
    """Inverse of ``FusedTranscriptExtractor``'s payload packing: pseudo
    triple rows → the ``ConversationPartials`` schema."""
    conv = batch["subject_id"].to_pandas().to_numpy(dtype=object)
    n = len(conv)
    if n == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n_turns": pa.array([], pa.int64()),
                "min_ts": pa.array([], pa.timestamp("us")),
                "max_ts": pa.array([], pa.timestamp("us")),
                "checksum": pa.array([], pa.uint64()),
                "max_turn_idx": pa.array([], pa.int64()),
            }
        )
    parts = batch["object_value"].to_pandas().str.split("|", expand=True)
    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "n_turns": pa.array(parts[0].to_numpy(dtype=object).astype(np.int64)),
            "min_ts": pa.array(
                parts[1].to_numpy(dtype=object).astype(np.int64), pa.timestamp("us")
            ),
            "max_ts": pa.array(
                parts[2].to_numpy(dtype=object).astype(np.int64), pa.timestamp("us")
            ),
            "checksum": pa.array(parts[3].to_numpy(dtype=object).astype(np.uint64)),
            "max_turn_idx": pa.array(parts[4].to_numpy(dtype=object).astype(np.int64)),
        }
    )


def merge_conversation_partials_block(batch: pa.Table) -> pa.Table:
    """Vectorized merge of ConversationPartials rows → conversation
    triples. Runs per BLOCK after a hash repartition on ``conv_id`` (all
    partials of a conversation co-located), so the merge is a single
    pandas groupby — no per-group Python.
    """
    import pandas as pd

    df = batch.to_pandas()
    g = df.groupby("conv_id", sort=False)
    agg = g.agg(
        n_turns=("n_turns", "sum"),
        min_ts=("min_ts", "min"),
        max_ts=("max_ts", "max"),
        checksum=("checksum", "sum"),  # uint64 wraps mod 2^64
        max_turn_idx=("max_turn_idx", "max"),
    ).reset_index()
    n = len(agg)
    subj = ("conv/" + agg["conv_id"]).to_numpy(dtype=object)
    preds = np.array(
        ["typeOf", "turnCount", "startTime", "endTime", "turnChecksum", "lastTurnNumber"],
        dtype=object,
    )
    vals = np.empty((n, 6), dtype=object)
    vals[:, 0] = None
    vals[:, 1] = agg["n_turns"].astype(str).to_numpy(dtype=object)
    vals[:, 2] = agg["min_ts"].dt.strftime("%Y-%m-%dT%H:%M:%S").to_numpy(dtype=object)
    vals[:, 3] = agg["max_ts"].dt.strftime("%Y-%m-%dT%H:%M:%S").to_numpy(dtype=object)
    vals[:, 4] = agg["checksum"].astype(np.uint64).astype(str).to_numpy(dtype=object)
    vals[:, 5] = agg["max_turn_idx"].astype(str).to_numpy(dtype=object)
    oid = np.empty((n, 6), dtype=object)
    oid[:, 0] = "Conversation"
    oid[:, 1:] = None
    return pa.table(
        {
            "subject_id": pa.array(np.repeat(subj, 6), pa.string()),
            "predicate": pa.array(np.tile(preds, n), pa.string()),
            "object_id": pa.array(oid.ravel(), pa.string()),
            "object_value": pa.array(vals.ravel(), pa.large_string()),
            "provenance": pa.array(np.repeat("transcripts", 6 * n), pa.string()),
        }
    )
