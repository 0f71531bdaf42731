"""StatVar-hierarchy (SVG) generation — Custom-DC post-import step.

Re-expresses ``simple/stats/stat_var_hierarchy_generator.py:35-531`` +
``schema_constants.py`` as a Ray Data pipeline:

  triples → extract SVs (predicate filter + groupby subject_id)
          → per-SV LATTICE expansion (map_batches; each SV's ancestor
            SVG set is a pure local function of its own PVs, so the
            combinatorial walk needs no cross-SV state)
          → global dedup (one hash-shuffle distinct over emitted rows)
          → triple emission (+ tiny driver-side vertical/root attach
            over the distinct (population type, measured property) set)

Parity notes: SVG ids/names/parents match the reference exactly —
sorted PVs, ``c/g/`` prefix, camel-split names, ``X With p = v`` name
grammar, the complete/partial (``has_prop_without_val``) parent
alternation, 255-char id cap with an 8-hex sha256 suffix, vertical
specs attach at population-type SVGs gated on measured-property
intersection, Root fallback. Verified against the reference's
``stat_var_hierarchy_generator`` expected CSVs (tests/test_svg_hierarchy.py).
"""

from __future__ import annotations

import hashlib
import json
import logging
import re

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

# schema_constants.py:19-31 (SV_HIERARCHY_PROPS_BLOCKLIST)
SV_HIERARCHY_PROPS_BLOCKLIST = {
    "dcid", "typeOf", "isPublic", "provenance", "resMCFFile", "keyString",
    "populationType", "constraintProperties", "name", "label", "alternateName",
    "description", "descriptionUrl", "memberOf", "utteranceTemplate",
    "searchDescription", "source", "footnote", "isNormalizable",
    "denominatorForNormalization", "measuredProperty", "measurementMethod",
    "measurementDenominator", "measurementQualifier", "scalingFactor", "unit",
    "statType", "censusACSTableId", "includedIn", "observationProperties",
}

CUSTOM_SVG_PREFIX = "c/g/"
DEFAULT_CUSTOM_ROOT_SVG_ID = f"{CUSTOM_SVG_PREFIX}Root"
DEFAULT_POPULATION_TYPE = "Thing"
TYPE_SV = "StatisticalVariable"
TYPE_SVG = "StatVarGroup"

MAX_SVG_ID_LENGTH = 255
SVG_ID_HASH_LENGTH = 8
MAX_HIERARCHY_PROPS = 12  # lattice guard: 2^k blowup is capped + logged

_TRIPLE_SCHEMA = pa.schema(
    [
        ("subject_id", pa.string()),
        ("predicate", pa.string()),
        ("object_id", pa.string()),
        ("object_value", pa.string()),
    ]
)


def load_vertical_specs(data: str) -> list[dict]:
    """JSON vertical_specs → [{population_type, measured_properties,
    verticals}] (stat_var_hierarchy_generator.py:57-63)."""
    specs = []
    for spec in json.loads(data).get("specs", []):
        specs.append(
            {
                "population_type": spec.get("populationType", DEFAULT_POPULATION_TYPE),
                "measured_properties": set(spec.get("measuredProperties", [])),
                "verticals": set(spec.get("verticals", [])),
            }
        )
    return specs


# --- naming helpers (stat_var_hierarchy_generator.py:447-478) ----------------


def _capitalize(s: str) -> str:
    return s[0].upper() + s[1:] if s else s


def _split_camel_case(s: str) -> str:
    return re.sub(r"([A-Z])", r" \1", s).strip()


def _gen_name(dcid: str, dcid2name: dict[str, str]) -> str:
    return _split_camel_case(_capitalize(dcid2name.get(dcid) or dcid))


def _to_dcid_token(token: str) -> str:
    return _capitalize(re.sub("[^0-9a-zA-Z]+", "", token))


def _svg_id(poptype: str, pvs: tuple[tuple[str, str], ...], prefix: str) -> str:
    svg_id = f"{prefix}{_to_dcid_token(poptype)}"
    for prop, val in pvs:
        part = _to_dcid_token(prop)
        if val:
            part = f"{part}-{_to_dcid_token(val)}"
        svg_id = f"{svg_id}_{part}"
    if len(svg_id) > MAX_SVG_ID_LENGTH:
        suffix = hashlib.sha256(svg_id.encode()).hexdigest()[:SVG_ID_HASH_LENGTH]
        svg_id = f"{svg_id[: MAX_SVG_ID_LENGTH - SVG_ID_HASH_LENGTH - 1]}-{suffix}"
    return svg_id


def _svg_name(poptype: str, pvs, dcid2name: dict[str, str]) -> str:
    name = _gen_name(poptype, dcid2name)
    if pvs:
        parts = []
        for prop, val in pvs:
            p = _gen_name(prop, dcid2name)
            parts.append(f"{p} = {_gen_name(val, dcid2name)}" if val else p)
        name = f"{name} With {', '.join(parts)}"
    return name


# --- stage 1: SV extraction ---------------------------------------------------


def extract_svs(triples_ds, blocklist: set[str] | None = None):
    """triples Dataset → Dataset of one row per SV:
    (sv_id, population_type, measured_property, pvs_json).
    Predicate pre-filter inside map_batches, then a groupby(subject_id)
    assembly (stat_var_hierarchy_generator.py:481-531)."""
    from import_ray.core.context import ensure_hash_shuffle, npartitions

    ensure_hash_shuffle(triples_ds)
    block = blocklist or SV_HIERARCHY_PROPS_BLOCKLIST

    def prefilter(b: pa.Table) -> pa.Table:
        pred = b["predicate"]
        keep_special = pc.is_in(
            pred, value_set=pa.array(["typeOf", "populationType", "measuredProperty"])
        )
        keep_pv = pc.invert(pc.is_in(pred, value_set=pa.array(sorted(block))))
        t = b.filter(pc.or_(keep_special, keep_pv))
        obj = pc.if_else(
            pc.equal(pc.coalesce(t["object_id"], pa.scalar("")), pa.scalar("")),
            pc.coalesce(t["object_value"], pa.scalar("")),
            pc.coalesce(t["object_id"], pa.scalar("")),
        )
        out = pa.table(
            {
                "subject_id": t["subject_id"],
                "predicate": t["predicate"],
                "value": obj,
            }
        )
        return out.filter(pc.not_equal(out["value"], pa.scalar("")))

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        sv_id = df["subject_id"].iloc[0]
        is_sv = ((df["predicate"] == "typeOf") & (df["value"] == TYPE_SV)).any()
        if not is_sv:
            return pd.DataFrame(
                columns=["sv_id", "population_type", "measured_property", "pvs_json"]
            )
        poptype = DEFAULT_POPULATION_TYPE
        mprop = ""
        pvs: dict[str, str] = {}
        for p, v in zip(df["predicate"], df["value"]):
            if p == "populationType":
                poptype = v
            elif p == "measuredProperty":
                mprop = v
            elif p != "typeOf" and p not in block:
                pvs[p] = v
        return pd.DataFrame(
            {
                "sv_id": [sv_id],
                "population_type": [poptype],
                "measured_property": [mprop],
                "pvs_json": [json.dumps(sorted(pvs.items()))],
            }
        )

    from import_ray.core.context import join_safe

    # map_groups runs a SORTED hash shuffle whose finalize breaks on
    # schema-less empty blocks (which even read stages can emit under
    # memory pressure) — sanitize the (predicate-filtered, much smaller)
    # input first.
    rows = join_safe(triples_ds.map_batches(prefilter, batch_format="pyarrow"))
    return rows.groupby("subject_id", num_partitions=npartitions()).map_groups(
        assemble, batch_format="pandas"
    )


# --- stage 2: per-SV lattice expansion ---------------------------------------


def _sv_lattice(poptype: str, pvs: tuple[tuple[str, str], ...], prefix: str, dcid2name):
    """All ancestor SVG states of one SV's leaf, with parent edges.

    State = sorted tuple of (prop, val-or-"") — complete states have all
    vals; a partial state (exactly one valueless prop) parents to the
    complete state without that prop (the reference's
    ``has_prop_without_val`` alternation, lines 401-447).
    Returns ({svg_id: name}, {(child_id, parent_id)}, leaf_id).
    """
    nodes: dict[str, str] = {}
    edges: set[tuple[str, str]] = set()
    seen: set[tuple] = set()
    leaf = tuple(pvs)
    stack = [leaf]
    leaf_id = _svg_id(poptype, leaf, prefix)
    while stack:
        state = stack.pop()
        if state in seen:
            continue
        seen.add(state)
        sid = _svg_id(poptype, state, prefix)
        nodes[sid] = _svg_name(poptype, state, dcid2name)
        if not state:
            continue
        if any(not v for _, v in state):
            parents = [tuple((p, v) for p, v in state if v)]
        else:
            parents = [
                tuple((p, "" if i == j else v) for j, (p, v) in enumerate(state))
                for i in range(len(state))
            ]
        for parent in parents:
            pid = _svg_id(poptype, parent, prefix)
            edges.add((sid, pid))
            stack.append(parent)
    return nodes, edges, leaf_id


class LatticeKernel:
    """map_batches kernel over SV rows → tagged rows for the global
    dedup: kind ∈ node(s=svg_id,o=name) | edge(s=child,o=parent) |
    member(s=sv_id,o=svg_id) | pop(s=poptype_svg_id,p=poptype,o=mprop).
    The dcid→name map travels as a broadcast ObjectRef."""

    def __init__(self, prefix: str = CUSTOM_SVG_PREFIX, dcid2name_ref=None):
        self.prefix = prefix
        self._names_ref = dcid2name_ref
        self._names = None

    @property
    def names(self) -> dict:
        if self._names is None:
            import ray

            if isinstance(self._names_ref, ray.ObjectRef):
                self._names = ray.get(self._names_ref)
            else:
                self._names = self._names_ref or {}
        return self._names

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds, ss, ps, os_ = [], [], [], []

        def emit(kind, s, p="", o=""):
            kinds.append(kind)
            ss.append(s)
            ps.append(p)
            os_.append(o)

        capped = 0
        for sv_id, poptype, mprop, pvs_json in zip(
            batch["sv_id"].to_pylist(),
            batch["population_type"].to_pylist(),
            batch["measured_property"].to_pylist(),
            batch["pvs_json"].to_pylist(),
        ):
            pvs = [tuple(pv) for pv in json.loads(pvs_json)]
            if len(pvs) > MAX_HIERARCHY_PROPS:
                capped += 1
                pvs = pvs[:MAX_HIERARCHY_PROPS]
            nodes, edges, leaf_id = _sv_lattice(
                poptype, tuple(pvs), self.prefix, self.names
            )
            for sid, name in nodes.items():
                emit("node", sid, o=name)
            for child, parent in edges:
                emit("edge", child, o=parent)
            emit("member", sv_id, o=leaf_id)
            emit("pop", _svg_id(poptype, (), self.prefix), p=poptype, o=mprop)
        if capped:
            logger.warning(
                "svg_hierarchy: %d SV(s) had > %d hierarchy props; lattice truncated",
                capped,
                MAX_HIERARCHY_PROPS,
            )
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "s": pa.array(ss, pa.string()),
                "p": pa.array(ps, pa.string()),
                "o": pa.array(os_, pa.string()),
            }
        )


# --- stage 3: dedup + triple emission ----------------------------------------


def generate_svg_hierarchy(
    triples_ds,
    vertical_specs: list[dict] | None = None,
    dcid2name: dict[str, str] | None = None,
    custom_svg_prefix: str = CUSTOM_SVG_PREFIX,
    root_svg_id: str = DEFAULT_CUSTOM_ROOT_SVG_ID,
    blocklist: set[str] | None = None,
):
    """SV triples Dataset → SVG hierarchy triples Dataset
    (subject_id, predicate, object_id, object_value; "" for absent).

    One distinct-shuffle over the emitted lattice rows; the only
    driver-side step is the vertical/Root attach over the distinct
    (population type, measured property) set — schema-scale, not
    data-scale."""
    import ray
    import ray.data
    from ray.data.aggregate import Count

    from import_ray.core.context import npartitions

    from import_ray.core.context import join_safe

    # extract_svs ends in a map_groups shuffle whose empty partitions
    # emit schema-less blocks; re-block before the next keyed op
    svs = join_safe(extract_svs(triples_ds, blocklist))
    names_ref = ray.put(dcid2name or {})
    rows = svs.map_batches(
        LatticeKernel(prefix=custom_svg_prefix, dcid2name_ref=names_ref),
        batch_format="pyarrow",
    )
    distinct = (
        rows.groupby(["kind", "s", "p", "o"], num_partitions=npartitions())
        .aggregate(Count(alias_name="_n"))
        .select_columns(["kind", "s", "p", "o"])
        .materialize()
    )

    # vertical / Root attach over the tiny distinct pop rows
    from import_ray.core.context import take_all_bounded

    pop_rows = take_all_bounded(
        distinct.filter(expr="kind == 'pop'"), "svg_hierarchy: distinct pop rows"
    )
    pop_mprops: dict[str, set[str]] = {}
    pop_svg_of: dict[str, str] = {}
    for r in pop_rows:
        pop_svg_of[r["p"]] = r["s"]
        pop_mprops.setdefault(r["p"], set()).add(r["o"])

    extra = []  # (subject, predicate, object_id, object_value)
    pop_parents: dict[str, list[str]] = {}
    vertical_nodes: dict[str, str] = {}
    for spec in vertical_specs or []:
        pt = spec["population_type"]
        if pt not in pop_svg_of:
            continue
        if not (spec["measured_properties"] & (pop_mprops.get(pt) or set())):
            continue
        for vertical in sorted(spec["verticals"]):
            vid = f"{custom_svg_prefix}{vertical}"
            vertical_nodes[vid] = _gen_name(vertical, dcid2name or {})
            # overlapping vertical_specs can repeat the same
            # (population type, vertical) pair — dedup like the
            # reference's parent_svg_ids dict, since these driver-side
            # extras bypass the distinct shuffle
            parents = pop_parents.setdefault(pop_svg_of[pt], [])
            if vid not in parents:
                parents.append(vid)
    for vid, vname in sorted(vertical_nodes.items()):
        extra.append((vid, "typeOf", TYPE_SVG, ""))
        extra.append((vid, "name", "", vname))
        extra.append((vid, "specializationOf", root_svg_id, ""))
    for pt, svg_id in sorted(pop_svg_of.items()):
        parents = pop_parents.get(svg_id) or [root_svg_id]
        for parent in parents:
            extra.append((svg_id, "specializationOf", parent, ""))

    def to_triples(b: pa.Table) -> pa.Table:
        out = {"subject_id": [], "predicate": [], "object_id": [], "object_value": []}
        for kind, s, _, o in zip(
            b["kind"].to_pylist(),
            b["s"].to_pylist(),
            b["p"].to_pylist(),
            b["o"].to_pylist(),
        ):
            if kind == "node":
                out["subject_id"] += [s, s]
                out["predicate"] += ["typeOf", "name"]
                out["object_id"] += [TYPE_SVG, ""]
                out["object_value"] += ["", o]
            elif kind == "edge":
                out["subject_id"].append(s)
                out["predicate"].append("specializationOf")
                out["object_id"].append(o)
                out["object_value"].append("")
            elif kind == "member":
                out["subject_id"].append(s)
                out["predicate"].append("memberOf")
                out["object_id"].append(o)
                out["object_value"].append("")
        return pa.table(
            {k: pa.array(v, pa.string()) for k, v in out.items()},
            schema=_TRIPLE_SCHEMA,
        )

    from import_ray.core.context import join_safe

    # distinct is aggregate-derived — re-block so callers can feed the
    # result into keyed ops/joins safely
    triples = join_safe(distinct.map_batches(to_triples, batch_format="pyarrow"))
    if extra:
        extra_tbl = pa.table(
            {
                "subject_id": pa.array([e[0] for e in extra], pa.string()),
                "predicate": pa.array([e[1] for e in extra], pa.string()),
                "object_id": pa.array([e[2] for e in extra], pa.string()),
                "object_value": pa.array([e[3] for e in extra], pa.string()),
            },
            schema=_TRIPLE_SCHEMA,
        )
        triples = triples.union(ray.data.from_arrow(extra_tbl))
    return triples
