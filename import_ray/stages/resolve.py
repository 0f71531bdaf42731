"""Node resolution: local-ref fixpoint + dcid assignment + external ids.

Reimplements the reference's McfResolver
(util/src/main/java/org/datacommons/util/McfResolver.java:39-430):
alternating rounds of local-ref replacement and dcid assignment until
fixpoint; orphan refs, refs-to-failed-nodes and leftover cycles move
nodes to the ``failed`` graph with the reference's counter names.

Scope model (SURVEY.md §2.6): local ids (``l:``) only bind within one
parse scope (a file, a TMCF/CSV row, a conversation), so the fixpoint
runs **scope-locally** inside ``map_batches``/``map_groups`` after
hash-partitioning by scope — no cross-partition iteration is needed.

External-id resolution (ExternalIdResolver/PropertyResolver,
util/.../ExternalIdResolver.java:24-159, PropertyResolver.java:100-127):
offline two-tier — a broadcast curated map ``(prop, value) → dcid``
(stands in for the recon API, as the reference's tests mock it) with
fallback to the deterministic place-prefix rule
(DcidGenerator.forPlace).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from import_ray.core import vocab
from import_ray.core.model import (
    Graph,
    Node,
    ValueType,
    get_prop_val,
    get_prop_vals,
)
from import_ray.functions import dcid as dcidgen
from import_ray.sources.mcf import ParseIssue


def build_local_id_map(graph: Graph) -> dict:
    """Curated (prop, value) → dcid map from a local instance graph —
    the reference's LOCAL-resolution preload
    (ExternalIdResolver.java:126-152)."""
    m: dict = {}
    for node in graph.values():
        dcid_tvs = node.get(vocab.DCID)
        if not dcid_tvs:
            continue
        dcid_val = dcid_tvs[0][0]
        for prop in vocab.PLACE_RESOLVABLE_AND_ASSIGNABLE_IDS:
            for value, vtype in node.get(prop, []):
                if vtype in (ValueType.TEXT, ValueType.NUMBER):
                    m[(prop, value)] = dcid_val
    return m


def make_external_id_resolver(
    external_id_map: dict | None = None,
    coordinates_map: dict | None = None,
    name_map: dict | None = None,
    place_prefix_fallback: bool = True,
):
    """Returns resolve(node_id, node) -> dcid for OTHER-mode nodes.

    Resolution order mirrors the reference's resolver stack
    (ExternalIdResolver → PropertyResolver / CoordinatesResolver /
    NameResolver):

    1. ranked external-id props (Vocabulary.java:291-307) against the
       curated/broadcast map, with **diverging-dcid detection** — if two
       id props map to different dcids the node fails
       (PropertyResolver.java:149-199);
    2. (latitude, longitude) lookup (CoordinatesResolver.java:35-95);
    3. name lookup (NameResolver.java:20-57);
    4. deterministic place-prefix rule (DcidGenerator.forPlace) as the
       offline fallback.
    """
    m = external_id_map or {}
    cm = coordinates_map or {}
    nm = name_map or {}

    def resolve(node_id: str, node: Node) -> str:
        candidates: list[str] = []
        for prop in vocab.PLACE_RESOLVABLE_AND_ASSIGNABLE_IDS:
            tvs = node.get(prop)
            if not tvs:
                continue
            for value, vtype in tvs:
                if vtype in (ValueType.TEXT, ValueType.NUMBER):
                    hit = m.get((prop, value))
                    if hit:
                        candidates.append(hit)
        if candidates:
            if len(set(candidates)) > 1:
                return ""  # diverging external ids → unresolvable
            return candidates[0]
        lat = get_prop_val(node, vocab.LATITUDE)
        lng = get_prop_val(node, vocab.LONGITUDE)
        if lat and lng and cm:
            try:
                hit = cm.get((float(lat), float(lng)))
            except ValueError:
                hit = None
            if hit:
                return hit
        if nm:
            name = get_prop_val(node, vocab.NAME)
            if name:
                hit = nm.get(name)
                if hit:
                    return hit
        if place_prefix_fallback:
            return dcidgen.for_place(
                {
                    p: get_prop_val(node, p)
                    for p in vocab.PLACE_RESOLVABLE_AND_ASSIGNABLE_IDS
                }
            )
        return ""

    return resolve


@dataclass
class ResolutionResult:
    resolved: Graph = field(default_factory=dict)
    failed: Graph = field(default_factory=dict)
    issues: list = field(default_factory=list)


def _get_local_id(tv: tuple[str, int]) -> str:
    value, vtype = tv
    if vtype == ValueType.UNRESOLVED_REF and value.startswith(
        vocab.INTERNAL_REF_PREFIX
    ):
        return value[value.index(vocab.REFERENCE_DELIMITER) + 1 :]
    return ""


def _first_unresolved_ref(node: Node) -> str:
    for tvs in node.values():
        for tv in tvs:
            lid = _get_local_id(tv)
            if lid:
                return lid
    return ""


def _assignment_mode(types: list[str]) -> str:
    for t in types:
        if vocab.is_stat_var_obs(t):
            return "svobs"
        if vocab.is_population(t):
            return "population"
        if vocab.is_legacy_observation(t):
            return "legacy_obs"
    return "other"


def _single_vals(node: Node, props) -> dict[str, str] | None:
    """prop → value map; None when a key prop has multiple values."""
    out = {vocab.TYPE_OF: get_prop_val(node, vocab.TYPE_OF)}
    for p in props:
        tvs = node.get(p)
        if not tvs:
            continue
        if len(tvs) != 1:
            return None
        out[p] = tvs[0][0]
    return out


def _generate_dcid(node_id: str, node: Node, mode: str, id_resolver) -> tuple[str, str]:
    if mode == "svobs":
        vals = _single_vals(node, dcidgen.ORDERED_STAT_VAR_OBS_KEY_PROPS)
        if vals is None:
            return "", ""
        return dcidgen.for_stat_var_obs(vals)
    if mode == "population":
        return dcidgen.for_population(node_id, node)
    if mode == "legacy_obs":
        vals = _single_vals(node, dcidgen.ORDERED_LEGACY_OBS_KEY_PROPS)
        if vals is None:
            return "", ""
        return dcidgen.for_observation(vals)
    if id_resolver is not None:
        return id_resolver(node_id, node), ""
    return "", ""


def resolve_graph(graph: Graph, id_resolver=None) -> ResolutionResult:
    """Scope-local fixpoint resolution (McfResolver.resolve, java:40-128)."""
    res = ResolutionResult()
    output: Graph = {k: {p: list(tvs) for p, tvs in v.items()} for k, v in graph.items()}
    failed: Graph = {}

    def move_failed(node_id: str):
        if node_id in output:
            failed[node_id] = output.pop(node_id)

    def add_issue(counter: str, msg: str, node_id: str):
        res.issues.append(ParseIssue(counter, msg, node_id))

    round_idx = 0
    lr = {"updated": 0, "failed": set(), "needs_work": {}}
    da = {"updated": 0, "failed": set(), "needs_work": {}}
    while True:
        if round_idx == 0 or da["updated"] > 0:
            lr = _replace_local_refs(output, failed, add_issue)
            for nid in lr["failed"]:
                move_failed(nid)
        else:
            break
        if round_idx == 0 or lr["updated"] > 0:
            da = _assign_dcids(output, id_resolver, add_issue)
            for nid in da["failed"]:
                move_failed(nid)
        else:
            break
        round_idx += 1

    for nid, ref in lr["needs_work"].items():
        move_failed(nid)
        add_issue(
            "Resolution_IrreplaceableLocalRef",
            f"Unable to replace a local reference :: ref: '{ref}', node: '{nid}'",
            nid,
        )
    for nid, ref in da["needs_work"].items():
        move_failed(nid)
        add_issue(
            "Resolution_UnassignableNodeDcid",
            f"Unable to assign DCID due to unresolved local reference :: "
            f"ref: '{ref}', node: '{nid}'",
            nid,
        )
    res.resolved = output
    res.failed = failed
    return res


def _replace_local_refs(output: Graph, failed: Graph, add_issue) -> dict:
    rr = {"updated": 0, "failed": set(), "needs_work": {}}
    snapshot_dcids = {
        nid: get_prop_val(node, vocab.DCID) for nid, node in output.items()
    }
    failed_ids = set(failed)
    for nid in list(output):
        node = output[nid]
        for prop, tvs in node.items():
            for i, tv in enumerate(tvs):
                lid = _get_local_id(tv)
                if not lid:
                    continue
                if lid not in snapshot_dcids and lid not in failed_ids:
                    add_issue(
                        f"Resolution_OrphanLocalReference_{prop}",
                        f"Found orphan local ref :: ref: '{tv[0]}', property: "
                        f"'{prop}', node: '{nid}'",
                        nid,
                    )
                    rr["failed"].add(nid)
                elif lid in snapshot_dcids:
                    dcid_val = snapshot_dcids[lid]
                    if dcid_val:
                        rr["updated"] += 1
                        tvs[i] = (dcid_val, ValueType.RESOLVED_REF)
                    else:
                        rr["needs_work"][nid] = lid
                else:
                    add_issue(
                        f"Resolution_ReferenceToFailedNode_{prop}",
                        f"Found a local ref to an unresolvable node :: ref: "
                        f"'{tv[0]}', property: '{prop}', node: '{nid}'",
                        nid,
                    )
                    rr["failed"].add(nid)
    return rr


def _assign_dcids(output: Graph, id_resolver, add_issue) -> dict:
    rr = {"updated": 0, "failed": set(), "needs_work": {}}
    for nid in list(output):
        node = output[nid]
        if get_prop_val(node, vocab.DCID):
            continue
        unresolved = _first_unresolved_ref(node)
        types = get_prop_vals(node, vocab.TYPE_OF)
        mode = _assignment_mode(types)
        if unresolved and mode != "other":
            rr["needs_work"][nid] = unresolved
            continue
        dcid_val, key_string = _generate_dcid(nid, node, mode, id_resolver)
        if dcid_val:
            rr["updated"] += 1
            if key_string:
                node[vocab.KEY_STRING] = [(key_string, ValueType.TEXT)]
            node[vocab.DCID] = [(dcid_val, ValueType.TEXT)]
        else:
            type0 = types[0] if types else ""
            add_issue(
                f"Resolution_DcidAssignmentFailure_{type0}",
                f"Failed to assign DCID :: type: '{type0}', node: '{nid}'",
                nid,
            )
            rr["failed"].add(nid)
    return rr
