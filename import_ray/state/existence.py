"""Batched existence checking with the reference's submit/drain +
retry-split protocol (util/.../ExistenceChecker.java:20-313).

The sandbox has no network, so the transport is INJECTED: a callable
``fetch(subjects, predicate) -> dict | None`` with the DC API response
shape ``{subject: {"out": [{"dcid": ...}, ...]}}`` (ApiHelper
.fetchPropertyValues semantics). Production plugs an HTTP client;
tests (and the offline engine default) plug a lookup over a known-dcid
set — the protocol (batching thresholds, drain triggers, retry-split
on failures, local existence/absence caches, counters) is what this
module implements faithfully:

- checks batch per PREDICATE, keyed sub → obj → pending callbacks;
- a predicate drains when it accumulates ``DC_CALL_BATCH_LIMIT``
  (=1000) distinct subjects; everything drains at ``MAX_PENDING_CALLS``
  (=100000) total pending checks (ExistenceChecker.java:28-29,166-182);
- a failed multi-subject call RETRY-SPLITS into one call per subject;
  a failed single-subject call logs ``Existence_FailedDcCall``
  (ExistenceChecker.java:196-221);
- ``domainIncludes`` checks are skipped for schema-less properties
  (subject contains "/" or equals "count") (java:73-78);
- results populate existing/missing caches so repeat checks never
  re-issue calls (checkLocal, java:282-294).

Ray placement: one checker per map_batches ACTOR (state in
``__init__``), mirroring the reference's per-process checker; counters
merge through the engine CounterSet like all other stages.
"""

from __future__ import annotations

from collections.abc import Callable

DC_CALL_BATCH_LIMIT = 1000
MAX_PENDING_CALLS = 100_000

SCHEMA_PROPERTIES = {"domainIncludes", "rangeIncludes", "subClassOf"}

_SVOBS_TYPES = {"StatVarObservation", "Observation"}


def _make_key(s: str, p: str, o: str) -> str:
    return s if not o else f"{s},{p},{o}"


class ExistenceChecker:
    def __init__(
        self,
        fetch: Callable[[list[str], str], dict | None],
        counters=None,
        batch_limit: int = DC_CALL_BATCH_LIMIT,
        max_pending: int = MAX_PENDING_CALLS,
    ):
        from import_ray.state.counters import CounterSet

        self.fetch = fetch
        self.counters = counters if counters is not None else CounterSet()
        self.batch_limit = batch_limit
        self.max_pending = max_pending
        self.existing: set[str] = set()
        self.missing: set[str] = set()
        # pred -> sub -> obj -> [callbacks]
        self._batch: dict[str, dict[str, dict[str, list]]] = {}
        self._pending = 0

    # --- local KG state (addLocalGraph, java:88-122) ----------------------
    def add_local_node(self, dcid: str, type_of: str = "", schema_pvs=None) -> None:
        """Register a locally-defined node (and, for Class/Property
        nodes, its schema triples) as existing."""
        if not dcid or type_of in _SVOBS_TYPES:
            return
        self.existing.add(dcid)
        self.missing.discard(dcid)
        if type_of in ("Class", "Property"):
            for prop, values in (schema_pvs or {}).items():
                if prop in SCHEMA_PROPERTIES:
                    for v in values:
                        key = _make_key(dcid, prop, v)
                        self.existing.add(key)
                        self.missing.discard(key)

    # --- submit (java:63-86) ----------------------------------------------
    def submit_node_check(self, node: str, callback) -> None:
        self.counters.add("LEVEL_INFO", "Existence_NumChecks", n=1)
        if self._check_local(node, "typeOf", "", callback):
            return
        assert node
        self._batch_remote(node, "typeOf", "", callback)

    def submit_triple_check(self, sub: str, pred: str, obj: str, callback) -> None:
        if pred == "domainIncludes" and ("/" in sub or sub == "count"):
            # schema-less properties / set-level aggregates (java:73-78)
            return
        self.counters.add("LEVEL_INFO", "Existence_NumChecks", n=1)
        if self._check_local(sub, pred, obj, callback):
            return
        assert sub
        self._batch_remote(sub, pred, obj, callback)

    # --- drain (java:124-182) ----------------------------------------------
    def drain_remote_calls(self) -> None:
        for pred in list(self._batch):
            self._drain_predicate(pred, self._batch[pred])
            self._batch.pop(pred, None)

    def _batch_remote(self, sub: str, pred: str, obj: str, callback) -> None:
        sub_map = self._batch.setdefault(pred, {})
        sub_map.setdefault(sub, {}).setdefault(obj, []).append(callback)
        self._pending += 1
        if self._pending >= self.max_pending:
            self.drain_remote_calls()
        elif len(sub_map) >= self.batch_limit:
            self._drain_predicate(pred, sub_map)
            self._batch.pop(pred, None)

    def _drain_predicate(self, pred: str, sub_map: dict) -> None:
        self._perform_call(pred, list(sub_map.keys()), sub_map)

    # --- the call + retry-split (java:190-261) ------------------------------
    def _perform_call(self, pred: str, subs: list[str], sub_map: dict) -> None:
        self.counters.add("LEVEL_INFO", "Existence_NumDcCalls", n=1)
        data = self.fetch(subs, pred)

        if data is None:
            if len(subs) == 1:
                sub = subs[0]
                obj_map = sub_map.get(sub, {})
                for cbs in obj_map.values():
                    for cb in cbs:
                        cb("Existence_FailedDcCall", "Failed DC Call")
                    self._pending -= len(cbs)
                sub_map.pop(sub, None)
                return
            # bad dcid / URI too long → issue independent calls
            for sub in list(subs):
                self._perform_call(pred, [sub], sub_map)
            return

        if len(data) != len(subs):
            raise IOError(
                f"Invalid results payload for {subs!r}, {pred!r}: {data!r}"
            )

        for sub, node_json in data.items():
            obj_map = sub_map.get(sub, {})
            out = node_json.get("out", []) if isinstance(node_json, dict) else []
            out_dcids = {
                d.get("dcid") for d in out if isinstance(d, dict)
            }
            for obj, cbs in obj_map.items():
                key = _make_key(sub, pred, obj)
                ok = bool(out) if not obj else obj in out_dcids
                if ok:
                    self.existing.add(key)
                else:
                    self.missing.add(key)
                    for cb in cbs:
                        self._log_missing(cb, obj)
                self._pending -= len(cbs)
            sub_map.pop(sub, None)

    # --- local cache (java:282-294) -----------------------------------------
    def _check_local(self, sub: str, pred: str, obj: str, callback) -> bool:
        key = _make_key(sub, pred, obj)
        if key in self.existing:
            return True
        if key in self.missing:
            self._log_missing(callback, obj)
            return True
        return False

    def _log_missing(self, callback, obj: str) -> None:
        if not obj:
            callback("Existence_MissingReference", "Failed reference existence check")
        else:
            callback("Existence_MissingTriple", "Failed triple existence check")


def known_dcids_fetch(
    known: set[str], known_triples: set[tuple] | None = None
) -> Callable[[list[str], str], dict]:
    """Offline transport over known dcids (+ optional known (s, p, o)
    schema triples) — the engine's stand-in for the DC API (same
    semi-join semantics the lint path uses). Node checks succeed iff
    the subject is known; triple checks iff the exact triple is known."""
    by_sub_pred: dict[tuple, list] = {}
    for ts, tp, to in known_triples or set():
        by_sub_pred.setdefault((ts, tp), []).append({"dcid": to})

    def fetch(subs: list[str], pred: str) -> dict:
        out = {}
        for s in subs:
            dcids = list(by_sub_pred.get((s, pred), []))
            if s in known:
                dcids.append({"dcid": s})
            out[s] = {"out": dcids}
        return out

    return fetch
