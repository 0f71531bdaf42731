"""Batched existence-check protocol (ExistenceChecker.java:20-313):
submit/drain batching, retry-split, local caches, counters."""

from __future__ import annotations

from import_ray.state.existence import ExistenceChecker, known_dcids_fetch


class Recorder:
    """Transport spy: records call shapes; delegates to a known set."""

    def __init__(self, known=(), fail_batches=False):
        self.calls: list[tuple[int, str]] = []
        self.known = set(known)
        self.fail_batches = fail_batches
        self._inner = known_dcids_fetch(self.known)

    def __call__(self, subs, pred):
        self.calls.append((len(subs), pred))
        if self.fail_batches and len(subs) > 1:
            return None
        return self._inner(subs, pred)


def collect_cb(log):
    def cb(counter, message):
        log.append(counter)

    return cb


def test_batching_drains_at_subject_limit():
    rec = Recorder(known={"n0", "n1", "n2", "n3", "n4"})
    ck = ExistenceChecker(rec, batch_limit=3)
    log: list = []
    for i in range(5):
        ck.submit_node_check(f"n{i}", collect_cb(log))
    # 3 distinct subjects on 'typeOf' → auto-drain at the limit
    assert rec.calls == [(3, "typeOf")]
    ck.drain_remote_calls()
    assert rec.calls == [(3, "typeOf"), (2, "typeOf")]
    assert log == []  # all known → no missing
    assert ck.counters.counts[("LEVEL_INFO", "Existence_NumChecks")] == 5
    assert ck.counters.counts[("LEVEL_INFO", "Existence_NumDcCalls")] == 2


def test_max_pending_drains_everything():
    rec = Recorder(known={"a", "b"})
    ck = ExistenceChecker(rec, batch_limit=100, max_pending=3)
    log: list = []
    ck.submit_triple_check("a", "subClassOf", "Thing", collect_cb(log))
    ck.submit_triple_check("b", "rangeIncludes", "Text", collect_cb(log))
    assert rec.calls == []
    ck.submit_node_check("a", collect_cb(log))
    # 3 pending ≥ max_pending → full drain across predicates
    assert sorted(p for _, p in rec.calls) == ["rangeIncludes", "subClassOf", "typeOf"]


def test_retry_split_on_failed_batch():
    rec = Recorder(known={"x"}, fail_batches=True)
    ck = ExistenceChecker(rec, batch_limit=100)
    log: list = []
    ck.submit_node_check("x", collect_cb(log))
    ck.submit_node_check("y", collect_cb(log))
    ck.drain_remote_calls()
    # one failed batch of 2 → two independent single-subject calls
    assert rec.calls == [(2, "typeOf"), (1, "typeOf"), (1, "typeOf")]
    # x known → ok; y unknown → missing reference
    assert log == ["Existence_MissingReference"]
    assert ck.counters.counts[("LEVEL_INFO", "Existence_NumDcCalls")] == 3


def test_single_subject_failure_logs_failed_call():
    def always_fail(subs, pred):
        return None

    ck = ExistenceChecker(always_fail, batch_limit=100)
    log: list = []
    ck.submit_node_check("solo", collect_cb(log))
    ck.drain_remote_calls()
    assert log == ["Existence_FailedDcCall"]


def test_local_caches_prevent_recalls():
    rec = Recorder(known={"hit"})
    ck = ExistenceChecker(rec, batch_limit=100)
    log: list = []
    ck.submit_node_check("hit", collect_cb(log))
    ck.submit_node_check("miss", collect_cb(log))
    ck.drain_remote_calls()
    n_calls = len(rec.calls)
    # repeat: both answered from the existence/absence caches
    ck.submit_node_check("hit", collect_cb(log))
    ck.submit_node_check("miss", collect_cb(log))
    ck.drain_remote_calls()
    assert len(rec.calls) == n_calls
    assert log == ["Existence_MissingReference", "Existence_MissingReference"]


def test_domain_includes_skips_schemaless():
    rec = Recorder()
    ck = ExistenceChecker(rec, batch_limit=100)
    log: list = []
    ck.submit_triple_check("some/prop", "domainIncludes", "Thing", collect_cb(log))
    ck.submit_triple_check("count", "domainIncludes", "Thing", collect_cb(log))
    ck.drain_remote_calls()
    assert rec.calls == [] and log == []
    assert ("LEVEL_INFO", "Existence_NumChecks") not in ck.counters.counts


def test_local_graph_registration_and_triples():
    rec = Recorder()
    ck = ExistenceChecker(rec, batch_limit=100)
    ck.add_local_node(
        "myProp", "Property", {"domainIncludes": ["Thing"], "name": ["x"]}
    )
    log: list = []
    ck.submit_node_check("myProp", collect_cb(log))
    ck.submit_triple_check("myProp", "domainIncludes", "Thing", collect_cb(log))
    ck.drain_remote_calls()
    assert rec.calls == [] and log == []  # fully answered locally


def test_known_triples_transport():
    fetch = known_dcids_fetch(
        {"Person"}, known_triples={("age", "rangeIncludes", "Number")}
    )
    ck = ExistenceChecker(fetch, batch_limit=100)
    log: list = []
    ck.submit_triple_check("age", "rangeIncludes", "Number", collect_cb(log))
    ck.submit_triple_check("age", "rangeIncludes", "Text", collect_cb(log))
    ck.drain_remote_calls()
    assert log == ["Existence_MissingTriple"]


def test_node_checker_routes_through_batched_protocol():
    """NodeChecker(existence=...) submits reference checks through the
    batched protocol; missing refs surface as Existence_MissingReference
    counters after drain, and the transport is called in batches."""
    from import_ray.sources.mcf import parse_mcf_string
    from import_ray.stages.check import NodeChecker
    from import_ray.state.counters import CounterSet

    rec = Recorder(known={"Count_Person", "geoId/06"})
    counters = CounterSet()
    ck = ExistenceChecker(rec, batch_limit=100)
    checker = NodeChecker(counters=counters, existence=ck)
    res = parse_mcf_string(
        "Node: obs1\n"
        "typeOf: dcs:StatVarObservation\n"
        "variableMeasured: dcs:Count_Person\n"
        "observationAbout: dcid:geoId/06\n"
        "observationDate: \"2020\"\n"
        "value: 42\n"
        "\n"
        "Node: obs2\n"
        "typeOf: dcs:StatVarObservation\n"
        "variableMeasured: dcs:NoSuchVariable\n"
        "observationAbout: dcid:geoId/06\n"
        "observationDate: \"2020\"\n"
        "value: 7\n"
    )
    for node_id, node in res.graph.items():
        checker.check_node(node_id, node)
    ck.drain_remote_calls()
    missing = {
        c: n for (lvl, c), n in counters.counts.items() if c.startswith("Existence_")
    }
    assert missing == {"Existence_MissingReference_variableMeasured": 1}
    # batched: one typeOf call covered all distinct subjects
    assert [p for _, p in rec.calls] == ["typeOf"]
