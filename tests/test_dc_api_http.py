"""HTTP transports against an in-process mock DC API server:
pagination, retry/backoff, retry-split integration with the
ExistenceChecker protocol, and chunked resolve."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer


class _MockDcApi(BaseHTTPRequestHandler):
    # class-level knobs set per test
    known = {}  # subject -> list of {"dcid": ...}
    fail_first_n = 0  # respond 500 to this many requests, then succeed
    page_size = 100  # subjects per /v2/node response page
    calls = []  # recorded (path, payload, headers) tuples

    def do_POST(self):
        cls = type(self)
        length = int(self.headers.get("content-length", 0))
        payload = json.loads(self.rfile.read(length).decode())
        cls.calls.append((self.path, payload, dict(self.headers)))
        if cls.fail_first_n > 0:
            cls.fail_first_n -= 1
            self.send_response(500)
            self.end_headers()
            return
        if self.path == "/v2/node":
            prop = payload["property"].removeprefix("->")
            nodes = payload["nodes"]
            start = int(payload.get("nextToken") or 0)
            page = nodes[start : start + cls.page_size]
            data = {}
            for n in page:
                if n in cls.known:
                    data[n] = {"arcs": {prop: {"nodes": cls.known[n]}}}
            out = {"data": data}
            if start + cls.page_size < len(nodes):
                out["nextToken"] = str(start + cls.page_size)
            body = json.dumps(out).encode()
        elif self.path == "/v2/resolve":
            ents = [
                {"node": n, "candidates": [{"dcid": f"dcid:{n}"}]}
                for n in payload["nodes"]
            ]
            body = json.dumps({"entities": ents}).encode()
        else:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("content-type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


def _serve():
    srv = HTTPServer(("127.0.0.1", 0), _MockDcApi)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_port}"


def _reset(known=None, fail_first_n=0, page_size=100):
    _MockDcApi.known = known or {}
    _MockDcApi.fail_first_n = fail_first_n
    _MockDcApi.page_size = page_size
    _MockDcApi.calls = []


def test_node_fetch_legacy_format_and_pagination():
    from import_ray.state.dc_api import http_node_fetch

    srv, root = _serve()
    try:
        _reset(
            known={f"n{i}": [{"dcid": f"n{i}"}] for i in range(7)},
            page_size=3,
        )
        fetch = http_node_fetch(root, api_key="k123")
        out = fetch([f"n{i}" for i in range(7)] + ["missing"], "typeOf")
        # every requested node has an entry, empty "out" when absent
        assert set(out) == {f"n{i}" for i in range(7)} | {"missing"}
        assert out["n0"] == {"out": [{"dcid": "n0"}]}
        assert out["missing"] == {"out": []}
        # 3 pages of 3/3/2 subjects → 3 calls, api key on each
        assert len(_MockDcApi.calls) == 3
        assert all(
            {k.lower(): v for k, v in h.items()}.get("x-api-key") == "k123"
            for _, _, h in _MockDcApi.calls
        )
    finally:
        srv.shutdown()


def test_node_fetch_retries_then_succeeds_and_exhausts():
    from import_ray.state.dc_api import http_node_fetch

    srv, root = _serve()
    try:
        naps = []
        _reset(known={"a": [{"dcid": "a"}]}, fail_first_n=2)
        fetch = http_node_fetch(root, max_retries=3, sleep=naps.append)
        assert fetch(["a"], "typeOf") == {"a": {"out": [{"dcid": "a"}]}}
        assert naps == [1.0, 2.0]  # exponential backoff per ApiHelper
        _reset(known={"a": [{"dcid": "a"}]}, fail_first_n=10)
        assert fetch(["a"], "typeOf") is None  # retries exhausted → None
    finally:
        srv.shutdown()


def test_existence_checker_over_http_transport():
    """The batched submit/drain protocol driving the REAL HTTP client
    against the mock server — the offline/online split is a config
    choice, not a code gap."""
    from import_ray.state.dc_api import http_node_fetch
    from import_ray.state.existence import ExistenceChecker

    srv, root = _serve()
    try:
        _reset(known={"geoId/06": [{"dcid": "geoId/06"}]})
        chk = ExistenceChecker(fetch=http_node_fetch(root))
        log = []  # callbacks fire ONLY on missing/failure

        def cb(tag):
            return lambda counter, message: log.append((tag, counter))

        chk.submit_node_check("geoId/06", cb("a"))
        chk.submit_node_check("geoId/99x", cb("b"))
        chk.drain_remote_calls()
        assert log == [("b", "Existence_MissingReference")]
        assert "geoId/06" in chk.existing and "geoId/99x" in chk.missing
        # caches: repeat checks issue no further HTTP calls
        before = len(_MockDcApi.calls)
        chk.submit_node_check("geoId/06", cb("c"))
        chk.submit_node_check("geoId/99x", cb("d"))
        chk.drain_remote_calls()
        assert len(_MockDcApi.calls) == before
        assert log == [
            ("b", "Existence_MissingReference"),
            ("d", "Existence_MissingReference"),
        ]
    finally:
        srv.shutdown()


def test_existence_checker_retry_split_on_http_failure():
    """A failing multi-subject call retry-splits into per-subject calls
    (ExistenceChecker.java:196-221) through the real transport."""
    from import_ray.state.dc_api import http_node_fetch
    from import_ray.state.existence import ExistenceChecker

    srv, root = _serve()
    try:
        _reset(known={"x": [{"dcid": "x"}], "y": [{"dcid": "y"}]}, fail_first_n=4)
        # transport gives up immediately (max_retries=0) so the checker's
        # own retry-split logic is what recovers
        chk = ExistenceChecker(fetch=http_node_fetch(root, max_retries=0))
        log = []
        chk.submit_node_check("x", lambda counter, msg: log.append(("x", counter)))
        chk.submit_node_check("y", lambda counter, msg: log.append(("y", counter)))
        chk.drain_remote_calls()
        # batch call failed (req 1) → retry-split into per-subject
        # calls (reqs 2, 3), which also fail → each callback fires
        # with Existence_FailedDcCall; 3 HTTP calls total
        assert sorted(log) == [
            ("x", "Existence_FailedDcCall"),
            ("y", "Existence_FailedDcCall"),
        ]
        assert chk.counters.counter("Existence_NumDcCalls") == 3
    finally:
        srv.shutdown()


def test_http_resolve_chunking():
    from import_ray.state.dc_api import http_resolve

    srv, root = _serve()
    try:
        _reset()
        resolve = http_resolve(root, chunk_size=4)
        nodes = [f"p{i}" for i in range(10)]
        out = resolve(nodes, "<-description->dcid")
        assert [e["node"] for e in out["entities"]] == nodes
        assert len([c for c in _MockDcApi.calls if c[0] == "/v2/resolve"]) == 3
        assert resolve([], "x") == {"entities": []}
    finally:
        srv.shutdown()
