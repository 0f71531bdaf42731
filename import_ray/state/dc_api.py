"""HTTP transports for the DC API protocols — the production side of
the injectable-transport seams in ``state/existence.py`` (node
property-values fetch) and ``stages/resolve.py`` (resolve).

Wire shapes follow the reference clients exactly:

* node fetch (``util/.../ApiHelper.java:22-127``): POST
  ``{api_root}/v2/node`` with ``{"nodes": [...], "property":
  "->{pred}", "nextToken"?}``; pages merge until ``nextToken`` is
  empty; the paged ``{"data": {node: {"arcs": {pred: {"nodes":
  [...]}}}}}`` response converts to the legacy per-subject
  ``{node: {"out": [{"dcid"/"value": ...}]}}`` map that
  ``ExistenceChecker`` consumes.
* resolve (``util/.../ReconClient.java:28-100``): POST
  ``{api_root}/v2/resolve`` with ``{"nodes": [...], "property":
  ...}``, chunked at 500 nodes per call (DEFAULT_CHUNK_SIZE), merging
  the ``entities`` lists.
* retry policy (``ApiHelper.java:25-90``): up to 3 retries on
  transport errors with exponential backoff 1s → 8s cap.

The sandbox has no network, so these are tested against an in-process
``http.server`` mock (tests/test_dc_api_http.py); the offline engine
default remains the known-dcid lookup transport.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

MAX_RETRIES = 3  # ApiHelper.java:26
INITIAL_RETRY_DELAY_SECONDS = 1.0  # ApiHelper.java:27
MAX_RETRY_DELAY_SECONDS = 8.0  # ApiHelper.java:28
RESOLVE_CHUNK_SIZE = 500  # ReconClient.java:31


def _post_json(
    url: str,
    payload: dict,
    api_key: str = "",
    timeout: float = 30.0,
    max_retries: int = MAX_RETRIES,
    sleep=time.sleep,
):
    """POST JSON with the reference's retry policy; returns the parsed
    response dict, or None after exhausting retries."""
    body = json.dumps(payload).encode()
    headers = {"accept": "application/json", "content-type": "application/json"}
    if api_key:
        headers["x-api-key"] = api_key  # ApiHelper.java:126
    delay = INITIAL_RETRY_DELAY_SECONDS
    for attempt in range(max_retries + 1):
        try:
            req = urllib.request.Request(url, data=body, headers=headers)
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return json.loads(resp.read().decode())
        except (urllib.error.URLError, OSError, json.JSONDecodeError):
            if attempt == max_retries:
                return None
            sleep(delay)
            delay = min(delay * 2, MAX_RETRY_DELAY_SECONDS)
    return None


def http_node_fetch(
    api_root: str,
    api_key: str = "",
    timeout: float = 30.0,
    max_retries: int = MAX_RETRIES,
    sleep=time.sleep,
):
    """Transport for ``ExistenceChecker(fetch=...)``: paginated
    ``/v2/node`` property-values fetch, legacy-format result
    (``{subject: {"out": [{"dcid"/"value": ...}, ...]}}``), None on
    failure (which triggers the checker's retry-split)."""

    def fetch(subs: list[str], pred: str) -> dict | None:
        # every requested node gets an entry (empty "out" when absent)
        # — required by ExistenceChecker (ApiHelper.java:146-149)
        merged: dict[str, dict] = {s: {"out": []} for s in subs}
        next_token = ""
        while True:
            payload = {"nodes": list(subs), "property": f"->{pred}"}
            if next_token:
                payload["nextToken"] = next_token
            page = _post_json(
                f"{api_root}/v2/node",
                payload,
                api_key=api_key,
                timeout=timeout,
                max_retries=max_retries,
                sleep=sleep,
            )
            if page is None or page.get("data") is None:
                return None
            for node, nd in (page.get("data") or {}).items():
                arcs = (nd or {}).get("arcs") or {}
                nodes = (arcs.get(pred) or {}).get("nodes") or []
                if nodes:
                    merged.setdefault(node, {}).setdefault("out", []).extend(nodes)
            next_token = page.get("nextToken") or ""
            if not next_token:
                break
        return merged

    return fetch


def http_resolve(
    api_root: str,
    api_key: str = "",
    chunk_size: int = RESOLVE_CHUNK_SIZE,
    timeout: float = 30.0,
    max_retries: int = MAX_RETRIES,
    sleep=time.sleep,
):
    """Transport mirroring ``ReconClient.resolve``: chunked
    ``/v2/resolve`` calls, merged ``{"entities": [...]}`` response;
    raises RuntimeError when a chunk fails (ReconClient.java:55)."""

    def resolve(nodes: list[str], property: str) -> dict:
        if not nodes:
            return {"entities": []}
        entities: list = []
        for i in range(0, len(nodes), chunk_size):
            chunk = nodes[i : i + chunk_size]
            resp = _post_json(
                f"{api_root}/v2/resolve",
                {"nodes": chunk, "property": property},
                api_key=api_key,
                timeout=timeout,
                max_retries=max_retries,
                sleep=sleep,
            )
            if resp is None:
                raise RuntimeError("Error resolving nodes.")
            entities.extend(resp.get("entities") or [])
        return {"entities": entities}

    return resolve
