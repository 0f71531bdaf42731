"""Lint + fataltmcf golden parity against the reference tool's
report.json counters (LintTest.java:1-87, GenMcfTest fataltmcf).

Comparison covers every counter EXCEPT the network-dependent ones
(``Existence_*`` / ``API_*`` from DC API calls and the
``Num*Successes`` INFO counters whose values depend on existence
results) — this engine is offline by design (SURVEY §2.5)."""

from __future__ import annotations

import glob
import json
import re

import pytest

LINT = "/root/reference/tool/src/test/resources/org/datacommons/tool/lint"
GENMCF = "/root/reference/tool/src/test/resources/org/datacommons/tool/genmcf"


def golden_counters(path: str) -> dict:
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        # some goldens contain bare backslashes in messages
        d = json.loads(re.sub(r'\\(?!["\\/bfnrtu])', r"\\\\", raw))
    return {
        (lvl, c): int(n)
        for lvl, v in d["levelSummary"].items()
        for c, n in v["counters"].items()
    }


def drop_network(counts: dict) -> dict:
    from import_ray.pipelines.lint import NETWORK_COUNTER_PREFIXES

    return {
        k: v for k, v in counts.items() if not k[1].startswith(NETWORK_COUNTER_PREFIXES)
    }


@pytest.mark.parametrize("case", ["mcfonly", "nocsv", "allfiletypes", "statchecks"])
def test_lint_counters_match_golden(ray_session, case):
    from import_ray.pipelines.lint import lint_files

    paths = sorted(glob.glob(f"{LINT}/{case}/input/*"))
    got = drop_network(dict(lint_files(paths).counts))
    want = drop_network(golden_counters(f"{LINT}/{case}/output/report.json"))
    assert got == want


def test_fataltmcf_counters_match_golden():
    from import_ray.pipelines.genmcf import tmcf_pre_check
    from import_ray.state.counters import CounterSet

    base = f"{GENMCF}/fataltmcf"
    cs = CounterSet()
    ok = tmcf_pre_check(
        f"{base}/input/FatalTmcf.tmcf", f"{base}/input/FatalTmcf.csv", cs
    )
    assert not ok
    assert dict(cs.counts) == golden_counters(f"{base}/output/report.json")


def test_fataltmcf_genmcf_run_emits_no_nodes(ray_session, tmp_path):
    from import_ray.pipelines.genmcf import genmcf_run
    from import_ray.state.counters import LEVEL_FATAL

    base = f"{GENMCF}/fataltmcf"
    nodes, counters = genmcf_run(
        f"{base}/input/FatalTmcf.tmcf",
        f"{base}/input/FatalTmcf.csv",
        str(tmp_path / "nodes"),
        report_path=str(tmp_path / "report.json"),
    )
    assert nodes.count() == 0
    assert counters.level_counters(LEVEL_FATAL) == {"CSV_TmcfCheckFailure": 1}
