"""Regression guard: pipelines must work when the driver's cwd is NOT
the repo (Ray ships the package by value; lazy `import import_ray...`
inside worker kernels breaks there — caught three times this round)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import sys; sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
import __ray_entry__ as E
n = E.entry().count()
assert n > 0, n
# exercise the worker-heavy kernels most prone to lazy-import breakage
from import_ray.pipelines.genmcf import genmcf_table_ds
base = "/root/reference/tool/src/test/resources/org/datacommons/tool/genmcf/statchecks"
import os.path
if os.path.isdir(base):
    rows = genmcf_table_ds(base + "/input/covid.tmcf", base + "/input/covid.csv",
                           external_id_map={{}}).take_all()
    assert rows
print("OFFREPO_OK", n)
ray.shutdown()
"""


def test_pipelines_run_from_non_repo_cwd(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=REPO)],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "OFFREPO_OK" in proc.stdout, proc.stdout[-2000:] + proc.stderr[-2000:]
