"""Benchmark harness.

Headline: flagship transcripts→triples KG pipeline (deterministic
synthetic transcripts scaled to $GRAFT_SF_DIR) — wall seconds and
triples/sec. Also times representative operator pipelines from
``__ray_entry__.queries()``.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "triples": N,
   "triples_per_sec": N, "machine": {...}}

``machine`` carries single-thread matmul probe times and /proc
load averages sampled at start / after-headline / end, so a
session-level slowdown (this VM's hypervisor throttles 1.4-2x across
sessions) is attributable from the artifact alone: comparable probe
values across rounds = comparable machine; slower probes = VM-state
drift, not a code regression.

``--scaling``: reruns the headline in fresh processes at 8 and 32 CPUs
on the same input and reports both throughputs + scaling efficiency.

``--cold``: one PROCESS-FRESH pass of the headline + 5 representative
queries with NO warm passes (fresh Ray session, cold actor pools /
shuffle aggregators / read planning), so the fixed costs that the warm
min-of-2 methodology amortizes are visible per query. Recorded next to
the warm numbers in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "events_daily_counts",
    "dedup_exact_docs",
    "token_stats_docs",
    "minhash_dedup_docs",
    "simhash_pairs_docs",
    "ngram_jaccard_docs",
    "embedding_neardup_pairs",
    "knn_cosine",
    "q4_order_priority",
    "q12_priority_by_returnflag",
    "price_percentiles_by_flag",
    "distinct_users_by_type",
    "purchase_click_window",
    "hll_distinct_users",
    "pii_redact_planted",
    "customer_order_gaps",
    "segment_dedup_docs",
    "q10_returned_items",
    "q21_sole_return_suppliers",
    "knn_cosine_int8",
    "ntile_customers",
    "first_last_touch",
    "top_event_per_user",
    "topn_orders_per_customer",
    "profile_orders",
    "top_terms_per_doc",
    "q2_min_cost_supplier",
    "q9_profit_by_nation_year",
    "q11_important_parts",
    "q20_dominant_part_suppliers",
    "inverted_index_docs",
    "token_pairs_docs",
    "entity_resolution_planted",
    "lm_perplexity_docs",
    "semdedup_docs",
    "dsir_select_docs",
    "incremental_dedup_docs",
    "funnel_events",
    "cohort_retention",
    "event_transitions",
    "orders_price_histogram",
    "pca_embeddings",
    "corr_price_quantity",
    "events_gapfill_daily",
    "events_moving_7d_sum",
    "user_activity_trend",
    "user_event_paths",
    "conv_dedup_exact",
    "source_token_cosine",
    "vocab_stats_by_source",
    "mixture_weights_by_source",
    "regr_orders_by_priority",
    "user_skew_profile",
    "kg_triples_planted",
    "rdfs_types_planted",
    "sameas_canonical_planted",
    "bigram_next_topk_docs",
    "cms_heavy_hitter_users",
    "ddsketch_price_quantiles",
    "media_jpeg_features",
    "q6_from_orc",
    "events_daily_from_jsonl",
    "expectations_orders",
    "ivfpq_knn_planted",
    "harmonic_star_planted",
]


def _consume(res) -> int:
    """Execute a lazy result and return its row count without collecting."""
    import pandas as pd

    if isinstance(res, pd.DataFrame):
        return len(res)
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.num_rows
    except ImportError:
        pass
    return res.count()


def _probe_point(tag: str) -> dict:
    """Single-thread matmul probe + load average: machine-state
    evidence embedded in the bench artifact (see module docstring)."""
    import numpy as np

    t0 = time.time()
    a = np.random.rand(2000, 2000)
    for _ in range(3):
        a @ a
    la = os.getloadavg() if hasattr(os, "getloadavg") else (0.0, 0.0, 0.0)
    return {
        "tag": tag,
        "probe_sec": round(time.time() - t0, 2),
        "loadavg_1m": round(la[0], 2),
    }


def run_bench() -> dict:
    import ray

    machine = [_probe_point("start")]

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as E

    from import_ray.pipelines.kg import build_triples
    from import_ray.sources.transcripts import ensure_transcripts

    # ---- headline: KG pipeline -------------------------------------------
    scaling_workload = os.environ.get("BENCH_WORKLOAD") == "scaling"
    if scaling_workload:
        # larger input + broadcast dedup (the 100TB-shaped strategy:
        # only 32-byte keys shuffle, wide rows never move). 12× the
        # sf0.1 conv count: the measured per-execution fixed cost is
        # ~8 s (aggregator-pool spin-up + read planning, identical at
        # both CPU levels — the 120k-conv legs fit t = fixed + W/ncpu
        # with W≈428 cpu·s, fixed≈8 s), so the workload must be large
        # enough that compute dominates it, exactly as a real 100 TB
        # job (hours of compute against seconds of setup) would be
        tx_path = ensure_transcripts(
            SF_DIR, n_convs=int(os.environ.get("BENCH_SCALING_CONVS", "480000"))
        )
        dedup_strategy = "broadcast"
        n_timed = 2
    else:
        tx_path = ensure_transcripts(SF_DIR)
        dedup_strategy = "shuffle"
        # best-of-3: the sandbox is time-shared and single runs vary ~1.8×
        n_timed = 3
    # warm Ray workers + shuffle aggregator pools: a tiny run for worker
    # startup, then one UNTIMED full-size run so the timed runs measure
    # steady-state pipeline throughput, not actor-pool cold start
    warm_path = ensure_transcripts("/root/testdata/sf0.001")
    build_triples(warm_path).count()
    build_triples(tx_path, dedup_strategy=dedup_strategy).count()
    times = []
    n_triples = 0
    for _ in range(n_timed):
        t0 = time.time()
        ds = build_triples(tx_path, dedup_strategy=dedup_strategy)
        n_triples = ds.count()
        times.append(time.time() - t0)
    headline = min(times)
    machine.append(_probe_point("after_headline"))
    if os.environ.get("BENCH_STATS"):
        # per-stage wall breakdown of the last headline run (stderr so
        # the stdout JSON contract stays one line)
        print(ds.stats(), file=sys.stderr)

    # ---- representative operator pipelines -------------------------------
    qtimes = {}
    if not scaling_workload:
        qs = E.queries()
        # same steady-state methodology as the headline: one untimed
        # warm pass per query (actor-pool + shuffle-aggregator spin-up
        # lands in the first execution of each distinct pipeline; the
        # round-2 driver artifact's 2-5x "regressions" were exactly
        # these cold-start costs, not code regressions)
        import gc

        for name in BENCH_QUERIES:
            _consume(qs[name](SF_DIR))
            gc.collect()
        # min-of-2 timed passes: long-session actor-placement stalls
        # (shuffle aggregators pending behind not-yet-reclaimed pools
        # from prior queries, observed as a one-off 50 s outlier on a
        # 2 s pipeline) hit one pass, not both; gc between queries
        # releases dead executors' actors promptly
        for name in BENCH_QUERIES:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                _consume(qs[name](SF_DIR))
                best = min(best, time.time() - t0)
                gc.collect()
            qtimes[name] = round(best, 3)

    machine.append(_probe_point("end"))
    out = {
        "metric": "kg_transcripts_to_triples_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "triples": int(n_triples),
        "triples_per_sec": round(n_triples / headline, 1),
        "machine": machine,
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    """Same job, same input, fresh processes at 8 and 32 CPUs.

    Uses the broadcast-dedup workload (the wide-row-free exchange that
    is the 100 TB design point) on a 3× input so compute dominates
    cluster fixed costs; reports min-of-2 wall at each level.
    """

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_WORKLOAD="scaling")
        cmd = [sys.executable, os.path.abspath(__file__)]
        # ray.init(num_cpus=N) caps Ray TASK slots only; the raylet,
        # object store, parquet IO threads and the driver all still use
        # every physical core, so an un-pinned "8-CPU" leg is really an
        # 8-slot-32-core run and the measured ratio understates true
        # scaling. Hard CPU affinity confines the whole process tree
        # (workers inherit it) — the faithful N-vs-4N cluster emulation.
        import shutil

        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{int(ncpu) - 1}"] + cmd
        proc = subprocess.run(
            cmd,
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    def probe() -> float:
        """Single-thread matmul probe: detects hypervisor-level CPU
        throttling (the sandbox caps a VM that just ran a heavy job —
        guest load-avg stays ~0 while wall time doubles). Comparable
        probe values across legs = the efficiency ratio is trustworthy."""
        import numpy as np

        t0 = time.time()
        a = np.random.rand(2000, 2000)
        for _ in range(3):
            a @ a
        return round(time.time() - t0, 2)

    def capacity(ncpu: int) -> float:
        """Aggregate compute capacity actually DELIVERED by `ncpu`
        pinned vCPUs (probes/sec summed over ncpu concurrent
        single-thread matmul processes, one per core). On an
        oversubscribed VM, 4N vCPUs deliver far less than 4× the
        compute of N vCPUs (measured 2.16× on this sandbox), so the
        raw wall ratio understates how well the PIPELINE scales; the
        capacity ratio is the hardware-attainable ceiling to normalize
        against. A real N→4N node cluster adds 4× silicon, where this
        ceiling is ~1."""
        import tempfile

        code = (
            "import time,numpy as np\n"
            "a=np.random.rand(1500,1500)\n"
            "t0=time.time()\n"
            "for _ in range(6): a@a\n"
            "print(time.time()-t0)\n"
        )
        with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
            f.write(code)
            path = f.name
        env = dict(os.environ, OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1")
        import shutil

        def cmd(i: int) -> list:
            base = [sys.executable, path]
            if shutil.which("taskset"):
                return ["taskset", "-c", str(i), *base]
            return base

        procs = [
            subprocess.Popen(cmd(i), stdout=subprocess.PIPE, text=True, env=env)
            for i in range(int(ncpu))
        ]
        times = [float(p.communicate()[0].strip()) for p in procs]
        os.unlink(path)
        return round(sum(1.0 / t for t in times), 3)

    # The sandbox hypervisor throttles the whole VM after sustained
    # heavy CPU (single-thread probe slows 2-5× while guest load-avg
    # stays ~0), so a fixed lo-then-hi order lets the hi leg land in
    # the lo leg's throttle window and the ratio collapses. Run the
    # legs ALTERNATED (lo,hi,lo,hi) with a cool-down before each and
    # take the best wall per level — both levels sample both machine
    # states, and min() picks each level's untrottled window. Probes
    # are recorded per leg so the artifact shows the conditions.
    cooldown = int(os.environ.get("BENCH_SCALING_COOLDOWN", "240"))
    rounds = int(os.environ.get("BENCH_SCALING_ROUNDS", "2"))
    # the N→4N pair: 8→32 by default; 4→16 leaves hypervisor headroom
    # (this sandbox oversubscribes vCPUs — see BASELINE.md) and is the
    # same 4× criterion
    lo = int(os.environ.get("BENCH_SCALING_LO", "8"))
    hi = int(os.environ.get("BENCH_SCALING_HI", "32"))
    legs = []
    for i in range(rounds):
        for ncpu in (lo, hi):
            if legs:
                time.sleep(cooldown)
            legs.append({"ncpu": ncpu, "probe": probe(), **one(ncpu)})
    r_lo = min((l for l in legs if l["ncpu"] == lo), key=lambda l: l["value"])
    r_hi = min((l for l in legs if l["ncpu"] == hi), key=lambda l: l["value"])
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    cap_lo, cap_hi = capacity(lo), capacity(hi)
    cap_ratio = cap_hi / cap_lo
    return {
        "metric": "scaling_efficiency",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "triples_per_sec_lo": r_lo["triples_per_sec"],
        "triples_per_sec_hi": r_hi["triples_per_sec"],
        "scaling_efficiency": round(eff, 3),
        # what the VM's vCPUs can physically deliver between the two
        # levels (≈1.0 lo→hi per-core on real added nodes; this VM
        # oversubscribes so hi vCPUs run slower under full load)
        "capacity_probe_lo": cap_lo,
        "capacity_probe_hi": cap_hi,
        "capacity_ratio": round(cap_ratio, 3),
        "efficiency_vs_capacity": round(
            (r_lo["value"] / r_hi["value"]) / cap_ratio, 3
        ),
        "legs": [
            {"ncpu": l["ncpu"], "sec": l["value"], "probe_sec": l["probe"]}
            for l in legs
        ],
        "sf": SF_DIR,
    }


COLD_QUERIES = [
    "q1_pricing_summary",
    "kg_triples_planted",
    "minhash_dedup_docs",
    "sameas_canonical_planted",
    "cms_heavy_hitter_users",
]


def run_cold() -> dict:
    """Single cold pass per pipeline (see module docstring)."""
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as E

    from import_ray.pipelines.kg import build_triples
    from import_ray.sources.transcripts import ensure_transcripts

    machine = [_probe_point("start")]
    tx_path = ensure_transcripts(SF_DIR)
    t0 = time.time()
    n_triples = build_triples(tx_path).count()
    headline = time.time() - t0
    qs = E.queries()
    qtimes = {}
    for name in COLD_QUERIES:
        t0 = time.time()
        _consume(qs[name](SF_DIR))
        qtimes[name] = round(time.time() - t0, 3)
    machine.append(_probe_point("end"))
    out = {
        "metric": "kg_transcripts_to_triples_cold_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "triples": int(n_triples),
        "machine": machine,
    }
    ray.shutdown()
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--cold" in sys.argv:
        print(json.dumps(run_cold()))
    else:
        print(json.dumps(run_bench()))
