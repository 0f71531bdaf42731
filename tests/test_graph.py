"""Graph analysis: predicate counts, degree top-k, connected components."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def kg_triples(ray_session):
    from import_ray.pipelines.kg import build_triples
    from import_ray.sources.transcripts import ensure_transcripts

    path = ensure_transcripts("/root/testdata/sf0.001")
    ds = build_triples(path).materialize()
    return ds, ds.to_pandas()


def test_predicate_counts_match_pandas(kg_triples):
    from import_ray.stages.graph import predicate_counts

    ds, df = kg_triples
    got = (
        predicate_counts(ds)
        .to_pandas()
        .sort_values("predicate")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("predicate").size().reset_index(name="n_triples")
        .sort_values("predicate").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_out_degree_topk_matches_pandas(kg_triples):
    from import_ray.stages.graph import out_degree_topk

    ds, df = kg_triples
    got = out_degree_topk(ds, k=10)
    want = (
        df.groupby("subject_id").size().reset_index(name="out_degree")
        .sort_values(["out_degree", "subject_id"], ascending=[False, True],
                     kind="mergesort")
        .head(10).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_connected_components_planted(ray_session):
    """Two planted components (a 4-chain and a triangle) + a self-less
    singleton pair structure must label exactly by min node id."""
    import ray.data

    from import_ray.stages.graph import component_sizes, connected_components

    edges = pa.table(
        {
            # chain 1-2-3-4, triangle 10-11-12
            "doc_lo": pa.array([1, 2, 3, 10, 11, 10], pa.int64()),
            "doc_hi": pa.array([2, 3, 4, 11, 12, 12], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(edges)
    labels = {r["node"]: r["label"] for r in connected_components(ds).take_all()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}
    sizes = {r["label"]: r["size"] for r in component_sizes(ds).take_all()}
    assert sizes == {1: 4, 10: 3}


def test_entity_components_end_to_end(kg_triples):
    """Entity-reference components over real triples: every labeled node
    must appear in some edge, and labels must be component-minimal
    (label ≤ node for every row)."""
    from import_ray.stages.graph import connected_components, entity_edges

    ds, _ = kg_triples
    edges = entity_edges(ds)
    labels = connected_components(edges).take_all()
    assert labels
    assert all(r["label"] <= r["node"] for r in labels)


def test_entity_edges_degree_cap(ray_session):
    """Edges into objects above the in-degree cap must be dropped."""
    import ray.data

    from import_ray.stages.graph import entity_edges

    t = pa.table(
        {
            "subject_id": pa.array([f"s{i}" for i in range(6)] + ["s0", "s1"]),
            "predicate": pa.array(["p"] * 8),
            "object_id": pa.array(["hub"] * 6 + ["rare", "rare2"]),
            "object_value": pa.array([""] * 8),
            "provenance": pa.array(["t"] * 8),
        }
    )
    ds = ray.data.from_arrow(t)
    full = entity_edges(ds).count()
    capped = entity_edges(ds, max_object_degree=2).count()
    assert full == 8
    assert capped == 2  # only the two rare-object edges survive


def test_triangle_count_planted(ray_session):
    """K4 (4 triangles) + a 4-cycle (0) + a chain (0) + duplicate and
    reversed edges (must not double-count)."""
    import ray.data

    from import_ray.stages.graph import triangle_count

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    square = [(10, 11), (11, 12), (12, 13), (13, 10)]
    chain = [(20, 21), (21, 22)]
    dups = [(2, 1), (1, 2), (3, 3)]  # reversed, duplicate, self-loop
    lo, hi = zip(*(k4 + square + chain + dups))
    ds = ray.data.from_arrow(
        pa.table({"doc_lo": pa.array(lo, pa.int64()), "doc_hi": pa.array(hi, pa.int64())})
    ).repartition(5)
    assert triangle_count(ds) == 4


def test_triangle_count_entity_graph_matches_bruteforce(kg_triples):
    """Distributed count equals a driver brute-force over the same
    (capped) entity graph."""
    from itertools import combinations

    from import_ray.stages.graph import entity_edges, triangle_count

    ds, _ = kg_triples
    edges = entity_edges(ds, max_object_degree=30).materialize()
    got = triangle_count(edges)

    rows = edges.take_all()
    adj: dict[int, set[int]] = {}
    und = set()
    for r in rows:
        a, b = r["doc_lo"], r["doc_hi"]
        if a == b:
            continue
        und.add((min(a, b), max(a, b)))
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # each triangle {x<y<z} counted exactly once: via edge (x,y), c=z>y
    want = sum(len([c for c in adj[a] & adj[b] if c > b]) for a, b in und)
    assert got == want


def test_co_mention_triangles_match_bruteforce(kg_triples):
    """Triangles over the co-mention graph equal a driver brute-force
    built from the same (conv, entity) mention pairs."""
    from import_ray.stages.graph import (
        CO_MENTION_PREDICATES,
        co_mention_edges,
        triangle_count,
    )

    ds, df = kg_triples
    # cap disabled for exact parity with the uncapped brute force
    edges = co_mention_edges(ds, max_entities_per_group=1_000_000).materialize()
    got = triangle_count(edges)
    assert edges.count() > 0

    # the skew cap must strictly shrink the clique expansion
    capped = co_mention_edges(ds, max_entities_per_group=8).count()
    assert 0 < capped < edges.count()

    m = df[df["predicate"].isin(CO_MENTION_PREDICATES)].copy()
    m["conv"] = m["subject_id"].str.rsplit("/", n=1).str[0]
    und = set()
    for _, grp in m.groupby("conv"):
        ents = sorted(
            pd.util.hash_array(
                np.unique(grp["object_id"].astype(str).to_numpy(dtype=object))
            ).astype(np.int64)
        )
        for i in range(len(ents)):
            for j in range(i + 1, len(ents)):
                und.add((ents[i], ents[j]))
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = sum(len([c for c in adj[a] & adj[b] if c > b]) for a, b in und)
    assert got == want
    assert got > 0


def _pagerank_dense(edges, n_nodes_map, iterations, damping):
    """Dense power iteration with identical semantics (multigraph
    weights, exact dangling redistribution) for parity checking."""
    idx = n_nodes_map
    n = len(idx)
    M = np.zeros((n, n))
    for a, b in edges:
        M[idx[b], idx[a]] += 1.0
    out = M.sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        W = np.where(out > 0, M / out, 0.0)
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contributed = W @ r
        dangling = 1.0 - contributed.sum()
        r = (1.0 - damping) / n + damping * (contributed + dangling / n)
    return r


def test_pagerank_matches_dense_power_iteration(ray_session):
    """Distributed PageRank must match a dense same-semantics power
    iteration to float tolerance on a graph with a dangling node, a
    hub, a cycle, and a parallel edge."""
    import ray.data

    from import_ray.stages.graph import pagerank

    # 0→1, 0→2, 1→2, 2→0 (cycle), 3→2 (3 dangles nothing... 3 has
    # out-edge; 4 is dangling: only in-edges), parallel edge 0→1 again
    lo = [0, 0, 1, 2, 3, 0, 2]
    hi = [1, 2, 2, 0, 2, 1, 4]
    ds = ray.data.from_arrow(
        pa.table({"doc_lo": pa.array(lo, pa.int64()), "doc_hi": pa.array(hi, pa.int64())})
    ).repartition(3)
    got = {r["node"]: r["rank"] for r in pagerank(ds, iterations=8).take_all()}

    idx = {v: i for i, v in enumerate(sorted(set(lo) | set(hi)))}
    want = _pagerank_dense(list(zip(lo, hi)), idx, iterations=8, damping=0.85)
    assert set(got) == set(idx)
    for v, i in idx.items():
        assert got[v] == pytest.approx(want[i], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_entity_graph(kg_triples):
    """PageRank over the real entity graph: mass conserved, every
    non-isolated node ranked."""
    from import_ray.stages.graph import entity_edges, pagerank

    ds, _ = kg_triples
    edges = entity_edges(ds)
    ranks = pagerank(edges, iterations=4).take_all()
    assert ranks
    total = sum(r["rank"] for r in ranks)
    assert total == pytest.approx(1.0, abs=1e-6)
    assert all(r["rank"] > 0 for r in ranks)


def test_contraction_preserves_labels(kg_triples):
    """Connected-component labels must be byte-identical with and
    without the block-local contraction pre-pass — on a planted deep
    chain AND on the real entity graph."""
    import ray.data

    from import_ray.stages.graph import connected_components, entity_edges

    # deep chain 0-1-2-...-19 scattered across blocks
    lo = list(range(19))
    hi = list(range(1, 20))
    chain = ray.data.from_arrow(
        pa.table({"doc_lo": pa.array(lo, pa.int64()), "doc_hi": pa.array(hi, pa.int64())})
    ).repartition(6)
    with_c = sorted(
        (r["node"], r["label"]) for r in connected_components(chain, contract=True).take_all()
    )
    without_c = sorted(
        (r["node"], r["label"]) for r in connected_components(chain, contract=False).take_all()
    )
    assert with_c == without_c
    assert all(lbl == 0 for _, lbl in with_c)

    ds, _ = kg_triples
    edges = entity_edges(ds, max_object_degree=20).materialize()
    a = sorted(
        (r["node"], r["label"]) for r in connected_components(edges, contract=True).take_all()
    )
    b = sorted(
        (r["node"], r["label"]) for r in connected_components(edges, contract=False).take_all()
    )
    assert a == b


def test_co_mention_pmi_matches_bruteforce(kg_triples):
    """PMI scores must match a pandas brute force over the same
    (conversation, entity) mention sets."""
    import math

    from import_ray.stages.graph import CO_MENTION_PREDICATES, co_mention_pmi

    ds, df = kg_triples
    got = co_mention_pmi(ds, min_pairs=2, top_k=25, max_entities_per_group=1_000_000)

    m = df[df["predicate"].isin(CO_MENTION_PREDICATES)].copy()
    m["conv"] = m["subject_id"].str.rsplit("/", n=1).str[0]
    m["ent"] = pd.util.hash_array(
        m["object_id"].astype(str).to_numpy(dtype=object)
    ).astype(np.int64)
    per_conv = m.groupby("conv")["ent"].apply(lambda s: np.unique(s.to_numpy()))
    n_convs = len(per_conv)
    marg: dict[int, int] = {}
    pair: dict[tuple[int, int], int] = {}
    for ents in per_conv:
        for e in ents:
            marg[e] = marg.get(e, 0) + 1
        for i in range(len(ents)):
            for j in range(i + 1, len(ents)):
                k = (ents[i], ents[j])
                pair[k] = pair.get(k, 0) + 1
    rows = [
        (a, b, c, marg[a], marg[b], math.log(n_convs * c / (marg[a] * marg[b])))
        for (a, b), c in pair.items()
        if c >= 2
    ]
    want = (
        pd.DataFrame(rows, columns=["ent_lo", "ent_hi", "n_pair", "n_lo", "n_hi", "pmi"])
        .sort_values(["pmi", "ent_lo", "ent_hi"], ascending=[False, True, True],
                     kind="mergesort")
        .head(25)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-12)


def test_k_core_planted(ray_session):
    """K4 plus a pendant chain: the 3-core is exactly the K4 nodes; the
    2-core adds the attached triangle; k=5 core is empty."""
    import ray.data

    from import_ray.stages.graph import k_core

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tri = [(4, 5), (5, 6), (6, 4)]      # triangle hanging off node 4
    chain = [(6, 7), (7, 8)]            # pendant chain (peeled at k=2)
    lo, hi = zip(*(k4 + tri + chain))
    ds = ray.data.from_arrow(
        pa.table({"doc_lo": pa.array(lo, pa.int64()), "doc_hi": pa.array(hi, pa.int64())})
    ).repartition(4)

    three_core = sorted(r["node"] for r in k_core(ds, k=3).take_all())
    assert three_core == [1, 2, 3, 4]
    two_core = sorted(r["node"] for r in k_core(ds, k=2).take_all())
    assert two_core == [1, 2, 3, 4, 5, 6]
    assert k_core(ds, k=5).count() == 0


def test_adamic_adar_matches_bruteforce(ray_session):
    """AA scores on a planted graph must equal the textbook formula,
    and existing edges must be excluded."""
    import math

    import ray.data

    from import_ray.stages.graph import adamic_adar_topk

    # path 1-2-3 + hub 10 connected to 1,2,3,4
    e = [(1, 2), (2, 3), (10, 1), (10, 2), (10, 3), (10, 4)]
    lo, hi = zip(*e)
    ds = ray.data.from_arrow(
        pa.table({"doc_lo": pa.array(lo, pa.int64()), "doc_hi": pa.array(hi, pa.int64())})
    ).repartition(3)
    got = adamic_adar_topk(ds, top_k=100)

    und = {(min(a, b), max(a, b)) for a, b in e}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want: dict[tuple[int, int], float] = {}
    nodes = sorted(adj)
    for i, v in enumerate(nodes):
        for w in nodes[i + 1:]:
            if (v, w) in und:
                continue
            s = sum(1.0 / math.log(len(adj[u])) for u in adj[v] & adj[w])
            if s > 0:
                want[(v, w)] = s
    got_pairs = {
        (int(r.node_lo), int(r.node_hi)): r.aa_score for r in got.itertuples()
    }
    assert set(got_pairs) == set(want)
    for k_, v_ in want.items():
        assert got_pairs[k_] == pytest.approx(v_, abs=1e-12)
    # no existing edge may appear
    assert not (set(got_pairs) & und)


def test_k_core_and_aa_on_co_mention_graph(kg_triples):
    """Smoke at real scale: the 2-core of the co-mention graph is
    non-empty and AA returns capped top-k with descending scores."""
    from import_ray.stages.graph import adamic_adar_topk, co_mention_edges, k_core

    ds, _ = kg_triples
    edges = co_mention_edges(ds, max_entities_per_group=16).materialize()
    core = k_core(edges, k=2)
    assert core.count() > 0
    aa = adamic_adar_topk(edges, top_k=10)
    assert 0 < len(aa) <= 10
    scores = aa["aa_score"].to_numpy()
    assert (scores[:-1] >= scores[1:]).all()


def test_k_hop_reach_matches_bfs(ray_session):
    """Multi-source BFS parity: distributed frontier expansion must
    match a driver-side BFS exactly on a planted graph (two components,
    a hub, a chain long enough to exhaust max_hops)."""
    import ray.data

    from import_ray.stages.graph import k_hop_reach

    rng = np.random.RandomState(7)
    n_nodes = 40
    lo = rng.randint(0, n_nodes, 120).astype(np.int64)
    hi = rng.randint(0, n_nodes, 120).astype(np.int64)
    # planted second component far from the random block
    lo = np.concatenate([lo, np.array([100, 101, 102, 103], np.int64)])
    hi = np.concatenate([hi, np.array([101, 102, 103, 104], np.int64)])
    ds = ray.data.from_arrow(
        pa.table({"doc_lo": pa.array(lo, pa.int64()), "doc_hi": pa.array(hi, pa.int64())})
    )
    seeds = [0, 1, 100]
    max_hops = 3
    got = k_hop_reach(ds, seeds=seeds, max_hops=max_hops)

    adj: dict[int, set[int]] = {}
    for a, b in zip(lo.tolist(), hi.tolist()):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for seed in seeds:
        dist = {seed: 0}
        frontier = [seed]
        for hop in range(1, max_hops + 1):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):  # noqa: B909
                    if v not in dist:
                        dist[v] = hop
                        nxt.append(v)
            frontier = nxt
        for hop in range(max_hops + 1):
            want = sum(1 for d in dist.values() if d <= hop)
            row = got[(got["seed"] == seed) & (got["hop"] == hop)]
            assert len(row) == 1
            assert int(row["n_reached"].iloc[0]) == want, (seed, hop)


def test_k_hop_reach_default_seeds(ray_session):
    """Default seed pick = smallest node ids; cumulative counts are
    monotone and start at 1 (the seed itself at hop 0)."""
    import ray.data

    from import_ray.stages.graph import k_hop_reach

    edges = pa.table(
        {
            "doc_lo": pa.array([1, 2, 3, 10, 11], pa.int64()),
            "doc_hi": pa.array([2, 3, 4, 11, 12], pa.int64()),
        }
    )
    got = k_hop_reach(ray.data.from_arrow(edges), n_seeds=2, max_hops=2)
    assert sorted(got["seed"].unique().tolist()) == [1, 2]
    for _, g in got.groupby("seed"):
        g = g.sort_values("hop")
        assert g["n_reached"].iloc[0] == 1
        assert g["n_reached"].is_monotonic_increasing


def _lpa_reference(lo, hi, max_rounds=10):
    """Driver-side synchronous LPA with the same rule: most frequent
    neighbor label, ties to smallest; stop when stable."""
    adj: dict[int, list[int]] = {}
    for a, b in zip(lo, hi):
        if a == b:
            continue
        adj.setdefault(int(a), []).append(int(b))
        adj.setdefault(int(b), []).append(int(a))
    labels = {u: u for u in adj}
    for _ in range(max_rounds):
        new = {}
        for u, neigh in adj.items():
            counts: dict[int, int] = {}
            for v in neigh:
                counts[labels[v]] = counts.get(labels[v], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[u] = best
        if new == labels:
            break
        labels = new
    return labels


def test_label_propagation_matches_reference(ray_session):
    """Distributed synchronous LPA must equal the driver-side rule
    exactly (same per-round updates + same early stop) on a planted
    two-clique graph with a bridge."""
    import ray.data

    from import_ray.stages.graph import label_propagation

    # two 4-cliques 0-3 and 10-13, bridged 3-10
    def clique(nodes):
        return [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]]

    e = clique([0, 1, 2, 3]) + clique([10, 11, 12, 13]) + [(3, 10)]
    lo = np.array([a for a, _ in e], np.int64)
    hi = np.array([b for _, b in e], np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_lo": pa.array(lo, pa.int64()), "doc_hi": pa.array(hi, pa.int64())})
    )
    got = {r["node"]: r["label"] for r in label_propagation(ds, max_rounds=10).take_all()}
    want = _lpa_reference(lo, hi, max_rounds=10)
    assert got == want
    # the two cliques end in different communities
    assert len({got[n] for n in (0, 1, 2)} | set()) == 1
    assert len({got[n] for n in (11, 12, 13)}) == 1
    assert got[0] != got[11]


def test_label_propagation_random_parity(ray_session):
    """Exact parity with the reference rule on a random sparse graph."""
    import ray.data

    from import_ray.stages.graph import label_propagation

    rng = np.random.RandomState(3)
    lo = rng.randint(0, 30, 80).astype(np.int64)
    hi = rng.randint(0, 30, 80).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_lo": pa.array(lo, pa.int64()), "doc_hi": pa.array(hi, pa.int64())})
    )
    got = {r["node"]: r["label"] for r in label_propagation(ds, max_rounds=6).take_all()}
    want = _lpa_reference(lo, hi, max_rounds=6)
    assert got == want


def _hits_dense(edges, idx, iterations):
    """Dense HITS with identical semantics (multigraph adjacency, L2
    normalization each half-step) for parity checking."""
    n = len(idx)
    A = np.zeros((n, n))
    for a, b in edges:
        A[idx[a], idx[b]] += 1.0
    h = np.ones(n)
    a_ = np.ones(n)
    for _ in range(iterations):
        a_ = A.T @ h
        na = np.linalg.norm(a_)
        a_ = a_ / na if na > 0 else a_
        h = A @ a_
        nh = np.linalg.norm(h)
        h = h / nh if nh > 0 else h
    return h, a_


def test_hits_matches_dense_iteration(ray_session):
    """Distributed HITS must match a dense same-semantics iteration on
    a graph with a hub, an authority, a sink, and a parallel edge."""
    import ray.data

    from import_ray.stages.graph import hits

    lo = [0, 0, 0, 1, 2, 3, 0]
    hi = [1, 2, 3, 2, 4, 4, 1]  # 0 is a hub; 2/4 authorities; 0→1 ×2
    ds = ray.data.from_arrow(
        pa.table({"doc_lo": pa.array(lo, pa.int64()), "doc_hi": pa.array(hi, pa.int64())})
    ).repartition(3)
    got = {r["node"]: (r["hub"], r["authority"]) for r in hits(ds, iterations=6).take_all()}

    idx = {v: i for i, v in enumerate(sorted(set(lo) | set(hi)))}
    h, a = _hits_dense(list(zip(lo, hi)), idx, iterations=6)
    assert set(got) == set(idx)
    for v, i in idx.items():
        assert got[v][0] == pytest.approx(h[i], abs=1e-12)
        assert got[v][1] == pytest.approx(a[i], abs=1e-12)
    # hub 0 dominates hubs; node 4 (fed by 2 and 3) is a top authority
    assert got[0][0] == max(s[0] for s in got.values())


def test_hits_entity_graph(kg_triples):
    """HITS over the real entity graph: unit L2 norms, non-negative."""
    from import_ray.stages.graph import entity_edges, hits

    ds, _ = kg_triples
    scores = hits(entity_edges(ds), iterations=3).take_all()
    assert scores
    hn = sum(r["hub"] ** 2 for r in scores) ** 0.5
    an = sum(r["authority"] ** 2 for r in scores) ** 0.5
    assert hn == pytest.approx(1.0, abs=1e-9)
    assert an == pytest.approx(1.0, abs=1e-9)
    assert all(r["hub"] >= 0 and r["authority"] >= 0 for r in scores)


def test_predicate_type_profile_synthetic(ray_session):
    """Multi-typed nodes multiply (join semantics); untyped endpoints
    profile as 'unknown'; value triples and typeOf itself are excluded."""
    import ray.data

    from import_ray.stages.graph import predicate_type_profile

    tri = pa.table(
        {
            "subject_id": ["a", "a", "b", "c", "a", "b", "c", "x"],
            "predicate": [
                "typeOf", "typeOf", "typeOf", "typeOf",
                "knows", "knows", "name", "knows",
            ],
            "object_id": ["Person", "Agent", "Person", "Org", "b", "c", None, "a"],
            "object_value": [None] * 6 + ["Carol", None],
        }
    )
    got = predicate_type_profile(ray.data.from_arrow(tri))
    # a(Person,Agent) knows b(Person) -> 2 rows; b(Person) knows c(Org);
    # x(untyped) knows a(Person, Agent) -> 2 rows; name is a value triple.
    want = pd.DataFrame(
        [
            ("knows", "Agent", "Person", 1),
            ("knows", "Person", "Org", 1),
            ("knows", "Person", "Person", 1),
            ("knows", "unknown", "Agent", 1),
            ("knows", "unknown", "Person", 1),
        ],
        columns=["predicate", "subject_type", "object_type", "n_triples"],
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_predicate_type_profile_matches_pandas(kg_triples):
    from import_ray.stages.graph import predicate_type_profile

    ds, df = kg_triples
    got = predicate_type_profile(ds).reset_index(drop=True)

    types = df[(df["predicate"] == "typeOf") & df["object_id"].notna()][
        ["subject_id", "object_id"]
    ].rename(columns={"subject_id": "k", "object_id": "t"})
    facts = df[
        (df["predicate"] != "typeOf")
        & df["object_id"].notna()
        & (df["object_id"] != "")
    ][["subject_id", "predicate", "object_id"]]
    w = facts.merge(
        types.rename(columns={"k": "subject_id", "t": "subject_type"}),
        on="subject_id",
        how="left",
    ).merge(
        types.rename(columns={"k": "object_id", "t": "object_type"}),
        on="object_id",
        how="left",
    )
    w["subject_type"] = w["subject_type"].fillna("unknown")
    w["object_type"] = w["object_type"].fillna("unknown")
    want = (
        w.groupby(["predicate", "subject_type", "object_type"], sort=True)
        .size()
        .reset_index(name="n_triples")
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_two_hop_pattern_multiplicity(ray_session):
    """A subject with 2 left objects and 3 right objects contributes all
    6 combinations; pairs repeated across subjects sum."""
    import ray.data

    from import_ray.stages.graph import two_hop_pattern

    tri = pa.table(
        {
            "subject_id": ["s1", "s1", "s1", "s1", "s1", "s2", "s2", "s3"],
            "predicate": ["p", "p", "q", "q", "q", "p", "q", "p"],
            "object_id": ["a", "b", "x", "y", "z", "a", "x", "lonely"],
            "object_value": [None] * 8,
        }
    )
    got = (
        two_hop_pattern(ray.data.from_arrow(tri), "p", "q")
        .to_pandas()
        .sort_values(["left_object", "right_object"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        [
            ("a", "x", 2),  # s1 and s2
            ("a", "y", 1),
            ("a", "z", 1),
            ("b", "x", 1),
            ("b", "y", 1),
            ("b", "z", 1),
        ],
        columns=["left_object", "right_object", "n_pairs"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_two_hop_pattern_matches_pandas(kg_triples):
    from import_ray.stages.graph import two_hop_pattern

    ds, df = kg_triples
    got = (
        two_hop_pattern(ds, "partOf", "mentionsPlace")
        .to_pandas()
        .sort_values(["left_object", "right_object"])
        .reset_index(drop=True)
    )
    links = df[df["object_id"].notna() & (df["object_id"] != "")]
    left = links[links["predicate"] == "partOf"][["subject_id", "object_id"]].rename(
        columns={"object_id": "left_object"}
    )
    right = links[links["predicate"] == "mentionsPlace"][
        ["subject_id", "object_id"]
    ].rename(columns={"object_id": "right_object"})
    want = (
        left.merge(right, on="subject_id")
        .groupby(["left_object", "right_object"], sort=True)
        .size()
        .reset_index(name="n_pairs")
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_shape_violations_synthetic(ray_session):
    """min/max cardinality violations: missing predicate counts as 0
    (violates min), repeated predicate violates max; untyped subjects
    are ignored."""
    import ray.data

    from import_ray.stages.graph import shape_violations

    tri = pa.table(
        {
            "subject_id": ["a", "b", "c", "a", "b", "b", "x"],
            "predicate": ["typeOf", "typeOf", "typeOf", "name", "name", "name", "name"],
            "object_id": ["T", "T", "T", None, None, None, None],
            "object_value": [None, None, None, "A", "B1", "B2", "X"],
        }
    )
    got = shape_violations(
        ray.data.from_arrow(tri),
        [{"type": "T", "predicate": "name", "min_count": 1, "max_count": 1}],
    )
    # a: 1 name (ok), b: 2 names (excess), c: 0 names (missing); x untyped
    assert got.iloc[0].tolist() == ["T", "name", 1, 1]


def test_shape_violations_matches_pandas(kg_triples):
    from import_ray.stages.graph import shape_violations

    ds, df = kg_triples
    shapes = [
        {"type": "ConversationTurn", "predicate": "tool", "min_count": 1, "max_count": 1},
        {"type": "ConversationTurn", "predicate": "mentionsPlace", "min_count": 1},
    ]
    got = shape_violations(ds, shapes)

    types = df[df["predicate"] == "typeOf"][["subject_id", "object_id"]]
    rows = []
    for s in shapes:
        subj = types[types["object_id"] == s["type"]]["subject_id"]
        cnt = (
            df[df["predicate"] == s["predicate"]]
            .groupby("subject_id")
            .size()
            .reindex(subj)
            .fillna(0)
        )
        miss = int((cnt < s.get("min_count", 0)).sum())
        mx = s.get("max_count")
        exc = int((cnt > mx).sum()) if mx is not None else 0
        rows.append((s["type"], s["predicate"], miss, exc))
    want = (
        pd.DataFrame(rows, columns=["target_type", "predicate", "n_missing", "n_excess"])
        .sort_values(["target_type", "predicate"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_shortcut_labels_byte_equal_deep_chain(ray_session):
    """Pointer doubling converges to the identical fixpoint as plain
    min-label propagation on a deep chain (the worst case for rounds),
    and in strictly fewer rounds than the chain depth allows."""
    import numpy as np
    import ray.data

    from import_ray.stages.neardup import propagate_min_labels

    n = 16  # 16-deep chain + a braid of short components
    lo = list(range(100, 100 + n - 1)) + [5000, 5001, 7000]
    hi = list(range(101, 100 + n)) + [5001, 5002, 7001]
    edges = pa.table(
        {"doc_lo": pa.array(lo, pa.int64()), "doc_hi": pa.array(hi, pa.int64())}
    )
    ds = ray.data.from_arrow(edges)
    with_sc = propagate_min_labels(ds, max_rounds=8, shortcut=True).take_all()
    without = propagate_min_labels(ds, max_rounds=20, shortcut=False).take_all()
    a = sorted((r["node"], r["label"]) for r in with_sc)
    b = sorted((r["node"], r["label"]) for r in without)
    assert a == b
    assert all(lab == 100 for node, lab in a if 100 <= node < 100 + n)


def test_cc_driver_vs_distributed_byte_equal(ray_session):
    """Hybrid connected_components: the bounded driver union-find and
    the distributed propagation produce identical labels."""
    import numpy as np
    import ray.data

    from import_ray.stages.graph import connected_components

    rng = np.random.default_rng(17)
    # random forest-ish graph + a 12-chain + triangle
    lo = rng.integers(0, 300, 220).tolist() + list(range(900, 911)) + [50, 51, 50]
    hi = rng.integers(0, 300, 220).tolist() + list(range(901, 912)) + [51, 52, 52]
    keep = [(a, b) for a, b in zip(lo, hi) if a != b]
    edges = pa.table(
        {
            "doc_lo": pa.array([a for a, _ in keep], pa.int64()),
            "doc_hi": pa.array([b for _, b in keep], pa.int64()),
        }
    )
    d = connected_components(ray.data.from_arrow(edges)).take_all()
    p = connected_components(
        ray.data.from_arrow(edges), max_driver_pairs=0
    ).take_all()
    assert sorted((r["node"], r["label"]) for r in d) == sorted(
        (r["node"], r["label"]) for r in p
    )


def test_jump_broadcast_vs_join_byte_equal(ray_session, monkeypatch):
    """The pointer-jump's two implementations — broadcast searchsorted
    lookup (under JUMP_BROADCAST_BUDGET) and labels⋈labels hash join
    (past it) — must produce the identical fixpoint."""
    import ray.data

    import import_ray.stages.neardup as nd

    n = 16
    lo = list(range(100, 100 + n - 1)) + [5000, 5001, 7000]
    hi = list(range(101, 100 + n)) + [5001, 5002, 7001]
    edges = pa.table(
        {"doc_lo": pa.array(lo, pa.int64()), "doc_hi": pa.array(hi, pa.int64())}
    )
    ds = ray.data.from_arrow(edges)
    bcast = nd.propagate_min_labels(ds, max_rounds=8, shortcut=True).take_all()
    monkeypatch.setattr(nd, "JUMP_BROADCAST_BUDGET", 0)  # force the join path
    joined = nd.propagate_min_labels(ds, max_rounds=8, shortcut=True).take_all()
    a = sorted((r["node"], r["label"]) for r in bcast)
    b = sorted((r["node"], r["label"]) for r in joined)
    assert a == b
    assert all(lab == 100 for node, lab in a if 100 <= node < 100 + n)


def test_harmonic_centrality_star_exact(ray_session):
    """All-seeds mode is exact: star center = m, leaf = 1 + (m-1)/2."""
    import ray.data

    from import_ray.stages.graph import harmonic_centrality

    m = 24
    edges = pa.table(
        {
            "doc_lo": pa.array([0] * m, pa.int64()),
            "doc_hi": pa.array(list(range(1, m + 1)), pa.int64()),
        }
    )
    out = harmonic_centrality(
        ray.data.from_arrow(edges), seeds=list(range(m + 1)), max_hops=4
    )
    assert out[out.node == 0].harmonic.iloc[0] == float(m)
    assert (out[out.node != 0].harmonic == 1.0 + (m - 1) / 2.0).all()


def test_harmonic_centrality_matches_driver_bfs(ray_session):
    """All-seeds distributed result equals a driver-side BFS reference
    on a random graph (exact harmonic centrality)."""
    import collections

    import numpy as np
    import ray.data

    from import_ray.stages.graph import harmonic_centrality

    rng = np.random.default_rng(7)
    lo = rng.integers(0, 40, 120)
    hi = rng.integers(0, 40, 120)
    m = lo != hi
    lo, hi = lo[m], hi[m]
    nodes = sorted(set(lo) | set(hi))
    adj = collections.defaultdict(set)
    for a, b in zip(lo, hi):
        adj[a].add(b)
        adj[b].add(a)

    def bfs(s):
        dist = {s: 0}
        q = [s]
        while q:
            nxt = []
            for u in q:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nxt.append(v)
            q = nxt
        return dist

    want = {}
    for v in nodes:
        want[v] = sum(
            1.0 / d for u, d in bfs(v).items() if d > 0
        )

    edges = pa.table(
        {"doc_lo": pa.array(lo, pa.int64()), "doc_hi": pa.array(hi, pa.int64())}
    )
    got = harmonic_centrality(
        ray.data.from_arrow(edges), seeds=nodes, max_hops=20
    )
    for _, r in got.iterrows():
        assert abs(r.harmonic - want[int(r.node)]) < 1e-9, (r.node,)


def test_harmonic_centrality_sampled_close(ray_session):
    """Sampled seeds give an unbiased estimate: mean relative error
    small at 50% seed coverage on a connected-ish random graph."""
    import numpy as np
    import ray.data

    from import_ray.stages.graph import harmonic_centrality

    rng = np.random.default_rng(3)
    lo = rng.integers(0, 60, 240)
    hi = rng.integers(0, 60, 240)
    m = lo != hi
    et = pa.table(
        {"doc_lo": pa.array(lo[m], pa.int64()), "doc_hi": pa.array(hi[m], pa.int64())}
    )
    nodes = sorted(set(lo[m]) | set(hi[m]))
    exact = harmonic_centrality(ray.data.from_arrow(et), seeds=nodes, max_hops=10)
    est = harmonic_centrality(ray.data.from_arrow(et), n_seeds=30, max_hops=10)
    j = exact.merge(est, on="node", suffixes=("_x", "_e"))
    rel = (abs(j.harmonic_e - j.harmonic_x) / j.harmonic_x.clip(lower=1e-9)).mean()
    assert rel < 0.15, rel
