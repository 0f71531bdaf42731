"""End-to-end parity with the reference's genmcf golden fixtures.

Drives TMCF+CSV template application, mutation, and resolution against
the reference repo's own test case
(tool/src/test/resources/.../genmcf/resolution/) and compares emitted
node property-values against the golden outputs. The external-id map
(recon API stand-in) is extracted from the goldens, mirroring how the
reference's unit tests mock the API (ExternalIdResolverTest.java).
"""

from __future__ import annotations

import os
import re

import pytest

REF = "/root/reference/tool/src/test/resources/org/datacommons/tool/genmcf/resolution"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures unavailable"
)


def golden_graph(path):
    from import_ray.sources.mcf import parse_mcf_string

    text = open(path).read()
    # goldens are resolved files but contain l: refs inside failed nodes;
    # parse leniently (is_resolved=False)
    return parse_mcf_string(text).graph


def graph_to_tuples(g, skip_props=()):
    out = set()
    for node_id, node in g.items():
        for prop, tvs in node.items():
            if prop in skip_props:
                continue
            for value, vtype in tvs:
                out.add((node_id, prop, value, int(vtype)))
    return out


def extract_external_id_map():
    """(prop, value) -> dcid pairs implied by the goldens = the recon
    responses the reference test captured."""
    m = {}
    for fname in ("table_mcf_nodes_covid.mcf", "instance_mcf_nodes.mcf"):
        g = golden_graph(os.path.join(REF, "output", fname))
        for node_id, node in g.items():
            dcid = node.get("dcid")
            if not dcid:
                continue
            dcid_val = dcid[0][0]
            for prop in ("isoCode", "wikidataId", "nutsCode", "geoId"):
                if prop in node:
                    for value, _ in node[prop]:
                        if f"{prop}/{value}" != dcid_val:
                            m[(prop, value)] = dcid_val
    return m


def prf(got: set, want: set):
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want) if want else 0.0
    return precision, recall


def test_table_path_matches_golden(ray_session):
    from import_ray.pipelines.genmcf import genmcf_table_ds, nodes_rows_to_graph

    ds = genmcf_table_ds(
        os.path.join(REF, "input", "covid.tmcf"),
        os.path.join(REF, "input", "covid.csv"),
        external_id_map=extract_external_id_map(),
    )
    import pyarrow as pa

    rows = pa.Table.from_pylist(ds.take_all())
    got = graph_to_tuples(nodes_rows_to_graph(rows))
    want = graph_to_tuples(golden_graph(os.path.join(REF, "output", "table_mcf_nodes_covid.mcf")))
    p, r = prf(got, want)
    assert p >= 0.95 and r >= 0.95, (
        f"P={p:.3f} R={r:.3f}; missing={sorted(want - got)[:10]}; "
        f"extra={sorted(got - want)[:10]}"
    )


def test_localid_resolution_matches_golden(ray_session):
    """LOCAL-resolution case: curated map preloaded from the local
    instance graph; diverging external ids must fail the place node and
    cascade to the dependent SVObs (genmcf/localidresolution)."""
    import pyarrow as pa

    from import_ray.pipelines.genmcf import genmcf_table_ds, nodes_rows_to_graph
    from import_ray.sources.mcf import parse_mcf_file
    from import_ray.stages.resolve import build_local_id_map

    base = os.path.join(os.path.dirname(REF), "localidresolution")
    local_graph = parse_mcf_file(os.path.join(base, "input", "localresolutiongraph.mcf")).graph
    id_map = build_local_id_map(local_graph)
    ds = genmcf_table_ds(
        os.path.join(base, "input", "covid.tmcf"),
        os.path.join(base, "input", "covid.csv"),
        external_id_map=id_map,
    )
    rows = pa.Table.from_pylist(ds.take_all())
    got = graph_to_tuples(nodes_rows_to_graph(rows))
    want = graph_to_tuples(
        golden_graph(os.path.join(base, "output", "table_mcf_nodes_covid.mcf"))
    )
    p, r = prf(got, want)
    assert p >= 0.95 and r >= 0.95, f"P={p:.3f} R={r:.3f}"
    got_failed = set(nodes_rows_to_graph(rows, include_failed=True)) - set(
        nodes_rows_to_graph(rows)
    )
    want_failed = set(
        golden_graph(os.path.join(base, "output", "failed_table_mcf_nodes_covid.mcf"))
    )
    assert got_failed == want_failed


def test_latlng_resolution_matches_golden(ray_session):
    """Coordinates-resolution case (genmcf/latlngresolution): (lat,lng)
    → dcid map stands in for the recon API (CoordinatesResolver)."""
    import pyarrow as pa

    from import_ray.pipelines.genmcf import genmcf_table_ds, nodes_rows_to_graph

    base = os.path.join(os.path.dirname(REF), "latlngresolution")
    want_graph = golden_graph(
        os.path.join(base, "output", "table_mcf_nodes_LatLng.mcf")
    )
    coords = {}
    for node in want_graph.values():
        lat = node.get("latitude")
        lng = node.get("longitude")
        d = node.get("dcid")
        if lat and lng and d:
            coords[(float(lat[0][0]), float(lng[0][0]))] = d[0][0]
    ds = genmcf_table_ds(
        os.path.join(base, "input", "LatLng.tmcf"),
        os.path.join(base, "input", "LatLng.csv"),
        coordinates_map=coords,
        external_id_map={},
    )
    rows = pa.Table.from_pylist(ds.take_all())
    got = graph_to_tuples(nodes_rows_to_graph(rows))
    want = graph_to_tuples(want_graph)
    p, r = prf(got, want)
    assert p >= 0.95 and r >= 0.95, (
        f"P={p:.3f} R={r:.3f}; missing={sorted(want - got)[:8]}; "
        f"extra={sorted(got - want)[:8]}"
    )


@pytest.mark.parametrize(
    "case,tmcf,csv,golden_file,min_p,min_r",
    [
        # P=1.0 R=1.0
        ("measurementresult", "acre.tmcf", "acre.csv", "table_mcf_nodes_acre.mcf", 0.99, 0.99),
        # P=0.995 R=0.957: (a) the golden's Quantity nodes carry `unit`
        # where current ComplexValueParser.java:196-199 emits
        # `unitOfMeasure` (golden predates the rename); (b) one SVObs row
        # with a malformed place cascades differently. Both above target.
        ("successtmcf", "SuccessMcf.tmcf", "SuccessTmcf.csv", "table_mcf_nodes_SuccessTmcf.mcf", 0.95, 0.95),
    ],
)
def test_more_table_cases(ray_session, case, tmcf, csv, golden_file, min_p, min_r):
    import pyarrow as pa

    from import_ray.pipelines.genmcf import genmcf_table_ds, nodes_rows_to_graph

    base = os.path.join(os.path.dirname(REF), case)
    ds = genmcf_table_ds(
        os.path.join(base, "input", tmcf),
        os.path.join(base, "input", csv),
        external_id_map={},
    )
    rows = pa.Table.from_pylist(ds.take_all())
    got = graph_to_tuples(nodes_rows_to_graph(rows))
    want = graph_to_tuples(golden_graph(os.path.join(base, "output", golden_file)))
    p, r = prf(got, want)
    assert p >= min_p and r >= min_r, f"{case}: P={p:.3f} R={r:.3f}"


def test_instance_path_matches_golden():
    from import_ray.pipelines.genmcf import genmcf_instance

    resolved, failed, issues = genmcf_instance(
        [os.path.join(REF, "input", "misc.mcf")],
        external_id_map=extract_external_id_map(),
    )
    got = graph_to_tuples(resolved)
    want = graph_to_tuples(golden_graph(os.path.join(REF, "output", "instance_mcf_nodes.mcf")))
    p, r = prf(got, want)
    assert p >= 0.95 and r >= 0.95, (
        f"P={p:.3f} R={r:.3f}; missing={sorted(want - got)[:10]}; "
        f"extra={sorted(got - want)[:10]}"
    )
    # failed nodes match the failed golden's node set
    want_failed = set(
        golden_graph(os.path.join(REF, "output", "failed_instance_mcf_nodes.mcf"))
    )
    assert set(failed) == want_failed
    counters = {i.counter for i in issues}
    assert "Resolution_OrphanLocalReference_parent" in counters
    assert "Resolution_DcidAssignmentFailure_StatisticalVariable" in counters
