"""S2 cell ids: reference vector + structural invariants."""

from __future__ import annotations

import pytest


def test_reference_vector():
    """resolvers.py:33 documented example."""
    from import_ray.functions.s2cell import latlng_to_s2cell_dcid, resolve_latlngs_to_s2cells

    assert (
        latlng_to_s2cell_dcid("38.7#-119.4", 10)
        == "s2CellId/0x80982b0000000000"
    )
    got = resolve_latlngs_to_s2cells(["38.7#-119.4", "garbage"], "S2CellLevel10")
    assert got == {"38.7#-119.4": "s2CellId/0x80982b0000000000"}


def test_levels_and_parents():
    from import_ray.functions.s2cell import (
        cell_id_from_lat_lng,
        cell_level,
        parent,
    )

    leaf = cell_id_from_lat_lng(52.52, 13.405)
    assert cell_level(leaf) == 30
    prev = leaf
    for level in range(29, -1, -1):
        p = parent(leaf, level)
        assert cell_level(p) == level
        # parent range contains the child: child id within [p - lsb, p + lsb]
        assert parent(prev, level) == p
        prev = p


def test_face_cells():
    from import_ray.functions.s2cell import cell_id_from_lat_lng, parent

    # lat 0, lng 0 is the center of face 0; level-0 parent is the face cell
    assert parent(cell_id_from_lat_lng(0.0, 0.0), 0) == (0 << 61) | (1 << 60)
    # north pole → face 2
    assert parent(cell_id_from_lat_lng(90.0, 0.0), 0) == (2 << 61) | (1 << 60)
    # lng 180 → face 3 (negative x)
    assert parent(cell_id_from_lat_lng(0.0, 180.0), 0) == (3 << 61) | (1 << 60)


def test_nearby_points_share_coarse_cells():
    from import_ray.functions.s2cell import cell_id_from_lat_lng, parent

    a = cell_id_from_lat_lng(37.7749, -122.4194)
    b = cell_id_from_lat_lng(37.7750, -122.4195)
    assert a != b
    assert parent(a, 10) == parent(b, 10)
    far = cell_id_from_lat_lng(-33.86, 151.21)
    assert parent(a, 2) != parent(far, 2)
