"""S2 cell ids from lat/lng — from-scratch implementation of the
public S2 geometry cell-id scheme (quadratic ST projection, Hilbert
curve position via 4-bit lookup tables), mirroring the reference's
``simple/util/resolvers.py:35-66`` (``resolve_latlngs_2_s2cells``)
without the s2sphere dependency (not in env).

Cell id layout: 3 face bits, 2·level Hilbert position bits, one
sentinel ``1`` bit, zero-padded to 64 bits. ``parent(level)`` clears
position bits below the level's lsb and sets the sentinel there.

Verified against the reference's documented vector
("38.7#-119.4" @ level 10 → ``s2CellId/0x80982b0000000000``) and
structural invariants (tests/test_s2cell.py).
"""

from __future__ import annotations

import math
import re

SWAP_MASK = 0x01
INVERT_MASK = 0x02
LOOKUP_BITS = 4
MAX_LEVEL = 30

_POS_TO_ORIENTATION = [SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK]
_POS_TO_IJ = [
    [0, 1, 3, 2],
    [0, 2, 3, 1],
    [3, 2, 0, 1],
    [3, 1, 0, 2],
]

_LOOKUP_POS = [0] * (1 << (2 * LOOKUP_BITS + 2))
_LOOKUP_IJ = [0] * (1 << (2 * LOOKUP_BITS + 2))


def _init_lookup(level: int, i: int, j: int, orig_orientation: int, pos: int, orientation: int):
    if level == LOOKUP_BITS:
        ij = (i << LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig_orientation] = (pos << 2) + orientation
        _LOOKUP_IJ[(pos << 2) + orig_orientation] = (ij << 2) + orientation
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orientation]
    for index in range(4):
        _init_lookup(
            level,
            i + (r[index] >> 1),
            j + (r[index] & 1),
            orig_orientation,
            pos + index,
            orientation ^ _POS_TO_ORIENTATION[index],
        )


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)


def _xyz_to_face_uv(x: float, y: float, z: float) -> tuple[int, float, float]:
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax > ay:
        face = 0 if ax > az else 2
    else:
        face = 1 if ay > az else 2
    if (face == 0 and x < 0) or (face == 1 and y < 0) or (face == 2 and z < 0):
        face += 3
    if face == 0:
        u, v = y / x, z / x
    elif face == 1:
        u, v = -x / y, z / y
    elif face == 2:
        u, v = -x / z, -y / z
    elif face == 3:
        u, v = z / x, y / x
    elif face == 4:
        u, v = z / y, -x / y
    else:
        u, v = -y / z, -x / z
    return face, u, v


def _uv_to_st(u: float) -> float:
    # S2_QUADRATIC_PROJECTION
    if u >= 0:
        return 0.5 * math.sqrt(1 + 3 * u)
    return 1 - 0.5 * math.sqrt(1 - 3 * u)


def _st_to_ij(s: float) -> int:
    return max(0, min((1 << MAX_LEVEL) - 1, int(math.floor((1 << MAX_LEVEL) * s))))


def cell_id_from_lat_lng(lat_deg: float, lng_deg: float) -> int:
    """Leaf (level-30) S2 cell id for the given degrees lat/lng."""
    phi = math.radians(lat_deg)
    theta = math.radians(lng_deg)
    cosphi = math.cos(phi)
    x, y, z = math.cos(theta) * cosphi, math.sin(theta) * cosphi, math.sin(phi)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))

    n = face << 60
    bits = face & SWAP_MASK
    mask = (1 << LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * LOOKUP_BITS)) & mask) << (LOOKUP_BITS + 2)
        bits += ((j >> (k * LOOKUP_BITS)) & mask) << 2
        bits = _LOOKUP_POS[bits]
        n |= (bits >> 2) << (k * 2 * LOOKUP_BITS)
        bits &= SWAP_MASK | INVERT_MASK
    return (n * 2 + 1) & 0xFFFFFFFFFFFFFFFF


def lsb_for_level(level: int) -> int:
    return 1 << (2 * (MAX_LEVEL - level))


def parent(cell_id: int, level: int) -> int:
    new_lsb = lsb_for_level(level)
    return (cell_id & (~(new_lsb - 1) & 0xFFFFFFFFFFFFFFFF)) | new_lsb


def cell_level(cell_id: int) -> int:
    lsb = cell_id & (~cell_id + 1) & 0xFFFFFFFFFFFFFFFF
    return MAX_LEVEL - (lsb.bit_length() - 1) // 2


_S2CELL_ENTITY_TYPE = re.compile(r"S2CellLevel(\d+)")
_LAT_LNG = re.compile(r"(.+)#(.+)")


def latlng_to_s2cell_dcid(latlng: str, level: int) -> str | None:
    """``"38.7#-119.4"`` @ level → ``s2CellId/0x…`` dcid
    (resolvers.py:_latlng_2_s2cell_dcid format: 16 hex digits)."""
    m = _LAT_LNG.match(latlng)
    if m is None:
        return None
    try:
        lat, lng = float(m.group(1).strip()), float(m.group(2).strip())
    except ValueError:
        return None
    cid = cell_id_from_lat_lng(lat, lng)
    if level < MAX_LEVEL:
        cid = parent(cid, level)
    return "s2CellId/{0:#0{1}x}".format(cid, 18)


def resolve_latlngs_to_s2cells(latlngs: list[str], entity_type: str) -> dict[str, str]:
    """resolvers.py:resolve_latlngs_2_s2cells — input → dcid map;
    unresolvable values are omitted."""
    m = _S2CELL_ENTITY_TYPE.match(entity_type)
    if m is None:
        raise AssertionError(f"Unsupported entity type: {entity_type}")
    level = int(m.group(1))
    out = {}
    for latlng in latlngs:
        dcid = latlng_to_s2cell_dcid(latlng, level)
        if dcid:
            out[latlng] = dcid
    return out
