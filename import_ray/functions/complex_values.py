"""Complex value parsing: ``[unit val]`` / ``[unit lo hi]`` / ``[LatLong a b]``.

Reimplements the reference's ComplexValueParser semantics
(util/src/main/java/org/datacommons/util/ComplexValueParser.java:69-344):

- Quantity ``[<unit> <val>]`` (either order) → dcid ``<unit><val>``,
  node {typeOf: Quantity, value, unitOfMeasure}.
- QuantityRange ``[<unit> <lo> <hi>]`` with ``-`` for open ends →
  dcid ``<unit><lo>To<hi>`` / ``<unit>Upto<hi>`` / ``<unit><lo>Onwards``.
- GeoCoordinates ``[LatLong <lat> <lng>]`` (N/S/E/W suffixes allowed) →
  dcid ``latLong/<lat_e5>_<lng_e5>`` (E5 rounding, java:277-283).
"""

from __future__ import annotations

from dataclasses import dataclass

from import_ray.core import vocab
from import_ray.core.model import Node, ValueType
from import_ray.functions.strings import is_number, split_and_strip_with_quote_escape


@dataclass
class ComplexValueResult:
    dcid: str = ""
    name: str = ""
    node: Node | None = None
    error_counter: str = ""
    empty_token: bool = False


def _java_round_half_up(x: float) -> int:
    """Java Math.round: floor(x + 0.5) — differs from Python round() on .5."""
    import math

    return int(math.floor(x + 0.5))


def parse_complex_value(
    main_node_id: str,
    main_node: Node | None,
    prop: str,
    complex_value: str,
    build_node: bool = True,
) -> ComplexValueResult:
    res = ComplexValueResult()
    if not (complex_value.startswith("[") and complex_value.endswith("]")):
        res.error_counter = "MCF_UnenclosedComplexValue"
        return res
    try:
        fields = split_and_strip_with_quote_escape(
            complex_value[1:-1], delimiter=" ", strip_enclosing_quotes=False
        )
    except Exception:
        res.error_counter = "MCF_MalformedComplexValueParts"
        return res
    if not fields:
        # the reference's splitter logs an empty-token error before the
        # parts-count error fires (StringUtil.java:211-216 + parts check)
        res.empty_token = True
    if len(fields) not in (2, 3):
        res.error_counter = "MCF_MalformedComplexValueParts"
        return res
    is_range = len(fields) == 3

    # Field offsets: number-first vs unit-first (java:118-139)
    if fields[0][0] == "-" or fields[0][0].isdigit():
        if is_range:
            unit_idx, start_idx, end_idx, value_idx = 2, 0, 1, -1
        else:
            unit_idx, start_idx, end_idx, value_idx = 1, -1, -1, 0
    else:
        if is_range:
            unit_idx, start_idx, end_idx, value_idx = 0, 1, 2, -1
        else:
            unit_idx, start_idx, end_idx, value_idx = 0, -1, -1, 1

    unit_raw = fields[unit_idx]
    colon = unit_raw.find(vocab.REFERENCE_DELIMITER)
    unit = unit_raw[colon + 1 :] if colon != -1 else unit_raw

    is_latlng = False
    lat_str = lng_str = ""
    if not is_range:
        val = fields[value_idx]
        if not is_number(val):
            res.error_counter = "MCF_QuantityMalformedValue"
            return res
        res.dcid = unit + val
        res.name = unit + " " + val
    else:
        start, end = fields[start_idx], fields[end_idx]
        if unit.lower() == "latlong":
            is_latlng = True
            lat_str, lng_str = start, end
            if lat_str[-1:].upper() == "N":
                lat_str = lat_str[:-1]
            elif lat_str[-1:].upper() == "S":
                lat_str = "-" + lat_str[:-1]
            if lng_str[-1:].upper() == "E":
                lng_str = lng_str[:-1]
            elif lng_str[-1:].upper() == "W":
                lng_str = "-" + lng_str[:-1]
            try:
                lat = float(lat_str)
                if not -90.0 <= lat <= 90.0:
                    raise ValueError
            except ValueError:
                res.error_counter = "MCF_InvalidLatitude"
                return res
            try:
                lng = float(lng_str)
                if not -180.0 <= lng <= 180.0:
                    raise ValueError
            except ValueError:
                res.error_counter = "MCF_InvalidLongitude"
                return res
            lat_e5 = _java_round_half_up(1e5 * lat)
            lng_e5 = _java_round_half_up(1e5 * lng)
            res.dcid = f"{vocab.GEO_DCID_PREFIX}/{lat_e5}_{lng_e5}"
            res.name = f"{lat_e5 / 1e5:.5f},{lng_e5 / 1e5:.5f}"
        else:
            if not (is_number(start) or start == "-"):
                res.error_counter = "MCF_QuantityRangeMalformedValues"
                return res
            if not (is_number(end) or end == "-"):
                res.error_counter = "MCF_QuantityRangeMalformedValues"
                return res
            if start == "-" and end == "-":
                res.error_counter = "MCF_QuantityRangeMalformedValues"
                return res
            if start == "-":
                res.dcid = f"{unit}Upto{end}"
                res.name = f"{unit} UpTo {end}"
            elif end == "-":
                res.dcid = f"{unit}{start}Onwards"
                res.name = f"{unit} {start} Onwards"
            else:
                res.dcid = f"{unit}{start}To{end}"
                res.name = f"{unit} {start} To {end}"

    if build_node:
        node: Node = {
            vocab.DCID: [(res.dcid, ValueType.TEXT)],
            vocab.NAME: [(res.name, ValueType.TEXT)],
        }
        if is_latlng:
            node[vocab.TYPE_OF] = [
                (vocab.GEO_COORDINATES_TYPE, ValueType.RESOLVED_REF)
            ]
            node[vocab.LATITUDE] = [(fields[start_idx], ValueType.TEXT)]
            node[vocab.LONGITUDE] = [(fields[end_idx], ValueType.TEXT)]
        elif not is_range:
            node[vocab.TYPE_OF] = [(vocab.QUANTITY_TYPE, ValueType.RESOLVED_REF)]
            node["value"] = [(fields[value_idx], ValueType.NUMBER)]
            node["unitOfMeasure"] = [(unit, ValueType.RESOLVED_REF)]
        else:
            start, end = fields[start_idx], fields[end_idx]
            node[vocab.TYPE_OF] = [
                (vocab.QUANTITY_RANGE_TYPE, ValueType.RESOLVED_REF)
            ]
            node["startValue"] = [
                (start, ValueType.TEXT if start == "-" else ValueType.NUMBER)
            ]
            node["endValue"] = [
                (end, ValueType.TEXT if end == "-" else ValueType.NUMBER)
            ]
            node["unit"] = [(unit, ValueType.RESOLVED_REF)]
        if main_node and vocab.PROVENANCE in main_node:
            node[vocab.PROVENANCE] = list(main_node[vocab.PROVENANCE])
        res.node = node
    return res
