"""Content-hash DCID generation — bit-compatible with the reference.

Reimplements the semantics of the reference's DcidGenerator
(util/src/main/java/org/datacommons/util/DcidGenerator.java):

- ``long_id(s)``: farmHashFingerprint64(UTF-8) → custom base32
  (least-significant 5 bits first, variable length, alphabet at
  DcidGenerator.java:29-36).
- ``for_stat_var_obs``: ordered key props joined as ``prop=value``
  (DcidGenerator.java:74-83,180-211), namespace ``dc/o/``.
- ``for_stat_var``: sorted fixed + constraint props
  (DcidGenerator.java:133-176), namespace ``dc/``.
- ``for_place``: first present ranked external id → ``<prefix>/<val>``
  with ``isoCode``→``iso``, ``nutsCode``→``nuts`` rewrites
  (DcidGenerator.java:213-229).

Verified against golden dcids from the reference's genmcf fixtures
(FIXTURES.md §F7, e.g. ``dc/o/qsplnlg5x13m2``).
"""

from __future__ import annotations

from import_ray.core import vocab
from import_ray.functions.farmhash import fingerprint64

# int → char map, 32 chars (digits + consonants + 'e'); DcidGenerator.java:29-33
_BASE32_ALPHABET = "0123456789bcdfghjklmnpqrstvwxyze"

DC_NAMESPACE = "dc/"
SVOBS_NAMESPACE = "dc/o/"
OBS_NAMESPACE = "dc/o/"
POP_NAMESPACE = "dc/p/"

# DcidGenerator.java:74-83 — ordered SVObs key props; props up to and
# including "value" are required.
ORDERED_STAT_VAR_OBS_KEY_PROPS = (
    vocab.OBSERVATION_ABOUT,
    vocab.VARIABLE_MEASURED,
    vocab.OBSERVATION_DATE,
    vocab.GENERIC_VALUE,
    vocab.OBSERVATION_PERIOD,
    vocab.UNIT,
    vocab.MEASUREMENT_METHOD,
    vocab.SCALING_FACTOR,
)
LAST_REQUIRED_SVOBS_PROP_INDEX = ORDERED_STAT_VAR_OBS_KEY_PROPS.index(
    vocab.GENERIC_VALUE
)

# DcidGenerator.java:66-72
FIXED_STAT_VAR_PROPS = frozenset(
    {
        vocab.TYPE_OF,
        vocab.POPULATION_TYPE,
        vocab.MEASURED_PROP,
        vocab.STAT_TYPE,
        vocab.MEASUREMENT_QUALIFIER,
        vocab.MEASUREMENT_DENOMINATOR,
    }
)


def base32_encode(fp: int) -> str:
    """Variable-length little-endian base32 of a 64-bit fingerprint.

    Emits the least-significant 5 bits first and stops when the
    remaining value is zero (DcidGenerator.base32Encode, java:337-351).
    """
    out = []
    while True:
        out.append(_BASE32_ALPHABET[fp & 0x1F])
        fp >>= 5
        if fp == 0:
            return "".join(out)


def long_id(key_string: str) -> str:
    return base32_encode(fingerprint64(key_string))


def for_serialized_prop_vals(schema_type: str, key_string: str) -> str:
    """Namespace selection per DcidGenerator.forSerializedPropVals (java:313-333)."""
    if schema_type.endswith(vocab.LEGACY_POPULATION_TYPE_SUFFIX):
        return POP_NAMESPACE + long_id(key_string)
    if schema_type == vocab.STAT_VAR_OBSERVATION_TYPE:
        return SVOBS_NAMESPACE + long_id(key_string)
    if schema_type.endswith(vocab.LEGACY_OBSERVATION_TYPE_SUFFIX):
        return OBS_NAMESPACE + long_id(key_string)
    return DC_NAMESPACE + long_id(key_string)


def for_stat_var_obs(pvs: dict[str, str]) -> tuple[str, str]:
    """(dcid, key_string) for a StatVarObservation node.

    ``pvs`` maps property → single scalar value (namespace-stripped for
    refs). Returns ("", "") when a required prop is missing or a ref is
    still local (DcidGenerator.forStatVarObs, java:181-212).
    """
    type_of = pvs.get(vocab.TYPE_OF, "")
    if not type_of:
        return "", ""
    parts = []
    for i, prop in enumerate(ORDERED_STAT_VAR_OBS_KEY_PROPS):
        val = pvs.get(prop)
        if val is None or val == "":
            if i <= LAST_REQUIRED_SVOBS_PROP_INDEX:
                return "", ""
            continue
        if prop in (vocab.VARIABLE_MEASURED, vocab.OBSERVATION_ABOUT) and val.startswith(
            vocab.INTERNAL_REF_PREFIX
        ):
            return "", ""
        parts.append(f"{prop}={val}")
    key_string = "".join(parts)
    return for_serialized_prop_vals(type_of, key_string), key_string


def for_stat_var(pvs: dict[str, str]) -> tuple[str, str]:
    """(dcid, key_string) for a StatisticalVariable node.

    Key = sorted union of fixed SV props and constraint props present on
    the node, joined as ``prop=value`` (DcidGenerator.forStatVar,
    java:133-178). Complex values must already be replaced by their
    computed dcids (the mutate stage does that before dcid assignment).
    """
    type_of = pvs.get(vocab.TYPE_OF, "")
    if not type_of:
        return "", ""
    props = sorted(
        p
        for p in pvs
        if p in FIXED_STAT_VAR_PROPS
        or p not in vocab.NON_CONSTRAINT_STAT_VAR_PROPERTIES
    )
    parts = [f"{p}={pvs[p]}" for p in props if pvs.get(p) not in (None, "")]
    key_string = "".join(parts)
    return for_serialized_prop_vals(type_of, key_string), key_string


# DcidGenerator.java:88-120 — ordered legacy Observation key props;
# props up to and including measuredProperty are required.
ORDERED_LEGACY_OBS_KEY_PROPS = (
    vocab.OBSERVED_NODE,
    vocab.OBSERVATION_DATE,
    vocab.MEASURED_PROP,
    vocab.OBSERVATION_PERIOD,
    vocab.UNIT,
    vocab.MEASURED_VALUE,
    vocab.MIN_VALUE,
    vocab.MAX_VALUE,
    vocab.SUM_VALUE,
    vocab.MEAN_VALUE,
    vocab.MEDIAN_VALUE,
    vocab.MARGIN_OF_ERROR,
    vocab.MEASUREMENT_METHOD,
    vocab.MEASUREMENT_RESULT,
    vocab.STD_ERROR,
    vocab.SAMPLE_SIZE,
    vocab.PERCENTILE_10,
    vocab.PERCENTILE_25,
    vocab.PERCENTILE_75,
    vocab.PERCENTILE_90,
    vocab.MEAN_STD_ERROR,
    vocab.GROWTH_RATE,
    vocab.STD_DEVIATION_VALUE,
    vocab.CONFIDENCE_INTERVAL_LOWER_LIMIT,
    vocab.CONFIDENCE_INTERVAL_UPPER_LIMIT,
    vocab.KURTOSIS,
    vocab.SKEWNESS,
    vocab.MEASUREMENT_DENOMINATOR,
    vocab.MEASUREMENT_QUALIFIER,
    vocab.SCALING_FACTOR,
)
LAST_REQUIRED_LEGACY_OBS_PROP_INDEX = ORDERED_LEGACY_OBS_KEY_PROPS.index(
    vocab.MEASURED_PROP
)


def for_observation(pvs: dict[str, str]) -> tuple[str, str]:
    """(dcid, key_string) for a legacy Observation node
    (DcidGenerator.forObservation, java:289-311)."""
    parts = []
    for i, prop in enumerate(ORDERED_LEGACY_OBS_KEY_PROPS):
        val = pvs.get(prop)
        if val is None or val == "":
            if i <= LAST_REQUIRED_LEGACY_OBS_PROP_INDEX:
                return "", ""
            continue
        parts.append(f"{prop}={val}")
    key_string = "".join(parts)
    return OBS_NAMESPACE + long_id(key_string), key_string


def for_population(node_id: str, node: dict) -> tuple[str, str]:
    """(dcid, key_string) for a legacy StatisticalPopulation node
    (DcidGenerator.forPopulation, java:237-287). ``node`` is a Node
    (prop → [(value, type)]); complex values must already be resolved.
    """
    pv_map: dict[str, str] = {}
    constraints: set[str] = set()
    for prop, tvs in node.items():
        if not tvs:
            continue
        if prop == vocab.CONSTRAINT_PROPS:
            constraints.update(v for v, _ in tvs)
        else:
            val = tvs[0][0]
            if prop == vocab.LOCATION and val.startswith(vocab.INTERNAL_REF_PREFIX):
                return "", ""
            pv_map[prop] = val
    ordered_cprops = sorted(
        p
        for p in pv_map
        if p not in vocab.NON_CONSTRAINT_STAT_VAR_PROPERTIES
        and (not constraints or p in constraints)
    )
    pop_type = pv_map.get(vocab.POPULATION_TYPE, "")
    if not pop_type:
        return "", ""
    location = pv_map.get(vocab.LOCATION, "")
    if not location:
        return "", ""
    parts = [pop_type, location, pv_map.get(vocab.MEMBER_OF, "")]
    parts += [f"{p}{pv_map[p]}" for p in ordered_cprops]
    key_string = "".join(parts)
    return POP_NAMESPACE + long_id(key_string), key_string


def for_place(pvs: dict[str, str]) -> str:
    """dcid from the highest-ranked external id present, or "".

    DcidGenerator.forPlace (java:214-229): prefix is the property name,
    except isoCode→iso and nutsCode→nuts.
    """
    for prop in vocab.PLACE_RESOLVABLE_AND_ASSIGNABLE_IDS:
        val = pvs.get(prop)
        if val:
            if prop == vocab.ISO_CODE:
                prefix = "iso"
            elif prop == vocab.NUTS_CODE:
                prefix = "nuts"
            else:
                prefix = prop
            return f"{prefix}/{val}"
    return ""
