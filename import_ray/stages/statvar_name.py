"""Readable StatVar display-name generation.

Reimplements the reference's StatVarNameGenerator semantics
(util/src/main/java/org/datacommons/util/StatVarNameGenerator.java:34-267):
camel-case/underscore token splitting to Title Case, statType prefix
(with "Value" suffix stripped), periodic measurementQualifiers promoted
to prefix, measure-of-population combining rules, sorted constraint
values, and measurementDenominator rendered as "(Per capita)" /
"(As fraction of ...)".
"""

from __future__ import annotations

import re

from import_ray.core import vocab
from import_ray.core.model import Node, get_prop_val, get_prop_vals, strip_namespace

_CAMEL_1 = re.compile(r"([a-z0-9])([A-Z])")
_CAMEL_2 = re.compile(r"([A-Z])([A-Z][a-z])")
_LETTER_NUM = re.compile(r"([a-zA-Z])([0-9])")
_NUM_LETTER = re.compile(r"([0-9])([a-zA-Z])")
_MULTI_SPACE = re.compile(r"\s+")
_MQUAL_SPLIT = re.compile(r"[,\s&]+")

_PERIODS = {"daily", "weekly", "monthly", "quarterly", "annual"}


def format_token(token: str) -> str:
    if not token:
        return ""
    s = strip_namespace(token).replace("_", " ")
    s = _CAMEL_1.sub(r"\1 \2", s)
    s = _CAMEL_2.sub(r"\1 \2", s)
    s = _LETTER_NUM.sub(r"\1 \2", s)
    s = _NUM_LETTER.sub(r"\1 \2", s)
    s = _MULTI_SPACE.sub(" ", s).strip()
    return " ".join(w[0].upper() + w[1:] for w in s.split(" ") if w)


def _is_generic_pop_type(pop_type: str) -> bool:
    return not pop_type or pop_type.lower() == "thing"


def generate_statvar_name(node: Node) -> str:
    stat_type = get_prop_val(node, vocab.STAT_TYPE)
    measured_prop = get_prop_val(node, vocab.MEASURED_PROP)
    population_type = get_prop_val(node, vocab.POPULATION_TYPE)
    mdenom = get_prop_val(node, vocab.MEASUREMENT_DENOMINATOR)

    prefix_list: list[str] = []
    if stat_type and stat_type.lower() not in ("measuredvalue", "dcid:measuredvalue"):
        st = stat_type
        if len(st) > 5 and st.lower().endswith("value"):
            st = st[:-5]
        formatted = format_token(st)
        if formatted:
            prefix_list.append(formatted)

    mqual_list: list[str] = []
    mquals = get_prop_vals(node, vocab.MEASUREMENT_QUALIFIER)
    if mquals:
        effective: list[str] = []
        for q in mquals:
            for part in _MQUAL_SPLIT.split(q):
                part = part.strip()
                if not part:
                    continue
                if part.lower() in _PERIODS:
                    prefix_list.append(format_token(part))
                else:
                    effective.append(format_token(part))
        if effective:
            mqual_list.append("(" + " & ".join(effective) + ")")

    formatted_measure = format_token(measured_prop)
    formatted_pop = format_token(population_type)
    measure_and_pop = formatted_measure
    if formatted_pop and not _is_generic_pop_type(population_type) and not _is_generic_pop_type(formatted_pop):
        mp_low, pt_low = measure_and_pop.lower(), formatted_pop.lower()
        if not measure_and_pop:
            measure_and_pop = formatted_pop
        elif mp_low != pt_low and pt_low not in mp_low and mp_low not in pt_low:
            measure_and_pop = measure_and_pop + " Of " + formatted_pop
        elif mp_low in pt_low and mp_low != pt_low:
            measure_and_pop = formatted_pop

    constraint_vals: list[str] = []
    for raw_prop in sorted(node):
        prop = strip_namespace(raw_prop)
        if prop in vocab.NON_CONSTRAINT_STAT_VAR_PROPERTIES:
            continue
        for val in get_prop_vals(node, raw_prop):
            if val.lower() == "true":
                constraint_vals.append(format_token(prop))
            elif val.lower() == "false":
                constraint_vals.append(format_token(prop) + " (False)")
            else:
                fv = format_token(val)
                if fv:
                    constraint_vals.append(fv)

    mdenom_list: list[str] = []
    if mdenom:
        if mdenom.lower() in ("count_person", "person"):
            mdenom_list.append("(Per capita)")
        else:
            parts = [format_token(p) for p in mdenom.split("_") if p.strip()]
            mdenom_list.append("(As fraction of " + " ".join(parts) + ")")

    parts: list[str] = []
    if prefix_list:
        parts.append(" ".join(prefix_list))
    if measure_and_pop:
        parts.append(measure_and_pop)
    if mqual_list:
        parts.append(" ".join(mqual_list))
    base = " ".join(parts)
    if constraint_vals:
        base = (base + ": " if base else "") + ", ".join(constraint_vals)
    if mdenom_list:
        base = (base + " " if base else "") + " ".join(mdenom_list)
    return base.strip()
