"""Node sanity checks — the reference's McfChecker semantics
(util/src/main/java/org/datacommons/util/McfChecker.java:44-830).

Every check logs a counter (``Sanity_*``) and marks the node failed
(any addLog — error OR warning — sets nodeFailure,
McfChecker.java:786-794); failed nodes are routed to the failed sink by
the caller, mirroring WriterPair. Existence checks (network) are out of
scope offline; the hook accepts a known-dcid set for semi-join
existence checking instead.
"""

from __future__ import annotations

import re

from import_ray.core import vocab
from import_ray.core.model import (
    Node,
    ValueType,
    get_prop_val,
    get_prop_vals,
    strip_namespace,
)
from import_ray.functions.strings import get_valid_iso8601_date_pattern, is_number
from import_ray.state.counters import (
    LEVEL_ERROR,
    LEVEL_WARNING,
    CounterSet,
)

MAX_DCID_LENGTH = 256
# a-z A-Z 0-9 _ & + - % / . )( :   (McfChecker.java:44-49)
_VALID_DCID = re.compile(r"^[\w&/%\)\(+\-\.:]+$")
_VALID_BIO_DCID = re.compile(r"^[\w&/%\)\(+\-\.'\*><\]\[|:; ]+$")

_PROPS_ONLY_IN_PROP = (vocab.DOMAIN_INCLUDES, vocab.RANGE_INCLUDES, vocab.SUB_PROPERTY_OF)
_PROPS_ONLY_IN_CLASS = (vocab.SUB_CLASS_OF,)
_CLASS_REFS_IN_CLASS = {vocab.NAME, vocab.LABEL, vocab.DCID, vocab.SUB_CLASS_OF}
_CLASS_REFS_IN_PROP = {vocab.DOMAIN_INCLUDES, vocab.RANGE_INCLUDES}
_PROP_REFS_IN_PROP = {vocab.NAME, vocab.LABEL, vocab.DCID, vocab.SUB_PROPERTY_OF}


class NodeChecker:
    """Checks one node at a time; accumulates counters; returns pass/fail."""

    def __init__(
        self,
        counters: CounterSet | None = None,
        allow_nan_svobs: bool = True,
        known_dcids: set[str] | None = None,
        file: str = "",
        is_template: bool = False,
        existence=None,
    ):
        self.counters = counters if counters is not None else CounterSet()
        self.allow_nan_svobs = allow_nan_svobs
        self.known_dcids = known_dcids
        self.file = file
        self.is_template = is_template
        # optional batched checker (state/existence.py): routes reference
        # checks through the submit/drain DC-API protocol instead of the
        # direct known-dcid membership test; caller drains per batch
        self.existence = existence
        self._node_failure = False

    def _log(self, counter: str, message: str, level: str = LEVEL_ERROR):
        self._node_failure = True
        self.counters.add(level, counter, message, self.file)

    def check_node(self, node_id: str, node: Node) -> bool:
        """Returns True when the node passed all checks."""
        self._node_failure = False
        types = self._check_common(node_id, node)
        for type_of in types:
            if vocab.is_stat_var_obs(type_of):
                self._check_svobs(node_id, node)
            elif type_of in (vocab.CLASS_TYPE, vocab.PROPERTY_TYPE):
                self._check_class_or_prop(type_of, node_id, node)
            elif vocab.is_stat_var(type_of):
                self._check_statvar(node_id, node)
            elif vocab.is_legacy_observation(type_of):
                self._check_legacy_obs(node_id, node)
            elif vocab.is_population(type_of):
                self._check_legacy_population(node_id, node)
        return not self._node_failure

    # --- common (McfChecker.checkCommon, java:436-577) -------------------
    def _check_common(self, node_id: str, node: Node) -> list[str]:
        types = get_prop_vals(node, vocab.TYPE_OF)
        if not types:
            self._log(
                f"Sanity_MissingOrEmpty_{vocab.TYPE_OF}",
                f"Found a missing or empty property value :: property: "
                f"'{vocab.TYPE_OF}', node: '{node_id}', type: 'Thing'",
            )
        for t in types:
            if t == vocab.THING_TYPE:
                self._log(
                    "Sanity_TypeThing", f"Found a node with type Thing :: node: '{node_id}'"
                )
                break
        for prop, tvs in node.items():
            if not prop:
                self._log(
                    "Sanity_EmptyProperty", f"Found an empty property :: node: '{node_id}'"
                )
                continue
            if not prop[0].islower():
                self._log(
                    "Sanity_NotInitLowerPropName",
                    f"Found property name that does not start with a lower-case "
                    f":: property: '{prop}', node: '{node_id}'",
                )
                continue
            if prop == vocab.DCID:
                if len(tvs) != 1:
                    self._log(
                        "Sanity_MultipleDcidValues",
                        f"Found dcid with more than one value :: count: "
                        f"{len(tvs)}, node: '{node_id}'",
                    )
                    continue
                value, vtype = tvs[0]
                if vtype == ValueType.TABLE_ENTITY:
                    self._log(
                        "Sanity_DcidTableEntity",
                        f"Value of dcid property must not be an 'E:' reference "
                        f":: value: '{value}', node: '{node_id}'",
                    )
                    continue
                if len(value) > MAX_DCID_LENGTH:
                    self._log(
                        "Sanity_VeryLongDcid",
                        f"Found a very long dcid value; must be less than "
                        f"{MAX_DCID_LENGTH} :: node: '{node_id}'",
                    )
                    continue
                if vtype in (ValueType.TEXT, ValueType.RESOLVED_REF) and not self._check_dcid(
                    value, vocab.DCID, node_id
                ):
                    continue
            for value, vtype in tvs:
                if vtype != ValueType.TEXT and not value.isascii():
                    self._log(
                        "Sanity_NonAsciiValueInNonText",
                        f"Found non-ascii characters in a value that is not text "
                        f":: value: '{value}', property: '{prop}', node: '{node_id}'",
                    )
                if vocab.is_reference_property(prop) and vtype in (
                    ValueType.TEXT,
                    ValueType.NUMBER,
                ):
                    self._log(
                        "Sanity_RefPropHasNonRefValue",
                        f"Found text/numeric value in a reference property :: "
                        f"value: '{value}', property: '{prop}', node: '{node_id}'",
                    )
                if vtype == ValueType.RESOLVED_REF:
                    if not self._check_dcid(value, prop, node_id):
                        pass
                    elif self.existence is not None and self._should_check_existence(
                        prop, types
                    ):
                        v = value.replace("dcAggregate/", "") if prop == vocab.MEASUREMENT_METHOD else value
                        if v:
                            self.existence.submit_node_check(
                                v,
                                lambda counter, msg, _p=prop, _v=v: self.counters.add(
                                    LEVEL_WARNING,
                                    f"{counter}_{_p}",
                                    f"{msg} :: property-ref: '{_p}', node: '{_v}'",
                                    self.file,
                                ),
                            )
                    elif self.known_dcids is not None and self._should_check_existence(
                        prop, types
                    ):
                        v = value.replace("dcAggregate/", "") if prop == vocab.MEASUREMENT_METHOD else value
                        if v and v not in self.known_dcids:
                            self.counters.add(
                                LEVEL_WARNING,
                                f"Existence_MissingReference_{prop}",
                                f"Failed reference existence check :: "
                                f"property-ref: '{prop}', node: '{v}'",
                                self.file,
                            )
        return types

    @staticmethod
    def _should_check_existence(prop: str, types: list[str]) -> bool:
        if any(
            t.endswith(vocab.LEGACY_POPULATION_TYPE_SUFFIX)
            or vocab.is_legacy_observation(t)
            for t in types
        ):
            return False
        if vocab.STAT_VAR_OBSERVATION_TYPE in types and prop not in (
            vocab.VARIABLE_MEASURED,
            vocab.MEASUREMENT_METHOD,
            vocab.UNIT,
        ):
            return False
        return True

    def _check_dcid(self, ref: str, prop: str, node_id: str) -> bool:
        p = _VALID_BIO_DCID if ref.startswith("bio/") else _VALID_DCID
        if not p.match(ref):
            bad = "".join(c for c in ref if not p.match(c))
            self._log(
                f"Sanity_InvalidChars_{prop}",
                f"Found invalid chars in dcid value :: value: '{ref}', "
                f"invalid-chars: '{bad}', property: '{prop}', node: '{node_id}'",
            )
            return False
        return True

    # --- required-prop helpers (java:671-744) ----------------------------
    def _required_single(
        self, node_id: str, node: Node, type_of: str, prop: str, level: str = LEVEL_ERROR
    ) -> str:
        tvs = node.get(prop)
        if not tvs:
            self._log(
                f"Sanity_MissingOrEmpty_{prop}",
                f"Found a missing or empty property value :: property: "
                f"'{prop}', node: '{node_id}', type: '{type_of}'",
                level,
            )
            return ""
        if len(tvs) != 1:
            self._log(
                f"Sanity_MultipleVals_{prop}",
                f"Found multiple values for single-value property :: "
                f"property: '{prop}', node: '{node_id}'",
                level,
            )
            return ""
        return strip_namespace(tvs[0][0])

    def _check_init_casing(
        self,
        node_id: str,
        prop: str,
        value: str,
        type_of: str,
        expect_upper: bool,
    ):
        if not value:
            return
        opt = f"In{type_of}" if type_of else ""
        if expect_upper and not value[0].isupper():
            self._log(
                f"Sanity_NotInitUpper_{prop}{opt}",
                f"Found a class reference that does not start with an "
                f"upper-case :: reference: '{value}', property: '{prop}', node: '{node_id}'",
            )
        elif not expect_upper and not value[0].islower():
            self._log(
                f"Sanity_NotInitLower_{prop}{opt}",
                f"Found a property reference that does not start with a "
                f"lower-case :: reference: '{value}', property: '{prop}', node: '{node_id}'",
            )

    # --- per-type checks --------------------------------------------------
    def _check_statvar(self, node_id: str, node: Node):
        pop_type = self._required_single(
            node_id, node, vocab.STAT_VAR_TYPE, vocab.POPULATION_TYPE, LEVEL_WARNING
        )
        if pop_type:
            self._check_init_casing(node_id, vocab.POPULATION_TYPE, pop_type, "", True)
        m_prop = self._required_single(node_id, node, vocab.STAT_VAR_TYPE, vocab.MEASURED_PROP)
        if m_prop and m_prop != get_prop_val(node, vocab.DCID):
            self._check_init_casing(node_id, vocab.MEASURED_PROP, m_prop, "", False)
        stat_type = self._required_single(node_id, node, vocab.STAT_VAR_TYPE, vocab.STAT_TYPE)
        if (
            stat_type
            and not vocab.is_stat_value_property(stat_type)
            and stat_type != vocab.MEASUREMENT_RESULT
        ):
            self._log(
                "Sanity_UnknownStatType",
                f"Found an unknown statType value :: value: '{stat_type}', node: '{node_id}'",
            )
        self._required_single(node_id, node, vocab.STAT_VAR_TYPE, vocab.DCID)

    def _check_svobs(self, node_id: str, node: Node):
        self._required_single(
            node_id, node, vocab.STAT_VAR_OBSERVATION_TYPE, vocab.VARIABLE_MEASURED
        )
        self._required_single(
            node_id, node, vocab.STAT_VAR_OBSERVATION_TYPE, vocab.OBSERVATION_ABOUT
        )
        obs_date = self._required_single(
            node_id, node, vocab.STAT_VAR_OBSERVATION_TYPE, vocab.OBSERVATION_DATE
        )
        if (
            not self.is_template
            and obs_date
            and not get_valid_iso8601_date_pattern(obs_date)
        ):
            # date is a C: column in a template (McfChecker.java:292-294)
            self._log(
                "Sanity_InvalidObsDate",
                f"Found a non-ISO8601 compliant date value :: value: "
                f"'{obs_date}', property: '{vocab.OBSERVATION_DATE}', node: '{node_id}'",
            )
        obs_value = self._required_single(
            node_id, node, vocab.STAT_VAR_OBSERVATION_TYPE, vocab.GENERIC_VALUE, LEVEL_WARNING
        )
        if obs_value and not self.allow_nan_svobs:
            tvs = node.get(vocab.GENERIC_VALUE) or []
            if not (tvs and tvs[0][1] == ValueType.NUMBER):
                vtype_name = ValueType(tvs[0][1]).name if tvs else ""
                self._log(
                    "Sanity_SVObs_Value_NotANumber",
                    f"Found a non-numeric type in the value field of "
                    f"StatVarObservation but allowNanSVObs was false :: value: "
                    f"'{obs_value}', type: '{vtype_name}', property: "
                    f"'{vocab.GENERIC_VALUE}', node: '{node_id}'",
                )

    def _check_legacy_population(self, node_id: str, node: Node):
        pop_type = self._required_single(
            node_id, node, "StatisticalPopulation", vocab.POPULATION_TYPE
        )
        if pop_type:
            self._check_init_casing(node_id, vocab.POPULATION_TYPE, pop_type, "", True)
        self._required_single(node_id, node, "StatisticalPopulation", vocab.LOCATION)

    def _check_legacy_obs(self, node_id: str, node: Node):
        m_prop = self._required_single(
            node_id, node, vocab.LEGACY_OBSERVATION_TYPE_SUFFIX, vocab.MEASURED_PROP
        )
        if m_prop:
            self._check_init_casing(node_id, vocab.MEASURED_PROP, m_prop, "", False)
        self._required_single(
            node_id, node, vocab.LEGACY_OBSERVATION_TYPE_SUFFIX, vocab.OBSERVED_NODE
        )
        obs_date = self._required_single(
            node_id, node, vocab.LEGACY_OBSERVATION_TYPE_SUFFIX, vocab.OBSERVATION_DATE
        )
        if obs_date and not get_valid_iso8601_date_pattern(obs_date):
            self._log(
                "Sanity_InvalidObsDate",
                f"Found a non-ISO8601 compliant date value :: value: "
                f"'{obs_date}', property: '{vocab.OBSERVATION_DATE}', node: '{node_id}'",
            )
        value_present = False
        for prop in node:
            if vocab.is_stat_value_property(prop):
                val = self._required_single(
                    node_id, node, vocab.LEGACY_OBSERVATION_TYPE_SUFFIX, prop
                )
                if val and not is_number(val):
                    self._log(
                        "Sanity_NonDoubleObsValue",
                        f"Found a non-double Observation value :: value: "
                        f"'{val}', property: '{prop}', node: '{node_id}'",
                    )
                value_present = True
        if not value_present:
            if not get_prop_vals(node, vocab.MEASUREMENT_RESULT):
                self._log(
                    "Sanity_ObsMissingValueProp",
                    f"Observation node missing value property :: node: '{node_id}'",
                    LEVEL_WARNING,
                )
            else:
                self._required_single(
                    node_id,
                    node,
                    vocab.LEGACY_OBSERVATION_TYPE_SUFFIX,
                    vocab.MEASUREMENT_RESULT,
                )

    def _check_class_or_prop(self, type_of: str, node_id: str, node: Node):
        unexpected = (
            _PROPS_ONLY_IN_PROP if type_of == vocab.CLASS_TYPE else _PROPS_ONLY_IN_CLASS
        )
        for prop in unexpected:
            if get_prop_val(node, prop):
                self._log(
                    f"Sanity_UnexpectedPropIn{type_of}",
                    f"Unexpected property in {type_of} node :: property: "
                    f"'{prop}', node: '{node_id}'",
                )
        for prop, tvs in node.items():
            for value, vtype in tvs:
                if not value:
                    self._log(
                        "Sanity_EmptySchemaValue",
                        f"Found empty property value :: property: '{prop}', node '{node_id}'",
                    )
                    continue
                if not value.isascii():
                    self._log(
                        "Sanity_NonAsciiValueInSchema",
                        f"Schema node has property values with non-ascii "
                        f"characters :: value: '{value}', property: '{prop}', node: '{node_id}'",
                    )
                    continue
                if (type_of == vocab.CLASS_TYPE and prop in _CLASS_REFS_IN_CLASS) or (
                    type_of == vocab.PROPERTY_TYPE and prop in _CLASS_REFS_IN_PROP
                ):
                    self._check_init_casing(node_id, prop, value, type_of, True)
                if type_of == vocab.PROPERTY_TYPE and prop in _PROP_REFS_IN_PROP:
                    self._check_init_casing(node_id, prop, value, type_of, False)
        dcid_val = get_prop_val(node, vocab.DCID)
        name = get_prop_val(node, vocab.NAME) or get_prop_val(node, vocab.LABEL)
        if dcid_val and name and dcid_val != name:
            self._log(
                "Sanity_DcidNameMismatchInSchema",
                f"Schema node with dcid/name mismatch :: name: '{name}', "
                f"dcid: '{dcid_val}', node: '{node_id}'",
            )
        if type_of == vocab.CLASS_TYPE and dcid_val != vocab.THING_TYPE:
            if not get_prop_vals(node, vocab.SUB_CLASS_OF):
                self._log(
                    f"Sanity_MissingOrEmpty_{vocab.SUB_CLASS_OF}",
                    f"Found a missing or empty property value :: property: "
                    f"'{vocab.SUB_CLASS_OF}', node: '{node_id}', type: '{vocab.CLASS_TYPE}'",
                )


    # --- TMCF template checks (McfChecker.checkTemplateNode, java:173-226) ---
    def check_template_node(
        self,
        node_id: str,
        node: Node,
        template: dict,
        columns: set[str] | None,
    ) -> bool:
        from import_ray.sources.mcf import parse_schema_term

        for prop, tvs in node.items():
            for value, vtype in tvs:
                if vtype == ValueType.TABLE_ENTITY:
                    if value not in template:
                        self._log(
                            "Sanity_TmcfMissingEntityDef",
                            f"No definition found for a referenced 'E:' value :: "
                            f"reference: '{value}', property: '{prop}' node: '{node_id}'",
                        )
                elif vtype == ValueType.TABLE_COLUMN:
                    term = parse_schema_term(value)
                    if term is None or term[0] != "column":
                        self._log(
                            "Sanity_UnexpectedNonColumn",
                            f"Expected value to be a TMCF column that starts with "
                            f"'C:' :: value: '{value}', property: '{prop}', node: '{node_id}'",
                        )
                        continue
                    if columns is not None and term[2] not in columns:
                        self._log(
                            "Sanity_TmcfMissingColumn",
                            f"Column referred to in TMCF is missing from CSV "
                            f"header :: column: '{term[2]}', node: '{node_id}'",
                        )
        return not self._node_failure


def check_template(
    template: dict,
    columns: set[str] | None,
    counters: CounterSet,
    allow_nan_svobs: bool = True,
    file: str = "",
) -> bool:
    """McfChecker.checkTemplate (java:101-111 + check() loop): full node
    checks plus template E:/C: reference checks against the CSV header.
    Returns True when no node failed (any logged issue fails a node)."""
    checker = NodeChecker(
        counters, allow_nan_svobs=allow_nan_svobs, file=file, is_template=True
    )
    ok = True
    for node_id, node in template.items():
        passed = checker.check_node(node_id, node)
        passed = checker.check_template_node(node_id, node, template, columns) and passed
        ok = ok and passed
    return ok
