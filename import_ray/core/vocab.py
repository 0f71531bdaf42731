"""Data Commons vocabulary: well-known property / type names.

Reimplements the constant sets the reference semantics depend on
(reference: util/src/main/java/org/datacommons/util/Vocabulary.java:21-381).
Only the subsets the engine actually uses are carried.
"""

from __future__ import annotations

# --- core properties ---------------------------------------------------------
TYPE_OF = "typeOf"
SUB_CLASS_OF = "subClassOf"
SUB_PROPERTY_OF = "subPropertyOf"
RANGE_INCLUDES = "rangeIncludes"
DOMAIN_INCLUDES = "domainIncludes"
SPECIALIZATION_OF = "specializationOf"
MEMBER_OF = "memberOf"
DCID = "dcid"
PROVENANCE = "provenance"
NAME = "name"
LABEL = "label"
DESCRIPTION = "description"
DESCRIPTION_URL = "descriptionUrl"
ALTERNATE_NAME = "alternateName"
URL = "url"
KEY_STRING = "keyString"
LOCAL_CURATOR_LEVEL_ID = "localCuratorLevelId"
DBG_MCF_FILE = "resMCFFile"
IS_PUBLIC = "isPublic"

# --- place properties --------------------------------------------------------
LATITUDE = "latitude"
LONGITUDE = "longitude"
CONTAINED_IN_PLACE = "containedInPlace"
GEO_DCID_PREFIX = "latLong"
UN_DATA_CODE = "unDataCode"
GEO_ID = "geoId"
WIKIDATA_ID = "wikidataId"
GEO_NAMES_ID = "geoNamesId"
ISO_CODE = "isoCode"
NUTS_CODE = "nutsCode"
INDIAN_CENSUS_AREA_CODE_2001 = "indianCensusAreaCode2001"
INDIAN_CENSUS_AREA_CODE_2011 = "indianCensusAreaCode2011"
LGD_CODE = "lgdCode"
UDISE_CODE = "udiseCode"
FIPS_ALPHA_CODE = "fips52AlphaCode"
COUNTRY_ALPHA_CODE = "countryAlpha3Code"
COUNTRY_NUMERIC_CODE = "countryNumericCode"
ISTAT_ID = "istatId"
AUSTRIAN_MUNICIPALITY_KEY = "austrianMunicipalityKey"
CENSUS_ACS_TABLE_ID = "censusACSTableId"

# --- statvar / observation properties ---------------------------------------
POPULATION_TYPE = "populationType"
MEASURED_PROP = "measuredProperty"
OBSERVATION_ABOUT = "observationAbout"
VARIABLE_MEASURED = "variableMeasured"
STAT_TYPE = "statType"
CONSTRAINT_PROPS = "constraintProperties"
OBSERVATION_PROPERTIES = "observationProperties"
MEASUREMENT_DENOMINATOR = "measurementDenominator"
MEASUREMENT_QUALIFIER = "measurementQualifier"
SCALING_FACTOR = "scalingFactor"
UNIT = "unit"
MEASUREMENT_METHOD = "measurementMethod"
OBSERVATION_DATE = "observationDate"
OBSERVATION_PERIOD = "observationPeriod"
GENERIC_VALUE = "value"
OBSERVED_NODE = "observedNode"
LOCATION = "location"
CHILDHOOD_LOCATION = "childhoodLocation"
POPULATION_GROUP = "populationGroup"
UTTERANCE_TEMPLATE = "utteranceTemplate"
SOURCE = "source"
FOOTNOTE = "footnote"
IS_NORMALIZABLE = "isNormalizable"
DENOMINATOR_FOR_NORMALIZATION = "denominatorForNormalization"
DEFINITION = "definition"
LINKED_MEMBER = "linkedMember"
LINKED_MEMBER_OF = "linkedMemberOf"
MEASUREMENT_RESULT = "measurementResult"

# --- statType values ---------------------------------------------------------
MEDIAN_VALUE = "medianValue"
MEAN_VALUE = "meanValue"
MIN_VALUE = "minValue"
MAX_VALUE = "maxValue"
SUM_VALUE = "sumValue"
MEASURED_VALUE = "measuredValue"
STD_DEVIATION_VALUE = "stdDeviationValue"
PERCENTILE_10 = "percentile10"
PERCENTILE_25 = "percentile25"
PERCENTILE_75 = "percentile75"
PERCENTILE_90 = "percentile90"
MARGIN_OF_ERROR = "marginOfError"
STD_ERROR = "stdError"
MEAN_STD_ERROR = "meanStdError"
SAMPLE_SIZE = "sampleSize"
GROWTH_RATE = "growthRate"
CONFIDENCE_INTERVAL_LOWER_LIMIT = "confidenceIntervalLowerLimit"
CONFIDENCE_INTERVAL_UPPER_LIMIT = "confidenceIntervalUpperLimit"
KURTOSIS = "kurtosisValue"
SKEWNESS = "skewnessValue"

STAT_VALUE_PROPERTIES = {
    MEDIAN_VALUE,
    MEAN_VALUE,
    MIN_VALUE,
    MAX_VALUE,
    SUM_VALUE,
    MEASURED_VALUE,
    STD_DEVIATION_VALUE,
    MARGIN_OF_ERROR,
    STD_ERROR,
    MEAN_STD_ERROR,
    SAMPLE_SIZE,
    GROWTH_RATE,
    PERCENTILE_10,
    PERCENTILE_25,
    PERCENTILE_75,
    PERCENTILE_90,
}

# --- types -------------------------------------------------------------------
STAT_VAR_TYPE = "StatisticalVariable"
STAT_VAR_OBSERVATION_TYPE = "StatVarObservation"
LEGACY_OBSERVATION_TYPE_SUFFIX = "Observation"
LEGACY_POPULATION_TYPE_SUFFIX = "Population"
CLASS_TYPE = "Class"
PROPERTY_TYPE = "Property"
QUANTITY_TYPE = "Quantity"
QUANTITY_RANGE_TYPE = "QuantityRange"
GEO_COORDINATES_TYPE = "GeoCoordinates"
THING_TYPE = "Thing"
PLACE_TYPE = "Place"
SOURCE_TYPE = "Source"
CURATOR_TYPE = "Curator"
PROVENANCE_TYPE = "Provenance"

CITY = "City"
COUNTY = "County"
PROVINCE = "Province"
STATE = "State"
COUNTRY = "Country"
CONTINENT = "Continent"
TOWN = "Town"
VILLAGE = "Village"
NEIGHBORHOOD = "Neighborhood"
ADMIN_AREA = "AdministrativeArea"
ADMIN_AREA_1 = "AdministrativeArea1"
ADMIN_AREA_2 = "AdministrativeArea2"
ADMIN_AREA_3 = "AdministrativeArea3"
ADMIN_AREA_4 = "AdministrativeArea4"
ADMIN_AREA_5 = "AdministrativeArea5"

# --- MCF syntax --------------------------------------------------------------
NODE = "Node"
CONTEXT = "Context"
NAMESPACE = "namespace"
VALUE_SEPARATOR = ","
REFERENCE_DELIMITER = ":"
INTERNAL_REF_PREFIX = "l:"
DCID_PREFIX = "dcid:"
DC_SCHEMA_PREFIX = "dcs:"
SCHEMA_ORG_PREFIX = "schema:"
ENTITY_PREFIX = "E:"
COLUMN_PREFIX = "C:"
TABLE_DELIMITER = "->"
FUNCTIONAL_DEPS = "functionalDeps"

NAMESPACE_PREFIXES = (DCID_PREFIX, DC_SCHEMA_PREFIX, SCHEMA_ORG_PREFIX)

# --- constant sets mirrored from Vocabulary.java -----------------------------
# Vocabulary.java:244-289
NON_CONSTRAINT_STAT_VAR_PROPERTIES = {
    TYPE_OF,
    DCID,
    PROVENANCE,
    IS_PUBLIC,
    LOCAL_CURATOR_LEVEL_ID,
    URL,
    MEMBER_OF,
    NAME,
    LABEL,
    DESCRIPTION,
    DESCRIPTION_URL,
    ALTERNATE_NAME,
    UTTERANCE_TEMPLATE,
    SOURCE,
    FOOTNOTE,
    KEY_STRING,
    DBG_MCF_FILE,
    POPULATION_TYPE,
    POPULATION_GROUP,
    LOCATION,
    CHILDHOOD_LOCATION,
    CONSTRAINT_PROPS,
    MEASURED_PROP,
    STAT_TYPE,
    MEASUREMENT_DENOMINATOR,
    MEASUREMENT_QUALIFIER,
    CENSUS_ACS_TABLE_ID,
    MEASUREMENT_METHOD,
    SCALING_FACTOR,
    UNIT,
    IS_NORMALIZABLE,
    DENOMINATOR_FOR_NORMALIZATION,
    OBSERVATION_PROPERTIES,
    DEFINITION,
    LINKED_MEMBER,
    LINKED_MEMBER_OF,
}

# Ordered preference list of externally-resolvable place id properties.
# Vocabulary.java:291-307
PLACE_RESOLVABLE_AND_ASSIGNABLE_IDS = (
    UN_DATA_CODE,
    GEO_ID,
    ISO_CODE,
    NUTS_CODE,
    WIKIDATA_ID,
    GEO_NAMES_ID,
    ISTAT_ID,
    AUSTRIAN_MUNICIPALITY_KEY,
    INDIAN_CENSUS_AREA_CODE_2011,
    INDIAN_CENSUS_AREA_CODE_2001,
    LGD_CODE,
    UDISE_CODE,
    FIPS_ALPHA_CODE,
    COUNTRY_ALPHA_CODE,
    COUNTRY_NUMERIC_CODE,
)

_SCHEMA_REFERENCE_PROPERTIES = {
    TYPE_OF,
    SUB_CLASS_OF,
    SUB_PROPERTY_OF,
    RANGE_INCLUDES,
    DOMAIN_INCLUDES,
    SPECIALIZATION_OF,
    MEMBER_OF,
}

# Vocabulary.isReferenceProperty (Vocabulary.java:319-337)
_REFERENCE_PROPERTIES = _SCHEMA_REFERENCE_PROPERTIES | {
    LOCATION,
    OBSERVED_NODE,
    CONTAINED_IN_PLACE,
    "containedIn",
    OBSERVATION_ABOUT,
    VARIABLE_MEASURED,
    POPULATION_TYPE,
    MEASURED_PROP,
    POPULATION_GROUP,
    CONSTRAINT_PROPS,
    MEASUREMENT_METHOD,
    MEASUREMENT_DENOMINATOR,
    MEASUREMENT_QUALIFIER,
    STAT_TYPE,
    UNIT,
    OBSERVATION_PROPERTIES,
}


def is_schema_reference_property(prop: str) -> bool:
    return prop in _SCHEMA_REFERENCE_PROPERTIES


def is_reference_property(prop: str) -> bool:
    return prop in _REFERENCE_PROPERTIES


def is_global_reference(val: str) -> bool:
    return val.startswith(NAMESPACE_PREFIXES)


def is_internal_reference(val: str) -> bool:
    return val.startswith(INTERNAL_REF_PREFIX)


def is_stat_value_property(prop: str) -> bool:
    """Heuristic from Vocabulary.isStatValueProperty (Vocabulary.java:349-361)."""
    lc = prop.lower()
    return (
        lc.endswith("value")
        or lc.endswith("estimate")
        or lc.startswith("percentile")
        or lc == "marginoferror"
        or lc.endswith("stderror")
        or lc.endswith("samplesize")
        or lc.endswith("growthrate")
        or lc.endswith("limit")
        or lc.endswith("ratio")
    )


def is_stat_var(type_name: str) -> bool:
    return type_name == STAT_VAR_TYPE


def is_stat_var_obs(type_name: str) -> bool:
    return type_name == STAT_VAR_OBSERVATION_TYPE


def is_legacy_observation(type_name: str) -> bool:
    return (
        type_name.endswith(LEGACY_OBSERVATION_TYPE_SUFFIX)
        and type_name != STAT_VAR_OBSERVATION_TYPE
    )


def is_population(type_name: str) -> bool:
    return type_name.endswith(LEGACY_POPULATION_TYPE_SUFFIX)
