"""Explicit StructTypes for the 18 USNVC export tables.

Reference parity: the reference lets pandas infer dtypes with pins
for id columns (reference usnvc/usnvc.py:109-114, 130-131, 166-173).
At scale, inference is an extra pass and non-deterministic across
file samples, so every column is declared: keys stay strings
(preserving the reference's string-key join semantics) and only
``classif_confidence_id`` / ``D_CLASSIF_CONFIDENCE_ID`` are ints
(usnvc.py:110, 114). Column lists verified against the shipped export
headers (``USNVC v2.02 export 2018-03/*.txt:1``); the stripped-blob
``unit``/``unitDescription`` schemas are reconstructed from every
column the reference reads (SURVEY §1.3, FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _schema(cols: list[str], ints: set[str] | None = None) -> T.StructType:
    ints = ints or set()
    return T.StructType(
        [
            T.StructField(c, T.IntegerType() if c in ints else T.StringType(), True)
            for c in cols
        ]
    )


UNIT = _schema(
    [
        "element_global_id",
        "parent_id",
        "classif_confidence_id",
        "databasecode",
        "classificationcode",
        "hierarchylevel",
        "d_classification_level_id",
        "unitsort",
        "parentkey",
        "parentname",
        # NOTE: no DISPLAY_ORDER here — the reference selects an
        # unsuffixed DISPLAY_ORDER from the merged frame (usnvc.py:503),
        # which only works if unit.txt lacks the column; it arrives via
        # the d_classif_confidence join (pandas would suffix a collision
        # to DISPLAY_ORDER_x/_y and crash the hierarchy projection).
        "scientificname",
        "formattedscientificname",
        "translatedname",
        "colloquialname",
        "grank",
        "grankreviewdate",
        "grankauthor",
        "grankreasons",
    ],
    ints={"classif_confidence_id"},
)

UNIT_DESCRIPTION = _schema(
    [
        "element_global_id",
        "typeconceptsentence",
        "typeconcept",
        "diagnosticcharacteristics",
        "rationale",
        "classificationcomments",
        "othercomments",
        "similarnvctypescomments",
        "physiognomy",
        "floristics",
        "dynamics",
        "environment",
        "spatialpattern",
        "range",
        "nations",
        "subnations",
        "tncecoregions",
        "omernikecoregions",
        "federallands",
        "plotcount",
        "plotsummary",
        "plottypal",
        "plotarchived",
        "plotconsistency",
        "plotsize",
        "plotmethods",
        "confidencecomments",
        "lineage",
        "synonymy",
        "primaryconceptsource",
        "descriptionauthor",
        "acknowledgements",
        "versiondate",
    ],
    ints={"tncecoregions", "omernikecoregions", "federallands", "plotcount"},
)

D_CLASSIF_CONFIDENCE = _schema(
    ["D_CLASSIF_CONFIDENCE_ID", "CLASSIF_CONFIDENCE_DESC", "DISPLAY_ORDER", "STATUS"],
    ints={"D_CLASSIF_CONFIDENCE_ID"},
)

UNIT_X_REFERENCE = _schema(["element_global_id", "reference_id"])
REFERENCE = _schema(["reference_id", "shortcitation", "fullcitation"])

UNIT_PREDECESSOR = _schema(
    [
        "element_global_id",
        "predecessor_id",
        "predecessorcode",
        "predecessorname",
        "predecessorsciname",
        "predecessorcolloquialname",
        "lineagedate",
        "lineagenote",
        "lineageauthorizedby",
    ]
)
UNIT_OBSOLETE_NAME = _schema(
    ["element_global_id", "obsoletename", "obsoletenote", "obsoletedate", "obsoleteauthority"]
)
UNIT_OBSOLETE_PARENT = _schema(
    [
        "element_global_id",
        "obsoleteparentcode",
        "obsoletedivision",
        "obsoleteparentname",
        "obsoletenote",
        "obsoletedate",
        "obsoleteauthority",
    ]
)

UNIT_X_SUBNATION = _schema(
    ["element_global_id", "subnation_id", "d_curr_presence_absence_id", "d_dist_confidence_id"]
)
D_CURR_PRESENCE_ABSENCE = _schema(
    ["D_CURR_PRESENCE_ABSENCE_ID", "CURR_PRESENCE_ABSENCE_DESC", "CURR_PRESENCE_ABSENCE_CD"]
)
D_DIST_CONFIDENCE = _schema(["D_DIST_CONFIDENCE_ID", "DIST_CONFIDENCE_CD", "DIST_CONFIDENCE_DESC"])
D_SUBNATION = _schema(["subnation_id", "iso_nation_cd", "subnation_code", "subnation_name"])

UNIT_X_ECOREGION_USFS1994 = _schema(
    ["element_global_id", "usfs_ecoregion_id", "d_occurrence_status_id"]
)
D_USFS_ECOREGION1994 = _schema(
    [
        "USFS_ECOREGION_ID",
        "PARENT_USFS_ECOREGION_ID",
        "D_USFS_ECOREGION_LEVEL_ID",
        "USFS_ECOREGION_NAME",
        "USFS_ECOREGION_CLASS_CD",
        "USFS_ECOREGION_CONCAT_CD",
    ]
)
UNIT_X_ECOREGION_USFS2007 = _schema(
    ["element_global_id", "usfs_ecoregion_2007_id", "d_occurrence_status_id"]
)
D_USFS_ECOREGION2007 = _schema(
    [
        "usfs_ecoregion_2007_id",
        "parent_usfs_ecoregion_2007_id",
        "d_usfs_ecoregion_level_id",
        "usfs_ecoregion_2007_name",
        "usfs_ecoregion_2007_concat_cd",
    ]
)
D_OCCURRENCE_STATUS = _schema(
    ["D_OCCURRENCE_STATUS_ID", "OCCURRENCE_STATUS_CD", "OCCURRENCE_STATUS_DESC"]
)

UNIT_X_SIMILAR_UNIT = _schema(
    [
        "element_global_id",
        "simglobal_id",
        "simnote",
        "simelcode",
        "simname",
        "simusstatus",
        "simlevelid",
    ]
)

# Every table the pipeline reads, file-stem → schema.
EXPORT_SCHEMAS: dict[str, T.StructType] = {
    "unit": UNIT,
    "unitDescription": UNIT_DESCRIPTION,
    "d_classif_confidence": D_CLASSIF_CONFIDENCE,
    "UnitXReference": UNIT_X_REFERENCE,
    "reference": REFERENCE,
    "unitPredecessor": UNIT_PREDECESSOR,
    "unitObsoleteName": UNIT_OBSOLETE_NAME,
    "unitObsoleteParent": UNIT_OBSOLETE_PARENT,
    "UnitXSubnation": UNIT_X_SUBNATION,
    "d_curr_presence_absence": D_CURR_PRESENCE_ABSENCE,
    "d_dist_confidence": D_DIST_CONFIDENCE,
    "d_subnation": D_SUBNATION,
    "UnitXEcoregionUsfs1994": UNIT_X_ECOREGION_USFS1994,
    "d_usfs_ecoregion1994": D_USFS_ECOREGION1994,
    "UnitXEcoregionUsfs2007": UNIT_X_ECOREGION_USFS2007,
    "d_usfs_ecoregion2007": D_USFS_ECOREGION2007,
    "d_occurrence_status": D_OCCURRENCE_STATUS,
    "UnitXSimilarUnit": UNIT_X_SIMILAR_UNIT,
}
