"""Miniature synthetic USNVC export for golden/parity tests.

Covers every FIXTURES.md edge case: ≥3-level hierarchy with 2 roots,
all display-title CASE branches, null colloquialname on a Class (the
reference's TypeError case), nation lists with '?' flags and leading
spaces, HTML entities + <i> markup, 0/1/many bridge rows, absent
description row, Latin-1 characters, and a dangling bridge key.

File order is ascending element_global_id so the reference's
incidental pandas file-order nesting matches the engine's
deterministic ordering.
"""

from __future__ import annotations

from pathlib import Path

# name -> (header cols, rows)
TABLES: dict[str, tuple[list[str], list[list[str]]]] = {}


def _t(name: str, cols: list[str], rows: list[list[str]]) -> None:
    TABLES[name] = (cols, rows)


_t(
    "unit",
    [
        "element_global_id", "parent_id", "classif_confidence_id", "databasecode",
        "classificationcode", "hierarchylevel", "d_classification_level_id", "unitsort",
        "parentkey", "parentname", "scientificname",
        "formattedscientificname", "translatedname", "colloquialname", "grank",
        "grankreviewdate", "grankauthor", "grankreasons",
    ],
    [
        # Class root: entities in names, colloquialname present
        ["100", "", "1", "CL01", "1", "Class", "46", "1", "", "",
         "Forestia classis", "<i>Forestia</i> &amp; allies", "Forest to Open Woodland",
         "Forest &amp; Woodland", "G5", "1/21/2016", "D. Moreno", "Widespread &lt;common&gt;"],
        # Subclass under 100
        ["110", "100", "2", "SC01.a", "1.A", "Subclass", "47", "1.A",
         "CL01", "Forest & Woodland", "Temperate sci", "<i>Temperate</i> forest",
         "Temperate Forest", "Temperate Forest", "", "", "", ""],
        # Macrogroup under 110 (Macrogroup/Group CASE branch)
        ["111", "110", "1", "M001", "1.A.1", "Macrogroup", "48", "1.A.1",
         "SC01.a", "Temperate Forest", "Cool temperate sci", "<i>Cool</i> temperate", "Cool Temperate Forest", "", "G4", "", "", ""],
        # Group under 111
        ["112", "111", "3", "G001", "1.A.1.a", "Group", "49", "1.A.1.a",
         "M001", "Cool Temperate Forest", "Acer - Fagus grp", "<i>Acer</i> grp", "Maple - Beech Group", "", "", "", "", ""],
        # Alliance under 112 (else branch: databasecode + translatedname)
        ["113", "112", "1", "A3001", "1.A.1.a.1", "Alliance", "50", "1.A.1.a.1",
         "G001", "Maple - Beech Group", "Acer - Fagus alliance",
         "<i>Acer</i> - <i>Fagus</i>", "Maple - Beech Alliance", "", "G3?", "", "", ""],
        # Association leaf under 113
        ["114", "113", "2", "CEGL000001", "1.A.1.a.1.A", "Association", "51",
         "1.A.1.a.1.A", "A3001", "Maple - Beech Alliance", "Acer - Fagus - Betula assoc",
         "<i>Acer - Fagus</i> assoc", "Maple - Beech - Birch Forest", "", "", "", "", ""],
        # Second Class root with NULL colloquialname (reference TypeError case)
        ["200", "", "1", "CL02", "2", "Class", "46", "2", "", "",
         "", "", "Shrub & Herb Vegetation", "", "", "", "", ""],
        # Division under 200 (no unitDescription row at all)
        ["210", "200", "2", "DV02", "2.B.1", "Division", "48", "2.B.1",
         "CL02", "Shrub & Herb Vegetation", "", "", "Temperate Shrubland", "Shrubland", "", "", "", ""],
    ],
)

_DESC_COLS = [
    "element_global_id", "typeconceptsentence", "typeconcept", "diagnosticcharacteristics",
    "rationale", "classificationcomments", "othercomments", "similarnvctypescomments",
    "physiognomy", "floristics", "dynamics", "environment", "spatialpattern", "range",
    "nations", "subnations", "tncecoregions", "omernikecoregions", "federallands",
    "plotcount", "plotsummary", "plottypal", "plotarchived", "plotconsistency",
    "plotsize", "plotmethods", "confidencecomments", "lineage", "synonymy",
    "primaryconceptsource", "descriptionauthor", "acknowledgements", "versiondate",
]


def _desc(eid: str, **kw: str) -> list[str]:
    row = {c: "" for c in _DESC_COLS}
    row["element_global_id"] = eid
    row.update(kw)
    return [row[c] for c in _DESC_COLS]


_t(
    "unitDescription",
    _DESC_COLS,
    [
        _desc("100", typeconceptsentence="Forests &amp; woodlands of the world.",
              typeconcept="Tree-dominated &lt;all&gt; types", nations="US, CA, MX",
              tncecoregions="4", omernikecoregions="7", federallands="12", plotcount="120",
              physiognomy="Closed canopy &amp; tall", range="Global temperate zone",
              lineage="Original 1997 concept", synonymy="Forest Class (1997)",
              primaryconceptsource="FGDC 1997", versiondate="2/1/2016"),
        _desc("110", floristics="Acer, Fagus, &amp; Betula spp.", nations="US, CA?",
              tncecoregions="3", omernikecoregions="5", federallands="8", plotcount="60",
              environment="Cool moist climates", confidencecomments="Well sampled"),
        _desc("111", dynamics="Gap-phase dynamics", nations=" CA?, US",
              tncecoregions="2", omernikecoregions="4", federallands="3", plotcount="30",
              subnations="AL, BC", spatialpattern="Matrix"),
        _desc("112", typeconcept="Maple &amp; beech groups", nations="US",
              tncecoregions="1", omernikecoregions="2", federallands="2", plotcount="15",
              plotsummary="15 plots analysed", plottypal="Typal", plotmethods="Releve"),
        _desc("113", diagnosticcharacteristics="Acer saccharum &gt; 50% cover",
              rationale="Nominal species dominance", classificationcomments="Revised &amp; merged",
              othercomments="See also &lt;related&gt; alliances", similarnvctypescomments="Similar to A3002",
              nations="US, XX?", tncecoregions="1", omernikecoregions="1", federallands="1",
              plotcount="8", synonymy="Acer-Fagus Alliance (2008)",
              descriptionauthor="M. Schafale", acknowledgements="Field crews",
              versiondate="3/15/2017", range="Northeastern US &amp; adjacent Canada"),
        _desc("114", plotcount="3", tncecoregions="1", omernikecoregions="1",
              federallands="1", plotsummary="3 plots"),
        _desc("200", typeconceptsentence="Open shrub &amp; herb types.",
              nations="US", tncecoregions="2", omernikecoregions="3",
              federallands="5", plotcount="40"),
        # note: no row for 210 (left-join null path)
    ],
)

_t(
    "d_classif_confidence",
    ["D_CLASSIF_CONFIDENCE_ID", "CLASSIF_CONFIDENCE_DESC", "DISPLAY_ORDER", "STATUS"],
    [["1", "High", "1", "Accepted"], ["2", "Moderate", "2", "Accepted"], ["3", "Low", "3", "Accepted"]],
)
_t(
    "UnitXReference",
    ["element_global_id", "reference_id"],
    [
        ["111", "R2"],
        ["113", "R1"],
        ["113", "R2"],
        ["113", "R9"],  # dangling: no R9 in reference.txt (inner-join drop)
        ["114", "R3"],
    ],
)
_t(
    "reference",
    ["reference_id", "shortcitation", "fullcitation"],
    [
        ["R1", "Rice and Penfound 1959", "Rice, E.L. &amp; W.T. Penfound. 1959. The upland forests."],
        ["R2", "Müller 1982", "Müller, J. 1982. Végétation of the northeast. Café Press."],
        ["R3", "Smith 2001", "Smith, A. 2001. Plots & methods <i>in situ</i>."],
    ],
)
_t(
    "unitPredecessor",
    ["element_global_id", "predecessor_id", "predecessorcode", "predecessorname",
     "predecessorsciname", "predecessorcolloquialname", "lineagedate", "lineagenote",
     "lineageauthorizedby"],
    [["113", "P1", "A.100", "Old Acer Alliance", "Acer spp.", "Maple Alliance",
      "11/11/2016", "Split &amp; renamed", "Panel"]],
)
_t(
    "unitObsoleteName",
    ["element_global_id", "obsoletename", "obsoletenote", "obsoletedate", "obsoleteauthority"],
    [["113", "Acer saccharum Alliance", "Renamed", "1/21/2016", "USNVC"]],
)
_t(
    "unitObsoleteParent",
    ["element_global_id", "obsoleteparentcode", "obsoletedivision", "obsoleteparentname",
     "obsoletenote", "obsoletedate", "obsoleteauthority"],
    [["111", "OLD.SC", "1.X", "Old Subclass", "Moved", "1/21/2016", "USNVC"]],
)
_t(
    "UnitXSubnation",
    ["element_global_id", "subnation_id", "d_curr_presence_absence_id", "d_dist_confidence_id"],
    [["113", "2", "1", "1"], ["113", "33", "1", "2"], ["114", "2", "2", "1"]],
)
_t(
    "d_curr_presence_absence",
    ["D_CURR_PRESENCE_ABSENCE_ID", "CURR_PRESENCE_ABSENCE_DESC", "CURR_PRESENCE_ABSENCE_CD"],
    [["1", "Present", ""], ["2", "Absent", "A"]],
)
_t(
    "d_dist_confidence",
    ["D_DIST_CONFIDENCE_ID", "DIST_CONFIDENCE_CD", "DIST_CONFIDENCE_DESC"],
    [["1", "C", "Confident"], ["2", "P", "Probable"]],
)
_t(
    "d_subnation",
    ["subnation_id", "iso_nation_cd", "subnation_code", "subnation_name"],
    [["2", "US", "AL", "Alabama"], ["33", "CA", "BC", "British Columbia"]],
)
_t(
    "UnitXEcoregionUsfs1994",
    ["element_global_id", "usfs_ecoregion_id", "d_occurrence_status_id"],
    [["113", "E1", "1"]],
)
_t(
    "d_usfs_ecoregion1994",
    ["USFS_ECOREGION_ID", "PARENT_USFS_ECOREGION_ID", "D_USFS_ECOREGION_LEVEL_ID",
     "USFS_ECOREGION_NAME", "USFS_ECOREGION_CLASS_CD", "USFS_ECOREGION_CONCAT_CD"],
    [["E1", "", "1", "Laurentian Mixed Forest", "212", "212"]],
)
_t(
    "UnitXEcoregionUsfs2007",
    ["element_global_id", "usfs_ecoregion_2007_id", "d_occurrence_status_id"],
    [["111", "F7", "2"]],
)
_t(
    "d_usfs_ecoregion2007",
    ["usfs_ecoregion_2007_id", "parent_usfs_ecoregion_2007_id", "d_usfs_ecoregion_level_id",
     "usfs_ecoregion_2007_name", "usfs_ecoregion_2007_concat_cd"],
    [["F7", "", "2", "Northern Hardwoods Province", "M211"]],
)
_t(
    "d_occurrence_status",
    ["D_OCCURRENCE_STATUS_ID", "OCCURRENCE_STATUS_CD", "OCCURRENCE_STATUS_DESC"],
    [["1", "C", "Confident or certain"], ["2", "P", "Predicted or probable"]],
)
_t(
    "UnitXSimilarUnit",
    ["element_global_id", "simglobal_id", "simnote", "simelcode", "simname",
     "simusstatus", "simlevelid"],
    [["113", "3002", "Shares dominants &amp; structure", "A3002",
      "<i>Acer rubrum</i> Alliance", "Standard", "50"]],
)


def write_fixture(dest: Path) -> Path:
    dest.mkdir(parents=True, exist_ok=True)
    for name, (cols, rows) in TABLES.items():
        path = dest / f"{name}.txt"
        lines = ["\t".join(cols)] + ["\t".join(r) for r in rows]
        path.write_text("\n".join(lines) + "\n", encoding="ISO-8859-1")
    return dest
