"""USNVC export ingest + silver joins (reference M1-M2).

``read_export`` replaces the reference's os.walk + 18 pd.read_csv
calls (usnvc.py:100-118); ``build_silver`` replaces the 9 merges of
``preprocess_usnvc`` (usnvc.py:117-218), computed ONCE per job —
the reference re-ran the whole thing per output row (usnvc.py:71,
its biggest inefficiency; SURVEY §2.9.7).

Scale notes: every ``d_*`` dimension is tiny (3-1,506 rows) and
broadcast; the only shuffling joins are units⟕descriptions and the
per-bridge nests keyed on element_global_id — at 100 TB those are the
natural partition keys; build_documents materializes the units silver
once (operators/checkpoint) so its multiline-CSV scan + join subtree
is not replayed by each of its ~5 consumers.

SESSION-SCOPE CONTRACT: ``read_export`` pins
``spark.sql.caseSensitive=true`` for the session and leaves it set —
downstream analysis of the mixed-case duplicate key columns
(``d_curr_presence_absence_id`` vs ``D_CURR_PRESENCE_ABSENCE_ID``)
happens lazily when consumers build THEIR plans, so restoring the
conf on return would break them. Run the USNVC pipeline in its own
SparkSession if other workloads in the session rely on
case-INSENSITIVE resolution (the test suite isolates it the same
way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_usnvc_spark.sources.delimited import read_delimited
from pipeline_usnvc_spark.usnvc.schemas import EXPORT_SCHEMAS


def read_export(spark: SparkSession, export_dir: str) -> dict[str, DataFrame]:
    """Read every export table (<export_dir>/<name>.txt, TSV,
    ISO-8859-1, header row) with its explicit schema.

    Case sensitivity is pinned ON — for the SESSION, deliberately not
    restored (see the module docstring's session-scope contract): the
    export distinguishes key spellings only by case
    (``d_curr_presence_absence_id`` bridge FK vs
    ``D_CURR_PRESENCE_ABSENCE_ID`` dim PK), and both must survive
    into nested records like pandas merge keeps them (SURVEY §7.4.4).
    """
    spark.conf.set("spark.sql.caseSensitive", "true")
    # Rich-text tables may carry quoted embedded newlines (pandas
    # parses those by default); they get multiline parsing. The large
    # bridge files stay line-oriented and splittable.
    multiline_tables = {"unit", "unitDescription"}
    return {
        name: read_delimited(
            spark,
            f"{export_dir}/{name}.txt",
            schema,
            multiline=name in multiline_tables,
        )
        for name, schema in EXPORT_SCHEMAS.items()
    }


def build_silver(t: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """The 9 named frames of the reference's preprocess (usnvc.py:87-97),
    as lazy DataFrames. Key spellings: pandas merge keeps BOTH key
    columns when names differ (left_on/right_on), so dimension joins
    here join on expressions — both spellings survive into the nested
    records, matching reference output shape (SURVEY §7.4.4).
    """
    # J1: units ⟕ descriptions (1:1) — J2: ⟕ confidence dim (renamed key)
    conf = t["d_classif_confidence"].withColumnRenamed(
        "D_CLASSIF_CONFIDENCE_ID", "classif_confidence_id"
    )
    nvcs_units = (
        t["unit"]
        .join(t["unitDescription"], "element_global_id", "left")
        .join(F.broadcast(conf), "classif_confidence_id", "left")
    )

    # J3: references bridge ⋈ citation dim
    unit_references = t["UnitXReference"].join(t["reference"], "reference_id")

    # J4-J6: subnation distribution chain (keep both key spellings)
    dist = t["UnitXSubnation"]
    dist = dist.join(
        F.broadcast(t["d_curr_presence_absence"]),
        dist["d_curr_presence_absence_id"] == t["d_curr_presence_absence"]["D_CURR_PRESENCE_ABSENCE_ID"],
    )
    dist = dist.join(
        F.broadcast(t["d_dist_confidence"]),
        dist["d_dist_confidence_id"] == t["d_dist_confidence"]["D_DIST_CONFIDENCE_ID"],
    )
    nvcs_distribution = dist.join(F.broadcast(t["d_subnation"]), "subnation_id")

    # J7-J8: 1994 ecoregions
    eco94 = t["UnitXEcoregionUsfs1994"]
    eco94 = eco94.join(
        F.broadcast(t["d_usfs_ecoregion1994"]),
        eco94["usfs_ecoregion_id"] == t["d_usfs_ecoregion1994"]["USFS_ECOREGION_ID"],
    )
    eco94 = eco94.join(
        F.broadcast(t["d_occurrence_status"]),
        eco94["d_occurrence_status_id"] == t["d_occurrence_status"]["D_OCCURRENCE_STATUS_ID"],
    )

    # J9: 2007 ecoregions (same-named key + occurrence dim)
    eco07 = t["UnitXEcoregionUsfs2007"].join(
        F.broadcast(t["d_usfs_ecoregion2007"]), "usfs_ecoregion_2007_id"
    )
    eco07 = eco07.join(
        F.broadcast(t["d_occurrence_status"]),
        eco07["d_occurrence_status_id"] == t["d_occurrence_status"]["D_OCCURRENCE_STATUS_ID"],
    )

    return {
        "nvcsUnits": nvcs_units,
        "unitReferences": unit_references,
        "nvcsDistribution": nvcs_distribution,
        "usfsEcoregionDistribution1994": eco94,
        "usfsEcoregionDistribution2007": eco07,
        "unitPredecessors": t["unitPredecessor"],
        "obsoleteUnits": t["unitObsoleteName"],
        "obsoleteParents": t["unitObsoleteParent"],
        "unitXSimilarUnit": t["UnitXSimilarUnit"],
    }
