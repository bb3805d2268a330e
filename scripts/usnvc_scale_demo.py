#!/usr/bin/env python
"""Reproduce the USNVC-at-scale numbers from README.md.

Generates a synthetic export of N units (8-ary hierarchy, all
hierarchy levels, entity-laden text, nations lists, int columns) and
runs the full document-assembly pipeline end-to-end, printing
docs/sec. Usage:

    python scripts/usnvc_scale_demo.py [n_units]      # default 50000
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def generate_export(tmp: Path, n: int) -> Path:
    from usnvc_fixture import TABLES

    tmp.mkdir(parents=True, exist_ok=True)
    unit_cols = TABLES["unit"][0]
    desc_cols = TABLES["unitDescription"][0]
    levels = ["Class", "Subclass", "Formation", "Division", "Macrogroup", "Group", "Alliance", "Association"]
    units, descs, refs = [], [], []
    for i in range(n):
        eid = str(1000 + i)
        parent = "" if i < 8 else str(1000 + (i // 8))
        row = {c: "" for c in unit_cols}
        row.update(
            element_global_id=eid, parent_id=parent, classif_confidence_id=str(i % 3 + 1),
            databasecode=f"DB{i}", classificationcode=f"{i%9}.{i%7}.{i%5}", hierarchylevel=levels[i % 8],
            d_classification_level_id=str(46 + i % 8), unitsort=f"{i%9}.{i:06d}",
            scientificname=f"Species {i}", formattedscientificname=f"<i>Species</i> &amp; {i}",
            translatedname=f"Translated {i}", colloquialname=f"Colloquial {i}", grank=f"G{i%5+1}",
        )
        units.append([row[c] for c in unit_cols])
        d = {c: "" for c in desc_cols}
        d.update(
            element_global_id=eid, typeconceptsentence=f"Concept &amp; text {i}",
            nations="US, CA?" if i % 3 else "MX", tncecoregions=str(i % 20),
            omernikecoregions=str(i % 15), federallands=str(i % 9), plotcount=str(i % 200),
            floristics=f"Floristic description {i} &lt;taxa&gt;",
        )
        descs.append([d[c] for c in desc_cols])
        for r in range(i % 4):
            refs.append([eid, f"R{r+1}"])

    def write(name, cols, rows):
        (tmp / f"{name}.txt").write_text(
            "\n".join(["\t".join(cols)] + ["\t".join(r) for r in rows]) + "\n",
            encoding="ISO-8859-1",
        )

    for name, (cols, rows) in TABLES.items():
        if name not in ("unit", "unitDescription", "UnitXReference"):
            write(name, cols, rows)
    write("unit", unit_cols, units)
    write("unitDescription", desc_cols, descs)
    write("UnitXReference", TABLES["UnitXReference"][0], refs)
    return tmp


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000

    from pipeline_usnvc_spark.session import get_spark
    from pipeline_usnvc_spark.usnvc.docs import build_documents
    from pipeline_usnvc_spark.usnvc.ingest import build_silver, read_export

    export = generate_export(Path(tempfile.mkdtemp()) / "export", n)
    spark = get_spark(app_name="usnvc_scale_demo")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    docs = build_documents(build_silver(read_export(spark, str(export))), "2026-01-01T00:00:00")
    count = docs.count()
    elapsed = time.perf_counter() - t0
    print(f"{count} documents in {elapsed:.1f}s ({count / elapsed:.0f} docs/s)")


if __name__ == "__main__":
    main()
