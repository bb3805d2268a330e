"""Deep/wide synthetic USNVC fixture (VERDICT r08 stretch item 7):
the hierarchy closure is depth-bounded by design (max_depth=32) but
had only ever been parity-checked on the shipped 3-level fixture.
This suite extends that fixture ~10x — an 18-deep chain grafted under
the Association leaf (total depth 24) plus a 60-wide sibling fan
under the Group — and asserts the closure/children/doc-assembly
PROPERTIES against an independent pure-Python parent-map walk
(golden-free: no snapshot, every expectation recomputed from the raw
unit rows).

Reference anchor: the closure reimplements usnvc.py:497-531's
row-at-a-time ancestor walk set-based; the deep chain exercises the
iteration count the reference's while-loop hides.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

# Deep-fixture tier: the ~10x-extended synthetic export (full gate only; the standard fixture parity suites stay in the inner loop).
pytestmark = pytest.mark.slow

from tests.usnvc_fixture import write_fixture

DEPTH = 18  # chain grafted under unit 114 (itself at depth 6)
FAN = 60  # extra siblings under unit 112

_BASE_PARENTS = {
    100: None,
    110: 100,
    111: 110,
    112: 111,
    113: 112,
    114: 113,
    200: None,
    210: 200,
}


def _unit_row(eid: int, parent: int, code: str, sort: str) -> list[str]:
    return [
        str(eid), str(parent), "1", f"D{eid}", code, "Association", "51",
        sort, "", "", f"Sci {eid}", f"<i>Sci</i> {eid}", f"Name {eid}",
        "", "", "", "", "",
    ]


def _extra_rows() -> tuple[list[list[str]], dict[int, int]]:
    rows: list[list[str]] = []
    parents: dict[int, int] = {}
    parent = 114
    for i in range(DEPTH):
        eid = 300 + i
        rows.append(
            _unit_row(eid, parent, f"1.A.1.a.1.A.{i}", f"1.A.1.a.1.A.{i:03d}")
        )
        parents[eid] = parent
        parent = eid
    for j in range(FAN):
        eid = 500 + j
        rows.append(_unit_row(eid, 112, f"1.A.1.a.F{j}", f"1.A.1.a.F{j:03d}"))
        parents[eid] = 112
    return rows, parents


@pytest.fixture(scope="module")
def deep(spark, tmp_path_factory):
    dest = write_fixture(tmp_path_factory.mktemp("usnvc_deep"))
    rows, extra_parents = _extra_rows()
    with (Path(dest) / "unit.txt").open("a", encoding="ISO-8859-1") as f:
        for r in rows:
            f.write("\t".join(r) + "\n")
    # no unitDescription rows for the grafted units: the absent-row
    # null-guard path (fixture unit 210's edge case) at scale
    from pipeline_usnvc_spark.usnvc.docs import build_documents
    from pipeline_usnvc_spark.usnvc.ingest import build_silver, read_export

    tables = read_export(spark, str(dest))
    silver = build_silver(tables)
    out = build_documents(silver, run_timestamp="2026-01-01T00:00:00")
    docs = {r["row_id"]: json.loads(r["source_data"]) for r in out.collect()}
    parents = dict(_BASE_PARENTS)
    parents.update(extra_parents)
    return docs, parents


def _expected_ancestors(eid: int, parents: dict[int, int | None]) -> list[int]:
    chain: list[int] = []
    p = parents[eid]
    while p is not None:
        chain.append(p)
        p = parents[p]
    return chain or [0]  # root units carry the synthetic [0]


def test_doc_count(deep):
    docs, parents = deep
    assert set(docs) == {str(i) for i in parents} | {"0"}
    assert len(docs) == len(_BASE_PARENTS) + DEPTH + FAN + 1


def test_every_ancestor_chain_matches_python_walk(deep):
    docs, parents = deep
    for eid in parents:
        assert docs[str(eid)]["ancestors"] == _expected_ancestors(eid, parents), eid


def test_deepest_unit_depth(deep):
    docs, _ = deep
    deepest = str(300 + DEPTH - 1)
    # 18-chain + [113, 112, 111, 110, 100] above unit 114
    assert len(docs[deepest]["ancestors"]) == DEPTH + 5
    assert docs[deepest]["ancestors"][-1] == 100


def test_children_match_python_recompute(deep):
    docs, parents = deep
    expected: dict[int, list[int]] = {i: [] for i in parents}
    expected[0] = []
    for eid, p in parents.items():
        expected[p if p is not None else 0].append(eid)
    for eid, kids in expected.items():
        assert docs[str(eid)]["children"] == sorted(kids), eid


def test_fan_parent_rewrite_and_titles(deep):
    docs, _ = deep
    # every grafted unit got a document with the else-branch display
    # title (databasecode + translatedname) and an intact parent link
    for j in range(FAN):
        d = docs[str(500 + j)]
        assert d["parent"] == 112
        assert d["title"] == f"D{500 + j} Name {500 + j}"

_UNITDESC_OVERVIEW_KEYS = {
    "Type Concept Sentence",
    "Type Concept",
    "Diagnostic Characteristics",
    "Rationale for Nonimal Species or Physiognomic Features",
    "Classification Comments",
    "Other Comments",
    "Similar NVC Type Comments",
}


def test_absent_unitdescription_fabricates_no_fields(deep):
    """ADVICE r09: the old `... or True` form of this assertion was
    vacuous. The real property: NO grafted unit has a unitDescription
    row, so its document must carry none of the unitDescription-derived
    Overview keys and empty Vegetation/Environment sections — the
    null-guarded field inclusion (SURVEY P5) must drop absent fields,
    not fabricate them."""
    docs, _ = deep
    grafted = [300 + i for i in range(DEPTH)] + [500 + j for j in range(FAN)]
    for eid in grafted:
        d = docs[str(eid)]
        fabricated = _UNITDESC_OVERVIEW_KEYS & set(d["Overview"])
        assert not fabricated, (eid, fabricated)
        assert d["Vegetation"] == {}, eid
        assert d["Environment"] == {}, eid
        assert "typeconcept" not in json.dumps(d).lower(), eid
    # and the base units that DO have unitDescription rows keep their
    # described fields (the guard drops absent values, not the section)
    assert "Colloquial Name" in docs["110"]["Overview"]


def test_descendant_closure_is_consistent(deep):
    docs, parents = deep
    # node 112's subtree = 113 + 114 + the 18-chain + the 60-fan
    in_subtree = {
        eid
        for eid in parents
        if 112 in _expected_ancestors(eid, parents)
    }
    assert len(in_subtree) == 2 + DEPTH + FAN
    # each subtree member lists 112 in its ancestors exactly once
    for eid in in_subtree:
        assert docs[str(eid)]["ancestors"].count(112) == 1
