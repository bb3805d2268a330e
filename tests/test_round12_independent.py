"""Independent third-implementation checks for the round-12 family
(q429/q430): raw values come back via DuckDB fetch only — no SQL
math — and every statistic is re-derived in pure Python (exact
rational arithmetic via Fraction, floor division via Python's
unbounded ints), so a formula bug shared by BOTH engines still
fails here. Also pins the two equivalence theorems the round leans
on: min-max == PAVA (q429 vs q366) and Cramer == fundamental-matrix
solve (q430 vs a Fraction-exact (I-Q)p = r elimination)."""

from __future__ import annotations

import math
from fractions import Fraction

import duckdb
import pytest

from pipeline_usnvc_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _bins(con):
    """Per-bin (n, x) from raw columns only: the score binning is
    re-derived in Python floats (round-half-even like both engines'
    round()) so the SQL expression isn't trusted."""
    rows = con.execute("SELECT n_chars, lang FROM documents").fetchall()
    agg: dict[int, list[int]] = {}
    for n_chars, lang in rows:
        score = round(1000000.0 / (1.0 + math.exp(-((n_chars - 500.0) / 250.0))))
        b = min(score // 100000, 9)
        cur = agg.setdefault(b, [0, 0])
        cur[0] += 1
        cur[1] += 1 if lang == "en" else 0
    return dict(sorted(agg.items()))


def _pava(bins: dict[int, list[int]]) -> dict[int, Fraction]:
    blocks = [
        {"bins": [b], "n": n, "x": x, "v": Fraction(x, n)}
        for b, (n, x) in bins.items()
    ]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i]["v"] > blocks[i + 1]["v"]:
            a, b2 = blocks[i], blocks.pop(i + 1)
            a["bins"] += b2["bins"]
            a["n"] += b2["n"]
            a["x"] += b2["x"]
            a["v"] = Fraction(a["x"], a["n"])
            if i > 0:
                i -= 1
        else:
            i += 1
    return {b: blk["v"] for blk in blocks for b in blk["bins"]}


def test_q429_matches_fraction_exact_minmax_and_pava(spark, con):
    """q429's calibrated values must equal BOTH the Fraction-exact
    min-max formula and the Fraction-exact PAVA pooling pass — the
    Ayer/RWD theorem (min-max == PAVA) executed, not assumed."""
    bins = _bins(con)
    ids = list(bins)

    def av(j: int, k: int) -> Fraction:
        xs = sum(bins[b][1] for b in ids if j <= b <= k)
        ns = sum(bins[b][0] for b in ids if j <= b <= k)
        return Fraction(xs, ns)

    minmax = {
        i: max(min(av(j, k) for k in ids if k >= i) for j in ids if j <= i)
        for i in ids
    }
    pava = _pava(bins)
    assert minmax == pava  # the theorem itself, exact
    out = {
        r["bin"]: r
        for r in QUERIES["q429_exact_isotonic_calibration"](spark, SF).collect()
    }
    assert sorted(out) == ids
    for i in ids:
        v = minmax[i]
        assert out[i]["n_docs"] == bins[i][0]
        assert out[i]["n_pos"] == bins[i][1]
        assert out[i]["cal_micro"] == (v.numerator * 10**6) // v.denominator
        # the reported pool must ACHIEVE the value, not just tie it
        assert Fraction(out[i]["x_pool"], out[i]["n_pool"]) == v
        assert out[i]["j_star"] <= i <= out[i]["k_star"]


def test_q429_agrees_with_q366_driver_side_pava(spark):
    """The distributed closed form and q366's driver-side
    Fraction-PAVA are the same function of the data — per-bin
    calibrated values must coincide (same floor at 1e6)."""
    q366 = {
        r["bin"]: r["calibrated"]
        for r in QUERIES["q366_isotonic_calibration"](spark, SF).collect()
    }
    q429 = {
        r["bin"]: r["cal_micro"]
        for r in QUERIES["q429_exact_isotonic_calibration"](spark, SF).collect()
    }
    assert sorted(q366) == sorted(q429)
    for b, micro in q429.items():
        assert q366[b] == round(micro / 1e6, 6)


def _coarse_counts(con):
    rows = con.execute(
        "SELECT user_id, event_type FROM events ORDER BY user_id, ts, event_id"
    ).fetchall()
    chains: dict[int, list[str]] = {}
    for uid, et in rows:
        s = "purchase" if et == "purchase" else ("A" if et < "purchase" else "B")
        chains.setdefault(uid, []).append(s)
    cnt: dict[tuple[str, str], int] = {}
    for seq in chains.values():
        for a, b in zip(seq, seq[1:] + ["__END__"]):
            if a != "purchase":
                cnt[(a, b)] = cnt.get((a, b), 0) + 1
    return cnt


def test_q430_matches_fraction_exact_fundamental_matrix(spark, con):
    """Re-derive the absorption probabilities by Fraction-exact
    Gaussian elimination of (I-Q)p = r (the fundamental-matrix form
    q374 uses, NOT the Cramer rearrangement the query uses), then
    check q430's integer outputs — Cramer == elimination executed."""
    cnt = _coarse_counts(con)
    g = lambda a, b: cnt.get((a, b), 0)  # noqa: E731
    nA = sum(v for (a, _), v in cnt.items() if a == "A")
    nB = sum(v for (a, _), v in cnt.items() if a == "B")
    # (1 - qAA) pA - qAB pB = rA ; -qBA pA + (1 - qBB) pB = rB
    one = Fraction(1)
    qAA, qAB, rA = (Fraction(g("A", s), nA) for s in ("A", "B", "purchase"))
    qBA, qBB, rB = (Fraction(g("B", s), nB) for s in ("A", "B", "purchase"))
    # eliminate pA from row 2
    f = qBA / (one - qAA)
    pB = (rB + f * rA) / ((one - qBB) - f * qAB)
    pA = (rA + qAB * pB) / (one - qAA)
    out = {
        r["state"]: r
        for r in QUERIES["q430_coarse_chain_absorption"](spark, SF).collect()
    }
    assert sorted(out) == ["A", "B"]
    for s, p, n_out in (("A", pA, nA), ("B", pB, nB)):
        assert out[s]["n_out"] == n_out
        assert out[s]["p_micro"] == (p.numerator * 10**6) // p.denominator
        assert 0 <= out[s]["p_micro"] <= 10**6
    assert out["A"]["n_self"] == g("A", "A")
    assert out["A"]["n_cross"] == g("A", "B")
    assert out["A"]["n_to_target"] == g("A", "purchase")
    assert out["B"]["n_self"] == g("B", "B")
    assert out["B"]["n_cross"] == g("B", "A")
    assert out["B"]["n_to_target"] == g("B", "purchase")


def test_q430_fixed_point_property(spark, con):
    """The defining fixed-point equation n_s * p_s = sum_b n_sb * p_b
    (p = 1 at purchase, 0 at END) — evaluated with exact Fractions on
    the reported probabilities' EXACT rational counterparts. No wrong
    probability vector satisfies this on a connected lattice."""
    cnt = _coarse_counts(con)
    g = lambda a, b: cnt.get((a, b), 0)  # noqa: E731
    nA = sum(v for (a, _), v in cnt.items() if a == "A")
    nB = sum(v for (a, _), v in cnt.items() if a == "B")
    D = (nA - g("A", "A")) * (nB - g("B", "B")) - g("A", "B") * g("B", "A")
    assert D >= 1
    pA = Fraction(g("A", "purchase") * (nB - g("B", "B")) + g("A", "B") * g("B", "purchase"), D)
    pB = Fraction((nA - g("A", "A")) * g("B", "purchase") + g("B", "A") * g("A", "purchase"), D)
    p = {"A": pA, "B": pB, "purchase": Fraction(1), "__END__": Fraction(0)}
    for s, n_s in (("A", nA), ("B", nB)):
        flow = sum(Fraction(v) * p[b] for (a, b), v in cnt.items() if a == s)
        assert n_s * p[s] == flow


def test_pfdiv_matches_python_floor_on_boundary_magnitudes(spark):
    """_pfdiv must floor exactly where BIGINT div would overflow:
    quotients near 1e24 (the order-key scale) and numerators near the
    DECIMAL(38,0) ceiling."""
    from pyspark.sql import functions as F

    from pipeline_usnvc_spark.plans.round12_queries import _pfdiv

    cases = [
        (10**24 * 7 + 3, 7),
        (10**36, 10**12 + 1),
        (10**37 + 123456789, 999999937),
        (0, 5),
        (1, 10**12),
    ]
    df = spark.createDataFrame(
        [(str(n), str(d)) for n, d in cases], "n string, d string"
    ).select(
        F.col("n").cast("decimal(38,0)").alias("n"),
        F.col("d").cast("decimal(38,0)").alias("d"),
    )
    got = [
        int(r["q"])
        for r in df.select(_pfdiv(F.col("n"), F.col("d")).alias("q")).collect()
    ]
    assert got == [n // d for n, d in cases]


def test_q432_update_mode_merge_matches_slice_recompute(spark, con):
    """Recompute q432's merged state AND its emission counts with a
    literal per-event Python walk over the same deterministic
    event_id%4 slicing: a day's final stats are slice-independent,
    and its emission count equals the number of slices that contain
    at least one of its events (update mode emits a day exactly when
    a batch changed it)."""
    rows = con.execute(
        "SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d'), event_id, user_id,"
        " epoch_us(ts) FROM events"
    ).fetchall()
    days: dict[str, dict] = {}
    for day, eid, uid, t in rows:
        d = days.setdefault(
            day,
            {"n": 0, "dead": 0, "min_t": t, "max_t": t, "slices": set()},
        )
        d["n"] += 1
        d["dead"] += 1 if uid % 10 == 0 else 0
        d["min_t"] = min(d["min_t"], t)
        d["max_t"] = max(d["max_t"], t)
        d["slices"].add(eid % 4)
    total_n = sum(d["n"] for d in days.values())
    total_dead = sum(d["dead"] for d in days.values())
    out = {
        r["zone_day"]: r
        for r in QUERIES["q432_update_mode_staleness"](spark, SF).collect()
    }
    assert sorted(out) == sorted(days)
    assert any(len(d["slices"]) >= 2 for d in days.values())
    for day, d in days.items():
        r = out[day]
        assert r["n_rows"] == d["n"]
        assert r["n_dead"] == d["dead"]
        assert r["min_t"] == d["min_t"]
        assert r["max_t"] == d["max_t"]
        assert r["n_emissions"] == len(d["slices"])
        assert r["dead_fraction_micro"] == (10**6 * d["dead"]) // d["n"]
        assert r["recommend_vacuum"] == (
            (10**6 * d["dead"]) // d["n"] >= 100_000
        )
        assert r["table_dead_fraction_micro"] == (10**6 * total_dead) // total_n


# ---------------------------------------------------------------------------
# Crafted-fixture edge tests: the synthetic tables can't produce exact
# interval ties (q429) or boundary/degenerate chains (q430), so these
# build tiny parquet corpora that do, and run BOTH engines on them —
# the tie/boundary paths are executed, not argued about. The other
# eight tables are symlinked from the standard fixture dir so the
# oracle runner's view registration binds.
# ---------------------------------------------------------------------------


def _crafted_dir(tmp_path, **tables):
    import os

    d = tmp_path / "sf_crafted"
    d.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem events"
        " documents embeddings".split()
    ):
        if t not in tables:
            os.symlink(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    import pyarrow.parquet as pq

    for t, tbl in tables.items():
        pq.write_table(tbl, d / f"{t}.parquet")
    return str(d)


def _docs_table(rows):
    import pyarrow as pa

    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def _events_table(rows):
    import pyarrow as pa

    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )


def _nchars_for_bin(target: int) -> int:
    for n in range(0, 5000):
        score = round(1000000.0 / (1.0 + math.exp(-((n - 500.0) / 250.0))))
        if min(score // 100000, 9) == target:
            return n
    raise AssertionError(f"no n_chars reaches bin {target}")


def test_q429_exact_tie_determinism(spark, tmp_path):
    """Corpus crafted so MANY intervals share exactly the same
    rational average (0.6, 0.2, 0.4, 0.4 over four adjacent bins →
    PAVA pools everything to exactly 2/5): the argmin/argmax order
    keys TIE, and both engines must resolve them to the same reported
    pool via the deterministic (ord, k)/(ord, j) tiebreaks — and the
    value must be exactly 400000 micro for every bin regardless."""
    from tests.oracle_compare import assert_frames_match, run_oracle

    from pipeline_usnvc_spark.plans import ORACLES, QUERIES

    spec = {1: (10, 6), 2: (10, 2), 3: (10, 4), 4: (10, 4)}
    rows, did = [], 0
    for b, (n, x) in spec.items():
        nc = _nchars_for_bin(b)
        for i in range(n):
            did += 1
            rows.append((did, "w", "en" if i < x else "de", "s", nc))
    d = _crafted_dir(tmp_path, documents=_docs_table(rows))
    name = "q429_exact_isotonic_calibration"
    sdf = QUERIES[name](spark, d).toPandas()
    assert_frames_match(sdf, run_oracle(ORACLES[name], d), name)
    assert list(sdf["bin"]) == [1, 2, 3, 4]
    assert all(sdf["cal_micro"] == 400000)
    # the reported pools must all ACHIEVE exactly 2/5
    for _, r in sdf.iterrows():
        assert Fraction(int(r["x_pool"]), int(r["n_pool"])) == Fraction(2, 5)


def test_q430_boundary_and_degenerate_chains(spark, tmp_path):
    """Three crafted event logs: (a) no purchases anywhere -> p = 0
    for both superstates; (b) every chain one hop into purchase ->
    p = 1 exactly (the contract boundary p_micro == 1e6); (c) an
    EMPTY log -> the scalar solve degrades to zeros with det
    guarded to 1, still emitting both state rows. Each case runs both
    engines and hash-compares."""
    from datetime import datetime, timedelta

    from tests.oracle_compare import assert_frames_match, run_oracle

    from pipeline_usnvc_spark.plans import ORACLES, QUERIES

    name = "q430_coarse_chain_absorption"
    t0 = datetime(2024, 1, 1)

    def ev(i, uid, et):
        return (i, t0 + timedelta(seconds=i), uid, et)

    cases = {
        "no_purchase": (
            [ev(1, 1, "click"), ev(2, 1, "view"), ev(3, 2, "error"), ev(4, 2, "signup")],
            {"A": 0, "B": 0},
        ),
        "all_absorb": (
            [ev(1, 1, "click"), ev(2, 1, "purchase"), ev(3, 2, "view"), ev(4, 2, "purchase")],
            {"A": 10**6, "B": 10**6},
        ),
        "empty": ([], {"A": 0, "B": 0}),
    }
    for label, (events, want) in cases.items():
        # tmp_path is a single dir per test: nest per case
        case_dir = tmp_path / label
        case_dir.mkdir()
        d = _crafted_dir(case_dir, events=_events_table(events))
        sdf = QUERIES[name](spark, d).toPandas()
        assert_frames_match(sdf, run_oracle(ORACLES[name], d), f"{name}:{label}")
        got = dict(zip(sdf["state"], sdf["p_micro"]))
        assert got == want, (label, got)


def test_q429_full_spine_zigzag(spark, tmp_path):
    """The synthetic corpus only reaches bins 1-5; this crafts all
    nine reachable bins (n_chars >= 0 cannot reach bin 0) with a
    zigzag rate pattern forcing MULTIPLE distinct PAVA pools, and
    checks both engines against the Fraction-exact PAVA pooling."""
    from tests.oracle_compare import assert_frames_match, run_oracle

    from pipeline_usnvc_spark.plans import ORACLES, QUERIES

    # rates zigzag: .9 .1 .5 .3 .8 .2 .6 .4 .7 over bins 1..9
    xs = [9, 1, 5, 3, 8, 2, 6, 4, 7]
    rows, did = [], 0
    spec = {}
    for b, x in zip(range(1, 10), xs):
        spec[b] = (10, x)
        nc = _nchars_for_bin(b)
        for i in range(10):
            did += 1
            rows.append((did, "w", "en" if i < x else "de", "s", nc))
    d = _crafted_dir(tmp_path, documents=_docs_table(rows))
    name = "q429_exact_isotonic_calibration"
    sdf = QUERIES[name](spark, d).toPandas()
    assert_frames_match(sdf, run_oracle(ORACLES[name], d), name)
    pava = _pava({b: list(nx) for b, nx in spec.items()})
    assert len({pava[b] for b in pava}) >= 3  # genuinely multi-pool
    for _, r in sdf.iterrows():
        v = pava[int(r["bin"])]
        assert int(r["cal_micro"]) == (v.numerator * 10**6) // v.denominator


def test_q430_disconnected_superstates(spark, tmp_path):
    """Chains that never cross between A and B (n_AB = n_BA = 0): the
    system is diagonal, p_s = r_s / (1 - q_ss) exactly. Crafted:
    A-chains click,click,purchase (p_A = 1); B-chains view,view,END
    (p_B = 0). Both engines hash-compared and pinned to the exact
    diagonal solution."""
    from datetime import datetime, timedelta

    from tests.oracle_compare import assert_frames_match, run_oracle

    from pipeline_usnvc_spark.plans import ORACLES, QUERIES

    t0 = datetime(2024, 1, 1)
    rows, i = [], 0
    for uid, seq in ((1, ["click", "click", "purchase"]), (2, ["view", "view"])):
        for et in seq:
            i += 1
            rows.append((i, t0 + timedelta(seconds=i), uid, et))
    d = _crafted_dir(tmp_path, events=_events_table(rows))
    name = "q430_coarse_chain_absorption"
    sdf = QUERIES[name](spark, d).toPandas()
    assert_frames_match(sdf, run_oracle(ORACLES[name], d), name)
    got = {r["state"]: r for _, r in sdf.iterrows()}
    assert got["A"]["n_cross"] == 0 and got["B"]["n_cross"] == 0
    # diagonal: p_A = r_A/(1-q_AA) = (1/2)/(1-1/2) = 1; p_B = 0
    assert got["A"]["p_micro"] == 10**6
    assert got["B"]["p_micro"] == 0
