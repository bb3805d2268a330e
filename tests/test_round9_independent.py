"""Independent third-implementation checks for the round-9 family
(q405-q407): raw values come back via DuckDB fetch only — no SQL
math — and every statistic is re-derived in pure Python (including
the md5 permutation keys via hashlib), so a formula bug shared by
BOTH engines still fails here."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from pipeline_usnvc_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    return c


def _rhu(x: float) -> int:
    """round-half-away-from-zero, matching Spark/DuckDB round()."""
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _daily_xy(con) -> list[tuple[int, int]]:
    rows = con.execute(
        """SELECT CAST(ts AS DATE) AS d,
                  count(*) FILTER (WHERE event_type = 'view'),
                  count(*) FILTER (WHERE event_type = 'purchase')
           FROM events GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    return [(int(x), int(y)) for _, x, y in rows]


def test_banded_kendall_tau(spark, con):
    """Recompute τ-b directly over DAY PAIRS of banded values —
    the O(n²) definition the 16×16 lattice query must equal."""
    xy = _daily_xy(con)
    mnx, mxx = min(x for x, _ in xy), max(x for x, _ in xy)
    mny, mxy_ = min(y for _, y in xy), max(y for _, y in xy)
    banded = [
        ((x - mnx) * 16 // (mxx - mnx + 1), (y - mny) * 16 // (mxy_ - mny + 1))
        for x, y in xy
    ]
    nd = len(banded)
    c = d = n1 = n2 = 0
    for i in range(nd):
        for j in range(i + 1, nd):
            dx = banded[j][0] - banded[i][0]
            dy = banded[j][1] - banded[i][1]
            if dx == 0:
                n1 += 1
            if dy == 0:
                n2 += 1
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
    n0 = nd * (nd - 1) // 2
    tau = (
        round((c - d) / math.sqrt((n0 - n1) * (n0 - n2)), 6)
        if n0 > n1 and n0 > n2
        else None
    )
    r = QUERIES["q405_banded_kendall_tau"](spark, SF).collect()[0]
    assert r["n_days"] == nd
    assert r["n_cells"] == len(set(banded))
    assert r["concordant_w"] == c
    assert r["discordant_w"] == d
    if tau is None:
        assert r["tau_b_banded"] is None
    else:
        assert abs(r["tau_b_banded"] - tau) <= 1e-9


def test_permutation_shapley(spark, con):
    """Re-derive the K=24 md5-keyed permutations with hashlib, the
    observed-coalition values from raw user journeys, and the
    averaged marginal contributions — all in pure Python."""
    chans = sorted(
        ch
        for (ch,) in con.execute(
            "SELECT DISTINCT event_type FROM events WHERE event_type <> 'purchase'"
        ).fetchall()
    )
    bit = {ch: i for i, ch in enumerate(chans)}
    rows = con.execute("SELECT user_id, event_type FROM events").fetchall()
    masks: dict[int, int] = {}
    convs: dict[int, int] = {}
    for uid, et in rows:
        if et == "purchase":
            convs[uid] = 1
        else:
            masks[uid] = masks.get(uid, 0) | (1 << bit[et])
        masks.setdefault(uid, masks.get(uid, 0))
        convs.setdefault(uid, convs.get(uid, 0))
    coal: dict[int, list[int]] = {}
    for uid in masks:
        n_users, n_conv = coal.get(masks[uid], [0, 0])
        coal[masks[uid]] = [n_users + 1, n_conv + convs[uid]]
    v = {m: _rhu(1000000.0 * nc / nu) for m, (nu, nc) in coal.items()}
    credits = {ch: 0 for ch in chans}
    for k in range(24):
        order = sorted(
            chans, key=lambda ch: (hashlib.md5(f"{k}-{ch}".encode()).hexdigest(), ch)
        )
        prefix = 0
        for ch in order:
            with_c = prefix | (1 << bit[ch])
            credits[ch] += v.get(with_c, 0) - v.get(prefix, 0)
            prefix = with_c
    got = {
        r["channel"]: r
        for r in QUERIES["q406_permutation_shapley"](spark, SF).collect()
    }
    assert sorted(got) == chans
    for ch in chans:
        assert got[ch]["n_samples"] == 24
        assert abs(
            got[ch]["shapley_credit_sampled"] - round(credits[ch] / 24e6, 6)
        ) <= 1e-9
    # efficiency sanity: the sampled credits of a permutation estimator
    # sum to v(grand coalition) - v(empty) EXACTLY for every sample,
    # hence for the average too
    grand = 0
    for ch in chans:
        grand |= 1 << bit[ch]
    total = sum(credits.values()) / 24e6
    assert abs(total - (v.get(grand, 0) - v.get(0, 0)) / 1e6) <= 1e-9


def test_windowed_theil_sen(spark, con):
    """Recompute the banded median slope from raw order rows: daily
    cent totals, all (i, j) day pairs within 30 days, micro-rounded
    slopes, and the exact two-middle-ranks median."""
    rows = con.execute(
        """SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT),
                  sum(CAST(floor(o_totalprice * 100) AS BIGINT))
           FROM read_parquet('{sf}/orders.parquet') GROUP BY 1 ORDER BY 1""".format(
            sf=SF
        )
    ).fetchall()
    daily = [(int(d), int(c)) for d, c in rows]
    slopes = []
    for i in range(len(daily)):
        for j in range(i + 1, len(daily)):
            di, ci = daily[i]
            dj, cj = daily[j]
            if 0 < dj - di <= 30:
                slopes.append((_rhu(1000000.0 * (cj - ci) / (dj - di)), di, dj))
    slopes.sort()
    m = len(slopes)
    mids = sorted({(m + 1) // 2, m // 2 + 1})
    mid_vals = [slopes[r - 1][0] for r in mids]
    r = QUERIES["q407_windowed_theil_sen"](spark, SF).collect()[0]
    assert r["window_days"] == 30
    assert r["n_pairs"] == m
    assert r["n_mid"] == len(mids)
    assert r["mid_sum_micro"] == sum(mid_vals)
    assert abs(
        r["slope_cents_per_day"] - sum(mid_vals) / len(mids) / 1e6
    ) <= 1e-9


def test_banded_cvm_reference(spark, con):
    """Recompute each source-vs-reference CvM T in plain floats from
    raw per-source length lists (the textbook two-sample ECDF form),
    independent of the query's integer prefix-count machinery."""
    rows = con.execute(
        "SELECT source, n_chars FROM read_parquet('{sf}/documents.parquet')".format(
            sf=SF
        )
    ).fetchall()
    by_src: dict[str, list[int]] = {}
    for s, v in rows:
        by_src.setdefault(s, []).append(int(v))
    ref = min(by_src)
    got = {
        r["source"]: r
        for r in QUERIES["q408_banded_cvm_reference"](spark, SF).collect()
    }
    assert sorted(got) == sorted(s for s in by_src if s != ref)
    a = sorted(by_src[ref])
    n = len(a)
    for s in got:
        b = sorted(by_src[s])
        m = len(b)
        vals = sorted(set(a) | set(b))
        num = 0.0
        cfa = cfb = 0
        for v in vals:
            ca = sum(1 for x in a if x == v)
            cb = sum(1 for x in b if x == v)
            cfa += ca
            cfb += cb
            num += (ca + cb) * (cfa * m - cfb * n) ** 2
        t = num / (n * m * (n + m) ** 2)
        r = got[s]
        assert r["reference_source"] == ref
        assert (r["n_ref"], r["n_src"]) == (n, m)
        assert abs(r["cvm_t"] - round(t, 6)) <= 1e-9
        # scaling guard redundancy: T for two-sample CvM lives in
        # [0, ~(2m n)/(6(n+m)) scale]; a 1e6 scaling slip is enormous
        assert 0.0 <= r["cvm_t"] < (n * m) / (n + m)


def test_permutation_shapley_survives_high_channel_cardinality(spark):
    """The pair claim made executable: at 24 channels q340's exact
    coalition lattice FAILS FAST (2^24 rows — the regression-locked
    guard), while the q406 estimator runs the same frame fine and its
    credits still satisfy the exact efficiency identity
    sum(credits) = v(grand) - v(empty) (grand/empty are the only
    coalitions every permutation touches, so sampling cannot break
    it: each sampled ordering telescopes exactly)."""
    import pytest as _pytest

    from pipeline_usnvc_spark.plans.round9_queries import permutation_shapley
    from pipeline_usnvc_spark.plans.stats_queries import shapley_attribution

    n_ch = 24
    rows = []
    for uid in range(200):
        # each user touches 3 deterministic channels; converts when
        # the channel-index sum is even
        chs = [(uid + j * 7) % n_ch for j in range(3)]
        for c in chs:
            rows.append((uid, f"ch{c:02d}"))
        if sum(chs) % 2 == 0:
            rows.append((uid, "purchase"))
    ev = spark.createDataFrame(rows, "user_id bigint, event_type string")
    with _pytest.raises(ValueError, match="permutation-sampling"):
        shapley_attribution(ev).collect()
    got = permutation_shapley(ev, n_perms=8).collect()
    assert len(got) == n_ch
    total = sum(r["shapley_credit_sampled"] for r in got)
    # v(empty)=0 here only if no user has an empty journey (all have 3
    # channels), and v(grand)=0 unless some user's mask is the full
    # set (none is, with 3 of 24 bits) — so the telescoped total is
    # v(grand)-v(empty) = 0 - 0 = 0 exactly
    assert abs(total) <= 1e-6 * n_ch


def test_permutation_shapley_mask_domain_guard(spark):
    """ADVICE r09: coalition keys are 64-bit masks and shiftleft/`<<`
    wrap shift amounts mod 64 on both engines, so above 63 channels
    masks silently collide — the estimator must fail fast there (the
    q340 guard pattern), naming the sorted channel-set re-keying as
    the path past the mask domain."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pipeline_usnvc_spark.plans.round9_queries import permutation_shapley

    rows = [(i % 11, f"channel_{i:03d}") for i in range(64)] + [(0, "purchase")]
    ev = spark.createDataFrame(rows, "user_id bigint, event_type string")
    with _pytest.raises(ValueError, match="sorted channel-set"):
        permutation_shapley(ev, n_perms=4)
    # 63 channels is the last cardinality inside the mask domain — the
    # guard must NOT fire there (bit 62 is the highest shift used:
    # masks stay below 2^63)
    ev63 = ev.filter(F.col("event_type") != "channel_063")
    assert permutation_shapley(ev63, n_perms=2).count() == 63


def test_banded_energy_reference(spark, con):
    """Recompute each source-vs-reference energy distance by the
    O(n·m) textbook double loops over raw length lists — independent
    of the query's prefix-sum identity."""
    rows = con.execute(
        "SELECT source, n_chars FROM read_parquet('{sf}/documents.parquet')".format(
            sf=SF
        )
    ).fetchall()
    by_src: dict[str, list[int]] = {}
    for s, v in rows:
        by_src.setdefault(s, []).append(int(v))
    ref = min(by_src)
    got = {
        r["source"]: r
        for r in QUERIES["q409_banded_energy_reference"](spark, SF).collect()
    }
    assert sorted(got) == sorted(s for s in by_src if s != ref)
    a = by_src[ref]
    n = len(a)
    for s in got:
        b = by_src[s]
        m = len(b)
        e_ab = sum(abs(x - y) for x in a for y in b) / (n * m)
        e_aa = sum(abs(x - y) for x in a for y in a) / (n * n)
        e_bb = sum(abs(x - y) for x in b for y in b) / (m * m)
        d2 = 2 * e_ab - e_aa - e_bb
        r = got[s]
        assert r["reference_source"] == ref
        assert (r["n_ref"], r["n_src"]) == (n, m)
        # query floors the exact rational to micro: one-quantum tol
        assert abs(r["energy_d2"] - d2) <= 2e-6 * (1 + abs(d2))
        assert r["energy_d2"] >= 0.0  # energy distance is a metric
