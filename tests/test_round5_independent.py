"""Independent re-computation checks for the round-5 queries.

Spark-vs-DuckDB parity cannot catch a bug BOTH sides share (the two
sides are usually written together); these tests recompute each new
statistic a third way — pure Python over the raw rows — so a shared
formula error (like q235's original half-median on odd pair counts,
caught by exactly this kind of check) turns red.
Runs at sf0.001 only: the point is formula independence, not scale.
"""

from __future__ import annotations

import math
import statistics
from collections import Counter, defaultdict

import duckdb
import pytest

from pipeline_usnvc_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "events", "documents", "lineitem", "customer"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def test_theil_sen_is_true_median(spark, con):
    daily = con.execute(
        """SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT),
                  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           FROM orders GROUP BY 1"""
    ).fetchall()
    # exact pair set (d2 > d1, as the query defines it)
    slopes = []
    for d1, c1 in daily:
        for d2, c2 in daily:
            if d2 > d1:
                slopes.append(round(1e6 * (c2 - c1) / (d2 - d1)))
    want = statistics.median(slopes) / 1e6
    row = QUERIES["q235_theil_sen_trend"](spark, SF).collect()[0]
    assert row["n_pairs"] == len(slopes)
    assert abs(row["slope_cents_per_day"] - want) < 1e-9


def test_mann_kendall_stat(spark, con):
    daily = con.execute(
        "SELECT CAST(ts AS DATE) AS d, count(*) FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    counts = [c for _, c in daily]
    s = sum(
        (1 if counts[j] > counts[i] else -1 if counts[j] < counts[i] else 0)
        for i in range(len(counts))
        for j in range(i + 1, len(counts))
    )
    n = len(counts)
    ties = Counter(counts)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    row = QUERIES["q236_mann_kendall"](spark, SF).collect()[0]
    assert row["n_days"] == n
    assert row["s_stat"] == s
    assert row["var18"] == n * (n - 1) * (2 * n + 5) - tie_term


def test_pareto_coverage_crossings(spark, con):
    per_cust = con.execute(
        """SELECT o_custkey, CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           FROM orders GROUP BY 1"""
    ).fetchall()
    spend = sorted(per_cust, key=lambda r: (-r[1], r[0]))
    total = sum(c for _, c in spend)
    rows = {r["pct"]: r for r in QUERIES["q243_pareto_coverage"](spark, SF).collect()}
    for pct in (50, 80, 90):
        cum, k = 0, 0
        for _, c in spend:
            cum += c
            k += 1
            if 100 * cum >= pct * total:
                break
        assert rows[pct]["n_customers"] == k, pct
        assert abs(rows[pct]["share_reached"] - cum / total) < 1e-12


def test_js_divergence_one_pair(spark, con):
    toks = con.execute(
        """SELECT source, t.token, count(*) FROM
             (SELECT source, unnest(list_filter(string_split_regex(lower(text), '[^a-zA-Z0-9]+'), t -> t <> '')) AS token
              FROM documents) t
           GROUP BY 1, 2"""
    ).fetchall()
    by_src = defaultdict(dict)
    for s, tok, c in toks:
        by_src[s][tok] = c
    srcs = sorted(by_src)
    sa, sb = srcs[0], srcs[1]
    na, nb = sum(by_src[sa].values()), sum(by_src[sb].values())
    acc = 0
    for tok in set(by_src[sa]) | set(by_src[sb]):
        ca, cb = by_src[sa].get(tok, 0), by_src[sb].get(tok, 0)
        p, q = ca / na, cb / nb
        term = 0.0
        if ca > 0:
            term += 0.5 * p * round(math.log(2.0 * p / (p + q)), 6)
        if cb > 0:
            term += 0.5 * q * round(math.log(2.0 * q / (p + q)), 6)
        acc += round(1e9 * term)
    want = acc / 1e9
    got = {
        (r["src_a"], r["src_b"]): r["jsd_nats"]
        for r in QUERIES["q237_js_divergence"](spark, SF).collect()
    }[(sa, sb)]
    assert abs(got - want) < 1e-9
    # JSD is bounded by ln 2 and non-negative
    assert -1e-6 <= got <= math.log(2) + 1e-6


def test_fano_factor_formula(spark, con):
    daily = con.execute(
        "SELECT event_type, CAST(ts AS DATE), count(*) FROM events GROUP BY 1, 2"
    ).fetchall()
    per_type = defaultdict(list)
    for t, _, c in daily:
        per_type[t].append(c)
    rows = {r["event_type"]: r for r in QUERIES["q257_fano_factor"](spark, SF).collect()}
    for t, cs in per_type.items():
        mean = sum(cs) / len(cs)
        var = sum((c - mean) ** 2 for c in cs) / len(cs)  # population
        assert abs(rows[t]["fano"] - round(var / mean, 6)) < 2e-6, t


def test_time_in_state_totals(spark, con):
    ev = con.execute(
        "SELECT user_id, epoch_us(ts), event_type, event_id FROM events ORDER BY user_id, ts, event_id"
    ).fetchall()
    per_user = defaultdict(list)
    for u, t, ty, eid in ev:
        per_user[u].append((t, ty))
    occ, n_int = Counter(), Counter()
    for u, seq in per_user.items():
        for (t1, ty), (t2, _) in zip(seq, seq[1:]):
            occ[ty] += t2 - t1
            n_int[ty] += 1
    rows = {r["event_type"]: r for r in QUERIES["q241_time_in_state"](spark, SF).collect()}
    for ty in occ:
        assert rows[ty]["total_us"] == occ[ty], ty
        assert rows[ty]["n_intervals"] == n_int[ty], ty
    assert abs(sum(r["time_share"] for r in rows.values()) - 1.0) < 1e-9


def test_leadtime_percentiles_exact(spark, con):
    gaps = sorted(
        r[0]
        for r in con.execute(
            """SELECT date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))
               FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"""
        ).fetchall()
    )
    n = len(gaps)
    rows = {r["pct"]: r for r in QUERIES["q262_leadtime_percentiles"](spark, SF).collect()}
    for pct in (50, 90, 99):
        # smallest gap g with |{x <= g}| covering >= pct% of rows
        want = gaps[math.ceil(pct * n / 100) - 1]
        assert rows[pct]["gap_days"] == want, pct
        assert rows[pct]["n_lines"] == n


def test_rfm_migration_partitions_customers(spark, con):
    n_cust = con.execute(
        "SELECT count(DISTINCT o_custkey) FROM orders"
    ).fetchone()[0]
    rows = QUERIES["q258_rfm_migration"](spark, SF).collect()
    # each customer lands in exactly one (seg_early, seg_late) cell
    assert sum(r["n_customers"] for r in rows) == n_cust
    # quintiles are 1..5, 0 = absent from that half; never (0, 0)
    for r in rows:
        assert 0 <= r["seg_early"] <= 5 and 0 <= r["seg_late"] <= 5
        assert (r["seg_early"], r["seg_late"]) != (0, 0)


def test_hapax_and_survivorship_consistency(spark, con):
    # hapax: recompute per-source once-only token counts
    toks = con.execute(
        """SELECT source, t.token, count(*) FROM
             (SELECT source, unnest(list_filter(string_split_regex(lower(text), '[^a-zA-Z0-9]+'), t -> t <> '')) AS token
              FROM documents) t GROUP BY 1, 2"""
    ).fetchall()
    vocab, hapax = Counter(), Counter()
    for s, _, c in toks:
        vocab[s] += 1
        if c == 1:
            hapax[s] += 1
    rows = {r["source"]: r for r in QUERIES["q266_hapax_ratio"](spark, SF).collect()}
    for s in vocab:
        assert rows[s]["vocab_size"] == vocab[s]
        assert rows[s]["n_hapax"] == hapax[s]
    # survivorship: keeper_longest must have max n_chars in its group.
    # Round 11 de-vacuized q252 by planting duplicate classes (the
    # shipped table has no exact duplicates) — rebuild the SAME
    # planted corpus before grouping.
    base = con.execute(
        "SELECT doc_id, n_chars, text FROM documents"
    ).fetchall()
    mx = max(r[0] for r in base)
    corpus = [(int(d), int(n), t) for d, n, t in base]
    corpus += [(2 * mx - d + 1, n, t) for d, n, t in corpus[: len(base)] if d % 7 == 0]
    corpus += [
        (3 * mx + 2 + d, n + 4, t + " !!!")
        for d, n, t in corpus[: len(base)]
        if d % 21 == 0
    ]
    import hashlib
    import re as _re

    def _dg(text):
        toks = [t for t in _re.split(r"[^0-9a-z]+", (text or "").lower()) if t]
        return hashlib.md5(" ".join(toks).encode()).hexdigest()

    docs = {d: (n, _dg(t)) for d, n, t in corpus}
    groups = defaultdict(list)
    for doc_id, (n_chars, dg) in docs.items():
        groups[dg].append((doc_id, n_chars))
    for r in QUERIES["q252_dedup_survivorship"](spark, SF).collect():
        members = groups[r["digest"]]
        assert len(members) == r["group_size"]
        max_len = max(n for _, n in members)
        assert docs[r["keeper_longest"]][0] == max_len
        assert r["keeper_first"] == min(d for d, _ in members)


def test_km_survival_pure_python(spark, con):
    rows = con.execute(
        "SELECT user_id, CAST(ts AS DATE) FROM events WHERE event_type = 'purchase'"
    ).fetchall()
    per_user = defaultdict(list)
    for u, d in rows:
        per_user[u].append(d)
    dmax = max(d for _, d in rows)
    spells = []
    for u, ds in per_user.items():
        ds = sorted(ds)
        first = ds[0]
        nxt = next((d for d in ds if d > first), None)
        if nxt is not None:
            spells.append(((nxt - first).days, True))
        else:
            spells.append(((dmax - first).days, False))
    spells = [(t, e) for t, e in spells if t > 0]
    from collections import Counter as C

    leaving, events_at = C(), C()
    for t, e in spells:
        leaving[t] += 1
        if e:
            events_at[t] += 1
    surv, acc, zero = {}, 0.0, False
    n_at_risk = {}
    remaining = len(spells)
    for t in sorted(leaving):
        n_at_risk[t] = remaining
        d = events_at.get(t, 0)
        if d >= remaining:
            zero = True
        elif d > 0:
            acc += round(math.log(1.0 - d / remaining), 6)
        if d > 0:
            surv[t] = 0.0 if zero else round(math.exp(acc), 6)
        remaining -= leaving[t]
    got = {
        r["day_lag"]: r for r in QUERIES["q270_repeat_purchase_survival"](spark, SF).collect()
    }
    assert set(got) == set(surv)
    for t in surv:
        assert got[t]["n_risk"] == n_at_risk[t], t
        assert abs(got[t]["survival"] - surv[t]) < 1e-9, t
    # survival is monotonically non-increasing
    ts = sorted(surv)
    assert all(surv[a] >= surv[b] - 1e-12 for a, b in zip(ts, ts[1:]))


def test_order_gap_medians_pure_python(spark, con):
    rows = con.execute(
        "SELECT o_custkey, CAST(o_orderdate AS DATE), o_orderkey FROM orders ORDER BY 1, 2, 3"
    ).fetchall()
    per_cust = defaultdict(list)
    for c, d, k in rows:
        per_cust[c].append(d)
    hist = Counter()
    gap_totals = Counter()
    for c, ds in per_cust.items():
        gaps = [(b - a).days for a, b in zip(ds, ds[1:])]
        if not gaps:
            continue
        med2 = round(2 * statistics.median(gaps))
        hist[med2] += 1
        gap_totals[med2] += len(gaps)
    got = {r["med2"]: r for r in QUERIES["q269_order_gap_medians"](spark, SF).collect()}
    assert {k: v["n_customers"] for k, v in got.items()} == dict(hist)
    assert {k: v["total_gaps"] for k, v in got.items()} == dict(gap_totals)


def test_privacy_audits_pure_python(spark, con):
    rows = con.execute(
        """SELECT c.c_mktsegment, c.c_nationkey, CAST(floor(c.c_acctbal / 1000) AS BIGINT),
                  o.o_orderpriority
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"""
    ).fetchall()
    classes = defaultdict(Counter)
    glob = Counter()
    for seg, nat, band, prio in rows:
        lvl = int(prio[0])
        classes[(seg, nat, band)][lvl] += 1
        glob[lvl] += 1
    n_g = sum(glob.values())

    ldiv = {
        (r["c_mktsegment"], r["c_nationkey"], r["acctbal_band"]): r
        for r in QUERIES["q273_l_diversity"](spark, SF).collect()
    }
    tclose = {
        (r["c_mktsegment"], r["c_nationkey"], r["acctbal_band"]): r
        for r in QUERIES["q274_t_closeness"](spark, SF).collect()
    }
    assert set(ldiv) == set(classes) == set(tclose)
    for key, cnt in classes.items():
        n_c = sum(cnt.values())
        ent = sum(
            round(-1e9 * (c / n_c) * round(math.log(c / n_c), 6))
            for c in cnt.values()
        ) / 1e9
        assert ldiv[key]["n_orders"] == n_c
        assert ldiv[key]["n_priorities"] == len(cnt)
        # python round() is half-EVEN while both engines round half
        # away from zero: allow 1 nano per term of drift
        assert abs(ldiv[key]["entropy_nats"] - ent) < 1e-8, key
        # entropy bounds: [0, ln 5]
        assert -1e-9 <= ldiv[key]["entropy_nats"] <= math.log(5) + 1e-6
        # EMD: sum over ordered levels of |CDF_c - CDF_g|
        cum_c = cum_g = 0
        emd_num = 0
        for lvl in (1, 2, 3, 4, 5):
            cum_c += cnt.get(lvl, 0)
            cum_g += glob.get(lvl, 0)
            emd_num += abs(cum_c * n_g - cum_g * n_c)
        want = emd_num / (n_c * n_g * 4)  # ground distance |i-j|/(m-1)
        assert abs(tclose[key]["emd"] - want) < 1e-12, key
        assert 0.0 <= tclose[key]["emd"] <= 1.0
