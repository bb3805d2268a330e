"""Independent third-implementation checks for the round-6 stats
family: every statistic is recomputed in pure Python from raw parquet
(via DuckDB fetch only — no SQL math), then compared against the Spark
query output. This is the class of test that catches a formula bug
BOTH engines share (oracle hash parity alone cannot — the round-4
q234 lesson)."""

from __future__ import annotations

import math
import statistics

import duckdb
import pytest

from pipeline_usnvc_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation", "documents", "events"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _mid_ranks(values):
    """Average ranks with ties, 1-based (the textbook definition)."""
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and values[order[j + 1]] == values[order[i]]:
            j += 1
        avg = (i + 1 + j + 1) / 2.0
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


def _pearson(xs, ys):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    dx = math.sqrt(sum((x - mx) ** 2 for x in xs))
    dy = math.sqrt(sum((y - my) ** 2 for y in ys))
    return num / (dx * dy)


def test_spearman_is_pearson_on_mid_ranks(spark, con):
    rows = con.execute(
        "SELECT l_returnflag, l_discount, l_quantity FROM lineitem"
    ).fetchall()
    by_rf: dict[str, list[tuple[float, float]]] = {}
    for rf, d, q in rows:
        by_rf.setdefault(rf, []).append((d, q))
    got = {
        r["l_returnflag"]: (r["n_rows"], r["spearman_rho"])
        for r in QUERIES["q312_spearman_corr"](spark, SF).collect()
    }
    for rf, pairs in by_rf.items():
        rd = _mid_ranks([p[0] for p in pairs])
        rq = _mid_ranks([p[1] for p in pairs])
        want = round(_pearson(rd, rq), 6)
        n, rho = got[rf]
        assert n == len(pairs)
        assert abs(rho - want) <= 1e-6


def test_mann_whitney_u_and_z(spark, con):
    rows = con.execute("SELECT lang, n_chars FROM documents").fetchall()
    en = [v for lang, v in rows if lang == "en"]
    other = [v for lang, v in rows if lang != "en"]
    combined = en + other
    ranks = _mid_ranks(combined)
    r1 = sum(ranks[: len(en)])
    n1, n2 = len(en), len(other)
    nt = n1 + n2
    u1 = r1 - n1 * (n1 + 1) / 2.0
    # tie correction
    from collections import Counter

    ties = sum(t**3 - t for t in Counter(combined).values())
    sigma = math.sqrt(
        n1 * n2 / 12.0 * ((nt + 1) - ties / (nt * (nt - 1)))
    )
    want_z = round((u1 - n1 * n2 / 2.0) / sigma, 6)
    row = QUERIES["q313_mann_whitney"](spark, SF).collect()[0]
    assert row["n_en"] == n1 and row["n_other"] == n2
    assert row["u_x2"] == round(2 * u1)
    assert abs(row["z"] - want_z) < 2e-6  # micro-quantization slack


def test_anova_f_matches_textbook(spark, con):
    rows = con.execute("SELECT source, n_chars FROM documents").fetchall()
    groups: dict[str, list[int]] = {}
    for s, v in rows:
        groups.setdefault(s, []).append(v)
    all_v = [v for vs in groups.values() for v in vs]
    grand = sum(all_v) / len(all_v)
    ssb = sum(len(vs) * (sum(vs) / len(vs) - grand) ** 2 for vs in groups.values())
    ssw = sum(
        (v - sum(vs) / len(vs)) ** 2 for vs in groups.values() for v in vs
    )
    k, n = len(groups), len(all_v)
    want_f = (ssb / (k - 1)) / (ssw / (n - k))
    row = QUERIES["q314_anova_f"](spark, SF).collect()[0]
    assert row["n_groups"] == k and row["n_docs"] == n
    assert abs(row["f_stat"] - want_f) < 1e-4  # micro-rounded terms
    assert abs(row["eta_sq"] - ssb / (ssb + ssw)) < 1e-4


def test_two_proportion_z(spark, con):
    rows = con.execute(
        """SELECT n.n_name,
                  count(*),
                  count(*) FILTER (WHERE c.c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'))
           FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
           GROUP BY 1"""
    ).fetchall()
    nt = sum(r[1] for r in rows)
    xt = sum(r[2] for r in rows)
    got = {r["n_name"]: r for r in QUERIES["q315_two_proportion_z"](spark, SF).collect()}
    for name, n1, x1 in rows:
        n2, x2 = nt - n1, xt - x1
        r = got[name]
        assert r["n_customers"] == n1 and r["n_converted"] == x1
        if n1 == 0 or n2 == 0 or xt == 0 or xt == nt:
            # degenerate pooled proportion: the query's guard emits NULL
            assert r["z"] is None and r["significant"] is None
            continue
        p = xt / nt
        want = (x1 / n1 - x2 / n2) / math.sqrt(p * (1 - p) * (1 / n1 + 1 / n2))
        assert abs(r["z"] - round(want, 6)) <= 1e-6
        assert r["significant"] == (abs(round(want, 6)) > 1.96)


def test_theil_index(spark, con):
    rows = con.execute(
        """SELECT c.c_mktsegment, o.o_custkey, sum(CAST(floor(o.o_totalprice*100) AS BIGINT))
           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
           GROUP BY 1, 2"""
    ).fetchall()
    segs: dict[str, list[int]] = {}
    for seg, _, cents in rows:
        if cents > 0:
            segs.setdefault(seg, []).append(cents)
    got = {
        r["c_mktsegment"]: r for r in QUERIES["q316_theil_index"](spark, SF).collect()
    }
    for seg, xs in segs.items():
        s, n = sum(xs), len(xs)
        want = sum((x / s) * math.log(x * n / s) for x in xs)
        assert got[seg]["n_customers"] == n
        assert abs(got[seg]["theil_t"] - want) < 1e-5


def test_assortativity(spark, con):
    edges = con.execute(
        "SELECT DISTINCT l_suppkey, l_partkey FROM lineitem"
    ).fetchall()
    from collections import Counter

    ds = Counter(s for s, _ in edges)
    dp = Counter(p for _, p in edges)
    js = [ds[s] for s, _ in edges]
    ks = [dp[p] for _, p in edges]
    want = round(_pearson(js, ks), 6)
    row = QUERIES["q317_assortativity"](spark, SF).collect()[0]
    assert row["n_edges"] == len(edges)
    assert abs(row["assortativity"] - want) <= 1e-6


def test_burrows_delta(spark, con):
    import re
    from collections import Counter

    rows = con.execute("SELECT source, text FROM documents").fetchall()
    tc: dict[str, Counter] = {}
    for source, text in rows:
        toks = [t for t in re.split(r"[^a-zA-Z0-9]+", (text or "").lower()) if t]
        tc.setdefault(source, Counter()).update(toks)
    totals = {s: sum(c.values()) for s, c in tc.items()}
    corpus = Counter()
    for c in tc.values():
        corpus.update(c)
    top = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    sources = sorted(tc)
    m = len(sources)
    z: dict[tuple[str, str], int] = {}
    for term, _ in top:
        fs = {s: (tc[s][term] * 1_000_000_000) // totals[s] for s in sources}
        sf_, sff = sum(fs.values()), sum(v * v for v in fs.values())
        var_num = m * sff - sf_ * sf_
        for s in sources:
            z[(term, s)] = (
                round(1e6 * (m * fs[s] - sf_) / math.sqrt(var_num))
                if var_num > 0
                else 0
            )
    got = {
        (r["source_a"], r["source_b"]): r
        for r in QUERIES["q318_burrows_delta"](spark, SF).collect()
    }
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            total = sum(abs(z[(t, a)] - z[(t, b)]) for t, _ in top)
            want_micro = total // len(top)
            r = got[(a, b)]
            assert r["n_terms"] == len(top)
            assert r["delta_micro"] == want_micro


def test_flesch_readability(spark, con):
    import re

    rows = dict(con.execute("SELECT doc_id, text FROM documents LIMIT 50").fetchall())
    got = {
        r["doc_id"]: r
        for r in QUERIES["q319_flesch_readability"](spark, SF)
        .filter("doc_id < 50")
        .collect()
    }
    for doc_id, text in rows.items():
        words = len([t for t in re.split(r"[^a-zA-Z0-9]+", (text or "").lower()) if t])
        sentences = max(len(re.findall(r"[.!?]+", text or "")), 1)
        syllables = len(re.findall(r"[aeiouy]+", (text or "").lower()))
        r = got[doc_id]
        assert r["n_words"] == words
        assert r["n_sentences"] == sentences
        assert r["n_syllables"] == syllables
        if words:
            want = 206.835 - 1.015 * words / sentences - 84.6 * syllables / words
            assert abs(r["flesch"] - want) < 1e-5


def test_bootstrap_weights_and_se(spark, con):
    import hashlib

    rows = con.execute(
        "SELECT o_orderkey, CAST(floor(o_totalprice*100) AS BIGINT) FROM orders"
    ).fetchall()
    means = []
    for b in range(32):
        n_b = s_b = 0
        for key, cents in rows:
            h = int(hashlib.md5(f"{key}_{b}".encode()).hexdigest()[:8], 16) % 4
            w = 0 if h == 0 else (2 if h == 3 else 1)
            n_b += w
            s_b += w * cents
        means.append(round(1e6 * s_b / n_b))
    sm = sum(means)
    var = (32 * sum(m * m for m in means) - sm * sm) / (32 * 31)
    want_se = round(math.sqrt(var) * math.sqrt(2) / 1e6, 6)
    want_mean = (sm // 32) / 1e6
    row = QUERIES["q320_poisson_bootstrap"](spark, SF).collect()[0]
    assert row["n_resamples"] == 32
    assert row["mean_cents"] == want_mean
    assert abs(row["se_cents"] - want_se) <= 1e-6


def test_episode_mining(spark, con):
    rows = con.execute(
        "SELECT user_id, event_id, event_type, epoch_us(ts) FROM events"
    ).fetchall()
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, eid, et, t in rows:
        by_user[u].append((t, eid, et))
    occ = defaultdict(int)
    users = defaultdict(set)
    for u, evs in by_user.items():
        evs.sort()
        for i, (t1, id1, a) in enumerate(evs):
            for t2, id2, b in evs[i + 1 :]:
                if t2 - t1 > 1_800_000_000:
                    break
                if t2 > t1 or id2 > id1:
                    occ[(a, b)] += 1
                    users[(a, b)].add(u)
    got = {
        (r["type_a"], r["type_b"]): r
        for r in QUERIES["q321_episode_mining"](spark, SF).collect()
    }
    assert set(got) == set(occ)
    for pair, n in occ.items():
        assert got[pair]["n_occurrences"] == n
        assert got[pair]["n_users"] == len(users[pair])


def test_cohens_d(spark, con):
    rows = con.execute(
        "SELECT l_returnflag, l_discount >= 0.05, CAST(l_quantity AS BIGINT) FROM lineitem"
    ).fetchall()
    groups: dict[tuple, list[int]] = {}
    for rf, promo, q in rows:
        groups.setdefault((rf, promo), []).append(q)
    got = {r["l_returnflag"]: r for r in QUERIES["q322_cohens_d"](spark, SF).collect()}
    for rf in {k[0] for k in groups}:
        g1, g2 = groups.get((rf, True), []), groups.get((rf, False), [])
        if not g1 or not g2:
            continue
        m1, m2 = statistics.mean(g1), statistics.mean(g2)
        ss1 = sum((x - m1) ** 2 for x in g1)
        ss2 = sum((x - m2) ** 2 for x in g2)
        sp = math.sqrt((ss1 + ss2) / (len(g1) + len(g2) - 2))
        want = (m1 - m2) / sp
        r = got[rf]
        assert r["n_promo"] == len(g1) and r["n_rest"] == len(g2)
        assert abs(r["cohens_d"] - want) < 1e-4


def test_kendall_tau_b(spark, con):
    rows = con.execute(
        """SELECT CAST(ts AS DATE) AS d,
                  count(*) FILTER (WHERE event_type = 'view'),
                  count(*) FILTER (WHERE event_type = 'purchase')
           FROM events GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    c = d = n1 = n2 = 0
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            dx = rows[j][1] - rows[i][1]
            dy = rows[j][2] - rows[i][2]
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
            if dx == 0:
                n1 += 1
            if dy == 0:
                n2 += 1
    n0 = len(rows) * (len(rows) - 1) // 2
    want = round((c - d) / math.sqrt((n0 - n1) * (n0 - n2)), 6)
    row = QUERIES["q323_kendall_tau_b"](spark, SF).collect()[0]
    assert (row["n_pairs"], row["concordant"], row["discordant"]) == (n0, c, d)
    assert abs(row["tau_b"] - want) <= 1e-6


def test_waterfill_is_optimal_allocation(spark, con):
    import re

    rows = con.execute("SELECT source, text FROM documents").fetchall()
    toks: dict[str, int] = {}
    for s, text in rows:
        toks[s] = toks.get(s, 0) + len(
            [t for t in re.split(r"[^a-zA-Z0-9]+", (text or "").lower()) if t]
        )
    total = sum(toks.values())
    budget = total // 2
    got = {r["source"]: r for r in QUERIES["q326_waterfill_budget"](spark, SF).collect()}
    allocs = {s: got[s]["alloc"] for s in toks}
    # exact budget exhaustion
    assert sum(allocs.values()) == budget
    # feasibility: never exceed a source's own tokens
    for s in toks:
        assert 0 <= allocs[s] <= toks[s]
        assert got[s]["tokens"] == toks[s]
    # water-level property: uncapped sources are kept in full; capped
    # allocations differ by at most 1 and every capped alloc is >= any
    # uncapped source's tokens (the level sits above all full-kept)
    capped = [s for s in toks if got[s]["capped"]]
    uncapped = [s for s in toks if not got[s]["capped"]]
    for s in uncapped:
        assert allocs[s] == toks[s]
    if capped:
        lo, hi = min(allocs[s] for s in capped), max(allocs[s] for s in capped)
        assert hi - lo <= 1
        for s in uncapped:
            assert toks[s] <= hi


def test_periodogram_power(spark, con):
    rows = con.execute(
        """SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT),
                  CAST(count(*) AS BIGINT)
           FROM orders GROUP BY 1"""
    ).fetchall()
    got = {
        r["period_days"]: r for r in QUERIES["q327_periodogram"](spark, SF).collect()
    }
    for k in range(2, 15):
        re_u = sum(y * round(1e6 * math.cos(2 * math.pi * d / k)) for d, y in rows)
        im_u = sum(y * round(1e6 * math.sin(2 * math.pi * d / k)) for d, y in rows)
        want = round((re_u * re_u + im_u * im_u) / (1e12 * len(rows)), 6)
        assert got[k]["n_days"] == len(rows)
        assert abs(got[k]["power"] - want) <= 1e-5


def test_pythagorean_means_and_inequality(spark, con):
    rows = con.execute(
        "SELECT l_returnflag, CAST(floor(l_extendedprice*100) AS BIGINT) FROM lineitem"
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for rf, c in rows:
        if c > 0:
            groups.setdefault(rf, []).append(c)
    got = {
        r["l_returnflag"]: r
        for r in QUERIES["q328_pythagorean_means"](spark, SF).collect()
    }
    for rf, xs in groups.items():
        r = got[rf]
        assert r["n_rows"] == len(xs)
        am = sum(xs) / len(xs) / 100.0
        gm = math.exp(sum(round(1e6 * math.log(x)) for x in xs) / (len(xs) * 1e6)) / 100.0
        hm = len(xs) * 1e12 / sum(round(1e12 / x) for x in xs) / 100.0
        assert abs(r["arith_mean"] - am) < 1e-4
        assert abs(r["geo_mean"] - gm) < 1e-4
        assert abs(r["harm_mean"] - hm) < 1e-4
        # the free cross-check
        assert r["arith_mean"] >= r["geo_mean"] >= r["harm_mean"]


def test_tukey_outliers(spark, con):
    rows = con.execute(
        "SELECT l_returnflag, CAST(l_quantity AS BIGINT) FROM lineitem"
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for rf, v in rows:
        groups.setdefault(rf, []).append(v)
    got = {
        r["l_returnflag"]: r for r in QUERIES["q329_tukey_outliers"](spark, SF).collect()
    }
    for rf, vs in groups.items():
        vs.sort()
        n = len(vs)
        q1 = vs[math.ceil(n / 4) - 1]
        q3 = vs[math.ceil(3 * n / 4) - 1]
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        r = got[rf]
        assert (r["q1"], r["q3"]) == (q1, q3)
        assert r["n_low"] == sum(1 for v in vs if v < lo)
        assert r["n_high"] == sum(1 for v in vs if v > hi)


def test_simpson_diversity(spark, con):
    import re
    from collections import Counter

    rows = con.execute("SELECT source, text FROM documents").fetchall()
    tc: dict[str, Counter] = {}
    for s, text in rows:
        tc.setdefault(s, Counter()).update(
            t for t in re.split(r"[^a-zA-Z0-9]+", (text or "").lower()) if t
        )
    got = {
        r["source"]: r for r in QUERIES["q331_simpson_diversity"](spark, SF).collect()
    }
    for s, c in tc.items():
        nt = sum(c.values())
        num = sum(v * (v - 1) for v in c.values())
        want_ppb = (num * 1_000_000_000) // (nt * (nt - 1))
        assert got[s]["n_tokens"] == nt
        assert got[s]["d_ppb"] == want_ppb


def test_kl_divergence(spark, con):
    import re
    from collections import Counter

    rows = con.execute("SELECT source, text FROM documents").fetchall()
    tc: dict[str, Counter] = {}
    for s, text in rows:
        tc.setdefault(s, Counter()).update(
            t for t in re.split(r"[^a-zA-Z0-9]+", (text or "").lower()) if t
        )
    corpus = Counter()
    for c in tc.values():
        corpus.update(c)
    top = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    tc_all = sum(cc for _, cc in top)
    got = {r["source"]: r for r in QUERIES["q330_kl_divergence"](spark, SF).collect()}
    for s, c in tc.items():
        ts_all = sum(c[t] for t, _ in top)
        total = 0
        for t, cc in top:
            p_num, p_den = c[t] + 1, ts_all + 100
            q_num, q_den = cc + 1, tc_all + 100
            total += p_num * round(1e6 * math.log((p_num * q_den) / (p_den * q_num)))
        want = round(total / ((ts_all + 100) * 1e6), 6)
        assert abs(got[s]["kl_nats"] - want) <= 1e-6


def test_transition_entropy(spark, con):
    from collections import defaultdict

    rows = con.execute(
        "SELECT user_id, epoch_us(ts), event_id, event_type FROM events ORDER BY 1, 2, 3"
    ).fetchall()
    by_user = defaultdict(list)
    for u, t, eid, et in rows:
        by_user[u].append(et)
    cnt = defaultdict(int)
    for seq in by_user.values():
        for a, b in zip(seq, seq[1:]):
            cnt[(a, b)] += 1
    tot = defaultdict(int)
    for (a, _), n in cnt.items():
        tot[a] += n
    got = {
        r["from_type"]: r for r in QUERIES["q332_transition_entropy"](spark, SF).collect()
    }
    for a, na in tot.items():
        s = sum(
            n * round(1e6 * math.log(n / na)) for (x, _), n in cnt.items() if x == a
        )
        want = round(-s / (na * 1e6), 6)
        assert got[a]["n_transitions"] == na
        assert abs(got[a]["entropy_nats"] - want) <= 1e-6


def test_holt_smoothing(spark, con):
    rows = con.execute(
        """SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
                  sum(CAST(floor(o_totalprice*100) AS BIGINT))
           FROM orders GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    ys = [float(c) for _, c in rows]
    l, b = ys[0], 0.0
    for y in ys[1:]:
        l_new = 0.5 * y + 0.5 * (l + b)
        b = 0.3 * (l_new - l) + 0.7 * b
        l = l_new
    row = QUERIES["q333_holt_smoothing"](spark, SF).collect()[0]
    assert row["n_days"] == len(ys)
    assert abs(row["level_dollars"] - round(l / 100.0, 6)) <= 1e-6
    assert abs(row["trend_dollars"] - round(b / 100.0, 6)) <= 1e-6
    assert abs(row["forecast_dollars"] - round((l + b) / 100.0, 6)) <= 1e-6


def test_cramers_v(spark, con):
    from collections import defaultdict

    rows = con.execute(
        "SELECT event_type, CAST(dayofweek(ts) AS BIGINT), count(*) FROM events GROUP BY 1, 2"
    ).fetchall()
    r_tot, c_tot, nt = defaultdict(int), defaultdict(int), 0
    for et, dow, n in rows:
        r_tot[et] += n
        c_tot[dow] += n
        nt += n
    chi2_micro = 0
    for et, dow, n in rows:
        e = r_tot[et] * c_tot[dow] / nt
        chi2_micro += round(1e6 * (n - e) ** 2 / e)
    want_chi2 = round(chi2_micro / 1e6, 6)
    k = min(len(r_tot), len(c_tot)) - 1
    want_v = round(math.sqrt(chi2_micro / (1e6 * nt * k)), 6)
    row = QUERIES["q334_cramers_v"](spark, SF).collect()[0]
    assert (row["n_events"], row["n_types"], row["n_days"]) == (
        nt, len(r_tot), len(c_tot),
    )
    assert abs(row["chi2"] - want_chi2) <= 1e-6
    assert abs(row["cramers_v"] - want_v) <= 1e-6


def test_systematic_sample(spark, con):
    import hashlib

    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    order = sorted(
        rows, key=lambda r: (hashlib.md5((r[1] or "").encode()).hexdigest(), r[0])
    )
    want = [(doc_id, i + 1) for i, (doc_id, _) in enumerate(order) if i % 10 == 0]
    got = [
        (r["doc_id"], r["rn"])
        for r in QUERIES["q338_systematic_sample"](spark, SF).collect()
    ]
    assert got == want


def test_span_corruption(spark, con):
    import hashlib
    import re

    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    got = {
        r["doc_id"]: r for r in QUERIES["q339_span_corruption"](spark, SF).collect()
    }
    for doc_id, text in rows[:100]:
        toks = [t for t in re.split(r"[^a-zA-Z0-9]+", (text or "").lower()) if t]
        starts = [
            1
            if int(hashlib.md5(f"{doc_id}:{p}".encode()).hexdigest()[:8], 16) % 7 == 0
            else 0
            for p in range(1, len(toks) + 1)
        ]
        masked = [
            1 if any(starts[max(0, i - 2) : i + 1]) else 0
            for i in range(len(starts))
        ]
        r = got.get(doc_id)
        if not toks:
            assert r is None or r["n_tokens"] == 0
            continue
        assert r["n_tokens"] == len(toks)
        assert r["n_spans"] == sum(starts)
        assert r["n_masked"] == sum(masked)
        assert abs(r["corruption_rate"] - round(sum(masked) / len(toks), 6)) <= 1e-9


def test_shapley_attribution(spark, con):
    """Pure-Python empirical Shapley over the observed coalition
    lattice — including efficiency-style sanity: each channel's
    credit equals the factorial-weighted marginal average."""
    from collections import defaultdict

    rows = con.execute("SELECT user_id, event_type FROM events").fetchall()
    chans = sorted({et for _, et in rows if et != "purchase"})
    bit = {c: i for i, c in enumerate(chans)}
    n = len(chans)
    mask_of = defaultdict(int)
    conv = defaultdict(int)
    for u, et in rows:
        if et == "purchase":
            conv[u] = 1
        else:
            mask_of[u] |= 1 << bit[et]
    users = set(mask_of) | set(conv)
    coal_n = defaultdict(int)
    coal_c = defaultdict(int)
    for u in users:
        m = mask_of.get(u, 0)
        coal_n[m] += 1
        coal_c[m] += conv.get(u, 0)
    v = {m: round(1e6 * coal_c[m] / coal_n[m]) for m in coal_n}
    fact = [1, 1, 2, 6, 24, 120]
    got = {
        r["channel"]: r["shapley_credit"]
        for r in QUERIES["q340_shapley_attribution"](spark, SF).collect()
    }
    for c in chans:
        b = 1 << bit[c]
        total = 0
        for s in range(1 << n):
            if s & b:
                continue
            ssize = bin(s).count("1")
            m = v.get(s | b, 0) - v.get(s, 0)
            total += fact[ssize] * fact[n - ssize - 1] * m
        want = round(total / (fact[n] * 1e6), 6)
        assert abs(got[c] - want) <= 1e-9


def test_shapley_channel_cardinality_guard(spark):
    """VERDICT r07 item 8: feeding a high-cardinality key as
    "channels" must fail fast with a loud error naming the
    permutation-sampling fallback — never expand the 2^20-row
    coalition lattice."""
    import pytest

    from pipeline_usnvc_spark.plans.stats_queries import shapley_attribution

    ev = spark.createDataFrame(
        [(f"u{i % 7}", f"channel_{i:02d}") for i in range(20)]
        + [("u0", "purchase")],
        "user_id string, event_type string",
    )
    with pytest.raises(ValueError, match="permutation-sampling"):
        shapley_attribution(ev)
