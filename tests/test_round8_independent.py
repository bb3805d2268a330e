"""Independent third-implementation checks for the round-8 family
(q378-q400): raw values come back via DuckDB fetch only — no SQL
math — and every statistic is re-derived in pure Python, so a
formula bug shared by BOTH engines (the round-4 q234 lesson) still
fails here."""

from __future__ import annotations

import math
import re
from datetime import date

import duckdb
import pytest

from pipeline_usnvc_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"

EPOCH = date(1992, 1, 1)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in (
        "events",
        "documents",
        "orders",
        "customer",
        "nation",
        "lineitem",
        "part",
        "embeddings",
    ):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _toks(text: str | None) -> list[str]:
    return [t for t in re.split(r"[^a-zA-Z0-9]+", (text or "").lower()) if t]


def _rhu(x: float) -> int:
    """round-half-away-from-zero, matching Spark/DuckDB round()."""
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _score_micro(n_chars: int) -> int:
    return _rhu(1000000.0 / (1.0 + math.exp(-(n_chars - 500.0) / 250.0)))


def _fdiv6(num: int, den: int) -> float:
    """floor(num*1e6/den)/1e6 — the repo's exact-ratio discipline."""
    return (num * 1000000 // den) / 1000000.0


def _docs(con):
    return con.execute(
        "SELECT doc_id, text, lang, source, n_chars FROM documents"
    ).fetchall()


# ---------------------------------------------------------------------------
# eval tier 2
# ---------------------------------------------------------------------------


def test_confusion_mcc(spark, con):
    rows = con.execute("SELECT n_chars, lang FROM documents").fetchall()
    tp = fp = fn = tn = 0
    for n_chars, lang in rows:
        pos = _score_micro(n_chars) >= 500000
        y = lang == "en"
        if y and pos:
            tp += 1
        elif (not y) and pos:
            fp += 1
        elif y and not pos:
            fn += 1
        else:
            tn += 1
    r = QUERIES["q378_confusion_mcc"](spark, SF).collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn)
    assert abs(r["precision_pos"] - _fdiv6(tp, tp + fp)) <= 1e-9
    assert abs(r["recall_pos"] - _fdiv6(tp, tp + fn)) <= 1e-9
    assert abs(r["f1_pos"] - _fdiv6(2 * tp, 2 * tp + fp + fn)) <= 1e-9
    mcc = round(
        (tp * tn - fp * fn)
        / math.sqrt(float((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))),
        6,
    )
    assert abs(r["mcc"] - mcc) <= 1e-9


def test_macro_f1(spark, con):
    rows = con.execute("SELECT source, lang FROM documents").fetchall()
    counts: dict[tuple[str, str], int] = {}
    for s, l in rows:
        counts[(s, l)] = counts.get((s, l), 0) + 1
    majority = {}
    for s in {s for s, _ in counts}:
        majority[s] = min(
            ((-c, l) for (src, l), c in counts.items() if src == s)
        )[1]
    conf: dict[tuple[str, str], int] = {}
    for s, l in rows:
        key = (l, majority[s])
        conf[key] = conf.get(key, 0) + 1
    classes = sorted({truth for truth, _ in conf})
    f1_micro = {}
    per = {}
    for c in classes:
        tp = conf.get((c, c), 0)
        fp = sum(v for (t, p), v in conf.items() if p == c and t != c)
        fn = sum(v for (t, p), v in conf.items() if t == c and p != c)
        per[c] = (tp, fp, fn)
        f1_micro[c] = 2 * tp * 1000000 // (2 * tp + fp + fn)
    macro = sum(f1_micro.values()) // len(classes) / 1000000.0
    got = {r["lang"]: r for r in QUERIES["q379_macro_f1"](spark, SF).collect()}
    assert sorted(got) == classes
    for c in classes:
        tp, fp, fn = per[c]
        assert (got[c]["tp"], got[c]["fp"], got[c]["fn"]) == (tp, fp, fn)
        assert abs(got[c]["f1"] - f1_micro[c] / 1000000.0) <= 1e-9
        assert abs(got[c]["macro_f1"] - macro) <= 1e-9


def _brand_rankings(con):
    """Per-brand (pos-ranked list of relevance flags) replicating
    q355/q380/q381's grading: grade = 4 - ntile(4) over (rev desc,
    partkey), position rank = (price desc, partkey)."""
    rev = dict(
        con.execute(
            """SELECT l_partkey,
                      CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)
               FROM lineitem GROUP BY 1"""
        ).fetchall()
    )
    parts = con.execute(
        "SELECT p_brand, p_partkey, p_retailprice FROM part"
    ).fetchall()
    by_brand: dict[str, list[tuple]] = {}
    for b, pk, price in parts:
        if pk in rev:
            by_brand.setdefault(b, []).append((pk, price, rev[pk]))
    out = {}
    for b, lst in by_brand.items():
        n = len(lst)
        by_rev = sorted(lst, key=lambda t: (-t[2], t[0]))
        grade = {}
        i = 0
        for bucket in range(1, 5):
            size = n // 4 + (1 if bucket <= n % 4 else 0)
            for _ in range(size):
                grade[by_rev[i][0]] = 4 - bucket
                i += 1
        by_price = sorted(lst, key=lambda t: (-t[1], t[0]))
        out[b] = [grade[pk] == 3 for pk, _, _ in by_price]
    return out


def test_mrr_eval(spark, con):
    ranks = _brand_rankings(con)
    got = {r["p_brand"]: r for r in QUERIES["q380_mrr_eval"](spark, SF).collect()}
    assert sorted(got) == sorted(ranks)
    for b, rels in ranks.items():
        first = rels.index(True) + 1
        assert got[b]["first_rel_pos"] == first
        assert abs(got[b]["reciprocal_rank"] - _fdiv6(1, first)) <= 1e-9


def test_map_eval(spark, con):
    ranks = _brand_rankings(con)
    got = {r["p_brand"]: r for r in QUERIES["q381_map_eval"](spark, SF).collect()}
    for b, rels in ranks.items():
        n_rel = sum(rels)
        s = 0
        cum = 0
        for pos, rel in enumerate(rels, start=1):
            cum += rel
            if rel and pos <= 10:
                s += cum * 1000000 // pos
        ap = (s // min(10, n_rel)) / 1000000.0
        assert got[b]["n_rel"] == n_rel
        assert abs(got[b]["ap_at_10"] - ap) <= 1e-9


def test_brier_decomposition(spark, con):
    rows = con.execute("SELECT n_chars, lang FROM documents").fetchall()
    bins: dict[int, list[tuple[int, int]]] = {}
    for n_chars, lang in rows:
        v = _score_micro(n_chars)
        y = 1 if lang == "en" else 0
        bins.setdefault(min(v // 100000, 9), []).append((v, y))
    nn = sum(len(b) for b in bins.values())
    xx = sum(y for b in bins.values() for _, y in b)
    sq_all = sum((v - y * 1000000) ** 2 for b in bins.values() for v, y in b)
    rel_num = res_num = 0
    for b in bins.values():
        n = len(b)
        x = sum(y for _, y in b)
        c = sum(v for v, _ in b)
        rel_num += (c - x * 1000000) ** 2 // n
        res_num += (nn * x - n * xx) ** 2 * 1000000 // (n * nn * nn)
    r = QUERIES["q382_brier_decomposition"](spark, SF).collect()[0]
    assert r["n_docs"] == nn
    assert abs(r["brier"] - (sq_all // (nn * 1000000)) / 1000000.0) <= 1e-9
    assert abs(r["reliability"] - (rel_num // (nn * 1000000)) / 1000000.0) <= 1e-9
    assert abs(r["resolution"] - (res_num // nn) / 1000000.0) <= 1e-9
    assert (
        abs(r["uncertainty"] - (xx * (nn - xx) * 1000000 // (nn * nn)) / 1000000.0)
        <= 1e-9
    )
    # q386-class scaling guard: recompute each statistic in plain
    # floats from probabilities — a shared micro-unit scaling bug in
    # the final expressions (the advisor's round-8 finding) fails here
    ps = [(v / 1e6, y) for b in bins.values() for v, y in b]
    ybar = xx / nn
    brier_f = sum((pv - y) ** 2 for pv, y in ps) / nn
    rel_f = res_f = 0.0
    for b in bins.values():
        n_b = len(b)
        pbar = sum(v for v, _ in b) / n_b / 1e6
        ybar_b = sum(y for _, y in b) / n_b
        rel_f += n_b * (pbar - ybar_b) ** 2 / nn
        res_f += n_b * (ybar_b - ybar) ** 2 / nn
    assert abs(r["brier"] - brier_f) <= 1e-5
    assert abs(r["reliability"] - rel_f) <= 1e-5
    assert abs(r["resolution"] - res_f) <= 1e-5
    assert abs(r["uncertainty"] - ybar * (1 - ybar)) <= 1e-5
    # Murphy identity (collapsed-to-bin scores): brier ~ rel - res + unc
    assert (
        abs(r["brier"] - (r["reliability"] - r["resolution"] + r["uncertainty"]))
        <= 0.01
    )


def test_hosmer_lemeshow(spark, con):
    rows = con.execute("SELECT n_chars, lang FROM documents").fetchall()
    bins: dict[int, list[tuple[int, int]]] = {}
    for n_chars, lang in rows:
        v = _score_micro(n_chars)
        bins.setdefault(min(v // 100000, 9), []).append(
            (v, 1 if lang == "en" else 0)
        )
    got = {r["bin"]: r for r in QUERIES["q383_hosmer_lemeshow"](spark, SF).collect()}
    assert sorted(got) == sorted(bins)
    hl_total = 0
    for k, b in bins.items():
        n, x, c = len(b), sum(y for _, y in b), sum(v for v, _ in b)
        term = (x * 1000000 - c) ** 2 * n * 1000000 // (c * (n * 1000000 - c))
        hl_total += term
        assert got[k]["n_docs"] == n and got[k]["observed"] == x
        assert abs(got[k]["expected"] - round(c / 1000000.0, 6)) <= 1e-9
        assert abs(got[k]["hl_term"] - term / 1000000.0) <= 1e-9
    for k in bins:
        assert abs(got[k]["hl_stat"] - hl_total / 1000000.0) <= 1e-9
        assert got[k]["df"] == len(bins) - 2
    # q386-class scaling guard: float recompute of the HL statistic
    hl_f = 0.0
    for b in bins.values():
        n_b, x_b = len(b), sum(y for _, y in b)
        e_b = sum(v for v, _ in b) / 1e6
        hl_f += (x_b - e_b) ** 2 / (e_b * (1 - e_b / n_b))
    any_bin = next(iter(bins))
    assert abs(got[any_bin]["hl_stat"] - hl_f) <= 2e-5 * (1 + abs(hl_f))


def test_log_loss(spark, con):
    rows = con.execute("SELECT n_chars, lang FROM documents").fetchall()
    s = 0
    x = 0
    for n_chars, lang in rows:
        v = min(max(_score_micro(n_chars), 1), 999999)
        y = 1 if lang == "en" else 0
        x += y
        p = v / 1000000.0 if y == 1 else (1000000 - v) / 1000000.0
        s += _rhu(-1000000.0 * math.log(p))
    n = len(rows)
    r = QUERIES["q384_log_loss"](spark, SF).collect()[0]
    assert r["n_docs"] == n
    assert abs(r["mean_log_loss"] - (s // n) / 1000000.0) <= 1e-9
    rate = x / n
    ent = round(-rate * math.log(rate) - (1 - rate) * math.log(1 - rate), 6)
    assert abs(r["base_rate_entropy"] - ent) <= 1e-9


def test_weighted_kappa(spark, con):
    rows = con.execute("SELECT n_chars, text FROM documents").fetchall()

    def band_a(nc):
        return 0 if nc < 250 else 1 if nc < 350 else 2 if nc < 450 else 3

    def band_b(nw):
        return 0 if nw < 32 else 1 if nw < 55 else 2 if nw < 76 else 3

    cells: dict[tuple[int, int], int] = {}
    for nc, text in rows:
        k = (band_a(nc), band_b(len(_toks(text))))
        cells[k] = cells.get(k, 0) + 1
    n = sum(cells.values())
    na = {a: sum(v for (x, _), v in cells.items() if x == a) for a in range(4)}
    nb = {b: sum(v for (_, y), v in cells.items() if y == b) for b in range(4)}
    wo = sum(abs(a - b) * cells.get((a, b), 0) for a in range(4) for b in range(4))
    we = sum(abs(a - b) * na[a] * nb[b] for a in range(4) for b in range(4))
    kappa = ((we - n * wo) * 1000000 + 1000000 * we) // we / 1000000.0 - 1.0
    r = QUERIES["q385_weighted_kappa"](spark, SF).collect()[0]
    assert r["n_docs"] == n
    assert r["weighted_disagreement"] == wo
    assert abs(r["kappa_w"] - kappa) <= 1e-9
    # q386-class scaling guard: kappa_w = 1 - n*wo/we in plain floats
    assert abs(r["kappa_w"] - (1.0 - n * wo / we)) <= 2e-6


# ---------------------------------------------------------------------------
# survival & time-series diagnostics
# ---------------------------------------------------------------------------


def _daily_counts(con) -> list[int]:
    rows = con.execute(
        "SELECT CAST(o_orderdate AS DATE), count(*) FROM orders GROUP BY 1 ORDER BY 1"
    ).fetchall()
    return [int(c) for _, c in rows]


def test_logrank(spark, con):
    rows = con.execute(
        """SELECT user_id, CAST(ts AS DATE) FROM events
           WHERE event_type = 'purchase'"""
    ).fetchall()
    per_user: dict[int, list[int]] = {}
    for uid, dt in rows:
        per_user.setdefault(uid, []).append((dt - EPOCH).days)
    dmax = max(d for ds in per_user.values() for d in ds)
    durations = []
    for uid, ds in per_user.items():
        ds.sort()
        first = ds[0]
        nxt = next((d for d in ds if d > first), None)
        t = (nxt - first) if nxt is not None else (dmax - first)
        durations.append((uid % 2, t, 1 if nxt is not None else 0))
    times = sorted({t for _, t, _ in durations})
    o1 = e1_sum = v_sum = 0
    at1 = sum(1 for g, _, _ in durations if g == 1)
    at0 = len(durations) - at1
    for t in times:
        d1 = sum(1 for g, tt, e in durations if g == 1 and tt == t and e)
        d0 = sum(1 for g, tt, e in durations if g == 0 and tt == t and e)
        d = d1 + d0
        n1, n0 = at1, at0
        if d > 0:
            nn = n1 + n0
            o1 += d1
            e1_sum += d * n1 * 1000000 // nn
            if nn > 1:
                v_sum += (
                    d * n1 * n0 * (nn - d) * 1000000 // (nn * nn * (nn - 1))
                )
        at1 -= sum(1 for g, tt, _ in durations if g == 1 and tt == t)
        at0 -= sum(1 for g, tt, _ in durations if g == 0 and tt == t)
    # Recompute chi2 in plain floats from O1/E1/V rather than mirroring
    # the query's integer floor expression — a shared scaling bug in the
    # micro-unit arithmetic must fail here (the round-8 1e6 deflation did
    # not, because this test copied the expression verbatim).
    chi2 = (o1 - e1_sum / 1e6) ** 2 / (v_sum / 1e6)
    r = QUERIES["q386_logrank_test"](spark, SF).collect()[0]
    assert r["observed_g1"] == o1
    assert abs(r["expected_g1"] - round(e1_sum / 1000000.0, 6)) <= 1e-9
    # query floors to micro units: allow one micro step plus float drift
    assert abs(r["logrank_chi2"] - chi2) <= 2e-6 + 1e-9 * abs(chi2)
    assert r["significant_05"] == (r["logrank_chi2"] > 3.841459)


def test_durbin_watson(spark, con):
    xs = _daily_counts(con)
    D, S = len(xs), sum(xs)
    e = [D * x - S for x in xs]
    num = sum((e[i] - e[i - 1]) ** 2 for i in range(1, len(e)))
    den = sum(v * v for v in e)
    dw_micro = num * 1000000 // den
    r = QUERIES["q387_durbin_watson"](spark, SF).collect()[0]
    assert r["n_days"] == D
    assert abs(r["dw"] - dw_micro / 1000000.0) <= 1e-9
    assert abs(r["rho_hat"] - (1.0 - dw_micro / 2000000.0)) <= 1e-9


def test_runs_test(spark, con):
    xs = _daily_counts(con)
    D, S = len(xs), sum(xs)
    sgn = [1 if D * x - S >= 0 else 0 for x in xs]
    runs = 1 + sum(1 for i in range(1, len(sgn)) if sgn[i] != sgn[i - 1])
    n_up = sum(sgn)
    n_dn = D - n_up
    mu = 1.0 + 2.0 * n_up * n_dn / D
    var = 2.0 * n_up * n_dn * (2.0 * n_up * n_dn - D) / (D * D * (D - 1.0))
    z = round((runs - mu) / math.sqrt(var), 6)
    r = QUERIES["q388_runs_test"](spark, SF).collect()[0]
    assert (r["n_days"], r["n_above"], r["n_below"], r["n_runs"]) == (
        D,
        n_up,
        n_dn,
        runs,
    )
    assert abs(r["z"] - z) <= 1e-9
    assert r["nonrandom_05"] == (abs(z) > 1.959964)


def _rho_micro(xs: list[int], k: int) -> tuple[int, int]:
    D, S = len(xs), sum(xs)
    e = [D * x - S for x in xs]
    d2 = sum(v * v for v in e)
    num = sum(e[i] * e[i - k] for i in range(k, len(e)))
    return (num * 1000000 + 1000000 * d2) // d2 - 1000000, d2


def test_ljung_box(spark, con):
    xs = _daily_counts(con)
    n = len(xs)
    got = {r["lag"]: r for r in QUERIES["q389_ljung_box"](spark, SF).collect()}
    cum = 0
    for k in range(1, 8):
        rho, _ = _rho_micro(xs, k)
        cum += n * (n + 2) * rho * rho // ((n - k) * 1000000)
        assert got[k]["n_days"] == n
        assert abs(got[k]["rho"] - rho / 1000000.0) <= 1e-9
        assert abs(got[k]["lb_q_cum"] - cum / 1000000.0) <= 1e-9
    # q386-class scaling guard: rho and Q recomputed in plain floats
    D, S = len(xs), sum(xs)
    e = [D * x - S for x in xs]
    d2 = sum(v * v for v in e)
    q_f = 0.0
    for k in range(1, 8):
        rho_f = sum(e[i] * e[i - k] for i in range(k, len(e))) / d2
        assert abs(got[k]["rho"] - rho_f) <= 2e-6
        q_f += n * (n + 2) * rho_f * rho_f / (n - k)
    assert abs(got[7]["lb_q_cum"] - q_f) <= 0.05 * (1 + abs(q_f))


def test_pacf_durbin(spark, con):
    xs = _daily_counts(con)
    r1 = _rho_micro(xs, 1)[0] / 1000000.0
    r2 = _rho_micro(xs, 2)[0] / 1000000.0
    r3 = _rho_micro(xs, 3)[0] / 1000000.0
    p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    p21 = r1 * (1.0 - p22)
    p33 = (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2)
    r = QUERIES["q390_pacf_durbin"](spark, SF).collect()[0]
    assert r["n_days"] == len(xs)
    assert abs(r["pacf_1"] - round(r1, 6)) <= 1e-9
    assert abs(r["pacf_2"] - round(p22, 6)) <= 1e-9
    assert abs(r["pacf_3"] - round(p33, 6)) <= 1e-9
    # PACF(1) must equal ACF(1) by definition
    assert abs(r["pacf_1"] - round(r1, 6)) <= 1e-9


def test_ewma_control(spark, con):
    rows = con.execute(
        "SELECT CAST(o_orderdate AS DATE), count(*) FROM orders GROUP BY 1 ORDER BY 1"
    ).fetchall()
    days = [((dt - EPOCH).days, int(c)) for dt, c in rows]
    n = len(days)
    s = sum(c for _, c in days)
    ss = sum(c * c for _, c in days)
    mu = s / n
    sig = math.sqrt((n * ss - s * s) / (n * n) * (0.2 / 1.8))
    ucl, lcl = mu + 3.0 * sig, mu - 3.0 * sig
    z = mu
    viol = 0
    last = None
    for d, c in days:
        z = 0.2 * float(c) + 0.8 * z
        if z > ucl or z < lcl:
            viol += 1
            last = d
    r = QUERIES["q391_ewma_control"](spark, SF).collect()[0]
    assert r["n_days"] == n
    assert abs(r["center"] - round(mu, 6)) <= 1e-9
    assert abs(r["ucl"] - round(ucl, 6)) <= 1e-9
    assert abs(r["lcl"] - round(lcl, 6)) <= 1e-9
    assert abs(r["final_ewma"] - round(z, 6)) <= 1e-6
    assert r["n_violations"] == viol
    assert r["last_violation_day"] == last


# ---------------------------------------------------------------------------
# drift / corpus economics
# ---------------------------------------------------------------------------


def test_banded_drift_reference(spark, con):
    rows = con.execute("SELECT source, n_chars FROM documents").fetchall()
    cnt: dict[tuple[str, int], int] = {}
    for s, v in rows:
        cnt[(s, v)] = cnt.get((s, v), 0) + 1
    sources = sorted({s for s, _ in cnt})
    ref = sources[0]
    got = {
        r["source"]: r
        for r in QUERIES["q392_banded_drift_reference"](spark, SF).collect()
    }
    assert sorted(got) == sources[1:]
    for sb in sources[1:]:
        vals = sorted(
            {v for (s, v) in cnt if s in (ref, sb) and cnt.get((s, v), 0) > 0}
        )
        n = sum(c for (s, _), c in cnt.items() if s == ref)
        m = sum(c for (s, _), c in cnt.items() if s == sb)
        cfa = cfb = 0
        w1 = 0
        for i, v in enumerate(vals):
            cfa += cnt.get((ref, v), 0)
            cfb += cnt.get((sb, v), 0)
            if i + 1 < len(vals):
                gap = abs(cfa * m - cfb * n) * (vals[i + 1] - v)
                w1 += gap * 1000000 // (n * m)
        assert got[sb]["reference_source"] == ref
        assert (got[sb]["n_ref"], got[sb]["n_src"]) == (n, m)
        assert abs(got[sb]["w1_chars"] - w1 / 1000000.0) <= 1e-9


def test_chao1(spark, con):
    rows = _docs(con)
    tc: dict[tuple[str, str], int] = {}
    for _, text, _, source, _ in rows:
        for t in _toks(text):
            tc[(source, t)] = tc.get((source, t), 0) + 1
    got = {r["source"]: r for r in QUERIES["q393_chao1_richness"](spark, SF).collect()}
    for src in {s for s, _ in tc}:
        cs = [c for (s, _), c in tc.items() if s == src]
        s_obs = len(cs)
        f1 = sum(1 for c in cs if c == 1)
        f2 = sum(1 for c in cs if c == 2)
        chao = s_obs + (f1 * (f1 - 1) * 1000000 // (2 * (f2 + 1))) / 1000000.0
        r = got[src]
        assert (r["s_obs"], r["f1"], r["f2"]) == (s_obs, f1, f2)
        assert abs(r["chao1"] - chao) <= 1e-9


def test_heaps_law(spark, con):
    rows = _docs(con)
    mx = max(d for d, *_ in rows)
    term_first: dict[str, int] = {}
    doc_nt: dict[int, int] = {}
    for doc_id, text, *_ in rows:
        ts = _toks(text)
        doc_nt[doc_id] = len(ts)
        for t in ts:
            if t not in term_first or doc_id < term_first[t]:
                term_first[t] = doc_id
    pts = []
    for k in range(1, 11):
        bound = mx * k // 10
        v = sum(1 for fid in term_first.values() if fid <= bound)
        n = sum(nt for d, nt in doc_nt.items() if d <= bound)
        if v > 0 and n > 0:
            pts.append((_rhu(1000000.0 * math.log(n)), _rhu(1000000.0 * math.log(v))))
    g = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    det = g * sxx - sx * sx
    beta = (g * sxy - sx * sy) / det
    lnk = (sy - beta * sx) / g / 1000000.0
    r = QUERIES["q394_heaps_law"](spark, SF).collect()[0]
    assert r["n_prefixes"] == g
    assert abs(r["heaps_beta"] - round(beta, 6)) <= 1e-9
    assert abs(r["ln_k"] - round(lnk, 6)) <= 1e-9
    # sublinear vocab growth — the economic claim itself. The
    # synthetic corpus has a tiny fixed vocabulary (31 terms), so V
    # saturates in the first prefix and beta sits at ~0 exactly as
    # Heaps predicts for a closed vocabulary.
    assert 0.0 <= r["heaps_beta"] < 1.0


def test_atkinson(spark, con):
    rows = con.execute(
        "SELECT CAST(floor(c_acctbal*100) AS BIGINT) FROM customer WHERE c_acctbal > 0"
    ).fetchall()
    cents = [c for (c,) in rows]
    n, s = len(cents), sum(cents)
    rs = sum(_rhu(1000000.0 * math.sqrt(c / 100.0)) for c in cents)
    atk = 1.0 - (rs * rs * 1000000 // (n * s * 10000000000)) / 1000000.0
    r = QUERIES["q395_atkinson_index"](spark, SF).collect()[0]
    assert r["n_accounts"] == n
    assert abs(r["mean_balance"] - round(s / 100.0 / n, 6)) <= 1e-9
    assert abs(r["atkinson_05"] - atk) <= 1e-9
    assert 0.0 <= r["atkinson_05"] < 1.0
    # q386-class scaling guard: Atkinson(0.5) in plain floats
    vals = [c / 100.0 for c in cents]
    atk_f = 1.0 - (sum(math.sqrt(v) for v in vals) / n) ** 2 / (sum(vals) / n)
    assert abs(r["atkinson_05"] - atk_f) <= 1e-4


def test_lorenz_deciles(spark, con):
    rows = con.execute(
        "SELECT CAST(floor(c_acctbal*100) AS BIGINT) FROM customer WHERE c_acctbal > 0"
    ).fetchall()
    cents = sorted(c for (c,) in rows)
    n = len(cents)
    total = sum(cents)
    prefix = [0]
    for c in cents:
        prefix.append(prefix[-1] + c)
    got = {r["decile"]: r for r in QUERIES["q396_lorenz_deciles"](spark, SF).collect()}
    prev = -1.0
    for k in range(1, 11):
        b = (k * n + 9) // 10
        share = prefix[b] * 1000000 // total / 1000000.0
        assert got[k]["n_poorest"] == b
        assert abs(got[k]["cum_share"] - share) <= 1e-9
        # Lorenz curve is monotone and below the diagonal
        assert share >= prev
        prev = share
        assert share <= k / 10.0 + 1e-9
    assert abs(got[10]["cum_share"] - 1.0) <= 2e-6


def test_term_burstiness(spark, con):
    rows = _docs(con)
    td: dict[tuple[str, int], int] = {}
    for doc_id, text, *_ in rows:
        for t in _toks(text):
            td[(t, doc_id)] = td.get((t, doc_id), 0) + 1
    stats: dict[str, tuple[int, int, int]] = {}
    for (t, _), x in td.items():
        df, s, ss = stats.get(t, (0, 0, 0))
        stats[t] = (df + 1, s + x, ss + x * x)
    top = sorted(stats.items(), key=lambda kv: (-kv[1][1], kv[0]))[:50]
    got = {
        r["term"]: r for r in QUERIES["q397_term_burstiness"](spark, SF).collect()
    }
    assert sorted(got) == sorted(t for t, _ in top)
    for t, (df, s, ss) in top:
        vmr = ((df * ss - s * s) * 1000000 // (df * s)) / 1000000.0
        assert got[t]["n_docs"] == df and got[t]["total_count"] == s
        assert abs(got[t]["vmr"] - vmr) <= 1e-9
        assert vmr >= 0.0
        # q386-class scaling guard: VMR = var/mean in plain floats
        mean_f = s / df
        vmr_f = (ss / df - mean_f * mean_f) / mean_f
        assert abs(got[t]["vmr"] - vmr_f) <= 2e-6 * (1 + abs(vmr_f))


# ---------------------------------------------------------------------------
# quality / audit
# ---------------------------------------------------------------------------


def test_audience_jaccard(spark, con):
    rows = con.execute("SELECT DISTINCT event_type, user_id FROM events").fetchall()
    aud: dict[str, set[int]] = {}
    for t, u in rows:
        aud.setdefault(t, set()).add(u)
    types = sorted(aud)
    got = {
        (r["type_a"], r["type_b"]): r
        for r in QUERIES["q398_audience_jaccard"](spark, SF).collect()
    }
    n_pairs = 0
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            n_pairs += 1
            inter = len(aud[a] & aud[b])
            union = len(aud[a] | aud[b])
            r = got[(a, b)]
            assert (r["n_a"], r["n_b"], r["n_intersection"]) == (
                len(aud[a]),
                len(aud[b]),
                inter,
            )
            assert abs(r["jaccard"] - (inter * 1000000 // union) / 1000000.0) <= 1e-9
    assert len(got) == n_pairs


def test_fd_violation_profile(spark, con):
    rows = con.execute("SELECT source, lang FROM documents").fetchall()
    counts: dict[str, dict[str, int]] = {}
    for s, l in rows:
        counts.setdefault(s, {}).setdefault(l, 0)
        counts[s][l] += 1
    got = {
        r["source"]: r
        for r in QUERIES["q399_fd_violation_profile"](spark, SF).collect()
    }
    assert sorted(got) == sorted(counts)
    for s, langs in counts.items():
        maj = min(langs, key=lambda l: (-langs[l], l))
        n = sum(langs.values())
        viol = n - langs[maj]
        r = got[s]
        assert r["majority_lang"] == maj
        assert (r["n_docs"], r["n_langs"], r["n_violations"]) == (
            n,
            len(langs),
            viol,
        )
        assert abs(r["violation_rate"] - (viol * 1000000 // n) / 1000000.0) <= 1e-9
        assert r["fd_holds"] == (len(langs) == 1)


def test_bloom_filter_audit(spark, con):
    """Full pure-Python replay of the portable Bloom audit (round 13
    moved the positions from xxhash64 to the engine-portable md5
    idiom, so a reference build exists): rebuild the occupied-bit set
    and every probe's membership verdict in Python, pin all counts
    and both micro rates bit-for-bit."""
    import hashlib

    early = {
        u
        for (u,) in con.execute(
            "SELECT DISTINCT user_id FROM events WHERE ts < TIMESTAMP '2024-01-16'"
        ).fetchall()
    }
    late = {
        u
        for (u,) in con.execute(
            "SELECT DISTINCT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-16'"
        ).fetchall()
    }
    m_bits = 1 << max(10 * len(early), 65536).__sub__(1).bit_length()

    def pos(u, s):
        return int(hashlib.md5(f"{u}:{s}".encode()).hexdigest()[:15], 16) % m_bits

    occupied = {pos(u, s) for u in early for s in range(1, 6)}
    fp = sum(
        1
        for u in late - early
        if all(pos(u, s) in occupied for s in range(1, 6))
    )
    fn = sum(
        1
        for u in late & early
        if not all(pos(u, s) in occupied for s in range(1, 6))
    )
    r = QUERIES["q400_bloom_filter_audit"](spark, SF).collect()[0]
    assert r["m_bits"] == m_bits
    assert r["n_occ"] == len(occupied)
    assert r["n_probes"] == len(late)
    assert r["n_members"] == len(late & early)
    assert r["false_negatives"] == fn == 0
    assert r["false_positives"] == fp
    non_members = len(late) - len(late & early)
    assert r["fpr_micro"] == (
        (1000000 * fp) // non_members if non_members > 0 else 0
    )
    assert r["fpp_theory_micro"] == (
        len(occupied) ** 5 * 1000000 // m_bits**5
    )
    # the fill-derived budget must be non-degenerate (filter sized from
    # the keyset, so fill stays well below saturation at every SF)
    assert 0 <= r["fpp_theory_micro"] < 500000
    assert r["fpr_micro"] <= 3 * r["fpp_theory_micro"] + 10_000_000 // max(
        non_members, 1
    )


def test_hill_tail_index(spark, con):
    rows = con.execute(
        "SELECT o_orderkey, CAST(floor(o_totalprice*100) AS BIGINT) FROM orders"
    ).fetchall()
    top = sorted(rows, key=lambda t: (-t[1], t[0]))[:101]
    x_k1 = top[100][1]
    s = sum(_rhu(1000000.0 * math.log(c / x_k1)) for _, c in top[:100])
    r = QUERIES["q401_hill_tail_index"](spark, SF).collect()[0]
    assert r["k"] == 100
    assert abs(r["hill_inv_alpha"] - (s // 100) / 1000000.0) <= 1e-9
    assert abs(r["hill_alpha"] - (100 * 10**12 // s) / 1000000.0) <= 1e-9
    # alpha * inv_alpha ~ 1 by construction
    assert abs(r["hill_alpha"] * r["hill_inv_alpha"] - 1.0) <= 0.01
    # q386-class scaling guard: Hill estimator in plain floats
    inv_f = sum(math.log(c / x_k1) for _, c in top[:100]) / 100.0
    assert abs(r["hill_inv_alpha"] - inv_f) <= 1e-5
    assert abs(r["hill_alpha"] - 1.0 / inv_f) <= 1e-4 * (1 + 1.0 / inv_f)


def test_gumbel_maxima(spark, con):
    rows = con.execute(
        """SELECT date_trunc('month', CAST(o_orderdate AS DATE)),
                  CAST(o_orderdate AS DATE), count(*)
           FROM orders GROUP BY 1, 2"""
    ).fetchall()
    monthly: dict = {}
    for mon, _, c in rows:
        monthly[mon] = max(monthly.get(mon, 0), int(c))
    vals = list(monthly.values())
    n, s, ss = len(vals), sum(vals), sum(v * v for v in vals)
    mean = s / n
    sd = math.sqrt((n * ss - s * s) / (n * n))
    beta = sd * math.sqrt(6.0) / math.pi
    mu = mean - 0.5772156649015329 * beta
    r = QUERIES["q402_gumbel_maxima"](spark, SF).collect()[0]
    assert r["n_months"] == n
    assert abs(r["mean_peak"] - round(mean, 6)) <= 1e-9
    assert abs(r["gumbel_beta"] - round(beta, 6)) <= 1e-9
    assert abs(r["gumbel_mu"] - round(mu, 6)) <= 1e-9
    assert abs(
        r["return_level_p99"] - round(mu - beta * math.log(-math.log(0.99)), 6)
    ) <= 1e-9
    # the p99 return level must exceed the fitted location
    assert r["return_level_p99"] > r["gumbel_mu"]


def test_smd_balance(spark, con):
    treated = {
        u
        for (u,) in con.execute(
            "SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'"
        ).fetchall()
    }
    rows = con.execute(
        """SELECT c.c_custkey, n.n_name, CAST(floor(c.c_acctbal*100) AS BIGINT)
           FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey"""
    ).fetchall()
    groups: dict[str, tuple[list[int], list[int]]] = {}
    for ck, nm, cents in rows:
        t, ctl = groups.setdefault(nm, ([], []))
        (t if ck in treated else ctl).append(cents)
    got = {r["n_name"]: r for r in QUERIES["q403_smd_balance"](spark, SF).collect()}
    assert sorted(got) == sorted(groups)
    for nm, (t, ctl) in groups.items():
        r = got[nm]
        assert (r["n_treated"], r["n_control"]) == (len(t), len(ctl))
        if len(t) > 1 and len(ctl) > 1:
            n1, s1, ss1 = len(t), sum(t), sum(v * v for v in t)
            n0, s0, ss0 = len(ctl), sum(ctl), sum(v * v for v in ctl)
            v1 = max((n1 * ss1 - s1 * s1) / (n1 * n1), 0.0)
            v0 = max((n0 * ss0 - s0 * s0) / (n0 * n0), 0.0)
            if v1 + v0 > 0:
                smd = round(
                    (s1 / n1 - s0 / n0) / math.sqrt((v1 + v0) / 2.0), 6
                )
                assert abs(r["smd"] - smd) <= 1e-9
                assert r["balanced"] == (abs(smd) < 0.1)


def test_sprt_monitor(spark, con):
    rows = con.execute(
        """SELECT CAST(ts AS DATE), count(*),
                  count(CASE WHEN event_type = 'purchase' THEN 1 END)
           FROM events GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    l1 = _rhu(1000000.0 * math.log(0.25 / 0.2))
    l0 = _rhu(1000000.0 * math.log(0.75 / 0.8))
    up = _rhu(1000000.0 * math.log(0.95 / 0.05))
    lo = _rhu(1000000.0 * math.log(0.05 / 0.95))
    llr = 0
    first = None
    for d, n, x in rows:
        llr += x * l1 + (n - x) * l0
        if first is None and (llr >= up or llr <= lo):
            first = d
    r = QUERIES["q404_sprt_monitor"](spark, SF).collect()[0]
    assert r["n_days"] == len(rows)
    assert abs(r["final_llr"] - llr / 1000000.0) <= 1e-9
    want = "accept_h1" if llr >= up else "accept_h0" if llr <= lo else "continue"
    assert r["decision"] == want
    assert r["first_crossing_day"] == (str(first) if first is not None else None)
