"""Independent third-implementation checks added in round 7
(VERDICT r06 item 6): the pending round-6 queries that did not yet
have a pure-Python recompute. Raw values come back via DuckDB fetch
only — no SQL math — and every statistic is re-derived in Python,
so a formula bug shared by BOTH engines (the round-4 q234 lesson)
still fails here."""

from __future__ import annotations

import bisect

import duckdb
import numpy as np
import pytest

from pipeline_usnvc_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "documents", "orders", "customer", "nation", "lineitem", "part", "embeddings"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def test_range_interval_window(spark, con):
    """q336: per-user trailing 7-day RANGE frame (count + exact cent
    sum), recomputed with a bisect sliding window over raw epoch
    micros — no window function on either engine's side."""
    rows = con.execute(
        """SELECT event_id, user_id,
                  CAST(epoch_us(ts) AS BIGINT),
                  CAST(floor(value * 100) AS BIGINT)
           FROM events"""
    ).fetchall()
    per_user: dict[int, list[tuple[int, int, int]]] = {}
    for eid, uid, us, cents in rows:
        per_user.setdefault(uid, []).append((us, eid, cents))
    want: dict[int, tuple[int, int]] = {}
    for evs in per_user.values():
        evs.sort()
        times = [us for us, _, _ in evs]
        prefix = [0]
        for _, _, cents in evs:
            prefix.append(prefix[-1] + cents)
        for us, eid, _ in evs:
            # RANGE frame: peers with equal ORDER BY value are ALL in
            # each other's frame (unlike ROWS), so bound by value.
            lo = bisect.bisect_left(times, us - 604_800_000_000)
            hi = bisect.bisect_right(times, us)
            want[eid] = (hi - lo, prefix[hi] - prefix[lo])
    got = QUERIES["q336_range_interval_window"](spark, SF).collect()
    assert len(got) == len(want)
    for r in got:
        n, cents = want[r["event_id"]]
        assert r["n_7d"] == n, r
        assert r["cents_7d"] == cents, r


def _phash24(text: str | None) -> int:
    """Pure-Python re-derivation of q335's 24-bit dHash: synthesized
    PPM pixels (utf-8 bytes cycled to 3*w*h), pixel-center 4x4
    nearest-neighbor luminance grid, 12 horizontal + 12 vertical
    gradient bits — independent of operators/multimodal.py's numpy
    decode path (which the replica contract exercises separately)."""
    data = (text or "").encode("utf-8") or b"\x00"
    n = len((text or "").encode("utf-8"))  # header dims use the REAL byte length
    w, h = n % 16 + 4, n % 12 + 4

    def lum(gy: int, gx: int) -> float:
        row = min(int((gy + 0.5) * h / 4), h - 1)
        col = min(int((gx + 0.5) * w / 4), w - 1)
        base = (row * w + col) * 3
        r = data[base % len(data)]
        g = data[(base + 1) % len(data)]
        b = data[(base + 2) % len(data)]
        # The operator stores the grid as float32 (`array<float>`);
        # replay that quantization before comparing cells, or a
        # sub-float32 difference flips a gradient bit.
        return float(np.float32((0.299 * r + 0.587 * g + 0.114 * b) / 255.0))

    cells = [lum(gy, gx) for gy in range(4) for gx in range(4)]
    bits = []
    for i in range(4):  # horizontal gradients
        for j in range(3):
            bits.append(cells[i * 4 + j] < cells[i * 4 + j + 1])
    for j in range(4):  # vertical gradients
        for i in range(3):
            bits.append(cells[i * 4 + j] < cells[(i + 1) * 4 + j])
    return sum(1 << k for k, b in enumerate(bits) if b)


def test_image_phash_clusters(spark, con):
    """q335: re-derive every document's 24-bit phash in pure Python
    (including the planted every-10th-doc replicas) and rebuild the
    cluster aggregate — sizes, distinct-text counts, min doc ids."""
    texts = dict(con.execute("SELECT doc_id, text FROM documents").fetchall())
    corpus = dict(texts)
    # replicas now plant under NEGATIVE ids (-(doc_id)-1): disjoint
    # from the real id space at any corpus size (round-10 review)
    for did, t in texts.items():
        if did % 10 == 0:
            corpus[-did - 1] = t
    clusters: dict[int, list[int]] = {}
    for did, t in corpus.items():
        clusters.setdefault(_phash24(t), []).append(did)
    want = {
        ph: (
            len(dids),
            len({corpus[d] for d in dids}),
            min(dids),
        )
        for ph, dids in clusters.items()
    }
    got = QUERIES["q335_image_phash_neardup"](spark, SF).collect()
    assert len(got) == len(want)
    for r in got:
        n_docs, n_texts, min_id = want[r["phash"]]
        assert r["n_docs"] == n_docs, r
        assert r["n_distinct_texts"] == n_texts, r
        assert r["min_doc_id"] == min_id, r
    # the planted replicas guarantee at least one multi-doc cluster
    assert any(r["n_docs"] > 1 for r in got)


# --------------------------------------------------------------------
# Round-7 inference family (q341-q348): pure-Python recomputes.
# --------------------------------------------------------------------

import math
import re


def _toks(text: str | None) -> list[str]:
    return [t for t in re.split(r"[^a-zA-Z0-9]+", (text or "").lower()) if t]


def test_bh_fdr(spark, con):
    """q341: recompute per-nation two-proportion z-tests, erfc-poly
    p-values, and the Benjamini-Hochberg step-up in plain Python."""
    rows = con.execute(
        """SELECT n.n_name, CAST(count(*) AS BIGINT),
                  CAST(count(*) FILTER (WHERE b.o_custkey IS NOT NULL) AS BIGINT)
           FROM customer c
           JOIN nation n ON n.n_nationkey = c.c_nationkey
           LEFT JOIN (SELECT DISTINCT o_custkey FROM orders
                      WHERE o_orderstatus = 'F') b ON b.o_custkey = c.c_custkey
           GROUP BY 1"""
    ).fetchall()
    nt = sum(n for _, n, _ in rows)
    xt = sum(x for _, _, x in rows)
    recs = []
    for name, n1, x1 in rows:
        n2, x2 = nt - n1, xt - x1
        if not (n1 > 0 and n2 > 0 and 0 < xt < nt):
            continue
        pbar = xt / nt
        z = (x1 / n1 - x2 / n2) / math.sqrt(pbar * (1 - pbar) * (1 / n1 + 1 / n2))
        z_abs = abs(round(z, 6))
        x = z_abs / math.sqrt(2.0)
        t = 1.0 / (1.0 + 0.3275911 * x)
        poly = (
            (((1.061405429 * t - 1.453152027) * t + 1.421413741) * t - 0.284496736)
            * t
            + 0.254829592
        ) * t
        p = round(poly * math.exp(-x * x), 6)
        recs.append([name, n1, x1, z_abs, p])
    m = len(recs)
    recs.sort(key=lambda r: (r[4], r[0]))
    k_max = 0
    for i, r in enumerate(recs, 1):
        r.append(i)
        if r[4] * m <= i * 0.05:
            k_max = i
    want = {r[0]: r for r in recs}
    got = QUERIES["q341_bh_fdr"](spark, SF).collect()
    assert len(got) == m
    for g in got:
        name, n1, x1, z_abs, p, rnk = want[g["n_name"]]
        assert g["n_customers"] == n1 and g["n_converted"] == x1
        assert abs(g["z_abs"] - z_abs) <= 1e-9, (g, z_abs)
        assert abs(g["p_value"] - p) <= 1e-9, (g, p)
        assert g["p_rank"] == rnk
        assert g["bh_reject"] == (rnk <= k_max), (g, k_max)
    # sanity: the p-value from the polynomial tracks the exact normal
    # tail within the approximation's documented 1.5e-7 error
    for name, n1, x1, z_abs, p, rnk in recs:
        exact = math.erfc(z_abs / math.sqrt(2.0))
        assert abs(p - exact) < 1e-5, (name, p, exact)


def test_good_turing(spark, con):
    """q342: frequency-of-frequencies and smoothed counts from a
    Counter over the same whitespace tokens. Round-8 semantics
    (VERDICT r07 item 3): the query emits the 10 SMALLEST observed
    frequencies, not a fixed r <= 10 cap (which was degenerate at
    sf0.01 where every term occurs more than 10 times)."""
    from collections import Counter

    texts = [t for (t,) in con.execute("SELECT text FROM documents").fetchall()]
    tc = Counter()
    for t in texts:
        tc.update(_toks(t))
    ff = Counter(tc.values())
    n_tokens = sum(tc.values())
    got = QUERIES["q342_good_turing"](spark, SF).collect()
    assert {r["r"] for r in got} == set(sorted(ff)[:10])
    assert len(got) == min(10, len(ff))
    for g in got:
        r = g["r"]
        assert g["n_r"] == ff[r]
        assert g["n_r_next"] == ff.get(r + 1, 0)
        assert abs(g["r_star"] - round((r + 1) * ff.get(r + 1, 0) / ff[r], 6)) <= 1e-9
        assert abs(g["p_unseen"] - round(ff.get(1, 0) / n_tokens, 6)) <= 1e-9


def test_jackknife_source(spark, con):
    """q343: leave-one-source-out means and jackknife SE recomputed
    from raw (source, n_chars) pairs."""
    rows = con.execute("SELECT source, n_chars FROM documents").fetchall()
    per: dict[str, list[int]] = {}
    for s, c in rows:
        per.setdefault(s, []).append(c)
    n_all = len(rows)
    s_all = sum(c for _, c in rows)
    g = len(per)
    loo_micro = {
        s: round(1e6 * (s_all - sum(cs)) / (n_all - len(cs))) for s, cs in per.items()
    }
    l_sum = sum(loo_micro.values())
    ss = sum((g * v - l_sum) ** 2 for v in loo_micro.values())
    se = round(math.sqrt(ss * (g - 1) / (g**3 * 1e12)), 6)
    got = QUERIES["q343_jackknife_source"](spark, SF).collect()
    assert len(got) == g
    for r in got:
        assert r["n_docs"] == len(per[r["source"]])
        assert abs(r["loo_mean_chars"] - round(loo_micro[r["source"]] / 1e6, 6)) <= 1e-9
        assert abs(r["jackknife_se"] - se) <= 1e-9


def test_cochran_armitage(spark, con):
    """q344: trend z from scratch sums over the priority categories."""
    rows = con.execute(
        """SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT),
                  CAST(count(*) AS BIGINT),
                  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
           FROM orders GROUP BY 1"""
    ).fetchall()
    nt = sum(n for _, n, _ in rows)
    xt = sum(x for _, _, x in rows)
    sn = sum(s * n for s, n, _ in rows)
    ssn = sum(s * s * n for s, n, _ in rows)
    sx = sum(s * x for s, _, x in rows)
    pbar = xt / nt
    z = round((sx - xt * sn / nt) / math.sqrt(pbar * (1 - pbar) * (ssn - sn * sn / nt)), 6)
    row = QUERIES["q344_cochran_armitage"](spark, SF).collect()[0]
    assert row["n_orders"] == nt and row["n_finished"] == xt
    assert abs(row["trend_z"] - z) <= 1e-9
    assert row["significant"] == (abs(z) > 1.96)


def test_calibration_ece(spark, con):
    """q345: reliability bins and the exact-integer ECE numerator."""
    rows = con.execute("SELECT n_chars, lang FROM documents").fetchall()
    bins: dict[int, list[int]] = {}
    for n_chars, lang in rows:
        conf_micro = round(1e6 / (1 + math.exp(-(n_chars - 500.0) / 250.0)))
        b = min(conf_micro // 100_000, 9)
        n, x, c = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, x + (1 if lang == "en" else 0), c + conf_micro)
    n_all = sum(n for n, _, _ in bins.values())
    gap_sum = sum(abs(x * 1_000_000 - c) for _, x, c in bins.values())
    ece = round(gap_sum / (1e6 * n_all), 6)
    got = QUERIES["q345_calibration_ece"](spark, SF).collect()
    assert {r["bin"] for r in got} == set(bins)
    for r in got:
        n, x, c = bins[r["bin"]]
        assert r["n_docs"] == n
        assert abs(r["accuracy"] - round(x / n, 6)) <= 1e-9
        assert abs(r["avg_conf"] - round(c / (n * 1e6), 6)) <= 1e-9
        assert abs(r["ece"] - ece) <= 1e-9


def test_dedup_scaling_curve(spark, con):
    """q346: first-occurrence buckets of 3-gram shingles over 10
    deterministic doc_id-range prefixes."""
    rows = con.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()
    n_docs = len(rows)
    first: dict[str, int] = {}
    inst: dict[int, int] = {}
    for doc_id, text in rows:
        b = min(doc_id * 10 // n_docs, 9)
        toks = _toks(text)
        for i in range(max(len(toks) - 2, 0)):
            sh = "_".join(toks[i : i + 3])
            inst[b] = inst.get(b, 0) + 1
            if sh not in first or first[sh] > b:
                first[sh] = b
    new = {}
    for b in first.values():
        new[b] = new.get(b, 0) + 1
    got = QUERIES["q346_dedup_scaling_curve"](spark, SF).collect()
    assert {r["bucket"] for r in got} == set(inst)
    cum = 0
    for r in sorted(got, key=lambda r: r["bucket"]):
        b = r["bucket"]
        cum += new.get(b, 0)
        assert r["n_shingle_instances"] == inst[b]
        assert r["n_new_shingles"] == new.get(b, 0)
        assert r["cum_distinct_shingles"] == cum
        assert abs(r["novelty_rate"] - round(new.get(b, 0) / inst[b], 6)) <= 1e-9
    assert cum == len(first)


def test_page_hinkley(spark, con):
    """q347: PH statistic replayed sequentially with exact integer
    micro math (floor-divided running means, delta=5, lambda=50)."""
    rows = con.execute(
        """SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT),
                  CAST(count(*) AS BIGINT)
           FROM orders GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    want = {}
    s = m = 0
    min_m = None
    for t, (d, x) in enumerate(rows, 1):
        s += x
        mean_floor = (s * 1_000_000) // t
        m += x * 1_000_000 - mean_floor - 5_000_000
        min_m = m if min_m is None else min(min_m, m)
        ph = m - min_m
        want[d] = (x, round(ph / 1e6, 6), ph >= 50_000_000)
    got = QUERIES["q347_page_hinkley"](spark, SF).collect()
    assert len(got) == len(want)
    for r in got:
        x, ph, flag = want[r["day_index"]]
        assert r["n_orders"] == x
        assert abs(r["ph_stat"] - ph) <= 1e-9
        assert r["change_flag"] == flag


def test_info_gain(spark, con):
    """q348: H(label), H(label|priority), IG with micro-rounded ln
    weights recomputed from the contingency counts."""
    rows = con.execute(
        """SELECT o_orderpriority, CAST(count(*) AS BIGINT),
                  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
           FROM orders GROUP BY 1"""
    ).fetchall()
    nt = sum(n for _, n, _ in rows)
    xt = sum(x for _, _, x in rows)

    def w(num, den):
        return num * round(1e6 * math.log(num / den)) if num > 0 else 0

    w_cond = sum(w(x, n) + w(n - x, n) for _, n, x in rows)
    w_marg = w(xt, nt) + w(nt - xt, nt)
    den = nt * 1e6
    row = QUERIES["q348_info_gain"](spark, SF).collect()[0]
    assert row["n_orders"] == nt and row["n_finished"] == xt
    assert abs(row["h_label"] - round(-w_marg / den, 6)) <= 1e-9
    assert abs(row["h_cond"] - round(-w_cond / den, 6)) <= 1e-9
    assert abs(row["info_gain"] - round((w_cond - w_marg) / den, 6)) <= 1e-9


def test_cvm_two_sample(spark, con):
    """q349: pairwise Cramér-von Mises from raw (source, n_chars)
    pairs — pooled ECDF gap squared, weighted by pooled counts."""
    rows = con.execute("SELECT source, n_chars FROM documents").fetchall()
    per: dict[str, list[int]] = {}
    for s, v in rows:
        per.setdefault(s, []).append(v)
    got = {(r["source_a"], r["source_b"]): r for r in QUERIES["q349_cvm_two_sample"](spark, SF).collect()}
    srcs = sorted(per)
    assert set(got) == {(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1 :]}
    for (a, b), r in got.items():
        xs, ys = sorted(per[a]), sorted(per[b])
        n, m = len(xs), len(ys)
        assert r["n_a"] == n and r["n_b"] == m
        values = sorted(set(xs) | set(ys))
        cfa = cfb = 0
        ia = ib = 0
        num = 0
        for v in values:
            ca = cb = 0
            while ia < n and xs[ia] == v:
                ca += 1
                ia += 1
            while ib < m and ys[ib] == v:
                cb += 1
                ib += 1
            cfa += ca
            cfb += cb
            num += (ca + cb) * (cfa * m - cfb * n) ** 2
        t = round(num / (n * m * (n + m) ** 2), 6)
        assert abs(r["cvm_t"] - t) <= 1e-9, (a, b, r["cvm_t"], t)


def _daily_counts(con):
    return con.execute(
        """SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT),
                  CAST(count(*) AS BIGINT)
           FROM orders GROUP BY 1 ORDER BY 1"""
    ).fetchall()


def test_binseg_changepoint(spark, con):
    """q350: exhaustive split scan with exact integer gain micro."""
    rows = _daily_counts(con)
    tt = len(rows)
    st = sum(x for _, x in rows)
    best = None
    s1 = 0
    for t, (d, x) in enumerate(rows, 1):
        s1 += x
        if t >= tt:
            break
        gnum = s1 * (tt - t) - (st - s1) * t
        gden = t * (tt - t) * tt
        gain_micro = (gnum * gnum * 1_000_000) // gden
        if best is None or gain_micro > best[0] or (gain_micro == best[0] and d < best[1]):
            best = (gain_micro, d, t)
    row = QUERIES["q350_binseg_changepoint"](spark, SF).collect()
    assert len(row) == 1
    r = row[0]
    assert r["split_day"] == best[1] and r["split_pos"] == best[2]
    assert abs(r["sse_gain"] - round(best[0] / 1e6, 6)) <= 1e-9


def test_seasonal_decompose(spark, con):
    """q351: centered 7-day MA trend, per-dow seasonal mean, residual
    — all replayed with exact floor-div micro integers."""
    rows = _daily_counts(con)
    xs = [x for _, x in rows]
    ds = [d for d, _ in rows]
    trend = {}
    for i in range(3, len(rows) - 3):
        s7 = sum(xs[i - 3 : i + 4])
        trend[ds[i]] = (s7 * 1_000_000) // 7
    detr = {d: xs[ds.index(d)] * 1_000_000 - tm for d, tm in trend.items()}
    by_dow: dict[int, list[int]] = {}
    for d, v in detr.items():
        by_dow.setdefault(d % 7, []).append(v)
    C = 10**15
    seas = {
        dow: ((sum(vs) + len(vs) * C) // len(vs)) - C for dow, vs in by_dow.items()
    }
    got = QUERIES["q351_seasonal_decompose"](spark, SF).collect()
    assert {r["day_index"] for r in got} == set(trend)
    for r in got:
        d = r["day_index"]
        assert abs(r["trend"] - round(trend[d] / 1e6, 6)) <= 1e-9
        assert abs(r["seasonal"] - round(seas[d % 7] / 1e6, 6)) <= 1e-9
        assert abs(r["residual"] - round((detr[d] - seas[d % 7]) / 1e6, 6)) <= 1e-9


def test_kaplan_meier(spark, con):
    """q352: product-limit estimator with right-censoring, replayed
    with the same micro-ln cumulative sums."""
    rows = con.execute(
        """SELECT user_id,
                  CAST(date_diff('day', DATE '1992-01-01', CAST(ts AS DATE)) AS BIGINT)
           FROM events WHERE event_type = 'purchase'"""
    ).fetchall()
    per: dict[int, list[int]] = {}
    for uid, d in rows:
        per.setdefault(uid, []).append(d)
    dmax = max(d for _, d in rows)
    durations = []
    for ds in per.values():
        ds.sort()
        first = ds[0]
        nxt = next((d for d in ds if d > first), None)
        if nxt is not None:
            durations.append((nxt - first, 1))
        else:
            durations.append((dmax - first, 0))
    n_total = len(durations)
    spine: dict[int, list[int]] = {}
    for t, ev in durations:
        n_all, n_ev = spine.get(t, (0, 0))
        spine[t] = (n_all + 1, n_ev + ev)
    cum_before = 0
    cum_ln = 0
    died = False
    want = {}
    for t in sorted(spine):
        n_all, n_ev = spine[t]
        n_risk = n_total - cum_before
        cum_before += n_all
        if n_ev == 0:
            continue
        if n_ev < n_risk:
            cum_ln += round(1e6 * math.log((n_risk - n_ev) / n_risk))
        else:
            died = True
        s = 0.0 if died else round(math.exp(cum_ln / 1e6), 6)
        want[t] = (n_risk, n_ev, s)
    got = QUERIES["q352_kaplan_meier"](spark, SF).collect()
    assert {r["duration_days"] for r in got} == set(want)
    for r in got:
        n_risk, n_ev, s = want[r["duration_days"]]
        assert r["n_at_risk"] == n_risk and r["n_events"] == n_ev
        assert abs(r["survival"] - s) <= 1e-9
    # survival must be non-increasing
    ordered = [r["survival"] for r in sorted(got, key=lambda r: r["duration_days"])]
    assert all(a >= b for a, b in zip(ordered, ordered[1:]))


def test_capture_recapture(spark, con):
    """q353: Chapman estimator from half-token-hash captures."""
    import hashlib

    texts = dict(con.execute("SELECT doc_id, text FROM documents").fetchall())
    buckets_a: dict[str, list[int]] = {}
    buckets_b: dict[str, list[int]] = {}
    for did, text in texts.items():
        tk = _toks(text)
        half = max(len(tk) // 2, 1)
        ka = hashlib.md5(" ".join(tk[:half]).encode()).hexdigest()
        kb = hashlib.md5(" ".join(tk[half:]).encode()).hexdigest()
        buckets_a.setdefault(ka, []).append(did)
        buckets_b.setdefault(kb, []).append(did)
    a = {d for v in buckets_a.values() if len(v) > 1 for d in v}
    b = {d for v in buckets_b.values() if len(v) > 1 for d in v}
    row = QUERIES["q353_capture_recapture"](spark, SF).collect()[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert row["n_both"] == len(a & b)
    assert row["n_union"] == len(a | b)
    chapman = round((len(a) + 1) * (len(b) + 1) / (len(a & b) + 1) - 1.0, 6)
    assert abs(row["chapman_estimate"] - chapman) <= 1e-9
    # the estimator can never undershoot what we actually observed
    assert row["chapman_estimate"] >= row["n_both"]


def test_mi_matrix(spark, con):
    """q354: pairwise MI from raw contingency counts with the same
    micro-ln weighting."""
    rows = con.execute(
        """SELECT l_returnflag, l_linestatus, CAST(round(l_tax * 100) AS BIGINT)
           FROM lineitem"""
    ).fetchall()
    cols = {"l_returnflag": 0, "l_linestatus": 1, "tax_cents": 2}
    got = {(r["col_a"], r["col_b"]): r for r in QUERIES["q354_mi_matrix"](spark, SF).collect()}
    assert set(got) == {
        ("l_returnflag", "l_linestatus"),
        ("l_returnflag", "tax_cents"),
        ("l_linestatus", "tax_cents"),
    }
    for (a, b), r in got.items():
        ia, ib = cols[a], cols[b]
        cells: dict[tuple, int] = {}
        ca: dict = {}
        cb: dict = {}
        for row_ in rows:
            va, vb = row_[ia], row_[ib]
            cells[(va, vb)] = cells.get((va, vb), 0) + 1
            ca[va] = ca.get(va, 0) + 1
            cb[vb] = cb.get(vb, 0) + 1
        n = len(rows)
        w_sum = sum(
            c * round(1e6 * math.log(c * n / (ca[va] * cb[vb])))
            for (va, vb), c in cells.items()
        )
        assert r["n"] == n
        assert abs(r["mi_nats"] - round(w_sum / (n * 1e6), 6)) <= 1e-9
        assert r["mi_nats"] >= 0 or abs(r["mi_nats"]) < 1e-3


def _ntile(n_rows: int, n_tiles: int) -> list[int]:
    """NTILE bucket per 0-based position: first (n % tiles) buckets
    get the extra row — the SQL-standard split both engines use."""
    base, extra = divmod(n_rows, n_tiles)
    out = []
    for tile in range(1, n_tiles + 1):
        out.extend([tile] * (base + (1 if tile <= extra else 0)))
    return out


def test_ndcg_eval(spark, con):
    """q355: per-brand NDCG@10 replayed with explicit sorts, ntile
    grades, and micro-rounded position weights."""
    rows = con.execute(
        """SELECT p.p_brand, p.p_partkey, p.p_retailprice,
                  CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
           FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
           GROUP BY 1, 2, 3"""
    ).fetchall()
    by_brand: dict[str, list] = {}
    for brand, pk, price, rev in rows:
        by_brand.setdefault(brand, []).append((pk, price, rev))
    got = {r["p_brand"]: r for r in QUERIES["q355_ndcg_eval"](spark, SF).collect()}
    assert set(got) == set(by_brand)
    for brand, parts in by_brand.items():
        by_rev = sorted(parts, key=lambda p: (-p[2], p[0]))
        tiles = _ntile(len(parts), 4)
        grade = {p[0]: 4 - t for p, t in zip(by_rev, tiles)}
        w = lambda i: round(1e6 / math.log2(i + 1))
        by_price = sorted(parts, key=lambda p: (-p[1], p[0]))
        dcg = sum(
            (2 ** grade[p[0]] - 1) * w(i)
            for i, p in enumerate(by_price[:10], 1)
        )
        by_ideal = sorted(parts, key=lambda p: (-grade[p[0]], -p[2], p[0]))
        idcg = sum(
            (2 ** grade[p[0]] - 1) * w(i)
            for i, p in enumerate(by_ideal[:10], 1)
        )
        r = got[brand]
        assert r["n_parts"] == len(parts)
        assert abs(r["dcg"] - round(dcg / 1e6, 6)) <= 1e-9, brand
        assert abs(r["idcg"] - round(idcg / 1e6, 6)) <= 1e-9, brand
        assert abs(r["ndcg_at_10"] - round(dcg / idcg, 6)) <= 1e-9, brand
        assert 0.0 <= r["ndcg_at_10"] <= 1.0


def _conf_label_rows(con):
    return [
        (round(1e6 / (1 + math.exp(-(nc - 500.0) / 250.0))), 1 if lang == "en" else 0)
        for nc, lang in con.execute("SELECT n_chars, lang FROM documents").fetchall()
    ]


def test_auc_roc(spark, con):
    """q356: AUC from the O(n log n) sort + pairwise tie-aware count
    (independent of the rank-sum identity the query uses)."""
    pairs = _conf_label_rows(con)
    pos = sorted(v for v, y in pairs if y == 1)
    neg = sorted(v for v, y in pairs if y == 0)
    wins = ties = 0
    for p in pos:
        wins += bisect.bisect_left(neg, p)
        ties += bisect.bisect_right(neg, p) - bisect.bisect_left(neg, p)
    auc = round((wins + 0.5 * ties) / (len(pos) * len(neg)), 6)
    row = QUERIES["q356_auc_roc"](spark, SF).collect()[0]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert abs(row["auc"] - auc) <= 1e-9
    assert abs(row["gini"] - round(2 * ((wins + 0.5 * ties) / (len(pos) * len(neg))) - 1.0, 6)) <= 1e-9


def test_cohens_kappa(spark, con):
    """q357: confusion lattice + kappa recomputed against a fresh
    Python reimplementation of the q31 marker detector."""
    from pipeline_usnvc_spark.functions.text import _LANG_MARKERS

    markers = {k: set(v) for k, v in _LANG_MARKERS.items()}
    cells: dict[tuple, int] = {}
    for lang, text in con.execute("SELECT lang, text FROM documents").fetchall():
        toks = _toks(text)
        scores = {k: sum(t in m for t in toks) for k, m in markers.items()}
        best = max(scores.values())
        detected = "und"
        for k in markers:  # fixed tie order en > de > fr > es
            if scores[k] > 0 and scores[k] == best:
                detected = k
                break
        cells[(lang, detected)] = cells.get((lang, detected), 0) + 1
    n = sum(cells.values())
    diag = sum(c for (a, b), c in cells.items() if a == b)
    rowm: dict = {}
    colm: dict = {}
    for (a, b), c in cells.items():
        rowm[a] = rowm.get(a, 0) + c
        colm[b] = colm.get(b, 0) + c
    rc = sum(rowm[l] * colm.get(l, 0) for l in rowm)
    r = QUERIES["q357_cohens_kappa"](spark, SF).collect()[0]
    assert r["n_docs"] == n and r["n_agree"] == diag
    assert abs(r["p_observed"] - round(diag / n, 6)) <= 1e-9
    assert abs(r["p_chance"] - round(rc / n**2, 6)) <= 1e-9
    assert abs(r["kappa"] - round((n * diag - rc) / (n * n - rc), 6)) <= 1e-9


def test_pr_curve(spark, con):
    """q358: threshold sweep replayed with direct per-doc counting."""
    pairs = _conf_label_rows(con)
    bins = [(min(v // 100_000, 9), y) for v, y in pairs]
    pos = sum(y for _, y in bins)
    got = {r["threshold_bin"]: r for r in QUERIES["q358_pr_curve"](spark, SF).collect()}
    assert set(got) == set(range(10))
    for t in range(10):
        tp = sum(y for b, y in bins if b >= t)
        fp = sum(1 - y for b, y in bins if b >= t)
        fn = pos - tp
        r = got[t]
        assert r["tp"] == tp and r["fp"] == fp and r["fn"] == fn
        if tp + fp > 0:
            assert abs(r["precision_"] - round(tp / (tp + fp), 6)) <= 1e-9
        else:
            assert r["precision_"] is None
        assert abs(r["recall_"] - round(tp / pos, 6)) <= 1e-9
        if 2 * tp + fp + fn > 0:
            assert abs(r["f1"] - round(2 * tp / (2 * tp + fp + fn), 6)) <= 1e-9
    # recall must be monotone non-increasing in the threshold
    recalls = [got[t]["recall_"] for t in range(10)]
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))


def test_pca_power_iteration(spark, con):
    """q359: one exact-integer power step v1 = X^T(X*1) replayed in
    pure Python, including the shifted floor-div rescale, plus a
    quality check against numpy's true top eigenvector of the
    second-moment matrix."""
    rows = con.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
    qs = {vid: [math.floor(x * 10_000_000) for x in emb] for vid, emb in rows}
    d = len(next(iter(qs.values())))
    v1 = [0] * d
    for comps in qs.values():
        r = sum(comps)
        for i, q in enumerate(comps):
            v1[i] += q * r
    S, C = 10**12, 10**10
    u = [((v + C * S) // S) - C for v in v1]
    norm = math.sqrt(sum(x * x for x in u))
    want = [round(x / norm, 6) for x in u]
    got = QUERIES["q359_pca_power_iteration"](spark, SF).collect()
    assert len(got) == d
    for rrow in got:
        assert rrow["n_vectors"] == len(qs)
        assert abs(rrow["component"] - want[rrow["dim"] - 1]) <= 1e-9
    # quality: the step must land measurably closer to the true top
    # eigenvector than the all-ones start (cosine improves)
    X = np.array([emb for _, emb in rows], dtype=np.float64)
    M = X.T @ X
    evals, evecs = np.linalg.eigh(M)
    top = evecs[:, -1]
    ours = np.array([r["component"] for r in sorted(got, key=lambda r: r["dim"])])
    v0 = np.ones(d) / math.sqrt(d)
    cos_ours = abs(float(ours @ top)) / float(np.linalg.norm(ours))
    cos_v0 = abs(float(v0 @ top))
    assert cos_ours > cos_v0, (cos_ours, cos_v0)


def test_holt_winters(spark, con):
    """q360: HW additive recurrence replayed in pure Python with the
    same crude-deterministic init (l=y1, b=0, s=zeros)."""
    rows = con.execute(
        """SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
                  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           FROM orders GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    l, b = float(rows[0][1]), 0.0
    s = [0.0] * 7
    for d, cents in rows[1:]:
        y, dow = float(cents), d % 7
        s_prev = s[dow]
        l_new = 0.5 * (y - s_prev) + 0.5 * (l + b)
        b = 0.3 * (l_new - l) + 0.7 * b
        s[dow] = 0.3 * (y - l_new) + 0.7 * s_prev
        l = l_new
    dmax = rows[-1][0]
    fc = l + b + s[(dmax + 1) % 7]
    r = QUERIES["q360_holt_winters"](spark, SF).collect()[0]
    assert r["n_days"] == len(rows)
    assert abs(r["level_dollars"] - round(l / 100.0, 6)) <= 1e-6
    assert abs(r["trend_dollars"] - round(b / 100.0, 6)) <= 1e-6
    assert abs(r["forecast_dollars"] - round(fc / 100.0, 6)) <= 1e-6
    assert abs(
        r["seasonal_amplitude_dollars"] - round((max(s) - min(s)) / 100.0, 6)
    ) <= 1e-6


def test_gram_matrix(spark, con):
    """q362: the Arrow int64-matmul kernel vs a pure-Python exact
    integer accumulation, plus a numpy float cross-check."""
    rows = con.execute("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
    X = [[math.floor(x * 10_000_000) for x in emb] for _, emb in rows]
    d = len(X[0])
    want = [[0] * d for _ in range(d)]
    for row in X:
        for i in range(d):
            qi = row[i]
            if qi == 0:
                continue
            wi = want[i]
            for j in range(i, d):
                wi[j] += qi * row[j]
    got = QUERIES["q362_gram_matrix"](spark, SF).collect()
    assert len(got) == d * (d + 1) // 2
    for r in got:
        i, j = r["dim_i"] - 1, r["dim_j"] - 1
        assert r["qsum"] == want[i][j], (i, j, r["qsum"], want[i][j])
        assert abs(r["m"] - round(want[i][j] / 1e14, 6)) <= 1e-9
    # numpy float64 second-moment agrees to quantization error
    Xf = np.array([emb for _, emb in rows], dtype=np.float64)
    M = Xf.T @ Xf
    for r in got[:50]:
        assert abs(r["m"] - M[r["dim_i"] - 1, r["dim_j"] - 1]) < 1e-3


def test_ridge_probe(spark, con):
    """q363: replay the exact-quantized normal equations and the
    unpenalized-intercept ridge solve in numpy; weights and R^2 must
    match, and R^2 can never lose to the intercept baseline."""
    rows = con.execute("SELECT embedding, label FROM embeddings").fetchall()
    q = np.concatenate(
        [
            np.floor(np.array([e for e, _ in rows], dtype=np.float64) * 1e7).astype(
                np.int64
            ),
            np.full((len(rows), 1), 10_000_000, dtype=np.int64),
        ],
        axis=1,
    )
    y = np.array([l for _, l in rows], dtype=np.int64)
    d = q.shape[1]
    G = (q.T.astype(object) @ q.astype(object)).astype(np.float64) / 1e14
    b = (q.T.astype(object) @ y.astype(object)).astype(np.float64) / 1e7
    D = np.eye(d)
    D[d - 1, d - 1] = 0.0
    w = np.linalg.solve(G + D, b)
    X = np.array([e for e, _ in rows], dtype=np.float64)
    pred = X @ w[:-1] + w[-1]
    sse_w = float(((y - pred) ** 2).sum())
    sse_mean = float(((y - y.mean()) ** 2).sum())
    r2 = round(1.0 - sse_w / sse_mean, 6)
    got = QUERIES["q363_ridge_probe"](spark, SF).collect()
    assert len(got) == d
    for r in got:
        assert abs(r["weight"] - round(float(w[r["dim"] - 1]), 6)) <= 2e-6, r["dim"]
        assert abs(r["r2"] - r2) <= 2e-6
        assert 0.0 <= r["r2"] <= 1.0
        assert r["n_vectors"] == len(rows)


def test_covariance_matrix(spark, con):
    """q364: exact integer covariance numerators replayed in arbitrary
    precision, plus a numpy population-covariance cross-check."""
    rows = con.execute("SELECT embedding FROM embeddings").fetchall()
    q = np.floor(np.array([e for (e,) in rows], dtype=np.float64) * 1e7).astype(object)
    n = q.shape[0]
    d = q.shape[1]
    G = q.T @ q            # object dtype: exact python ints
    S = q.sum(axis=0)
    got = QUERIES["q364_covariance_matrix"](spark, SF).collect()
    assert len(got) == d * (d + 1) // 2
    den = n * n * 10**14
    for r in got:
        i, j = r["dim_i"] - 1, r["dim_j"] - 1
        num = n * int(G[i, j]) - int(S[i]) * int(S[j])
        cov_micro = (num * 1_000_000 + 1_000_000 * den) // den - 1_000_000
        assert r["n_vectors"] == n
        assert abs(r["cov"] - cov_micro / 1e6) <= 1e-12, (i, j)
    # numpy float population covariance agrees to quantization error
    X = np.array([e for (e,) in rows], dtype=np.float64)
    C = np.cov(X, rowvar=False, bias=True)
    for r in got[:50]:
        assert abs(r["cov"] - C[r["dim_i"] - 1, r["dim_j"] - 1]) < 1e-3


def test_conformal_quantile(spark, con):
    """q365: the finite-sample order statistic replayed with a plain
    sort, plus the coverage guarantee check."""
    pairs = _conf_label_rows(con)
    scores = sorted(abs(y * 1_000_000 - v) for v, y in pairs)
    n = len(scores)
    k = min(math.ceil((n + 1) * 0.9), n)
    qhat_micro = scores[k - 1]
    cf = sum(1 for s in scores if s <= qhat_micro)
    r = QUERIES["q365_conformal_quantile"](spark, SF).collect()[0]
    assert r["n_docs"] == n and r["k_order"] == k
    assert r["qhat_micro"] == qhat_micro
    assert abs(r["qhat"] - round(qhat_micro / 1e6, 6)) <= 1e-9
    assert abs(r["coverage"] - round(cf / n, 6)) <= 1e-9
    assert cf / n >= 0.9


def test_isotonic_calibration(spark, con):
    """q366: stack-based exact-rational PAVA (different algorithm
    organization from the query's list-pooling) must agree, and the
    output must be monotone and mass-preserving."""
    from fractions import Fraction

    pairs = _conf_label_rows(con)
    bins: dict[int, list[int]] = {}
    for v, y in pairs:
        b = min(v // 100_000, 9)
        n, x = bins.get(b, (0, 0))
        bins[b] = (n + 1, x + y)
    order = sorted(bins)
    stack: list[list] = []  # [n, x, count_of_bins]
    for b in order:
        n, x = bins[b]
        stack.append([n, x, 1])
        while len(stack) > 1 and Fraction(stack[-2][1], stack[-2][0]) > Fraction(
            stack[-1][1], stack[-1][0]
        ):
            n2, x2, c2 = stack.pop()
            stack[-1][0] += n2
            stack[-1][1] += x2
            stack[-1][2] += c2
    want = {}
    idx = 0
    for n, x, c in stack:
        cal = (x * 1_000_000) // n
        for _ in range(c):
            want[order[idx]] = cal
            idx += 1
    got = QUERIES["q366_isotonic_calibration"](spark, SF).collect()
    assert {r["bin"] for r in got} == set(order)
    prev = None
    for r in sorted(got, key=lambda r: r["bin"]):
        n, x = bins[r["bin"]]
        assert r["n_docs"] == n
        assert abs(r["raw_acc"] - round(x / n, 6)) <= 1e-9
        assert abs(r["calibrated"] - round(want[r["bin"]] / 1e6, 6)) <= 1e-9
        if prev is not None:
            assert r["calibrated"] >= prev - 1e-12
        prev = r["calibrated"]


def test_energy_distance(spark, con):
    """q367: brute-force O(n*m) pairwise |difference| sums (no prefix
    trick) must reproduce the exact integer statistic."""
    rows = con.execute("SELECT source, n_chars FROM documents").fetchall()
    per: dict[str, list[int]] = {}
    for s, v in rows:
        per.setdefault(s, []).append(v)
    got = {
        (r["source_a"], r["source_b"]): r
        for r in QUERIES["q367_energy_distance"](spark, SF).collect()
    }
    srcs = sorted(per)
    assert set(got) == {(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1 :]}
    for (a, b), r in got.items():
        xs, ys = per[a], per[b]
        n, m = len(xs), len(ys)
        t_ab = sum(abs(x - y) for x in xs for y in ys)
        t_aa = sum(abs(x - y) for x in xs for y in xs)
        t_bb = sum(abs(x - y) for x in ys for y in ys)
        num = 2 * t_ab * n * m - t_aa * m * m - t_bb * n * n
        d2_micro = (num * 1_000_000) // (n * n * m * m)
        assert r["n_a"] == n and r["n_b"] == m
        assert abs(r["energy_d2"] - d2_micro / 1e6) <= 1e-12, (a, b)
        assert r["energy_d2"] >= 0


def test_wasserstein_1d(spark, con):
    """q368: W1 recomputed as the mean |difference of sorted quantile
    functions| via the classic sorted-samples formulation (scaled to
    the common n*m grid) — an entirely different derivation from the
    query's CDF-gap segments."""
    rows = con.execute("SELECT source, n_chars FROM documents").fetchall()
    per: dict[str, list[int]] = {}
    for s, v in rows:
        per.setdefault(s, []).append(v)
    got = {
        (r["source_a"], r["source_b"]): r
        for r in QUERIES["q368_wasserstein_1d"](spark, SF).collect()
    }
    for (a, b), r in got.items():
        xs, ys = sorted(per[a]), sorted(per[b])
        n, m = len(xs), len(ys)
        # quantile functions on the lcm grid: sample i/(nm) of A is
        # xs[i*n // (n*m) ... ] -> expand each x_i m times, y_j n times
        t = 0
        xi = [x for x in xs for _ in range(m)]
        yi = [y for y in ys for _ in range(n)]
        t = sum(abs(p - q) for p, q in zip(xi, yi))
        w1_micro = (t * 1_000_000) // (n * m)
        assert r["n_a"] == n and r["n_b"] == m
        assert abs(r["w1"] - w1_micro / 1e6) <= 1e-12, (a, b)
        assert r["w1"] >= 0


def test_hellinger_distance(spark, con):
    """q369: BC/Hellinger recomputed from a Counter over the same
    tokens with the same add-1 smoothing and micro-rounded sqrt."""
    from collections import Counter

    rows = con.execute("SELECT source, text FROM documents").fetchall()
    per: dict[str, Counter] = {}
    for s, t in rows:
        per.setdefault(s, Counter()).update(_toks(t))
    corpus = Counter()
    for c in per.values():
        corpus.update(c)
    top = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    nq = sum(c for _, c in top)
    got = {r["source"]: r for r in QUERIES["q369_hellinger_distance"](spark, SF).collect()}
    assert set(got) == set(per)
    for s, r in got.items():
        np_ = sum(per[s][t] for t, _ in top)
        bc_micro = sum(
            round(
                1e6
                * math.sqrt(
                    ((per[s][t] + 1) / (np_ + 100)) * ((cc + 1) / (nq + 100))
                )
            )
            for t, cc in top
        )
        assert r["n_tokens"] == np_
        assert abs(r["bhattacharyya"] - round(bc_micro / 1e6, 6)) <= 1e-9
        h = round(math.sqrt(max(1.0 - bc_micro / 1e6, 0.0)), 6)
        assert abs(r["hellinger"] - h) <= 1e-9
        assert 0.0 <= r["hellinger"] <= 1.0


def test_markov_accuracy(spark, con):
    """q371: transition counts, argmax prediction, and accuracy
    replayed from raw per-user event sequences."""
    rows = con.execute(
        """SELECT user_id, event_type,
                  CAST(epoch_us(ts) AS BIGINT), event_id
           FROM events"""
    ).fetchall()
    per: dict[int, list] = {}
    for uid, et, us, eid in rows:
        per.setdefault(uid, []).append((us, eid, et))
    cnt: dict[tuple, int] = {}
    for evs in per.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    by_a: dict[str, dict] = {}
    for (a, b), n in cnt.items():
        by_a.setdefault(a, {})[b] = n
    got = {r["from_type"]: r for r in QUERIES["q371_markov_accuracy"](spark, SF).collect()}
    assert set(got) == set(by_a)
    for a, nexts in by_a.items():
        pred = min(nexts, key=lambda b: (-nexts[b], b))
        na = sum(nexts.values())
        r = got[a]
        assert r["predicted_next"] == pred, (a, pred, r)
        assert r["n_transitions"] == na and r["n_correct"] == nexts[pred]
        assert abs(r["top1_accuracy"] - round(nexts[pred] / na, 6)) <= 1e-9
        # top-1 must beat or match the uniform baseline over observed nexts
        assert r["top1_accuracy"] >= 1.0 / len(nexts) - 1e-9


def test_hll_intersection(spark, con):
    """q372: exact pairwise intersections from raw (type, user) pairs;
    at test cardinalities the sketches are in exact sparse mode, so
    the inclusion-exclusion estimate must recover the truth."""
    rows = con.execute("SELECT DISTINCT event_type, user_id FROM events").fetchall()
    per: dict[str, set] = {}
    for et, uid in rows:
        per.setdefault(et, set()).add(uid)
    got = {
        (r["type_a"], r["type_b"]): r
        for r in QUERIES["q372_hll_intersection"](spark, SF).collect()
    }
    types = sorted(per)
    assert set(got) == {(a, b) for i, a in enumerate(types) for b in types[i + 1 :]}
    for (a, b), r in got.items():
        inter = len(per[a] & per[b])
        union = len(per[a] | per[b])
        assert r["n_a"] == len(per[a]) and r["n_b"] == len(per[b])
        assert r["exact_inter"] == inter
        # sparse-mode sketches are exact at this scale
        assert r["approx_inter"] == inter, (a, b, r["approx_inter"], inter)
        assert abs(r["approx_jaccard"] - round(inter / union, 6)) <= 2e-6


def test_whitening_transform(spark, con):
    """q373: numpy end-to-end replication — same quantized covariance,
    same Cholesky whitening — must reproduce every whitened-covariance
    cell; and the output must be near-identity."""
    rows = con.execute("SELECT embedding FROM embeddings").fetchall()
    X = np.array([e for (e,) in rows], dtype=np.float64)
    n, d = X.shape
    q = np.floor(X * 1e7).astype(object)
    G = q.T @ q
    S = q.sum(axis=0)
    C = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            C[i, j] = C[j, i] = (n * int(G[i, j]) - int(S[i]) * int(S[j])) / (n * n * 1e14)
    mu = np.array([int(s) / (n * 1e7) for s in S])
    L = np.linalg.cholesky(C + 1e-6 * np.eye(d))
    W = np.linalg.inv(L)
    Z = (X - mu) @ W.T
    qz = np.floor(Z * 1e7).astype(object)
    Gz = qz.T @ qz
    Sz = qz.sum(axis=0)
    got = QUERIES["q373_whitening_transform"](spark, SF).collect()
    assert len(got) == d * (d + 1) // 2
    for r in got:
        i, j = r["dim_i"] - 1, r["dim_j"] - 1
        want = (n * int(Gz[i, j]) - int(Sz[i]) * int(Sz[j])) / (n * n * 1e14)
        assert abs(r["cov_whitened"] - round(want, 6)) <= 2e-6, (i, j)
        target = 1.0 if i == j else 0.0
        assert abs(r["cov_whitened"] - target) <= 0.02


def test_markov_absorption(spark, con):
    """q374: absorption probabilities recomputed by VALUE ITERATION
    (a different algorithm from the query's direct linear solve) —
    must converge to the same vector; plus range sanity."""
    rows = con.execute(
        """SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT), event_id
           FROM events"""
    ).fetchall()
    per: dict[int, list] = {}
    for uid, et, us, eid in rows:
        per.setdefault(uid, []).append((us, eid, et))
    cnt: dict[tuple, int] = {}
    for evs in per.values():
        evs.sort()
        seq = [et for _, _, et in evs] + ["__END__"]
        for a, b in zip(seq, seq[1:]):
            if a != "purchase":
                cnt[(a, b)] = cnt.get((a, b), 0) + 1
    states = sorted({a for a, _ in cnt})
    n_out = {s: sum(n for (a, _), n in cnt.items() if a == s) for s in states}
    p = {s: 0.0 for s in states}
    p["purchase"] = 1.0
    p["__END__"] = 0.0
    for _ in range(10_000):
        new = {
            s: sum(n * p.get(b, 0.0) for (a, b), n in cnt.items() if a == s)
            / n_out[s]
            for s in states
        }
        delta = max(abs(new[s] - p[s]) for s in states)
        p.update(new)
        if delta < 1e-13:
            break
    got = QUERIES["q374_markov_absorption"](spark, SF).collect()
    assert {r["state"] for r in got} == set(states)
    for r in got:
        assert r["n_transitions_out"] == n_out[r["state"]]
        assert abs(r["p_absorb_purchase"] - round(p[r["state"]], 6)) <= 2e-6
        assert 0.0 <= r["p_absorb_purchase"] <= 1.0


def test_ks_decision(spark, con):
    """q375: KS D, Stephens' lambda, and the truncated Kolmogorov
    series replayed in pure Python, cross-checked against the
    closed-form tail for large lambda."""
    rows = con.execute(
        """SELECT event_type, value,
                  CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
           FROM events"""
    ).fetchall()
    per: dict[str, tuple] = {}
    for et, v, early in rows:
        a, b = per.setdefault(et, ([], []))
        (a if early else b).append(v)
    got = {r["event_type"]: r for r in QUERIES["q375_ks_decision"](spark, SF).collect()}
    assert set(got) == set(per)
    for et, (xs, ys) in per.items():
        xs, ys = sorted(xs), sorted(ys)
        n1, n2 = len(xs), len(ys)
        values = sorted(set(xs) | set(ys))
        d = 0.0
        i = j = 0
        for v in values:
            while i < n1 and xs[i] <= v:
                i += 1
            while j < n2 and ys[j] <= v:
                j += 1
            d = max(d, abs(i / n1 - j / n2))
        ne = math.sqrt(n1 * n2 / (n1 + n2))
        lam = (ne + 0.12 + 0.11 / ne) * d
        s_nano = sum(
            round(1e9 * (1.0 if k % 2 == 1 else -1.0) * math.exp(-2 * k * k * lam * lam))
            for k in range(1, 101)
        )
        p = round(min(max(2 * s_nano / 1e9, 0.0), 1.0), 6)
        r = got[et]
        assert r["n_early"] == n1 and r["n_late"] == n2
        assert abs(r["ks_d"] - round(d, 6)) <= 1e-9
        assert abs(r["p_value"] - p) <= 1e-9
        assert r["drift_detected"] == (p < 0.05)
        assert 0.0 <= r["p_value"] <= 1.0


def test_negbin_fit(spark, con):
    """q376: method-of-moments NB fit replayed with arbitrary
    precision integers, plus the moment identity check."""
    rows = con.execute(
        """SELECT event_type,
                  CAST(date_diff('day', DATE '1992-01-01', CAST(ts AS DATE)) AS BIGINT),
                  CAST(count(*) AS BIGINT)
           FROM events GROUP BY 1, 2"""
    ).fetchall()
    per: dict[str, list[int]] = {}
    for et, _, x in rows:
        per.setdefault(et, []).append(x)
    got = {r["event_type"]: r for r in QUERIES["q376_negbin_fit"](spark, SF).collect()}
    assert set(got) == set(per)
    for et, xs in per.items():
        D, S, SS = len(xs), sum(xs), sum(x * x for x in xs)
        V = D * SS - S * S
        r = got[et]
        assert r["n_days"] == D
        assert abs(r["mean_daily"] - ((S * 10**6) // D) / 1e6) <= 1e-12
        assert abs(r["var_daily"] - ((V * 10**6) // (D * D)) / 1e6) <= 1e-12
        assert r["overdispersed"] == (V > S * D)
        if V > S * D:
            assert abs(r["nb_r"] - ((S * S * 10**6) // (V - S * D)) / 1e6) <= 1e-12
            assert abs(r["nb_p"] - ((S * D * 10**6) // V) / 1e6) <= 1e-12
            # NB moment identity: mean = r(1-p)/p within micro rounding
            rr, pp = r["nb_r"], r["nb_p"]
            assert abs(rr * (1 - pp) / pp - r["mean_daily"]) < 0.01 * max(r["mean_daily"], 1)


def test_nelson_aalen(spark, con):
    """q377: NA cumulative hazard replayed in pure Python, plus the
    Breslow-vs-KM consistency check (exp(-H) >= KM survival, both
    non-increasing, close where hazards are small)."""
    rows = con.execute(
        """SELECT user_id,
                  CAST(date_diff('day', DATE '1992-01-01', CAST(ts AS DATE)) AS BIGINT)
           FROM events WHERE event_type = 'purchase'"""
    ).fetchall()
    per: dict[int, list[int]] = {}
    for uid, d in rows:
        per.setdefault(uid, []).append(d)
    dmax = max(d for _, d in rows)
    durations = []
    for ds in per.values():
        ds.sort()
        nxt = next((d for d in ds if d > ds[0]), None)
        durations.append(
            (nxt - ds[0], 1) if nxt is not None else (dmax - ds[0], 0)
        )
    spine: dict[int, tuple] = {}
    for t, ev in durations:
        n_all, n_ev = spine.get(t, (0, 0))
        spine[t] = (n_all + 1, n_ev + ev)
    n_total = len(durations)
    cum_before = 0
    h_cum = 0
    want = {}
    for t in sorted(spine):
        n_all, n_ev = spine[t]
        n_risk = n_total - cum_before
        cum_before += n_all
        if n_ev == 0:
            continue
        h_cum += (n_ev * 10**6) // n_risk
        want[t] = (n_risk, n_ev, round(h_cum / 1e6, 6), round(math.exp(-h_cum / 1e6), 6))
    got = QUERIES["q377_nelson_aalen"](spark, SF).collect()
    assert {r["duration_days"] for r in got} == set(want)
    km = {r["duration_days"]: r["survival"] for r in QUERIES["q352_kaplan_meier"](spark, SF).collect()}
    for r in got:
        n_risk, n_ev, h, bs = want[r["duration_days"]]
        assert r["n_at_risk"] == n_risk and r["n_events"] == n_ev
        assert abs(r["cum_hazard"] - h) <= 1e-9
        assert abs(r["breslow_survival"] - bs) <= 1e-9
        # Breslow dominates KM: 1 - x <= exp(-x) per factor
        assert r["breslow_survival"] >= km[r["duration_days"]] - 1e-6
