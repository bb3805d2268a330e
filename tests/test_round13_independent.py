"""Independent third-implementation checks for the round-13 family.

q433: raw embedding components come back via DuckDB fetch only — no
SQL math — and the whole covariance -> 2x2 Cholesky whitening ->
re-verify chain is re-derived in pure Python (unbounded ints for the
sufficient statistics and floor divisions, IEEE doubles for the
per-row transform), so a formula bug shared by BOTH engines still
fails here. A second test pins q433's sufficient statistics to the
SAME gram-kernel cells q373 consumes (operators/similarity.
gram_matrix_quantized in dim-sums mode) — the "shared cells" ask of
VERDICT r12 item 3.

q434's independent recompute (ledger fold + emission counts) lives
here too: the streaming update log is replayed in pure Python from
the documents parquet using the q427 planting rule.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from pipeline_usnvc_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"

Q = 10_000_000


@pytest.fixture(scope="module")
def embeddings():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding FROM read_parquet('{SF}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    con.close()
    return [[float(x) for x in r[0]] for r in rows]


def _python_q433(vectors):
    """The full q433 chain in pure Python: exact ints for stats and
    floor divisions (Python // floors — the _sfdiv semantics), IEEE
    doubles for the per-row transform expressions with the same
    association order as both engines."""
    d = len(vectors[0])
    out = {}
    for blk in range(1, d // 2 + 1):
        xa = [v[2 * blk - 2] for v in vectors]
        xb = [v[2 * blk - 1] for v in vectors]
        qa = [math.floor(x * 1e7) for x in xa]
        qb = [math.floor(x * 1e7) for x in xb]
        n = len(qa)
        sa, sb = sum(qa), sum(qb)
        gaa = sum(a * a for a in qa)
        gab = sum(a * b for a, b in zip(qa, qb))
        gbb = sum(b * b for b in qb)
        caa = n * gaa - sa * sa
        cab = n * gab - sa * sb
        cbb = n * gbb - sb * sb
        beta_nano = (cab * 10**9) // max(caa, 1)
        var_a_micro = (caa * 10**6) // (n * n * 10**14)
        beta = beta_nano / 1e9
        wa = 1.0 / math.sqrt((var_a_micro + 1) / 1e6)
        qzb = [math.floor((b - beta * a) * 1e7) for a, b in zip(xa, xb)]
        szb = sum(qzb)
        gzbb = sum(z * z for z in qzb)
        var_zb_micro = ((n * gzbb - szb * szb) * 10**6) // (n * n * 10**14)
        wb = 1.0 / math.sqrt((var_zb_micro + 1) / 1e6)
        qwa = [math.floor((a * wa) * 1e7) for a in xa]
        qwb = [
            math.floor(((b - beta * a) * wb) * 1e7) for a, b in zip(xa, xb)
        ]
        swa, swb = sum(qwa), sum(qwb)
        gwaa = sum(w * w for w in qwa)
        gwab = sum(u * w for u, w in zip(qwa, qwb))
        gwbb = sum(w * w for w in qwb)
        out[blk] = {
            "n_vectors": n,
            "beta_nano": beta_nano,
            "var_a_micro": var_a_micro,
            "var_zb_micro": var_zb_micro,
            "w_scale_a": wa,
            "w_scale_b": wb,
            "var_wa_micro": ((n * gwaa - swa * swa) * 10**6)
            // (n * n * 10**14),
            "cov_w_micro": ((n * gwab - swa * swb) * 10**6)
            // (n * n * 10**14),
            "var_wb_micro": ((n * gwbb - swb * swb) * 10**6)
            // (n * n * 10**14),
        }
    return out


def test_q433_matches_pure_python_recompute(spark, embeddings):
    expect = _python_q433(embeddings)
    rows = QUERIES["q433_block_whitening_probe"](spark, SF).collect()
    assert len(rows) == len(expect) == 32
    for r in rows:
        e = expect[r["blk"]]
        for k, v in e.items():
            if isinstance(v, float):
                assert r[k] == v, (r["blk"], k, r[k], v)
            else:
                assert int(r[k]) == v, (r["blk"], k, r[k], v)
        assert r["dim_a"] == 2 * r["blk"] - 1
        assert r["dim_b"] == 2 * r["blk"]


def test_q433_stats_are_q373_kernel_cells(spark, embeddings):
    """Shared-cells pin (VERDICT r12 item 3): the raw sufficient
    statistics q433 aggregates relationally must equal the
    gram_matrix_quantized cells q373's covariance collect consumes —
    same quantization, same integer sums — for every (2k-1, 2k)
    block, including the dim-sum and row-count sentinels."""
    from pyspark.sql import functions as F

    from pipeline_usnvc_spark.operators.similarity import gram_matrix_quantized
    from pipeline_usnvc_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings").select("embedding")
    cells = {}
    sums = {}
    n_kernel = None
    for r in gram_matrix_quantized(emb, with_dim_sums=True).collect():
        i, j, s = r["dim_i"], r["dim_j"], int(r["sxy"])
        if i == -3:
            n_kernel = s
        elif j == -1:
            sums[i] = s
        else:
            cells[(i, j)] = s
    for blk in range(1, 33):
        a, b = 2 * blk - 1, 2 * blk
        xa = [v[a - 1] for v in embeddings]
        xb = [v[b - 1] for v in embeddings]
        qa = [math.floor(x * 1e7) for x in xa]
        qb = [math.floor(x * 1e7) for x in xb]
        assert cells[(a, a)] == sum(x * x for x in qa)
        assert cells[(a, b)] == sum(x * y for x, y in zip(qa, qb))
        assert cells[(b, b)] == sum(y * y for y in qb)
        assert sums[a] == sum(qa) and sums[b] == sum(qb)
    assert n_kernel == len(embeddings)


def _python_ledger_rollup():
    """Pure-Python replay of q434: the q427 planting rule, the
    per-fingerprint fold, update-mode emission counting (a key emits
    in every batch that delivered it at least one op — trigger ORDER
    is irrelevant to all reported stats), and the first-batch rollup."""
    import hashlib
    import re as _re

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()

    def fp(text):
        toks = [
            t
            for t in _re.split("[^a-zA-Z0-9]+", (text or "").lower())
            if t != ""
        ]
        return hashlib.md5(" ".join(toks).encode()).hexdigest()

    mx = max(d for d, _ in rows)
    ledger = [(d, t) for d, t in rows]
    ledger += [(2 * mx - d + 1, t) for d, t in rows if d % 7 == 0]
    ledger += [(3 * mx + 2 + d, t) for d, t in rows if d % 21 == 0]
    ops = [(d, d % 4, fp(t)) for d, t in ledger]
    per_key: dict = {}
    for d, b, f in ops:
        cur = per_key.setdefault(f, {"first": b, "canon": d, "n": 0, "batches": set()})
        cur["first"] = min(cur["first"], b)
        cur["canon"] = min(cur["canon"], d)
        cur["n"] += 1
        cur["batches"].add(b)
    rollup: dict = {}
    for k in per_key.values():
        r = rollup.setdefault(
            k["first"],
            {"new_keys": 0, "n_docs": 0, "multi": 0, "emissions": 0},
        )
        r["new_keys"] += 1
        r["n_docs"] += k["n"]
        r["multi"] += 1 if len(k["batches"]) >= 2 else 0
        r["emissions"] += len(k["batches"])
    log_rows = sum(len(k["batches"]) for k in per_key.values())
    snap = len(per_key)
    return rollup, log_rows, snap


def test_q434_matches_pure_python_replay(spark):
    rollup, log_rows, snap = _python_ledger_rollup()
    rows = QUERIES["q434_update_mode_ledger"](spark, SF).collect()
    assert len(rows) == len(rollup) == 4
    cum = 0
    for r in sorted(rows, key=lambda x: x["batch"]):
        e = rollup[r["batch"]]
        cum += e["new_keys"]
        assert r["new_keys"] == e["new_keys"]
        assert r["n_docs"] == e["n_docs"]
        assert r["n_multi_emit_keys"] == e["multi"]
        assert r["n_emissions"] == e["emissions"]
        assert r["cum_keys"] == cum
        assert r["log_rows_total"] == log_rows
        assert r["snapshot_rows"] == snap
        assert r["reclaim_micro"] == (1000000 * (log_rows - snap)) // log_rows
    # the re-emission contract is genuinely exercised on this corpus
    assert any(e["multi"] > 0 for e in rollup.values())


# --- q435/q436 portable HLL ------------------------------------------------


def _py_hll_registers(user_ids):
    """Reference register table: md5 60-bit prefix, low-6-bit index,
    rho = leading-zero rank of the remaining 54-bit window (capped at
    55 when the window is all zeros)."""
    import hashlib

    regs = {}
    for u in user_ids:
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
        idx, w = h % 64, h // 64
        rho = 55 if w == 0 else 55 - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    return regs


def _py_hll_estimate(regs):
    from pipeline_usnvc_spark.plans.round13_queries import _HLL_ALPHA_NUM

    s = sum(1 << (55 - regs.get(i, 0)) for i in range(64))
    return _HLL_ALPHA_NUM / float(s), s


def test_q435_matches_pure_python_hll(spark):
    con = duckdb.connect()
    by_type = dict(
        con.execute(
            f"SELECT event_type, list(DISTINCT user_id)"
            f" FROM read_parquet('{SF}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    con.close()
    rows = QUERIES["q435_portable_hll_merge"](spark, SF).collect()
    assert len(rows) == len(by_type) == 5
    for r in rows:
        est, s = _py_hll_estimate(_py_hll_registers(by_type[r["event_type"]]))
        assert r["s_dyadic"] == s
        assert r["hll_estimate"] == est  # bit-exact: same literal / same int
        assert r["exact_users"] == len(set(by_type[r["event_type"]]))
        assert r["n_merge_mismatch"] == 0


def test_q436_matches_pure_python_hll(spark):
    import datetime as dt

    con = duckdb.connect()
    pairs = con.execute(
        f"SELECT DISTINCT CAST(ts AS DATE), user_id"
        f" FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    days = sorted({p[0] for p in pairs})
    rows = {r["day"]: r for r in QUERIES["q436_portable_rolling_hll"](spark, SF).collect()}
    assert len(rows) == len(days) == 30
    for d in days:
        window_users = [u for (dd, u) in pairs if 0 <= (d - dd).days <= 6]
        est, s = _py_hll_estimate(_py_hll_registers(window_users))
        r = rows[str(d)]
        assert r["s_dyadic"] == s
        assert r["wau_hll"] == est
        assert r["wau_exact"] == len(set(window_users))


# --- q437 integer k-means --------------------------------------------------


def test_q437_matches_pure_python_lloyd(spark, embeddings):
    """Two Lloyd iterations recomputed in pure Python integers:
    floor(x*1e7) quantization, squared-L2 argmin with (dist, cluster)
    tie-break, floor-quantized mean update — pinned cluster-for-
    cluster against the Spark/oracle output."""
    import math

    vecs = {i: [math.floor(x * 1e7) for x in v] for i, v in enumerate(embeddings)}
    # NOTE: embeddings fixture is ordered by vec_id and vec_ids are
    # 0..n-1 on the synthetic table; assert that before relying on it
    con = duckdb.connect()
    ids = [r[0] for r in con.execute(
        f"SELECT vec_id FROM read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()]
    con.close()
    assert ids == list(range(len(embeddings)))

    cents = {c: list(vecs[ids[c]]) for c in range(8)}

    def assign(cents):
        out = {}
        for i, q in vecs.items():
            best = min(
                (sum((qa - ca) ** 2 for qa, ca in zip(q, cv)), c)
                for c, cv in cents.items()
            )
            out[i] = (best[1], best[0])
        return out

    def update(a):
        groups = {}
        for i, (c, _) in a.items():
            groups.setdefault(c, []).append(vecs[i])
        return {
            c: [sum(col) // len(g) for col in zip(*g)] for c, g in groups.items()
        }

    a1 = assign(cents)
    c1 = update(a1)
    a2 = assign(c1)
    c2 = update(a2)

    rows = {r["c"]: r for r in QUERIES["q437_integer_kmeans_probe"](spark, SF).collect()}
    assert set(rows) == set(c2)
    for c, r in rows.items():
        members = [i for i, (cc, _) in a2.items() if cc == c]
        assert r["n_members"] == len(members)
        assert r["inertia"] == sum(d for i, (cc, d) in a2.items() if cc == c)
        assert r["min_vec_id"] == min(members)
        assert r["max_vec_id"] == max(members)
        assert r["centroid_checksum"] == sum(
            cd * (d + 1) for d, cd in enumerate(c2[c])
        )
        assert r["n_vectors"] == len(vecs) == r["n_assigned"]


def test_q438_matches_pure_python_setops(spark):
    con = duckdb.connect()
    by_type = dict(
        con.execute(
            f"SELECT event_type, list(DISTINCT user_id)"
            f" FROM read_parquet('{SF}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    con.close()
    rows = QUERIES["q438_portable_hll_setops"](spark, SF).collect()
    assert len(rows) == 10  # C(5,2)
    for r in rows:
        ra = _py_hll_registers(by_type[r["type_a"]])
        rb = _py_hll_registers(by_type[r["type_b"]])
        ru = {i: max(ra.get(i, 0), rb.get(i, 0)) for i in set(ra) | set(rb)}
        ea, _ = _py_hll_estimate(ra)
        eb, _ = _py_hll_estimate(rb)
        eu, su = _py_hll_estimate(ru)
        assert r["s_union"] == su
        assert r["est_a"] == ea and r["est_b"] == eb and r["est_union"] == eu
        assert r["est_intersection"] == (ea + eb) - eu
        sa, sb = set(by_type[r["type_a"]]), set(by_type[r["type_b"]])
        assert r["exact_intersection"] == len(sa & sb)
        assert r["exact_union"] == len(sa | sb)
