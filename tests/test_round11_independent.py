"""Independent third-implementation checks for the round-11 family
(q424-q426): raw values come back via DuckDB fetch only — no SQL
math — and every statistic is re-derived in pure Python (exact
integer arithmetic via Python's unbounded ints, floor division via
math.floor semantics, the ridge solve via Fraction-exact Cramer's
rule), so a formula bug shared by BOTH engines still fails here."""

from __future__ import annotations

import math

import duckdb
import pytest

from pipeline_usnvc_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"

Q = 10_000_000
LAM = 10**14
RED = 10**14


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "embeddings"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _vectors(con):
    return con.execute(
        "SELECT vec_id, embedding, label FROM embeddings ORDER BY vec_id"
    ).fetchall()


def _fdiv(num: int, den: int) -> int:
    """Python's // IS floor division on ints — the reference
    semantics both engine-side sfdiv implementations must match."""
    return num // den


def test_streaming_staleness_maintenance(spark, con):
    """Recompute the day-partition liveness stats with a literal
    per-event Python walk and re-derive every advisor column; the
    streamed state (already contract-checked against the batch
    recompute in-plan) must equal this third implementation
    row-for-row."""
    rows = con.execute(
        "SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d'), user_id, epoch_us(ts)"
        " FROM events"
    ).fetchall()
    days: dict[str, list[tuple[int, int]]] = {}
    for day, uid, t in rows:
        days.setdefault(day, []).append((int(uid), int(t)))
    total_rows = sum(len(v) for v in days.values())
    total_dead = sum(1 for v in days.values() for uid, _ in v if uid % 10 == 0)
    table_micro = _fdiv(1_000_000 * total_dead, total_rows)
    want = {}
    for day, evs in days.items():
        n = len(evs)
        dead = sum(1 for uid, _ in evs if uid % 10 == 0)
        micro = _fdiv(1_000_000 * dead, n)
        want[day] = (
            n,
            dead,
            micro,
            micro >= 100_000,
            table_micro,
            min(t for _, t in evs),
            max(t for _, t in evs),
        )
    got = {
        r["zone_day"]: (
            r["n_rows"],
            r["n_dead"],
            r["dead_fraction_micro"],
            r["recommend_vacuum"],
            r["table_dead_fraction_micro"],
            r["min_t"],
            r["max_t"],
        )
        for r in QUERIES["q424_streaming_staleness_maintenance"](
            spark, SF
        ).collect()
    }
    assert got == want
    # the threshold must separate: both recommendation values occur
    assert {v[3] for v in want.values()} == {True, False}


def test_block_ridge_probe(spark, con):
    """Re-derive all 32 block solves in pure Python ints: quantize,
    accumulate the sufficient statistics, run Cramer's rule with the
    SAME reduction/floor-division pipeline, and evaluate SSE / R^2 at
    the micro weights. Additionally assert the reduced solve tracks
    the Fraction-EXACT solution within the reduction's documented
    slack, so the floor pipeline can't hide a gross solve bug."""
    from fractions import Fraction

    vecs = _vectors(con)
    d = len(vecs[0][1])
    n = len(vecs)
    yy = sum(int(y) * int(y) for _, _, y in vecs)
    want = {}
    for k in range(1, d // 2 + 1):
        ia, ib = 2 * k - 2, 2 * k - 1
        gaa = gab = gbb = ba = bb = 0
        for _, emb, y in vecs:
            qa = math.floor(float(emb[ia]) * Q)
            qb = math.floor(float(emb[ib]) * Q)
            gaa += qa * qa
            gab += qa * qb
            gbb += qb * qb
            ba += qa * int(y)
            bb += qb * int(y)
        det = (gaa + LAM) * (gbb + LAM) - gab * gab
        num_a = (gbb + LAM) * ba - gab * bb
        num_b = (gaa + LAM) * bb - gab * ba
        # the engines form the determinant from cells PRE-REDUCED by
        # 1e4 (Spark DECIMAL(38,0) headroom at the n~1e5 envelope —
        # see the plan comment); mirror it exactly
        grab = _fdiv(gab, 10**4)
        det_hat = (gaa // 10**4 + 10**10) * (gbb // 10**4 + 10**10) - grab * grab
        detr = max(det_hat // 10**6, 1)
        wa = _fdiv(_fdiv(num_a, RED) * 10**13, detr)
        wb = _fdiv(_fdiv(num_b, RED) * 10**13, detr)
        # reduced-pipeline drift vs the Fraction-exact solve: the two
        # floor steps cost <= a few micro absolute; the det reduction
        # costs <= ~2e-6 relative in the worst (g ~ lam) case — a
        # gross solve bug still lands far outside this band
        for w_micro, num in ((wa, num_a), (wb, num_b)):
            exact = Fraction(num * 10**13, det)
            assert abs(w_micro - exact) <= 4 + abs(exact) * Fraction(1, 10**5)
        cross = _fdiv(2 * (wa * ba + wb * bb), Q)
        quad = _fdiv(wa * wa * gaa + 2 * wa * wb * gab + wb * wb * gbb, 10**20)
        sse = yy * 10**6 - cross + quad
        r2u = 10**6 - _fdiv(sse, yy)
        want[k] = (2 * k - 1, 2 * k, n, gaa, gab, gbb, ba, bb, wa, wb, sse, r2u)
    got = {
        r["blk"]: (
            r["dim_a"],
            r["dim_b"],
            r["n_vectors"],
            r["g_aa"],
            r["g_ab"],
            r["g_bb"],
            r["b_a"],
            r["b_b"],
            r["w_a_micro"],
            r["w_b_micro"],
            r["sse_micro"],
            r["r2u_micro"],
        )
        for r in QUERIES["q425_block_ridge_probe"](spark, SF).collect()
    }
    assert got == want
    # the probe must report a usable fit signal: uncentered R^2 in
    # [0, 1e6] for every block (ridge can't lose to w = 0)
    assert all(0 <= v[11] <= 10**6 for v in want.values())


def test_block_decorrelate(spark, con):
    """Re-derive the Gram-Schmidt pass in Python: exact integer
    covariance stats -> beta via the same shifted floor division ->
    float64 transform -> re-quantize -> exact transformed covariance.
    Then assert the DEFINING property independently: decorrelation
    shrinks |cov| to quantization dust while a genuinely correlated
    control pair would not."""
    vecs = _vectors(con)
    d = len(vecs[0][1])
    n = len(vecs)
    want = {}
    for k in range(1, d // 2 + 1):
        ia, ib = 2 * k - 2, 2 * k - 1
        sa = sb = gaa = gab = gbb = 0
        for _, emb, _y in vecs:
            qa = math.floor(float(emb[ia]) * Q)
            qb = math.floor(float(emb[ib]) * Q)
            sa += qa
            sb += qb
            gaa += qa * qa
            gab += qa * qb
            gbb += qb * qb
        cab = n * gab - sa * sb
        caa = n * gaa - sa * sa
        cbb = n * gbb - sb * sb
        beta_nano = _fdiv(cab * 10**9, max(caa, 1))
        beta = beta_nano / 1e9
        sza = szb = gzab = gzbb = 0
        for _, emb, _y in vecs:
            xa = float(emb[ia])
            xb = float(emb[ib])
            qza = math.floor(xa * Q)
            qzb = math.floor((xb - beta * xa) * Q)
            sza += qza
            szb += qzb
            gzab += qza * qzb
            gzbb += qzb * qzb
        den = n * n * LAM
        want[k] = (
            2 * k - 1,
            2 * k,
            n,
            beta_nano,
            _fdiv(cab * 10**6, den),
            _fdiv(cbb * 10**6, den),
            _fdiv((n * gzab - sza * szb) * 10**6, den),
            _fdiv((n * gzbb - szb * szb) * 10**6, den),
        )
    got = {
        r["blk"]: (
            r["dim_a"],
            r["dim_b"],
            r["n_vectors"],
            r["beta_nano"],
            r["cov_raw_micro"],
            r["var_b_raw_micro"],
            r["cov_dec_micro"],
            r["var_b_dec_micro"],
        )
        for r in QUERIES["q426_block_decorrelate"](spark, SF).collect()
    }
    assert got == want
    # defining property: every block's transformed covariance is
    # quantization dust (|.| <= a few micro) regardless of the raw
    # magnitude, and the variance never grows past raw + dust
    for v in want.values():
        assert abs(v[6]) <= 3
        assert v[7] <= v[5] + 3


def _ledger_rows(con):
    """The planted-copy ledger, materialized row-by-row in Python
    (ids and texts only; fingerprints computed below with hashlib on
    the SAME normalization, independent of both engines' md5/tokenize
    SQL)."""
    import re as _re

    base = con.execute("SELECT doc_id, text FROM documents").fetchall()
    mx = max(d for d, _ in base)
    rows = [(int(d), t) for d, t in base]
    rows += [(2 * mx - d + 1, t) for d, t in base if d % 7 == 0]
    rows += [(3 * mx + 2 + d, t) for d, t in base if d % 21 == 0]

    import hashlib

    def fp(text: str) -> str:
        toks = [t for t in _re.split(r"[^0-9a-z]+", (text or "").lower()) if t]
        return hashlib.md5(" ".join(toks).encode()).hexdigest()

    return [(d, d % 4, fp(t)) for d, t in rows]


@pytest.fixture(scope="module")
def doc_con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return c


def test_merge_ledger_compaction(spark, doc_con):
    """Fold the op log in a literal Python dict walk — batch by batch,
    insert-on-first-sight, canonical = least(current, incoming) — and
    re-derive every q427 column from the walk."""
    rows = _ledger_rows(doc_con)
    state: dict[str, int] = {}
    per_batch = {b: {"n_docs": 0, "ops": set(), "inserts": set()} for b in range(4)}
    for b in range(4):
        for d, bb, f in rows:
            if bb != b:
                continue
            per_batch[b]["n_docs"] += 1
            per_batch[b]["ops"].add(f)
            if f not in state:
                state[f] = d
                per_batch[b]["inserts"].add(f)
            else:
                state[f] = min(state[f], d)
    log_total = sum(len(v["ops"]) for v in per_batch.values())
    snapshot = len(state)
    reclaim = (1_000_000 * (log_total - snapshot)) // log_total
    cum = 0
    want = {}
    for b in range(4):
        cum += len(per_batch[b]["inserts"])
        want[b] = (
            per_batch[b]["n_docs"],
            len(per_batch[b]["ops"]),
            len(per_batch[b]["inserts"]),
            len(per_batch[b]["ops"]) - len(per_batch[b]["inserts"]),
            cum,
            log_total,
            snapshot,
            reclaim,
        )
    got = {
        r["batch"]: (
            r["n_docs"],
            r["n_ops"],
            r["n_inserts"],
            r["n_dup_ops"],
            r["cum_keys"],
            r["log_rows_total"],
            r["snapshot_rows"],
            r["reclaim_micro"],
        )
        for r in QUERIES["q427_merge_ledger_compaction"](spark, SF).collect()
    }
    assert got == want
    # the planted copies must make the compaction non-trivial
    assert log_total > snapshot


def test_snapshot_diff(spark, doc_con):
    """Reconstruct both snapshots independently and classify keys in
    Python; the planted-offset scheme must produce all three statuses
    (a diff that can't observe re-pointing wouldn't test MERGE's
    WHEN MATCHED path)."""
    rows = _ledger_rows(doc_con)
    all_min: dict[str, int] = {}
    v1_min: dict[str, int] = {}
    n_docs: dict[str, int] = {}
    for d, b, f in rows:
        all_min[f] = min(all_min.get(f, d), d)
        n_docs[f] = n_docs.get(f, 0) + 1
        if b <= 1:
            v1_min[f] = min(v1_min.get(f, d), d)
    want = {"added": [0, 0], "repointed": [0, 0], "unchanged": [0, 0]}
    for f, canon in all_min.items():
        if f not in v1_min:
            s = "added"
        elif canon != v1_min[f]:
            s = "repointed"
        else:
            s = "unchanged"
        want[s][0] += 1
        want[s][1] += n_docs[f]
    got = {
        r["status"]: [r["n_keys"], r["n_docs"]]
        for r in QUERIES["q428_snapshot_diff"](spark, SF).collect()
    }
    assert got == {k: v for k, v in want.items() if v[0] > 0}
    assert all(want[s][0] > 0 for s in ("added", "repointed", "unchanged"))


@pytest.mark.slow  # envelope stress: maximal-corpus end-to-end run (~10 s)
def test_block_ridge_probe_envelope_boundary(spark, tmp_path):
    """Regression lock on the q425 envelope: the binding constraint
    is the driver-facing BIGINT stats columns (g_aa = sum of q^2 must
    stay <= 9.22e18 — building THIS test at n=1e5 proved the g cast,
    not the determinant, fails first on BOTH engines), so the maximal
    reportable corpus at unit magnitude is ~92k vectors. At that
    envelope the whole pipeline — kernel, pre-reduced det_hat solve,
    SSE, output casts — must stay hash-exact, non-null, and equal to
    the symmetric-2x2 closed form."""
    import duckdb as _duck

    from pipeline_usnvc_spark.sources.tables import TABLE_NAMES
    from tests.oracle_compare import assert_frames_match, run_oracle
    from pipeline_usnvc_spark.plans import ORACLES, QUERIES

    d = tmp_path / "envelope"
    d.mkdir()
    con = _duck.connect()
    con.execute(
        f"""
        COPY (
          SELECT i AS vec_id,
                 list_transform(range(64), x -> CAST(1.0 AS FLOAT)) AS embedding,
                 CAST(9 AS INTEGER) AS label
          FROM (SELECT unnest(range(92000)) AS i)
        ) TO '{d}/embeddings.parquet' (FORMAT parquet)
        """
    )
    # run_oracle registers every table name; only embeddings is read
    for t in TABLE_NAMES:
        if t != "embeddings":
            (d / f"{t}.parquet").symlink_to(f"{SF}/{t}.parquet")
    n, lam_q2 = 92_000, LAM
    g = n * Q * Q  # every component quantizes to exactly 1e7
    assert g <= 2**63 - 1 < (g // 9) * 10  # just under the BIGINT ceiling
    spdf = QUERIES["q425_block_ridge_probe"](spark, str(d)).toPandas()
    assert len(spdf) == 32 and not spdf["w_a_micro"].isna().any()
    assert_frames_match(
        spdf,
        run_oracle(ORACLES["q425_block_ridge_probe"], str(d)),
        "q425_envelope",
    )
    # closed form at this degenerate corpus: every block identical,
    # w_a = w_b = b/(2g + lam) exactly (symmetric 2x2)
    b = n * Q * 9
    grab = g // 10**4
    det_hat = (g // 10**4 + 10**10) ** 2 - grab * grab
    detr = max(det_hat // 10**6, 1)
    num = (g + lam_q2) * b - g * b
    want_w = ((num // RED) * 10**13) // detr
    assert set(spdf["w_a_micro"]) == {want_w}
    assert set(spdf["w_b_micro"]) == {want_w}


def test_dedup_survivorship_planted_classes(spark, doc_con):
    """q252's round-11 de-vacuization: recompute the planted-corpus
    survivorship in Python (hashlib digests, explicit keeper walk)
    and pin the policy split analytically — %7-only groups tie on
    n_chars and agree (keep-first wins the tie), %21 groups carry the
    punctuation-padded longer copy and disagree."""
    import hashlib
    import re as _re

    rows = doc_con.execute(
        "SELECT doc_id, text, n_chars FROM documents"
    ).fetchall()
    mx = max(d for d, _, _ in rows)
    corpus = [(int(d), t, int(n)) for d, t, n in rows]
    corpus += [(2 * mx - d + 1, t, n) for d, t, n in corpus[: len(rows)] if d % 7 == 0]
    corpus += [
        (3 * mx + 2 + d, t + " !!!", n + 4)
        for d, t, n in corpus[: len(rows)]
        if d % 21 == 0
    ]

    def digest(text: str) -> str:
        toks = [t for t in _re.split(r"[^0-9a-z]+", (text or "").lower()) if t]
        return hashlib.md5(" ".join(toks).encode()).hexdigest()

    groups: dict[str, list[tuple[int, int]]] = {}
    for d, t, n in corpus:
        groups.setdefault(digest(t), []).append((d, n))
    want = {}
    for dg, members in groups.items():
        if len(members) <= 1:
            continue
        first = min(d for d, _ in members)
        longest = max(members, key=lambda m: (m[1], -m[0]))[0]
        want[dg] = (len(members), first, longest, first == longest)
    got = {
        r["digest"]: (
            r["group_size"],
            r["keeper_first"],
            r["keeper_longest"],
            r["policies_agree"],
        )
        for r in QUERIES["q252_dedup_survivorship"](spark, SF).collect()
    }
    assert got == want
    n7 = sum(1 for d, _, _ in rows if d % 7 == 0)
    n21 = sum(1 for d, _, _ in rows if d % 21 == 0)
    assert sum(1 for v in want.values() if v[3]) == n7 - n21
    assert sum(1 for v in want.values() if not v[3]) == n21
