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
    for t in ("events", "documents"):
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
    for did, t in texts.items():
        if did % 10 == 0:
            corpus[did + 1_000_000] = t
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
