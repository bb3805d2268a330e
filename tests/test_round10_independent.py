"""Independent third-implementation checks for the round-10 family
(q410-q413): raw values come back via DuckDB fetch only — no SQL
math — and every statistic is re-derived in pure Python (the capped
episode scan as an explicit per-user stream walk, zone-map overlap
as a literal interval test per block×month, bin packing as a running
accumulator, run counting as a linear scan), so a formula bug shared
by BOTH engines still fails here."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from pipeline_usnvc_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _month_end(d: dt.date) -> dt.date:
    nxt = dt.date(d.year + (d.month == 12), d.month % 12 + 1, 1)
    return nxt - dt.timedelta(days=1)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "orders", "documents", "lineitem"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def test_capped_episode_mining(spark, con):
    """Walk each user's (t, event_id)-sorted stream in Python: for
    every anchor, take AT MOST the 8 nearest subsequent events within
    30 minutes and tally (type_a, type_b) occurrence and user support.
    This is the definition; the query's lead-array formulation must
    equal it exactly."""
    rows = con.execute(
        "SELECT user_id, event_id, event_type, epoch_us(ts) FROM events"
    ).fetchall()
    streams: dict[int, list[tuple[int, int, str]]] = {}
    for uid, eid, etype, t in rows:
        streams.setdefault(uid, []).append((int(t), int(eid), etype))
    occ: dict[tuple[str, str], int] = {}
    users: dict[tuple[str, str], set[int]] = {}
    for uid, evs in streams.items():
        evs.sort()
        for i, (t_a, _eid_a, type_a) in enumerate(evs):
            taken = 0
            for t_b, _eid_b, type_b in evs[i + 1 :]:
                if t_b > t_a + 1_800_000_000 or taken == 8:
                    break
                taken += 1
                key = (type_a, type_b)
                occ[key] = occ.get(key, 0) + 1
                users.setdefault(key, set()).add(uid)
    got = {
        (r["type_a"], r["type_b"]): (r["n_occurrences_capped"], r["n_users"])
        for r in QUERIES["q410_capped_episode_mining"](spark, SF).collect()
    }
    want = {k: (occ[k], len(users[k])) for k in occ}
    assert got == want


def test_capped_episode_mining_truncation_binds(spark):
    """The shipped test data's max in-window out-degree is 3 at every
    SF, so the K=8 cap never binds there and the parity above cannot
    distinguish q410 from q321's uncapped semantics. Prove the
    truncation on a synthetic DENSE stream (one event per minute —
    out-degree ~29 inside the 30-minute window) against a pure-Python
    capped walk, and check it counts strictly fewer pairs than the
    uncapped definition."""
    from pipeline_usnvc_spark.plans.round10_queries import capped_episode_mining

    rows = []
    for uid in range(3):
        for i in range(40):
            # types cycle so several (a, b) lattice cells fill
            rows.append((uid, uid * 1000 + i, f"t{(i + uid) % 3}",
                         1_000_000_000 + i * 60_000_000))
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, event_type string, t bigint"
    )
    K, WIN = 4, 1_800_000_000
    occ: dict[tuple[str, str], int] = {}
    users: dict[tuple[str, str], set[int]] = {}
    uncapped = 0
    streams: dict[int, list[tuple[int, int, str]]] = {}
    for uid, eid, ty, t in rows:
        streams.setdefault(uid, []).append((t, eid, ty))
    for uid, evs in streams.items():
        evs.sort()
        for i, (t_a, _e, type_a) in enumerate(evs):
            taken = 0
            for t_b, _e2, type_b in evs[i + 1 :]:
                if t_b > t_a + WIN:
                    break
                uncapped += 1
                if taken < K:
                    taken += 1
                    key = (type_a, type_b)
                    occ[key] = occ.get(key, 0) + 1
                    users.setdefault(key, set()).add(uid)
    got = {
        (r["type_a"], r["type_b"]): (r["n_occurrences_capped"], r["n_users"])
        for r in capped_episode_mining(ev, cap_k=K).collect()
    }
    assert got == {k: (occ[k], len(users[k])) for k in occ}
    assert sum(occ.values()) < uncapped, "dense fixture failed to bind the cap"


def test_zonemap_skipping(spark, con):
    """Rebuild both layouts' 512-row blocks by explicit sort, take
    literal per-block min/max dates, and test interval overlap against
    every calendar month present — per block, per month, in Python."""
    rows = con.execute("SELECT o_orderkey, CAST(o_orderdate AS DATE) FROM orders").fetchall()
    dates = [(int(k), d) for k, d in rows]

    months = sorted({dt.date(d.year, d.month, 1) for _, d in dates})

    def audit(ordered: list[dt.date]) -> tuple[int, int]:
        blocks = [
            ordered[i : i + 512] for i in range(0, len(ordered), 512)
        ]
        scanned = 0
        for blk in blocks:
            mn, mx = min(blk), max(blk)
            for m0 in months:
                if mn <= _month_end(m0) and mx >= m0:
                    scanned += 1
        return len(blocks), scanned

    nat = [d for _, d in sorted(dates, key=lambda kv: kv[0])]
    clu = [d for _, d in sorted(dates, key=lambda kv: (kv[1], kv[0]))]
    got = {
        r["layout"]: r
        for r in QUERIES["q411_zonemap_skipping"](spark, SF).collect()
    }
    for layout, ordered in (("natural_orderkey", nat), ("clustered_by_date", clu)):
        nb, scanned = audit(ordered)
        r = got[layout]
        assert r["n_blocks"] == nb
        assert r["n_months"] == len(months)
        assert r["scanned_block_months"] == scanned
        micro = (1_000_000 * scanned) // (nb * len(months))
        assert r["scan_fraction_micro"] == micro
        assert r["scan_fraction"] == micro / 1e6
    # clustering by date must never scan MORE than the natural layout
    assert (
        got["clustered_by_date"]["scanned_block_months"]
        <= got["natural_orderkey"]["scanned_block_months"]
    )


def test_compaction_plan(spark, con):
    """Replay the concatenation-order packing with a plain running
    accumulator per source and re-derive every summary column."""
    rows = con.execute(
        "SELECT source, doc_id, n_chars FROM documents ORDER BY source, doc_id"
    ).fetchall()
    per_source: dict[str, dict[int, tuple[int, int]]] = {}
    cum: dict[str, int] = {}
    groups: dict[str, dict[int, list[int]]] = {}
    for src, _doc, nb in rows:
        before = cum.get(src, 0)
        grp = before // 65_536
        groups.setdefault(src, {}).setdefault(grp, []).append(int(nb))
        cum[src] = before + int(nb)
    got = {
        r["source"]: r for r in QUERIES["q412_compaction_plan"](spark, SF).collect()
    }
    assert set(got) == set(groups)
    for src, grps in groups.items():
        r = got[src]
        sizes = [sum(g) for g in grps.values()]
        counts = [len(g) for g in grps.values()]
        assert r["n_files"] == sum(counts)
        assert r["n_groups"] == len(grps)
        assert r["total_bytes"] == sum(sizes)
        assert r["max_group_bytes"] == max(sizes)
        assert r["min_group_files"] == min(counts)
        assert r["max_group_files"] == max(counts)
        # packing invariant: the last group STARTS strictly inside the
        # total byte span (group = cum_before // target is
        # nondecreasing, so the planner never splits a group; an
        # oversized file may legitimately SKIP ids, so contiguity is
        # deliberately NOT asserted)
        assert max(grps) * 65_536 < cum[src]


def test_rle_run_audit(spark, con):
    """Count runs by a literal linear scan over both explicit sorts."""
    rows = con.execute("SELECT o_orderkey, o_orderpriority FROM orders").fetchall()
    rows = [(int(k), v) for k, v in rows]

    def runs(seq: list[str]) -> int:
        return sum(1 for i, v in enumerate(seq) if i == 0 or seq[i - 1] != v)

    nat = [v for _, v in sorted(rows, key=lambda kv: kv[0])]
    clu = [v for _, v in sorted(rows, key=lambda kv: (kv[1], kv[0]))]
    got = {
        r["layout"]: r for r in QUERIES["q413_rle_run_audit"](spark, SF).collect()
    }
    for layout, seq in (("natural_orderkey", nat), ("clustered_by_value", clu)):
        r = got[layout]
        n_runs = runs(seq)
        assert r["n_rows"] == len(seq)
        assert r["n_runs"] == n_runs
        micro = (len(seq) * 1_000_000) // n_runs
        assert r["mean_run_len_micro"] == micro
        assert r["mean_run_len"] == micro / 1e6
    # the RLE best case: clustered runs == distinct values
    assert got["clustered_by_value"]["n_runs"] == len(set(clu))


def test_capped_episode_mining_adversarial_edges(spark):
    """Seeded adversarial streams aimed at q410's two sharp edges:
    (1) EQUAL timestamps — the stream order and the oracle's
    row_number both tie-break on event_id, and the lead-k prefix
    argument only holds because the window predicate depends on t
    alone; (2) successors landing EXACTLY on t_a + WIN (inclusive on
    both engines). Recomputed by the pure-Python capped walk."""
    import random

    from pipeline_usnvc_spark.plans.round10_queries import capped_episode_mining

    rng = random.Random(20260815)
    WIN = 1_800_000_000
    K = 3
    rows = []
    eid = 0
    for uid in range(5):
        t = 1_000_000_000
        for _ in range(30):
            burst = rng.randint(1, 4)  # equal-t bursts of 1-4 events
            for _ in range(burst):
                rows.append((uid, eid, f"t{rng.randint(0, 2)}", t))
                eid += 1
            step = rng.choice([0, 1, WIN // 3, WIN, WIN + 1])
            t += step
        # one engineered exact-boundary pair per user
        rows.append((uid, eid, "edge_a", t)); eid += 1
        rows.append((uid, eid, "edge_b", t + WIN)); eid += 1
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, event_type string, t bigint"
    )
    streams: dict[int, list[tuple[int, int, str]]] = {}
    for uid, e_, ty, t in rows:
        streams.setdefault(uid, []).append((t, e_, ty))
    occ: dict[tuple[str, str], int] = {}
    users: dict[tuple[str, str], set[int]] = {}
    for uid, evs in streams.items():
        evs.sort()
        for i, (t_a, _e, type_a) in enumerate(evs):
            taken = 0
            for t_b, _e2, type_b in evs[i + 1 :]:
                if t_b > t_a + WIN or taken == K:
                    break
                taken += 1
                key = (type_a, type_b)
                occ[key] = occ.get(key, 0) + 1
                users.setdefault(key, set()).add(uid)
    got = {
        (r["type_a"], r["type_b"]): (r["n_occurrences_capped"], r["n_users"])
        for r in capped_episode_mining(ev, cap_k=K).collect()
    }
    assert got == {k: (occ[k], len(users[k])) for k in occ}
    # the engineered boundary successor must be counted (inclusive <=)
    assert ("edge_a", "edge_b") in got


def test_zorder_skipping(spark, con):
    """Re-derive q415 entirely in Python: re-interleave the Z-bits
    with plain integer arithmetic, rebuild both layouts' 512-row
    blocks by explicit sort, and count block×predicate overlaps for
    both workloads (months and residue slices) literally."""
    rows = con.execute(
        "SELECT o_orderkey, CAST(o_orderdate AS DATE), o_custkey FROM orders"
    ).fetchall()
    epoch = dt.date(1992, 1, 1)

    def z(d: int, c: int) -> int:
        out = 0
        for i in range(12):
            out |= ((d >> i) & 1) << (2 * i)
            out |= ((c >> i) & 1) << (2 * i + 1)
        return out

    recs = [
        (int(k), od, (od - epoch).days, int(ck) % 4096)
        for k, od, ck in rows
    ]
    months = sorted({dt.date(od.year, od.month, 1) for _, od, _, _ in recs})

    def audit(ordered):
        blocks = [ordered[i : i + 512] for i in range(0, len(ordered), 512)]
        m_scan = s_scan = 0
        for blk in blocks:
            ods = [od for od, _ in blk]
            cs = [c for _, c in blk]
            mn_d, mx_d, mn_c, mx_c = min(ods), max(ods), min(cs), max(cs)
            for m0 in months:
                if mn_d <= _month_end(m0) and mx_d >= m0:
                    m_scan += 1
            for k in range(16):
                if mn_c <= k * 256 + 255 and mx_c >= k * 256:
                    s_scan += 1
        return len(blocks), m_scan, s_scan

    lin = [
        (od, c)
        for _, od, _, c in sorted(recs, key=lambda r: (r[1], r[0]))
    ]
    zord = [
        (od, c)
        for _, od, _, c in sorted(recs, key=lambda r: (z(r[2], r[3]), r[0]))
    ]
    got = {
        (r["layout"], r["predicate_class"]): r
        for r in QUERIES["q415_zorder_skipping"](spark, SF).collect()
    }
    for layout, ordered in (
        ("clustered_by_date", lin),
        ("zorder_date_custkey", zord),
    ):
        nb, m_scan, s_scan = audit(ordered)
        for cls, scanned, n_preds in (
            ("month_range", m_scan, len(months)),
            ("custkey_slice", s_scan, 16),
        ):
            r = got[(layout, cls)]
            assert r["n_blocks"] == nb
            assert r["n_preds"] == n_preds
            assert r["scanned_block_preds"] == scanned
            micro = (1_000_000 * scanned) // (nb * n_preds)
            assert r["scan_fraction_micro"] == micro
            assert r["scan_fraction"] == micro / 1e6


def test_deletion_staleness_audit(spark, con):
    """Replay the deletes in Python: sort by (od, key) into 512-row
    blocks, apply each policy's literal delete predicate row by row,
    re-derive stale vs live per-block intervals, and count the
    block×month overlaps for both stats generations — plus the vacuum
    and rewrite sets — from first principles."""
    rows = con.execute(
        "SELECT o_orderkey, CAST(o_orderdate AS DATE) FROM orders"
    ).fetchall()
    data = sorted(((d, int(k)) for k, d in rows))
    blocks = [data[i : i + 512] for i in range(0, len(data), 512)]

    months = sorted({dt.date(d.year, d.month, 1) for d, _ in data})

    def overlaps(mn: dt.date, mx: dt.date) -> int:
        return sum(1 for m0 in months if mn <= _month_end(m0) and mx >= m0)

    cutoff = dt.date(1997, 1, 1)
    policies = {
        "ttl_before_1997": lambda d, k: d < cutoff,
        "scatter_mod97": lambda d, k: k % 97 == 0,
    }
    scanned_stale = sum(
        overlaps(min(d for d, _ in blk), max(d for d, _ in blk))
        for blk in blocks
    )
    got = {
        r["policy"]: r
        for r in QUERIES["q416_deletion_staleness_audit"](spark, SF).collect()
    }
    for policy, deleted in policies.items():
        n_deleted = fully_dead = rewrite = scanned_fresh = 0
        for blk in blocks:
            live = [d for d, k in blk if not deleted(d, k)]
            dead = len(blk) - len(live)
            n_deleted += dead
            if not live:
                fully_dead += 1
            else:
                if 4 * dead >= len(blk):
                    rewrite += 1
                scanned_fresh += overlaps(min(live), max(live))
        r = got[policy]
        assert r["n_blocks"] == len(blocks)
        assert r["n_rows"] == len(data)
        assert r["n_deleted"] == n_deleted
        assert r["fully_dead_blocks"] == fully_dead
        assert r["rewrite_blocks"] == rewrite
        assert r["scanned_stale_block_months"] == scanned_stale
        assert r["scanned_fresh_block_months"] == scanned_fresh
        micro = (1_000_000 * scanned_stale) // scanned_fresh
        assert r["scan_amplification_micro"] == micro
        assert r["scan_amplification"] == micro / 1e6
    # stale stats can never scan FEWER block-months than fresh ones
    # (a live interval is contained in its block's stored interval)
    for r in got.values():
        assert (
            r["scanned_stale_block_months"] >= r["scanned_fresh_block_months"]
        )


def test_manifest_cascade_pruning(spark, con):
    """Rebuild the two-level stats hierarchy literally — 512-row
    blocks, 8-block files — and re-count month overlaps at each level
    plus the exact metadata entries a cascaded reader touches."""
    rows = con.execute(
        "SELECT o_orderkey, CAST(o_orderdate AS DATE) FROM orders"
    ).fetchall()
    dates = [(int(k), d) for k, d in rows]

    months = sorted({dt.date(d.year, d.month, 1) for _, d in dates})

    def audit(ordered):
        blocks = [ordered[i : i + 512] for i in range(0, len(ordered), 512)]
        files = [blocks[i : i + 8] for i in range(0, len(blocks), 8)]
        f_scan = b_scan = cascade_entries = 0
        for fil in files:
            f_mn = min(min(b) for b in fil)
            f_mx = max(max(b) for b in fil)
            for m0 in months:
                if f_mn <= _month_end(m0) and f_mx >= m0:
                    f_scan += 1
                    cascade_entries += len(fil)
        for blk in blocks:
            mn, mx = min(blk), max(blk)
            for m0 in months:
                if mn <= _month_end(m0) and mx >= m0:
                    b_scan += 1
        return len(files), len(blocks), f_scan, b_scan, cascade_entries

    nat = [d for _, d in sorted(dates, key=lambda kv: kv[0])]
    clu = [d for _, d in sorted(dates, key=lambda kv: (kv[1], kv[0]))]
    got = {
        r["layout"]: r
        for r in QUERIES["q417_manifest_cascade_pruning"](spark, SF).collect()
    }
    for layout, ordered in (("natural_orderkey", nat), ("clustered_by_date", clu)):
        nf, nb, f_scan, b_scan, casc = audit(ordered)
        r = got[layout]
        assert r["n_files"] == nf
        assert r["n_blocks"] == nb
        assert r["n_months"] == len(months)
        assert r["file_scanned"] == f_scan
        assert r["block_scanned"] == b_scan
        assert r["file_scan_fraction_micro"] == (1_000_000 * f_scan) // (
            nf * len(months)
        )
        assert r["block_scan_fraction_micro"] == (1_000_000 * b_scan) // (
            nb * len(months)
        )
        flat = nb * len(months)
        cascade = nf * len(months) + casc
        assert r["stats_entries_flat"] == flat
        assert r["stats_entries_cascade"] == cascade
        micro = (1_000_000 * cascade) // flat
        assert r["cascade_read_ratio_micro"] == micro
        assert r["cascade_read_ratio"] == micro / 1e6
    # block-level pruning is at least as selective as file-level
    # pruning on the SAME layout (a block interval is inside its file's)
    for r in got.values():
        assert r["block_scan_fraction_micro"] <= 1_000_000
        assert r["block_scanned"] <= r["file_scanned"] * 8


def test_range_boundary_plan(spark, con):
    """Re-derive both boundary schemes from the raw cent values: sort
    them, pick the ceil(k·n/32)-th order statistic per cut (then snap
    ties to whole values — range partitioning assigns by VALUE), pack
    rows into partitions with plain comparisons, and recompute every
    balance column."""
    vals = [
        int(v)
        for (v,) in con.execute(
            "SELECT CAST(floor(value * 100) AS BIGINT) FROM events"
            " WHERE value IS NOT NULL"
        ).fetchall()
    ]
    n, B = len(vals), 32
    svals = sorted(vals)
    # equi-depth: boundary_k = smallest value whose cumulative count
    # reaches ceil(k*n/B) == the ceil(k*n/B)-th smallest value
    bnds = sorted({svals[-(-k * n // B) - 1] for k in range(1, B)})
    depth_parts: dict[int, int] = {}
    for v in vals:
        p = sum(1 for b in bnds if b <= v)
        depth_parts[p] = depth_parts.get(p, 0) + 1
    mn, mx = svals[0], svals[-1]
    width_parts: dict[int, int] = {}
    for v in vals:
        p = ((v - mn) * B) // (mx - mn + 1)
        width_parts[p] = width_parts.get(p, 0) + 1
    got = {
        r["scheme"]: r
        for r in QUERIES["q418_range_boundary_plan"](spark, SF).collect()
    }
    for scheme, parts in (("equi_depth", depth_parts), ("equal_width", width_parts)):
        r = got[scheme]
        assert r["n_rows"] == n
        assert r["n_partitions"] == B
        assert r["nonempty_partitions"] == len(parts)
        assert r["max_part_rows"] == max(parts.values())
        assert r["min_part_rows"] == min(parts.values())
        micro = (max(parts.values()) * B * 1_000_000) // n
        assert r["imbalance_micro"] == micro
        assert r["imbalance"] == micro / 1e6
    # the planner's whole point: exact equi-depth boundaries beat
    # equal-width ones on a skewed column
    assert (
        got["equi_depth"]["imbalance_micro"]
        < got["equal_width"]["imbalance_micro"]
    )


def test_layout_advisor(spark, con):
    """Re-derive q419's whole decision in Python: four explicit
    sorts, literal block stats on BOTH dimensions, per-class overlap
    counts, the weighted cost in exact integer micro units, and the
    tie-broken argmin — then check exactly one row is recommended and
    it is the true minimum."""
    rows = con.execute(
        "SELECT o_orderkey, CAST(o_orderdate AS DATE), o_custkey FROM orders"
    ).fetchall()
    epoch = dt.date(1992, 1, 1)

    def z(d: int, c: int) -> int:
        out = 0
        for i in range(12):
            out |= ((d >> i) & 1) << (2 * i)
            out |= ((c >> i) & 1) << (2 * i + 1)
        return out

    recs = [
        (int(k), od, (od - epoch).days, int(ck) % 4096)
        for k, od, ck in rows
    ]
    months = sorted({dt.date(od.year, od.month, 1) for _, od, _, _ in recs})

    layouts = {
        "natural_orderkey": sorted(recs, key=lambda r: r[0]),
        "clustered_by_date": sorted(recs, key=lambda r: (r[1], r[0])),
        "clustered_by_custkey": sorted(recs, key=lambda r: (r[3], r[0])),
        "zorder_date_custkey": sorted(recs, key=lambda r: (z(r[2], r[3]), r[0])),
    }
    want = {}
    for layout, ordered in layouts.items():
        pairs = [(od, c) for _, od, _, c in ordered]
        blocks = [pairs[i : i + 512] for i in range(0, len(pairs), 512)]
        m_scan = s_scan = 0
        for blk in blocks:
            ods = [od for od, _ in blk]
            cs = [c for _, c in blk]
            mn_d, mx_d, mn_c, mx_c = min(ods), max(ods), min(cs), max(cs)
            m_scan += sum(
                1 for m0 in months if mn_d <= _month_end(m0) and mx_d >= m0
            )
            s_scan += sum(
                1
                for k in range(16)
                if mn_c <= k * 256 + 255 and mx_c >= k * 256
            )
        nb = len(blocks)
        m_micro = (1_000_000 * m_scan) // (nb * len(months))
        s_micro = (1_000_000 * s_scan) // (nb * 16)
        want[layout] = (nb, m_micro, s_micro, (3 * m_micro + s_micro) // 4)
    best = min(want, key=lambda l: (want[l][3], l))
    got = {
        r["layout"]: r
        for r in QUERIES["q419_layout_advisor"](spark, SF).collect()
    }
    assert set(got) == set(want)
    for layout, (nb, m_micro, s_micro, cost) in want.items():
        r = got[layout]
        assert r["n_blocks"] == nb
        assert r["month_scan_fraction_micro"] == m_micro
        assert r["custkey_scan_fraction_micro"] == s_micro
        assert r["weighted_cost_micro"] == cost
        assert r["weighted_cost"] == cost / 1e6
        assert r["recommended"] == (layout == best)
    assert sum(1 for r in got.values() if r["recommended"]) == 1


def test_kcore_decomposition(spark, con):
    """Peel the co-purchase graph in pure Python — rebuild q97's
    support-filtered edge set from raw lineitem rows, then repeatedly
    remove nodes of degree < 2 with a plain dict — and pin SET
    EQUALITY with q420's survivors plus per-node degrees. Set
    equality checks MAXIMALITY, which q420's in-plan fixed-point
    contract alone cannot (any strict sub-core also satisfies
    degree >= k)."""
    rows = con.execute(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall()
    baskets: dict[int, list[int]] = {}
    for ok_, pk in rows:
        baskets.setdefault(int(ok_), []).append(int(pk))
    from collections import Counter

    support: Counter = Counter()
    for items in baskets.values():
        items = sorted(items)[:32]  # cap_items_per_key, lowest ids win
        for i, a in enumerate(items):
            for b in items[i + 1 :]:
                support[(a, b)] += 1
    adj: dict[int, set[int]] = {}
    for (a, b), s in support.items():
        if s >= 2:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    k = 2
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    got = {
        r["node"]: r["core_degree"]
        for r in QUERIES["q420_kcore_decomposition"](spark, SF).collect()
    }
    want = {n: len(nb) for n, nb in adj.items()}
    assert got == want
    assert all(d >= k for d in got.values())


def test_kcore_operator_edge_cases(spark):
    """The operator itself on adversarial shapes: a path graph has an
    EMPTY 2-core and peels one layer per round (the slow-convergence
    worst case — also proves the empty result is returned, not an
    error); a pendant vertex on two fused triangles is peeled while
    the triangles survive; an insufficient max_rounds fails FAST with
    a ValueError instead of silently returning a superset."""
    from pipeline_usnvc_spark.operators.graph import k_core

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src int, dst int"
    )
    assert k_core(path, 2).count() == 0
    tri2 = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (5, 99)],
        "src int, dst int",
    )
    rows = {r["node"]: r["core_degree"] for r in k_core(tri2, 2).collect()}
    assert rows == {1: 2, 2: 2, 3: 4, 4: 2, 5: 2}
    with pytest.raises(ValueError, match="max_rounds"):
        k_core(path, 2, max_rounds=2)
    # exactly-at-the-bound convergence must SUCCEED: P10 with k=2
    # peels one layer from each end per round (5 peeling rounds), and
    # max_rounds bounds the peels, not the final observing pass
    assert k_core(path, 2, max_rounds=5).count() == 0


def test_kcore_contract_fires_on_corruption(spark, monkeypatch):
    """q420's executed fixed-point contract must TRIP when the core
    result is corrupted — BOTH failure modes: a phantom node (never in
    the graph — trips the existence branch) and a degree-inflated real
    survivor (trips the core_degree == d_indep recount branch, which a
    phantom alone never exercises)."""
    from pyspark.sql import functions as F

    import pipeline_usnvc_spark.operators.graph as graph_mod

    real = graph_mod.k_core

    def phantom_node(edges, k, **kw):
        good = real(edges, k, **kw)
        extra = good.sparkSession.createDataFrame(
            [(-12345, 99)], "node long, core_degree long"
        )
        return good.unionByName(extra)

    def inflated_degree(edges, k, **kw):
        return real(edges, k, **kw).withColumn(
            "core_degree", F.col("core_degree") + 1
        )

    for corrupted in (phantom_node, inflated_degree):
        monkeypatch.setattr(graph_mod, "k_core", corrupted)
        with pytest.raises(Exception, match="fixed-point violation"):
            QUERIES["q420_kcore_decomposition"](spark, SF).collect()
    monkeypatch.setattr(graph_mod, "k_core", real)


def test_mannwhitney_randomization(spark, con):
    """q421 re-derived in pure Python: mid-ranks from a literal sorted
    scan of raw (n_chars, lang) rows, each of the 32 md5-parity
    relabelings re-split row by row, the tie-corrected z recomputed
    with math.sqrt, and the p-value as a literal count — a formula bug
    shared by both engines still fails here."""
    import hashlib
    import math

    rows = con.execute("SELECT doc_id, n_chars, lang FROM documents").fetchall()
    # doubled mid-ranks per value (label-independent)
    by_v: dict[int, int] = {}
    for _did, v, _lang in rows:
        by_v[v] = by_v.get(v, 0) + 1
    r2x: dict[int, int] = {}
    before = 0
    for v in sorted(by_v):
        r2x[v] = 2 * before + by_v[v] + 1
        before += by_v[v]
    nt = len(rows)
    ties = sum(c**3 - c for c in by_v.values())

    def z_of(n1: int, r1x2: int) -> float | None:
        n2 = nt - n1
        if n1 <= 0 or n2 <= 0 or nt <= 1 or (nt + 1) * nt * (nt - 1) <= ties:
            return None
        sigma2 = n1 * n2 / 12.0 * ((nt + 1) - ties / (nt * (nt - 1)))
        return (r1x2 - n1 * (n1 + 1) - n1 * n2) / (2.0 * math.sqrt(sigma2))

    n1_obs = sum(1 for _d, _v, lang in rows if lang == "en")
    r1x2_obs = sum(r2x[v] for _d, v, lang in rows if lang == "en")
    z_obs = z_of(n1_obs, r1x2_obs)
    assert z_obs is not None

    def in_a(doc_id: int, k: int) -> bool:
        h = hashlib.md5(f"{doc_id}:{k}".encode()).hexdigest()[:8]
        return int(h, 16) % 2 == 0

    n_extreme = n_valid = 0
    for k in range(32):
        n1k = sum(1 for did, _v, _l in rows if in_a(did, k))
        r1x2k = sum(r2x[v] for did, v, _l in rows if in_a(did, k))
        zk = z_of(n1k, r1x2k)
        if zk is not None:
            n_valid += 1
            if abs(zk) >= abs(z_obs):
                n_extreme += 1

    got = QUERIES["q421_mannwhitney_randomization"](spark, SF).collect()
    assert len(got) == 1
    row = got[0]
    assert row["n_samples"] == 32
    assert row["n_valid"] == n_valid
    assert row["n_extreme"] == n_extreme
    assert row["z_obs"] == pytest.approx(z_obs, abs=5e-7)
    assert row["p_value"] == pytest.approx((1 + n_extreme) / (1 + n_valid), abs=1e-12)


def test_recluster_advisor(spark, con):
    """q422 re-derived in pure Python: blocks built by literal sorted
    slicing (base by (od, key), delta appended in key order, rebuild
    over everything), the month workload costed as an explicit
    interval test per block x month, and the gain/recommendation
    recomputed from those counts."""
    rows = con.execute(
        "SELECT o_orderkey, CAST(o_orderdate AS DATE) FROM orders"
    ).fetchall()

    def blocks_of(rs, keyfn):
        srt = sorted(rs, key=keyfn)
        out = []
        for i in range(0, len(srt), 512):
            chunk = [d for _k, d in (
                (keyfn(r), r[1]) for r in srt[i : i + 512]
            )]
            out.append((min(chunk), max(chunk)))
        return out

    base = [r for r in rows if r[0] % 10 != 0]
    delta = [r for r in rows if r[0] % 10 == 0]
    incr = blocks_of(base, lambda r: (r[1], r[0])) + blocks_of(delta, lambda r: r[0])
    recl = blocks_of(rows, lambda r: (r[1], r[0]))
    months = sorted({dt.date(d.year, d.month, 1) for _k, d in rows})
    spans = [(m, _month_end(m)) for m in months]

    def cost(blks):
        scanned = sum(
            1 for mn, mx in blks for m0, m1 in spans if mn <= m1 and mx >= m0
        )
        micro = (1_000_000 * scanned) // (len(blks) * len(spans))
        return scanned, micro

    sc_i, mi_i = cost(incr)
    sc_r, mi_r = cost(recl)
    got = {r["state"]: r for r in QUERIES["q422_recluster_advisor"](spark, SF).collect()}
    a, b = got["clustered_plus_appends"], got["reclustered_full"]
    assert (a["n_blocks"], a["scanned_block_months"], a["scan_fraction_micro"]) == (
        len(incr), sc_i, mi_i,
    )
    assert (b["n_blocks"], b["scanned_block_months"], b["scan_fraction_micro"]) == (
        len(recl), sc_r, mi_r,
    )
    assert a["n_months"] == b["n_months"] == len(spans)
    assert a["recluster_gain_micro"] == b["recluster_gain_micro"] == mi_i - mi_r
    assert a["recommend_recluster"] == ((mi_i - mi_r) >= 50_000)


def test_deletion_aware_recluster(spark, con):
    """q423 re-derived in pure Python: the TTL liveness flag applied
    row by row, blocks built by literal sorted slicing (stale stats
    over ALL rows, the rewrite over live rows only), the month
    workload costed as an explicit interval test, and every decision
    column (vacuum set, dead mass, gain, recommendation) recomputed
    from those counts."""
    rows = con.execute(
        "SELECT o_orderkey, CAST(o_orderdate AS DATE) FROM orders"
    ).fetchall()
    cutoff = dt.date(1997, 1, 1)

    def blocks_of(rs, keyfn, live_only=False):
        srt = sorted(rs, key=keyfn)
        if live_only:
            srt = [r for r in srt if r[1] >= cutoff]
        out = []
        for i in range(0, len(srt), 512):
            chunk = srt[i : i + 512]
            ds = [d for _k, d in chunk]
            n_live = sum(1 for _k, d in chunk if d >= cutoff)
            out.append((min(ds), max(ds), len(chunk), n_live))
        return out

    base = [r for r in rows if r[0] % 10 != 0]
    delta = [r for r in rows if r[0] % 10 == 0]
    stale = blocks_of(base, lambda r: (r[1], r[0])) + blocks_of(delta, lambda r: r[0])
    live_sorted = sorted(
        [r for r in rows if r[1] >= cutoff], key=lambda r: (r[1], r[0])
    )
    rewritten = []
    for i in range(0, len(live_sorted), 512):
        chunk = live_sorted[i : i + 512]
        ds = [d for _k, d in chunk]
        rewritten.append((min(ds), max(ds), len(chunk), len(chunk)))

    months = sorted({dt.date(d.year, d.month, 1) for _k, d in rows})
    spans = [(m, _month_end(m)) for m in months]

    def cost(blks):
        scanned = sum(
            1 for mn, mx, _n, _l in blks for m0, m1 in spans if mn <= m1 and mx >= m0
        )
        return scanned, (1_000_000 * scanned) // (len(blks) * len(spans))

    sc_s, mi_s = cost(stale)
    sc_r, mi_r = cost(rewritten)
    dead = sum(1 for _k, d in rows if d < cutoff)
    dead_micro = (1_000_000 * dead) // len(rows)
    vac_s = sum(1 for _mn, _mx, _n, nl in stale if nl == 0)

    got = {
        r["state"]: r
        for r in QUERIES["q423_deletion_aware_recluster"](spark, SF).collect()
    }
    a, b = got["stale_composite"], got["rewritten_live"]
    assert (a["n_blocks"], a["scanned_block_months"], a["scan_fraction_micro"]) == (
        len(stale), sc_s, mi_s,
    )
    assert (b["n_blocks"], b["scanned_block_months"], b["scan_fraction_micro"]) == (
        len(rewritten), sc_r, mi_r,
    )
    assert a["n_vacuum_blocks"] == vac_s and b["n_vacuum_blocks"] == 0
    assert a["dead_rows"] == b["dead_rows"] == dead
    assert a["dead_fraction_micro"] == dead_micro
    assert a["rewrite_gain_micro"] == mi_s - mi_r
    assert a["recommend_rewrite"] == (
        (mi_s - mi_r) >= 50_000 or dead_micro >= 250_000
    )
