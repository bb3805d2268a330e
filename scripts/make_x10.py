#!/usr/bin/env python
"""Materialize an id-shifted x10 replication of a test-data SF dir
(VERDICT r13 item 2: the 8c/32c probe at sf0.1 measures overhead, not
scaling — every query was FASTER on 8 cores, so parallelism claims
need a data size where compute is visible).

Replication is the scale-gate's id-shifted self-union shape, written
to parquet so bench.py can point $SPARK_GRAFT_SF_DIR at it: every
id-like key column shifts by replica*OFFSET consistently across
tables (o_orderkey and l_orderkey shift together, etc.), so joins
keep their selectivity instead of degenerating. Dimension tables
(region, nation) stay fixed — their keys are NOT shifted anywhere.

    python scripts/make_x10.py [src_sf_dir] [dst_dir] [mult]

Default: /root/testdata/sf0.1 -> /root/sfx10, x10. The destination
deliberately lives OUTSIDE /root/testdata: the replica's shifted ids
violate oracle-side invariants that tests assert over every
/root/testdata/sf* dir (e.g. q141's event_id < 1e7 bound), and this
data exists only for the bench's core-count scaling probe — it is
never oracle-compared.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

OFFSET = 10**9  # > every key in the source tables

# key columns to shift per table; all other columns copy through
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation"]


def main() -> None:
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
    dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/sfx10")
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in COPY:
        shutil.copyfile(src / f"{t}.parquet", dst / f"{t}.parquet")
        print(f"copied {t}")
    for t, keys in SHIFT.items():
        cols_parts = []
        names = [f.name for f in pq.read_schema(src / f"{t}.parquet")]
        for c in names:
            if c in keys:
                cols_parts.append(f"{c} + r.r * {OFFSET} AS {c}")
            else:
                cols_parts.append(c)
        # Row-group sizing: real at-scale inputs arrive with MANY row
        # groups (that is where scan parallelism comes from — see
        # operators/checkpoint.fan_out). Target ~64 groups per table so
        # the probe measures the ENGINE's scaling, not a single-row-
        # group artifact of this generator.
        n_src = pq.read_metadata(src / f"{t}.parquet").num_rows
        rg = max(1000, (n_src * mult) // 64)
        sql = f"""
        COPY (
            SELECT {", ".join(cols_parts)}
            FROM read_parquet('{src}/{t}.parquet')
            CROSS JOIN (SELECT unnest(range({mult})) AS r) r
        ) TO '{dst}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {rg})
        """
        con.execute(sql)
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"wrote {t}: {n} rows")


if __name__ == "__main__":
    main()
