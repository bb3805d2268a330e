"""Layout sinks: disjoint per-file ranges (the min-max pruning
contract) and small-file compaction."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from pipeline_usnvc_spark.operators.layout import (
    compact_small_files,
    directory_bytes,
    write_range_sorted,
)
from pipeline_usnvc_spark.sources.tables import load_table


def _file_ranges(path: str, col: str) -> list[tuple]:
    """Per-file (min, max) of ``col`` from parquet row-group stats."""
    ranges = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            assert st is not None and st.has_min_max, "stats missing"
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    return ranges


def test_range_sorted_files_are_disjoint_and_sorted(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_date")
    orders = load_table(spark, sf_dir, "orders")
    write_range_sorted(
        orders, out, ["o_orderdate"], sort_cols=["o_orderkey"], num_ranges=6
    )

    ranges = [r for r in _file_ranges(out, "o_orderdate")]
    assert len(ranges) >= 2
    # Pairwise disjoint file ranges: every file's max <= next file's
    # min means a date predicate prunes to the files whose range
    # covers it — the whole point of the layout.
    ordered = sorted(ranges)
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ordered, ordered[1:]):
        assert hi_a <= lo_b

    # Within a file, rows are sorted by (o_orderdate, o_orderkey).
    one = sorted(glob.glob(os.path.join(out, "*.parquet")))[0]
    t = pq.read_table(one, columns=["o_orderdate", "o_orderkey"]).to_pandas()
    keyed = list(zip(t["o_orderdate"], t["o_orderkey"]))
    assert keyed == sorted(keyed)

    # Round trip is lossless.
    assert spark.read.parquet(out).count() == orders.count()


def test_pruning_reads_only_matching_ranges(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_pruned")
    orders = load_table(spark, sf_dir, "orders")
    write_range_sorted(orders, out, ["o_orderdate"], num_ranges=6)
    ranges = _file_ranges(out, "o_orderdate")
    cutoff = sorted(ranges)[0][1]  # first file's max date
    matching = [r for r in ranges if r[0] <= cutoff]
    # The predicate's candidate set (by file stats) is a strict subset
    # of files — a stats-aware reader skips the rest.
    assert 0 < len(matching) < len(ranges)
    expect = orders.filter(f"o_orderdate <= '{cutoff}'").count()
    assert spark.read.parquet(out).filter(f"o_orderdate <= '{cutoff}'").count() == expect


def test_compact_small_files(spark, sf_dir, tmp_path):
    small = str(tmp_path / "small")
    compacted = str(tmp_path / "compacted")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(32).write.mode("overwrite").parquet(small)
    n_small = len(glob.glob(os.path.join(small, "*.parquet")))
    assert n_small >= 32

    total = directory_bytes(spark, small)
    n_out = compact_small_files(spark, small, compacted, target_file_bytes=total // 2)
    n_files = len(glob.glob(os.path.join(compacted, "*.parquet")))
    assert n_files == n_out <= 3
    assert spark.read.parquet(compacted).count() == orders.count()
