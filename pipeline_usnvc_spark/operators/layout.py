"""Data-layout sinks: range-sorted parquet and small-file compaction.

At 100 TB the dominant query cost is the scan, and the scan cost is
set by LAYOUT, not by the query: parquet keeps per-row-group min/max
stats, so a table written range-partitioned and sorted on its filter
column lets the reader skip every file/row-group whose range misses
the predicate. These two sinks are the write-side half of predicate
pushdown:

  write_range_sorted — global range partitioning (repartitionByRange
      samples the key distribution, so skew produces balanced ranges,
      unlike hash-mod buckets) + sortWithinPartitions. Result: files
      with pairwise-disjoint key ranges and sorted row groups —
      min/max pruning is maximally selective and the sort also makes
      downstream merge-joins and as-of lookups cheap.
  compact_small_files — bin-pack a directory of small files into
      ~target-sized outputs. Streaming/foreachBatch sinks accrete
      tiny files; a million 1 MB files costs more in scheduler and
      open() overhead than the data itself. Size is measured through
      Hadoop's FileSystem so it works on any supported scheme, not
      just file://.

The reference's only sink is one JSON file per document
(usnvc.py:560-571) — the small-file problem at its theoretical
maximum; this module is the scale-correct replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_range_sorted(
    df: DataFrame,
    path: str,
    range_cols: list[str],
    sort_cols: list[str] | None = None,
    num_ranges: int = 8,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as parquet with disjoint per-file key ranges.

    ``sort_cols`` extends the within-file ordering beyond the range
    key (e.g., range by date, sort by (date, key) for unique order).
    """
    out = df.repartitionByRange(num_ranges, *[F.col(c) for c in range_cols])
    order = [F.col(c) for c in (range_cols + (sort_cols or []))]
    out = out.sortWithinPartitions(*order)
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def directory_bytes(spark: SparkSession, path: str) -> int:
    """Total data bytes under ``path`` via Hadoop FileSystem (works on
    any configured scheme, not just local paths)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return int(fs.getContentSummary(hpath).getLength())


def compact_small_files(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite ``in_path`` parquet into ceil(size/target) files at
    ``out_path``; returns the output file count. Uses coalesce (no
    shuffle) — compaction only narrows partitioning, and preserving
    existing per-file ordering is exactly what we want."""
    total = directory_bytes(spark, in_path)
    n = max(1, -(-total // target_file_bytes))
    spark.read.parquet(in_path).coalesce(n).write.mode("overwrite").parquet(out_path)
    return n


def zorder_key(*cols, bits: int = 16):
    """Z-order (Morton) interleave of N integer columns into one
    BIGINT clustering key, built from native bit expressions (no UDF).

    Writing parquet sorted by this key co-locates rows that are close
    in EVERY dimension, so min/max row-group statistics prune
    multi-dimensional range predicates — the standard layout trick
    (Delta OPTIMIZE ZORDER, Iceberg sort orders) for tables queried by
    more than one column. ``bits`` per dimension (default 16) bounds
    the key to dims*bits <= 63.

    Columns must already be non-negative ints of < 2^bits (rank or
    bucket them first — ``with_global_rank`` or width-bucketing both
    work; at 100 TB compute per-column quantile cut points and bucket
    to 2^bits codes so the curve is density-balanced).
    """
    from pyspark.sql import functions as F

    ncols = len(cols)
    if ncols * bits > 63:
        raise ValueError(f"{ncols} dims x {bits} bits exceeds a signed 64-bit key")
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cols):
            col = F.col(c) if isinstance(c, str) else c
            bit = F.shiftright(col.cast("bigint"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * ncols + i))
    return z


def write_zordered(
    df,
    out_path: str,
    *cols,
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Parquet sink clustered on the Z-order key of ``cols``:
    range-partition by the key (disjoint per-file key ranges), sort
    within each file, drop the key column from the payload."""
    from pyspark.sql import functions as F

    keyed = df.withColumn("_z", zorder_key(*cols, bits=bits))
    (
        keyed.repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def quantile_codes(df, col, bits: int = 16, code_col: str | None = None):
    """Replace ``col`` with a density-balanced integer code in
    [0, 2^bits): equal-POPULATION buckets from the exact global rank
    (two-phase, no single-task sort). Skewed dimensions fed raw into
    ``zorder_key`` waste most of the curve on empty key space; coding
    by quantile first gives every curve cell the same row density, so
    Z-ordered files stay balanced whatever the distribution.
    Deterministic given a prior total order on (col, tiebreak omitted:
    equal values may split across adjacent codes, which cannot unbalance
    buckets by more than the tie count).
    """
    from pyspark.sql import functions as F

    from pipeline_usnvc_spark.operators.rank import with_global_rank

    code_col = code_col or f"{col}_code"
    ranked = with_global_rank(df, col, rank_col="_qr")
    total = ranked.groupBy().agg(F.max("_qr").alias("_qn"))
    return (
        ranked.join(F.broadcast(total))
        .withColumn(code_col, F.expr(f"(_qr - 1) * {1 << bits} div _qn").cast("int"))
        .drop("_qr", "_qn")
    )
