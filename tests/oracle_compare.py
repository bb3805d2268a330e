"""Strict Spark-vs-DuckDB result comparison.

Mirrors the driver's t2 gate (row count + schema + order-insensitive
value hash) but stricter where it matters: float cells must be
EXACTLY equal — the engine's oracle-paired queries are designed for
IEEE-identical arithmetic, so any drift is a real portability bug,
not noise to tolerate.
"""

from __future__ import annotations

import math
from datetime import datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from pipeline_usnvc_spark.sources.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _canon_val(v):
    # Numeric values carry a kind tag so an integer column on one side
    # can never compare equal to a float column on the other: DuckDB
    # widens sum(BIGINT) to HUGEINT, fetchdf() coerces that to float64,
    # and Python's `3 == 3.0` would silently hide the type divergence
    # that the driver's stricter hasher rejects (VERDICT r02 item 2).
    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, np.floating):
        v = float(v)
        return None if math.isnan(v) else ("f", v)
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, Decimal):
        return ("f", float(v))
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return None
        dt = v.to_pydatetime()
        return dt.replace(tzinfo=None)
    if isinstance(v, np.datetime64):
        return pd.Timestamp(v).to_pydatetime().replace(tzinfo=None)
    if isinstance(v, np.ndarray):
        return tuple(_canon_val(x) for x in v)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_val(x) for x in v)
    return v


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(_canon_val(v) for v in t) for t in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def assert_frames_match(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str) -> None:
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} vs {len(oracle_df)}"
    )
    s_rows = canon_rows(spark_df)
    o_rows = canon_rows(oracle_df)
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        assert a == b, f"{name}: first differing row #{i}:\n  spark : {a}\n  oracle: {b}"
