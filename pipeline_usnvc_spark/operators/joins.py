"""Join helpers (reference J1-J9).

Every reference join is a single-key equi-join against either a 1:1
description table or a tiny code dimension (reference usnvc/usnvc.py:
117-120, 132-133, 174-179, 200-207). The scale rule encoded here:
dimension sides get an explicit ``broadcast()`` hint — at 100 TB the
fact side never shuffles for a dim decode; only fact-to-fact joins
(unit⟕description analog) shuffle on the join key, and AQE handles
skew splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decode_dimension(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    how: str = "left",
    rename: dict[str, str] | None = None,
) -> DataFrame:
    """Join a fact to a code/dimension table, broadcasting the dim.

    CONTRACT: ``dim`` must be a genuinely bounded code/description
    table (the reference's tiny d_* dimensions, nation/region) — never
    an SF-scaling table; use star_join (no hint) for those.

    ``rename`` pre-renames dim columns (the reference's
    ``D_CLASSIF_CONFIDENCE_ID`` → ``classif_confidence_id`` step,
    usnvc.py:115-116). When ``dim_key`` differs from ``fact_key`` the
    join is on an expression so both key spellings survive in the
    output, matching pandas merge-on-differently-named-keys behavior
    (SURVEY §7.4.4).
    """
    if rename:
        for old, new in rename.items():
            dim = dim.withColumnRenamed(old, new)
    if dim_key is None or dim_key == fact_key:
        return fact.join(F.broadcast(dim), fact_key, how)
    cond = fact[fact_key] == dim[dim_key]
    return fact.join(F.broadcast(dim), cond, how)


def star_join(
    fact: DataFrame,
    dims: list[tuple[DataFrame, str]],
    how: str = "inner",
) -> DataFrame:
    """Chain of dimension equi-joins (reference J4-J9 pattern).

    No forced broadcast hint: star_join's callers pass SF-SCALING
    tables (q10 joins part and supplier), and a hard F.broadcast on a
    table that grows with the data is a driver OOM at 100 TB — the
    size-threshold/AQE planner broadcasts them at bench scale and
    correctly refuses at cluster scale (the same rule the r09 sweep
    applied to the TPC-H dim hints). decode_dimension keeps its hint
    because its contract is genuinely bounded code tables.
    """
    out = fact
    for dim, key in dims:
        out = out.join(dim, key, how)
    return out
