"""Sub-record nesting (reference J10/A2).

The reference attaches related records to each unit with an O(n)
filter per output row (``df.loc[df.key == id].to_dict('records')``,
usnvc/usnvc.py:318-322, 371-387, 456-470). The set-based rewrite is
ONE aggregation per related table:

    groupBy(key).agg(collect_list(struct(...))) → left join to units

which shuffles each related table once on the key instead of scanning
it once per unit. ``collect_list`` order is partition-dependent, so a
deterministic ``order_by`` tiebreaker is imposed via sort_array over
a (sortkey, payload) struct (SURVEY §7.4.7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def nest_records(
    df: DataFrame,
    key: str,
    payload: list[Column] | list[str],
    order_by: str | None = None,
    out_col: str = "records",
) -> DataFrame:
    """(key, array<struct<payload>>) with deterministic in-array order."""
    payload_cols = [F.col(c) if isinstance(c, str) else c for c in payload]
    if order_by is None:
        agg = F.collect_list(F.struct(*payload_cols))
    else:
        # Sort by the tiebreaker embedded at position 0, then strip it.
        wrapped = F.collect_list(F.struct(F.col(order_by).alias("_ord"), F.struct(*payload_cols).alias("_p")))
        agg = F.transform(F.sort_array(wrapped), lambda s: s["_p"])
    return df.groupBy(key).agg(agg.alias(out_col))


def attach_nested(
    base: DataFrame,
    related: DataFrame,
    key: str,
    payload: list[Column] | list[str],
    order_by: str | None = None,
    out_col: str = "records",
    empty_as_null: bool = True,
) -> DataFrame:
    """Left-join nested sub-records onto a base table.

    ``empty_as_null=True`` reproduces the reference's row-existence
    guard (``if len(df.index) > 0``, usnvc.py:320): units with no
    related rows carry null (key absent in the JSON sink) rather than
    an empty array.
    """
    nested = nest_records(related, key, payload, order_by, out_col)
    out = base.join(nested, key, "left")
    if not empty_as_null:
        out = out.withColumn(out_col, F.coalesce(F.col(out_col), F.array().cast(nested.schema[out_col].dataType)))
    return out
