"""As-of join via the union + ordered-window rewrite.

Spark has no native as-of join (SURVEY §2.3 — the reference has none
either); the scale-path formulation used throughout this repo is:
tag both sides, union them onto one (key, time) axis, and carry the
right side's payload across left rows with ONE
``last``/``first``-ignoring-nulls over a key-partitioned time-ordered
window. One shuffle on the key, zero range fan-out — measured 83 s →
~2 s vs the naive range join at 10M events (ROADMAP round 3, q201).

q42 (backward inclusive), q151 (forward strict) and
q201 (backward strict) all consume this helper — the round-10 review
found three drifting inline copies of the same subtle construction
(side-flag direction, null-typed padding, tie order, last-vs-first),
the exact drift class ``with_session_idx`` was extracted for in r4.

Boundary/tie semantics, encoded ONCE here:

- side flag: at equal time, right rows must sort BEFORE the left row
  exactly when they should be visible to it — (backward, inclusive)
  and (forward, strict) — and AFTER it otherwise.
- tie among right rows at equal time: ``tie_col`` ASCENDING, so
  backward's ``last()`` resolves to the LARGEST tie key and forward's
  ``first()`` to the SMALLEST — matching the DESC,DESC / ASC,ASC
  row_number oracles.
- payloads are packed into ONE struct before the window so a
  multi-column attach is row-atomic (two separate ignore-nulls
  aggregates could in principle resolve to different rows if a
  payload column were null on a right row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_attach(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payloads: list[str],
    *,
    direction: str = "backward",
    strict: bool = False,
    tie_col: str | None = None,
) -> DataFrame:
    """Attach to every LEFT row the ``payloads`` of its as-of-matching
    RIGHT row (or typed NULLs when none matches).

    direction="backward": match the latest right row at-or-before
    (strict=False) / strictly-before (strict=True) the left time.
    direction="forward": the earliest right row at-or-after /
    strictly-after. ``tie_col`` breaks equal-time ties among right
    rows (largest wins backward, smallest forward); it defaults to
    the first payload column. Payload columns must be non-null on
    right rows (the struct pack makes multi-column attach atomic,
    but a NULL struct member cannot be told apart from padding).

    Returns all ``left`` columns plus one ``asof_<name>`` column per
    payload. ``left`` must not already contain those names.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    tie_col = tie_col or payloads[0]
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    carry = [c for c in left.columns if c != key]

    right_first = (direction == "backward") != strict
    right_flag, left_flag = (0, 1) if right_first else (1, 0)

    pay_struct = F.struct(*[F.col(p).alias(p) for p in payloads])
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_t"),
        F.lit(right_flag).alias("_side"),
        F.col(tie_col).alias("_tie"),
        pay_struct.alias("_pay"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in carry],
    )
    null_pay = F.lit(None).cast(
        "struct<" + ",".join(f"{p}:{rtypes[p].simpleString()}" for p in payloads) + ">"
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_t"),
        F.lit(left_flag).alias("_side"),
        F.lit(None).cast(rtypes[tie_col]).alias("_tie"),
        null_pay.alias("_pay"),
        *carry,
    )
    w = Window.partitionBy(key).orderBy("_t", "_side", "_tie")
    if direction == "backward":
        frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        matched = F.last("_pay", ignorenulls=True).over(frame)
    else:
        frame = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        matched = F.first("_pay", ignorenulls=True).over(frame)
    merged = r.unionByName(l).withColumn("_match", matched)
    return merged.filter(F.col("_side") == left_flag).select(
        key,
        *carry,
        *[F.col("_match")[p].alias(f"asof_{p}") for p in payloads],
    )
