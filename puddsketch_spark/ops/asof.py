"""As-of (point-in-time) join — a relational operator Spark lacks natively.

For every left row, attach the single right row with the greatest event
time <= the left row's time (``direction="backward"``, inclusive; forward =
smallest >=), optionally within a tolerance, matched per key group. The
standard operator for joining measurements to the most recent state
(events to last order, trades to last quote, turns to last tool result).

Spark-first plan (no range-join explosion, no per-row Python):
  1. union the two sides into one relation tagged by side, right-side
     payload packed into ONE struct column (so a match is always a single
     consistent right row, never a column-wise mix),
  2. one window over (partitionBy=by, orderBy=(time, side)) takes
     ``last(struct, ignorenulls=True)`` — each left row sees the most
     recent right struct at or before it,
  3. filter back to left rows and unpack.
Cost: ONE hash shuffle of both sides on the by-key + a per-partition sort —
the same cost as any keyed window, independent of time-range overlap. A
naive range join is |L|x|R| per key; this is |L|+|R| log(|L|+|R|).
DuckDB's native ASOF JOIN provides the oracle in the driver suite.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    right_on: str | None = None,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row, plus the nearest right row's columns
    (NULL where no right row qualifies).

    ``on`` / ``right_on``: orderable time/sequence columns (same type).
    ``by``: equality keys (the join is per group; empty = global).
    ``direction``: "backward" (greatest right ``on`` <= left, inclusive) or
    "forward" (smallest right ``on`` >= left, inclusive).
    ``tolerance``: optional max |left.on - right.on| as a Column-compatible
    literal (e.g. ``F.expr("INTERVAL 1 HOUR")`` for timestamps, or a number
    for numeric ``on``); matches farther than this become NULL.
    Right payload columns arrive as ``<name><suffix>`` when the name clashes
    with a left column, unchanged otherwise; the right time column always
    arrives as ``<right_on><suffix>``.
    Left rows with a NULL ``on`` time never match (NULL right columns).

    SCALE WARNING — ``by=()``: with no equality keys the single global
    window puts BOTH relations in ONE partition on ONE executor (Spark
    keyless-window semantics). Fine for a small dimension-style right side
    joined to a modest left; at cluster scale always pass ``by`` keys so
    the sort-shuffle spreads across executors. A runtime warning is issued
    on every keyless call.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if not by:
        import warnings

        warnings.warn(
            "asof_join(by=()) executes as a SINGLE-PARTITION global window "
            "(both inputs sort on one executor); pass `by` keys for "
            "cluster-scale inputs",
            stacklevel=2,
        )
    right_on = right_on or on
    by = list(by)
    payload_cols = [c for c in right.columns if c not in by]
    if not payload_cols:
        raise ValueError("right side has no payload columns")
    out_names = {
        c: (c + suffix) if (c in left.columns or c == right_on) else c
        for c in payload_cols
    }

    # one relation, right rows first at ties so "inclusive" works
    packed = F.struct(*[F.col(c) for c in payload_cols]).alias("__asof")
    r = right.where(F.col(right_on).isNotNull()).select(
        *[F.col(c) for c in by],
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__side"),
        packed,
    )
    l = left.select(  # noqa: E741
        "*",
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__asof"].dataType).alias("__asof"),
    )
    l_sel = l.select(
        *[F.col(c) for c in by],
        "__t",
        "__side",
        "__asof",
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    left_struct_t = l_sel.schema["__left"].dataType
    unioned = l_sel.unionByName(
        r.select(
            *by, "__t", "__side", "__asof",
            F.lit(None).cast(left_struct_t).alias("__left"),
        )
    )

    # NULL left times must see no right rows in EITHER direction: asc
    # defaults to nulls-first (correct), but desc defaults to nulls-LAST,
    # which would hand a NULL-time left row the running last() struct —
    # i.e. a fabricated match — so the forward order pins nulls first too.
    order = [F.col("__t").asc_nulls_first(), F.col("__side").asc()]
    if direction == "forward":
        order = [F.col("__t").desc_nulls_first(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn("__m", F.last("__asof", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )

    m = F.col("__m")
    if tolerance is not None:
        gap = (
            (F.col("__t") - m[right_on])
            if direction == "backward"
            else (m[right_on] - F.col("__t"))
        )
        matched = matched.withColumn(
            "__m", F.when(m.isNotNull() & (gap <= tolerance), m)
        )
        m = F.col("__m")

    return matched.select(
        *[F.col("__left")[c].alias(c) for c in left.columns],
        *[m[c].alias(out_names[c]) for c in payload_cols],
    )
