"""Sessionization: split per-key event streams into sessions at inactivity
gaps — the standard pre-processing step for behavioral/transcript data
(turn streams into conversations, events into visits).

Pure Catalyst (two stacked window functions over ONE keyed sort):
  new_session = ts - lag(ts) > gap (or first event)
  session_seq = running sum of new_session markers
Cost: one hash shuffle on the key + a per-partition sort — the same shape
as any keyed window; no UDF, stays inside whole-stage codegen. Hot keys are
bounded by per-user event counts (billions of users, thousands of events
each), so the window partition never explodes the way a global sort would.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["sessionize", "session_stats"]


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    by: Sequence[str] = ("user_id",),
    gap: Column | str = "INTERVAL 30 MINUTES",
) -> DataFrame:
    """Adds ``session_seq`` (0-based per key) to ``df``.

    ``gap``: maximum inactivity inside one session — an interval SQL string
    (timestamp ``ts_col``) or a Column/number (numeric ``ts_col``). A new
    session starts at the first event and whenever ts - previous ts > gap.
    """
    if isinstance(gap, str):
        gap = F.expr(gap)
    w = Window.partitionBy(*by).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_s = (prev.isNull() | ((F.col(ts_col) - prev) > gap)).cast("long")
    run = (
        Window.partitionBy(*by)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("session_seq", F.sum(new_s).over(run) - 1)


def session_stats(
    df: DataFrame,
    ts_col: str = "ts",
    by: Sequence[str] = ("user_id",),
    gap: Column | str = "INTERVAL 30 MINUTES",
) -> DataFrame:
    """One row per session: DataFrame[by..., session_seq, n_events,
    start_ts, end_ts, dur_us]. The aggregation reuses the sessionize
    shuffle (same partitioning key prefix, Catalyst collapses the
    exchanges)."""
    s = sessionize(df, ts_col=ts_col, by=by, gap=gap)
    return s.groupBy(*by, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        F.expr(
            f"timestampdiff(MICROSECOND, min({ts_col}), max({ts_col}))"
        ).alias("dur_us")
        if dict(df.dtypes)[ts_col].startswith("timestamp")
        else (F.max(ts_col) - F.min(ts_col)).alias("dur_us"),
    )
