"""Per-turn numeric feature extraction over transcript tables.

Features are plain Catalyst expressions (JVM-side, codegen'd) — the sketch
layer only ever sees a numeric column. Input shape per BASELINE.json:
(conv_id string, turn_idx int, role string, text string, tool string, ts timestamp).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["text_len", "with_text_len", "with_inter_turn_latency"]


def text_len(col: str = "text") -> Column:
    """Character length of the turn text (the reference's canonical feature)."""
    return F.length(F.col(col)).cast("double")


def with_text_len(df: DataFrame, col: str = "text", out: str = "text_len") -> DataFrame:
    return df.withColumn(out, text_len(col))


def with_inter_turn_latency(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    out: str = "latency_s",
) -> DataFrame:
    """Seconds between consecutive turns of a conversation.

    Window is partitioned by conv_id — one conversation's turns are tiny, so
    no skew risk; the shuffle is by conv_id only and AQE coalesces it.
    First turn of each conversation gets NULL (dropped by the sketch layer).
    """
    w = Window.partitionBy(conv_col).orderBy(order_col)
    prev = F.lag(F.col(ts_col)).over(w)
    return df.withColumn(
        out,
        (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)).cast("double") / 1e6,
    )
