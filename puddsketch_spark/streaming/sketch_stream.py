"""Structured Streaming sketch aggregation.

The reference is one-pass/streaming algorithmically (bounded memory, single
scan, mergeable summaries) but has no streaming runtime (SURVEY.md §2.2);
here the same UDDSketch kernel drops into `applyInPandasWithState`: the
sketch state IS the stream state — fixed-size, mergeable across triggers,
resumable via Spark's checkpointLocation.

Per trigger and group: deserialize prior state -> vectorized update with the
micro-batch's rows -> emit (group, quantiles, n, buckets, collapses) -> store
new state. Late data needs no special handling (updates commute); watermarks
only bound state retention for expiring groups.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..core.uddsketch import UDDSketch

__all__ = ["udds_state_update", "streaming_udds_quantiles", "streaming_sketch"]


def _group_fields(stream_df: DataFrame, group_cols: Sequence[str]):
    """Take group-column types from the input schema — hardcoding StringType
    breaks numeric/timestamp group keys at the first trigger."""
    by_name = {f.name: f for f in stream_df.schema.fields}
    return [by_name[c] for c in group_cols]


def _output_schema(stream_df: DataFrame, group_cols: Sequence[str], qs: Sequence[float]) -> StructType:
    return StructType(
        _group_fields(stream_df, group_cols)
        + [StructField(f"p{str(q).replace('.', '_')}", DoubleType(), True) for q in qs]
        + [
            StructField("n", LongType(), False),
            StructField("buckets", IntegerType(), False),
            StructField("collapses", IntegerType(), False),
        ]
    )


_STATE_SCHEMA = StructType([StructField("blob", BinaryType(), True)])


def udds_state_update(
    group_cols: Sequence[str],
    value_col: str,
    qs: Sequence[float],
    alpha: float = 0.01,
    m: int = 200,
):
    """Build the applyInPandasWithState update function (testable standalone)."""
    qs = [float(q) for q in qs]
    group_cols = list(group_cols)

    def update(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (blob,) = state.get
            sk = UDDSketch.from_bytes(bytes(blob))
        else:
            sk = UDDSketch(initial_alpha=alpha, m=m)
        for pdf in pdfs:
            sk.update(pdf[value_col].to_numpy(dtype="float64", na_value=np.nan))
        state.update((sk.to_bytes(),))
        row = tuple(key) + tuple(float(sk.quantile(q)) for q in qs) + (
            sk.count,
            sk.num_buckets,
            sk.num_collapses,
        )
        yield pd.DataFrame(
            [row],
            columns=group_cols
            + [f"p{str(q).replace('.', '_')}" for q in qs]
            + ["n", "buckets", "collapses"],
        )

    return update


def streaming_sketch(
    stream_df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    factory,
    from_bytes,
    finalize,
    finalize_schema: StructType,
):
    """Generic stateful streaming aggregation for ANY mergeable kernel.

    ``finalize(sketch) -> tuple`` produces the per-trigger output row (must
    match ``finalize_schema``, which excludes the group columns — they are
    prepended automatically). State = the kernel blob; HLL distinct counts,
    CMS frequencies, t-digest quantiles etc. all drop in unchanged.
    """
    group_cols = list(group_cols)
    out_schema = StructType(
        _group_fields(stream_df, group_cols) + list(finalize_schema.fields)
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            (blob,) = state.get
            sk = from_bytes(bytes(blob))
        else:
            sk = factory()
        for pdf in pdfs:
            col = pdf[value_col]
            if col.dtype.kind in "if":
                sk.update(col.to_numpy(dtype="float64", na_value=np.nan))
            else:
                sk.update(col.dropna().to_numpy())
        state.update((sk.to_bytes(),))
        yield pd.DataFrame(
            [tuple(key) + tuple(finalize(sk))],
            columns=[f.name for f in out_schema.fields],
        )

    return stream_df.groupBy(*group_cols).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_udds_quantiles(
    stream_df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    qs: Iterable[float] = (0.5, 0.9, 0.99),
    alpha: float = 0.01,
    m: int = 200,
) -> DataFrame:
    """Running per-group quantiles over a stream (update output mode).

    State per group is one sketch blob (~16*m bytes) — bounded regardless of
    stream length; Spark checkpoints it, so restarts resume exactly.
    """
    qs = list(qs)
    fn = udds_state_update(group_cols, value_col, qs, alpha, m)
    return stream_df.groupBy(*group_cols).applyInPandasWithState(
        fn,
        outputStructType=_output_schema(stream_df, group_cols, qs),
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
