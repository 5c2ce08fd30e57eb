"""Distributed sketch aggregation: Arrow-vectorized partials + mergeable reduce.

The Spark equivalent of the reference's MPI pipeline
(/root/reference/psketches/pudds.cpp:118-203): per-rank local sketch build ->
custom commutative MPI_Reduce -> root-rank quantile query becomes

    df.select(cols)                      # column pruning reaches the scan
      .mapInPandas(partial_fn)           # per-partition sketch, Arrow batches,
                                         #   pandas-groupby map-side combine
      .groupBy(group).applyInPandas(...) # keyed merge: shuffles ~KB sketch
                                         #   blobs, never raw rows
      -- or --
      .rdd.treeReduce(merge, depth=2)    # global merge, two-level tree

Scale notes (100 TB / 1000 executors):
  * the only shuffle moves (n_groups x n_partitions) sketch blobs of
    ~16*m bytes (m=200 -> ~3 KB); raw rows never cross the wire.
  * group-key skew is irrelevant post-partial (one row per group per
    partition); input conv_id skew is handled by skew.salted_repartition.
  * all per-row work is numpy inside Arrow batches — no per-row Python.
"""

from __future__ import annotations

import math
from typing import Callable, Iterable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..core.uddsketch import UDDSketch

__all__ = [
    "partial_sketches",
    "merge_grouped",
    "sketch_grouped",
    "sketch_global",
    "quantile_table",
    "udds_quantiles",
]

# A sketch kernel is anything with: update(np.ndarray)->self, merge(other)->self,
# to_bytes()->bytes, classmethod from_bytes(bytes), and int attrs count /
# num_buckets / num_collapses (companion sketches report 0 collapses).
SketchFactory = Callable[[], object]

_METRIC_FIELDS = [
    StructField("state", BinaryType(), False),
    StructField("n", LongType(), False),
    StructField("buckets", IntegerType(), False),
    StructField("collapses", IntegerType(), False),
    StructField("partition_id", IntegerType(), False),
]


def _metrics_of(sk) -> tuple[int, int, int]:
    return (
        int(getattr(sk, "count", 0)),
        int(getattr(sk, "num_buckets", 0)),
        int(getattr(sk, "num_collapses", 0)),
    )


def _partial_schema(df: DataFrame, group_cols: Sequence[str]) -> StructType:
    by_name = {f.name: f for f in df.schema.fields}
    return StructType([by_name[c] for c in group_cols] + _METRIC_FIELDS)


def partial_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    factory: SketchFactory = UDDSketch,
) -> DataFrame:
    """Stage 1: one sketch row per (group x input-partition).

    Vectorized map-side combine: each Arrow batch is pandas-grouped and fed
    to the kernel's numpy ``update``; only fixed-size states leave the stage.
    Emits per-partition lineage/metrics (partition_id, n, buckets, collapses)
    per the north_rule, mirroring the reference's per-rank logs
    (/root/reference/ParallelDDSketch/src/ParallelSketcher.cc:662-708).
    """
    group_cols = list(group_cols)
    schema = _partial_schema(df, group_cols)
    pruned = df.select(*group_cols, value_col)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        sketches: dict[tuple, object] = {}
        for pdf in batches:
            s = pdf[value_col]
            if pd.api.types.is_numeric_dtype(s):
                # numeric: NaN-coded nulls, kernels drop NaN themselves
                vals_all = s.to_numpy(dtype="float64", na_value=np.nan)
                valid = None
            else:
                # strings/objects (HLL/CMS/Bloom): drop nulls via mask so
                # group-slice indexing stays aligned
                vals_all = s.to_numpy()
                valid = s.notna().to_numpy()
            if not group_cols:
                sk = sketches.setdefault((), factory())
                sk.update(vals_all if valid is None else vals_all[valid])
                continue
            codes, uniques = pd.factorize(
                pd.MultiIndex.from_frame(pdf[group_cols])
                if len(group_cols) > 1
                else pdf[group_cols[0]],
                use_na_sentinel=False,
            )
            order = np.argsort(codes, kind="stable")
            sorted_codes = codes[order]
            starts = np.flatnonzero(np.diff(sorted_codes, prepend=-1))
            for i, g0 in enumerate(starts):
                g1 = starts[i + 1] if i + 1 < len(starts) else len(sorted_codes)
                key = uniques[sorted_codes[g0]]
                key = tuple(key) if len(group_cols) > 1 else (key,)
                sk = sketches.get(key)
                if sk is None:
                    sk = sketches[key] = factory()
                idx = order[g0:g1]
                if valid is not None:
                    idx = idx[valid[idx]]
                sk.update(vals_all[idx])
        if not sketches:
            yield pd.DataFrame({f.name: pd.Series(dtype=object) for f in schema.fields})
            return
        rows = []
        for key, sk in sketches.items():
            n, b, c = _metrics_of(sk)
            rows.append(tuple(_null_safe(k) for k in key) + (sk.to_bytes(), n, b, c, pid))
        yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return pruned.mapInPandas(build, schema=schema)


def _null_safe(k):
    # pandas uses NaN/NaT for missing group keys; Arrow wants None
    if k is None or (isinstance(k, float) and math.isnan(k)) or k is pd.NaT:
        return None
    return k


def merge_grouped(
    partials: DataFrame,
    group_cols: Sequence[str],
    from_bytes: Callable[[bytes], object],
) -> DataFrame:
    """Stage 2: shuffle partial states by group, merge per group.

    The shuffle payload is sketch blobs only. Merge order is arbitrary —
    valid because kernel merge is commutative/associative (property-tested).
    """
    group_cols = list(group_cols)
    out_fields = [f for f in partials.schema.fields if f.name in group_cols]
    schema = StructType(
        out_fields
        + [
            StructField("state", BinaryType(), False),
            StructField("n", LongType(), False),
            StructField("buckets", IntegerType(), False),
            StructField("collapses", IntegerType(), False),
            StructField("num_partials", IntegerType(), False),
        ]
    )

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        states = pdf["state"]
        sk = from_bytes(states.iloc[0])
        for blob in states.iloc[1:]:
            sk = sk.merge(from_bytes(blob))
        n, b, c = _metrics_of(sk)
        key_vals = [pdf[c_].iloc[0] for c_ in group_cols]
        return pd.DataFrame(
            [tuple(key_vals) + (sk.to_bytes(), n, b, c, len(pdf))],
            columns=[f.name for f in schema.fields],
        )

    if not group_cols:
        raise ValueError("merge_grouped needs group_cols; use sketch_global for global")
    return partials.groupBy(*group_cols).applyInPandas(merge_fn, schema=schema)


def sketch_grouped(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    factory: SketchFactory = UDDSketch,
    from_bytes: Callable[[bytes], object] | None = None,
) -> DataFrame:
    """partials -> keyed merge. Returns DataFrame[group..., state, n, buckets, collapses, num_partials]."""
    fb = from_bytes or _default_from_bytes(factory)
    return merge_grouped(partial_sketches(df, value_col, group_cols, factory), group_cols, fb)


def _default_from_bytes(factory: SketchFactory):
    probe = factory()
    return type(probe).from_bytes


def sketch_global(
    df: DataFrame,
    value_col: str,
    factory: SketchFactory = UDDSketch,
    from_bytes: Callable[[bytes], object] | None = None,
    depth: int = 2,
):
    """Global sketch via two-level treeReduce over serialized partials.

    Spark analogue of the reference's MPI_Reduce with a custom commutative op
    (/root/reference/psketches/pudds.cpp:45-57,175-182): executors pairwise-
    merge blobs at ``depth`` levels, the driver receives one blob.
    Returns the merged kernel object (driver-side, like rank 0).
    """
    fb = from_bytes or _default_from_bytes(factory)
    partials = partial_sketches(df, value_col, (), factory)
    blobs = partials.select("state").rdd.map(lambda r: bytes(r[0]))

    def merge_bytes(a: bytes, b: bytes) -> bytes:
        return fb(a).merge(fb(b)).to_bytes()

    if blobs.isEmpty():
        return factory()
    return fb(blobs.treeReduce(merge_bytes, depth=depth))


def quantile_table(
    merged: DataFrame,
    group_cols: Sequence[str],
    qs: Sequence[float],
    from_bytes: Callable[[bytes], object] = UDDSketch.from_bytes,
) -> DataFrame:
    """Finalize: DataFrame[group..., q, est] from merged sketch states."""
    qs = [float(q) for q in qs]

    @F.pandas_udf(ArrayType(DoubleType()))
    def q_udf(states: pd.Series) -> pd.Series:
        return states.map(lambda b: [float(from_bytes(b).quantile(q)) for q in qs])

    qlits = F.array(*[F.lit(q) for q in qs])
    return (
        merged.withColumn("_ests", q_udf("state"))
        .select(
            *group_cols,
            F.explode(F.arrays_zip(qlits.alias("q"), F.col("_ests").alias("est"))).alias("_z"),
        )
        .select(*group_cols, F.col("_z.q").alias("q"), F.col("_z.est").alias("est"))
    )


def udds_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    qs: Iterable[float] = (0.5, 0.9, 0.99, 0.999),
    alpha: float = 0.01,
    m: int = 200,
) -> DataFrame:
    """One-call UDDSketch quantile summary, grouped or global.

    Flagship API: p50/p90/p99/p999 of a numeric feature grouped by e.g.
    role/tool, at relative-error alpha with memory bounded by m buckets.
    """
    factory = lambda: UDDSketch(initial_alpha=alpha, m=m)  # noqa: E731
    qs = list(qs)
    if group_cols:
        merged = sketch_grouped(df, value_col, group_cols, factory, UDDSketch.from_bytes)
        return quantile_table(merged, group_cols, qs, UDDSketch.from_bytes)
    sk = sketch_global(df, value_col, factory, UDDSketch.from_bytes)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(float(q), float(sk.quantile(q))) for q in qs], schema="q double, est double"
    )
