"""Sketch-driven equal-frequency range partitioning.

``repartitionByRange(col)`` picks its bounds from a nondeterministic
reservoir sample (Spark's ``RangePartitioner``) and costs an extra
sampling job over the raw column; at 10^12-row scale that job rescans the
table and two runs of the same pipeline can produce different physical
layouts. The mergeable signed quantile sketch (DDSketchPair,
`/root/reference/ParallelDDSketch/src/Header.h:106-123` semantics) gives
equal-frequency bounds in ONE map-side pass — the same partial fill +
treeReduce merge every query engine here uses — deterministically, and the
bounds can come from a checkpointed sketch state so an incremental ingest
reuses yesterday's layout without rescanning the corpus.

Scale notes: the sketch pass shuffles only O(partitions) serialized blobs;
bucket assignment is a JVM-side higher-order-function scan over the
(num_buckets - 1)-element bounds array — O(P) per row, fine for the
P <= few-thousand range this targets; nothing collects to the driver but
the merged sketch.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = [
    "sketch_range_bounds",
    "with_range_bucket",
    "range_repartition",
    "bucket_balance",
]

NULL_BUCKET = -1


def sketch_range_bounds(
    df: DataFrame,
    value_col: str,
    num_buckets: int,
    alpha: float = 0.005,
    m: int = 4096,
    sketch=None,
) -> list[float]:
    """Equal-frequency bucket bounds for ``value_col`` from one sketch pass.

    Returns a strictly increasing list of at most ``num_buckets - 1`` cut
    points (duplicates from heavy point masses are deduplicated, so a
    column dominated by one value yields fewer, still-correct buckets).
    Pass ``sketch`` (a filled :class:`DDSketchPair`, e.g. restored from a
    checkpointed state row) to skip the fill entirely — the incremental
    path. Bounds land within the sketch's relative-error bound alpha of
    the true quantile values; bucket *counts* are therefore near-equal
    wherever the distribution has no atom heavier than 1/num_buckets.
    """
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    if num_buckets == 1:
        return []  # one bucket needs no cuts — skip the fill entirely
    if sketch is None:
        from ..core.ddsketch import DDSketchPair
        from .agg import sketch_global

        sketch = sketch_global(
            df,
            value_col,
            lambda: DDSketchPair(initial_alpha=alpha, m=m),
            DDSketchPair.from_bytes,
        )
    if getattr(sketch, "count", 0) == 0:
        return []
    bounds: list[float] = []
    for i in range(1, num_buckets):
        b = float(sketch.quantile(i / num_buckets))
        # a cut with no mass strictly on one side splits nothing (constant
        # columns, atoms at the extremes) — the sketch's own CDF is the
        # authority on that, same error bound as the quantile walk
        if (not bounds or b > bounds[-1]) and 0.0 < sketch.cdf(b) < 1.0:
            bounds.append(b)
    return bounds


def with_range_bucket(
    df: DataFrame, value_col: str, bounds: Sequence[float], out: str = "_bucket"
) -> DataFrame:
    """Add the equal-frequency bucket id: ``searchsorted(bounds, v, 'left')``.

    A value equal to a cut point goes to the LEFT bucket; NULL and NaN rows
    get :data:`NULL_BUCKET` (-1) so they stay visible instead of silently
    landing in bucket 0. Pure Catalyst (``filter`` higher-order function on
    a literal array) — no Python in the row path.
    """
    if out in df.columns:
        raise ValueError(
            f"output column {out!r} already exists in the input; pass a "
            "different `out` instead of silently overwriting it"
        )
    v = F.col(value_col).cast("double")
    if not bounds:
        bucket = F.lit(0)
    else:
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket = F.size(F.filter(arr, lambda b: b < v))
    return df.withColumn(
        out,
        F.when(v.isNull() | F.isnan(v), F.lit(NULL_BUCKET))
        .otherwise(bucket)
        .cast("int"),
    )


def range_repartition(
    df: DataFrame,
    value_col: str,
    num_buckets: int,
    bounds: Sequence[float] | None = None,
    alpha: float = 0.005,
    m: int = 4096,
    out: str = "_bucket",
    keep_bucket: bool = False,
) -> DataFrame:
    """Balanced, deterministic-bounds range repartition on ``value_col``.

    One sketch pass picks the bounds (unless given), then the exchange
    range-partitions on the dense int bucket id — Spark's sampler sees at
    most ``num_buckets`` distinct ids instead of the raw value domain, so
    BUCKET membership is decided by the deterministic bounds, not by what
    the reservoir happened to sample this run. The id->physical-partition
    mapping still goes through Spark's range sampler: with few rows per
    bucket it may merge adjacent ids into one partition (contiguity and
    bucket membership hold regardless); raise
    ``spark.sql.execution.rangeExchange.sampleSizePerPartition`` for a
    near-exact identity mapping — the sample is ints, so even 10k/partition
    is trivial. NULL/NaN rows (bucket -1) sort first, matching
    ``repartitionByRange``'s nulls-first order.
    """
    if bounds is None:
        bounds = sketch_range_bounds(df, value_col, num_buckets, alpha=alpha, m=m)
    bucketed = with_range_bucket(df, value_col, bounds, out=out)
    if not bounds:
        # no cut points: exchanging would be repartitionByRange(1, ...) —
        # the entire input funneled into ONE partition, a scale hazard far
        # worse than leaving the existing layout alone. Warn only when the
        # caller asked for a real split (num_buckets == 1 legitimately has
        # no cuts and needs no warning).
        if num_buckets > 1:
            import warnings

            warnings.warn(
                f"range_repartition: {value_col!r} has no equal-frequency "
                "cut points (constant or empty column); keeping the input "
                "partitioning instead of coalescing into one partition"
            )
        return bucketed if keep_bucket else bucketed.drop(out)
    shuffled = bucketed.repartitionByRange(len(bounds) + 1, F.col(out))
    return shuffled if keep_bucket else shuffled.drop(out)


def bucket_balance(
    df: DataFrame,
    value_col: str,
    num_buckets: int,
    bounds: Sequence[float] | None = None,
    **kwargs,
) -> DataFrame:
    """One-row balance report for the sketch-chosen buckets.

    DataFrame[num_buckets int, n long, max_share double, min_share double,
    monotonic boolean] — max/min_share are the heaviest/lightest bucket's
    row fraction (ideal 1/num_buckets each, over non-null rows);
    ``monotonic`` verifies bucket ids never decrease as values increase
    (the range-partition contract), checked distributedly via per-bucket
    [min, max] value envelopes. Pass ``bounds`` to audit cut points you
    already computed instead of paying a second sketch fill.
    """
    if bounds is None:
        bounds = sketch_range_bounds(df, value_col, num_buckets, **kwargs)
    b = with_range_bucket(df, value_col, bounds).where(F.col("_bucket") >= 0)
    per = b.groupBy("_bucket").agg(
        F.count(F.lit(1)).alias("c"),
        F.min(F.col(value_col).cast("double")).alias("lo"),
        F.max(F.col(value_col).cast("double")).alias("hi"),
    )
    # single-partition window is fine here: `per` has <= num_buckets rows
    w_prev = F.lag("hi").over(Window.orderBy("_bucket"))
    per = per.withColumn("ok", F.coalesce(w_prev <= F.col("lo"), F.lit(True)))
    return per.agg(
        F.lit(num_buckets).alias("num_buckets"),
        F.sum("c").cast("long").alias("n"),
        (F.max("c") / F.sum("c")).alias("max_share"),
        (F.min("c") / F.sum("c")).alias("min_share"),
        F.min("ok").alias("monotonic"),
    )
