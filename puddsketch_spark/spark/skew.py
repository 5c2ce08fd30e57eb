"""Explicit skew handling: salted repartitioning for hot keys.

The reference's data decomposition is uniform by construction
(/root/reference/ParallelDDSketch/src/Utility.cc:483-486); real transcript
tables are conv_id-skewed (a few hot conversations dominate). Because
sketches are mergeable, rows of one logical key may be split across salted
partitions freely — partial sketches re-merge in stage 2 regardless.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["salted_repartition", "with_salt"]


def with_salt(df: DataFrame, salt_cols: Sequence[str], buckets: int, out: str = "_salt") -> DataFrame:
    """Deterministic content-derived salt in [0, buckets).

    Uses xxhash64 of per-row columns (e.g. turn_idx, ts) so the same row
    always salts identically — keeps checkpoint/resume and retries stable,
    unlike F.rand().
    """
    return df.withColumn(out, F.pmod(F.xxhash64(*salt_cols), F.lit(buckets)).cast("int"))


def salted_repartition(
    df: DataFrame,
    key_cols: Sequence[str],
    salt_cols: Sequence[str],
    num_partitions: int,
    salt_buckets: int = 16,
) -> DataFrame:
    """Repartition by (key..., salt) so one hot key spreads over
    ``salt_buckets`` partitions instead of serializing on one.
    """
    salted = with_salt(df, list(salt_cols), salt_buckets)
    return salted.repartition(num_partitions, *[F.col(c) for c in key_cols], F.col("_salt")).drop(
        "_salt"
    )
