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

__all__ = ["salted_repartition", "with_salt", "salted_join"]


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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_cols: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the fact side salts its join key with a
    deterministic content-derived bucket, the (small) dim side replicates
    once per bucket, and the join runs on (key, salt) — a hot fact key
    spreads over ``salt_buckets`` shuffle partitions instead of
    serializing one reducer. Result rows are IDENTICAL to the plain join
    (each fact row meets each matching dim row exactly once, in exactly
    one salt bucket).

    Use when the dim side is too big to broadcast outright but small
    enough to replicate ``salt_buckets`` times across the shuffle, and
    AQE's skew splitting doesn't apply (e.g. the skewed stage feeds an
    aggregation that must stay co-partitioned). ``how``: inner or left
    (left keeps unmatched fact rows; dim-side outer forms would multiply
    unmatched dim rows per salt and are rejected).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    salted = with_salt(fact, list(salt_cols), salt_buckets)
    replicated = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return salted.join(replicated, [on, "_salt"], how).drop("_salt")
