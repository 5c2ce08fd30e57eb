"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — the dot product is a zip_with/aggregate
Catalyst expression (whole-stage codegen, no Python), ranked by a single
distributed TakeOrdered (no full sort, no shuffle of vectors to one node).

Scale path: IVF-style bucketing — assign every vector to its nearest of
``n_cells`` deterministic pseudo-random centroids at write time, then probe
only the ``n_probe`` cells nearest the query. At 100 TB this turns a full
scan into a partition-pruned scan when the table is partitioned by cell_id.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType

__all__ = ["cosine_topk", "ivf_assign", "ivf_topk", "matrix_dots", "random_centroids"]

# above this many literal plane/centroid coefficients the Catalyst expression
# tree stops being free: plan size, analysis time, and codegen all scale with
# n_rows x dim, so high-dim fan-outs switch to one Arrow-batched matmul
_MAX_CATALYST_COEFFS = 8192


def _dot_lit(vec_col: str, q: Sequence[float]):
    qlit = F.array(*[F.lit(float(x)) for x in q])
    return F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), qlit, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def matrix_dots(vec_col: str, matrix: np.ndarray) -> Column:
    """array<double> of <vec, row_i> for every row of ``matrix`` via ONE
    Arrow-batched pandas-UDF matrix multiply.

    The scale path for high-dim embeddings (dim 768+): a Catalyst expression
    with n_rows x dim literal coefficients blows up the plan, while the UDF
    ships the matrix once per worker and does a single BLAS matmul per Arrow
    batch — no per-row Python."""
    mat = np.ascontiguousarray(np.asarray(matrix, dtype=np.float64))

    @F.pandas_udf(ArrayType(DoubleType()))
    def dots(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype(np.float64, copy=False)
        d = x @ mat.T  # (batch, n_rows)
        return pd.Series(list(d))

    return dots(F.col(vec_col))


def _norm(vec_col: str):
    return F.sqrt(
        F.aggregate(
            F.col(vec_col).cast("array<double>"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )


def cosine_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query``.

    orderBy+limit compiles to TakeOrderedAndProject: per-partition top-k
    heaps, only k rows per partition reach the driver-side merge.
    """
    qn = float(np.linalg.norm(np.asarray(query, dtype=np.float64)))
    cos = (_dot_lit(vec_col, query) / (_norm(vec_col) * F.lit(qn))).alias("cosine")
    return (
        df.select(F.col(id_col), cos)
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def random_centroids(dim: int, n_cells: int = 64, seed: int = 42) -> np.ndarray:
    """Deterministic unit-norm pseudo-random centroids (IVF coarse quantizer).
    A production build would k-means these; random projections already give
    balanced cells for normalized embeddings."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_cells, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out: str = "cell_id",
    engine: str = "auto",
) -> DataFrame:
    """Tag each vector with its nearest centroid id (argmax dot). Partition
    or Z-order the table by ``cell_id`` so ivf_topk prunes at the scan.

    engine="catalyst": n_cells dot products as codegen'd expressions — best
    while n_cells*dim literals stay small. engine="arrow": one pandas-UDF
    matmul (the dim-768+ path). "auto" switches on the coefficient count.
    The two can differ on exact argmax ties (summation order), so pin the
    engine where bit-stable assignments matter."""
    cents = np.asarray(centroids, dtype=np.float64)
    if engine == "auto":
        engine = "catalyst" if cents.size <= _MAX_CATALYST_COEFFS else "arrow"
    if engine == "arrow":
        dots = matrix_dots(vec_col, cents)
    else:
        dots = F.array(*[_dot_lit(vec_col, c) for c in cents])
    return df.withColumn("_dots", dots).withColumn(
        out, (F.array_position(F.col("_dots"), F.array_max("_dots")) - 1).cast("int")
    ).drop("_dots")


def ivf_topk(
    df_assigned: DataFrame,
    centroids: np.ndarray,
    query: Sequence[float],
    k: int = 10,
    n_probe: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "cell_id",
) -> DataFrame:
    """Approximate top-k: scan only the n_probe cells nearest the query.

    The cell filter is a plain predicate -> partition pruning / pushdown when
    the table is laid out by cell. Recall rises with n_probe (n_probe ==
    n_cells -> exact).
    """
    q = np.asarray(query, dtype=np.float64)
    qcells = np.argsort(-(centroids @ (q / np.linalg.norm(q))))[:n_probe]
    pruned = df_assigned.where(F.col(cell_col).isin([int(c) for c in qcells]))
    return cosine_topk(pruned, query, k, vec_col, id_col)
