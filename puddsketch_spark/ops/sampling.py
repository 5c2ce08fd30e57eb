"""Deterministic sampling operators for training-data pipelines.

Both operators pick rows by ranking a content-independent deterministic hash
of the row id (md5 of id||seed), so:

  * the SAME sample comes out under any partitioning, cluster size, or
    re-run (reproducible training mixes);
  * the sample is uniform within each stratum (md5 ranks are exchangeable);
  * the rank is SQL-expressible, so samples are oracle-checkable row-for-row
    (md5 exists in every engine; no engine-specific hash in the contract).

Scale shape: one window (or groupBy-limit) shuffle keyed by the stratum —
the standard exact-stratified pattern; rows never route through the driver.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["stratified_sample", "weighted_mix"]


def _rank_in_stratum(strata: Sequence[str], id_col: str, seed: int):
    h = F.md5(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(str(seed))))
    w = Window.partitionBy(*strata).orderBy(h.asc(), F.col(id_col).asc())
    return F.row_number().over(w)


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, deterministic in seed."""
    return (
        df.withColumn("_rn", _rank_in_stratum(list(strata), id_col, seed))
        .where(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def weighted_mix(
    df: DataFrame,
    source_col: str,
    weights: Mapping[str, float],
    target_total: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic dataset mix: draw ~target_total rows with per-source
    quotas proportional to ``weights`` (sources absent from ``weights`` are
    dropped; a quota larger than the source is capped at the source size —
    check the output counts if exact proportions matter).

    quota_s = round(target_total * w_s / sum(w)), materialized as a
    broadcast-joined limit per source + the same md5 rank as
    stratified_sample.
    """
    total_w = float(sum(weights.values()))
    quotas = [
        (s, int(round(target_total * w / total_w))) for s, w in sorted(weights.items())
    ]
    spark = df.sparkSession
    qdf = F.broadcast(
        spark.createDataFrame(quotas, f"{source_col} string, _quota int")
    )
    return (
        df.join(qdf, source_col)  # inner: un-weighted sources drop
        .withColumn("_rn", _rank_in_stratum([source_col], id_col, seed))
        .where(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )
