"""End-to-end document-curation pipeline: the composition a training-data
run actually executes, built from the individual operators so every stage
keeps its scale properties (digest-only shuffles, bucketed LSH, pointer-
jumping components, codegen'd scoring).

    normalize -> exact dedup (on normalized text) -> [minhash near-dup
    dedup] -> quality filter

Returns the curated DataFrame plus a small stats dict (driver-side counts,
one job per stage boundary) for pipeline reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import dedup_survivors, minhash_dedup_pairs, release_cached
from .text import normalize_text, with_quality_score

__all__ = ["curate_documents"]


def curate_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_threshold: float = 0.5,
    fuzzy: bool = True,
    num_perm: int = 64,
    bands: int = 8,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.9,
    with_stats: bool = True,
) -> tuple[DataFrame, dict]:
    """Curate a document table; returns (curated_df, stats).

    * exact stage: survivors = min id per md5(normalized text) — catches
      byte-identical AND formatting-perturbed copies in one digest shuffle.
    * fuzzy stage (optional): minhash/LSH near-dups on the normalized text,
      connected components, min-id survivors.
    * quality stage: heuristic score (length/alpha/word-length/symbol
      bands), keep score >= quality_threshold.

    The curated frame keeps the input columns plus ``quality``. Stats are
    exact driver-side counts per stage (skip with with_stats=False to keep
    the pipeline fully lazy).
    """
    stats: dict = {}
    if with_stats:
        stats["n_input"] = df.count()

    normed = df.withColumn("_tnorm", normalize_text(text_col))
    keep = (
        normed.select(F.md5("_tnorm").alias("_h"), F.col(id_col))
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    exact = normed.join(keep, id_col, "left_semi")
    if with_stats:
        stats["n_after_exact"] = exact.count()

    if fuzzy:
        pairs = minhash_dedup_pairs(
            exact.select(id_col, F.col("_tnorm").alias(text_col)),
            num_perm=num_perm,
            bands=bands,
            shingle_k=shingle_k,
            threshold=jaccard_threshold,
        )
        fuzzy_df = dedup_survivors(exact, pairs.select("a", "b"), id_col)
        if with_stats:
            stats["n_after_fuzzy"] = fuzzy_df.count()
        release_cached(pairs)
    else:
        fuzzy_df = exact

    scored = with_quality_score(fuzzy_df, text_col)
    curated = scored.where(F.col("quality") >= quality_threshold).drop("_tnorm")
    if with_stats:
        stats["n_curated"] = curated.count()
    return curated, stats
