"""End-to-end document-curation pipeline: the composition a training-data
run actually executes, built from the individual operators so every stage
keeps its scale properties (digest-only shuffles, bucketed LSH, pointer-
jumping components, codegen'd scoring).

    normalize -> exact dedup (on normalized text) -> [minhash near-dup
    dedup] -> [corpus line dedup] -> [benchmark decontamination] ->
    quality filter -> [PII redaction]

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
    line_dedup_max_df: int | None = None,
    benchmark: DataFrame | None = None,
    decontam_n: int = 8,
    redact: bool = False,
    pii_kinds=None,
    with_stats: bool = True,
) -> tuple[DataFrame, dict]:
    """Curate a document table; returns (curated_df, stats).

    * exact stage: survivors = min id per md5(normalized text) — catches
      byte-identical AND formatting-perturbed copies in one digest shuffle.
    * fuzzy stage (optional): minhash/LSH near-dups on the normalized text,
      connected components, min-id survivors.
    * line-dedup stage (optional, ``line_dedup_max_df``): corpus-level
      boilerplate removal — lines occurring in more than that many distinct
      docs are stripped IN PLACE (text rewritten, broadcast-probe path).
    * decontamination stage (optional, ``benchmark``): docs sharing any
      word ``decontam_n``-gram with the benchmark set are dropped (Bloom
      pre-filter + exact verify).
    * quality stage: heuristic score (length/alpha/word-length/symbol
      bands), keep score >= quality_threshold.
    * redaction stage (optional, ``redact=True``): PII masking of the
      SURVIVING text only (chained regexp_replace, ops/redact.py) — runs
      last so no cycles are spent scrubbing documents that get dropped;
      ``pii_kinds`` narrows the pattern set.

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

    if line_dedup_max_df is not None:
        from .boilerplate import dedup_lines

        cleaned = dedup_lines(
            fuzzy_df, line_dedup_max_df, text_col=text_col, id_col=id_col
        ).where(F.col("n_kept") > 0)
        fuzzy_df = (
            fuzzy_df.drop(text_col)
            .join(
                cleaned.select(id_col, F.col("clean_text").alias(text_col)),
                id_col,
            )
        )
        if with_stats:
            stats["n_after_line_dedup"] = fuzzy_df.count()

    if benchmark is not None:
        from .decontam import flag_contaminated

        flags = flag_contaminated(
            fuzzy_df, benchmark, n=decontam_n, text_col=text_col,
            id_col=id_col, method="bloom",
        )
        clean_ids = flags.where(~F.col("contaminated")).select(id_col)
        fuzzy_df = fuzzy_df.join(clean_ids, id_col, "left_semi")
        if with_stats:
            stats["n_after_decontam"] = fuzzy_df.count()

    scored = with_quality_score(fuzzy_df, text_col)
    curated = scored.where(F.col("quality") >= quality_threshold).drop("_tnorm")
    if with_stats:
        stats["n_curated"] = curated.count()
    if redact:
        from .redact import redact_pii

        if with_stats:
            masked = redact_pii(curated, text_col, kinds=pii_kinds, out="_red")
            stats["n_redacted_docs"] = masked.where(
                F.col("_red") != F.col(text_col)
            ).count()
            curated = masked.withColumn(text_col, F.col("_red")).drop("_red")
        else:
            curated = redact_pii(curated, text_col, kinds=pii_kinds)
    return curated, stats
