"""Text analysis operators for training-data pipelines.

All hot-path expressions are Catalyst built-ins (codegen'd, no Python):
token counting, quality scoring, stopword-marker language ID. Document
fingerprinting (winnowing) rides the same vectorized rolling-hash core as
minhash. Designed to run over the `documents` table (doc_id, text, lang,
source, n_chars) and transcript `text` columns alike.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

# rolling-hash core shared with dedup
from .dedup import _batch_shingle_hashes

__all__ = [
    "token_count",
    "bpe_ish_token_count",
    "normalize_text",
    "with_quality_score",
    "with_lang_id",
    "with_repetition_stats",
    "top_terms_tfidf",
    "with_unigram_logprob",
    "winnowing_fingerprints",
]

_U64 = np.uint64


# ---------------------------------------------------------------- tokens
def token_count(text_col: str = "text") -> Column:
    """Whitespace token count (codegen'd)."""
    t = F.trim(F.col(text_col))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).alias("n_tokens")


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """BPE-flavored token estimate: word pieces + punctuation + digit runs.

    regexp_count of GPT-2-style pretokenizer classes — a cheap JVM-side proxy
    for tokenizer cost without shipping a vocab.
    """
    pat = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
    return F.regexp_count(F.col(text_col), F.lit(pat)).alias("n_bpe_tokens")


# ---------------------------------------------------------------- normalize
def normalize_text(text_col: str = "text") -> Column:
    """Canonical text normalization for dedup/compare (codegen'd):
    lowercase, strip punctuation/symbols to spaces, collapse whitespace,
    trim. The standard pre-pass before exact/fuzzy dedup so trivial
    formatting differences don't defeat content hashing."""
    t = F.lower(F.col(text_col))
    t = F.regexp_replace(t, r"[^a-z0-9\s]", " ")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t).alias("text_norm")


# ---------------------------------------------------------------- quality
def with_quality_score(
    df: DataFrame, text_col: str = "text", out: str = "quality"
) -> DataFrame:
    """Heuristic quality in [0,1]: length band + alpha ratio + mean word len
    band + low symbol ratio (C4/Gopher-rule flavored, all built-ins)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_space = F.length(F.regexp_replace(t, r"[^ ]", ""))
    n_sym = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    n_words = F.when(n_chars == 0, 0).otherwise(n_space + 1)
    mean_wlen = F.when(n_words > 0, (n_chars - n_space) / n_words).otherwise(F.lit(0.0))
    len_ok = (n_chars >= 50) & (n_chars <= 100_000)
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    wlen_ok = (mean_wlen >= 2.0) & (mean_wlen <= 12.0)
    sym_ratio = F.when(n_chars > 0, n_sym / n_chars).otherwise(F.lit(1.0))
    score = (
        len_ok.cast("double") * 0.25
        + F.least(alpha_ratio / 0.6, F.lit(1.0)) * 0.35
        + wlen_ok.cast("double") * 0.2
        + (sym_ratio <= 0.1).cast("double") * 0.2
    )
    return df.withColumn(out, F.round(score, 6))


# ---------------------------------------------------------------- repetition
def with_repetition_stats(
    df: DataFrame, text_col: str = "text", sep: str = "\n"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 quality filters),
    all Catalyst higher-order functions — codegen'd, zero Python:

    - ``n_units``: non-blank units after splitting on ``sep`` (lines for
      real corpora; pass ``sep=" "`` for word-level repetition)
    - ``dup_unit_fraction``: 1 - distinct/total units (the duplicate-line
      fraction filter)
    - ``dup_unit_char_fraction``: 1 - chars-in-first-occurrences / chars —
      the character-weighted variant (a few long duplicated units matter
      more than many short ones)

    Fractions are emitted as raw double divisions of integer counts (no
    rounding) so an oracle computing the same division is bit-identical.
    """
    import re

    units = F.filter(
        F.split(F.col(text_col), re.escape(sep)),
        lambda x: F.length(F.trim(x)) > 0,
    )
    dunits = F.array_distinct(units)
    n = F.size(units)
    chars = F.aggregate(units, F.lit(0), lambda a, x: a + F.length(x))
    dchars = F.aggregate(dunits, F.lit(0), lambda a, x: a + F.length(x))
    return (
        df.withColumn("n_units", n)
        .withColumn(
            "dup_unit_fraction",
            F.when(n > 0, F.lit(1.0) - F.size(dunits) / n).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "dup_unit_char_fraction",
            F.when(chars > 0, F.lit(1.0) - dchars / chars).otherwise(F.lit(0.0)),
        )
    )


# ---------------------------------------------------------------- lang id
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "you", "that", "it"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "es"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "zh": ["的", "是", "了", "在", "我", "有", "他", "不"],
}


def with_lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-marker language ID (JVM-side): score = marker hits per
    language over the token array, argmax wins, 'und' if nothing hits."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    scores = []
    langs = list(_LANG_MARKERS)
    for lang in langs:
        markers = F.array(*[F.lit(m) for m in _LANG_MARKERS[lang]])
        scores.append(F.size(F.array_intersect(toks, markers)))
    sarr = F.array(*scores)
    best = F.array_max(sarr)
    pred = F.when(best <= 0, F.lit("und")).otherwise(
        F.element_at(
            F.array(*[F.lit(lang) for lang in langs]), F.array_position(sarr, best).cast("int")
        )
    )
    return df.withColumn(out, pred)


# ---------------------------------------------------------------- fingerprint
def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003):
    min rolling-hash per sliding window of k-gram hashes, deduplicated.
    Output: DataFrame[id, fp:long] — one row per selected fingerprint.
    Same Arrow-vectorized rolling-hash core as minhash; the window-min is a
    sliding_window_view reduction, no per-row Python."""
    out_schema = StructType([df.schema[id_col], StructField("fp", LongType(), False)])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].fillna("").to_numpy()
            ids = pdf[id_col].to_numpy()
            hashes, doc_starts = _batch_shingle_hashes(texts, k)
            counts = np.diff(doc_starts)
            n = hashes.size
            if n == 0:
                yield pd.DataFrame({id_col: ids[:0], "fp": np.empty(0, np.int64)})
                continue
            # one sliding-window-min over the CONCATENATED hash array; a
            # window is valid iff it doesn't straddle a doc boundary (its
            # first and last positions belong to the same doc) — same
            # boundary-mask trick as _batch_shingle_hashes, zero per-doc
            # Python
            doc_of = np.repeat(np.arange(len(texts)), counts)
            sel_doc, sel_fp = [], []
            if n >= window:
                # window-min as `window` shifted contiguous minimums —
                # faster than reducing a strided sliding_window_view
                m = n - window + 1
                wmin = hashes[:m].copy()
                for j in range(1, window):
                    np.minimum(wmin, hashes[j : m + j], out=wmin)
                # window at position i stays within one doc iff its first
                # and last hash positions share a doc id (slices, not
                # fancy indexing — this comparison covers all 8M windows)
                in_doc = doc_of[:m] == doc_of[window - 1 :]
                sel_doc.append(doc_of[:m][in_doc])
                sel_fp.append(wmin[in_doc])
            # docs shorter than one window emit their single global min
            # (count == window already yields exactly one full window above)
            nz = np.flatnonzero(counts > 0)
            short = nz[counts[nz] < window]
            if short.size:
                mins = np.minimum.reduceat(hashes, doc_starts[nz])
                sel_doc.append(short)
                sel_fp.append(mins[counts[nz] < window])
            sdoc = np.concatenate(sel_doc)
            sfp = np.concatenate(sel_fp)
            # adjacent windows usually share their min (the winnowing
            # robustness property), so drop consecutive repeats first —
            # shrinks the full dedup sort's input ~3x
            adj = np.ones(sdoc.size, dtype=bool)
            adj[1:] = (sdoc[1:] != sdoc[:-1]) | (sfp[1:] != sfp[:-1])
            sdoc, sfp = sdoc[adj], sfp[adj]
            order = np.lexsort((sfp, sdoc))
            sdoc, sfp = sdoc[order], sfp[order]
            keep = np.ones(sdoc.size, dtype=bool)
            keep[1:] = (sdoc[1:] != sdoc[:-1]) | (sfp[1:] != sfp[:-1])
            sdoc, sfp = sdoc[keep], sfp[keep]
            yield pd.DataFrame(
                {id_col: ids[sdoc], "fp": (sfp >> _U64(1)).astype(np.int64)}
            )

    return df.select(id_col, text_col).mapInPandas(gen, schema=out_schema)


# ---------------------------------------------------------------- tf-idf
def top_terms_tfidf(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    n_docs: int | None = None,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed tf-idf:
    DataFrame[id_col, term, tf, df, weight, rnk].

    weight = tf * (ln((N+1)/(df+1)) + 1)  (sklearn-style smooth idf).
    Pure Catalyst: one explode, two hash aggregations (term counts per doc,
    document frequency per term), a broadcast of the vocabulary df table,
    and a per-doc top-k window. Shuffles carry (term, id, count) rows —
    never document text; the vocabulary is small relative to the corpus
    (Heaps' law), so its df table broadcasts. Deterministic tie-break:
    weight desc, term asc. ``min_df`` drops hapax noise from the output.
    """
    from pyspark.sql import Window

    # ``n_docs`` only feeds the idf literal; callers that hold a cheaper
    # count source (e.g. the pre-repartition parquet scan — counting df
    # itself would pay the full text shuffle, r7) pass it in
    if n_docs is None:
        n_docs = df.count()
    words = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("term")
    ).where(F.length("term") > 0)
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf feeds TWO consumers — the document-frequency aggregation (the
    # broadcast build side) and the weighted join probe — and each would
    # otherwise re-run the tokenize+explode+aggregate lineage (r7 measured:
    # the tf pass alone is half this operator's cost). localCheckpoint
    # materializes it once, scoped to this lineage (no plan-keyed cache, so
    # repeated invocations still recompute from source).
    tf = tf.localCheckpoint(eager=False)
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
    )
    weighted = tf.join(F.broadcast(dfreq), "term").select(
        id_col,
        "term",
        "tf",
        "df",
        (
            F.col("tf")
            * (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0)
        ).alias("weight"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("weight").desc(), F.col("term").asc())
    return (
        weighted.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


# ---------------------------------------------------------------- unigram LM
def with_unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    out: str = "logprob",
    freqs: DataFrame | None = None,
) -> DataFrame:
    """Adds ``out`` = the doc's mean unigram log-probability — the cheap
    stand-in for the LM-perplexity quality filter (CCNet-style): docs of
    improbable tokens (gibberish, boilerplate codes, wrong-language) score
    low, fluent in-domain text scores high.

    The unigram model is trained on ``freqs`` (DataFrame[term, p]) or, by
    default, on the corpus itself: one explode + count aggregation whose
    (term, p) table broadcasts — Heaps' law keeps the vocabulary KB-to-MB
    scale however big the corpus. Scoring is a broadcast join + one
    aggregation keyed by doc; no UDF anywhere. NULL for docs with no
    tokens.
    """
    from pyspark.sql import Window

    # The score is a pure function of the text, so the row key is the text's
    # hash — fully deterministic across retries/recomputation (the previous
    # monotonically_increasing_id + localCheckpoint pinning was only stable
    # after first materialization and made the stage unrecoverable on
    # executor loss, r4 advice). md5 (128-bit), not xxhash64: at multi-
    # billion-document scale 64-bit birthday collisions would silently pool
    # two unrelated docs into one blended score. Duplicate texts share one
    # score row (their pooled token average equals the per-copy average);
    # each copy still contributes its tokens to the corpus model below.
    words = df.withColumn("_tkey", F.md5(F.col(text_col)))
    toks = words.select(
        "_tkey", F.explode(F.split(F.col(text_col), r"\s+")).alias("term")
    ).where(F.length("term") > 0)
    if freqs is None:
        total = Window.partitionBy()
        freqs = (
            toks.groupBy("term")
            .agg(F.count(F.lit(1)).alias("_c"))
            .select("term", (F.col("_c") / F.sum("_c").over(total)).alias("p"))
        )
    scored = (
        toks.join(F.broadcast(freqs), "term", "left")
        .groupBy("_tkey")
        .agg(F.avg(F.log("p")).alias(out))  # OOV terms (NULL p) are ignored
    )
    return words.join(scored, "_tkey", "left").drop("_tkey")
