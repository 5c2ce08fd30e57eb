"""PII pattern detection and redaction — the scrubbing stage every
training-data pipeline runs before text leaves curation.

Pure Catalyst: detection is ``regexp_extract_all`` counts and redaction is
chained ``regexp_replace`` — both JVM-side, whole-stage-codegen'd, zero
Python in the hot path, so the operator costs one scan however wide the
corpus. The pattern set deliberately sticks to the regex intersection of
Java's engine (Spark) and RE2 (DuckDB, Go tooling): no lookaround, no
backreferences — every pattern behaves identically in the SQL oracle.

This layer is pattern-based (emails, phones, IPv4, SSN-like, card-like
numbers). A production deployment adds an NER model pass behind the same
API for names/addresses; that model is out of scope here, but the Spark
plumbing (one scan, per-kind stats, deterministic masking) is the part
that must survive 100 TB.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["PII_PATTERNS", "redact_pii", "pii_stats"]

# Order matters for redaction: longer/more-specific patterns run first so a
# card number is masked as one card, not two phone fragments.
PII_PATTERNS: Mapping[str, str] = {
    "card": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # phone deliberately excludes SPACE separators and is \b-anchored: a
    # '\d{3}[-. ]...' with spaces masks ordinary numeric prose ('revenue
    # 100 200 3000') and can start mid-digit-run; RE2 has no lookbehind,
    # so \b after the optional '+' is the strongest anchor both engines
    # share ('+' to digit is a word boundary, so '+555-...' still matches)
    "phone": r"\+?\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def _patterns(kinds: Sequence[str] | None) -> dict[str, str]:
    if kinds is None:
        return dict(PII_PATTERNS)
    unknown = set(kinds) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII kinds {sorted(unknown)}; "
                         f"available: {sorted(PII_PATTERNS)}")
    # preserve the canonical (specificity) order, not the caller's
    return {k: PII_PATTERNS[k] for k in PII_PATTERNS if k in kinds}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    kinds: Sequence[str] | None = None,
    out: str | None = None,
    token: str = "[{kind}]",
) -> DataFrame:
    """Masks every PII match in ``text_col`` with ``token`` (``{kind}``
    interpolated, e.g. ``[email]``), writing to ``out`` (default:
    in place). Chained regexp_replace — one projection, no shuffle."""
    col = F.col(text_col)
    for kind, pat in _patterns(kinds).items():
        col = F.regexp_replace(col, pat, token.format(kind=kind))
    return df.withColumn(out or text_col, col)


def pii_stats(
    df: DataFrame,
    text_col: str = "text",
    kinds: Sequence[str] | None = None,
) -> DataFrame:
    """DataFrame[kind, n_matches, n_docs] — total matches and number of
    documents containing each PII kind, ONE scan for every kind (per-kind
    match counts are computed side by side in a single projection, then one
    Tungsten aggregation; nothing explodes, nothing shuffles but the
    aggregation's single output row)."""
    pats = _patterns(kinds)
    counted = df.select(
        *[
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .alias(f"_c_{kind}")
            for kind, pat in pats.items()
        ]
    )
    agg = counted.agg(
        *[F.sum(f"_c_{k}").alias(f"_m_{k}") for k in pats],
        *[F.sum((F.col(f"_c_{k}") > 0).cast("long")).alias(f"_d_{k}") for k in pats],
    )
    # one row per kind, stable order, without re-scanning: unpivot the
    # single aggregated row driver-side is wrong at 0 cost either way —
    # stack() keeps it in the plan
    stack_args = ", ".join(f"'{k}', _m_{k}, _d_{k}" for k in pats)
    return agg.selectExpr(
        f"stack({len(pats)}, {stack_args}) as (kind, n_matches, n_docs)"
    ).select(
        "kind",
        F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
        F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
    )
