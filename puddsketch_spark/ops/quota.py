"""Per-group quota capping and deterministic corpus ordering.

Web-corpus curation caps how many documents any one source/domain may
contribute (the C4/RefinedWeb "domain cap" step) and fixes a reproducible
training order. Both are pure Catalyst here; the cap additionally ships a
two-phase salted path for the hot-domain reality of web data — one domain
with 10^8 rows would otherwise serialize a single window task.

Scale notes: for ``k <= spark.sql.optimizer.windowGroupLimitThreshold``
(default 1000) Catalyst already inserts a PARTIAL WindowGroupLimit below
the exchange — map-side top-k per input partition, so the hot group ships
at most ``k x n_partitions`` rows and the plain one-shuffle path is
natively skew-safe (plan-pinned in tests/test_quota.py; measured 0.9-1.1x
vs the salted path on a 99.9%-hot 8M-row table precisely because the
engine already does phase one). The salted path exists for the cases the
rule does not cover — ``k`` above the threshold, or the threshold disabled
— where the plain window would re-serialize the hot group: it shuffles
twice, but phase two moves at most ``k * salt_buckets`` candidates per
group. Results of both paths are row-identical (property-tested) because
every global top-k row is necessarily within the top k of its own salt
bucket.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["cap_per_group", "deterministic_shuffle"]


def _order_cols(order_by: Sequence) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def warn_if_no_partial_limit(df: DataFrame, k: int, caller: str) -> None:
    """Warn when a row_number-<=k window will NOT get Catalyst's map-side
    Partial WindowGroupLimit (k above windowGroupLimitThreshold or the rule
    disabled) — a hot group then shuffles ALL its rows into one sort task."""
    try:
        thr = int(
            df.sparkSession.conf.get(
                "spark.sql.optimizer.windowGroupLimitThreshold", "1000"
            )
        )
    except Exception:
        thr = 1000
    if thr < 0 or k > thr:
        import warnings

        warnings.warn(
            f"{caller}: k={k} exceeds "
            f"spark.sql.optimizer.windowGroupLimitThreshold={thr}, so the "
            "window gets no map-side partial top-k and a hot group "
            "serializes into one task"
        )


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    k: int,
    order_by: Sequence,
    salt_buckets: int | None = None,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Keep at most ``k`` rows per group, ranked by ``order_by``.

    ``order_by`` entries are column names or Column expressions (e.g.
    ``F.col("n_chars").desc()``); include a unique tiebreak column so the
    survivor set is deterministic — with ties at the cut the window picks
    arbitrarily and two runs may disagree.

    ``salt_buckets`` switches to the skew-safe two-phase path: phase one
    ranks within (group, salt) — a hot group spreads over ``salt_buckets``
    tasks — and phase two ranks the ≤ ``k * salt_buckets`` surviving
    candidates per group. ``salt_cols`` (default: every column — a
    whole-row content hash) feed the deterministic salt, keeping retries
    and resume stable, as in spark/skew.py.

    Where this sits in a 100 TB curation job: cap FIRST, shuffle LAST.
    The cap runs before :func:`deterministic_shuffle` (and before the
    output write generally) because it shrinks the corpus — every row it
    drops is a row the final range sort never has to move. scripts/
    curate_job.py sequences exactly this way: dedup/quality/redact →
    cap_per_group → balance/shuffle → write.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if salt_buckets is not None and salt_buckets < 1:
        # pmod(hash, 0) is NULL (or an ANSI divide-by-zero): every row would
        # share one NULL salt and the hot group re-serializes — the exact
        # failure this path exists to prevent, so refuse loudly
        raise ValueError("salt_buckets must be >= 1 (or None for the plain path)")
    for helper in ("_rn",) + (("_salt",) if salt_buckets is not None else ()):
        if helper in df.columns:
            raise ValueError(
                f"cap_per_group uses {helper!r} internally and the input "
                "already has that column; rename it first"
            )
    order = _order_cols(order_by)
    groups = [F.col(c) for c in group_cols]
    if salt_buckets is None:
        # above the threshold (or with the rule disabled) the plain path's
        # skew safety evaporates; the salted path is the fix here
        warn_if_no_partial_limit(df, k, "cap_per_group (pass salt_buckets)")
        w = Window.partitionBy(*groups).orderBy(*order)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .drop("_rn")
        )
    if salt_cols is None:
        salt_cols = list(df.columns)  # whole-row content hash: always valid
    from ..spark.skew import with_salt

    salted = with_salt(df, salt_cols, salt_buckets)
    w1 = Window.partitionBy(*groups, F.col("_salt")).orderBy(*order)
    candidates = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy(*groups).orderBy(*order)
    return (
        candidates.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def deterministic_shuffle(
    df: DataFrame, id_cols: Sequence[str], seed: int = 0
) -> DataFrame:
    """Reproducible pseudo-random global order (training-order shuffle).

    Orders by ``xxhash64(seed, id_cols...)`` — the same rows produce the
    same order on any run, cluster size, or physical layout, unlike
    ``orderBy(rand())``. One range-sort shuffle; write the result with
    ``.write`` to pin the order on disk.

    Where this sits in a 100 TB curation job: ONCE, at write time, after
    every row-dropping stage (dedup, quality filters, cap_per_group). A
    global range sort moves the entire surviving corpus — at 100 TB it is
    the single most expensive intentional shuffle in the pipeline — so it
    must never run on rows a later stage will drop, and never more than
    once. scripts/curate_job.py enforces the composition by sequencing it
    last (``--shuffle-output``), immediately before the write.
    """
    if not id_cols:
        # xxhash64(seed) alone is one constant — a total tie, i.e. the
        # nondeterministic order this function exists to replace
        raise ValueError("id_cols must name at least one column")
    return df.orderBy(
        F.xxhash64(F.lit(seed), *[F.col(c) for c in id_cols]), *[F.col(c) for c in id_cols]
    )
